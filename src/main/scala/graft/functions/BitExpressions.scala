package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd Morton (Z-order) encoding of an ARRAY<LONG> of
  * dimension values: the low `bits` bits of each of the d values
  * interleave round-robin — result bit `i*d + j` is bit `i` of value
  * j — so lexicographic order on the code approximates locality in
  * ALL dimensions at once. This is the space-filling-curve key behind
  * multi-dimensional data clustering (Delta/Iceberg OPTIMIZE ZORDER):
  * range-partition + sort by the code and every file's bounding box
  * is tight in every clustered column, so min/max skipping prunes
  * multi-column predicates, not just the leading sort column.
  *
  * Pure bit arithmetic (no floats), so an oracle can replay it
  * exactly as a closed-form integer expression.
  */
case class InterleaveBits(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bits >= 1 && bits <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"interleave_bits needs bits in [1,63], got $bits")
    case other => TypeCheckResult.TypeCheckFailure(
      s"interleave_bits needs array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val vs = a.asInstanceOf[ArrayData].toLongArray()
    val d = vs.length
    require(d >= 1 && d * bits <= 63,
      s"interleave_bits: $d dims x $bits bits exceeds 63 result bits")
    var z = 0L
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < d) {
        z |= ((vs(j) >>> i) & 1L) << (i * d + j)
        j += 1
      }
      i += 1
    }
    z
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val vs = ctx.freshName("vs")
      val d = ctx.freshName("d")
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |long[] $vs = $a.toLongArray();
         |int $d = $vs.length;
         |if ($d < 1 || $d * $bits > 63) {
         |  throw new IllegalArgumentException(
         |    "interleave_bits: " + $d + " dims x $bits bits exceeds 63");
         |}
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  for (int $j = 0; $j < $d; $j++) {
         |    $z |= (($vs[$j] >>> $i) & 1L) << ($i * $d + $j);
         |  }
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object BitFunctions {
  /** Morton code of `dims` (ARRAY<BIGINT>) using the low `bits` bits
    * of each element.
    */
  def interleaveBits(dims: Column, bits: Int): Column =
    GraftExpressionBridge.column(InterleaveBits(
      GraftExpressionBridge.expression(dims), bits))

  /** The `bits` argument of the SQL form must be an integer literal. */
  private[graft] def bitsOf(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"interleave_bits bits must be an integer literal, got $other")
  }

  /** Expose to SQL as `interleave_bits(array, bits)` (bits a literal). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "interleave_bits",
      exprs => InterleaveBits(exprs.head, bitsOf(exprs(1))), "built-in")

  /** The same Morton code as a closed-form SQL string over integer
    * columns — the oracle-side replay of [[InterleaveBits]] (pure
    * integer shifts, bit-identical in any ANSI engine).
    */
  def interleaveSql(cols: Seq[String], bits: Int): String = {
    val d = cols.length
    require(d >= 1 && d * bits <= 63)
    val terms = for (i <- 0 until bits; j <- 0 until d) yield
      s"(((${cols(j)} >> $i) & 1) << ${i * d + j})"
    terms.mkString("(", " + ", ")")
  }
}
