package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftExpressionBridge, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, RepartitionByExpression, Sort}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** A genuine custom operator — as-of join — carried through the full
  * Catalyst stack: logical node → planner strategy → physical
  * sort-merge exec. For each left row, emits the right row with the
  * same key and the greatest `rightTs <= leftTs` (left outer
  * semantics; unmatched right side is null).
  *
  * Physical design (the 100 TB shape): the strategy wraps both sides
  * in hash-repartition on the key + intra-partition sort on (key, ts),
  * so equal keys are co-located and the exec is a single streaming
  * merge pass per partition pair — one shuffle per side, no range
  * cross-join, state = one buffered right row.
  *
  * This coexists with the composed union+window form
  * (StreamingOps st03); both hash-match DuckDB's native ASOF JOIN.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts) =>
      // co-locate by key value + sort each side by (key, ts): equal key
      // hashes land in equal partition ids on both sides. Partition
      // count pinned explicitly so AQE can't coalesce the two sides
      // differently (the exec zips partition pairs).
      val n = org.apache.spark.sql.internal.SQLConf.get.numShufflePartitions
      def arranged(child: LogicalPlan, keys: Seq[Expression],
          ts: Expression): LogicalPlan =
        Sort((keys :+ ts).map(SortOrder(_, Ascending)), global = false,
          RepartitionByExpression(keys, child, Some(n)))
      AsOfJoinExec(lk, rk, lts, rts,
        planLater(arranged(l, lk, lts)),
        planLater(arranged(r, rk, rts))) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lts = leftTs
    val rts = rightTs
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lts), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rts), rOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private var rHeadTs: Long = 0L
        private var advancedHead = false
        // buffered best candidate for the current key
        private var candidate: InternalRow = _
        private var candidateKey: InternalRow = _

        private def advanceRight(): Unit = {
          if (rIt.hasNext) {
            val row = rIt.next()
            rHead = row.copy()
            rHeadKey = rKeyProj(rHead).copy()
            rHeadTs = rTsProj(rHead).getLong(0)
          } else { rHead = null; rHeadKey = null }
          advancedHead = true
        }

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val lRow = lIt.next()
          val lKey = lKeyProj(lRow)
          val lTsVal = lTsProj(lRow).getLong(0)
          if (!advancedHead) advanceRight()
          // consume right rows with key < lKey, or same key and ts <= lTs
          var continue = rHead != null
          while (continue) {
            val cmp = keyOrd.compare(rHeadKey, lKey)
            if (cmp < 0) advanceRight()
            else if (cmp == 0 && rHeadTs <= lTsVal) {
              candidate = rHead; candidateKey = rHeadKey
              advanceRight()
            } else continue = false
            if (rHead == null) continue = false
          }
          val matched = candidate != null &&
            keyOrd.compare(candidateKey, lKey) == 0
          joined(lRow, if (matched) candidate else nullRight)
        }
      }
    }
  }
}

/** Public API: `GraftAsOf.join(left, right, keys, leftTs, rightTs)`.
  * The planner strategy self-registers (idempotently) on the session's
  * experimental strategies.
  */
object GraftAsOf {
  private def ensureRegistered(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[AsOfStrategy.type]))
      spark.experimental.extraStrategies = cur :+ AsOfStrategy
  }

  /** The exec reads both ts expressions with `getLong` — valid only
    * for long-backed types (LONG, TIMESTAMP, TIMESTAMP_NTZ). Narrower
    * integrals are widened here; anything else (DATE, STRING, ...) is
    * rejected up front instead of reading garbage at runtime.
    */
  private def normalizeTs(df: DataFrame, tsCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    df.schema(tsCol).dataType match {
      case LongType | TimestampType | TimestampNTZType => df
      case ByteType | ShortType | IntegerType =>
        df.withColumn(tsCol, col(tsCol).cast(LongType))
      case dt => throw new IllegalArgumentException(
        s"as-of ts column '$tsCol' has unsupported type " +
          s"${dt.simpleString}; use a long-, int- or timestamp-typed " +
          "column (cast DATE/STRING explicitly)")
    }
  }

  def join(spark: SparkSession, leftDF0: DataFrame, rightDF0: DataFrame,
      keys: Seq[String], leftTsCol: String, rightTsCol: String)
      : DataFrame = {
    ensureRegistered(spark)
    val leftDF = normalizeTs(leftDF0, leftTsCol)
    val rightDF = normalizeTs(rightDF0, rightTsCol)
    val lPlan = leftDF.queryExecution.analyzed
    // hand-built plans bypass the analyzer's DeduplicateRelations: when
    // both inputs derive from the same source the sides share exprIds
    // and the optimizer mis-prunes — re-alias the right side so its
    // top-level attributes get fresh ids
    import org.apache.spark.sql.functions.col
    val rFresh = rightDF.select(
      rightDF.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    val rPlan = rFresh.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    GraftExpressionBridge.ofRows(spark,
      AsOfJoin(lPlan, rPlan,
        keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
        attr(lPlan, leftTsCol), attr(rPlan, rightTsCol)))
  }
}
