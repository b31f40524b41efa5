package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/** Catalog-resolvable V2 functions for the graft chunk grid.
  *
  * The one that matters is `chunk(size, coord) = floor(coord / size)`:
  * it names the chunk-grid cell a coordinate falls in, which is
  * exactly how chunks partition a variable on disk. Reporting it as
  * the scan's [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
  * clustering (see [[GraftScan.outputPartitioning]]) lets Spark run a
  * STORAGE-PARTITIONED JOIN between two chunk-aligned variables: both
  * sides arrive pre-clustered by the same `chunk(...)` transforms, so
  * the join needs NO shuffle on either side — at 100 TB the
  * difference between re-shuffling two full arrays and streaming
  * matching chunk pairs. Spark checks compatibility by the bound
  * function's `canonicalName` plus the literal args, so two scans
  * co-partition exactly when their per-dimension chunk sizes match.
  *
  * This is the same public pattern Iceberg uses with its `bucket`
  * transform; resolution happens through
  * `V2ExpressionUtils.loadV2FunctionOpt`, which asks the relation's
  * catalog ([[GraftCatalog]], a `FunctionCatalog`) for the function
  * by bare name under the empty namespace.
  */
object GraftFunctions {

  val ChunkName = "chunk"
  private val Sized = raw"(?i)chunk_(\d+)".r

  /** The transform name reporting a given chunk size. The size rides
    * IN THE NAME (`chunk_64`), not as an argument:
    * `KeyGroupedPartitioning.supportsExpressions` admits only
    * single-argument transforms over a bare column reference, so a
    * `chunk(64, x0)` form would silently degrade the scan to unknown
    * partitioning (this is also why Spark's own `bucket(n, col)`
    * lifts `n` out of the children, into `numBucketsOpt`).
    */
  def sizedName(size: Long): String = s"chunk_$size"

  def identifiers: Array[Identifier] =
    Array(Identifier.of(Array.empty[String], ChunkName))

  /** Namespace-insensitive lookup: the analyzer resolves transform
    * functions under the empty namespace; `cat.chunk(...)`-style SQL
    * lookups work too. `chunk_<n>` is the partition-transform form
    * (unary, size bound from the name); `chunk` is the 2-arg SQL
    * convenience form.
    */
  def load(name: String): Option[UnboundFunction] = name match {
    case Sized(n) => n.toLongOption.filter(_ > 0).map(SizedChunkUnbound)
    case _ if name.equalsIgnoreCase(ChunkName) => Some(ChunkUnbound)
    case _ => None
  }

  case class SizedChunkUnbound(size: Long) extends UnboundFunction {
    override def name(): String = sizedName(size)
    override def description(): String =
      s"${sizedName(size)}(coord): the chunk-grid cell floor(coord / $size)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1 &&
        inputType.fields.head.dataType == LongType,
        s"${sizedName(size)}(coord BIGINT): got $inputType")
      ChunkFunction(size)
    }
  }

  /** Bound form. `canonicalName` is the co-partition identity: two
    * KeyGroupedPartitionings cluster compatibly iff they apply THIS
    * function — same name, same size — to the join keys.
    */
  case class ChunkFunction(size: Long)
      extends ScalarFunction[java.lang.Long] {
    override def name(): String = sizedName(size)
    override def canonicalName(): String = s"graft.chunk[$size]"
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): java.lang.Long =
      java.lang.Math.floorDiv(input.getLong(0), size)
    // codegen magic-method form (unboxed)
    def invoke(coord: Long): Long = java.lang.Math.floorDiv(coord, size)
  }

  object ChunkUnbound extends UnboundFunction {
    override def name(): String = ChunkName
    override def description(): String =
      "chunk(size, coord): the chunk-grid cell index floor(coord / size)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 &&
        inputType.fields.forall(_.dataType == LongType),
        s"chunk(size BIGINT, coord BIGINT): got $inputType")
      ChunkBinaryFunction
    }
  }

  object ChunkBinaryFunction extends ScalarFunction[java.lang.Long] {
    override def name(): String = ChunkName
    override def canonicalName(): String = "graft.chunk"
    override def inputTypes(): Array[DataType] = Array(LongType, LongType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): java.lang.Long =
      java.lang.Math.floorDiv(input.getLong(1), input.getLong(0))
    def invoke(size: Long, coord: Long): Long =
      java.lang.Math.floorDiv(coord, size)
  }
}
