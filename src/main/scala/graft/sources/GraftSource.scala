package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{ChunkCodec, GraftDataset}
import graft.core.Model.VariableMeta

/** DataSource V2 connector exposing a graft variable as a flat cell
  * table `(x0..x{R-1} LONG, value DOUBLE)` — the "custom integration"
  * architecture the reference backend occupies in its stack
  * (storage-side scans with pushdown, hbase.clj:184-198), built on the
  * public Spark connector API:
  *
  * {{{
  * spark.read.format("graft")
  *   .option("path", dsDir).option("variable", "temp")
  *   .option("asOf", version)   // default: latest
  *   .load().filter($"x0" >= 2 && $"x0" < 4)   // pruned at chunk level
  * }}}
  *
  * Bound filters on coordinate columns prune input partitions (one per
  * chunk tile — the connector's unit of scan parallelism) before any
  * byte is read; column pruning skips payload decode entirely for
  * metadata-only scans. Filters are also returned as post-scan
  * residuals so Spark re-applies them cell-exactly.
  *
  * Planning resolves the as-of index with a driver-side Spark job and
  * collects CHUNK-level entries (not cells); at very large grids the
  * planning collect is the scale limit — the readSlab path keeps
  * everything distributed and is preferred for full-slab reads.
  */
class GraftTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  private def load(options: CaseInsensitiveStringMap)
      : (String, String, Long, VariableMeta, Map[Long, VariableMeta]) = {
    val path = Option(options.get("path"))
      .getOrElse(throw new IllegalArgumentException("option 'path' required"))
    val variable = Option(options.get("variable")).getOrElse(
      throw new IllegalArgumentException("option 'variable' required"))
    val ds = new GraftDataset(SparkSession.active, path)
    val asOf = Option(options.get("asOf")).map(_.toLong)
      .orElse(ds.latestVersion)
      .getOrElse(throw new IllegalArgumentException("no committed versions"))
    val v = ds.metadata(asOf).variable(variable)
    val metas = ds.versionIds().filter(_ <= asOf).flatMap { id =>
      ds.metadata(id).variables.find(_.name == variable).map(id -> _)
    }.toMap
    (path, variable, asOf, v, metas)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (_, _, _, v, _) = load(options)
    GraftTableProvider.schemaFor(v)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val (path, variable, asOf, v, metas) =
      load(new CaseInsensitiveStringMap(properties))
    new GraftTable(path, variable, asOf, v, metas)
  }

  override def supportsExternalMetadata(): Boolean = false
}

object GraftTableProvider {
  def schemaFor(v: VariableMeta): StructType =
    StructType(v.shape.indices.map(i =>
      StructField(s"x$i", LongType, nullable = false)) :+
      StructField("value", DoubleType, nullable = false))
}

class GraftTable(path: String, variable: String, asOf: Long,
    v: VariableMeta, metas: Map[Long, VariableMeta])
    extends Table with SupportsRead {
  override def name(): String = s"graft.$path.$variable@$asOf"
  override def schema(): StructType = GraftTableProvider.schemaFor(v)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path, variable, asOf, v, metas)
}

class GraftScanBuilder(path: String, variable: String, asOf: Long,
    v: VariableMeta, metas: Map[Long, VariableMeta])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private val rank = v.shape.length
  // region bounds [lo, hi) per dimension, tightened by pushed filters
  private val lo = Array.fill(rank)(0L)
  private val hi = v.shape.toArray
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GraftTableProvider.schemaFor(v)

  private def dimOf(attr: String): Option[Int] =
    if (attr.startsWith("x")) attr.drop(1).toIntOption.filter(_ < rank)
    else None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach {
      case sources.GreaterThanOrEqual(a, x: Long) =>
        dimOf(a).foreach(d => lo(d) = math.max(lo(d), x))
      case sources.GreaterThan(a, x: Long) =>
        dimOf(a).foreach(d => lo(d) = math.max(lo(d), x + 1))
      case sources.LessThan(a, x: Long) =>
        dimOf(a).foreach(d => hi(d) = math.min(hi(d), x))
      case sources.LessThanOrEqual(a, x: Long) =>
        dimOf(a).foreach(d => hi(d) = math.min(hi(d), x + 1))
      case sources.EqualTo(a, x: Long) =>
        dimOf(a).foreach { d =>
          lo(d) = math.max(lo(d), x); hi(d) = math.min(hi(d), x + 1)
        }
      case _ => ()
    }
    pushed = filters.filter {
      case sources.GreaterThanOrEqual(a, _: Long) => dimOf(a).isDefined
      case sources.GreaterThan(a, _: Long) => dimOf(a).isDefined
      case sources.LessThan(a, _: Long) => dimOf(a).isDefined
      case sources.LessThanOrEqual(a, _: Long) => dimOf(a).isDefined
      case sources.EqualTo(a, _: Long) => dimOf(a).isDefined
      case _ => false
    }
    // everything stays a post-scan residual: pruning is chunk-level,
    // Spark re-applies filters cell-exactly
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftScan(path, variable, asOf, v, metas, required,
      lo.toSeq.zip(hi.toSeq))
}

class GraftScan(path: String, variable: String, asOf: Long,
    v: VariableMeta, metas: Map[Long, VariableMeta],
    required: StructType, region: Seq[(Long, Long)])
    extends Scan with Batch with Serializable {

  override def readSchema(): StructType = required
  override def description(): String =
    s"GraftScan($variable@$asOf, region=$region, cols=" +
      s"${required.fieldNames.mkString(",")})"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val ds = new GraftDataset(spark, path)
    import spark.implicits._
    val chunkDims = v.chunkDims
    val grid = v.chunkGrid
    val rank = grid.length
    val nChunks = grid.product max 1L
    val gridCells = spark.range(nChunks).map { i =>
      var rest = i
      val cc = new Array[Long](rank)
      var d = rank - 1
      while (d >= 0) { cc(d) = rest % grid(d); rest /= grid(d); d -= 1 }
      cc.toSeq
    }.filter { cc: Seq[Long] =>
      cc.indices.forall { i =>
        cc(i) * chunkDims(i) < region(i)._2 &&
          (cc(i) + 1) * chunkDims(i) > region(i)._1
      }
    }
    import org.apache.spark.sql.functions.col
    gridCells.toDF("coord")
      .join(ds.resolveIndex(variable, asOf), Seq("coord"), "left")
      .select(col("coord"), col("versionId"), col("chunkHash"))
      .as[(Seq[Long], Option[Long], Option[String])]
      .collect()
      .map { case (cc, ver, hash) =>
        GraftInputPartition(cc.toArray, ver, hash): InputPartition
      }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(s"$path/chunks", v, metas, required,
      region.toArray)
}

case class GraftInputPartition(chunkCoord: Array[Long],
    versionId: Option[Long], chunkHash: Option[String])
  extends InputPartition

class GraftReaderFactory(chunksDir: String, v: VariableMeta,
    metas: Map[Long, VariableMeta], required: StructType,
    region: Array[(Long, Long)]) extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    new PartitionReader[InternalRow] {
      private val cc: Seq[Long] = p.chunkCoord.toSeq
      private val needsValue = required.fieldNames.contains("value")
      private val dimIdx: Array[Int] = required.fieldNames
        .filter(_ != "value").map(_.drop(1).toInt)
      // column pruning: payload decode is skipped entirely when the
      // scan projects only coordinates
      private val decoded: Option[(VariableMeta, Array[Double])] =
        if (!needsValue) None
        else p.chunkHash.flatMap { h =>
          p.versionId.map { ver =>
            val fs = new Path(chunksDir)
              .getFileSystem(new org.apache.hadoop.conf.Configuration())
            val wv = metas(ver)
            (wv, ChunkCodec.decode(wv,
              GraftDataset.readChunkFile(fs, chunksDir, h)).map(_._2).toArray)
          }
        }
      private val n = ChunkCodec.tileSize(ChunkCodec.tileDims(v, cc))
      private var off = -1L
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (off < n - 1) {
          off += 1
          val cell = ChunkCodec.cellOf(v, cc, off)
          val inRegion = cell.indices.forall(i =>
            cell(i) >= region(i)._1 && cell(i) < region(i)._2)
          if (inRegion) {
            val row = new GenericInternalRow(required.length)
            var f = 0
            var d = 0
            while (f < required.length) {
              if (required.fields(f).name == "value") {
                val value = decoded match {
                  case Some((wv, values))
                    if cell.indices.forall(i => cell(i) < wv.shape(i)) =>
                    values(ChunkCodec.offsetOf(wv, cc, cell).toInt)
                  case _ => v.fillValue
                }
                row.setDouble(f, value)
              } else {
                row.setLong(f, cell(dimIdx(d))); d += 1
              }
              f += 1
            }
            current = row
            return true
          }
        }
        false
      }

      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
