package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{array, col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, InsertableRelation}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{ChunkCodec, GraftDataset, SerializableHadoopConf}
import graft.core.Model.{DatasetMeta, VariableMeta}

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
  * df.write.format("graft")
  *   .option("path", dsDir).option("variable", "temp")
  *   .mode("append").save()     // stages + commits a new version
  * }}}
  *
  * Bound filters on coordinate columns tighten a per-dimension REGION
  * BOX before any byte is read; column pruning skips payload decode
  * entirely for metadata-only scans. Filters are also returned as
  * post-scan residuals so Spark re-applies them cell-exactly.
  *
  * Planning is O(#partitions) on the driver, never O(#chunks): the
  * pruned chunk set is a box in chunk space (enumerable by arithmetic
  * inside each reader), and the as-of index is resolved by ONE
  * distributed job that writes per-bin scan-manifest files to the
  * shared store (`<path>/scans/<scanId>/bin-N.idx`). Each
  * InputPartition carries only a linear chunk-id range + its manifest
  * file; at a billion-tile grid the driver still materializes nothing
  * per chunk. Stale scan manifests are swept by `GraftDataset.gc()`.
  */
class GraftTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  private def load(options: CaseInsensitiveStringMap)
      : (String, String, Long, VariableMeta, Map[Long, VariableMeta],
         Boolean) = {
    val path = Option(options.get("path"))
      .getOrElse(throw new IllegalArgumentException("option 'path' required"))
    val variable = Option(options.get("variable")).getOrElse(
      throw new IllegalArgumentException("option 'variable' required"))
    val ds = new GraftDataset(SparkSession.active, path)
    val asOf = Option(options.get("asOf"))
      .map(GraftTableProvider.resolveVersion(ds, _))
      .orElse(ds.latestVersion)
      .getOrElse(throw new IllegalArgumentException("no committed versions"))
    ds.requireLive(asOf) // O(1) record probe, not a version-log listing
    val v = ds.metadata(asOf).variable(variable)
    // snapshot-backed: bounded driver I/O even with a long version
    // log; lineage-aware so cloned variables' pre-clone rows decode
    // under their source's historical metadata
    val metas = ds.decodeMetas(v, asOf)
    val withVersion = Option(options.get("withVersion")).exists(_.toBoolean)
    (path, variable, asOf, v, metas, withVersion)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (_, _, _, v, _, withVersion) = load(options)
    GraftTableProvider.schemaFor(v, withVersion)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val (path, variable, asOf, v, metas, withVersion) =
      load(new CaseInsensitiveStringMap(properties))
    new GraftTable(path, variable, asOf, v, metas, withVersion)
  }

  override def supportsExternalMetadata(): Boolean = false
}

object GraftTableProvider {
  /** A version option value: a numeric version id, or a tag name
    * resolved through the dataset's named refs — so `asOf` and
    * `startVersion` both accept "changes since 'corpus-v1'".
    */
  private[sources] def resolveVersion(ds: GraftDataset, v: String): Long =
    v.toLongOption.orElse(ds.resolveTag(v)).getOrElse(
      throw new IllegalArgumentException(
        s"'$v' is neither a version id nor a known tag"))

  /** The Spark type of a variable's cells — DTYPE-FAITHFUL (reference
    * keeps element dtypes through reads, hbase_test.clj:152-156):
    * chunks store typed bytes (ChunkCodec), so the read surface must
    * not collapse them to DOUBLE — a `long` beyond 2^53 would silently
    * lose precision (longs additionally decode from the stored bytes
    * without any double round-trip).
    */
  def valueTypeFor(dtype: String): DataType = dtype match {
    case "double" => DoubleType
    case "float"  => FloatType
    case "short"  => ShortType
    case "int"    => IntegerType
    case "long"   => LongType
    case other => throw new IllegalArgumentException(s"dtype $other")
  }

  /** Cell schema; `withVersion` appends a `_version LONG` provenance
    * column (the committed version that wrote the cell's chunk; null
    * on fill cells of unwritten chunks).
    */
  def schemaFor(v: VariableMeta, withVersion: Boolean = false): StructType = {
    val base = StructType(v.shape.indices.map(i =>
      StructField(s"x$i", LongType, nullable = false)) :+
      StructField("value", valueTypeFor(v.dtype), nullable = false))
    if (withVersion) base.add(StructField("_version", LongType)) else base
  }

  /** Write a cell value into an InternalRow under the surfaced type. */
  private[sources] def setCell(row: GenericInternalRow, f: Int,
      dt: DataType, dv: Double): Unit = dt match {
    case DoubleType  => row.setDouble(f, dv)
    case FloatType   => row.setFloat(f, dv.toFloat)
    case ShortType   => row.setShort(f, dv.toShort)
    case IntegerType => row.setInt(f, dv.toInt)
    case LongType    => row.setLong(f, dv.toLong)
    case other => throw new IllegalStateException(s"cell type $other")
  }
}

class GraftTable(path: String, variable: String, asOf: Long,
    v: VariableMeta, metas: Map[Long, VariableMeta], withVersion: Boolean)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  /** UPDATE / MERGE INTO / value-predicate DELETE — delta-based
    * row-level ops (see [[GraftRowLevelOperation]]). Box-shaped
    * DELETEs still short-circuit through [[deleteWhere]].
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => new GraftRowLevelOperation(path, variable, asOf, v, metas,
      info.command())
  override def name(): String = s"graft.$path.$variable@$asOf"
  /** Surface the array geometry to `SHOW TBLPROPERTIES` / DESCRIBE. */
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put("shape", v.shape.mkString(","))
    m.put("chunkDims", v.chunkDims.mkString(","))
    m.put("dtype", v.dtype)
    m.put("fillValue", v.fillValue.toString)
    m.put("asOf", asOf.toString)
    if (v.check.nonEmpty) m.put("check", v.check)
    m
  }
  override def schema(): StructType =
    GraftTableProvider.schemaFor(v, withVersion)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.OVERWRITE_BY_FILTER, TableCapability.TRUNCATE)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path, variable, asOf, v, metas, withVersion,
      Option(options.get("startVersion")).map(s =>
        s.toLongOption.getOrElse(GraftTableProvider.resolveVersion(
          new GraftDataset(SparkSession.active, path), s)))
        .getOrElse(0L),
      Option(options.get("maxVersionsPerBatch")).map(_.toInt))

  /** TRUNCATE TABLE: an O(1) METADATA-ONLY commit. The variable swaps
    * to a fresh physical index key (an "epoch"), so as-of resolution
    * at HEAD finds no rows — every cell reads as fill — while history
    * below the truncate still resolves under the old key. No data is
    * rewritten or deleted; pre-truncate chunks age out through
    * retention + gc like any superseded version.
    */
  override def truncateTable(): Boolean = {
    val ds = new GraftDataset(SparkSession.active, path)
    val meta = ds.metadata(ds.latestVersion.getOrElse(
      throw new IllegalArgumentException(
        s"dataset $path has no committed versions to truncate")))
    val w = ds.newWriter(GraftTable.freshEpoch(meta, variable))
    w.commit()
    true
  }

  /** DELETE FROM accepts exactly the predicates the scan can prune
    * by — a coordinate box. Returns None for anything else (a value
    * predicate would make the delete read-dependent; Spark then
    * refuses the DELETE instead of silently scanning).
    */
  private def deleteBox(
      filters: Array[Filter]): Option[(Array[Long], Array[Long])] = {
    val rank = v.shape.length
    val lo = Array.fill(rank)(0L)
    val hi = v.shape.toArray
    def dimOf(attr: String): Option[Int] =
      if (attr.startsWith("x")) attr.drop(1).toIntOption.filter(_ < rank)
      else None
    val ok = filters.forall {
      case sources.GreaterThanOrEqual(a, x: Long) =>
        dimOf(a).exists { d => lo(d) = math.max(lo(d), x); true }
      case sources.GreaterThan(a, x: Long) =>
        dimOf(a).exists { d => lo(d) = math.max(lo(d), x + 1); true }
      case sources.LessThan(a, x: Long) =>
        dimOf(a).exists { d => hi(d) = math.min(hi(d), x); true }
      case sources.LessThanOrEqual(a, x: Long) =>
        dimOf(a).exists { d => hi(d) = math.min(hi(d), x + 1); true }
      case sources.EqualTo(a, x: Long) =>
        dimOf(a).exists { d =>
          lo(d) = math.max(lo(d), x); hi(d) = math.min(hi(d), x + 1); true
        }
      case sources.AlwaysTrue() => true
      case _ => false
    }
    if (ok) Some((lo, hi)) else None
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    deleteBox(filters).isDefined

  /** `DELETE FROM t WHERE <coordinate box>`: an MVCC commit writing
    * fill over the LIVE cells in the box — O(live cells in region),
    * never a rewrite of untouched chunks, and history below the
    * delete stays time-travelable. The live set comes through the
    * DSv2 read with the box pushed down, so only intersecting chunks
    * decode. A full-variable box short-circuits to the O(1) epoch
    * swap ([[truncateTable]]). (Spark's NaN = NaN semantics make the
    * `value != fill` live-cell filter exact for NaN fill too.)
    */
  override def deleteWhere(filters: Array[Filter]): Unit = {
    val (lo, hi) = deleteBox(filters).getOrElse(
      throw new UnsupportedOperationException(
        "DELETE supports coordinate-box predicates only, got " +
          filters.mkString(", ")))
    val rank = v.shape.length
    if (lo.forall(_ == 0L) &&
        hi.toSeq == v.shape) { truncateTable(); return }
    val spark = SparkSession.active
    val ds = new GraftDataset(spark, path)
    val meta = ds.metadata(ds.latestVersion.getOrElse(
      throw new IllegalArgumentException(
        s"dataset $path has no committed versions to delete from")))
    val vm = meta.variable(variable)
    var df = spark.read.format("graft")
      .option("path", path).option("variable", variable).load()
    (0 until rank).foreach { d =>
      df = df.filter(col(s"x$d") >= lo(d) && col(s"x$d") < hi(d))
    }
    val cells = df.filter(col("value") =!= lit(vm.fillValue))
      .select(array((0 until rank).map(i =>
        col(s"x$i").cast(LongType)): _*).as("coord"),
        lit(vm.fillValue).cast(DoubleType).as("value"))
      // two actions ride this scan (the no-op probe and the fill
      // write) — decode the region's chunks once, not twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (!cells.isEmpty) {
        val w = ds.newWriter(meta)
        w.writeSlab(variable, cells)
        w.commit()
      }
    } finally cells.unpersist()
  }

  /** Write path: `df.write.format("graft").mode("append")` ingests the
    * DataFrame as one new committed version through the SlabWriter
    * staging protocol (re-chunk shuffle + manifest + atomic commit).
    * V1Write hands us the full DataFrame — the write itself is the
    * same distributed plan the programmatic API uses.
    *
    * INSERT OVERWRITE (unpartitioned ⇒ overwrite-by-true ⇒
    * [[SupportsTruncate.truncate]]) is the epoch swap + the new cells
    * in ONE commit: the variable's fresh index key makes old rows
    * invisible at HEAD and disables the partial-chunk merge with
    * prior content, so the result is exactly the inserted cells over
    * fill — O(new data), never a rewrite of the old, with time travel
    * below the overwrite intact.
    *
    * DESIGN NOTE — why this write does NOT declare
    * `RequiresDistributionAndOrdering` (investigated round 10, and
    * worth not re-attempting): Spark's V1 fallback executes the
    * ANALYZED query — `AppendDataExecV1` embeds `analyzedQuery`, so
    * the `RepartitionByExpression` that
    * `DistributionAndOrderingUtils.prepareQuery` injects for the
    * optimizer's copy is silently DROPPED for any `V1Write`; a writer
    * that trusts the declared clustering (e.g. routing to
    * [[graft.core.SlabWriter.writeSlabAligned]]) then corrupts or
    * refuses unclustered input. The non-V1 alternatives don't pay
    * either: a task-side DSv2 tile encoder would put chunk blobs
    * before any manifest records them (breaking gc's
    * manifest-before-blob orphan invariant) and would bypass the
    * codegen'd CHECK-constraint pass; and pre-repartitioning inside
    * insert() before writeSlabAligned reproduces writeSlab's existing
    * plan exactly — writeSlab's `groupByKey(chunkId)` IS the one
    * alignment exchange (AQE-sized like any exchange in the nested
    * write job), followed by per-group tile encoding. One shuffle of
    * the cells is the floor for re-chunking unaligned input, and the
    * engine already sits on it; callers who can co-partition upstream
    * use the zero-shuffle writeSlabAligned path directly (m32).
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val rank = v.shape.length
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new V1Write {
        // streaming path: writeStream.toTable / .format("graft") —
        // per-epoch exactly-once store commits (GraftStreamingWrite)
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new GraftStreamingWrite(path, variable, v, info.schema(),
            info.queryId())
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              val spark = SparkSession.active
              val ds = new GraftDataset(spark, path)
              val meta = ds.metadata(ds.latestVersion.getOrElse(
                throw new IllegalArgumentException(
                  s"dataset $path has no committed versions to append to")))
              val cells = data.select(
                array((0 until rank).map(i =>
                  col(s"x$i").cast(LongType)): _*).as("coord"),
                col("value").cast(DoubleType).as("value"))
              val w = ds.newWriter(
                if (replace || overwrite) GraftTable.freshEpoch(meta, variable)
                else meta)
              w.writeSlab(variable, cells)
              w.commit()
              ()
            }
          }
      }
    }
  }
}

object GraftTable {
  /** The variable under a fresh physical index key. The suffix must be
    * unique across the LAKE'S WHOLE HISTORY, not just the current
    * meta: index rows under a previously-retired key may still exist
    * in the merged store, and reusing the key would phantom-hit them.
    */
  private[sources] def freshEpoch(meta: DatasetMeta,
      variable: String): DatasetMeta = {
    val vm = meta.variable(variable)
    val fresh = vm.copy(indexName =
      s"${vm.name}#${java.util.UUID.randomUUID().toString.take(8)}")
    DatasetMeta(meta.variables.map(x => if (x.name == vm.name) fresh else x))
  }
}

/** Zone-map predicate algebra for value-column data skipping.
  *
  * Chunks carry [vmin, vmax] over their decoded values (fill included;
  * NaN rides as vmax under Spark's NaN-greatest total order — see the
  * index schema). A pushed comparison filter on
  * `value` lets the scan planner drop every chunk whose range provably
  * cannot satisfy it — the chunk-store analog of parquet row-group
  * min/max pruning. All checks are CONSERVATIVE: the filters stay
  * residual (Spark re-applies them), so a kept chunk is never wrong —
  * only a skipped one could be, and skipping demands proof.
  */
private[sources] object ZonePredicates {
  private def toD(x: Any): Option[Double] = x match {
    case d: java.lang.Double  => Some(d.doubleValue)
    case f: java.lang.Float   => Some(f.doubleValue)
    case l: java.lang.Long    => Some(l.doubleValue)
    case i: java.lang.Integer => Some(i.doubleValue)
    case s: java.lang.Short   => Some(s.doubleValue)
    case _ => None
  }

  /** The subset of pushed filters usable for zone skipping: numeric
    * comparisons against the `value` column.
    */
  def zonable(filters: Array[Filter]): Seq[Filter] = filters.filter {
    case sources.GreaterThan("value", x)        => toD(x).isDefined
    case sources.GreaterThanOrEqual("value", x) => toD(x).isDefined
    case sources.LessThan("value", x)           => toD(x).isDefined
    case sources.LessThanOrEqual("value", x)    => toD(x).isDefined
    case sources.EqualTo("value", x)            => toD(x).isDefined
    case sources.In("value", xs) =>
      xs.nonEmpty && xs.forall(toD(_).isDefined)
    case _ => false
  }

  /** Spark SQL's comparison order: NaN GREATER than everything,
    * -0.0 == 0.0. java.lang.Double.compare gives the former; the
    * normalization handles the latter (zone bounds are written
    * normalized, but filter literals arrive raw).
    */
  private def cmp(a: Double, b: Double): Int =
    java.lang.Double.compare(
      if (a == 0.0) 0.0 else a, if (b == 0.0) 0.0 else b)

  /** Could ANY v in [mn, mx] (total order, see [[cmp]]) satisfy `f`? */
  def couldSatisfy(f: Filter, mn: Double, mx: Double): Boolean = f match {
    case sources.GreaterThan(_, x)        => cmp(mx, toD(x).get) > 0
    case sources.GreaterThanOrEqual(_, x) => cmp(mx, toD(x).get) >= 0
    case sources.LessThan(_, x)           => cmp(mn, toD(x).get) < 0
    case sources.LessThanOrEqual(_, x)    => cmp(mn, toD(x).get) <= 0
    case sources.EqualTo(_, x) =>
      val d = toD(x).get; cmp(mn, d) <= 0 && cmp(d, mx) <= 0
    case sources.In(_, xs) =>
      xs.exists(v => toD(v).exists(d => cmp(mn, d) <= 0 && cmp(d, mx) <= 0))
    case _ => true
  }

  /** Does the concrete value `v` satisfy `f` under Spark comparison
    * semantics (NaN greater than everything — `NaN >= x` is TRUE)?
    * Used to prove the FILL value fails every pushed filter before any
    * dense-scan skipping: a skipped chunk reads back as fill cells, so
    * fill must be residual-filtered out for the skip to be invisible.
    */
  def satisfiedBy(f: Filter, v: Double): Boolean = f match {
    case sources.GreaterThan(_, x)        => cmp(v, toD(x).get) > 0
    case sources.GreaterThanOrEqual(_, x) => cmp(v, toD(x).get) >= 0
    case sources.LessThan(_, x)           => cmp(v, toD(x).get) < 0
    case sources.LessThanOrEqual(_, x)    => cmp(v, toD(x).get) <= 0
    case sources.EqualTo(_, x)            => cmp(v, toD(x).get) == 0
    case sources.In(_, xs) => xs.exists(e => toD(e).exists(cmp(v, _) == 0))
    case _ => true
  }
}

class GraftScanBuilder(path: String, variable: String, asOf: Long,
    v: VariableMeta, metas: Map[Long, VariableMeta],
    withVersion: Boolean = false, startVersion: Long = 0L,
    maxVersionsPerBatch: Option[Int] = None,
    liveOnly: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN {

  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Avg => AggAvg, Count => AggCount, CountStar, Max => AggMax, Min => AggMin, Sum => AggSum}

  private val rank = v.shape.length
  // region bounds [lo, hi) per dimension, tightened by pushed filters
  private val lo = Array.fill(rank)(0L)
  private val hi = v.shape.toArray
  private var pushed: Array[Filter] = Array.empty
  private var valuePreds: Seq[Filter] = Seq.empty
  // true iff EVERY filter is exactly absorbed by the region box (so a
  // complete-pushdown aggregate needs no residual filtering)
  private var filtersExact: Boolean = true
  private var pushedAgg: Option[Aggregation] = None
  private var limitClip: Option[Int] = None
  private var topNClip: Option[(Int, Int, Boolean)] = None
  private var required: StructType =
    GraftTableProvider.schemaFor(v, withVersion)

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
    // value-column comparisons become zone-map skip predicates: they
    // are REPORTED as pushed (they do prune chunks at planning time)
    // but stay residual — Spark re-applies them cell-exactly
    valuePreds = ZonePredicates.zonable(filters)
    pushed = filters.filter {
      case sources.GreaterThanOrEqual(a, _: Long) => dimOf(a).isDefined
      case sources.GreaterThan(a, _: Long) => dimOf(a).isDefined
      case sources.LessThan(a, _: Long) => dimOf(a).isDefined
      case sources.LessThanOrEqual(a, _: Long) => dimOf(a).isDefined
      case sources.EqualTo(a, _: Long) => dimOf(a).isDefined
      case _ => false
    } ++ valuePreds
    // zone predicates are NOT absorbed: they skip whole chunks but
    // cannot filter within one, so they must stay residual AND keep
    // blocking complete aggregate pushdown
    def absorbed(f: Filter): Boolean =
      (pushed.contains(f) && !valuePreds.contains(f)) || (f match {
        case sources.IsNotNull(a) => dimOf(a).isDefined // vacuous: non-null
        case _ => false
      })
    filtersExact = filters.forall(absorbed)
    // coordinate bounds are enforced CELL-EXACTLY by the readers'
    // region check, so they are fully absorbed (no residual) — which
    // also unblocks aggregate pushdown; anything else stays a
    // post-scan residual for Spark to re-apply
    filters.filterNot(absorbed)
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*) / MIN(xN) / MAX(xN) over a dense cell read are CLOSED
    * FORMS of the region box (dense reads emit every cell, fill
    * included): answered at planning arithmetic cost, zero blob reads.
    * Only complete pushdown is offered, and only when every filter is
    * exactly absorbed by the box (otherwise Spark must re-apply
    * residuals, which complete pushdown would skip).
    */
  private def refDim(
      e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[Int] = e match {
    case r: NamedReference if r.fieldNames.length == 1 =>
      dimOf(r.fieldNames()(0))
    case _ => None
  }

  private def refValue(
      e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference =>
        r.fieldNames.length == 1 && r.fieldNames()(0) == "value"
      case _ => false
    }

  /** MIN/MAX(value) over the full table fold EXACTLY out of the zone
    * maps (vmin/vmax are tile-exact, NaN-greatest — the same total
    * order Spark's Min/Max use) plus the fill value when any grid
    * chunk is unwritten. Tile granularity makes a REGION-cut scan
    * inexact, and legacy rows without zones make everything unknown —
    * both decline. Resolved once, lazily (a small planning job over
    * index metadata, never chunks).
    */
  private def fullBox: Boolean =
    (0 until rank).forall(i => lo(i) == 0L && hi(i) >= v.shape(i))

  // A tile is STALE when its cell range under the CURRENT metadata
  // differs from the range it was written under (shape grew past it —
  // its zones miss the current-fill cells the dense read now emits —
  // or shrank into it — its zones cover cells the dense read no longer
  // emits — or chunkDims changed): stale zones are not exact for
  // current reads, so stale tiles block the complete fold and decode
  // on the partial one.
  private case class ZoneAggStats(zmin: Option[Double],
      zmax: Option[Double], live: Long, unknownZones: Long, stale: Long,
      sum: Option[Double], abs: Option[Double], unknownSums: Long,
      liveCells: Long)

  private lazy val zoneStats: ZoneAggStats = {
    val spark = SparkSession.active
    val ds = new GraftDataset(spark, path)
    import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
    import spark.implicits._
    val grid = v.chunkGrid
    val vL = v
    val metasL = metas
    val r = ds.resolveIndex(v.idx, asOf)
      .select(col("coord"), col("writerVersion"), col("vmin"),
        col("vmax"), col("vsum"), col("vabs"))
      .as[(Seq[Long], Long, Option[Double], Option[Double],
        Option[Double], Option[Double])]
      .filter { t: (Seq[Long], Long, Option[Double], Option[Double],
          Option[Double], Option[Double]) =>
        t._1.indices.forall(i => t._1(i) < grid(i))
      }
      .map { case (cc, wver, zmn, zmx, zs, za) =>
        val stale = !GraftScan.tileClean(cc, vL, metasL(wver))
        val cells = ChunkCodec.tileSize(ChunkCodec.tileDims(vL, cc))
        (zmn, zmx, if (zmn.isEmpty) 1L else 0L, if (stale) 1L else 0L,
          zs, za, if (zs.isEmpty) 1L else 0L, cells)
      }
      .toDF("vmin", "vmax", "unk", "stale", "vsum", "vabs", "sunk",
        "cells")
      .agg(min(col("vmin")), max(col("vmax")), count(lit(1)),
        sum(col("unk")), sum(col("stale")), sum(col("vsum")),
        sum(col("vabs")), sum(col("sunk")), sum(col("cells")))
      .head()
    ZoneAggStats(
      if (r.isNullAt(0)) None else Some(r.getDouble(0)),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)),
      r.getLong(2),
      if (r.isNullAt(3)) 0L else r.getLong(3),
      if (r.isNullAt(4)) 0L else r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getDouble(5)),
      if (r.isNullAt(6)) None else Some(r.getDouble(6)),
      if (r.isNullAt(7)) 0L else r.getLong(7),
      if (r.isNullAt(8)) 0L else r.getLong(8))
  }

  private def canPushValueAgg: Boolean =
    fullBox && zoneStats.unknownZones == 0L && zoneStats.stale == 0L

  /** SUM/AVG(value) fold of the whole table, from the zone sum stats
    * plus the fill closed form over unwritten grid chunks. Some(total,
    * totalCells) only when the fold is DETERMINISTIC: every live tile
    * carries exact sum stats (vsum/vabs non-null), no tile is
    * shape-stale (stale tiles decode with current fill the stats never
    * saw), and either the total is a deterministic IEEE non-finite
    * (NaN/±Inf dominate any fold order) or the absolute mass stays
    * within the 2^52 any-order-exact bound. None declines the
    * pushdown — Spark then folds the scan itself.
    */
  private lazy val sumInfo: Option[(Double, Long)] = {
    val zs = zoneStats
    if (zs.unknownSums > 0L || zs.stale > 0L) None
    else {
      val n = v.shape.foldLeft(1L)(_ * _)
      val missing = n - zs.liveCells
      val f = v.fillValue
      val fillStat: Option[(Double, Double)] =
        if (missing == 0L) Some((0.0, 0.0))
        else if (f.isNaN) Some((Double.NaN, Double.NaN))
        else if (f.isInfinite) Some((f, Double.PositiveInfinity))
        else if (f != math.rint(f)) None
        else Some((f * missing, math.abs(f) * missing))
      fillStat.flatMap { case (fSum, fAbs) =>
        val total = zs.sum.getOrElse(0.0) + fSum
        val absTotal = zs.abs.getOrElse(0.0) + fAbs
        if (total.isNaN || total.isInfinite) Some((total, n))
        else if (absTotal <= GraftDataset.SumExactBound) Some((total, n))
        else None
      }
    }
  }

  /** An integral-dtype SUM result must be an exact long — a non-finite
    * total (possible only through a non-finite fill on a legacy
    * variable) cannot complete-push there.
    */
  private def sumRepresentable(total: Double): Boolean =
    GraftTableProvider.schemaFor(v)("value").dataType match {
      case DoubleType | FloatType => true
      case _ => !total.isNaN && !total.isInfinite
    }

  private def canPushAgg(agg: Aggregation): Boolean =
    // a change-window scan (startVersion > 0) is SPARSE — the dense
    // closed forms below do not hold over it
    startVersion == 0L &&
    filtersExact && agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().nonEmpty &&
      agg.aggregateExpressions().forall {
        case _: CountStar => true
        // COUNT(col): a dense read emits every box cell and neither
        // coordinates nor `value` are ever null (fill is a value, NaN
        // included), so the count is the box closed form. `_version`
        // IS null on fill cells — not pushable.
        case c: AggCount =>
          !c.isDistinct &&
            (refDim(c.column).isDefined || refValue(c.column))
        case m: AggMin =>
          refDim(m.column).isDefined ||
            (refValue(m.column) && canPushValueAgg)
        case m: AggMax =>
          refDim(m.column).isDefined ||
            (refValue(m.column) && canPushValueAgg)
        case s: AggSum =>
          !s.isDistinct && refValue(s.column) && fullBox &&
            sumInfo.exists(t => sumRepresentable(t._1))
        case a: AggAvg =>
          !a.isDistinct && refValue(a.column) && fullBox &&
            sumInfo.isDefined
        case _ => false
      }

  /** Region-cut SUM(value) partial-pushes only when every contribution
    * any bin can emit is deterministic: every live tile carries exact
    * sum stats (vsum non-null covers its every cell SUBSET — boundary
    * decodes included), nothing is shape-stale (stale decodes emit
    * current-fill cells the stats never accounted), and the GLOBAL
    * absolute mass (fill included) is within the any-order-exact
    * bound — the region's is at most that. sumInfo checks exactly
    * these.
    */
  private def canPushPartialSum: Boolean =
    sumInfo.exists(t => sumRepresentable(t._1))

  /** PARTIAL pushdown fallback for MIN/MAX/SUM(value) when the box is
    * region-cut (or legacy rows lack zones): each scan partition folds
    * interior tiles straight from their zone stats and decodes only
    * the region-boundary (and stat-less) tiles, emitting one partial
    * row that Spark re-aggregates. Closed-form aggs (COUNT(*)/
    * COUNT(col), dim min/max) may ride along — the partition emits
    * their box closed forms, which final-merge to the same answers.
    */
  /** GROUP BY pushdown: grouping by coordinate dims partial-pushes.
    * Counts and dim min/max are box closed forms PER GROUP at any
    * chunking (a dense box is a perfect grid: every group holds the
    * same per-dim spans). Value aggs additionally need GROUP-PURE
    * tiles — `chunkDims(d) == 1` on every grouped dim, so a tile
    * belongs to exactly one group and its zone stats fold straight
    * into that group's accumulator (chunk the time axis at 1 and
    * "daily sums over a century" reads zone stats, not cells).
    */
  private def groupDimsOf(agg: Aggregation): Option[Seq[Int]] = {
    val ds = agg.groupByExpressions().map {
      case r: NamedReference if r.fieldNames.length == 1 =>
        dimOf(r.fieldNames()(0))
      case _ => None
    }
    if (ds.nonEmpty && ds.forall(_.isDefined)) Some(ds.map(_.get).toSeq)
    else None
  }

  private def groupPure(dims: Seq[Int]): Boolean =
    dims.forall(d => v.chunkDims(d) == 1L)

  private def canPushPartialAgg(agg: Aggregation): Boolean = {
    val grouped = agg.groupByExpressions().nonEmpty
    val gdims = groupDimsOf(agg)
    val valueAggs = agg.aggregateExpressions().exists {
      case m: AggMin => refValue(m.column)
      case m: AggMax => refValue(m.column)
      case s: AggSum => refValue(s.column)
      case _ => false
    }
    startVersion == 0L && filtersExact &&
      (!grouped || gdims.isDefined) &&
      agg.aggregateExpressions().nonEmpty &&
      // ungrouped partials exist to salvage a region-cut VALUE agg
      // (closed forms complete-push on their own); grouped partials
      // are worthwhile for closed forms alone
      (grouped || valueAggs) &&
      (!valueAggs || !grouped || gdims.exists(groupPure)) &&
      agg.aggregateExpressions().forall {
        case _: CountStar => true
        case c: AggCount =>
          !c.isDistinct &&
            (refDim(c.column).isDefined || refValue(c.column))
        case m: AggMin => refDim(m.column).isDefined || refValue(m.column)
        case m: AggMax => refDim(m.column).isDefined || refValue(m.column)
        case s: AggSum =>
          !s.isDistinct && refValue(s.column) && canPushPartialSum
        case _ => false
      }
  }

  /** LIMIT pushdown as a PLANNING-level box clip: a dense read's row
    * set IS the region box, so any n of its cells satisfy an unordered
    * LIMIT n — the builder shrinks the box to the smallest dim-0 slice
    * prefix holding >= n cells and plans only that, instead of
    * scheduling (and decoding) the whole grid for Spark to drop. Clip
    * is sound only when no residual filter can remove rows
    * (filtersExact) and the read is dense (startVersion == 0; the
    * change feed is sparse). Partial pushdown: Spark still applies its
    * own exact Limit on top.
    */
  override def pushLimit(limit: Int): Boolean = {
    if (limit > 0 && rank >= 1 && startVersion == 0L && !liveOnly &&
        filtersExact) {
      limitClip = Some(limit); true
    } else false
  }

  // both clips are supersets; Spark's exact Limit / TopN runs on top
  override def isPartiallyPushed(): Boolean = true

  /** TopN pushdown, same clip idea along the LEADING sort dimension:
    * for ORDER BY x_d [ASC|DESC] LIMIT n, the k = ceil(n / sliceRows)
    * lowest (resp. highest) x_d slices contain every row that can
    * rank in the global top n — any excluded row has a strictly
    * worse x_d than >= n included rows, whatever the later sort keys
    * say. Partial push: Spark's exact TopSort+Limit runs on the
    * clipped superset.
    */
  override def pushTopN(orders: Array[
      org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.SortDirection
    val leadDim = orders.headOption.flatMap(o => refDim(o.expression()))
    leadDim match {
      case Some(d) if limit > 0 && startVersion == 0L && !liveOnly &&
          filtersExact =>
        topNClip = Some((d, limit,
          orders.head.direction() == SortDirection.DESCENDING))
        true
      case _ => false
    }
  }

  private var aggComplete = false

  // agg folds assume the dense cell view (fill included); a live-only
  // scan (row-level DML) emits written non-fill cells only, so both
  // pushdown forms are off there
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    !liveOnly && canPushAgg(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    if (liveOnly) false
    else if (canPushAgg(agg)) {
      pushedAgg = Some(agg); aggComplete = true; true
    } else if (canPushPartialAgg(agg)) {
      pushedAgg = Some(agg); aggComplete = false; true
    } else false

  override def build(): Scan = pushedAgg match {
    case Some(agg) if !aggComplete =>
      // partial pushdown: the scan itself folds zones/decodes per
      // partition (see GraftScan.partialAggSpecs)
      val specs: Seq[PartialAggSpec] = agg.aggregateExpressions().map {
        case _: CountStar => PartialAggSpec.Count: PartialAggSpec
        case _: AggCount => PartialAggSpec.Count: PartialAggSpec
        case m: AggMin =>
          refDim(m.column).map(PartialAggSpec.DimMin)
            .getOrElse(PartialAggSpec.ValMin)
        case m: AggMax =>
          refDim(m.column).map(PartialAggSpec.DimMax)
            .getOrElse(PartialAggSpec.ValMax)
        case _: AggSum => PartialAggSpec.ValSum: PartialAggSpec
        case other => throw new IllegalStateException(other.toString)
      }.toSeq
      new GraftScan(path, variable, asOf, v, metas,
        GraftTableProvider.schemaFor(v, withVersion),
        lo.toSeq.zip(hi.toSeq), startVersion, maxVersionsPerBatch,
        valuePreds, partialAggSpecs = specs,
        groupDims = groupDimsOf(agg).getOrElse(Seq.empty))
    case Some(agg) =>
      val boxDims = (0 until rank).map(i =>
        math.max(0L, math.min(hi(i), v.shape(i)) - math.max(0L, lo(i))))
      val n = boxDims.foldLeft(1L)(_ * _)
      // NaN-greatest fold (java.lang.Double.compare), matching both
      // the zone-map convention and Spark's Min/Max ordering
      def tmin(a: Double, b: Double): Double =
        if (java.lang.Double.compare(a, b) <= 0) a else b
      def tmax(a: Double, b: Double): Double =
        if (java.lang.Double.compare(a, b) >= 0) a else b
      lazy val gridChunks = v.chunkGrid.foldLeft(1L)(_ * _)
      lazy val (valueMin, valueMax): (Double, Double) = {
        val zs = zoneStats
        val anyFill = zs.live < gridChunks
        val mn0 = zs.zmin.getOrElse(v.fillValue)
        val mx0 = zs.zmax.getOrElse(v.fillValue)
        (if (anyFill) tmin(mn0, v.fillValue) else mn0,
          if (anyFill) tmax(mx0, v.fillValue) else mx0)
      }
      val valueDt = GraftTableProvider.schemaFor(v)("value").dataType
      def typedValue(dv: Double): (DataType, Any) = valueDt match {
        case DoubleType  => (DoubleType, java.lang.Double.valueOf(dv))
        case FloatType   => (FloatType, java.lang.Float.valueOf(dv.toFloat))
        case IntegerType => (IntegerType, java.lang.Integer.valueOf(dv.toInt))
        case ShortType   => (ShortType, java.lang.Short.valueOf(dv.toShort))
        case LongType    => (LongType, java.lang.Long.valueOf(dv.toLong))
        case other => throw new IllegalStateException(s"value type $other")
      }
      // SUM result rides Spark's Sum output type (LongType for
      // integral inputs, DoubleType for fractional); AVG is always a
      // double — one division of the exact total, deterministic
      lazy val sumTotal: Double = sumInfo.get._1
      def typedSum(total: Double): (DataType, Any) = valueDt match {
        case DoubleType | FloatType =>
          (DoubleType, java.lang.Double.valueOf(total))
        case _ => (LongType, java.lang.Long.valueOf(total.toLong))
      }
      def sumDt: DataType = valueDt match {
        case DoubleType | FloatType => DoubleType
        case _ => LongType
      }
      val values: Array[(DataType, Any)] =
        agg.aggregateExpressions().map {
          case _: CountStar =>
            (LongType, java.lang.Long.valueOf(n)): (DataType, Any)
          case _: AggCount =>
            (LongType, java.lang.Long.valueOf(n)): (DataType, Any)
          case m: AggMin if refValue(m.column) =>
            if (n == 0) (valueDt, null) else typedValue(valueMin)
          case m: AggMax if refValue(m.column) =>
            if (n == 0) (valueDt, null) else typedValue(valueMax)
          case s: AggSum if refValue(s.column) =>
            if (n == 0) (sumDt, null) else typedSum(sumTotal)
          case a: AggAvg if refValue(a.column) =>
            if (n == 0) (DoubleType, null)
            else (DoubleType, java.lang.Double.valueOf(sumTotal / n))
          case m: AggMin =>
            if (n == 0) (LongType, null)
            else (LongType,
              java.lang.Long.valueOf(math.max(0L, lo(refDim(m.column).get))))
          case m: AggMax =>
            if (n == 0) (LongType, null)
            else {
              val d = refDim(m.column).get
              (LongType,
                java.lang.Long.valueOf(math.min(hi(d), v.shape(d)) - 1))
            }
          case other => throw new IllegalStateException(other.toString)
        }
      new GraftAggScan(values)
    case None =>
      val region0 = (0 until rank).map(i =>
        (math.max(0L, lo(i)), math.min(hi(i), v.shape(i))))
      // both clips: smallest slice prefix (or suffix, for a
      // descending TopN) along the clip dim that covers >= n cells
      def clip(dim: Int, n: Int, fromHigh: Boolean): Seq[(Long, Long)] = {
        val rowsPerSlice = region0.indices.filter(_ != dim)
          .map(i => math.max(0L, region0(i)._2 - region0(i)._1))
          .foldLeft(1L)(_ * _)
        if (rowsPerSlice <= 0L) region0
        else {
          val slices = (n + rowsPerSlice - 1) / rowsPerSlice
          val (l, h) = region0(dim)
          val nb =
            if (fromHigh) (math.max(l, h - slices), h)
            else (l, math.min(h, l + slices))
          region0.updated(dim, nb)
        }
      }
      val region = (limitClip, topNClip) match {
        case (_, Some((d, n, desc))) => clip(d, n, desc)
        case (Some(n), _) if rank >= 1 => clip(0, n, fromHigh = false)
        case _ => region0
      }
      new GraftScan(path, variable, asOf, v, metas, required,
        region, startVersion, maxVersionsPerBatch,
        valuePreds,
        limitHint = limitClip.orElse(topNClip.map(_._2)),
        liveOnly = liveOnly)
  }
}

/** One-row scan carrying complete-pushdown aggregate results — typed
  * per aggregate: coordinate min/max and COUNT(*) are longs, value
  * min/max carry the variable's element dtype (answered from zone
  * maps, zero chunk reads).
  */
class GraftAggScan(values: Array[(DataType, Any)])
    extends Scan with Batch with Serializable {
  override def readSchema(): StructType =
    StructType(values.zipWithIndex.map { case ((dt, _), i) =>
      StructField(s"agg$i", dt, nullable = true)
    })
  override def description(): String =
    s"GraftAggScan(pushed aggregates = ${values.length})"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] = {
        val vs = partition.asInstanceOf[GraftAggPartition].values
        new PartitionReader[InternalRow] {
          private var done = false
          override def next(): Boolean = !done && { done = true; true }
          override def get(): InternalRow = {
            val row = new GenericInternalRow(vs.length)
            vs.indices.foreach { i =>
              vs(i) match {
                case (_, null) => row.setNullAt(i)
                case (LongType, x: java.lang.Long) =>
                  row.setLong(i, x.longValue())
                case (DoubleType, x: java.lang.Double) =>
                  row.setDouble(i, x.doubleValue())
                case (FloatType, x: java.lang.Float) =>
                  row.setFloat(i, x.floatValue())
                case (IntegerType, x: java.lang.Integer) =>
                  row.setInt(i, x.intValue())
                case (ShortType, x: java.lang.Short) =>
                  row.setShort(i, x.shortValue())
                case (dt, x) => throw new IllegalStateException(
                  s"agg cell $dt/$x")
              }
            }
            row
          }
          override def close(): Unit = ()
        }
      }
    }
}

case class GraftAggPartition(values: Array[(DataType, Any)])
  extends InputPartition

/** One pushed aggregate of a PARTIAL pushdown (region-cut MIN/MAX
  * over `value`, with closed-form COUNT(*)/dim aggs riding along).
  */
sealed trait PartialAggSpec extends Serializable
object PartialAggSpec {
  case object Count extends PartialAggSpec
  case class DimMin(d: Int) extends PartialAggSpec
  case class DimMax(d: Int) extends PartialAggSpec
  case object ValMin extends PartialAggSpec
  case object ValMax extends PartialAggSpec
  case object ValSum extends PartialAggSpec
}

object GraftScan {
  /** JVM-wide count of chunks skipped by zone maps — plan-shape
    * instrumentation for local-mode tests (the data-skipping analog of
    * GraftDataset.versionListEntries).
    */
  val zoneSkippedChunks = new java.util.concurrent.atomic.AtomicLong

  /** Partial-agg fold accounting: tiles answered straight from zone
    * maps vs tiles that had to decode (region boundary / legacy rows).
    */
  val aggTilesFromZones = new java.util.concurrent.atomic.AtomicLong
  val aggTilesDecoded = new java.util.concurrent.atomic.AtomicLong

  /** A tile's zone map is exact for CURRENT reads only when the cell
    * range it was written under equals its range under the current
    * metadata: a grow past the tile adds current-fill cells its zones
    * never saw, a shrink into it removes cells they did see, and a
    * chunkDims change relocates it entirely.
    */
  private[sources] def tileClean(cc: Seq[Long], cur: VariableMeta,
      writer: VariableMeta): Boolean =
    writer.chunkDims == cur.chunkDims &&
      cc.indices.forall { i =>
        val end = (cc(i) + 1) * cur.chunkDims(i)
        math.min(end, cur.shape(i)) == math.min(end, writer.shape(i))
      }
}

class GraftScan(path: String, variable: String, asOf: Long,
    v: VariableMeta, metas: Map[Long, VariableMeta],
    required: StructType, initialRegion: Seq[(Long, Long)],
    startVersion: Long = 0L, maxVersionsPerBatch: Option[Int] = None,
    valuePreds: Seq[Filter] = Seq.empty,
    partialAggSpecs: Seq[PartialAggSpec] = Seq.empty,
    groupDims: Seq[Int] = Seq.empty,
    limitHint: Option[Int] = None,
    liveOnly: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering with SupportsReportPartitioning
    with SupportsReportOrdering with Serializable {

  // the effective region box; runtime filters (joins against
  // selective build sides — Spark's DPP analog for DSv2) tighten it
  // further before partitions are planned
  private var region: Seq[(Long, Long)] = initialRegion

  /** Chunk-keyed (storage-partitioned) scan mode: one InputPartition
    * per pruned-box chunk cell, each exposing its cell index through
    * HasPartitionKey, with [[outputPartitioning]] reporting the
    * matching KeyGroupedPartitioning over `chunk(size, xI)`
    * transforms ([[GraftFunctions]]). Decided ONCE at construction
    * and never revisited: Spark requires a keyed partition set to
    * stay stable through runtime filtering, so keyed scans also opt
    * out of runtime region tightening ([[filterAttributes]] empty).
    * Opt-in (`spark.graft.scan.keyedPartitions`) and bounded
    * (`….max` cells, default 65536): chunk-per-task is the right
    * granularity for co-partitioned joins, not for plain scans —
    * and at 100 TB a co-partitioned join wants coarse chunk tiles
    * anyway, so the cell count stays in task-count territory.
    */
  private val keyedMode: Boolean = {
    val conf = SparkSession.active.conf
    conf.getOption("spark.graft.scan.keyedPartitions")
      .exists(_.toBoolean) &&
    v.shape.nonEmpty && partialAggSpecs.isEmpty && groupDims.isEmpty &&
    limitHint.isEmpty && startVersion == 0L && {
      val n = prunedCells(initialRegion)
      val max = conf.getOption("spark.graft.scan.keyedPartitions.max")
        .map(_.toLong).getOrElse(65536L)
      n >= 1 && n <= max
    }
  }

  /** In keyed mode each partition is ONE chunk, and the readers (row
    * and columnar) emit its cells in row-major offset order — i.e.
    * ascending lexicographic (x0, x1, …) within the partition. Report
    * that, and a storage-partitioned sort-merge join drops its Sorts
    * too: the join becomes a pure streamed merge of chunk pairs.
    * Ordering is claimed only for the projected coordinate PREFIX
    * (rows sorted by (x0, x1) are sorted by x0 alone, but not by x1
    * alone), and never for multi-chunk bins, whose concatenation
    * re-interleaves the minor dimensions.
    */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    if (!keyedMode) Array.empty
    else {
      import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
      v.shape.indices.iterator
        .map(i => s"x$i")
        .takeWhile(n => required.fieldNames.contains(n))
        .map(n => Expressions.sort(Expressions.column(n),
          SortDirection.ASCENDING))
        .toArray
    }

  /** Chunk cells in the region-pruned box. */
  private def prunedCells(r: Seq[(Long, Long)]): Long = {
    val dims = r.indices.map { i =>
      val lo = math.max(0L, r(i)._1 / v.chunkDims(i))
      val hi = math.min(v.chunkGrid(i), ceilDiv(r(i)._2, v.chunkDims(i)))
      hi - lo
    }
    if (dims.exists(_ <= 0L)) 0L else dims.foldLeft(1L)(_ * _)
  }

  /** Storage-partitioned join support: in keyed mode the scan
    * reports clustering by the chunk-grid transforms
    * `chunk(chunkDim_i, x_i)`, one partition per pruned-box cell.
    * With `spark.sql.sources.v2.bucketing.enabled`, a join between
    * two variables with the SAME per-dimension chunk sizes, keyed on
    * all coordinate columns, then plans with ZERO shuffle on either
    * side — chunk pairs stream straight into the join.
    */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (!keyedMode)
      new org.apache.spark.sql.connector.read.partitioning
        .UnknownPartitioning(0)
    else {
      import org.apache.spark.sql.connector.expressions.Expressions
      val keys = v.shape.indices.map { i =>
        Expressions.apply(GraftFunctions.sizedName(v.chunkDims(i)),
          Expressions.column(s"x$i"))
          : org.apache.spark.sql.connector.expressions.Expression
      }.toArray
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(keys, prunedCells(region).toInt)
    }

  /** Runtime filtering: join-produced In/EqualTo/bound values on
    * coordinate columns shrink the box (and with it the planned
    * chunk-id ranges). The box is a conservative hull — Spark still
    * applies the join itself, so gaps inside an In-set are harmless.
    */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (keyedMode) Array.empty // keyed partitions must stay stable
    else v.shape.indices.map(i =>
      org.apache.spark.sql.connector.expressions.Expressions.column(s"x$i"))
      .toArray

  override def filter(filters: Array[Filter]): Unit = {
    val lo = region.map(_._1).toArray
    val hi = region.map(_._2).toArray
    def dimOf(attr: String): Option[Int] =
      if (attr.startsWith("x"))
        attr.drop(1).toIntOption.filter(_ < v.shape.length)
      else None
    filters.foreach {
      case sources.In(a, values) if values.nonEmpty =>
        dimOf(a).foreach { d =>
          val longs = values.collect { case x: java.lang.Long => x.longValue() }
          if (longs.length == values.length) {
            lo(d) = math.max(lo(d), longs.min)
            hi(d) = math.min(hi(d), longs.max + 1)
          }
        }
      case sources.EqualTo(a, x: Long) =>
        dimOf(a).foreach { d =>
          lo(d) = math.max(lo(d), x); hi(d) = math.min(hi(d), x + 1)
        }
      case sources.GreaterThanOrEqual(a, x: Long) =>
        dimOf(a).foreach(d => lo(d) = math.max(lo(d), x))
      case sources.LessThan(a, x: Long) =>
        dimOf(a).foreach(d => hi(d) = math.min(hi(d), x))
      case _ => ()
    }
    region = lo.toSeq.zip(hi.toSeq)
  }

  override def readSchema(): StructType =
    if (partialAggSpecs.isEmpty) required
    else {
      val vt = GraftTableProvider.schemaFor(v)("value").dataType
      // SUM partials carry Spark's Sum result type: LongType for
      // integral value dtypes, DoubleType for fractional ones
      val st = vt match {
        case DoubleType | FloatType => DoubleType
        case _ => LongType
      }
      // grouped partials lead with the group columns (Spark's partial
      // pushdown schema convention: groupBy cols, then agg cols)
      StructType(
        groupDims.map(d =>
          StructField(s"x$d", LongType, nullable = false)) ++
        partialAggSpecs.zipWithIndex.map { case (s, i) =>
          StructField(s"agg$i", s match {
            case PartialAggSpec.ValMin | PartialAggSpec.ValMax => vt
            case PartialAggSpec.ValSum => st
            case _ => LongType
          }, nullable = true)
        })
    }

  /** Cell-exact cardinality from the region box (dense reads emit
    * every cell, fill included) — lets Catalyst make sane
    * broadcast/join decisions when graft tables join other sources.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    // a change-window scan (startVersion > 0) is sparse — the dense
    // box count can overstate it by orders of magnitude, which would
    // block broadcasting small change feeds; report unknown and let
    // AQE size it at runtime. A partial-agg scan emits one row per
    // partition, not the dense box — also unknown.
    private val dense =
      startVersion == 0L && !liveOnly && partialAggSpecs.isEmpty
    private val rows =
      region.map { case (l, h) => math.max(0L, h - l) }
        .foldLeft(1L)(_ * _)
    private val rowBytes = 8L * required.length
    override def sizeInBytes(): java.util.OptionalLong =
      if (dense) java.util.OptionalLong.of(rows * rowBytes)
      else java.util.OptionalLong.empty()
    override def numRows(): java.util.OptionalLong =
      if (dense) java.util.OptionalLong.of(rows)
      else java.util.OptionalLong.empty()
  }
  override def description(): String =
    s"GraftScan($variable@$asOf, region=$region, cols=" +
      s"${required.fieldNames.mkString(",")}" +
      (if (valuePreds.nonEmpty) s", zoneSkip=[${valuePreds.mkString(", ")}]"
       else "") +
      (if (partialAggSpecs.nonEmpty)
        s", partialAgg=[${partialAggSpecs.mkString(", ")}]"
       else "") +
      (if (groupDims.nonEmpty)
        s", groupBy=[${groupDims.map(d => s"x$d").mkString(", ")}]"
       else "") +
      (if (liveOnly) ", liveOnly" else "") +
      limitHint.fold("")(n => s", limitClip=$n") + ")"
  override def toBatch: Batch = this

  /** Streaming form: the dataset's commit log as a changelog — each
    * committed version's written chunks become that micro-batch's
    * rows (decoded under the writer's metadata; region and column
    * pruning apply). Offsets are version ids, so restarts resume
    * exactly from the checkpointed version.
    */
  override def toMicroBatchStream(
      checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(path, v.idx, required, region.toArray,
      startVersion, maxVersionsPerBatch, valuePreds, v.lineage)

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val ds = new GraftDataset(spark, path)
    import spark.implicits._
    val chunkDims = v.chunkDims
    val grid = v.chunkGrid
    val rank = grid.length

    // the chunk-level pruned set is a BOX: per-dim chunk ranges
    // [cLo, cHi) — no enumeration needed to know it
    val cLo = region.indices.map(i =>
      math.max(0L, region(i)._1 / chunkDims(i))).toArray
    val cHi = region.indices.map(i =>
      math.min(grid(i), ceilDiv(region(i)._2, chunkDims(i)))).toArray
    val boxDims = cLo.indices.map(i => cHi(i) - cLo(i)).toArray
    if (boxDims.exists(_ <= 0L) && rank > 0)
      return Array.empty
    val nPruned = boxDims.foldLeft(1L)(_ * _) max 1L

    val nBins = math.min(nPruned,
      math.max(spark.sparkContext.defaultParallelism.toLong * 2, 16L)).toInt
    // keyed mode: bin == chunk cell, so every partition has ONE key
    val binSize = if (keyedMode) 1L else ceilDiv(nPruned, nBins.toLong)
    val actualBins = ceilDiv(nPruned, binSize).toInt

    // keyed mode: attach the absolute chunk-cell coords as the
    // HasPartitionKey key (binSize == 1 ⇒ the bin IS one cell)
    def keyWrap(p: GraftBinPartition): InputPartition =
      if (!keyedMode) p
      else {
        var cid = p.startCid
        val key = new Array[Long](boxDims.length)
        var d = boxDims.length - 1
        while (d >= 0) {
          key(d) = cLo(d) + cid % boxDims(d); cid /= boxDims(d); d -= 1
        }
        GraftCellPartition(p, key)
      }

    // zone-map skipping: with pushed value predicates, drop entries
    // whose [vmin, vmax] provably cannot satisfy them. On a DENSE scan
    // a dropped entry reads back as fill cells, so skipping also
    // requires the fill value to fail the predicates (the residual
    // filter then removes those cells exactly like the chunk's real
    // values would have been); a change-window scan (startVersion > 0)
    // is sparse — dropped entries emit nothing — so fill is moot.
    // Null bounds (pre-zone-map rows, all-NaN tiles) always keep.
    // SHAPE-STALE tiles (written under a different shape clamp) are
    // safe to skip by, unlike the agg folds: grown-in cells read fill,
    // which the fill proof already covers, and shrunk-away cells only
    // WIDEN the zone range, making a skip strictly harder.
    // a live-only scan is sparse too: zone-dropped chunks emit
    // nothing, and their cells failing the predicate is exactly what
    // the residual would enforce — fill never surfaces
    val fillSafe = startVersion > 0L || liveOnly ||
      !valuePreds.forall(f => ZonePredicates.satisfiedBy(f, v.fillValue))
    val zonePreds: Seq[Filter] =
      if (valuePreds.nonEmpty && fillSafe) valuePreds else Seq.empty

    // resolve the as-of index ONCE, distributed
    val cLoL = cLo; val boxDimsL = boxDims; val binSizeL = binSize
    val hc = ds.hconf
    val resolved0 = ds.resolveIndex(v.idx, asOf)
      .select(col("coord"), col("writerVersion"), col("chunkHash"),
        col("vmin"), col("vmax"), col("vsum"))
    val resolved = (if (zonePreds.isEmpty) resolved0
      else resolved0
        .as[(Seq[Long], Long, String, Option[Double], Option[Double],
          Option[Double])]
        .filter { t: (Seq[Long], Long, String,
            Option[Double], Option[Double], Option[Double]) =>
          val keep = (t._4, t._5) match {
            case (Some(mn), Some(mx)) =>
              zonePreds.forall(ZonePredicates.couldSatisfy(_, mn, mx))
            case _ => true // unknown range: never skip
          }
          if (!keep) GraftScan.zoneSkippedChunks.incrementAndGet()
          keep
        }.toDF("coord", "writerVersion", "chunkHash", "vmin", "vmax",
          "vsum"))
      .select(col("coord"), col("writerVersion"), col("chunkHash"),
        col("vmin"), col("vmax"), col("vsum"))
    // batch change feed: `startVersion` restricts the scan to chunks
    // whose WINNING write landed in (startVersion, asOf] — the batch
    // analog of the streaming offset window. writerVersion (not the
    // resolution versionId) is the test: index compaction rewrites
    // rows under the fold boundary's versionId, which would falsely
    // admit long-unchanged cells. The read is then SPARSE (changed
    // chunks only; see createReaderFactory) — a DELETE's fill write
    // surfaces as fill-valued cells, an epoch swap (TRUNCATE /
    // INSERT OVERWRITE) surfaces only post-swap writes.
    val entries = (if (startVersion > 0L)
        resolved.filter(col("writerVersion") > startVersion)
      else resolved)
      .as[(Seq[Long], Long, String, Option[Double], Option[Double],
        Option[Double])]
      .filter { t: (Seq[Long], Long, String,
          Option[Double], Option[Double], Option[Double]) =>
        t._1.indices.forall(i =>
          t._1(i) >= cLoL(i) && t._1(i) < cLoL(i) + boxDimsL(i))
      }
      .map { case (cc, ver, h, zmn, zmx, zsum) =>
        var cid = 0L
        var d = 0
        while (d < boxDimsL.length) {
          cid = cid * boxDimsL(d) + (cc(d) - cLoL(d)); d += 1
        }
        ((cid / binSizeL).toInt, cid, ver, h, zmn, zmx, zsum)
      }
      .toDF("bin", "cid", "ver", "h", "zmn", "zmx", "zsum")

    // hybrid shipping: a small resolved set (≤ threshold entries)
    // rides inline in the InputPartitions (one bounded limit+collect,
    // no scan files); a large one is written to per-bin manifest files
    // on the shared store so the driver never materializes per-chunk
    // rows. The resolved set is PERSISTED across the size probe and
    // the manifest write: the probe's limit job materializes the
    // resolve (index scan + as-of shuffle) into the cache, and the
    // large path's manifest job reuses it — ONE resolve job per scan,
    // not two full index resolutions at a billion-tile grid.
    val threshold = spark.conf.getOption("spark.graft.scan.inlineThreshold")
      .map(_.toInt).getOrElse(10000)
    entries.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val probe = entries
        .as[(Int, Long, Long, String, Option[Double], Option[Double],
          Option[Double])]
        .limit(threshold + 1).collect()
      if (probe.length <= threshold) {
        val byBin = probe.groupBy(_._1)
        (0 until actualBins).map { b =>
          val start = b.toLong * binSize
          val end = math.min(nPruned, start + binSize)
          keyWrap(GraftBinPartition(b, start, end, "",
            Some(byBin.getOrElse(b, Array.empty)
              .map(t =>
                (t._2, t._3, t._4, t._5, t._6, t._7)))))
        }.toArray
      } else {
        val scanId = java.util.UUID.randomUUID().toString.take(12)
        val scanDir = s"${ds.scansDir}/$scanId"
        entries.repartition(actualBins, col("bin"))
          .sortWithinPartitions(col("bin"), col("cid"))
          .as[(Int, Long, Long, String, Option[Double], Option[Double],
            Option[Double])]
          .foreachPartition {
            it: Iterator[(Int, Long, Long, String,
              Option[Double], Option[Double], Option[Double])] =>
            // one sequential pass; a new file whenever the bin changes
            // (bins hash to partitions, so a partition may hold several)
            val fsLocal = new Path(scanDir).getFileSystem(hc.value)
            var curBin = -1
            var out: java.io.PrintWriter = null
            it.foreach { case (bin, cid, ver, h, zmn, zmx, zsum) =>
              if (bin != curBin) {
                if (out != null) out.close()
                out = new java.io.PrintWriter(
                  fsLocal.create(new Path(scanDir, s"bin-$bin.idx"), true))
                curBin = bin
              }
              // zone stats ride along ("-" = unknown/legacy) so the
              // partial-agg reader can fold interior tiles without
              // decoding; the row/columnar readers ignore them
              out.println(s"$cid $ver $h " +
                s"${zmn.map(_.toString).getOrElse("-")} " +
                s"${zmx.map(_.toString).getOrElse("-")} " +
                s"${zsum.map(_.toString).getOrElse("-")}")
            }
            if (out != null) out.close()
          }
        (0 until actualBins).map { b =>
          val start = b.toLong * binSize
          val end = math.min(nPruned, start + binSize)
          keyWrap(GraftBinPartition(b, start, end, scanDir, None))
        }.toArray
      }
    } finally entries.unpersist()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val boxLo = region.indices.map(i =>
      math.max(0L, region(i)._1 / v.chunkDims(i))).toArray
    val boxDims = region.indices.map(i => math.max(0L,
      math.min(v.chunkGrid(i),
        ceilDiv(region(i)._2, v.chunkDims(i))) -
        math.max(0L, region(i)._1 / v.chunkDims(i)))).toArray
    val hc = new SerializableHadoopConf(
      SparkSession.active.sparkContext.hadoopConfiguration)
    if (partialAggSpecs.nonEmpty)
      new GraftPartialAggReaderFactory(s"$path/chunks", v, metas,
        partialAggSpecs, region.toArray, boxLo, boxDims, hc, groupDims)
    else
      new GraftReaderFactory(s"$path/chunks", v, metas, required,
        startVersion > 0L || liveOnly, region.toArray, boxLo, boxDims, hc,
        liveOnly)
  }
}

/** One bin: a contiguous range of linearized pruned-box chunk ids plus
  * the resolved entries for that range — inline for small scans, as a
  * per-bin scan-manifest file on the shared store for large ones.
  * Entries are (cid, writerVersion, chunkHash, vmin, vmax, vsum).
  */
case class GraftBinPartition(bin: Int, startCid: Long, endCid: Long,
    scanDir: String,
    inline: Option[Array[(Long, Long, String,
      Option[Double], Option[Double], Option[Double])]])
  extends InputPartition

object GraftBinPartition {
  /** Readers accept both plain bins and keyed single-cell bins. */
  def of(p: InputPartition): GraftBinPartition = p match {
    case c: GraftCellPartition => c.binPart
    case b: GraftBinPartition => b
  }
}

/** Keyed form of [[GraftBinPartition]] (binSize == 1): `cell` is the
  * absolute chunk-grid cell index vector, exposed as the partition
  * key that Spark's KeyGroupedPartitioning groups
  * storage-partitioned joins by.
  */
case class GraftCellPartition(binPart: GraftBinPartition,
    cell: Array[Long])
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(cell.map(x => x: Any))
}

class GraftReaderFactory(chunksDir: String, v: VariableMeta,
    metas: Map[Long, VariableMeta], required: StructType,
    sparse: Boolean,
    region: Array[(Long, Long)], boxLo: Array[Long], boxDims: Array[Long],
    hconf: SerializableHadoopConf,
    liveOnly: Boolean = false) extends PartitionReaderFactory {

  /** Shared traversal over one bin's cells: walks the (dense or
    * sparse) cid range, opens/decodes each chunk once, and yields
    * every in-region cell. Both the row and the columnar reader drive
    * this cursor, so region semantics, decode pruning and fill
    * synthesis cannot diverge between them.
    */
  private final class BinCursor(p: GraftBinPartition) {
    val fs: org.apache.hadoop.fs.FileSystem =
      new Path(chunksDir).getFileSystem(hconf.value)
    private val needsValue = required.fieldNames.contains("value")
    val dimIdx: Array[Int] = required.fieldNames
      .filter(n => n != "value" && n != "_version")
      .map(_.drop(1).toInt)
    private val rank = boxDims.length

    // bin manifest: cid -> (writer version, chunk hash)
    val index: java.util.HashMap[Long, (Long, String)] = {
      val m = new java.util.HashMap[Long, (Long, String)]()
      p.inline match {
        case Some(entries) =>
          entries.foreach { case (cid, ver, h, _, _, _) =>
            m.put(cid, (ver, h))
          }
        case None =>
          val f = new Path(p.scanDir, s"bin-${p.bin}.idx")
          if (fs.exists(f)) {
            val in = new java.io.BufferedReader(
              new java.io.InputStreamReader(fs.open(f), "UTF-8"))
            try {
              var line = in.readLine()
              while (line != null) {
                val parts = line.split(' ')
                m.put(parts(0).toLong, (parts(1).toLong, parts(2)))
                line = in.readLine()
              }
            } finally in.close()
          }
      }
      m
    }

    val valueType: DataType = required.fields
      .find(_.name == "value").map(_.dataType).getOrElse(DoubleType)

    // change-window (sparse) scans visit ONLY the manifest's chunks
    // — never the dense cid range, whose unwritten slots would
    // otherwise surface as fill cells that did not change
    private val sparseCids: Array[Long] =
      if (!sparse) null
      else {
        val it = index.keySet().iterator()
        val b = Array.newBuilder[Long]
        while (it.hasNext) {
          val k = it.next()
          if (k >= p.startCid && k < p.endCid) b += k
        }
        val a = b.result(); java.util.Arrays.sort(a); a
      }
    private var sparsePos = -1

    var cid: Long = p.startCid - 1
    var cc: Seq[Long] = _
    // (writer meta, doubles, longs) — exactly one array is non-null:
    // long cells decode through the exact path (no double rounding)
    var decoded: Option[(VariableMeta, Array[Double], Array[Long])] = None
    private var tileN = 0L
    private var off = -1L
    var cell: Seq[Long] = _

    private def openChunk(id: Long): Unit = {
      // delinearize the pruned-box cid back to an absolute chunk coord
      val a = new Array[Long](rank)
      var rest = id
      var d = rank - 1
      while (d >= 0) {
        a(d) = boxLo(d) + rest % boxDims(d); rest /= boxDims(d); d -= 1
      }
      cc = a.toSeq
      tileN = ChunkCodec.tileSize(ChunkCodec.tileDims(v, cc))
      off = -1L
      decoded =
        if (!needsValue) None
        else Option(index.get(id)).map { case (ver, h) =>
          // column pruning: payload decode skipped entirely when the
          // scan projects only coordinates
          val wv = metas(ver)
          val bytes = GraftDataset.readChunkFile(fs, chunksDir, h)
          if (valueType == LongType && wv.dtype == "long")
            (wv, null, ChunkCodec.decodeLongs(wv, bytes))
          else (wv, ChunkCodec.decodeValues(wv, bytes), null)
        }
    }

    /** Live-only scans (row-level DML) also drop written-fill cells —
      * a deleted cell is absent from the sparse view, so an UPDATE's
      * value predicate can never resurrect it. NaN-safe (a NaN fill
      * matches NaN cells). A coordinate-only projection skips the
      * payload decode; there the chunk-level sparse walk is the whole
      * filter (written chunks' cells all pass).
      */
    private def isFillCell(c: Seq[Long]): Boolean = decoded match {
      case Some((wv, vd, vl))
        if c.indices.forall(i => c(i) < wv.shape(i)) =>
        val o = ChunkCodec.offsetOf(wv, cc, c).toInt
        if (vl != null) vl(o) == v.fillValue
        else {
          val x = vd(o)
          x == v.fillValue || (x.isNaN && v.fillValue.isNaN)
        }
      case Some(_) => true // beyond the writer's shape: reads as fill
      case None => false // payload not decoded: keep
    }

    /** Move to the next in-region cell; false when the bin is done. */
    def advance(): Boolean = {
      while (true) {
        if (cid < p.startCid || off >= tileN - 1) {
          if (sparse) {
            sparsePos += 1
            if (sparsePos >= sparseCids.length) return false
            cid = sparseCids(sparsePos)
          } else {
            if (cid + 1 >= p.endCid) return false
            cid += 1
          }
          openChunk(cid)
        }
        while (off < tileN - 1) {
          off += 1
          val c = ChunkCodec.cellOf(v, cc, off)
          val inRegion = c.indices.forall(i =>
            c(i) >= region(i)._1 && c(i) < region(i)._2)
          if (inRegion && !(liveOnly && isFillCell(c))) {
            cell = c; return true
          }
        }
      }
      false
    }
  }

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = GraftBinPartition.of(partition)
    new PartitionReader[InternalRow] {
      private val cur = new BinCursor(p)
      private var current: InternalRow = _

      override def next(): Boolean = {
        if (!cur.advance()) return false
        val row = new GenericInternalRow(required.length)
        val cell = cur.cell
        var f = 0
        var d = 0
        while (f < required.length) {
          required.fields(f).name match {
            case "value" =>
              cur.decoded match {
                case Some((wv, vd, vl))
                  if cell.indices.forall(i => cell(i) < wv.shape(i)) =>
                  val o = ChunkCodec.offsetOf(wv, cur.cc, cell).toInt
                  if (vl != null) row.setLong(f, vl(o))
                  else GraftTableProvider.setCell(row, f, cur.valueType, vd(o))
                case _ =>
                  GraftTableProvider.setCell(row, f, cur.valueType, v.fillValue)
              }
            case "_version" =>
              Option(cur.index.get(cur.cid)) match {
                case Some((ver, _)) => row.setLong(f, ver)
                case None => row.setNullAt(f) // fill cell
              }
            case _ =>
              row.setLong(f, cell(cur.dimIdx(d))); d += 1
          }
          f += 1
        }
        current = row
        true
      }

      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }

  /** Vectorized reads: cells fill OnHeapColumnVectors in 4096-row
    * batches instead of one boxed InternalRow per cell — the scan
    * feeds whole-stage codegen through ColumnarToRow, and coordinate
    * columns write as primitive longs with no per-row dispatch.
    */
  override def supportColumnarReads(p: InputPartition): Boolean = true

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.ColumnarBatch
    val p = GraftBinPartition.of(partition)
    new PartitionReader[ColumnarBatch] {
      private val cur = new BinCursor(p)
      private val capacity = 4096
      private val vectors: Array[OnHeapColumnVector] =
        required.fields.map(f => new OnHeapColumnVector(capacity, f.dataType))
      private val batch =
        new ColumnarBatch(vectors.map(x =>
          x: org.apache.spark.sql.vectorized.ColumnVector))

      private def putValue(f: Int, i: Int, dv: Double): Unit =
        cur.valueType match {
          case DoubleType  => vectors(f).putDouble(i, dv)
          case FloatType   => vectors(f).putFloat(i, dv.toFloat)
          case ShortType   => vectors(f).putShort(i, dv.toShort)
          case IntegerType => vectors(f).putInt(i, dv.toInt)
          case LongType    => vectors(f).putLong(i, dv.toLong)
          case other => throw new IllegalStateException(s"cell type $other")
        }

      override def next(): Boolean = {
        var i = 0
        vectors.foreach(_.reset())
        while (i < capacity && cur.advance()) {
          val cell = cur.cell
          var f = 0
          var d = 0
          while (f < required.length) {
            required.fields(f).name match {
              case "value" =>
                cur.decoded match {
                  case Some((wv, vd, vl))
                    if cell.indices.forall(j => cell(j) < wv.shape(j)) =>
                    val o = ChunkCodec.offsetOf(wv, cur.cc, cell).toInt
                    if (vl != null) vectors(f).putLong(i, vl(o))
                    else putValue(f, i, vd(o))
                  case _ => putValue(f, i, v.fillValue)
                }
              case "_version" =>
                Option(cur.index.get(cur.cid)) match {
                  case Some((ver, _)) => vectors(f).putLong(i, ver)
                  case None => vectors(f).putNull(i) // fill cell
                }
              case _ =>
                vectors(f).putLong(i, cell(cur.dimIdx(d))); d += 1
            }
            f += 1
          }
          i += 1
        }
        batch.setNumRows(i)
        i > 0
      }

      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }
}

/** Partial-aggregate reader: each bin folds its chunks into ONE row of
  * partial MIN/MAX(value) (+ closed-form COUNT(*)/dim aggs), which
  * Spark final-merges. Interior, shape-clean tiles fold straight from
  * their zone maps — zero blob reads; only region-boundary, stale
  * (shape-changed) and zone-less legacy tiles decode. At 100 TB a
  * "min over this year" query touches the boundary shell of the
  * region, not its volume.
  */
class GraftPartialAggReaderFactory(chunksDir: String, v: VariableMeta,
    metas: Map[Long, VariableMeta], specs: Seq[PartialAggSpec],
    region: Array[(Long, Long)], boxLo: Array[Long], boxDims: Array[Long],
    hconf: SerializableHadoopConf,
    groupDims: Seq[Int] = Seq.empty) extends PartitionReaderFactory {

  /** Bin entries: cid -> (writer version, hash, vmin, vmax, vsum). */
  private def loadIndex(p: GraftBinPartition,
      fs: org.apache.hadoop.fs.FileSystem)
      : java.util.HashMap[Long, (Long, String,
        Option[Double], Option[Double], Option[Double])] = {
    val index =
      new java.util.HashMap[Long, (Long, String,
        Option[Double], Option[Double], Option[Double])]()
    p.inline match {
      case Some(entries) =>
        entries.foreach { case (cid, ver, h, zmn, zmx, zsum) =>
          index.put(cid, (ver, h, zmn, zmx, zsum))
        }
      case None =>
        val f = new Path(p.scanDir, s"bin-${p.bin}.idx")
        if (fs.exists(f)) {
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(fs.open(f), "UTF-8"))
          try {
            var line = in.readLine()
            while (line != null) {
              val t = line.split(' ')
              def od(s: String): Option[Double] =
                if (s == "-") None else Some(s.toDouble)
              // older manifests (pre-vsum) carry 5 fields
              index.put(t(0).toLong,
                (t(1).toLong, t(2), od(t(3)), od(t(4)),
                  if (t.length > 5) od(t(5)) else None))
              line = in.readLine()
            }
          } finally in.close()
        }
    }
    index
  }

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = GraftBinPartition.of(partition)
    if (groupDims.nonEmpty) return createGroupedReader(p)
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (done) return false
        done = true
        row = fold()
        row != null
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()

      private def fold(): InternalRow = {
        val fs = new Path(chunksDir).getFileSystem(hconf.value)
        val rank = boxDims.length
        val index = loadIndex(p, fs)

        val needSum = specs.contains(PartialAggSpec.ValSum)
        val needMinMax = specs.contains(PartialAggSpec.ValMin) ||
          specs.contains(PartialAggSpec.ValMax)
        var count = 0L
        var mn = 0.0
        var mx = 0.0
        var any = false
        // the sum partial needs no exactness tracking here: the
        // planner only chooses ValSum when every contribution any bin
        // can emit is exact-or-deterministic in any order (all tiles
        // carry vsum, no stale tiles, global |mass| within 2^52)
        var sumAcc = 0.0
        // NaN-greatest fold, matching Spark's Min/Max total order
        def fold1(dv: Double): Unit =
          if (!any) { mn = dv; mx = dv; any = true }
          else {
            if (java.lang.Double.compare(dv, mn) < 0) mn = dv
            if (java.lang.Double.compare(dv, mx) > 0) mx = dv
          }

        val cd = v.chunkDims
        var cid = p.startCid
        val cc = new Array[Long](rank)
        while (cid < p.endCid) {
          // delinearize the pruned-box cid to an absolute chunk coord
          var rest = cid
          var d = rank - 1
          while (d >= 0) {
            cc(d) = boxLo(d) + rest % boxDims(d); rest /= boxDims(d)
            d -= 1
          }
          // current tile range and its overlap with the region
          var oCells = 1L
          var interior = true
          var i = 0
          while (i < rank) {
            val tLo = cc(i) * cd(i)
            val tHi = math.min((cc(i) + 1) * cd(i), v.shape(i))
            val oLo = math.max(tLo, region(i)._1)
            val oHi = math.min(tHi, region(i)._2)
            oCells *= math.max(0L, oHi - oLo)
            if (tLo < region(i)._1 || tHi > region(i)._2) interior = false
            i += 1
          }
          if (oCells > 0) {
            count += oCells
            index.get(cid) match {
              case null =>
                // unwritten: every overlap cell is fill
                fold1(v.fillValue)
                if (needSum) sumAcc += v.fillValue * oCells
              case (ver, h, zmn, zmx, zsum) =>
                val wv = metas(ver)
                val ccSeq = cc.toSeq
                // interior + clean tiles fold straight from the zone
                // stats — min/max from [vmin, vmax], the sum from
                // vsum (the FULL-tile sum; interior means the whole
                // tile is in-region); any needed-but-missing stat
                // falls through to the decode path
                if (interior && GraftScan.tileClean(ccSeq, v, wv) &&
                    (!needMinMax || zmn.isDefined) &&
                    (!needSum || zsum.isDefined)) {
                  GraftScan.aggTilesFromZones.incrementAndGet()
                  if (zmn.isDefined) { fold1(zmn.get); fold1(zmx.get) }
                  if (needSum) sumAcc += zsum.get
                } else {
                  GraftScan.aggTilesDecoded.incrementAndGet()
                  val bytes = GraftDataset.readChunkFile(fs, chunksDir, h)
                  val vl = if (wv.dtype == "long")
                    ChunkCodec.decodeLongs(wv, bytes) else null
                  val vd = if (vl == null)
                    ChunkCodec.decodeValues(wv, bytes) else null
                  val tileN =
                    ChunkCodec.tileSize(ChunkCodec.tileDims(v, ccSeq))
                  var off = 0L
                  while (off < tileN) {
                    val cell = ChunkCodec.cellOf(v, ccSeq, off)
                    val inRegion = cell.indices.forall(j =>
                      cell(j) >= region(j)._1 && cell(j) < region(j)._2)
                    if (inRegion) {
                      val dv =
                        if (cell.indices.forall(j => cell(j) < wv.shape(j))) {
                          val o = ChunkCodec.offsetOf(wv, ccSeq, cell).toInt
                          if (vl != null) vl(o).toDouble else vd(o)
                        } else v.fillValue
                      fold1(dv)
                      if (needSum) sumAcc += dv
                    }
                    off += 1
                  }
                }
            }
          }
          cid += 1
        }
        if (count == 0L) return null

        val vt = GraftTableProvider.schemaFor(v)("value").dataType
        def setVal(r: GenericInternalRow, f: Int, dv: Double): Unit =
          vt match {
            case DoubleType  => r.setDouble(f, dv)
            case FloatType   => r.setFloat(f, dv.toFloat)
            case ShortType   => r.setShort(f, dv.toShort)
            case IntegerType => r.setInt(f, dv.toInt)
            case LongType    => r.setLong(f, dv.toLong)
            case other => throw new IllegalStateException(s"cell $other")
          }
        val out = new GenericInternalRow(specs.length)
        specs.zipWithIndex.foreach {
          case (PartialAggSpec.Count, f) => out.setLong(f, count)
          // dim closed forms: identical in every partition, identical
          // after the final merge (the region box is dense)
          case (PartialAggSpec.DimMin(d), f) =>
            out.setLong(f, region(d)._1)
          case (PartialAggSpec.DimMax(d), f) =>
            out.setLong(f, region(d)._2 - 1)
          case (PartialAggSpec.ValMin, f) => setVal(out, f, mn)
          case (PartialAggSpec.ValMax, f) => setVal(out, f, mx)
          // partial sums carry Spark's Sum result type (long for
          // integral dtypes — exact by the planner's admission bound)
          case (PartialAggSpec.ValSum, f) => vt match {
            case DoubleType | FloatType => out.setDouble(f, sumAcc)
            case _ => out.setLong(f, sumAcc.toLong)
          }
        }
        out
      }
    }
  }

  /** One mutable accumulator per group (coordinate tuple on the
    * grouped dims).
    */
  private final class GroupAcc {
    var count = 0L
    var mn = 0.0
    var mx = 0.0
    var any = false
    var sum = 0.0
    def fold1(dv: Double): Unit =
      if (!any) { mn = dv; mx = dv; any = true }
      else {
        if (java.lang.Double.compare(dv, mn) < 0) mn = dv
        if (java.lang.Double.compare(dv, mx) > 0) mx = dv
      }
  }

  /** GROUP BY fold: one output row per group present in this bin's
    * cid range. Counts and dim min/max are per-group closed forms at
    * ANY chunking (a dense box is a perfect grid — every group spans
    * the same per-dim ranges); value aggs reach here only under
    * GROUP-PURE tiles (`chunkDims == 1` on every grouped dim), where
    * interior clean tiles fold zone stats straight into their single
    * group and only the boundary shell decodes. Spark final-merges
    * groups across bins.
    */
  private def createGroupedReader(
      p: GraftBinPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var rows: Iterator[InternalRow] = _
      private var current: InternalRow = _

      override def next(): Boolean = {
        if (rows == null) rows = fold()
        if (!rows.hasNext) return false
        current = rows.next(); true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()

      private def fold(): Iterator[InternalRow] = {
        val fs = new Path(chunksDir).getFileSystem(hconf.value)
        val rank = boxDims.length
        val index = loadIndex(p, fs)
        val needSum = specs.contains(PartialAggSpec.ValSum)
        val needMinMax = specs.contains(PartialAggSpec.ValMin) ||
          specs.contains(PartialAggSpec.ValMax)
        val needValue = needSum || needMinMax
        val accs = scala.collection.mutable.LinkedHashMap
          .empty[Seq[Long], GroupAcc]
        def accOf(g: Seq[Long]): GroupAcc =
          accs.getOrElseUpdate(g, new GroupAcc)

        val cd = v.chunkDims
        var cid = p.startCid
        val cc = new Array[Long](rank)
        while (cid < p.endCid) {
          var rest = cid
          var d = rank - 1
          while (d >= 0) {
            cc(d) = boxLo(d) + rest % boxDims(d); rest /= boxDims(d)
            d -= 1
          }
          // tile ∩ region overlap per dim
          val oLo = new Array[Long](rank)
          val oHi = new Array[Long](rank)
          var oCells = 1L
          var interior = true
          var i = 0
          while (i < rank) {
            val tLo = cc(i) * cd(i)
            val tHi = math.min((cc(i) + 1) * cd(i), v.shape(i))
            oLo(i) = math.max(tLo, region(i)._1)
            oHi(i) = math.min(tHi, region(i)._2)
            oCells *= math.max(0L, oHi(i) - oLo(i))
            if (tLo < region(i)._1 || tHi > region(i)._2) interior = false
            i += 1
          }
          if (oCells > 0) {
            // groups present in this tile = cartesian of the grouped
            // dims' overlap ranges; every group gets the same cell
            // count (the box is a perfect grid)
            val spans = groupDims.map(d2 => oHi(d2) - oLo(d2))
            val cellsPerGroup = oCells / spans.product
            def eachGroup(body: Seq[Long] => Unit): Unit = {
              val g = groupDims.map(oLo(_)).toArray
              var done = false
              while (!done) {
                body(g.toSeq)
                // odometer over the grouped dims
                var j = groupDims.length - 1
                var carry = true
                while (carry && j >= 0) {
                  g(j) += 1
                  if (g(j) >= oHi(groupDims(j))) {
                    g(j) = oLo(groupDims(j)); j -= 1
                  } else carry = false
                }
                if (carry) done = true
              }
            }
            eachGroup(g => accOf(g).count += cellsPerGroup)
            if (needValue) {
              index.get(cid) match {
                case null =>
                  eachGroup { g =>
                    val a = accOf(g)
                    a.fold1(v.fillValue)
                    if (needSum) a.sum += v.fillValue * cellsPerGroup
                  }
                case (ver, h, zmn, zmx, zsum) =>
                  val wv = metas(ver)
                  val ccSeq = cc.toSeq
                  // group-pure tiles hold exactly one group — fold
                  // the tile's zone stats straight into it
                  val pure = groupDims.forall(d2 => cd(d2) == 1L)
                  if (pure && interior &&
                      GraftScan.tileClean(ccSeq, v, wv) &&
                      (!needMinMax || zmn.isDefined) &&
                      (!needSum || zsum.isDefined)) {
                    GraftScan.aggTilesFromZones.incrementAndGet()
                    val a = accOf(groupDims.map(oLo(_)))
                    if (zmn.isDefined) { a.fold1(zmn.get); a.fold1(zmx.get) }
                    if (needSum) a.sum += zsum.get
                  } else {
                    GraftScan.aggTilesDecoded.incrementAndGet()
                    val bytes = GraftDataset.readChunkFile(fs, chunksDir, h)
                    val vl = if (wv.dtype == "long")
                      ChunkCodec.decodeLongs(wv, bytes) else null
                    val vd = if (vl == null)
                      ChunkCodec.decodeValues(wv, bytes) else null
                    val tileN =
                      ChunkCodec.tileSize(ChunkCodec.tileDims(v, ccSeq))
                    var off = 0L
                    while (off < tileN) {
                      val cell = ChunkCodec.cellOf(v, ccSeq, off)
                      val inRegion = cell.indices.forall(j =>
                        cell(j) >= region(j)._1 && cell(j) < region(j)._2)
                      if (inRegion) {
                        val dv =
                          if (cell.indices.forall(j =>
                              cell(j) < wv.shape(j))) {
                            val o =
                              ChunkCodec.offsetOf(wv, ccSeq, cell).toInt
                            if (vl != null) vl(o).toDouble else vd(o)
                          } else v.fillValue
                        val a = accOf(groupDims.map(cell(_)))
                        a.fold1(dv)
                        if (needSum) a.sum += dv
                      }
                      off += 1
                    }
                  }
              }
            }
          }
          cid += 1
        }

        val vt = GraftTableProvider.schemaFor(v)("value").dataType
        val nG = groupDims.length
        accs.iterator.map { case (g, a) =>
          val out = new GenericInternalRow(nG + specs.length)
          var gi = 0
          while (gi < nG) { out.setLong(gi, g(gi)); gi += 1 }
          specs.zipWithIndex.foreach {
            case (PartialAggSpec.Count, f) => out.setLong(nG + f, a.count)
            case (PartialAggSpec.DimMin(d2), f) =>
              val k = groupDims.indexOf(d2)
              out.setLong(nG + f, if (k >= 0) g(k) else region(d2)._1)
            case (PartialAggSpec.DimMax(d2), f) =>
              val k = groupDims.indexOf(d2)
              out.setLong(nG + f, if (k >= 0) g(k) else region(d2)._2 - 1)
            case (PartialAggSpec.ValMin, f) => vt match {
              case DoubleType  => out.setDouble(nG + f, a.mn)
              case FloatType   => out.setFloat(nG + f, a.mn.toFloat)
              case ShortType   => out.setShort(nG + f, a.mn.toShort)
              case IntegerType => out.setInt(nG + f, a.mn.toInt)
              case LongType    => out.setLong(nG + f, a.mn.toLong)
              case other => throw new IllegalStateException(s"$other")
            }
            case (PartialAggSpec.ValMax, f) => vt match {
              case DoubleType  => out.setDouble(nG + f, a.mx)
              case FloatType   => out.setFloat(nG + f, a.mx.toFloat)
              case ShortType   => out.setShort(nG + f, a.mx.toShort)
              case IntegerType => out.setInt(nG + f, a.mx.toInt)
              case LongType    => out.setLong(nG + f, a.mx.toLong)
              case other => throw new IllegalStateException(s"$other")
            }
            case (PartialAggSpec.ValSum, f) => vt match {
              case DoubleType | FloatType => out.setDouble(nG + f, a.sum)
              case _ => out.setLong(nG + f, a.sum.toLong)
            }
          }
          out: InternalRow
        }
      }
    }
}

// ---------- streaming: the commit log as a changelog source ----------

/** Offset = committed version id (monotonic, checkpoint-friendly). */
case class GraftOffset(versionId: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = versionId.toString
}

/** `spark.readStream.format("graft")`: each micro-batch delivers the
  * cells of chunks WRITTEN in the newly-committed versions of the
  * range (start, end] — a CDC-style change feed over the MVCC commit
  * log. Chunks decode under their writer's metadata (shape at write
  * time); region boxes and column pruning from the scan apply; the
  * `_version` column (option `withVersion`) tags every row with its
  * committing version. `startVersion` replays history from a point;
  * the default 0 streams the full history first.
  *
  * Scale shape mirrors the batch scan: delta planning is O(#bins) on
  * the driver, never O(#chunks). The delta's index rows are
  * region-pruned DISTRIBUTED, then either shipped inline (small
  * deltas, one bounded limit+collect) or spilled to per-bin manifest
  * files on the shared store — a backfill commit with millions of
  * chunks plans as ~2×parallelism partitions, not millions. Admission
  * control (`maxVersionsPerBatch` option / SupportsAdmissionControl)
  * caps how many committed versions one micro-batch may absorb, so a
  * fresh reader tails a long history in bounded batches instead of one
  * giant replay.
  */
class GraftMicroBatchStream(path: String, variable: String,
    required: StructType, region: Array[(Long, Long)],
    startVersion: Long, maxVersionsPerBatch: Option[Int] = None,
    valuePreds: Seq[Filter] = Seq.empty,
    lineage: Seq[(String, Long)] = Seq.empty)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  private def ds = new GraftDataset(SparkSession.active, path)

  /** `Trigger.AvailableNow` — the canonical backfill: drain everything
    * committed as of query start in admission-controlled batches, then
    * stop. The head is PINNED here; commits racing the drain are left
    * for the next run (exactly the semantics checkpointed offsets
    * expect — the pinned head is a real committed version id).
    */
  private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(ds.latestVersion.getOrElse(startVersion))

  override def initialOffset(): Offset = GraftOffset(startVersion)

  /** Unlimited head jump — only called when admission control is off
    * (Spark prefers the (start, limit) form below when the stream
    * implements SupportsAdmissionControl).
    */
  override def latestOffset(): Offset =
    GraftOffset(ds.latestVersion.getOrElse(startVersion))

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerBatch.map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())

  /** Admission control: with `maxVersionsPerBatch = n`, the next batch
    * ends at the n-th committed version past `start` rather than HEAD.
    * Offsets are version ids (not contiguous — ids are commit
    * timestamps), so the cap walks the live version log.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftOffset].versionId
    val d = ds
    val live = d.latestVersion.getOrElse(startVersion)
    val head = availableNowCap.fold(live)(math.min(live, _))
    val end = limit match {
      case r: ReadMaxRows if head > s =>
        d.versionIds().filter(id => id > s && id <= head).sorted
          .take(math.max(1L, r.maxRows()).toInt)
          .lastOption.getOrElse(head)
      case _ => head
    }
    GraftOffset(math.max(s, end))
  }

  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.toLong)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].versionId
    val e = end.asInstanceOf[GraftOffset].versionId
    if (e <= s) return Array.empty
    val d = ds
    val spark = d.spark
    import org.apache.spark.sql.functions.{coalesce, col}
    import spark.implicits._
    // (resolution version, decode version, ...) — a retention-
    // compacted partition carries rows whose writerVersion predates
    // the partition; their metadata survives in the expired log
    // PERSISTED across the three planning consumers (distinct writer
    // versions, size probe, manifest write) — the delta's index scan
    // runs ONCE per micro-batch, not up to three times
    // zone-map skipping: the changelog read is SPARSE (only written
    // chunks emit — no fill synthesis), so pushed value predicates
    // may drop delta rows whose [vmin, vmax] cannot satisfy them with
    // no fill-value proof needed. Null bounds (legacy rows) keep.
    val zonePredsL = valuePreds
    val deltaAll = d.indicesDF
      .filter(col("variable") === variable &&
        col("versionId") > s && col("versionId") <= e)
      .select(col("coord"), col("versionId"),
        coalesce(col("writerVersion"), col("versionId")).as("wver"),
        col("chunkHash"), col("vmin"), col("vmax"))
      .as[(Seq[Long], Long, Long, String,
        Option[Double], Option[Double])]
    val delta = (if (zonePredsL.isEmpty) deltaAll
      else deltaAll.filter { t: (Seq[Long], Long, Long, String,
          Option[Double], Option[Double]) =>
        val keep = (t._5, t._6) match {
          case (Some(mn), Some(mx)) =>
            zonePredsL.forall(ZonePredicates.couldSatisfy(_, mn, mx))
          case _ => true
        }
        if (!keep) GraftScan.zoneSkippedChunks.incrementAndGet()
        keep
      })
      .map(t => (t._1, t._2, t._3, t._4))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // decode metadata per DISTINCT writer version — bounded by the
    // number of versions in the batch (capped by admission control),
    // never by the number of chunks; snapshot-backed, so even a
    // retention-compacted batch carrying many old writer versions
    // costs at most one snapshot read plus the tail point-reads
    val metasByVersion: Map[Long, VariableMeta] =
      d.metasFor(delta.map(_._3).distinct().collect().toSeq)
        .flatMap { case (id, m) =>
          // `variable` is the stable physical key here (see ctor
          // call); a clone version's rows carry pre-clone writer
          // versions whose metadata lives under the SOURCE's key
          val key = lineage.find(id <= _._2).map(_._1).getOrElse(variable)
          m.variables.find(_.idx == key).map(id -> _)
        }
    // region-prune on the executors (chunk box vs the scan's region)
    val metasBc = spark.sparkContext.broadcast(metasByVersion)
    val regionL = region
    val pruned = delta.filter { t: (Seq[Long], Long, Long, String) =>
      val wv = metasBc.value(t._3)
      val cc = t._1
      cc.indices.forall(i =>
        cc(i) * wv.chunkDims(i) < regionL(i)._2 &&
          (cc(i) + 1) * wv.chunkDims(i) > regionL(i)._1)
    }
    val nBins = math.max(spark.sparkContext.defaultParallelism * 2, 16)
    // hybrid shipping, same protocol as the batch scan: a small delta
    // rides inline (one bounded limit+collect); a large one is hashed
    // into per-bin manifest files on the shared store so the driver
    // never materializes per-chunk rows
    val threshold = spark.conf.getOption("spark.graft.scan.inlineThreshold")
      .map(_.toInt).getOrElse(10000)
    val probe = pruned.limit(threshold + 1).collect()
    if (probe.length <= threshold) {
      if (probe.isEmpty) return Array.empty
      val perBin = ((probe.length + nBins - 1) / nBins) max 1
      probe.grouped(perBin).zipWithIndex.map { case (g, i) =>
        GraftStreamBinPartition(i, "", Some(g), metasByVersion)
          : InputPartition
      }.toArray
    } else {
      val scanId = java.util.UUID.randomUUID().toString.take(12)
      val scanDir = s"${d.scansDir}/stream-$scanId"
      val hc = d.hconf
      val nBinsL = nBins
      pruned
        .map { case (cc, ver, wver, h) =>
          val bin = math.floorMod(
            scala.util.hashing.MurmurHash3.orderedHash(cc :+ ver), nBinsL)
          (bin, cc, ver, wver, h)
        }
        .toDF("bin", "coord", "ver", "wver", "h")
        .repartition(nBins, col("bin"))
        .sortWithinPartitions(col("bin"))
        .as[(Int, Seq[Long], Long, Long, String)]
        .foreachPartition { it: Iterator[(Int, Seq[Long], Long, Long, String)] =>
          // one sequential pass; a new file whenever the bin changes
          // (bins hash to partitions, so a partition may hold several)
          val fsLocal = new Path(scanDir).getFileSystem(hc.value)
          var curBin = -1
          var out: java.io.PrintWriter = null
          it.foreach { case (bin, cc, ver, wver, h) =>
            if (bin != curBin) {
              if (out != null) out.close()
              out = new java.io.PrintWriter(
                fsLocal.create(new Path(scanDir, s"bin-$bin.idx"), true))
              curBin = bin
            }
            out.println(s"$ver $wver $h ${cc.mkString(",")}")
          }
          if (out != null) out.close()
        }
      (0 until nBins).map(b =>
        GraftStreamBinPartition(b, scanDir, None, metasByVersion)
          : InputPartition).toArray
    }
    } finally delta.unpersist()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftStreamReaderFactory(s"$path/chunks", required, region,
      new SerializableHadoopConf(
        SparkSession.active.sparkContext.hadoopConfiguration))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One bin of a micro-batch delta: (coord, version, writerVersion,
  * hash) entries ship inline for small deltas or via a per-bin scan
  * manifest file for large ones. `metas` maps writer versions (the
  * metadata chunks decode under) — bounded by versions in the batch.
  */
case class GraftStreamBinPartition(bin: Int, scanDir: String,
    inline: Option[Array[(Seq[Long], Long, Long, String)]],
    metas: Map[Long, VariableMeta]) extends InputPartition

class GraftStreamReaderFactory(chunksDir: String, required: StructType,
    region: Array[(Long, Long)], hconf: SerializableHadoopConf)
  extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftStreamBinPartition]
    new PartitionReader[InternalRow] {
      private val fs = new Path(chunksDir).getFileSystem(hconf.value)
      private val needsValue = required.fieldNames.contains("value")
      private val dimIdx: Array[Int] = required.fieldNames
        .filter(n => n != "value" && n != "_version")
        .map(_.drop(1).toInt)

      // entries stream lazily: inline array or the bin manifest file
      private var manifestIn: java.io.BufferedReader = null
      private val entries: Iterator[(Seq[Long], Long, Long, String)] =
        p.inline match {
          case Some(a) => a.iterator
          case None =>
            val f = new Path(p.scanDir, s"bin-${p.bin}.idx")
            if (!fs.exists(f)) Iterator.empty
            else {
              manifestIn = new java.io.BufferedReader(
                new java.io.InputStreamReader(fs.open(f), "UTF-8"))
              Iterator.continually(manifestIn.readLine())
                .takeWhile(_ != null)
                .map { line =>
                  val parts = line.split(' ')
                  val cc: Seq[Long] =
                    if (parts.length < 4 || parts(3).isEmpty) Seq.empty
                    else parts(3).split(',').map(_.toLong).toSeq
                  (cc, parts(0).toLong, parts(1).toLong, parts(2))
                }
            }
        }

      private val valueType: DataType = required.fields
        .find(_.name == "value").map(_.dataType).getOrElse(DoubleType)

      // per-chunk cursor state
      private var wv: VariableMeta = _
      private var cc: Seq[Long] = _
      private var versionId = 0L
      private var values: Array[Double] = _
      private var valuesL: Array[Long] = _ // exact path for long cells
      private var tileN = 0L
      private var off = -1L
      private var current: InternalRow = _

      private def openNext(): Boolean = {
        if (!entries.hasNext) return false
        val (coord, ver, wver, h) = entries.next()
        wv = p.metas(wver)
        cc = coord
        versionId = ver
        values = null; valuesL = null
        if (needsValue) {
          val bytes = GraftDataset.readChunkFile(fs, chunksDir, h)
          if (valueType == LongType && wv.dtype == "long")
            valuesL = ChunkCodec.decodeLongs(wv, bytes)
          else values = ChunkCodec.decodeValues(wv, bytes)
        }
        tileN = ChunkCodec.tileSize(ChunkCodec.tileDims(wv, cc))
        off = -1L
        true
      }

      override def next(): Boolean = {
        while (true) {
          if (wv == null || off >= tileN - 1) {
            if (!openNext()) return false
          }
          while (off < tileN - 1) {
            off += 1
            val cell = ChunkCodec.cellOf(wv, cc, off)
            val inRegion = cell.indices.forall(i =>
              cell(i) >= region(i)._1 && cell(i) < region(i)._2)
            if (inRegion) {
              val row = new GenericInternalRow(required.length)
              var f = 0
              var d = 0
              while (f < required.length) {
                required.fields(f).name match {
                  case "value" =>
                    if (valuesL != null) row.setLong(f, valuesL(off.toInt))
                    else GraftTableProvider.setCell(
                      row, f, valueType, values(off.toInt))
                  case "_version" => row.setLong(f, versionId)
                  case _ => row.setLong(f, cell(dimIdx(d))); d += 1
                }
                f += 1
              }
              current = row
              return true
            }
          }
        }
        false
      }

      override def get(): InternalRow = current
      override def close(): Unit =
        if (manifestIn != null) manifestIn.close()
    }
  }
}
