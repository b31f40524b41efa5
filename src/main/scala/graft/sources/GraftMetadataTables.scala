package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.GraftDataset

/** Iceberg-style SQL METADATA TABLES, resolved as a third name level
  * under a variable: `SELECT * FROM g.<dataset>.<variable>.history`
  * (the multipart-identifier convention Iceberg uses for
  * `db.table.history` — [[GraftCatalog.loadTable]] intercepts the
  * 2-level namespace). Three kinds, all bounded-size listings:
  *
  *   - `history`   — live (un-expired) version ids, newest first,
  *                   with their commit timestamps (version ids ARE
  *                   epoch millis): the discovery surface for
  *                   `VERSION AS OF` / `TIMESTAMP AS OF`.
  *   - `tags`      — named refs (name, version_id).
  *   - `variables` — the dataset's variable geometry (name, dtype,
  *                   shape, chunk dims, fill, CHECK constraint).
  *
  * Time travel composes: `... FROM g.vd.t.history VERSION AS OF v`
  * lists only versions at or below `v`, and `variables` shows the
  * metadata AS OF that version. Row counts are O(#versions) /
  * O(#tags) / O(#variables) — bounded by retention, never by data —
  * so these are driver-local scans ([[LocalScan]]); chunk-level
  * introspection (the zone-map index) deliberately has no metadata
  * table: at 100 TB it is a billion-row dataset, already queryable
  * distributed through the engine's own scan machinery.
  *
  * The reference's discovery verbs are `Connection.versions` /
  * `Connection.metadata` (hbase.clj:231-266); this is their SQL
  * face, alongside the `CALL g.system.history(...)` procedure form.
  */
private[sources] object GraftMetadataTables {

  /** Reserved third-level names (never colliding with variables —
    * variables resolve under a 1-level namespace).
    */
  val Kinds: Set[String] = Set("history", "tags", "variables")

  def load(ds: GraftDataset, dataset: String, variable: String,
      kind: String, asOf: Option[Long]): Table = {
    val full = s"$dataset.$variable.$kind"
    kind match {
      case "history" =>
        val schema = StructType(Seq(
          StructField("version_id", LongType, nullable = false),
          StructField("committed_at", TimestampType, nullable = false)))
        new GraftMetadataTable(full, schema, () =>
          versionsAt(ds, asOf).map(v =>
            new GenericInternalRow(Array[Any](v, v * 1000L))
              : InternalRow).toArray)
      case "tags" =>
        val schema = StructType(Seq(
          StructField("name", StringType, nullable = false),
          StructField("version_id", LongType, nullable = false)))
        new GraftMetadataTable(full, schema, () =>
          ds.tags().sortBy(_._1).map { case (n, v) =>
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(n), v)): InternalRow
          }.toArray)
      case "variables" =>
        val schema = StructType(Seq(
          StructField("name", StringType, nullable = false),
          StructField("dtype", StringType, nullable = false),
          StructField("shape", StringType, nullable = false),
          StructField("chunk_dims", StringType, nullable = false),
          StructField("fill_value", DoubleType, nullable = false),
          StructField("check", StringType, nullable = true)))
        new GraftMetadataTable(full, schema, () =>
          versionsAt(ds, asOf).headOption.toArray.flatMap(v =>
            ds.metadata(v).variables.sortBy(_.name).map { vm =>
              new GenericInternalRow(Array[Any](
                UTF8String.fromString(vm.name),
                UTF8String.fromString(vm.dtype),
                UTF8String.fromString(vm.shape.mkString(",")),
                UTF8String.fromString(vm.chunkDims.mkString(",")),
                vm.fillValue,
                if (vm.check.isEmpty) null
                else UTF8String.fromString(vm.check))): InternalRow
            }))
      case other =>
        throw new IllegalArgumentException(
          s"unknown metadata table kind '$other'")
    }
  }

  /** Newest-first live versions, clipped to the time-travel bound. */
  private def versionsAt(ds: GraftDataset, asOf: Option[Long]): Seq[Long] = {
    val ids = ds.versionIds()
    asOf.fold(ids)(v => ids.filter(_ <= v))
  }
}

/** A metadata listing as a read-only table. Rows materialize at SCAN
  * time (fresh per query) on the driver — every kind is a bounded
  * listing, see [[GraftMetadataTables]].
  */
private[sources] class GraftMetadataTable(name0: String,
    schema0: StructType, rows0: () => Array[InternalRow])
    extends Table with SupportsRead {
  override def name(): String = s"graft.$name0"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def rows(): Array[InternalRow] = rows0()
        override def readSchema(): StructType = schema0
      }
    }
}
