package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.functions.{col, concat, countDistinct, lit, max, raise_error, struct, when}
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType, ShortType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{GraftDataset, SerializableHadoopConf}
import graft.core.Model.VariableMeta

/** SQL `UPDATE` / `MERGE INTO` / predicate `DELETE` as DELTA-BASED
  * row-level operations ([[org.apache.spark.sql.connector.write.SupportsDelta]]).
  *
  * The natural fit for a cell store: a row's identity IS its
  * coordinate vector, so `rowId = (x0..x{r-1})`, an UPDATE/INSERT is
  * an upsert of that cell, and a DELETE is a fill-value write — the
  * exact mechanics `DELETE FROM` (box form) already uses. Spark
  * delivers ONLY the touched rows (delta mode — never whole rewritten
  * groups), coordinate-changing updates arrive pre-split as
  * delete(old)+insert(new) (`representUpdateAsDeleteAndInsert`), and
  * the write lands as ONE MVCC version through the normal optimistic
  * slab commit.
  *
  * Scale shape: executor tasks stream their delta rows to per-task
  * staged files (fixed-width binary records, O(touched rows) I/O,
  * no driver accumulation); the driver-side commit re-reads them as
  * one distributed dataset — parallelism = task files — and pipes
  * them through the standard re-chunk/encode/stage path. Box-only
  * DELETEs keep taking the O(live-cells-in-box) metadata-ish
  * `SupportsDelete` path; this surface is what makes VALUE-predicate
  * DML (`UPDATE ... WHERE value > x`, MERGE with mixed actions)
  * expressible at all.
  */
class GraftRowLevelOperation(path: String, variable: String, asOf: Long,
    v: VariableMeta, metas: Map[Long, VariableMeta],
    cmd: RowLevelOperation.Command) extends SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def rowId(): Array[NamedReference] =
    v.shape.indices.map(i => Expressions.column(s"x$i")).toArray

  /** A same-statement coordinate reassignment must remove the old
    * cell: split updates make that an explicit delete + insert, which
    * the fill-write delete expresses exactly. (A same-coord
    * delete+insert pair collapses at commit: the insert wins.)
    */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  /** The operation scan is LIVE-ONLY: it walks written chunks only
    * (never the dense cid range) and drops written-fill cells, so a
    * value-predicate UPDATE/MERGE/DELETE touches O(live cells), not
    * O(shape) — on a large sparse variable the dense view would
    * re-stage every unwritten cell whenever the predicate matches the
    * fill (e.g. `value >= 4` under Spark's NaN-greatest ordering with
    * a NaN fill). Consequence for MERGE: an unwritten or deleted
    * coordinate is NOT MATCHED — upserts into absent cells take a
    * `WHEN NOT MATCHED THEN INSERT` clause, the sparse-store (and
    * Delta/Iceberg) semantics.
    */
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path, variable, asOf, v, metas, liveOnly = true)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new GraftDeltaWrite(path, variable, v, info.schema())
    }
}

private[sources] class GraftDeltaWrite(path: String, variable: String,
    v: VariableMeta, rowSchema: StructType) extends DeltaWrite {
  override def toBatch(): DeltaBatchWrite =
    new GraftDeltaBatchWrite(path, variable, v, rowSchema)
}

private[sources] case class GraftDeltaFileMessage(file: String, n: Long)
  extends WriterCommitMessage

private[sources] class GraftDeltaBatchWrite(path: String, variable: String,
    v: VariableMeta, rowSchema: StructType) extends DeltaBatchWrite {

  private val opId = s"rowdelta-${UUID.randomUUID().toString.take(12)}"
  private def stageDir = s"$path/staging/$opId"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory = {
    val ds = new GraftDataset(SparkSession.active, path)
    val rank = v.shape.length
    // row field positions by NAME (the write schema is the table
    // schema, but don't bet correctness on field order). A pure
    // DELETE's write schema is EMPTY — only delete(id) fires, which
    // reads coordinates from the id row, so the row indices go unused.
    val hasRows = rowSchema.fieldNames.contains("value")
    val xIdx =
      if (hasRows) (0 until rank).map(i => rowSchema.fieldIndex(s"x$i")).toArray
      else Array.fill(rank)(-1)
    val valueIdx = if (hasRows) rowSchema.fieldIndex("value") else -1
    val valueTypeName =
      if (hasRows) rowSchema.fields(valueIdx).dataType.typeName else "double"
    new GraftDeltaWriterFactory(s"$stageDir/cells", rank, v.fillValue,
      xIdx, valueIdx, valueTypeName, ds.hconf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val ds = new GraftDataset(spark, path)
    try {
      val files = messages.collect {
        case GraftDeltaFileMessage(f, n) if n > 0 => (f, n)
      }.toSeq
      if (files.nonEmpty)
        StagedCellFiles.commitAsVersion(spark, ds, variable,
          v.shape.length, files, failOnDuplicates = true)
    } finally cleanup(ds)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanup(new GraftDataset(SparkSession.active, path))

  private def cleanup(ds: GraftDataset): Unit = {
    val p = new Path(stageDir)
    val fs = p.getFileSystem(ds.hconf.value)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }
}

/** Shared tail of every staged-cell-file write (row-level DML, the
  * native streaming sink): distributed re-read of the fixed-width
  * binary files, per-coordinate dedup, one optimistic slab commit.
  */
private[sources] object StagedCellFiles {

  /** Parallelism = task files; no driver accumulation. Each task
    * streams its file record-by-record through a lazy iterator (O(1)
    * task heap regardless of file size — a big MERGE or a heavy
    * streaming epoch never materializes on one executor); the stream
    * closes on exhaustion and, for mid-iteration task failure, via a
    * task-completion listener.
    *
    * `failOnDuplicates` (the DML path): two conflicting inserts at
    * the same coordinate in one batch (a MERGE whose source matches
    * one cell twice with different values, an INSERT with repeated
    * coordinates) fail the commit — the Delta/Iceberg
    * cardinality-violation contract — while the split update's
    * delete+insert pair (prio 0 + prio 1) still collapses to the
    * insert. The streaming sink keeps the legacy deterministic
    * max-collapse (an epoch replay may re-stage the same cell).
    */
  def cellsOf(spark: SparkSession, ds: GraftDataset, rank: Int,
      files: Seq[(String, Long)],
      failOnDuplicates: Boolean = false): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val hc = ds.hconf
    val recs = spark.createDataset(files)
      .repartition(math.min(files.length,
        math.max(1, spark.sparkContext.defaultParallelism)))
      .flatMap { case (f, n) =>
        val in = new DataInputStream(new BufferedInputStream(
          new Path(f).getFileSystem(hc.value).open(new Path(f))))
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case _: Throwable => () }))
        new Iterator[(Seq[Long], Double, Int)] {
          private var i = 0L
          override def hasNext: Boolean = {
            if (i >= n) { try in.close() catch { case _: Throwable => () } }
            i < n
          }
          override def next(): (Seq[Long], Double, Int) = {
            if (i >= n) throw new NoSuchElementException(f)
            i += 1
            val coord = Seq.fill(rank)(in.readLong())
            val value = in.readDouble()
            val prio = in.readByte().toInt
            (coord, value, prio)
          }
        }
      }
      .toDF("coord", "value", "prio")
    // a coord staged twice is the split update's delete+insert pair
    // (the insert, prio 1, wins) or a same-batch duplicate (DML:
    // conflicting values error; streaming: resolved deterministically
    // by max value)
    val agg = recs.groupBy(col("coord"))
      .agg(max(struct(col("prio"), col("value"))).as("m"),
        countDistinct(when(col("prio") === 1, col("value"))).as("nv1"))
    val value =
      if (failOnDuplicates)
        when(col("nv1") > 1, raise_error(concat(
          lit("GRAFT_DUPLICATE_CELL: coordinate "),
          col("coord").cast("string"),
          lit(" received conflicting values in one batch; a source row" +
            " must match at most one value per cell"))))
          .otherwise(col("m.value"))
      else col("m.value")
    agg.select(col("coord"), value.as("value"))
  }

  /** Commit the staged cells as ONE version at the current HEAD,
    * aborting the staged writer on any failure.
    */
  def commitAsVersion(spark: SparkSession, ds: GraftDataset,
      variable: String, rank: Int, files: Seq[(String, Long)],
      failOnDuplicates: Boolean = false): Long = {
    val cells = cellsOf(spark, ds, rank, files, failOnDuplicates)
    val w = ds.newWriter(ds.metadata(ds.latestVersion.getOrElse(
      throw new IllegalStateException(
        s"dataset ${ds.path} lost its versions mid-operation"))))
    try {
      w.writeSlab(variable, cells)
      w.commit()
    } catch {
      case e: Throwable =>
        try w.abort() catch { case _: Throwable => () }
        throw e
    }
  }
}

private[sources] class GraftDeltaWriterFactory(cellsDir: String, rank: Int,
    fill: Double, xIdx: Array[Int], valueIdx: Int, valueTypeName: String,
    hconf: SerializableHadoopConf) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(s"$cellsDir/part-$partitionId-$taskId.bin", rank,
      fill, xIdx, valueIdx, valueTypeName, hconf)
}

/** Streams this task's delta rows to one fixed-width binary staged
  * file: `rank` longs (coordinate) + a double (value) + a priority
  * byte (0 = delete/fill, 1 = insert/update). No buffering beyond the
  * stream — state is O(1) regardless of how many rows the task sees.
  */
private[sources] class GraftDeltaWriter(file: String, rank: Int,
    fill: Double, xIdx: Array[Int], valueIdx: Int, valueTypeName: String,
    hconf: SerializableHadoopConf) extends DeltaWriter[InternalRow] {

  private var out: DataOutputStream = _
  private var n = 0L

  private def ensureOpen(): DataOutputStream = {
    if (out == null) {
      val p = new Path(file)
      out = new DataOutputStream(new BufferedOutputStream(
        p.getFileSystem(hconf.value).create(p, true)))
    }
    out
  }

  private def valueOf(row: InternalRow): Double =
    if (row.isNullAt(valueIdx)) fill
    else valueTypeName match {
      case "double"  => row.getDouble(valueIdx)
      case "float"   => row.getFloat(valueIdx).toDouble
      case "long"    => row.getLong(valueIdx).toDouble
      case "integer" => row.getInt(valueIdx).toDouble
      case "short"   => row.getShort(valueIdx).toDouble
      case other => throw new IllegalStateException(s"cell type $other")
    }

  private def emit(coordOf: Int => Long, value: Double,
      prio: Int): Unit = {
    val o = ensureOpen()
    var i = 0
    while (i < rank) { o.writeLong(coordOf(i)); i += 1 }
    o.writeDouble(value)
    o.writeByte(prio)
    n += 1
  }

  // the id row carries exactly the rowId() attributes, in order
  override def delete(meta: InternalRow, id: InternalRow): Unit =
    emit(id.getLong, fill, 0)

  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit =
    // unreachable under representUpdateAsDeleteAndInsert, kept for
    // completeness: an in-place update targets the row's own coords
    emit(i => row.getLong(xIdx(i)), valueOf(row), 1)

  override def insert(row: InternalRow): Unit =
    emit(i => row.getLong(xIdx(i)), valueOf(row), 1)

  /** Plain-DataWriter entry (the streaming sink path): every row is
    * an upsert of its cell.
    */
  override def write(row: InternalRow): Unit = insert(row)

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    GraftDeltaFileMessage(file, n)
  }

  override def abort(): Unit = {
    close()
    val p = new Path(file)
    val fs = p.getFileSystem(hconf.value)
    if (fs.exists(p)) fs.delete(p, false)
    ()
  }

  override def close(): Unit =
    if (out != null) { out.close(); out = null }
}
