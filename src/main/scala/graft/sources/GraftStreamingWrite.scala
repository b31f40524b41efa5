package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

import graft.core.GraftDataset
import graft.core.Model.VariableMeta
import graft.streaming.GraftSink

/** Native Structured Streaming sink: `df.writeStream.toTable("g.ns.t")`
  * (or `.format("graft").option("path", ...).option("variable", ...)`)
  * commits each micro-batch as ONE store version — the DSv2-native
  * dual of [[graft.streaming.GraftSink.cellsBatchWriter]], with the
  * same exactly-once contract and no foreachBatch plumbing: rows are
  * plain (x0..x{r-1}, value) cells, not pre-assembled coord arrays.
  *
  * Exactly-once across restarts rides the sink's O(1) high-watermark
  * marker, keyed by the streaming QUERY id (stable across restarts —
  * it lives in the checkpoint): a replayed epoch with
  * `epochId <= watermark` skips the store commit. The crash window
  * between store commit and marker advance can duplicate one VERSION
  * but never data (content-addressed chunks re-stage byte-identical).
  *
  * Scale shape: executor tasks stream their rows straight to
  * fixed-width binary staged files (the row-level DML staging path —
  * O(1) writer state, O(rows) I/O, no driver accumulation); the epoch
  * commit re-reads them as one distributed dataset and pipes it
  * through the standard re-chunk/encode/optimistic-commit path.
  */
private[sources] class GraftStreamingWrite(path: String, variable: String,
    v: VariableMeta, rowSchema: StructType, queryId: String)
    extends StreamingWrite {

  private def stageRoot = s"$path/staging/stream-$queryId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val ds = new GraftDataset(SparkSession.active, path)
    val rank = v.shape.length
    val xIdx = (0 until rank).map(i => rowSchema.fieldIndex(s"x$i")).toArray
    val valueIdx = rowSchema.fieldIndex("value")
    val tName = rowSchema.fields(valueIdx).dataType.typeName
    new GraftStreamingWriterFactory(stageRoot, rank, v.fillValue, xIdx,
      valueIdx, tName, ds.hconf)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val ds = new GraftDataset(spark, path)
    val markerDir = new Path(s"$path/stream_commits/dsv2-$queryId")
    val wmFile = new Path(markerDir, "_watermark")
    val fs = markerDir.getFileSystem(ds.hconf.value)
    try {
      if (!GraftSink.readWatermark(fs, wmFile).exists(epochId <= _)) {
        val files = messages.collect {
          case GraftDeltaFileMessage(f, n) if n > 0 => (f, n)
        }.toSeq
        // an empty micro-batch advances the watermark without
        // committing an empty store version
        if (files.nonEmpty)
          StagedCellFiles.commitAsVersion(spark, ds, variable,
            v.shape.length, files)
        GraftSink.advanceWatermark(fs, markerDir, wmFile, epochId)
      }
    } finally cleanupEpoch(ds, epochId)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    cleanupEpoch(new GraftDataset(SparkSession.active, path), epochId)

  private def cleanupEpoch(ds: GraftDataset, epochId: Long): Unit = {
    val p = new Path(s"$stageRoot/epoch-$epochId")
    val fs = p.getFileSystem(ds.hconf.value)
    if (fs.exists(p)) fs.delete(p, true)
    // drop the (now empty) per-query staging root too so a finished
    // query leaves nothing for the stale-staging sweep
    val root = new Path(stageRoot)
    if (fs.exists(root) && fs.listStatus(root).isEmpty)
      fs.delete(root, true)
    ()
  }
}

private[sources] class GraftStreamingWriterFactory(stageRoot: String,
    rank: Int, fill: Double, xIdx: Array[Int], valueIdx: Int,
    valueTypeName: String, hconf: graft.core.SerializableHadoopConf)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftDeltaWriter(
      s"$stageRoot/epoch-$epochId/part-$partitionId-$taskId.bin", rank,
      fill, xIdx, valueIdx, valueTypeName, hconf)
}
