package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.core.GraftDataset
import graft.core.Model.DatasetMeta

/** Streaming ingest into the versioned store: each micro-batch of
  * cells commits one store version — the streaming write half of the
  * engine (the reference's store is batch-written only; this is the
  * readStream changelog source's dual).
  *
  * Used via `writeStream.foreachBatch(GraftSink.cellsBatchWriter(...))`
  * — the standard shape for transactional sinks whose commit protocol
  * lives outside Spark's sink API. Exactly-once versions across query
  * restarts: a per-(sink, batchId) marker file is written after the
  * store commit, and a replayed batch that already has its marker is
  * skipped. The crash window between commit and marker can produce one
  * duplicate VERSION on restart, but never duplicate or corrupt DATA —
  * chunks are content-addressed (the replayed batch re-stages
  * byte-identical tiles that dedup to the same hashes), so the
  * duplicate version is an identical snapshot, and downstream as-of
  * reads are unaffected.
  *
  * Scale notes: the marker directory holds one empty file per
  * micro-batch (not per row); each batch's write is the normal
  * distributed [[graft.core.SlabWriter]] path (re-chunk shuffle +
  * executor-side blob writes), so throughput is the store's batch
  * write throughput.
  */
object GraftSink {

  /** A foreachBatch function committing each micro-batch (DataFrame of
    * `coord ARRAY<LONG>, value DOUBLE`) as one version of `variable`.
    * `sinkId` scopes the idempotence markers — use one id per logical
    * streaming query (e.g. its checkpoint name).
    */
  def cellsBatchWriter(ds: GraftDataset, meta: DatasetMeta,
      variable: String, sinkId: String): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val markerDir = new Path(s"${ds.path}/stream_commits/$sinkId")
      val marker = new Path(markerDir, f"$batchId%020d")
      val fs = markerDir.getFileSystem(
        batch.sparkSession.sparkContext.hadoopConfiguration)
      if (!fs.exists(marker)) {
        val w = ds.newWriter(meta)
        w.writeSlab(variable, batch)
        w.commit()
        fs.mkdirs(markerDir)
        fs.create(marker, true).close()
      }
  }
}
