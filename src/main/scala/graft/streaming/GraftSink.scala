package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * restarts: batchIds are monotonic per query, so a single
  * HIGH-WATERMARK marker (the last committed batchId) is written after
  * each store commit, and a replayed batch with `batchId <= watermark`
  * is skipped — O(1) marker state no matter how long the stream runs
  * (a marker file per batch would be the flat-directory object-store
  * degradation the chunk store itself avoids by sharding). The crash
  * window between commit and marker advance can produce one duplicate
  * VERSION on restart, but never duplicate or corrupt DATA — chunks
  * are content-addressed (the replayed batch re-stages byte-identical
  * tiles that dedup to the same hashes), so the duplicate version is
  * an identical snapshot, and downstream as-of reads are unaffected.
  *
  * A failed write aborts the staged writer immediately (staged dir
  * removed, manifest published for gc) instead of leaking one staged
  * writer per foreachBatch retry until the stale-staging sweep.
  */
object GraftSink {

  /** A foreachBatch function committing each micro-batch (DataFrame of
    * `coord ARRAY<LONG>, value DOUBLE`) as one version of `variable`.
    * `sinkId` scopes the idempotence watermark — use one id per
    * logical streaming query (e.g. its checkpoint name).
    *
    * `compactEvery` (0 = off): per-microbatch commits accrue one tiny
    * index partition per version; every N committed batches the sink
    * folds them through [[GraftDataset.compactIndexLog]] so a
    * long-running stream maintains its own read-side health (the
    * metadata snapshot already compacts on its own cadence at commit).
    * Compaction is advisory maintenance — its failure never fails the
    * already-committed batch.
    *
    * `packEvery` (0 = off): the same self-maintenance for the BLOB
    * side — per-microbatch commits also accrue a handful of small
    * chunk files per version, the classic streaming-ingest small-file
    * problem; every N committed batches the sink folds them into pack
    * files through [[GraftDataset.packChunks]]. Stagger it against
    * `compactEvery` (e.g. 16 and 64) so the two folds don't pile onto
    * one batch.
    */
  def cellsBatchWriter(ds: GraftDataset, meta: DatasetMeta,
      variable: String, sinkId: String,
      compactEvery: Int = 0, packEvery: Int = 0): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val markerDir = new Path(s"${ds.path}/stream_commits/$sinkId")
      val wmFile = new Path(markerDir, "_watermark")
      val fs = markerDir.getFileSystem(
        batch.sparkSession.sparkContext.hadoopConfiguration)
      if (!readWatermark(fs, wmFile).exists(batchId <= _)) {
        val w = ds.newWriter(meta)
        try {
          w.writeSlab(variable, batch)
          w.commit()
        } catch {
          case e: Throwable =>
            try w.abort() catch { case _: Throwable => () }
            throw e
        }
        advanceWatermark(fs, markerDir, wmFile, batchId)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          try ds.compactIndexLog()
          catch { case scala.util.control.NonFatal(_) => () }
        }
        if (packEvery > 0 && (batchId + 1) % packEvery == 0) {
          try ds.packChunks()
          catch { case scala.util.control.NonFatal(_) => () }
        }
      }
  }

  private[graft] def readWatermark(fs: FileSystem, wmFile: Path): Option[Long] =
    if (!fs.exists(wmFile)) None
    else {
      val in = fs.open(wmFile)
      try {
        val buf = new Array[Byte](64)
        var off = 0
        var n = in.read(buf, off, buf.length - off)
        while (n > 0) { off += n; n = in.read(buf, off, buf.length - off) }
        if (off == 0) None
        else new String(buf, 0, off, UTF_8).trim.toLongOption
      } finally in.close()
    }

  /** Advance via tmp-write + delete + rename: the marker is either the
    * old value, absent (one-batch replay window, harmless — see class
    * doc), or the new value — never a torn partial write.
    */
  private[graft] def advanceWatermark(fs: FileSystem, markerDir: Path,
      wmFile: Path, batchId: Long): Unit = {
    fs.mkdirs(markerDir)
    val tmp = new Path(markerDir, f"_watermark.tmp.$batchId%020d")
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes(UTF_8)) finally out.close()
    fs.delete(wmFile, false)
    // a FileSystem may report rename failure as `false` rather than
    // throwing; failing silently would leave no watermark and stray
    // tmp files — surface it (the commit itself already succeeded;
    // the documented worst case on retry is one duplicate version)
    if (!fs.rename(tmp, wmFile))
      throw new java.io.IOException(
        s"failed to advance sink watermark $wmFile to batch $batchId")
  }
}
