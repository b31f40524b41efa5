package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The stateful dedup operator must keep BOUNDED state: event-time
  * timeout drops each user's id window once the watermark passes, while
  * running totals survive. Observed through eviction sentinel rows
  * (n_distinct = -1) across hand-driven micro-batches.
  */
class StreamingStateSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private def ts(hours: Double): Timestamp =
    new Timestamp((hours * 3600 * 1000).toLong)

  test("event-time timeout evicts the per-user id window, keeps totals") {
    val input = MemoryStream[(Long, Long, Timestamp)](spark)
    val out = StreamingOps.dedupStream(input.toDS(), emitEvictions = true)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("state_sink").start()
    try {
      // (base hour 10: rows AT the initial watermark 0 would be
      // late-filtered — epoch-0 event times are a test artifact)
      // batch 1: user 1, ids {10, 10, 11} -> 2 distinct, 3 total
      input.addData((1L, 10L, ts(10)), (1L, 10L, ts(10)),
        (1L, 11L, ts(10.1)))
      q.processAllAvailable()
      // batch 2: user 2 far in the future advances the watermark
      input.addData((2L, 20L, ts(15)))
      q.processAllAvailable()
      // batch 3: another event; user 1's timeout (last ts + 1h < wm)
      // fires -> eviction sentinel, id window dropped
      input.addData((2L, 21L, ts(15.1)))
      q.processAllAvailable()
      // batch 4: user 1 re-sends id 10 inside the new window: the old
      // window is gone, so it counts as distinct again (semantics of
      // watermark-scoped dedup), totals keep accumulating
      input.addData((1L, 10L, ts(15.2)))
      q.processAllAvailable()

      val rows = spark.table("state_sink")
        .as[(Long, Long, Long)].collect().toSeq
      assert(rows.contains((1L, 2L, 3L)), s"batch-1 totals missing: $rows")
      assert(rows.contains((1L, -1L, 3L)), s"no eviction sentinel: $rows")
      assert(rows.contains((1L, 3L, 4L)),
        s"re-sent id not re-counted after eviction: $rows")
    } finally q.stop()
  }

  test("LSH bucket state: cross-batch dup flags, min-id wins, timeout evicts") {
    val input = MemoryStream[(String, Long, Timestamp)](spark)
    val out = StreamingOps.lshDedupStream(input.toDS())
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("lsh_state_sink").start()
    try {
      // batch 1: bucket A sees ids 5 then 3 (one batch): only the
      // larger id is a dup regardless of arrival order
      input.addData(("A", 5L, ts(10)), ("A", 3L, ts(10)))
      q.processAllAvailable()
      // batch 2: a LATER batch hits bucket A with id 9 -> flagged
      // against the retained min (3)
      input.addData(("A", 9L, ts(10.5)))
      q.processAllAvailable()
      // batch 3: far-future event advances the watermark past A's
      // timeout; A's bucket state evicts
      input.addData(("B", 1L, ts(20)))
      q.processAllAvailable()
      input.addData(("B", 2L, ts(20.1)))
      q.processAllAvailable()
      // batch 4: id 4 in bucket A after eviction: state is gone, so it
      // is NOT flagged (watermark-scoped near-dup semantics)
      input.addData(("A", 4L, ts(20.2)))
      q.processAllAvailable()
      val rows = spark.table("lsh_state_sink")
        .as[(Long, Boolean)].collect().toSeq
      assert(rows.contains((3L, false)) && rows.contains((5L, true)),
        s"in-batch order independence broken: $rows")
      assert(rows.contains((9L, true)), s"cross-batch flag missing: $rows")
      assert(rows.contains((4L, false)),
        s"bucket state not evicted by timeout: $rows")
    } finally q.stop()
  }

  test("GraftSink: watermark makes replays no-ops, keeps O(1) marker state, aborts on failure") {
    import org.apache.hadoop.fs.Path
    import graft.core._
    import graft.core.Model._
    val lake = new GraftLake(spark,
      java.nio.file.Files.createTempDirectory("graft_sinkid_").toString)
    lake.create("s"); val ds = lake.connect("s")
    val meta = DatasetMeta(Seq(
      VariableMeta("m", "double", Seq(8), Seq(4), Double.NaN)))
    val sink = GraftSink.cellsBatchWriter(ds, meta, "m", "q1")
    def batch(ids: Seq[Long]) =
      ids.map(i => (Seq(i), i.toDouble)).toDF("coord", "value")
    sink(batch(Seq(0L, 1L)), 0L)
    sink(batch(Seq(4L, 5L)), 1L)
    assert(ds.versionIds().length == 2)
    // replays of already-committed batchIds are skipped entirely
    sink(batch(Seq(4L, 5L)), 1L)
    sink(batch(Seq(0L, 1L)), 0L)
    assert(ds.versionIds().length == 2)
    // marker state is one watermark file, not one file per batch
    val markerDir = new Path(s"${ds.path}/stream_commits/q1")
    val fs = markerDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(markerDir).map(_.getPath.getName).toSeq ==
      Seq("_watermark"))
    // a failing batch aborts its staged writer (no staged dir leak)
    // and does NOT advance the watermark
    intercept[Exception] {
      sink(Seq((Seq(0L, 0L), 1.0)).toDF("coord", "value"), 2L) // rank mismatch
    }
    assert(!fs.exists(new Path(s"${ds.path}/staging")) ||
      fs.listStatus(new Path(s"${ds.path}/staging")).isEmpty)
    sink(batch(Seq(2L)), 2L) // the retry commits normally
    assert(ds.versionIds().length == 3)
  }

  test("GraftSink compactEvery: long-running ingest folds its index log") {
    import org.apache.hadoop.fs.Path
    import graft.core._
    import graft.core.Model._
    val lake = new GraftLake(spark,
      java.nio.file.Files.createTempDirectory("graft_sinkc_").toString)
    lake.create("s"); val ds = lake.connect("s")
    val meta = DatasetMeta(Seq(
      VariableMeta("m", "double", Seq(8), Seq(4), Double.NaN)))
    val sink = GraftSink.cellsBatchWriter(ds, meta, "m", "q1",
      compactEvery = 2)
    def batch(ids: Seq[Long]) =
      ids.map(i => (Seq(i), i.toDouble)).toDF("coord", "value")
    (0 until 4).foreach(b => sink(batch(Seq(b.toLong)), b.toLong))
    assert(ds.versionIds().length == 4)
    // batches 1 and 3 triggered compaction: everything lives in the
    // merged store; the folded per-version dirs linger for in-flight
    // readers until gc's grace expires
    val fs = new Path(ds.path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"${ds.path}/indices_merged")))
    Thread.sleep(5) // fold mtime must age past graceMs = 0
    ds.gc(graceMs = 0L)
    val idxDirs = fs.listStatus(new Path(s"${ds.path}/indices"))
      .map(_.getPath.getName).filter(_.startsWith("versionId="))
    assert(idxDirs.isEmpty, idxDirs.mkString(","))
    // two folds (batches 1 and 3) → two incremental segments, each
    // holding just its tail — no full-store rewrite per fold
    assert(fs.listStatus(new Path(s"${ds.path}/indices_merged"))
      .map(_.getPath.getName).count(_.startsWith("seg-")) == 2)
    // reads unaffected
    val head = ds.versionIds().head
    val got = ds.readSlab("m", head)
      .as[(Seq[Long], Double)].collect().toMap
    assert(Seq(0L, 1L, 2L, 3L).forall(i => got(Seq(i)) == i.toDouble))
  }

  test("GraftSink packEvery: long-running ingest folds its blobs into " +
      "packs") {
    import org.apache.hadoop.fs.Path
    import graft.core._
    import graft.core.Model._
    val lake = new GraftLake(spark,
      java.nio.file.Files.createTempDirectory("graft_sinkp_").toString)
    lake.create("s"); val ds = lake.connect("s")
    val meta = DatasetMeta(Seq(
      VariableMeta("m", "double", Seq(8), Seq(4), Double.NaN)))
    val sink = GraftSink.cellsBatchWriter(ds, meta, "m", "q1",
      packEvery = 4)
    def batch(ids: Seq[Long]) =
      ids.map(i => (Seq(i), i.toDouble)).toDF("coord", "value")
    (0 until 4).foreach(b => sink(batch(Seq(b.toLong)), b.toLong))
    assert(ds.versionIds().length == 4)
    // batch 3 triggered the pack fold: no per-chunk blob files remain
    val fs = new Path(ds.path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val blobs = fs.listStatus(new Path(s"${ds.path}/chunks"))
      .filter(_.isDirectory)
      .flatMap(d => fs.listStatus(d.getPath))
      .map(_.getPath.getName).filter(_.endsWith(".bin"))
    assert(blobs.isEmpty, blobs.mkString(","))
    assert(fs.exists(new Path(s"${ds.path}/packs")))
    // reads unaffected through the pack fallback
    val head = ds.versionIds().head
    val got = ds.readSlab("m", head)
      .as[(Seq[Long], Double)].collect().toMap
    assert(Seq(0L, 1L, 2L, 3L).forall(i => got(Seq(i)) == i.toDouble))
  }

  test("store-backed streaming rollup sustains 100k groups (view never on the driver)") {
    import graft.core._
    import graft.core.Model._
    import org.apache.spark.sql.functions._
    val lake = new GraftLake(spark,
      graft.TempDirs.create("graft_ivm_stress_").toString)
    lake.create("big"); lake.create("big_view")
    val ds = lake.connect("big"); val vds = lake.connect("big_view")
    val n = 200000L; val groupDiv = 2L // 100k groups
    val meta = DatasetMeta(Seq(
      VariableMeta("v", "double", Seq(n), Seq(4096), Double.NaN)))
    val viewMeta = DatasetMeta(Seq(
      VariableMeta("view", "double", Seq(n / groupDiv), Seq(4096),
        Double.NaN)))
    val w1 = ds.newWriter(meta)
    w1.writeSlab("v", spark.range(n)
      .select(array(col("id")).as("coord"),
        col("id").cast("double").as("value")))
    w1.commit()
    val baseRef = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = StreamingOps.startRollupMaintainer(spark, ds, vds, viewMeta,
      groupDiv, chunkDiv = 4096L, baseRef)
    // pre-stage the incremental write (one chunk's worth of cells)
    val w2 = ds.newWriter(meta)
    w2.writeSlab("v", Seq((Seq(10L), 1000.0), (Seq(99999L), 5.0))
      .toDF("coord", "value"))
    try {
      q.processAllAvailable() // bootstrap: all 100k groups land in the store
      val zero = ChunkCodec.chunksDecoded.get()
      w2.commit()
      q.processAllAvailable()
      // the refresh touches 1 changed v-chunk: batch + retraction +
      // region-pruned view chunks + the writeSlab merge — bounded,
      // never the 49-chunk store or the 25-chunk view
      val decodes = ChunkCodec.chunksDecoded.get() - zero
      assert(decodes <= 16,
        s"incremental refresh decoded $decodes chunks at 100k groups")
    } finally q.stop()
    val head = vds.latestVersion.get
    val view = spark.read.format("graft")
      .option("path", vds.path).option("variable", "view").load()
      .where(!isnan(col("value")))
    assert(view.count() == n / groupDiv, "one view cell per group")
    val spot = view.where(col("x0").isin(5L, 7L, 49999L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // group 5 = 10+11 -> overwritten cell 10 makes it 1000+11
    assert(spot(5L) == 1011.0, s"got ${spot(5L)}")
    // group 49999 = 99998 + 5 (cell 99999 overwritten to 5)
    assert(spot(49999L) == 100003.0, s"got ${spot(49999L)}")
    // untouched group 7 = 14+15
    assert(spot(7L) == 29.0, s"got ${spot(7L)}")
  }
}
