package graft.streaming

import graft.{ColUtil, Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time operators over the `events` table: a genuine Structured
  * Streaming tumbling-window aggregation (file source → watermark →
  * window agg → memory sink), batch sessionization via session_window,
  * and an as-of join (latest click ≤ each purchase) composed as a
  * single-shuffle union+window — the set-oriented replacement for a
  * per-row point-lookup loop (SURVEY §3.1's N+1 lesson).
  */
object StreamingOps extends QueryPack {

  private val counter = new java.util.concurrent.atomic.AtomicInteger()

  /** Wall seconds of the last MEANINGFUL section per query (the
    * streaming drain / the ingest commit loop) — what [[Q.benchSecs]]
    * reports, so per-run checkpoint/staging scaffolding stays outside
    * the bench clock (its jitter was masking real plan regressions:
    * round-7/8 st06 swung ±13% on an unchanged plan).
    */
  private val timedSecs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  private def recordSecs[T](key: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally timedSecs.put(key, (System.nanoTime() - t0) / 1e9)
  }

  /** Volume-adaptive shuffle/state-partition scope for the streaming
    * flows (guide §2.2: fewer, fuller partitions — size stateful
    * shuffles by DATA, not core count). A stateful streaming operator
    * instantiates `spark.sql.shuffle.partitions` state-store
    * partitions per operator and pays per-partition snapshot/commit
    * I/O on EVERY micro-batch — AQE cannot help (it is disabled for
    * stateful workloads), so a replay of a few MB under local[32]
    * runs 32-way state machinery per batch and is measurably SLOWER
    * than at 8 cores (round-13 scaling ratios 0.26–0.55 on
    * st07/st13/st08/st12/st14). Partitions here derive from the
    * flow's input bytes on disk:
    *   n = clamp(ceil(bytes / spark.graft.streaming.stateBytesPerPartition),
    *             1, defaultParallelism)
    * with the per-partition target defaulting to 32 MB (small enough
    * that state per task stays comfortably in memory at the cap, big
    * enough that a partition's per-batch constant is amortized). The
    * cap — not the constant — binds at production volume: a 100 TB/day
    * replay saturates every core; only genuinely tiny inputs shrink.
    * The caller's conf is restored on exit; each flow drains its
    * query (fresh checkpoint per run) inside the scope, and the
    * partition count is semantics-free for every operator here
    * (per-key state, hash-partitioned aggregation/join).
    */
  private def withStatePartitions[T](s: SparkSession, paths: Seq[String])
      (body: => T): T = {
    val prev = s.conf.getOption("spark.sql.shuffle.partitions")
    val perPart = s.conf
      .getOption("spark.graft.streaming.stateBytesPerPartition")
      .map(_.toLong).getOrElse(32L * 1024 * 1024)
    val bytes = paths.map { p =>
      try {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration)
          .getContentSummary(hp).getLength
      } catch { case _: java.io.IOException => 0L }
    }.sum
    val n = math.max(1L, math.min((bytes + perPart - 1L) / perPart,
      s.sparkContext.defaultParallelism.toLong)).toInt
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body
    finally prev match {
      case Some(v) => s.conf.set("spark.sql.shuffle.partitions", v)
      case None => s.conf.unset("spark.sql.shuffle.partitions")
    }
  }

  /** benchSecs runner: execute the full flow (result materialized so
    * the memory sink is really read), report the recorded section.
    */
  private def timedBench(key: String,
      flow: (SparkSession, String) => DataFrame)
      : Option[(SparkSession, String) => Double] =
    Some((s, d) => { flow(s, d).count(); timedSecs.get(key) })

  /** One staging dir per symlink layout per JVM: repeated verify/bench
    * runs reuse the cached dir instead of leaking one per run, and
    * [[graft.TempDirs]] removes them all at JVM exit.
    */
  private val stagedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  private def stagedDir(key: String, links: (String, String)*): String =
    stagedDirs.compute(key, (_, cached) => {
      // revalidate a cache hit: Files.exists follows the symlink, so a
      // source parquet deleted/regenerated under a different name
      // mid-JVM restages instead of serving dangling links forever
      // (the stale dir itself is reaped by TempDirs at JVM exit)
      if (cached != null && links.forall { case (name, _) =>
            java.nio.file.Files.exists(cached.resolve(name)) }) cached
      else {
        val dir = graft.TempDirs.create("graft_stream_")
        links.foreach { case (name, target) =>
          java.nio.file.Files.createSymbolicLink(
            dir.resolve(name), java.nio.file.Paths.get(target))
        }
        dir
      }
    }).toString

  /** The st08/st09 oracles are TIMELESS (plain DuckDB SQL over the full
    * table): they match the streaming run only because the file source
    * ingests every staged file in ONE micro-batch (the default with no
    * `maxFilesPerTrigger`), so watermark eviction / late-row dropping
    * never fire mid-run. Assert that assumption so an option or config
    * drift fails loudly instead of surfacing as a silent oracle hash
    * mismatch.
    */
  private def assertSingleBatch(q: org.apache.spark.sql.streaming.StreamingQuery,
      name: String): Unit = {
    val progress = q.recentProgress
    // recentProgress is a ring buffer capped by
    // spark.sql.streaming.numRecentProgressUpdates (default 100): the
    // count below is only authoritative while every batch since id 0
    // is still retained — these replays run a handful of batches, but
    // prove it rather than trust the cap silently
    require(progress.isEmpty ||
        progress.last.batchId == progress.length - 1,
      s"$name ran more micro-batches than the progress buffer retains; " +
        "cannot verify the single-batch replay its timeless oracle " +
        "depends on")
    val dataBatches = progress.count(_.numInputRows > 0)
    // 0 data batches (an empty source) is fine: nothing was split
    // across watermark evictions and the empty result is the oracle's
    require(dataBatches <= 1,
      s"$name replayed in $dataBatches micro-batches; its global oracle " +
        "is only valid when the whole file replay lands in one batch")
  }

  /** Stage `events.parquet` as a streaming source: the file stream
    * source wants a DIRECTORY, so symlink the file into a temp dir,
    * then normalize the TIMESTAMP(NANOS)-as-long column exactly like
    * `Tables.load`. One definition shared by every streaming runner so
    * the staging scheme and ts encoding cannot drift between them.
    */
  private def eventStream(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    val dir = stagedDir(s"events:$d", "events.parquet" -> path)
    val sch = s.read.parquet(path).schema
    graft.Tables.normalizeTs(s.readStream.schema(sch).parquet(dir))
  }

  /** Batch-equivalent streaming run: replay events.parquet through a
    * real streaming query, synchronously, into a memory sink.
    */
  private def runStream(s: SparkSession, d: String): DataFrame =
      withStatePartitions(s, Seq(s"$d/events.parquet")) {
    val agg = eventStream(s, d)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), ColUtil.dsum(col("value")).as("sum_value"))
    val qname = s"st01_sink_${counter.incrementAndGet()}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(qname).start()
    try recordSecs("st01_stream_tumbling")(q.processAllAvailable())
    finally q.stop()
    s.table(qname)
      .select(col("w.start").as("wstart"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Mutable per-user state for the stateful dedup+counter query.
    * BOUNDED: `seenRecent` holds only event ids within the watermark
    * window (id -> latest event-time millis); the running totals are
    * O(1). On an unbounded stream the state per key is proportional to
    * the id arrival rate × watermark delay, never to stream history.
    */
  case class UserState(seenRecent: Map[Long, Long], nDistinct: Long,
      nTotal: Long, maxTs: Long)

  /** Custom stateful streaming operator via flatMapGroupsWithState +
    * event-time timeout: per-user dedup by event_id within the
    * watermark window + running totals. When a user's timeout fires
    * (watermark passed their last event + 1 h), the id window is
    * dropped — the state store holds a bounded working set per key.
    * `emitEvictions` surfaces the eviction as a sentinel row
    * (n_distinct = -1) so tests can observe state shrinking.
    */
  private[graft] def dedupStream(events: org.apache.spark.sql.Dataset[
      (Long, Long, java.sql.Timestamp)], emitEvictions: Boolean)
      : DataFrame = {
    import events.sparkSession.implicits._
    val horizonMs = 3600L * 1000
    events.toDF("user_id", "event_id", "ts")
      .withWatermark("ts", "1 hour")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserState, (Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[(Long, Long, java.sql.Timestamp)],
            state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            // the watermark passed every retained id: drop the window,
            // keep the O(1) totals (dedup semantics beyond the
            // watermark are dropDuplicatesWithinWatermark's)
            val prev = state.get
            state.update(prev.copy(seenRecent = Map.empty))
            if (emitEvictions) Iterator.single((userId, -1L, prev.nTotal))
            else Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            val prev = state.getOption
              .getOrElse(UserState(Map.empty, 0L, 0L, 0L))
            val batch = evs.map(t => (t._2, t._3.getTime)).toSeq
            var seen = prev.seenRecent.filter(_._2 >= wm)
            var nd = prev.nDistinct
            batch.foreach { case (id, t) =>
              if (!seen.contains(id)) nd += 1
              seen = seen.updated(id, math.max(t, seen.getOrElse(id, 0L)))
            }
            val maxTs = math.max(prev.maxTs, batch.map(_._2).max)
            val next = UserState(seen, nd, prev.nTotal + batch.size, maxTs)
            state.update(next)
            state.setTimeoutTimestamp(math.max(maxTs + horizonMs, wm + 1))
            Iterator.single((userId, nd, next.nTotal))
          }
      }
      .toDF("user_id", "n_distinct_events", "n_total")
  }

  /** File-replay runner for the stateful dedup operator. */
  private def runStateful(s: SparkSession, d: String): DataFrame =
      withStatePartitions(s, Seq(s"$d/events.parquet")) {
    import s.implicits._
    val src = eventStream(s, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
    val updates = dedupStream(src, emitEvictions = false)
    val qname = s"st04_sink_${counter.incrementAndGet()}"
    val q = updates
      .writeStream.outputMode("update")
      .format("memory").queryName(qname).start()
    try recordSecs("st04_stateful_dedup")(q.processAllAvailable())
    finally q.stop()
    // single-batch replay -> the last update per user is the final state
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("n_total").desc)
    s.table(qname)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
  }

  /** Stream-stream interval join run as a REAL streaming query: two
    * independent file-replay streams over the same events (purchases ⋈
    * clicks of the same user with click.ts in [p.ts − 1 h, p.ts]).
    * Both sides carry watermarks and the join carries the time bound,
    * so Spark's symmetric-hash stream join can evict buffered rows
    * once the watermark clears the interval — bounded state on an
    * unbounded stream, the property a naive cache-one-side join lacks.
    */
  private def runStreamJoin(s: SparkSession, d: String): DataFrame =
      withStatePartitions(s, Seq(s"$d/events.parquet")) {
    def src() = eventStream(s, d)
    val clicks = src().where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val purchases = src().where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val joined = purchases.join(clicks,
      col("user_id") === col("cu") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("click_id"))
    val qname = s"st07_sink_${counter.incrementAndGet()}"
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(qname).start()
    try recordSecs("st07_stream_interval_join")(q.processAllAvailable())
    finally q.stop()
    s.table(qname)
  }

  private val asofOracle =
    "WITH clicks AS (SELECT user_id, ts, max(event_id) AS click_id " +
      "FROM events WHERE event_type = 'click' GROUP BY user_id, ts), " +
      "purch AS (SELECT user_id, ts, event_id FROM events " +
      "WHERE event_type = 'purchase') " +
      "SELECT p.user_id, p.event_id AS purchase_id, p.ts AS p_ts, " +
      "c.click_id AS click_id, c.ts AS click_ts " +
      "FROM purch p ASOF LEFT JOIN clicks c " +
      "ON p.user_id = c.user_id AND c.ts <= p.ts"

  /** st06 flow: replay 3 deterministic micro-batches through a real
    * streaming query whose sink commits each batch as a store version
    * (GraftSink.cellsBatchWriter), then read HEAD back. Batch b writes
    * cells 4b..4b+3 with value 10·coord + b.
    */
  private def runIngest(s: SparkSession): DataFrame =
      withStatePartitions(s, Seq.empty) {
    import s.implicits._
    import graft.core._
    import graft.core.Model._
    val lake = new GraftLake(s,
      graft.TempDirs.create("graft_sink_").toString)
    lake.create("stream")
    val ds = lake.connect("stream")
    val meta = DatasetMeta(Seq(
      VariableMeta("m", "double", Seq(16), Seq(4), Double.NaN)))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)](s)
    val cells = input.toDF()
      .select(array(col("_1")).as("coord"), col("_2").as("value"))
    val q = cells.writeStream
      .foreachBatch(GraftSink.cellsBatchWriter(ds, meta, "m", "st06"))
      .outputMode("append").start()
    try recordSecs("st06_stream_ingest") {
      (0 until 3).foreach { b =>
        input.addData((0 until 4).map(i =>
          (4L * b + i, (4L * b + i) * 10.0 + b)))
        q.processAllAvailable() // one commit per micro-batch
      }
    } finally q.stop()
    val head = ds.latestVersion.get
    ds.readSlab("m", head)
      .where(!isnan(col("value")))
      .select(element_at(col("coord"), 1).as("x"), col("value"))
      .withColumn("n_versions", lit(ds.versionIds().length.toLong))
  }

  /** st11 flow: the NATIVE DSv2 streaming sink — `writeStream.toTable`
    * straight into a catalog table, no foreachBatch plumbing
    * (graft.sources.GraftStreamingWrite). Same deterministic replay as
    * st06 (batch b writes cells 4b..4b+3, value 10·coord + b), each
    * micro-batch one store version, exactly-once via the per-query
    * epoch watermark. n_versions counts DATA versions (total minus the
    * CREATE TABLE metadata commit) so the oracle closed form matches
    * st06's three commits.
    */
  private def runNativeStreamWrite(s: SparkSession): DataFrame =
      withStatePartitions(s, Seq.empty) {
    import s.implicits._
    val root = graft.TempDirs.create("graft_swq_").toString
    val cat = s"g_st11_${counter.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    s.sql(s"CREATE NAMESPACE $cat.ns")
    s.sql(s"CREATE TABLE $cat.ns.m (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='16', chunkDims='4')")
    val ds = new graft.core.GraftLake(s, root).connect("ns")
    val baseVersions = ds.versionIds().length
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)](s)
    val ckpt = graft.TempDirs.create("graft_swq_ckpt_").toString
    val q = input.toDF()
      .select(col("_1").as("x0"), col("_2").as("value"))
      .writeStream.option("checkpointLocation", ckpt)
      .toTable(s"$cat.ns.m")
    try recordSecs("st11_stream_native_write") {
      (0 until 3).foreach { b =>
        input.addData((0 until 4).map(i =>
          (4L * b + i, (4L * b + i) * 10.0 + b)))
        q.processAllAvailable() // one store version per micro-batch
      }
    } finally q.stop()
    s.sql(s"SELECT x0 AS x, value FROM $cat.ns.m WHERE NOT isnan(value)")
      .withColumn("n_versions",
        lit((ds.versionIds().length - baseVersions).toLong))
  }

  /** st16 flow: store-to-store streaming replication, native on BOTH
    * sides — the graft CDC source (each micro-batch = the cells of
    * chunks written by newly-committed versions) feeds the graft DSv2
    * streaming sink (one replica version per epoch, exactly-once via
    * the per-query-id watermark). No foreachBatch, no driver-side
    * apply loop: the replica is a second dataset kept current purely
    * by the engine's own source/sink pair, the multi-region-replica
    * story at 100 TB (admission control bounds each catch-up batch;
    * a rewritten chunk ships its merged cells, so partial overwrites
    * replay correctly — fill-write deletes route through the
    * diff-based ArrayOps.applyDiff path instead, which carries the
    * old/new distinction the changelog deliberately does not).
    */
  private def runCdcReplicate(s: SparkSession): DataFrame =
      withStatePartitions(s, Seq.empty) {
    val root = graft.TempDirs.create("graft_cdcrep_").toString
    val cat = s"g_st16_${counter.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    s.sql(s"CREATE NAMESPACE $cat.src")
    s.sql(s"CREATE NAMESPACE $cat.rep")
    s.sql(s"CREATE TABLE $cat.src.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='16', chunkDims='4')")
    s.sql(s"CREATE TABLE $cat.rep.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='16', chunkDims='4')")
    val srcDs = new graft.core.GraftLake(s, root).connect("src")
    val repDs = new graft.core.GraftLake(s, root).connect("rep")
    val baseVersions = repDs.versionIds().length
    // three source commits: bulk load, append, partial-chunk overwrite
    s.sql(s"INSERT INTO $cat.src.t SELECT id, CAST(id * 10 AS DOUBLE) " +
      "FROM range(8)")
    s.sql(s"INSERT INTO $cat.src.t SELECT id, " +
      "CAST(id * 10 + 1 AS DOUBLE) FROM range(8, 12)")
    s.sql(s"INSERT INTO $cat.src.t VALUES (2, CAST(999 AS DOUBLE))")
    val ckpt = graft.TempDirs.create("graft_cdcrep_ckpt_").toString
    val q = s.readStream.format("graft")
      .option("path", srcDs.path).option("variable", "t")
      .option("maxVersionsPerBatch", "1").load()
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(s"$cat.rep.t")
    try recordSecs("st16_cdc_replicate") {
      require(q.awaitTermination(180000), "CDC drain timed out")
    } finally if (q.isActive) q.stop()
    s.sql(s"SELECT x0 AS x, value FROM $cat.rep.t WHERE NOT isnan(value)")
      .withColumn("n_versions",
        lit((repDs.versionIds().length - baseVersions).toLong))
  }

  /** st12 flow: stream-static enrichment — the canonical "join the
    * stream to a dimension" pattern. The static side (per-user
    * lifetime activity tier, computed batch) BROADCASTS under the
    * stream: no stream-side shuffle, no state store — each micro-batch
    * hash-probes the dim locally, so at 100 TB/day the join costs scan
    * speed while the only stateful operator is the downstream windowed
    * agg. Oracle: the identical batch join+agg in DuckDB.
    */
  private def runStreamStaticJoin(s: SparkSession, d: String): DataFrame =
      withStatePartitions(s, Seq(s"$d/events.parquet")) {
    val dim = graft.Tables.load(s, d, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_total"))
      .select(col("user_id"),
        when(col("n_total") >= 20, "heavy")
          .when(col("n_total") >= 10, "medium")
          .otherwise("light").as("activity"))
    val agg = eventStream(s, d)
      .join(broadcast(dim), "user_id")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("activity"))
      .agg(count(lit(1)).as("n"), ColUtil.dsum(col("value")).as("sum_value"))
    val qname = s"st12_sink_${counter.incrementAndGet()}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(qname).start()
    try recordSecs("st12_stream_static_join")(q.processAllAvailable())
    finally q.stop()
    s.table(qname)
      .select(col("w.start").as("wstart"), col("activity"),
        col("n"), col("sum_value"))
  }

  private val sentinelFiles =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One far-future click + purchase pair (user_id = −1), written once
    * per source dir and staged ALONGSIDE events.parquet: the replay's
    * single data batch then carries a max event-time 90 days past the
    * real data, so after that batch the watermark clears every real
    * row's join window and the automatic no-data batch evicts all
    * buffered join state — which is what EMITS the outer join's null
    * rows. Without it the final purchases would sit in the state store
    * forever (the batch-replay analog of a stream that simply keeps
    * flowing past the window). Column dtypes are cast back to the
    * source schema so the staged file reads under the same
    * readStream schema as the real one.
    */
  private def sentinelFile(s: SparkSession, d: String): String =
    sentinelFiles.computeIfAbsent(d, _ => {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      val path = s"$d/events.parquet"
      val sch = s.read.parquet(path).schema
      val raw = s.read.schema(sch).parquet(path)
      val deltaMs = 90L * 24 * 3600 * 1000
      val far = sch("ts").dataType match {
        case LongType => // TIMESTAMP(NANOS) surfaced as long
          lit(raw.agg(max(col("ts"))).head().getLong(0) +
            deltaMs * 1000000L)
        case TimestampNTZType =>
          lit(raw.agg(max(col("ts"))).head()
            .getAs[java.time.LocalDateTime](0).plusDays(90))
        case _ =>
          lit(new java.sql.Timestamp(
            raw.agg(max(col("ts"))).head()
              .getAs[java.sql.Timestamp](0).getTime + deltaMs))
      }
      val base = raw.limit(1)
        .withColumn("user_id", lit(-1L).cast(sch("user_id").dataType))
        .withColumn("event_id", lit(-1L).cast(sch("event_id").dataType))
        .withColumn("ts", far.cast(sch("ts").dataType))
      val sent = base.withColumn("event_type", lit("click"))
        .union(base.withColumn("event_type", lit("purchase")))
      val out = graft.TempDirs.create("graft_sentinel_")
        .resolve("out").toString
      sent.coalesce(1).write.mode("overwrite").parquet(out)
      new java.io.File(out).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get.getAbsolutePath
    })

  /** st13 flow: stream-stream LEFT OUTER interval join — st07's inner
    * join plus the semantics only a watermark can provide: a purchase
    * with no click in its look-back window must STILL emit (with a
    * null click), and it can only do so once the watermark proves no
    * matching click can ever arrive. State stays bounded exactly as in
    * the inner join; the null-side emission rides state eviction.
    */
  private def runStreamOuterJoin(s: SparkSession, d: String): DataFrame =
      withStatePartitions(s, Seq(s"$d/events.parquet")) {
    val path = s"$d/events.parquet"
    val dir = stagedDir(s"events+sentinel:$d",
      "events.parquet" -> path,
      "sentinel.parquet" -> sentinelFile(s, d))
    val sch = s.read.parquet(path).schema
    def src() =
      graft.Tables.normalizeTs(s.readStream.schema(sch).parquet(dir))
    val clicks = src().where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val purchases = src().where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val joined = purchases.join(clicks,
        col("user_id") === col("cu") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"),
        "leftOuter")
      .select(col("user_id"), col("purchase_id"), col("click_id"))
    val qname = s"st13_sink_${counter.incrementAndGet()}"
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(qname).start()
    try recordSecs("st13_stream_outer_join")(q.processAllAvailable())
    finally q.stop()
    // the sentinel pair is dropped HERE, on the batch read of the sink
    // — NOT inside the streaming plan: a `user_id >= 0` filter there is
    // pushed through the outer join into both scans (left directly,
    // right via the join-key constraint), where the sentinel file's
    // parquet footer stats (user_id = −1) prune the WHOLE file before
    // its rows can ever advance the watermark
    s.table(qname).where(col("user_id") >= 0)
  }

  /** st14 flow: STREAMING sessionization — st02's session_window agg
    * run as a real streaming query in append mode. Sessions are
    * merging state: every event within 30 min of an open session
    * extends it (possibly fusing two open sessions), and a session
    * only emits once the watermark proves no event can extend it
    * again. The far-future sentinel closes every real session at
    * end-of-replay (same mechanism as st13; the sentinel's own
    * single-event session is dropped on the batch read of the sink).
    */
  private def runStreamSessionize(s: SparkSession, d: String): DataFrame =
      withStatePartitions(s, Seq(s"$d/events.parquet")) {
    val path = s"$d/events.parquet"
    val dir = stagedDir(s"events+sentinel:$d",
      "events.parquet" -> path,
      "sentinel.parquet" -> sentinelFile(s, d))
    val sch = s.read.parquet(path).schema
    val agg = graft.Tables.normalizeTs(
        s.readStream.schema(sch).parquet(dir))
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        ColUtil.dsum(col("value")).as("sum_value"))
    val qname = s"st14_sink_${counter.incrementAndGet()}"
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(qname).start()
    try recordSecs("st14_stream_sessionize")(q.processAllAvailable())
    finally q.stop()
    s.table(qname).where(col("user_id") >= 0)
      .select(col("user_id"), col("sw.start").as("sstart"),
        col("sw.end").as("send"), col("n_events"), col("sum_value"))
  }

  /** st08 flow: the events file staged TWICE into the stream source
    * (two symlinks) so every event arrives duplicated, then
    * dropDuplicatesWithinWatermark(event_id) — Spark's bounded-state
    * streaming dedup (state per key is held only until the watermark
    * passes its event time, unlike a plain dropDuplicates whose state
    * grows with stream history). The replay must restore exactly one
    * copy of each event, verified by aggregating the deduped stream
    * against the batch table.
    */
  private def runDedupWithinWatermark(s: SparkSession, d: String): DataFrame =
      withStatePartitions(s,
        Seq(s"$d/events.parquet", s"$d/events.parquet")) {
    val path = s"$d/events.parquet"
    val dir = stagedDir(s"events_dup:$d",
      "a.parquet" -> path, "b.parquet" -> path)
    val sch = s.read.parquet(path).schema
    val deduped = graft.Tables
      .normalizeTs(s.readStream.schema(sch).parquet(dir))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val qname = s"st08_sink_${counter.incrementAndGet()}"
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName(qname).start()
    try {
      recordSecs("st08_dedup_within_watermark")(q.processAllAvailable())
      assertSingleBatch(q, "st08")
    } finally q.stop()
    s.table(qname).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), graft.ColUtil.dsum(col("value")).as("sum_value"))
  }

  /** MinHash/LSH band signatures computed entirely per-row (array
    * higher-order functions over the token list — NO shuffle), so the
    * signature stage legally lives in a streaming map stage. Constants
    * and arithmetic are bit-identical to the batch d03 pipeline
    * (31-bit md5-derived base hash, 32 affine perms mod 2^31−1,
    * 8 bands × 4 rows), which is what lets a streaming replay share a
    * DuckDB oracle with the batch operator.
    */
  private[graft] def bandedNoShuffle(docs: DataFrame): DataFrame = {
    val P = 2147483647L
    def aC(i: Int) = (1103515245L * (i + 1) + 12345L) % P
    def cC(i: Int) = (69069L * (i + 1) + 54321L) % P
    val numPerm = 32; val bands = 8; val rowsPerBand = numPerm / bands
    val sigs = docs
      .withColumn("t", split(trim(col("text")), " "))
      .where(size(col("t")) >= 3)
      .withColumn("shs", array_distinct(expr(
        "transform(sequence(0, size(t) - 3), " +
          "i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")))
      .withColumn("bms", expr(
        "transform(shs, s -> pmod(cast(conv(substring(md5(s), 1, 8), " +
          s"16, 10) AS BIGINT), ${P}L))"))
      .select(col("doc_id") +: (0 until numPerm).map(i => expr(
        s"array_min(transform(bms, x -> pmod(${aC(i)}L * x + ${cC(i)}L, " +
          s"${P}L)))").as(s"m$i")): _*)
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r =>
        col(s"m${b * rowsPerBand + r}").cast("string"))
      struct(lit(b).as("band"), md5(concat_ws("_", slice: _*)).as("bh"))
        .as(s"b$b")
    }
    sigs.select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"), explode(array(
        (0 until bands).map(b => col(s"b$b")): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** Streaming LSH near-dup detection: keyed by band bucket, state =
    * smallest doc id ever seen in the bucket (ONE long per live
    * bucket), event-time timeout drops buckets once the watermark
    * passes them. A doc is flagged when some band bucket already holds
    * a smaller id — the streaming analog of d03's candidate
    * generation, linear state, no pairwise joins.
    */
  private[graft] def lshDedupStream(banded: org.apache.spark.sql.Dataset[
      (String, Long, java.sql.Timestamp)]): DataFrame = {
    import banded.sparkSession.implicits._
    banded.toDF("bucket", "doc_id", "ts")
      .withWatermark("ts", "1 hour")
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Boolean)](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (bucket: String, rows: Iterator[(String, Long, java.sql.Timestamp)],
            state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // ascending id order makes the flag order-independent for
            // a batch: dup ⇔ a strictly smaller id reached this bucket
            val batch = rows.toArray
            val ids = batch.map(_._2).sorted
            var mn = state.getOption.getOrElse(Long.MaxValue)
            val out = ids.map { id =>
              val dup = mn < id
              mn = math.min(mn, id)
              (id, dup)
            }
            state.update(mn)
            // anchor the timeout to the group's own max event time, not
            // the current watermark: in the first batch the watermark is
            // still 0, and a watermark-relative timeout would already be
            // in the past once the real watermark kicks in
            val maxTs = batch.map(_._3.getTime).max
            state.setTimeoutTimestamp(math.max(
              maxTs + 3600L * 1000,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
      .toDF("doc_id", "is_dup")
  }

  /** File-replay runner: documents stream -> per-row band signatures ->
    * stateful bucket dedup -> flagged ids. Synthetic event time (10 h
    * base + 1 s per doc) keeps every row ahead of the initial
    * watermark.
    */
  private def runStreamLsh(s: SparkSession, d: String): DataFrame =
      withStatePartitions(s, Seq(s"$d/documents.parquet")) {
    import s.implicits._
    val path = s"$d/documents.parquet"
    val dir = stagedDir(s"documents:$d", "documents.parquet" -> path)
    val sch = s.read.parquet(path).schema
    val src = s.readStream.schema(sch).parquet(dir)
    val banded = bandedNoShuffle(src)
      .withColumn("ts",
        expr("timestamp_micros(36000000000 + doc_id * 1000000)"))
      .select(concat(col("band").cast("string"), lit("|"), col("bh"))
        .as("bucket"), col("doc_id"), col("ts"))
      .as[(String, Long, java.sql.Timestamp)]
    val flags = lshDedupStream(banded)
    val qname = s"st09_sink_${counter.incrementAndGet()}"
    val q = flags.writeStream.outputMode("update")
      .format("memory").queryName(qname).start()
    try {
      recordSecs("st09_stream_lsh_dedup")(q.processAllAvailable())
      assertSingleBatch(q, "st09")
    } finally q.stop()
    s.table(qname).where(col("is_dup")).select(col("doc_id")).distinct()
  }

  /** Start the incremental-view maintainer: a foreachBatch over the
    * store changelog that keeps a per-group SUM rollup current as
    * base + new − old per micro-batch, with the VIEW ITSELF a store
    * variable in `vds` (never driver memory — group cardinality is
    * bounded by the view variable's shape, not the driver heap). Per
    * batch, everything is distributed DataFrames end to end:
    * new contributions from the batch, retractions from an asOf read
    * at the pre-batch version pruned to the changed boxes, current
    * view values from a region-pruned view read over the touched
    * group range, and one writeSlab commit of the updated cells. The
    * only driver-side state is the base-version watermark and the
    * changed-chunk id set (O(changed chunks), not O(groups)).
    */
  private[graft] def startRollupMaintainer(s: SparkSession,
      ds: graft.core.GraftDataset, vds: graft.core.GraftDataset,
      viewMeta: graft.core.Model.DatasetMeta, groupDiv: Long,
      chunkDiv: Long,
      baseRef: java.util.concurrent.atomic.AtomicLong)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = s.readStream.format("graft")
      .option("path", ds.path).option("variable", "v")
      .option("withVersion", "true").load()
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val cached = batch.cache()
      try {
        val info = cached.agg(max(col("_version")).as("vmax"),
          collect_set(expr(s"x0 div $chunkDiv")).as("chunks")).head()
        if (!info.isNullAt(0)) {
          val base = baseRef.get()
          val boxes = info.getSeq[Long](1)
            .map(c => (c * chunkDiv, c * chunkDiv + chunkDiv))
          val newC = cached.groupBy(expr(s"x0 div $groupDiv").as("g"))
            .agg(sum(col("value")).as("d"))
          val delta =
            if (base > 0L) {
              // retract the changed boxes' old contributions — an
              // asOf read at the pre-batch version, ONE SCAN PER BOX
              // so each gets its own pushed region (an OR of ranges
              // does not absorb into a region box and would scan the
              // store densely)
              val oldC = boxes.map { b =>
                s.read.format("graft")
                  .option("path", ds.path).option("variable", "v")
                  .option("asOf", base.toString).load()
                  .where(col("x0") >= b._1 && col("x0") < b._2)
              }.reduce(_ unionAll _)
                .groupBy(expr(s"x0 div $groupDiv").as("g"))
                .agg((-sum(col("value"))).as("d"))
              newC.unionAll(oldC).groupBy(col("g"))
                .agg(sum(col("d")).as("d"))
            } else newC
          // current view values over the touched groups only: one
          // region-pruned scan per merged group range — an
          // incremental batch reads O(changed) view chunks
          val gRanges = boxes
            .map(b => (b._1 / groupDiv, (b._2 - 1) / groupDiv))
            .sortBy(_._1)
            .foldLeft(List.empty[(Long, Long)]) {
              case ((lo, hi) :: tl, (l, h)) if l <= hi + 1 =>
                (lo, math.max(hi, h)) :: tl
              case (acc, r) => r :: acc
            }
          val withCur = vds.latestVersion match {
            case Some(_) =>
              val cur = gRanges.map { case (gLo, gHi) =>
                s.read.format("graft")
                  .option("path", vds.path).option("variable", "view")
                  .load()
                  .where(col("x0") >= gLo && col("x0") <= gHi)
              }.reduce(_ unionAll _)
                .where(!isnan(col("value")))
                .select(col("x0").as("g"), col("value").as("cv"))
              delta.join(cur, Seq("g"), "left")
            case None =>
              delta.withColumn("cv", lit(null).cast("double"))
          }
          val updated = withCur.select(array(col("g")).as("coord"),
            (coalesce(col("cv"), lit(0.0)) + col("d")).as("value"))
          val w = vds.newWriter(viewMeta)
          w.writeSlab("view", updated)
          w.commit()
          baseRef.set(math.max(base, info.getLong(0)))
        }
      } finally { cached.unpersist(); () }
    }.start()
  }

  /** st10 flow: CONTINUOUS incremental-view maintenance — a
    * readStream changelog tail of the store drives a per-group rollup
    * maintained as base + new − old per micro-batch (the streaming
    * form of m24's batch refresh), with the view LANDING IN THE STORE
    * (a `view` variable in its own dataset — versioned, time-
    * travelable, bounded by shape not driver heap; the round-9 form
    * collected per-group results to a driver ConcurrentHashMap).
    * Each batch carries the changed chunks' cells; the batch itself
    * yields the changed boxes and new contributions, an asOf read at
    * the batch's BASE version (pruned to those boxes) yields the old
    * ones, and a region-pruned view read + one writeSlab commit land
    * the refresh. Payload I/O per refresh is O(changed chunks),
    * decode-counter-gated — the view never re-scans the store, at any
    * history depth; StreamingStateSpec stresses 10⁵ groups.
    */
  private def runStreamRollup(s: SparkSession): DataFrame =
      withStatePartitions(s, Seq.empty) {
    import s.implicits._
    import graft.core._
    import graft.core.Model._
    val lake = new GraftLake(s,
      graft.TempDirs.create("graft_ivm_").toString)
    lake.create("ivm")
    lake.create("ivm_view")
    val ds = lake.connect("ivm")
    val vds = lake.connect("ivm_view")
    val meta = DatasetMeta(Seq(
      VariableMeta("v", "double", Seq(32), Seq(4), Double.NaN)))
    val viewMeta = DatasetMeta(Seq(
      VariableMeta("view", "double", Seq(4), Seq(4), Double.NaN)))
    val w1 = ds.newWriter(meta)
    w1.writeSlab("v",
      (0L until 32L).map(i => (Seq(i), i.toDouble)).toDF("coord", "value"))
    w1.commit()
    val baseRef = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = startRollupMaintainer(s, ds, vds, viewMeta,
      groupDiv = 8L, chunkDiv = 4L, baseRef)
    // pre-stage both incremental writes OUTSIDE the timed window (the
    // st06 treatment: the clock measures VIEW MAINTENANCE, not the
    // data-production staging jobs). Disjoint chunks against the same
    // v1 snapshot — commit order can't conflict, and the merged-in
    // old cells are identical either way.
    val w2 = ds.newWriter(meta)
    w2.writeSlab("v", Seq((Seq(5L), 555.0)).toDF("coord", "value"))
    val w3 = ds.newWriter(meta)
    w3.writeSlab("v", Seq((Seq(20L), 2000.0), (Seq(21L), 2100.0))
      .toDF("coord", "value"))
    try recordSecs("st10_stream_rollup") {
      q.processAllAvailable() // bootstrap: full history, old side empty
      val zero = ChunkCodec.chunksDecoded.get()
      w2.commit()
      q.processAllAvailable()
      w3.commit()
      q.processAllAvailable()
      // two single-chunk refreshes: each decodes the changed tile in
      // the batch + the retraction read + the region-pruned view
      // chunk + the view writeSlab's partial-chunk merge — never the
      // 8-tile store (the staging-side merge decodes are pre-clock)
      val decodes = ChunkCodec.chunksDecoded.get() - zero
      require(decodes <= 12,
        s"incremental refreshes must not re-scan the store: $decodes")
    } finally q.stop()
    // the view is read back FROM THE STORE and must equal a direct
    // recompute at HEAD
    val got = vds.readSlab("view", vds.latestVersion.get)
      .where(!isnan(col("value")))
      .select(element_at(col("coord"), 1).as("g"),
        col("value").as("total"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
    val direct = ds.readSlab("v", ds.latestVersion.get)
      .where(!isnan(col("value")))
      .groupBy(expr("element_at(coord, 1) div 8").as("g"))
      .agg(sum(col("value")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    require(got.toMap == direct,
      s"maintained view ${got.toSeq} != recompute $direct")
    got.toSeq.toDF("g", "total")
  }

  /** st15 flow: STREAMING maintenance of the persisted vector index
    * (s10). The index is built once over the first 3/4 of the corpus;
    * the rest arrives as three micro-batches of vec_ids (the CDC
    * shape a 100 TB pipeline uses: the stream carries ids, payloads
    * are fetched from the lake by join — vectors never ride the
    * changelog). Each batch is one
    * [[graft.operators.VectorIndexOps.refreshVectorIndex]] call — the
    * stored centroids/codebooks are read back (KB-sized), never
    * recomputed, and only the new vectors' cells are written — so the
    * index stays probe-ready continuously with per-batch cost
    * O(batch), not O(corpus). The final probe (all standard queries,
    * shortlist re-rank over the FULL corpus incl. streamed vectors)
    * is oracle-gated by the IVF-PQ SQL with training restricted to
    * the base 3/4 and assignment/codes over everything — exactly the
    * math the build+refresh sequence performs. n_commits pins
    * one MVCC commit per micro-batch (1 build + 3 refreshes).
    */
  /** st17 flow: STREAMING maintenance of the persisted TEXT index
    * (t18) — st15's shape for BM25 retrieval. The index is built once
    * over the first half of the corpus; the rest arrives as two
    * micro-batches of doc_ids (ids on the changelog, text fetched
    * from the lake by join). Each batch is one append-only
    * [[graft.operators.TextIndexOps.indexDocuments]] call — one
    * tokenize pass over the NEW docs, never a rebuild — so the index
    * stays probe-ready continuously with per-batch cost O(batch).
    * The final probe is gated by t15's full-corpus oracle: streamed
    * batches must sum df/cf/stats to exactly the one-shot answer.
    */
  private def runStreamTextIndex(s: SparkSession, d: String): DataFrame =
      withStatePartitions(s, Seq(s"$d/documents.parquet")) {
    import s.implicits._
    val docs = graft.Tables.load(s, d, "documents")
      .select(col("doc_id"), col("text")).cache()
    try {
      val nTotal = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
      val n0 = nTotal / 2
      val dir = graft.TempDirs.create("graft_stidx_").toString
      graft.operators.TextIndexOps.indexDocuments(s,
        docs.where(col("doc_id") < n0), dir)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Long](s)
      val q = input.toDF().select(col("value").as("doc_id"))
        .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            graft.operators.TextIndexOps.indexDocuments(
              s, batch.join(docs, "doc_id"), dir)
            ()
          }
        }.outputMode("append").start()
      val cut = n0 + (nTotal - n0) / 2
      try recordSecs("st17_stream_text_index") {
        Seq(n0 until cut, cut until nTotal).foreach { r =>
          input.addData(r: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      graft.operators.TextIndexOps.probeTextIndex(s, dir,
        graft.operators.TextIndexOps.topIndexTerms(s, dir))
    } finally { docs.unpersist(); () }
  }

  private def runStreamIndexRefresh(s: SparkSession, d: String): DataFrame =
      withStatePartitions(s, Seq(s"$d/embeddings.parquet")) {
    import s.implicits._
    val e = graft.operators.SimilarityOps.emb(s, d).cache()
    try {
      val nTotal = e.agg(max(col("vec_id"))).head().getLong(0) + 1
      val n0 = 3L * nTotal / 4
      val root = graft.TempDirs.create("graft_sidx_").toString
      graft.operators.VectorIndexOps.buildVectorIndex(s, root,
        e.where(col("vec_id") < n0))
      // the maintainer reads the (post-build immutable) quantizers
      // ONCE; every refresh reuses the cached KB-sized pair instead
      // of re-reading them from the store per micro-batch
      val (cents, cbook) =
        graft.operators.VectorIndexOps.readQuantizers(s, root)
      val quant = Some((cents.cache(), cbook.cache()))
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Long](s)
      val q = input.toDF().select(col("value").as("vec_id"))
        .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            graft.operators.VectorIndexOps.refreshVectorIndex(
              s, root, batch.join(e, "vec_id"), quantizers = quant)
            ()
          }
        }.outputMode("append").start()
      val cut1 = n0 + (nTotal - n0) / 3
      val cut2 = n0 + 2 * (nTotal - n0) / 3
      try recordSecs("st15_stream_index_refresh") {
        Seq(n0 until cut1, cut1 until cut2, cut2 until nTotal)
          .foreach { r =>
            input.addData(r: _*)
            q.processAllAvailable() // one refresh commit per batch
          }
      } finally {
        q.stop()
        cents.unpersist(); cbook.unpersist()
      }
      val ds = new graft.core.GraftLake(s, root).connect("vindex")
      graft.operators.VectorIndexOps.probeVectorIndex(s, root, e)
        .withColumn("n_commits", lit(ds.versionIds().length.toLong))
    } finally { e.unpersist(); () }
  }

  /** s05's oracle with the quantizer TRAINED on the base 3/4 (`b`)
    * and assignment/codes/probe over the whole corpus — the exact
    * semantics of build(base) + stream-refresh(rest).
    */
  private val streamIndexOracle: String =
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) " +
      "AS nrm FROM embeddings), " +
      "b AS (SELECT e.* FROM e " +
      "WHERE vec_id < (SELECT 3 * (max(vec_id) + 1) // 4 FROM e)), " +
      "params AS (SELECT greatest(1, (max(vec_id) + 1) // 8) AS stride, " +
      "greatest(1, (max(vec_id) + 1) // 8) AS stride2 FROM b), " +
      "seeds AS (SELECT CAST(vec_id // stride AS INTEGER) AS cid, " +
      "e AS ce FROM b, params " +
      "WHERE vec_id % stride = 0 AND vec_id // stride < 8), " +
      "a1 AS (SELECT v.vec_id, v.e, s.cid, " +
      "row_number() OVER (PARTITION BY v.vec_id " +
      "ORDER BY list_dot_product(v.e, s.ce) DESC, s.cid) AS rn " +
      "FROM b v, seeds s), " +
      "cents AS (SELECT cid, i, " +
      "CAST(sum(CAST(e[i] AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m " +
      "FROM a1, range(1, 65) t(i) WHERE rn = 1 GROUP BY cid, i), " +
      "cvec AS (SELECT cid, list(m ORDER BY i) AS ce FROM cents " +
      "GROUP BY cid), " +
      "a2 AS (SELECT v.vec_id, v.nrm, c.cid, " +
      "row_number() OVER (PARTITION BY v.vec_id " +
      "ORDER BY list_dot_product(v.e, c.ce) DESC, c.cid) AS rn " +
      "FROM e v, cvec c), " +
      "lists AS (SELECT cid, vec_id, nrm FROM a2 WHERE rn = 1), " +
      "probes AS (SELECT vec_id AS qid, cid FROM a2 " +
      "WHERE vec_id < 5 AND rn <= 2), " +
      "subs AS (SELECT vec_id, m, e[(1 + 16*m):(16*(m+1))] AS sub " +
      "FROM e, range(0, 4) t(m)), " +
      "bsubs AS (SELECT s.* FROM subs s " +
      "WHERE vec_id < (SELECT 3 * (max(vec_id) + 1) // 4 FROM e)), " +
      "pseeds AS (SELECT m, CAST(vec_id // stride2 AS INTEGER) AS pc, " +
      "sub AS cw FROM bsubs, params " +
      "WHERE vec_id % stride2 = 0 AND vec_id // stride2 < 8), " +
      "p1 AS (SELECT s.vec_id, s.m, s.sub, c.pc, " +
      "row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY " +
      "list_dot_product(s.sub, s.sub) - " +
      "2.0 * list_dot_product(s.sub, c.cw) + " +
      "list_dot_product(c.cw, c.cw) ASC, c.pc) AS rn " +
      "FROM bsubs s JOIN pseeds c USING (m)), " +
      "pcent AS (SELECT m, pc, i, " +
      "CAST(sum(CAST(sub[i] AS DECIMAL(28,12))) AS DOUBLE) / count(*) " +
      "AS cm FROM p1, range(1, 17) t(i) WHERE rn = 1 " +
      "GROUP BY m, pc, i), " +
      "pvec AS (SELECT m, pc, list(cm ORDER BY i) AS cw FROM pcent " +
      "GROUP BY m, pc), " +
      "p2 AS (SELECT s.vec_id, s.m, c.pc, " +
      "row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY " +
      "list_dot_product(s.sub, s.sub) - " +
      "2.0 * list_dot_product(s.sub, c.cw) + " +
      "list_dot_product(c.cw, c.cw) ASC, c.pc) AS rn " +
      "FROM subs s JOIN pvec c USING (m)), " +
      "codes AS (SELECT vec_id, m, pc FROM p2 WHERE rn = 1), " +
      "qsubs AS (SELECT vec_id AS qid, m, sub AS qsub FROM subs " +
      "WHERE vec_id < 5), " +
      "q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM e " +
      "WHERE vec_id < 5), " +
      "cand AS (SELECT p.qid, l.vec_id, l.nrm FROM lists l " +
      "JOIN probes p USING (cid) WHERE l.vec_id <> p.qid), " +
      "adc AS (SELECT c.qid, c.vec_id, c.nrm, " +
      "CAST(sum(CAST(list_dot_product(qs.qsub, cb.cw) " +
      "AS DECIMAL(28,12))) AS DOUBLE) AS adc_dot " +
      "FROM cand c JOIN codes k ON k.vec_id = c.vec_id " +
      "JOIN pvec cb ON cb.m = k.m AND cb.pc = k.pc " +
      "JOIN qsubs qs ON qs.qid = c.qid AND qs.m = k.m " +
      "GROUP BY c.qid, c.vec_id, c.nrm), " +
      "short AS (SELECT qid, vec_id FROM (SELECT a.qid, a.vec_id, " +
      "row_number() OVER (PARTITION BY a.qid " +
      "ORDER BY a.adc_dot / (a.nrm * q.qnrm) DESC, a.vec_id) AS rn " +
      "FROM adc a JOIN q ON q.qid = a.qid) WHERE rn <= 64), " +
      "sims AS (SELECT s.qid, s.vec_id, " +
      "list_dot_product(x.e, q.qe) / (x.nrm * q.qnrm) AS cos_sim " +
      "FROM short s JOIN e x ON x.vec_id = s.vec_id " +
      "JOIN q ON q.qid = s.qid) " +
      "SELECT qid, vec_id, cos_sim, rank, " +
      "CAST(4 AS BIGINT) AS n_commits FROM (SELECT qid, vec_id, " +
      "cos_sim, row_number() OVER (PARTITION BY qid " +
      "ORDER BY cos_sim DESC, vec_id) AS rank FROM sims) " +
      "WHERE rank <= 5"

  val all: Seq[Q] = Seq(

    // Streaming near-dup: doc ids that share an LSH band bucket with a
    // smaller id — the same signatures, bands, and collisions as the
    // batch d03 pipeline, replayed through the stateful streaming
    // operator and hash-checked against the DuckDB re-derivation.
    Q("st09_stream_lsh_dedup",
      Some("WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t " +
        "FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s " +
        "FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)), " +
        "shb AS (SELECT doc_id, s, (('0x' || substr(md5(s), 1, 8))::BIGINT) " +
        "% 2147483647 AS bm FROM sh), " +
        "perms AS (SELECT i, (1103515245 * (i + 1) + 12345) % 2147483647 AS a, " +
        "(69069 * (i + 1) + 54321) % 2147483647 AS c " +
        "FROM UNNEST(range(32)) AS t(i)), " +
        "sigs AS (SELECT doc_id, i, min((a * bm + c) % 2147483647) AS mh " +
        "FROM shb, perms GROUP BY doc_id, i), " +
        "bands AS (SELECT doc_id, i // 4 AS band, " +
        "md5(string_agg(CAST(mh AS VARCHAR), '_' ORDER BY i)) AS bh " +
        "FROM sigs GROUP BY doc_id, i // 4) " +
        "SELECT DISTINCT x.doc_id AS doc_id FROM bands x " +
        "JOIN bands y USING (band, bh) WHERE y.doc_id < x.doc_id"),
      (s, d) => runStreamLsh(s, d),
      benchSecs = timedBench("st09_stream_lsh_dedup",
        (s, d) => runStreamLsh(s, d))),

    // Watermark-bounded streaming dedup: a duplicated replay collapses
    // back to exactly the batch table.
    Q("st08_dedup_within_watermark",
      Some("SELECT event_type, COUNT(*) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1"),
      (s, d) => runDedupWithinWatermark(s, d),
      benchSecs = timedBench("st08_dedup_within_watermark",
        (s, d) => runDedupWithinWatermark(s, d))),

    // Streaming incremental-view maintenance: the changelog tail of
    // the store keeps a per-group rollup current as base + new − old
    // per micro-batch (retractions via a changed-box asOf read at the
    // batch's base version) — payload I/O per refresh is O(changed),
    // decode-counter-gated, cross-checked against a head recompute.
    // Closed form after the two tracked commits:
    // g0 = 28−5+555, g2 = 156−20−21+2000+2100.
    Q("st10_stream_rollup",
      Some("SELECT * FROM (VALUES " +
        "(CAST(0 AS BIGINT), CAST(578.0 AS DOUBLE)), " +
        "(1, 92.0), (2, 4215.0), (3, 220.0)) AS t(g, total)"),
      (s, d) => runStreamRollup(s),
      benchSecs = timedBench("st10_stream_rollup",
        (s, d) => runStreamRollup(s))),

    // Streaming ingest INTO the store: foreachBatch -> one version per
    // micro-batch with idempotence markers (exactly-once versions
    // across restarts). Closed form: value = 10x + x div 4; 3 versions.
    // Same replay through the NATIVE DSv2 streaming sink
    // (writeStream.toTable, TableCapability.STREAMING_WRITE): one
    // version per epoch, exactly-once via the per-query-id watermark.
    Q("st11_stream_native_write",
      Some("SELECT a.range AS x, " +
        "CAST(a.range * 10 + a.range // 4 AS DOUBLE) AS value, " +
        "CAST(3 AS BIGINT) AS n_versions FROM range(12) a"),
      (s, d) => runNativeStreamWrite(s),
      benchSecs = timedBench("st11_stream_native_write",
        (s, d) => runNativeStreamWrite(s))),

    // Streaming maintenance of the persisted ANN index: build on the
    // base 3/4, refresh per micro-batch from a vec_id CDC stream,
    // probe the final store-resident index — hash-gated against the
    // base-trained / fully-assigned IVF-PQ re-derivation in DuckDB.
    Q("st15_stream_index_refresh", Some(streamIndexOracle),
      runStreamIndexRefresh,
      benchSecs = timedBench("st15_stream_index_refresh",
        runStreamIndexRefresh)),

    // Store-to-store streaming replication: native CDC source → native
    // DSv2 streaming sink, one replica version per source version
    // (admission-capped), no driver-side apply. Closed form: 12 cells,
    // x=2 overwritten to 999 by the third commit, 3 replica versions.
    Q("st16_cdc_replicate",
      Some("SELECT r.range AS x, CAST(CASE WHEN r.range = 2 THEN 999 " +
        "WHEN r.range >= 8 THEN r.range * 10 + 1 " +
        "ELSE r.range * 10 END AS DOUBLE) AS value, " +
        "CAST(3 AS BIGINT) AS n_versions FROM range(12) r"),
      (s, d) => runCdcReplicate(s),
      benchSecs = timedBench("st16_cdc_replicate",
        (s, d) => runCdcReplicate(s))),

    // Streaming maintenance of the persisted TEXT index: build on the
    // first half, append-refresh per micro-batch from a doc_id CDC
    // stream, probe the final index with the 5-term query — hash-gated
    // by the full-corpus BM25 oracle (the streamed batches' df/cf/
    // stats must sum to the one-shot build's answer exactly).
    Q("st17_stream_text_index",
      Some(graft.operators.TextOps.bm25OracleSqlN(5)),
      runStreamTextIndex,
      benchSecs = timedBench("st17_stream_text_index",
        runStreamTextIndex)),

    Q("st06_stream_ingest",
      Some("SELECT a.range AS x, " +
        "CAST(a.range * 10 + a.range // 4 AS DOUBLE) AS value, " +
        "CAST(3 AS BIGINT) AS n_versions FROM range(12) a"),
      (s, d) => runIngest(s),
      benchSecs = timedBench("st06_stream_ingest",
        (s, d) => runIngest(s))),

    // The custom-operator as-of join (graft.plans.AsOfJoin: logical
    // node -> strategy -> sort-merge exec). Same oracle as st03.
    Q("st05_asof_custom_plan", Some(asofOracle), (s, d) => {
      val ev = Tables.load(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
        .select(col("user_id"), col("ts").as("click_ts"), col("click_id"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"))
      graft.plans.GraftAsOf.join(s, purch, clicks,
          keys = Seq("user_id"), leftTsCol = "p_ts", rightTsCol = "click_ts")
        .select(purch("user_id"), col("purchase_id"), col("p_ts"),
          col("click_id"), col("click_ts"))
    }),

    // Stream-stream interval join (purchases x clicks within 1 h),
    // executed through the symmetric-hash streaming join with
    // watermark-bounded buffers on both sides.
    Q("st07_stream_interval_join",
      Some("SELECT p.user_id, p.event_id AS purchase_id, " +
        "c.event_id AS click_id FROM events p JOIN events c " +
        "ON c.user_id = p.user_id AND p.event_type = 'purchase' " +
        "AND c.event_type = 'click' " +
        "AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts"),
      (s, d) => runStreamJoin(s, d),
      benchSecs = timedBench("st07_stream_interval_join",
        (s, d) => runStreamJoin(s, d))),

    // Stream-stream LEFT OUTER interval join: unmatched purchases emit
    // (purchase_id, NULL) once the watermark proves no matching click
    // can still arrive — emission rides state eviction, driven here by
    // a far-future sentinel batch (see sentinelFile).
    Q("st13_stream_outer_join",
      Some("SELECT p.user_id, p.event_id AS purchase_id, " +
        "c.event_id AS click_id FROM events p LEFT JOIN events c " +
        "ON c.user_id = p.user_id AND c.event_type = 'click' " +
        "AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts " +
        "WHERE p.event_type = 'purchase'"),
      (s, d) => runStreamOuterJoin(s, d),
      benchSecs = timedBench("st13_stream_outer_join",
        (s, d) => runStreamOuterJoin(s, d))),

    // STREAMING sessionization (append mode): session_window state
    // merges open sessions per user; a session emits only when the
    // watermark proves it closed. Oracle: identical session semantics
    // computed batch (same SQL as st02).
    Q("st14_stream_sessionize",
      Some("WITH m AS (SELECT user_id, ts, value, CASE WHEN " +
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR " +
        "ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS news FROM events), " +
        "g AS (SELECT user_id, ts, value, SUM(news) OVER (" +
        "PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM m) " +
        "SELECT user_id, min(ts) AS sstart, " +
        "max(ts) + INTERVAL 30 MINUTE AS send, count(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value " +
        "FROM g GROUP BY user_id, sid"),
      (s, d) => runStreamSessionize(s, d),
      benchSecs = timedBench("st14_stream_sessionize",
        (s, d) => runStreamSessionize(s, d))),

    // Stateful per-user dedup/counters (flatMapGroupsWithState).
    // Oracle: with unique event_ids, distinct == total == plain counts.
    Q("st04_stateful_dedup",
      Some("SELECT user_id, COUNT(DISTINCT event_id) AS n_distinct_events, " +
        "COUNT(*) AS n_total FROM events GROUP BY user_id"),
      (s, d) => runStateful(s, d),
      benchSecs = timedBench("st04_stateful_dedup",
        (s, d) => runStateful(s, d))),

    // Tumbling 1-hour window counts/sums by event type, run as an
    // actual streaming query (replayed to completion).
    Q("st01_stream_tumbling",
      Some("SELECT time_bucket(INTERVAL 1 HOUR, ts) AS wstart, event_type, " +
        "count(*) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2"),
      (s, d) => runStream(s, d),
      benchSecs = timedBench("st01_stream_tumbling",
        (s, d) => runStream(s, d))),

    // Stream-static enrichment join: per-user activity tier (batch
    // dim) broadcast under the stream, then the windowed agg groups by
    // the ENRICHED attribute. No stream-side shuffle for the join.
    Q("st12_stream_static_join",
      Some("WITH dim AS (SELECT user_id, CASE " +
        "WHEN count(*) >= 20 THEN 'heavy' " +
        "WHEN count(*) >= 10 THEN 'medium' ELSE 'light' END AS activity " +
        "FROM events GROUP BY user_id) " +
        "SELECT time_bucket(INTERVAL 1 HOUR, e.ts) AS wstart, " +
        "d.activity, count(*) AS n, " +
        "CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value " +
        "FROM events e JOIN dim d USING (user_id) GROUP BY 1, 2"),
      (s, d) => runStreamStaticJoin(s, d),
      benchSecs = timedBench("st12_stream_static_join",
        (s, d) => runStreamStaticJoin(s, d))),

    // Sessionization: 30-minute-gap sessions per user (session_window
    // merges while gap < 30 min; session end = last event + gap).
    Q("st02_sessionize",
      Some("WITH m AS (SELECT user_id, ts, value, CASE WHEN " +
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR " +
        "ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS news FROM events), " +
        "g AS (SELECT user_id, ts, value, SUM(news) OVER (" +
        "PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM m) " +
        "SELECT user_id, min(ts) AS sstart, " +
        "max(ts) + INTERVAL 30 MINUTE AS send, count(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value " +
        "FROM g GROUP BY user_id, sid"),
      (s, d) => Tables.load(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          ColUtil.dsum(col("value")).as("sum_value"))
        .select(col("user_id"), col("sw.start").as("sstart"),
          col("sw.end").as("send"), col("n_events"), col("sum_value"))),

    // As-of join: for each purchase, the latest click with
    // click.ts <= purchase.ts by the same user. Composed Spark-first:
    // union both sides, one shuffle on user_id, running last() over an
    // ordered window — no per-row lookups, no range cross-join.
    Q("st03_asof_join",
      Some("WITH clicks AS (SELECT user_id, ts, max(event_id) AS click_id " +
        "FROM events WHERE event_type = 'click' GROUP BY user_id, ts), " +
        "purch AS (SELECT user_id, ts, event_id FROM events " +
        "WHERE event_type = 'purchase') " +
        "SELECT p.user_id, p.event_id AS purchase_id, p.ts AS p_ts, " +
        "c.click_id AS click_id, c.ts AS click_ts " +
        "FROM purch p ASOF LEFT JOIN clicks c " +
        "ON p.user_id = c.user_id AND c.ts <= p.ts"),
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        // dedup clicks to one per (user, ts) so ties are deterministic
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("click_id"))
          .select(col("user_id"), col("ts"), lit(0).as("side"),
            col("click_id"), lit(null).cast("long").as("event_id"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("side"),
            lit(null).cast("long").as("click_id"), col("event_id"))
        // clicks sort before purchases at equal ts => ts <= semantics
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("side"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.unionAll(purch)
          .withColumn("last_click",
            last(when(col("side") === 0,
              struct(col("ts").as("cts"), col("click_id").as("cid"))),
              ignoreNulls = true).over(w))
          .where(col("side") === 1)
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("p_ts"), col("last_click.cid").as("click_id"),
            col("last_click.cts").as("click_ts"))
      })
  )
}
