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

  /** Batch-equivalent streaming run: replay events.parquet through a
    * real streaming query, synchronously, into a memory sink.
    */
  private def runStream(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    // the file stream source wants a directory: stage a symlink dir
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(path))
    val sch = s.read.parquet(path).schema
    val src = s.readStream.schema(sch).parquet(dir.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = src
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), ColUtil.dsum(col("value")).as("sum_value"))
    val qname = s"st01_sink_${counter.incrementAndGet()}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(qname).start()
    try q.processAllAvailable() finally q.stop()
    s.table(qname)
      .select(col("w.start").as("wstart"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Mutable per-user state for the stateful dedup+counter query. */
  case class UserState(seen: Set[Long], nTotal: Long)

  /** Custom stateful streaming operator via flatMapGroupsWithState:
    * per-user exactly-once dedup by event_id + running totals. State
    * lives in the state store keyed by user_id; each micro-batch emits
    * the user's updated totals.
    */
  private def runStateful(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = s"$d/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(path))
    val sch = s.read.parquet(path).schema
    val src = s.readStream.schema(sch).parquet(dir.toString)
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)]
    val updates = src.groupByKey(_._1)
      .flatMapGroupsWithState[UserState, (Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, events: Iterator[(Long, Long)],
            state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(Set.empty, 0L))
          val ids = events.map(_._2).toSeq
          val next = UserState(prev.seen ++ ids, prev.nTotal + ids.size)
          state.update(next)
          Iterator.single((userId, next.seen.size.toLong, next.nTotal))
      }
    val qname = s"st04_sink_${counter.incrementAndGet()}"
    val q = updates.toDF("user_id", "n_distinct_events", "n_total")
      .writeStream.outputMode("update")
      .format("memory").queryName(qname).start()
    try q.processAllAvailable() finally q.stop()
    // single-batch replay -> the last update per user is the final state
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("n_total").desc)
    s.table(qname)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
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

  val all: Seq[Q] = Seq(

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

    // Stateful per-user dedup/counters (flatMapGroupsWithState).
    // Oracle: with unique event_ids, distinct == total == plain counts.
    Q("st04_stateful_dedup",
      Some("SELECT user_id, COUNT(DISTINCT event_id) AS n_distinct_events, " +
        "COUNT(*) AS n_total FROM events GROUP BY user_id"),
      (s, d) => runStateful(s, d)),

    // Tumbling 1-hour window counts/sums by event type, run as an
    // actual streaming query (replayed to completion).
    Q("st01_stream_tumbling",
      Some("SELECT time_bucket(INTERVAL 1 HOUR, ts) AS wstart, event_type, " +
        "count(*) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2"),
      (s, d) => runStream(s, d)),

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
