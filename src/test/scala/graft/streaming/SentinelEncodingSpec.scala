package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** The driver's events.parquet ts encoding has flipped between rounds
  * (TIMESTAMP(NANOS) surfacing as LongType vs naive micros as
  * TIMESTAMP_NTZ). `Tables.normalizeTs` absorbs both on the READ side;
  * this spec pins the WRITE side of that tolerance: the far-future
  * sentinel file st13/st14 stage to flush their watermarks must be
  * built correctly under the long-nanos encoding too (the branch the
  * current testdata never exercises). End-to-end: a synthetic
  * long-nanos events table runs the real st13 left-outer flow and
  * must equal the batch left join computed over the same rows.
  */
class SentinelEncodingSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  test("st13 outer join flushes under the long-nanos ts encoding") {
    // 2024-01-01T00:00:00Z in nanos; events over ~3 hours so the final
    // purchases sit inside the 2 h watermark delay — exactly the rows
    // only the sentinel can flush
    val base = 1704067200L * 1000000000L
    val hour = 3600L * 1000000000L
    val rows = Seq(
      // user 1: click then purchase within 1 h (matched)
      (1L, base + 0L * hour, 1L, "click", 1.0, "{}"),
      (2L, base + hour / 2, 1L, "purchase", 2.0, "{}"),
      // user 1: purchase 2 h later, no click in window (unmatched)
      (3L, base + 5L * hour / 2, 1L, "purchase", 3.0, "{}"),
      // user 2: purchase with the click AFTER it (unmatched)
      (4L, base + 2L * hour, 2L, "purchase", 4.0, "{}"),
      (5L, base + 2L * hour + hour / 4, 2L, "click", 5.0, "{}"),
      // user 3: final-hour purchase+click pair (matched, but provably
      // closed only once the sentinel advances the watermark)
      (6L, base + 11L * hour / 4, 3L, "click", 6.0, "{}"),
      (7L, base + 3L * hour, 3L, "purchase", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val d = Files.createTempDirectory("graft_nanos_ev_").toString
    val stage = s"$d/stage"
    rows.coalesce(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    Files.copy(part, Paths.get(s"$d/events.parquet"))

    // sanity: the synthetic table really takes the LongType branch
    assert(spark.read.parquet(s"$d/events.parquet").schema("ts")
      .dataType == org.apache.spark.sql.types.LongType)

    val got = graft.SparkEntry.queries("st13_stream_outer_join")(spark, d)
      .as[(Long, Long, Option[Long])].collect().toSet

    val ev = graft.Tables.load(spark, d, "events")
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val want = p.join(c,
        col("user_id") === col("cu") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"), "leftOuter")
      .select(col("user_id"), col("purchase_id"), col("click_id"))
      .as[(Long, Long, Option[Long])].collect().toSet

    assert(got == want, s"streaming $got != batch $want")
    // the unmatched purchases really are present (the rows that would
    // silently vanish if the sentinel failed to advance the watermark)
    assert(got.contains((1L, 3L, None)) && got.contains((2L, 4L, None)))
  }
}
