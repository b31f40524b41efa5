package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Test-table loader over the driver-provided parquet dirs (TESTDATA.md). */
object Tables {
  /** Normalize the events `ts` column to a session-TZ TIMESTAMP across
    * the encodings the driver has generated: TIMESTAMP(NANOS) read as
    * epoch-nanos long (spark.sql.legacy.parquet.nanosAsLong=true —
    * truncated to micros, matching DuckDB), TIMESTAMP_NTZ (naive
    * micros — cast under the UTC session, matching DuckDB's
    * naive-as-UTC epoch math), or already a plain TIMESTAMP.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }
}

/** One registered query: Spark impl + optional DuckDB oracle SQL.
  *
  * Column names in `run`'s result and `oracle` MUST match exactly — the
  * driver sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame,
    /** Self-timing bench runner: executes the full flow but returns
      * wall seconds for only the MEANINGFUL section (a streaming
      * query's drain, an ingest's commit loop) — checkpoint/staging
      * setup is per-run harness scaffolding whose jitter otherwise
      * masks real plan regressions between bench rounds. None ⇒ the
      * bench times `run(...).count()` wholesale.
      */
    benchSecs: Option[(SparkSession, String) => Double] = None)

trait QueryPack { def all: Seq[Q] }
