package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Test-table loader over the driver-provided parquet dirs (TESTDATA.md). */
object Tables {
  /** Sessions must set spark.sql.legacy.parquet.nanosAsLong=true: the
    * events table stores TIMESTAMP(NANOS) which Spark has no native type
    * for; we read it as epoch-nanos long and normalize to a micros
    * timestamp here (matching DuckDB's ns→us truncation).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
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
