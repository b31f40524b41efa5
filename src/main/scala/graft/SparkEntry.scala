package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in [[QueryPack]]s; this object just aggregates them
  * into the driver's `queries` / `oracleSql` maps.
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    operators.RelationalOps,
    operators.ExtendedOps,
    operators.AnalyticsOps,
    operators.TextOps,
    operators.TextIndexOps,
    operators.DedupOps,
    operators.PipelineOps,
    operators.SimilarityOps,
    operators.VectorIndexOps,
    operators.MandolineOps,
    operators.ArrayOps,
    operators.MultimodalOps,
    streaming.StreamingOps)

  private lazy val registry: Seq[Q] = packs.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue-per-region star join: broadcast dims, single fact shuffle.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q11_join_broadcast")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Self-timing bench runners (see [[Q.benchSecs]]): present for the
    * streaming flows, where setup scaffolding inside the timed window
    * otherwise drowns the signal.
    */
  def benchTimers: Map[String, (SparkSession, String) => Double] =
    registry.flatMap(q => q.benchSecs.map(q.name -> _)).toMap
}
