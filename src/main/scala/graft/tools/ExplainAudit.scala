package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans of selected queries so the
  * scan pushdown (PushedFilters/ReadSchema), join strategies, and
  * WholeStageCodegen spans can be audited. Not part of the driver
  * contract.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_point_get", "q06_agg_basic", "q11_join_broadcast",
        "q12_join_large", "q13_semi_join", "s03_embedding_near_dup",
        "d02_ngram_jaccard", "st03_asof_join")
    // plan parity with Bench by default; set SPARK_GRAFT_CACHED_AQE=false
    // to reproduce the pre-round-14 cached-plan partitioning for a
    // before/after dump
    val cachedAqe = sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "true")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        cachedAqe)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXPLAIN_RUN=1 additionally executes each query
    // (noop sink, guide §1.4) and prints the FINAL adaptive plan —
    // AQEShuffleRead coalescing and runtime join rewrites are
    // invisible in the pre-execution dump
    val alsoRun = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_RUN", "0") == "1"
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      if (alsoRun) {
        df.write.format("noop").mode("overwrite").save()
        println(s"---------- $n: FINAL adaptive plan ----------")
        println(df.queryExecution.executedPlan.toString.take(20000))
      }
    }
    spark.stop()
  }
}
