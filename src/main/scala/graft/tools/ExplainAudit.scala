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
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
