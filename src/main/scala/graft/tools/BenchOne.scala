package graft.tools

import org.apache.spark.sql.SparkSession

/** Variance probe for one registry query: run it N times in one JVM
  * and print each sample — the tool for separating a real plan
  * regression from bench noise (streaming flows especially).
  *
  * Usage: BenchOne <queryName> [runs=5] [sfDir=/root/testdata/sf0.1]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 5
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // bench-only probes that live outside the oracle-gated registry:
    // the scaled pyramid refresh (data-path cost) and its toy-sized
    // twin (same 2 commits, ~zero data — the per-commit constant),
    // whose difference is the pure data cost (docs/BENCH_NOISE.md)
    val special: Map[String, SparkSession => Double] = Map(
      "m45_pyramid_refresh_scaled" -> (sp =>
        graft.operators.ArrayOps.scaledPyramidRefreshBench(sp)),
      "m45_pyramid_refresh_toy" -> (sp =>
        graft.operators.ArrayOps.scaledPyramidRefreshBench(sp,
          n = 16L, chunk = 4L, changedRows = 4L)))
    val sample: () => Double = special.get(name) match {
      case Some(p) => () => p(spark)
      case None =>
        val timer = graft.SparkEntry.benchTimers.get(name)
        val fn = graft.SparkEntry.queries(name)
        () => timer match {
          case Some(t) => t(spark, sfDir)
          case None =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
        }
    }
    (1 to runs).foreach { i =>
      println(f"[benchone] $name run $i: ${sample()}%.3f s")
    }
    spark.stop()
  }
}
