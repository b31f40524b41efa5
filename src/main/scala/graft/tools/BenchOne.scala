package graft.tools

import org.apache.spark.sql.SparkSession

/** Variance probes for registry queries — the tooling that separates
  * a real plan regression from bench noise (streaming flows
  * especially), and the standing outlier-adjudication harness the
  * per-round bench feeds (docs/BENCH_NOISE.md).
  *
  * Usage:
  *   BenchOne <queryName> [runs=5] [sfDir=/root/testdata/sf0.1]
  *     run ONE query N times in one JVM, print each sample
  *   BenchOutliers [benchJson=bench_last.json] [top=5] [runs=3] [sfDir]
  *     read a bench run's per-query map, take its `top` slowest
  *     entries, run each `runs` times isolated, and print a
  *     markdown table of in-suite vs isolated times — the artifact
  *     that adjudicates a p06-style in-suite anomaly (cache-eviction
  *     recompute, checkpoint contention) from a genuine plan
  *     regression without forensics.
  */
object BenchOne {

  private[tools] def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  // bench-only probes that live outside the oracle-gated registry:
  // the scaled pyramid refresh (data-path cost) and its toy-sized
  // twin (same 2 commits, ~zero data — the per-commit constant),
  // whose difference is the pure data cost (docs/BENCH_NOISE.md)
  private val special: Map[String, SparkSession => Double] = Map(
    "m45_pyramid_refresh_scaled" -> (sp =>
      graft.operators.ArrayOps.scaledPyramidRefreshBench(sp)),
    "m45_pyramid_refresh_toy" -> (sp =>
      graft.operators.ArrayOps.scaledPyramidRefreshBench(sp,
        n = 16L, chunk = 4L, changedRows = 4L)))

  private[tools] def sampler(spark: SparkSession, name: String,
      sfDir: String): () => Double =
    special.get(name) match {
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

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 5
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = session()
    val sample = sampler(spark, name, sfDir)
    (1 to runs).foreach { i =>
      println(f"[benchone] $name run $i: ${sample()}%.3f s")
    }
    spark.stop()
  }

  /** The outlier-adjudication table: the `top` slowest in-suite
    * entries re-run `runs` times isolated, as markdown. Shared by
    * [[BenchOutliers]] (manual) and [[graft.Bench]] (which appends it
    * to docs/BENCH_NOISE.md automatically every run, so the artifact
    * that separates an in-suite anomaly from a plan regression is
    * never skipped under round pressure).
    */
  private[graft] def outlierTable(spark: SparkSession,
      inSuite: Seq[(String, Double)], top: Int, runs: Int,
      sfDir: String, extra: Seq[String] = Seq.empty): String = {
    // top-N slowest PLUS named anomalies (in-suite time >> its own
    // historical floor — see Bench): a 5× swing on a 1 s query never
    // ranks top-5 by absolute time, yet is exactly the noise-vs-
    // regression call the adjudication table exists to make
    val byName = inSuite.toMap
    val slowest = inSuite.sortBy(-_._2).take(top) ++
      extra.filterNot(inSuite.sortBy(-_._2).take(top).map(_._1).toSet)
        .flatMap(n => byName.get(n).map(n -> _))
    val sb = new StringBuilder
    sb.append("| query | in-suite (s) | isolated draws (s) | best (s) |\n")
    sb.append("|---|---|---|---|\n")
    slowest.foreach { case (name, suiteSecs) =>
      val sample = sampler(spark, name, sfDir)
      val draws = (1 to runs).map(_ => sample())
      sb.append(f"| $name | $suiteSecs%.1f | " +
        draws.map(dd => f"$dd%.1f").mkString(" / ") +
        f" | ${draws.min}%.1f |\n")
    }
    sb.toString
  }
}

object BenchOutliers {
  def main(args: Array[String]): Unit = {
    val json = if (args.length > 0) args(0) else "bench_last.json"
    val top = if (args.length > 1) args(1).toInt else 5
    val runs = if (args.length > 2) args(2).toInt else 3
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    // the bench JSON is one flat line our own Bench wrote — a
    // targeted regex over "queries":{...} avoids a JSON dependency
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(json)), "UTF-8")
    val qblock = """"queries"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(txt)
      .getOrElse(sys.error(s"no queries map in $json")).group(1)
    val inSuite = """"([^"]+)"\s*:\s*([0-9.eE+-]+)""".r
      .findAllMatchIn(qblock)
      .map(m => m.group(1) -> m.group(2).toDouble).toSeq
    val spark = BenchOne.session()
    println(s"[benchoutliers] top $top of ${inSuite.size} from $json, " +
      s"$runs isolated draws each")
    print(BenchOne.outlierTable(spark, inSuite, top, runs, sfDir))
    spark.stop()
  }
}
