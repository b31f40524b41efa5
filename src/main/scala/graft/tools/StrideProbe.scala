package graft.tools

import org.apache.spark.sql.functions._

/** Measured evidence for the sampled-IVF-training optimization
  * (`trainStride`, VectorIndexOps.train): round 13 shipped the
  * mechanism with zero measurements — this probe times the QUANTIZER
  * TRAINING stage (the half the stride bounds) at stride 1 vs a
  * strided run on the same corpus, and proves the strided run is
  * deterministic (two runs hash-identical) and still assigns every
  * vector (row count == rnStore × corpus).
  *
  * Usage: runMain graft.tools.StrideProbe [stride=8] [sfDir] [runs=3]
  *          [scaleUp=1]
  * `scaleUp` replicates the corpus k times with disjoint vec_ids and
  * per-copy value jitter (deterministic, derived from the copy index)
  * so the training stage can be measured past the point where Spark's
  * per-job constants dominate — sf0.1's 2000 vectors finish k-means
  * in ~1 s regardless of stride, which measures scheduling, not the
  * O(N/stride) training scans the stride exists to bound.
  * Prints a markdown table; paste into OPTIMIZATION notes.
  */
object StrideProbe {
  def main(args: Array[String]): Unit = {
    val stride = if (args.length > 0) args(0).toLong else 8L
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val scaleUp = if (args.length > 3) args(3).toInt else 1
    val spark = BenchOne.session()
    val ops = graft.operators.VectorIndexOps
    val e0 = graft.operators.SimilarityOps.emb(spark, sfDir)
    val nBase = e0.agg(max(col("vec_id"))).head().getLong(0) + 1
    val eScaled =
      if (scaleUp <= 1) e0
      else (0 until scaleUp).map { k =>
        e0.select((col("vec_id") + lit(k * nBase)).as("vec_id"),
          transform(col("e"),
            x => x + lit(k.toDouble) * lit(1e-3)).as("e"),
          col("nrm"))
      }.reduce(_ unionAll _)
    val e = eScaled.cache()
    try {
      val n = e.agg(max(col("vec_id"))).head().getLong(0) + 1
      val cfg = ops.defaults
      // one warmup (codegen/caches), unrecorded
      ops.trainingProbe(spark, e, n, cfg, 1L)
      def draws(st: Long) = (1 to runs).map { _ =>
        ops.trainingProbe(spark, e, n, cfg, st)
      }
      val base = draws(1L)
      val samp = draws(stride)
      require(samp.map(_._2).distinct.size == 1,
        s"strided training is non-deterministic: hashes ${samp.map(_._2)}")
      require(samp.head._3 == base.head._3,
        s"strided run dropped vectors: ${samp.head._3} != ${base.head._3} " +
          "assignment rows")
      def fmt(xs: Seq[(Double, Long, Long)]) =
        xs.map(t => f"${t._1}%.2f").mkString(" / ")
      println(s"[strideprobe] corpus n=$n, runs=$runs, sfDir=$sfDir")
      println("| trainStride | training-stage secs (draws) | best |")
      println("|---|---|---|")
      println(f"| 1 | ${fmt(base)} | ${base.map(_._1).min}%.2f |")
      println(f"| $stride | ${fmt(samp)} | ${samp.map(_._1).min}%.2f |")
      println(f"[strideprobe] training speedup (best/best): " +
        f"${base.map(_._1).min / samp.map(_._1).min}%.2fx; " +
        s"assignment rows identical (${samp.head._3}); " +
        "strided hash deterministic across runs")
    } finally { e.unpersist(); spark.stop() }
  }
}
