package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

/** Every registered query runs at sf0.001 and yields rows; LSH
  * approximations are checked against their exact counterparts.
  */
class QueryPackSpec extends AnyFunSuite {
  import TestSpark._

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key exists in queries") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("minhash-LSH near-dup pairs match exact n-gram Jaccard (full recall on injected dups)") {
    def pairs(q: String) = SparkEntry.queries(q)(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("d02_ngram_jaccard")
    val approx = pairs("d03_minhash_lsh")
    assert(exact.nonEmpty, "no near-dup pairs in test data?")
    // every LSH pair must be a true near-dup (verification step ran)
    assert(approx.subsetOf(exact), s"false positives: ${approx.diff(exact)}")
    // banding with 8 bands x 4 rows at j>=0.6: expect near-total recall
    val recall = approx.size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall below 0.9")
  }

  test("custom as-of join plan: AsOfJoinExec in the physical plan, output equals composed form") {
    val custom = SparkEntry.queries("st05_asof_custom_plan")(spark, sf)
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // exec prints without suffix
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(3)).map(_.toString))).toSet
    val composed = SparkEntry.queries("st03_asof_join")(spark, sf)
    assert(rows(custom) == rows(composed))
  }

  test("plan guardrail: no unbroadcast CartesianProduct in any query plan") {
    // queries that materialize DataFrames eagerly inside their body
    // (streaming sinks, temp-lake flows) can't be planned lazily here
    val skip = Set("st01_stream_tumbling", "st04_stateful_dedup")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
        if !skip(name) && !name.startsWith("m0")) {
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name has an unbroadcast cartesian product")
    }
  }

  test("plan guardrail: point-get pushes its filter to the parquet scan") {
    val plan = SparkEntry.queries("q01_point_get")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,7)]"), plan)
  }

  test("GraftExtensions injects the as-of strategy") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val strategies = org.apache.spark.sql.GraftExpressionBridge
      .plannerStrategies(ext, spark)
    assert(strategies.exists(_ eq graft.plans.AsOfStrategy))
  }

  test("dot_product SQL registration works") {
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("q26 HLL estimate within 10% of exact (σ ≈ 1.6% at m = 4096)") {
    SparkEntry.queries("q26_approx_distinct")(spark, sf)
      .select("approx_orders", "exact_orders").collect().foreach { r =>
        val (a, e) = (r.getDouble(0), r.getLong(1).toDouble)
        assert(math.abs(a - e) / e <= 0.10, s"approx $a vs exact $e")
      }
  }

  test("HLL raw branch (>20k distinct per group) within 5% of exact") {
    // 100k and 40k distinct keys — both far above the 2.5·m = 10240
    // linear-counting cutoff, so the raw harmonic estimate is what
    // gets exercised (the mis-scaled 2^48/2^49 mix underestimated
    // this branch by ~50% before the fix).
    import org.apache.spark.sql.functions.{col, lit, when}
    val df = spark.range(140000L).select(
      when(col("id") < 100000L, lit("a")).otherwise(lit("b")).as("g"),
      col("id").as("k"))
    val got = graft.operators.ExtendedOps.hllApproxDistinct(df, "g", "k")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(math.abs(got("a") - 100000.0) / 100000.0 <= 0.05,
      s"group a: ${got("a")} vs 100000")
    assert(math.abs(got("b") - 40000.0) / 40000.0 <= 0.05,
      s"group b: ${got("b")} vs 40000")
  }

  test("q47 bottom-k sample quantiles sit within 3σ rank bounds of exact") {
    import org.apache.spark.sql.functions.{col, expr}
    val r = SparkEntry.queries("q47_bottomk_quantiles")(spark, sf).head()
    val ex = graft.Tables.load(spark, sf, "lineitem")
      .select(expr("percentile(CAST(l_extendedprice AS DOUBLE), " +
        "array(0.40, 0.60, 0.84, 0.96, 0.97, 1.0))").as("p"))
      .select(col("p")).head().getSeq[Double](0)
    // k = 256 → rank σ = sqrt(q(1−q)/k); ±3σ rank windows translated
    // to value windows via the exact quantiles at the window edges
    assert(r.getDouble(0) >= ex(0) && r.getDouble(0) <= ex(1),
      s"p50 ${r.getDouble(0)} outside [${ex(0)}, ${ex(1)}]")
    assert(r.getDouble(1) >= ex(2) && r.getDouble(1) <= ex(3),
      s"p90 ${r.getDouble(1)} outside [${ex(2)}, ${ex(3)}]")
    assert(r.getDouble(2) >= ex(4) && r.getDouble(2) <= ex(5),
      s"p99 ${r.getDouble(2)} outside [${ex(4)}, ${ex(5)}]")
  }

  test("simhash near-dup pairs agree with exact n-gram Jaccard") {
    def pairs(q: String) = SparkEntry.queries(q)(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("d02_ngram_jaccard")
    val sim = pairs("d04_simhash")
    assert(sim.nonEmpty, "simhash found nothing")
    // word-salad near-dups: hamming<=3 should mostly be true near-dups
    val precision = sim.intersect(exact).size.toDouble / sim.size
    val recall = sim.intersect(exact).size.toDouble / exact.size
    assert(precision >= 0.8, s"simhash precision $precision")
    assert(recall >= 0.5, s"simhash recall $recall")
  }

  test("substring-dup runs are internally consistent and agree with shingle DF") {
    val rows = SparkEntry.queries("d09_substring_dup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nd, mr, span) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      assert(nd <= nw, s"n_dup $nd > n_windows $nw")
      assert(mr <= nd, s"max_run $mr > n_dup $nd")
      assert(if (mr > 0) span == mr + 4 else span == 0,
        s"span $span inconsistent with max_run $mr")
    }
    // injected exact near-dups (d02 jaccard >= 0.2 pairs) must show
    // duplicated substring runs — the two detectors see the same docs
    val dupDocs = SparkEntry.queries("d02_ngram_jaccard")(spark, sf)
      .where("jaccard >= 0.9").select("da").collect().map(_.getLong(0)).toSet
    val withRuns = rows.filter(_.getLong(3) > 0).map(_.getLong(0)).toSet
    assert(dupDocs.subsetOf(withRuns),
      s"near-identical docs without dup runs: ${dupDocs.diff(withRuns)}")
  }

  test("bigram-LM scores: every bigram counts itself (avg_freq >= 1, novel <= n)") {
    val rows = SparkEntry.queries("t14_bigram_lm")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sum, novel, avg) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))
      assert(sum >= n, s"sum_freq $sum < n_bigrams $n")
      assert(novel <= n, s"n_novel $novel > n_bigrams $n")
      assert(avg >= 1.0 && avg == sum.toDouble / n)
    }
  }

  private def annHits(q: String) = SparkEntry.queries(q)(spark, sf)
    .select("qid", "vec_id").collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("kNN graph covers every vector with <= 3 ranked edges; recall vs brute force") {
    val edges = SparkEntry.queries("s08_knn_graph")(spark, sf).collect()
    val n = TestSpark.spark.read
      .parquet(s"$sf/embeddings.parquet").count()
    val bySrc = edges.groupBy(_.getLong(0))
    assert(bySrc.size == n, s"graph covers ${bySrc.size} of $n vectors")
    bySrc.values.foreach { es =>
      assert(es.length <= 3 && es.nonEmpty)
      assert(es.map(_.getLong(3)).sorted.sameElements(1L to es.length))
    }
    // on the shared query set, IVF-candidate edges should recover a
    // decent share of the exact top-3 (2/8 cells probed — same floor
    // as the s04 gate)
    val exact = annHits("s01_ann_bruteforce")
    val graphTop = edges.filter(r => r.getLong(0) < 5)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(graphTop).size.toDouble /
      math.min(exact.size, graphTop.size)
    assert(recall >= 0.2, s"kNN-graph recall $recall below 0.2")
  }

  test("ANN-LSH top-k recall vs brute force >= 0.5") {
    val exact = annHits("s01_ann_bruteforce")
    val recall = exact.intersect(annHits("s02_ann_lsh")).size.toDouble /
      exact.size
    assert(recall >= 0.5, s"ANN recall $recall below 0.5")
  }

  test("ANN-IVF top-k recall vs brute force >= 0.2 (2/8 probes)") {
    val exact = annHits("s01_ann_bruteforce")
    val recall = exact.intersect(annHits("s04_ann_ivf")).size.toDouble /
      exact.size
    assert(recall >= 0.2, s"IVF recall $recall below 0.2")
  }

  test("IVF-PQ top-k recall >= its IVF probes' exact re-rank floor") {
    val exact = annHits("s01_ann_bruteforce")
    val recall = exact.intersect(annHits("s05_ann_ivfpq")).size.toDouble /
      exact.size
    assert(recall >= 0.2, s"IVF-PQ recall $recall below 0.2")
    // within the same probed lists, the exact re-rank of the ADC
    // shortlist should recover most of what plain IVF finds — PQ
    // compression must not crater ranking quality vs s04
    val ivf = annHits("s04_ann_ivf")
    val vsIvf = ivf.intersect(annHits("s05_ann_ivfpq")).size.toDouble /
      ivf.size
    assert(vsIvf >= 0.7, s"IVF-PQ agreement with IVF $vsIvf below 0.7")
  }
}
