package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regressions fail HERE, not in the bench: scans must
  * push filters/projections into parquet, small-dim joins must
  * broadcast, top-k must plan as TakeOrderedAndProject, and the
  * pairwise-similarity operators must never degrade to
  * BroadcastNestedLoopJoin / CartesianProduct.
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def df(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  test("q01 point get: filter pushed to the parquet scan") {
    val p = planOf("q01_point_get")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
  }

  test("q03 projection pruned at the scan (2-column ReadSchema)") {
    val p = planOf("q03_scan_project")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_comment"), read)
  }

  test("q09 top-k plans as TakeOrderedAndProject (no global sort)") {
    assert(planOf("q09_topk").contains("TakeOrderedAndProject"))
  }

  test("q11 star join broadcasts the dims") {
    assert(planOf("q11_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("s02/s03 pairwise similarity never plans nested-loop/cartesian") {
    // s01 (tiny fixed query set) and s04 (8-row centroid table) DO
    // broadcast-cross tiny sides by design; the pairwise operators'
    // candidate/block joins must stay equality joins
    Seq("s02_ann_lsh", "s03_embedding_near_dup").foreach { n =>
      val p = planOf(n)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$n:\n$p")
      assert(!p.contains("CartesianProduct"), s"$n:\n$p")
    }
  }

  test("s10 persisted-index probe: broadcast probes/codebook, no cartesian") {
    // index build + probe as registered; the probe-side joins must
    // all be equality joins with the KB-sized sides broadcast
    val p = planOf("s10_ann_persisted")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("s14 retrained-index probe keeps the s10 plan shape (no cartesian)") {
    // the probe after a retrain must plan exactly like a fresh
    // build's: equality joins, KB-sized sides broadcast — a geometry
    // change must never degrade the candidate path
    val p = planOf("s14_ann_retrain")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("t21 phrase probe: equality joins only, TakeOrdered top-k") {
    // shifted-intersection matching keys on (doc_id, start) — an NLJ
    // here would be the positions-cross-positions blowup — and the
    // top-20 must fold per-partition, never a global sort
    val p = planOf("t21_phrase_persisted")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("row-level DML operation scans advertise liveOnly in the plan") {
    // a value-predicate UPDATE's scan walks written chunks only; the
    // scan node's description carries the flag so a regression to the
    // dense view is visible in explain output
    val cat = "gpa1"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root",
      java.nio.file.Files.createTempDirectory("graft_pa_").toString)
    spark.sql(s"CREATE NAMESPACE $cat.pa")
    spark.sql(s"CREATE TABLE $cat.pa.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='8', chunkDims='4')")
    spark.sql(s"INSERT INTO $cat.pa.t SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(4)")
    val plan = spark.sql(
      s"UPDATE $cat.pa.t SET value = value + 1 WHERE value >= 1.0")
      .queryExecution.executedPlan.toString
    assert(plan.contains("liveOnly"), plan)
  }

  test("st05 plans through the custom AsOfJoinExec") {
    assert(planOf("st05_asof_custom_plan").contains("AsOfJoin"))
  }

  test("zorderLayout: ONE range-partition exchange, codegen'd morton key") {
    import org.apache.spark.sql.functions.col
    val grid = spark.range(1024)
      .select((col("id") / 32).cast("long").as("x"),
        (col("id") % 32).as("y"), col("id"))
    val plan = graft.operators.LayoutOps.zorderLayout(
      grid, Seq(col("x"), col("y")), 5, 8, col("id"))
      .queryExecution.executedPlan.toString
    // exactly one shuffle (the range partitioning) — the in-partition
    // sort must NOT plan a second global exchange
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
    assert(plan.contains("rangepartitioning"), plan)
    assert(plan.contains("interleavebits"), plan)
  }

  test("d03/d04/d06 candidate generation stays on equality joins (no NLJ)") {
    Seq("d03_minhash_lsh", "d04_simhash", "d06_decontaminate").foreach { n =>
      val p = planOf(n)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$n:\n$p")
      assert(!p.contains("CartesianProduct"), s"$n:\n$p")
    }
  }

  test("d06 broadcasts the benchmark shingle set into the semi join") {
    val p = planOf("d06_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("q31 bucketed join: sort-merge with ZERO shuffle on the join keys") {
    val p = planOf("q31_bucketed_join")
    assert(p.contains("SortMergeJoin"), p)
    val keyShuffles = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("orderkey"))
    assert(keyShuffles == 0,
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("q32 range join shuffles on (user, time-bucket), not user alone") {
    val p = planOf("q32_range_bucket_join")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    // the bucket column must be part of the join KEY (the skew shard),
    // not just a post-join filter — whatever physical join the tiny
    // test scale picks (broadcast here, SMJ at scale)
    val joinLine = p.linesIterator.find(_.contains("HashJoin"))
    assert(joinLine.exists(l =>
      l.indexOf("bkt") >= 0 && l.indexOf("bkt") < l.indexOf(", Inner")),
      joinLine.getOrElse(p))
  }

  test("p07 doc-level prefix sum windows on the range key, not one partition") {
    // the per-doc cumulative sum must run under hashpartitioning(rng…)
    // — only the 32-row range-offset window may collapse to a single
    // partition
    val p = planOf("p07_sequence_pack")
    assert(p.contains("hashpartitioning(rng"), p)
  }

  test("q37 global decile: the big-table window runs per value-bucket") {
    // the full-table row_number must execute under hashpartitioning(bkt…);
    // only the one-row-per-bucket offset window may single-partition
    val p = planOf("q37_global_decile")
    assert(p.contains("hashpartitioning(bkt"), p)
  }

  test("q36 top-k arrays: one key shuffle feeds both windows and the agg") {
    val p = planOf("q36_array_topk")
    val keyShuffles = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("o_custkey"))
    assert(keyShuffles == 1,
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("p03 heavy hitters: rank window sees only the TakeOrdered top-k") {
    // the full token vocabulary must be bounded by TakeOrderedAndProject
    // BEFORE any single-partition rank window — never the aggregate
    // output funneled whole through one partition
    val p = planOf("p03_heavy_hitters")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("t08 bigram top-k bounds via TakeOrdered, never a global sort") {
    val p = planOf("t08_ngram_counts")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("d09/t14 corpus joins shuffle on the gram key, never all-pairs or a global sort") {
    Seq("d09_substring_dup", "t14_bigram_lm").foreach { n =>
      val p = planOf(n)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$n:\n$p")
      assert(!p.contains("Exchange rangepartitioning"), s"$n:\n$p")
      assert(!p.contains("Exchange SinglePartition"), s"$n:\n$p")
    }
    // d09's island detection must window per doc, not one partition
    assert(planOf("d09_substring_dup").contains("hashpartitioning(doc_id"))
  }

  test("p09/p10 domain windows partition by source (no global sort)") {
    Seq("p09_domain_mix", "p10_token_budget").foreach { n =>
      val p = planOf(n)
      assert(p.contains("hashpartitioning(source"), s"$n:\n$p")
      assert(!p.contains("Exchange SinglePartition"), s"$n:\n$p")
    }
  }

  test("graft DSv2 scan surfaces zone-skip predicates in the plan") {
    import java.nio.file.Files
    import graft.core._
    import graft.core.Model._
    import spark.implicits._
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_audit_zone_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(4), Seq(2), Double.NaN))))
    w.writeSlab("t", Seq((Seq(0L), 1.0), (Seq(3L), 9.0))
      .toDF("coord", "value"))
    val v = w.commit()
    val p = spark.read.format("graft")
      .option("path", ds.path).option("variable", "t")
      .option("asOf", v.toString).load()
      .where("value <= 2")
      .queryExecution.executedPlan.toString
    // the scan advertises the predicate it zone-prunes with, and the
    // residual Filter stays above it (skips must never be exactness)
    assert(p.contains("zoneSkip="), p)
    assert(p.contains("Filter"), p)
    // vectorized read path: batches flow through ColumnarToRow
    assert(p.contains("ColumnarToRow"), p)
  }

  test("as-of join widens int ts and rejects non-numeric ts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val l = Seq((1L, 10), (1L, 20)).toDF("k", "lts")
    val r = Seq((1L, 5), (1L, 15)).toDF("k", "rts")
    val got = graft.plans.GraftAsOf.join(spark, l, r,
      Seq("k"), "lts", "rts")
      .select(col("lts"), col("rts")).as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 5L), (20L, 15L)))
    val bad = Seq((1L, "x")).toDF("k", "lts")
    val ex = intercept[IllegalArgumentException] {
      graft.plans.GraftAsOf.join(spark, bad, r, Seq("k"), "lts", "rts")
    }
    assert(ex.getMessage.contains("unsupported type"))
  }

  test("s09 quantization audit plans ZERO exchanges (pure projection)") {
    val p = planOf("s09_sq8_quantize")
    assert(!p.contains("Exchange"), p)
  }

  test("p12 pagerank: term-keyed edge join, never cartesian/NLJ") {
    val p = planOf("p12_doc_pagerank")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("mm03 frame dedup: fingerprint-key shuffles only, TakeOrdered report") {
    val p = planOf("mm03_frame_dedup")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort ["), s"global sort crept in:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q49 time-weighted avg: window and groupBy share ONE user_id shuffle") {
    val p = planOf("q49_time_weighted_avg")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"$exchanges key shuffles (want the window's " +
      s"user_id exchange reused by the aggregate):\n$p")
  }

  test("mm05 scene detect: zero shuffles (the kernel walks each video in place)") {
    val p = planOf("mm05_scene_detect")
    assert(!p.contains("Exchange"), s"shuffle crept into a per-row kernel:\n$p")
  }

  test("d10 incremental dedup: equality joins only, no corpus blowup") {
    val p = planOf("d10_incremental_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
