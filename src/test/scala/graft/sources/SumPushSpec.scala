package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.core.Model._

/** SUM/COUNT/AVG(value) pushdown from the zone sum stats (vsum/vabs
  * on every index row). The contract under test:
  *
  *  - full-box folds COMPLETE-push into a one-row GraftAggScan with
  *    zero chunk reads, exactly (integral cells ⇒ any-order IEEE
  *    addition is exact; NaN/±Inf propagate to the deterministic
  *    IEEE outcome);
  *  - region cuts PARTIAL-push — interior tiles fold from vsum, the
  *    boundary shell decodes;
  *  - anything that could make the fold order-DEPENDENT declines
  *    loudly into the plain scan: non-integral cells, absolute mass
  *    past 2^52, shape-stale tiles, legacy rows without stats.
  */
class SumPushSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.{avg, col, count, lit, max, min, sum}

  /** 4x4 grid, 2x2 chunks: chunk (0,0) holds 0..3, chunk (1,1) holds
    * 100..103; chunks (0,1)/(1,0) unwritten (fill).
    */
  private def mkStore(dtype: String, fill: Double,
      values: Long => Double = _.toDouble): (GraftDataset, Long) = {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_sum_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val meta = DatasetMeta(Seq(
      VariableMeta("temp", dtype, Seq(4, 4), Seq(2, 2), fill)))
    val w = ds.newWriter(meta)
    val cells =
      (for (i <- 0L until 2L; j <- 0L until 2L)
        yield (Seq(i, j), values(i * 2 + j))) ++
      (for (i <- 2L until 4L; j <- 2L until 4L)
        yield (Seq(i, j), values(100 + (i - 2) * 2 + (j - 2))))
    w.writeSlab("temp", cells.toDF("coord", "value"))
    (ds, w.commit())
  }

  private def load(ds: GraftDataset, v: Long) =
    spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("asOf", v.toString).load()

  test("full-box SUM/COUNT/AVG complete-push: exact, typed, zero " +
      "chunk reads (fill closed form included)") {
    // long store, fill 0: total = 6 + 406 + 0*8 = 412 over 16 cells
    val (ds, v) = mkStore("long", 0.0)
    val dBefore = GraftScan.aggTilesDecoded.get()
    val agg = load(ds, v).agg(sum(col("value")), count(col("value")),
      avg(col("value")))
    assert(agg.queryExecution.executedPlan.toString
      .contains("GraftAggScan"), agg.queryExecution.executedPlan)
    val r = agg.head()
    assert(r.getLong(0) == 412L, s"sum ${r.get(0)}") // Sum(long) -> long
    assert(r.getLong(1) == 16L)
    assert(r.getDouble(2) == 25.75)
    assert(GraftScan.aggTilesDecoded.get() == dBefore,
      "complete push must not decode tiles")

    // double store, non-zero integral fill: fill 7 over 8 cells
    val (ds2, v2) = mkStore("double", 7.0)
    val agg2 = load(ds2, v2).agg(sum(col("value")))
    assert(agg2.queryExecution.executedPlan.toString
      .contains("GraftAggScan"))
    assert(agg2.head().getDouble(0) == 412.0 + 56.0)
  }

  test("NaN fill with unwritten chunks: the deterministic IEEE " +
      "outcome (NaN) complete-pushes for SUM and AVG") {
    val (ds, v) = mkStore("double", Double.NaN)
    val agg = load(ds, v).agg(sum(col("value")), avg(col("value")))
    assert(agg.queryExecution.executedPlan.toString
      .contains("GraftAggScan"))
    val r = agg.head()
    assert(r.getDouble(0).isNaN && r.getDouble(1).isNaN)
  }

  test("non-integral cells null the sum stats: SUM declines into the " +
      "plain scan, result stays exact") {
    val (ds, v) = mkStore("double", 0.0, n => n.toDouble + 0.5)
    val agg = load(ds, v).agg(sum(col("value")))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("GraftAggScan") && !plan.contains("partialAgg="),
      plan)
    assert(agg.head().getDouble(0) == 412.0 + 8 * 0.5)
    // MIN/MAX still complete-push on the same store (their zones are
    // exact regardless of integrality)
    val mm = load(ds, v).agg(min(col("value")), max(col("value")))
    assert(mm.queryExecution.executedPlan.toString
      .contains("GraftAggScan"))
  }

  test("absolute mass past 2^52 declines (any-order exactness is " +
      "gone); result from the plain scan") {
    // 8 written cells of 2^50 each: per-tile mass 2^52 keeps every
    // tile's own stats exact (at the bound), the TOTAL (2^53) is past
    // it — the decline must happen at the GLOBAL fold
    val big = math.pow(2, 50)
    val (ds, v) = mkStore("double", 0.0, _ => big)
    val agg = load(ds, v).agg(sum(col("value")))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("GraftAggScan") && !plan.contains("partialAgg="),
      plan)
    assert(agg.head().getDouble(0) == big * 8)
  }

  test("region-cut SUM partial-pushes: interior tiles fold from " +
      "vsum, only the boundary shell decodes; COUNT and MIN/MAX ride") {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_sum_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(8, 8), Seq(2, 2), Double.NaN))))
    w.writeSlab("temp",
      (for (i <- 0L until 8L; j <- 0L until 8L)
        yield (Seq(i, j), (i * 8 + j).toDouble)).toDF("coord", "value"))
    val v = w.commit()
    val zBefore = GraftScan.aggTilesFromZones.get()
    val dBefore = GraftScan.aggTilesDecoded.get()
    val agg = load(ds, v)
      .where("x0 >= 1 AND x0 < 7 AND x1 >= 1 AND x1 < 7")
      .agg(sum(col("value")), count(lit(1)), min(col("value")),
        max(col("value")))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("GraftAggScan") && plan.contains("ValSum"), plan)
    val r = agg.head()
    assert(r.getDouble(0) == 1134.0, s"region sum ${r.get(0)}")
    assert(r.getLong(1) == 36L)
    assert(r.getDouble(2) == 9.0 && r.getDouble(3) == 54.0)
    assert(GraftScan.aggTilesFromZones.get() - zBefore >= 4)
    assert(GraftScan.aggTilesDecoded.get() - dBefore >= 12)
  }

  test("partial SUM through the MANIFEST path: vsum round-trips " +
      "per-bin scan files past the inline threshold") {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_sum_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(8, 8), Seq(2, 2), Double.NaN))))
    w.writeSlab("temp",
      (for (i <- 0L until 8L; j <- 0L until 8L)
        yield (Seq(i, j), (i * 8 + j).toDouble)).toDF("coord", "value"))
    val v = w.commit()
    spark.conf.set("spark.graft.scan.inlineThreshold", "4")
    try {
      val zBefore = GraftScan.aggTilesFromZones.get()
      val r = load(ds, v)
        .where("x0 >= 1 AND x0 < 7 AND x1 >= 1 AND x1 < 7")
        .agg(sum(col("value"))).head()
      assert(r.getDouble(0) == 1134.0, s"manifest-path sum: $r")
      assert(GraftScan.aggTilesFromZones.get() - zBefore >= 4)
    } finally spark.conf.unset("spark.graft.scan.inlineThreshold")
  }

  test("a shape GROW stales the stats: SUM must decline (current fill " +
      "cells the stats never saw), result from the plain scan") {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_sum_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(6), Seq(4), 0.0))))
    w.writeSlab("temp",
      (0L until 6L).map(i => (Seq(i), 5.0)).toDF("coord", "value"))
    w.commit()
    val v2 = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(8), Seq(4), 0.0)))).commit()
    val agg = load(ds, v2).agg(sum(col("value")))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("GraftAggScan") && !plan.contains("ValSum"),
      plan)
    assert(agg.head().getDouble(0) == 30.0) // 6 fives + 2 fill zeros
  }

  test("sum stats survive index folds and retention compaction") {
    val (ds, v1) = mkStore("long", 0.0)
    val w = ds.newWriter(ds.metadata(v1))
    w.writeSlab("temp", Seq((Seq(0L, 0L), 999.0)).toDF("coord", "value"))
    val v2 = w.commit()
    ds.compactIndexLog()
    ds.expireVersions(keepLast = 1)
    val agg = load(ds, v2).agg(sum(col("value")))
    assert(agg.queryExecution.executedPlan.toString
      .contains("GraftAggScan"), "stats must survive the rewrites")
    // 412 - 0 + 999 (cell (0,0) overwritten 0 -> 999)
    assert(agg.head().getLong(0) == 412L + 999L)
  }

  test("int dtype: SUM result is an exact long; AVG an exact double") {
    val (ds, v) = mkStore("int", 0.0)
    val agg = load(ds, v).agg(sum(col("value")), avg(col("value")))
    assert(agg.queryExecution.executedPlan.toString
      .contains("GraftAggScan"))
    val r = agg.head()
    assert(r.getLong(0) == 412L && r.getDouble(1) == 25.75)
  }
}
