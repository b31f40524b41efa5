package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.core.Model._

/** LIMIT pushdown as a planning-level box clip: a dense read's row set
  * IS the region box, so any n cells satisfy an unordered LIMIT n —
  * the scan shrinks to the smallest dim-0 slice prefix holding >= n
  * cells instead of scheduling the whole grid for Spark to drop.
  * Spark still applies its exact Limit on top (partial pushdown).
  */
class LimitPushSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def mkStore(): (GraftDataset, Long) = {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_lim_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(8, 8), Seq(2, 2), Double.NaN))))
    w.writeSlab("temp",
      (for (i <- 0L until 8L; j <- 0L until 8L)
        yield (Seq(i, j), (i * 8 + j).toDouble)).toDF("coord", "value"))
    (ds, w.commit())
  }

  private def load(ds: GraftDataset, v: Long) =
    spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("asOf", v.toString).load()

  test("LIMIT n clips the planned box to the covering dim-0 slices") {
    val (ds, v) = mkStore()
    val df = load(ds, v).limit(3)
    val plan = df.queryExecution.executedPlan.toString
    // 3 cells need ceil(3/8) = 1 slice of dim 0: region (0,1)x(0,8)
    assert(plan.contains("limitClip=3"), plan)
    assert(plan.contains("region=Vector((0,1), (0,8))"), plan)
    assert(df.count() == 3)
  }

  test("pushed dim filters compose with the clip (slices of the " +
      "filtered box)") {
    val (ds, v) = mkStore()
    val df = load(ds, v).where(col("x1") >= 2 && col("x1") < 8).limit(10)
    val plan = df.queryExecution.executedPlan.toString
    // 6 cells per slice after the x1 cut -> ceil(10/6) = 2 slices
    assert(plan.contains("limitClip=10"), plan)
    assert(plan.contains("region=Vector((0,2), (2,8))"), plan)
    assert(df.count() == 10)
  }

  test("residual value predicates decline the clip (they drop rows " +
      "after the scan)") {
    val (ds, v) = mkStore()
    val df = load(ds, v).where(col("value") >= 32.0).limit(3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("limitClip="), plan)
    assert(df.count() == 3)
  }

  test("a limit past the box size returns every cell") {
    val (ds, v) = mkStore()
    val df = load(ds, v).limit(1000)
    assert(df.count() == 64)
  }

  test("ORDER BY x0 DESC LIMIT clips the high end of dim 0") {
    val (ds, v) = mkStore()
    val df = load(ds, v).orderBy(col("x0").desc, col("x1")).limit(3)
    val plan = df.queryExecution.executedPlan.toString
    // 3 cells need ceil(3/8) = 1 slice, taken from the TOP of dim 0
    assert(plan.contains("region=Vector((7,8), (0,8))"), plan)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((7L, 0L), (7L, 1L), (7L, 2L)), got.toSeq)
  }

  test("ORDER BY x1 LIMIT clips along the leading sort dim, not dim 0") {
    val (ds, v) = mkStore()
    val df = load(ds, v).orderBy(col("x1"), col("x0")).limit(10)
    val plan = df.queryExecution.executedPlan.toString
    // 10 cells over 8 rows per x1 slice -> 2 slices of dim 1
    assert(plan.contains("region=Vector((0,8), (0,2))"), plan)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 10 && got.forall(_._2 <= 1), got.toSeq)
    assert(got.take(8).forall(_._2 == 0L))
  }

  test("ORDER BY value declines the TopN clip (not a coordinate dim)") {
    val (ds, v) = mkStore()
    val df = load(ds, v).orderBy(col("value").desc).limit(3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("limitClip="), plan)
    assert(df.collect().map(_.getDouble(2)).toSeq == Seq(63.0, 62.0, 61.0))
  }

  test("the change feed declines the clip (sparse rows)") {
    val (ds, v1) = mkStore()
    val w = ds.newWriter(ds.metadata(v1))
    w.writeSlab("temp", Seq((Seq(7L, 7L): Seq[Long]) -> 999.0)
      .toDF("coord", "value"))
    val v2 = w.commit()
    val df = spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("asOf", v2.toString)
      .option("startVersion", v1.toString).load().limit(2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("limitClip="), plan)
    // the changed chunk holds 4 cells; limit still applies exactly
    assert(df.count() == 2)
  }
}
