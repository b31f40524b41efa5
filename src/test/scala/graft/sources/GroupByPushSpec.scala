package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.core.Model._

/** GROUP BY pushdown over coordinate dims: grouped aggregates
  * partial-push into the scan — counts and dim min/max per group are
  * box closed forms at any chunking, and value aggs fold from the
  * zone stats when the grouped dims are GROUP-PURE (`chunkDims == 1`
  * there, so a tile belongs to exactly one group). Chunk the time
  * axis at 1 and "daily sum over a century" reads zone stats, not
  * cells.
  */
class GroupByPushSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}

  /** 8x8, chunkDims (1, cw): dim 0 group-pure; values i*8+j. */
  private def mkStore(cw: Long, dtype: String = "double")
      : (GraftDataset, Long) = {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_gby_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val fill = if (dtype == "double") Double.NaN else 0.0
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("temp", dtype, Seq(8, 8), Seq(1, cw), fill))))
    w.writeSlab("temp",
      (for (i <- 0L until 8L; j <- 0L until 8L)
        yield (Seq(i, j), (i * 8 + j).toDouble)).toDF("coord", "value"))
    (ds, w.commit())
  }

  private def load(ds: GraftDataset, v: Long) =
    spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("asOf", v.toString).load()

  test("GROUP BY a pure dim pushes count/min/max/sum; zone stats " +
      "fold per group, boundary decodes only") {
    val (ds, v) = mkStore(2)
    val zBefore = GraftScan.aggTilesFromZones.get()
    val agg = load(ds, v)
      .where("x1 >= 1 AND x1 < 7")
      .groupBy(col("x0"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("mn"),
        max(col("value")).as("mx"), sum(col("value")).as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("groupBy=[x0]"), plan)
    val got = agg.collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.size == 8)
    (0L until 8L).foreach { i =>
      val (n, mn, mx, s) = got(i)
      assert(n == 6L && mn == i * 8 + 1 && mx == i * 8 + 6 &&
        s == 48 * i + 21, s"group $i: ($n, $mn, $mx, $s)")
    }
    // per row: tiles [2,4) and [4,6) are interior -> 16 zone folds
    assert(GraftScan.aggTilesFromZones.get() - zBefore >= 16)
  }

  test("GROUP BY an impure dim still pushes closed forms (counts, " +
      "dim aggs) but declines value aggs into the plain scan") {
    val (ds, v) = mkStore(2)
    // closed forms: count + min(x0) per x1 group pushes at any chunking
    val closed = load(ds, v).groupBy(col("x1"))
      .agg(count(lit(1)).as("n"), min(col("x0")).as("mn0"))
    assert(closed.queryExecution.executedPlan.toString
      .contains("groupBy=[x1]"), closed.queryExecution.executedPlan)
    val gotC = closed.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0L until 8L).foreach(j => assert(gotC(j) == (8L, 0L)))

    // value agg on the impure dim: no pushdown, still exact
    val declined = load(ds, v).groupBy(col("x1"))
      .agg(sum(col("value")).as("s"))
    assert(!declined.queryExecution.executedPlan.toString
      .contains("groupBy="), declined.queryExecution.executedPlan)
    val gotD = declined.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0L until 8L).foreach { j =>
      assert(gotD(j) == (0L until 8L).map(i => (i * 8 + j).toDouble).sum)
    }
  }

  test("grouped sums on a long store are exact longs; unwritten " +
      "chunks contribute fill per group") {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_gby_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    // 4x4, chunkDims (1,4): rows 0 and 2 written, 1 and 3 unwritten
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("temp", "long", Seq(4, 4), Seq(1, 4), 7.0))))
    w.writeSlab("temp",
      (for (i <- Seq(0L, 2L); j <- 0L until 4L)
        yield (Seq(i, j), (i * 4 + j).toDouble)).toDF("coord", "value"))
    val v = w.commit()
    val agg = load(ds, v).groupBy(col("x0"))
      .agg(sum(col("value")).as("s"), min(col("value")).as("mn"),
        count(col("value")).as("n"))
    assert(agg.queryExecution.executedPlan.toString
      .contains("groupBy=[x0]"))
    val got = agg.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got(0L) == ((6L, 0L, 4L)))   // 0+1+2+3
    assert(got(2L) == ((38L, 8L, 4L)))  // 8+9+10+11
    assert(got(1L) == ((28L, 7L, 4L)))  // 4 fill cells of 7
    assert(got(3L) == ((28L, 7L, 4L)))
  }

  test("GROUP BY both dims at chunkDims (1,1): per-cell groups, " +
      "all zone-folded") {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_gby_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(3, 3), Seq(1, 1), Double.NaN))))
    w.writeSlab("temp",
      (for (i <- 0L until 3L; j <- 0L until 3L)
        yield (Seq(i, j), (i * 3 + j).toDouble)).toDF("coord", "value"))
    val v = w.commit()
    val agg = load(ds, v).groupBy(col("x0"), col("x1"))
      .agg(sum(col("value")).as("s"), count(lit(1)).as("n"))
    assert(agg.queryExecution.executedPlan.toString
      .contains("groupBy=[x0, x1]"), agg.queryExecution.executedPlan)
    val got = agg.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(got.size == 9)
    for (i <- 0L until 3L; j <- 0L until 3L)
      assert(got((i, j)) == (((i * 3 + j).toDouble, 1L)))
  }
}
