package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.core.Model._

/** ANALYZE (`GraftDataset.analyzeIndexStats` / `CALL system.analyze`):
  * index rows committed before the zone-stat columns existed decline
  * the value-filter skips and every value-aggregate pushdown — forever,
  * since stats are computed at write time. ANALYZE decodes each
  * stat-less chunk once, recomputes the stats through the writer's own
  * accumulator, and rewrites the store as one level-merged segment —
  * after which the old rows push down like new ones. Legacy rows are
  * SIMULATED by rewriting a committed index partition without the stat
  * columns (exactly what a pre-stats engine version left behind;
  * schema-evolution reads surface them as nulls).
  */
class AnalyzeSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.{avg, col, max, min, sum}

  /** 4x4 grid, 2x2 chunks, long dtype, fill 0: chunk (0,0) holds
    * 0..3, chunk (1,1) holds 100..103.
    */
  private def mkStore(): (GraftDataset, Long) = {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_analyze_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("temp", "long", Seq(4, 4), Seq(2, 2), 0.0))))
    val cells =
      (for (i <- 0L until 2L; j <- 0L until 2L)
        yield (Seq(i, j), (i * 2 + j).toDouble)) ++
      (for (i <- 2L until 4L; j <- 2L until 4L)
        yield (Seq(i, j), (100 + (i - 2) * 2 + (j - 2)).toDouble))
    w.writeSlab("temp", cells.toDF("coord", "value"))
    (ds, w.commit())
  }

  /** Strip the stat columns from every committed index partition —
    * the on-disk layout a pre-stats writer produced.
    */
  private def stripStats(ds: GraftDataset): Unit = {
    val fs = new Path(ds.path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val idxDir = new Path(s"${ds.path}/indices")
    fs.listStatus(idxDir).filter(_.getPath.getName.startsWith("versionId="))
      .foreach { st =>
        val dir = st.getPath
        // explicit pre-stats schema: writerVersion may not physically
        // exist in files (null except after retention) — read it as
        // null exactly like the engine's schema-evolution read does
        val legacySchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("variable",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("coord",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType, containsNull = false)),
          org.apache.spark.sql.types.StructField("chunkHash",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("writerVersion",
            org.apache.spark.sql.types.LongType)))
        val legacy = spark.read.schema(legacySchema).parquet(dir.toString)
        val tmp = new Path(idxDir, s"_strip_${dir.getName}")
        legacy.coalesce(1).write.parquet(tmp.toString)
        fs.delete(dir, true)
        assert(fs.rename(tmp, dir))
      }
  }

  private def load(ds: GraftDataset, v: Long) =
    spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("asOf", v.toString).load()

  test("stat-less rows decline every pushdown; ANALYZE backfills " +
      "bit-identical stats and the pushdowns apply") {
    val (ds, v) = mkStore()
    stripStats(ds)

    // declined: no complete push (unknown zones/sums), no partial
    val before = load(ds, v)
      .agg(min(col("value")), max(col("value")), sum(col("value")),
        avg(col("value")))
    val planBefore = before.queryExecution.executedPlan.toString
    assert(!planBefore.contains("GraftAggScan") &&
      !planBefore.contains("partialAgg="), planBefore)
    // results still exact through the plain scan
    val rb = before.head()
    assert(rb.getLong(0) == 0L && rb.getLong(1) == 103L &&
      rb.getLong(2) == 412L && rb.getDouble(3) == 25.75)
    // value-filter skipping declined too (null bounds keep everything)
    val skipBefore = GraftScan.zoneSkippedChunks.get()
    assert(load(ds, v).where("value >= 100").count() == 4)
    assert(GraftScan.zoneSkippedChunks.get() == skipBefore)

    // ANALYZE: both live rows decode once and backfill
    assert(ds.analyzeIndexStats() == 2L)

    val after = load(ds, v)
      .agg(min(col("value")), max(col("value")), sum(col("value")),
        avg(col("value")))
    assert(after.queryExecution.executedPlan.toString
      .contains("GraftAggScan"), after.queryExecution.executedPlan)
    val ra = after.head()
    assert(ra.getLong(0) == 0L && ra.getLong(1) == 103L &&
      ra.getLong(2) == 412L && ra.getDouble(3) == 25.75)
    // the value skip works again (fill 0 fails >= 100)
    val b2 = GraftScan.zoneSkippedChunks.get()
    assert(load(ds, v).where("value >= 100").count() == 4)
    assert(GraftScan.zoneSkippedChunks.get() - b2 >= 1)
    // dense reads unchanged by the rewrite
    assert(ds.readSlab("temp", v).count() == 16)
    // idempotent: everything now carries stats
    assert(ds.analyzeIndexStats() == 0L)
  }

  test("backfilled stats equal writer-computed stats cell for cell") {
    val (ds, v) = mkStore()
    val want = ds.indicesDF
      .select(col("coord"), col("vmin"), col("vmax"), col("vsum"),
        col("vabs"))
      .as[(Seq[Long], Option[Double], Option[Double], Option[Double],
        Option[Double])]
      .collect().map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    stripStats(ds)
    ds.analyzeIndexStats()
    val got = ds.indicesDF
      .select(col("coord"), col("vmin"), col("vmax"), col("vsum"),
        col("vabs"))
      .as[(Seq[Long], Option[Double], Option[Double], Option[Double],
        Option[Double])]
      .collect().map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    assert(got == want, s"backfilled $got != writer $want")
  }

  test("CALL system.analyze reports the backfill accounting") {
    val (ds, _) = mkStore()
    stripStats(ds)
    val cat = s"an${System.nanoTime() % 100000}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root",
      new java.io.File(ds.path).getParent)
    try {
      val row = spark.sql(
        s"CALL $cat.system.analyze(dataset => 'd')").head()
      assert(row.getString(0) == "d" && row.getLong(1) == 2L)
      // value_stats now reports the exact sum for the upgraded store
      val vs = spark.sql(s"CALL $cat.system.value_stats(" +
        "dataset => 'd', variable => 'temp')").head()
      assert(vs.getDouble(5) == 412.0 && vs.getLong(6) == 0L)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
    }
  }
}
