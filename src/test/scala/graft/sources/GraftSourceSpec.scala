package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.{count, lit, max, min}
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.core.Model._

/** The DSv2 connector must agree with the engine's readSlab path and
  * prune partitions from pushed coordinate bounds.
  */
class GraftSourceSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private def mkDataset(): (GraftDataset, Long) = {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_src_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val meta = DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(6, 6), Seq(2, 2), Double.NaN)))
    val w = ds.newWriter(meta)
    w.writeSlab("temp",
      (for (i <- 0L until 6L; j <- 0L until 6L if (i + j) % 3 != 0)
        yield (Seq(i, j), (i * 10 + j).toDouble)).toDF("coord", "value"))
    val v = w.commit()
    (ds, v)
  }

  test("format(\"graft\") read matches readSlab") {
    val (ds, v) = mkDataset()
    val viaSource = spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("asOf", v.toString).load()
      .collect()
      .map(r => (Seq(r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val viaSlab = ds.readSlab("temp", v)
      .as[(Seq[Long], Double)].collect().toMap
    assert(viaSource.size == 36 && viaSlab.size == 36)
    viaSlab.foreach { case (c, value) =>
      val got = viaSource(c)
      assert(got == value || (got.isNaN && value.isNaN), s"cell $c")
    }
  }

  test("coordinate bound filters prune partitions and rows") {
    val (ds, v) = mkDataset()
    val df = spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("asOf", v.toString).load()
      .filter($"x0" >= 2L && $"x0" < 4L && $"x1" === 1L)
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    // pushdown visible in the physical plan description
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftScan"), plan)
  }

  test("column pruning: coordinate-only projection skips decode") {
    val (ds, v) = mkDataset()
    val df = spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("asOf", v.toString).load()
      .select($"x0").filter($"x1" < 100L) // x1 pruned out of output
    assert(df.count() == 36)
    assert(df.schema.fieldNames.toSeq == Seq("x0"))
  }

  test("planning a 1M-chunk grid stays O(partitions) on the driver") {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_big_").toString)
    lake.create("big")
    val ds = lake.connect("big")
    // 1000x1000 grid of single-cell chunks; only 3 written
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(1000, 1000), Seq(1, 1), 0.0)))
    val w = ds.newWriter(meta)
    w.writeSlab("t", Seq(
      (Seq(0L, 0L), 1.0), (Seq(500L, 500L), 2.0), (Seq(999L, 999L), 3.0))
      .toDF("coord", "value"))
    val v = w.commit()
    // force the large-scan route (per-bin manifest files) — the
    // 3-entry resolved set would otherwise ship inline
    spark.conf.set("spark.graft.scan.inlineThreshold", "2")
    try {
      val df = spark.read.format("graft")
        .option("path", ds.path).option("variable", "t")
        .option("asOf", v.toString).load()
      // partitions are bin-packed ranges, never one-per-chunk
      assert(df.rdd.getNumPartitions < 1000,
        s"got ${df.rdd.getNumPartitions} partitions for 1M chunks")
      assert(df.count() == 1000000L)
      val written = df.filter($"value" =!= 0.0).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(written == Seq((0L, 0L, 1.0), (500L, 500L, 2.0),
        (999L, 999L, 3.0)))
      // bounded filters prune to the region box before reading
      val slice = df.filter($"x0" === 500L && $"x1" >= 400L && $"x1" < 600L)
      assert(slice.count() == 200)
      assert(slice.filter($"value" === 2.0).count() == 1)
    } finally spark.conf.unset("spark.graft.scan.inlineThreshold")
    // inline route (default threshold) agrees
    val inline = spark.read.format("graft")
      .option("path", ds.path).option("variable", "t")
      .option("asOf", v.toString).load()
      .filter($"value" =!= 0.0)
    assert(inline.count() == 3)
  }

  test("DSv2 write path: df.write.format(\"graft\") commits a version") {
    val (ds, v) = mkDataset()
    (for (i <- 0L until 2L; j <- 0L until 2L)
      yield (i, j, 100.0 + i * 10 + j))
      .toDF("x0", "x1", "value")
      .write.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .mode("append").save()
    val v2 = ds.latestVersion.get
    assert(v2 > v)
    // round-trip via pure DSv2 read at the new version
    val got = spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp").load()
      .filter($"x0" < 2L && $"x1" < 2L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got == Map((0L, 0L) -> 100.0, (0L, 1L) -> 101.0,
      (1L, 0L) -> 110.0, (1L, 1L) -> 111.0))
    // old version untouched (MVCC)
    assert(ds.readSlab("temp", v).as[(Seq[Long], Double)].collect()
      .toMap.apply(Seq(1L, 1L)) == 11.0)
  }

  test("aggregate pushdown: count/min/max answered from the box, no reads") {
    val (ds, v) = mkDataset()
    val df = spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("asOf", v.toString).load()
    val agg = df.filter($"x0" >= 1L && $"x0" < 5L)
      .agg(count(lit(1)).as("n"), min($"x0").as("mn"), max($"x1").as("mx"))
    assert(agg.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      agg.queryExecution.executedPlan.toString)
    val row = agg.head()
    assert(row.getLong(0) == 24L) // 4 rows x 6 cols, fill included
    assert(row.getLong(1) == 1L && row.getLong(2) == 5L)
    // a value filter is NOT box-exact -> no pushdown, normal plan
    val noPush = df.filter($"value" > 10.0).agg(count(lit(1)))
    assert(!noPush.queryExecution.executedPlan.toString
      .contains("GraftAggScan"))
    // Spark SQL orders NaN above all values, so fill cells pass > 10
    assert(noPush.head().getLong(0) == df.collect().count { r =>
      val x = r.getDouble(2); x.isNaN || x > 10.0
    })
  }

  test("runtime filtering tightens the box before partition planning") {
    val (ds, v) = mkDataset()
    val builder = new GraftScanBuilder(ds.path, "temp", v,
      ds.metadata(v).variable("temp"), Map(v ->
        ds.metadata(v).variable("temp")))
    val scan = builder.build().asInstanceOf[GraftScan]
    val before = scan.toBatch.planInputPartitions()
      .map(_.asInstanceOf[GraftBinPartition])
      .map(p => p.endCid - p.startCid).sum
    assert(before == 9) // full 3x3 chunk grid
    // a join delivered x0 IN (0, 1): rows 0-1 -> chunk row 0 only
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("x0",
        Array(java.lang.Long.valueOf(0L), java.lang.Long.valueOf(1L)))))
    val after = scan.toBatch.planInputPartitions()
      .map(_.asInstanceOf[GraftBinPartition])
      .map(p => p.endCid - p.startCid).sum
    assert(after == 3, s"expected 3 chunks after runtime filter, got $after")
  }

  test("_version provenance column tags cells with their writing version") {
    val (ds, v) = mkDataset()
    val w = ds.newWriter(ds.metadata(v))
    w.writeSlab("temp", Seq((Seq(0L, 0L), 999.0)).toDF("coord", "value"))
    val v2 = w.commit()
    val rows = spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("withVersion", "true").load()
      .filter($"x1" === 0L && $"x0" < 3L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // chunk (0,0) rewritten in v2; chunk (1,0) still from v1
    assert(rows(0L) == v2 && rows(1L) == v2) // rows 0,1 in chunk (0,*)
    assert(rows(2L) == v)
  }

  test("readStream.format(\"graft\"): commit log as a changelog stream") {
    val (ds, v1) = mkDataset()
    val stream = spark.readStream.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("withVersion", "true")
      .load()
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("graft_cdc").start()
    try {
      q.processAllAvailable()
      // batch 1: full history = v1's 9 written chunks x 4 cells
      val b1 = spark.table("graft_cdc").collect()
      assert(b1.length == 36, s"expected 36 cells, got ${b1.length}")
      assert(b1.forall(_.getLong(3) == v1))
      // commit v2 while the stream runs; next batch = only the delta
      val w = ds.newWriter(ds.metadata(v1))
      w.writeSlab("temp", Seq((Seq(0L, 0L), 777.0)).toDF("coord", "value"))
      val v2 = w.commit()
      q.processAllAvailable()
      val all = spark.table("graft_cdc").collect()
      val delta = all.filter(_.getLong(3) == v2)
      assert(delta.length == 4, s"delta should be one chunk (4 cells)")
      val changed = delta.find(r => r.getLong(0) == 0 && r.getLong(1) == 0)
      assert(changed.exists(_.getDouble(2) == 777.0))
    } finally q.stop()
  }

  test("latest version is the default asOf") {
    val (ds, v) = mkDataset()
    val w = ds.newWriter(ds.metadata(v))
    w.writeSlab("temp", Seq((Seq(0L, 0L), 999.0)).toDF("coord", "value"))
    w.commit()
    val top = spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp").load()
      .filter($"x0" === 0L && $"x1" === 0L).collect()
    assert(top.head.getDouble(2) == 999.0)
  }
}
