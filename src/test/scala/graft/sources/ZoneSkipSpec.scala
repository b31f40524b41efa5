package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.core.Model._

/** Value-column zone maps: pushed comparison filters must skip chunks
  * whose [vmin, vmax] cannot satisfy them — without ever changing
  * results. Skipping is proven through the JVM-wide
  * [[GraftScan.zoneSkippedChunks]] counter (local mode shares the JVM);
  * correctness through full result comparison against the unfiltered
  * read, which exercises the fill-emission subtlety: a skipped chunk
  * reads back as fill, so fill must fail the predicates for a skip to
  * be legal.
  */
class ZoneSkipSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  /** 4x4 grid, 2x2 chunks: chunk (0,0) holds 0..3, chunk (1,1) holds
    * 100..103; chunks (0,1)/(1,0) unwritten (fill).
    */
  private def mkStore(dtype: String, fill: Double): (GraftDataset, Long) = {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_zone_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val meta = DatasetMeta(Seq(
      VariableMeta("temp", dtype, Seq(4, 4), Seq(2, 2), fill)))
    val w = ds.newWriter(meta)
    val cells =
      (for (i <- 0L until 2L; j <- 0L until 2L)
        yield (Seq(i, j), (i * 2 + j).toDouble)) ++
      (for (i <- 2L until 4L; j <- 2L until 4L)
        yield (Seq(i, j), (100 + (i - 2) * 2 + (j - 2)).toDouble))
    w.writeSlab("temp", cells.toDF("coord", "value"))
    (ds, w.commit())
  }

  private def readAll(ds: GraftDataset, v: Long, where: String = "") = {
    val df = spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("asOf", v.toString).load()
    (if (where.isEmpty) df else df.where(where)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.get(2)).toMap
  }

  test("value <= cut skips the high chunk on a NaN-fill double store; " +
      ">= cannot skip (Spark's NaN compares greater than everything)") {
    val (ds, v) = mkStore("double", Double.NaN)
    val before = GraftScan.zoneSkippedChunks.get()
    val got = readAll(ds, v, "value <= 3")
    val skipped = GraftScan.zoneSkippedChunks.get() - before
    // NaN fill fails <=, so only the low chunk's written cells remain
    assert(got.size == 4)
    assert(got((0L, 0L)) == 0.0 && got((1L, 1L)) == 3.0)
    assert(skipped >= 1, s"high chunk must be zone-skipped (got $skipped)")

    // Spark semantics: NaN >= 100 is TRUE — fill cells belong in this
    // result, so the planner must NOT skip (fill would satisfy), and
    // the answer keeps all 12 NaN cells
    val b2 = GraftScan.zoneSkippedChunks.get()
    val hi = readAll(ds, v, "value >= 100")
    assert(GraftScan.zoneSkippedChunks.get() - b2 == 0)
    assert(hi.size == 12) // 4 high cells + 8 fill-chunk NaN cells
    assert(hi((2L, 2L)) == 100.0 &&
      hi((0L, 2L)).asInstanceOf[Double].isNaN)
    assert(!hi.contains((0L, 0L))) // low written cells residual-filtered
  }

  test("EqualTo and In skip non-overlapping chunks; results exact") {
    val (ds, v) = mkStore("double", Double.NaN)
    val b1 = GraftScan.zoneSkippedChunks.get()
    assert(readAll(ds, v, "value = 101").values.toSeq == Seq(101.0))
    assert(GraftScan.zoneSkippedChunks.get() - b1 >= 1)
    val b2 = GraftScan.zoneSkippedChunks.get()
    val got = readAll(ds, v, "value IN (2, 102)")
    assert(got.values.map(_.asInstanceOf[Double]).toSeq.sorted
      == Seq(2.0, 102.0))
    // both chunks overlap the In-set: nothing may be skipped
    assert(GraftScan.zoneSkippedChunks.get() - b2 == 0)
  }

  test("a satisfiable fill value disables skipping (dense scans emit " +
      "fill for skipped chunks) — results stay exact") {
    val (ds, v) = mkStore("long", 0.0)
    // fill = 0 satisfies `value <= 50`: the high chunk's zone range
    // fails the predicate, but skipping it would re-emit its cells as
    // fill 0 — which the residual filter would KEEP. No skipping.
    val before = GraftScan.zoneSkippedChunks.get()
    val got = readAll(ds, v, "value <= 50")
    assert(GraftScan.zoneSkippedChunks.get() - before == 0)
    // 16 cells minus the 4 high-chunk cells (100..103)
    assert(got.size == 12)
    assert(got((0L, 0L)) == 0L && got((0L, 2L)) == 0L)

    // a predicate the fill FAILS re-enables skipping on the same store
    val b2 = GraftScan.zoneSkippedChunks.get()
    val hi = readAll(ds, v, "value >= 100")
    assert(GraftScan.zoneSkippedChunks.get() - b2 >= 1)
    assert(hi.size == 4 && hi((2L, 2L)) == 100L)
  }

  test("MIN/MAX(value) complete pushdown from zone maps: exact, " +
      "typed, zero chunk reads — declined when a region cut breaks " +
      "tile exactness") {
    // long dtype, fill 0, two unwritten grid chunks -> fill folds in
    val (ds, v) = mkStore("long", 0.0)
    val df = spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("asOf", v.toString).load()
    val agg = df.agg(org.apache.spark.sql.functions.min("value"),
      org.apache.spark.sql.functions.max("value"),
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)))
    assert(agg.queryExecution.executedPlan.toString
      .contains("GraftAggScan"), agg.queryExecution.executedPlan)
    val r = agg.head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 103L && r.getLong(2) == 16L)

    // NaN-fill double store: the unwritten chunks' NaN cells are the
    // dense MAX under Spark's NaN-greatest order
    val (ds2, v2) = mkStore("double", Double.NaN)
    val agg2 = spark.read.format("graft")
      .option("path", ds2.path).option("variable", "temp")
      .option("asOf", v2.toString).load()
      .agg(org.apache.spark.sql.functions.min("value"),
        org.apache.spark.sql.functions.max("value"))
    assert(agg2.queryExecution.executedPlan.toString
      .contains("GraftAggScan"))
    val r2 = agg2.head()
    assert(r2.getDouble(0) == 0.0 && r2.getDouble(1).isNaN)

    // a coordinate cut below tile granularity must DECLINE (falls
    // back to the real scan, still exact)
    val cut = spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("asOf", v.toString).load()
      .where("x0 >= 1")
      .agg(org.apache.spark.sql.functions.max("value"))
    assert(!cut.queryExecution.executedPlan.toString
      .contains("GraftAggScan"))
    assert(cut.head().getLong(0) == 103L)
  }

  test("region-cut MIN/MAX(value) partial-pushes: interior tiles fold " +
      "from zones, only the boundary shell decodes") {
    // 8x8, 2x2 chunks, all 64 cells written: value = i*8 + j
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_zone_").toString)
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
    val agg = spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("asOf", v.toString).load()
      .where("x0 >= 1 AND x0 < 7 AND x1 >= 1 AND x1 < 7")
      .agg(org.apache.spark.sql.functions.min("value"),
        org.apache.spark.sql.functions.max("value"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("GraftAggScan"), plan) // not the complete form
    assert(plan.contains("partialAgg="), plan)
    val r = agg.head()
    assert(r.getDouble(0) == 9.0, s"min ${r.getDouble(0)}")   // (1,1)
    assert(r.getDouble(1) == 54.0, s"max ${r.getDouble(1)}")  // (6,6)
    assert(r.getLong(2) == 36L)
    // 4 interior tiles (rows 1-2 x cols 1-2 of the chunk grid) fold
    // from zones; the 12 boundary-shell tiles decode
    assert(GraftScan.aggTilesFromZones.get() - zBefore >= 4)
    assert(GraftScan.aggTilesDecoded.get() - dBefore >= 12)
  }

  test("partial agg through the MANIFEST path: zone bounds round-trip " +
      "per-bin scan files when the resolved set exceeds the inline " +
      "threshold") {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_zone_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(8, 8), Seq(2, 2), Double.NaN))))
    w.writeSlab("temp",
      (for (i <- 0L until 8L; j <- 0L until 8L)
        yield (Seq(i, j), (i * 8 + j).toDouble)).toDF("coord", "value"))
    val v = w.commit()
    // 16 resolved tiles > threshold 4 -> per-bin manifest files carry
    // the zone bounds ("-" = unknown) instead of inline entries
    spark.conf.set("spark.graft.scan.inlineThreshold", "4")
    try {
      val zBefore = GraftScan.aggTilesFromZones.get()
      val r = spark.read.format("graft")
        .option("path", ds.path).option("variable", "temp")
        .option("asOf", v.toString).load()
        .where("x0 >= 1 AND x0 < 7 AND x1 >= 1 AND x1 < 7")
        .agg(org.apache.spark.sql.functions.min("value"),
          org.apache.spark.sql.functions.max("value"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1))).head()
      assert(r.getDouble(0) == 9.0 && r.getDouble(1) == 54.0 &&
        r.getLong(2) == 36L, s"manifest-path partial fold wrong: $r")
      assert(GraftScan.aggTilesFromZones.get() - zBefore >= 4,
        "interior tiles must fold from manifest-carried zones")
    } finally spark.conf.unset("spark.graft.scan.inlineThreshold")
  }

  test("a shape GROW makes boundary zones stale: value aggs must see " +
      "the new fill cells, not the stale zone fold") {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_zone_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val m6 = DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(6), Seq(4), 0.0)))
    val w = ds.newWriter(m6)
    w.writeSlab("temp",
      (0L until 6L).map(i => (Seq(i), 5.0)).toDF("coord", "value"))
    w.commit()
    // metadata-only grow 6 -> 8: same chunk grid, tile 1 now covers
    // cells 4..7 but its zones were written over 4..5 only
    val v2 = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(8), Seq(4), 0.0)))).commit()
    val agg = spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("asOf", v2.toString).load()
      .agg(org.apache.spark.sql.functions.min("value"),
        org.apache.spark.sql.functions.max("value"))
    // the complete zone fold would answer min = 5.0 and miss the two
    // current-fill cells — it must decline (stale tile) and the
    // partial path must decode the stale tile
    assert(!agg.queryExecution.executedPlan.toString
      .contains("GraftAggScan"))
    val r = agg.head()
    assert(r.getDouble(0) == 0.0, s"min must see fill, got ${r.getDouble(0)}")
    assert(r.getDouble(1) == 5.0)
  }

  test("a shape SHRINK makes boundary zones stale: value aggs must not " +
      "resurrect cut-off cells") {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_zone_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(8), Seq(4), 0.0))))
    w.writeSlab("temp",
      ((0L until 7L).map(i => (Seq(i), 5.0)) :+ ((Seq(7L), -9.0)))
        .toDF("coord", "value"))
    w.commit()
    val v2 = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(6), Seq(4), 0.0)))).commit()
    val agg = spark.read.format("graft")
      .option("path", ds.path).option("variable", "temp")
      .option("asOf", v2.toString).load()
      .agg(org.apache.spark.sql.functions.min("value"))
    // tile 1's zones still carry the cut-off -9 at cell 7; the fold
    // must decode and answer over cells 0..5 only
    assert(!agg.queryExecution.executedPlan.toString
      .contains("GraftAggScan"))
    assert(agg.head().getDouble(0) == 5.0)
  }

  test("valueStats: min/max from zone maps alone, via API and SQL CALL") {
    val (ds, v) = mkStore("double", Double.NaN)
    val r = ds.valueStats("temp", v).head()
    assert(r.getDouble(0) == 0.0)
    // the fill chunks are unwritten (absent); written tiles are
    // gapless, so no NaN rides vmax here
    assert(r.getDouble(1) == 103.0)
    assert(r.getLong(2) == 2L && r.getLong(3) == 0L)
    // exact written-tile sum from the vsum stats (0..3 + 100..103)
    assert(r.getDouble(4) == 412.0 && r.getLong(5) == 0L)

    val cat = s"vs${System.nanoTime() % 100000}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root",
      new java.io.File(ds.path).getParent)
    try {
      val row = spark.sql(s"CALL $cat.system.value_stats(" +
        "dataset => 'd', variable => 'temp')").head()
      assert(row.getDouble(1) == 0.0 && row.getDouble(2) == 103.0)
      assert(row.getLong(3) == 2L)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
    }
  }

  test("streaming changelog skips zone-failing delta chunks (sparse: " +
      "no fill proof needed)") {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_zone_st_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val meta = DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(4, 4), Seq(2, 2), Double.NaN)))
    val w1 = ds.newWriter(meta)
    w1.writeSlab("temp",
      (for (i <- 0L until 2L; j <- 0L until 2L)
        yield (Seq(i, j), (i * 2 + j).toDouble)).toDF("coord", "value"))
    w1.commit()
    val w2 = ds.newWriter(meta)
    w2.writeSlab("temp",
      (for (i <- 2L until 4L; j <- 2L until 4L)
        yield (Seq(i, j), (100 + (i - 2) * 2 + (j - 2)).toDouble))
        .toDF("coord", "value"))
    w2.commit()

    // Spark does not run V2 filter pushdown for streaming relations
    // (the micro-batch scan builds without pushFilters), so drive the
    // builder directly: pushed value predicates must flow through
    // toMicroBatchStream into the delta planner and skip there.
    val vm = ds.metadata(ds.latestVersion.get).variables.head
    val metas = Map.empty[Long, graft.core.Model.VariableMeta]
    val b = new GraftScanBuilder(ds.path, "temp",
      ds.latestVersion.get, vm, metas)
    import org.apache.spark.sql.sources.GreaterThanOrEqual
    b.pushFilters(Array(GreaterThanOrEqual("value",
      java.lang.Double.valueOf(100.0))))
    val stream = b.build().toMicroBatchStream("/tmp/unused")
    val before = GraftScan.zoneSkippedChunks.get()
    val parts = stream.planInputPartitions(
      GraftOffset(0L), GraftOffset(ds.latestVersion.get))
    assert(GraftScan.zoneSkippedChunks.get() - before >= 1,
      "v1's low chunk must be zone-skipped from the delta plan")
    assert(parts.nonEmpty)
    // the inline partitions carry only v2's surviving chunk
    val inline = parts.collect {
      case p: GraftStreamBinPartition => p.inline.map(_.length).getOrElse(0)
    }.sum
    assert(inline == 1, s"only the 100s chunk may survive, got $inline")
  }

  test("zone maps survive retention compaction and index folds") {
    val (ds, v1) = mkStore("double", Double.NaN)
    val w = ds.newWriter(ds.metadata(v1))
    w.writeSlab("temp", Seq((Seq(0L, 0L), 999.0)).toDF("coord", "value"))
    val v2 = w.commit()
    ds.compactIndexLog()
    ds.expireVersions(keepLast = 1)
    val before = GraftScan.zoneSkippedChunks.get()
    // EqualTo: NaN fill fails `= 999`, so skipping stays legal after
    // the fold+retention rewrites carried the zone columns
    val got = readAll(ds, v2, "value = 999")
    assert(got.size == 1 && got((0L, 0L)) == 999.0)
    // the overwritten chunk's zone spans [1,999] (kept); the 100s
    // chunk must still skip
    assert(GraftScan.zoneSkippedChunks.get() - before >= 1)
  }
}
