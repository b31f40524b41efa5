package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.core.Model._

/** Array analytics over the store: correctness on awkward shapes
  * (factors that don't divide chunkDims, strides across chunk
  * boundaries) and the two scale gates — hyperslab decodes only the
  * chunks its box overlaps, and CDC apply's payload I/O is bounded by
  * the CHANGED chunks, not the variable size.
  */
class ArrayOpsSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private def newLake(): GraftLake =
    new GraftLake(spark, Files.createTempDirectory("graft_arrspec_").toString)

  private def cells(cs: Seq[(Seq[Long], Double)]) = cs.toDF("coord", "value")

  test("coarsen handles factors that do not divide chunkDims") {
    val lake = newLake()
    lake.create("g")
    val ds = lake.connect("g")
    // 9×9 grid, chunk 4×4, coarsen by 3×3: blocks straddle tiles
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(9, 9), Seq(4, 4), Double.NaN)))
    val w = ds.newWriter(meta)
    w.writeSlab("t", cells(for (i <- 0L until 9L; j <- 0L until 9L)
      yield (Seq(i, j): Seq[Long]) -> (i * 9 + j).toDouble))
    val v = w.commit()
    val got = ArrayOps.coarsen(ds, "t", v, Seq(3L, 3L), avg)
      .select(element_at(col("coord"), 1), element_at(col("coord"), 2),
        col("value"))
      .as[(Long, Long, Double)].collect().toMap2
    // mean over block (x,y) of i*9+j, i in 3x..3x+2, j in 3y..3y+2:
    // (3x+1)*9 + (3y+1) = 27x + 3y + 10
    for (x <- 0L until 3L; y <- 0L until 3L)
      assert(got((x, y)) == 27 * x + 3 * y + 10,
        s"block ($x,$y): got ${got((x, y))}")
  }

  test("coarsen skips all-fill blocks (sparse-friendly)") {
    val lake = newLake()
    lake.create("g")
    val ds = lake.connect("g")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8, 8), Seq(4, 4), Double.NaN)))
    val w = ds.newWriter(meta)
    // only the top-left 2×2 block's cells are written
    w.writeSlab("t", cells(for (i <- 0L until 2L; j <- 0L until 2L)
      yield (Seq(i, j): Seq[Long]) -> 5.0))
    val v = w.commit()
    val rows = ArrayOps.coarsen(ds, "t", v, Seq(2L, 2L), avg).collect()
    assert(rows.length == 1)
    assert(rows.head.getSeq[Long](rows.head.fieldIndex("coord"))
      .toSeq == Seq(0L, 0L))
    assert(rows.head.getAs[Double]("value") == 5.0)
  }

  test("hyperslab decodes only the chunks its box overlaps") {
    val lake = newLake()
    lake.create("l")
    val ds = lake.connect("l")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(64), Seq(8), Double.NaN)))
    val w = ds.newWriter(meta)
    w.writeSlab("t", cells((0L until 64L).map(i =>
      (Seq(i): Seq[Long]) -> i.toDouble)))
    val v = w.commit()
    val before = ChunkCodec.chunksDecoded.get()
    // box [16, 24) lies entirely inside chunk 2 of 8
    val got = ArrayOps.hyperslab(ds, "t", v, Seq((16L, 24L, 3L)))
      .select(element_at(col("coord"), 1), col("value"))
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 16.0), (1L, 19.0), (2L, 22.0)))
    val decoded = ChunkCodec.chunksDecoded.get() - before
    assert(decoded == 1L,
      s"expected exactly 1 chunk decode for a 1-chunk box, got $decoded")
  }

  test("hyperslab stride crossing chunk boundaries") {
    val lake = newLake()
    lake.create("l")
    val ds = lake.connect("l")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(64), Seq(8), Double.NaN)))
    val w = ds.newWriter(meta)
    w.writeSlab("t", cells((0L until 64L).map(i =>
      (Seq(i): Seq[Long]) -> i.toDouble)))
    val v = w.commit()
    val got = ArrayOps.hyperslab(ds, "t", v, Seq((1L, 64L, 13L)))
      .select(element_at(col("coord"), 1), col("value"))
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq ==
      (0 to 4).map(k => k.toLong -> (1 + 13 * k).toDouble))
  }

  test("rollingMean refuses rank-1 (single global sort)") {
    val lake = newLake()
    lake.create("l")
    val ds = lake.connect("l")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8), Seq(4), Double.NaN)))
    val w = ds.newWriter(meta)
    w.writeSlab("t", cells((0L until 8L).map(i =>
      (Seq(i): Seq[Long]) -> i.toDouble)))
    val v = w.commit()
    val e = intercept[IllegalArgumentException] {
      ArrayOps.rollingMean(ds, "t", v, dim = 0, width = 3)
    }
    assert(e.getMessage.contains("rank"))
  }

  test("applyDiff: replica converges; payload I/O is O(changed chunks)") {
    val lake = newLake()
    lake.create("src")
    lake.create("rep")
    val src = lake.connect("src")
    val rep = lake.connect("rep")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(16, 16), Seq(4, 4), Double.NaN)))
    val w1 = src.newWriter(meta)
    w1.writeSlab("t", cells(for (i <- 0L until 16L; j <- 0L until 16L)
      yield (Seq(i, j): Seq[Long]) -> (i * 16 + j).toDouble))
    val v1 = w1.commit()
    // v2 touches exactly ONE of the 16 chunks: overwrite (0,0),(0,1),
    // delete (1,1) — all inside chunk (0,0)
    val w2 = src.newWriter(meta)
    w2.writeSlab("t", cells(Seq(
      (Seq(0L, 0L): Seq[Long]) -> 100.0,
      (Seq(0L, 1L): Seq[Long]) -> 101.0,
      (Seq(1L, 1L): Seq[Long]) -> Double.NaN)))
    val v2 = w2.commit()

    val r1 = rep.newWriter(meta)
    r1.writeSlab("t", src.readStored("t", v1))
    r1.commit()

    val before = ChunkCodec.chunksDecoded.get()
    val rv2 = ArrayOps.applyDiff(src, rep, "t", v1, v2, meta)
    val decoded = ChunkCodec.chunksDecoded.get() - before
    // diff: from+to sides of the 1 changed chunk (2 decodes); apply:
    // the replica merges its 1 touched snapshot chunk and re-reads the
    // merged tile for its zone stats. A non-incremental path would
    // decode all 16 chunks three times (48).
    assert(decoded <= 6L,
      s"applyDiff decoded $decoded chunks for a 1-chunk delta")

    // convergence: replica state == source state at v2, including the
    // delete (cell (1,1) must be fill on both sides)
    val srcState = src.readSlab("t", v2)
      .select(col("coord"), col("value").as("sv"))
    val repState = rep.readSlab("t", rv2)
      .select(col("coord"), col("value").as("rv"))
    val mismatches = srcState.join(repState, Seq("coord"), "full_outer")
      .where(!(col("sv") <=> col("rv"))).count()
    assert(mismatches == 0L)
  }

  test("chunkCoarsen answers from zone stats with ZERO decodes") {
    val lake = newLake()
    lake.create("g")
    val ds = lake.connect("g")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8, 8), Seq(4, 4), 0.0)))
    val w = ds.newWriter(meta)
    w.writeSlab("t", cells(for (i <- 0L until 8L; j <- 0L until 8L)
      yield (Seq(i, j): Seq[Long]) -> (i * 8 + j).toDouble))
    val v = w.commit()
    val before = ChunkCodec.chunksDecoded.get()
    val got = ArrayOps.chunkCoarsen(ds, "t", v, "sum")
      .select(element_at(col("coord"), 1), element_at(col("coord"), 2),
        col("value"))
      .as[(Long, Long, Double)].collect().toMap2
    assert(ChunkCodec.chunksDecoded.get() == before,
      "zone-stat coarsening must not decode any chunk")
    // Σ over tile (cx,cy) of 8i+j, i in 4cx.., j in 4cy..:
    // 16*(8*(4cx+1.5) + 4cy+1.5) = 512cx + 64cy + 216
    for (cx <- 0L until 2L; cy <- 0L until 2L)
      assert(got((cx, cy)) == 512 * cx + 64 * cy + 216)
    // min/max agree with the tile corners
    val mins = ArrayOps.chunkCoarsen(ds, "t", v, "min")
      .select(element_at(col("coord"), 1), element_at(col("coord"), 2),
        col("value")).as[(Long, Long, Double)].collect().toMap2
    assert(mins((1L, 1L)) == 8 * 4 + 4)
  }

  test("chunkCoarsen refuses ragged grids and unknown aggregates") {
    val lake = newLake()
    lake.create("g")
    val ds = lake.connect("g")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(9, 8), Seq(4, 4), 0.0)))
    val w = ds.newWriter(meta)
    w.writeSlab("t", cells(Seq((Seq(0L, 0L): Seq[Long]) -> 1.0)))
    val v = w.commit()
    assert(intercept[IllegalArgumentException] {
      ArrayOps.chunkCoarsen(ds, "t", v, "sum")
    }.getMessage.contains("complete tiles"))
    assert(intercept[IllegalArgumentException] {
      ArrayOps.chunkCoarsen(ds, "t", v, "avg")
    }.getMessage.contains("zone stats"))
  }

  test("buildPyramid commits one readable variable per level") {
    val lake = newLake()
    lake.create("g")
    val ds = lake.connect("g")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(16, 16), Seq(4, 4), Double.NaN)))
    val w = ds.newWriter(meta)
    w.writeSlab("t", cells(for (i <- 0L until 16L; j <- 0L until 16L)
      yield (Seq(i, j): Seq[Long]) -> 3.0))
    val v = w.commit()
    val lvls = ArrayOps.buildPyramid(ds, "t", v, Seq(2L, 2L), levels = 3)
    assert(lvls.map(_._1) == Seq("t", "t_l1", "t_l2", "t_l3"))
    // constant field stays constant at every level; extents halve
    val sizes = lvls.drop(1).map { case (name, lv) =>
      val rows = ds.readSlab(name, lv).where(!isnan(col("value")))
        .as[(Seq[Long], Double)].collect()
      assert(rows.forall(_._2 == 3.0), s"$name must stay 3.0")
      rows.length
    }
    assert(sizes == Seq(64, 16, 4))
    // each level is its own commit: 4 versions total
    assert(ds.versionIds().length == 4)
  }

  test("refreshPyramid touches only changed chunks and matches a full rebuild") {
    val lake = newLake()
    lake.create("g")
    val ds = lake.connect("g")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(16, 16), Seq(4, 4), Double.NaN)))
    val w = ds.newWriter(meta)
    w.writeSlab("t", cells(for (i <- 0L until 16L; j <- 0L until 16L)
      yield (Seq(i, j): Seq[Long]) -> (i * 16 + j).toDouble))
    val v1 = w.commit()
    ArrayOps.buildPyramid(ds, "t", v1, Seq(2L, 2L), levels = 2)
    val since = ds.latestVersion.get
    // touch ONE of the 16 base chunks: overwrite + a block-wide delete
    val w2 = ds.newWriter(ds.metadata(since))
    w2.writeSlab("t", cells(Seq(
      (Seq(0L, 0L): Seq[Long]) -> 777.0) ++
      (for (i <- 2L until 4L; j <- 2L until 4L)
        yield (Seq(i, j): Seq[Long]) -> Double.NaN)))
    w2.commit()
    val before = ChunkCodec.chunksDecoded.get()
    ArrayOps.refreshPyramid(ds, "t", Seq(2L, 2L), levels = 2, since)
    val decoded = ChunkCodec.chunksDecoded.get() - before
    // level 1 reads 1 changed base chunk; level 2 reads the 1 l1 chunk
    // the refresh just wrote; plus one merge/stat decode per written
    // chunk. A full rebuild decodes all 16 base + 4 l1 chunks.
    assert(decoded <= 8L,
      s"refresh decoded $decoded chunks for a 1-chunk base delta")
    val head = ds.latestVersion.get
    // equivalence: every refreshed level == a from-scratch coarsen of
    // its source at head (including the deleted block's absence)
    for ((src, dst) <- Seq("t" -> "t_l1", "t_l1" -> "t_l2")) {
      val want = ArrayOps.coarsen(ds, src, head, Seq(2L, 2L), avg)
        .select(col("coord"), col("value").as("w"))
      val got = ds.readSlab(dst, head).where(!isnan(col("value")))
        .select(col("coord"), col("value").as("g"))
      val bad = want.join(got, Seq("coord"), "full_outer")
        .where(!(col("w") <=> col("g"))).count()
      assert(bad == 0L, s"$dst diverges from recompute of $src")
    }
  }

  // deterministic sparse pattern spanning several chunks (and chunk
  // corners): live where (i*7 + j*3) % 5 < 3
  private def sparsePattern(n: Long): Map[Seq[Long], Double] =
    (for (i <- 0L until n; j <- 0L until n
          if (i * 7 + j * 3) % 5 < 3)
      yield (Seq(i, j): Seq[Long]) -> (i * n + j + 1).toDouble).toMap

  private def bruteStencilAvg(cs: Map[Seq[Long], Double],
      radius: Int): Map[Seq[Long], Double] =
    cs.map { case (c, _) =>
      val taps = for {
        di <- -radius.toLong to radius; dj <- -radius.toLong to radius
        v <- cs.get(Seq(c(0) + di, c(1) + dj))
      } yield v
      c -> taps.sum / taps.size
    }

  test("stencilAvg matches brute force on sparse data across chunk halos") {
    val lake = newLake()
    lake.create("g")
    val ds = lake.connect("g")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(12, 12), Seq(4, 4), Double.NaN)))
    val cs = sparsePattern(12)
    val w = ds.newWriter(meta)
    w.writeSlab("t", cells(cs.toSeq))
    val v = w.commit()
    for (radius <- Seq(1, 2, 4)) { // 4 == chunkDim: whole-chunk halos
      val got = ArrayOps.stencilAvg(ds, "t", v, radius)
        .select(element_at(col("coord"), 1), element_at(col("coord"), 2),
          col("value")).as[(Long, Long, Double)].collect().toMap2
      val want = bruteStencilAvg(cs, radius)
        .map { case (c, x) => (c(0), c(1)) -> x }
      assert(got == want, s"radius $radius")
    }
  }

  test("stencilAvg works at rank 3 (corner halos across 8 chunks)") {
    val lake = newLake()
    lake.create("g")
    val ds = lake.connect("g")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(4, 4, 4), Seq(2, 2, 2), Double.NaN)))
    val cs = (for (i <- 0L until 4L; j <- 0L until 4L; k <- 0L until 4L)
      yield (Seq(i, j, k): Seq[Long]) -> (i * 16 + j * 4 + k).toDouble).toMap
    val w = ds.newWriter(meta)
    w.writeSlab("t", cells(cs.toSeq))
    val v = w.commit()
    val got = ArrayOps.stencilAvg(ds, "t", v, radius = 1)
      .as[(Seq[Long], Double)].collect().toMap
    val want = cs.map { case (c, _) =>
      val taps = for {
        di <- -1L to 1; dj <- -1L to 1; dk <- -1L to 1
        x <- cs.get(Seq(c(0) + di, c(1) + dj, c(2) + dk))
      } yield x
      c -> taps.sum / taps.size
    }
    assert(got == want)
  }

  test("rank-1 stencil: halo exchange serves the case rollingMean refuses") {
    val lake = newLake()
    lake.create("l")
    val ds = lake.connect("l")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(16), Seq(4), Double.NaN)))
    val w = ds.newWriter(meta)
    w.writeSlab("t", cells((0L until 16L).map(i =>
      (Seq(i): Seq[Long]) -> (i * i).toDouble)))
    val v = w.commit()
    val got = ArrayOps.stencilAvg(ds, "t", v, radius = 1)
      .select(element_at(col("coord"), 1), col("value"))
      .as[(Long, Double)].collect().toMap
    (0L until 16L).foreach { i =>
      val taps = Seq(i - 1, i, i + 1).filter(j => j >= 0 && j < 16)
        .map(j => (j * j).toDouble)
      assert(got(i) == taps.sum / taps.size, s"cell $i")
    }
  }

  test("axisReduce: rank-1 reduces to a scalar row; refusals fire") {
    val lake = newLake()
    lake.create("l")
    val ds = lake.connect("l")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8), Seq(4), Double.NaN)))
    val w = ds.newWriter(meta)
    w.writeSlab("t", cells((0L until 8L).map(i =>
      (Seq(i): Seq[Long]) -> i.toDouble)))
    val v = w.commit()
    val rows = ArrayOps.axisReduce(ds, "t", v, dim = 0, sum).collect()
    assert(rows.length == 1)
    assert(rows.head.getSeq[Long](0).isEmpty) // scalar coord
    assert(rows.head.getDouble(1) == 28.0)
    assertThrows[IllegalArgumentException](
      ArrayOps.axisReduce(ds, "t", v, dim = 1, sum))
    assertThrows[IllegalArgumentException](
      ArrayOps.permuteAxes(ds, "t", v, Seq(0, 1), "x"))
    assertThrows[IllegalArgumentException](
      ArrayOps.concatAxis(ds, "t", "t", v, dim = 1, "x"))
  }

  test("concatAxis refuses mismatched non-concat extents") {
    val lake = newLake()
    lake.create("l")
    val ds = lake.connect("l")
    val meta = DatasetMeta(Seq(
      VariableMeta("a", "double", Seq(4, 8), Seq(4, 4), Double.NaN),
      VariableMeta("b", "double", Seq(4, 6), Seq(4, 4), Double.NaN)))
    val w = ds.newWriter(meta)
    w.writeSlab("a", cells(Seq((Seq(0L, 0L): Seq[Long]) -> 1.0)))
    w.writeSlab("b", cells(Seq((Seq(0L, 0L): Seq[Long]) -> 2.0)))
    val v = w.commit()
    assertThrows[IllegalArgumentException](
      ArrayOps.concatAxis(ds, "a", "b", v, dim = 0, "c"))
    // along the mismatched axis itself it IS legal
    val v2 = ArrayOps.concatAxis(ds, "a", "b", v, dim = 1, "c")
    assert(ds.metadata(v2).variable("c").shape == Seq(4L, 14L))
  }

  test("halo replication factor stays near 1×, never the 3^rank blowup") {
    // tiny 4×4 chunks on a 16×16 grid: per dim, 6 of 16 positions sit
    // in a band WITH a neighbor (within=0 & c>0, within=3 & c<3), so
    // Σ per-dim targets = 22 and total = 22² = 484 — 1.89× of the 256
    // cells, where a radius-1 relational self-join ships 9×
    val small = for (i <- 0L until 16L; j <- 0L until 16L)
      yield Seq(i, j): Seq[Long]
    val totalSmall = small.map(c =>
      ArrayOps.haloTargets(c, Seq(4L, 4L), Seq(4L, 4L), 1).size).sum
    assert(totalSmall == 484)
    // production-shaped 128×128 chunks (2×2 grid): Σ per-dim = 258,
    // total = 258² = 66564 — 1.016× of the 65536 cells
    val big = for (i <- 0L until 256L; j <- 0L until 256L)
      yield Seq(i, j): Seq[Long]
    val totalBig = big.map(c =>
      ArrayOps.haloTargets(c, Seq(128L, 128L), Seq(2L, 2L), 1).size).sum
    assert(totalBig == 66564)
    // every target list contains the home chunk and stays in-grid
    small.foreach { c =>
      val ts = ArrayOps.haloTargets(c, Seq(4L, 4L), Seq(4L, 4L), 1)
      assert(ts.contains(Seq(c(0) / 4, c(1) / 4)))
      assert(ts.forall(t => t.forall(x => x >= 0 && x < 4)))
    }
  }

  test("convolve skips missing taps; refuses bad radius/taps") {
    val lake = newLake()
    lake.create("g")
    val ds = lake.connect("g")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8, 8), Seq(4, 4), Double.NaN)))
    val cs = sparsePattern(8)
    val w = ds.newWriter(meta)
    w.writeSlab("t", cells(cs.toSeq))
    val v = w.commit()
    val taps = Seq(
      (Seq(0L, 0L): Seq[Long]) -> 4.0,
      (Seq(1L, 0L): Seq[Long]) -> -1.0,
      (Seq(-1L, 0L): Seq[Long]) -> -1.0,
      (Seq(0L, 1L): Seq[Long]) -> -1.0,
      (Seq(0L, -1L): Seq[Long]) -> -1.0)
    val got = ArrayOps.convolve(ds, "t", v, taps)
      .as[(Seq[Long], Double)].collect().toMap
    val want = cs.map { case (c, _) =>
      c -> taps.map { case (off, wt) =>
        cs.get(Seq(c(0) + off(0), c(1) + off(1))).fold(0.0)(_ * wt)
      }.sum
    }
    assert(got == want)
    assertThrows[IllegalArgumentException](
      ArrayOps.stencilAvg(ds, "t", v, radius = 5)) // > chunkDim
    assertThrows[IllegalArgumentException](
      ArrayOps.convolve(ds, "t", v, Seq.empty))
    assertThrows[IllegalArgumentException](
      ArrayOps.convolve(ds, "t", v, Seq((Seq(0L): Seq[Long]) -> 1.0)))
  }

  test("non-NaN fill never enters an average (coarsen/axisReduce/stencil)") {
    val lake = newLake()
    lake.create("g")
    val ds = lake.connect("g")
    // short dtype, fill 9 — the reference's fill-short shape
    // (hbase_test.clj:152-156): unwritten cells of a written chunk
    // read back as 9.0 and MUST be invisible to every aggregate
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "short", Seq(4, 4), Seq(4, 4), 9.0)))
    val w = ds.newWriter(meta)
    // block (0,0) fully live: 10,11,12,13; block (1,1) ONE live cell
    // 20; blocks (0,1)/(1,0) all-fill
    w.writeSlab("t", cells(Seq(
      (Seq(0L, 0L): Seq[Long]) -> 10.0,
      (Seq(0L, 1L): Seq[Long]) -> 11.0,
      (Seq(1L, 0L): Seq[Long]) -> 12.0,
      (Seq(1L, 1L): Seq[Long]) -> 13.0,
      (Seq(2L, 2L): Seq[Long]) -> 20.0)))
    val v = w.commit()
    val co = ArrayOps.coarsen(ds, "t", v, Seq(2L, 2L), avg)
      .select(element_at(col("coord"), 1), element_at(col("coord"), 2),
        col("value")).as[(Long, Long, Double)].collect().toMap2
    // a blanket !isnan would give block (1,1) = (20+9+9+9)/4 = 11.75
    // and emit rows for the all-fill blocks
    assert(co == Map((0L, 0L) -> 11.5, (1L, 1L) -> 20.0))
    val ar = ArrayOps.axisReduce(ds, "t", v, dim = 1, avg)
      .select(element_at(col("coord"), 1), col("value"))
      .as[(Long, Double)].collect().toMap
    assert(ar == Map(0L -> 10.5, 1L -> 12.5, 2L -> 20.0))
    // stencil averages the LIVE neighborhood only: cell (2,2)'s live
    // neighbors are itself and (1,1) — the 7 fill cells around it
    // contribute nothing (a blanket !isnan would give 107/9)
    val st = ArrayOps.stencilAvg(ds, "t", v, radius = 1)
      .select(element_at(col("coord"), 1), element_at(col("coord"), 2),
        col("value")).as[(Long, Long, Double)].collect().toMap2
    assert(st((2L, 2L)) == 16.5) // (20 + 13) / 2
    assert(st((0L, 0L)) == 11.5) // mean of the 4 live corner cells
    assert(st.keySet == Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L),
      (2L, 2L)), "stencil must emit rows for LIVE cells only")
  }

  test("integer-dtype pyramid levels widen to double — block means never truncate") {
    val lake = newLake()
    lake.create("g")
    val ds = lake.connect("g")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "short", Seq(4, 4), Seq(4, 4), 9.0)))
    val w = ds.newWriter(meta)
    w.writeSlab("t", cells(Seq(
      (Seq(0L, 0L): Seq[Long]) -> 10.0,
      (Seq(0L, 1L): Seq[Long]) -> 11.0,
      (Seq(1L, 0L): Seq[Long]) -> 12.0,
      (Seq(1L, 1L): Seq[Long]) -> 13.0,
      (Seq(2L, 2L): Seq[Long]) -> 20.0)))
    val v = w.commit()
    val lvls = ArrayOps.buildPyramid(ds, "t", v, Seq(2L, 2L), levels = 1)
    val (lname, lv) = lvls.last
    val lvm = ds.metadata(lv).variable(lname)
    assert(lvm.dtype == "double" && lvm.fillValue.isNaN,
      "integer-source levels must store as double/NaN")
    val got = ds.readSlab(lname, lv).where(!isnan(col("value")))
      .select(element_at(col("coord"), 1), element_at(col("coord"), 2),
        col("value")).as[(Long, Long, Double)].collect().toMap2
    // the fractional block mean survives exactly — a short-dtype
    // level would have silently truncated 11.5 to 11
    assert(got == Map((0L, 0L) -> 11.5, (1L, 1L) -> 20.0))
    // the smoothed materialization of the same short source widens too
    val (sname, sv) = ArrayOps.materializeStencil(ds, "t", v, radius = 1)
    val svm = ds.metadata(sv).variable(sname)
    assert(svm.dtype == "double" && svm.fillValue.isNaN)
    val sm = ds.readSlab(sname, sv).where(!isnan(col("value")))
      .select(element_at(col("coord"), 1), element_at(col("coord"), 2),
        col("value")).as[(Long, Long, Double)].collect().toMap2
    assert(sm((2L, 2L)) == 16.5)
  }

  test("materializeStencil refresh tombstones cells the new stencil no longer produces") {
    val lake = newLake()
    lake.create("g")
    val ds = lake.connect("g")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(4, 4), Seq(4, 4), Double.NaN)))
    val w = ds.newWriter(meta)
    // two live cells far apart: each smooths to itself
    w.writeSlab("t", cells(Seq(
      (Seq(0L, 0L): Seq[Long]) -> 2.0,
      (Seq(3L, 3L): Seq[Long]) -> 8.0)))
    val v1 = w.commit()
    val (name, _) = ArrayOps.materializeStencil(ds, "t", v1, radius = 1)
    def liveSm: Map[(Long, Long), Double] = {
      val head = ds.latestVersion.get
      ds.readSlab(name, head).where(!isnan(col("value")))
        .select(element_at(col("coord"), 1),
          element_at(col("coord"), 2), col("value"))
        .as[(Long, Long, Double)].collect().toMap2
    }
    assert(liveSm == Map((0L, 0L) -> 2.0, (3L, 3L) -> 8.0))
    // delete (3,3) at the source, re-materialize at the new head:
    // the stale smoothed value must be tombstoned, not left behind
    // (the delete commit carries the CURRENT metadata — t_sm1 must
    // survive it, a stale-meta commit would drop the variable)
    val w2 = ds.newWriter(ds.metadata(ds.latestVersion.get))
    w2.writeSlab("t", cells(Seq((Seq(3L, 3L): Seq[Long]) -> Double.NaN)))
    val v2 = w2.commit()
    ArrayOps.materializeStencil(ds, "t", v2, radius = 1)
    assert(liveSm == Map((0L, 0L) -> 2.0),
      "re-materialization left a stale smoothed cell behind")
    // a refresh at a STALE asOf is refused: the stencil would be
    // computed at one snapshot, the tombstone diff against another
    val ex = intercept[IllegalArgumentException] {
      ArrayOps.materializeStencil(ds, "t", v1, radius = 1)
    }
    assert(ex.getMessage.contains("latest version"))
  }

  private implicit class ToMap2(
      rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] =
      rows.map { case (a, b, v) => (a, b) -> v }.toMap
  }
}
