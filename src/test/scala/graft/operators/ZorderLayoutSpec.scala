package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BitFunctions

/** Z-order layout: the native InterleaveBits expression (interpreted
  * == codegen == closed-form SQL replay) and the physical claim that
  * matters at 100 TB — after zorderLayout, every partition's bounding
  * box is tight in EVERY clustered dimension, so a slab predicate on
  * the non-leading dimension prunes most files, where a row-major
  * (lexicographic) layout must touch all of them.
  */
class ZorderLayoutSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  test("InterleaveBits: known values, interpreted == codegen == SQL") {
    // [0b101, 0b011] @ 3 bits: bit i of value j -> result bit i*2+j
    // i=0: v0->bit0 (1), v1->bit1 (2); i=1: v0->bit2 (0), v1->bit3 (8);
    // i=2: v0->bit4 (16), v1->bit5 (0)  => 1+2+8+16 = 27
    val df = Seq((5L, 3L)).toDF("a", "b")
    val viaExpr = df.select(BitFunctions.interleaveBits(
      array(col("a"), col("b")), 3).as("z")).head().getLong(0)
    assert(viaExpr == 27L)
    BitFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT interleave_bits(array(5L, 3L), 3) AS z").head().getLong(0)
    assert(viaSql == 27L)
    val viaClosedForm = df.selectExpr(
      BitFunctions.interleaveSql(Seq("a", "b"), 3) + " AS z")
      .head().getLong(0)
    assert(viaClosedForm == 27L)
  }

  test("InterleaveBits: random cross-check vs reference bit loop") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(500)(
      (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong,
        rnd.nextInt(256).toLong))
    def ref(vs: Seq[Long], bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits; j <- vs.indices)
        z |= ((vs(j) >>> i) & 1L) << (i * vs.length + j)
      z
    }
    val got = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"), BitFunctions.interleaveBits(
        array(col("a"), col("b"), col("c")), 8).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) ==
        ref(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 8))
    }
    // 3 dims x 8 bits stays a total order on the 24-bit cube corners
    assert(got.map(_.getLong(3)).distinct.length ==
      rows.map(t => ref(Seq(t._1, t._2, t._3), 8)).distinct.length)
  }

  test("dimension/bit overflow refuses loudly") {
    val e = intercept[Exception] {
      Seq((1L, 1L)).toDF("a", "b").select(BitFunctions.interleaveBits(
        array(col("a"), col("b")), 32)).collect()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(_.contains("63"))))
  }

  test("zorderLayout: partition bounding boxes are tight in BOTH dims") {
    // a full 128x128 grid, 16 output partitions
    val grid = spark.range(128L * 128L)
      .select((col("id") / 128).cast("long").as("x"),
        (col("id") % 128).as("y"), col("id"))
    def partitionBoxes(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // row-major: range-partition on the lexicographic (x, y) key —
    // each partition spans the FULL y range
    val rowMajor = partitionBoxes(
      grid.repartitionByRange(16, col("x"), col("y")))
    // z-order: each partition is a contiguous morton range ≈ a block
    val zed = partitionBoxes(LayoutOps.zorderLayout(
      grid, Seq(col("x"), col("y")), 7, 16, col("id")))
    def hits(boxes: Seq[(Long, Long, Long, Long)],
        qx: (Long, Long), qy: (Long, Long)): Int =
      boxes.count { case (x0, x1, y0, y1) =>
        x1 >= qx._1 && x0 < qx._2 && y1 >= qy._1 && y0 < qy._2 }
    // a y-slab query (all x, y < 16): row-major layout cannot prune
    // at all; the z-order layout prunes most partitions
    val rmHits = hits(rowMajor.toSeq, (0L, 128L), (0L, 16L))
    val zHits = hits(zed.toSeq, (0L, 128L), (0L, 16L))
    assert(rmHits >= 14, s"row-major must span y everywhere, hit $rmHits")
    assert(zHits <= 10, s"z-order must prune the y-slab, hit $zHits")
    assert(zHits < rmHits)
    // and the leading-dim slab still prunes fine under z-order
    assert(hits(zed.toSeq, (0L, 16L), (0L, 128L)) <= 10)
    // nothing lost in the layout pass
    assert(LayoutOps.zorderLayout(grid, Seq(col("x"), col("y")), 7, 16,
      col("id")).count() == 128L * 128L)
  }
}
