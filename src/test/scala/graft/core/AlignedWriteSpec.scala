package graft.core

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Model._

/** Chunk-aligned slab writes ([[SlabWriter.writeSlabAligned]]): a
  * chunk-keyed scan feeds per-partition tile encoding with NO re-chunk
  * shuffle — read → transform → write moves zero cell data across the
  * wire. Parity with [[SlabWriter.writeSlab]] is checked cell-exact;
  * the misalignment guard and the empty-variable guard are negative
  * controls; the shuffle-records metric proves the zero-shuffle claim
  * quantitatively (only the chunk-level probe shuffles).
  */
class AlignedWriteSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val N = 4096L
  private val CHUNK = 512L

  /** Lake with variable a = id (and empty b, c, d on the same grid). */
  private def mkStore(): (GraftDataset, String) = {
    val root = Files.createTempDirectory("graft_aligned_").toString
    val lake = new GraftLake(spark, root)
    lake.create("vd")
    val ds = lake.connect("vd")
    val vars = Seq("a", "b", "c", "d").map(n =>
      VariableMeta(n, "double", Seq(N), Seq(CHUNK), Double.NaN))
    val w = ds.newWriter(DatasetMeta(vars))
    w.writeSlab("a",
      (0L until N).map(i => (Seq(i), i.toDouble)).toDF("coord", "value"))
    w.commit()
    (ds, root)
  }

  private def keyedCells(ds: GraftDataset) = {
    spark.conf.set("spark.graft.scan.keyedPartitions", "true")
    spark.read.format("graft")
      .option("path", ds.path).option("variable", "a").load()
      .select(array(col("x0")).as("coord"),
        (col("value") * 2.0 + 1.0).as("value"))
  }

  private def readBack(ds: GraftDataset, v: String): Set[(Long, Double)] =
    spark.read.format("graft")
      .option("path", ds.path).option("variable", v).load()
      .select(col("x0"), col("value"))
      .as[(Long, Double)].collect().toSet

  test("aligned write is cell-exact parity with the re-chunk write") {
    val (ds, _) = mkStore()
    try {
      val cells = keyedCells(ds)
      val w = ds.newWriter(ds.metadata(ds.latestVersion.get))
      w.writeSlabAligned("b", cells)
      w.commit()
      val w2 = ds.newWriter(ds.metadata(ds.latestVersion.get))
      w2.writeSlab("c", cells.repartition(8))
      w2.commit()
      val b = readBack(ds, "b")
      assert(b === readBack(ds, "c"))
      assert(b.size === N)
      assert(b.map(_._2).sum === (0L until N).map(_ * 2.0 + 1.0).sum)
    } finally spark.conf.unset("spark.graft.scan.keyedPartitions")
  }

  test("aligned write shuffles only chunk-level rows, never cells") {
    val (ds, _) = mkStore()
    try {
      val cells = keyedCells(ds)
      val shuffled = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) shuffled.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val w = ds.newWriter(ds.metadata(ds.latestVersion.get))
        w.writeSlabAligned("d", cells)
        w.commit()
        // listener events drain async; wait for the counter to settle
        var last = -1L
        var spins = 0
        while (shuffled.get() != last && spins < 20) {
          last = shuffled.get(); Thread.sleep(250); spins += 1
        }
        // the misalignment probe and commit bookkeeping shuffle
        // chunk-level rows (8 chunks here); cell data (4096 rows)
        // must never hit a shuffle. Bound generously below the cell
        // count: a re-chunk write would shuffle all 4096.
        assert(shuffled.get() < N / 2,
          s"aligned write shuffled ${shuffled.get()} records — cell " +
            "data crossed the wire")
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally spark.conf.unset("spark.graft.scan.keyedPartitions")
  }

  test("misaligned input is refused before commit; the writer aborts cleanly") {
    val (ds, _) = mkStore()
    try {
      val cells = keyedCells(ds)
      val v0 = ds.latestVersion.get
      val w = ds.newWriter(ds.metadata(v0))
      val e = intercept[IllegalArgumentException] {
        w.writeSlabAligned("b", cells.repartition(4))
      }
      assert(e.getMessage.contains("not chunk-aligned"))
      w.abort()
      assert(ds.latestVersion.get === v0, "no version must have committed")
      // the same variable still writes fine through the re-chunk path
      val w2 = ds.newWriter(ds.metadata(v0))
      w2.writeSlab("b", cells.repartition(4))
      w2.commit()
      assert(readBack(ds, "b").size === N)
    } finally spark.conf.unset("spark.graft.scan.keyedPartitions")
  }

  test("aligned write refuses a variable with committed chunks") {
    val (ds, _) = mkStore()
    try {
      val cells = keyedCells(ds)
      val w = ds.newWriter(ds.metadata(ds.latestVersion.get))
      val e = intercept[IllegalArgumentException] {
        w.writeSlabAligned("a", cells)
      }
      assert(e.getMessage.contains("empty variable"))
      w.abort()
    } finally spark.conf.unset("spark.graft.scan.keyedPartitions")
  }
}
