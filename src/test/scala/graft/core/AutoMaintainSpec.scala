package graft.core

import org.apache.spark.sql.functions.{col, isnan}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Model._

/** Threshold-triggered self-maintenance on the BATCH commit path: a
  * long run of plain writer commits keeps hot-dir counts bounded with
  * no manual `CALL g.system.*` — the batch analog of the streaming
  * sink's compactEvery/packEvery.
  */
class AutoMaintainSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  test("200 batch commits self-compact and self-pack: hot dirs stay bounded") {
    spark.conf.set("spark.graft.autoMaintain.hotIndexThreshold", "16")
    spark.conf.set("spark.graft.autoMaintain.packEvery", "32")
    spark.conf.set("spark.graft.autoMaintain.gcGraceMs", "0")
    try {
      val lake = new GraftLake(spark,
        graft.TempDirs.create("graft_automnt_").toString)
      lake.create("am")
      val ds = lake.connect("am")
      val meta = DatasetMeta(Seq(
        VariableMeta("t", "double", Seq(64L), Seq(4L), Double.NaN)))
      val hfs = new org.apache.hadoop.fs.Path(ds.path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def hotIdx: Int =
        hfs.listStatus(new org.apache.hadoop.fs.Path(s"${ds.path}/indices"))
          .count(_.getPath.getName.startsWith("versionId="))
      def blobs: Int =
        hfs.listStatus(new org.apache.hadoop.fs.Path(s"${ds.path}/chunks"))
          .filter(_.isDirectory)
          .flatMap(d => hfs.listStatus(d.getPath))
          .count(_.getPath.getName.endsWith(".bin"))

      var maxHot = 0
      (1 to 200).foreach { i =>
        val w = ds.newWriter(meta)
        w.writeSlab("t", Seq((Seq((i % 64).toLong), i.toDouble))
          .toDF("coord", "value"))
        w.commit()
        maxHot = math.max(maxHot, hotIdx)
      }
      // the hot index dir never outgrows threshold + the commits that
      // landed before the fold kicked in
      assert(maxHot <= 24,
        s"hot index partitions peaked at $maxHot with threshold 16")
      assert(hotIdx <= 24, s"$hotIdx hot partitions left after 200 commits")
      // packing kept loose blobs bounded too (32-commit cadence)
      assert(blobs <= 48, s"$blobs loose blobs after 200 commits")

      // correctness untouched: HEAD reads every last-written cell
      val got = ds.readSlab("t", ds.latestVersion.get)
        .where(!isnan(col("value")))
        .as[(Seq[Long], Double)].collect().toMap
      val expect = (1 to 200).map(i => Seq((i % 64).toLong) -> i.toDouble)
        .toMap
      assert(got == expect)
      // and time travel through folded history still resolves
      val mid = ds.versionIds().sorted.apply(100)
      assert(ds.readSlab("t", mid).where(!isnan(col("value")))
        .count() > 0)
    } finally {
      spark.conf.unset("spark.graft.autoMaintain.hotIndexThreshold")
      spark.conf.unset("spark.graft.autoMaintain.packEvery")
      spark.conf.unset("spark.graft.autoMaintain.gcGraceMs")
    }
  }
}
