package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The native DSv2 streaming sink: writeStream.toTable commits each
  * micro-batch as one store version with the exactly-once epoch
  * watermark — no foreachBatch plumbing, rows are plain
  * (x0.., value) cells.
  */
class StreamingWriteSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val root = Files.createTempDirectory("graft_sw_").toString
  spark.conf.set("spark.sql.catalog.gsw", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gsw.root", root)
  spark.sql("CREATE NAMESPACE gsw.s")

  private def ds = new graft.core.GraftLake(spark, root).connect("s")

  test("writeStream.toTable: one version per micro-batch, exactly-once totals") {
    spark.sql("CREATE TABLE gsw.s.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='64', chunkDims='8')")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Long]
    val ckpt = Files.createTempDirectory("graft_sw_ckpt_").toString
    val q = ms.toDF()
      .select(col("value").as("x0"),
        (col("value") * 2).cast("double").as("value"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .toTable("gsw.s.t")
    try {
      val v0 = ds.versionIds().length
      ms.addData(0L to 9L: _*)
      q.processAllAvailable()
      assert(ds.versionIds().length == v0 + 1,
        "one micro-batch must commit exactly one version")
      ms.addData(10L to 19L: _*)
      q.processAllAvailable()
      assert(ds.versionIds().length == v0 + 2)
      val got = spark.sql("SELECT x0, value FROM gsw.s.t " +
        "WHERE NOT isnan(value)").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == (0L to 19L).map(i => i -> (i * 2).toDouble).toMap)
    } finally q.stop()
    // nothing left in the per-query staging area
    val staging = new java.io.File(s"$root/s/staging")
    val leftover = if (staging.exists())
      staging.listFiles().filter(_.getName.startsWith("stream-")).toSeq
      else Seq.empty
    assert(leftover.isEmpty, s"staging residue: $leftover")
  }

  test("restart replays do not duplicate data or versions") {
    spark.sql("CREATE TABLE gsw.s.r (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='64', chunkDims='8')")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ckpt = Files.createTempDirectory("graft_sw_ckpt2_").toString

    val ms1 = MemoryStream[Long]
    val q1 = ms1.toDF()
      .select(col("value").as("x0"), col("value").cast("double").as("value"))
      .writeStream.option("checkpointLocation", ckpt).toTable("gsw.s.r")
    ms1.addData(0L to 4L: _*)
    q1.processAllAvailable()
    val queryId = q1.id.toString
    q1.stop()
    val versionsAfterFirst = ds.versionIds().length

    // 1) the crash-window replay: Spark re-runs a committed epoch after
    // a failure between store commit and checkpoint commit. Drive the
    // sink's commit(epoch=0) directly with a freshly staged cell file —
    // the per-query watermark (keyed by the checkpoint-stable query id)
    // must skip the duplicate store commit.
    val v = ds.metadata(ds.latestVersion.get).variable("r")
    val staged = new java.io.File(
      s"$root/s/staging/stream-$queryId/epoch-0/replay.bin")
    staged.getParentFile.mkdirs()
    val out = new java.io.DataOutputStream(
      new java.io.FileOutputStream(staged))
    out.writeLong(0L); out.writeDouble(999.0); out.writeByte(1)
    out.close()
    val sw = new GraftStreamingWrite(s"$root/s", "r", v,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x0",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType))), queryId)
    sw.commit(0L, Array(GraftDeltaFileMessage(staged.toString, 1L)))
    assert(ds.versionIds().length == versionsAfterFirst,
      "replayed epoch must not commit a new version")
    assert(spark.sql("SELECT value FROM gsw.s.r WHERE x0 = 0")
      .head().getDouble(0) == 0.0, "replayed epoch must not mutate cells")

    // 2) restart continuation: a new query on the same checkpoint
    // resumes from the committed offset (block 0 = the already-served
    // 0..4 a replayable source re-offers, block 1 = fresh 5..9)
    val ms2 = MemoryStream[Long]
    ms2.addData(0L to 4L: _*)
    val q2 = ms2.toDF()
      .select(col("value").as("x0"), col("value").cast("double").as("value"))
      .writeStream.option("checkpointLocation", ckpt).toTable("gsw.s.r")
    ms2.addData(5L to 9L: _*)
    q2.processAllAvailable()
    assert(q2.id.toString == queryId,
      "query id must be checkpoint-stable for the watermark to hold")
    q2.stop()

    val got = spark.sql("SELECT count(*) FROM gsw.s.r " +
      "WHERE NOT isnan(value)").head().getLong(0)
    // epoch 0 skipped on restart, epoch 1 committed once — cells 0..9
    // total, each exactly once, exactly one new version
    assert(got == 10, s"expected 10 live cells, got $got")
    assert(ds.versionIds().length == versionsAfterFirst + 1)
  }
}
