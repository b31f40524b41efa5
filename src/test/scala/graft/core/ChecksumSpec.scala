package graft.core

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import Model._

/** Opt-in read-path integrity (`spark.graft.verifyChecksums`): chunks
  * are content-addressed by the sha1 of their logical payload
  * (hbase_test.clj:177 hashes the same way), so re-hashing on read
  * catches silent storage corruption — bit rot, a torn pack range, a
  * bad object copy — at the first read that touches it, through both
  * the blob and the pack layout.
  */
class ChecksumSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val meta = DatasetMeta(Seq(
    VariableMeta("temp", "double", Seq(4), Seq(4), Double.NaN)))

  private def mkStore(): (GraftDataset, Long, String) = {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_cksum_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val w = ds.newWriter(meta)
    w.writeSlab("temp",
      (0L until 4L).map(i => (Seq(i), i.toDouble)).toDF("coord", "value"))
    val v = w.commit()
    (ds, v, ds.chunkHashes().head)
  }

  /** Flip a byte and drop Hadoop's local-FS `.crc` sidecar: object
    * stores have no such layer — the engine's own verification is the
    * only line of defense there, and that is what this spec gates.
    */
  private def corruptFile(f: java.io.File): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x5a).toByte
    java.nio.file.Files.write(f.toPath, bytes)
    new java.io.File(f.getParentFile, s".${f.getName}.crc").delete()
  }

  private def corruptBlob(ds: GraftDataset, hash: String): Unit =
    corruptFile(new java.io.File(
      s"${ds.path}/chunks/${hash.take(2)}/$hash.bin"))

  test("a flipped bit in a blob fails the read loudly with the conf " +
      "on; off (the default) decodes without rehashing") {
    val (ds, v, h) = mkStore()
    corruptBlob(ds, h)
    // default off: the corrupted payload decodes (garbage-in, no rehash)
    assert(ds.readSlab("temp", v).count() == 4L)
    spark.conf.set("spark.graft.verifyChecksums", "true")
    try {
      val e = intercept[org.apache.spark.SparkException] {
        ds.readSlab("temp", v).collect()
      }
      assert(e.getMessage.contains("checksum") ||
        Option(e.getCause).exists(_.getMessage.contains("checksum")))
      // the point-read protocol surface throws the same way
      intercept[Exception](ds.readChunk(h))
    } finally spark.conf.unset("spark.graft.verifyChecksums")
  }

  test("CALL verify_chunks: the distributed scrub pinpoints the " +
      "corrupt hash; a clean store reports zero") {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_cksum_").toString)
    lake.create("d")
    val ds = lake.connect("d")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(8), Seq(4), Double.NaN))))
    w.writeSlab("temp",
      (0L until 8L).map(i => (Seq(i), i * 1.5)).toDF("coord", "value"))
    w.commit()
    val cat = s"ck${System.nanoTime() % 100000}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    try {
      val clean = spark.sql(
        s"CALL $cat.system.verify_chunks(dataset => 'd')").head()
      assert(clean.getLong(1) == 2L && clean.getLong(2) == 0L, clean)

      val bad = ds.chunkHashes().head
      corruptBlob(ds, bad)
      val rows = spark.sql(
        s"CALL $cat.system.verify_chunks(dataset => 'd')").collect()
      assert(rows.length == 1 && rows.head.getLong(2) == 1L &&
        rows.head.getString(3) == bad, rows.mkString(";"))
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
    }
  }

  test("corruption inside a PACK range is caught through the ranged " +
      "read; clean packed data verifies green") {
    val (ds, v, h) = mkStore()
    assert(ds.packChunks() == 1L)
    spark.conf.set("spark.graft.verifyChecksums", "true")
    try {
      // clean pack: verification passes
      assert(ds.readSlab("temp", v).count() == 4L)
      // corrupt the packed bytes at the entry's offset
      val fs = new Path(ds.path).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val bDir = fs.listStatus(new Path(s"${ds.path}/packs"))
        .filter(_.isDirectory).head.getPath
      val pack = fs.listStatus(bDir)
        .map(_.getPath).filter(_.getName.startsWith("pack-")).head
      corruptFile(new java.io.File(pack.toUri.getPath))
      graft.core.ChunkPack.invalidateCache()
      val e = intercept[Exception](ds.readSlab("temp", v).collect())
      def mentions(t: Throwable): Boolean =
        t != null && (Option(t.getMessage).exists(_.contains("checksum"))
          || mentions(t.getCause))
      assert(mentions(e), s"expected a checksum failure, got $e")
    } finally spark.conf.unset("spark.graft.verifyChecksums")
  }
}
