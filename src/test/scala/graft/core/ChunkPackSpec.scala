package graft.core

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import Model._

/** The pack store ([[ChunkPack]]): folding per-chunk blob files into
  * bucketed immutable packs must be invisible to every read/write path
  * — slab reads, time travel, the overwrite merge, gc accounting —
  * while actually deleting the small files and reclaiming dead bytes
  * on refold. The reference never needs this layer (HBase compacts
  * HFiles under it, hbase.clj:21-23); at object-store scale it is the
  * difference between 10^9 small objects and 10^5 packs.
  */
class ChunkPackSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private def freshLake(): GraftLake =
    new GraftLake(spark,
      Files.createTempDirectory("graft_pack_").toString)

  private def cellsDF(cells: Map[Seq[Long], Double]): DataFrame =
    cells.toSeq.map { case (c, v) => (c, v) }.toDF("coord", "value")

  private def readMap(df: DataFrame): Map[Seq[Long], Double] =
    df.as[(Seq[Long], Double)].collect().toMap

  private val meta2x2 = DatasetMeta(Seq(
    VariableMeta("temp", "double", Seq(4, 4), Seq(2, 2), Double.NaN)))

  private def writeVersion(ds: GraftDataset, meta: DatasetMeta,
      variable: String, cells: Map[Seq[Long], Double]): Long = {
    val w = ds.newWriter(meta)
    w.writeSlab(variable, cellsDF(cells))
    w.commit()
  }

  private def fsOf(ds: GraftDataset) =
    new Path(ds.path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def blobCount(ds: GraftDataset): Long = {
    val fs = fsOf(ds)
    val cd = new Path(s"${ds.path}/chunks")
    if (!fs.exists(cd)) 0L
    else fs.listStatus(cd).filter(_.isDirectory).map(d =>
      fs.listStatus(d.getPath)
        .count(_.getPath.getName.endsWith(".bin")).toLong).sum
  }

  private def packFiles(ds: GraftDataset): Seq[Path] = {
    val fs = fsOf(ds)
    val pr = new Path(s"${ds.path}/packs")
    if (!fs.exists(pr)) Seq.empty
    else fs.listStatus(pr).filter(_.isDirectory).toSeq.flatMap(b =>
      fs.listStatus(b.getPath).map(_.getPath)
        .filter(_.getName.startsWith("pack-")))
  }

  private def packBytes(ds: GraftDataset): Long = {
    val fs = fsOf(ds)
    packFiles(ds).map(p => fs.getFileStatus(p).getLen).sum
  }

  test("pack round-trip: reads, time travel and point reads survive " +
      "an all-blobs fold; per-chunk files are gone") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val cells = (for (i <- 0L until 4L; j <- 0L until 4L)
      yield (Seq(i, j): Seq[Long]) -> (i * 4 + j).toDouble).toMap
    val v1 = writeVersion(ds, meta2x2, "temp", cells)
    val v2 = writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 0L) -> 99.0))
    val before1 = readMap(ds.readSlab("temp", v1))
    val before2 = readMap(ds.readSlab("temp", v2))
    val nChunks = ds.chunkCount()
    val someHash = ds.chunkHashes().head

    assert(blobCount(ds) == nChunks)
    assert(ds.packChunks() == nChunks)
    assert(blobCount(ds) == 0L)
    assert(packFiles(ds).nonEmpty)

    assert(readMap(ds.readSlab("temp", v1)) == before1)
    assert(readMap(ds.readSlab("temp", v2)) == before2)
    // point read through the pack fallback
    assert(ds.readChunk(someHash).nonEmpty)
    // manifest accounting unchanged by packing
    assert(ds.chunkCount() == nChunks)
    // unknown hashes still throw the protocol error
    intercept[IllegalArgumentException](ds.readChunk("feedfacedead"))
  }

  test("overwrite through the packed store: merge ranged-reads packed " +
      "tiles; second fold packs only the new blobs") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val cells = (for (i <- 0L until 4L; j <- 0L until 4L)
      yield (Seq(i, j): Seq[Long]) -> (i * 4 + j).toDouble).toMap
    writeVersion(ds, meta2x2, "temp", cells)
    assert(ds.packChunks() == 4L)

    // partial-tile overwrite: the merge must read tile (1,1) from the pack
    val v2 = writeVersion(ds, meta2x2, "temp", Map(Seq(3L, 3L) -> 77.0))
    val got = readMap(ds.readSlab("temp", v2))
    assert(got(Seq(3L, 3L)) == 77.0)
    assert(got(Seq(2L, 2L)) == 10.0) // old cell of the merged tile
    assert(got(Seq(0L, 0L)) == 0.0)  // untouched packed tile

    // only the freshly-written merged tile is a blob; fold it too
    assert(blobCount(ds) == 1L)
    assert(ds.packChunks() == 1L)
    assert(blobCount(ds) == 0L)
    assert(readMap(ds.readSlab("temp", v2)) == got)
  }

  test("re-put of a packed hash is deduped on the next fold") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val cells = Map((Seq(0L, 0L): Seq[Long]) -> 1.0)
    writeVersion(ds, meta2x2, "temp", cells)
    assert(ds.packChunks() == 1L)
    // identical content in a new version -> same hash re-put as a blob
    writeVersion(ds, meta2x2, "temp", cells)
    assert(blobCount(ds) == 1L)
    // nothing NEW to pack; the duplicate blob is dropped, reads green
    assert(ds.packChunks() == 0L)
    assert(blobCount(ds) == 0L)
    assert(ds.chunkCount() == 1L)
    assert(readMap(ds.readSlab("temp", ds.versionIds().head))
      .apply(Seq(0L, 0L)) == 1.0)
  }

  test("dead packed bytes are reclaimed: gc prunes the manifest, the " +
      "next fold rewrites low-live packs smaller") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val big = (for (i <- 0L until 4L; j <- 0L until 4L)
      yield (Seq(i, j): Seq[Long]) -> (i * 4 + j).toDouble).toMap
    val v1 = writeVersion(ds, meta2x2, "temp", big)
    // full overwrite -> v1's four tiles become garbage once expired
    val v2 = writeVersion(ds, meta2x2, "temp",
      big.map { case (c, v) => c -> (v + 100.0) })
    assert(ds.packChunks() == 8L)
    val bytesBefore = packBytes(ds)

    assert(ds.expireVersions(keepLast = 1) == Seq(v1))
    assert(ds.gc(graceMs = 0L) == 4L) // 4 dead packed hashes leave the manifest
    assert(ds.chunkCount() == 4L)
    // refold (0.6: a 1-dead/1-live bucket is exactly 0.5 live —
    // equal-size tiles — and must still rewrite), then grace-sweep the
    // superseded generations and the fully-dead orphaned packs
    ds.packChunks(rewriteLiveFrac = 0.6)
    Thread.sleep(5)
    ds.gc(graceMs = 1L)
    val bytesAfter = packBytes(ds)
    assert(bytesAfter < bytesBefore,
      s"refold+sweep must shrink pack bytes ($bytesBefore -> $bytesAfter)")
    assert(packFiles(ds).nonEmpty)
    assert(readMap(ds.readSlab("temp", v2)) == big.map {
      case (c, v) => c -> (v + 100.0)
    })
  }

  test("pack folds racing a committing writer: every version stays " +
      "exact, deduped blobs resolve through the pack") {
    val lake = freshLake(); lake.create("d")
    val dsA = lake.connect("d") // writer handle
    val dsB = lake.connect("d") // packer handle
    val n = 8
    @volatile var writerDone = false
    @volatile var packs = 0L
    val packer = new Thread(() => {
      while (!writerDone) {
        packs += dsB.packChunks()
        Thread.sleep(5)
      }
      packs += dsB.packChunks() // final fold
    })
    packer.start()
    val versions = (0 until n).map { i =>
      val w = dsA.newWriter(meta2x2)
      // half the writes repeat earlier content: the re-put dedups
      // against a blob the packer may have just folded away — the
      // commit-time existence check must then resolve via the pack
      val cells =
        if (i % 2 == 0) Map((Seq(0L, 0L): Seq[Long]) -> 42.0)
        else Map((Seq(i.toLong % 4, i.toLong % 4): Seq[Long]) -> i.toDouble)
      w.writeSlab("temp", cellsDF(cells))
      w.commit()
    }
    writerDone = true
    packer.join(60000)
    assert(!packer.isAlive)
    assert(packs >= 1, "at least one fold must have landed")
    // every retained version reads exactly, through blobs or packs
    versions.zipWithIndex.foreach { case (v, i) =>
      val got = readMap(dsA.readSlab("temp", v))
      if (i % 2 == 0) assert(got(Seq(0L, 0L)) == 42.0, s"v$i")
      else assert(got(Seq(i.toLong % 4, i.toLong % 4)) == i.toDouble, s"v$i")
    }
  }

  test("sub-sharded buckets: prefixLen=3 shards blob dirs 16-ways, is " +
      "pinned across folds, and every read path still resolves") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val cells = (for (i <- 0L until 4L; j <- 0L until 4L)
      yield (Seq(i, j): Seq[Long]) -> (i * 4 + j).toDouble).toMap
    val v1 = writeVersion(ds, meta2x2, "temp", cells)
    val before = readMap(ds.readSlab("temp", v1))
    val someHash = ds.chunkHashes().head
    spark.conf.set("spark.graft.pack.prefixLen", "3")
    try {
      assert(ds.packChunks() == 4L)
      val fs = fsOf(ds)
      val bucketNames = fs.listStatus(new Path(s"${ds.path}/packs"))
        .filter(_.isDirectory).map(_.getPath.getName.stripPrefix("b="))
      assert(bucketNames.nonEmpty && bucketNames.forall(_.length == 3),
        s"expected 3-hex bucket dirs, got ${bucketNames.mkString(",")}")
      assert(blobCount(ds) == 0L)
      assert(readMap(ds.readSlab("temp", v1)) == before)
      assert(ds.readChunk(someHash).nonEmpty)

      // the pinned length wins over a changed conf on later folds
      spark.conf.set("spark.graft.pack.prefixLen", "2")
      val v2 = writeVersion(ds, meta2x2, "temp", Map(Seq(3L, 3L) -> 7.5))
      assert(ds.packChunks() == 1L)
      val after = fs.listStatus(new Path(s"${ds.path}/packs"))
        .filter(_.isDirectory).map(_.getPath.getName.stripPrefix("b="))
      assert(after.forall(_.length == 3),
        s"prefixLen must stay pinned at 3, got ${after.mkString(",")}")
      assert(readMap(ds.readSlab("temp", v2)).apply(Seq(3L, 3L)) == 7.5)

      // gc's bucket sweep handles sub-sharded dirs
      Thread.sleep(5)
      ds.gc(graceMs = 1L)
      assert(readMap(ds.readSlab("temp", v2)).apply(Seq(2L, 2L)) == 10.0)
    } finally spark.conf.unset("spark.graft.pack.prefixLen")
  }

  test("SQL surface: CALL pack_chunks + DSv2 reads through the pack") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val cells = (for (i <- 0L until 4L; j <- 0L until 4L)
      yield (Seq(i, j): Seq[Long]) -> (i * 4 + j).toDouble).toMap
    writeVersion(ds, meta2x2, "temp", cells)
    val cat = s"pk${System.nanoTime() % 100000}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    try {
      val packed = spark.sql(
        s"CALL $cat.system.pack_chunks(dataset => 'd')")
        .head().getLong(1)
      assert(packed == 4L)
      val sum = spark.sql(
        s"SELECT sum(value) AS s FROM $cat.d.temp")
        .head().getDouble(0)
      assert(sum == cells.values.sum)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
    }
  }
}
