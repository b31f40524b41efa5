package graft.core

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{array, col, sum}
import org.scalatest.funsuite.AnyFunSuite

import Model._

/** Gates for the round-2 scale work: the commit-time chunk manifest
  * (no driver-side blob enumeration on the data plane), distributed
  * gc at a 10k-chunk store, commit-time metadata merging, stats(),
  * and genuine cross-process commit-lock exclusion (the engine analog
  * of the reference's disabled lots-of-processes tests,
  * hbase_test.clj:134-138).
  */
class ManifestAndLockSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private def freshLake(): GraftLake =
    new GraftLake(spark, Files.createTempDirectory("graft_mfl_").toString)

  private def cellsDF(cells: Seq[(Seq[Long], Double)]): DataFrame =
    cells.toDF("coord", "value")

  private val meta2x2 = DatasetMeta(Seq(
    VariableMeta("temp", "double", Seq(4, 4), Seq(2, 2), Double.NaN)))

  private def writeVersion(ds: GraftDataset, meta: DatasetMeta,
      variable: String, cells: Map[Seq[Long], Double]): Long = {
    val w = ds.newWriter(meta)
    w.writeSlab(variable, cellsDF(cells.toSeq))
    w.commit()
  }

  private def readMap(df: DataFrame): Map[Seq[Long], Double] =
    df.as[(Seq[Long], Double)].collect().toMap

  /** Test-only recursive blob listing — the thing the data plane must
    * never do; here it is the independent witness that the manifest is
    * complete and exact.
    */
  private def listBlobHashes(dsPath: String): Set[String] = {
    val fs = new Path(dsPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(s"$dsPath/chunks")
    if (!fs.exists(p)) Set.empty
    else {
      val it = fs.listFiles(p, true)
      val out = scala.collection.mutable.Set.empty[String]
      while (it.hasNext) {
        val name = it.next().getPath.getName
        if (name.endsWith(".bin")) out += name.stripSuffix(".bin")
      }
      out.toSet
    }
  }

  test("manifest is a complete, exact inventory across commit and abort") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val w1 = ds.newWriter(meta2x2)
    w1.writeSlab("temp", cellsDF(Seq(
      (Seq(0L, 0L), 1.0), (Seq(2L, 2L), 2.0))))
    w1.commit()
    val orphan = ds.newWriter(meta2x2)
    orphan.writeSlab("temp", cellsDF(Seq((Seq(0L, 2L), 3.0))))
    orphan.abort()
    val manifest = ds.manifestDF.as[(String, Long)].collect().toMap
    assert(manifest.keySet == listBlobHashes(ds.path))
    // sizes are real byte counts (2x2 double tile = 32 bytes)
    assert(manifest.values.forall(_ == 32L))
    assert(ds.chunkCount() == 3)
  }

  test("failed commit leaves no invisible orphans (manifest records them)") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val w1 = ds.newWriter(meta2x2)
    val w2 = ds.newWriter(meta2x2)
    w1.writeSlab("temp", cellsDF(Seq((Seq(0L, 0L), 1.0))))
    w2.writeSlab("temp", cellsDF(Seq((Seq(0L, 1L), 9.0)))) // same chunk
    w1.commit()
    intercept[CommitConflictException] { w2.commit() }
    // loser's blob is on disk, recorded, unreferenced -> collectable
    assert(ds.manifestDF.count() == 2)
    assert(listBlobHashes(ds.path).size == 2)
    assert(ds.gc(graceMs = 0L) == 1)
    assert(ds.manifestDF.as[(String, Long)].collect().map(_._1).toSet ==
      listBlobHashes(ds.path))
  }

  test("gc at a 10k-chunk store is distributed and exact") {
    val lake = freshLake(); lake.create("big"); val ds = lake.connect("big")
    val n = 10000L
    val meta = DatasetMeta(Seq(
      VariableMeta("payload", "double", Seq(n), Seq(1), Double.NaN)))
    val live = ds.newWriter(meta)
    live.writeSlab("payload", spark.range(n)
      .select(array(col("id")).as("coord"),
        col("id").cast("double").as("value")))
    live.commit()
    val orphan = ds.newWriter(meta)
    orphan.writeSlab("payload", spark.range(n)
      .select(array(col("id")).as("coord"),
        (col("id") + 1000000).cast("double").as("value")))
    orphan.abort()
    assert(ds.chunkCount() == 2 * n)
    assert(ds.gc(graceMs = 0L) == n)
    assert(ds.chunkCount() == n)
    assert(ds.manifestDF.as[(String, Long)].collect().map(_._1).toSet ==
      listBlobHashes(ds.path))
    // live data intact
    assert(ds.readSlab("payload", ds.latestVersion.get).count() == n)
  }

  test("concurrent metadata changes on disjoint variables both survive") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    def m(vars: VariableMeta*) = DatasetMeta(vars.toSeq)
    val a0 = VariableMeta("a", "double", Seq(4), Seq(2), Double.NaN)
    val b0 = VariableMeta("b", "double", Seq(4), Seq(2), Double.NaN)
    val w0 = ds.newWriter(m(a0, b0))
    w0.writeSlab("a", cellsDF(Seq((Seq(0L), 1.0))))
    w0.writeSlab("b", cellsDF(Seq((Seq(0L), 2.0))))
    val v0 = w0.commit()
    // writer A grows `a`; writer B (same snapshot) grows `b`
    val aGrown = a0.copy(shape = Seq(8))
    val bGrown = b0.copy(shape = Seq(10))
    val wa = ds.newWriter(m(aGrown, b0))
    val wb = ds.newWriter(m(a0, bGrown))
    wa.writeSlab("a", cellsDF(Seq((Seq(7L), 7.0))))
    wb.writeSlab("b", cellsDF(Seq((Seq(9L), 9.0))))
    wa.commit()
    val vb = wb.commit()
    // HEAD metadata carries BOTH changes (no silent revert)
    val head = ds.metadata(vb)
    assert(head.variable("a").shape == Seq(8L))
    assert(head.variable("b").shape == Seq(10L))
    assert(ds.readSlab("a", vb).count() == 8)
    assert(ds.readSlab("b", vb).count() == 10)
    // same-variable divergent metadata IS a conflict
    val wc = ds.newWriter(m(aGrown.copy(shape = Seq(12)), bGrown))
    val wd = ds.newWriter(m(aGrown.copy(shape = Seq(16)), bGrown))
    wc.writeSlab("a", cellsDF(Seq((Seq(11L), 1.0))))
    wd.writeSlab("a", cellsDF(Seq((Seq(15L), 1.0))))
    wc.commit()
    intercept[CommitConflictException] { wd.commit() }
    assert(ds.metadata(ds.latestVersion.get).variable("a").shape == Seq(12L))
  }

  test("stats() reports versions/chunks/bytes/index/refs off the manifest") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val w1 = ds.newWriter(meta2x2)
    w1.writeSlab("temp", cellsDF(
      (for (i <- 0L until 4L; j <- 0L until 4L)
        yield (Seq(i, j): Seq[Long]) -> (i * 4 + j).toDouble).toSeq))
    w1.commit()
    val w2 = ds.newWriter(meta2x2)
    w2.writeSlab("temp", cellsDF(Seq((Seq(0L, 0L), -1.0))))
    w2.commit()
    val row = ds.stats().as[(Long, Long, Long, Long, Long)].head()
    // 2 versions; 4 distinct v1 tiles + 1 overwritten tile = 5 chunks
    // of 32 B each; 5 index entries; 5 refs
    assert(row == ((2L, 5L, 160L, 5L, 5L)))
  }

  test("retention: expireVersions compacts history, gc reclaims, reads stay exact") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    // v1: full 4x4 grid; v2: overwrite chunk (0,0); v3: overwrite (1,1)
    val all = (for (i <- 0L until 4L; j <- 0L until 4L)
      yield (Seq(i, j): Seq[Long]) -> (i * 4 + j).toDouble).toMap
    val v1 = writeVersion(ds, meta2x2, "temp", all)
    val v2 = writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 0L) -> 100.0))
    val v3 = writeVersion(ds, meta2x2, "temp", Map(Seq(2L, 2L) -> 200.0))
    val headBefore = readMap(ds.readSlab("temp", v3))

    assert(ds.expireVersions(keepLast = 2) == Seq(v1))
    // v1 is gone as a readable point-in-time...
    intercept[IllegalArgumentException] { ds.readSlab("temp", v1) }
    assert(ds.versionIds() == Seq(v3, v2))
    // ...but HEAD and v2 still read EXACTLY as before (v1's surviving
    // cells were compacted into v2's partition)
    assert(readMap(ds.readSlab("temp", v3)) == headBefore)
    assert(readMap(ds.readSlab("temp", v2))(Seq(0L, 0L)) == 100.0)
    assert(readMap(ds.readSlab("temp", v2))(Seq(3L, 3L)) == 15.0)
    // v1's overwritten chunk (0,0 tile) is now unreferenced -> gc'd
    assert(ds.gc(graceMs = 0L) == 1)
    assert(readMap(ds.readSlab("temp", v3)) == headBefore) // still intact
    // ref accounting nets out to the live reference count
    val refTotal = ds.refCounts.agg(sum("refCount")).as[Long].head()
    assert(refTotal == ds.indicesDF.count())
  }

  test("retention preserves decode metadata across shape growth") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    def m(n: Long) = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(n), Seq(4), Double.NaN)))
    // v1 at shape 6 (edge tile clipped to 2 cells), grow to 10 in v2,
    // touch only the new tail in v3
    val w1 = ds.newWriter(m(6))
    w1.writeSlab("t", cellsDF((0L until 6L).map(i =>
      (Seq(i): Seq[Long]) -> i.toDouble).toMap.toSeq))
    w1.commit()
    val w2 = ds.newWriter(m(10))
    w2.writeSlab("t", cellsDF(Seq((Seq(9L), 9.0))))
    val v2 = w2.commit()
    val w3 = ds.newWriter(m(10))
    w3.writeSlab("t", cellsDF(Seq((Seq(8L), 8.0))))
    val v3 = w3.commit()
    val before = readMap(ds.readSlab("t", v3))
    assert(ds.expireVersions(keepLast = 2).length == 1)
    // v1's clipped edge tile (cells 4,5) must still decode under v1's
    // shape-6 metadata even though v1 itself is expired
    val after = readMap(ds.readSlab("t", v3))
    assert(after.keySet == before.keySet)
    assert(before.forall { case (k, v) =>
      val w = after(k); v == w || (v.isNaN && w.isNaN)
    })
    assert(after(Seq(4L)) == 4.0 && after(Seq(5L)) == 5.0)
    assert(after(Seq(6L)).isNaN && after(Seq(9L)) == 9.0)
  }

  test("gzip chunk codec: transparent round-trip, smaller blobs, cross-codec dedup") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val n = 8000L
    val meta = DatasetMeta(Seq(VariableMeta("payload", "double",
      Seq(n), Seq(n), Double.NaN)))
    spark.conf.set("spark.graft.chunk.compression", "gzip")
    try {
      val w = ds.newWriter(meta)
      w.writeSlab("payload", spark.range(n)
        .select(array(col("id")).as("coord"),
          (col("id") % 97).cast("double").as("value")))
      val v = w.commit()
      // logical payload round-trips exactly
      val hash = ds.chunkHashes().head
      assert(ds.readChunk(hash).length == 64000)
      assert(ds.readSlab("payload", v).count() == n)
      assert(ds.readSlab("payload", v)
        .filter(col("value") === 5.0).count() == n / 97 + 1)
      // the stored blob is genuinely compressed
      val fs = new Path(ds.path).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val blobLen = fs.getFileStatus(
        GraftDataset.chunkPath(s"${ds.path}/chunks", hash)).getLen
      assert(blobLen < 32000, s"blob not compressed: $blobLen bytes")
      // manifest records the LOGICAL size
      assert(ds.manifestDF.as[(String, Long)].collect().head._2 == 64000L)
      // same content written without compression dedups to the same
      // hash (content addressing is codec-transparent)
      spark.conf.set("spark.graft.chunk.compression", "none")
      val w2 = ds.newWriter(meta)
      w2.writeSlab("payload", spark.range(n)
        .select(array(col("id")).as("coord"),
          (col("id") % 97).cast("double").as("value")))
      w2.commit()
      assert(ds.chunkCount() == 1)
    } finally spark.conf.unset("spark.graft.chunk.compression")
  }

  test("zstd chunk codec: transparent round-trip, compressed blobs, " +
      "cross-codec dedup with gzip and raw") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val n = 8000L
    val meta = DatasetMeta(Seq(VariableMeta("payload", "double",
      Seq(n), Seq(n), Double.NaN)))
    spark.conf.set("spark.graft.chunk.compression", "zstd")
    try {
      val w = ds.newWriter(meta)
      w.writeSlab("payload", spark.range(n)
        .select(array(col("id")).as("coord"),
          (col("id") % 97).cast("double").as("value")))
      val v = w.commit()
      val hash = ds.chunkHashes().head
      assert(ds.readChunk(hash).length == 64000)
      assert(ds.readSlab("payload", v).count() == n)
      val fs = new Path(ds.path).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val blobLen = fs.getFileStatus(
        GraftDataset.chunkPath(s"${ds.path}/chunks", hash)).getLen
      assert(blobLen < 32000, s"blob not compressed: $blobLen bytes")
      // content addressing stays codec-transparent: the same cells
      // written under gzip dedup to the SAME chunk (first codec wins)
      spark.conf.set("spark.graft.chunk.compression", "gzip")
      val w2 = ds.newWriter(meta)
      w2.writeSlab("payload", spark.range(n)
        .select(array(col("id")).as("coord"),
          (col("id") % 97).cast("double").as("value")))
      w2.commit()
      assert(ds.chunkCount() == 1)
    } finally spark.conf.unset("spark.graft.chunk.compression")
  }

  test("a write racing an epoch swap conflicts instead of going dark") {
    val lake = freshLake()
    lake.create("d")
    val ds = lake.connect("d")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8), Seq(4), Double.NaN)))
    val v1 = writeVersion(ds, meta, "t",
      (0L until 8L).map(i => (Seq(i): Seq[Long]) -> i.toDouble).toMap)

    // writer W stages from the pre-swap snapshot...
    val w = ds.newWriter(ds.metadata(v1))
    w.writeSlab("t", cellsDF(Seq((Seq(0L): Seq[Long]) -> 55.0)))
    // ...while an INSERT OVERWRITE-style epoch swap commits first
    val swapped = DatasetMeta(Seq(
      meta.variable("t").copy(indexName = "t#race")))
    val o = ds.newWriter(swapped)
    o.writeSlab("t", cellsDF(Seq((Seq(1L): Seq[Long]) -> 99.0)))
    o.commit()

    // W's rows key on the retired "t": committing them would publish
    // data invisible at HEAD — must surface as a retriable conflict
    val ex = intercept[CommitConflictException](w.commit())
    assert(ex.getMessage.contains("retired"))

    // the retry from a fresh snapshot lands on the new epoch and merges
    val head = ds.latestVersion.get
    val w2 = ds.newWriter(ds.metadata(head))
    w2.writeSlab("t", cellsDF(Seq((Seq(0L): Seq[Long]) -> 55.0)))
    val v3 = w2.commit()
    val got = readMap(ds.readSlab("t", v3)).collect {
      case (c, x) if !x.isNaN => c.head -> x
    }
    assert(got == Map(0L -> 55.0, 1L -> 99.0),
      s"retried write must merge onto the new epoch: $got")

    // two epoch swaps racing from one snapshot: one winner, one
    // metadata conflict (not two epochs with one silently dark)
    val oa = ds.newWriter(DatasetMeta(Seq(
      ds.metadata(v3).variable("t").copy(indexName = "t#a"))))
    oa.writeSlab("t", cellsDF(Seq((Seq(2L): Seq[Long]) -> 1.0)))
    val ob = ds.newWriter(DatasetMeta(Seq(
      ds.metadata(v3).variable("t").copy(indexName = "t#b"))))
    ob.writeSlab("t", cellsDF(Seq((Seq(3L): Seq[Long]) -> 2.0)))
    oa.commit()
    val ex2 = intercept[CommitConflictException](ob.commit())
    assert(ex2.getMessage.contains("conflict"))
  }

  test("stress: concurrent writers + gc loops never corrupt committed versions") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    // writers repeatedly rewrite the SAME cell values (so re-chunked
    // content dedups to existing blobs — the exact touch/delete race
    // surface), gc runs with zero grace the whole time
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val gcLoop = Future {
      var sweeps = 0
      while (!stop.get()) {
        ds.gc(graceMs = 0L); sweeps += 1
        Thread.sleep(100) // unfair lock: give writers a window
      }
      sweeps
    }
    val writers = (0 until 2).map { t =>
      Future {
        var committed = List.empty[Long]
        (0 until 5).foreach { i =>
          val w = ds.newWriter(meta2x2)
          // same content every round -> blob dedup against gc'd state
          w.writeSlab("temp", cellsDF(Seq(
            (Seq(t * 2L, 0L), 7.0), (Seq(t * 2L, 2L), 8.0))))
          try committed ::= w.commit()
          catch { case _: CommitConflictException => () } // retriable
        }
        committed
      }
    }
    val versions = Await.result(Future.sequence(writers), 300.seconds).flatten
    stop.set(true)
    val sweeps = Await.result(gcLoop, 60.seconds)
    assert(versions.nonEmpty && sweeps > 0)
    // EVERY committed version must be fully readable — a gc'd blob
    // behind a committed index would throw "no chunk with hash"
    versions.foreach { v =>
      val m = readMap(ds.readSlab("temp", v))
      assert(m.size == 16, s"version $v incomplete")
    }
    val head = readMap(ds.readSlab("temp", ds.latestVersion.get))
    assert(head(Seq(0L, 0L)) == 7.0 || head(Seq(2L, 0L)) == 7.0)
  }

  test("stress: concurrent writers + index-compaction loops keep every version readable") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    // compaction races the commit stream: every fold swaps the merged
    // store while writers keep appending tail partitions
    val compactLoop = Future {
      var folds = 0L
      while (!stop.get()) {
        folds += ds.compactIndexLog()
        Thread.sleep(50)
      }
      folds
    }
    val writers = (0 until 2).map { t =>
      Future {
        var committed = List.empty[(Long, Int)]
        (0 until 5).foreach { i =>
          val w = ds.newWriter(meta2x2)
          // disjoint chunk rows per writer: both always land
          w.writeSlab("temp", cellsDF(Seq(
            (Seq(t * 2L, 0L), i.toDouble), (Seq(t * 2L, 2L), i + 10.0))))
          committed ::= (w.commit(), i)
        }
        committed
      }
    }
    val versions =
      Await.result(Future.sequence(writers), 300.seconds)
    stop.set(true)
    val folds = Await.result(compactLoop, 60.seconds)
    assert(folds > 0, "compaction never folded anything")
    // every committed version stays fully readable across merged/tail
    // transitions, and each writer's own as-of shows its own write
    versions.zipWithIndex.foreach { case (commits, t) =>
      commits.foreach { case (v, i) =>
        val m = readMap(ds.readSlab("temp", v))
        assert(m.size == 16, s"version $v incomplete")
        assert(m(Seq(t * 2L, 0L)) == i.toDouble &&
          m(Seq(t * 2L, 2L)) == i + 10.0, s"version $v wrong as-of")
      }
    }
    // head sees both writers' final values on their disjoint cells
    val head = readMap(ds.readSlab("temp", ds.latestVersion.get))
    assert(head(Seq(0L, 0L)) == 4.0 && head(Seq(2L, 0L)) == 4.0)
  }

  // ---------- cross-process exclusion (real JVMs) ----------

  private def javaBin = s"${System.getProperty("java.home")}/bin/java"

  private def addOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def launch(main: String, jvmArgs: Seq[String],
      args: Seq[String]): Process = {
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"), main) ++ args
    new ProcessBuilder(cmd: _*).inheritIO().start()
  }

  test("commit lock excludes across OS processes (atomic create)") {
    val dir = Files.createTempDirectory("graft_lockrace_").toString
    val iters = 40
    val procs = (0 until 3).map(_ =>
      launch("graft.tools.LockRaceMain", Seq("-Xmx256m"),
        Seq(dir, iters.toString)))
    procs.foreach { p =>
      // 10 min ceiling: idle runtime is a few seconds, but a fully
      // loaded box starves the 20 ms lock polls (observed >120 s in
      // full-suite runs); the bound only guards against a true hang
      assert(p.waitFor(600, java.util.concurrent.TimeUnit.SECONDS),
        "lock race subprocess timed out")
      assert(p.exitValue() == 0)
    }
    val src = scala.io.Source.fromFile(s"$dir/counter.txt")
    val total = try src.mkString.trim.toLong finally src.close()
    // any lost update means two processes held the "lock" at once
    assert(total == 3L * iters)
  }

  test("lease renewal: a holder outliving its lease excludes a racing JVM") {
    val dir = Files.createTempDirectory("graft_leaserace_").toString
    // holder A's section (2500 ms) outlives the 400 ms lease 6x over;
    // B arrives mid-section. Without heartbeat renewal B steals at
    // ~400 ms and the sections overlap; with it B waits for A.
    // (Lease kept well above heartbeat jitter so a loaded box can't
    // starve A's renewal thread into a genuine lease loss.)
    val pa = launch("graft.tools.SlowLockHolderMain", Seq("-Xmx256m"),
      Seq(dir, "A", "2500", "400"))
    // wait until A is provably inside its section (begin marker
    // written under the lock) — a fixed sleep loses to JVM startup
    // time under full-suite load, and B would take the lock first
    val sectA = new java.io.File(dir, "sect-A.txt")
    val spawnDeadline = System.currentTimeMillis() + 60000
    while (!sectA.exists() && System.currentTimeMillis() < spawnDeadline)
      Thread.sleep(20)
    assert(sectA.exists(), "holder A never entered its section")
    val pb = launch("graft.tools.SlowLockHolderMain", Seq("-Xmx256m"),
      Seq(dir, "B", "300", "400"))
    Seq(pa, pb).foreach { p =>
      assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "slow-holder subprocess timed out")
      assert(p.exitValue() == 0, "holder failed (lease lost?)")
    }
    def interval(owner: String): (Long, Long) = {
      val src = scala.io.Source.fromFile(s"$dir/sect-$owner.txt")
      val lines = try src.getLines().toList finally src.close()
      val m = lines.map(_.split(' ')).map(a => a(0) -> a(1).toLong).toMap
      (m("begin"), m("end"))
    }
    val (ab, ae) = interval("A")
    val (bb, be) = interval("B")
    assert(ae - ab >= 2500, "A's section ran its full length")
    // exactly one critical section at a time: intervals are disjoint
    assert(be <= ab || bb >= ae,
      s"critical sections overlapped: A=[$ab,$ae] B=[$bb,$be]")
    // B genuinely waited for A (started after A's lease would have
    // expired without renewal)
    assert(bb >= ae, s"B should run after A: A end=$ae, B begin=$bb")
  }

  test("owner fence: a stolen lease fails loudly and spares the stealer's lock") {
    val dir = Files.createTempDirectory("graft_fence_").toString
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val lock = new Path(dir, "_lock")
    val ex = intercept[CommitLock.LockLeaseLostException] {
      CommitLock.withLock(fs, lock, "victim", leaseMs = 120L,
        timeoutMs = 5000L) {
        // simulate a stealer after a long holder freeze: replace the
        // lock with a different owner's mid-section
        val f = new java.io.File(lock.toUri.getPath)
        val w = new java.io.FileWriter(f)
        try w.write("stealer") finally w.close()
        Thread.sleep(400) // let the heartbeat observe the loss
        "completed"
      }
    }
    assert(ex.getMessage.contains("lease"))
    // the fence must NOT have deleted the stealer's lock
    assert(fs.exists(lock), "stealer's lock was deleted by the victim")
    val src = scala.io.Source.fromFile(lock.toUri.getPath)
    val owner = try src.mkString finally src.close()
    assert(owner == "stealer")
  }

  test("two JVMs racing overlapping commits: one winner, one conflict") {
    val root = Files.createTempDirectory("graft_commitrace_").toString
    new GraftLake(spark, root).create("race")
    val jvmArgs = addOpens ++ Seq("-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC")
    val pa = launch("graft.tools.CommitRaceMain", jvmArgs, Seq(root, "1.0"))
    val pb = launch("graft.tools.CommitRaceMain", jvmArgs, Seq(root, "2.0"))
    Seq(pa, pb).foreach { p =>
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "commit race subprocess timed out")
    }
    val codes = Seq(pa.exitValue(), pb.exitValue()).sorted
    assert(codes == Seq(0, 42), s"expected one winner + one conflict, got $codes")
    // exactly one committed version, holding the winner's write
    val ds = new GraftLake(spark, root).connect("race")
    assert(ds.versionIds().length == 1)
  }

  /** Barrier-synchronized DDL/DML race helper: seeds a 1-D variable,
    * launches two racer JVMs that pin their snapshots BEFORE either
    * commits (file barrier), releases them, returns the exit codes.
    */
  private def ddlRace(root: String,
      racers: Seq[(String, Long)]): Seq[Int] = {
    val barrier = Files.createTempDirectory("graft_ddlbarrier_").toString
    val jvmArgs = addOpens ++ Seq("-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC")
    val procs = racers.map { case (role, target) =>
      (role, target, launch("graft.tools.DdlDmlRaceMain", jvmArgs,
        Seq(root, role, target.toString, barrier)))
    }
    // release the barrier once every racer has pinned its snapshot
    val deadline = System.currentTimeMillis() + 120000
    while (!racers.forall { case (role, target) =>
        new java.io.File(barrier, s"ready-$role-$target").exists() } &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    new java.io.File(barrier, "go").createNewFile()
    procs.map { case (_, _, p) =>
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "ddl race subprocess timed out")
      p.exitValue()
    }
  }

  test("DDL grow racing a plain write across JVMs: the metadata merge lands BOTH") {
    val root = Files.createTempDirectory("graft_ddlrace_").toString
    new GraftLake(spark, root).create("race")
    val ds = new GraftLake(spark, root).connect("race")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8), Seq(4), Double.NaN))))
    w.writeSlab("t", cellsDF((0L until 4L).map(i =>
      (Seq(i): Seq[Long]) -> i.toDouble).toMap.toSeq))
    w.commit()

    // compatible pair from the SAME snapshot: a metadata-only grow to
    // 12 and a write of cell 5 under the old shape — neither may
    // conflict, whatever the commit order
    val codes = ddlRace(root, Seq("ddl" -> 12L, "dml" -> 5L))
    assert(codes == Seq(0, 0),
      s"compatible DDL/DML pair should both land cleanly, got $codes")
    ds.invalidateCaches()
    val head = ds.latestVersion.get
    assert(ds.metadata(head).variable("t").shape == Seq(12L),
      "the grow survived the merge")
    val cells = readMap(ds.readSlab("t", head))
    assert(cells.size == 12) // grown shape
    assert(cells(Seq(5L)) == 55.0) // the racing write survived too
    assert(cells(Seq(1L)) == 1.0 && cells(Seq(9L)).isNaN)
  }

  test("racing RENAMEs across JVMs: duplicate index keys surface as a retriable conflict") {
    val root = Files.createTempDirectory("graft_renrace_").toString
    new GraftLake(spark, root).create("race")
    val ds = new GraftLake(spark, root).connect("race")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8), Seq(4), Double.NaN))))
    w.writeSlab("t", cellsDF(Seq((Seq(0L), 1.0))))
    w.commit()

    // both racers rename the SAME variable from the same snapshot
    // (t -> t_7 vs t -> t_9): the merge yields two variables sharing
    // physical key "t" — the uniqueness check must fail the loser
    // with the RETRIABLE conflict, and its fresh-snapshot retry
    // renames the winner's name onward
    val codes = ddlRace(root, Seq("rename" -> 7L, "rename" -> 9L))
      .sorted
    assert(codes == Seq(0, 42),
      s"expected one clean rename + one conflict-then-retry, got $codes")
    ds.invalidateCaches()
    val head = ds.latestVersion.get
    val vars = ds.metadata(head).variables
    assert(vars.length == 1, s"merge duplicated the variable: $vars")
    assert(Set("t_7", "t_9").contains(vars.head.name))
    assert(vars.head.idx == "t", "physical index key must stay stable")
    // data still reachable under the final name
    val cells = readMap(ds.readSlab(vars.head.name, head))
    assert(cells(Seq(0L)) == 1.0)
  }

  test("racing epoch swaps across JVMs: one winner, loser's retry re-swaps") {
    val root = Files.createTempDirectory("graft_swaprace_").toString
    new GraftLake(spark, root).create("race")
    val ds = new GraftLake(spark, root).connect("race")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8), Seq(4), Double.NaN))))
    w.writeSlab("t", cellsDF(Seq((Seq(0L), 1.0))))
    w.commit()

    // both racers INSERT OVERWRITE the same variable from the same
    // snapshot (epoch t#7 + cell0=7 vs epoch t#9 + cell0=9): the
    // metadata merge must yield exactly one winner; the loser's
    // fresh-snapshot retry swaps again on top, so the FINAL epoch is
    // the retrier's and the winner's cells are hidden — never two
    // epochs with one silently dark
    val codes = ddlRace(root, Seq("replace" -> 7L, "replace" -> 9L))
    assert(codes.sorted == Seq(0, 42),
      s"expected one clean swap + one conflict-then-retry, got $codes")
    ds.invalidateCaches()
    val head = ds.latestVersion.get
    val vars = ds.metadata(head).variables
    assert(vars.length == 1, s"merge duplicated the variable: $vars")
    val loserTarget = if (codes.head == 42) 7L else 9L
    assert(vars.head.idx == s"t#$loserTarget",
      s"final epoch must be the retrier's, got ${vars.head.idx}")
    val cells = readMap(ds.readSlab("t", head)).collect {
      case (c, x) if !x.isNaN => c.head -> x
    }
    assert(cells == Map(0L -> loserTarget.toDouble),
      s"HEAD must show only the final epoch's cells: $cells")
  }

  test("conflicting DDL pair across JVMs: one winner, loser's retry lands") {
    val root = Files.createTempDirectory("graft_ddlrace2_").toString
    new GraftLake(spark, root).create("race")
    val ds = new GraftLake(spark, root).connect("race")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8), Seq(4), Double.NaN))))
    w.writeSlab("t", cellsDF(Seq((Seq(0L), 1.0))))
    w.commit()

    // both racers change t's metadata DIFFERENTLY from the same
    // snapshot (grow to 16 + write 15 vs grow to 20 + write 19):
    // exactly one wins; the loser sees CommitConflictException and
    // retries against the fresh snapshot
    val codes = ddlRace(root, Seq("ddlwrite" -> 16L, "ddlwrite" -> 20L))
      .sorted
    assert(codes == Seq(0, 42),
      s"expected one clean winner + one conflict-then-retry, got $codes")
    ds.invalidateCaches()
    val head = ds.latestVersion.get
    // the retry grew to max(its target, current) — final shape 20
    assert(ds.metadata(head).variable("t").shape == Seq(20L))
    val cells = readMap(ds.readSlab("t", head))
    assert(cells(Seq(15L)) == 55.0, "loser's retried write landed")
    assert(cells(Seq(19L)) == 55.0, "winner's write landed")
    assert(cells(Seq(0L)) == 1.0)
  }

  /** Barrier-synchronized clone/merge race helper (CloneMergeRaceMain
    * roles, ready-tags matching the main's `await` naming).
    */
  private def cloneRace(root: String,
      racers: Seq[(String, String, String)]): Seq[Int] = {
    val barrier = Files.createTempDirectory("graft_clbarrier_").toString
    val jvmArgs = addOpens ++ Seq("-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC")
    val procs = racers.map { case (role, arg, tag) =>
      (tag, launch("graft.tools.CloneMergeRaceMain", jvmArgs,
        Seq(root, role, arg, barrier)))
    }
    val deadline = System.currentTimeMillis() + 120000
    while (!racers.forall { case (_, _, tag) =>
        new java.io.File(barrier, s"ready-$tag").exists() } &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    new java.io.File(barrier, "go").createNewFile()
    procs.map { case (_, p) =>
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "clone race subprocess timed out")
      p.exitValue()
    }
  }

  test("two clones + a write racing across JVMs: the metadata merge lands all three") {
    val root = Files.createTempDirectory("graft_clonerace_").toString
    new GraftLake(spark, root).create("race")
    val ds = new GraftLake(spark, root).connect("race")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8), Seq(4), Double.NaN))))
    w.writeSlab("t", cellsDF((0L until 8L).map(i =>
      (Seq(i): Seq[Long]) -> i.toDouble)))
    val v1 = w.commit()

    val codes = cloneRace(root, Seq(
      ("clone", s"b1@$v1", "clone-b1"),
      ("clone", s"b2@$v1", "clone-b2"),
      ("write", "2", "write-2")))
    assert(codes.forall(_ == 0),
      s"disjoint clone/clone/write should all land, got $codes")
    ds.invalidateCaches()
    val head = ds.latestVersion.get
    assert(ds.metadata(head).variables.map(_.name).toSet ==
      Set("t", "b1", "b2"))
    // both branches carry t@v1 exactly; t carries the racing write
    Seq("b1", "b2").foreach { b =>
      val cells = readMap(ds.readSlab(b, head))
      assert((0L until 8L).forall(i => cells(Seq(i)) == i.toDouble),
        s"$b must read t@v1 content")
    }
    assert(readMap(ds.readSlab("t", head))(Seq(2L)) == 77.0)
    // no duplicate or phantom versions from retries
    assert(ds.versionIds().length == 4)
  }

  test("same-name clone race across JVMs: exactly one winner") {
    val root = Files.createTempDirectory("graft_clonedup_").toString
    new GraftLake(spark, root).create("race")
    val ds = new GraftLake(spark, root).connect("race")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8), Seq(4), Double.NaN))))
    w.writeSlab("t", cellsDF((0L until 8L).map(i =>
      (Seq(i): Seq[Long]) -> i.toDouble)))
    val v1 = w.commit()

    // the barrier tag is name-keyed, so two same-name cloners need
    // one proc to race un-barriered: launch both against the same
    // name; the barrier waits for the single ready-clone-b file,
    // which either may create — both then commit concurrently
    val codes = cloneRace(root, Seq(
      ("clone", s"b@$v1", "clone-b"),
      ("clone", s"b@$v1", "clone-b"))).sorted
    assert(codes == Seq(0, 42),
      s"expected one winner + one already-exists loser, got $codes")
    ds.invalidateCaches()
    val head = ds.latestVersion.get
    assert(ds.metadata(head).variables.count(_.name == "b") == 1)
    assert(ds.versionIds().length == 2)
    val cells = readMap(ds.readSlab("b", head))
    assert((0L until 8L).forall(i => cells(Seq(i)) == i.toDouble))
  }

  test("merge racing a disjoint source write across JVMs: both land") {
    val root = Files.createTempDirectory("graft_mergerace_").toString
    new GraftLake(spark, root).create("race")
    val ds = new GraftLake(spark, root).connect("race")
    val w = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8), Seq(4), Double.NaN))))
    w.writeSlab("t", cellsDF((0L until 8L).map(i =>
      (Seq(i): Seq[Long]) -> i.toDouble)))
    val v1 = w.commit()
    val vc = ds.cloneVariable("t", "b", v1)
    val wb = ds.newWriter(ds.metadata(vc))
    wb.writeSlab("b", cellsDF(Seq((Seq(0L): Seq[Long]) -> -1.0)))
    wb.commit()
    ds.invalidateCaches()

    // merge applies branch chunk [0,4) while the writer hits cell 6
    // (chunk [4,8)) — disjoint coords, so whatever the interleaving,
    // the commit gate must land BOTH (a conflict here would be a
    // false positive)
    val codes = cloneRace(root, Seq(
      ("merge", "b", "merge-b"),
      ("write", "6", "write-6")))
    assert(codes.forall(_ == 0),
      s"disjoint merge/write should both land, got $codes")
    ds.invalidateCaches()
    val head = ds.latestVersion.get
    val cells = readMap(ds.readSlab("t", head))
    assert(cells(Seq(0L)) == -1.0, "the merged branch chunk landed")
    assert(cells(Seq(6L)) == 77.0, "the racing write landed")
    assert(cells(Seq(5L)) == 5.0)
  }
}
