package graft.core

import org.apache.spark.sql.functions.{col, isnan}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Model._

/** Depth soak for the round-9 scale claims: the 521-commit listing
  * gate, extended to ~5 000 commits with index compaction, chunk
  * packing, gc and retention interleaved the way a long-running
  * streaming ingest would drive them. The gates are the SAME bounds
  * as the 521-commit run (listing entries, driver metadata point
  * reads, O(tail) fold I/O) — flat counters across a 10× deeper
  * history is the claim. Scale with -Dgraft.soak.commits (default
  * 5000).
  */
class DeepHistorySoakSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private def readMap(df: org.apache.spark.sql.DataFrame) =
    df.where(!isnan(col("value")))
      .as[(Seq[Long], Double)].collect().toMap

  test("5000-commit history with interleaved maintenance: bounded listings, folds and reads") {
    val total =
      sys.props.get("graft.soak.commits").map(_.toInt).getOrElse(5000)
    val lake = new GraftLake(spark,
      graft.TempDirs.create("graft_deep_").toString)
    lake.create("deep")
    val ds = lake.connect("deep")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(64L), Seq(4L), Double.NaN)))

    var model = Map.empty[Seq[Long], Double]
    var commits = 0
    var writesSinceFold = 0
    while (commits < total) {
      commits += 1
      if (commits % 25 == 0) {
        // a real data write every 25th commit (a streaming cadence of
        // mostly-small epochs); the rest are metadata-only commits
        val cell = Seq(((commits / 25) % 64).toLong)
        val w = ds.newWriter(meta)
        w.writeSlab("t", Seq((cell, commits.toDouble))
          .toDF("coord", "value"))
        w.commit()
        model += cell -> commits.toDouble
        writesSinceFold += 1
      } else ds.newWriter(meta).commit()
      if (commits % 1000 == 0) {
        ds.compactIndexLog()
        ds.packChunks()
        ds.gc(graceMs = 0L)
        writesSinceFold = 0
      }
      if (commits == (total * 3) / 5)
        ds.expireVersions(keepLast = 500)
    }
    assert(commits == total)

    // --- gates: identical bounds to the 521-commit run ---
    // listings from a FRESH handle stay O(snapshotEvery)
    val fresh = lake.connect("deep")
    fresh.versionListEntries.set(0L)
    fresh.metaPointReads.set(0L)
    val head = fresh.latestVersion.get
    val got = readMap(fresh.readSlab("t", head))
    assert(fresh.versionListEntries.get < 80,
      s"listing after $total commits touched " +
        s"${fresh.versionListEntries.get} version records")
    assert(fresh.metaPointReads.get < 40,
      s"read after $total commits did ${fresh.metaPointReads.get} " +
        "driver metadata point reads")
    assert(got == model, s"read-back diverged: ${got.size} cells vs " +
      s"model ${model.size}")

    // fold I/O is O(tail) at full depth: one more write then a fold
    // writes the tail's rows, never the 64-chunk store
    val w = ds.newWriter(meta)
    w.writeSlab("t", Seq((Seq(63L), -1.0)).toDF("coord", "value"))
    w.commit()
    assert(ds.compactIndexLog() >= 1L)
    // O(tail): the fold writes the index rows accumulated since the
    // last fold (one per data write), never the whole store's
    assert(ds.lastFoldRowsWritten.get <= writesSinceFold + 4,
      s"post-soak fold wrote ${ds.lastFoldRowsWritten.get} rows for a " +
        s"$writesSinceFold-write tail — not incremental at depth")

    // hot dirs stay bounded after maintenance: per-version index
    // partitions swept by the fold, blobs folded into packs
    val hfs = new org.apache.hadoop.fs.Path(ds.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hotIdx = hfs.listStatus(
      new org.apache.hadoop.fs.Path(s"${ds.path}/indices"))
      .count(_.getPath.getName.startsWith("versionId="))
    assert(hotIdx <= 4, s"$hotIdx hot index partitions after the fold")
    ds.packChunks(); ds.gc(graceMs = 0L)
    val blobs = hfs.listStatus(
      new org.apache.hadoop.fs.Path(s"${ds.path}/chunks"))
      .filter(_.isDirectory)
      .flatMap(d => hfs.listStatus(d.getPath))
      .count(_.getPath.getName.endsWith(".bin"))
    assert(blobs <= 8,
      s"$blobs loose blobs after packing a $total-commit history")

    // retention at depth: HEAD survives, expired ids refuse reads
    val ids = ds.versionIds()
    assert(ids.length <= 3000, s"retention left ${ids.length} versions")
    val after = readMap(ds.readSlab("t", ds.latestVersion.get))
    assert(after(Seq(63L)) == -1.0)
  }
}
