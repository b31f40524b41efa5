package graft.core

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import Model._

/** Zero-chunk-copy CLONE (branch) of a variable
  * ([[GraftDataset.cloneVariable]]): O(index) row copy under a fresh
  * key, shared refcounted chunks, and a decode LINEAGE so pre-clone
  * rows keep decoding under the metadata they were written with
  * (hbase.clj has no clone; this is the content-addressed store's
  * natural branch verb, the cheap sibling of the O(data) rechunk).
  */
class CloneSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private def freshDs(): GraftDataset = {
    val lake = new GraftLake(spark,
      Files.createTempDirectory("graft_clone_").toString)
    lake.create("d")
    lake.connect("d")
  }

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

  private def allCells(n: Long): Map[Seq[Long], Double] =
    (for (i <- 0L until n; j <- 0L until n)
      yield (Seq(i, j): Seq[Long]) -> (i * n + j).toDouble).toMap

  private def nChunks(ds: GraftDataset): Long =
    ds.stats().select("n_chunks").as[Long].head()

  /** Physical blob files on disk (manifest rows count staged entries
    * even when the content-addressed put deduped them).
    */
  private def blobFiles(ds: GraftDataset): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else 1L
    val d = new java.io.File(s"${ds.path}/chunks")
    if (d.exists) walk(d) else 0L
  }

  test("clone reads identically to its source; zero new chunks") {
    val ds = freshDs()
    val v1 = writeVersion(ds, meta2x2, "temp", allCells(4))
    val before = nChunks(ds)
    val v2 = ds.cloneVariable("temp", "branch")
    assert(v2 > v1)
    assert(readMap(ds.readSlab("branch", v2)) ==
      readMap(ds.readSlab("temp", v1)))
    assert(nChunks(ds) == before, "clone must not write any chunk")
    // the clone is a first-class variable in HEAD metadata
    assert(ds.metadata(v2).variables.map(_.name).toSet ==
      Set("temp", "branch"))
    // ...and absent before the clone version
    assert(ds.metadata(v1).variables.map(_.name) == Seq("temp"))
  }

  test("divergence: writes to either side never affect the other") {
    val ds = freshDs()
    val v1 = writeVersion(ds, meta2x2, "temp", allCells(4))
    val v2 = ds.cloneVariable("temp", "branch")
    val metaBoth = ds.metadata(v2)
    // overwrite one cell on the branch, another on the source
    val v3 = writeVersion(ds, metaBoth, "branch", Map(Seq(0L, 0L) -> -1.0))
    val v4 = writeVersion(ds, metaBoth, "temp", Map(Seq(3L, 3L) -> -2.0))
    val src = readMap(ds.readSlab("temp", v4))
    val brn = readMap(ds.readSlab("branch", v4))
    assert(src(Seq(0L, 0L)) == 0.0 && brn(Seq(0L, 0L)) == -1.0)
    assert(src(Seq(3L, 3L)) == -2.0 && brn(Seq(3L, 3L)) == 15.0)
    // a branch write merges against the CLONED chunk's cells
    assert(brn(Seq(0L, 1L)) == 1.0 && brn(Seq(1L, 0L)) == 4.0)
    assert(readMap(ds.readSlab("branch", v3))(Seq(3L, 3L)) == 15.0)
  }

  test("clone at an old version branches from history") {
    val ds = freshDs()
    val v1 = writeVersion(ds, meta2x2, "temp", allCells(4))
    writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 0L) -> 777.0))
    val v3 = ds.cloneVariable("temp", "asof1", v1)
    val got = readMap(ds.readSlab("asof1", v3))
    assert(got(Seq(0L, 0L)) == 0.0, "clone at v1 must not see v2")
    assert(got == allCells(4))
  }

  test("lineage decode: grown source's pre-grow edge tiles read correctly") {
    val ds = freshDs()
    // shape 3 with chunkDims 2 → the edge tile is 1 wide at write time
    val m3 = DatasetMeta(Seq(
      VariableMeta("g", "double", Seq(3), Seq(2), Double.NaN)))
    val v1 = writeVersion(ds, m3, "g",
      Map(Seq(0L) -> 1.0, Seq(1L) -> 2.0, Seq(2L) -> 3.0))
    // grow to shape 5: v1's edge tile [2] keeps its 1-wide encoding
    val m5 = DatasetMeta(Seq(
      VariableMeta("g", "double", Seq(5), Seq(2), Double.NaN)))
    val v2 = writeVersion(ds, m5, "g", Map(Seq(4L) -> 5.0))
    val v3 = ds.cloneVariable("g", "gb")
    val got = readMap(ds.readSlab("gb", v3))
    assert(got == Map(Seq(0L) -> 1.0, Seq(1L) -> 2.0, Seq(2L) -> 3.0,
      Seq(4L) -> 5.0) ++ Map((Seq(3L): Seq[Long]) -> got(Seq(3L)))
      && got(Seq(3L)).isNaN)
    // the clone's stored view too (readStored shares the decode map)
    assert(readMap(ds.readStored("gb", v3)) ==
      Map(Seq(0L) -> 1.0, Seq(1L) -> 2.0, Seq(2L) -> 3.0, Seq(4L) -> 5.0))
    assert(v2 > v1)
  }

  test("clone of a clone chains the lineage") {
    val ds = freshDs()
    val m3 = DatasetMeta(Seq(
      VariableMeta("g", "double", Seq(3), Seq(2), Double.NaN)))
    writeVersion(ds, m3, "g", Map(Seq(2L) -> 3.0)) // 1-wide edge tile
    val m5 = DatasetMeta(Seq(
      VariableMeta("g", "double", Seq(5), Seq(2), Double.NaN)))
    writeVersion(ds, m5, "g", Map(Seq(4L) -> 5.0))
    val vb = ds.cloneVariable("g", "b1")
    // diverge b1, then branch again from it
    val v4 = writeVersion(ds, ds.metadata(vb), "b1", Map(Seq(0L) -> 9.0))
    val vc = ds.cloneVariable("b1", "b2")
    val got = readMap(ds.readStored("b2", vc))
    assert(got == Map(Seq(0L) -> 9.0, Seq(2L) -> 3.0, Seq(4L) -> 5.0))
    val lin = ds.metadata(vc).variable("b2").lineage
    assert(lin.length == 2 && lin.map(_._2) == lin.map(_._2).sorted)
    assert(v4 > vb)
  }

  test("rename interplay: either side renames without touching the other") {
    val ds = freshDs()
    writeVersion(ds, meta2x2, "temp", allCells(4))
    val v2 = ds.cloneVariable("temp", "branch")
    // rename the SOURCE: metadata-only, branch unaffected
    val srcVm = ds.metadata(v2).variable("temp")
    val renamed = DatasetMeta(ds.metadata(v2).variables.map(v =>
      if (v.name == "temp") v.copy(name = "temp2",
        indexName = v.idx) else v))
    val w = ds.newWriter(renamed); val v3 = w.commit()
    assert(readMap(ds.readSlab("branch", v3)) == allCells(4))
    assert(readMap(ds.readSlab("temp2", v3)) == allCells(4))
    assert(ds.metadata(v3).variable("temp2").idx == srcVm.idx)
  }

  test("retention + gc on shared chunks: expiring pre-clone history keeps the branch whole") {
    val ds = freshDs()
    writeVersion(ds, meta2x2, "temp", allCells(4))
    val v2 = ds.cloneVariable("temp", "branch")
    // two more commits so keep_last=2 expires v1 (the source write)
    val v3 = writeVersion(ds, ds.metadata(v2), "temp",
      Map(Seq(0L, 0L) -> -5.0))
    val v4 = writeVersion(ds, ds.metadata(v2), "temp",
      Map(Seq(0L, 1L) -> -6.0))
    val expired = ds.expireVersions(2)
    assert(expired.nonEmpty)
    ds.gc(graceMs = 0L)
    // the branch still reads its full pre-clone content
    assert(readMap(ds.readSlab("branch", v4)) == allCells(4))
    // and the survivor source reflects its own overwrites
    val src = readMap(ds.readSlab("temp", v4))
    assert(src(Seq(0L, 0L)) == -5.0 && src(Seq(0L, 1L)) == -6.0 &&
      src(Seq(3L, 3L)) == 15.0)
    assert(v3 > v2)
  }

  test("scalar (0-d) variable clones and merges") {
    val ds = freshDs()
    val m = DatasetMeta(Seq(
      VariableMeta("s", "double", Seq.empty, Seq.empty, Double.NaN)))
    val v1 = writeVersion(ds, m, "s", Map((Seq.empty: Seq[Long]) -> 42.0))
    val v2 = ds.cloneVariable("s", "sb")
    assert(readMap(ds.readSlab("sb", v2)) == Map((Seq.empty: Seq[Long]) -> 42.0))
    assert(v1 < v2)
    // scalar branch write + merge back (the empty-coord chunk)
    writeVersion(ds, ds.metadata(v2), "sb", Map((Seq.empty: Seq[Long]) -> 7.0))
    val vm = ds.mergeBranch("sb")
    assert(readMap(ds.readSlab("s", vm)) == Map((Seq.empty: Seq[Long]) -> 7.0))
    assert(ds.mergeBranch("sb") == vm)
  }

  test("lineage JSON round-trips (incl. fresh-key '#' and chains)") {
    val m = DatasetMeta(Seq(
      VariableMeta("b", "double", Seq(4), Seq(2), Double.NaN,
        indexName = "b#ab12cd34",
        lineage = Seq(("a", 100L), ("a2#zz99", 200L)),
        mergeBase = 321L),
      VariableMeta("plain", "long", Seq(4), Seq(2), 0.0)))
    val back = Model.metaFromJson(Model.metaToJson(m))
    assert(back.variable("b").lineage == Seq(("a", 100L), ("a2#zz99", 200L)))
    assert(back.variable("b").idx == "b#ab12cd34")
    assert(back.variable("b").mergeBase == 321L)
    assert(back.variable("plain").lineage.isEmpty)
    assert(back.variable("plain").mergeBase == 0L)
  }

  test("decodeKeyAt picks the first covering lineage entry") {
    val vm = VariableMeta("b", "double", Seq(4), Seq(2), Double.NaN,
      indexName = "bk", lineage = Seq(("a", 100L), ("m", 200L)))
    assert(vm.decodeKeyAt(50L) == "a")
    assert(vm.decodeKeyAt(100L) == "a")
    assert(vm.decodeKeyAt(150L) == "m")
    assert(vm.decodeKeyAt(201L) == "bk")
    assertThrows[IllegalArgumentException] {
      VariableMeta("b", "double", Seq(4), Seq(2), Double.NaN,
        lineage = Seq(("a", 200L), ("m", 100L))) // not ascending
    }
  }

  test("cloneVariables: whole-dataset branch in one atomic commit") {
    val ds = freshDs()
    val meta = DatasetMeta(Seq(
      VariableMeta("a", "double", Seq(4), Seq(2), Double.NaN),
      VariableMeta("b", "long", Seq(4), Seq(2), 0.0)))
    val w = ds.newWriter(meta)
    w.writeSlab("a", cellsDF((0L until 4L).map(i =>
      (Seq(i): Seq[Long]) -> i.toDouble).toMap))
    w.writeSlab("b", cellsDF(Map((Seq(1L): Seq[Long]) -> 7.0)))
    val v1 = w.commit()
    val v2 = ds.cloneVariables(Seq("a" -> "a2", "b" -> "b2"))
    assert(ds.metadata(v2).variables.map(_.name).toSet ==
      Set("a", "b", "a2", "b2"))
    assert(readMap(ds.readSlab("a2", v2)) == readMap(ds.readSlab("a", v1)))
    assert(readMap(ds.readStored("b2", v2)) == Map((Seq(1L): Seq[Long]) -> 7.0))
    // one commit, not one per variable
    assert(ds.versionIds().length == 2)
    // a clash anywhere rejects the WHOLE batch — nothing commits
    intercept[Exception] {
      ds.cloneVariables(Seq("a" -> "a3", "b" -> "a2"))
    }
    assert(ds.versionIds().length == 2)
    assert(!ds.metadata(ds.latestVersion.get).variables.exists(_.name == "a3"))
    intercept[Exception] { // duplicate targets in one batch
      ds.cloneVariables(Seq("a" -> "x", "b" -> "x"))
    }
  }

  test("merge: branch changes land on the source, chunk-granular, near-zero new blobs") {
    val ds = freshDs()
    writeVersion(ds, meta2x2, "temp", allCells(4))
    val v2 = ds.cloneVariable("temp", "branch")
    // branch rewrites chunk (0,0) partially and chunk (1,1) fully
    writeVersion(ds, ds.metadata(v2), "branch",
      Map(Seq(0L, 0L) -> -1.0, Seq(3L, 2L) -> -2.0, Seq(3L, 3L) -> -3.0,
        Seq(2L, 2L) -> -4.0, Seq(2L, 3L) -> -5.0))
    val before = blobFiles(ds)
    val vm = ds.mergeBranch("branch")
    val got = readMap(ds.readSlab("temp", vm))
    // merged chunks replace wholesale (branch view incl. its merge of
    // cloned cells); untouched chunks keep source content
    assert(got(Seq(0L, 0L)) == -1.0 && got(Seq(0L, 1L)) == 1.0)
    assert(got(Seq(2L, 2L)) == -4.0 && got(Seq(3L, 3L)) == -3.0)
    assert(got(Seq(1L, 2L)) == 6.0) // untouched chunk (0,1)
    // re-encoded merged tiles dedup against the branch's blobs
    assert(blobFiles(ds) == before,
      s"merge must dedup to existing blobs ($before -> ${blobFiles(ds)})")
    // the branch itself is untouched by the merge
    assert(readMap(ds.readSlab("branch", vm))(Seq(1L, 2L)) == 6.0)
    // a second merge with no new branch writes is a no-op
    assert(ds.mergeBranch("branch") == vm)
  }

  test("merge conflicts: both-changed chunks refuse; force takes the branch side") {
    val ds = freshDs()
    writeVersion(ds, meta2x2, "temp", allCells(4))
    val v2 = ds.cloneVariable("temp", "branch")
    // DISJOINT changes: source chunk (0,1), branch chunk (1,0) — ok
    writeVersion(ds, ds.metadata(v2), "temp", Map(Seq(0L, 2L) -> 55.0))
    writeVersion(ds, ds.metadata(v2), "branch", Map(Seq(2L, 0L) -> -9.0))
    val vm = ds.mergeBranch("branch")
    val got = readMap(ds.readSlab("temp", vm))
    assert(got(Seq(0L, 2L)) == 55.0 && got(Seq(2L, 0L)) == -9.0)
    // now BOTH touch chunk (0,0): conflict
    writeVersion(ds, ds.metadata(vm), "temp", Map(Seq(0L, 0L) -> 100.0))
    writeVersion(ds, ds.metadata(vm), "branch", Map(Seq(1L, 1L) -> -100.0))
    intercept[CommitConflictException] { ds.mergeBranch("branch") }
    val vf = ds.mergeBranch("branch", force = true)
    val after = readMap(ds.readSlab("temp", vf))
    // branch side wins the whole chunk: its (0,0) view has the CLONED
    // 0.0, overwriting the source's post-branch 100.0
    assert(after(Seq(0L, 0L)) == 0.0 && after(Seq(1L, 1L)) == -100.0)
  }

  test("merge cycles: branch->merge->branch->merge advances the merge base") {
    val ds = freshDs()
    writeVersion(ds, meta2x2, "temp", allCells(4))
    val v2 = ds.cloneVariable("temp", "branch")
    // cycle 1
    writeVersion(ds, ds.metadata(v2), "branch", Map(Seq(0L, 0L) -> -1.0))
    val m1 = ds.mergeBranch("branch")
    assert(readMap(ds.readSlab("temp", m1))(Seq(0L, 0L)) == -1.0)
    // cycle 2: the SAME chunk again — the source's change came from
    // merge 1 itself, so this must NOT conflict
    writeVersion(ds, ds.metadata(m1), "branch", Map(Seq(0L, 0L) -> -2.0))
    val m2 = ds.mergeBranch("branch")
    assert(readMap(ds.readSlab("temp", m2))(Seq(0L, 0L)) == -2.0)
    // but an INDEPENDENT source write between cycles still conflicts
    writeVersion(ds, ds.metadata(m2), "temp", Map(Seq(0L, 1L) -> 50.0))
    writeVersion(ds, ds.metadata(m2), "branch", Map(Seq(1L, 1L) -> -3.0))
    intercept[CommitConflictException] { ds.mergeBranch("branch") }
    // identical changes on both sides are NOT conflicts (hash-equal)
    val h1 = ds.latestVersion.get
    writeVersion(ds, ds.metadata(h1), "temp", Map(Seq(2L, 2L) -> 8.0))
    writeVersion(ds, ds.metadata(h1), "branch", Map(Seq(2L, 2L) -> 8.0))
    // chunk (1,1) now byte-identical on both sides; only chunk (0,0)
    // still genuinely conflicts from above
    val e = intercept[CommitConflictException] { ds.mergeBranch("branch") }
    assert(e.getMessage.startsWith("1 chunk"))
  }

  test("mergePreview: dry-run reports changes and conflicts, commits nothing") {
    val ds = freshDs()
    writeVersion(ds, meta2x2, "temp", allCells(4))
    val v2 = ds.cloneVariable("temp", "branch")
    // branch changes chunks (0,0) and (1,1); source independently
    // changes (1,1) — one clean apply, one conflict
    writeVersion(ds, ds.metadata(v2), "branch",
      Map(Seq(0L, 0L) -> -1.0, Seq(3L, 3L) -> -2.0))
    writeVersion(ds, ds.metadata(v2), "temp", Map(Seq(2L, 2L) -> 9.0))
    val before = ds.versionIds().length
    val rows = ds.mergePreview("branch")
      .as[(Seq[Long], Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(rows == Map((Seq(0L, 0L): Seq[Long]) -> false,
      (Seq(1L, 1L): Seq[Long]) -> true))
    assert(ds.versionIds().length == before, "preview must not commit")
    // the preview's conflict set is exactly what mergeBranch refuses on
    intercept[CommitConflictException] { ds.mergeBranch("branch") }
  }

  test("merge guards: non-clone, geometry drift, epoch-swapped source") {
    val ds = freshDs()
    writeVersion(ds, meta2x2, "temp", allCells(4))
    intercept[IllegalArgumentException] { ds.mergeBranch("temp") }
    val v2 = ds.cloneVariable("temp", "branch")
    // grow ONLY the source: geometry drift refuses
    val grown = DatasetMeta(ds.metadata(v2).variables.map(v =>
      if (v.name == "temp") v.copy(shape = Seq(6, 4)) else v))
    ds.newWriter(grown).commit()
    intercept[IllegalArgumentException] { ds.mergeBranch("branch") }
  }

  test("error paths: duplicate name, unknown source, expired as-of") {
    val ds = freshDs()
    val v1 = writeVersion(ds, meta2x2, "temp", allCells(4))
    assertThrows[IllegalArgumentException] {
      ds.cloneVariable("nope", "x")
    }
    intercept[Exception] { ds.cloneVariable("temp", "temp") }
    ds.cloneVariable("temp", "b")
    intercept[Exception] { ds.cloneVariable("temp", "b") }
    // expired as-of version is rejected up front
    writeVersion(ds, ds.metadata(ds.latestVersion.get), "temp",
      Map(Seq(0L, 0L) -> 1.0))
    writeVersion(ds, ds.metadata(ds.latestVersion.get), "temp",
      Map(Seq(0L, 0L) -> 2.0))
    ds.expireVersions(2)
    intercept[Exception] { ds.cloneVariable("temp", "c", v1) }
  }
}
