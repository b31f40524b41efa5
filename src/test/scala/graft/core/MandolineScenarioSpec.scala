package graft.core

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import Model._

/** Ports of the reference's conformance scenarios
  * (test/io/mandoline/backend/hbase_test.clj:106-156): entire-flow,
  * grow/shrink/overwrite, linear-versions (time travel), scalar
  * variables, fill values incl. NaN, and the concurrency semantics of
  * the CAS-replacement commit protocol (lots-of-overlaps).
  */
class MandolineScenarioSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private def freshLake(): GraftLake =
    new GraftLake(spark,
      Files.createTempDirectory("graft_lake_").toString)

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

  test("entire-flow: create -> write -> read round-trip (hbase_test.clj:106-108)") {
    val lake = freshLake()
    lake.create("weather")
    val ds = lake.connect("weather")
    val cells = (for (i <- 0L until 4L; j <- 0L until 4L)
      yield (Seq(i, j): Seq[Long]) -> (i * 4 + j).toDouble).toMap
    val v1 = writeVersion(ds, meta2x2, "temp", cells)
    val got = readMap(ds.readSlab("temp", v1))
    assert(got == cells)
  }

  test("fill values: unwritten regions read as fill incl. NaN (hbase_test.clj:152-156)") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val v1 = writeVersion(ds, meta2x2, "temp",
      Map(Seq(0L, 0L) -> 1.0, Seq(3L, 3L) -> 2.0))
    val got = readMap(ds.readSlab("temp", v1))
    assert(got.size == 16)
    assert(got(Seq(0L, 0L)) == 1.0 && got(Seq(3L, 3L)) == 2.0)
    assert(got(Seq(1L, 2L)).isNaN) // untouched chunk
    assert(got(Seq(0L, 1L)).isNaN) // written chunk, untouched cell
  }

  test("fill-float and fill-short dtypes (hbase_test.clj:16-18)") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val meta = DatasetMeta(Seq(
      VariableMeta("f", "float", Seq(3), Seq(2), Double.NaN),
      VariableMeta("s", "short", Seq(3), Seq(2), -99.0)))
    val w = ds.newWriter(meta)
    w.writeSlab("f", cellsDF(Map(Seq(0L) -> 1.5)))
    w.writeSlab("s", cellsDF(Map(Seq(2L) -> 7.0)))
    val v = w.commit()
    val f = readMap(ds.readSlab("f", v))
    assert(f(Seq(0L)) == 1.5 && f(Seq(1L)).isNaN && f(Seq(2L)).isNaN)
    val sv = readMap(ds.readSlab("s", v))
    assert(sv == Map(Seq(0L) -> -99.0, Seq(1L) -> -99.0, Seq(2L) -> 7.0))
  }

  test("linear-versions: time travel across versions (hbase_test.clj:126-128)") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val v1 = writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 0L) -> 1.0))
    val v2 = writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 1L) -> 2.0))
    val v3 = writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 0L) -> 9.0))
    assert(v1 < v2 && v2 < v3)
    val r1 = readMap(ds.readSlab("temp", v1))
    assert(r1(Seq(0L, 0L)) == 1.0 && r1(Seq(0L, 1L)).isNaN)
    val r2 = readMap(ds.readSlab("temp", v2))
    // structural sharing: v2 sees v1's chunk via as-of fallback
    assert(r2(Seq(0L, 0L)) == 1.0 && r2(Seq(0L, 1L)) == 2.0)
    val r3 = readMap(ds.readSlab("temp", v3))
    assert(r3(Seq(0L, 0L)) == 9.0 && r3(Seq(0L, 1L)) == 2.0)
    assert(ds.versionIds() == Seq(v3, v2, v1)) // newest first
    assert(ds.versions(Some(2)).map(_.versionId) == Seq(v3, v2))
  }

  test("overwrite-dataset: partial chunk overwrite keeps old cells (hbase_test.clj:118-124)") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val v1 = writeVersion(ds, meta2x2, "temp",
      Map(Seq(0L, 0L) -> 1.0, Seq(0L, 1L) -> 2.0, Seq(1L, 0L) -> 3.0))
    val v2 = writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 0L) -> 10.0))
    val r2 = readMap(ds.readSlab("temp", v2))
    assert(r2(Seq(0L, 0L)) == 10.0)
    assert(r2(Seq(0L, 1L)) == 2.0 && r2(Seq(1L, 0L)) == 3.0)
    val r1 = readMap(ds.readSlab("temp", v1))
    assert(r1(Seq(0L, 0L)) == 1.0) // history immutable
  }

  test("grow-dataset: extent grows across versions (hbase_test.clj:110-112)") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val v1 = writeVersion(ds, DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(3), Seq(2), Double.NaN))),
      "t", Map(Seq(0L) -> 1.0, Seq(2L) -> 3.0))
    val grown = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(6), Seq(2), Double.NaN)))
    val v2 = writeVersion(ds, grown, "t", Map(Seq(4L) -> 5.0))
    val r2 = readMap(ds.readSlab("t", v2))
    assert(r2.size == 6)
    assert(r2(Seq(0L)) == 1.0 && r2(Seq(2L)) == 3.0 && r2(Seq(4L)) == 5.0)
    // grown region of the old edge chunk reads fill
    assert(r2(Seq(3L)).isNaN && r2(Seq(5L)).isNaN)
    // as-of v1 still sees the old shape
    assert(readMap(ds.readSlab("t", v1)).size == 3)
  }

  test("shrink-dataset: extent shrinks across versions (hbase_test.clj:114-116)") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val v1 = writeVersion(ds, DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(6), Seq(2), Double.NaN))),
      "t", (0L until 6L).map(i => (Seq(i): Seq[Long]) -> i.toDouble).toMap)
    val shrunk = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(3), Seq(2), Double.NaN)))
    val w = ds.newWriter(shrunk)
    w.writeSlab("t", cellsDF(Map(Seq(0L) -> 100.0)))
    val v2 = w.commit()
    val r2 = readMap(ds.readSlab("t", v2))
    assert(r2.size == 3)
    assert(r2(Seq(0L)) == 100.0 && r2(Seq(1L)) == 1.0 && r2(Seq(2L)) == 2.0)
    assert(readMap(ds.readSlab("t", v1)).size == 6)
  }

  test("write-scalar: 0-D variable (hbase_test.clj:130-132)") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val meta = DatasetMeta(Seq(
      VariableMeta("answer", "double", Seq.empty, Seq.empty, Double.NaN)))
    val v = writeVersion(ds, meta, "answer", Map(Seq.empty[Long] -> 42.0))
    assert(readMap(ds.readSlab("answer", v)) == Map(Seq.empty[Long] -> 42.0))
  }

  test("hyperslab region read prunes chunks") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val cells = (for (i <- 0L until 4L; j <- 0L until 4L)
      yield (Seq(i, j): Seq[Long]) -> (i * 4 + j).toDouble).toMap
    val v = writeVersion(ds, meta2x2, "temp", cells)
    val got = readMap(ds.readSlab("temp", v,
      region = Some(Seq((1L, 3L), (0L, 2L)))))
    assert(got.keySet == Set(Seq(1L, 0L), Seq(1L, 1L), Seq(2L, 0L), Seq(2L, 1L)))
    assert(got(Seq(2L, 1L)) == 9.0)
  }

  test("lots-of-overlaps: conflicting commit rejected, disjoint commit allowed (hbase_test.clj:148-150)") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val v1 = writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 0L) -> 1.0))
    // two writers snapshot at v1, then race
    val wa = ds.newWriter(meta2x2)
    val wb = ds.newWriter(meta2x2)
    wa.writeSlab("temp", cellsDF(Map(Seq(0L, 0L) -> 2.0)))
    wb.writeSlab("temp", cellsDF(Map(Seq(0L, 1L) -> 3.0))) // same chunk (0,0)!
    val va = wa.commit()
    intercept[CommitConflictException] { wb.commit() }
    // disjoint chunks commit fine concurrently
    val wc = ds.newWriter(meta2x2)
    val wd = ds.newWriter(meta2x2)
    wc.writeSlab("temp", cellsDF(Map(Seq(2L, 2L) -> 4.0)))
    wd.writeSlab("temp", cellsDF(Map(Seq(0L, 2L) -> 5.0)))
    val vc = wc.commit()
    val vd = wd.commit()
    assert(vc > va && vd > vc)
    val r = readMap(ds.readSlab("temp", vd))
    assert(r(Seq(0L, 0L)) == 2.0 && r(Seq(2L, 2L)) == 4.0 &&
      r(Seq(0L, 2L)) == 5.0)
  }

  test("chunk-at: point index lookup, as-of and exact-version forms (hbase.clj:184-229)") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val v1 = writeVersion(ds, meta2x2, "temp",
      Map(Seq(0L, 0L) -> 1.0, Seq(2L, 2L) -> 2.0))
    val v2 = writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 0L) -> 9.0))
    // as-of v2: chunk (0,0) resolves to the v2 rewrite, (1,1) to v1
    val asOf00 = ds.chunkAt("temp", Seq(0L, 0L), v2)
    val asOf11 = ds.chunkAt("temp", Seq(1L, 1L), v2)
    assert(asOf00.exists(_._1 == v2) && asOf11.exists(_._1 == v1))
    // exact-version: only entries written AT that version
    assert(ds.chunkAt("temp", Seq(0L, 0L), v1, exact = true)
      .exists(_._1 == v1))
    assert(ds.chunkAt("temp", Seq(1L, 1L), v2, exact = true).isEmpty)
    assert(ds.chunkAt("temp", Seq(3L, 3L), v2).isEmpty) // never written
    // the resolved hash reads back as real bytes
    val h = asOf00.get._2
    assert(ds.readChunk(h).nonEmpty)
  }

  test("content-addressed dedup: identical tiles share one chunk (hbase.clj:151-153)") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    // two chunks with identical content -> one stored chunk record
    val v = writeVersion(ds, meta2x2, "temp",
      Map(Seq(0L, 0L) -> 7.0, Seq(0L, 1L) -> 8.0,
        Seq(2L, 0L) -> 7.0, Seq(2L, 1L) -> 8.0))
    assert(ds.chunksDF.count() == 1)
    val refs = ds.refCounts.as[(String, Long)].collect().toMap
    assert(refs.values.sum == 2) // two index references to the chunk
    assert(readMap(ds.readSlab("temp", v))(Seq(2L, 1L)) == 8.0)
  }

  test("gc spares chunks staged by an in-flight (uncommitted) writer") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 0L) -> 1.0))
    val w = ds.newWriter(meta2x2)
    w.writeSlab("temp", cellsDF(Map(Seq(2L, 2L) -> 7.0)))
    assert(ds.gc() == 0) // staged chunk must survive
    val v = w.commit()
    assert(readMap(ds.readSlab("temp", v))(Seq(2L, 2L)) == 7.0)
  }

  test("staging the same coordinate twice with different content is rejected at commit") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val w = ds.newWriter(meta2x2)
    w.writeSlab("temp", cellsDF(Map(Seq(0L, 0L) -> 1.0)))
    w.writeSlab("temp", cellsDF(Map(Seq(0L, 1L) -> 2.0))) // same chunk (0,0)
    intercept[IllegalStateException] { w.commit() }
    // different variables / disjoint chunks across calls are fine
    val w2 = ds.newWriter(meta2x2)
    w2.writeSlab("temp", cellsDF(Map(Seq(0L, 0L) -> 1.0)))
    w2.writeSlab("temp", cellsDF(Map(Seq(2L, 2L) -> 3.0)))
    val v = w2.commit()
    assert(readMap(ds.readSlab("temp", v))(Seq(2L, 2L)) == 3.0)
  }

  test("gc reclaims orphaned chunks from aborted writers") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val v1 = writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 0L) -> 1.0))
    val w = ds.newWriter(meta2x2)
    w.writeSlab("temp", cellsDF(Map(Seq(3L, 3L) -> 99.0)))
    w.abort()
    assert(ds.chunksDF.count() == 2) // live + orphan
    assert(ds.gc(graceMs = 0L) == 1)
    assert(ds.chunksDF.count() == 1)
    assert(readMap(ds.readSlab("temp", v1))(Seq(0L, 0L)) == 1.0)
  }

  test("catalog: create/list/connect/destroy (hbase.clj:299-344)") {
    val lake = freshLake()
    lake.create("a"); lake.create("b")
    assert(lake.list() == Seq("a", "b"))
    intercept[IllegalArgumentException] { lake.create("") }
    intercept[RuntimeException] { lake.connect("nope") }
    lake.destroy("a")
    assert(lake.list() == Seq("b"))
  }

  test("with-and-without-caches: identical results (hbase_test.clj:107+)") {
    def run(cached: Boolean): Map[Seq[Long], Double] = {
      val lake = freshLake(); lake.create("d")
      val ds = lake.connect("d").withVersionCache(cached)
      val v1 = writeVersion(ds, meta2x2, "temp",
        Map(Seq(0L, 0L) -> 1.0, Seq(3L, 3L) -> 2.0))
      ds.versions(Some(1)) // warm the cache
      val v2 = writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 0L) -> 5.0))
      assert(ds.versionIds() == Seq(v2, v1)) // commit invalidated cache
      readMap(ds.readSlab("temp", v2))
    }
    val (withCache, withoutCache) = (run(true), run(false))
    assert(withCache.keySet == withoutCache.keySet)
    withCache.foreach { case (k, x) =>
      val y = withoutCache(k)
      assert(x == y || (x.isNaN && y.isNaN), s"cell $k: $x vs $y")
    }
  }

  test("lots-of-tiny-slices: many small sequential writes compose (hbase_test.clj:140-142)") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val versions = (0L until 8L).map { i =>
      // each write touches a single cell; chunks merge incrementally
      writeVersion(ds, meta2x2, "temp", Map(Seq(i / 4, i % 4) -> i.toDouble))
    }
    val last = readMap(ds.readSlab("temp", versions.last))
    (0L until 8L).foreach(i => assert(last(Seq(i / 4, i % 4)) == i.toDouble))
    // intermediate version sees exactly its prefix
    val mid = readMap(ds.readSlab("temp", versions(3)))
    assert(mid(Seq(0L, 3L)) == 3.0 && mid(Seq(1L, 0L)).isNaN)
  }

  test("overwrite-extend-dataset: overwrite + grow in one version (hbase_test.clj:122-124)") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val v1 = writeVersion(ds, DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(4), Seq(2), Double.NaN))),
      "t", (0L until 4L).map(i => (Seq(i): Seq[Long]) -> i.toDouble).toMap)
    val extended = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(6), Seq(2), Double.NaN)))
    val v2 = writeVersion(ds, extended, "t",
      Map(Seq(1L) -> 11.0, Seq(5L) -> 55.0)) // overwrite + extend
    val r2 = readMap(ds.readSlab("t", v2))
    assert(r2.size == 6)
    assert(r2(Seq(0L)) == 0.0 && r2(Seq(1L)) == 11.0 &&
      r2(Seq(2L)) == 2.0 && r2(Seq(3L)) == 3.0)
    assert(r2(Seq(4L)).isNaN && r2(Seq(5L)) == 55.0)
    assert(readMap(ds.readSlab("t", v1))(Seq(1L)) == 1.0)
  }

  test("error paths: unknown variable, version, chunk hash") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val v1 = writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 0L) -> 1.0))
    intercept[IllegalArgumentException] { ds.readSlab("nope", v1) }
    intercept[IllegalArgumentException] { ds.metadata(v1 + 999) }
    intercept[IllegalArgumentException] { ds.readChunk("deadbeef") }
    intercept[IllegalArgumentException] { ds.readChunk("") }
  }

  test("larger grid: 60x60 over 16-cell chunks round-trips") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(60, 60), Seq(4, 4), Double.NaN)))
    val cells = (for (i <- 0L until 60L; j <- 0L until 60L if (i * 61 + j) % 3 == 0)
      yield (Seq(i, j): Seq[Long]) -> (i * 60 + j).toDouble).toMap
    val v = writeVersion(ds, meta, "t", cells)
    val got = readMap(ds.readSlab("t", v))
    assert(got.size == 3600)
    cells.foreach { case (c, x) => assert(got(c) == x) }
    assert(got(Seq(0L, 1L)).isNaN)
    // region read touches only the overlapped chunks
    val sub = readMap(ds.readSlab("t", v, Some(Seq((10L, 14L), (20L, 22L)))))
    assert(sub.size == 8)
  }

  test("3-D variable round-trips with fills and region reads") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(4, 6, 5), Seq(2, 3, 2), Double.NaN)))
    val cells = (for (i <- 0L until 4L; j <- 0L until 6L; k <- 0L until 5L
      if (i + j + k) % 2 == 0)
      yield (Seq(i, j, k): Seq[Long]) -> (i * 100 + j * 10 + k).toDouble).toMap
    val v = writeVersion(ds, meta, "t", cells)
    val got = readMap(ds.readSlab("t", v))
    assert(got.size == 120)
    cells.foreach { case (c, x) => assert(got(c) == x) }
    assert(got(Seq(0L, 0L, 1L)).isNaN)
    val sub = readMap(ds.readSlab("t", v,
      Some(Seq((1L, 3L), (2L, 4L), (0L, 5L)))))
    assert(sub.size == 2 * 2 * 5)
    assert(sub(Seq(2L, 2L, 2L)) == 222.0)
  }

  test("parallel commits: 4 threads on disjoint chunks all land under the lock") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    // 1x2 chunking: row t chunk-coords (t,0) and (t,1) — one chunk row
    // per thread, genuinely disjoint
    val meta = DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(4, 4), Seq(1, 2), Double.NaN)))
    val futures = (0 until 4).map { t =>
      Future {
        val w = ds.newWriter(meta)
        w.writeSlab("temp", cellsDF(Map(
          Seq(t.toLong, 0L) -> (t * 10.0), Seq(t.toLong, 3L) -> (t + 0.5))))
        w.commit()
      }
    }
    val ids = Await.result(Future.sequence(futures), 120.seconds)
    assert(ids.toSet.size == 4) // four distinct committed versions
    val r = readMap(ds.readSlab("temp", ids.max))
    (0 until 4).foreach { t =>
      assert(r(Seq(t.toLong, 0L)) == t * 10.0)
      assert(r(Seq(t.toLong, 3L)) == t + 0.5)
    }
  }

  test("refs compaction preserves counts and shrinks the log") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    (0 until 3).foreach { i =>
      writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 0L) -> i.toDouble))
    }
    val before = ds.refCounts.as[(String, Long)].collect().toMap
    ds.compactRefs()
    val after = ds.refCounts.as[(String, Long)].collect().toMap
    assert(after == before)
    assert(ds.refsDF.count() == after.size) // one row per hash now
  }

  test("streaming ingest: micro-batches land as successive versions (foreachBatch -> SlabWriter)") {
    import org.apache.spark.sql.streaming.Trigger
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(16), Seq(4), Double.NaN)))
    // a rate-free deterministic source: parquet files arriving as
    // micro-batches (one file per trigger)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_src_")
    val batch1 = (0L until 8L).map(i => (Seq(i), i.toDouble))
    val batch2 = (8L until 16L).map(i => (Seq(i), i * 10.0))
    batch1.toDF("coord", "value").coalesce(1)
      .write.mode("append").parquet(srcDir.toString)
    val sch = spark.read.parquet(srcDir.toString).schema
    val stream = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val q = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val w = ds.newWriter(meta)
          w.writeSlab("t", batch)
          w.commit(); ()
        }
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    batch2.toDF("coord", "value").coalesce(1)
      .write.mode("append").parquet(srcDir.toString)
    val q2 = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val w = ds.newWriter(meta)
          w.writeSlab("t", batch)
          w.commit(); ()
        }
    }.trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val vs = ds.versionIds()
    assert(vs.size >= 2, s"expected >=2 versions, got $vs")
    val last = readMap(ds.readSlab("t", vs.head))
    assert(last(Seq(3L)) == 3.0 && last(Seq(12L)) == 120.0)
  }

  test("diffSlab: metadata-only shrink emits disappearing cells (no chunk rewritten)") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val v1 = writeVersion(ds, DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(6), Seq(2), Double.NaN))),
      "t", (0L until 6L).map(i => (Seq(i): Seq[Long]) -> i.toDouble).toMap)
    // shrink 6 -> 3 without writing any cell: same index rows resolve
    // at both versions, but cells 3..5 logically vanish
    val v2 = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(3), Seq(2), Double.NaN)))).commit()
    val d = ds.diffSlab("t", v1, v2)
      .as[(Seq[Long], Option[Double], Option[Double])].collect()
      .map(r => r._1.head -> ((r._2, r._3))).toMap
    assert(d == Map(3L -> ((Some(3.0), None)), 4L -> ((Some(4.0), None)),
      5L -> ((Some(5.0), None))))
    // and the reverse direction reports them appearing
    val g = ds.diffSlab("t", v2, v1)
      .as[(Seq[Long], Option[Double], Option[Double])].collect()
      .map(r => r._1.head -> ((r._2, r._3))).toMap
    assert(g == Map(3L -> ((None, Some(3.0))), 4L -> ((None, Some(4.0))),
      5L -> ((None, Some(5.0)))))
  }

  test("diffSlab: fillValue-only change re-masks stored cells") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    // v1: fill NaN; cell 0 stores 0.0 (real data), cell 3 unwritten
    val v1 = writeVersion(ds, DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(4), Seq(2), Double.NaN))),
      "t", Map(Seq(0L) -> 0.0, Seq(1L) -> 7.0))
    // v2: metadata-only commit switching fill to 0.0 — the stored 0.0
    // becomes indistinguishable from fill (data -> null); nothing else
    // changes
    val v2 = ds.newWriter(DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(4), Seq(2), 0.0)))).commit()
    val d = ds.diffSlab("t", v1, v2)
      .as[(Seq[Long], Option[Double], Option[Double])].collect()
      .map(r => r._1.head -> ((r._2, r._3))).toMap
    assert(d == Map(0L -> ((Some(0.0), None))))
  }

  test("diffSlab: grow still prunes unchanged interior chunks by hash") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val v1 = writeVersion(ds, DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(4), Seq(2), Double.NaN))),
      "t", (0L until 4L).map(i => (Seq(i): Seq[Long]) -> i.toDouble).toMap)
    val v2 = writeVersion(ds, DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8), Seq(2), Double.NaN))),
      "t", Map(Seq(6L) -> 66.0))
    val d = ds.diffSlab("t", v1, v2)
      .as[(Seq[Long], Option[Double], Option[Double])].collect()
      .map(r => r._1.head -> ((r._2, r._3))).toMap
    assert(d == Map(6L -> ((None, Some(66.0)))))
  }

  test("rechunk: new layout, same cells, old variable untouched") {
    val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
    val cells = (for (i <- 0L until 4L; j <- 0L until 4L if i != j)
      yield (Seq(i, j): Seq[Long]) -> (i * 4 + j).toDouble).toMap
    val v1 = writeVersion(ds, meta2x2, "temp", cells)
    val v2 = ds.rechunk("temp", v1, "temp_rows", Seq(1, 4))
    // identical logical content under the new layout (incl. fills)
    val a = readMap(ds.readSlab("temp", v2))
    val b = readMap(ds.readSlab("temp_rows", v2))
    assert(a.keySet == b.keySet)
    a.foreach { case (k, x) =>
      val y = b(k)
      assert(x == y || (x.isNaN && y.isNaN), s"cell $k: $x vs $y")
    }
    // layout really changed: 2x2 grid (4 chunks) -> 1x4 rows (4 rows,
    // one per i, but row 0..3 each hold cells) — count index rows
    val n = ds.resolveIndex("temp_rows", v2).count()
    assert(n == 4, s"expected 4 row-chunks, got $n")
    // old variable still reads its original content at v1
    val orig = readMap(ds.readSlab("temp", v1)).filter(!_._2.isNaN)
    assert(orig == cells)
    intercept[IllegalArgumentException] {
      ds.rechunk("temp", v2, "temp_rows", Seq(1, 4)) // name collision
    }
  }

  test("diffSlab equals the brute-force two-slab compare on randomized flows") {
    // deterministic randomized law test: whatever combination of
    // overwrite / grow / shrink / fill-change the two versions carry,
    // the pruned CDC must equal the dense readSlab-vs-readSlab diff
    val rnd = new scala.util.Random(4242L)
    def sideMap(ds: GraftDataset, v: Long, fill: Double) =
      readMap(ds.readSlab("t", v)).map { case (c, x) =>
        val isFill = x == fill || (x.isNaN && fill.isNaN)
        c -> (if (isFill) None else Some(x))
      }
    (1 to 6).foreach { _ =>
      val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
      val rank = 1 + rnd.nextInt(2)
      val shape1 = Seq.fill(rank)(1L + rnd.nextInt(6))
      val cdims = shape1.map(s => 1L + rnd.nextLong(s))
      val fill1 = if (rnd.nextBoolean()) Double.NaN else 0.0
      def randCells(shape: Seq[Long]): Map[Seq[Long], Double] =
        (0 until (1 + rnd.nextInt(8))).map { _ =>
          shape.map(s => rnd.nextLong(s)) ->
            Seq(0.0, 1.0, 2.0, 7.5)(rnd.nextInt(4))
        }.toMap
      val v1 = writeVersion(ds, DatasetMeta(Seq(
        VariableMeta("t", "double", shape1, cdims, fill1))),
        "t", randCells(shape1))
      // v2: random shape change (clamped >= 1) and possibly a fill flip;
      // metadata-only half the time
      val shape2 = shape1.map(s =>
        math.max(1L, s + rnd.nextInt(5) - 2))
      val fill2 = if (rnd.nextBoolean()) fill1
        else (if (fill1.isNaN) 0.0 else Double.NaN)
      val m2 = DatasetMeta(Seq(
        VariableMeta("t", "double", shape2, cdims, fill2)))
      val v2 =
        if (rnd.nextBoolean()) ds.newWriter(m2).commit()
        else writeVersion(ds, m2, "t", randCells(shape2))
      val expected = {
        val a = sideMap(ds, v1, fill1)
        val b = sideMap(ds, v2, fill2)
        (a.keySet ++ b.keySet).flatMap { c =>
          val o = a.getOrElse(c, None)
          val n = b.getOrElse(c, None)
          if (o == n) None else Some(c -> ((o, n)))
        }.toMap
      }
      val got = ds.diffSlab("t", v1, v2)
        .as[(Seq[Long], Option[Double], Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expected,
        s"shape1=$shape1 shape2=$shape2 cdims=$cdims " +
          s"fill1=$fill1 fill2=$fill2\n got=$got\n exp=$expected")
    }
  }

  test("readSlabs equals the per-variable readSlab join on randomized flows") {
    val rnd = new scala.util.Random(777L)
    (1 to 4).foreach { _ =>
      val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
      val rank = 1 + rnd.nextInt(2)
      val shape = Seq.fill(rank)(1L + rnd.nextInt(6))
      val cdims = shape.map(s => 1L + rnd.nextLong(s))
      val fills = Seq(Double.NaN, 0.0)
      val meta = DatasetMeta(Seq("a", "b").zipWithIndex.map { case (n, i) =>
        VariableMeta(n, "double", shape, cdims, fills(i)) })
      def randCells(): Map[Seq[Long], Double] =
        (0 until (1 + rnd.nextInt(6))).map { _ =>
          shape.map(s => rnd.nextLong(s)) -> (1.0 + rnd.nextInt(9))
        }.toMap
      // two versions touching both variables (as-of fallback exercised)
      val w1 = ds.newWriter(meta)
      w1.writeSlab("a", cellsDF(randCells()))
      w1.writeSlab("b", cellsDF(randCells()))
      w1.commit()
      val w2 = ds.newWriter(meta)
      w2.writeSlab("a", cellsDF(randCells()))
      val v2 = w2.commit()
      val multi = ds.readSlabs(Seq("a", "b"), v2)
        .as[(Seq[Long], Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val a = readMap(ds.readSlab("a", v2))
      val b = readMap(ds.readSlab("b", v2))
      assert(multi.keySet == a.keySet && multi.keySet == b.keySet)
      multi.foreach { case (c, (x, y)) =>
        def eq(p: Double, q: Double) = p == q || (p.isNaN && q.isNaN)
        assert(eq(x, a(c)) && eq(y, b(c)), s"cell $c: ($x,$y) vs " +
          s"(${a(c)},${b(c)}) shape=$shape cdims=$cdims")
      }
    }
  }

  test("rechunk preserves the cell map under randomized layouts") {
    val rnd = new scala.util.Random(31337L)
    (1 to 4).foreach { _ =>
      val lake = freshLake(); lake.create("d"); val ds = lake.connect("d")
      val rank = 1 + rnd.nextInt(2)
      val shape = Seq.fill(rank)(1L + rnd.nextInt(6))
      val cdims = shape.map(s => 1L + rnd.nextLong(s))
      val newDims = shape.map(s => 1L + rnd.nextLong(s))
      val cells = (0 until (1 + rnd.nextInt(10))).map { _ =>
        shape.map(s => rnd.nextLong(s)) -> (1.0 + rnd.nextInt(9))
      }.toMap
      val v1 = writeVersion(ds, DatasetMeta(Seq(
        VariableMeta("t", "double", shape, cdims, Double.NaN))), "t", cells)
      val v2 = ds.rechunk("t", v1, "t2", newDims)
      val orig = readMap(ds.readSlab("t", v1))
      val re = readMap(ds.readSlab("t2", v2))
      assert(orig.keySet == re.keySet, s"shape=$shape $cdims->$newDims")
      orig.foreach { case (c, x) =>
        val y = re(c)
        assert(x == y || (x.isNaN && y.isNaN),
          s"cell $c: $x vs $y, $cdims -> $newDims")
      }
    }
  }

  test("lake.stats: one accounting row per dataset") {
    val lake = freshLake()
    lake.create("a"); lake.create("b")
    writeVersion(lake.connect("a"), meta2x2, "temp", Map(Seq(0L, 0L) -> 1.0))
    val rows = lake.stats().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("a" -> 1L, "b" -> 0L)) // n_versions per dataset
  }

  test("version-log scaling: reads stay bounded-I/O after 500+ commits") {
    // the streaming-ingest pattern (st06) commits once per micro-batch;
    // without the compacted metas snapshot every slab read would
    // point-read one JSON record per version on the driver
    val lake = freshLake(); lake.create("big"); val ds = lake.connect("big")
    val first = writeVersion(ds, meta2x2, "temp",
      Map(Seq(0L, 0L) -> 1.0, Seq(3L, 3L) -> 2.0))
    var last = first
    // metadata-only commits: cheap, but each appends a version record
    (1 to 520).foreach(_ => last = ds.newWriter(meta2x2).commit())
    assert(ds.versionIds().length == 521)

    // a FRESH handle (cold caches, like a new reader process)
    val fresh = lake.connect("big")
    fresh.metaPointReads.set(0L)
    val got = readMap(fresh.readSlab("temp", last))
    assert(got(Seq(0L, 0L)) == 1.0 && got(Seq(3L, 3L)) == 2.0)
    val reads = fresh.metaPointReads.get
    assert(reads < 40,
      s"slab read after 521 versions did $reads driver metadata point " +
        "reads — the metas snapshot is not bounding the read path")
    // versions() listing is snapshot-backed too
    fresh.metaPointReads.set(0L)
    assert(fresh.versions().length == 521)
    assert(fresh.metaPointReads.get < 40)

    // LISTING is bounded too: the snapshot carries the live-id list
    // and folded records leave the hot dirs, so versionIds() /
    // latestVersion list O(snapshotEvery) records, not O(#versions) —
    // at ~500k streaming commits an unbounded listing would be ~500
    // paged LIST round trips per micro-batch on an object store
    val fresh2 = lake.connect("big")
    fresh2.versionListEntries.set(0L)
    assert(fresh2.versionIds().length == 521)
    val listed = fresh2.versionListEntries.get
    assert(listed < 80,
      s"versionIds() after 521 commits listed $listed version records — " +
        "the metas snapshot is not bounding the version-log listing")
    // a full read incl. liveness check stays bounded as well
    fresh2.versionListEntries.set(0L)
    assert(readMap(fresh2.readSlab("temp", last))(Seq(0L, 0L)) == 1.0)
    assert(fresh2.versionListEntries.get < 80)

    // retention after deep history: expiry overrides the snapshot's
    // stale live flags and the follow-up fold re-bounds the hot dirs
    val expired = fresh2.expireVersions(keepLast = 100)
    assert(expired.length == 421)
    val fresh3 = lake.connect("big")
    fresh3.versionListEntries.set(0L)
    assert(fresh3.versionIds().length == 100)
    assert(fresh3.versionIds().forall(_ > expired.max))
    assert(fresh3.versionListEntries.get < 80)
    intercept[IllegalArgumentException](fresh3.readSlab("temp", expired.head))
  }

  test("index-log compaction: merged store preserves as-of reads") {
    def sameCells(a: Map[Seq[Long], Double], b: Map[Seq[Long], Double]) =
      a.keySet == b.keySet && a.forall { case (k, x) =>
        val y = b(k); x == y || (x.isNaN && y.isNaN)
      }
    val lake = freshLake(); lake.create("c"); val ds = lake.connect("c")
    val v1 = writeVersion(ds, meta2x2, "temp",
      Map(Seq(0L, 0L) -> 1.0, Seq(2L, 2L) -> 2.0))
    val v2 = writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 0L) -> 9.0))
    val v3 = writeVersion(ds, meta2x2, "temp", Map(Seq(3L, 3L) -> 7.0))
    val at2 = readMap(ds.readSlab("temp", v2))
    val at3 = readMap(ds.readSlab("temp", v3))

    assert(ds.compactIndexLog() == 3) // three per-version partitions fold
    assert(ds.compactIndexLog() == 0) // idempotent at the same head
    // exact same logical table: time travel, point lookups, stats
    assert(sameCells(readMap(ds.readSlab("temp", v2)), at2))
    assert(sameCells(readMap(ds.readSlab("temp", v3)), at3))
    assert(ds.chunkAt("temp", Seq(0L, 0L), v2).exists(_._1 == v2))
    // chunk (1,1): v1 wrote cell (2,2), v3 rewrote it with (3,3) merged
    assert(ds.chunkAt("temp", Seq(1L, 1L), v3).exists(_._1 == v3))
    assert(ds.chunkAt("temp", Seq(1L, 1L), v1).exists(_._1 == v1))

    // commits after compaction land as tail partitions; reads span both
    val v4 = writeVersion(ds, meta2x2, "temp", Map(Seq(0L, 2L) -> 5.0))
    val at4 = readMap(ds.readSlab("temp", v4))
    assert(at4(Seq(0L, 0L)) == 9.0 && at4(Seq(3L, 3L)) == 7.0 &&
      at4(Seq(0L, 2L)) == 5.0)
    assert(ds.compactIndexLog() == 1) // folds just the tail partition

    // retention over a merged store: survivors fold back in when the
    // merged boundary is newer than the retention boundary
    val expired = ds.expireVersions(keepLast = 2)
    assert(expired == Seq(v1, v2))
    val head = readMap(ds.readSlab("temp", v4))
    assert(sameCells(head, at4))
    assert(sameCells(readMap(ds.readSlab("temp", v3)), at3))
    intercept[IllegalArgumentException](ds.readSlab("temp", v2))

    // gc over the merged layout still sees every live reference
    assert(ds.gc(graceMs = 0L) >= 0L)
    assert(sameCells(readMap(ds.readSlab("temp", v4)), at4))
  }

  test("index-log compaction is incremental: fold I/O tracks the tail, not the store") {
    val lake = freshLake(); lake.create("inc"); val ds = lake.connect("inc")
    // v1: a BIG version (64 chunks -> 64 index rows)
    val metaBig = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(64L), Seq(1L), Double.NaN)))
    val v1 = writeVersion(ds, metaBig, "t",
      (0L until 64L).map(i => Seq(i) -> i.toDouble).toMap)
    assert(ds.compactIndexLog() == 1)
    val firstFold = ds.lastFoldRowsWritten.get
    assert(firstFold == 64, s"first fold wrote $firstFold rows")

    // v2: a SMALL version (2 chunks). The second fold must write only
    // the 2-row tail — a monolithic rewrite would write 66.
    val v2 = writeVersion(ds, metaBig, "t",
      Map(Seq(0L) -> 100.0, Seq(1L) -> 101.0))
    assert(ds.compactIndexLog() == 1)
    val secondFold = ds.lastFoldRowsWritten.get
    assert(secondFold == 2,
      s"second fold wrote $secondFold rows — not incremental")

    // reads across both segments are exact
    val at2 = readMap(ds.readSlab("t", v2))
    assert(at2(Seq(0L)) == 100.0 && at2(Seq(1L)) == 101.0 &&
      at2(Seq(5L)) == 5.0)
    assert(readMap(ds.readSlab("t", v1))(Seq(0L)) == 0.0)

    // past maxSegments the fold LEVEL-MERGES into one segment (read
    // fan-in stays bounded; the full rewrite amortizes LSM-style)
    spark.conf.set("spark.graft.index.maxSegments", "2")
    try {
      val v3 = writeVersion(ds, metaBig, "t", Map(Seq(2L) -> 200.0))
      assert(ds.compactIndexLog() == 1)
      assert(ds.lastFoldRowsWritten.get == 67,
        "level merge should rewrite all 67 rows into one segment")
      val at3 = readMap(ds.readSlab("t", v3))
      assert(at3(Seq(0L)) == 100.0 && at3(Seq(2L)) == 200.0 &&
        at3(Seq(9L)) == 9.0)
      assert(readMap(ds.readSlab("t", v1))(Seq(1L)) == 1.0)
      // next fold after the merge is incremental again
      val v4 = writeVersion(ds, metaBig, "t", Map(Seq(3L) -> 300.0))
      assert(ds.compactIndexLog() == 1)
      assert(ds.lastFoldRowsWritten.get == 1)
      assert(readMap(ds.readSlab("t", v4))(Seq(3L)) == 300.0)
    } finally spark.conf.unset("spark.graft.index.maxSegments")
  }

  test("metadata-only folds extend the last segment, not the manifest") {
    val lake = freshLake(); lake.create("mo"); val ds = lake.connect("mo")
    def m(n: Long) = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(n), Seq(1L), Double.NaN)))
    writeVersion(ds, m(4), "t",
      (0L until 4L).map(i => Seq(i) -> i.toDouble).toMap)
    assert(ds.compactIndexLog() == 1)

    // a metadata-heavy cadence (ALTER/RENAME per fold): each fold
    // advances the boundary but must NOT append a rows-free segment —
    // the manifest would grow without bound (rows-free segments never
    // trip the level merge)
    (1 to 6).foreach { i =>
      ds.newWriter(m(4L + i)).commit()
      assert(ds.compactIndexLog() == 0L)
    }
    val mdir = new org.apache.hadoop.fs.Path(s"${ds.path}/indices_merged")
    val hfs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val newest = hfs.listStatus(mdir).map(_.getPath.getName)
      .filter(n => n.startsWith("_segments-") && n.endsWith(".json"))
      .map(_.stripPrefix("_segments-").stripSuffix(".json").toLong).max
    val p = new org.apache.hadoop.fs.Path(mdir, s"_segments-$newest.json")
    val bytes = new Array[Byte](hfs.getFileStatus(p).getLen.toInt)
    val in = hfs.open(p); try in.readFully(bytes) finally in.close()
    val nSegs = new String(bytes, "UTF-8").linesIterator.count(_.nonEmpty)
    assert(nSegs == 1, s"manifest grew to $nSegs segments on " +
      "metadata-only folds")

    // the extended boundary still reads exactly, and the next data
    // fold stays incremental
    val head = ds.latestVersion.get
    val at = readMap(ds.readSlab("t", head))
    assert(at.size == 10 && at(Seq(3L)) == 3.0 && at(Seq(9L)).isNaN)
    writeVersion(ds, m(10), "t", Map(Seq(9L) -> 90.0))
    assert(ds.compactIndexLog() == 1)
    assert(ds.lastFoldRowsWritten.get == 1)
  }

  test("pre-manifest merged store (upto=N) is readable and adopted by the next fold") {
    val lake = freshLake(); lake.create("leg"); val ds = lake.connect("leg")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8L), Seq(1L), Double.NaN)))
    val v1 = writeVersion(ds, meta, "t",
      (0L until 8L).map(i => Seq(i) -> i.toDouble).toMap)
    val v2 = writeVersion(ds, meta, "t", Map(Seq(0L) -> 50.0))

    // simulate the layout an OLDER fold left behind: every index row
    // in one upto=<head> dir, per-version partitions already swept,
    // and NO segment manifest
    val mergedDir = s"${ds.path}/indices_merged"
    ds.indicesDF.write.parquet(s"$mergedDir/upto=$v2")
    val idxDir = new org.apache.hadoop.fs.Path(s"${ds.path}/indices")
    val hfs = idxDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.listStatus(idxDir).map(_.getPath)
      .filter(_.getName.startsWith("versionId="))
      .foreach(p => hfs.delete(p, true))

    // reads resolve entirely from the legacy store
    val at2 = readMap(ds.readSlab("t", v2))
    assert(at2(Seq(0L)) == 50.0 && at2(Seq(5L)) == 5.0)
    assert(readMap(ds.readSlab("t", v1))(Seq(0L)) == 0.0)

    // the next fold adopts it as a segment — O(tail) I/O, no rewrite
    val v3 = writeVersion(ds, meta, "t", Map(Seq(1L) -> 60.0))
    assert(ds.compactIndexLog() == 1)
    assert(ds.lastFoldRowsWritten.get == 1,
      "adopting the legacy store must not rewrite it")
    // now manifest-referenced: gc must leave it alone
    ds.gc(graceMs = 0L)
    val at3 = readMap(ds.readSlab("t", v3))
    assert(at3(Seq(0L)) == 50.0 && at3(Seq(1L)) == 60.0 &&
      at3(Seq(7L)) == 7.0)
  }

  test("latestVersion never regresses for an unlocked reader racing snapshot folds") {
    val lake = freshLake(); lake.create("mono"); val ds = lake.connect("mono")
    def m(n: Long) = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(n), Seq(4L), Double.NaN)))
    // an independent uncached handle, like a reader in another process
    val reader = new GraftDataset(spark, ds.path).withVersionCache(false)
    @volatile var stop = false
    @volatile var fail: Option[String] = None
    val th = new Thread(() => {
      var last = 0L
      while (!stop && fail.isEmpty) {
        reader.latestVersion.foreach { v =>
          if (v < last)
            fail = Some(s"latestVersion regressed $last -> $v — a " +
              "snapshot fold hid hot version records from the reader")
          last = math.max(last, v)
        }
      }
    })
    th.start()
    // a metadata-commit storm crossing multiple snapshot-fold
    // boundaries (folds run every 16th commit and archive the hot
    // records the reader is concurrently listing)
    try (1 to 40).foreach(i => ds.newWriter(m(4L + i)).commit())
    finally { stop = true; th.join(10000) }
    fail.foreach(msg => assert(false, msg))
  }

  test("cellHistory: forward-filled series; decodes distinct contents only; retention clamp") {
    val lake = freshLake()
    lake.create("h")
    val ds = lake.connect("h")
    writeVersion(ds, meta2x2, "temp", Map((Seq(1L, 1L): Seq[Long]) -> 5.0))
    writeVersion(ds, meta2x2, "temp", Map((Seq(3L, 3L): Seq[Long]) -> 9.0))
    // idempotent re-put: the merged chunk content equals v1's, so the
    // content-addressed hash dedups and cellHistory decodes it ONCE
    writeVersion(ds, meta2x2, "temp", Map((Seq(1L, 1L): Seq[Long]) -> 5.0))
    writeVersion(ds, meta2x2, "temp",
      Map((Seq(1L, 1L): Seq[Long]) -> Double.NaN))
    val before = ChunkCodec.chunksDecoded.get()
    val sc = spark.sparkContext
    sc.setJobGroup("cell-history", "cellHistory point query")
    val hist = graft.operators.MandolineOps
      .cellHistory(ds, "temp", Seq(1L, 1L))
      .select("version_ord", "value")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    sc.clearJobGroup()
    val decoded = ChunkCodec.chunksDecoded.get() - before
    assert(hist == Map(1L -> Some(5.0), 2L -> Some(5.0),
      3L -> Some(5.0), 4L -> None))
    // chunk (0,0) has 3 writes but only 2 distinct contents; chunk
    // (1,1)'s v2 write is never read (index-pruned)
    assert(decoded == 2L, s"decoded $decoded chunks, wanted 2")
    // the decodes are DRIVER-SIDE point reads: the whole history
    // query is ONE Spark job (the pruned index collect) plus at most
    // one for the output collect — never a job per distinct content
    val jobs = sc.statusTracker.getJobIdsForGroup("cell-history").length
    assert(jobs <= 2, s"cellHistory ran $jobs jobs — a job per " +
      "content would make the point query O(overwrites) round-trips")
    // retention: live versions re-base the ordinals; the surviving
    // below-floor write decodes via the oldest-live clamp
    ds.expireVersions(keepLast = 2)
    val hist2 = graft.operators.MandolineOps
      .cellHistory(ds, "temp", Seq(1L, 1L))
      .select("version_ord", "value")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(hist2 == Map(1L -> Some(5.0), 2L -> None))
  }

  test("metadata JSON round-trips incl. NaN fill") {
    val m = DatasetMeta(Seq(
      VariableMeta("x", "double", Seq(4, 4), Seq(2, 2), Double.NaN),
      VariableMeta("y", "short", Seq(3), Seq(2), -1.0),
      VariableMeta("z", "double", Seq.empty, Seq.empty, 0.5)))
    val rt = metaFromJson(metaToJson(m))
    assert(rt.variables.map(_.name) == Seq("x", "y", "z"))
    assert(rt.variable("x").fillValue.isNaN)
    assert(rt.variable("y").fillValue == -1.0)
    assert(rt.variable("z").shape.isEmpty)
  }
}
