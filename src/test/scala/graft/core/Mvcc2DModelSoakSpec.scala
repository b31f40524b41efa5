package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import Model._

/** Rank-2 generative model test of the MVCC store: random programs of
  * write / per-dimension grow & shrink / metadata-only commit / 2-D
  * coordinate-box SQL DELETE / index compaction / retention / packing /
  * gc over a 2-D variable, checked cell-exactly against an in-memory
  * model. The 1-D soak
  * ([[MvccModelSoakSpec]]) covers the DDL/epoch/branch surface; this
  * spec reaches what rank 1 structurally can't:
  *
  *   - row-major chunk GRIDS (a cell's chunk is (i/c0, j/c1), edge
  *     tiles are partial in each dim independently),
  *   - PER-DIM shape masking (a shrink in dim 1 with a grow in dim 0
  *     must mask rewritten chunks per-axis, not by a scalar bound —
  *     reads mask to min(as-of shape, writer shape) in EVERY dim,
  *     ChunkCodec decode semantics per hbase_test.clj:106-156),
  *   - hyperslab REGION clipping (readSlab's region prunes chunks by
  *     per-dim interval overlap before any I/O),
  *   - 2-D predicate pushdown through the DSv2 scan (x0 AND x1 range
  *     conjuncts must clip to the same box the model computes).
  *
  * Program count scales with -Dgraft.soak2d.programs (default 60).
  */
class Mvcc2DModelSoakSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private type Coord = (Long, Long)

  /** One committed chunk write: the 2-D shape it was encoded under and
    * its explicit cells (everything else in the tile is fill).
    */
  private case class ChunkEntry(writerShape: (Long, Long),
      cells: Map[Coord, Double])

  /** Reference model of one 2-D variable's full history — the rank-2
    * generalization of the 1-D soak's ModelStore: a partial-chunk
    * write merges the snapshot chunk's cells but drops those outside
    * the new shape IN ANY dim, while an untouched chunk keeps its
    * stored cells.
    */
  private class Model2D(val c0: Long, val c1: Long) {
    // versionId -> (as-of shape, chunk coord -> entry written AT vid)
    var versions: Vector[(Long, (Long, Long), Map[Coord, ChunkEntry])] =
      Vector.empty
    var expired: Set[Long] = Set.empty

    private def chunkOf(cell: Coord): Coord =
      (cell._1 / c0, cell._2 / c1)

    private def resolve(chunk: Coord, asOf: Long): Option[ChunkEntry] =
      versions.filter(_._1 <= asOf)
        .flatMap(v => v._3.get(chunk).map(v._1 -> _))
        .sortBy(_._1).lastOption.map(_._2)

    def shapeAt(asOf: Long): (Long, Long) =
      versions.filter(_._1 <= asOf).maxBy(_._1)._2

    private def inBox(cell: Coord, shape: (Long, Long)): Boolean =
      cell._1 < shape._1 && cell._2 < shape._2

    /** The dense slab the engine must produce at `asOf`, optionally
      * clipped to a [lo, hi) region per dim.
      */
    def slab(asOf: Long,
        region: Option[((Long, Long), (Long, Long))] = None)
        : Map[Coord, Double] = {
      val (s0, s1) = shapeAt(asOf)
      val ((lo0, hi0), (lo1, hi1)) =
        region.getOrElse(((0L, s0), (0L, s1)))
      (for {
        i <- math.max(0L, lo0) until math.min(s0, hi0)
        j <- math.max(0L, lo1) until math.min(s1, hi1)
      } yield {
        val cell = (i, j)
        val value = resolve(chunkOf(cell), asOf) match {
          case Some(e) if inBox(cell, e.writerShape) =>
            e.cells.getOrElse(cell, Double.NaN)
          case _ => Double.NaN
        }
        cell -> value
      }).toMap
    }

    /** Apply a write of `cells` under `shape` as committed `vid`
      * (cells already within shape; snapshot = model HEAD).
      */
    def write(vid: Long, shape: (Long, Long),
        cells: Map[Coord, Double]): Unit = {
      val head = versions.map(_._1).maxOption.getOrElse(0L)
      val touched = cells.keySet.map(chunkOf)
      val entries = touched.map { cc =>
        val merged = resolve(cc, head).map(_.cells)
          .getOrElse(Map.empty[Coord, Double])
          .filter { case (cell, _) => inBox(cell, shape) } ++
          cells.filter { case (cell, _) => chunkOf(cell) == cc }
        cc -> ChunkEntry(shape, merged)
      }.toMap
      versions :+= ((vid, shape, entries))
    }

    def metaOnly(vid: Long, shape: (Long, Long)): Unit =
      versions :+= ((vid, shape, Map.empty))

    def liveVersions: Seq[Long] =
      versions.map(_._1).filterNot(expired).sorted
  }

  private def runProgram(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val c0 = 1L + rnd.nextInt(3)
    val c1 = 1L + rnd.nextInt(3)
    val model = new Model2D(c0, c1)
    val root = Files.createTempDirectory(s"graft_soak2d_${seed}_").toString
    val lake = new GraftLake(spark, root)
    lake.create("d")
    val ds = lake.connect("d")
    // SQL surface for the box-DELETE op (unique catalog name per
    // program: Spark caches catalog instances by name)
    val cat = s"soak2d$seed"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    var shape = (2L + rnd.nextInt(5), 2L + rnd.nextInt(5))

    def meta(s: (Long, Long)) = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(s._1, s._2), Seq(c0, c1),
        Double.NaN)))

    def randCells(s: (Long, Long)): Map[Coord, Double] =
      Seq.fill(1 + rnd.nextInt(5))(
        (rnd.nextLong(s._1), rnd.nextLong(s._2)))
        .distinct.map(c => c -> (rnd.nextInt(90) + 1).toDouble).toMap

    def bumpDim(x: Long): Long = math.max(1L, x + rnd.between(-2, 3))

    def randBox(s: (Long, Long)): ((Long, Long), (Long, Long)) = {
      def iv(n: Long): (Long, Long) = {
        val lo = rnd.nextLong(n)
        (lo, lo + 1 + rnd.nextLong(n - lo))
      }
      (iv(s._1), iv(s._2))
    }

    val steps = 5 + rnd.nextInt(3)
    (0 until steps).foreach { step =>
      val op =
        if (step == 0 || model.versions.isEmpty) 0 else rnd.nextInt(14)
      op match {
        case 0 | 1 | 2 | 3 | 4 | 5 => // write, maybe reshaping one or
          // both dims first (grow one while shrinking the other is the
          // per-axis masking case rank 1 can't produce)
          shape = (bumpDim(shape._1), bumpDim(shape._2))
          val cells = randCells(shape)
          val w = ds.newWriter(meta(shape))
          w.writeSlab("t",
            cells.toSeq.map { case ((i, j), v) => (Seq(i, j), v) }
              .toDF("coord", "value"))
          val vid = w.commit()
          model.write(vid, shape, cells)
        case 6 => // metadata-only shape change (the ALTER path)
          shape = (bumpDim(shape._1), bumpDim(shape._2))
          val vid = ds.newWriter(meta(shape)).commit()
          model.metaOnly(vid, shape)
        case 7 => // incremental index-log fold
          ds.compactIndexLog()
        case 8 => // retention
          val live = model.liveVersions
          val keep = 1 + rnd.nextInt(live.length)
          ds.expireVersions(keep)
          model.expired ++= live.sorted.reverse.drop(keep)
        case 9 => // ref-log compaction + gc (no grace)
          ds.compactRefs()
          ds.gc(graceMs = 0L)
        case 10 => // chunk packing: physical fold, reads unchanged
          ds.packChunks(rewriteLiveFrac = rnd.nextDouble())
        case 11 => // stat backfill/merge: metadata rewrite only
          ds.analyzeIndexStats()
        case 12 | 13 => // SQL DELETE of a partial 2-D coordinate box:
          // an MVCC commit writing fill over the LIVE cells in the box
          // (x0 AND x1 range conjuncts — the rank-2 deleteWhere form),
          // or no commit at all when the box holds none
          val ((lo0, hi0), (lo1, hi1)) = randBox(shape)
          val isFull = lo0 == 0 && hi0 == shape._1 &&
            lo1 == 0 && hi1 == shape._2 // full box = the truncate path
          if (!isFull) {
            val head = model.liveVersions.max
            val before = ds.latestVersion.get
            spark.sql(s"DELETE FROM $cat.d.t " +
              s"WHERE x0 >= $lo0 AND x0 < $hi0 " +
              s"AND x1 >= $lo1 AND x1 < $hi1")
            val after = ds.latestVersion.get
            val live = model.slab(head).filter { case ((i, j), x) =>
              i >= lo0 && i < hi0 && j >= lo1 && j < hi1 && !x.isNaN }
            if (live.isEmpty)
              assert(after == before,
                s"seed=$seed empty-box DELETE must not commit")
            else {
              assert(after != before,
                s"seed=$seed DELETE of live cells must commit")
              model.write(after, shape,
                live.map { case (c, _) => c -> Double.NaN })
            }
          }
      }
    }

    def asMap(rows: Array[(Seq[Long], Double)]): Map[Coord, Double] =
      rows.map { case (c, x) => (c.head, c(1)) -> x }.toMap

    def checkCells(label: String, got: Map[Coord, Double],
        want: Map[Coord, Double]): Unit = {
      assert(got.keySet == want.keySet,
        s"seed=$seed $label coords ${got.keySet} != ${want.keySet} " +
          s"(chunkDims=($c0,$c1))")
      want.foreach { case (c, x) =>
        val y = got(c)
        assert(x == y || (x.isNaN && y.isNaN),
          s"seed=$seed $label cell $c: engine=$y model=$x " +
            s"(chunkDims=($c0,$c1))")
      }
    }

    // every retained version: full dense read + one random hyperslab
    // region read (clips chunks per-dim BEFORE decode)
    model.liveVersions.foreach { v =>
      checkCells(s"v=$v full",
        asMap(ds.readSlab("t", v).as[(Seq[Long], Double)].collect()),
        model.slab(v))
      val box = randBox(model.shapeAt(v))
      checkCells(s"v=$v box=$box",
        asMap(ds.readSlab("t", v,
            Some(Seq((box._1._1, box._1._2), (box._2._1, box._2._2))))
          .as[(Seq[Long], Double)].collect()),
        model.slab(v, Some(box)))
    }
    model.expired.foreach { v =>
      intercept[IllegalArgumentException](ds.readSlab("t", v))
    }

    // DSv2 scan with a pushed 2-D conjunct box (x0 AND x1 ranges) at
    // head: pruning + decode through the planning path must produce
    // exactly the model's clipped slab
    val head = model.liveVersions.max
    val hb = randBox(model.shapeAt(head))
    val got = spark.read.format("graft")
      .option("path", ds.path).option("variable", "t")
      .option("asOf", head.toString).load()
      .where(col("x0") >= hb._1._1 && col("x0") < hb._1._2 &&
        col("x1") >= hb._2._1 && col("x1") < hb._2._2)
      .as[(Long, Long, Double)].collect()
      .map { case (i, j, x) => (i, j) -> x }.toMap
    checkCells(s"dsv2 head=$head box=$hb", got,
      model.slab(head, Some(hb)))
  }

  test("random 2-D MVCC programs match the in-memory model cell-exactly") {
    val n = sys.props.get("graft.soak2d.programs").map(_.toInt)
      .getOrElse(60)
    (1L to n).foreach(runProgram)
  }
}
