package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.{col, count, max, min, sum}

import Model._

/** Generative model test of the MVCC store: random interleavings of
  * write / grow / shrink / overwrite / metadata-only commit / index
  * compaction / retention / gc / SQL DELETE / zero-copy CLONE (+
  * divergent branch writes) run against an IN-MEMORY reference model, then every retained version's dense slab read is
  * compared cell-exactly — the generative analog of the imported
  * conformance scenarios (hbase_test.clj:106-156), reaching
  * interleavings the example-based specs never enumerate.
  *
  * The model mirrors the engine's CHUNK-level semantics, which are
  * observable (not an implementation detail): a partial-chunk write
  * merges the snapshot chunk's cells but drops those outside the new
  * shape, while an UNTOUCHED chunk keeps its stored cells — so a
  * shrink followed by a grow resurrects cells in untouched chunks but
  * not in rewritten ones. Reads mask to min(as-of shape, the writing
  * version's shape) exactly like ChunkCodec decode.
  *
  * Program count scales with -Dgraft.soak.programs (default 100).
  */
class MvccModelSoakSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  /** One committed chunk write: the shape it was encoded under and
    * its explicit cells (everything else in the tile is fill).
    */
  private case class ChunkEntry(writerShape: Long, cells: Map[Long, Double])

  /** Reference model of one 1-D variable's full history. */
  private class ModelStore(val chunkDim: Long) {
    // versionId -> (as-of shape, chunkId -> entry written AT that version)
    var versions: Vector[(Long, Long, Map[Long, ChunkEntry])] = Vector.empty
    var expired: Set[Long] = Set.empty
    // epoch boundaries (INSERT OVERWRITE / TRUNCATE swap the physical
    // index key): as-of resolution never reads below its epoch's start
    var epochs: Vector[Long] = Vector(0L)

    private def epochOf(asOf: Long): Long = epochs.filter(_ <= asOf).max

    def newEpoch(vid: Long): Unit = epochs :+= vid

    private def resolveFromV(chunk: Long, asOf: Long,
        floor: Long): Option[(Long, ChunkEntry)] =
      versions.filter(v => v._1 <= asOf && v._1 >= floor)
        .flatMap(v => v._3.get(chunk).map(v._1 -> _))
        .sortBy(_._1).lastOption

    private def resolveFrom(chunk: Long, asOf: Long,
        floor: Long): Option[ChunkEntry] =
      resolveFromV(chunk, asOf, floor).map(_._2)

    private def resolve(chunk: Long, asOf: Long): Option[ChunkEntry] =
      resolveFrom(chunk, asOf, epochOf(asOf))

    def shapeAt(asOf: Long): Long =
      versions.filter(_._1 <= asOf).maxBy(_._1)._2

    /** The dense slab the engine must produce at `asOf`. */
    def slab(asOf: Long): Map[Long, Double] =
      (0L until shapeAt(asOf)).map { coord =>
        val value = resolve(coord / chunkDim, asOf) match {
          case Some(e) if coord < e.writerShape =>
            e.cells.getOrElse(coord, Double.NaN)
          case _ => Double.NaN
        }
        coord -> value
      }.toMap

    /** The change-window read the engine must produce for
      * `(from, to]`: every cell of every chunk whose WINNING write
      * (as-of `to`, within `to`'s epoch) landed after `from` —
      * chunk-granularity, masked to the as-of shape exactly like the
      * dense read.
      */
    def changed(from: Long, to: Long): Map[Long, Double] = {
      val shape = shapeAt(to)
      val nChunks = (shape + chunkDim - 1) / chunkDim
      (0L until nChunks).flatMap { c =>
        resolveFromV(c, to, epochOf(to)) match {
          case Some((ver, e)) if ver > from =>
            (c * chunkDim until math.min((c + 1) * chunkDim, shape))
              .map { coord =>
                coord -> (if (coord < e.writerShape)
                  e.cells.getOrElse(coord, Double.NaN)
                else Double.NaN)
              }
          case _ => Seq.empty
        }
      }.toMap
    }

    /** Apply a write of `cells` under `shape` as committed `vid`
      * (cells already within shape; snapshot = model HEAD).
      */
    def write(vid: Long, shape: Long, cells: Map[Long, Double]): Unit = {
      val head = versions.map(_._1).maxOption.getOrElse(0L)
      val touched = cells.keySet.map(_ / chunkDim)
      // merge floor = the WRITING version's epoch: a write that itself
      // opens an epoch (INSERT OVERWRITE) merges with nothing
      val floor = epochOf(vid)
      val entries = touched.map { c =>
        val merged = resolveFrom(c, head, floor).map(_.cells)
          .getOrElse(Map.empty)
          .filter { case (coord, _) => coord < shape } ++
          cells.filter(_._1 / chunkDim == c)
        c -> ChunkEntry(shape, merged)
      }.toMap
      versions :+= ((vid, shape, entries))
    }

    def metaOnly(vid: Long, shape: Long): Unit =
      versions :+= ((vid, shape, Map.empty))

    def expire(keepLast: Int): Unit = {
      val live = versions.map(_._1).filterNot(expired).sorted.reverse
      expired ++= live.drop(keepLast)
    }

    def liveVersions: Seq[Long] =
      versions.map(_._1).filterNot(expired).sorted

    /** The per-chunk WINNING entries at `asOf` (writerShape preserved)
      * — what a zero-copy clone captures: the engine copies resolved
      * index rows keeping each row's original writerVersion, so the
      * model's clone copies resolved ChunkEntries keeping each one's
      * original writerShape.
      */
    def resolvedEntries(asOf: Long): Map[Long, ChunkEntry] =
      resolvedEntriesV(asOf).view.mapValues(_._2).toMap

    /** Like [[resolvedEntries]] but keeping each chunk's winning
      * version (the model analog of the index row's versionId).
      */
    def resolvedEntriesV(asOf: Long): Map[Long, (Long, ChunkEntry)] = {
      val shape = shapeAt(asOf)
      val n = (shape + chunkDim - 1) / chunkDim
      (0L until n).flatMap(c =>
        resolveFromV(c, asOf, epochs.filter(_ <= asOf).max)
          .map(c -> _)).toMap
    }
  }

  private def runProgram(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val chunkDim = 1L + rnd.nextInt(3)
    val model = new ModelStore(chunkDim)
    val root = Files.createTempDirectory(s"graft_soak_${seed}_").toString
    val lake = new GraftLake(spark, root)
    lake.create("d")
    val ds = lake.connect("d")
    // SQL surface for the DELETE ops (unique catalog name per program:
    // Spark caches catalog instances by name, so reusing one name
    // across programs would pin the first program's root)
    val cat = s"soak$seed"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    // half the programs pin sub-sharded pack buckets (prefixLen 3):
    // the fold and every read-through-pack path must behave
    // identically at any pinned prefix length
    spark.conf.set("spark.graft.pack.prefixLen",
      if (rnd.nextBoolean()) "3" else "2")
    var shape = 2L + rnd.nextInt(6)

    // the variable may be RENAMED mid-history (logical name moves,
    // index key stays) or OVERWRITTEN/TRUNCATED (index key swaps to a
    // fresh epoch, logical name stays); reads at an old version must
    // use the name — and the engine the key — as of THAT version
    var curName = "t"
    var curIdx = "t"
    var nameAt = Map.empty[Long, String]

    // dataset-level commit accounting: once a CLONE adds a second
    // variable, its commits are dataset versions too, so retention
    // (keep-last over the DATASET's log) must count across both —
    // per-variable content stays in each ModelStore, liveness is
    // global
    var allVids: Vector[Long] = Vector.empty
    var expired: Set[Long] = Set.empty
    def liveVids: Vector[Long] = allVids.filterNot(expired).sorted
    // at most one zero-copy branch per program: (name, model, cloneVid)
    var branch: Option[(String, ModelStore, Long)] = None

    def meta(s: Long) = DatasetMeta(
      VariableMeta(curName, "double", Seq(s), Seq(chunkDim), Double.NaN,
        indexName = if (curIdx == curName) "" else curIdx) +:
      // a commit's metadata must CARRY the branch (a single-variable
      // meta would read as "this writer dropped it" in the three-way
      // merge); its committed VariableMeta (fresh key + lineage) is
      // whatever the engine minted at clone time
      branch.toSeq.flatMap { case (bn, _, _) =>
        ds.metadata(ds.latestVersion.get).variables.filter(_.name == bn)
      })

    // first commit is always a write so every later op has substance
    val steps = 5 + rnd.nextInt(3)
    (0 until steps).foreach { step =>
      val op =
        if (step == 0 || model.versions.isEmpty) 0 else rnd.nextInt(20)
      op match {
        case 0 | 1 | 2 | 3 | 4 | 5 => // write under a (maybe new) shape
          shape = math.max(1L, shape + rnd.between(-2, 3))
          val nCells = 1 + rnd.nextInt(4)
          val cells = Seq.fill(nCells)(rnd.nextLong(shape))
            .distinct.map(c => c -> (rnd.nextInt(90) + 1).toDouble).toMap
          val w = ds.newWriter(meta(shape))
          w.writeSlab(curName,
            cells.toSeq.map { case (c, v) => (Seq(c), v) }
              .toDF("coord", "value"))
          val vid = w.commit()
          nameAt += vid -> curName
          allVids :+= vid
          model.write(vid, shape, cells)
        case 6 => // metadata-only shape change (the ALTER path)
          shape = math.max(1L, shape + rnd.between(-2, 3))
          val vid = ds.newWriter(meta(shape)).commit()
          nameAt += vid -> curName
          allVids :+= vid
          model.metaOnly(vid, shape)
        case 7 => // incremental index-log fold
          ds.compactIndexLog()
        case 8 => // retention — count- or time-based, same boundary
          val live = liveVids
          if (rnd.nextBoolean()) {
            val keep = 1 + rnd.nextInt(live.length)
            ds.expireVersions(keep)
            expired ++= live.sorted.reverse.drop(keep)
          } else {
            val cutoff = live(rnd.nextInt(live.length))
            ds.expireVersionsOlderThan(cutoff)
            val keep = math.max(1, live.count(_ >= cutoff))
            expired ++= live.sorted.reverse.drop(keep)
          }
        case 9 => // ref-log compaction + gc (no grace: sweep everything)
          ds.compactRefs()
          ds.gc(graceMs = 0L)
        case 10 => // RENAME: metadata-only, index rows keep their key
          curName = s"t_r$step"
          val vid = ds.newWriter(meta(shape)).commit()
          nameAt += vid -> curName
          allVids :+= vid
          model.metaOnly(vid, shape)
        case 11 => // INSERT OVERWRITE: fresh epoch + cells, ONE commit
          curIdx = s"t#e$step"
          val nCells = 1 + rnd.nextInt(4)
          val cells = Seq.fill(nCells)(rnd.nextLong(shape))
            .distinct.map(c => c -> (rnd.nextInt(90) + 1).toDouble).toMap
          val w = ds.newWriter(meta(shape))
          val df = cells.toSeq.map { case (c, v) => (Seq(c), v) }
            .toDF("coord", "value")
          // fresh epoch = empty variable: the chunk-ALIGNED write is
          // legal here — exercise it randomly against the same model
          // (hash-partitioning by chunk id guarantees alignment)
          if (rnd.nextBoolean())
            w.writeSlabAligned(curName, df.repartition(2,
              org.apache.spark.sql.functions.expr(
                s"coord[0] div ${chunkDim}L")))
          else w.writeSlab(curName, df)
          val vid = w.commit()
          nameAt += vid -> curName
          allVids :+= vid
          model.newEpoch(vid)
          model.write(vid, shape, cells)
        case 12 => // TRUNCATE: fresh epoch, metadata-only
          curIdx = s"t#e$step"
          val vid = ds.newWriter(meta(shape)).commit()
          nameAt += vid -> curName
          allVids :+= vid
          model.newEpoch(vid)
          model.metaOnly(vid, shape)
        case 13 => // SQL DELETE of a partial coordinate box: an MVCC
          // commit writing fill over the LIVE cells in the box — or no
          // commit at all when the box holds none (both outcomes
          // asserted against the engine's version log)
          val head = liveVids.max
          val lo = rnd.nextLong(shape)
          val hi = lo + 1 + rnd.nextLong(shape - lo)
          if (!(lo == 0 && hi == shape)) { // full box = op 14's path
            val before = ds.latestVersion.get
            spark.sql(s"DELETE FROM $cat.d.`$curName` " +
              s"WHERE x0 >= $lo AND x0 < $hi")
            val after = ds.latestVersion.get
            val live = model.slab(head).filter { case (c, x) =>
              c >= lo && c < hi && !x.isNaN }
            if (live.isEmpty)
              assert(after == before,
                s"seed=$seed empty-box DELETE must not commit")
            else {
              assert(after != before,
                s"seed=$seed DELETE of live cells must commit")
              nameAt += after -> curName
              allVids :+= after
              model.write(after, shape,
                live.map { case (c, _) => c -> Double.NaN })
            }
          }
        case 14 => // SQL DELETE with no predicate: the O(1) truncate
          // epoch swap — resync the index key from the COMMITTED
          // metadata (the engine mints it)
          val before = ds.latestVersion.get
          spark.sql(s"DELETE FROM $cat.d.`$curName`")
          val after = ds.latestVersion.get
          assert(after != before, s"seed=$seed truncate must commit")
          curIdx = ds.metadata(after).variables
            .find(_.name == curName).get.idx
          nameAt += after -> curName
          allVids :+= after
          model.newEpoch(after)
          model.metaOnly(after, shape)
        case 15 => // chunk packing: pure physical-layout fold — every
          // live version must read identically through the pack store
          ds.packChunks(rewriteLiveFrac = rnd.nextDouble())
        case 16 => // ANALYZE: stat backfill + level merge — a pure
          // metadata rewrite; every read and agg must be unchanged
          // (this store always writes stats, so 0 rows backfill and
          // the op degenerates to the merge/short-circuit path)
          ds.analyzeIndexStats()
        case 17 => // zero-copy CLONE at a random LIVE version (clone
          // semantics: resolved entries at `at`, writerShape/Version
          // preserved) — at most one branch per program
          if (branch.isEmpty) {
            val live = liveVids
            val at = live(rnd.nextInt(live.length))
            val bn = s"b$step"
            val vid = ds.cloneVariable(nameAt(at), bn, at)
            nameAt += vid -> curName
            allVids :+= vid
            val bm = new ModelStore(chunkDim)
            bm.versions = Vector(
              (vid, model.shapeAt(at), model.resolvedEntries(at)))
            branch = Some((bn, bm, vid))
          }
        case 18 => // branch write: partial overwrites must merge with
          // CLONED chunk cells (decoded through the lineage); the
          // source variable must never see them
          branch.foreach { case (bn, bm, _) =>
            val bShape = bm.shapeAt(Long.MaxValue)
            val nCells = 1 + rnd.nextInt(4)
            val cells = Seq.fill(nCells)(rnd.nextLong(bShape))
              .distinct.map(c => c -> (rnd.nextInt(90) + 1).toDouble).toMap
            val w = ds.newWriter(ds.metadata(ds.latestVersion.get))
            w.writeSlab(bn,
              cells.toSeq.map { case (c, v) => (Seq(c), v) }
                .toDF("coord", "value"))
            val vid = w.commit()
            nameAt += vid -> curName
            allVids :+= vid
            bm.write(vid, bShape, cells)
          }
        case 19 => // MERGE the branch back (force: the model predicts
          // content difference conservatively, engine hash-equality is
          // exact — force makes both sides chunk-replace). Skipped
          // when the source's shape drifted from the branch's (the
          // engine's geometry guard) or the source epoch-swapped away
          // from the branch's lineage key.
          branch.foreach { case (bn, bm, bvid) =>
            val lineageKey =
              ds.metadata(ds.latestVersion.get).variable(bn).lineage.last._1
            if (model.shapeAt(Long.MaxValue) == bm.shapeAt(Long.MaxValue)
                && lineageKey == curIdx) {
              val before = ds.latestVersion.get
              val vid = ds.mergeBranch(bn, force = true)
              if (vid != before) {
                nameAt += vid -> curName
                allVids :+= vid
                // model: chunk-level replace of every branch chunk
                // whose winning write is the branch's own and whose
                // entry differs from the source's current one
                val curShape = model.shapeAt(Long.MaxValue)
                val sEntries = model.resolvedEntries(Long.MaxValue)
                val repl = bm.resolvedEntriesV(Long.MaxValue).collect {
                  case (c, (ver, e))
                      if ver > bvid && !sEntries.get(c).contains(e) =>
                    val lo = c * chunkDim
                    val hi = math.min((c + 1) * chunkDim, curShape)
                    val cells = (lo until hi).flatMap(coord =>
                      if (coord < e.writerShape)
                        e.cells.get(coord).map(coord -> _)
                      else None).toMap
                    c -> ChunkEntry(curShape, cells)
                }
                model.versions :+= ((vid, curShape, repl))
              }
            }
          }
      }
    }

    // every retained version's dense read matches the model exactly;
    // expired versions refuse
    liveVids.foreach { v =>
      val got = ds.readSlab(nameAt(v), v)
        .as[(Seq[Long], Double)].collect()
        .map { case (c, x) => c.head -> x }.toMap
      val want = model.slab(v)
      assert(got.keySet == want.keySet,
        s"seed=$seed v=$v coords ${got.keySet} != ${want.keySet}")
      want.foreach { case (c, x) =>
        val y = got(c)
        assert(x == y || (x.isNaN && y.isNaN),
          s"seed=$seed v=$v cell $c: engine=$y model=$x " +
            s"(chunkDim=$chunkDim)")
      }
      // zone-map stats must CONTAIN the live non-NaN cells (tile
      // granularity over-approximates after shrinks, so containment —
      // not equality — is the invariant), and every row in this store
      // was written with zone maps (no unknowns)
      val nonNaN = want.values.filter(x => !x.isNaN)
      if (nonNaN.nonEmpty) {
        val r = ds.valueStats(nameAt(v), v).head()
        assert(!r.isNullAt(0) && !r.isNullAt(1),
          s"seed=$seed v=$v zone bounds must exist")
        val lo = r.getDouble(0)
        val hi = r.getDouble(1)
        assert(lo <= nonNaN.min,
          s"seed=$seed v=$v vmin $lo > live min ${nonNaN.min}")
        assert(hi.isNaN || hi >= nonNaN.max,
          s"seed=$seed v=$v vmax $hi < live max ${nonNaN.max}")
        assert(r.getLong(3) == 0L,
          s"seed=$seed v=$v unexpected unknown-zone chunks")
      }
    }
    expired.foreach { v =>
      intercept[IllegalArgumentException](ds.readSlab(nameAt(v), v))
    }

    // the branch (when this program made one) matches ITS model at
    // every live version from the clone on — pre-clone content decodes
    // through the lineage, post-clone writes diverge from the source
    branch.foreach { case (bn, bm, bvid) =>
      liveVids.filter(_ >= bvid).foreach { v =>
        val got = ds.readSlab(bn, v)
          .as[(Seq[Long], Double)].collect()
          .map { case (c, x) => c.head -> x }.toMap
        val want = bm.slab(v)
        assert(got.keySet == want.keySet,
          s"seed=$seed branch v=$v coords ${got.keySet} != ${want.keySet}")
        want.foreach { case (c, x) =>
          val y = got(c)
          assert(x == y || (x.isNaN && y.isNaN),
            s"seed=$seed branch v=$v cell $c: engine=$y model=$x " +
              s"(chunkDim=$chunkDim cloneVid=$bvid)")
        }
      }
    }
    spark.conf.unset("spark.graft.pack.prefixLen")

    // MIN/MAX(value) through the DSv2 agg pushdown — whatever form the
    // planner picks (complete zone fold, partial fold, or plain scan)
    // must match the model under Spark's NaN-greatest order, across
    // every shape grow/shrink, epoch swap and fold this program made.
    // Head gets the full box plus one random sub-box (the region-cut
    // partial path); two more random versions get the full box.
    def checkAgg(v: Long, box: Option[(Long, Long)]): Unit = {
      val cells = model.slab(v)
      val curShape = cells.keys.max + 1
      val (bLo, bHi) = box.getOrElse((0L, curShape))
      if (bLo >= bHi || bLo >= curShape) return
      val want = cells.collect {
        case (c, x) if c >= bLo && c < bHi => x }.toSeq
      if (want.isEmpty) return
      def nanMin(xs: Seq[Double]): Double = {
        val num = xs.filter(x => !x.isNaN)
        if (num.isEmpty) Double.NaN else num.min
      }
      def nanMax(xs: Seq[Double]): Double =
        if (xs.exists(_.isNaN)) Double.NaN else xs.max
      val df0 = spark.read.format("graft")
        .option("path", ds.path).option("variable", nameAt(v))
        .option("asOf", v.toString).load()
      val df = box.fold(df0)(b =>
        df0.where(col("x0") >= b._1 && col("x0") < b._2))
      val r = df.agg(min(col("value")), max(col("value")),
        sum(col("value")), count(col("value"))).head()
      val gmn = r.getDouble(0)
      val gmx = r.getDouble(1)
      val wmn = nanMin(want)
      val wmx = nanMax(want)
      assert(gmn == wmn || (gmn.isNaN && wmn.isNaN),
        s"seed=$seed v=$v box=$box agg min $gmn != model $wmn")
      assert(gmx == wmx || (gmx.isNaN && wmx.isNaN),
        s"seed=$seed v=$v box=$box agg max $gmx != model $wmx")
      // SUM: model cells are small integers, so the exact fold is
      // order-independent — whichever path the planner picked
      // (complete vsum fold, partial, or declined plain scan) must
      // produce the identical value; any NaN cell makes the sum NaN
      val gsum = r.getDouble(2)
      val wsum = if (want.exists(_.isNaN)) Double.NaN else want.sum
      assert(gsum == wsum || (gsum.isNaN && wsum.isNaN),
        s"seed=$seed v=$v box=$box agg sum $gsum != model $wsum")
      assert(r.getLong(3) == want.size.toLong,
        s"seed=$seed v=$v box=$box agg count ${r.getLong(3)} != " +
          s"model ${want.size}")
    }
    val liveV = liveVids
    val head = liveV.max
    checkAgg(head, None)
    val headShape = model.slab(head).keys.max + 1
    val boxLo = rnd.nextLong(headShape)
    val headBox = (boxLo, boxLo + 1 + rnd.nextLong(headShape - boxLo))
    checkAgg(head, Some(headBox))
    (0 until math.min(2, liveV.length)).foreach { _ =>
      checkAgg(liveV(rnd.nextInt(liveV.length)), None)
    }

    // GROUP BY x0 through the grouped pushdown: chunkDim==1 programs
    // take the per-group zone-fold path, wider chunks decline the
    // value aggs but still push the per-group count/dim closed forms —
    // whichever form the planner picked must reproduce every cell
    // (count 1, min == sum == the cell, NaN-aware), across every
    // grow/shrink, epoch swap, rename, fold and ANALYZE this program
    // made. Reuses head + headBox: no extra rnd draws, so program
    // streams stay identical to previous rounds.
    def checkGrouped(v: Long, box: Option[(Long, Long)]): Unit = {
      val cells = model.slab(v)
      val curShape = cells.keys.max + 1
      val (bLo, bHi0) = box.getOrElse((0L, curShape))
      val bHi = math.min(bHi0, curShape)
      if (bLo >= bHi) return
      val df0 = spark.read.format("graft")
        .option("path", ds.path).option("variable", nameAt(v))
        .option("asOf", v.toString).load()
      val df = box.fold(df0)(b =>
        df0.where(col("x0") >= b._1 && col("x0") < b._2))
      val got = df.groupBy(col("x0"))
        .agg(count(col("value")).as("n"), min(col("value")).as("mn"),
          sum(col("value")).as("s"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toMap
      assert(got.keySet == (bLo until bHi).toSet,
        s"seed=$seed v=$v box=$box grouped keys ${got.keySet}")
      (bLo until bHi).foreach { c =>
        val x = cells(c)
        val (n, mn, sm) = got(c)
        assert(n == 1L, s"seed=$seed v=$v cell $c grouped count $n")
        assert(mn == x || (mn.isNaN && x.isNaN),
          s"seed=$seed v=$v cell $c grouped min $mn != $x")
        assert(sm == x || (sm.isNaN && x.isNaN),
          s"seed=$seed v=$v cell $c grouped sum $sm != $x")
      }
    }
    checkGrouped(head, None)
    checkGrouped(head, Some(headBox))

    // change-window reads (batch `startVersion`) match the model at
    // chunk granularity — across folds, epochs, renames, retention
    val live = liveVids
    (0 until math.min(3, live.length)).foreach { _ =>
      val to = live(rnd.nextInt(live.length))
      val lower = live.filter(_ <= to)
      val from = lower(rnd.nextInt(lower.length))
      val got = spark.read.format("graft")
        .option("path", ds.path).option("variable", nameAt(to))
        .option("asOf", to.toString)
        .option("startVersion", from.toString).load()
        .as[(Long, Double)].collect().toMap
      val want = model.changed(from, to)
      assert(got.keySet == want.keySet,
        s"seed=$seed window($from,$to] chunks " +
          s"${got.keySet} != ${want.keySet}")
      want.foreach { case (c, x) =>
        val y = got(c)
        assert(x == y || (x.isNaN && y.isNaN),
          s"seed=$seed window($from,$to] cell $c: engine=$y model=$x")
      }
    }

    // constraint epilogue (after every model assertion; draws nothing
    // before the existing stream): whatever history this program
    // built, ALTER-adding a check the live data satisfies must commit,
    // a violating INSERT must abort WITHOUT a version, and a valid
    // INSERT must land and still match the model cell-exactly
    val headVals =
      model.slab(liveVids.max).values.filter(x => !x.isNaN)
    headVals.maxOption.foreach { m =>
      spark.sql(s"ALTER TABLE $cat.d.`$curName` " +
        s"SET TBLPROPERTIES ('check'='value <= $m')")
      val vidA = ds.latestVersion.get
      nameAt += vidA -> curName
      allVids :+= vidA
      model.metaOnly(vidA, shape)
      // tightening below the live max must be REJECTED (existing-data
      // probe) whenever a strictly smaller live value exists
      if (headVals.exists(_ < m)) {
        intercept[Exception] {
          spark.sql(s"ALTER TABLE $cat.d.`$curName` " +
            s"SET TBLPROPERTIES ('check'='value < ${headVals.min}')")
        }
      }
      val before = ds.latestVersion.get
      intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.d.`$curName` " +
          s"SELECT CAST(0 AS BIGINT), CAST(${m + 1.0} AS DOUBLE)")
      }
      assert(ds.latestVersion.get == before,
        s"seed=$seed violating INSERT must not commit a version")
      spark.sql(s"INSERT INTO $cat.d.`$curName` " +
        s"SELECT CAST(0 AS BIGINT), CAST($m AS DOUBLE)")
      val vidI = ds.latestVersion.get
      assert(vidI != before, s"seed=$seed valid INSERT must commit")
      nameAt += vidI -> curName
      allVids :+= vidI
      model.write(vidI, shape, Map(0L -> m))
      val got = ds.readSlab(curName, vidI)
        .as[(Seq[Long], Double)].collect()
        .map { case (c, x) => c.head -> x }.toMap
      val want = model.slab(vidI)
      assert(got.keySet == want.keySet,
        s"seed=$seed post-constraint coords ${got.keySet}")
      want.foreach { case (c, x) =>
        val y = got(c)
        assert(x == y || (x.isNaN && y.isNaN),
          s"seed=$seed post-constraint cell $c: engine=$y model=$x")
      }
    }
  }

  test("random MVCC programs match the in-memory model cell-exactly") {
    val programs =
      sys.props.get("graft.soak.programs").map(_.toInt).getOrElse(100)
    (1 to programs).foreach { i =>
      withClue(s"program seed=$i") { runProgram(i.toLong) }
    }
  }
}
