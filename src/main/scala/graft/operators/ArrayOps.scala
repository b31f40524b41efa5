package graft.operators

import java.nio.file.Files

import graft.{Q, QueryPack}
import graft.core._
import graft.core.Model._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** N-D array analytics over the versioned store — the operations the
  * reference's scientific users (NetCDF-shaped data, mandoline's
  * domain; see SURVEY.md §0) run on gridded variables: block
  * coarsening (downsample), strided hyperslab extraction, rolling
  * windows along a grid dimension, and CDC replication of one dataset
  * into another from the version diff.
  *
  * Scale shapes (designed for the 100 TB grid, tested at 8×8):
  *  - [[coarsen]]: one hash-aggregate on the coarse coordinate.
  *    Catalyst's partial aggregation folds each input partition to at
  *    most |coarse cells| rows map-side, so the single shuffle carries
  *    ≤ |cells|/∏factors rows — never the raw grid.
  *  - [[hyperslab]]: the (start, stop) box pushes into the index read
  *    as a region, so only overlapping CHUNKS are fetched + decoded
  *    (gated on ChunkCodec.chunksDecoded in ArrayOpsSpec); the stride
  *    filter and re-indexing are narrow codegen'd maps on top.
  *  - [[rollingMean]]: a window partitioned by the OTHER dims and
  *    ordered by the rolling dim — one shuffle on the partition key,
  *    per-group sort bounded by one grid line, no global sort. (A
  *    rank-1 variable has no other dims: that degenerates to a single
  *    partition, which is exactly the case chunk-halo exchange would
  *    serve; refused loudly rather than silently serialized.)
  *  - [[applyDiff]]: payload I/O is O(changed chunks) on the source
  *    (diffSlab prunes identical (writer, hash) tiles) and O(touched
  *     chunks) on the replica (cells re-chunk straight into the
  *    writer's one shuffle). Unchanged data moves zero bytes.
  *  - [[stencilAvg]] / [[convolve]]: chunk-HALO EXCHANGE. Each cell
  *    shuffles once to its home chunk; only cells within `radius` of a
  *    chunk face replicate to the adjacent chunk(s) — shuffle volume is
  *    |cells| · (1 + surface/volume · radius), e.g. +1.5% at radius 1
  *    on a 128³ chunk, where the relational alternative (self-join on
  *    the 3^rank neighbor offsets) shuffles 9×/27× the corpus. Per-task
  *    state is ONE chunk + halo — the same bound the decoder already
  *    holds — so a 1000-executor run scales with the chunk grid, not
  *    the array.
  */
object ArrayOps extends QueryPack {

  // ---- reusable array-analytics API ---------------------------------

  /** Live (non-fill) cells of a cell frame under `vm`'s declared fill
    * — the ONE predicate every analytics operator selects data
    * through. A NaN fill (the float-family default) keeps `!isnan`;
    * any other fill (the reference's fill-short case,
    * hbase_test.clj:152-156; integer dtypes) compares against the
    * fill literal. Without this, a blanket `!isnan` would silently
    * aggregate fill values of non-NaN-fill variables into means as if
    * they were data (gated by the m53 short-dtype oracle and
    * ArrayOpsSpec).
    */
  private[operators] def liveCells(df: DataFrame,
      vm: VariableMeta): DataFrame =
    if (vm.fillValue.isNaN) df.where(!isnan(col("value")))
    else df.where(!isnan(col("value")) &&
      col("value") =!= lit(vm.fillValue))

  /** Block-aggregate `variable` at `asOf` by integer `factors` (one
    * per dim): output cell c holds agg over the input box
    * [c*f, (c+1)*f) per dim. `agg` is avg/min/max/sum/count on the
    * `value` column. Fill cells (per the variable's declared fill —
    * NaN or not) are excluded — blocks with no live data produce no
    * output row (sparse-friendly).
    */
  def coarsen(ds: GraftDataset, variable: String, asOf: Long,
      factors: Seq[Long], agg: Column => Column): DataFrame = {
    val vm = ds.metadata(asOf).variable(variable)
    val rank = vm.shape.length
    require(factors.length == rank && factors.forall(_ >= 1),
      s"need $rank factors >= 1")
    val cells = liveCells(ds.readSlab(variable, asOf), vm)
    val coarse = (0 until rank).map(i =>
      (element_at(col("coord"), i + 1) / factors(i)).cast("long")
        .as(s"c$i"))
    cells.groupBy(coarse: _*)
      .agg(agg(col("value")).as("value"))
      .select(array((0 until rank).map(i => col(s"c$i")): _*).as("coord"),
        col("value"))
  }

  /** Chunk-aligned coarsening answered ENTIRELY from the index's zone
    * maps — zero chunk fetches, zero decodes: when the block equals
    * the chunk tile, the per-block min/max/sum IS the tile's
    * vmin/vmax/vsum, already riding every resolved index row. The
    * 100 TB overview query (one output cell per chunk) then costs an
    * index scan — KB-sized rows — instead of the full payload read
    * that [[coarsen]] pays. Value semantics follow the zone contract:
    * fill-INCLUSIVE over each written tile (a NaN fill makes a
    * partially-written tile's stats NaN — detectably, never wrongly);
    * unwritten chunks emit no row. Declines loudly on legacy rows
    * missing stats (run ANALYZE / m22 to backfill) and on ragged
    * grids (shape not a multiple of chunkDims).
    */
  def chunkCoarsen(ds: GraftDataset, variable: String, asOf: Long,
      agg: String): DataFrame = {
    val vm = ds.metadata(asOf).variable(variable)
    val statCol = agg match {
      case "min" => "vmin"
      case "max" => "vmax"
      case "sum" => "vsum"
      case other => throw new IllegalArgumentException(
        s"chunkCoarsen answers min|max|sum from zone stats, not $other — " +
          "use coarsen() for other aggregates")
    }
    require(vm.shape.zip(vm.chunkDims).forall { case (s, c) => s % c == 0 },
      "chunkCoarsen needs complete tiles (shape % chunkDims == 0) — " +
        "edge tiles' stats cover a different cell count; use coarsen()")
    val grid = vm.chunkGrid
    ds.resolveIndex(vm.idx, asOf)
      // shrunken-shape leftovers hold no live cells
      .where((0 until grid.length).map(i =>
        element_at(col("coord"), i + 1) < grid(i)).reduce(_ && _))
      .select(col("coord"),
        when(col(statCol).isNull, raise_error(concat(
          lit(s"chunkCoarsen: tile "), col("coord").cast("string"),
          lit(s" lacks $statCol zone stats — ANALYZE the variable " +
            "or use coarsen()"))))
          .otherwise(col(statCol)).as("value"))
  }

  /** Build a multi-resolution overview pyramid (the COG/Zarr-overview
    * analog): level k is level k−1 block-aggregated by `factors`,
    * committed as variable `<variable>_l<k>`. Each level reads only
    * the PREVIOUS level — total extra I/O is a geometric series
    * (≈ 1/(∏factors−1) of the base), never k full base reads. One
    * commit per level keeps every level independently time-travelable.
    * Returns the (levelName, versionId) per level, base first.
    *
    * Levels of an INTEGER-dtype source (short/int/long) are stored as
    * double: a block mean is fractional, and writing it back into the
    * source dtype would silently truncate (the same convention as
    * raster overview formats). Float/double sources keep their dtype.
    * Derived levels ALWAYS use NaN fill regardless of the source's:
    * on a non-NaN-fill variable, a computed mean exactly equal to the
    * fill value would read back as a tombstone and silently vanish —
    * NaN can never collide with a finite aggregate.
    */
  def buildPyramid(ds: GraftDataset, variable: String, asOf: Long,
      factors: Seq[Long], levels: Int,
      agg: Column => Column = avg): Seq[(String, Long)] = {
    require(levels >= 1, "levels >= 1")
    var prevName = variable
    var prevAsOf = asOf
    var out = Vector(variable -> asOf)
    for (k <- 1 to levels) {
      val prevVm = ds.metadata(prevAsOf).variable(prevName)
      val name = s"${variable}_l$k"
      val shape = prevVm.shape.zip(factors).map { case (s, f) =>
        (s + f - 1) / f
      }
      val chunkDims = prevVm.chunkDims.zip(shape).map { case (c, s) =>
        math.min(c, s)
      }
      val dt =
        if (prevVm.dtype == "float") "float" else "double"
      val vm = VariableMeta(name, dt, shape, chunkDims, Double.NaN)
      val meta = DatasetMeta(
        ds.metadata(prevAsOf).variables.filterNot(_.name == name) :+ vm)
      val cells = coarsen(ds, prevName, prevAsOf, factors, agg)
      val w = ds.newWriter(meta)
      w.writeSlab(name, cells)
      val v = w.commit()
      out :+= (name -> v)
      prevName = name
      prevAsOf = v
    }
    out
  }

  /** Incrementally refresh a [[buildPyramid]] pyramid after base
    * commits — the m24-style incremental-view-maintenance story for
    * array overviews. Per level, the index window (lo, hi] names the
    * chunks written since the pyramid was last consistent (a
    * metadata-sized read); their covered blocks recompute from ONE
    * change-feed read of exactly those chunks' current cells, and land
    * as one commit. Levels cascade: level k's refresh consumes the
    * chunks level k−1's refresh just wrote. Payload I/O is O(changed
    * chunks) at every level — never a base re-scan (decode-counter
    * gated in ArrayOpsSpec, cross-checked against a full recompute).
    * Blocks whose cells all became fill write fill — deletes propagate
    * up the pyramid. Requires factors dividing the source chunkDims
    * (blocks must nest inside chunks so a written chunk fully covers
    * every block it touches).
    */
  def refreshPyramid(ds: GraftDataset, variable: String,
      factors: Seq[Long], levels: Int, sinceVersion: Long,
      agg: Column => Column = avg): Seq[(String, Long)] = {
    require(levels >= 1, "levels >= 1")
    var srcName = variable
    var lo = sinceVersion
    var out = Vector.empty[(String, Long)]
    for (k <- 1 to levels) {
      val dstName = s"${variable}_l$k"
      val hi = ds.latestVersion.getOrElse(
        throw new IllegalStateException("no committed versions"))
      refreshLevel(ds, srcName, dstName, factors, lo, hi, agg)
        .foreach(v => out :+= (dstName -> v))
      // the next level consumes everything this refresh (and any
      // earlier unprocessed commit) wrote to THIS level
      srcName = dstName
    }
    out
  }

  private def refreshLevel(ds: GraftDataset, srcName: String,
      dstName: String, factors: Seq[Long], lo: Long, hi: Long,
      agg: Column => Column): Option[Long] = {
    val meta = ds.metadata(hi)
    val srcVm = meta.variable(srcName)
    val dstVm = meta.variable(dstName)
    val rank = srcVm.shape.length
    require(factors.length == rank &&
      factors.zip(srcVm.chunkDims).forall { case (f, c) =>
        f >= 1 && c % f == 0 },
      "refreshPyramid needs factors dividing the source chunkDims so " +
        "blocks nest inside chunks")
    val grid = srcVm.chunkGrid
    // chunks whose winning write landed in (lo, hi] — index rows only
    val changed = ds.indicesDF
      .filter(col("variable") === srcVm.idx &&
        col("versionId") > lo && col("versionId") <= hi)
      .select(col("coord")).distinct()
      .where((0 until rank).map(i =>
        element_at(col("coord"), i + 1) < grid(i)).reduce(_ && _))
    if (changed.isEmpty) return None
    // every block a changed chunk covers (blocks nest: chunkDims/f
    // per dim), clipped to the level grid
    val bpc = srcVm.chunkDims.zip(factors).map { case (c, f) => c / f }
    val blocks = (0 until rank).foldLeft(changed) { (df, i) =>
      df.withColumn(s"b$i", explode(sequence(
        element_at(col("coord"), i + 1) * bpc(i),
        element_at(col("coord"), i + 1) * bpc(i) + (bpc(i) - 1))))
    }.where((0 until rank).map(i =>
      col(s"b$i") < dstVm.shape(i)).reduce(_ && _))
      .select((0 until rank).map(i => col(s"b$i")): _*)
    // current cells of exactly the changed chunks: the batch
    // change-feed read (sparse — written chunks only)
    val cells = ds.spark.read.format("graft")
      .option("path", ds.path).option("variable", srcName)
      .option("asOf", hi.toString).option("startVersion", lo.toString)
      .load()
    val liveChanged = liveCells(cells, srcVm)
    val agged = liveChanged.groupBy((0 until rank).map(i =>
      (col(s"x$i") / factors(i)).cast("long").as(s"b$i")): _*)
      .agg(agg(col("value")).as("value"))
    val outCells = blocks.join(agged, (0 until rank).map(i => s"b$i"),
      "left")
      .select(array((0 until rank).map(i => col(s"b$i")): _*).as("coord"),
        coalesce(col("value"), lit(dstVm.fillValue)).as("value"))
    val w = ds.newWriter(meta)
    w.writeSlab(dstName, outCells)
    Some(w.commit())
  }

  /** Strided hyperslab `[start, stop) by step` per dim, NumPy/NetCDF
    * slice semantics: output coord k maps to input start + k*step.
    * The (start, stop) box is pushed into the chunk-index read as a
    * region — chunks outside it are never fetched.
    */
  def hyperslab(ds: GraftDataset, variable: String, asOf: Long,
      slices: Seq[(Long, Long, Long)]): DataFrame = {
    val rank = ds.metadata(asOf).variable(variable).shape.length
    require(slices.length == rank, s"need $rank slices")
    require(slices.forall { case (lo, hi, st) => st >= 1 && lo >= 0 && hi >= lo },
      "slices must be (start, stop, step) with step >= 1, 0 <= start <= stop")
    val region = slices.map { case (lo, hi, _) => (lo, hi) }
    val cells = ds.readSlab(variable, asOf, Some(region))
    val onStride = slices.zipWithIndex.map { case ((lo, _, st), i) =>
      (element_at(col("coord"), i + 1) - lo) % st === 0L
    }.reduce(_ && _)
    val outCoord = array(slices.zipWithIndex.map { case ((lo, _, st), i) =>
      ((element_at(col("coord"), i + 1) - lo) / st).cast("long")
    }: _*)
    cells.where(onStride).select(outCoord.as("coord"), col("value"))
  }

  /** Rolling mean along dimension `dim` over the trailing window of
    * `width` cells (ROWS width-1 PRECEDING .. CURRENT), partitioned by
    * every other dimension. Requires rank >= 2 — see the scale note in
    * the object doc for why a rank-1 global window is refused.
    */
  def rollingMean(ds: GraftDataset, variable: String, asOf: Long,
      dim: Int, width: Int): DataFrame = {
    val vm = ds.metadata(asOf).variable(variable)
    val rank = vm.shape.length
    require(rank >= 2,
      "rollingMean needs rank >= 2: a rank-1 rolling window is a " +
        "single global sort — rechunk to rank 2 or aggregate instead")
    require(dim >= 0 && dim < rank, s"dim out of range 0..${rank - 1}")
    require(width >= 1, "width >= 1")
    val others = (0 until rank).filter(_ != dim)
      .map(i => element_at(col("coord"), i + 1))
    val w = Window.partitionBy(others: _*)
      .orderBy(element_at(col("coord"), dim + 1))
      .rowsBetween(-(width - 1), Window.currentRow)
    liveCells(ds.readSlab(variable, asOf), vm)
      .select(col("coord"), col("value"), avg(col("value")).over(w)
        .as("roll_mean"))
  }

  /** Apply the version diff `fromVersion → toVersion` of `variable` in
    * `src` onto `rep` (same variable name + meta), committing one
    * replica version. Changed cells write their new value; cells that
    * became fill on the source write the fill value (a delete). The
    * replica writer must already hold `meta` for the variable.
    * Returns the replica's new version id.
    */
  def applyDiff(src: GraftDataset, rep: GraftDataset, variable: String,
      fromVersion: Long, toVersion: Long, repMeta: DatasetMeta): Long = {
    val fill = repMeta.variable(variable).fillValue
    val delta = src.diffSlab(variable, fromVersion, toVersion)
      .select(col("coord"),
        coalesce(col("new_value"), lit(fill)).as("value"))
    val w = rep.newWriter(repMeta)
    w.writeSlab(variable, delta)
    w.commit()
  }

  /** Refine the grid by 2 along `dim` via linear interpolation (the
    * regrid-to-midpoints primitive): output coord 2k along `dim` keeps
    * the original cell, 2k+1 the mean of neighbors k and k+1 (so the
    * output extent is 2n−1). Same scale shape as [[rollingMean]]: one
    * shuffle on the other dims, per-line lead(), no global sort; same
    * rank-1 refusal.
    */
  def interpRefine(ds: GraftDataset, variable: String, asOf: Long,
      dim: Int): DataFrame = {
    val vm = ds.metadata(asOf).variable(variable)
    val rank = vm.shape.length
    require(rank >= 2,
      "interpRefine needs rank >= 2: a rank-1 refinement is a single " +
        "global sort — rechunk to rank 2 or coarsen instead")
    require(dim >= 0 && dim < rank, s"dim out of range 0..${rank - 1}")
    val others = (0 until rank).filter(_ != dim)
      .map(i => element_at(col("coord"), i + 1))
    val w = Window.partitionBy(others: _*)
      .orderBy(element_at(col("coord"), dim + 1))
    def refined(at: Column) = array((0 until rank).map { i =>
      if (i == dim) at
      else element_at(col("coord"), i + 1)
    }: _*)
    val d1 = element_at(col("coord"), dim + 1)
    // one pass: each input row emits its original cell AND (when a
    // successor exists) the midpoint, via a narrow 2-way explode — a
    // union of two selects over the same read would recompute the
    // whole readSlab (store fetch + decode) once per branch
    liveCells(ds.readSlab(variable, asOf), vm)
      .withColumn("nxt", lead(col("value"), 1).over(w))
      .select(explode(array(
        struct(refined(d1 * 2).as("coord"), col("value").as("value")),
        struct(refined(d1 * 2 + 1).as("coord"),
          ((col("value") + col("nxt")) / 2).as("value")))).as("r"))
      .select(col("r.coord").as("coord"), col("r.value").as("value"))
      .where(col("value").isNotNull) // line-end rows have no midpoint
  }

  /** The chunk keys a cell ships to under halo exchange: its home
    * chunk always; an adjacent chunk per dimension-face the cell sits
    * within `radius` of (when that neighbor exists). Pure — unit-
    * gated in ArrayOpsSpec so the shuffle replication factor (Σ
    * targets / cells ≈ 1 + surface/volume · radius) is pinned by
    * arithmetic, not by a noisy metrics listener.
    */
  private[operators] def haloTargets(coord: Seq[Long],
      chunkDims: Seq[Long], grid: Seq[Long], radius: Int): Seq[Seq[Long]] = {
    val rank = chunkDims.length
    // per dim: home chunk always; -1/+1 when the cell sits inside
    // the halo band of that face AND a neighbor chunk exists
    val perDim: Seq[Seq[Int]] = (0 until rank).map { i =>
      val c = coord(i) / chunkDims(i)
      val within = coord(i) % chunkDims(i)
      val lo = if (within < radius && c > 0) Seq(-1) else Nil
      val hi = if (chunkDims(i) - 1 - within < radius && c < grid(i) - 1)
        Seq(1) else Nil
      0 +: (lo ++ hi)
    }
    perDim.foldLeft(Seq(Seq.empty[Int])) { (acc, offs) =>
      for (a <- acc; o <- offs) yield a :+ o
    }.map(off => (0 until rank).map(i => coord(i) / chunkDims(i) + off(i)))
  }

  /** Route every live cell to its home chunk plus — for cells within
    * `radius` of a chunk face — the adjacent chunk(s), then run
    * `kernel` once per HOME cell with a map of all cells visible to
    * that chunk (own + halo). The neighborhood primitive under
    * [[stencilAvg]] and [[convolve]]; see the object doc for the scale
    * shape. `radius` must not exceed the smallest chunk dimension so a
    * halo only ever comes from the ADJACENT chunk.
    */
  private def haloExchange(ds: GraftDataset, variable: String,
      asOf: Long, radius: Int)(
      kernel: (Seq[Long], scala.collection.Map[Seq[Long], Double]) =>
        Option[Double]): DataFrame = {
    val spark = ds.spark
    import spark.implicits._
    val vm = ds.metadata(asOf).variable(variable)
    val rank = vm.shape.length
    val chunkDims = vm.chunkDims
    val grid = vm.chunkGrid
    require(radius >= 1 && radius <= chunkDims.min,
      s"radius must be in 1..${chunkDims.min} (the smallest chunk dim) " +
        "so halos come from adjacent chunks only — rechunk coarser for " +
        "wider neighborhoods")
    val cells = liveCells(ds.readSlab(variable, asOf), vm)
      .select(col("coord"), col("value")).as[(Seq[Long], Double)]
    val assigned = cells.flatMap { case (coord, value) =>
      haloTargets(coord, chunkDims, grid, radius)
        .map(t => (t.mkString("_"), coord, value))
    }
    assigned.groupByKey(_._1).flatMapGroups { (key, it) =>
      val rows = it.toArray // bounded: one chunk + its halo band
      val visible = new scala.collection.mutable.HashMap[Seq[Long], Double]
      rows.foreach { case (_, c, v) => visible(c) = v }
      val ck = key.split("_").map(_.toLong)
      rows.iterator.filter { case (_, c, _) =>
        (0 until rank).forall(i => c(i) / chunkDims(i) == ck(i))
      }.flatMap { case (_, c, _) => kernel(c, visible).map(v => (c, v)) }
    }.toDF("coord", "value")
  }

  /** Mean over the Chebyshev-`radius` neighborhood of each live cell
    * (the box-blur / smoothing stencil), averaging over the in-bounds
    * LIVE neighbors only — edge cells average fewer taps; fill cells
    * contribute nothing and produce no output row.
    */
  def stencilAvg(ds: GraftDataset, variable: String, asOf: Long,
      radius: Int = 1): DataFrame = {
    val vm = ds.metadata(asOf).variable(variable)
    val rank = vm.shape.length
    val shape = vm.shape
    val offsets = Seq.fill(rank)(-radius.toLong to radius.toLong)
      .foldLeft(Seq(Seq.empty[Long])) { (acc, r) =>
        for (a <- acc; o <- r) yield a :+ o
      }
    haloExchange(ds, variable, asOf, radius) { (c, visible) =>
      var sum = 0.0
      var n = 0L
      offsets.foreach { off =>
        val nb = (0 until rank).map(i => c(i) + off(i))
        if ((0 until rank).forall(i => nb(i) >= 0 && nb(i) < shape(i)))
          visible.get(nb).foreach { v => sum += v; n += 1 }
      }
      Some(sum / n) // n >= 1: the center cell is live
    }
  }

  /** Discrete convolution with an explicit `taps` kernel (offset →
    * weight): out(c) = Σ w · value(c + offset) over the taps whose
    * target is in-bounds and live — missing taps contribute zero (the
    * inner-join semantics a relational formulation would have). The
    * kernel's reach (max |offset| per dim) sets the halo radius.
    */
  def convolve(ds: GraftDataset, variable: String, asOf: Long,
      taps: Seq[(Seq[Long], Double)]): DataFrame = {
    val vm = ds.metadata(asOf).variable(variable)
    val rank = vm.shape.length
    require(taps.nonEmpty && taps.forall(_._1.length == rank),
      s"taps must be nonempty rank-$rank offsets")
    val radius = math.max(1L, taps.map(_._1.map(math.abs).max).max).toInt
    haloExchange(ds, variable, asOf, radius) { (c, visible) =>
      var sum = 0.0
      taps.foreach { case (off, w) =>
        visible.get((0 until rank).map(i => c(i) + off(i)))
          .foreach(v => sum += w * v)
      }
      Some(sum)
    }
  }

  /** Reduce along one axis (xarray's `mean(dim=...)` family): one
    * hash aggregate keyed on the OTHER dims — map-side partials bound
    * the shuffle at |cells|/shape(dim). Rank-1 reduces to a scalar
    * row (empty coord), matching the store's 0-d variables.
    */
  def axisReduce(ds: GraftDataset, variable: String, asOf: Long,
      dim: Int, agg: Column => Column): DataFrame = {
    val vm = ds.metadata(asOf).variable(variable)
    val rank = vm.shape.length
    require(dim >= 0 && dim < rank, s"dim out of range 0..${rank - 1}")
    val others = (0 until rank).filter(_ != dim)
    val keys = others.map(i => element_at(col("coord"), i + 1).as(s"k$i"))
    liveCells(ds.readSlab(variable, asOf), vm)
      .groupBy(keys: _*)
      .agg(agg(col("value")).as("value"))
      .select(array(others.map(i => col(s"k$i")): _*).as("coord"),
        col("value"))
  }

  /** Permute axes into a NEW committed variable (the N-D transpose):
    * output coord k holds input coord perm(k), with shape AND chunk
    * grid permuted alike — so the data physically re-clusters for
    * reads that scan the new leading axis (the whole point of a
    * stored transpose; a view would leave every read striding). One
    * writeSlab shuffle, O(cells).
    */
  def permuteAxes(ds: GraftDataset, variable: String, asOf: Long,
      perm: Seq[Int], newName: String): Long = {
    val vm = ds.metadata(asOf).variable(variable)
    val rank = vm.shape.length
    require(perm.sorted == (0 until rank), s"perm must reorder 0..${rank - 1}")
    require(newName != variable, "permuteAxes writes a new variable")
    val head = ds.latestVersion.getOrElse(asOf)
    val meta = DatasetMeta(
      ds.metadata(head).variables.filterNot(_.name == newName) :+
        VariableMeta(newName, vm.dtype, perm.map(vm.shape),
          perm.map(vm.chunkDims), vm.fillValue))
    val cells = liveCells(ds.readSlab(variable, asOf), vm)
      .select(array(perm.map(p => element_at(col("coord"), p + 1)): _*)
        .as("coord"), col("value"))
    val w = ds.newWriter(meta)
    w.writeSlab(newName, cells)
    w.commit()
  }

  /** Concatenate `vb` after `va` along `dim` into a NEW committed
    * variable (xarray's `concat`): geometries must agree on every
    * other axis; vb's cells shift by va's extent. O(cells of both),
    * one writeSlab shuffle, source chunks decode once each.
    */
  def concatAxis(ds: GraftDataset, va: String, vb: String, asOf: Long,
      dim: Int, newName: String): Long = {
    val ma = ds.metadata(asOf).variable(va)
    val mb = ds.metadata(asOf).variable(vb)
    val rank = ma.shape.length
    require(dim >= 0 && dim < rank, s"dim out of range 0..${rank - 1}")
    require(mb.shape.length == rank &&
      (0 until rank).forall(i => i == dim || ma.shape(i) == mb.shape(i)),
      "concatAxis needs equal shapes on every non-concat axis")
    require(ma.dtype == mb.dtype, "concatAxis needs matching dtypes")
    val head = ds.latestVersion.getOrElse(asOf)
    val shape = ma.shape.zipWithIndex.map { case (s, i) =>
      if (i == dim) s + mb.shape(dim) else s
    }
    val meta = DatasetMeta(
      ds.metadata(head).variables.filterNot(_.name == newName) :+
        VariableMeta(newName, ma.dtype, shape, ma.chunkDims, ma.fillValue))
    val off = ma.shape(dim)
    def shifted(v: String, delta: Long): DataFrame =
      liveCells(ds.readSlab(v, asOf), ds.metadata(asOf).variable(v))
        .select(array((0 until rank).map { i =>
          if (i == dim) element_at(col("coord"), i + 1) + delta
          else element_at(col("coord"), i + 1)
        }: _*).as("coord"), col("value"))
    val w = ds.newWriter(meta)
    w.writeSlab(newName, shifted(va, 0L) unionAll shifted(vb, off))
    w.commit()
  }

  /** Commit [[stencilAvg]]'s result as first-class variable
    * `<variable>_sm<radius>` (same geometry as the source) — the
    * `CALL g.system.stencil` backend. Returns (name, version).
    *
    * Idempotent REFRESH semantics: writeSlab merges, so when the
    * target variable already exists, cells that were live in the old
    * materialization but produce no row in the new stencil (source
    * cells deleted since) are explicitly written back to fill —
    * otherwise a re-run after deletions would leave stale smoothed
    * values behind. The tombstone set comes from one anti-join of the
    * old live coords against the new output — O(old + new), the same
    * scale as the write itself.
    */
  def materializeStencil(ds: GraftDataset, variable: String, asOf: Long,
      radius: Int): (String, Long) = {
    val vm = ds.metadata(asOf).variable(variable)
    val name = s"${variable}_sm$radius"
    val head = ds.latestVersion.getOrElse(asOf)
    val headMeta = ds.metadata(head)
    val existing = headMeta.variables.find(_.name == name)
    // a neighborhood MEAN of an integer variable is fractional —
    // widen to double; NaN fill always (a finite fill could collide
    // with a computed mean and read back as a tombstone), matching
    // buildPyramid's derived-level policy
    val dt = if (vm.dtype == "float") "float" else "double"
    // a refresh must land in a target that can hold the means: an
    // existing _smN with an integer dtype or finite fill (e.g. one
    // materialized for a short source before the widen policy) would
    // truncate or tombstone silently — refuse, never degrade
    existing.foreach { old =>
      require((old.dtype == "double" || old.dtype == "float") &&
        old.fillValue.isNaN,
        s"existing $name has dtype ${old.dtype}/fill ${old.fillValue}" +
          " — a refresh would truncate or tombstone fractional means;" +
          " drop the variable or materialize under a new name")
      // a REFRESH must not mix snapshots: the stencil is computed at
      // asOf but the tombstone diff runs against the CURRENT
      // materialization — refreshing at an older asOf would commit an
      // outdated stencil over a newer ledger with tombstones derived
      // from a third state. First materialization carries no
      // tombstone set, so any asOf is fine there.
      require(asOf == head,
        s"stencil refresh of $name must run at the latest version " +
          s"$head, got asOf=$asOf — materialize a historical " +
          "snapshot under a new name instead")
    }
    // refresh reuses the existing variable's identity (index key,
    // lineage) — synthesizing a replacement would read as drop+create
    val meta = DatasetMeta(
      headMeta.variables.filterNot(_.name == name) :+ existing.getOrElse(
        VariableMeta(name, dt, vm.shape, vm.chunkDims, Double.NaN)))
    val out = stencilAvg(ds, variable, asOf, radius)
    val stale = existing.map { old =>
      liveCells(ds.readSlab(name, head), old)
        .select(col("coord"))
        .join(out.select(col("coord")), Seq("coord"), "left_anti")
        .select(col("coord"), lit(old.fillValue).as("value"))
    }
    val w = ds.newWriter(meta)
    w.writeSlab(name, stale.map(out.unionAll).getOrElse(out))
    (name, w.commit())
  }

  /** Export `variable`@`asOf` as a portable parquet snapshot (one
    * column per dim + value — no engine-private types), readable by
    * any parquet consumer. Stored cells only: cost is O(stored), and
    * the dense fill never materializes.
    */
  def exportSnapshot(ds: GraftDataset, variable: String, asOf: Long,
      outDir: String): Unit = {
    val rank = ds.metadata(asOf).variable(variable).shape.length
    ds.readStored(variable, asOf)
      .select((0 until rank).map(i =>
        element_at(col("coord"), i + 1).as(s"x$i")) :+ col("value"): _*)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Import a snapshot written by [[exportSnapshot]] into `variable`
    * of a dataset governed by `meta`, as one committed version.
    */
  def importSnapshot(ds: GraftDataset, variable: String,
      meta: DatasetMeta, inDir: String): Long = {
    val rank = meta.variable(variable).shape.length
    val cells = ds.spark.read.parquet(inDir)
      .select(array((0 until rank).map(i =>
        col(s"x$i").cast("long")): _*).as("coord"),
        col("value").cast("double").as("value"))
    val w = ds.newWriter(meta)
    w.writeSlab(variable, cells)
    w.commit()
  }

  /** Bench-only SCALED pyramid refresh — no oracle (m45 pins the
    * semantics); this pins the DATA-PATH cost that m45's toy grid
    * cannot: at sf-bench scale the m/st flows are dominated by
    * per-commit constants, so a data-path regression (the change-feed
    * read, the block re-aggregation, the level writes) hides inside
    * commit noise. Here the same refresh flow runs over a 512×512
    * grid (chunk 64×64): one overwrite of the top quarter (16 chunks,
    * 65 536 cells), then a timed 2-level [[refreshPyramid]]. The
    * constant/data split of the five slowest flows is recorded in
    * docs/BENCH_NOISE.md — this entry is the data half's regression
    * gate. Returns the refresh seconds.
    */
  private[graft] def scaledPyramidRefreshBench(s: SparkSession,
      n: Long = 512L, chunk: Long = 64L, changedRows: Long = 128L)
      : Double = {
    val lake = new GraftLake(s,
      Files.createTempDirectory("graft_arrbench_").toString)
    lake.create("grid")
    val ds = lake.connect("grid")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(n, n), Seq(chunk, chunk),
        Double.NaN)))
    def ramp(rows: Long, salt: Long): DataFrame =
      s.range(rows).select(
        array(expr(s"id DIV $n"), col("id") % n).as("coord"),
        ((col("id") % 97) + salt).cast("double").as("value"))
    val w = ds.newWriter(meta)
    w.writeSlab("t", ramp(n * n, 0L))
    val v1 = w.commit()
    buildPyramid(ds, "t", v1, Seq(2L, 2L), levels = 2)
    val since = ds.latestVersion.get
    val w2 = ds.newWriter(ds.metadata(since))
    w2.writeSlab("t", ramp(changedRows * n, 1000L)) // leading chunk rows
    w2.commit()
    val t0 = System.nanoTime()
    refreshPyramid(ds, "t", Seq(2L, 2L), levels = 2, since)
    (System.nanoTime() - t0) / 1e9
  }

  // ---- driver gate queries -------------------------------------------

  private val counter = new java.util.concurrent.atomic.AtomicInteger()

  private def withLake[T](s: SparkSession)(body: GraftLake => T): T =
    body(new GraftLake(s, Files.createTempDirectory("graft_arr_").toString))

  private def cellsDF(s: SparkSession,
      cells: Seq[(Seq[Long], Double)]): DataFrame = {
    import s.implicits._
    cells.toDF("coord", "value")
  }

  private def splitXY(df: DataFrame): DataFrame =
    df.select(element_at(col("coord"), 1).as("x"),
      element_at(col("coord"), 2).as("y"), col("value"))

  val all: Seq[Q] = Seq(

    // Block coarsening: 16×16 (chunk 4×4) with value = x*16+y, mean
    // over 2×2 blocks → 8×8 with value = 32x + 2y + 8.5 (closed form;
    // sums are exact integers, /4 is exact in binary — bit-stable
    // across engines).
    Q("m35_coarsen",
      Some("SELECT a.range AS x, b.range AS y, " +
        "CAST(32 * a.range + 2 * b.range + 8.5 AS DOUBLE) AS value " +
        "FROM range(8) a, range(8) b"),
      (s, d) => withLake(s) { lake =>
        lake.create("grid")
        val ds = lake.connect("grid")
        val meta = DatasetMeta(Seq(
          VariableMeta("t", "double", Seq(16, 16), Seq(4, 4), Double.NaN)))
        val w = ds.newWriter(meta)
        w.writeSlab("t", cellsDF(s,
          for (i <- 0L until 16L; j <- 0L until 16L)
            yield (Seq(i, j): Seq[Long]) -> (i * 16 + j).toDouble))
        val v1 = w.commit()
        splitXY(coarsen(ds, "t", v1, Seq(2L, 2L), avg))
      }),

    // Strided hyperslab [4:60:7] of a 1-D len-64 variable (chunk 8)
    // with value = i*i: 8 output cells, k -> (4+7k)^2. The (4, 60) box
    // prunes chunks at the index (gated in ArrayOpsSpec).
    Q("m36_hyperslab",
      Some("SELECT r.range AS k, " +
        "CAST((4 + 7 * r.range) * (4 + 7 * r.range) AS DOUBLE) AS value " +
        "FROM range(8) r"),
      (s, d) => withLake(s) { lake =>
        lake.create("line")
        val ds = lake.connect("line")
        val meta = DatasetMeta(Seq(
          VariableMeta("t", "double", Seq(64), Seq(8), Double.NaN)))
        val w = ds.newWriter(meta)
        w.writeSlab("t", cellsDF(s,
          (0L until 64L).map(i => (Seq(i): Seq[Long]) -> (i * i).toDouble)))
        val v1 = w.commit()
        hyperslab(ds, "t", v1, Seq((4L, 60L, 7L)))
          .select(element_at(col("coord"), 1).as("k"), col("value"))
      }),

    // Rolling mean along y (trailing width 3) of an 8×8 grid with
    // value = x*8+y, partitioned by x: sums of consecutive integers
    // are exact and divisible, so the quotient is bit-stable.
    Q("m37_rolling_mean",
      Some("WITH c AS (SELECT a.range AS x, b.range AS y, " +
        "CAST(a.range * 8 + b.range AS DOUBLE) AS value " +
        "FROM range(8) a, range(8) b) " +
        "SELECT x, y, value, avg(value) OVER (PARTITION BY x ORDER BY y " +
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll_mean FROM c"),
      (s, d) => withLake(s) { lake =>
        lake.create("grid")
        val ds = lake.connect("grid")
        val meta = DatasetMeta(Seq(
          VariableMeta("t", "double", Seq(8, 8), Seq(4, 4), Double.NaN)))
        val w = ds.newWriter(meta)
        w.writeSlab("t", cellsDF(s,
          for (i <- 0L until 8L; j <- 0L until 8L)
            yield (Seq(i, j): Seq[Long]) -> (i * 8 + j).toDouble))
        val v1 = w.commit()
        rollingMean(ds, "t", v1, dim = 1, width = 3)
          .select(element_at(col("coord"), 1).as("x"),
            element_at(col("coord"), 2).as("y"),
            col("value"), col("roll_mean"))
      }),

    // CDC replication: src v1 = full 8×8 (value x*8+y); v2 overwrites
    // the 2×2 corner (+1000) and deletes (7,7). A replica is seeded
    // from readStored(v1), then applyDiff ships ONLY the changed cells
    // (O(changed chunks) source I/O — gated in ArrayOpsSpec). Returned:
    // the replica's live cells at its head, which must equal src @ v2.
    Q("m38_cdc_apply",
      Some("SELECT a.range AS x, b.range AS y, " +
        "CAST(a.range * 8 + b.range + CASE WHEN a.range < 2 AND b.range < 2 " +
        "THEN 1000 ELSE 0 END AS DOUBLE) AS value " +
        "FROM range(8) a, range(8) b " +
        "WHERE NOT (a.range = 7 AND b.range = 7)"),
      (s, d) => withLake(s) { lake =>
        lake.create("src")
        lake.create("rep")
        val src = lake.connect("src")
        val rep = lake.connect("rep")
        val meta = DatasetMeta(Seq(
          VariableMeta("t", "double", Seq(8, 8), Seq(4, 4), Double.NaN)))
        val w1 = src.newWriter(meta)
        w1.writeSlab("t", cellsDF(s,
          for (i <- 0L until 8L; j <- 0L until 8L)
            yield (Seq(i, j): Seq[Long]) -> (i * 8 + j).toDouble))
        val v1 = w1.commit()
        val w2 = src.newWriter(meta)
        w2.writeSlab("t", cellsDF(s,
          (for (i <- 0L until 2L; j <- 0L until 2L)
            yield (Seq(i, j): Seq[Long]) -> (i * 8 + j + 1000).toDouble) :+
            ((Seq(7L, 7L): Seq[Long]) -> Double.NaN)))
        val v2 = w2.commit()
        // seed replica at v1 from stored cells only
        val r1 = rep.newWriter(meta)
        r1.writeSlab("t", src.readStored("t", v1))
        r1.commit()
        // incremental catch-up to v2
        val rv2 = applyDiff(src, rep, "t", v1, v2, meta)
        splitXY(liveCells(rep.readSlab("t", rv2), meta.variable("t")))
      }),

    // Aligned array arithmetic: w = u - 2v over two 8×8 variables in
    // ONE pass (readSlabs resolves both via a single index read and
    // decodes each tile once for both variables — not two reads plus a
    // cell-level join, which would shuffle 2·|cells| rows).
    Q("m39_array_binop",
      Some("SELECT a.range AS x, b.range AS y, " +
        "CAST((a.range * 8 + b.range) - 2 * (a.range + b.range) AS DOUBLE) " +
        "AS value FROM range(8) a, range(8) b"),
      (s, d) => withLake(s) { lake =>
        lake.create("grid")
        val ds = lake.connect("grid")
        val meta = DatasetMeta(Seq(
          VariableMeta("u", "double", Seq(8, 8), Seq(4, 4), Double.NaN),
          VariableMeta("v", "double", Seq(8, 8), Seq(4, 4), Double.NaN)))
        val w = ds.newWriter(meta)
        w.writeSlab("u", cellsDF(s,
          for (i <- 0L until 8L; j <- 0L until 8L)
            yield (Seq(i, j): Seq[Long]) -> (i * 8 + j).toDouble))
        w.writeSlab("v", cellsDF(s,
          for (i <- 0L until 8L; j <- 0L until 8L)
            yield (Seq(i, j): Seq[Long]) -> (i + j).toDouble))
        val v1 = w.commit()
        ds.readSlabs(Seq("u", "v"), v1)
          .select(element_at(col("coord"), 1).as("x"),
            element_at(col("coord"), 2).as("y"),
            (col("u") - lit(2) * col("v")).as("value"))
      }),

    // Portable snapshot round-trip: export t@v1 to plain parquet
    // (x0, x1, value columns), import into a fresh dataset, read back.
    // The vehicle for cross-engine interchange and backup/restore.
    Q("m40_export_import",
      Some("SELECT a.range AS x, b.range AS y, " +
        "CAST(a.range * 8 + b.range AS DOUBLE) AS value " +
        "FROM range(8) a, range(8) b WHERE (a.range + b.range) % 3 = 0"),
      (s, d) => withLake(s) { lake =>
        lake.create("src")
        lake.create("dst")
        val src = lake.connect("src")
        val dst = lake.connect("dst")
        val meta = DatasetMeta(Seq(
          VariableMeta("t", "double", Seq(8, 8), Seq(4, 4), Double.NaN)))
        val w = src.newWriter(meta)
        w.writeSlab("t", cellsDF(s,
          for (i <- 0L until 8L; j <- 0L until 8L if (i + j) % 3 == 0)
            yield (Seq(i, j): Seq[Long]) -> (i * 8 + j).toDouble))
        val v1 = w.commit()
        val snap = Files.createTempDirectory("graft_snap_").toString
        exportSnapshot(src, "t", v1, snap)
        val v2 = importSnapshot(dst, "t", meta, snap)
        splitXY(liveCells(dst.readSlab("t", v2), meta.variable("t")))
      }),

    // Linear-interpolation refinement along y of an 8×8 grid with
    // value = x*8+y: output y' in 0..14, value = x*8 + y'/2 for ALL y'
    // (originals and midpoints collapse to one closed form; halves are
    // exact in binary, so the hash is engine-stable).
    Q("m41_interp_refine",
      Some("SELECT a.range AS x, b.range AS y2, " +
        "CAST(a.range * 8 + b.range / 2.0 AS DOUBLE) AS value " +
        "FROM range(8) a, range(15) b"),
      (s, d) => withLake(s) { lake =>
        lake.create("grid")
        val ds = lake.connect("grid")
        val meta = DatasetMeta(Seq(
          VariableMeta("t", "double", Seq(8, 8), Seq(4, 4), Double.NaN)))
        val w = ds.newWriter(meta)
        w.writeSlab("t", cellsDF(s,
          for (i <- 0L until 8L; j <- 0L until 8L)
            yield (Seq(i, j): Seq[Long]) -> (i * 8 + j).toDouble))
        val v1 = w.commit()
        interpRefine(ds, "t", v1, dim = 1)
          .select(element_at(col("coord"), 1).as("x"),
            element_at(col("coord"), 2).as("y2"), col("value"))
      }),

    // Zone-stat coarsening: per-chunk SUM of a fully-written 16×16
    // (chunk 4×4, fill 0) answered from the index alone — zero chunk
    // decodes (gated in ArrayOpsSpec). Σ over tile (cx,cy) of x*16+y
    // = 1024cx + 64cy + 408.
    Q("m42_coarsen_stats",
      Some("SELECT a.range AS cx, b.range AS cy, " +
        "CAST(1024 * a.range + 64 * b.range + 408 AS DOUBLE) AS value " +
        "FROM range(4) a, range(4) b"),
      (s, d) => withLake(s) { lake =>
        lake.create("grid")
        val ds = lake.connect("grid")
        val meta = DatasetMeta(Seq(
          VariableMeta("t", "double", Seq(16, 16), Seq(4, 4), 0.0)))
        val w = ds.newWriter(meta)
        w.writeSlab("t", cellsDF(s,
          for (i <- 0L until 16L; j <- 0L until 16L)
            yield (Seq(i, j): Seq[Long]) -> (i * 16 + j).toDouble))
        val v1 = w.commit()
        chunkCoarsen(ds, "t", v1, "sum")
          .select(element_at(col("coord"), 1).as("cx"),
            element_at(col("coord"), 2).as("cy"), col("value"))
      }),

    // Overview pyramid: two committed 2×2-mean levels over a 16×16
    // base. l1(x,y) = 32x+2y+8.5 (8×8), l2(x,y) = 64x+4y+25.5 (4×4) —
    // every quotient exact in binary, so both levels hash-gate.
    Q("m43_pyramid",
      Some("SELECT CAST(1 AS BIGINT) AS level, a.range AS x, " +
        "b.range AS y, CAST(32 * a.range + 2 * b.range + 8.5 AS DOUBLE) " +
        "AS value FROM range(8) a, range(8) b " +
        "UNION ALL SELECT 2, a.range, b.range, " +
        "CAST(64 * a.range + 4 * b.range + 25.5 AS DOUBLE) " +
        "FROM range(4) a, range(4) b"),
      (s, d) => withLake(s) { lake =>
        lake.create("grid")
        val ds = lake.connect("grid")
        val meta = DatasetMeta(Seq(
          VariableMeta("t", "double", Seq(16, 16), Seq(4, 4), Double.NaN)))
        val w = ds.newWriter(meta)
        w.writeSlab("t", cellsDF(s,
          for (i <- 0L until 16L; j <- 0L until 16L)
            yield (Seq(i, j): Seq[Long]) -> (i * 16 + j).toDouble))
        val v1 = w.commit()
        val lvls = buildPyramid(ds, "t", v1, Seq(2L, 2L), levels = 2)
        lvls.drop(1).zipWithIndex.map { case ((name, v), k) =>
          liveCells(ds.readSlab(name, v), ds.metadata(v).variable(name))
            .select(lit(k + 1L).as("level"),
              element_at(col("coord"), 1).as("x"),
              element_at(col("coord"), 2).as("y"), col("value"))
        }.reduce(_ unionAll _)
      }),

    // The same pyramid driven entirely from SQL: CREATE TABLE + INSERT
    // + CALL g.system.build_pyramid, levels read back as first-class
    // catalog tables. Shares m43's closed form.
    Q("m44_pyramid_sql",
      Some("SELECT CAST(1 AS BIGINT) AS level, a.range AS x, " +
        "b.range AS y, CAST(32 * a.range + 2 * b.range + 8.5 AS DOUBLE) " +
        "AS value FROM range(8) a, range(8) b " +
        "UNION ALL SELECT 2, a.range, b.range, " +
        "CAST(64 * a.range + 4 * b.range + 25.5 AS DOUBLE) " +
        "FROM range(4) a, range(4) b"),
      (s, d) => {
        val cat = s"g_m44_${counter.incrementAndGet()}"
        val root = Files.createTempDirectory("graft_m44_").toString
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        s.sql(s"CREATE NAMESPACE $cat.grid")
        s.sql(s"CREATE TABLE $cat.grid.t (x0 BIGINT, x1 BIGINT, " +
          "value DOUBLE) TBLPROPERTIES (shape='16,16', chunkDims='4,4')")
        s.sql(s"INSERT INTO $cat.grid.t " +
          "SELECT a.id, b.id, CAST(a.id * 16 + b.id AS DOUBLE) " +
          "FROM range(16) a, range(16) b")
        val built = s.sql(s"CALL $cat.system.build_pyramid(" +
          "dataset => 'grid', table => 't', levels => 2)").collect()
        require(built.map(_.getString(1)).toSeq == Seq("t_l1", "t_l2"),
          s"unexpected pyramid accounting: ${built.mkString(",")}")
        Seq(1, 2).map { k =>
          s.sql(s"SELECT CAST($k AS BIGINT) AS level, x0 AS x, x1 AS y, " +
            s"value FROM $cat.grid.t_l$k WHERE NOT isnan(value)")
        }.reduce(_ unionAll _)
      }),

    // Radius-1 box-blur stencil over a 16×16 grid (chunk 4×4, value
    // x*16+y) via chunk-halo exchange: interior cells average 9 taps,
    // edges 6, corners 4 — the oracle replays the same neighborhood
    // as a relational self-join. Sums of exact integers + ONE IEEE
    // division on both engines → hash-stable.
    Q("m46_stencil",
      Some("WITH c AS (SELECT a.range AS x, b.range AS y, " +
        "CAST(a.range * 16 + b.range AS DOUBLE) AS v " +
        "FROM range(16) a, range(16) b) " +
        "SELECT c1.x AS x, c1.y AS y, avg(c2.v) AS value " +
        "FROM c c1 JOIN c c2 ON abs(c1.x - c2.x) <= 1 " +
        "AND abs(c1.y - c2.y) <= 1 GROUP BY c1.x, c1.y"),
      (s, d) => withLake(s) { lake =>
        lake.create("grid")
        val ds = lake.connect("grid")
        val meta = DatasetMeta(Seq(
          VariableMeta("t", "double", Seq(16, 16), Seq(4, 4), Double.NaN)))
        val w = ds.newWriter(meta)
        w.writeSlab("t", cellsDF(s,
          for (i <- 0L until 16L; j <- 0L until 16L)
            yield (Seq(i, j): Seq[Long]) -> (i * 16 + j).toDouble))
        val v1 = w.commit()
        splitXY(stencilAvg(ds, "t", v1, radius = 1))
      }),

    // The same radius-1 stencil driven entirely from SQL: CREATE TABLE
    // + INSERT + CALL g.system.stencil, the smoothed level read back
    // as a first-class catalog table. Shares m46's oracle.
    Q("m49_stencil_sql",
      Some("WITH c AS (SELECT a.range AS x, b.range AS y, " +
        "CAST(a.range * 16 + b.range AS DOUBLE) AS v " +
        "FROM range(16) a, range(16) b) " +
        "SELECT c1.x AS x, c1.y AS y, avg(c2.v) AS value " +
        "FROM c c1 JOIN c c2 ON abs(c1.x - c2.x) <= 1 " +
        "AND abs(c1.y - c2.y) <= 1 GROUP BY c1.x, c1.y"),
      (s, d) => {
        val cat = s"g_m49_${counter.incrementAndGet()}"
        val root = Files.createTempDirectory("graft_m49_").toString
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        s.sql(s"CREATE NAMESPACE $cat.grid")
        s.sql(s"CREATE TABLE $cat.grid.t (x0 BIGINT, x1 BIGINT, " +
          "value DOUBLE) TBLPROPERTIES (shape='16,16', chunkDims='4,4')")
        s.sql(s"INSERT INTO $cat.grid.t " +
          "SELECT a.id, b.id, CAST(a.id * 16 + b.id AS DOUBLE) " +
          "FROM range(16) a, range(16) b")
        val made = s.sql(s"CALL $cat.system.stencil(" +
          "dataset => 'grid', table => 't', radius => 1)").collect()
        require(made.map(_.getString(1)).toSeq == Seq("t_sm1"),
          s"unexpected stencil accounting: ${made.mkString(",")}")
        s.sql(s"SELECT x0 AS x, x1 AS y, value FROM $cat.grid.t_sm1 " +
          "WHERE NOT isnan(value)")
      }),

    // 5-point Laplacian convolution over the same grid: integer
    // weights × integer values — every sum exact, zero divisions.
    // Interior cells cancel to 0 (the filter detects edges of the
    // linear ramp only at the boundary).
    Q("m47_convolve",
      Some("WITH c AS (SELECT a.range AS x, b.range AS y, " +
        "CAST(a.range * 16 + b.range AS DOUBLE) AS v " +
        "FROM range(16) a, range(16) b), " +
        "k AS (SELECT * FROM (VALUES (0, 0, 4.0), (1, 0, -1.0), " +
        "(-1, 0, -1.0), (0, 1, -1.0), (0, -1, -1.0)) t(dx, dy, w)) " +
        "SELECT c1.x AS x, c1.y AS y, sum(k.w * c2.v) AS value " +
        "FROM c c1 CROSS JOIN k JOIN c c2 ON c2.x = c1.x + k.dx " +
        "AND c2.y = c1.y + k.dy GROUP BY c1.x, c1.y"),
      (s, d) => withLake(s) { lake =>
        lake.create("grid")
        val ds = lake.connect("grid")
        val meta = DatasetMeta(Seq(
          VariableMeta("t", "double", Seq(16, 16), Seq(4, 4), Double.NaN)))
        val w = ds.newWriter(meta)
        w.writeSlab("t", cellsDF(s,
          for (i <- 0L until 16L; j <- 0L until 16L)
            yield (Seq(i, j): Seq[Long]) -> (i * 16 + j).toDouble))
        val v1 = w.commit()
        splitXY(convolve(ds, "t", v1, Seq(
          (Seq(0L, 0L): Seq[Long]) -> 4.0,
          (Seq(1L, 0L): Seq[Long]) -> -1.0,
          (Seq(-1L, 0L): Seq[Long]) -> -1.0,
          (Seq(0L, 1L): Seq[Long]) -> -1.0,
          (Seq(0L, -1L): Seq[Long]) -> -1.0)))
      }),

    // Axis reduction: mean over y of the 16×16 ramp x*16+y → 16 rows
    // 16x + 7.5 (the /16 is exact in binary). One hash aggregate on x.
    Q("m50_axis_reduce",
      Some("SELECT a.range AS x, CAST(16 * a.range + 7.5 AS DOUBLE) " +
        "AS value FROM range(16) a"),
      (s, d) => withLake(s) { lake =>
        lake.create("grid")
        val ds = lake.connect("grid")
        val meta = DatasetMeta(Seq(
          VariableMeta("t", "double", Seq(16, 16), Seq(4, 4), Double.NaN)))
        val w = ds.newWriter(meta)
        w.writeSlab("t", cellsDF(s,
          for (i <- 0L until 16L; j <- 0L until 16L)
            yield (Seq(i, j): Seq[Long]) -> (i * 16 + j).toDouble))
        val v1 = w.commit()
        axisReduce(ds, "t", v1, dim = 1, avg)
          .select(element_at(col("coord"), 1).as("x"), col("value"))
      }),

    // Stored transpose: permute (1,0) of the 8×8 ramp commits a new
    // variable with shape AND chunk grid transposed; read back,
    // tT(x,y) = y*8 + x.
    Q("m51_permute",
      Some("SELECT a.range AS x, b.range AS y, " +
        "CAST(b.range * 8 + a.range AS DOUBLE) AS value " +
        "FROM range(8) a, range(8) b"),
      (s, d) => withLake(s) { lake =>
        lake.create("grid")
        val ds = lake.connect("grid")
        val meta = DatasetMeta(Seq(
          VariableMeta("t", "double", Seq(8, 8), Seq(4, 2), Double.NaN)))
        val w = ds.newWriter(meta)
        w.writeSlab("t", cellsDF(s,
          for (i <- 0L until 8L; j <- 0L until 8L)
            yield (Seq(i, j): Seq[Long]) -> (i * 8 + j).toDouble))
        val v1 = w.commit()
        val v2 = permuteAxes(ds, "t", v1, Seq(1, 0), "tT")
        require(ds.metadata(v2).variable("tT").chunkDims == Seq(2L, 4L),
          "transpose must permute the chunk grid too")
        splitXY(liveCells(ds.readSlab("tT", v2),
          ds.metadata(v2).variable("tT")))
      }),

    // Axis concatenation: two 4×8 halves (the second offset +1000)
    // land as one committed 8×8 variable.
    Q("m52_concat",
      Some("SELECT a.range AS x, b.range AS y, " +
        "CAST(CASE WHEN a.range < 4 THEN a.range * 8 + b.range " +
        "ELSE 1000 + (a.range - 4) * 8 + b.range END AS DOUBLE) " +
        "AS value FROM range(8) a, range(8) b"),
      (s, d) => withLake(s) { lake =>
        lake.create("grid")
        val ds = lake.connect("grid")
        val meta = DatasetMeta(Seq(
          VariableMeta("u", "double", Seq(4, 8), Seq(4, 4), Double.NaN),
          VariableMeta("v", "double", Seq(4, 8), Seq(4, 4), Double.NaN)))
        val w = ds.newWriter(meta)
        w.writeSlab("u", cellsDF(s,
          for (i <- 0L until 4L; j <- 0L until 8L)
            yield (Seq(i, j): Seq[Long]) -> (i * 8 + j).toDouble))
        w.writeSlab("v", cellsDF(s,
          for (i <- 0L until 4L; j <- 0L until 8L)
            yield (Seq(i, j): Seq[Long]) -> (1000 + i * 8 + j).toDouble))
        val v1 = w.commit()
        val v2 = concatAxis(ds, "u", "v", v1, dim = 0, "w")
        splitXY(liveCells(ds.readSlab("w", v2),
          ds.metadata(v2).variable("w")))
      }),

    // Incremental pyramid maintenance: after the base pyramid, one
    // commit overwrites cells (0,0)/(0,1) (+1000) and deletes block
    // (7,7) whole; refreshPyramid touches ONLY the two changed chunks
    // per level. Closed forms: l1(0,0) -> 508.5, l1(7,7) -> gone,
    // l2(0,0) -> 150.5, l2(3,3) -> mean of the 3 surviving l1 cells
    // (671.5/3 — the same single IEEE division on both engines).
    Q("m45_pyramid_refresh",
      Some("SELECT CAST(1 AS BIGINT) AS level, a.range AS x, " +
        "b.range AS y, CAST(CASE WHEN a.range = 0 AND b.range = 0 " +
        "THEN 508.5 ELSE 32 * a.range + 2 * b.range + 8.5 END AS DOUBLE) " +
        "AS value FROM range(8) a, range(8) b " +
        "WHERE NOT (a.range = 7 AND b.range = 7) " +
        "UNION ALL SELECT 2, a.range, b.range, " +
        "CAST(CASE WHEN a.range = 0 AND b.range = 0 THEN 150.5 " +
        "WHEN a.range = 3 AND b.range = 3 THEN 671.5 / 3 " +
        "ELSE 64 * a.range + 4 * b.range + 25.5 END AS DOUBLE) " +
        "FROM range(4) a, range(4) b"),
      (s, d) => withLake(s) { lake =>
        lake.create("grid")
        val ds = lake.connect("grid")
        val meta = DatasetMeta(Seq(
          VariableMeta("t", "double", Seq(16, 16), Seq(4, 4), Double.NaN)))
        val w = ds.newWriter(meta)
        w.writeSlab("t", cellsDF(s,
          for (i <- 0L until 16L; j <- 0L until 16L)
            yield (Seq(i, j): Seq[Long]) -> (i * 16 + j).toDouble))
        val v1 = w.commit()
        buildPyramid(ds, "t", v1, Seq(2L, 2L), levels = 2)
        val since = ds.latestVersion.get
        // one base commit: overwrite two cells, delete block (7,7)
        val w2 = ds.newWriter(ds.metadata(since))
        w2.writeSlab("t", cellsDF(s, Seq(
          (Seq(0L, 0L): Seq[Long]) -> 1000.0,
          (Seq(0L, 1L): Seq[Long]) -> 1001.0) ++
          (for (i <- 14L until 16L; j <- 14L until 16L)
            yield (Seq(i, j): Seq[Long]) -> Double.NaN)))
        w2.commit()
        refreshPyramid(ds, "t", Seq(2L, 2L), levels = 2, since)
        val head = ds.latestVersion.get
        Seq("t_l1" -> 1L, "t_l2" -> 2L).map { case (name, k) =>
          liveCells(ds.readSlab(name, head),
              ds.metadata(head).variable(name))
            .select(lit(k).as("level"),
              element_at(col("coord"), 1).as("x"),
              element_at(col("coord"), 2).as("y"), col("value"))
        }.reduce(_ unionAll _)
      }),

    // Fill-aware analytics on a NON-NaN-fill dtype (the reference's
    // fill-short case, hbase_test.clj:152-156): a short variable with
    // fill 9, sparse live cells value x+y+10 where (x+y)%3=0. coarsen
    // and stencilAvg must select through the fill-9 predicate — a
    // blanket !isnan would average the dense fill cells into every
    // block/neighborhood (the round-10 `weak`). Integer sums + one
    // IEEE division per row replay bit-identically in DuckDB.
    Q("m53_coarsen_short",
      Some("WITH c AS (SELECT a.range AS x, b.range AS y, " +
        "CAST(a.range + b.range + 10 AS DOUBLE) AS v " +
        "FROM range(8) a, range(8) b WHERE (a.range + b.range) % 3 = 0), " +
        "co AS (SELECT 'coarsen' AS part, x // 2 AS x, y // 2 AS y, " +
        "avg(v) AS value FROM c GROUP BY 1, 2, 3), " +
        "st AS (SELECT 'stencil' AS part, c1.x AS x, c1.y AS y, " +
        "avg(c2.v) AS value FROM c c1 JOIN c c2 " +
        "ON abs(c1.x - c2.x) <= 1 AND abs(c1.y - c2.y) <= 1 " +
        "GROUP BY 1, 2, 3) " +
        "SELECT * FROM co UNION ALL SELECT * FROM st"),
      (s, d) => withLake(s) { lake =>
        lake.create("grid")
        val ds = lake.connect("grid")
        val meta = DatasetMeta(Seq(
          VariableMeta("t", "short", Seq(8, 8), Seq(4, 4), 9.0)))
        val w = ds.newWriter(meta)
        w.writeSlab("t", cellsDF(s,
          for (i <- 0L until 8L; j <- 0L until 8L if (i + j) % 3 == 0)
            yield (Seq(i, j): Seq[Long]) -> (i + j + 10).toDouble))
        val v1 = w.commit()
        val co = coarsen(ds, "t", v1, Seq(2L, 2L), avg)
          .select(lit("coarsen").as("part"),
            element_at(col("coord"), 1).as("x"),
            element_at(col("coord"), 2).as("y"), col("value"))
        val st = stencilAvg(ds, "t", v1, radius = 1)
          .select(lit("stencil").as("part"),
            element_at(col("coord"), 1).as("x"),
            element_at(col("coord"), 2).as("y"), col("value"))
        co unionAll st
      }))
}
