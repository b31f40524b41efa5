package graft.operators

import java.nio.file.Files

import graft.{ColUtil, Q, QueryPack}
import graft.core.{GraftDataset, GraftLake}
import graft.core.Model.{DatasetMeta, VariableMeta}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** PERSISTED, incrementally-maintained IVF-PQ vector index.
  *
  * The s02/s04/s05/s07/s08 family rebuilds its LSH planes / IVF
  * centroids / PQ codebooks inline on every call — fine for a one-off
  * query, wrong for a curation pipeline that probes the same corpus
  * thousands of times: at 100 TB the index build (several full-corpus
  * shuffles) dwarfs every probe. Here the index is built ONCE into
  * versioned store variables and probed with zero build jobs:
  *
  *   - `centroids`  (K × dims, double)   coarse quantizer
  *   - `codebook`   (M × Ks × sub, double) PQ codewords
  *   - `assign`     (N × rnStore, short) each vector's top-rnStore cells
  *   - `codes`      (N × M, short)       PQ code per subspace
  *   - `norms`      (N, double)          L2 norms
  *   - `probe_params` (zero cells)       nProbe/topC/topK, shape-encoded
  *
  * The whole geometry is a [[VectorIndexConfig]] persisted WITH the
  * index (see its doc) — refresh/probe/delete read it back, so
  * differently-tuned indexes coexist and nothing is compile-time.
  *
  * The 100 TB shape: a probe reads `assign`+`codes`+`norms` — M+2
  * shorts + a double per vector (≈16 B) instead of the 512-byte
  * vector — with the inverted list as the join key; `centroids` and
  * `codebook` are KB-sized broadcasts; full vectors are touched only
  * for the per-query shortlist re-rank. Because the store is MVCC,
  * the index itself is versioned: time travel, clones and retention
  * apply to it like any other variable, and [[refreshVectorIndex]]
  * appends new vectors by writing ONLY their cells (O(new) chunks —
  * the coarse/PQ codebooks are read back, never recomputed).
  *
  * Build math is IDENTICAL to s05 (strided seeds, one exact-decimal
  * Lloyd step, id tie-breaks), so the persisted index equals the
  * inline one and the whole build+probe replays in the s05 DuckDB
  * oracle; VectorIndexSpec additionally gates that the probe phase
  * launches strictly fewer jobs than the build and never commits.
  */
/** Tunable geometry + probe parameters of one persisted IVF-PQ index.
  * PERSISTED INTO THE INDEX DATASET at build time and read back by
  * refresh/probe/delete ([[VectorIndexOps.readConfig]]) — so two
  * indexes with different tuning coexist in one lake and a probe
  * never needs to be told how its index was built:
  *
  *   - the GEOMETRY (dims, k, mSub, ks, rnStore, chunkRows) is
  *     self-describing — it IS the stored variables' shapes/chunking
  *     (centroids is K × dims, codebook is mSub × ks × subDims,
  *     assign is N × rnStore chunked chunkRows × rnStore);
  *   - the PROBE defaults (nProbe, topC, topK) ride a zero-cell
  *     `probe_params` variable whose SHAPE is the value triple —
  *     metadata-resident, versioned with the index, zero data reads.
  *
  * Defaults match the demo corpus (64-dim embeddings); a real corpus
  * tunes k ≈ √N cells, mSub/ks to the recall/compression target.
  */
final case class VectorIndexConfig(
    dims: Int = 64,
    k: Int = 8, // coarse cells
    nProbe: Int = 2,
    mSub: Int = 4,
    ks: Int = 8, // codewords per subspace
    topC: Int = 64, // ADC shortlist
    topK: Int = 5,
    rnStore: Int = 2, // assignment ranks persisted per vector
    chunkRows: Long = 4096L) { // vectors per index chunk
  require(dims >= 1 && mSub >= 1 && dims % mSub == 0,
    s"mSub=$mSub must divide dims=$dims")
  require(k >= 1 && ks >= 1 && topC >= 1 && topK >= 1 && chunkRows >= 1,
    "k, ks, topC, topK, chunkRows must be >= 1")
  require(nProbe >= 1 && nProbe <= k,
    s"nProbe=$nProbe must be in 1..k=$k")
  require(rnStore >= 1, "rnStore must be >= 1")
  def subDims: Int = dims / mSub
}

object VectorIndexOps extends QueryPack {

  private[graft] val defaults = VectorIndexConfig()
  private val nQueries = 5

  /** Nearest-centroid assignment (s05's `assign`): rank by dot
    * descending with centroid-id tie-breaks.
    */
  private def assignCells(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("cid"))
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("e"), col("nrm"), col("cid"),
        ColUtil.dotd(col("e"), col("ce")).as("sim"))
      .withColumn("rn", row_number().over(w))
  }

  /** PQ subspace assignment (s05's `passign`): L2 to each codeword,
    * codeword-id tie-breaks.
    */
  private def passignCells(svecs: DataFrame, cbook: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("l2").asc, col("pc"))
    svecs.join(broadcast(cbook), Seq("m"))
      .select(col("vec_id"), col("m"), col("sub"), col("pc"),
        (ColUtil.dotd(col("sub"), col("sub"))
          - lit(2.0) * ColUtil.dotd(col("sub"), col("cw"))
          + ColUtil.dotd(col("cw"), col("cw"))).as("l2"))
      .withColumn("rn", row_number().over(w))
  }

  private def subvectors(e: DataFrame, cfg: VectorIndexConfig): DataFrame =
    (0 until cfg.mSub).map { m =>
      e.select(col("vec_id"), lit(m).as("m"),
        slice(col("e"), m * cfg.subDims + 1, cfg.subDims).as("sub"))
    }.reduce(_ unionAll _)

  /** Apply per-call probe overrides onto the stored config. The
    * stored-assignment probe path can only probe as many cells as the
    * build persisted ranks for — enforced here, loudly; out-of-corpus
    * probes ([[probeVectorIndexFor]]) assign fresh against the
    * centroids and may probe up to k cells.
    */
  private def withOverrides(cfg: VectorIndexConfig, nProbe: Option[Int],
      topK: Option[Int], storedAssign: Boolean): VectorIndexConfig = {
    val c = cfg.copy(nProbe = nProbe.getOrElse(cfg.nProbe),
      topK = topK.getOrElse(cfg.topK))
    require(!storedAssign || c.nProbe <= c.rnStore,
      s"nProbe=${c.nProbe} exceeds the stored assignment ranks " +
        s"(rnStore=${c.rnStore}) — corpus-member probes read their " +
        "probe cells from the stored assignment; use " +
        "probeVectorIndexFor or rebuild with a larger rnStore")
    c
  }

  private def indexMeta(n: Long, cfg: VectorIndexConfig): DatasetMeta = {
    require(cfg.rnStore >= cfg.nProbe,
      s"rnStore=${cfg.rnStore} must cover the DEFAULT nProbe=" +
        s"${cfg.nProbe} so stored-assignment probes can serve it")
    DatasetMeta(Seq(
      VariableMeta("centroids", "double", Seq(cfg.k, cfg.dims),
        Seq(cfg.k, cfg.dims), Double.NaN),
      VariableMeta("codebook", "double",
        Seq(cfg.mSub, cfg.ks, cfg.subDims),
        Seq(cfg.mSub, cfg.ks, cfg.subDims), Double.NaN),
      VariableMeta("assign", "short", Seq(n, cfg.rnStore),
        Seq(cfg.chunkRows, cfg.rnStore), -1.0),
      VariableMeta("codes", "short", Seq(n, cfg.mSub),
        Seq(cfg.chunkRows, cfg.mSub), -1.0),
      VariableMeta("norms", "double", Seq(n), Seq(cfg.chunkRows),
        Double.NaN),
      // the probe defaults, SHAPE-encoded: a zero-cell metadata-only
      // variable — readConfig decodes (nProbe, topC, topK) from the
      // shape triple with no data read
      VariableMeta("probe_params", "long",
        Seq(cfg.nProbe, cfg.topC, cfg.topK),
        Seq(cfg.nProbe, cfg.topC, cfg.topK), 0.0)))
  }

  /** Read one index's full configuration back from the store — pure
    * metadata (one version-record read, zero Spark jobs): geometry
    * from the index variables' own shapes, probe defaults from the
    * `probe_params` shape triple. The inverse of [[indexMeta]].
    */
  def readConfig(ds: GraftDataset, asOf: Long): VectorIndexConfig = {
    val m = ds.metadata(asOf)
    val cen = m.variable("centroids")
    val cb = m.variable("codebook")
    val as = m.variable("assign")
    // indexes built before probe_params existed carry no probe
    // defaults — fall back to the historic compile-time triple so a
    // legacy index stays probe-able without a rebuild
    val (np, tc, tk) = m.variables.find(_.name == "probe_params")
      .map(pp => (pp.shape(0).toInt, pp.shape(1).toInt,
        pp.shape(2).toInt))
      .getOrElse((defaults.nProbe, defaults.topC, defaults.topK))
    VectorIndexConfig(
      dims = cen.shape(1).toInt, k = cen.shape(0).toInt,
      nProbe = np, mSub = cb.shape(0).toInt,
      ks = cb.shape(1).toInt, topC = tc,
      topK = tk, rnStore = as.shape(1).toInt,
      chunkRows = as.chunkDims(0))
  }

  /** The shared training math (build == retrain == the s05 inline
    * oracle): strided seeds + one exact-decimal Lloyd step for the
    * coarse quantizer, per-subspace strided seeds + one refinement for
    * the PQ codebook, then every input vector's assignments and codes.
    * `n` is the ID SPACE bound (stride base), not the live count — so
    * a retrain over a corpus with deletions picks the same seeds the
    * surviving ids would have seeded. Returns
    * (centroids, codebook, assigned, codes).
    *
    * `trainStride` bounds the TRAINING cost: quantizers learn from
    * the deterministic sample `vec_id % trainStride == 0` (standard
    * IVF practice — centroid positions need a representative sample,
    * not the population), while the assignment/encode pass still
    * covers every input vector (the only genuinely O(N) half). At
    * the default 1 the math is byte-identical to the historic
    * full-corpus training, which is what the s05/s14 DuckDB oracles
    * replay; at 100 TB a build or retrain sets it so the training
    * shuffles see O(N / trainStride) rows. Seeds are picked from the
    * SAMPLE's id space with the same strided rule, so sampling stays
    * deterministic and replayable.
    */
  private def train(e: DataFrame, n: Long, cfg: VectorIndexConfig,
      trainStride: Long = 1L)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import cfg.{k, ks}
    require(trainStride >= 1L, s"trainStride must be >= 1, got $trainStride")
    val te = if (trainStride == 1L) e
      else e.where(col("vec_id") % trainStride === 0)
    // the sample's id space: ceil(n / trainStride) candidate ids
    val sn = (n + trainStride - 1L) / trainStride
    // coarse quantizer: strided seeds + one exact-decimal Lloyd step,
    // both over the sample (stride is a multiple of trainStride, so
    // every seed is a sample member and trainStride=1 reduces to the
    // historic formula exactly)
    val stride = math.max(1L, sn / k) * trainStride
    val seeds = te.where(col("vec_id") % stride === 0 &&
        col("vec_id") / stride < k)
      .select((col("vec_id") / stride).cast("int").as("cid"),
        col("e").as("ce"))
    val centroids = assignCells(te, seeds).where(col("rn") === 1)
      .select(col("cid"), posexplode(col("e")))
      .groupBy(col("cid"), col("pos"))
      .agg((sum(col("col").cast("decimal(28,12)")).cast("double") /
        count(lit(1))).as("m"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
        .as("pm"))
      .select(col("cid"), expr("transform(pm, x -> x.m)").as("ce"))
    // assignment covers the FULL input — sampling never drops a vector
    val assigned = assignCells(e, centroids)
    // product quantizer: per-subspace strided seeds + one refinement,
    // again over the sample only
    val subs = subvectors(e, cfg)
    val subsT = if (trainStride == 1L) subs
      else subs.where(col("vec_id") % trainStride === 0)
    val stride2 = math.max(1L, sn / ks) * trainStride
    val pseeds = subsT.where(col("vec_id") % stride2 === 0 &&
        col("vec_id") / stride2 < ks)
      .select(col("m"), (col("vec_id") / stride2).cast("int").as("pc"),
        col("sub").as("cw"))
    val codebook = passignCells(subsT, pseeds).where(col("rn") === 1)
      .select(col("m"), col("pc"), posexplode(col("sub")))
      .groupBy(col("m"), col("pc"), col("pos"))
      .agg((sum(col("col").cast("decimal(28,12)")).cast("double") /
        count(lit(1))).as("cm"))
      .groupBy(col("m"), col("pc"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cm"))))
        .as("pm"))
      .select(col("m"), col("pc"),
        expr("transform(pm, x -> x.cm)").as("pm"))
    val codes = passignCells(subs, codebook
        .select(col("m"), col("pc"), col("pm").as("cw")))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("pc"))
    (centroids, codebook, assigned, codes)
  }

  /** Measurement surface for the sampled-training claim (guide §1.1:
    * a 100 TB design decision needs a measured local probe, not an
    * assertion): times the QUANTIZER TRAINING alone — the half
    * `trainStride` bounds — by materializing centroids + codebook
    * through the noop sink, then hashes the full assignment output
    * (order-independent bit_xor of per-row xxhash64) so
    * [[graft.tools.StrideProbe]] can prove a strided run is
    * deterministic and covers every vector. Bench-only: never called
    * by a registry query.
    */
  private[graft] def trainingProbe(s: SparkSession, e: DataFrame,
      n: Long, cfg: VectorIndexConfig, trainStride: Long)
      : (Double, Long, Long) = {
    val (cent, cb, assigned, _) = train(e, n, cfg, trainStride)
    val t0 = System.nanoTime()
    cent.write.format("noop").mode("overwrite").save()
    cb.write.format("noop").mode("overwrite").save()
    val tTrain = (System.nanoTime() - t0) / 1e9
    val r = assigned.where(col("rn") <= cfg.rnStore)
      .agg(bit_xor(xxhash64(col("vec_id"), col("rn"), col("cid"))).as("h"),
        count(lit(1)).as("n")).head()
    (tTrain, r.getLong(0), r.getLong(1))
  }

  /** Stage all five index variables on an open writer and commit —
    * the one write path both [[buildVectorIndex]] and
    * [[retrainVectorIndex]] go through. The quantizer slabs are
    * PADDED to their full dense shape with explicit NaN fill:
    * training can legitimately produce fewer than k cells / ks
    * codewords (a strided seed deleted from the corpus), and on a
    * dataset that already holds an older quantizer the MVCC
    * partial-chunk merge would otherwise INHERIT the stale values for
    * the unwritten cids — phantom centroids with zero members that
    * waste probe slots and break the retrain == fresh-build contract.
    * The SAME hazard applies to the per-vector slabs: with fewer
    * trained cells than rnStore (or a subspace whose codewords all
    * trained away), assign/codes ranks beyond the trained count would
    * inherit a PRIOR geometry's cids/codes through the partial-chunk
    * merge and stored-assignment probes would probe a stale cell — so
    * those grids pad to explicit -1 fill too. The pad is conditional
    * on a driver-side coverage check over the (cached, KB-sized)
    * quantizers, so the common fully-covered build keeps its narrow
    * no-join writes.
    */
  private def writeIndexSlabs(w: graft.core.SlabWriter,
      cfg: VectorIndexConfig, centroids0: DataFrame, codebook0: DataFrame,
      assigned: DataFrame, codes: DataFrame, e: DataFrame): Long = {
    val s = e.sparkSession
    // both quantizers are KB-sized but carry the full training
    // lineage — cache before the multiple reads below
    val centroids = centroids0.cache()
    val codebook = codebook0.cache()
    try {
      val nCells = centroids.count()
      val coveredSubs = codebook.select(col("m")).distinct().count()
      val centCells = centroids
        .select(col("cid"), posexplode(col("ce")))
        .select(col("cid").cast("long").as("c0"),
          col("pos").cast("long").as("c1"), col("col").as("value"))
      val centGrid = s.range(cfg.k).select(col("id").as("c0"))
        .crossJoin(s.range(cfg.dims).select(col("id").as("c1")))
      w.writeSlab("centroids", centGrid
        .join(centCells, Seq("c0", "c1"), "left")
        .select(array(col("c0"), col("c1")).as("coord"),
          coalesce(col("value"), lit(Double.NaN)).as("value")))
      val cbCells = codebook
        .select(col("m"), col("pc"), posexplode(col("pm")))
        .select(col("m").cast("long").as("c0"),
          col("pc").cast("long").as("c1"),
          col("pos").cast("long").as("c2"), col("col").as("value"))
      val cbGrid = s.range(cfg.mSub).select(col("id").as("c0"))
        .crossJoin(s.range(cfg.ks).select(col("id").as("c1")))
        .crossJoin(s.range(cfg.subDims).select(col("id").as("c2")))
      w.writeSlab("codebook", cbGrid
        .join(cbCells, Seq("c0", "c1", "c2"), "left")
        .select(array(col("c0"), col("c1"), col("c2")).as("coord"),
          coalesce(col("value"), lit(Double.NaN)).as("value")))
      val assignRows = assigned.where(col("rn") <= cfg.rnStore)
        .select(col("vec_id"), (col("rn") - 1).cast("long").as("r"),
          col("cid").cast("double").as("value"))
      // every vector holds ranks 1..min(nCells, rnStore): with full
      // cell coverage the rows ARE the dense grid — skip the pad join
      val assignSlab =
        if (nCells >= cfg.rnStore) assignRows
          .select(array(col("vec_id"), col("r")).as("coord"),
            col("value"))
        else e.select(col("vec_id"),
            explode(sequence(lit(0L), lit((cfg.rnStore - 1).toLong)))
              .as("r"))
          .join(assignRows, Seq("vec_id", "r"), "left")
          .select(array(col("vec_id"), col("r")).as("coord"),
            coalesce(col("value"), lit(-1.0)).as("value"))
      w.writeSlab("assign", assignSlab)
      val codeRows = codes
        .select(col("vec_id"), col("m").cast("long").as("m"),
          col("pc").cast("double").as("value"))
      val codesSlab =
        if (coveredSubs >= cfg.mSub) codeRows
          .select(array(col("vec_id"), col("m")).as("coord"),
            col("value"))
        else e.select(col("vec_id"),
            explode(sequence(lit(0L), lit((cfg.mSub - 1).toLong)))
              .as("m"))
          .join(codeRows, Seq("vec_id", "m"), "left")
          .select(array(col("vec_id"), col("m")).as("coord"),
            coalesce(col("value"), lit(-1.0)).as("value"))
      w.writeSlab("codes", codesSlab)
      w.writeSlab("norms", e
        .select(array(col("vec_id")).as("coord"), col("nrm").as("value")))
      w.commit()
    } finally { centroids.unpersist(); codebook.unpersist(); () }
  }

  /** Full build: coarse quantizer + PQ codebooks from the corpus, all
    * five variables in ONE MVCC commit. `e` is (vec_id, e, nrm) as
    * produced by [[SimilarityOps.emb]]. Returns the committed version.
    * `trainStride` > 1 trains the quantizers on the deterministic
    * sample `vec_id % trainStride == 0` while still assigning and
    * encoding every vector — see [[train]].
    */
  def buildVectorIndex(s: SparkSession, root: String,
      e0: DataFrame, dsName: String = "vindex",
      cfg: VectorIndexConfig = defaults, trainStride: Long = 1L): Long = {
    val e = e0.cache()
    try {
      val n = e.select(max(col("vec_id"))).head().getLong(0) + 1
      val (centroids, codebook, assigned, codes) =
        train(e, n, cfg, trainStride)
      val lake = new GraftLake(s, root)
      if (!lake.exists(dsName)) lake.create(dsName)
      val ds = lake.connect(dsName)
      val w = ds.newWriter(indexMeta(n, cfg))
      writeIndexSlabs(w, cfg, centroids, codebook, assigned, codes, e)
    } finally e.unpersist()
  }

  /** Re-train a DRIFTED index in place — the ACTION verb for the s13
    * skew signal (a hot cell serves every probe that lands on it;
    * months of streaming refreshes against drifting embeddings
    * degrade the cell balance the build chose). Re-clusters the LIVE
    * membership (the stored norms ledger — deleted vectors stay
    * deleted) against the re-read embeddings with `k` optionally
    * raised, and rewrites centroids/codebook/assign/codes/norms under
    * ONE MVCC commit:
    *
    *   - old-version probes are untouched — asOf pins the geometry
    *     because [[readConfig]] reads shapes per version, so a
    *     training run replaying yesterday's retrieval still sees
    *     yesterday's cells;
    *   - the centroids variable's SHAPE carries the new k; its
    *     chunkDims stay (the store pins chunk grids across versions),
    *     so a grown quantizer just spans more chunks;
    *   - probe defaults (nProbe/topC/topK), the PQ geometry
    *     (mSub/ks) and rnStore are PRESERVED — retraining moves cell
    *     boundaries, not the recall/latency contract. Vectors never
    *     indexed are NOT added here (that is [[refreshVectorIndex]]).
    *
    * Training math is [[train]] — byte-identical to the build's, so a
    * retrain of an undrifted full corpus reproduces a fresh build
    * exactly (the s14 oracle gate). `trainStride` > 1 bounds the
    * re-training cost to the deterministic sample
    * `vec_id % trainStride == 0` (the assign/encode pass still covers
    * every live vector) — at 100 TB moving k centroids never needs a
    * full-corpus training pass.
    */
  def retrainVectorIndex(s: SparkSession, root: String, e0: DataFrame,
      dsName: String = "vindex", k: Option[Int] = None,
      trainStride: Long = 1L): Long = {
    val ds = new GraftLake(s, root).connect(dsName)
    val head = ds.latestVersion.getOrElse(
      throw new IllegalStateException("no built index to retrain"))
    val meta0 = ds.metadata(head)
    val cfg0 = readConfig(ds, head)
    val cfg = cfg0.copy(k = k.getOrElse(cfg0.k))
    require(cfg.nProbe <= cfg.k,
      s"stored nProbe=${cfg.nProbe} exceeds the new k=${cfg.k}")
    // membership = the stored norms ledger: a retrain must not
    // resurrect deleted vectors or invent unindexed ones
    val liveIds = ds.readSlab("norms", head).where(!isnan(col("value")))
      .select(element_at(col("coord"), 1).as("vec_id"))
    val n = meta0.variable("assign").shape.head
    val e = e0.join(liveIds, "vec_id").cache()
    try {
      val (centroids, codebook, assigned, codes) =
        train(e, n, cfg, trainStride)
      val meta1 = DatasetMeta(meta0.variables.map { v =>
        v.name match {
          case "centroids" =>
            v.copy(shape = Seq(cfg.k.toLong, cfg.dims.toLong))
          case _ => v
        }
      })
      val w = ds.newWriter(meta1)
      writeIndexSlabs(w, cfg, centroids, codebook, assigned, codes, e)
    } finally e.unpersist()
  }

  /** Incremental refresh: assign NEW vectors against the STORED
    * centroids and codebooks (read back, never recomputed — no
    * full-corpus job runs) and write only their cells; grows the index
    * shape when ids extend past it. One MVCC commit; untouched lists'
    * chunks are not rewritten.
    */
  def refreshVectorIndex(s: SparkSession, root: String,
      newE0: DataFrame, dsName: String = "vindex",
      quantizers: Option[(DataFrame, DataFrame)] = None): Long = {
    val lake = new GraftLake(s, root)
    val ds = lake.connect(dsName)
    val head = ds.latestVersion.getOrElse(
      throw new IllegalStateException("no built index to refresh"))
    val meta0 = ds.metadata(head)
    // the index self-describes: geometry + probe params come back
    // from the store, never from compile-time constants
    val cfg = readConfig(ds, head)
    // the quantizers are immutable after build (refresh and delete
    // never touch centroids/codebook), so a continuous maintainer
    // reads them ONCE and hands the cached pair to every refresh —
    // see readQuantizers
    val (centroids, codebook) = quantizers.getOrElse(
      (readCentroids(ds, head), readCodebook(ds, head)))
    val newE = newE0.cache()
    try {
      val assigned = assignCells(newE, centroids)
      val codes = passignCells(subvectors(newE, cfg), codebook
          .select(col("m"), col("pc"), col("cw")))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("m"), col("pc"))
      val maxId = newE.select(max(col("vec_id"))).head().getLong(0)
      val n0 = meta0.variable("assign").shape.head
      val meta1 =
        if (maxId < n0) meta0
        else DatasetMeta(meta0.variables.map { v =>
          v.name match {
            case "assign" | "codes" | "norms" =>
              v.copy(shape = (maxId + 1) +: v.shape.tail)
            case _ => v
          }
        })
      val w = ds.newWriter(meta1)
      w.writeSlab("assign", assigned.where(col("rn") <= cfg.rnStore)
        .select(array(col("vec_id"), (col("rn") - 1).cast("long"))
          .as("coord"), col("cid").cast("double").as("value")))
      w.writeSlab("codes", codes
        .select(array(col("vec_id"), col("m").cast("long")).as("coord"),
          col("pc").cast("double").as("value")))
      w.writeSlab("norms", newE
        .select(array(col("vec_id")).as("coord"), col("nrm").as("value")))
      val v = w.commit()
      maybeAutoCompact(s, root, dsName, ds)
      v
    } finally newE.unpersist()
  }

  /** Advisory post-refresh auto-maintenance — the vector-index member
    * of the store's `spark.graft.autoMaintain.*` policy family: with
    * `spark.graft.autoMaintain.vectorIndex.compactEvery` set (> 0;
    * default 0 = off), a refresh that leaves the index holding that
    * many live versions triggers [[compactVectorIndex]] with
    * `spark.graft.autoMaintain.vectorIndex.keepLast` (default 1), so
    * a streaming maintainer's one-commit-per-batch refreshes keep
    * version/artifact counts bounded with no manual CALL. Opt-in
    * TWICE over: it inherits compaction's maintenance-window contract
    * AND its retention trade (time travel past the horizon is given
    * up) — exactly what the explicit verb documents. A maintenance
    * failure never fails the already-committed refresh.
    */
  private def maybeAutoCompact(s: SparkSession, root: String,
      dsName: String, ds: GraftDataset): Unit = {
    // conf parses sit OUTSIDE the advisory catch: a malformed policy
    // value is a caller bug that must refuse by name, not silently
    // disable maintenance forever
    def intConf(key: String, dflt: Int): Int = s.conf.getOption(key)
      .map(v => try v.toInt catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"$key=$v is not an integer")
      }).getOrElse(dflt)
    val every =
      intConf("spark.graft.autoMaintain.vectorIndex.compactEvery", 0)
    val keep =
      intConf("spark.graft.autoMaintain.vectorIndex.keepLast", 1)
    if (every > 0) try {
      if (ds.versionIds().length >= every) {
        compactVectorIndex(s, root, dsName, keep)
        ()
      }
    } catch { case scala.util.control.NonFatal(ex) =>
      // advisory, so the landed refresh must not fail — but a
      // PERMANENTLY failing compaction (corrupt artifact, permission
      // loss) would otherwise retry silently on every batch while
      // version counts grow unbounded: leave an operator-visible trail
      log.warn(s"auto-compaction of vector index '$dsName' at $root " +
        "failed (the refresh itself committed; will retry next batch)",
        ex)
    }
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Delete vectors from the index: ONE commit writing each id's
    * assign/codes/norms cells back to the variable fill (the store's
    * native tombstone — [[live]] filters them at probe time, and
    * untouched chunks are not rewritten, so a delete costs O(deleted)
    * cells). The full vectors' source table is untouched: the index
    * simply stops returning the ids, which is exactly the curation
    * semantics (a doc pulled from the corpus must vanish from ANN
    * results without a rebuild). Versioned like every commit: probing
    * asOf the pre-delete version still sees the vectors.
    */
  def deleteFromVectorIndex(s: SparkSession, root: String,
      ids: DataFrame, dsName: String = "vindex"): Long = {
    val ds = new GraftLake(s, root).connect(dsName)
    val head = ds.latestVersion.getOrElse(
      throw new IllegalStateException("no built index to delete from"))
    val meta = ds.metadata(head)
    val cfg = readConfig(ds, head)
    val r = ids.select(col("vec_id")).cache()
    try {
      val w = ds.newWriter(meta)
      w.writeSlab("assign", r
        .select(col("vec_id"),
          explode(sequence(lit(0), lit(cfg.rnStore - 1))).as("r"))
        .select(array(col("vec_id"), col("r").cast("long")).as("coord"),
          lit(-1.0).as("value")))
      w.writeSlab("codes", r
        .select(col("vec_id"),
          explode(sequence(lit(0), lit(cfg.mSub - 1))).as("m"))
        .select(array(col("vec_id"), col("m").cast("long")).as("coord"),
          lit(-1.0).as("value")))
      w.writeSlab("norms", r
        .select(array(col("vec_id")).as("coord"),
          lit(Double.NaN).as("value")))
      w.commit()
    } finally { r.unpersist(); () }
  }

  /** Fold a refresh-heavy index's commit history down to bounded
    * store metadata — the vector-index mirror of the text index's
    * compaction (and the same maintenance-window contract): per-batch
    * refreshes and deletes each land one MVCC version, whose index
    * rows accumulate in the hot log. Compaction = the store's own
    * verbs composed: expire all but `keepLast` versions (drops the
    * per-refresh row history), fold the index log into the merged
    * LSM store, pack small chunk blobs, and GC unreferenced blobs.
    * Probe results at HEAD are IDENTICAL before/after
    * (VectorIndexSpec gates equality); what is given up is time
    * travel past the horizon — the explicit retention trade.
    * Returns (versions expired, log dirs folded, blobs collected).
    */
  def compactVectorIndex(s: SparkSession, root: String,
      dsName: String = "vindex", keepLast: Int = 1): (Long, Long, Long) = {
    val ds = new GraftLake(s, root).connect(dsName)
    val expired = ds.expireVersions(keepLast).length.toLong
    val folded = ds.compactIndexLog()
    ds.packChunks()
    val swept = ds.gc(graceMs = 0L)
    (expired, folded, swept)
  }

  /** Per-cell inverted-list statistics — the SKEW dashboard an IVF
    * index needs at 100 TB (a hot cell serves every probe that lands
    * on it; a 10× imbalance means a 10× probe-latency tail and is the
    * signal to re-train with more cells). Reads ONLY the `assign`
    * rank-0 column (≈2 bytes/vector) — never the vectors, never the
    * codes: one narrow scan + one k-row aggregate. Versioned like
    * every read: `asOf` reports a historical snapshot's balance.
    */
  def vectorIndexStats(s: SparkSession, root: String,
      dsName: String = "vindex", asOf: Option[Long] = None): DataFrame = {
    val ds = new GraftLake(s, root).connect(dsName)
    val head = asOf.orElse(ds.latestVersion).getOrElse(
      throw new IllegalStateException("no built index"))
    live(ds.readSlab("assign", head))
      .where(element_at(col("coord"), 2) === 0)
      .select(element_at(col("coord"), 1).as("vec_id"),
        col("value").cast("int").as("cid"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col("vec_id")).as("min_vec_id"),
        max(col("vec_id")).as("max_vec_id"))
  }

  /** Read back the (post-build immutable) coarse centroids and PQ
    * codebook — KB-sized. A long-lived maintainer caches this pair
    * and passes it to every [[refreshVectorIndex]] call so per-batch
    * cost excludes the quantizer readback entirely.
    */
  def readQuantizers(s: SparkSession, root: String,
      dsName: String = "vindex"): (DataFrame, DataFrame) = {
    val ds = new GraftLake(s, root).connect(dsName)
    val head = ds.latestVersion.getOrElse(
      throw new IllegalStateException("no built index"))
    (readCentroids(ds, head), readCodebook(ds, head))
  }

  private def live(df: DataFrame): DataFrame =
    df.where(!isnan(col("value")) && col("value") >= 0)

  private def readCentroids(ds: GraftDataset, asOf: Long): DataFrame =
    ds.readSlab("centroids", asOf).where(!isnan(col("value")))
      .select(element_at(col("coord"), 1).cast("int").as("cid"),
        element_at(col("coord"), 2).cast("int").as("pos"), col("value"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("value"))))
        .as("pm"))
      .select(col("cid"), expr("transform(pm, x -> x.value)").as("ce"))

  private def readCodebook(ds: GraftDataset, asOf: Long): DataFrame =
    ds.readSlab("codebook", asOf).where(!isnan(col("value")))
      .select(element_at(col("coord"), 1).cast("int").as("m"),
        element_at(col("coord"), 2).cast("int").as("pc"),
        element_at(col("coord"), 3).cast("int").as("pos"), col("value"))
      .groupBy(col("m"), col("pc"))
      .agg(array_sort(collect_list(struct(col("pos"), col("value"))))
        .as("pm"))
      .select(col("m"), col("pc"),
        expr("transform(pm, x -> x.value)").as("cw"))

  /** Probe the PERSISTED index for OUT-OF-CORPUS query vectors:
    * queries (qid, qe, qnrm — any vectors, not necessarily indexed)
    * assign to their nProbe nearest cells via the STORED centroids (a
    * KB-sized broadcast read back from the store — still zero build
    * jobs), then ride the same ADC + shortlist + re-rank path as
    * [[probeVectorIndex]].
    */
  def probeVectorIndexFor(s: SparkSession, root: String, e: DataFrame,
      queries: DataFrame, dsName: String = "vindex",
      nProbe: Option[Int] = None, topK: Option[Int] = None): DataFrame = {
    val ds = new GraftLake(s, root).connect(dsName)
    val head = ds.latestVersion.getOrElse(
      throw new IllegalStateException("no built index to probe"))
    val cfg = withOverrides(readConfig(ds, head), nProbe, topK,
      storedAssign = false)
    val centroids = readCentroids(ds, head)
    val probes = assignCells(
      queries.select(col("qid").as("vec_id"), col("qe").as("e"),
        col("qnrm").as("nrm")), centroids)
      .where(col("rn") <= cfg.nProbe)
      .select(col("vec_id").as("qid"), col("cid"))
    probeStored(s, ds, head, e, queries, probes, cfg)
  }

  /** Probe the PERSISTED index: ADC over the stored codes of the
    * queries' probed lists, exact re-rank of the shortlist. The only
    * inputs are the index variables and `e` (full vectors: the query
    * set + the shortlist re-rank join) — no centroid or codebook
    * computation can run here, structurally. Corpus-member queries
    * (vec_id < queryMaxId) take their probe cells straight from the
    * stored assignment; arbitrary vectors go through
    * [[probeVectorIndexFor]].
    */
  def probeVectorIndex(s: SparkSession, root: String, e: DataFrame,
      queryMaxId: Long = nQueries,
      dsName: String = "vindex",
      asOf: Option[Long] = None,
      nProbe: Option[Int] = None, topK: Option[Int] = None): DataFrame = {
    val ds = new GraftLake(s, root).connect(dsName)
    // time-travel probe: the index is MVCC like any variable, so a
    // probe asOf a tag/version reproduces that snapshot's retrieval
    // (e.g. the exact ANN answers a training run saw pre-delete)
    val head = asOf.orElse(ds.latestVersion).getOrElse(
      throw new IllegalStateException("no built index to probe"))
    val cfg = withOverrides(readConfig(ds, head), nProbe, topK,
      storedAssign = true)
    val assignR = live(ds.readSlab("assign", head))
      .select(element_at(col("coord"), 1).as("vec_id"),
        element_at(col("coord"), 2).as("r"),
        col("value").cast("int").as("cid"))
    val probes = assignR
      .where(col("vec_id") < queryMaxId && col("r") < cfg.nProbe)
      .select(col("vec_id").as("qid"), col("cid"))
    val q = e.where(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("nrm").as("qnrm"))
    probeStored(s, ds, head, e, q, probes, cfg)
  }

  /** The shared probe tail: stored lists/codes/norms/codebook + the
    * given query set and probe cells -> ADC -> shortlist -> exact
    * re-rank. `q` is (qid, qe, qnrm); `probes` is (qid, cid).
    */
  private def probeStored(s: SparkSession, ds: GraftDataset, head: Long,
      e: DataFrame, q: DataFrame, probes: DataFrame,
      cfg: VectorIndexConfig): DataFrame = {
    import cfg.{mSub, subDims, topC, topK}
    val assignR = live(ds.readSlab("assign", head))
      .select(element_at(col("coord"), 1).as("vec_id"),
        element_at(col("coord"), 2).as("r"),
        col("value").cast("int").as("cid"))
    val normsR = ds.readSlab("norms", head).where(!isnan(col("value")))
      .select(element_at(col("coord"), 1).as("vec_id"),
        col("value").as("nrm"))
    val codesR = live(ds.readSlab("codes", head))
      .select(element_at(col("coord"), 1).as("vec_id"),
        element_at(col("coord"), 2).cast("int").as("m"),
        col("value").cast("int").as("pc"))
    val codebook = readCodebook(ds, head)
    // inverted lists: every vector's home cell, from the STORED
    // assignment
    val lists = assignR.where(col("r") === 0)
      .select(col("cid"), col("vec_id"))
      .join(normsR, Seq("vec_id"))
    val qsubs = (0 until mSub).map { m =>
      q.select(col("qid"), lit(m).as("m"),
        slice(col("qe"), m * subDims + 1, subDims).as("qsub"))
    }.reduce(_ unionAll _)
    val cand = lists.join(broadcast(probes), Seq("cid"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("nrm"))
    val adc = cand
      .join(codesR, Seq("vec_id"))
      .join(broadcast(codebook), Seq("m", "pc"))
      .join(broadcast(qsubs), Seq("qid", "m"))
      .select(col("qid"), col("vec_id"), col("nrm"),
        ColUtil.dotd(col("qsub"), col("cw"))
          .cast("decimal(28,12)").as("p"))
      .groupBy(col("qid"), col("vec_id"), col("nrm"))
      .agg(sum(col("p")).cast("double").as("adcDot"))
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("adc_sim").desc, col("vec_id"))
    val shortlist = adc
      .join(broadcast(q.select(col("qid"), col("qnrm"))), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        (col("adcDot") / (col("nrm") * col("qnrm"))).as("adc_sim"))
      .withColumn("rn", row_number().over(wAdc))
      .where(col("rn") <= topC)
      .select(col("qid"), col("vec_id"))
    val wTop = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    shortlist.join(e, "vec_id")
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        (ColUtil.dotd(col("e"), col("qe")) / (col("nrm") * col("qnrm")))
          .as("cos_sim"))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= topK)
      .select(col("qid"), col("vec_id"), col("cos_sim"),
        col("rank").cast("long").as("rank"))
  }

  // one built index per (JVM, sf dir): the bench times the PROBE —
  // that is the operator's whole point (a curation pipeline builds
  // once and probes thousands of times); correctness runs still
  // build+probe end to end through `run`
  private val builtRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def builtRoot(s: SparkSession, d: String): String =
    builtRoots.computeIfAbsent(d, { _ =>
      val root = Files.createTempDirectory("graft_vidx_").toString
      buildVectorIndex(s, root, SimilarityOps.emb(s, d))
      root
    })

  val all: Seq[Q] = Seq(
    // Build-once / probe-from-store, oracle-gated with the SAME SQL
    // as s05: the deterministic build makes the persisted index equal
    // the inline one, so the store round-trip (doubles and small ints
    // through the chunk codec) is exactly what the hash compare
    // proves. VectorIndexSpec gates the zero-rebuild property
    // (probe jobs < build jobs, no commits) and incremental refresh.
    Q("s10_ann_persisted", Some(SimilarityOps.ivfPqOracleSql),
      (s, d) => {
        val root = Files.createTempDirectory("graft_vidx_").toString
        val e = SimilarityOps.emb(s, d)
        buildVectorIndex(s, root, e)
        probeVectorIndex(s, root, e)
      },
      benchSecs = Some((s, d) => {
        val root = builtRoot(s, d)
        val t0 = System.nanoTime()
        probeVectorIndex(s, root, SimilarityOps.emb(s, d)).count()
        (System.nanoTime() - t0) / 1e9
      })),

    // Index DELETE: tombstone ids `vec_id % 7 = 6` (never a query id)
    // with one O(deleted)-cells commit, probe at HEAD — the deleted
    // vectors must vanish from every list. Oracle: s05's SQL with the
    // inverted lists excluding the deleted ids (training unchanged —
    // deletes don't retrain the quantizer, same as every IVF system);
    // n_commits pins build + delete = 2.
    Q("s11_ann_delete", Some(deleteOracleSql),
      (s, d) => {
        val root = Files.createTempDirectory("graft_vidx_del_").toString
        val e = SimilarityOps.emb(s, d)
        buildVectorIndex(s, root, e)
        deleteFromVectorIndex(s, root,
          e.where(col("vec_id") % 7 === 6).select(col("vec_id")))
        val ds = new GraftLake(s, root).connect("vindex")
        probeVectorIndex(s, root, e)
          .withColumn("n_commits", lit(ds.versionIds().length.toLong))
      },
      // bench times the MAINTENANCE op (delete commit + probe) on a
      // build-once root — re-deleting the same ids is idempotent
      // (same fill cells), so repeat samples measure a steady state
      benchSecs = Some((s, d) => {
        val root = delRoots.computeIfAbsent(d, { _ =>
          val r = Files.createTempDirectory("graft_vidx_delb_").toString
          buildVectorIndex(s, r, SimilarityOps.emb(s, d))
          r
        })
        val e = SimilarityOps.emb(s, d)
        val t0 = System.nanoTime()
        deleteFromVectorIndex(s, root,
          e.where(col("vec_id") % 7 === 6).select(col("vec_id")))
        probeVectorIndex(s, root, e).count()
        (System.nanoTime() - t0) / 1e9
      })),

    // Index RETRAIN — the action verb for the s13 skew signal. Build
    // with a deliberately under-provisioned quantizer (2 coarse
    // cells: every probe scans half the corpus), then retrain in
    // place to the default 8-cell geometry and probe at HEAD. The
    // oracle is s05's full inline derivation: a retrain of the full
    // corpus must land EXACTLY on the state a fresh default build
    // would have produced (same training math, same seeds) — which
    // the hash gate proves through the store round-trip, across a
    // centroids variable whose chunk grid still carries the old k
    // (chunk dims are pinned across versions; the grown quantizer
    // spans more chunks). n_commits pins build + retrain = 2.
    // VectorIndexSpec gates the rest: skew ratio drops, recall does
    // not regress, asOf probes reproduce the pre-retrain retrieval,
    // deletes survive.
    Q("s14_ann_retrain", Some(retrainOracleSql),
      (s, d) => {
        val root = Files.createTempDirectory("graft_vidx_rt_").toString
        val e = SimilarityOps.emb(s, d)
        buildVectorIndex(s, root, e, cfg = defaults.copy(k = 2))
        retrainVectorIndex(s, root, e, k = Some(defaults.k))
        val ds = new GraftLake(s, root).connect("vindex")
        probeVectorIndex(s, root, e)
          .withColumn("n_commits", lit(ds.versionIds().length.toLong))
      },
      // bench times the MAINTENANCE op (retrain commit + probe) on a
      // build-once root — retraining an unchanged corpus is
      // idempotent (same training math), so repeats are steady-state
      benchSecs = Some((s, d) => {
        val root = rtRoots.computeIfAbsent(d, { _ =>
          val r = Files.createTempDirectory("graft_vidx_rtb_").toString
          buildVectorIndex(s, r, SimilarityOps.emb(s, d),
            cfg = defaults.copy(k = 2))
          r
        })
        val e = SimilarityOps.emb(s, d)
        val t0 = System.nanoTime()
        retrainVectorIndex(s, root, e, k = Some(defaults.k))
        probeVectorIndex(s, root, e).count()
        (System.nanoTime() - t0) / 1e9
      })),

    // Index observability: per-cell list sizes straight off the
    // stored assignment (2 B/vector read, k-row result — never the
    // vectors). Oracle: the s05 derivation's `lists` CTE aggregated
    // per cell (targeted substitution — the texts cannot drift).
    Q("s13_vindex_stats", Some(vindexStatsOracleSql),
      (s, d) => {
        val root = Files.createTempDirectory("graft_vidx_st_").toString
        buildVectorIndex(s, root, SimilarityOps.emb(s, d))
        vectorIndexStats(s, root)
      },
      benchSecs = Some((s, d) => {
        val root = builtRoot(s, d)
        val t0 = System.nanoTime()
        vectorIndexStats(s, root).count()
        (System.nanoTime() - t0) / 1e9
      }))
  )

  /** s05's oracle with the probe/ADC tail replaced by a per-cell
    * aggregate over its `lists` CTE (unreferenced CTEs are pruned by
    * the engine) — derived by substitution with a containment
    * `require` so the two texts cannot silently drift.
    */
  private lazy val vindexStatsOracleSql: String = {
    val base = SimilarityOps.ivfPqOracleSql
    val marker = "SELECT qid, vec_id, cos_sim, rank FROM (SELECT"
    require(base.contains(marker), "s05 oracle final select changed")
    base.substring(0, base.indexOf(marker)) +
      "SELECT cid, count(*) AS n_vectors, min(vec_id) AS min_vec_id, " +
      "max(vec_id) AS max_vec_id FROM lists GROUP BY cid"
  }

  private val delRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val rtRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** s05's oracle + the n_commits pin (build + retrain = 2): the
    * retrained head state must equal a fresh default build exactly.
    */
  private lazy val retrainOracleSql: String = {
    val base = SimilarityOps.ivfPqOracleSql
    val selFrom = "SELECT qid, vec_id, cos_sim, rank FROM (SELECT"
    val selTo = "SELECT qid, vec_id, cos_sim, rank, " +
      "CAST(2 AS BIGINT) AS n_commits FROM (SELECT"
    require(base.contains(selFrom), "s05 oracle final select changed")
    base.replace(selFrom, selTo)
  }

  /** s05's oracle with deleted ids dropped from the inverted lists
    * (derived by targeted substitution so the two SQL texts cannot
    * drift apart) + the n_commits pin.
    */
  private lazy val deleteOracleSql: String = {
    val base = SimilarityOps.ivfPqOracleSql
    val listsFrom = "lists AS (SELECT cid, vec_id, nrm FROM a2 WHERE rn = 1), "
    val listsTo = "lists AS (SELECT cid, vec_id, nrm FROM a2 " +
      "WHERE rn = 1 AND vec_id % 7 <> 6), "
    require(base.contains(listsFrom), "s05 oracle lists CTE changed")
    val s1 = base.replace(listsFrom, listsTo)
    val selFrom = "SELECT qid, vec_id, cos_sim, rank FROM (SELECT"
    val selTo = "SELECT qid, vec_id, cos_sim, rank, " +
      "CAST(2 AS BIGINT) AS n_commits FROM (SELECT"
    require(s1.contains(selFrom), "s05 oracle final select changed")
    s1.replace(selFrom, selTo)
  }
}
