package graft.operators

import graft.{ColUtil, Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH bucketed variant as the scale path (candidate
  * set shrinks from N to the probe buckets; at 100 TB the banded join
  * replaces the N×Q cross product).
  */
object SimilarityOps extends QueryPack {

  private val dims = 64
  private val topK = 5
  private val nQueries = 5 // query set: vec_id < 5

  /** n·(n−1)/2 in Double: the Long form overflows (negative) past
    * n ≈ 4.3e9 and would wave the quadratic job straight through at
    * exactly the scale the admission guard exists to refuse.
    */
  private[operators] def pairCount(n: Long): Double =
    n.toDouble * (n - 1) / 2

  /** Vectors as array<double> with the L2 norm precomputed once per
    * row — pairwise similarity then needs a single dot per pair.
    */
  private[graft] def emb(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"), ColUtil.asDouble(col("embedding")).as("e"))
      .withColumn("nrm", sqrt(ColUtil.dotd(col("e"), col("e"))))

  /** Deterministic random hyperplanes (fixed seed — reproducible across
    * runs and executors; generated driver-side, broadcast as literals).
    */
  private def planes(nPlanes: Int): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(nPlanes)(Array.fill(dims)(rnd.nextGaussian()))
  }

  private def planeCol(p: Array[Double]) =
    array(p.map(lit): _*)

  /** Exact cosine near-dup pairs over the whole corpus — inherently
    * O(N²) comparisons for an exact θ-join at a low threshold. The
    * admission guard fails FAST (one metadata-cheap count, before any
    * quadratic job is launched) when N(N-1)/2 exceeds the pair budget
    * (`spark.graft.neardup.maxPairs`, default 1e8): at that size the
    * banded sub-quadratic routes (s02 LSH / d03 MinHash) are the only
    * sane plan, and a loud refusal beats a cluster-melting job.
    */
  def exactNearDupPairs(s: SparkSession, d: String,
      threshold: Double): DataFrame = {
    val e0 = emb(s, d)
    val n = e0.count()
    val budget = s.conf.getOption("spark.graft.neardup.maxPairs")
      .map(_.toLong).getOrElse(100000000L)
    val pairs = SimilarityOps.pairCount(n)
    require(pairs <= budget.toDouble,
      f"exact near-dup over n=$n vectors means $pairs%.3g pair comparisons " +
        s"> budget $budget (spark.graft.neardup.maxPairs). An exact " +
        "θ-join is quadratic by nature — use the banded approximate " +
        "routes (s02 LSH / d03 MinHash+LSH) for corpora this size.")
    val nBlocks = 8
    val blocks = array((0 until nBlocks).map(lit): _*)
    val e = e0.withColumn("blk", pmod(hash(col("vec_id")), lit(nBlocks)))
    // row u replicated to keys {(blk(u), j) | j >= blk(u)} on the
    // left and {(i, blk(u)) | i <= blk(u)} on the right: every
    // unordered block pair meets on exactly one key
    val aSide = e.withColumn("bj", explode(blocks))
      .where(col("bj") >= col("blk"))
      .select(col("blk").as("bi"), col("bj"),
        col("vec_id").as("ida"), col("e").as("ea"), col("nrm").as("na"))
    val bSide = e.withColumn("bi", explode(blocks))
      .where(col("bi") <= col("blk"))
      .select(col("bi"), col("blk").as("bj"),
        col("vec_id").as("idb"), col("e").as("eb"), col("nrm").as("nb"))
    aSide.join(bSide, Seq("bi", "bj"))
      // same-block pairs appear twice (both orientations): keep one
      .where(col("bi") < col("bj") || col("ida") < col("idb"))
      .select(least(col("ida"), col("idb")).as("va"),
        greatest(col("ida"), col("idb")).as("vb"),
        (ColUtil.dotd(col("ea"), col("eb")) / (col("na") * col("nb")))
          .as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** The s05 IVF-PQ replay: coarse quantizer -> inverted lists ->
    * PQ codebooks/codes -> ADC shortlist -> exact re-rank. Shared by
    * s05 (inline build) and s10 (persisted index) because the build
    * is deterministic: the stored index equals the inline one.
    */
  private[operators] val ivfPqOracleSql: String =
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) " +
      "AS nrm FROM embeddings), " +
        "params AS (SELECT greatest(1, (max(vec_id) + 1) // 8) AS stride, " +
        "greatest(1, (max(vec_id) + 1) // 8) AS stride2 FROM e), " +
        "seeds AS (SELECT CAST(vec_id // stride AS INTEGER) AS cid, " +
        "e AS ce FROM e, params " +
        "WHERE vec_id % stride = 0 AND vec_id // stride < 8), " +
        "a1 AS (SELECT v.vec_id, v.e, s.cid, " +
        "row_number() OVER (PARTITION BY v.vec_id " +
        "ORDER BY list_dot_product(v.e, s.ce) DESC, s.cid) AS rn " +
        "FROM e v, seeds s), " +
        "cents AS (SELECT cid, i, " +
        "CAST(sum(CAST(e[i] AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m " +
        "FROM a1, range(1, 65) t(i) WHERE rn = 1 GROUP BY cid, i), " +
        "cvec AS (SELECT cid, list(m ORDER BY i) AS ce FROM cents " +
        "GROUP BY cid), " +
        "a2 AS (SELECT v.vec_id, v.nrm, c.cid, " +
        "row_number() OVER (PARTITION BY v.vec_id " +
        "ORDER BY list_dot_product(v.e, c.ce) DESC, c.cid) AS rn " +
        "FROM e v, cvec c), " +
        "lists AS (SELECT cid, vec_id, nrm FROM a2 WHERE rn = 1), " +
        "probes AS (SELECT vec_id AS qid, cid FROM a2 " +
        "WHERE vec_id < 5 AND rn <= 2), " +
        "subs AS (SELECT vec_id, m, e[(1 + 16*m):(16*(m+1))] AS sub " +
        "FROM e, range(0, 4) t(m)), " +
        "pseeds AS (SELECT m, CAST(vec_id // stride2 AS INTEGER) AS pc, " +
        "sub AS cw FROM subs, params " +
        "WHERE vec_id % stride2 = 0 AND vec_id // stride2 < 8), " +
        "p1 AS (SELECT s.vec_id, s.m, s.sub, c.pc, " +
        "row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY " +
        "list_dot_product(s.sub, s.sub) - " +
        "2.0 * list_dot_product(s.sub, c.cw) + " +
        "list_dot_product(c.cw, c.cw) ASC, c.pc) AS rn " +
        "FROM subs s JOIN pseeds c USING (m)), " +
        "pcent AS (SELECT m, pc, i, " +
        "CAST(sum(CAST(sub[i] AS DECIMAL(28,12))) AS DOUBLE) / count(*) " +
        "AS cm FROM p1, range(1, 17) t(i) WHERE rn = 1 " +
        "GROUP BY m, pc, i), " +
        "pvec AS (SELECT m, pc, list(cm ORDER BY i) AS cw FROM pcent " +
        "GROUP BY m, pc), " +
        "p2 AS (SELECT s.vec_id, s.m, c.pc, " +
        "row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY " +
        "list_dot_product(s.sub, s.sub) - " +
        "2.0 * list_dot_product(s.sub, c.cw) + " +
        "list_dot_product(c.cw, c.cw) ASC, c.pc) AS rn " +
        "FROM subs s JOIN pvec c USING (m)), " +
        "codes AS (SELECT vec_id, m, pc FROM p2 WHERE rn = 1), " +
        "qsubs AS (SELECT vec_id AS qid, m, sub AS qsub FROM subs " +
        "WHERE vec_id < 5), " +
        "q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM e " +
        "WHERE vec_id < 5), " +
        "cand AS (SELECT p.qid, l.vec_id, l.nrm FROM lists l " +
        "JOIN probes p USING (cid) WHERE l.vec_id <> p.qid), " +
        "adc AS (SELECT c.qid, c.vec_id, c.nrm, " +
        "CAST(sum(CAST(list_dot_product(qs.qsub, cb.cw) " +
        "AS DECIMAL(28,12))) AS DOUBLE) AS adc_dot " +
        "FROM cand c JOIN codes k ON k.vec_id = c.vec_id " +
        "JOIN pvec cb ON cb.m = k.m AND cb.pc = k.pc " +
        "JOIN qsubs qs ON qs.qid = c.qid AND qs.m = k.m " +
        "GROUP BY c.qid, c.vec_id, c.nrm), " +
        "short AS (SELECT qid, vec_id FROM (SELECT a.qid, a.vec_id, " +
        "row_number() OVER (PARTITION BY a.qid " +
        "ORDER BY a.adc_dot / (a.nrm * q.qnrm) DESC, a.vec_id) AS rn " +
        "FROM adc a JOIN q ON q.qid = a.qid) WHERE rn <= 64), " +
        "sims AS (SELECT s.qid, s.vec_id, " +
        "list_dot_product(x.e, q.qe) / (x.nrm * q.qnrm) AS cos_sim " +
        "FROM short s JOIN e x ON x.vec_id = s.vec_id " +
        "JOIN q ON q.qid = s.qid) " +
        "SELECT qid, vec_id, cos_sim, rank FROM (SELECT qid, vec_id, " +
        "cos_sim, row_number() OVER (PARTITION BY qid " +
        "ORDER BY cos_sim DESC, vec_id) AS rank FROM sims) " +
        "WHERE rank <= 5"

  val all: Seq[Q] = Seq(

    // Brute-force exact cosine top-k: broadcast the (small) query set
    // against all vectors — one narrow pass over the big side, a
    // per-query top-k (TakeOrdered-style) instead of a global sort.
    Q("s01_ann_bruteforce",
      Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e, " +
        "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm FROM embeddings), " +
        s"q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM e WHERE vec_id < $nQueries), " +
        "sims AS (SELECT qid, vec_id, " +
        "list_dot_product(e, qe) / (nrm * qnrm) AS cos_sim " +
        "FROM e CROSS JOIN q WHERE vec_id <> qid) " +
        "SELECT qid, vec_id, cos_sim, rank FROM (SELECT qid, vec_id, cos_sim, " +
        "row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rank " +
        s"FROM sims) WHERE rank <= $topK"),
      (s, d) => {
        val e = emb(s, d)
        val q = e.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("qid"), col("e").as("qe"),
            col("nrm").as("qnrm"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
        e.crossJoin(broadcast(q))
          .where(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            (ColUtil.dotd(col("e"), col("qe")) / (col("nrm") * col("qnrm")))
              .as("cos_sim"))
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= topK)
          .select(col("qid"), col("vec_id"), col("cos_sim"),
            col("rank").cast("long").as("rank"))
      }),

    // LSH (random hyperplane signatures, 8 bands × 4 bits): candidates
    // share at least one band; exact cosine re-ranking on candidates.
    // The hyperplanes are fixed-seed driver constants, so they embed
    // VERBATIM as literal arrays in the oracle SQL, and every sign bit
    // is a sequential-fold dot product (codegen'd DotProduct ==
    // DuckDB's list_dot_product, bit for bit) — the full probabilistic
    // bucket pipeline hash-matches a DuckDB replay; ScalaTest
    // additionally gates recall vs exact s01.
    Q("s02_ann_lsh", Some {
      val ps = planes(32)
      val planeRows = ps.zipWithIndex.map { case (p, i) =>
        s"($i, [${p.mkString(", ")}]::DOUBLE[])"
      }.mkString(", ")
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e, " +
        "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) " +
        "AS nrm FROM embeddings), " +
        s"planes(i, p) AS (VALUES $planeRows), " +
        "sigs AS (SELECT vec_id, i, CASE WHEN " +
        "list_dot_product(e, p) >= 0 THEN 1 ELSE 0 END AS s " +
        "FROM e, planes), " +
        "bnd AS (SELECT vec_id, i // 4 AS band, " +
        "CAST(sum(s * (1 << CAST(i % 4 AS INTEGER))) AS BIGINT) AS bucket " +
        "FROM sigs GROUP BY vec_id, i // 4), " +
        s"qb AS (SELECT vec_id AS qid, band, bucket FROM bnd " +
        s"WHERE vec_id < $nQueries), " +
        "cand AS (SELECT DISTINCT q.qid, b.vec_id FROM bnd b " +
        "JOIN qb q USING (band, bucket) WHERE b.vec_id <> q.qid), " +
        s"q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM e " +
        s"WHERE vec_id < $nQueries), " +
        "sims AS (SELECT c.qid, c.vec_id, " +
        "list_dot_product(x.e, q.qe) / (x.nrm * q.qnrm) AS cos_sim " +
        "FROM cand c JOIN e x ON x.vec_id = c.vec_id " +
        "JOIN q ON q.qid = c.qid) " +
        "SELECT qid, vec_id, cos_sim, rank FROM (SELECT qid, vec_id, " +
        "cos_sim, row_number() OVER (PARTITION BY qid " +
        "ORDER BY cos_sim DESC, vec_id) AS rank FROM sims) " +
        s"WHERE rank <= $topK"
    }, (s, d) => {
      val nPlanes = 32; val bands = 8; val bits = nPlanes / bands
      val ps = planes(nPlanes)
      val e = emb(s, d)
      // sign bit per plane -> per-band small integer bucket; the band
      // join and candidate dedup move ONLY ids — the 64-dim vectors are
      // re-attached after dedup so they never ride through a shuffle
      val sigCols = ps.zipWithIndex.map { case (p, i) =>
        when(ColUtil.dotd(col("e"), planeCol(p)) >= 0, 1).otherwise(0).as(s"s$i")
      }
      val bandCols = (0 until bands).map { b =>
        (0 until bits).map(r => col(s"s${b * bits + r}") *
          lit(1 << r)).reduce(_ + _).as(s"band$b")
      }
      val withSig = e.select(col("vec_id") +: sigCols: _*)
      val bandedIds = withSig
        .select(col("vec_id") +: bandCols: _*)
        .select(col("vec_id"), posexplode(
          array((0 until bands).map(b => col(s"band$b")): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val qIds = bandedIds.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("band"), col("bucket"))
      val cand = bandedIds.join(broadcast(qIds), Seq("band", "bucket"))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"))
        .distinct()
      val qVecs = e.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("e").as("qe"),
          col("nrm").as("qnrm"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      cand
        .join(e, "vec_id")
        .join(broadcast(qVecs), "qid")
        .select(col("qid"), col("vec_id"),
          (ColUtil.dotd(col("e"), col("qe")) / (col("nrm") * col("qnrm")))
            .as("cos_sim"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= topK)
        .select(col("qid"), col("vec_id"), col("cos_sim"),
          col("rank").cast("long").as("rank"))
    }),

    // IVF-style ANN: deterministic coarse centroids (strided sample +
    // one Lloyd refinement), inverted lists keyed by nearest centroid,
    // queries probe the top-2 centroids only. At 100 TB the inverted
    // lists are the partition key — each probe touches ~2/K of the
    // corpus. The one order-dependent step — centroid averaging — uses
    // exact DECIMAL(28,12) sums (the dsum trick), so the refined
    // centroids, every assignment and every score are bit-identical in
    // any engine: the full IVF pipeline hash-matches a DuckDB replay
    // (recall vs s01 additionally gated in QueryPackSpec).
    Q("s04_ann_ivf",
      Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e, " +
        "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) " +
        "AS nrm FROM embeddings), " +
        "params AS (SELECT greatest(1, (max(vec_id) + 1) // 8) AS stride " +
        "FROM e), " +
        "seeds AS (SELECT CAST(vec_id // stride AS INTEGER) AS cid, " +
        "e AS ce FROM e, params " +
        "WHERE vec_id % stride = 0 AND vec_id // stride < 8), " +
        "a1 AS (SELECT v.vec_id, v.e, s.cid, " +
        "row_number() OVER (PARTITION BY v.vec_id " +
        "ORDER BY list_dot_product(v.e, s.ce) DESC, s.cid) AS rn " +
        "FROM e v, seeds s), " +
        "cents AS (SELECT cid, i, " +
        "CAST(sum(CAST(e[i] AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m " +
        "FROM a1, range(1, 65) t(i) WHERE rn = 1 GROUP BY cid, i), " +
        "cvec AS (SELECT cid, list(m ORDER BY i) AS ce FROM cents " +
        "GROUP BY cid), " +
        "a2 AS (SELECT v.vec_id, v.e, v.nrm, c.cid, " +
        "row_number() OVER (PARTITION BY v.vec_id " +
        "ORDER BY list_dot_product(v.e, c.ce) DESC, c.cid) AS rn " +
        "FROM e v, cvec c), " +
        "lists AS (SELECT cid, vec_id, e, nrm FROM a2 WHERE rn = 1), " +
        "q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM e " +
        "WHERE vec_id < 5), " +
        "probes AS (SELECT vec_id AS qid, cid FROM a2 " +
        "WHERE vec_id < 5 AND rn <= 2), " +
        "sims AS (SELECT p.qid, l.vec_id, " +
        "list_dot_product(l.e, q.qe) / (l.nrm * q.qnrm) AS cos_sim " +
        "FROM lists l JOIN probes p USING (cid) JOIN q ON q.qid = p.qid " +
        "WHERE l.vec_id <> p.qid) " +
        "SELECT qid, vec_id, cos_sim, rank FROM (SELECT qid, vec_id, " +
        "cos_sim, row_number() OVER (PARTITION BY qid " +
        "ORDER BY cos_sim DESC, vec_id) AS rank FROM sims) " +
        "WHERE rank <= 5"),
      (s, d) => {
      val k = 8; val nProbe = 2
      val e = emb(s, d).cache()
      // seed centroids: strided deterministic sample
      val ids = e.select(max(col("vec_id"))).head().getLong(0) + 1
      val stride = math.max(1L, ids / k)
      val seeds = e.where(col("vec_id") % stride === 0 &&
          col("vec_id") / stride < k)
        .select((col("vec_id") / stride).cast("int").as("cid"),
          col("e").as("ce"))
      // one Lloyd step: assign all vectors, average per cluster
      def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("sim").desc, col("cid"))
        vecs.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("e"), col("nrm"), col("cid"),
            ColUtil.dotd(col("e"), col("ce")).as("sim"))
          .withColumn("rn", row_number().over(w))
      }
      val centroids = assign(e, seeds).where(col("rn") === 1)
        .select(col("cid"), posexplode(col("e")))
        .groupBy(col("cid"), col("pos"))
        // exact decimal mean: partition-order-independent AND
        // bit-reproducible in any engine (plain avg() folds doubles in
        // whatever order the shuffle delivers)
        .agg((sum(col("col").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("cid"), expr("transform(pm, x -> x.m)").as("ce"))
      // inverted lists: every vector in its nearest centroid's list
      val lists = assign(e, centroids).where(col("rn") === 1)
        .select(col("cid"), col("vec_id"), col("e"), col("nrm"))
      // queries probe their top nProbe centroids
      val q = e.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("e").as("qe"),
          col("nrm").as("qnrm"))
      val probes = assign(
        q.select(col("qid").as("vec_id"), col("qe").as("e"),
          col("qnrm").as("nrm")), centroids)
        .where(col("rn") <= nProbe)
        .select(col("vec_id").as("qid"), col("cid"))
      val wTop = Window.partitionBy(col("qid"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      lists.join(broadcast(probes), Seq("cid"))
        .join(broadcast(q), Seq("qid"))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (ColUtil.dotd(col("e"), col("qe")) / (col("nrm") * col("qnrm")))
            .as("cos_sim"))
        .withColumn("rank", row_number().over(wTop))
        .where(col("rank") <= topK)
        .select(col("qid"), col("vec_id"), col("cos_sim"),
          col("rank").cast("long").as("rank"))
    }),

    // IVF-PQ ANN: s04's coarse quantizer narrows each query to
    // ~nProbe/K of the corpus; PRODUCT QUANTIZATION then scores those
    // candidates from their codes — each vector stored as M=4 codebook
    // ids (one per 16-dim subspace) plus its norm — via asymmetric
    // distance (query-subvector · codeword dots), and only the ADC
    // shortlist (topC per query) touches full vectors for the exact
    // cosine re-rank. THE 100 TB memory shape: probe scoring reads
    // M + 8 bytes per candidate instead of the 512-byte vector
    // (~40x less I/O per probe; 1B vectors ≈ 12 GB of codes vs 512 GB
    // of floats), codebooks broadcast (K·M·Ks·16 doubles, KBs), and
    // the inverted list stays the partition key. Every
    // order-dependent step rides exact decimals (codeword means, the
    // M-term ADC sum), subspace assignment is a fixed-expression L2
    // with id tie-breaks, so the whole pipeline — codebooks, codes,
    // shortlist, re-rank — hash-matches a DuckDB replay; recall vs
    // exact s01 is additionally gated in QueryPackSpec.
    Q("s05_ann_ivfpq",
      Some(ivfPqOracleSql),
      (s, d) => {
      val k = 8; val nProbe = 2                 // coarse IVF
      val mSub = 4; val subDims = dims / mSub   // PQ subspaces
      val ks = 8                                // codewords per subspace
      val topC = 64                             // ADC shortlist size
      val e = emb(s, d).cache()
      val ids = e.select(max(col("vec_id"))).head().getLong(0) + 1
      def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("sim").desc, col("cid"))
        vecs.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("e"), col("nrm"), col("cid"),
            ColUtil.dotd(col("e"), col("ce")).as("sim"))
          .withColumn("rn", row_number().over(w))
      }
      // coarse quantizer: s04's strided seeds + one exact-decimal
      // Lloyd step
      val stride = math.max(1L, ids / k)
      val seeds = e.where(col("vec_id") % stride === 0 &&
          col("vec_id") / stride < k)
        .select((col("vec_id") / stride).cast("int").as("cid"),
          col("e").as("ce"))
      val centroids = assign(e, seeds).where(col("rn") === 1)
        .select(col("cid"), posexplode(col("e")))
        .groupBy(col("cid"), col("pos"))
        .agg((sum(col("col").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("cid"), expr("transform(pm, x -> x.m)").as("ce"))
      val assigned = assign(e, centroids)
      val lists = assigned.where(col("rn") === 1)
        .select(col("cid"), col("vec_id"), col("nrm"))
      val q = e.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("e").as("qe"),
          col("nrm").as("qnrm"))
      val probes = assigned
        .where(col("vec_id") < nQueries && col("rn") <= nProbe)
        .select(col("vec_id").as("qid"), col("cid"))
      // ---- product quantizer ----
      // subvectors (vec_id, m, sub); codebooks per subspace via the
      // same strided-seed + one-refinement protocol, assignment by a
      // fixed-expression L2 with codeword-id tie-breaks
      val subs = (0 until mSub).map { m =>
        e.select(col("vec_id"), lit(m).as("m"),
          slice(col("e"), m * subDims + 1, subDims).as("sub"))
      }.reduce(_ unionAll _)
      val stride2 = math.max(1L, ids / ks)
      val pseeds = subs.where(col("vec_id") % stride2 === 0 &&
          col("vec_id") / stride2 < ks)
        .select(col("m"), (col("vec_id") / stride2).cast("int").as("pc"),
          col("sub").as("cw"))
      def passign(svecs: DataFrame, cbook: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("vec_id"), col("m"))
          .orderBy(col("l2").asc, col("pc"))
        svecs.join(broadcast(cbook), Seq("m"))
          .select(col("vec_id"), col("m"), col("sub"), col("pc"),
            (ColUtil.dotd(col("sub"), col("sub"))
              - lit(2.0) * ColUtil.dotd(col("sub"), col("cw"))
              + ColUtil.dotd(col("cw"), col("cw"))).as("l2"))
          .withColumn("rn", row_number().over(w))
      }
      val codebook = passign(subs, pseeds).where(col("rn") === 1)
        .select(col("m"), col("pc"), posexplode(col("sub")))
        .groupBy(col("m"), col("pc"), col("pos"))
        .agg((sum(col("col").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("cm"))
        .groupBy(col("m"), col("pc"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cm"))))
          .as("pm"))
        .select(col("m"), col("pc"), expr("transform(pm, x -> x.cm)")
          .as("cw"))
      val codes = passign(subs, codebook).where(col("rn") === 1)
        .select(col("vec_id"), col("m"), col("pc"))
      val qsubs = subs.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("m"), col("sub").as("qsub"))
      // ---- ADC scoring over probed lists: codes + norm only ----
      val cand = lists.join(broadcast(probes), Seq("cid"))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), col("nrm"))
      val adc = cand
        .join(codes, Seq("vec_id"))
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
      // ---- exact re-rank of the shortlist only ----
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
    }),

    // Embedding-cosine near-duplicate pairs above a threshold — the
    // embedding flavor of dedup, EXACT at any scale via a grid-blocked
    // self-join: vectors hash into B blocks; each unordered block pair
    // (i <= j) is one equality-join key, so the plan is a shuffled
    // hash/sort-merge join on (bi, bj) — bounded block×block work per
    // task, no BroadcastNestedLoopJoin, no full-side broadcast.
    // Shuffle volume is N×B rows for B(B+1)/2-way task parallelism;
    // at 100 TB pick B ~ sqrt(2 × cores).
    //
    // Why not LSH candidates here: this data has true pairs AT the
    // 0.4 threshold (measured min cos_sim 0.4000 at sf0.01/sf0.1) and
    // thousands of pairs just below it; random-hyperplane banding with
    // recall ~1 at theta = acos(0.4) needs so many 1-2-bit bands that
    // candidate volume exceeds all-pairs. Exact threshold joins at a
    // low threshold are inherently quadratic; the approximate banded
    // route (recall-gated, sub-quadratic on clustered data) is s02/d03.
    Q("s03_embedding_near_dup",
      Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e, " +
        "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm FROM embeddings) " +
        "SELECT a.vec_id AS va, b.vec_id AS vb, " +
        "list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS cos_sim " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id " +
        "WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.4"),
      (s, d) => exactNearDupPairs(s, d, 0.4)),

    // Filtered ANN — vector search restricted by a document-metadata
    // predicate (the "search only docs from these sources" shape every
    // retrieval pipeline needs). The IVF index stays built ONCE over
    // the full corpus; the filter applies at query time, AFTER the
    // probe restriction — candidates are already ~nProbe/K of the
    // corpus, so the metadata semi-join touches only them (a 25%
    // filter over 1B vectors joins ~candidates rows, not 1B). Flip to
    // pre-filtering the lists only when the predicate is selective
    // enough to shrink the index below the probe output.
    Q("s07_ann_filtered",
      Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e, " +
        "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) " +
        "AS nrm FROM embeddings), " +
        "params AS (SELECT greatest(1, (max(vec_id) + 1) // 8) AS stride " +
        "FROM e), " +
        "seeds AS (SELECT CAST(vec_id // stride AS INTEGER) AS cid, " +
        "e AS ce FROM e, params " +
        "WHERE vec_id % stride = 0 AND vec_id // stride < 8), " +
        "a1 AS (SELECT v.vec_id, v.e, s.cid, " +
        "row_number() OVER (PARTITION BY v.vec_id " +
        "ORDER BY list_dot_product(v.e, s.ce) DESC, s.cid) AS rn " +
        "FROM e v, seeds s), " +
        "cents AS (SELECT cid, i, " +
        "CAST(sum(CAST(e[i] AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m " +
        "FROM a1, range(1, 65) t(i) WHERE rn = 1 GROUP BY cid, i), " +
        "cvec AS (SELECT cid, list(m ORDER BY i) AS ce FROM cents " +
        "GROUP BY cid), " +
        "a2 AS (SELECT v.vec_id, v.e, v.nrm, c.cid, " +
        "row_number() OVER (PARTITION BY v.vec_id " +
        "ORDER BY list_dot_product(v.e, c.ce) DESC, c.cid) AS rn " +
        "FROM e v, cvec c), " +
        "lists AS (SELECT cid, vec_id, e, nrm FROM a2 WHERE rn = 1), " +
        "flt AS (SELECT doc_id FROM documents " +
        "WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')), " +
        "q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM e " +
        "WHERE vec_id < 5), " +
        "probes AS (SELECT vec_id AS qid, cid FROM a2 " +
        "WHERE vec_id < 5 AND rn <= 2), " +
        "sims AS (SELECT p.qid, l.vec_id, " +
        "list_dot_product(l.e, q.qe) / (l.nrm * q.qnrm) AS cos_sim " +
        "FROM lists l JOIN flt f ON f.doc_id = l.vec_id " +
        "JOIN probes p USING (cid) JOIN q ON q.qid = p.qid " +
        "WHERE l.vec_id <> p.qid) " +
        "SELECT qid, vec_id, cos_sim, rank FROM (SELECT qid, vec_id, " +
        "cos_sim, row_number() OVER (PARTITION BY qid " +
        "ORDER BY cos_sim DESC, vec_id) AS rank FROM sims) " +
        "WHERE rank <= 5"),
      (s, d) => {
      val k = 8; val nProbe = 2
      val e = emb(s, d).cache()
      val ids = e.select(max(col("vec_id"))).head().getLong(0) + 1
      val stride = math.max(1L, ids / k)
      val seeds = e.where(col("vec_id") % stride === 0 &&
          col("vec_id") / stride < k)
        .select((col("vec_id") / stride).cast("int").as("cid"),
          col("e").as("ce"))
      def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("sim").desc, col("cid"))
        vecs.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("e"), col("nrm"), col("cid"),
            ColUtil.dotd(col("e"), col("ce")).as("sim"))
          .withColumn("rn", row_number().over(w))
      }
      val centroids = assign(e, seeds).where(col("rn") === 1)
        .select(col("cid"), posexplode(col("e")))
        .groupBy(col("cid"), col("pos"))
        .agg((sum(col("col").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("cid"), expr("transform(pm, x -> x.m)").as("ce"))
      val assigned = assign(e, centroids)
      val lists = assigned.where(col("rn") === 1)
        .select(col("cid"), col("vec_id"), col("e"), col("nrm"))
      val flt = Tables.load(s, d, "documents")
        .where(col("source").isin("src0", "src1", "src2", "src3", "src4"))
        .select(col("doc_id").as("vec_id"))
      val q = e.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("e").as("qe"),
          col("nrm").as("qnrm"))
      val probes = assigned
        .where(col("vec_id") < nQueries && col("rn") <= nProbe)
        .select(col("vec_id").as("qid"), col("cid"))
      val wTop = Window.partitionBy(col("qid"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      lists.join(broadcast(probes), Seq("cid"))
        // metadata filter AFTER the probe restriction: joins only the
        // probed candidates, not the corpus
        .join(flt, Seq("vec_id"), "left_semi")
        .join(broadcast(q), Seq("qid"))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (ColUtil.dotd(col("e"), col("qe")) / (col("nrm") * col("qnrm")))
            .as("cos_sim"))
        .withColumn("rank", row_number().over(wTop))
        .where(col("rank") <= topK)
        .select(col("qid"), col("vec_id"), col("cos_sim"),
          col("rank").cast("long").as("rank"))
    }),

    // Semantic dedup (SemDeDup-shaped): cluster the corpus with the
    // s04 coarse quantizer (strided seeds + one exact-decimal Lloyd
    // step — deterministic, replayable in SQL), then compare pairs
    // WITHIN clusters only and drop every vector that has cosine >= τ
    // with a lower-id clustermate (keeper = the lowest such id). The
    // global O(N²) θ-join becomes Σ_c n_c² with the cluster id as the
    // shuffle key — at 100 TB, K scales as N / target-cluster-size so
    // per-task pair work stays bounded, centroids stay a broadcast,
    // and no stage ever materializes cross-cluster pairs.
    Q("s06_semantic_dedup",
      Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e, " +
        "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) " +
        "AS nrm FROM embeddings), " +
        "params AS (SELECT greatest(1, (max(vec_id) + 1) // 8) AS stride " +
        "FROM e), " +
        "seeds AS (SELECT CAST(vec_id // stride AS INTEGER) AS cid, " +
        "e AS ce FROM e, params " +
        "WHERE vec_id % stride = 0 AND vec_id // stride < 8), " +
        "a1 AS (SELECT v.vec_id, v.e, s.cid, " +
        "row_number() OVER (PARTITION BY v.vec_id " +
        "ORDER BY list_dot_product(v.e, s.ce) DESC, s.cid) AS rn " +
        "FROM e v, seeds s), " +
        "cents AS (SELECT cid, i, " +
        "CAST(sum(CAST(e[i] AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m " +
        "FROM a1, range(1, 65) t(i) WHERE rn = 1 GROUP BY cid, i), " +
        "cvec AS (SELECT cid, list(m ORDER BY i) AS ce FROM cents " +
        "GROUP BY cid), " +
        "a2 AS (SELECT v.vec_id, v.e, v.nrm, c.cid, " +
        "row_number() OVER (PARTITION BY v.vec_id " +
        "ORDER BY list_dot_product(v.e, c.ce) DESC, c.cid) AS rn " +
        "FROM e v, cvec c), " +
        "lists AS (SELECT cid, vec_id, e, nrm FROM a2 WHERE rn = 1), " +
        "pairs AS (SELECT b.vec_id AS vb, a.vec_id AS va, " +
        "list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS cs " +
        "FROM lists a JOIN lists b ON a.cid = b.cid " +
        "AND a.vec_id < b.vec_id " +
        "WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.4), " +
        "sel AS (SELECT vb, va, cs, row_number() OVER " +
        "(PARTITION BY vb ORDER BY va) AS rn FROM pairs) " +
        "SELECT vb AS vec_id, va AS keeper_id, cs AS cos_keeper " +
        "FROM sel WHERE rn = 1"),
      (s, d) => {
      val k = 8
      val e = emb(s, d).cache()
      val ids = e.select(max(col("vec_id"))).head().getLong(0) + 1
      val stride = math.max(1L, ids / k)
      val seeds = e.where(col("vec_id") % stride === 0 &&
          col("vec_id") / stride < k)
        .select((col("vec_id") / stride).cast("int").as("cid"),
          col("e").as("ce"))
      def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("sim").desc, col("cid"))
        vecs.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("e"), col("nrm"), col("cid"),
            ColUtil.dotd(col("e"), col("ce")).as("sim"))
          .withColumn("rn", row_number().over(w))
      }
      val centroids = assign(e, seeds).where(col("rn") === 1)
        .select(col("cid"), posexplode(col("e")))
        .groupBy(col("cid"), col("pos"))
        .agg((sum(col("col").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("cid"), expr("transform(pm, x -> x.m)").as("ce"))
      val lists = assign(e, centroids).where(col("rn") === 1)
        .select(col("cid"), col("vec_id"), col("e"), col("nrm"))
      val a = lists.select(col("cid"), col("vec_id").as("va"),
        col("e").as("ea"), col("nrm").as("na"))
      val b = lists.select(col("cid"), col("vec_id").as("vb"),
        col("e").as("eb"), col("nrm").as("nb"))
      val pairs = a.join(b, Seq("cid"))
        .where(col("va") < col("vb"))
        .select(col("vb"), col("va"),
          (ColUtil.dotd(col("ea"), col("eb")) / (col("na") * col("nb")))
            .as("cs"))
        .where(col("cs") >= 0.4)
      val w = Window.partitionBy(col("vb")).orderBy(col("va"))
      pairs.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("vb").as("vec_id"), col("va").as("keeper_id"),
          col("cs").as("cos_keeper"))
    }),

    // kNN-GRAPH construction (the primitive under SemDeDup-style
    // clustering, label propagation and connectivity analyses): every
    // vector gets its approximate top-3 neighbors, not just a small
    // query set. Candidates come from s04's IVF structure — each
    // vector probes its home cell plus its second-nearest cell, so
    // the self-join is keyed on the CELL id: Σ_c n_c·p_c candidate
    // rows (~2·N·cell-size), never the N² all-pairs square. At 100 TB
    // the cell id is the shuffle/partition key, per-source top-3 is a
    // bounded window per vector, and hot cells are exactly what AQE
    // skew-join splitting handles (cells are ~uniform by construction
    // of the Lloyd step). Deterministic end to end (strided seeds,
    // exact-decimal centroid means, id tie-breaks) ⇒ the whole graph
    // hash-matches a DuckDB replay; edge quality is additionally
    // gated against exact brute force in QueryPackSpec.
    Q("s08_knn_graph",
      Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e, " +
        "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) " +
        "AS nrm FROM embeddings), " +
        "params AS (SELECT greatest(1, (max(vec_id) + 1) // 8) AS stride " +
        "FROM e), " +
        "seeds AS (SELECT CAST(vec_id // stride AS INTEGER) AS cid, " +
        "e AS ce FROM e, params " +
        "WHERE vec_id % stride = 0 AND vec_id // stride < 8), " +
        "a1 AS (SELECT v.vec_id, v.e, s.cid, " +
        "row_number() OVER (PARTITION BY v.vec_id " +
        "ORDER BY list_dot_product(v.e, s.ce) DESC, s.cid) AS rn " +
        "FROM e v, seeds s), " +
        "cents AS (SELECT cid, i, " +
        "CAST(sum(CAST(e[i] AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m " +
        "FROM a1, range(1, 65) t(i) WHERE rn = 1 GROUP BY cid, i), " +
        "cvec AS (SELECT cid, list(m ORDER BY i) AS ce FROM cents " +
        "GROUP BY cid), " +
        "a2 AS (SELECT v.vec_id, v.e, v.nrm, c.cid, " +
        "row_number() OVER (PARTITION BY v.vec_id " +
        "ORDER BY list_dot_product(v.e, c.ce) DESC, c.cid) AS rn " +
        "FROM e v, cvec c), " +
        "lists AS (SELECT cid, vec_id, e, nrm FROM a2 WHERE rn = 1), " +
        "probes AS (SELECT vec_id AS src_id, cid FROM a2 WHERE rn <= 2), " +
        "sims AS (SELECT p.src_id, l.vec_id AS nb_id, " +
        "list_dot_product(l.e, q.e) / (l.nrm * q.nrm) AS cos_sim " +
        "FROM lists l JOIN probes p USING (cid) " +
        "JOIN e q ON q.vec_id = p.src_id WHERE l.vec_id <> p.src_id) " +
        "SELECT src_id, nb_id, cos_sim, rank FROM (SELECT src_id, " +
        "nb_id, cos_sim, row_number() OVER (PARTITION BY src_id " +
        "ORDER BY cos_sim DESC, nb_id) AS rank FROM sims) " +
        "WHERE rank <= 3"),
      (s, d) => {
        val k = 8; val nProbe = 2; val graphK = 3
        val e = emb(s, d).cache()
        val ids = e.select(max(col("vec_id"))).head().getLong(0) + 1
        val stride = math.max(1L, ids / k)
        val seeds = e.where(col("vec_id") % stride === 0 &&
            col("vec_id") / stride < k)
          .select((col("vec_id") / stride).cast("int").as("cid"),
            col("e").as("ce"))
        def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
          val w = Window.partitionBy(col("vec_id"))
            .orderBy(col("sim").desc, col("cid"))
          vecs.crossJoin(broadcast(cents))
            .select(col("vec_id"), col("e"), col("nrm"), col("cid"),
              ColUtil.dotd(col("e"), col("ce")).as("sim"))
            .withColumn("rn", row_number().over(w))
        }
        val centroids = assign(e, seeds).where(col("rn") === 1)
          .select(col("cid"), posexplode(col("e")))
          .groupBy(col("cid"), col("pos"))
          .agg((sum(col("col").cast("decimal(28,12)")).cast("double") /
            count(lit(1))).as("m"))
          .groupBy(col("cid"))
          .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
            .as("pm"))
          .select(col("cid"), expr("transform(pm, x -> x.m)").as("ce"))
        // one assignment feeds both the inverted lists (home cell,
        // rn=1) and every vector's probe set (rn <= nProbe)
        val a2 = assign(e, centroids).cache()
        val lists = a2.where(col("rn") === 1)
          .select(col("cid"), col("vec_id"), col("e"), col("nrm"))
        val probes = a2.where(col("rn") <= nProbe)
          .select(col("vec_id").as("src_id"), col("cid"))
        val q = e.select(col("vec_id").as("src_id"), col("e").as("qe"),
          col("nrm").as("qnrm"))
        val w = Window.partitionBy(col("src_id"))
          .orderBy(col("cos_sim").desc, col("nb_id"))
        lists.join(probes, Seq("cid"))
          .where(col("vec_id") =!= col("src_id"))
          .join(q, Seq("src_id"))
          .select(col("src_id"), col("vec_id").as("nb_id"),
            (ColUtil.dotd(col("e"), col("qe")) / (col("nrm") * col("qnrm")))
              .as("cos_sim"))
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= graphK)
          .select(col("src_id"), col("nb_id"), col("cos_sim"),
            col("rank").cast("long").as("rank"))
      }),

    // Int8 scalar quantization of the embedding column + a
    // reconstruction-error audit — the storage-compression step before
    // shipping vectors to an ANN index (4× smaller than float32, 8×
    // smaller than the float64 compute form). Per vector: min/max
    // scale, code_i = round((x_i − mn)/rng · 254) ∈ [0, 254],
    // reconstruction x̂_i = mn + code_i·rng/254; audit = per-vector
    // SSE and max |err|. Scale shape: Spark side is ZERO-shuffle —
    // min/max/codes/errors all run as higher-order array functions
    // inside one codegen'd projection (no explode, no groupBy); the
    // oracle replays the identical arithmetic via unnest + GROUP BY.
    // Determinism: per-element ops are fixed-shape IEEE in both
    // engines, the SSE accumulates as DECIMAL(28,16) over
    // round(err², 14) (order-independent), and outputs round to 12/9.
    Q("s09_sq8_quantize",
      Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v " +
        "FROM embeddings), " +
        "b AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx, " +
        "list_max(v) - list_min(v) AS rng, len(v) AS n FROM e), " +
        "x AS (SELECT vec_id, n, rng, mn, unnest(v) AS x FROM b), " +
        "r AS (SELECT vec_id, n, " +
        "x - (CASE WHEN rng = 0 THEN mn " +
        "ELSE mn + round((x - mn) / rng * 254) * rng / 254 END) AS err " +
        "FROM x) " +
        "SELECT vec_id, CAST(max(n) AS BIGINT) AS n_dims, " +
        "round(CAST(sum(CAST(round(err * err, 14) AS DECIMAL(28,16))) " +
        "AS DOUBLE), 12) AS sse, " +
        "round(max(abs(err)), 9) AS max_abs_err " +
        "FROM r GROUP BY vec_id"),
      (s, d) => {
        val base = Tables.load(s, d, "embeddings")
          .select(col("vec_id"), ColUtil.asDouble(col("embedding")).as("v"))
          .withColumn("mn", array_min(col("v")))
          .withColumn("mx", array_max(col("v")))
          .withColumn("rng", col("mx") - col("mn"))
        base
          .withColumn("errs", expr(
            // identical op shape to the oracle: (x−mn)/rng·254 rounded,
            // reconstructed as mn + code·rng/254, rng=0 guarded
            "transform(v, x -> x - (CASE WHEN rng = 0D THEN mn " +
            "ELSE mn + round((x - mn) / rng * 254) * rng / 254 END))"))
          .select(col("vec_id"),
            size(col("v")).cast("long").as("n_dims"),
            round(expr("aggregate(errs, CAST(0 AS DECIMAL(28,16)), " +
              "(acc, e) -> CAST(acc + CAST(round(e * e, 14) " +
              "AS DECIMAL(28,16)) AS DECIMAL(28,16)))")
              .cast("double"), 12).as("sse"),
            round(expr("array_max(transform(errs, e -> abs(e)))"), 9)
              .as("max_abs_err"))
      }),

    // Cosine RANGE search (FAISS RangeSearch semantics): ALL neighbors
    // within cos >= τ of each probe, not a fixed k. Exact by a single
    // linear scan with the probe set broadcast — for a small probe
    // batch this IS the 100 TB plan (each partition scores its rows
    // against the in-memory probes; no shuffle of corpus data, the
    // result is only the matches). Large probe batches route through
    // the persisted IVF index (s10) instead.
    Q("s12_range_search",
      Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e, " +
        "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) " +
        "AS nrm FROM embeddings), " +
        "q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM e " +
        "WHERE vec_id < 4) " +
        "SELECT qid, vec_id, cos_sim FROM (" +
        "SELECT qid, vec_id, list_dot_product(e, qe) / (nrm * qnrm) " +
        "AS cos_sim FROM e CROSS JOIN q WHERE vec_id <> qid) " +
        "WHERE cos_sim >= 0.3"),
      (s, d) => {
        val e = emb(s, d)
        val probes = e.filter(col("vec_id") < 4)
          .select(col("vec_id").as("qid"), col("e").as("qe"),
            col("nrm").as("qnrm"))
        e.crossJoin(broadcast(probes))
          .where(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            (ColUtil.dotd(col("e"), col("qe")) / (col("nrm") * col("qnrm")))
              .as("cos_sim"))
          .where(col("cos_sim") >= 0.3)
      })
  )
}
