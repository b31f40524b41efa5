package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data curation operators a 100 TB pipeline runs between
  * dedup and training: deterministic stratified sampling, hash-based
  * train/test splits, exact heavy hitters, duplicate-cluster
  * resolution (connected components) and per-cluster representative
  * selection. All deterministic -> all DuckDB-hash-gated.
  */
object PipelineOps extends QueryPack {

  /** Near-dup pairs at the d02 threshold (same shingle pipeline). */
  private def dupPairs(s: SparkSession, d: String): DataFrame =
    DedupOps.jaccardPairsAt(s, d, 0.6).select(col("da"), col("db"))

  /** Connected components over the near-dup pair graph by iterative
    * min-label propagation: each vertex repeatedly takes the min label
    * among itself and its neighbors until fixpoint. At 100 TB each
    * iteration is one shuffle-join + aggregate (the standard
    * large-graph CC shape); iteration count is bounded by component
    * diameter, which for near-dup clusters is tiny.
    */
  private def dupClusters(s: SparkSession, d: String): DataFrame = {
    // localCheckpoint (not cache): each iteration references `labels`
    // TWICE (union + join branches), so under cache eviction a plain
    // cache re-expands the DAG exponentially back through the LSH pair
    // pipeline. Checkpointing TRUNCATES the lineage per round — labels
    // are one tiny row per clustered doc, so the storage cost is nil
    // and worst-case recompute is bounded to one round.
    val pairs = dupPairs(s, d).localCheckpoint()
    val edges = pairs.select(col("da").as("u"), col("db").as("v"))
      .unionAll(pairs.select(col("db").as("u"), col("da").as("v")))
      .localCheckpoint()
    var labels = edges.select(col("u")).distinct()
      .select(col("u"), col("u").as("lbl")).localCheckpoint()
    // convergence via the label-sum invariant: min-propagation makes
    // Σlbl strictly decrease every non-converged round, so one cheap
    // aggregate replaces a join-and-compare per iteration
    var prevSum = Option.empty[Long]
    var converged = false
    var iter = 0
    while (!converged && iter < 50) {
      val viaNeighbors = edges
        .join(labels.select(col("u").as("v"), col("lbl")), Seq("v"))
        .select(col("u"), col("lbl"))
      val next = labels.unionAll(viaNeighbors)
        .groupBy(col("u")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      val s = next.agg(coalesce(sum(col("lbl")), lit(0L)))
        .as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
      // `next` is materialized and truncated, so the previous round's
      // checkpoint blocks are dead — free them eagerly rather than
      // letting rows-per-doc × iterations of blocks wait for GC
      labels.unpersist()
      labels = next
      converged = prevSum.contains(s)
      prevSum = Some(s)
      iter += 1
    }
    // the returned frame reads only `labels`' checkpoint blocks —
    // the pair/edge inputs are no longer reachable from it
    edges.unpersist()
    pairs.unpersist()
    labels.select(col("u").as("doc_id"), col("lbl").as("cluster_id"))
  }

  /** d02's pair pipeline as the shared oracle prefix. */
  private val duckPairs =
    "WITH RECURSIVE toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents), " +
      "sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s " +
      "FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3), " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), " +
      "rawpairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter " +
      "FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "pairs AS (SELECT da, db FROM rawpairs JOIN sizes x ON da = x.doc_id " +
      "JOIN sizes y ON db = y.doc_id " +
      "WHERE inter::DOUBLE / (x.n + y.n - inter) >= 0.6)"

  private val duckClusters =
    ", edges AS (SELECT da AS u, db AS v FROM pairs " +
      "UNION ALL SELECT db, da FROM pairs), " +
      "verts AS (SELECT DISTINCT u FROM edges), " +
      "walk AS (SELECT u, u AS lbl FROM verts " +
      "UNION SELECT e.u, w.lbl FROM edges e, walk w WHERE w.u = e.v), " +
      "clusters AS (SELECT u AS doc_id, min(lbl) AS cluster_id " +
      "FROM walk GROUP BY u)"

  val all: Seq[Q] = Seq(

    // Deterministic stratified sampling: per-source rates via modular
    // arithmetic on the key — reproducible across engines/runs, no RNG
    // state, embarrassingly parallel (the sampling predicate pushes
    // into the scan).
    Q("p01_stratified_sample",
      Some("SELECT doc_id, source FROM documents " +
        "WHERE (doc_id * 48271) % 100 < " +
        "10 + 5 * (CAST(substr(source, 4, 10) AS BIGINT) % 4)"),
      (s, d) => Tables.load(s, d, "documents")
        .where(pmod(col("doc_id") * 48271, lit(100)) <
          lit(10) + lit(5) * (substring(col("source"), 4, 10)
            .cast("long") % 4))
        .select(col("doc_id"), col("source"))),

    // Hash-based train/test split: md5 over a salted key gives a
    // stable, engine-agnostic assignment (Spark md5 == DuckDB md5);
    // split sizes are the gate output.
    Q("p02_train_test_split",
      Some("SELECT CASE WHEN substr(md5('split:' || doc_id), 1, 1) < 'd' " +
        "THEN 'train' ELSE 'test' END AS split, count(*) AS n, " +
        "CAST(sum(n_chars) AS BIGINT) AS total_chars " +
        "FROM documents GROUP BY 1"),
      (s, d) => Tables.load(s, d, "documents")
        .withColumn("split",
          when(substring(md5(concat(lit("split:"),
            col("doc_id").cast("string"))), 1, 1) < "d", "train")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))),

    // Exact heavy hitters: top-50 tokens by frequency (deterministic
    // tie-break). One shuffle on token, then `orderBy().limit(50)` —
    // planned as TakeOrderedAndProject (per-partition top-50 folded at
    // the driver) so the full vocabulary (10^8+ distinct tokens at
    // scale) never funnels through one partition; only the 50
    // survivors see the rank window.
    Q("p03_heavy_hitters",
      Some("SELECT w, n, rk FROM (SELECT w, count(*) AS n, " +
        "row_number() OVER (ORDER BY count(*) DESC, w) AS rk " +
        "FROM (SELECT unnest(string_split(trim(text), ' ')) AS w " +
        "FROM documents) GROUP BY w) WHERE rk <= 50"),
      (s, d) => {
        val top50 = Tables.load(s, d, "documents")
          .select(explode(split(trim(col("text")), " ")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("w"))
          .limit(50)
        val w = Window.orderBy(col("n").desc, col("w"))
        top50
          .withColumn("rk", row_number().over(w))
          .select(col("w"), col("n"), col("rk").cast("long").as("rk"))
      }),

    // Duplicate-cluster resolution: connected components over the
    // near-dup pair graph (min-label propagation; oracle = recursive
    // CTE computing min reachable label).
    Q("p04_dup_clusters",
      Some(duckPairs + duckClusters +
        " SELECT doc_id, cluster_id FROM clusters"),
      (s, d) => dupClusters(s, d)),

    // The full curation funnel in ONE query: exact dedup (min-id per
    // content hash) ∧ near-dup cluster resolution (keep only each
    // cluster's representative) ∧ quality floor (≥ 20 tokens), then a
    // per-source summary of what survives. Every stage is the
    // distributed shape used by its standalone operator; the oracle
    // replays the identical funnel in SQL.
    Q("p06_curation_funnel",
      Some(duckPairs + duckClusters +
        ", reps AS (SELECT doc_id FROM (SELECT c.doc_id, " +
        "row_number() OVER (PARTITION BY c.cluster_id " +
        "ORDER BY d.n_chars DESC, c.doc_id) AS rk " +
        "FROM clusters c JOIN documents d USING (doc_id)) WHERE rk = 1), " +
        "clustered AS (SELECT doc_id FROM clusters), " +
        "exact_keep AS (SELECT min(doc_id) AS doc_id FROM (" +
        "SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h " +
        "FROM documents) GROUP BY h), " +
        "kept AS (SELECT d.doc_id, d.source, " +
        "len(string_split(trim(d.text), ' ')) AS n_tokens FROM documents d " +
        "WHERE d.doc_id IN (SELECT doc_id FROM exact_keep) " +
        "AND (d.doc_id NOT IN (SELECT doc_id FROM clustered) " +
        "OR d.doc_id IN (SELECT doc_id FROM reps)) " +
        "AND len(string_split(trim(d.text), ' ')) >= 20) " +
        "SELECT source, count(*) AS n_kept, " +
        "CAST(sum(n_tokens) AS BIGINT) AS total_tokens " +
        "FROM kept GROUP BY source"),
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        val exactKeep = docs
          .select(col("doc_id"),
            md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
              .as("h"))
          .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"))
        // dupClusters already returns a lineage-truncated (checkpointed)
        // frame; the two consuming branches (reps window + anti-join)
        // re-read the checkpoint blocks, never the LSH pipeline.
        val clusters = dupClusters(s, d)
        val w = Window.partitionBy(col("cluster_id"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        val reps = clusters
          .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
          .withColumn("rk", row_number().over(w))
          .where(col("rk") === 1).select(col("doc_id"))
        val nonReps = clusters.select(col("doc_id"))
          .join(reps, Seq("doc_id"), "left_anti")
        docs
          .select(col("doc_id"), col("source"),
            size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
          .join(exactKeep, Seq("doc_id"), "left_semi")
          .join(nonReps, Seq("doc_id"), "left_anti")
          .where(col("n_tokens") >= 20)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_tokens")).as("total_tokens"))
      }),

    // Sequence packing (GPT-style concat-and-split): docs in doc_id
    // order are laid end-to-end in token space and cut into fixed
    // 2048-token training sequences; each doc's placement
    // (seq_id, seq_offset, n_seqs spanned) is a closed form of the
    // exclusive running token total. The global prefix sum is computed
    // scale-shaped: per-range partial sums cumsum'd IN PARALLEL
    // (window partitioned by contiguous doc_id range), range offsets —
    // one tiny row per range — prefix-summed and joined back
    // broadcast, instead of the single-partition global-window sort
    // that would serialize 100 TB through one task.
    Q("p07_sequence_pack",
      Some("WITH toks AS (SELECT doc_id, " +
        "len(string_split(trim(text), ' ')) AS n_tokens FROM documents), " +
        "cums AS (SELECT doc_id, n_tokens, " +
        "sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS prev " +
        "FROM toks) " +
        "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, " +
        "CAST(prev // 2048 AS BIGINT) AS seq_id, " +
        "CAST(prev % 2048 AS BIGINT) AS seq_offset, " +
        "CAST((prev + n_tokens - 1) // 2048 - prev // 2048 + 1 AS BIGINT) " +
        "AS n_seqs FROM cums"),
      (s, d) => {
        val budget = 2048L
        val nRanges = 32L
        val toks = Tables.load(s, d, "documents")
          .select(col("doc_id"),
            size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
        // contiguous ranges of the dense doc_id space -> parallel
        // per-range cumsum + broadcast range-offset join. Range sizing
        // needs the doc count, which parquet answers from footer
        // metadata (no column scan — vs max(doc_id), a full-column job)
        val total = Tables.load(s, d, "documents").count()
        val perRange = (total + nRanges - 1) / nRanges
        val ranged = toks.withColumn("rng", expr(s"doc_id div $perRange"))
        val wRange = Window.partitionBy(col("rng")).orderBy(col("doc_id"))
        val inRange = ranged.withColumn("cum_in",
          sum(col("n_tokens")).over(wRange))
        val offsets = ranged.groupBy(col("rng"))
          .agg(sum(col("n_tokens")).as("rtotal"))
          .withColumn("roffset",
            coalesce(sum(col("rtotal")).over(
              Window.orderBy(col("rng"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("rng"), col("roffset"))
        inRange.join(broadcast(offsets), "rng")
          .withColumn("prev", col("roffset") + col("cum_in") - col("n_tokens"))
          .select(col("doc_id"), col("n_tokens"),
            expr(s"prev div $budget").as("seq_id"),
            pmod(col("prev"), lit(budget)).as("seq_offset"),
            expr(s"(prev + n_tokens - 1) div $budget - prev div $budget + 1")
              .as("n_seqs"))
      }),

    // Domain-mix resampling: per-source quota k = ceil(3*sqrt(n))
    // (square-root scaling flattens the source skew), members chosen by
    // deterministic md5 rank. Quotas ride a broadcast join; the rank
    // window is per-source.
    Q("p09_domain_mix",
      Some("WITH c AS (SELECT source, COUNT(*) AS n FROM documents " +
        "GROUP BY 1), " +
        "t AS (SELECT source, CAST(ceil(3*sqrt(n)) AS BIGINT) AS k FROM c), " +
        "r AS (SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY " +
        "source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn " +
        "FROM documents) " +
        "SELECT doc_id, source FROM r JOIN t USING (source) WHERE rn <= k"),
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        val quota = docs.groupBy(col("source"))
          .agg(ceil(lit(3) * sqrt(count(lit(1)))).cast("long").as("k"))
        val w = Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        docs.select(col("doc_id"), col("source"))
          .withColumn("rn", row_number().over(w))
          .join(broadcast(quota), "source")
          .where(col("rn") <= col("k"))
          .select(col("doc_id"), col("source"))
      }),

    // Per-domain token budget: greedy md5-ordered running token sum per
    // source, truncated at the budget — "take ~B tokens from each
    // domain, reproducibly". Per-source window, exact long arithmetic.
    Q("p10_token_budget",
      Some("WITH toks AS (SELECT doc_id, source, " +
        "len(string_split(trim(text),' ')) AS nt FROM documents), " +
        "c AS (SELECT doc_id, source, nt, SUM(nt) OVER (PARTITION BY " +
        "source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum " +
        "FROM toks) " +
        "SELECT doc_id, source, CAST(nt AS BIGINT) AS nt, " +
        "CAST(cum AS BIGINT) AS cum FROM c WHERE cum <= 3000"),
      (s, d) => {
        val toks = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("source"),
            size(split(trim(col("text")), " ")).cast("long").as("nt"))
        val w = Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        toks.withColumn("cum", sum(col("nt")).over(w))
          .where(col("cum") <= 3000)
      }),

    // Deterministic per-group sampling (data mixing): k docs per
    // source chosen by md5 rank — the reproducible, engine-agnostic
    // analog of reservoir sampling. One shuffle on source; the window
    // is per-group so no global sort.
    Q("p08_group_sample",
      Some("SELECT source, doc_id, rk FROM (SELECT source, doc_id, " +
        "row_number() OVER (PARTITION BY source " +
        "ORDER BY md5('mix:' || doc_id), doc_id) AS rk " +
        "FROM documents) WHERE rk <= 5"),
      (s, d) => {
        val w = Window.partitionBy(col("source"))
          .orderBy(md5(concat(lit("mix:"), col("doc_id").cast("string"))),
            col("doc_id"))
        Tables.load(s, d, "documents")
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 5)
          .select(col("source"), col("doc_id"), col("rk").cast("long").as("rk"))
      }),

    // Z-order (Morton) clustering for file layout: bucket two doc
    // dimensions to 8 bits, interleave them with the native codegen'd
    // InterleaveBits expression, and cut the code space into 16
    // equal-count tiles (ntile over the total order (z, doc_id) — the
    // deterministic stand-in for the sampled repartitionByRange the
    // physical layout uses, see LayoutOps/ZorderLayoutSpec). The
    // per-tile min/max of BOTH dims is the point: every tile — one
    // output file — has a tight bounding box in every clustered
    // column, so multi-column predicates prune on all conjuncts. The
    // oracle replays the interleave as closed-form integer shifts.
    // PageRank-style document centrality over the shared-rare-term
    // graph (docs are linked when they share a term with corpus df in
    // [2, 3]) — the iterative-propagation family member beyond p04's
    // connected components; centrality-weighted selection is a real
    // curation signal ("keep the docs most central to their topic
    // cluster"). Scale shape: the edge list comes from an
    // inverted-index self-join keyed on the RARE term (df-bounded, so
    // per-key fan-out is ≤ 3 — never a hot-token quadratic blowup),
    // and each of the 3 fixed iterations is ONE shuffle
    // (join on src + groupBy dst), the standard large-graph pattern.
    // Determinism: per-edge contributions round to 12 places and sum
    // as DECIMAL(28,14) (order-independent), so the ranking
    // hash-gates against a 3-iteration SQL replay.
    Q("p12_doc_pagerank",
      Some {
        val iter = (prev: String, out: String) =>
          s"c$out AS (SELECT e.dst AS doc_id, " +
            "CAST(sum(CAST(round(r.r / d.deg * 0.85, 12) " +
            s"AS DECIMAL(28,14))) AS DOUBLE) AS cin FROM pr e " +
            s"JOIN r$prev r ON r.doc_id = e.src " +
            "JOIN deg d ON d.src = e.src GROUP BY 1), " +
            s"r$out AS (SELECT dd.doc_id, " +
            s"round(0.15 / n.n + coalesce(c$out.cin, 0.0), 12) AS r " +
            "FROM documents dd CROSS JOIN n " +
            s"LEFT JOIN c$out ON c$out.doc_id = dd.doc_id), "
        "WITH toks AS (SELECT DISTINCT doc_id, tok FROM " +
          "(SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok " +
          "FROM documents)), " +
          "rare AS (SELECT tok FROM (SELECT tok, count(*) AS df " +
          "FROM toks GROUP BY 1) WHERE df BETWEEN 2 AND 3), " +
          "pr AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst " +
          "FROM toks a JOIN rare USING (tok) JOIN toks b USING (tok) " +
          "WHERE a.doc_id <> b.doc_id), " +
          "deg AS (SELECT src, count(*) AS deg FROM pr GROUP BY 1), " +
          "n AS (SELECT count(*) AS n FROM documents), " +
          "r0 AS (SELECT doc_id, round(1.0 / n.n, 12) AS r " +
          "FROM documents CROSS JOIN n), " +
          iter("0", "1") + iter("1", "2") + iter("2", "3").dropRight(2) +
          " SELECT doc_id, round(r, 10) AS rank_score FROM r3 " +
          "ORDER BY rank_score DESC, doc_id LIMIT 20"
      },
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        val toks = docs
          .select(col("doc_id"),
            explode(split(trim(col("text")), " ")).as("tok"))
          .distinct()
        val rare = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .where(col("df").between(2, 3)).select(col("tok"))
        val edges = toks.join(rare, "tok")
          .select(col("tok"), col("doc_id").as("src"))
          .join(toks.join(rare, "tok")
            .select(col("tok"), col("doc_id").as("dst")), "tok")
          .where(col("src") =!= col("dst"))
          .select(col("src"), col("dst")).distinct().localCheckpoint()
        val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val src = edges.join(deg, "src")
        val n = docs.count()
        val nodes = docs.select(col("doc_id"))
        var r = nodes.select(col("doc_id"),
          round(lit(1.0) / n, 12).as("r"))
        (1 to 3).foreach { i =>
          val prev = r
          val contrib = src
            .join(r.withColumnRenamed("doc_id", "src"), "src")
            .select(col("dst").as("doc_id"),
              round(col("r") / col("deg") * 0.85, 12)
                .cast("decimal(28,14)").as("c"))
            .groupBy(col("doc_id"))
            .agg(sum(col("c")).cast("double").as("cin"))
          // truncate the iteration lineage — same eviction-safety
          // treatment as dupClusters; r is one tiny row per doc —
          // and free the superseded round's blocks eagerly
          r = nodes.join(contrib, Seq("doc_id"), "left")
            .select(col("doc_id"),
              round(lit(0.15) / n + coalesce(col("cin"), lit(0.0)), 12)
                .as("r"))
            .localCheckpoint()
          if (i > 1) prev.unpersist()
          ()
        }
        edges.unpersist()
        r.select(col("doc_id"), round(col("r"), 10).as("rank_score"))
          .orderBy(col("rank_score").desc, col("doc_id")).limit(20)
      }),

    Q("p11_zorder_layout",
      Some("WITH dims AS (SELECT doc_id, " +
        "least(255, n_chars >> 5) AS d1, doc_id % 256 AS d2 " +
        "FROM documents), " +
        "z AS (SELECT doc_id, d1, d2, " +
        graft.functions.BitFunctions.interleaveSql(Seq("d1", "d2"), 8) +
        " AS z FROM dims), " +
        "b AS (SELECT *, ntile(16) OVER (ORDER BY z, doc_id) AS tile " +
        "FROM z) " +
        "SELECT CAST(tile AS BIGINT) AS tile, count(*) AS n, " +
        "CAST(min(z) AS BIGINT) AS z_min, CAST(max(z) AS BIGINT) AS z_max, " +
        "CAST(min(d1) AS BIGINT) AS d1_min, CAST(max(d1) AS BIGINT) AS d1_max, " +
        "CAST(min(d2) AS BIGINT) AS d2_min, CAST(max(d2) AS BIGINT) AS d2_max " +
        "FROM b GROUP BY tile"),
      (s, d) => {
        val dims = Tables.load(s, d, "documents")
          .select(col("doc_id"),
            least(lit(255L), shiftright(col("n_chars"), 5)).as("d1"),
            (col("doc_id") % 256).as("d2"))
        val z = graft.operators.LayoutOps.withZ(
          dims, Seq(col("d1"), col("d2")), 8)
        z.withColumn("tile",
            ntile(16).over(Window.orderBy(col("z"), col("doc_id")))
              .cast("long"))
          .groupBy(col("tile"))
          .agg(count(lit(1)).as("n"),
            min(col("z")).as("z_min"), max(col("z")).as("z_max"),
            min(col("d1")).as("d1_min"), max(col("d1")).as("d1_max"),
            min(col("d2")).as("d2_min"), max(col("d2")).as("d2_max"))
      }),

    // Representative selection: keep one doc per duplicate cluster
    // (longest text, tie-break smallest id) — the "which copy do we
    // train on" step after clustering.
    Q("p05_cluster_representatives",
      Some(duckPairs + duckClusters +
        ", scored AS (SELECT c.cluster_id, c.doc_id, d.n_chars, " +
        "row_number() OVER (PARTITION BY c.cluster_id " +
        "ORDER BY d.n_chars DESC, c.doc_id) AS rk " +
        "FROM clusters c JOIN documents d USING (doc_id)) " +
        "SELECT cluster_id, doc_id AS keep_id, " +
        "CAST(n_chars AS BIGINT) AS n_chars " +
        "FROM scored WHERE rk = 1"),
      (s, d) => {
        val clusters = dupClusters(s, d)
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("n_chars"))
        val w = Window.partitionBy(col("cluster_id"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        clusters.join(docs, "doc_id")
          .withColumn("rk", row_number().over(w))
          .where(col("rk") === 1)
          .select(col("cluster_id"), col("doc_id").as("keep_id"),
            col("n_chars"))
      })
  )
}
