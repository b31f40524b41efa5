package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents`: exact (hash groupBy),
  * exact n-gram Jaccard via inverted-index self-join, and the scale
  * path — MinHash + LSH banding (candidate generation is linear in
  * corpus size instead of quadratic; only banded collisions join).
  */
object DedupOps extends QueryPack {

  /** Distinct (doc_id, 3-gram shingle) pairs. Documents shorter than
    * 3 tokens have no shingles: without the size guard,
    * `sequence(0, size(t) - 3)` on a 1-2-token doc produces a
    * DESCENDING sequence whose null shingles would survive into the
    * per-doc counts (diverging from the oracle's empty
    * `range(1, len(t) - 1)`).
    */
  private def shingles(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
      .where(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))"))
        .as("s"))
      .where(col("s").isNotNull)
      .distinct()
      // the (doc_id, shingle) table is the shared INPUT INDEX of the
      // whole dedup family: d05 alone references it six times (sizes,
      // rarity ranks, both candidate sides, both verify sides), each
      // reference otherwise re-running the explode + DISTINCT shuffle.
      // cache() materializes it once — and because Spark's CacheManager
      // dedups by canonicalized plan, every operator in the family
      // shares the one copy (the DataFrame analog of building the
      // inverted index once; MEMORY_AND_DISK, so at 100 TB it spills
      // rather than evicting the hot working set)
      .cache()

  /** Exact verification of candidate pairs against the full shingle
    * sets: |A∩B| / (|A| + |B| − |A∩B|). Shared by every candidate
    * generator (inverted index, LSH bands, prefix filter).
    */
  private def verifyPairs(sh: DataFrame, cand: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    cand
      .join(sh.select(col("doc_id").as("da"), col("s")), "da")
      .join(sh.select(col("doc_id").as("db"), col("s")), Seq("db", "s"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .select(col("da"), col("db"), col("inter"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter"))).as("jaccard"))
  }

  /** Exact pairwise Jaccard via the inverted-index self-join (pairs
    * only materialize for docs sharing ≥1 shingle) — the exact
    * BASELINE: the intersection count falls directly out of the
    * self-join (one aggregation, no candidate re-join). Simple and
    * fast on unskewed corpora; hot shingles make it quadratic (the
    * prefix-filtered d05 is the skew-safe exact route; MinHash d03
    * the approximate one).
    */
  private def jaccardPairs(s: SparkSession, d: String,
      sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("da"), col("s"))
    val b = sh.select(col("doc_id").as("db"), col("s"))
    a.join(b, "s").where(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .select(col("da"), col("db"), col("inter"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter"))).as("jaccard"))
  }

  /** Exact pairwise Jaccard via PREFIX FILTERING (the AllPairs/PPJoin
    * family): under a global rarity order (document frequency, then
    * shingle), any pair with Jaccard ≥ t must share a shingle inside
    * BOTH docs' prefixes of length n − ceil(t·n) + 1 — so candidate
    * generation joins only the rare prefix shingles instead of the
    * full inverted index. This is the exact-join answer to hot-shingle
    * skew at 100 TB: frequent shingles sort to the END of the order
    * and rarely enter any prefix, while plain inverted-index self-
    * joins go quadratic on exactly those. Candidates verify against
    * the full sets — results at or above the threshold are identical
    * to the baseline (the prefix-filter completeness theorem), which
    * is why d05 shares d02's DuckDB oracle.
    */
  private def prefixFilteredPairs(s: SparkSession, d: String,
      sh: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val byRarity = sh
      .join(sizes, "doc_id")
      .join(sh.groupBy(col("s")).agg(count(lit(1)).as("df")), "s")
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("s"))
    val prefixes = byRarity
      .withColumn("rk", row_number().over(w))
      // minOverlap = ceil(t·n); epsilon guards the fp product when
      // t·n is mathematically integral
      .where(col("rk") <=
        col("n") - ceil(col("n") * threshold - 1e-9) + 1)
      .select(col("doc_id"), col("s"))
    val cand = prefixes.select(col("doc_id").as("da"), col("s"))
      .join(prefixes.select(col("doc_id").as("db"), col("s")), "s")
      .where(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()
    verifyPairs(sh, cand)
  }

  /** MinHash signatures banded for LSH (d03's machinery, shared with
    * the asymmetric d10): 32 affine permutations over a 31-bit
    * md5-derived shingle hash, 8 bands × 4 rows →
    * (doc_id, band, bh) collision keys.
    */
  private def bandedSignatures(sh: DataFrame): DataFrame = {
    val numPerm = 32; val bands = 8; val rowsPerBand = numPerm / bands
    val P = 2147483647L // 2^31 - 1 (prime)
    def aC(i: Int) = (1103515245L * (i + 1) + 12345L) % P
    def cC(i: Int) = (69069L * (i + 1) + 54321L) % P
    val shb = sh.withColumn("bm",
      pmod(conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long"),
        lit(P)))
    val minCols = (0 until numPerm).map(i =>
      min(pmod(lit(aC(i)) * col("bm") + lit(cC(i)), lit(P))).as(s"m$i"))
    val sigs = shb.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r =>
        col(s"m${b * rowsPerBand + r}").cast("string"))
      struct(lit(b).as("band"), md5(concat_ws("_", slice: _*)).as("bh"))
        .as(s"b$b")
    }
    sigs.select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"),
        explode(array((0 until bands).map(b => col(s"b$b")): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bh").as("bh"))
  }

  /** Pairs at or above a Jaccard threshold — shared with the
    * cluster-resolution operators in [[PipelineOps]].
    */
  private[operators] def jaccardPairsAt(s: SparkSession, d: String,
      threshold: Double): DataFrame =
    jaccardPairs(s, d, shingles(s, d))
      .filter(col("jaccard") >= threshold)

  private val duckShingles =
    "WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents), " +
      "sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s " +
      "FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)), " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), " +
      "pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter " +
      "FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2) "

  val all: Seq[Q] = Seq(

    // Exact dedup: content-hash groupBy; keeper = min doc_id per hash
    // (the content-addressed chunk-store dedup of the reference —
    // SHA-1-keyed idempotent writes, hbase.clj:151-153 — as a groupBy).
    Q("d01_dedup_exact",
      Some("SELECT h, min(doc_id) AS keep_id, count(*) AS n_copies FROM " +
        "(SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h " +
        "FROM documents) GROUP BY h"),
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"),
          md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("h"))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))),

    // Exact n-gram Jaccard near-dup pairs (threshold 0.6).
    Q("d02_ngram_jaccard",
      Some(duckShingles +
        "SELECT da, db, inter, inter::DOUBLE / (x.n + y.n - inter) AS jaccard " +
        "FROM pairs JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id " +
        "WHERE inter::DOUBLE / (x.n + y.n - inter) >= 0.6"),
      (s, d) => jaccardPairs(s, d, shingles(s, d))
        .filter(col("jaccard") >= 0.6)),

    // The skew-safe EXACT route: prefix-filtered candidates + exact
    // verify. Shares d02's oracle — completeness of prefix filtering
    // is hash-checked, not assumed.
    Q("d05_jaccard_prefix",
      Some(duckShingles +
        "SELECT da, db, inter, inter::DOUBLE / (x.n + y.n - inter) AS jaccard " +
        "FROM pairs JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id " +
        "WHERE inter::DOUBLE / (x.n + y.n - inter) >= 0.6"),
      (s, d) => prefixFilteredPairs(s, d, shingles(s, d), 0.6)
        .filter(col("jaccard") >= 0.6)),

    // Directed containment (|A∩B| / |A| ≥ 0.7): the asymmetric twin
    // of d02 — catches documents SUBSUMED by larger ones (quotes,
    // excerpts, boilerplate-wrapped copies), which symmetric Jaccard
    // misses when |B| ≫ |A| dilutes the union. Same inverted-index
    // self-join (pairs only materialize on shared shingles); both
    // directions emit, since containment is not symmetric.
    Q("d07_containment",
      Some("WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s " +
        "FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)), " +
        "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), " +
        "pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter " +
        "FROM sh a JOIN sh b USING (s) WHERE a.doc_id <> b.doc_id GROUP BY 1, 2) " +
        "SELECT da, db, inter, inter::DOUBLE / x.n AS containment " +
        "FROM pairs JOIN sizes x ON da = x.doc_id " +
        "WHERE inter::DOUBLE / x.n >= 0.7"),
      (s, d) => {
        val sh = shingles(s, d)
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        sh.select(col("doc_id").as("da"), col("s"))
          .join(sh.select(col("doc_id").as("db"), col("s")), "s")
          .where(col("da") =!= col("db"))
          .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("doc_id").as("da"), col("n")), "da")
          .select(col("da"), col("db"), col("inter"),
            (col("inter").cast("double") / col("n")).as("containment"))
          .filter(col("containment") >= 0.7)
      }),

    // MinHash + LSH banding: 32 affine permutations
    // h_i(x) = (a_i·x + c_i) mod p over a 31-bit md5-derived shingle
    // hash (p = 2^31−1, products stay < 2^62 — overflow-free in any
    // engine), 8 bands × 4 rows; candidates = banded collisions only,
    // then exact Jaccard verification restricted to candidates. At
    // 100 TB this replaces the quadratic self-join: signatures are one
    // narrow pass (ONE md5 per shingle, the 32 perms are two integer
    // ops each), the band join touches only colliding buckets. Every
    // step is engine-agnostic arithmetic (Spark md5 == DuckDB md5), so
    // the WHOLE probabilistic pipeline — signatures, banding, collision
    // join, verification — is hash-gated against a DuckDB replay, not
    // just recall-gated.
    Q("d03_minhash_lsh",
      Some(duckShingles + // unreferenced `pairs` CTE is optimized away
        ", shb AS (SELECT doc_id, s, " +
        "(('0x' || substr(md5(s), 1, 8))::BIGINT) % 2147483647 AS bm FROM sh), " +
        "perms AS (SELECT i, (1103515245 * (i + 1) + 12345) % 2147483647 AS a, " +
        "(69069 * (i + 1) + 54321) % 2147483647 AS c " +
        "FROM UNNEST(range(32)) AS t(i)), " +
        "sigs AS (SELECT doc_id, i, min((a * bm + c) % 2147483647) AS mh " +
        "FROM shb, perms GROUP BY doc_id, i), " +
        "bands AS (SELECT doc_id, i // 4 AS band, " +
        "md5(string_agg(CAST(mh AS VARCHAR), '_' ORDER BY i)) AS bh " +
        "FROM sigs GROUP BY doc_id, i // 4), " +
        "cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db " +
        "FROM bands x JOIN bands y USING (band, bh) " +
        "WHERE x.doc_id < y.doc_id), " +
        "cinter AS (SELECT c.da, c.db, count(*) AS inter FROM cand c " +
        "JOIN sh a ON a.doc_id = c.da JOIN sh b ON b.doc_id = c.db " +
        "AND b.s = a.s GROUP BY 1, 2) " +
        "SELECT da, db, inter, " +
        "inter::DOUBLE / (x.n + y.n - inter) AS jaccard FROM cinter " +
        "JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id " +
        "WHERE inter::DOUBLE / (x.n + y.n - inter) >= 0.6"),
      (s, d) => {
      val sh = shingles(s, d)
      val banded = bandedSignatures(sh)
      val cand = banded.as("x").join(banded.as("y"), Seq("band", "bh"))
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
        .distinct()
      // exact verification on candidates only — linear in |candidates|
      // × shingles-per-doc, never all-pairs
      verifyPairs(sh, cand).filter(col("jaccard") >= 0.6)
    }),

    // Bloom-filter decontamination — the scale path when the benchmark
    // shingle set is itself too large to broadcast raw. Build a Bloom
    // sketch of the benchmark shingles DISTRIBUTED with Spark's native
    // BloomFilterAggregate (map-side partials over codegen'd xxhash64
    // keys; ~1.2 MB per 1e6 items at 1% fpp where the raw strings are
    // GBs), embed it as a literal, and pre-filter the train side with
    // the codegen'd BloomFilterMightContain scan filter — no join, no
    // shuffle. Only bloom-positive shingles (true overlaps + ~fpp of
    // the rest) reach the exact semi-join verify, so the result is
    // EXACT — false positives die in the verify — while the shuffle
    // is proportional to the contamination, not the corpus.
    Q("d08_bloom_decontaminate",
      Some("WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t " +
        "FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s " +
        "FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3), " +
        "bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 19 = 3), " +
        "train AS (SELECT * FROM sh WHERE doc_id % 19 <> 3), " +
        "sizes AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY 1), " +
        "ov AS (SELECT doc_id, count(*) AS n_overlap FROM train " +
        "WHERE s IN (SELECT s FROM bench) GROUP BY 1) " +
        "SELECT doc_id, n_shingles, n_overlap, " +
        "n_overlap::DOUBLE / n_shingles AS overlap_frac " +
        "FROM ov JOIN sizes USING (doc_id) " +
        "WHERE n_overlap::DOUBLE / n_shingles >= 0.1"),
      (s, d) => {
        import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        val sh = shingles(s, d)
        val isBench = pmod(col("doc_id"), lit(19)) === 3
        val bench = sh.where(isBench).select(col("s")).distinct()
        // distributed sketch build: one compact binary comes back
        val bloomBytes = bench
          .agg(column(new BloomFilterAggregate(
            expression(xxhash64(col("s"))), 1000000L)
            .toAggregateExpression()).as("bf"))
          .head().getAs[Array[Byte]](0)
        require(bloomBytes.length < (4 << 20),
          s"bloom sketch must stay broadcast-small: ${bloomBytes.length}B")
        val train = sh.where(!isBench)
        val sizes = train.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"))
        val candidates = train.where(column(BloomFilterMightContain(
          Literal.create(bloomBytes),
          expression(xxhash64(col("s"))))))
        val out = candidates
          .join(broadcast(bench), Seq("s"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
          .join(sizes, "doc_id")
          .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
            (col("n_overlap").cast("double") / col("n_shingles"))
              .as("overlap_frac"))
          .where(col("overlap_frac") >= 0.1)
        require(out.queryExecution.executedPlan.toString
          .contains("might_contain"),
          "bloom pre-filter must run as the codegen'd scan filter")
        out
      }),

    // Benchmark decontamination: flag training docs sharing too many
    // distinct 3-gram shingles with a (deterministic) benchmark split
    // — the standard pre-training hygiene step. Scale shape: the
    // benchmark shingle set is tiny relative to the corpus (a test
    // suite, not 100 TB), so the semi join broadcasts it; the train
    // side stays a narrow linear scan. Never all-pairs.
    Q("d06_decontaminate",
      Some("WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t " +
        "FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s " +
        "FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3), " +
        "bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 19 = 3), " +
        "train AS (SELECT * FROM sh WHERE doc_id % 19 <> 3), " +
        "sizes AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY 1), " +
        "ov AS (SELECT doc_id, count(*) AS n_overlap FROM train " +
        "WHERE s IN (SELECT s FROM bench) GROUP BY 1) " +
        "SELECT doc_id, n_shingles, n_overlap, " +
        "n_overlap::DOUBLE / n_shingles AS overlap_frac " +
        "FROM ov JOIN sizes USING (doc_id) " +
        "WHERE n_overlap::DOUBLE / n_shingles >= 0.2"),
      (s, d) => {
        val sh = shingles(s, d)
        val isBench = pmod(col("doc_id"), lit(19)) === 3
        val bench = sh.where(isBench).select(col("s")).distinct()
        val train = sh.where(!isBench)
        val sizes = train.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"))
        train
          .join(broadcast(bench), Seq("s"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
          .join(sizes, "doc_id")
          .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
            (col("n_overlap").cast("double") / col("n_shingles"))
              .as("overlap_frac"))
          .where(col("overlap_frac") >= 0.2)
      }),

    // SimHash near-dup: 64-bit signature = sign of per-bit vote sums
    // over 60-bit md5-derived token hashes (the top 4 bits are always
    // 0 — dead bits that vote −1 everywhere, identically in both
    // engines); banding the 64 bits into 4 x 16-bit keys makes
    // candidate generation a bucket join (hamming-close signatures
    // collide in >= 1 band with high probability); candidates verified
    // by exact hamming distance <= 2. The md5 hash family makes the
    // whole pipeline — votes, signature, banding, hamming — replayable
    // in DuckDB, so d04 is hash-gated end to end (QueryPackSpec
    // additionally checks agreement with exact d02).
    Q("d04_simhash",
      Some("WITH tokh AS (SELECT doc_id, " +
        "('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM " +
        "(SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w " +
        "FROM documents)), " +
        "votes AS (SELECT doc_id, b, CASE WHEN " +
        "sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0 " +
        "THEN (1::BIGINT << b) ELSE 0 END AS bit " +
        "FROM tokh, UNNEST(range(64)) AS t(b) GROUP BY doc_id, b), " +
        "sigs AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS sig " +
        "FROM votes GROUP BY doc_id), " +
        "banded AS (SELECT doc_id, sig, b AS band, " +
        "(sig >> CAST(b * 16 AS INTEGER)) & 65535 AS bkey " +
        "FROM sigs, UNNEST(range(4)) AS t(b)), " +
        "cand AS (SELECT DISTINCT x.doc_id AS da, x.sig AS sa, " +
        "y.doc_id AS db, y.sig AS sb FROM banded x " +
        "JOIN banded y USING (band, bkey) WHERE x.doc_id < y.doc_id) " +
        "SELECT da, db, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming " +
        "FROM cand WHERE bit_count(xor(sa, sb)) <= 2"),
      (s, d) => {
      val toks = Tables.load(s, d, "documents")
        .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("w"))
        .select(col("doc_id"),
          conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h"))
      // typed Aggregator UDAF: one narrow vote-array buffer, built
      // map-side (partial+final), vs. 64 separate SUM columns
      val simhash = udaf(graft.functions.SimHashAggregator)
      val sigs = toks.groupBy(col("doc_id"))
        .agg(simhash(col("h")).as("sig"))
      val bands = 4
      val banded = sigs.select(col("doc_id"), col("sig"), posexplode(
        array((0 until bands).map(b =>
          expr(s"(sig >> ${b * 16}) & 65535")): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
      val cand = banded.as("x").join(banded.as("y"), Seq("band", "bkey"))
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("x.sig").as("sa"),
          col("y.doc_id").as("db"), col("y.sig").as("sb"))
        .dropDuplicates("da", "db")
      cand.select(col("da"), col("db"),
          expr("bit_count(sa ^ sb)").cast("long").as("hamming"))
        .where(col("hamming") <= 2)
    }),

    // Substring-level duplication (the ExactSubstr pass of
    // "Deduplicating Training Data Makes Language Models Better",
    // Lee et al. 2021, at token-window granularity): a 5-token window
    // is "duplicated" when the identical window occurs in >= 2
    // distinct docs; per doc we report how much of it is duplicated
    // text and the LONGEST contiguous duplicated span (consecutive
    // duplicated window positions, gaps-and-islands over pos). This
    // is what suffix-array dedup measures, restated as two shuffles:
    // one keyed on the window string (corpus document frequency —
    // linear, never all-pairs) and one per-doc window aggregation.
    // At 100 TB the DF table keyed by 5-gram is the same inverted
    // index every shingle pass here builds; runs fold per-doc, so no
    // row ever carries more than (id, 5 tokens).
    Q("d09_substring_dup",
      Some("WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t " +
        "FROM documents), " +
        "w AS (SELECT doc_id, i - 1 AS pos, " +
        "t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS w " +
        "FROM toks, UNNEST(range(1, len(t) - 3)) AS u(i) WHERE len(t) >= 5), " +
        "df AS (SELECT w, count(DISTINCT doc_id) AS nd FROM w GROUP BY 1), " +
        "d AS (SELECT doc_id, pos, nd >= 2 AS dup FROM w JOIN df USING (w)), " +
        "tot AS (SELECT doc_id, count(*) AS n_windows, " +
        "count(*) FILTER (WHERE dup) AS n_dup FROM d GROUP BY 1), " +
        "isl AS (SELECT doc_id, pos - row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY pos) AS g FROM d WHERE dup), " +
        "runs AS (SELECT doc_id, count(*) AS run FROM isl GROUP BY doc_id, g), " +
        "mx AS (SELECT doc_id, max(run) AS mr FROM runs GROUP BY 1) " +
        "SELECT doc_id, n_windows, n_dup, coalesce(mr, 0) AS max_run, " +
        "CASE WHEN coalesce(mr, 0) > 0 THEN coalesce(mr, 0) + 4 ELSE 0 END " +
        "AS dup_span_tokens FROM tot LEFT JOIN mx USING (doc_id)"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val win = Tables.load(s, d, "documents")
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .where(size(col("t")) >= 5)
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(0, size(t) - 5), i -> " +
              "concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))")))
          .withColumnRenamed("col", "w")
        val df = win.groupBy(col("w"))
          .agg(countDistinct(col("doc_id")).as("nd"))
        val marked = win.join(df, "w")
          .select(col("doc_id"), col("pos"), (col("nd") >= 2).as("dup"))
        val tot = marked.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_windows"),
            count(when(col("dup"), lit(1))).as("n_dup"))
        val w1 = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val mx = marked.where(col("dup"))
          .withColumn("g", col("pos") - row_number().over(w1))
          .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("run"))
          .groupBy(col("doc_id")).agg(max(col("run")).as("mr"))
        tot.join(mx, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_windows"), col("n_dup"),
            coalesce(col("mr"), lit(0L)).as("max_run"),
            when(coalesce(col("mr"), lit(0L)) > 0,
              coalesce(col("mr"), lit(0L)) + 4)
              .otherwise(lit(0L)).as("dup_span_tokens"))
      }),

    // INCREMENTAL dedup: a new crawl batch (doc_id % 5 = 0) dedups
    // AGAINST the existing corpus without re-deduping the corpus —
    // the band join is ASYMMETRIC (new × old collisions only; never
    // old × old, never new × new), so each ingest costs O(batch
    // signatures + collisions), not O(corpus²). At 100 TB the
    // corpus-side (doc_id, band, bh) keys are exactly what t18-style
    // persistence would store; the math here is d03's banding
    // verbatim, and the drop-list (each new doc's best corpus match
    // at Jaccard ≥ 0.6) replays bit-identically in the oracle.
    Q("d10_incremental_dedup",
      Some(duckShingles +
        ", shb AS (SELECT doc_id, s, " +
        "(('0x' || substr(md5(s), 1, 8))::BIGINT) % 2147483647 AS bm FROM sh), " +
        "perms AS (SELECT i, (1103515245 * (i + 1) + 12345) % 2147483647 AS a, " +
        "(69069 * (i + 1) + 54321) % 2147483647 AS c " +
        "FROM UNNEST(range(32)) AS t(i)), " +
        "sigs AS (SELECT doc_id, i, min((a * bm + c) % 2147483647) AS mh " +
        "FROM shb, perms GROUP BY doc_id, i), " +
        "bands AS (SELECT doc_id, i // 4 AS band, " +
        "md5(string_agg(CAST(mh AS VARCHAR), '_' ORDER BY i)) AS bh " +
        "FROM sigs GROUP BY doc_id, i // 4), " +
        "cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db " +
        "FROM bands x JOIN bands y USING (band, bh) " +
        "WHERE x.doc_id % 5 = 0 AND y.doc_id % 5 <> 0), " +
        "cinter AS (SELECT c.da, c.db, count(*) AS inter FROM cand c " +
        "JOIN sh a ON a.doc_id = c.da JOIN sh b ON b.doc_id = c.db " +
        "AND b.s = a.s GROUP BY 1, 2), " +
        "j AS (SELECT da, db, " +
        "inter::DOUBLE / (x.n + y.n - inter) AS jaccard FROM cinter " +
        "JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id " +
        "WHERE inter::DOUBLE / (x.n + y.n - inter) >= 0.6) " +
        "SELECT da AS new_id, db AS dup_of, jaccard FROM (" +
        "SELECT da, db, jaccard, row_number() OVER (PARTITION BY da " +
        "ORDER BY jaccard DESC, db) AS rn FROM j) WHERE rn = 1"),
      (s, d) => {
        val sh = shingles(s, d)
        val banded = bandedSignatures(sh)
        val cand = banded.as("x").join(banded.as("y"), Seq("band", "bh"))
          .where(col("x.doc_id") % 5 === 0 && col("y.doc_id") % 5 =!= 0)
          .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
          .distinct()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("da"))
          .orderBy(col("jaccard").desc, col("db"))
        verifyPairs(sh, cand).filter(col("jaccard") >= 0.6)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("da").as("new_id"), col("db").as("dup_of"),
            col("jaccard"))
      })
  )
}
