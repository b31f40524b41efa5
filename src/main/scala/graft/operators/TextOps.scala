package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table: token counting, quality scoring, language-ID
  * heuristic, document fingerprinting. All are per-row narrow
  * transformations — no shuffle, fully codegen'd, trivially scale-out
  * (each of the 100 TB's partitions is independent).
  */
object TextOps extends QueryPack {

  /** The BM25 DuckDB oracle over the `n` most frequent corpus terms —
    * t15 gates at n=3; [[TextIndexOps]]'s persisted variant (t18/t19)
    * and the streaming maintenance flow (st17) gate at n=5 (the
    * multi-term retrieval case), all landing on the same full-corpus
    * answer their engines compute.
    */
  private[graft] def bm25OracleSqlN(n: Int): String = {
    val pivot = (1 to n).map(i =>
      s"coalesce(sum(CASE WHEN rk = $i THEN c END), 0)").mkString(" + ")
    "WITH toks AS (SELECT doc_id, " +
      "unnest(string_split(trim(text), ' ')) AS tok FROM documents), " +
      "q AS (SELECT tok, row_number() OVER (ORDER BY count(*) DESC, " +
      "tok) AS rk FROM toks GROUP BY tok " +
      s"ORDER BY count(*) DESC, tok LIMIT $n), " +
      "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1), " +
      "st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl), " +
      "tf AS (SELECT doc_id, tok, rk, count(*) AS tf FROM toks " +
      "JOIN q USING (tok) GROUP BY 1, 2, 3), " +
      "dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1), " +
      "c AS (SELECT doc_id, rk, " +
      "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * 2.2) / " +
      "(tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS c " +
      "FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id) " +
      "CROSS JOIN st), " +
      s"sc AS (SELECT doc_id, round($pivot, 6) AS score " +
      "FROM c GROUP BY 1) " +
      "SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id " +
      "LIMIT 20"
  }

  /** t15's oracle — the 3-term instance of [[bm25OracleSqlN]]. */
  private[graft] val bm25OracleSql: String = bm25OracleSqlN(3)

  /** The BM25 scoring tail shared by t15 (inline) and t18 (persisted
    * index): one expression, so the two surfaces cannot drift. Inputs:
    * tf (doc_id, tok, rk, tf), dfreq (tok, df), dl (doc_id, dl),
    * stats (n_docs, avgdl); ranks run 1..`nRanks` (one per query
    * term). Per-term contributions sum in FIXED rank order (each
    * pivot sum folds <= 1 element, so only the final left-to-right
    * c1 + ... + cN ordering matters), the score rounds to 6 places —
    * the determinism contract the DuckDB oracle replays at any N.
    */
  private[operators] def bm25Tail(tf: DataFrame, dfreq: DataFrame,
      dl: DataFrame, stats: DataFrame, nRanks: Int = 3): DataFrame = {
    require(nRanks >= 1, "bm25Tail needs at least one query term")
    val pivots = (1 to nRanks).map(i =>
      sum(when(col("rk") === i, col("c"))).as(s"c$i"))
    tf.join(broadcast(dfreq), "tok").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("rk"),
        (log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          .as("c"))
      .groupBy(col("doc_id"))
      .agg(pivots.head, pivots.tail: _*)
      .select(col("doc_id"),
        round((1 to nRanks).map(i => coalesce(col(s"c$i"), lit(0.0)))
          .reduce(_ + _), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(20)
  }

  private val stopwords =
    Seq("the", "a", "an", "and", "of", "to", "in", "is")
  private def inList(xs: Seq[String]) =
    xs.map(w => s"'$w'").mkString("(", ", ", ")")

  /** RE2-compatible redaction patterns (shared by the Spark plan and
    * the DuckDB oracle of t12 — one definition so they cannot drift;
    * no backrefs/lookaround, so Java regex and RE2 agree).
    */
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\b\\d{3}-\\d{4}\\b"
  private val IpRe = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"

  val all: Seq[Q] = Seq(

    // Token counting: whitespace tokens + a BPE-ish regex segmentation
    // (word pieces / digit runs / single punctuation marks).
    Q("t01_token_count",
      Some("SELECT doc_id, " +
        "len(regexp_split_to_array(trim(text), '\\s+')) AS n_ws_tokens, " +
        "len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens, " +
        "length(text) AS n_chars_m FROM documents"),
      (s, d) => Tables.load(s, d, "documents").select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long")
          .as("n_ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")
          .as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars_m"))),

    // Quality scoring: stopword ratio, punctuation ratio, mean word
    // length, length-capped composite score.
    Q("t02_quality_score",
      Some("SELECT doc_id, n_tokens, " +
        "CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio, " +
        "CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio, " +
        "CAST(n_alpha AS DOUBLE) / n_tokens AS avg_word_len, " +
        "round(0.5 * (CAST(n_stop AS DOUBLE) / n_tokens) " +
        " + 0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0), 6) AS quality " +
        "FROM (SELECT doc_id, length(text) AS n_chars, " +
        " len(string_split(trim(text), ' ')) AS n_tokens, " +
        " len(list_filter(string_split(trim(text), ' '), " +
        s"   w -> w IN ${inList(stopwords)})) AS n_stop, " +
        " length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct, " +
        " length(replace(text, ' ', '')) AS n_alpha FROM documents)"),
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"),
          length(col("text")).as("n_chars"),
          size(split(trim(col("text")), " ", -1)).as("n_tokens"),
          expr("size(filter(split(trim(text), ' '), " +
            s"w -> w IN ${inList(stopwords)}))").as("n_stop"),
          length(regexp_replace(col("text"), "[^.!?,;:]", "")).as("n_punct"),
          length(regexp_replace(col("text"), " ", "")).as("n_alpha"))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
          (col("n_punct").cast("double") / col("n_chars")).as("punct_ratio"),
          (col("n_alpha").cast("double") / col("n_tokens")).as("avg_word_len"),
          round(lit(0.5) * (col("n_stop").cast("double") / col("n_tokens"))
            + lit(0.5) * least(lit(1.0),
              col("n_tokens").cast("double") / lit(100.0)), 6)
            .as("quality"))),

    // Language-ID n-gram/marker-word heuristic: count per-language marker
    // tokens, argmax with a fixed tie-break order.
    Q("t03_lang_id", {
      val profiles = Seq(
        "en" -> Seq("the", "a", "and", "of", "is"),
        "es" -> Seq("el", "la", "los", "de", "y"),
        "fr" -> Seq("le", "les", "des", "et", "une"),
        "de" -> Seq("der", "die", "das", "und", "nicht"))
      val duckCounts = profiles.map { case (l, ws) =>
        s"len(list_filter(toks, w -> w IN ${inList(ws)})) AS c_$l"
      }.mkString(", ")
      val pred = "CASE WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_de THEN 'en' " +
        "WHEN c_es >= c_fr AND c_es >= c_de THEN 'es' " +
        "WHEN c_fr >= c_de THEN 'fr' ELSE 'de' END AS predicted_lang"
      Some("SELECT doc_id, c_en, c_es, c_fr, c_de, " + pred +
        " FROM (SELECT doc_id, " + duckCounts +
        " FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents))")
    },
      (s, d) => {
        val profiles = Seq(
          "en" -> Seq("the", "a", "and", "of", "is"),
          "es" -> Seq("el", "la", "los", "de", "y"),
          "fr" -> Seq("le", "les", "des", "et", "une"),
          "de" -> Seq("der", "die", "das", "und", "nicht"))
        val base = Tables.load(s, d, "documents")
          .select(col("doc_id"), split(trim(col("text")), " ").as("toks"))
        val withCounts = profiles.foldLeft(base) { case (df, (l, ws)) =>
          df.withColumn(s"c_$l",
            expr(s"size(filter(toks, w -> w IN ${inList(ws)}))"))
        }
        withCounts.select(col("doc_id"),
          col("c_en").cast("long").as("c_en"),
          col("c_es").cast("long").as("c_es"),
          col("c_fr").cast("long").as("c_fr"),
          col("c_de").cast("long").as("c_de"),
          expr("CASE WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_de THEN 'en' " +
            "WHEN c_es >= c_fr AND c_es >= c_de THEN 'es' " +
            "WHEN c_fr >= c_de THEN 'fr' ELSE 'de' END").as("predicted_lang"))
      }),

    // Document fingerprinting: whitespace-normalized content hash (md5
    // full + 64-bit prefix). The content-addressed-chunk idea of the
    // reference store (SHA-1 ids, hbase_test.clj:177) applied to text.
    Q("t04_fingerprint",
      Some("SELECT doc_id, md5(norm) AS fp_md5, " +
        "substring(md5(norm), 1, 16) AS fp64 FROM (SELECT doc_id, " +
        "lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm " +
        "FROM documents)"),
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"),
          lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("norm"))
        .select(col("doc_id"), md5(col("norm")).as("fp_md5"),
          substring(md5(col("norm")), 1, 16).as("fp64"))),

    // Rolling polynomial hash fingerprint (base-31 fold over the
    // normalized character stream, mod 1e15 to stay in exact-integer
    // range in both engines) — the order-sensitive complement to the
    // md5 content hash.
    Q("t05_rolling_hash",
      Some("SELECT doc_id, list_reduce(" +
        "list_prepend('0', string_split(norm, '')), " +
        "(acc, c) -> ((acc::BIGINT * 31 + ord(c)) % 1000000000000000)::VARCHAR" +
        ")::BIGINT AS fp_roll " +
        "FROM (SELECT doc_id, " +
        "lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm " +
        "FROM documents)"),
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"),
          lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("norm"))
        .select(col("doc_id"),
          expr("aggregate(split(norm, ''), cast(0 as bigint), " +
            "(acc, c) -> (acc * 31 + ascii(c)) % 1000000000000000)")
            .as("fp_roll"))),

    // GPT-style pre-tokenization count: letter runs, digit runs, and
    // single non-alphanumeric marks, via regexp_extract_all on both
    // engines (pattern stays in the Java-regex ∩ RE2 subset).
    Q("t07_pretokenize",
      Some("SELECT lang, CAST(SUM(len(regexp_extract_all(text, " +
        "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT) AS n_pretok, " +
        "COUNT(*) AS n_docs FROM documents GROUP BY 1"),
      (s, d) => Tables.load(s, d, "documents")
        .groupBy(col("lang"))
        .agg(sum(size(expr(
          "regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)")))
          .as("n_pretok"), count(lit(1)).as("n_docs"))),

    // Within-document repetition: 1 − distinct/total 3-grams — the
    // boilerplate/loop-generated-text signal quality filters cut on.
    // A narrow per-doc map+agg, shuffle only on doc_id.
    Q("t06_repetition",
      Some("WITH sh AS (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s " +
        "FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents), " +
        "UNNEST(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3) " +
        "SELECT doc_id, count(*) AS n_grams, " +
        "count(DISTINCT s) AS n_distinct, " +
        "1 - count(DISTINCT s)::DOUBLE / count(*) AS rep_ratio " +
        "FROM sh GROUP BY doc_id"),
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
        .where(size(col("t")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t) - 3), " +
            "i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).as("s"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          countDistinct(col("s")).as("n_distinct"))
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
          (lit(1) - col("n_distinct").cast("double") / col("n_grams"))
            .as("rep_ratio"))),

    // Corpus-level bigram top-k — the n-gram index builder's core
    // (contamination indexes, collocation stats). Map-side partial
    // aggregation absorbs the explosion; the final top-k is
    // TakeOrderedAndProject, never a global sort: at 100 TB the
    // shuffle carries one row per DISTINCT bigram, not per occurrence.
    Q("t08_ngram_counts",
      Some("WITH toks AS (SELECT string_split(trim(text), ' ') AS w " +
        "FROM documents), grams AS (SELECT w[i] || ' ' || w[i+1] AS bigram " +
        "FROM toks, UNNEST(range(1, len(w))) AS u(i) WHERE len(w) >= 2) " +
        "SELECT bigram, COUNT(*) AS n FROM grams GROUP BY 1 " +
        "ORDER BY n DESC, bigram LIMIT 20"),
      (s, d) => Tables.load(s, d, "documents")
        .select(split(trim(col("text")), " ").as("w"))
        .where(size(col("w")) >= 2)
        .select(explode(expr(
          "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), " +
            "(a, b) -> concat(a, ' ', b))")).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram")).limit(20)),

    // Cross-document duplicated-n-gram fraction (the Gopher-style
    // repetition signal at corpus scale): for each doc, the fraction
    // of its distinct trigrams that also occur in at least one OTHER
    // doc. Complements t06 (within-doc repetition) and d06 (overlap
    // vs a benchmark set). Scale shape: the gram→doc-count side
    // shuffles one row per DISTINCT trigram and the join back is
    // keyed on the gram, so cost is linear in distinct (doc, gram)
    // pairs — no all-pairs comparison anywhere.
    Q("t10_dup_ngram_frac",
      Some("WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t " +
        "FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s " +
        "FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3), " +
        "df AS (SELECT s, count(*) AS n_docs FROM sh GROUP BY 1) " +
        "SELECT doc_id, count(*) AS n_grams, " +
        "count(*) FILTER (WHERE n_docs >= 2) AS n_shared, " +
        "count(*) FILTER (WHERE n_docs >= 2)::DOUBLE / count(*) AS dup_frac " +
        "FROM sh JOIN df USING (s) GROUP BY 1"),
      (s, d) => {
        val sh = Tables.load(s, d, "documents")
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .where(size(col("t")) >= 3)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(t) - 3), " +
              "i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).as("s"))
          .distinct()
        val perGram = sh.groupBy(col("s")).agg(count(lit(1)).as("n_docs"))
        sh.join(perGram, "s")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            count(when(col("n_docs") >= 2, lit(1))).as("n_shared"))
          .select(col("doc_id"), col("n_grams"), col("n_shared"),
            (col("n_shared").cast("double") / col("n_grams"))
              .as("dup_frac"))
      }),

    // Per-source distinctive terms: TF-IDF-style top-5, with the idf
    // factor as a plain ratio (n_docs / doc_df) instead of a log so
    // the score is two IEEE ops — bit-identical across engines, which
    // keeps the ranking (and the hash gate) deterministic. Two-level
    // aggregate + broadcast scalar + bounded per-source window: the
    // widest shuffle carries one row per distinct (source, term).
    Q("t11_distinctive_terms",
      Some("WITH toks AS (SELECT doc_id, source, " +
        "unnest(string_split(trim(text), ' ')) AS tok FROM documents), " +
        "tf AS (SELECT source, tok, count(*) AS tf FROM toks GROUP BY 1, 2), " +
        "dfreq AS (SELECT tok, count(DISTINCT doc_id) AS doc_df FROM toks GROUP BY 1), " +
        "nd AS (SELECT count(*) AS n_docs FROM documents), " +
        "scored AS (SELECT source, tok, tf, doc_df, " +
        "tf * (n_docs::DOUBLE / doc_df) AS score " +
        "FROM tf JOIN dfreq USING (tok) CROSS JOIN nd) " +
        "SELECT source, tok, tf, doc_df, round(score, 6) AS score " +
        "FROM (SELECT *, row_number() OVER (PARTITION BY source " +
        "ORDER BY score DESC, tok) AS rk FROM scored) WHERE rk <= 5"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, d, "documents")
        val toks = docs.select(col("doc_id"), col("source"),
          explode(split(trim(col("text")), " ")).as("tok"))
        val tf = toks.groupBy(col("source"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = toks.groupBy(col("tok"))
          .agg(countDistinct(col("doc_id")).as("doc_df"))
        val nd = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(dfreq, "tok").crossJoin(broadcast(nd))
          .select(col("source"), col("tok"), col("tf"), col("doc_df"),
            (col("tf") * (col("n_docs").cast("double") / col("doc_df")))
              .as("score"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("score").desc, col("tok"))
        scored.withColumn("rk", row_number().over(w))
          .where(col("rk") <= 5)
          .select(col("source"), col("tok"), col("tf"), col("doc_df"),
            round(col("score"), 6).as("score"))
      }),

    // Per-source vocabulary statistics: token count, type count,
    // type-token ratio — the mixing-weights sanity check a corpus
    // curator runs per source. countDistinct shuffles one row per
    // (source, type), not per token occurrence.
    Q("t09_vocab_stats",
      Some("WITH toks AS (SELECT source, " +
        "unnest(string_split(trim(text), ' ')) AS tok FROM documents) " +
        "SELECT source, COUNT(*) AS n_tokens, " +
        "COUNT(DISTINCT tok) AS n_types, " +
        "COUNT(DISTINCT tok)::DOUBLE / COUNT(*) AS ttr " +
        "FROM toks GROUP BY 1"),
      (s, d) => Tables.load(s, d, "documents")
        .select(col("source"),
          explode(split(trim(col("text")), " ")).as("tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("n_types"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          (col("n_types").cast("double") / col("n_tokens")).as("ttr"))),

    // PII-pattern redaction (the C4-style scrub pass): count and
    // replace email / phone / IPv4 patterns. The corpus is synthetic
    // word-salad, so the query first APPENDS a deterministic PII
    // suffix per doc (same expression in both engines) — the oracle
    // hash then proves each regex fired on every row rather than
    // trivially matching nothing. Pure per-row narrow map, zero
    // shuffle, codegen'd end-to-end — at 100 TB this runs at scan
    // speed on each partition independently. Regexes stay in the
    // RE2-compatible subset (no backrefs/lookaround) so Java and
    // DuckDB agree character-for-character.
    Q("t12_pii_scrub",
      Some("WITH synth AS (SELECT doc_id, " +
        "text || ' contact user' || doc_id || '@mail-' || source || " +
        "'.org call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || " +
        "' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || " +
        "CAST(doc_id % 100 AS VARCHAR) AS t FROM documents) " +
        "SELECT doc_id, " +
        s"len(regexp_extract_all(t, '$EmailRe')) AS n_email, " +
        s"len(regexp_extract_all(t, '$PhoneRe')) AS n_phone, " +
        s"len(regexp_extract_all(t, '$IpRe')) AS n_ip, " +
        "regexp_replace(regexp_replace(regexp_replace(t, " +
        s"'$EmailRe', '<EMAIL>', 'g'), " +
        s"'$PhoneRe', '<PHONE>', 'g'), " +
        s"'$IpRe', '<IP>', 'g') AS clean_text FROM synth"),
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"),
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"), lit("@mail-"), col("source"),
            lit(".org call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" from 10."), (col("doc_id") % 256).cast("string"),
            lit(".0."), (col("doc_id") % 100).cast("string")).as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(EmailRe), lit(0)))
            .cast("long").as("n_email"),
          size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0)))
            .cast("long").as("n_phone"),
          size(regexp_extract_all(col("t"), lit(IpRe), lit(0)))
            .cast("long").as("n_ip"),
          regexp_replace(regexp_replace(regexp_replace(col("t"),
            EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), IpRe, "<IP>")
            .as("clean_text"))),

    // Cross-document line-level dedup (the CCNet / RefinedWeb
    // boilerplate pass): drop every line occurring in >= 3 distinct
    // docs, reassemble the survivors in order. "Lines" are fixed
    // 3-token windows (the corpus has no newlines); both engines
    // derive them by identical array slicing, so dedup decisions
    // hash-match. Scale shape: one shuffle keyed on the line string
    // for document frequency (corpus-wide, like t10's shingle DF),
    // one join back, one groupBy doc_id to reassemble — all rows are
    // (id, short-string) pairs, never whole documents, and the DF
    // table could be broadcast once filtered to boilerplate-only
    // lines (n_docs >= K is a tiny minority at real thresholds).
    Q("t13_line_dedup",
      Some("WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t " +
        "FROM documents), " +
        "lines AS (SELECT doc_id, i AS line_no, " +
        "array_to_string(t[i*3+1 : i*3+3], ' ') AS line FROM toks, " +
        "UNNEST(range(0, CAST(ceil(len(t) / 3.0) AS BIGINT))) AS u(i)), " +
        "freq AS (SELECT line, count(DISTINCT doc_id) AS n_docs " +
        "FROM lines GROUP BY 1), " +
        "kept AS (SELECT l.doc_id, l.line_no, l.line FROM lines l " +
        "JOIN freq f USING (line) WHERE f.n_docs < 3), " +
        "agg AS (SELECT doc_id, count(*) AS n_kept, " +
        "string_agg(line, ' ' ORDER BY line_no) AS clean_text " +
        "FROM kept GROUP BY 1), " +
        "tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY 1) " +
        "SELECT d.doc_id, t.n_lines, " +
        "t.n_lines - coalesce(a.n_kept, 0) AS n_dropped, " +
        "coalesce(a.clean_text, '') AS clean_text FROM documents d " +
        "JOIN tot t USING (doc_id) LEFT JOIN agg a USING (doc_id)"),
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
        val lines = docs
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, cast(ceil(size(t) / 3.0) as int) - 1), " +
              "i -> struct(cast(i as bigint) as line_no, " +
              "concat_ws(' ', slice(t, i * 3 + 1, 3)) as line))"))
            .as("x"))
          .select(col("doc_id"), col("x.line_no"), col("x.line"))
        val freq = lines.groupBy(col("line"))
          .agg(countDistinct(col("doc_id")).as("n_docs"))
        val kept = lines.join(freq, "line").where(col("n_docs") < 3)
        val agg = kept.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_kept"),
            expr("array_join(transform(array_sort(" +
              "collect_list(struct(line_no, line))), x -> x.line), ' ')")
              .as("ct"))
        val tot = lines.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_lines"))
        docs.select(col("doc_id")).join(tot, "doc_id")
          .join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_lines"),
            (col("n_lines") - coalesce(col("n_kept"), lit(0L)))
              .as("n_dropped"),
            coalesce(col("ct"), lit("")).as("clean_text"))
      }),

    // Corpus-LM fluency scoring (the CCNet / KenLM quality-bucket
    // pass, restated shuffle-exactly): train a bigram "model" = the
    // corpus occurrence count of every bigram, then score each doc by
    // how familiar its bigrams are — total and average corpus
    // frequency, plus how many of its bigrams occur nowhere else
    // (f = 1). A true perplexity sums log-probs; logs are
    // transcendental and engine-dependent, so the score here is the
    // integer-exact arithmetic mean (one IEEE division at the end) —
    // the RANKING a curator buckets on is preserved. Scale shape:
    // the model is one groupBy keyed on the bigram (linear in corpus
    // tokens, the same inverted index as t08/t10), scoring is one
    // join back + a per-doc fold; nothing is ever all-pairs.
    Q("t14_bigram_lm",
      Some("WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t " +
        "FROM documents), " +
        "big AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS b " +
        "FROM toks, UNNEST(range(1, len(t))) AS u(i) WHERE len(t) >= 2), " +
        "cf AS (SELECT b, count(*) AS f FROM big GROUP BY 1) " +
        "SELECT doc_id, count(*) AS n_bigrams, " +
        "CAST(sum(f) AS BIGINT) AS sum_freq, " +
        "count(*) FILTER (WHERE f = 1) AS n_novel, " +
        "CAST(sum(f) AS BIGINT)::DOUBLE / count(*) AS avg_freq " +
        "FROM big JOIN cf USING (b) GROUP BY 1"),
      (s, d) => {
        val big = Tables.load(s, d, "documents")
          .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
          .where(size(col("t")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(t) - 2), " +
              "i -> concat(t[i], ' ', t[i+1]))")).as("b"))
        val cf = big.groupBy(col("b")).agg(count(lit(1)).as("f"))
        big.join(cf, "b")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(col("f")).as("sum_freq"),
            count(when(col("f") === 1, lit(1))).as("n_novel"))
          .select(col("doc_id"), col("n_bigrams"), col("sum_freq"),
            col("n_novel"),
            (col("sum_freq").cast("double") / col("n_bigrams"))
              .as("avg_freq"))
      }),

    // BM25 retrieval scoring (k1=1.2, b=0.75) of every document
    // against the corpus' 3 most frequent terms — the "pull docs
    // matching these benchmark queries" selection/decontamination
    // step. Scale shape: the tiny ranked query-term set broadcasts
    // (3 rows via a bounded limit(3).collect()), per-doc term
    // frequencies come from ONE shuffle keyed on doc_id, df/avgdl are
    // scalar broadcasts, and the top-k is TakeOrdered — no global
    // window, no vocab-sized single partition. Determinism: the
    // per-term contributions sum in FIXED rank order (each pivot sum
    // folds <= 1 element, so only the final a+b+c ordering matters)
    // and the score rounds to 6 places; ln/arith evaluate in the same
    // literal shape in both engines.
    Q("t15_bm25", Some(bm25OracleSql),
      (s, d) => {
        val toks = Tables.load(s, d, "documents")
          .select(col("doc_id"),
            explode(split(trim(col("text")), " ")).as("tok"))
        val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok")).limit(3)
          .select(col("tok")).collect().map(_.getString(0)) // 3 rows
        val qterms = broadcast(s.createDataFrame(
          s.sparkContext.parallelize(
            top.zipWithIndex.toIndexedSeq.map { case (t, i) =>
              org.apache.spark.sql.Row(t, i + 1) }),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("tok",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("rk",
              org.apache.spark.sql.types.IntegerType)))))
        val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"),
          avg(col("dl")).as("avgdl"))
        val tf = toks.join(qterms, "tok")
          .groupBy(col("doc_id"), col("tok"), col("rk"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        bm25Tail(tf, dfreq, dl, stats)
      }),

    // HTML boilerplate stripping (the web-crawl ingest step): tag
    // removal + entity decode + whitespace collapse. The corpus is
    // plain text, so each doc is first wrapped in deterministic markup
    // (same expression on both sides) — the strip then has real tags
    // and entities to chew on, not a no-op. Zero-shuffle codegen'd map.
    Q("t16_html_strip",
      Some("WITH h AS (SELECT doc_id, '<div id=\"d' || doc_id || " +
        "'\"><p>' || replace(text, ' and ', ' &amp; ') || " +
        "'</p><br/></div>' AS html FROM documents) " +
        "SELECT doc_id, length(html) AS n_html, " +
        "trim(regexp_replace(replace(" +
        "regexp_replace(html, '<[^>]+>', ' ', 'g'), '&amp;', '&'), " +
        "'\\s+', ' ', 'g')) AS clean_text FROM h"),
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("<div id=\"d"), col("doc_id"), lit("\"><p>"),
            regexp_replace(col("text"), " and ", " &amp; "),
            lit("</p><br/></div>")).as("html"))
        .select(col("doc_id"),
          length(col("html")).cast("long").as("n_html"),
          trim(regexp_replace(regexp_replace(
            regexp_replace(col("html"), "<[^>]+>", " "),
            "&amp;", "&"), "\\s+", " ")).as("clean_text"))),

    // Fixed-weight quality classifier (the FastText-classifier-shaped
    // keep/drop gate of C4/CCNet pipelines, with a deterministic
    // linear model): features -> softsign squash -> threshold. The
    // softsign z/(1+|z|) replaces exp() so the score is bit-identical
    // across engines (single IEEE ops on identical inputs — exp()'s
    // last-ulp varies by libm). Zero-shuffle codegen'd map.
    Q("t17_quality_classifier",
      Some("WITH f AS (SELECT doc_id, " +
        "len(string_split(trim(text), ' ')) AS n_tokens, " +
        "CAST(len(list_filter(string_split(trim(text), ' '), " +
        s"w -> w IN ${inList(stopwords)})) AS DOUBLE) / " +
        "len(string_split(trim(text), ' ')) AS stop_ratio, " +
        "CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) " +
        "AS DOUBLE) / length(text) AS punct_ratio FROM documents) " +
        "SELECT doc_id, z, 0.5 + 0.5 * z / (1 + abs(z)) AS score, " +
        "0.5 + 0.5 * z / (1 + abs(z)) > 0.55 AS keep FROM (" +
        "SELECT doc_id, -1.0 + 2.5 * stop_ratio + " +
        "1.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) - " +
        "3.0 * punct_ratio AS z FROM f)"),
      (s, d) => {
        val f = Tables.load(s, d, "documents").select(col("doc_id"),
          size(split(trim(col("text")), " ", -1)).as("n_tokens"),
          (expr("size(filter(split(trim(text), ' '), " +
            s"w -> w IN ${inList(stopwords)}))").cast("double") /
            size(split(trim(col("text")), " ", -1))).as("stop_ratio"),
          (length(regexp_replace(col("text"), "[^.!?,;:]", ""))
            .cast("double") / length(col("text"))).as("punct_ratio"))
        val z = f.select(col("doc_id"),
          (lit(-1.0) + lit(2.5) * col("stop_ratio") +
            lit(1.5) * least(lit(1.0),
              col("n_tokens").cast("double") / lit(100.0)) -
            lit(3.0) * col("punct_ratio")).as("z"))
        z.select(col("doc_id"), col("z"),
          (lit(0.5) + lit(0.5) * col("z") / (lit(1) + abs(col("z"))))
            .as("score"),
          (lit(0.5) + lit(0.5) * col("z") / (lit(1) + abs(col("z"))) >
            lit(0.55)).as("keep"))
      })
  )
}
