package graft.operators

import java.nio.file.Files

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED, incrementally-maintained inverted text index — the BM25
  * analog of [[VectorIndexOps]]: t15 re-tokenizes the corpus on every
  * call, which is fine once and wrong for a curation pipeline that
  * scores thousands of query sets against the same corpus. Here the
  * index is built ONCE as bucket-partitioned parquet and probed with
  * zero corpus reads:
  *
  *   - `postings/bucket=H/`  (tok, doc_id, tf)   term-bucketed lists
  *   - `dfreq/bucket=H/`     (tok, df, cf)       per-term doc/corpus freq
  *   - `dl/`                 (doc_id, dl)        doc lengths
  *   - `stats/`              (n_docs, sum_dl)    one row per index batch
  *
  * The 100 TB shape: a probe reads ONLY the postings buckets its query
  * terms hash to (partition pruning on `bucket` — gated behaviorally
  * in TextIndexSpec by deleting every other bucket), the vocab-sized
  * `dfreq`, the doc-count-sized `dl`, and a rows=batches `stats` file;
  * the corpus text is never touched. Refresh is append-only (new
  * doc_ids): each batch appends its postings/dfreq/dl/stats, and the
  * probe SUMS df/cf/stats across batches — so maintaining the index
  * after an ingest costs one tokenize pass over the NEW docs only,
  * never a rebuild, and no compaction is required for correctness
  * (the per-term row count grows with batches, not docs).
  *
  * Build+probe math is IDENTICAL to t15 ([[TextOps.bm25Tail]] is the
  * single shared scoring expression), so a build over half the corpus
  * plus a refresh over the other half must land on the byte-equal
  * full-corpus answer — which is exactly what the t18 oracle gate
  * replays in DuckDB.
  */
object TextIndexOps extends QueryPack {

  private val nBuckets = 64
  private val topTerms = 3

  private def toks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(split(trim(col("text")), " ")).as("tok"))

  private def bucketed(df: DataFrame): DataFrame =
    df.withColumn("bucket", pmod(xxhash64(col("tok")), lit(nBuckets.toLong)))

  /** Build or incrementally extend the index with `docs` (append-only:
    * doc_ids must be NEW — re-indexing an existing doc would double-
    * count it). One tokenize pass; every artifact appends.
    */
  def indexDocuments(s: SparkSession, docs: DataFrame,
      dir: String): Unit = {
    val t = toks(docs).cache()
    try {
      val postings = t.groupBy(col("tok"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
      bucketed(postings).write.mode("append")
        .partitionBy("bucket").parquet(s"$dir/postings")
      bucketed(postings.groupBy(col("tok"))
          .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf")))
        .write.mode("append").partitionBy("bucket").parquet(s"$dir/dfreq")
      val dl = t.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      dl.write.mode("append").parquet(s"$dir/dl")
      dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
        .write.mode("append").parquet(s"$dir/stats")
    } finally { t.unpersist(); () }
  }

  /** Demo query-term selection from the INDEX (a vocab-sized dfreq
    * scan, not a corpus re-tokenize): the `topTerms` most frequent
    * terms by total occurrences, t15's selection rule.
    */
  def topIndexTerms(s: SparkSession, dir: String): Seq[String] =
    s.read.parquet(s"$dir/dfreq").groupBy(col("tok"))
      .agg(sum(col("cf")).as("cf"))
      .orderBy(col("cf").desc, col("tok")).limit(topTerms)
      .collect().map(_.getString(0)).toSeq

  /** BM25-score the corpus against `terms` from the persisted index:
    * postings pruned to the terms' buckets, df/stats summed across
    * refresh batches, [[TextOps.bm25Tail]] for the scoring. Zero
    * corpus I/O, zero index rebuild.
    */
  def probeTextIndex(s: SparkSession, dir: String,
      terms: Seq[String]): DataFrame = {
    import s.implicits._
    require(terms.nonEmpty && terms.length <= 3,
      "bm25Tail pivots rank 1..3 — probe with at most 3 terms")
    val qterms = broadcast(terms.zipWithIndex
      .map { case (t, i) => (t, i + 1) }.toDF("tok", "rk"))
    // the terms' partition keys, via the same hash the writer used
    val buckets = terms.toDF("tok")
      .select(pmod(xxhash64(col("tok")), lit(nBuckets.toLong)))
      .collect().map(_.getLong(0)).distinct.toSeq
    val tf = s.read.parquet(s"$dir/postings")
      .where(col("bucket").isin(buckets: _*) &&
        col("tok").isin(terms: _*))
      .join(qterms, "tok")
      .select(col("doc_id"), col("tok"), col("rk"), col("tf"))
    val dfreq = s.read.parquet(s"$dir/dfreq")
      .where(col("bucket").isin(buckets: _*) &&
        col("tok").isin(terms: _*))
      .groupBy(col("tok")).agg(sum(col("df")).as("df"))
    val dl = s.read.parquet(s"$dir/dl")
    val stats = s.read.parquet(s"$dir/stats")
      .agg(sum(col("n_docs")).as("nd"), sum(col("sum_dl")).as("sd"))
      .select(col("nd").as("n_docs"),
        (col("sd").cast("double") / col("nd")).as("avgdl"))
    TextOps.bm25Tail(tf, dfreq, dl, stats)
  }

  /** Fold the per-batch artifacts back to one row per key — refreshes
    * append a dfreq/stats row-set per batch, which probes SUM over, so
    * correctness never needs this; what it bounds is file/row counts
    * after thousands of micro-refreshes (the streaming st17 shape).
    * Each artifact rewrites in one aggregate job into a sibling tmp
    * dir and swaps in with two renames (maintenance-window semantics:
    * not safe under a concurrent probe of the same artifact instant —
    * same contract as a parquet OPTIMIZE).
    */
  def compactTextIndex(s: SparkSession, dir: String): Unit = {
    def swap(name: String, write: String => Unit): Unit = {
      val tmp = s"$dir/.${name}_compact_tmp"
      write(tmp)
      val live = new java.io.File(s"$dir/$name")
      val old = new java.io.File(s"$dir/.${name}_old")
      require(live.renameTo(old), s"swap: cannot retire $dir/$name")
      require(new java.io.File(tmp).renameTo(live),
        s"swap: cannot promote $tmp")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(old)
    }
    // postings rows are already unique per (tok, doc_id) — append-only
    // doc_ids — so compaction only re-buckets them into bounded files
    val postings = s.read.parquet(s"$dir/postings")
      .select(col("tok"), col("doc_id"), col("tf"))
    swap("postings", tmp => bucketed(postings)
      .repartition(col("bucket")).write.partitionBy("bucket").parquet(tmp))
    val dfreq = s.read.parquet(s"$dir/dfreq")
      .groupBy(col("tok"))
      .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"))
    swap("dfreq", tmp => bucketed(dfreq)
      .repartition(col("bucket")).write.partitionBy("bucket").parquet(tmp))
    val dl = s.read.parquet(s"$dir/dl")
    swap("dl", tmp => dl.coalesce(
      math.max(1, dl.rdd.getNumPartitions / 8)).write.parquet(tmp))
    val stats = s.read.parquet(s"$dir/stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    swap("stats", tmp => stats.coalesce(1).write.parquet(tmp))
  }

  // build-once roots for the bench: the probe is the operator's point
  private val builtRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def builtRoot(s: SparkSession, d: String): String =
    builtRoots.computeIfAbsent(d, { _ =>
      val dir = Files.createTempDirectory("graft_tidx_").toString
      indexDocuments(s, Tables.load(s, d, "documents"), dir)
      dir
    })

  val all: Seq[Q] = Seq(
    // Build over the even doc_ids, APPEND-refresh with the odd ones,
    // probe from the store — must equal t15's inline full-corpus
    // answer (same oracle SQL), which gates both the parquet
    // round-trip and the cross-batch df/cf/stats summing. The
    // bench times the probe on a build-once index.
    Q("t18_bm25_persisted", Some(TextOps.bm25OracleSql),
      (s, d) => {
        val dir = Files.createTempDirectory("graft_tidx_").toString
        val docs = Tables.load(s, d, "documents")
        indexDocuments(s, docs.where(col("doc_id") % 2 === 0), dir)
        indexDocuments(s, docs.where(col("doc_id") % 2 =!= 0), dir)
        probeTextIndex(s, dir, topIndexTerms(s, dir))
      },
      benchSecs = Some((s, d) => {
        val dir = builtRoot(s, d)
        val terms = topIndexTerms(s, dir)
        val t0 = System.nanoTime()
        probeTextIndex(s, dir, terms).count()
        (System.nanoTime() - t0) / 1e9
      })),

    // The same index driven entirely from SQL: CALL index_text over a
    // view (build + append-refresh), compact_text_index, then
    // probe_text_index — still t15's full-corpus oracle, so the
    // procedure surface AND the compaction sit inside the hash gate.
    Q("t19_bm25_sql", Some(TextOps.bm25OracleSql),
      (s, d) => {
        val n = counter.incrementAndGet()
        val cat = s"g_t19_$n"
        val root = Files.createTempDirectory("graft_t19_root_").toString
        val dir = Files.createTempDirectory("graft_t19_idx_").toString
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("text"))
        docs.where(col("doc_id") % 2 === 0)
          .createOrReplaceTempView(s"t19_even_$n")
        docs.where(col("doc_id") % 2 =!= 0)
          .createOrReplaceTempView(s"t19_odd_$n")
        s.sql(s"CALL $cat.system.index_text(index_dir => '$dir', " +
          s"source => 't19_even_$n')")
        s.sql(s"CALL $cat.system.index_text(index_dir => '$dir', " +
          s"source => 't19_odd_$n')")
        s.sql(s"CALL $cat.system.compact_text_index(index_dir => '$dir')")
        val terms = topIndexTerms(s, dir)
        s.sql(s"CALL $cat.system.probe_text_index(index_dir => '$dir', " +
          s"terms => '${terms.mkString(",")}')")
      })
  )

  private val counter = new java.util.concurrent.atomic.AtomicInteger()
}
