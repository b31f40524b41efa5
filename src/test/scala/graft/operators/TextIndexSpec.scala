package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Persisted inverted text index: refresh equivalence (build(half) +
  * append(half) == build(all)), cross-batch df summing for vocabulary
  * SHARED between batches, and the two zero-recompute scale gates —
  * the probe survives deletion of every postings bucket its terms
  * don't hash to (partition pruning is real, not advisory) and never
  * touches the source documents.
  */
class TextIndexSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  // vocabulary deliberately shared across both halves so refresh must
  // SUM df/cf across batch rows, not just union disjoint terms
  private def corpus(): DataFrame = (0L until 40L).map { i =>
    val words = Seq.fill((i % 5 + 1).toInt)("alpha") ++
      Seq.fill((i % 3 + 1).toInt)("beta") ++
      Seq.fill(if (i % 4 == 0) 3 else 1)("gamma") ++
      Seq(s"unique$i")
    (i, words.mkString(" "))
  }.toDF("doc_id", "text")

  private def probeMap(df: DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("build + append-refresh equals one full build; df sums across batches") {
    val full = Files.createTempDirectory("graft_tidx_full_").toString
    val inc = Files.createTempDirectory("graft_tidx_inc_").toString
    val docs = corpus()
    TextIndexOps.indexDocuments(spark, docs, full)
    TextIndexOps.indexDocuments(spark,
      docs.where($"doc_id" % 2 === 0), inc)
    TextIndexOps.indexDocuments(spark,
      docs.where($"doc_id" % 2 =!= 0), inc)
    val terms = TextIndexOps.topIndexTerms(spark, inc)
    assert(terms == TextIndexOps.topIndexTerms(spark, full))
    assert(terms.head == "alpha") // 40 docs × 1..5 occurrences
    val got = probeMap(TextIndexOps.probeTextIndex(spark, inc, terms))
    val want = probeMap(TextIndexOps.probeTextIndex(spark, full, terms))
    assert(got == want)
    assert(got.nonEmpty)
    // a repeated query term must not double its contribution: the
    // probe dedups before rank assignment
    assert(probeMap(TextIndexOps.probeTextIndex(spark, full,
      terms ++ terms.take(1))) == want)
    // df for a term present in every doc must be the full doc count:
    // scoring with halved df would shift every score
    val dfRow = spark.read.parquet(s"$inc/dfreq")
      .where($"tok" === "alpha")
      .agg(org.apache.spark.sql.functions.sum($"df")).head()
    assert(dfRow.getLong(0) == 40L)
  }

  test("compaction folds batch artifacts to one row per key; probe unchanged") {
    val dir = Files.createTempDirectory("graft_tidx_cmp_").toString
    val docs = corpus()
    (0L until 4L).foreach(k =>
      TextIndexOps.indexDocuments(spark,
        docs.where($"doc_id" % 4 === k), dir))
    val terms = TextIndexOps.topIndexTerms(spark, dir)
    val before = probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
    def dfreqDir(): String =
      TextIndexOps.liveArtifactDir(spark, dir, "dfreq")
    assert(spark.read.parquet(dfreqDir())
      .where($"tok" === "alpha").count() == 4L) // one row per batch
    TextIndexOps.compactTextIndex(spark, dir)
    assert(spark.read.parquet(dfreqDir())
      .where($"tok" === "alpha").count() == 1L)
    // compaction is snapshot-isolated: it publishes a NEW data
    // generation instead of rewriting the dirs a reader could hold
    assert(dfreqDir() == s"$dir/dfreq_g1")
    // stats are derived from dl, never persisted — nothing to fold
    assert(!new java.io.File(s"$dir/stats").exists())
    assert(probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
      == before)
    // compaction is idempotent and composes with further refreshes
    TextIndexOps.indexDocuments(spark,
      docs.select($"doc_id" + 1000 as "doc_id", $"text"), dir)
    val t2 = TextIndexOps.topIndexTerms(spark, dir)
    val grown = probeMap(TextIndexOps.probeTextIndex(spark, dir, t2))
    TextIndexOps.compactTextIndex(spark, dir)
    assert(probeMap(TextIndexOps.probeTextIndex(spark, dir, t2)) == grown)
  }

  test("probe reads only its terms' buckets and never the corpus") {
    val dir = Files.createTempDirectory("graft_tidx_prune_").toString
    TextIndexOps.indexDocuments(spark, corpus(), dir)
    val terms = TextIndexOps.topIndexTerms(spark, dir)
    val before = probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
    // behavioral pruning gate: delete every postings bucket the query
    // terms do NOT hash to — a probe that scanned postings/ wholesale
    // would now lose rows or fail on the vanished partitions
    val keep = terms.toDF("tok")
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64($"tok"),
        org.apache.spark.sql.functions.lit(64L)))
      .collect().map(_.getLong(0)).toSet
    val postings = new java.io.File(s"$dir/postings")
    postings.listFiles().filter(_.getName.startsWith("bucket="))
      .filterNot(f => keep(f.getName.stripPrefix("bucket=").toLong))
      .foreach { d =>
        d.listFiles().foreach(_.delete()); assert(d.delete())
      }
    val after = probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
    assert(after == before)
    assert(after.size == 20)
  }

  test("append-only contract enforced: re-indexing a doc_id fails loudly, names offenders") {
    val dir = Files.createTempDirectory("graft_tidx_dup_").toString
    val docs = corpus()
    TextIndexOps.indexDocuments(spark, docs.where($"doc_id" < 20), dir)
    val terms = TextIndexOps.topIndexTerms(spark, dir)
    val before = probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
    // overlapping batch (doc 19 already indexed) must refuse — a
    // silent accept would double-count its tf/df/cf/dl
    val ex = intercept[IllegalArgumentException] {
      TextIndexOps.indexDocuments(spark,
        docs.where($"doc_id" >= 19), dir)
    }
    assert(ex.getMessage.contains("append-only") &&
      ex.getMessage.contains("19"))
    // the refused batch wrote nothing: the index is unchanged
    assert(probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
      == before)
    // the disjoint remainder then lands fine
    TextIndexOps.indexDocuments(spark, docs.where($"doc_id" >= 20), dir)
    assert(spark.read.parquet(s"$dir/dl").count() == 40L)
  }

  test("index stats: multi-batch == one-shot, invariant under compaction, SQL verb agrees") {
    val one = Files.createTempDirectory("graft_tidx_stat1_").toString
    val two = Files.createTempDirectory("graft_tidx_stat2_").toString
    val docs = corpus()
    TextIndexOps.indexDocuments(spark, docs, one)
    TextIndexOps.indexDocuments(spark, docs.where($"doc_id" % 2 === 0),
      two)
    TextIndexOps.indexDocuments(spark, docs.where($"doc_id" % 2 =!= 0),
      two)
    def stat(dir: String): Seq[Long] =
      TextIndexOps.textIndexStats(spark, dir).collect().head match {
        case r => Seq(r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))
      }
    val want = stat(one)
    assert(want(1) == 40L) // n_docs
    assert(stat(two) == want,
      "cross-batch df/stats folding must reproduce the one-shot stats")
    TextIndexOps.compactTextIndex(spark, two)
    assert(stat(two) == want, "compaction changed the corpus stats")
    spark.conf.set("spark.sql.catalog.gts",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gts.root",
      Files.createTempDirectory("graft_tidx_statc_").toString)
    val viaSql = spark.sql(
      s"CALL gts.system.text_index_stats(index_dir => '$two')")
      .collect().head
    assert(Seq(viaSql.getLong(0), viaSql.getLong(1), viaSql.getLong(2),
      viaSql.getLong(3)) == want)
  }

  test("bucket count is per-index persisted state: inherited, pruned with, mismatch refused") {
    val dir = Files.createTempDirectory("graft_tidx_nb_").toString
    val docs = corpus()
    // pin 8 buckets at first build; the refresh does NOT restate it
    TextIndexOps.indexDocuments(spark, docs.where($"doc_id" % 2 === 0),
      dir, nBuckets = Some(8))
    TextIndexOps.indexDocuments(spark, docs.where($"doc_id" % 2 =!= 0),
      dir)
    val terms = TextIndexOps.topIndexTerms(spark, dir)
    val want = probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
    assert(want.size == 20)
    // the probe hashes with the STORED modulus: delete every bucket
    // the terms don't hash to UNDER MOD 8 — a probe still assuming
    // the 64 default would read vanished partitions or lose rows
    val keep = terms.toDF("tok")
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64($"tok"),
        org.apache.spark.sql.functions.lit(8L)))
      .collect().map(_.getLong(0)).toSet
    val postings = new java.io.File(s"$dir/postings")
    postings.listFiles().filter(_.getName.startsWith("bucket="))
      .filterNot(f => keep(f.getName.stripPrefix("bucket=").toLong))
      .foreach { d =>
        d.listFiles().foreach(_.delete()); assert(d.delete())
      }
    assert(probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
      == want)
    // restating a DIFFERENT count refuses loudly — a silent accept
    // would mis-bucket every new posting
    val ex = intercept[IllegalArgumentException] {
      TextIndexOps.indexDocuments(spark,
        docs.select($"doc_id" + 500 as "doc_id", $"text"), dir,
        nBuckets = Some(16))
    }
    assert(ex.getMessage.contains("nBuckets=8"))
  }

  test("driver-side term bucketing matches pmod(xxhash64(tok), n) exactly") {
    // the job-free probe path hashes query terms on the driver; this
    // pins it byte-for-byte against the distributed expression the
    // WRITER bucketed with, over adversarial inputs (unicode outside
    // the BMP, combining marks, quotes/backslashes, whitespace,
    // empty-adjacent, long strings) and several moduli — drift here
    // would silently prune the WRONG postings buckets
    val toks = Seq("alpha", "ünïcödé", "日本語テスト", "é", "𝔘𝔫𝔦",
      "it's", "a\\b", "tab\there", " lead", "trail ", "x",
      "longtoken" * 40, "mixed𝕏ascii", " nbsp")
    Seq(2, 8, 64, 1000).foreach { nb =>
      val viaSpark = toks.toDF("tok")
        .select($"tok", org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64($"tok"),
          org.apache.spark.sql.functions.lit(nb.toLong)))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      toks.foreach { t =>
        assert(TextIndexOps.termBucket(t, nb) == viaSpark(t),
          s"termBucket('$t', $nb) diverged from pmod(xxhash64)")
      }
    }
  }

  test("probe plan construction runs no job beyond the 3 artifact schema reads") {
    val dir = Files.createTempDirectory("graft_tidx_nojob_").toString
    TextIndexOps.indexDocuments(spark, corpus(), dir)
    val terms = TextIndexOps.topIndexTerms(spark, dir)
    val sc = spark.sparkContext
    // constructing the probe DataFrame schedules exactly the three
    // parquet schema-inference reads (postings/dfreq/dl) and NOTHING
    // else: the old path paid a 4th job — a full scheduling
    // round-trip just to hash the query terms — on the latency path
    // of every interactive retrieval call; termBucket killed it
    sc.setJobGroup("tidx-probe-build", "probe plan construction")
    val probe = TextIndexOps.probeTextIndex(spark, dir, terms)
    val buildJobs =
      sc.statusTracker.getJobIdsForGroup("tidx-probe-build").length
    sc.clearJobGroup()
    assert(buildJobs <= 2,
      s"probe plan construction ran $buildJobs job(s); the query-term " +
        "hash must not schedule a job (2 = postings/dl schema reads — " +
        "per-term df derives from the pruned postings, so dfreq is " +
        "off the probe path)")
    assert(probeMap(probe).size == 20)
  }

  test("stamped phrase probe pays no per-probe schema-validation job") {
    val dir = Files.createTempDirectory("graft_tidx_phjob_").toString
    TextIndexOps.indexDocuments(spark, corpus(), dir)
    val sc = spark.sparkContext
    // the positional-schema guarantee is a META STAMP (written at
    // build, re-validated when refreshing pre-stamp indexes): phrase
    // plan construction schedules only the postings schema-inference
    // read — the old path paid a pruned-bucket null-scan job on
    // every phrase probe's latency path
    sc.setJobGroup("tidx-phrase-build", "phrase plan construction")
    val probe = TextIndexOps.probePhrase(spark, dir,
      Seq("alpha", "beta"))
    val buildJobs =
      sc.statusTracker.getJobIdsForGroup("tidx-phrase-build").length
    sc.clearJobGroup()
    assert(buildJobs <= 1,
      s"phrase plan construction ran $buildJobs job(s); the schema " +
        "stamp must replace the per-probe null-scan (1 = postings " +
        "schema read)")
    assert(probe.collect().nonEmpty)
  }

  test("legacy persisted stats dir is ignored on read and cleared by compaction") {
    val dir = Files.createTempDirectory("graft_tidx_legacy_").toString
    val docs = corpus()
    TextIndexOps.indexDocuments(spark, docs, dir)
    val terms = TextIndexOps.topIndexTerms(spark, dir)
    val want = probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
    // plant a pre-derivation stats artifact with WRONG numbers: a
    // reader still consulting it would skew every score
    Seq((999999L, 999999L)).toDF("n_docs", "sum_dl")
      .write.parquet(s"$dir/stats")
    assert(probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
      == want, "probe must derive stats from dl, not the legacy file")
    val st = TextIndexOps.textIndexStats(spark, dir).collect().head
    assert(st.getLong(1) == 40L, "n_docs must come from dl")
    TextIndexOps.compactTextIndex(spark, dir)
    assert(!new java.io.File(s"$dir/stats").exists(),
      "compaction must clear the legacy stats dir")
    assert(probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
      == want)
  }

  test("doc_id schema is validated: int casts to long, non-integral refused") {
    val dir = Files.createTempDirectory("graft_tidx_dtype_").toString
    // int-typed ids must work end-to-end (the ledger decodes longs)
    val intDocs = Seq((1, "alpha beta"), (2, "alpha gamma"))
      .toDF("doc_id", "text")
    TextIndexOps.indexDocuments(spark, intDocs, dir)
    val ex = intercept[IllegalArgumentException] {
      TextIndexOps.indexDocuments(spark,
        intDocs.select($"doc_id" === 1 as "doc_id", $"text"), dir)
    }
    assert(ex.getMessage.contains("integral doc_id"))
    // and the append-only ledger check decodes the int-built dl fine
    val dup = intercept[IllegalArgumentException] {
      TextIndexOps.indexDocuments(spark, intDocs, dir)
    }
    assert(dup.getMessage.contains("append-only"))
    assert(probeMap(TextIndexOps.probeTextIndex(spark, dir,
      Seq("alpha"))).size == 2)
  }

  test("phrase probe: cross-batch, duplicate-term phrase, compaction-stable, SQL verb") {
    val dir = Files.createTempDirectory("graft_tidx_phr_").toString
    val docs = corpus()
    TextIndexOps.indexDocuments(spark, docs.where($"doc_id" % 2 === 0),
      dir)
    TextIndexOps.indexDocuments(spark, docs.where($"doc_id" % 2 =!= 0),
      dir)
    // corpus docs open with (i%5+1) consecutive 'alpha's, so the top
    // bigram is the DUPLICATE-term phrase ("alpha","alpha") — per-slot
    // matching, count 80 vs 40 for ("alpha","beta")
    val big = TextIndexOps.topIndexBigram(spark, dir)
    assert(big == Seq("alpha", "alpha"))
    def pm(phrase: Seq[String]): Map[Long, Long] =
      TextIndexOps.probePhrase(spark, dir, phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // k consecutive alphas hold k-1 occurrences of "alpha alpha";
    // top-20 by (count desc, doc_id) — closed form over i%5
    val want = (0L until 40L).map(i => i -> (i % 5))
      .filter(_._2 >= 1).sortBy { case (i, n) => (-n, i) }.take(20)
      .toMap
    assert(pm(big) == want)
    // an ordered multi-term phrase: every doc holds exactly one
    // "alpha beta" seam (the LAST alpha meets the FIRST beta)
    val ab = pm(Seq("alpha", "beta"))
    assert(ab == (0L until 20L).map(_ -> 1L).toMap)
    // the reversed phrase is a different query: "beta alpha" never
    // occurs (alphas strictly precede betas in every doc)
    assert(pm(Seq("beta", "alpha")).isEmpty)
    // compaction preserves the position lists
    TextIndexOps.compactTextIndex(spark, dir)
    assert(pm(big) == want && pm(Seq("alpha", "beta")) == ab)
    // ...and so does a post-compaction refresh
    TextIndexOps.indexDocuments(spark,
      docs.select($"doc_id" + 1000 as "doc_id", $"text"), dir)
    assert(pm(Seq("alpha", "beta")).values.forall(_ == 1L))
    // SQL verb agrees (duplicate terms ride the array parameter)
    spark.conf.set("spark.sql.catalog.gtp",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtp.root",
      Files.createTempDirectory("graft_tidx_phrc_").toString)
    val viaSql = spark.sql(s"CALL gtp.system.probe_text_phrase(" +
      s"index_dir => '$dir', terms => array('alpha', 'alpha'))")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == pm(big))
  }

  test("proximity (slop) matching: ordered window semantics, slop=0 equals the exact path") {
    val dir = Files.createTempDirectory("graft_tidx_slop_").toString
    // hand-built positions: doc 0 'a x b' (one gap), doc 1 'a x x b'
    // (two gaps), doc 2 'a b' (adjacent), doc 3 'b x a' (wrong
    // order), doc 4 'a b x a x x b' (one adjacent seam + one
    // three-apart pair)
    val docs = Seq(
      (0L, "a x b"), (1L, "a x x b"), (2L, "a b"),
      (3L, "b x a"), (4L, "a b x a x x b")).toDF("doc_id", "text")
    TextIndexOps.indexDocuments(spark, docs, dir)
    def m(slop: Int): Map[Long, Long] =
      TextIndexOps.probePhrase(spark, dir, Seq("a", "b"), slop)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact: only adjacent pairs; order matters (doc 3 never matches)
    assert(m(0) == Map(2L -> 1L, 4L -> 1L))
    // slop=1 admits one gap: doc 0 joins; doc 4 still has only its
    // adjacent seam (the second pair sits three apart)
    assert(m(1) == Map(0L -> 1L, 2L -> 1L, 4L -> 1L))
    // slop=2 admits two gaps: doc 1 joins, and doc 4's second 'a'
    // reaches the final 'b' (two distinct starts match)
    assert(m(2) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 4L -> 2L))
    // the corpus-wide gates: slop=0 chain path is never taken, but
    // the two n_matches definitions must agree wherever both apply —
    // replay the corpus() top bigram through both
    val dir2 = Files.createTempDirectory("graft_tidx_slop2_").toString
    TextIndexOps.indexDocuments(spark, corpus(), dir2)
    val big = TextIndexOps.topIndexBigram(spark, dir2)
    val exact = TextIndexOps.probePhrase(spark, dir2, big)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // slop counts DISTINCT starts, exact counts starts — for a
    // corpus where every consecutive pair is adjacent-only they agree
    // doc-for-doc on which docs match at least once
    val sloppy = TextIndexOps.probePhrase(spark, dir2, big, slop = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sloppy == exact)
    // SQL verb carries the knob
    spark.conf.set("spark.sql.catalog.gsl",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsl.root",
      Files.createTempDirectory("graft_tidx_slopc_").toString)
    val viaSql = spark.sql(s"CALL gsl.system.probe_text_phrase(" +
      s"index_dir => '$dir', terms => array('a', 'b'), slop => 2)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == m(2))
  }

  test("phrase probe refuses a non-positional legacy index; BM25 still serves it") {
    val dir = Files.createTempDirectory("graft_tidx_leg_").toString
    TextIndexOps.indexDocuments(spark, corpus(), dir)
    // strip the position lists — the on-disk shape of an index built
    // before the positional schema
    val legacy = spark.read.parquet(s"$dir/postings")
      .select($"tok", $"doc_id", $"tf", $"bucket")
    val tmp = Files.createTempDirectory("graft_tidx_leg2_").toString
    legacy.write.partitionBy("bucket").parquet(s"$tmp/postings")
    val fs = new java.io.File(s"$dir/postings")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(fs)
    assert(new java.io.File(s"$tmp/postings")
      .renameTo(new java.io.File(s"$dir/postings")))
    val terms = TextIndexOps.topIndexTerms(spark, dir)
    assert(probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
      .size == 20, "BM25 must keep serving a pre-positional index")
    val ex = intercept[IllegalArgumentException] {
      TextIndexOps.probePhrase(spark, dir, Seq("alpha", "beta"))
    }
    assert(ex.getMessage.contains("positional"))
    // now simulate a PRE-STAMP index outright: legacy meta with no
    // schema field — the phrase probe's runtime fallback still
    // refuses, and a REFRESH refuses too (appending positional
    // batches to a non-positional index would create the mixed
    // schema where phrase matching silently skips documents)
    downgradeMeta(dir)
    val ex2 = intercept[IllegalArgumentException] {
      TextIndexOps.probePhrase(spark, dir, Seq("alpha", "beta"))
    }
    assert(ex2.getMessage.contains("positional"))
    val ex3 = intercept[IllegalArgumentException] {
      TextIndexOps.indexDocuments(spark,
        corpus().select($"doc_id" + 500 as "doc_id", $"text"), dir)
    }
    assert(ex3.getMessage.contains("mixed-schema") ||
      ex3.getMessage.contains("non-positional"))
    // a pre-stamp index that IS positional gets stamped by refresh
    // and serves phrase probes job-free afterwards
    val dir2 = Files.createTempDirectory("graft_tidx_leg3_").toString
    TextIndexOps.indexDocuments(spark, corpus(), dir2)
    downgradeMeta(dir2)
    assert(TextIndexOps.resolveMeta(spark, dir2).get.schema == 0)
    TextIndexOps.indexDocuments(spark,
      corpus().select($"doc_id" + 500 as "doc_id", $"text"), dir2)
    assert(TextIndexOps.resolveMeta(spark, dir2).get.schema == 2,
      "refreshing a positional pre-stamp index must publish the stamp")
    assert(TextIndexOps.probePhrase(spark, dir2,
      Seq("alpha", "beta")).collect().nonEmpty)
  }

  test("crashed compaction self-heals: swap-window and stale-debris recovery") {
    val dir = Files.createTempDirectory("graft_tidx_crash_").toString
    val docs = corpus()
    TextIndexOps.indexDocuments(spark, docs.where($"doc_id" % 2 === 0),
      dir)
    TextIndexOps.indexDocuments(spark, docs.where($"doc_id" % 2 =!= 0),
      dir)
    val terms = TextIndexOps.topIndexTerms(spark, dir)
    val want = probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
    // simulate a crash INSIDE the swap window: live `dl` retired to
    // `.dl_old`, promotion never happened — plus stale tmp debris
    // from the dead run
    val d = new java.io.File(dir)
    assert(new java.io.File(d, "dl").renameTo(
      new java.io.File(d, ".dl_old")))
    assert(new java.io.File(d, ".stats_compact_tmp").mkdir())
    // the next compaction must restore dl from _old, clear debris,
    // and complete — not wedge on a missing live dir or stale require
    TextIndexOps.compactTextIndex(spark, dir)
    assert(probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
      == want)
    assert(!new java.io.File(d, ".dl_old").exists())
    assert(!new java.io.File(d, ".stats_compact_tmp").exists())
    assert(spark.read.parquet(
        TextIndexOps.liveArtifactDir(spark, dir, "dfreq"))
      .where($"tok" === "alpha").count() == 1L)
    // crash in the GENERATION flow: next-gen debris written but the
    // meta never published — probes keep resolving the old
    // generation; the next compaction clears the debris and completes
    val gen = TextIndexOps.resolveMeta(spark, dir).get.dataGen
    val debris = new java.io.File(d, s"postings_g${gen + 1}")
    assert(debris.mkdir())
    java.nio.file.Files.write(debris.toPath.resolve("part-junk"),
      Array[Byte](1, 2, 3))
    assert(probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
      == want, "unpublished next-gen debris must not affect probes")
    TextIndexOps.compactTextIndex(spark, dir)
    assert(probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
      == want)
    assert(TextIndexOps.resolveMeta(spark, dir).get.dataGen == gen + 1)
  }

  // rewrite an index's meta to the pre-stamp shape (schema unknown);
  // the Hadoop local FS keeps a .crc sidecar that must go with it
  private def downgradeMeta(dir: String): Unit = {
    new java.io.File(s"$dir/._index_meta.json.crc").delete()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_index_meta.json"),
      """{"nBuckets":64}""".getBytes("UTF-8"))
    ()
  }

  private def deleteMap(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("deletes: tombstoned docs vanish from BM25/phrase/stats; compaction folds them out") {
    val dir = Files.createTempDirectory("graft_tidx_del_").toString
    val reduced = Files.createTempDirectory("graft_tidx_delr_").toString
    val docs = corpus()
    TextIndexOps.indexDocuments(spark, docs.where($"doc_id" < 30), dir)
    // the truth twin: an index over the corpus MINUS the victims
    TextIndexOps.indexDocuments(spark,
      docs.where($"doc_id" % 5 =!= 3), reduced)
    val n = TextIndexOps.deleteFromTextIndex(spark, dir,
      docs.where($"doc_id" < 30 && $"doc_id" % 5 === 3)
        .select($"doc_id"))
    assert(n == 6L)
    // refresh AFTER the delete: new docs land fine, tombstones hold
    TextIndexOps.indexDocuments(spark, docs.where($"doc_id" >= 30), dir)
    TextIndexOps.deleteFromTextIndex(spark, dir,
      docs.where($"doc_id" >= 30 && $"doc_id" % 5 === 3)
        .select($"doc_id"))
    val terms = TextIndexOps.topIndexTerms(spark, reduced)
    def agree(): Unit = {
      assert(probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
        == probeMap(TextIndexOps.probeTextIndex(spark, reduced, terms)),
        "BM25 over the tombstoned index must equal the reduced corpus")
      assert(deleteMap(TextIndexOps.probePhrase(spark, dir,
          Seq("alpha", "beta")))
        == deleteMap(TextIndexOps.probePhrase(spark, reduced,
          Seq("alpha", "beta"))),
        "phrase matches must exclude tombstoned docs")
      assert(TextIndexOps.textIndexStats(spark, dir).collect().head
        == TextIndexOps.textIndexStats(spark, reduced).collect().head,
        "index stats must be delete-exact")
    }
    agree() // pre-compaction: the anti-join path
    // deleting an id twice is idempotent; an unknown id refuses
    TextIndexOps.deleteFromTextIndex(spark, dir,
      Seq(3L).toDF("doc_id"))
    agree()
    val exUnknown = intercept[IllegalArgumentException] {
      TextIndexOps.deleteFromTextIndex(spark, dir,
        Seq(999L).toDF("doc_id"))
    }
    assert(exUnknown.getMessage.contains("999"))
    // re-indexing a tombstoned id refuses until compaction folds it
    val exReadd = intercept[IllegalArgumentException] {
      TextIndexOps.indexDocuments(spark,
        docs.where($"doc_id" === 3), dir)
    }
    assert(exReadd.getMessage.contains("append-only"))
    // compaction folds the tombstones out of every artifact
    TextIndexOps.compactTextIndex(spark, dir)
    agree() // post-compaction: the folded path
    val live = TextIndexOps.liveArtifactDir(spark, dir, "postings")
    assert(spark.read.parquet(live)
      .where($"doc_id" % 5 === 3).count() == 0L,
      "folded postings must not contain tombstoned docs")
    assert(!new java.io.File(
        TextIndexOps.liveArtifactDir(spark, dir, "tomb")).exists(),
      "compaction must clear the tombstone ledger")
    // selection stats are delete-exact again post-compaction
    assert(TextIndexOps.topIndexTerms(spark, dir)
      == TextIndexOps.topIndexTerms(spark, reduced))
    // ...and the folded doc can come back now
    TextIndexOps.indexDocuments(spark, docs.where($"doc_id" === 3), dir)
  }

  test("probes concurrent with compaction see a consistent snapshot, never an error") {
    val dir = Files.createTempDirectory("graft_tidx_iso_").toString
    val docs = corpus()
    (0L until 4L).foreach(k => TextIndexOps.indexDocuments(spark,
      docs.where($"doc_id" % 4 === k), dir))
    val terms = TextIndexOps.topIndexTerms(spark, dir)
    val want = probeMap(TextIndexOps.probeTextIndex(spark, dir, terms))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val probes = new java.util.concurrent.atomic.AtomicInteger(0)
    val probeThreads = (1 to 2).map { _ =>
      new Thread(() => {
        while (!stop.get()) {
          try {
            val got = probeMap(
              TextIndexOps.probeTextIndex(spark, dir, terms))
            // every snapshot of this index (pre/post any compaction)
            // holds the same corpus, so the answer is invariant —
            // a torn read would lose rows or throw
            if (got != want) failures.add(new AssertionError(
              s"inconsistent probe snapshot: ${got.size} rows"))
            probes.incrementAndGet()
          } catch { case t: Throwable => failures.add(t); stop.set(true) }
        }
      })
    }
    probeThreads.foreach(_.start())
    try {
      // three compactions while probes hammer: each publishes a new
      // generation and GCs the generation BEFORE last — the grace
      // window a concurrent probe needs
      // the pause between compactions keeps in-flight probes inside
      // the one-generation grace window the GC honors: a probe only
      // loses its directories if it spans TWO full compactions
      (1 to 3).foreach { _ =>
        TextIndexOps.compactTextIndex(spark, dir)
        Thread.sleep(500)
      }
    } finally {
      stop.set(true)
      probeThreads.foreach(_.join(60000))
    }
    assert(failures.isEmpty,
      s"concurrent probe failed: ${Option(failures.peek())}")
    assert(probes.get() > 0, "no probe completed during the race")
    assert(TextIndexOps.resolveMeta(spark, dir).get.dataGen == 3)
    // old generations beyond the grace window are collected
    assert(!new java.io.File(s"$dir/postings_g1").exists())
    assert(new java.io.File(s"$dir/postings_g2").exists(),
      "the previous generation must survive one compaction (grace)")
  }
}
