package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF-PQ index: build-once fidelity vs the inline s05
  * pipeline, the zero-rebuild probe property (job-count gated), and
  * incremental refresh (O(new) writes, untouched lists stable).
  */
class VectorIndexSpec extends AnyFunSuite {
  import graft.TestSpark.{sf, spark}

  private lazy val e = SimilarityOps.emb(spark, sf).cache()

  test("persisted-index probe equals the inline s05 IVF-PQ result") {
    val root = Files.createTempDirectory("graft_vidx_eq_").toString
    VectorIndexOps.buildVectorIndex(spark, root, e)
    val persisted = VectorIndexOps.probeVectorIndex(spark, root, e)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).sortBy(x => (x._1, x._4))
    val inline = graft.SparkEntry.queries("s05_ann_ivfpq")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).sortBy(x => (x._1, x._4))
    assert(persisted.nonEmpty)
    assert(persisted.toSeq == inline.toSeq,
      s"persisted ${persisted.take(5).mkString(",")} != " +
        s"inline ${inline.take(5).mkString(",")}")
  }

  test("probe phase runs no build jobs: fewer jobs than build, zero commits") {
    val root = Files.createTempDirectory("graft_vidx_jobs_").toString
    val sc = spark.sparkContext
    sc.setJobGroup("vidx-build", "index build")
    VectorIndexOps.buildVectorIndex(spark, root, e)
    sc.setJobGroup("vidx-probe", "index probe")
    val rows = VectorIndexOps.probeVectorIndex(spark, root, e).collect()
    sc.clearJobGroup()
    assert(rows.nonEmpty)
    val buildJobs = sc.statusTracker.getJobIdsForGroup("vidx-build").length
    val probeJobs = sc.statusTracker.getJobIdsForGroup("vidx-probe").length
    // the build runs the corpus-wide quantizer rounds (many actions);
    // the probe is index reads + the shortlist re-rank. A probe that
    // re-ran the centroid/codebook phases would at least double its
    // job count past the build's.
    assert(probeJobs < buildJobs,
      s"probe ran $probeJobs jobs vs build $buildJobs — is it rebuilding?")
    val ds = new graft.core.GraftLake(spark, root).connect("vindex")
    assert(ds.versionIds().length == 1,
      "a probe must never commit a store version")
    // probing again against the same HEAD yields the same result
    val again = VectorIndexOps.probeVectorIndex(spark, root, e).collect()
    assert(again.map(_.toString).sorted.sameElements(
      rows.map(_.toString).sorted))
  }

  test("out-of-corpus probe (stored-centroid assignment) matches the stored-assign probe") {
    val root = Files.createTempDirectory("graft_vidx_ooc_").toString
    VectorIndexOps.buildVectorIndex(spark, root, e)
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("nrm").as("qnrm"))
    // corpus members assigned fresh against the STORED centroids must
    // land on the same cells the build stored — so the two probe
    // surfaces agree exactly
    val viaStored = VectorIndexOps.probeVectorIndex(spark, root, e)
      .collect().map(_.toString).sorted
    val viaCentroids = VectorIndexOps
      .probeVectorIndexFor(spark, root, e, q)
      .collect().map(_.toString).sorted
    assert(viaCentroids.nonEmpty)
    assert(viaCentroids.sameElements(viaStored))
  }

  test("SQL verbs: CALL system.{build,refresh,probe}_vector_index") {
    val root = Files.createTempDirectory("graft_vidx_sql_").toString
    spark.conf.set("spark.sql.catalog.gvx",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvx.root", root)
    spark.sql("CALL gvx.system.build_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf')")
    val viaSql = spark.sql("CALL gvx.system.probe_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf', query_max_id => 5)")
      .collect().map(_.toString).sorted
    val viaApi = VectorIndexOps
      .probeVectorIndex(spark, root, e, dsName = "vidx")
      .collect().map(_.toString).sorted
    assert(viaSql.nonEmpty && viaSql.sameElements(viaApi))
    // refresh verb commits exactly one more version
    val ds = new graft.core.GraftLake(spark, root).connect("vidx")
    val before = ds.versionIds().length
    spark.sql("CALL gvx.system.refresh_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf', min_vec_id => 3)")
    assert(ds.versionIds().length == before + 1)
  }

  test("incremental refresh writes only the new vectors' cells") {
    val root = Files.createTempDirectory("graft_vidx_inc_").toString
    // build on vectors 5.., keep 0..4 as the 'arriving' batch — they
    // are also the query set, so after the refresh the probe must
    // return results for them
    val oldE = e.where(col("vec_id") >= 5)
    val newE = e.where(col("vec_id") < 5)
    VectorIndexOps.buildVectorIndex(spark, root, oldE)
    val ds = new graft.core.GraftLake(spark, root).connect("vindex")
    val v1 = ds.latestVersion.get
    def chunkFiles: Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum else 1
      walk(new java.io.File(s"$root/vindex/chunks"))
    }
    val files1 = chunkFiles
    VectorIndexOps.refreshVectorIndex(spark, root, newE)
    val v2 = ds.latestVersion.get
    assert(ds.versionIds().length == 2, "refresh = ONE new version")
    // 5 new vectors live in one 4096-row chunk per variable: the
    // refresh rewrites at most one chunk for each of assign/codes/
    // norms — never the whole index
    assert(chunkFiles - files1 <= 6,
      s"refresh wrote ${chunkFiles - files1} chunks for 5 vectors")
    // untouched vectors' assignments identical across versions
    def assignAt(v: Long) = ds.readSlab("assign", v)
      .where(col("value") >= 0 && element_at(col("coord"), 1) >= 5)
      .collect().map(r => (r.getSeq[Long](0), r.getDouble(1))).toSet
    assert(assignAt(v2) == assignAt(v1),
      "refresh must not move existing vectors between lists")
    // the refreshed index serves the query set end to end
    val res = VectorIndexOps.probeVectorIndex(spark, root, e)
    assert(res.groupBy(col("qid")).count().count() == 5,
      "all 5 queries answered after incremental refresh")
  }

  test("streaming refresh (st15) equals a single-batch refresh; one commit per micro-batch") {
    val st = graft.SparkEntry
      .queries("st15_stream_index_refresh")(spark, sf)
    val stRows = st.collect()
    assert(stRows.nonEmpty)
    assert(stRows.forall(_.getLong(4) == 4L),
      "expected exactly 1 build + 3 refresh commits")
    // batch equivalent: build on the base 3/4, ONE refresh of the
    // rest — batch-size independence means the streamed index must
    // answer identically
    val n = e.agg(max(col("vec_id"))).head().getLong(0) + 1
    val n0 = 3L * n / 4
    val root = Files.createTempDirectory("graft_vidx_st15_").toString
    VectorIndexOps.buildVectorIndex(spark, root,
      e.where(col("vec_id") < n0))
    VectorIndexOps.refreshVectorIndex(spark, root,
      e.where(col("vec_id") >= n0))
    val batch = VectorIndexOps.probeVectorIndex(spark, root, e)
      .collect().map(_.toString).sorted
    assert(st.drop("n_commits").collect().map(_.toString).sorted
      .sameElements(batch),
      "streamed (3-batch) index answers differ from the 1-batch one")
  }

  test("index delete: tombstoned ids vanish at HEAD, survive at the pre-delete version") {
    val root = Files.createTempDirectory("graft_vidx_del_").toString
    VectorIndexOps.buildVectorIndex(spark, root, e)
    val ds = new graft.core.GraftLake(spark, root).connect("vindex")
    val v1 = ds.latestVersion.get
    val pre = VectorIndexOps.probeVectorIndex(spark, root, e)
      .collect().map(_.toString).sorted
    VectorIndexOps.deleteFromVectorIndex(spark, root,
      e.where(col("vec_id") % 7 === 6).select(col("vec_id")))
    val v2 = ds.latestVersion.get
    assert(ds.versionIds().length == 2, "delete = ONE commit")
    val post = VectorIndexOps.probeVectorIndex(spark, root, e)
      .collect()
    assert(post.nonEmpty)
    assert(post.forall(_.getLong(1) % 7 != 6),
      "a deleted vector surfaced in probe results at HEAD")
    // non-vacuous: the delete actually changed some answer
    assert(!post.map(_.toString).sorted.sameElements(pre),
      "delete test is vacuous: no deleted id was in any top-k")
    // versioned: the pre-delete snapshot still carries the vectors
    def liveNorms(v: Long): Long = ds.readSlab("norms", v)
      .where(!isnan(col("value")) &&
        element_at(col("coord"), 1) % 7 === 6).count()
    assert(liveNorms(v1) > 0 && liveNorms(v2) == 0,
      "tombstones must be version-scoped, not destructive")
    // a TIME-TRAVEL probe at the pre-delete version reproduces the
    // pre-delete retrieval exactly
    val travelled = VectorIndexOps
      .probeVectorIndex(spark, root, e, asOf = Some(v1))
      .collect().map(_.toString).sorted
    assert(travelled.sameElements(pre),
      "asOf probe must reproduce the pre-delete answers")
  }

  test("SQL delete verb + as_of probe reproduce the API behavior") {
    val root = Files.createTempDirectory("graft_vidx_sqldel_").toString
    spark.conf.set("spark.sql.catalog.gvd",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvd.root", root)
    spark.sql("CALL gvd.system.build_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf')")
    val ds = new graft.core.GraftLake(spark, root).connect("vidx")
    val v1 = ds.latestVersion.get
    val pre = spark.sql("CALL gvd.system.probe_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf')")
      .collect().map(_.toString).sorted
    // delete every probe-result id of query 0 — guaranteed non-vacuous
    val victims = spark.sql("CALL gvd.system.probe_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf')")
      .where(col("qid") === 0).collect().map(_.getLong(1)).distinct
    val out = spark.sql("CALL gvd.system.delete_from_vector_index(" +
      s"dataset => 'vidx', vec_ids => '${victims.mkString(",")}')")
      .collect()
    assert(out.head.getLong(2) == victims.length.toLong)
    val post = spark.sql("CALL gvd.system.probe_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf')").collect()
    assert(post.nonEmpty &&
      post.forall(r => !victims.contains(r.getLong(1))),
      "SQL-deleted ids still surfaced at HEAD")
    // as_of <= 0 = HEAD; as_of = v1 reproduces the pre-delete answers
    val travelled = spark.sql("CALL gvd.system.probe_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf', as_of => $v1)")
      .collect().map(_.toString).sorted
    assert(travelled.sameElements(pre))
  }

  test("two indexes with different geometry coexist; config round-trips from the store") {
    val root = Files.createTempDirectory("graft_vidx_cfg_").toString
    val alt = VectorIndexConfig(k = 4, nProbe = 1, mSub = 8, ks = 4,
      topC = 16, topK = 3, rnStore = 2)
    VectorIndexOps.buildVectorIndex(spark, root, e) // defaults
    VectorIndexOps.buildVectorIndex(spark, root, e, "vother", alt)
    val lake = new graft.core.GraftLake(spark, root)
    val dsDef = lake.connect("vindex")
    val dsAlt = lake.connect("vother")
    // the persisted config IS the stored metadata — exact round-trip
    assert(VectorIndexOps.readConfig(dsDef, dsDef.latestVersion.get) ==
      VectorIndexConfig())
    assert(VectorIndexOps.readConfig(dsAlt, dsAlt.latestVersion.get) ==
      alt)
    // both probe from their OWN geometry in the same session: the
    // default index returns 5 ranks per query, the alt one 3
    val pDef = VectorIndexOps.probeVectorIndex(spark, root, e)
    val pAlt = VectorIndexOps.probeVectorIndex(spark, root, e,
      dsName = "vother")
    assert(pDef.agg(max(col("rank"))).head().getLong(0) == 5L)
    val altRows = pAlt.collect()
    assert(altRows.nonEmpty && altRows.map(_.getLong(3)).max == 3L,
      "alt-geometry probe must honor its own stored topK")
    // refresh + delete on the alt index run off ITS config (rnStore/
    // mSub from the store, not compile-time defaults): both commit
    VectorIndexOps.deleteFromVectorIndex(spark, root,
      e.where(col("vec_id") === 7).select(col("vec_id")), "vother")
    assert(dsAlt.versionIds().length == 2)
    assert(VectorIndexOps.probeVectorIndex(spark, root, e,
      dsName = "vother").collect().forall(_.getLong(1) != 7L))
  }

  test("compact_vector_index: HEAD probes identical before/after; history folds away") {
    val root = Files.createTempDirectory("graft_vidx_cmp_").toString
    // build + refresh + delete = 3 versions of per-batch history
    VectorIndexOps.buildVectorIndex(spark, root,
      e.where(col("vec_id") >= 5))
    VectorIndexOps.refreshVectorIndex(spark, root,
      e.where(col("vec_id") < 5))
    VectorIndexOps.deleteFromVectorIndex(spark, root,
      e.where(col("vec_id") % 7 === 6).select(col("vec_id")))
    val ds = new graft.core.GraftLake(spark, root).connect("vindex")
    assert(ds.versionIds().length == 3)
    val pre = VectorIndexOps.probeVectorIndex(spark, root, e)
      .collect().map(_.toString).sorted
    val (expired, _, _) =
      VectorIndexOps.compactVectorIndex(spark, root)
    assert(expired == 2L && ds.versionIds().length == 1,
      "compaction must fold history to keepLast versions")
    val post = VectorIndexOps.probeVectorIndex(spark, root, e)
      .collect().map(_.toString).sorted
    assert(post.nonEmpty && post.sameElements(pre),
      "compaction changed HEAD probe results")
    // config survives compaction (it rides the surviving metadata)
    assert(VectorIndexOps.readConfig(ds, ds.latestVersion.get) ==
      VectorIndexConfig())
    // the SQL verb drives the same flow
    val root2 = Files.createTempDirectory("graft_vidx_cmp2_").toString
    spark.conf.set("spark.sql.catalog.gvc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvc.root", root2)
    spark.sql("CALL gvc.system.build_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf')")
    spark.sql("CALL gvc.system.refresh_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf', min_vec_id => 3)")
    val preSql = spark.sql("CALL gvc.system.probe_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf')")
      .collect().map(_.toString).sorted
    val acc = spark.sql("CALL gvc.system.compact_vector_index(" +
      "dataset => 'vidx')").collect().head
    assert(acc.getLong(1) == 1L, "expected 1 version expired via SQL")
    val postSql = spark.sql("CALL gvc.system.probe_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf')")
      .collect().map(_.toString).sorted
    assert(postSql.sameElements(preSql))
  }

  test("index stats: lists partition the corpus, deletes shrink them, SQL verb agrees") {
    val root = Files.createTempDirectory("graft_vidx_stat_").toString
    VectorIndexOps.buildVectorIndex(spark, root, e)
    val n = e.count()
    val st1 = VectorIndexOps.vectorIndexStats(spark, root).collect()
    assert(st1.map(_.getLong(1)).sum == n,
      "every vector must sit in exactly one inverted list")
    val ds = new graft.core.GraftLake(spark, root).connect("vindex")
    val v1 = ds.latestVersion.get
    VectorIndexOps.deleteFromVectorIndex(spark, root,
      e.where(col("vec_id") % 7 === 6).select(col("vec_id")))
    val nDel = e.where(col("vec_id") % 7 === 6).count()
    val st2 = VectorIndexOps.vectorIndexStats(spark, root).collect()
    assert(st2.map(_.getLong(1)).sum == n - nDel,
      "tombstoned vectors must leave the list stats")
    // asOf reports the historical balance
    val stOld = VectorIndexOps.vectorIndexStats(spark, root,
      asOf = Some(v1)).collect()
    assert(stOld.map(_.getLong(1)).sum == n)
    spark.conf.set("spark.sql.catalog.gvs",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvs.root", root)
    val viaSql = spark.sql("CALL gvs.system.vector_index_stats(" +
      "dataset => 'vindex')").collect().map(_.toString).sorted
    assert(viaSql.sameElements(st2.map(_.toString).sorted))
  }

  test("per-probe overrides: topK/nProbe tune one call; stored-rank cap refuses") {
    val root = Files.createTempDirectory("graft_vidx_ovr_").toString
    VectorIndexOps.buildVectorIndex(spark, root, e) // nProbe=2, topK=5
    // topK override changes ONE call, not the index
    val k3 = VectorIndexOps.probeVectorIndex(spark, root, e,
      topK = Some(3)).collect()
    assert(k3.nonEmpty && k3.map(_.getLong(3)).max == 3L)
    assert(VectorIndexOps.probeVectorIndex(spark, root, e)
      .agg(max(col("rank"))).head().getLong(0) == 5L,
      "an override must not mutate the stored default")
    // nProbe=1 narrows the candidate set: results are the top-k of a
    // SUBSET of the nProbe=2 candidate lists
    val p1 = VectorIndexOps.probeVectorIndex(spark, root, e,
      nProbe = Some(1)).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(p1.nonEmpty)
    // the stored-assignment path persisted rnStore=2 ranks: probing
    // more cells than stored must refuse, not silently under-probe
    val ex = intercept[IllegalArgumentException] {
      VectorIndexOps.probeVectorIndex(spark, root, e, nProbe = Some(3))
    }
    assert(ex.getMessage.contains("rnStore"))
    // ...while the out-of-corpus path assigns fresh against the
    // centroids and may probe up to k cells
    val q = e.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("nrm").as("qnrm"))
    val wide = VectorIndexOps.probeVectorIndexFor(spark, root, e, q,
      nProbe = Some(4), topK = Some(2)).collect()
    assert(wide.nonEmpty && wide.map(_.getLong(3)).max == 2L)
    // SQL surface carries the same knobs
    spark.conf.set("spark.sql.catalog.gvo",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvo.root", root)
    val viaSql = spark.sql("CALL gvo.system.probe_vector_index(" +
      s"dataset => 'vindex', source_dir => '$sf', top_k => 3)")
      .collect().map(_.toString).sorted
    assert(viaSql.sameElements(k3.map(_.toString).sorted))
  }

  test("retrain: skew ratio drops, recall holds, asOf keeps old geometry, deletes survive") {
    import spark.implicits._
    // Deliberately skewed corpus: 8 orthogonal 12-vector clusters
    // (group g points at axis g, per-member jitter on axis (g+1)%8),
    // EXCEPT id 50 which joins group 0 — so the k=2 build's strided
    // seeds (ids 0 and 50) both land in group 0, every other group
    // ties at cosine 0 to both centroids and tie-breaks into cell 0:
    // one cell swallows ~94% of the corpus, the s13 signal.
    val raw = (0L until 100L).map { i =>
      val g = if (i == 50L) 0 else math.min(7L, i / 12L).toInt
      val v = Array.fill(8)(0.0)
      v(g) = 10.0
      v((g + 1) % 8) = 0.1 * (i % 12)
      val nrm = math.sqrt(v.map(x => x * x).sum)
      (i, v.toSeq, nrm)
    }
    val se = raw.toDF("vec_id", "e", "nrm")
    val root = Files.createTempDirectory("graft_vidx_rts_").toString
    val cfg = VectorIndexConfig(dims = 8, k = 2, nProbe = 1, mSub = 2,
      ks = 4, topC = 32, topK = 3, rnStore = 2)
    VectorIndexOps.buildVectorIndex(spark, root, se, cfg = cfg)
    val ds = new graft.core.GraftLake(spark, root).connect("vindex")
    val v1 = ds.latestVersion.get
    def ratio(asOf: Option[Long]): Double = {
      val ns = VectorIndexOps.vectorIndexStats(spark, root, asOf = asOf)
        .collect().map(_.getLong(1).toDouble)
      ns.max / ns.min
    }
    val r1 = ratio(None)
    assert(r1 >= 3.0, s"setup is not skewed enough to gate on: $r1")
    val pre = VectorIndexOps.probeVectorIndex(spark, root, se)
      .collect()
    val preSorted = pre.map(_.toString).sorted
    // brute-force cosine truth (tie-break smallest id — the probe's
    // own ordering) for the recall gate
    val truth = (0L until 5L).map { q =>
      val qv = raw(q.toInt)
      q -> raw.filter(_._1 != q).map { c =>
        val dot = qv._2.zip(c._2).map { case (a, b) => a * b }.sum
        (c._1, dot / (qv._3 * c._3))
      }.sortBy(x => (-x._2, x._1)).take(3).map(_._1).toSet
    }.toMap
    def recall(rows: Array[(Long, Long)]): Double =
      rows.count { case (q, v) => truth(q)(v) }.toDouble / (5 * 3)
    val preRecall = recall(pre.map(r => (r.getLong(0), r.getLong(1))))
    VectorIndexOps.retrainVectorIndex(spark, root, se, k = Some(8))
    assert(ds.versionIds().length == 2, "retrain = ONE commit")
    // (b) the skew signal acted on: 8 cells, balance restored
    val r2 = ratio(None)
    assert(r2 < r1 / 2, s"retrain did not rebalance: $r1 -> $r2")
    // (a) recall does not regress (here: every group is one cell, so
    // the post-retrain probe is exact for in-cluster truth)
    val post = VectorIndexOps.probeVectorIndex(spark, root, se)
      .collect()
    val postRecall = recall(post.map(r => (r.getLong(0), r.getLong(1))))
    assert(postRecall >= preRecall,
      s"retrain regressed recall: $preRecall -> $postRecall")
    assert(postRecall == 1.0, "rebalanced probe should be exact here")
    // (c) asOf pins the OLD geometry and the old answers exactly
    assert(VectorIndexOps.readConfig(ds, v1).k == 2)
    assert(VectorIndexOps.readConfig(ds, ds.latestVersion.get).k == 8)
    assert(VectorIndexOps.probeVectorIndex(spark, root, se,
        asOf = Some(v1)).collect().map(_.toString).sorted
      .sameElements(preSorted),
      "asOf probe must reproduce the pre-retrain retrieval")
    // deletes survive a retrain: membership is the norms ledger
    val victim = post.filter(_.getLong(0) == 0L).map(_.getLong(1)).head
    VectorIndexOps.deleteFromVectorIndex(spark, root,
      Seq(victim).toDF("vec_id"))
    VectorIndexOps.retrainVectorIndex(spark, root, se)
    val afterDel = VectorIndexOps.probeVectorIndex(spark, root, se)
      .collect()
    assert(afterDel.nonEmpty &&
      afterDel.forall(_.getLong(1) != victim),
      "a deleted vector came back after retrain")
    // deleting a SEED id (12 = the k=8 build's cid-1 seed) must not
    // leave a PHANTOM centroid behind: the untrained cell's cells
    // write explicit NaN — the MVCC partial-chunk merge would
    // otherwise inherit the previous quantizer's values for it, and
    // probes would rank a ghost cell with zero members
    VectorIndexOps.deleteFromVectorIndex(spark, root,
      Seq(12L).toDF("vec_id"))
    VectorIndexOps.retrainVectorIndex(spark, root, se)
    val cents = ds.readSlab("centroids", ds.latestVersion.get)
      .where(!isnan(col("value")))
      .select(element_at(col("coord"), 1)).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cents == Set(0L, 2L, 3L, 4L, 5L, 6L, 7L),
      s"expected the deleted seed's cell to train nothing, got $cents")
    assert(VectorIndexOps.probeVectorIndex(spark, root, se)
      .collect().nonEmpty)
  }

  test("SQL retrain verb: coarse build + retrain lands on the fresh default-build state") {
    val root = Files.createTempDirectory("graft_vidx_sqlrt_").toString
    spark.conf.set("spark.sql.catalog.gvr",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvr.root", root)
    spark.sql("CALL gvr.system.build_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf', k => 2)")
    val out = spark.sql("CALL gvr.system.retrain_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf', k => 8)").collect()
    assert(out.head.getLong(1) > 0L)
    // the retrain reuses the build's training math, so a full-corpus
    // retrain == a fresh default build — the s14 oracle's claim,
    // here via the SQL surface
    val fresh = Files.createTempDirectory("graft_vidx_sqlrtf_").toString
    VectorIndexOps.buildVectorIndex(spark, fresh, e)
    val want = VectorIndexOps.probeVectorIndex(spark, fresh, e)
      .collect().map(_.toString).sorted
    val got = spark.sql("CALL gvr.system.probe_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf')")
      .collect().map(_.toString).sorted
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("SQL build verb derives dims from the data, not a default") {
    import spark.implicits._
    // 16-dim embeddings: a build that assumed the 64-dim default
    // would mis-slice subvectors instead of indexing these
    val dir = Files.createTempDirectory("graft_vidx_dims_").toString
    (0L until 40L).map { i =>
      (i, Array.tabulate(16)(d =>
        (if (d == (i % 4).toInt * 4) 5.0f else 0.0f) + 0.01f * d).toSeq)
    }.toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val root = Files.createTempDirectory("graft_vidx_dimsr_").toString
    spark.conf.set("spark.sql.catalog.gvm",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvm.root", root)
    spark.sql("CALL gvm.system.build_vector_index(" +
      s"dataset => 'vidx', source_dir => '$dir', k => 4)")
    val ds = new graft.core.GraftLake(spark, root).connect("vidx")
    val got = VectorIndexOps.readConfig(ds, ds.latestVersion.get)
    assert(got.dims == 16, s"dims must come from the data, got $got")
    val rows = spark.sql("CALL gvm.system.probe_vector_index(" +
      s"dataset => 'vidx', source_dir => '$dir')").collect()
    assert(rows.nonEmpty)
  }

  test("SQL build verb accepts non-default geometry and persists it") {
    val root = Files.createTempDirectory("graft_vidx_sqlcfg_").toString
    spark.conf.set("spark.sql.catalog.gvg",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvg.root", root)
    spark.sql("CALL gvg.system.build_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf', " +
      "k => 4, n_probe => 1, m_sub => 8, ks => 4, top_c => 16, " +
      "top_k => 3)")
    val ds = new graft.core.GraftLake(spark, root).connect("vidx")
    val got = VectorIndexOps.readConfig(ds, ds.latestVersion.get)
    assert(got == VectorIndexConfig(k = 4, nProbe = 1, mSub = 8,
      ks = 4, topC = 16, topK = 3, rnStore = 2))
    val rows = spark.sql("CALL gvg.system.probe_vector_index(" +
      s"dataset => 'vidx', source_dir => '$sf')").collect()
    assert(rows.nonEmpty && rows.map(_.getLong(3)).max == 3L)
  }

  test("sampled training (trainStride): quantizers read ONLY the sample; every vector still indexed; recall holds") {
    import spark.implicits._
    // 8 orthogonal 12-member clusters; the SAMPLE (even ids) is
    // identical across corpus A and corpus B, the off-sample odd ids
    // differ wildly — so equal trained quantizers PROVE training read
    // O(sample), not the corpus (the row-count gate, behaviorally)
    def clustered(i: Long): Array[Double] = {
      val g = (i / 12L).toInt
      val v = Array.fill(8)(0.0)
      v(g) = 10.0; v((g + 1) % 8) = 0.1 * (i % 12)
      v
    }
    def wild(i: Long): Array[Double] = {
      val v = Array.fill(8)(0.0)
      v(((i + 3) % 8).toInt) = 7.0; v(((i + 5) % 8).toInt) = 2.0
      v
    }
    def corpus(wildOdds: Boolean) = (0L until 96L).map { i =>
      val v = if (wildOdds && i % 2 == 1) wild(i) else clustered(i)
      (i, v.toSeq, math.sqrt(v.map(x => x * x).sum))
    }.toDF("vec_id", "e", "nrm")
    val cfg = VectorIndexConfig(dims = 8, k = 8, nProbe = 1, mSub = 2,
      ks = 4, topC = 32, topK = 3, rnStore = 2)
    def slab(root: String, name: String): Set[(Seq[Long], Double)] = {
      val ds = new graft.core.GraftLake(spark, root).connect("vindex")
      ds.readSlab(name, ds.latestVersion.get)
        .where(!isnan(col("value")))
        .collect().map(r => (r.getSeq[Long](0).toSeq, r.getDouble(1)))
        .toSet
    }
    val rootA = Files.createTempDirectory("graft_vidx_tsA_").toString
    val rootB = Files.createTempDirectory("graft_vidx_tsB_").toString
    VectorIndexOps.buildVectorIndex(spark, rootA, corpus(false),
      cfg = cfg, trainStride = 2L)
    VectorIndexOps.buildVectorIndex(spark, rootB, corpus(true),
      cfg = cfg, trainStride = 2L)
    val centA = slab(rootA, "centroids")
    assert(centA.nonEmpty && centA == slab(rootB, "centroids"),
      "sampled training must depend only on the even-id sample")
    assert(slab(rootA, "codebook") == slab(rootB, "codebook"))
    // sanity that the gate CAN fail: full-corpus training on the
    // wild corpus lands on different centroids
    val rootB1 = Files.createTempDirectory("graft_vidx_tsB1_").toString
    VectorIndexOps.buildVectorIndex(spark, rootB1, corpus(true),
      cfg = cfg)
    assert(slab(rootB1, "centroids") != centA)
    // the assign/encode pass still covers EVERY vector, sample or not
    val dsA = new graft.core.GraftLake(spark, rootA).connect("vindex")
    val headA = dsA.latestVersion.get
    assert(dsA.readSlab("norms", headA)
      .where(!isnan(col("value"))).count() == 96L)
    assert(dsA.readSlab("assign", headA)
      .where(col("value") >= 0 &&
        element_at(col("coord"), 2) === 0).count() == 96L)
    // recall: on the clustered corpus the half-sample centroids still
    // separate the clusters exactly — sampled training must not cost
    // recall here
    val raw = (0L until 96L).map(i =>
      (i, clustered(i).toSeq, math.sqrt(clustered(i).map(x => x * x).sum)))
    val truth = (0L until 5L).map { q =>
      val qv = raw(q.toInt)
      q -> raw.filter(_._1 != q).map { c =>
        val dot = qv._2.zip(c._2).map { case (a, b) => a * b }.sum
        (c._1, dot / (qv._3 * c._3))
      }.sortBy(x => (-x._2, x._1)).take(3).map(_._1).toSet
    }.toMap
    val got = VectorIndexOps.probeVectorIndex(spark, rootA, corpus(false))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 15 &&
      got.forall { case (q, v) => truth(q)(v) },
      s"sampled-train recall regressed: ${got.mkString(",")}")
    // retrain honors the knob too (same sample discipline)
    VectorIndexOps.retrainVectorIndex(spark, rootA, corpus(false),
      trainStride = 2L)
    assert(VectorIndexOps.probeVectorIndex(spark, rootA, corpus(false))
      .collect().length == 15)
  }
}
