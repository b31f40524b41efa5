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
}
