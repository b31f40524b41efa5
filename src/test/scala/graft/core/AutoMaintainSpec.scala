package graft.core

import org.apache.spark.sql.functions.{col, isnan}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Model._

/** Threshold-triggered self-maintenance on the BATCH commit path: a
  * long run of plain writer commits keeps hot-dir counts bounded with
  * no manual `CALL g.system.*` — the batch analog of the streaming
  * sink's compactEvery/packEvery.
  */
class AutoMaintainSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  test("200 batch commits self-compact and self-pack: hot dirs stay bounded") {
    spark.conf.set("spark.graft.autoMaintain.hotIndexThreshold", "16")
    spark.conf.set("spark.graft.autoMaintain.packEvery", "32")
    spark.conf.set("spark.graft.autoMaintain.gcGraceMs", "0")
    try {
      val lake = new GraftLake(spark,
        graft.TempDirs.create("graft_automnt_").toString)
      lake.create("am")
      val ds = lake.connect("am")
      val meta = DatasetMeta(Seq(
        VariableMeta("t", "double", Seq(64L), Seq(4L), Double.NaN)))
      val hfs = new org.apache.hadoop.fs.Path(ds.path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def hotIdx: Int =
        hfs.listStatus(new org.apache.hadoop.fs.Path(s"${ds.path}/indices"))
          .count(_.getPath.getName.startsWith("versionId="))
      def blobs: Int =
        hfs.listStatus(new org.apache.hadoop.fs.Path(s"${ds.path}/chunks"))
          .filter(_.isDirectory)
          .flatMap(d => hfs.listStatus(d.getPath))
          .count(_.getPath.getName.endsWith(".bin"))

      var maxHot = 0
      (1 to 200).foreach { i =>
        val w = ds.newWriter(meta)
        w.writeSlab("t", Seq((Seq((i % 64).toLong), i.toDouble))
          .toDF("coord", "value"))
        w.commit()
        maxHot = math.max(maxHot, hotIdx)
      }
      // the hot index dir never outgrows threshold + the commits that
      // landed before the fold kicked in
      assert(maxHot <= 24,
        s"hot index partitions peaked at $maxHot with threshold 16")
      assert(hotIdx <= 24, s"$hotIdx hot partitions left after 200 commits")
      // packing kept loose blobs bounded too (32-commit cadence)
      assert(blobs <= 48, s"$blobs loose blobs after 200 commits")

      // correctness untouched: HEAD reads every last-written cell
      val got = ds.readSlab("t", ds.latestVersion.get)
        .where(!isnan(col("value")))
        .as[(Seq[Long], Double)].collect().toMap
      val expect = (1 to 200).map(i => Seq((i % 64).toLong) -> i.toDouble)
        .toMap
      assert(got == expect)
      // and time travel through folded history still resolves
      val mid = ds.versionIds().sorted.apply(100)
      assert(ds.readSlab("t", mid).where(!isnan(col("value")))
        .count() > 0)
    } finally {
      spark.conf.unset("spark.graft.autoMaintain.hotIndexThreshold")
      spark.conf.unset("spark.graft.autoMaintain.packEvery")
      spark.conf.unset("spark.graft.autoMaintain.gcGraceMs")
    }
  }

  test("text index: per-batch refreshes self-compact past the dl file threshold") {
    import graft.operators.TextIndexOps
    def docs(lo: Long, hi: Long) = (lo until hi).map(i =>
      (i, s"alpha beta w$i ${if (i % 3 == 0) "gamma" else "delta"}"))
      .toDF("doc_id", "text")
    // twin builds WITHOUT the policy — the equality reference
    val twin = graft.TempDirs.create("graft_automnt_tidx2_").toString
    TextIndexOps.indexDocuments(spark, docs(0, 200), twin)
    spark.conf.set(
      "spark.graft.autoMaintain.textIndex.hotFileThreshold", "6")
    try {
      val dir = graft.TempDirs.create("graft_automnt_tidx_").toString
      (0 until 10).foreach(b => TextIndexOps.indexDocuments(spark,
        docs(b * 20L, (b + 1) * 20L), dir))
      val hfs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // resolve through the meta: compaction publishes a new data
      // generation, so the live dl dir moves as the policy fires
      val dlFiles = hfs.listStatus(new org.apache.hadoop.fs.Path(
          TextIndexOps.liveArtifactDir(spark, dir, "dl")))
        .count(_.getPath.getName.startsWith("part-"))
      // 10 batches append at least one dl part file each (AQE folds a
      // 20-doc batch to one); the policy compacts as the threshold
      // trips, so the count stays bounded by threshold + the tail
      assert(dlFiles <= 10,
        s"$dlFiles dl files left — auto-compaction never ran")
      // batch rows folded at least once: a 10-batch index would hold
      // 10 dfreq rows for the every-batch token
      val alphaRows = spark.read.parquet(
          TextIndexOps.liveArtifactDir(spark, dir, "dfreq"))
        .where(col("tok") === "alpha").count()
      assert(alphaRows < 10L,
        s"dfreq holds $alphaRows rows for 'alpha' — never folded")
      // probes and stats identical to the one-shot twin
      val terms = TextIndexOps.topIndexTerms(spark, dir)
      assert(terms == TextIndexOps.topIndexTerms(spark, twin))
      def pm(d: String) = TextIndexOps.probeTextIndex(spark, d, terms)
        .collect().map(_.toString).sorted.toSeq
      assert(pm(dir) == pm(twin))
      assert(TextIndexOps.textIndexStats(spark, dir).collect().head
        == TextIndexOps.textIndexStats(spark, twin).collect().head)
    } finally spark.conf.unset(
      "spark.graft.autoMaintain.textIndex.hotFileThreshold")
  }

  test("vector index: per-batch refreshes self-compact past the version threshold") {
    import graft.operators.{VectorIndexConfig, VectorIndexOps}
    val raw = (0L until 80L).map { i =>
      val g = (i % 4).toInt
      val v = Array.fill(8)(0.0)
      v(g * 2) = 10.0
      v(g * 2 + 1) = 0.1 * (i % 9)
      (i, v.toSeq, math.sqrt(v.map(x => x * x).sum))
    }
    val se = raw.toDF("vec_id", "e", "nrm")
    val cfg = VectorIndexConfig(dims = 8, k = 4, nProbe = 2, mSub = 2,
      ks = 4, topC = 16, topK = 3, rnStore = 2)
    def base = se.where(col("vec_id") < 30)
    def batch(b: Int) = se.where(col("vec_id") >= 30 + b * 10 &&
      col("vec_id") < 40 + b * 10)
    // twin: same build + 5 refreshes, NO policy — the reference
    val twin = graft.TempDirs.create("graft_automnt_vidx2_").toString
    VectorIndexOps.buildVectorIndex(spark, twin, base, cfg = cfg)
    (0 until 5).foreach(b =>
      VectorIndexOps.refreshVectorIndex(spark, twin, batch(b)))
    spark.conf.set(
      "spark.graft.autoMaintain.vectorIndex.compactEvery", "4")
    try {
      val root = graft.TempDirs.create("graft_automnt_vidx_").toString
      VectorIndexOps.buildVectorIndex(spark, root, base, cfg = cfg)
      (0 until 5).foreach(b =>
        VectorIndexOps.refreshVectorIndex(spark, root, batch(b)))
      val ds = new GraftLake(spark, root).connect("vindex")
      val twinDs = new GraftLake(spark, twin).connect("vindex")
      assert(twinDs.versionIds().length == 6,
        "twin must hold the full per-batch history")
      assert(ds.versionIds().length <= 4,
        s"${ds.versionIds().length} live versions — policy never fired")
      // HEAD retrieval identical to the uncompacted twin, and the
      // surviving config still round-trips
      def pm(r: String) = VectorIndexOps.probeVectorIndex(spark, r, se)
        .collect().map(_.toString).sorted.toSeq
      assert(pm(root).nonEmpty && pm(root) == pm(twin))
      assert(VectorIndexOps.readConfig(ds, ds.latestVersion.get) == cfg)
    } finally spark.conf.unset(
      "spark.graft.autoMaintain.vectorIndex.compactEvery")
  }
}
