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
  *   - `postings/bucket=H/`  (tok, doc_id, tf, pos) term-bucketed lists
  *   - `dfreq/bucket=H/`     (tok, df, cf)       per-term doc/corpus freq
  *   - `dl/`                 (doc_id, dl)        doc lengths + dedup ledger
  *   - `tomb/`               (doc_id)            delete tombstones
  *
  * Corpus-level stats (n_docs, avgdl) are DERIVED from `dl` at read
  * time, never persisted separately: a second stats artifact written
  * in a second job can tear against the ledger on a crash between the
  * two writes and silently skew every BM25 score — one source of
  * truth cannot disagree with itself. (Indexes built before this held
  * a `stats/` dir; it is ignored on read and cleared by compaction.)
  *
  * ==Snapshot isolation==
  * Every operation resolves its artifact directories through the
  * newest `_index_meta*.json` GENERATION file at the index root.
  * Compaction never rewrites a directory a reader could hold open: it
  * writes a complete new artifact set under the NEXT data generation
  * (`postings_g1/`, `dfreq_g1/`, …), then atomically publishes a new
  * meta generation pointing at it. A probe that resolved the old
  * generation keeps reading the old directories — they survive until
  * the FOLLOWING compaction garbage-collects them (grace = one
  * generation), so a probe concurrent with one compaction sees either
  * the old snapshot or the new one, never a torn mix or a missing
  * path. WRITES stay single-maintainer (refresh/delete/compact must
  * not overlap each other — the streaming-maintainer shape); only
  * probes are lock-free.
  *
  * ==Deletes==
  * [[deleteFromTextIndex]] appends doc_ids to the `tomb` ledger — an
  * O(deleted)-rows commit, the takedown latency a curation pipeline
  * needs. Probes and stats anti-join the ledger (doc-count-sized, the
  * same order as the `dl` artifact they already read), so deleted
  * docs vanish from retrieval immediately; compaction folds them OUT
  * of postings/dfreq/dl and clears the ledger. Term-selection helpers
  * reading only `dfreq` ([[topIndexTerms]]) keep Lucene-style
  * semantics: per-term df/cf include tombstoned docs until the next
  * compaction (correcting them early would need the full postings
  * scan the ledger design avoids). A tombstoned doc_id stays in `dl`
  * until compaction, so re-indexing it refuses until then.
  *
  * The 100 TB shape: a probe reads ONLY the postings buckets its query
  * terms hash to (partition pruning on `bucket` — gated behaviorally
  * in TextIndexSpec by deleting every other bucket) and the
  * doc-count-sized `dl` (+ `tomb` when deletes exist); per-term df
  * derives from the same pruned postings rows the probe already reads
  * for tf, so `dfreq` is OFF the probe latency path entirely. The
  * corpus text is never touched, and the query-term hashes compute on
  * the DRIVER (no job on the probe latency path). The bucket count is
  * PER-INDEX persisted state (pinned at first build, read back by
  * refresh/probe/compact, mismatches refused loudly) — tune it to the
  * vocabulary, not to a compile-time constant. Refresh is append-only
  * (new doc_ids): each batch appends its postings/dfreq/dl, and the
  * probe SUMS df (and derives the corpus stats) across batches — so
  * maintaining the index after an ingest costs one tokenize pass over
  * the NEW docs only, never a rebuild, and no compaction is required
  * for correctness (the per-term row count grows with batches, not
  * docs).
  *
  * Build+probe math is IDENTICAL to t15 ([[TextOps.bm25Tail]] is the
  * single shared scoring expression), so a build over half the corpus
  * plus a refresh over the other half must land on the byte-equal
  * full-corpus answer — which is exactly what the t18 oracle gate
  * replays in DuckDB.
  */
object TextIndexOps extends QueryPack {

  private val defaultBuckets = 64
  private val topTerms = 5
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def toks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(split(trim(col("text")), " ")))
      .select(col("doc_id"), col("col").as("tok"), col("pos"))

  private def bucketed(df: DataFrame, nBuckets: Int): DataFrame =
    df.withColumn("bucket", pmod(xxhash64(col("tok")), lit(nBuckets.toLong)))

  /** Driver-side twin of `pmod(xxhash64(tok), nBuckets)` — the SAME
    * XXH64(seed=42)-over-UTF-8-bytes the writer's bucketing column
    * computes (both go through Catalyst's XxHash64Function), evaluated
    * without scheduling a Spark job. A probe's query terms are a
    * handful of strings; paying a full job round-trip just to hash
    * them put a cluster-scheduling constant on the latency path of
    * every interactive retrieval call. Pinned against the distributed
    * expression for adversarial strings in TextIndexSpec so drift
    * could never silently mis-bucket a probe.
    */
  private[graft] def termBucket(tok: String, nBuckets: Int): Long =
    java.lang.Math.floorMod(
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(tok),
        org.apache.spark.sql.types.StringType, 42L),
      nBuckets.toLong)

  // ---- per-index persisted config: meta generations ------------------
  // The index's whole configuration lives in versioned meta files at
  // its root, and every operation resolves through the NEWEST one:
  //
  //   _index_meta.json          generation 0 (first build publishes it)
  //   _index_meta.gNNNNN.json   generation N >= 1 (maintenance bumps)
  //
  //   {"nBuckets":64,"schema":2,"gen":3,"dataGen":1}
  //
  //   - nBuckets: the postings hash modulus, pinned at first build — a
  //     probe or refresh hashing with a different modulus would look
  //     in (or write to) the wrong partition and silently lose
  //     postings, so restating a different value refuses loudly.
  //   - schema: 2 = every postings batch carries sorted position
  //     lists (stamped at build; re-validated once when refreshing a
  //     pre-stamp index). Phrase probes trust the stamp instead of
  //     scanning for null `pos` on every call. Absent/0 = unknown
  //     (pre-stamp index): phrase probes fall back to the runtime
  //     check.
  //   - gen: the meta file's own generation (max wins at resolve).
  //   - dataGen: which artifact-directory set is live — `postings/`
  //     for 0, `postings_gN/` for N. Compaction bumps it; a
  //     schema-stamp upgrade bumps gen only.
  //
  // Generation files are immutable once published: gen 0 by exclusive
  // create, gen >= 1 by full tmp write + atomic rename to a fresh
  // name — so a reader can never observe a torn meta. Guarantee
  // matrix: on HDFS/object stores with atomic create/rename the
  // publish is fully atomic; on a RAW LOCAL filesystem the gen-0
  // exclusive create is check-then-create and therefore BEST-EFFORT
  // against two concurrent first builds (production stores get the
  // real guarantee; the loser of a local race still re-validates and
  // refuses on mismatch rather than mis-bucketing).

  private[graft] final case class IndexMeta(nBuckets: Int, schema: Int,
      gen: Int, dataGen: Int)

  private def metaFileName(gen: Int): String =
    if (gen == 0) "_index_meta.json" else f"_index_meta.g$gen%05d.json"

  private def metaJson(m: IndexMeta): String =
    s"""{"nBuckets":${m.nBuckets},"schema":${m.schema},""" +
      s""""gen":${m.gen},"dataGen":${m.dataGen}}"""

  private val MetaName = """_index_meta(?:\.g(\d+))?\.json""".r

  private def hadoopFs(s: SparkSession, dir: String) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    (root.getFileSystem(s.sparkContext.hadoopConfiguration), root)
  }

  private def parseMeta(txt: String,
      p: org.apache.hadoop.fs.Path): IndexMeta = {
    def field(name: String): Option[Int] =
      (s""""$name"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(txt)
        .map(_.group(1).toInt)
    val nb = field("nBuckets").getOrElse(throw new IllegalStateException(
      s"malformed $p: $txt"))
    IndexMeta(nb, field("schema").getOrElse(0),
      field("gen").getOrElse(0), field("dataGen").getOrElse(0))
  }

  private def readMetaFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): IndexMeta = {
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    parseMeta(txt, p)
  }

  /** The newest published meta, or None for a dir with no index (or a
    * pre-config legacy index). One LIST + one tiny read; no Spark job.
    */
  private[graft] def resolveMeta(s: SparkSession,
      dir: String): Option[IndexMeta] = {
    val (fs, root) = hadoopFs(s, dir)
    if (!fs.exists(root)) return None
    val metas = fs.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case MetaName(g) => Some((if (g == null) 0 else g.toInt,
          st.getPath))
        case _ => None
      }
    }
    if (metas.isEmpty) None
    else {
      val (gen, p) = metas.maxBy(_._1)
      val m = readMetaFile(fs, p)
      // the filename's generation is authoritative for ordering; a
      // legacy gen-0 file has no gen field and defaults to 0
      Some(m.copy(gen = gen))
    }
  }

  /** The live directory of one artifact under the resolved data
    * generation — `name/` at dataGen 0, `name_gN/` after N
    * compactions.
    */
  private[graft] def artifactDir(dir: String, name: String,
      dataGen: Int): String =
    if (dataGen == 0) s"$dir/$name" else s"$dir/${name}_g$dataGen"

  /** Test/ops visibility: where an artifact currently lives. */
  private[graft] def liveArtifactDir(s: SparkSession, dir: String,
      name: String): String =
    artifactDir(dir, name,
      resolveMeta(s, dir).map(_.dataGen).getOrElse(0))

  /** Resolve for a READ path: stored meta wins; `requested` must match
    * it; a meta-less dir (index predating the config, or not yet
    * built) falls back to the historic default without writing.
    */
  private def resolveOrLegacy(s: SparkSession, dir: String,
      requested: Option[Int] = None): IndexMeta = {
    val m = resolveMeta(s, dir)
      .getOrElse(IndexMeta(requested.getOrElse(defaultBuckets), 0, 0, 0))
    requested.filter(_ != m.nBuckets).foreach(r =>
      throw new IllegalArgumentException(
        s"index at $dir was built with nBuckets=${m.nBuckets}; cannot " +
          s"use $r — hashing with a different modulus would mis-bucket " +
          "postings"))
    m
  }

  /** Publish the FIRST meta (gen 0) by exclusive create (overwrite =
    * false — atomic on HDFS-likes, best-effort on a raw local FS; see
    * the guarantee matrix above): two concurrent first builds cannot
    * both publish; the loser falls back to the winner's meta and
    * validates its requested count against it, refusing loudly on
    * mismatch instead of silently mis-bucketing its postings. The
    * failure-handling is scoped precisely: only the CREATE itself is
    * read as "lost the race" — an I/O failure during write/close
    * (disk full, quota) deletes the partial file and rethrows, so a
    * torn meta can never wedge every later read as 'malformed'.
    */
  private def createFirstMeta(s: SparkSession, dir: String,
      requested: Option[Int]): IndexMeta = {
    val (fs, root) = hadoopFs(s, dir)
    val n = requested.getOrElse(defaultBuckets)
    require(n >= 1, s"nBuckets must be >= 1, got $n")
    val m = IndexMeta(n, schema = 2, gen = 0, dataGen = 0)
    val p = new org.apache.hadoop.fs.Path(root, metaFileName(0))
    val created =
      try Some(fs.create(p, false))
      catch { case _: java.io.IOException => None }
    created match {
      case Some(out) =>
        try {
          try out.write(metaJson(m)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        } catch { case e: Throwable =>
          // write/close failed AFTER a successful create: the torn
          // final file is ours to remove — leaving it would make every
          // later read refuse as 'malformed' and misreport an I/O
          // failure as corruption with no self-heal
          try { fs.delete(p, false); () }
          catch { case _: java.io.IOException => () }
          throw e
        }
        m
      case None if fs.exists(p) =>
        // lost the race: defer to (and validate against) the winner
        resolveOrLegacy(s, dir, requested)
      case None =>
        throw new IllegalStateException(
          s"cannot publish $p — the index's bucket count would be " +
            "unpinned and later probes would hash with the default")
    }
  }

  /** Publish a maintenance meta (gen >= 1): full write to a tmp name,
    * then atomic rename to the fresh generation name. A crash leaves
    * at worst an orphan tmp (cleared by the next compaction), never a
    * torn generation file; a rename collision means a concurrent
    * maintenance op broke the single-maintainer contract — refused
    * loudly, never silently overwritten.
    */
  private def publishMeta(s: SparkSession, dir: String,
      m: IndexMeta): Unit = {
    require(m.gen >= 1, "gen-0 meta publishes via createFirstMeta")
    val (fs, root) = hadoopFs(s, dir)
    val p = new org.apache.hadoop.fs.Path(root, metaFileName(m.gen))
    val tmp = new org.apache.hadoop.fs.Path(root,
      s"._index_meta_tmp_${java.util.UUID.randomUUID()}")
    try {
      val out = fs.create(tmp, false)
      try out.write(metaJson(m)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } catch { case e: Throwable =>
      try { fs.delete(tmp, false); () }
      catch { case _: java.io.IOException => () }
      throw e
    }
    if (!fs.rename(tmp, p)) {
      try { fs.delete(tmp, false); () }
      catch { case _: java.io.IOException => () }
      throw new IllegalStateException(
        s"cannot publish $p — another maintenance op published this " +
          "generation concurrently (refresh/delete/compact are " +
          "single-maintainer); re-resolve and retry")
    }
  }

  // ---- tombstones ----------------------------------------------------

  /** The distinct tombstoned doc_ids, or None when the index holds no
    * deletes (an fs existence check — no job, no read). Doc-count
    * bounded: the ledger never exceeds the `dl` artifact probes
    * already read.
    */
  private def tombstones(s: SparkSession, dir: String,
      m: IndexMeta): Option[DataFrame] = {
    val (fs, _) = hadoopFs(s, dir)
    val p = artifactDir(dir, "tomb", m.dataGen)
    if (fs.exists(new org.apache.hadoop.fs.Path(p)))
      Some(s.read.parquet(p).select(col("doc_id")).distinct())
    else None
  }

  private def antiTomb(df: DataFrame, tomb: Option[DataFrame]): DataFrame =
    tomb.fold(df)(t => df.join(t, Seq("doc_id"), "left_anti"))

  /** Tombstone documents out of the index — the takedown verb every
    * LLM curation pipeline eventually needs (the reference retires
    * data as a first-class protocol op via ChunkStore ref-counting,
    * `hbase.clj:156-172`; the vector index honors it with s11's
    * versioned delete; this is the text mirror). O(deleted) rows
    * appended to the `tomb` ledger; zero postings I/O — the classic
    * inverted-index delete (Lucene's liveDocs): probes anti-join the
    * ledger, compaction folds the docs out of postings/dfreq/dl and
    * clears it. Deleting an id twice is idempotent; deleting an id
    * that was never indexed refuses loudly (a takedown that silently
    * did nothing is the worst failure mode a takedown can have).
    * Returns the number of ids tombstoned. Re-indexing a tombstoned
    * id refuses until compaction folds it out of `dl`.
    */
  def deleteFromTextIndex(s: SparkSession, dir: String,
      rawIds: DataFrame): Long = {
    val m = resolveMeta(s, dir).getOrElse(throw new IllegalStateException(
      s"no text index at $dir to delete from"))
    val idType = rawIds.schema("doc_id").dataType
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType)
    require(integral(idType),
      s"deleteFromTextIndex needs an integral doc_id, got $idType")
    val ids = rawIds.select(col("doc_id").cast("long").as("doc_id"))
      .distinct().cache()
    try {
      val dlDir = artifactDir(dir, "dl", m.dataGen)
      val (fs, _) = hadoopFs(s, dir)
      require(fs.exists(new org.apache.hadoop.fs.Path(dlDir)),
        s"no document ledger at $dlDir — the index holds no documents")
      val unknown = ids.join(
          s.read.parquet(dlDir).select(col("doc_id")),
          Seq("doc_id"), "left_anti")
        .limit(5).collect().map(_.getLong(0))
      require(unknown.isEmpty,
        s"deleteFromTextIndex: doc_ids never indexed " +
          s"(e.g. ${unknown.mkString(", ")}) — a takedown that " +
          "silently misses its target must refuse")
      val n = ids.count()
      ids.write.mode("append")
        .parquet(artifactDir(dir, "tomb", m.dataGen))
      n
    } finally { ids.unpersist(); () }
  }

  /** Build or incrementally extend the index with `docs` (append-only:
    * doc_ids must be NEW — re-indexing an existing doc would double-
    * count its tf/df/cf/dl/stats and skew every BM25 score). One
    * tokenize pass; every artifact appends. The append-only contract
    * is ENFORCED, not assumed: the batch anti-checks against the
    * existing `dl` doc_ids (one doc-count-sized read per refresh —
    * bounded by the artifact the refresh appends to anyway) and fails
    * loudly on overlap, naming offenders. Tombstoned doc_ids count as
    * indexed until compaction folds them out.
    */
  def indexDocuments(s: SparkSession, rawDocs: DataFrame,
      dir: String, nBuckets: Option[Int] = None): Unit = {
    // schema validation up front: the ledger checks and the SQL verb
    // decode doc_id as LONG — an int-typed source would otherwise die
    // in a getLong ClassCastException deep inside a check instead of
    // the loud, named refusals this surface standardizes on
    val idType = rawDocs.schema("doc_id").dataType
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType)
    require(integral(idType),
      s"indexDocuments needs an integral doc_id, got $idType")
    val docs = rawDocs.select(col("doc_id").cast("long").as("doc_id"),
      col("text"))
    val m = resolveMeta(s, dir) match {
      case Some(m0) =>
        nBuckets.filter(_ != m0.nBuckets).foreach(r =>
          throw new IllegalArgumentException(
            s"index at $dir was built with nBuckets=${m0.nBuckets}; " +
              s"cannot use $r — hashing with a different modulus " +
              "would mis-bucket postings"))
        ensureSchemaStamp(s, dir, m0)
      case None => createFirstMeta(s, dir, nBuckets)
    }
    val nb = m.nBuckets
    // append-only enforcement, both directions: against the existing
    // ledger AND within the batch itself (a doc appearing twice in
    // one batch would double-count exactly like a re-index)
    val inBatchDup = docs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n")).where(col("n") > 1)
      .limit(5).collect().map(_.getLong(0))
    require(inBatchDup.isEmpty,
      s"indexDocuments batch contains duplicate doc_ids " +
        s"(e.g. ${inBatchDup.mkString(", ")}) — dedup the batch first")
    val dlDir = artifactDir(dir, "dl", m.dataGen)
    val dlPath = new org.apache.hadoop.fs.Path(dlDir)
    val fs = dlPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(dlPath)) {
      val dup = docs.select(col("doc_id"))
        .join(s.read.parquet(dlDir).select(col("doc_id")),
          Seq("doc_id"), "left_semi")
        .limit(5).collect().map(_.getLong(0))
      require(dup.isEmpty,
        s"indexDocuments is append-only: doc_ids already indexed " +
          s"(e.g. ${dup.mkString(", ")}) — re-indexing would " +
          "double-count them; rebuild the index or filter the batch " +
          "(tombstoned ids stay in the ledger until compaction)")
    }
    val t = toks(docs).cache()
    try {
      // dl (the dedup ledger AND the stats source of truth) writes
      // FIRST: if the batch tears mid-way (executor loss between
      // artifact writes), a retry of the same batch hits the ledger
      // check and REFUSES — a loud, diagnosable state instead of
      // silently double-counted scores. The torn state (dl rows with
      // no postings) needs a REBUILD to heal — compaction re-folds
      // whatever is on disk, it cannot resurrect the missing postings.
      t.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        .write.mode("append").parquet(dlDir)
      // postings carry the term's sorted POSITIONS (0-based token
      // offsets): tf is their count, and phrase/proximity probes
      // ([[probePhrase]]) intersect them with a +1 shift — bag-of-
      // words BM25 prunes the column away at scan time, so it pays
      // nothing for them
      val postings = t.groupBy(col("tok"), col("doc_id"))
        .agg(count(lit(1)).as("tf"),
          sort_array(collect_list(col("pos"))).as("pos"))
      bucketed(postings, nb).write.mode("append")
        .partitionBy("bucket")
        .parquet(artifactDir(dir, "postings", m.dataGen))
      bucketed(postings.groupBy(col("tok"))
          .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf")), nb)
        .write.mode("append").partitionBy("bucket")
        .parquet(artifactDir(dir, "dfreq", m.dataGen))
    } finally { t.unpersist(); () }
    maybeAutoCompact(s, dir)
  }

  /** Refreshing an index whose meta predates the positional-schema
    * stamp: validate ONCE that its existing postings are positional
    * (refusing here — where a mixed-schema index would be CREATED —
    * instead of on every later phrase probe), then publish a stamped
    * meta so phrase probes never pay the validation again.
    */
  private def ensureSchemaStamp(s: SparkSession, dir: String,
      m: IndexMeta): IndexMeta =
    if (m.schema >= 2) m
    else {
      val (fs, _) = hadoopFs(s, dir)
      val pDir = artifactDir(dir, "postings", m.dataGen)
      if (fs.exists(new org.apache.hadoop.fs.Path(pDir))) {
        val posted = s.read.parquet(pDir)
        require(posted.columns.contains("pos") &&
            posted.where(col("pos").isNull).limit(1).collect().isEmpty,
          s"index at $dir holds non-positional postings batches — " +
            "appending positional batches would create a mixed-schema " +
            "index phrase probes cannot serve; rebuild the index " +
            "instead of refreshing it")
      }
      val m2 = m.copy(schema = 2, gen = m.gen + 1)
      publishMeta(s, dir, m2)
      m2
    }

  /** Advisory post-batch auto-maintenance — the text-index member of
    * the store's `spark.graft.autoMaintain.*` policy family: with
    * `spark.graft.autoMaintain.textIndex.hotFileThreshold` set (> 0;
    * default 0 = off), a refresh that leaves the `dl` artifact holding
    * that many files triggers [[compactTextIndex]], so a streaming
    * maintainer's per-micro-batch appends keep file/row counts bounded
    * with no manual CALL. One bounded LIST to check; a maintenance
    * failure never fails the already-landed batch (it is logged — a
    * permanently failing compaction must leave an operator-visible
    * trail, not retry silently forever). A large index whose
    * POST-compaction file count still meets the threshold would
    * otherwise re-trigger a full O(index) compaction on every batch —
    * the floor is remembered (per JVM) and compaction re-arms only
    * when the count grows beyond it. Probes stay safe during
    * auto-compaction (snapshot isolation above); enable it only where
    * WRITES are single-maintainer (the streaming shape).
    */
  private val compactFloor =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private def maybeAutoCompact(s: SparkSession, dir: String): Unit = {
    // the conf parse sits OUTSIDE the advisory catch: a malformed
    // threshold is a caller bug that must refuse by name, not
    // silently disable maintenance forever
    val threshold = s.conf
      .getOption("spark.graft.autoMaintain.textIndex.hotFileThreshold")
      .map(v => try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"spark.graft.autoMaintain.textIndex.hotFileThreshold=$v " +
            "is not an integer")
      }).getOrElse(0)
    if (threshold > 0) try {
      val (fs, _) = hadoopFs(s, dir)
      def dlFiles(): Int = {
        val dl = new org.apache.hadoop.fs.Path(
          liveArtifactDir(s, dir, "dl"))
        fs.listStatus(dl).count(_.getPath.getName.startsWith("part-"))
      }
      val files = dlFiles()
      val floor = Option(compactFloor.get(dir)).map(_.intValue)
        .getOrElse(-1)
      if (files >= threshold && files > floor) {
        compactTextIndex(s, dir)
        val after = dlFiles()
        if (after >= threshold) {
          // compaction cannot get under the threshold on this index —
          // remember the floor so the next batches skip the O(index)
          // rewrite until the count actually grows past it
          compactFloor.put(dir, Integer.valueOf(after))
          log.warn(s"auto-compaction of text index at $dir left " +
            s"$after dl files (threshold $threshold) — the index has " +
            "outgrown the threshold; raise it (skipping further " +
            "auto-compactions until the file count grows)")
        } else {
          compactFloor.remove(dir); ()
        }
      }
    } catch { case scala.util.control.NonFatal(ex) =>
      log.warn(s"auto-compaction of text index at $dir failed (the " +
        "refresh itself landed; will retry next batch)", ex)
    }
  }

  /** (n_docs, avgdl) derived from the `dl` ledger — the one place
    * corpus-level BM25 stats come from (see the class doc on why they
    * are never persisted separately). One aggregate over the
    * doc-count-sized artifact every probe already reads.
    */
  private def dlStats(dl: DataFrame): DataFrame =
    dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("sd"))
      .select(col("nd").as("n_docs"),
        (col("sd").cast("double") / col("nd")).as("avgdl"))

  /** Demo query-term selection from the INDEX (a vocab-sized dfreq
    * scan, not a corpus re-tokenize): the `topTerms` most frequent
    * terms by total occurrences, t15's selection rule. Lucene-style
    * caveat: per-term cf includes tombstoned docs until compaction
    * (selection stats, not scoring stats — the probes themselves are
    * delete-exact).
    */
  def topIndexTerms(s: SparkSession, dir: String,
      n: Int = topTerms): Seq[String] = {
    val m = resolveOrLegacy(s, dir)
    s.read.parquet(artifactDir(dir, "dfreq", m.dataGen))
      .groupBy(col("tok"))
      .agg(sum(col("cf")).as("cf"))
      .orderBy(col("cf").desc, col("tok")).limit(n)
      .collect().map(_.getString(0)).toSeq
  }

  /** BM25-score the corpus against `terms` from the persisted index:
    * postings pruned to the terms' buckets, tombstoned docs
    * anti-joined out, per-term df derived from the SAME pruned live
    * rows the probe reads for tf (each (tok, doc_id) appears exactly
    * once across refresh batches, so df = the live row count — and
    * the `dfreq` artifact drops off the probe latency path
    * entirely), corpus stats derived from the live `dl`,
    * [[TextOps.bm25Tail]] for the scoring. Zero corpus I/O, zero
    * index rebuild, delete-exact with no compaction required.
    */
  def probeTextIndex(s: SparkSession, dir: String,
      terms: Seq[String]): DataFrame = {
    import s.implicits._
    require(terms.nonEmpty, "probe needs at least one query term")
    // dedup: a repeated query term would get two ranks and its BM25
    // contribution would sum twice — distinct preserves first-seen
    // order so rank assignment (and the fixed-order fold) is stable
    val qts = terms.distinct
    val m = resolveOrLegacy(s, dir)
    val qterms = broadcast(qts.zipWithIndex
      .map { case (t, i) => (t, i + 1) }.toDF("tok", "rk"))
    // the terms' partition keys, via the same hash AND modulus the
    // writer used (modulus from the index's own meta; hash computed
    // DRIVER-SIDE — no job just to hash a handful of query strings)
    val buckets = qts.map(termBucket(_, m.nBuckets)).distinct
    val tomb = tombstones(s, dir, m)
    val live = antiTomb(
      s.read.parquet(artifactDir(dir, "postings", m.dataGen))
        .where(col("bucket").isin(buckets: _*) &&
          col("tok").isin(qts: _*))
        .select(col("doc_id"), col("tok"), col("tf")), tomb)
    val tf = live.join(qterms, "tok")
      .select(col("doc_id"), col("tok"), col("rk"), col("tf"))
    val dfreq = live.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val dl = antiTomb(
      s.read.parquet(artifactDir(dir, "dl", m.dataGen)), tomb)
    TextOps.bm25Tail(tf, dfreq, dl, dlStats(dl), nRanks = qts.length)
  }

  /** PHRASE retrieval from the persisted index: documents containing
    * the exact consecutive term sequence, ranked by occurrence count
    * (ties to the smaller doc_id, top 20). Bag-of-words postings
    * cannot answer this; the stored POSITION lists can, with the
    * classic shifted-intersection: a phrase starts at p iff term i
    * sits at p + i for every i — so each term's postings explode to
    * (doc_id, pos - i) keys and a phrase occurrence is a key all
    * n terms share. 100 TB shape identical to the BM25 probe: only
    * the query terms' buckets are read (partition pruning + term
    * filter), the join keys on (doc_id, start), and rows are bounded
    * by the query terms' total position counts — the corpus is never
    * touched. The positional-schema guarantee is a METADATA read (the
    * meta stamp, written at build and re-validated at refresh) — only
    * a pre-stamp index pays the runtime null-scan validation.
    * Duplicate terms in the phrase are legal ("the the"): matching is
    * per-SLOT, not per-distinct-term. Tombstoned docs never match.
    */
  def probePhrase(s: SparkSession, dir: String,
      phrase: Seq[String], slop: Int = 0): DataFrame = {
    import s.implicits._
    require(phrase.nonEmpty, "phrase needs at least one term")
    require(slop >= 0, s"slop must be >= 0, got $slop")
    val m = resolveOrLegacy(s, dir)
    val distinctTerms = phrase.distinct
    val buckets = distinctTerms.map(termBucket(_, m.nBuckets)).distinct
    val slots = broadcast(phrase.zipWithIndex.toDF("tok", "slot"))
    val posted = s.read.parquet(artifactDir(dir, "postings", m.dataGen))
    require(posted.columns.contains("pos"),
      s"index at $dir predates positional postings — rebuild it " +
        "before phrase probing (BM25 probes still work)")
    val qpost0 = posted
      .where(col("bucket").isin(buckets: _*) &&
        col("tok").isin(distinctTerms: _*))
      .join(slots, "tok")
    // a null/missing position list means SOME batch predates the
    // positional schema: matching would silently skip its documents.
    // A stamped meta (schema >= 2) carries this guarantee as
    // metadata — the per-probe validation scan runs only for
    // pre-stamp indexes.
    if (m.schema < 2)
      require(qpost0.where(col("pos").isNull).limit(1).collect().isEmpty,
        s"index at $dir holds non-positional batches for the query " +
          "terms — rebuild it before phrase probing")
    val qpost = antiTomb(qpost0, tombstones(s, dir, m))
    val matches =
      if (slop == 0) {
        // exact phrase: one groupBy does the shifted intersection
        qpost
          .select(col("doc_id"), col("slot"),
            explode(col("pos")).as("p"))
          .select(col("doc_id"), col("slot"),
            (col("p") - col("slot")).as("start"))
          .groupBy(col("doc_id"), col("start"))
          .agg(count(lit(1)).as("nSlots"))
          .where(col("nSlots") === phrase.length)
          .select(col("doc_id"), col("start"))
      } else {
        // PROXIMITY: terms in order, each at most slop positions
        // beyond strictly-adjacent (p_{i+1} - p_i in [1, 1 + slop]).
        // A chain of per-slot equi-joins on doc_id with a range
        // filter; each step dedups (doc, start, prev) so fan-out is
        // bounded by the terms' position counts, and a start matches
        // iff at least one chain survives to the last slot.
        def slotPos(i: Int) = qpost.where(col("slot") === i)
          .select(col("doc_id"), explode(col("pos")).as("p"))
        var mm = slotPos(0)
          .select(col("doc_id"), col("p").as("start"),
            col("p").as("prev"))
        (1 until phrase.length).foreach { i =>
          mm = mm.join(slotPos(i), "doc_id")
            .where(col("p") > col("prev") &&
              col("p") <= col("prev") + 1 + slop)
            .select(col("doc_id"), col("start"), col("p").as("prev"))
            .distinct()
        }
        mm.select(col("doc_id"), col("start")).distinct()
      }
    matches
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(col("n_matches").desc, col("doc_id"))
      .limit(20)
  }

  /** Demo phrase selection from the INDEX (the positional analog of
    * [[topIndexTerms]]): the corpus's most frequent live n-gram
    * (n >= 2), by the same shifted-intersection over ALL postings —
    * count-desc with a lexicographic tie-break. One index-wide pass
    * (tombstoned docs excluded — unlike dfreq-based selection this
    * path scans postings anyway, so delete-exactness is free); a real
    * retrieval caller brings its own phrase.
    */
  def topIndexNgram(s: SparkSession, dir: String,
      n: Int = 2): Seq[String] = {
    require(n >= 2, s"an n-gram phrase needs n >= 2, got $n")
    val m = resolveOrLegacy(s, dir)
    val posted = s.read.parquet(artifactDir(dir, "postings", m.dataGen))
    require(posted.columns.contains("pos"),
      s"index at $dir predates positional postings — rebuild it")
    // a mixed index (legacy batches without position lists) would
    // silently select the n-gram from a fraction of the corpus —
    // refuse like probePhrase does (metadata stamp first)
    if (m.schema < 2)
      require(posted.where(col("pos").isNull).limit(1).collect().isEmpty,
        s"index at $dir holds non-positional batches — rebuild it")
    val p = antiTomb(posted.select(col("doc_id"), col("tok"),
      explode(col("pos")).as("p")), tombstones(s, dir, m))
    val joined = (1 until n).foldLeft(
      p.select(col("doc_id"), col("tok").as("w0"), col("p"))) {
      case (acc, i) =>
        acc.join(p.select(col("doc_id"), col("tok").as(s"w$i"),
          (col("p") - i).as("p")), Seq("doc_id", "p"))
    }
    val ws = (0 until n).map(i => col(s"w$i"))
    val top = joined
      .groupBy(ws: _*).agg(count(lit(1)).as("cnt"))
      .orderBy((col("cnt").desc +: ws): _*).limit(1)
      .collect().headOption.getOrElse(throw new IllegalArgumentException(
        s"index at $dir holds no $n-gram (every document is shorter " +
          s"than $n tokens) — pass an explicit phrase instead"))
    (0 until n).map(top.getString)
  }

  /** The bigram instance of [[topIndexNgram]] — kept as the named
    * two-term selection t21/t22 gate on.
    */
  def topIndexBigram(s: SparkSession, dir: String): Seq[String] =
    topIndexNgram(s, dir, 2)

  /** Fold the per-batch artifacts back to one row per key and fold
    * TOMBSTONED docs out of postings/dfreq/dl (clearing the ledger) —
    * refreshes append a row-set per batch, which probes SUM over, and
    * deletes append tombstones, which probes anti-join, so
    * correctness never needs this; what it bounds is file/row counts
    * after thousands of micro-refreshes (the streaming st17 shape)
    * and the anti-join work deletes impose on every probe.
    *
    * SNAPSHOT-ISOLATED (see the class doc): the fold writes a
    * complete new artifact set under the next data generation, then
    * atomically publishes a meta generation pointing at it — a
    * concurrent probe keeps reading the generation it resolved. The
    * PREVIOUS generation's directories are garbage-collected by the
    * NEXT compaction (grace = one generation), so only writes keep
    * the single-maintainer contract. Crash-safe and SELF-HEALING: a
    * crash before publish leaves unreferenced next-gen debris that
    * the following compaction clears; a crash after publish leaves
    * stale old-gen dirs the following compaction collects. Per-term
    * dfreq is RECOMPUTED from the folded postings (df = live row
    * count, cf = live tf sum), so selection stats are delete-exact
    * again after every compaction.
    */
  def compactTextIndex(s: SparkSession, dir: String): Unit = {
    val (fs, root) = hadoopFs(s, dir)
    // heal debris from the PRE-generation swap-style compactor (old
    // indexes only): a live gen-0 dir retired to `_old` with the
    // promotion never landing means a crash hit the legacy swap
    // window — restore it; surviving _old/_compact_tmp after that is
    // stale debris
    Seq("postings", "dfreq", "dl", "stats").foreach { name =>
      val live = new org.apache.hadoop.fs.Path(root, name)
      val old = new org.apache.hadoop.fs.Path(root, s".${name}_old")
      val tmp = new org.apache.hadoop.fs.Path(root,
        s".${name}_compact_tmp")
      if (!fs.exists(live) && fs.exists(old))
        require(fs.rename(old, live), s"compact: cannot restore $old")
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(tmp)) fs.delete(tmp, true)
    }
    // legacy artifact: stats are derived from dl now (class doc); a
    // pre-derivation index's stats dir is dead weight — clear it
    val legacyStats = new org.apache.hadoop.fs.Path(root, "stats")
    if (fs.exists(legacyStats)) fs.delete(legacyStats, true)
    // orphan meta tmp files from a crashed publish
    fs.listStatus(root).foreach { st =>
      if (st.getPath.getName.startsWith("._index_meta_tmp_"))
        fs.delete(st.getPath, false)
    }
    // a pre-config index has no meta to bump — pin the historic
    // default first so the new generation has a pointer to live in
    val m = resolveMeta(s, dir).getOrElse(createFirstMeta(s, dir, None))
    val d0 = m.dataGen
    val d1 = d0 + 1
    // clear debris from a crashed previous attempt at this generation
    Seq("postings", "dfreq", "dl", "tomb").foreach { name =>
      val p = new org.apache.hadoop.fs.Path(artifactDir(dir, name, d1))
      if (fs.exists(p)) fs.delete(p, true)
    }
    val nb = m.nBuckets
    val tomb = tombstones(s, dir, m)
    // (A no-tombstone "no-op tier" that skipped compaction outright
    // when file counts were already low was tried and REVERTED: the
    // maintenance CALL's contract — verified by TextIndexSpec — is
    // that every explicit compaction folds batch artifacts to one row
    // per key, advances the data generation, and heals crash debris;
    // skipping is observable in all three. The no-tombstone dfreq
    // FOLD below keeps the cheap part of that idea contract-safely.)
    // postings rows are unique per (tok, doc_id) — append-only
    // doc_ids — so compaction only re-buckets them into bounded files
    // and folds tombstoned docs out; the position lists ride along (a
    // pre-positional legacy index simply has none to carry)
    val posted = s.read.parquet(artifactDir(dir, "postings", d0))
    val positional = posted.columns.contains("pos")
    // a pre-stamp index that proves positional here gets the stamp —
    // compaction reads everything anyway, so the check is ~free and
    // upgrades the index to job-free phrase probes
    val schemaOut =
      if (m.schema >= 2) m.schema
      else if (positional &&
        posted.where(col("pos").isNull).limit(1).collect().isEmpty) 2
      else m.schema
    val livePost = antiTomb(posted.select(
      Seq(col("tok"), col("doc_id"), col("tf")) ++
        (if (positional) Seq(col("pos")) else Seq.empty): _*), tomb)
    bucketed(livePost, nb).repartition(col("bucket"))
      .write.partitionBy("bucket")
      .parquet(artifactDir(dir, "postings", d1))
    // dfreq: with tombstones it is recomputed from the FOLDED postings
    // — that is what folds tombstoned docs out of the per-term df/cf.
    // With NO tombstones the old per-batch dfreq rows are additive
    // (indexDocuments enforces append-only doc_ids across AND within
    // batches, so per-batch df/cf partition the totals) — fold THEM
    // instead: a vocab×batches-sized aggregate replacing a re-read +
    // groupBy over every posting row (guide §2.3, aggregate the small
    // proxy, not the payload).
    val dfreq =
      if (tomb.isEmpty)
        s.read.parquet(artifactDir(dir, "dfreq", d0))
          .groupBy(col("tok"))
          .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"))
      else
        s.read.parquet(artifactDir(dir, "postings", d1))
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    bucketed(dfreq, nb).repartition(col("bucket"))
      .write.partitionBy("bucket")
      .parquet(artifactDir(dir, "dfreq", d1))
    val dl = antiTomb(s.read.parquet(artifactDir(dir, "dl", d0)), tomb)
    dl.coalesce(math.max(1, dl.rdd.getNumPartitions / 8))
      .write.parquet(artifactDir(dir, "dl", d1))
    // no tomb dir in the new generation: every tombstone is folded
    publishMeta(s, dir, m.copy(schema = schemaOut, gen = m.gen + 1,
      dataGen = d1))
    // GC data generations nobody can still be reading: the grace
    // window keeps d0 (a probe that resolved just before the publish
    // may still be scanning it) and collects everything older
    (0 to d1 - 2).foreach { g =>
      Seq("postings", "dfreq", "dl", "tomb").foreach { name =>
        val p = new org.apache.hadoop.fs.Path(artifactDir(dir, name, g))
        if (fs.exists(p)) fs.delete(p, true)
      }
    }
  }

  /** Corpus-level statistics from the INDEX ARTIFACTS alone —
    * vocabulary size, document count, total token volume, the
    * heaviest term's document frequency — with zero corpus I/O: one
    * vocab-sized dfreq aggregate (df summed across refresh batches
    * first, so a multi-batch index reports the same numbers as a
    * one-shot build) + one doc-count-sized dl aggregate. The curation
    * dashboard read that would otherwise re-tokenize 100 TB.
    * DELETE-EXACT: doc/token counts anti-join the tombstone ledger
    * (free — they read `dl` anyway); with live tombstones the
    * per-term df correction additionally needs one postings pass to
    * find the deleted docs' terms (the inverted index maps term→doc,
    * not doc→term) — compaction folds the tombstones and restores
    * the vocab-sized read.
    */
  def textIndexStats(s: SparkSession, dir: String): DataFrame = {
    val m = resolveOrLegacy(s, dir)
    val tomb = tombstones(s, dir, m)
    val dfSum = s.read.parquet(artifactDir(dir, "dfreq", m.dataGen))
      .groupBy(col("tok")).agg(sum(col("df")).as("df"))
    val df = tomb match {
      case None => dfSum
      case Some(t) =>
        val deadDf = s.read
          .parquet(artifactDir(dir, "postings", m.dataGen))
          .select(col("tok"), col("doc_id"))
          .join(t, Seq("doc_id"), "left_semi")
          .groupBy(col("tok")).agg(count(lit(1)).as("ddf"))
        dfSum.join(deadDf, Seq("tok"), "left")
          .select(col("tok"),
            (col("df") - coalesce(col("ddf"), lit(0L))).as("df"))
          .where(col("df") > 0)
    }
    val stats = antiTomb(
        s.read.parquet(artifactDir(dir, "dl", m.dataGen)), tomb)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_tokens"))
    df.agg(count(lit(1)).as("n_terms"), max(col("df")).as("max_df"))
      .crossJoin(stats)
      .select(col("n_terms"), col("n_docs"), col("total_tokens"),
        col("max_df"))
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
    // probe from the store with a FIVE-term query (the multi-term
    // retrieval case t15's 3-term pivot never exercised) — must equal
    // the 5-term full-corpus oracle, which gates the parquet
    // round-trip, the cross-batch df/stats summing, and the N-rank
    // bm25Tail fold. The bench times the probe on a build-once index.
    Q("t18_bm25_persisted", Some(TextOps.bm25OracleSqlN(5)),
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
    // probe_text_index with the 5-term query — the full-corpus oracle
    // again, so the procedure surface AND the compaction sit inside
    // the hash gate.
    Q("t19_bm25_sql", Some(TextOps.bm25OracleSqlN(5)),
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
        // array-typed terms: tokens may legally contain any delimiter
        // (they are space-split only), so each is its own SQL string
        // literal — backslash- AND quote-escaped (Spark string
        // literals interpret backslash escapes), never
        // joined-and-resplit
        val terms = topIndexTerms(s, dir)
          .map(t => "'" + t.replace("\\", "\\\\").replace("'", "''") +
            "'").mkString(", ")
        s.sql(s"CALL $cat.system.probe_text_index(index_dir => '$dir', " +
          s"terms => array($terms))")
      }),

    // Index observability: vocab/doc/token-volume stats off the index
    // artifacts alone (df summed across TWO refresh batches — the
    // cross-batch fold is inside the gate); the oracle re-derives
    // them by tokenizing the corpus in DuckDB.
    Q("t20_text_index_stats", Some(statsOracleSql("")),
      (s, d) => {
        val dir = Files.createTempDirectory("graft_tidx_st_").toString
        val docs = Tables.load(s, d, "documents")
        indexDocuments(s, docs.where(col("doc_id") % 2 === 0), dir)
        indexDocuments(s, docs.where(col("doc_id") % 2 =!= 0), dir)
        textIndexStats(s, dir)
      },
      benchSecs = Some((s, d) => {
        val dir = builtRoot(s, d)
        val t0 = System.nanoTime()
        textIndexStats(s, dir).count()
        (System.nanoTime() - t0) / 1e9
      })),

    // PHRASE retrieval: the corpus's most frequent bigram (selected
    // from the index, count-desc lexicographic tie-break), matched as
    // an exact consecutive sequence via the stored position lists and
    // ranked by occurrence count. Built across TWO refresh batches so
    // the positional schema rides the append path inside the gate;
    // the oracle re-derives positions, the top bigram AND the match
    // counts from the raw corpus in DuckDB. The bench times the
    // probe on a build-once index.
    Q("t21_phrase_persisted", Some(phraseOracleSql),
      (s, d) => {
        val dir = Files.createTempDirectory("graft_tidx_ph_").toString
        val docs = Tables.load(s, d, "documents")
        indexDocuments(s, docs.where(col("doc_id") % 2 === 0), dir)
        indexDocuments(s, docs.where(col("doc_id") % 2 =!= 0), dir)
        probePhrase(s, dir, topIndexBigram(s, dir))
      },
      benchSecs = Some((s, d) => {
        val dir = builtRoot(s, d)
        val phrase = topIndexBigram(s, dir)
        val t0 = System.nanoTime()
        probePhrase(s, dir, phrase).count()
        (System.nanoTime() - t0) / 1e9
      })),

    // PROXIMITY retrieval: the same top bigram matched with slop=2
    // (the second term may trail the first by up to 3 positions, in
    // order) — "terms near each other" is the retrieval ask between
    // exact phrase and bag-of-words. n_matches counts DISTINCT start
    // positions with at least one surviving chain, which is what the
    // per-step dedup computes and what the oracle's count(DISTINCT
    // p0.i) over a range join replays.
    Q("t22_proximity_persisted", Some(proximityOracleSql),
      (s, d) => {
        val dir = Files.createTempDirectory("graft_tidx_px_").toString
        val docs = Tables.load(s, d, "documents")
        indexDocuments(s, docs.where(col("doc_id") % 2 === 0), dir)
        indexDocuments(s, docs.where(col("doc_id") % 2 =!= 0), dir)
        probePhrase(s, dir, topIndexBigram(s, dir), slop = 2)
      },
      benchSecs = Some((s, d) => {
        val dir = builtRoot(s, d)
        val phrase = topIndexBigram(s, dir)
        val t0 = System.nanoTime()
        probePhrase(s, dir, phrase, slop = 2).count()
        (System.nanoTime() - t0) / 1e9
      })),

    // DELETE, pre-compaction: build over the even doc_ids, tombstone
    // the %6==0 docs, APPEND-refresh the odds, probe — the takedown
    // path an LLM curation pipeline runs daily, with the delete
    // LANDING BETWEEN two refreshes so the ledger must survive a
    // refresh. Scores must hash-equal DuckDB over the REDUCED corpus
    // (tf/df/dl/stats all delete-exact through the anti-join path —
    // no compaction ran); term SELECTION deliberately stays
    // Lucene-style (dfreq includes tombstones until compaction), so
    // the oracle picks terms over the FULL corpus and scores over the
    // reduced one — exactly what the engine does. The bench times
    // the tombstone-aware probe on a build-once deleted index.
    Q("t23_bm25_delete", Some(bm25DeleteOracleSql),
      (s, d) => {
        val dir = Files.createTempDirectory("graft_tidx_del_").toString
        val docs = Tables.load(s, d, "documents")
        indexDocuments(s, docs.where(col("doc_id") % 2 === 0), dir)
        deleteFromTextIndex(s, dir,
          docs.where(col("doc_id") % 6 === 0).select(col("doc_id")))
        indexDocuments(s, docs.where(col("doc_id") % 2 =!= 0), dir)
        probeTextIndex(s, dir, topIndexTerms(s, dir))
      },
      benchSecs = Some((s, d) => {
        val dir = deletedRoot(s, d)
        val terms = topIndexTerms(s, dir)
        val t0 = System.nanoTime()
        probeTextIndex(s, dir, terms).count()
        (System.nanoTime() - t0) / 1e9
      })),

    // DELETE + COMPACTION: tombstone, then fold — the compacted index
    // must behave as if the deleted docs were never indexed: the top
    // bigram re-selects over the reduced corpus, phrase matches
    // hash-equal DuckDB over it, the published meta generation is 1
    // and the tombstone ledger is GONE (both pinned as columns). The
    // bench times the post-fold phrase probe (no anti-join left to
    // pay) on a build-once root.
    Q("t24_phrase_delete_compact", Some(phraseDeleteOracleSql),
      (s, d) => {
        val dir = Files.createTempDirectory("graft_tidx_dc_").toString
        val docs = Tables.load(s, d, "documents")
        indexDocuments(s, docs.where(col("doc_id") % 2 === 0), dir)
        indexDocuments(s, docs.where(col("doc_id") % 2 =!= 0), dir)
        deleteFromTextIndex(s, dir,
          docs.where(col("doc_id") % 6 === 0).select(col("doc_id")))
        compactTextIndex(s, dir)
        val m = resolveMeta(s, dir).get
        val (fs, _) = hadoopFs(s, dir)
        val tombGone = !fs.exists(new org.apache.hadoop.fs.Path(
          artifactDir(dir, "tomb", m.dataGen)))
        probePhrase(s, dir, topIndexBigram(s, dir))
          .withColumn("data_gen", lit(m.dataGen.toLong))
          .withColumn("tomb_cleared", lit(if (tombGone) 1L else 0L))
      },
      benchSecs = Some((s, d) => {
        val dir = deletedCompactRoot(s, d)
        val phrase = topIndexBigram(s, dir)
        val t0 = System.nanoTime()
        probePhrase(s, dir, phrase).count()
        (System.nanoTime() - t0) / 1e9
      })),

    // DELETE-exact observability, pre-compaction: stats over a
    // tombstoned index must equal the reduced corpus — n_docs and
    // token volume via the dl anti-join, n_terms/max_df via the
    // per-term df correction (the one read that pays a postings pass
    // while tombstones are live; the class doc owns that trade). The
    // bench times exactly that corrected-stats path.
    Q("t25_stats_delete", Some(statsOracleSql(
        " WHERE doc_id % 6 <> 0")),
      (s, d) => {
        val dir = Files.createTempDirectory("graft_tidx_sd_").toString
        val docs = Tables.load(s, d, "documents")
        indexDocuments(s, docs.where(col("doc_id") % 2 === 0), dir)
        indexDocuments(s, docs.where(col("doc_id") % 2 =!= 0), dir)
        deleteFromTextIndex(s, dir,
          docs.where(col("doc_id") % 6 === 0).select(col("doc_id")))
        textIndexStats(s, dir)
      },
      benchSecs = Some((s, d) => {
        val dir = deletedRoot(s, d)
        val t0 = System.nanoTime()
        textIndexStats(s, dir).count()
        (System.nanoTime() - t0) / 1e9
      })),

    // PROXIMITY over a THREE-term chain: the corpus's most frequent
    // trigram matched with slop=1 (each term may trail the previous
    // by up to 2 positions, in order) — gates the n-term chain's
    // per-step dedup against a DuckDB double range-join replay, which
    // t22's 2-term window could not (a 2-term chain has no
    // intermediate dedup step). Selection (the trigram) rides the
    // same index-wide positional pass as the bigram helper.
    Q("t26_proximity3_persisted", Some(proximity3OracleSql),
      (s, d) => {
        val dir = Files.createTempDirectory("graft_tidx_p3_").toString
        val docs = Tables.load(s, d, "documents")
        indexDocuments(s, docs.where(col("doc_id") % 2 === 0), dir)
        indexDocuments(s, docs.where(col("doc_id") % 2 =!= 0), dir)
        probePhrase(s, dir, topIndexNgram(s, dir, 3), slop = 1)
      },
      benchSecs = Some((s, d) => {
        val dir = builtRoot(s, d)
        val phrase = topIndexNgram(s, dir, 3)
        val t0 = System.nanoTime()
        probePhrase(s, dir, phrase, slop = 1).count()
        (System.nanoTime() - t0) / 1e9
      }))
  )

  // build-once roots with the %6==0 docs tombstoned (t23/t25 bench:
  // the anti-join probe/stats paths) and additionally compacted
  // (t24 bench: the folded path)
  private val delRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val delCompactRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def deletedRoot(s: SparkSession, d: String): String =
    delRoots.computeIfAbsent(d, { _ =>
      val dir = Files.createTempDirectory("graft_tidx_delb_").toString
      val docs = Tables.load(s, d, "documents")
      indexDocuments(s, docs, dir)
      deleteFromTextIndex(s, dir,
        docs.where(col("doc_id") % 6 === 0).select(col("doc_id")))
      dir
    })

  private def deletedCompactRoot(s: SparkSession, d: String): String =
    delCompactRoots.computeIfAbsent(d, { _ =>
      val dir = Files.createTempDirectory("graft_tidx_dcb_").toString
      val docs = Tables.load(s, d, "documents")
      indexDocuments(s, docs, dir)
      deleteFromTextIndex(s, dir,
        docs.where(col("doc_id") % 6 === 0).select(col("doc_id")))
      compactTextIndex(s, dir)
      dir
    })

  /** The t20/t25 stats oracle: index-level stats re-derived from the
    * (optionally reduced) corpus in DuckDB. `where` scopes the corpus
    * — empty for the full-index gate, a doc_id predicate for the
    * post-delete gate.
    */
  private def statsOracleSql(where: String): String =
    "WITH toks AS (SELECT doc_id, " +
      "unnest(string_split(trim(text), ' ')) AS tok FROM documents" +
      where + "), " +
      "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1), " +
      "df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks " +
      "GROUP BY 1) " +
      "SELECT (SELECT count(*) FROM df) AS n_terms, " +
      "(SELECT count(*) FROM dl) AS n_docs, " +
      "(SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS total_tokens, " +
      "(SELECT CAST(max(df) AS BIGINT) FROM df) AS max_df"

  /** DuckDB replay of t23: term SELECTION over the FULL corpus (the
    * engine's dfreq keeps tombstoned docs until compaction —
    * Lucene-style selection stats), SCORING over the reduced corpus
    * (the probes are delete-exact). Derived from the t18 oracle by
    * targeted substitution with containment requires, so the texts
    * cannot silently drift.
    */
  private lazy val bm25DeleteOracleSql: String = {
    val base = TextOps.bm25OracleSqlN(5)
    val toksFrom = "WITH toks AS (SELECT doc_id, " +
      "unnest(string_split(trim(text), ' ')) AS tok FROM documents), "
    val toksTo = "WITH toksall AS (SELECT doc_id, " +
      "unnest(string_split(trim(text), ' ')) AS tok FROM documents), " +
      "toks AS (SELECT * FROM toksall WHERE doc_id % 6 <> 0), "
    require(base.contains(toksFrom), "t18 oracle toks CTE changed")
    val s1 = base.replace(toksFrom, toksTo)
    // only the SELECTION reads the full corpus
    val selFrom = "tok) AS rk FROM toks GROUP BY tok "
    val selTo = "tok) AS rk FROM toksall GROUP BY tok "
    require(s1.contains(selFrom), "t18 oracle q CTE changed")
    s1.replace(selFrom, selTo)
  }

  /** DuckDB replay of t24: the t21 derivation scoped to the reduced
    * corpus (selection AND matching — the fold removed the docs from
    * the postings the bigram helper scans), plus the two compaction
    * pins (published data generation, cleared ledger).
    */
  private lazy val phraseDeleteOracleSql: String = {
    val from = "FROM documents), "
    require(phraseOracleSql.contains(from), "t21 oracle toks CTE changed")
    val s1 = phraseOracleSql.replace(from,
      "FROM documents WHERE doc_id % 6 <> 0), ")
    val selFrom = "SELECT doc_id, n_matches FROM m "
    require(s1.contains(selFrom), "t21 oracle final select changed")
    s1.replace(selFrom,
      "SELECT doc_id, n_matches, CAST(1 AS BIGINT) AS data_gen, " +
        "CAST(1 AS BIGINT) AS tomb_cleared FROM m ")
  }

  /** DuckDB replay of t26: trigram selection (count-desc,
    * lexicographic tie-break over three slots) and the 3-term slop=1
    * chain — two ordered range-joins with the per-start dedup as
    * count(DISTINCT p0.i).
    */
  private lazy val proximity3OracleSql: String =
    "WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t " +
      "FROM documents), " +
      "pos AS (SELECT doc_id, i, t[i] AS tok FROM toks, " +
      "UNNEST(range(1, len(t) + 1)) AS u(i)), " +
      "tri AS (SELECT p0.tok AS w0, p1.tok AS w1, p2.tok AS w2, " +
      "count(*) AS n FROM pos p0 " +
      "JOIN pos p1 ON p1.doc_id = p0.doc_id AND p1.i = p0.i + 1 " +
      "JOIN pos p2 ON p2.doc_id = p0.doc_id AND p2.i = p0.i + 2 " +
      "GROUP BY 1, 2, 3), " +
      "sel AS (SELECT w0, w1, w2 FROM tri " +
      "ORDER BY n DESC, w0, w1, w2 LIMIT 1), " +
      "m AS (SELECT p0.doc_id, count(DISTINCT p0.i) AS n_matches " +
      "FROM pos p0 JOIN sel ON p0.tok = sel.w0 " +
      "JOIN pos p1 ON p1.doc_id = p0.doc_id " +
      "AND p1.i > p0.i AND p1.i <= p0.i + 2 AND p1.tok = sel.w1 " +
      "JOIN pos p2 ON p2.doc_id = p0.doc_id " +
      "AND p2.i > p1.i AND p2.i <= p1.i + 2 AND p2.tok = sel.w2 " +
      "GROUP BY 1) " +
      "SELECT doc_id, n_matches FROM m " +
      "ORDER BY n_matches DESC, doc_id LIMIT 20"

  /** DuckDB replay of t22: the t21 position/bigram derivation with
    * the adjacency join relaxed to the slop window [1, 3] and the
    * match count de-duplicated per start position.
    */
  private lazy val proximityOracleSql: String =
    "WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t " +
      "FROM documents), " +
      "pos AS (SELECT doc_id, i, t[i] AS tok FROM toks, " +
      "UNNEST(range(1, len(t) + 1)) AS u(i)), " +
      "big AS (SELECT p0.tok AS w0, p1.tok AS w1, count(*) AS n " +
      "FROM pos p0 JOIN pos p1 ON p1.doc_id = p0.doc_id " +
      "AND p1.i = p0.i + 1 GROUP BY 1, 2), " +
      "sel AS (SELECT w0, w1 FROM big ORDER BY n DESC, w0, w1 LIMIT 1), " +
      "m AS (SELECT p0.doc_id, count(DISTINCT p0.i) AS n_matches " +
      "FROM pos p0 JOIN sel ON p0.tok = sel.w0 " +
      "JOIN pos p1 ON p1.doc_id = p0.doc_id " +
      "AND p1.i > p0.i AND p1.i <= p0.i + 3 AND p1.tok = sel.w1 " +
      "GROUP BY 1) " +
      "SELECT doc_id, n_matches FROM m " +
      "ORDER BY n_matches DESC, doc_id LIMIT 20"

  /** DuckDB replay of t21: positions from the raw corpus (1-based `i`
    * — only deltas matter), the same count-desc/lexicographic bigram
    * selection, then the +1-shift phrase join and per-doc counts.
    */
  // lazy: referenced from `all` above, which initializes first
  private lazy val phraseOracleSql: String =
    "WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t " +
      "FROM documents), " +
      "pos AS (SELECT doc_id, i, t[i] AS tok FROM toks, " +
      "UNNEST(range(1, len(t) + 1)) AS u(i)), " +
      "big AS (SELECT p0.tok AS w0, p1.tok AS w1, count(*) AS n " +
      "FROM pos p0 JOIN pos p1 ON p1.doc_id = p0.doc_id " +
      "AND p1.i = p0.i + 1 GROUP BY 1, 2), " +
      "sel AS (SELECT w0, w1 FROM big ORDER BY n DESC, w0, w1 LIMIT 1), " +
      "m AS (SELECT p0.doc_id, count(*) AS n_matches FROM pos p0 " +
      "JOIN sel ON p0.tok = sel.w0 " +
      "JOIN pos p1 ON p1.doc_id = p0.doc_id AND p1.i = p0.i + 1 " +
      "AND p1.tok = sel.w1 GROUP BY 1) " +
      "SELECT doc_id, n_matches FROM m " +
      "ORDER BY n_matches DESC, doc_id LIMIT 20"

  private val counter = new java.util.concurrent.atomic.AtomicInteger()
}
