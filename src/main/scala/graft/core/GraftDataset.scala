package graft.core

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Model._

/** One versioned chunked-array dataset on the lake.
  *
  * Spark-native re-expression of the reference's Connection / Index /
  * ChunkStore protocols (hbase.clj:122-297) with the set-oriented read
  * path of SURVEY §3.1: a slab read is ONE job — batch as-of index
  * resolution (max_by aggregate) → chunk-level join against the chunk
  * table → flatMap decode to cells — instead of the reference's two
  * RPCs per coordinate.
  *
  * Commit protocol (SURVEY §4.5, replaces check-and-put CAS at
  * hbase.clj:241-245): writers stage chunks + index rows, then under a
  * commit lock validate that no version committed after their snapshot
  * touched an overlapping (variable, chunk-coord) set; the version
  * record rename is the atomic commit point (hbase.clj:263-268).
  *
  * Scale notes (the reference's chunk table is server-enumerable via
  * HBase scans, hbase.clj:285-289; a blob store is not): every stored
  * chunk is recorded in a commit-time parquet **manifest**
  * `(hash, nBytes)`, so gc / chunksDF / stats are distributed
  * joins/scans — no driver-side blob listing anywhere on the data
  * plane.
  */
class GraftDataset(val spark: SparkSession, val path: String) {
  import spark.implicits._

  private[core] def fs: FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The session's resolved Hadoop conf, serializable for executor-side
    * FileSystem access (never rebuild a default `Configuration()` on
    * executors — it drops s3a credentials/endpoints etc).
    */
  private[graft] val hconf =
    new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)

  private[core] val chunksDir = s"$path/chunks"
  private val refsDir = s"$path/refs"
  private val indicesDir = s"$path/indices"
  private val versionsDir = s"$path/versions"
  private val stagingDir = s"$path/staging"
  private val manifestDir = s"$path/manifest"
  private[graft] val scansDir = s"$path/scans"
  // retired version records: no longer readable as-of, but their
  // metadata is retained — compacted index rows still decode under
  // the writing version's variable shape
  private val expiredDir = s"$path/versions_expired"
  // cold storage for version records already folded into a metas
  // snapshot: never LISTed on any hot path (the snapshot carries id,
  // liveness and metadata), only point-read as a recovery fallback —
  // this is what keeps versions/ and versions_expired/ at
  // O(snapshotEvery) entries instead of O(#versions) at per-microbatch
  // commit rates (~500 paged LIST round trips per listing at 500k
  // one-file records on an object store)
  private val archiveDir = s"$path/versions_archive"
  // compacted version-metadata snapshots (see snapshotMetas below)
  private val metasSnapDir = s"$path/metas_snapshot"
  // merged index store (see compactIndexLog)
  private val mergedIdxDir = s"$path/indices_merged"

  /** Index rows. `writerVersion` is null for rows living in the
    * partition of the version that wrote them (the normal case); the
    * retention compactor ([[expireVersions]]) rewrites surviving rows
    * into the boundary partition and preserves the ORIGINAL writing
    * version here, because chunks decode under the metadata they were
    * written with. Absent in pre-compaction files → read as null.
    */
  private val indexSchema = StructType(Seq(
    StructField("variable", StringType),
    StructField("coord", ArrayType(LongType, containsNull = false)),
    StructField("chunkHash", StringType),
    StructField("writerVersion", LongType),
    // zone map: min/max over the tile's decoded values (fill included
    // for unwritten cells) under Spark SQL's total order — NaN compares
    // GREATER than everything, so a tile containing any NaN carries
    // vmax = NaN (it can satisfy any >/>= predicate) and an all-NaN
    // tile is [NaN, NaN]. Null only on rows from before this column
    // existed. Scans use them to skip chunks whose range cannot
    // satisfy a pushed value filter.
    StructField("vmin", DoubleType),
    StructField("vmax", DoubleType),
    // zone SUM stats: vsum = the tile's exact cell sum (fill included
    // for unwritten cells), vabs = the exact sum of |cell|. Non-null
    // ONLY when the sums are order-independent in IEEE double
    // arithmetic — every cell integral with the running |sum| within
    // 2^52 — or when the sum is a deterministic non-finite (any NaN
    // cell → NaN; +Inf/−Inf per IEEE propagation, which is
    // order-independent for the FINAL value). SUM/AVG(value) pushdown
    // folds these exactly; a null anywhere declines it. Null also on
    // rows from before these columns existed.
    StructField("vsum", DoubleType),
    StructField("vabs", DoubleType)))

  private val manifestSchema = StructType(Seq(
    StructField("hash", StringType),
    StructField("nBytes", LongType)))

  // ---------- versions (hbase.clj:263-297) ----------

  /** Optional memoization of the version log + metadata — the engine
    * analog of the reference's memoized version cache
    * (core.cache/core.memoize deps, built at hbase.clj:259-261). Every
    * scenario must behave identically with caching on and off
    * (with-and-without-caches, hbase_test.clj:107+); the cache is
    * invalidated on every commit through this handle.
    */
  @volatile private var cacheEnabled = false
  @volatile private var versionIdCache: Option[Seq[Long]] = None
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[Long, DatasetMeta]()

  def withVersionCache(enabled: Boolean): this.type = {
    cacheEnabled = enabled
    if (!enabled) invalidateCaches()
    this
  }

  private[core] def invalidateCaches(): Unit = {
    versionIdCache = None
    metaCache.clear()
  }

  /** Version-record entries returned by hot-path dir listings —
    * instrumentation for the bounded-listing gate in
    * MandolineScenarioSpec (the LIST analog of [[metaPointReads]]):
    * on an object store each listing costs ~1 paged round trip per
    * 1000 entries, so entries-listed is the real cost proxy.
    */
  private[graft] val versionListEntries =
    new java.util.concurrent.atomic.AtomicLong

  /** List the version-record ids in one of the hot dirs. After each
    * metas snapshot the folded records move to [[archiveDir]], so
    * these listings return O(snapshotEvery) entries regardless of
    * total history depth.
    */
  private def listRecordIds(dir: String): Seq[Long] = {
    val d = new Path(dir)
    if (!fs.exists(d)) Seq.empty[Long]
    else {
      val names = fs.listStatus(d).map(_.getPath.getName)
        .filter(_.endsWith(".json")).toSeq
      versionListEntries.addAndGet(names.length.toLong)
      GraftDataset.globalVersionListEntries.addAndGet(names.length.toLong)
      names.map(_.stripSuffix(".json").toLong)
    }
  }

  /** All committed versions, newest first, optional limit —
    * Connection.versions (hbase.clj:283-297) ordered numerically (the
    * reference leans on lexicographic row-key order; SURVEY §7.4 #5,
    * which it gets from ONE server-side HBase scan, hbase.clj:285-289).
    * Bounded driver I/O at any history depth: live ids ≤ the newest
    * snapshot come from the snapshot itself; only records newer than
    * the snapshot are listed (both hot dirs hold O(snapshotEvery)
    * files). A record present in versions_expired/ overrides a
    * stale-live snapshot entry (expiry is durable the instant the
    * record rename lands, snapshot or not).
    */
  def versionIds(): Seq[Long] = versionIdCache match {
    case Some(ids) if cacheEnabled => ids
    case _ =>
      // hot dirs FIRST, snapshot LAST: a concurrent snapshot fold
      // (which relocates hot records to the archive) lands either
      // after the listing (records still hot → listed) or before the
      // snapshot read (records folded → in the newer snapshot) — with
      // the opposite order a fold in between hides fresh commits from
      // this unlocked reader
      val listedLive = listRecordIds(versionsDir)
      val listedExpired = listRecordIds(expiredDir)
      val snap = snapshotMetas()
      val snapLive = snap.live.iterator.collect { case (id, true) => id }
      val ids = ((snapLive ++ listedLive).toSet -- listedExpired)
        .toSeq.sortBy(-_)
      if (cacheEnabled) versionIdCache = Some(ids)
      ids
  }

  def versions(limit: Option[Int] = None): Seq[Version] = {
    val ids = limit.fold(versionIds())(n => versionIds().take(n))
    val snap = snapshotMetas()
    ids.map(id => Version(id, snap.metas.getOrElse(id, metadata(id))))
  }

  /** Live + expired version ids (metadata exists for all of them;
    * only live ones are readable as-of). Snapshot ∪ the two bounded
    * hot-dir listings.
    */
  private[graft] def allVersionIds(): Seq[Long] = {
    // hot dirs first, snapshot last — see versionIds() for the
    // fold-race ordering argument
    val listed = listRecordIds(versionsDir) ++ listRecordIds(expiredDir)
    (snapshotMetas().metas.keySet ++ listed).toSeq.sortBy(-_)
  }

  def latestVersion: Option[Long] = versionIds().headOption

  /** O(1) liveness probe of one version — existence checks plus the
    * memoized snapshot, NOT a listing of the whole version log (read
    * validation runs on every slab read; at per-microbatch commit
    * rates a full listing per read would dominate). Precedence: a
    * record in versions/ is live, a record in versions_expired/ is
    * expired (recent expiry the snapshot hasn't absorbed yet), else
    * the snapshot's flag decides (folded records live in the archive).
    */
  private[graft] def isLive(versionId: Long): Boolean =
    fs.exists(new Path(versionsDir, f"$versionId%020d.json")) ||
      (!fs.exists(new Path(expiredDir, f"$versionId%020d.json")) &&
        snapshotMetas().live.getOrElse(versionId, false))

  private[graft] def requireLive(versionId: Long): Unit =
    require(isLive(versionId),
      s"version $versionId is expired or unknown")

  /** Connection.metadata (hbase.clj:278-281). Served from the
    * memoized metas snapshot when the version is folded in (zero
    * I/O); point-reads the record otherwise.
    */
  def metadata(versionId: Long): DatasetMeta = {
    if (cacheEnabled) {
      val hit = metaCache.get(versionId)
      if (hit != null) return hit
    }
    val m = snapshotMemo match {
      case Some((_, s)) if s.metas.contains(versionId) => s.metas(versionId)
      case _ => loadMetadata(versionId)
    }
    if (cacheEnabled) metaCache.put(versionId, m)
    m
  }

  private def loadMetadata(versionId: Long): DatasetMeta = {
    val rec = f"$versionId%020d.json"
    // live → recently-expired → snapshot → archived (cold fallback)
    val p = Seq(versionsDir, expiredDir).map(new Path(_, rec))
      .find(fs.exists).getOrElse {
        val snap = snapshotMetas()
        snap.metas.get(versionId) match {
          case Some(m) => return m
          case None =>
            val arch = new Path(archiveDir, rec)
            if (fs.exists(arch)) arch
            else throw new IllegalArgumentException(s"no version $versionId")
        }
      }
    metaPointReads.incrementAndGet()
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      GraftDataset.parseVersionRecord(new String(bytes, "UTF-8"))._2
    } finally in.close()
  }

  // ---------- compacted metas snapshot (hbase.clj:285-289) ----------
  //
  // The reference enumerates versions with ONE server-side HBase scan;
  // a file lake has no scan, so without compaction every slab read
  // point-reads one JSON record per version on the driver —
  // O(#versions) round-trips per read once streaming ingest commits
  // per micro-batch. Instead, every `snapshotEvery`-th commit folds the
  // whole version→metadata map into `metas_snapshot/<id>.json` (one
  // JSONL record per version, live or expired). Version metadata is
  // immutable once committed and retention only moves the version
  // *record* between dirs, so a snapshot never goes stale. Readers
  // load the newest snapshot (one file read, memoized per handle by
  // snapshot id) and point-read only the < snapshotEvery versions
  // committed since — the Delta-Lake-checkpoint pattern.

  private val snapshotEvery = 16

  /** Driver point-reads of single version records — instrumentation
    * for the bounded-metadata-I/O gate in MandolineScenarioSpec.
    */
  private[graft] val metaPointReads =
    new java.util.concurrent.atomic.AtomicLong

  /** One parsed metas snapshot: id → metadata for EVERY version ever
    * committed (live or expired) at snapshot time, plus the liveness
    * flag each record's dir location held when folded. `id` 0 = no
    * snapshot yet.
    */
  private[core] case class MetasSnap(id: Long,
      metas: Map[Long, DatasetMeta], live: Map[Long, Boolean])

  /** Memoized latest snapshot, keyed by snapshot id (contents at a
    * given id are immutable, so this is safe even with caching off).
    */
  @volatile private var snapshotMemo: Option[(Long, MetasSnap)] = None

  private def snapshotIds(): Seq[Long] = {
    val d = new Path(metasSnapDir)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).toSeq.sorted
  }

  /** The newest compacted snapshot (empty if none written yet). */
  private def snapshotMetas(): MetasSnap =
    snapshotIds().lastOption match {
      case None => MetasSnap(0L, Map.empty, Map.empty)
      case Some(id) => snapshotMemo match {
        case Some((memoId, m)) if memoId == id => m
        case _ =>
          val m =
            try {
              val p = new Path(metasSnapDir, f"$id%020d.json")
              val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
              val in = fs.open(p)
              try in.readFully(bytes) finally in.close()
              val recs = new String(bytes, "UTF-8").split('\n').iterator
                .filter(_.nonEmpty)
                .map(GraftDataset.parseSnapshotLine).toSeq
              MetasSnap(id,
                recs.map { case (vid, _, meta) => vid -> meta }.toMap,
                recs.map { case (vid, live, _) => vid -> live }.toMap)
            } catch {
              // a concurrent snapshot prune can race the read; the
              // snapshot is purely an optimization — fall back to
              // per-version point reads rather than fail the query
              case _: java.io.IOException =>
                MetasSnap(0L, Map.empty, Map.empty)
            }
          snapshotMemo = Some((id, m))
          m
      }
    }

  /** Metadata for every version (live + expired) with id ≤ hi, in a
    * BOUNDED number of driver FS calls: two O(snapshotEvery) dir
    * listings + at most one snapshot file read + point reads only of
    * the versions newer than the snapshot.
    */
  private[graft] def metasUpTo(hi: Long): Map[Long, DatasetMeta] = {
    val snap = snapshotMetas()
    allVersionIds().filter(_ <= hi)
      .map(id => id -> snap.metas.getOrElse(id, metadata(id))).toMap
  }

  /** Decode-metadata map for `vm`'s index rows up to `hi`: writer
    * version id → the VariableMeta the chunk written at that version
    * decodes under. Lineage-aware: a cloned variable's rows with
    * writerVersion at or before its clone point decode under the
    * SOURCE variable's key at that version
    * ([[Model.VariableMeta.decodeKeyAt]] walks clone-of-clone chains);
    * everything newer decodes under the variable's own key. Ordinary
    * variables (empty lineage) reduce to the plain stable-key lookup.
    */
  private[graft] def decodeMetas(vm: VariableMeta,
      hi: Long): Map[Long, VariableMeta] =
    metasUpTo(hi).flatMap { case (id, m) =>
      m.variables.find(_.idx == vm.decodeKeyAt(id)).map(id -> _)
    }

  /** Metadata for a specific id set: snapshot hits cost zero extra
    * I/O, only misses point-read. For consumers that know exactly
    * which writer versions they decode (the streaming delta planner)
    * — cheaper than materializing the full ≤-hi map.
    */
  private[graft] def metasFor(ids: Seq[Long]): Map[Long, DatasetMeta] = {
    val snap = snapshotMetas()
    ids.map(id => id -> snap.metas.getOrElse(id, metadata(id))).toMap
  }

  /** Fold the full version log into a new snapshot if at least
    * `snapshotEvery` records accumulated in the hot dirs since the
    * last one (always, when `force` — retention uses this so expiry
    * becomes durable snapshot state immediately). Called under the
    * commit lock AFTER the version-record rename (the commit point) —
    * the snapshot is advisory, so its failure must never fail an
    * already-durable commit (callers swallow non-fatal errors).
    *
    * After the snapshot rename the folded records leave the hot dirs:
    * live records move to the cold archive (recovery fallback, never
    * listed), absorbed expired records are deleted (their id, flag
    * and metadata now live in the snapshot). That relocation is what
    * keeps every hot listing O(snapshotEvery); a crash mid-move just
    * leaves extra records for the next fold to relocate.
    */
  private def maybeWriteMetasSnapshot(newId: Long, newMeta: DatasetMeta,
      force: Boolean = false): Unit = {
    val base = snapshotMetas()
    val listedLive = listRecordIds(versionsDir).toSet
    val listedExpired = listRecordIds(expiredDir).toSet
    if (!force &&
        (listedLive ++ listedExpired).count(_ > base.id) < snapshotEvery)
      return
    val allIds = (base.metas.keySet ++ listedLive ++ listedExpired)
      .filter(_ <= newId)
    val sb = new StringBuilder
    allIds.toSeq.sorted.foreach { id =>
      val m =
        if (id == newId) newMeta
        else base.metas.getOrElse(id, metadata(id))
      val live =
        if (listedExpired(id)) false
        else if (listedLive(id)) true
        else base.live.getOrElse(id, false)
      sb.append(s"""{"versionId":$id,"live":$live,""" +
        s""""metadata":${metaToJson(m)}}""")
      sb.append('\n')
    }
    // the file id only orders snapshots; a forced fold at an already-
    // snapshotted head must not collide with the existing file
    val snapId = math.max(newId, snapshotIds().lastOption.getOrElse(0L) + 1)
    val tmp = new Path(metasSnapDir, s".tmp-$snapId")
    val out = fs.create(tmp, true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(metasSnapDir, f"$snapId%020d.json")))
      throw new RuntimeException("metas snapshot rename failed")
    // keep the previous snapshot for readers that just listed the dir;
    // prune everything older
    snapshotIds().dropRight(2).foreach(old =>
      fs.delete(new Path(metasSnapDir, f"$old%020d.json"), false))
    // relocate the folded records out of the hot dirs
    fs.mkdirs(new Path(archiveDir))
    listedLive.filter(_ <= newId).foreach { id =>
      val rec = f"$id%020d.json"
      fs.rename(new Path(versionsDir, rec), new Path(archiveDir, rec))
    }
    listedExpired.filter(_ <= newId).foreach { id =>
      fs.delete(new Path(expiredDir, f"$id%020d.json"), false)
    }
    invalidateCaches()
  }

  // ---------- chunk manifest + raw tables ----------

  /** The chunk manifest: one row `(hash, nBytes)` per stored blob,
    * appended at commit/abort from the writer's staged manifest. This
    * is the enumerable chunk *table* the blob layout lacks — gc,
    * chunksDF and stats() are distributed scans over it; nothing ever
    * recursively lists the blob directories on the driver.
    */
  def manifestDF: DataFrame =
    if (dirHasData(manifestDir))
      spark.read.schema(manifestSchema).parquet(manifestDir)
        .groupBy(col("hash")).agg(max(col("nBytes")).as("nBytes"))
    else spark.emptyDataset[(String, Long)].toDF("hash", "nBytes")

  /** Number of stored chunks (manifest count — one aggregate, no
    * listing).
    */
  def chunkCount(): Long = manifestDF.count()

  /** The chunk table as a DataFrame (hash, data): manifest scan +
    * executor-side point reads of the content-addressed blobs
    * `chunks/<2hex>/<sha1>.bin` (the KV chunk table of hbase.clj:21-23
    * as an object store).
    */
  def chunksDF: DataFrame = {
    val dir = chunksDir
    val hc = hconf
    manifestDF.select(col("hash")).as[String].mapPartitions { it =>
      val fsLocal = new Path(dir).getFileSystem(hc.value)
      it.map(h => ChunkRecord(h, GraftDataset.readChunkFile(fsLocal, dir, h)))
    }.toDF()
  }

  /** All stored chunk hashes. Driver-side materialization — inspection
    * and small-store tooling only; the data plane uses [[manifestDF]].
    */
  def chunkHashes(): Seq[String] =
    manifestDF.select(col("hash")).as[String].collect().toSeq

  /** Distributed integrity scrub (the object-store fsck): re-hash
    * every manifest-committed chunk's logical payload against its
    * content address, through whichever layout currently serves it
    * (blob or pack range). A missing or unreadable chunk counts as
    * corrupt. Returns (chunksChecked, corruptCount, corrupt hashes
    * bounded to `maxReport`). One executor-parallel pass; the manifest
    * is the work list, so cost is O(live chunks) with no directory
    * LISTs.
    */
  def verifyChunks(maxReport: Int = 100): (Long, Long, Seq[String]) = {
    val dir = chunksDir
    val hc = hconf
    val checked = manifestDF.select(col("hash")).as[String]
      .mapPartitions { it =>
        val fsLocal = new Path(dir).getFileSystem(hc.value)
        it.map { h =>
          val ok =
            try ChunkCodec.sha1Hex(
              GraftDataset.readChunkFile(fsLocal, dir, h)) == h
            catch { case _: Exception => false }
          (h, ok)
        }
      }.toDF("hash", "ok")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val r = checked
        .agg(count(lit(1)), sum(when(col("ok"), 0L).otherwise(1L)))
        .head()
      val nBad = if (r.isNullAt(1)) 0L else r.getLong(1)
      val sample =
        if (nBad == 0L) Seq.empty[String]
        else checked.filter(!col("ok")).select(col("hash")).as[String]
          .limit(maxReport).collect().toSeq
      (r.getLong(0), nBad, sample)
    } finally checked.unpersist()
  }

  /** Point chunk read — ChunkStore.read-chunk (hbase.clj:124-133). */
  def readChunk(hash: String): Array[Byte] = {
    require(hash.nonEmpty, "chunk hash must be non-empty")
    GraftDataset.readChunkFile(fs, chunksDir, hash)
  }

  def refsDF: DataFrame =
    if (dirHasData(refsDir)) spark.read.parquet(refsDir)
    else spark.emptyDataset[RefDelta].toDF()

  private val indexColumns =
    Seq("variable", "coord", "chunkHash", "writerVersion", "versionId",
      "vmin", "vmax", "vsum", "vabs")

  /** One segment of the merged index store: a parquet dir holding
    * every index row with versionId in (lo, hi]. `dir` is empty for a
    * rows-free range (metadata-only commits folded past).
    */
  private[core] case class IndexSegment(lo: Long, hi: Long, dir: String)

  /** The merged store is described by a MANIFEST (`_segments-<n>.json`
    * in [[mergedIdxDir]], highest n wins): an ordered list of segments
    * partitioning (-inf, boundary]. Folds append a segment covering
    * just the new tail — O(tail) I/O — and level-merge into one
    * segment only when the count exceeds `spark.graft.index.
    * maxSegments` (default 8), so fold cost amortizes LSM-style
    * instead of rewriting the whole store under the commit lock every
    * time. Manifest swaps are unique-name renames (atomic); dirs no
    * manifest references are grace-swept by [[gc]].
    */
  private def segManifestIds(): Seq[Long] = {
    val d = new Path(mergedIdxDir)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).map(_.getPath.getName)
      .filter(n => n.startsWith("_segments-") && n.endsWith(".json"))
      .map(_.stripPrefix("_segments-").stripSuffix(".json").toLong)
      .toSeq.sorted
  }

  private def readSegments(attempt: Int = 0): Seq[IndexSegment] =
    segManifestIds().lastOption match {
      case None =>
        // pre-manifest layout compatibility: an older fold wrote the
        // whole merged store as a single `upto=N` dir with no
        // manifest. Surface it as one synthetic segment so reads keep
        // seeing its rows, the next fold's manifest adopts it, and gc
        // never treats it as unreferenced.
        val d = new Path(mergedIdxDir)
        val legacy = if (!fs.exists(d)) Seq.empty[Long]
          else fs.listStatus(d).map(_.getPath.getName)
            .filter(_.startsWith("upto="))
            .map(_.stripPrefix("upto=").toLong).toSeq
        legacy.maxOption.toSeq.map(n =>
          IndexSegment(Long.MinValue, n, s"upto=$n"))
      case Some(n) =>
        try {
          val p = new Path(mergedIdxDir, s"_segments-$n.json")
          val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
          val in = fs.open(p)
          try in.readFully(bytes) finally in.close()
          val re =
            """\{"lo":(-?\d+),"hi":(-?\d+),"dir":"([^"]*)"\}""".r
          re.findAllMatchIn(new String(bytes, "UTF-8")).map(m =>
            IndexSegment(m.group(1).toLong, m.group(2).toLong, m.group(3))
          ).toSeq.sortBy(_.hi)
        } catch {
          // raced by a concurrent manifest prune (the newest manifest
          // is never deleted) — retry, BOUNDED: a persistent failure
          // (unreachable store, permissions) must surface, not spin
          case e: java.io.IOException =>
            if (attempt < 3) readSegments(attempt + 1) else throw e
        }
    }

  private def writeSegManifest(segs: Seq[IndexSegment]): Unit = {
    fs.mkdirs(new Path(mergedIdxDir))
    val n = segManifestIds().lastOption.getOrElse(0L) + 1
    val body = segs.sortBy(_.hi)
      .map(s => s"""{"lo":${s.lo},"hi":${s.hi},"dir":"${s.dir}"}""")
      .mkString("\n")
    val tmp = new Path(mergedIdxDir, s".tmp-manifest-$n")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(mergedIdxDir, s"_segments-$n.json")))
      throw new RuntimeException("segment manifest rename failed")
    // keep the previous manifest for readers that just listed; prune
    // everything older
    segManifestIds().dropRight(2).foreach(old =>
      fs.delete(new Path(mergedIdxDir, s"_segments-$old.json"), false))
  }

  /** Boundary of the merged index store, if one exists (the highest
    * versionId any segment covers).
    */
  private def mergedIndexBoundary(): Option[Long] =
    readSegments().map(_.hi).maxOption

  private def emptyIndexDF: DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      indexSchema.add(StructField("versionId", LongType)))

  /** All committed index rows with their resolution versionId. Two
    * physical layouts back this one logical table: the per-version
    * partition dirs commits write (an O(1) dir rename per commit), and
    * an optional MERGED store ([[compactIndexLog]]) holding every row
    * with versionId ≤ its boundary as ordinary columns. Per-microbatch
    * ingest creates one tiny partition dir per commit; at ~500k
    * versions the per-read dir listing and tiny-file opens would
    * dominate every query — the merged store folds them into a bounded
    * file set (the index-log analog of a Delta checkpoint), and
    * versionId predicates keep pruning via parquet row-group min/max
    * instead of partition dirs.
    */
  def indicesDF: DataFrame = {
    val segs = readSegments()
    val boundary = segs.map(_.hi).maxOption.getOrElse(Long.MinValue)
    val parts = if (fs.exists(new Path(indicesDir)))
      fs.listStatus(new Path(indicesDir))
        .filter { st =>
          val n = st.getPath.getName
          n.startsWith("versionId=") &&
            n.stripPrefix("versionId=").toLong > boundary
        }.toSeq
    else Seq.empty
    val tail =
      if (parts.isEmpty) emptyIndexDF
      else spark.read.option("basePath", indicesDir)
        .schema(indexSchema)
        .parquet(parts.map(_.getPath.toString): _*)
        // partition dir column comes back typed by inference; normalize
        .withColumn("versionId", col("versionId").cast(LongType))
    val segDirs = segs.filter(_.dir.nonEmpty)
      .map(s => s"$mergedIdxDir/${s.dir}").filter(dirHasData)
    val merged =
      if (segDirs.isEmpty) emptyIndexDF
      else spark.read
        .schema(indexSchema.add(StructField("versionId", LongType)))
        .parquet(segDirs: _*)
    merged.select(indexColumns.map(col): _*)
      .unionAll(tail.select(indexColumns.map(col): _*))
  }

  /** Rows written by the most recent [[compactIndexLog]] fold —
    * instrumentation for the incremental-fold gate (an incremental
    * fold writes O(tail), not O(store)).
    */
  private[graft] val lastFoldRowsWritten =
    new java.util.concurrent.atomic.AtomicLong

  /** Row count of a just-written parquet dir from its file FOOTERS —
    * driver-side metadata reads, no second full-scan Spark job (the
    * fold holds the commit lock; doubling its I/O to feed a test
    * counter would block every writer for the duration).
    */
  private def parquetRowCount(dir: String): Long = {
    fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, hconf.value)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
  }

  /** Fold the per-version index partitions committed since the last
    * fold into the merged store. INCREMENTAL: the normal fold reads
    * and writes ONLY the tail rows in (boundary, head] as one new
    * segment — O(tail) I/O under the commit lock, not O(total-index)
    * — and appends it to the segment manifest. When the segment count
    * exceeds `spark.graft.index.maxSegments` (default 8) the fold
    * level-merges everything into a single segment instead, so read
    * fan-in stays bounded and the full rewrite amortizes LSM-style
    * across folds. Commits stay O(1) (a dir rename); as-of semantics
    * are exact (rows keep their resolution versionId — an ordinary,
    * min/max-prunable column — and their original writerVersion).
    *
    * The folded per-version dirs and superseded segments are NOT
    * deleted here — [[indicesDF]] already excludes them via the
    * manifest, and an in-flight reader that planned its scan before
    * the fold may still be reading them (this op runs routinely —
    * e.g. from the streaming sink — unlike operator-driven
    * retention). [[gc]] sweeps unreferenced dirs once they outlive
    * its grace period. Returns the number of partition dirs folded.
    */
  def compactIndexLog(): Long = withCommitLock {
    val headOpt = latestVersion
    if (headOpt.isEmpty) 0L
    else {
      val head = headOpt.get
      val segs = readSegments()
      val boundary = segs.map(_.hi).maxOption.getOrElse(Long.MinValue)
      if (boundary >= head) 0L // nothing new to fold
      else {
        val tailDirs = if (fs.exists(new Path(indicesDir)))
          fs.listStatus(new Path(indicesDir)).map(_.getPath.getName)
            .filter(_.startsWith("versionId="))
            .map(_.stripPrefix("versionId=").toLong)
            .filter(id => id <= head && id > boundary).toSeq
        else Seq.empty[Long]
        val maxSegments =
          spark.conf.getOption("spark.graft.index.maxSegments")
            .map(_.toInt).getOrElse(8)
        fs.mkdirs(new Path(mergedIdxDir))
        if (segs.count(_.dir.nonEmpty) >= maxSegments) {
          // level merge: every segment + the tail into ONE segment
          val segDir = s"seg-$head-${UUID.randomUUID().toString.take(8)}"
          indicesDF.filter(col("versionId") <= head)
            .select(indexColumns.map(col): _*)
            .write.parquet(s"$mergedIdxDir/$segDir")
          lastFoldRowsWritten.set(parquetRowCount(s"$mergedIdxDir/$segDir"))
          writeSegManifest(Seq(IndexSegment(Long.MinValue, head, segDir)))
        } else if (tailDirs.isEmpty) {
          // metadata-only commits: advance the boundary, no rows move.
          // EXTEND the last segment's range instead of appending an
          // empty one — a metadata-heavy cadence (RENAME/ALTER per
          // fold) would otherwise grow the manifest without bound,
          // since rows-free segments never count toward the
          // level-merge trigger
          lastFoldRowsWritten.set(0L)
          val extended = segs match {
            case init :+ last => init :+ last.copy(hi = head)
            case _ => Seq(IndexSegment(Long.MinValue, head, ""))
          }
          writeSegManifest(extended)
        } else {
          // incremental fold: ONLY the tail partitions' rows
          val tailDF = spark.read.option("basePath", indicesDir)
            .schema(indexSchema)
            .parquet(tailDirs.map(id => s"$indicesDir/versionId=$id"): _*)
            .withColumn("versionId", col("versionId").cast(LongType))
          val segDir = s"seg-$head-${UUID.randomUUID().toString.take(8)}"
          tailDF.select(indexColumns.map(col): _*)
            .write.parquet(s"$mergedIdxDir/$segDir")
          lastFoldRowsWritten.set(parquetRowCount(s"$mergedIdxDir/$segDir"))
          writeSegManifest(segs :+ IndexSegment(boundary, head, segDir))
        }
        tailDirs.length.toLong
      }
    }
  }

  /** ANALYZE: backfill zone stats (vmin/vmax/vsum/vabs) for live
    * index rows that lack them — rows committed before the stat
    * columns existed, which otherwise decline the value-filter skips
    * and the MIN/MAX/SUM/AVG pushdowns FOREVER (stats are computed at
    * write time; history never rewrites itself). Each stat-less row's
    * chunk decodes ONCE, executor-side, under its writer's metadata,
    * and the stats recompute through the writer's own accumulator
    * ([[GraftDataset.ZoneStatsAcc]]) — bit-identical to what the
    * writer would have produced. The whole store then rewrites as one
    * level-merged segment and the manifest swaps atomically, exactly
    * like a level-merge fold (a backfill is inherently O(stat-less
    * rows) decode + O(store) rewrite; it shares the fold's crash
    * safety: old manifest or new, never half). Runs under the commit
    * lock — an operator-driven verb like retention, not a routine one
    * like the incremental fold. Returns the number of rows
    * backfilled; 0 means every live row already carries min/max stats
    * (vsum-only nulls are recomputed too, but a tile whose sum is
    * genuinely fold-order-dependent nulls again — re-running ANALYZE
    * on such a store re-decodes those tiles and is still 0).
    */
  def analyzeIndexStats(): Long = withCommitLock {
    val headOpt = latestVersion
    if (headOpt.isEmpty) 0L
    else {
      val head = headOpt.get
      import spark.implicits._
      val all = indicesDF.filter(col("versionId") <= head)
      // short-circuit: a fully-analyzed store skips the O(store)
      // rewrite entirely (one cheap stat-null probe)
      if (all.filter(col("vmin").isNull || col("vsum").isNull)
          .isEmpty) 0L
      else {
      // decode metadata per DISTINCT writer version (snapshot-backed,
      // O(#versions in play) — never O(#rows))
      val writerIds = all
        .select(coalesce(col("writerVersion"), col("versionId")))
        .distinct().as[Long].collect().toSeq
      val metasBc = spark.sparkContext.broadcast(metasFor(writerIds))
      // clone lineage: a cloned variable's pre-clone rows live under
      // its fresh key but decode under the SOURCE's key at their
      // writer version — map each row key to its owning HEAD variable
      // so the per-row lookup can chase the lineage (rows of dropped
      // variables fall back to their own key, as before)
      val lineageBc = spark.sparkContext.broadcast(
        metadata(head).variables.filter(_.lineage.nonEmpty)
          .map(v => v.idx -> v.lineage).toMap)
      val backfilled = spark.sparkContext.longAccumulator("backfilled")
      val cDir = chunksDir
      val hc = hconf
      val segDir = s"seg-$head-${UUID.randomUUID().toString.take(8)}"
      val rewritten = all
        .select(col("variable"), col("coord"), col("chunkHash"),
          col("writerVersion"), col("versionId"),
          col("vmin"), col("vmax"), col("vsum"), col("vabs"))
        .as[(String, Seq[Long], String, Option[Long], Long,
          Option[Double], Option[Double], Option[Double], Option[Double])]
        .mapPartitions { it =>
          val fsL = new Path(cDir).getFileSystem(hc.value)
          it.map { case row @ (variable, cc, hash, wverOpt, vid,
              vmin, vmax, vsum, vabs) =>
            if (vmin.isDefined && vsum.isDefined) row
            else {
              val wver = wverOpt.getOrElse(vid)
              val decodeKey = lineageBc.value.get(variable)
                .flatMap(_.find(wver <= _._2).map(_._1))
                .getOrElse(variable)
              metasBc.value.get(wver)
                .flatMap(_.variables.find(_.idx == decodeKey)) match {
                case None => row // no writer metadata: leave as-is
                case Some(wv) =>
                  // stored tiles are dense under the writer clamp
                  // (encode fills gaps), so the decode IS the cell set
                  // the writer folded stats over
                  val vals = ChunkCodec.decodeValues(wv,
                    GraftDataset.readChunkFile(fsL, cDir, hash))
                  val acc = new GraftDataset.ZoneStatsAcc
                  vals.foreach(acc.add(_, 1L))
                  backfilled.add(1L)
                  val z = acc.zones
                  val s = acc.sums
                  (variable, cc, hash, wverOpt, vid,
                    z._1, z._2, s._1, s._2)
              }
            }
          }
        }
        .toDF(indexColumns: _*)
      fs.mkdirs(new Path(mergedIdxDir))
      rewritten
        .select(indexColumns.map(col): _*)
        .write.parquet(s"$mergedIdxDir/$segDir")
      lastFoldRowsWritten.set(parquetRowCount(s"$mergedIdxDir/$segDir"))
      writeSegManifest(Seq(IndexSegment(Long.MinValue, head, segDir)))
      backfilled.value
      }
    }
  }

  /** Current ref count of a chunk — ChunkStore.chunk-refs
    * (hbase.clj:135-136) as an aggregate over the delta log.
    */
  def refCounts: DataFrame =
    refsDF.groupBy(col("hash")).agg(sum(col("delta")).as("refCount"))

  /** Store accounting — get-stats (hbase.clj:273-276, a stub there; a
    * real distributed aggregate here): versions, chunks, bytes, index
    * entries, ref totals. One manifest aggregate + one index count.
    */
  def stats(): DataFrame = {
    val (nChunks, totalBytes) = manifestDF
      .agg(count(lit(1)), coalesce(sum(col("nBytes")), lit(0L)))
      .as[(Long, Long)].head()
    val nIdx = indicesDF.count()
    val refTotal =
      if (dirHasData(refsDir))
        refsDF.agg(coalesce(sum(col("delta")), lit(0L))).as[Long].head()
      else 0L
    Seq((versionIds().length.toLong, nChunks, totalBytes, nIdx, refTotal))
      .toDF("n_versions", "n_chunks", "total_chunk_bytes",
        "n_index_entries", "ref_total")
  }

  /** Zone-map-backed value statistics for one variable as of a
    * version: min/max over every live tile's [vmin, vmax] — pure
    * index metadata, ZERO chunk reads (the ANALYZE-style summary a
    * query planner or data-quality check wants before touching 100 TB
    * of blobs). Bounds cover the written tiles' decoded values (fill
    * included within written tiles); wholly-unwritten chunks hold
    * only fill and are not represented. `unknownChunks` counts live
    * tiles written before zone maps existed (null bounds — the true
    * range may exceed the reported one until they are rewritten).
    */
  def valueStats(variable: String, asOf: Long): DataFrame = {
    val vm = metadata(asOf).variable(variable)
    resolveIndex(vm.idx, asOf)
      .agg(min(col("vmin")).as("value_min"),
        max(col("vmax")).as("value_max"),
        count(lit(1)).as("n_live_chunks"),
        sum(when(col("vmin").isNull, 1L).otherwise(0L))
          .as("unknown_chunks"),
        // exact written-tile sum (order-independent by the vsum
        // contract); reported null if ANY live tile lacks sum stats —
        // a partial total would read as the whole
        when(sum(when(col("vsum").isNull, 1L).otherwise(0L)) > 0L,
          lit(null).cast(DoubleType))
          .otherwise(sum(col("vsum"))).as("value_sum"),
        sum(when(col("vsum").isNull, 1L).otherwise(0L))
          .as("unknown_sum_chunks"))
  }

  // ---------- the as-of read path ----------

  /** Batch as-of index resolution: newest entry per chunk-coord with
    * versionId <= asOf — find-index (hbase.clj:184-198) for the whole
    * variable at once via a max_by-style aggregate (one shuffle on
    * coord; versionId partition pruning bounds the scan).
    */
  def resolveIndex(variable: String, asOf: Long): DataFrame =
    resolveIndex(variable, asOf, withStats = true)

  /** As-of resolution with an explicit column-pruning switch: the
    * zone-stats columns ride the argmax struct, so Spark cannot prune
    * them through the aggregate even when the caller never reads them
    * — `withStats = false` drops vmin/vmax/vsum/vabs from the scan's
    * ReadSchema AND from the groupBy exchange (guide §2.3 "project
    * before the exchange", §6 "verify column pruning"). The winning
    * row is identical either way: versionId + writerVersion +
    * chunkHash — the struct's prefix — already decide the argmax.
    */
  private[graft] def resolveIndex(variable: String, asOf: Long,
      withStats: Boolean): DataFrame = {
    val statCols =
      if (withStats)
        Seq(col("vmin"), col("vmax"), col("vsum"), col("vabs"))
      else Seq.empty
    val statOuts =
      if (withStats)
        Seq(col("m.vmin").as("vmin"), col("m.vmax").as("vmax"),
          col("m.vsum").as("vsum"), col("m.vabs").as("vabs"))
      else Seq.empty
    indicesDF
      .filter(col("versionId") <= asOf && col("variable") === variable)
      .groupBy(col("coord"))
      .agg(max(struct(Seq(col("versionId"),
        coalesce(col("writerVersion"), col("versionId"))
          .as("writerVersion"),
        col("chunkHash")) ++ statCols: _*)).as("m"))
      .select(Seq(col("coord"), col("m.versionId").as("versionId"),
        col("m.writerVersion").as("writerVersion"),
        col("m.chunkHash").as("chunkHash")) ++ statOuts: _*)
  }

  /** Point index lookup — Index.target / chunk-at (hbase.clj:184-229).
    * Default (`exact = false`): the newest entry at or before `version`
    * (the reference's 1-arg chunk-at / find-index point form). With
    * `exact = true`: only an entry written AT that exact version (the
    * 2-arg chunk-at, hbase.clj:217-229). Returns (writerVersion, hash).
    */
  def chunkAt(variable: String, coord: Seq[Long], version: Long,
      exact: Boolean = false): Option[(Long, String)] = {
    // resolve the LOGICAL name as of `version`; a name that does not
    // exist there must miss — falling back to the raw name as an index
    // key would phantom-hit a RENAMEd variable's rows via its retired
    // name (index rows key on the stable physical name)
    metadata(version).variables.find(_.name == variable).flatMap { vm =>
      indicesDF
        .filter(col("variable") === vm.idx &&
          col("coord") === typedLit(coord) &&
          (if (exact) col("versionId") === version
           else col("versionId") <= version))
        .orderBy(col("versionId").desc)
        .limit(1)
        // writerVersion (decode metadata), not the resolution version —
        // they differ for rows rewritten by retention/index compaction
        .select(coalesce(col("writerVersion"), col("versionId")),
          col("chunkHash"))
        .as[(Long, String)].collect().headOption
    }
  }

  /** All chunk coords of `v`'s grid overlapping `region` (whole grid
    * when None) — div/mod arithmetic over spark.range, no driver-side
    * loop, no cross join; region prunes at CHUNK level. Shared by
    * [[readSlab]] and [[readSlabs]] so region semantics cannot
    * diverge between them.
    */
  private def prunedChunkCoords(v: VariableMeta,
      region: Option[Seq[(Long, Long)]]): DataFrame = {
    val grid = v.chunkGrid
    val rank = v.shape.length
    val nChunks = grid.product max 1L
    region.foreach(r => require(r.length == rank, "region rank mismatch"))
    val chunkDims = v.chunkDims
    val gridCells = spark.range(nChunks).map { i =>
      var rest = i
      val cc = new Array[Long](rank)
      var d = rank - 1
      while (d >= 0) { cc(d) = rest % grid(d); rest /= grid(d); d -= 1 }
      cc.toSeq
    }
    val prunedCells = region match {
      case None => gridCells
      case Some(r) => gridCells.filter { cc: Seq[Long] =>
        cc.indices.forall { i =>
          cc(i) * chunkDims(i) < r(i)._2 && (cc(i) + 1) * chunkDims(i) > r(i)._1
        }
      }
    }
    prunedCells.toDF("coord")
  }

  /** Dense slab read at a version: every cell of the variable's (as-of)
    * shape, unwritten regions filled with the variable's fill value
    * (fill semantics per hbase_test.clj:152-156), optionally restricted
    * to a hyperslab region [start, end) per dimension.
    *
    * Chunk-level joins only — cells never shuffle; the tile decode and
    * fill generation happen in one flatMap.
    */
  def readSlab(variable: String, asOf: Long,
      region: Option[Seq[(Long, Long)]] = None): DataFrame = {
    requireLive(asOf)
    val asOfMeta = metadata(asOf)
    val v = asOfMeta.variable(variable)
    // metas of every version INCLUDING expired ones (compacted index
    // rows keep their original writerVersion; chunks decode with the
    // meta they were written under — grow/shrink changes edge-tile
    // dims, SURVEY §7.4 #4)
    val metasByVersion: Map[Long, VariableMeta] = decodeMetas(v, asOf)
    val wantedChunks = prunedChunkCoords(v, region)

    val resolved = resolveIndex(v.idx, asOf, withStats = false)
    val joined = wantedChunks
      .join(resolved, Seq("coord"), "left")
      .select(col("coord"), col("writerVersion"), col("chunkHash"))

    val regionArr = region.map(_.toArray)
    val cDir = chunksDir
    val hc = hconf
    val cells = joined.as[(Seq[Long], Option[Long], Option[String])]
      .mapPartitions { part =>
        // batched executor-side point reads of the blob store — the
        // set-oriented replacement for the reference's per-coordinate
        // chunk GET (hbase.clj:124-133)
        val fsLocal = new Path(cDir).getFileSystem(hc.value)
        part.map { case (cc, verOpt, hashOpt) =>
          (cc, verOpt,
            hashOpt.map(h => GraftDataset.readChunkFile(fsLocal, cDir, h)))
        }
      }
      .flatMap { case (cc, verOpt, bytes) =>
        val tile = ChunkCodec.tileDims(v, cc)
        val n = ChunkCodec.tileSize(tile)
        val decoded: Option[(VariableMeta, Array[Double])] =
          bytes.flatMap { b =>
            verOpt.map { ver =>
              val wv = metasByVersion(ver)
              val values = ChunkCodec.decodeValues(wv, b)
              (wv, values)
            }
          }
        (0L until n).iterator.flatMap { off =>
          val cell = ChunkCodec.cellOf(v, cc, off)
          val inRegion = regionArr.forall(r =>
            cell.indices.forall(i => cell(i) >= r(i)._1 && cell(i) < r(i)._2))
          if (!inRegion) Iterator.empty
          else {
            val value = decoded match {
              case Some((wv, values)) =>
                val insideOld = cell.indices.forall(i => cell(i) < wv.shape(i))
                if (insideOld) values(ChunkCodec.offsetOf(wv, cc, cell).toInt)
                else v.fillValue
              case None => v.fillValue
            }
            Iterator.single((cell, value))
          }
        }
      }
    cells.toDF("coord", "value")
  }

  /** Aligned multi-variable slab read: one row per cell with one value
    * column per requested variable — the "select temp, hum at coord"
    * read. All variables must share shape + chunkDims (the aligned
    * case; disjoint-grid variables are a relational join, not this).
    *
    * Scale shape: ONE index pass resolves every variable (single
    * shuffle on (variable, coord) then a regroup on coord — index rows
    * are tiny), and each grid chunk is decoded for all variables inside
    * one task. Cells never shuffle and never join: the V-way alignment
    * happens in-memory per tile, so this costs the same one pass as a
    * single-variable [[readSlab]] plus the extra blob reads — NOT V
    * separate reads plus a V-way cell-level join (which would shuffle
    * |cells|·V rows).
    */
  def readSlabs(variables: Seq[String], asOf: Long,
      region: Option[Seq[(Long, Long)]] = None): DataFrame = {
    require(variables.nonEmpty, "need at least one variable")
    requireLive(asOf)
    val asOfMeta = metadata(asOf)
    val vms = variables.map(asOfMeta.variable)
    val v0 = vms.head
    vms.foreach { vm =>
      require(vm.shape == v0.shape && vm.chunkDims == v0.chunkDims,
        s"aligned read needs identical shape/chunkDims; '${vm.name}' " +
          s"differs from '${v0.name}'")
    }
    val idxOf: Map[String, String] =
      variables.zip(vms.map(_.idx)).toMap
    val metasByVarVersion: Map[(String, Long), VariableMeta] = {
      val metas = metasUpTo(asOf) // ONE log listing for all variables
      variables.zip(vms).flatMap { case (vn, vm) =>
        metas.flatMap { case (id, m) =>
          // lineage-aware per variable (see decodeMetas)
          m.variables.find(_.idx == vm.decodeKeyAt(id))
            .map(dm => (vn, id) -> dm)
        }
      }.toMap
    }
    val wantedChunks = prunedChunkCoords(v0, region)

    // one index pass for ALL variables: newest entry per
    // (variable, chunk), then regroup per chunk so each grid tile
    // carries its full variable->chunk map into the decode task
    val resolved = indicesDF
      .filter(col("versionId") <= asOf &&
        col("variable").isin(vms.map(_.idx): _*))
      .groupBy(col("variable"), col("coord"))
      .agg(max(struct(col("versionId"),
        coalesce(col("writerVersion"), col("versionId"))
          .as("writerVersion"),
        col("chunkHash"))).as("m"))
      .groupBy(col("coord"))
      .agg(collect_list(struct(col("variable").as("_1"),
        col("m.writerVersion").as("_2"),
        col("m.chunkHash").as("_3"))).as("entries"))

    val joined = wantedChunks.join(resolved, Seq("coord"), "left")

    val regionArr = region.map(_.toArray)
    val cDir = chunksDir
    val hc = hconf
    val varsArr = variables.map(idxOf).toArray // physical keys
    val fills = vms.map(_.fillValue).toArray
    val cells = joined
      .as[(Seq[Long], Option[Seq[(String, Long, String)]])]
      .mapPartitions { part =>
        val fsLocal = new Path(cDir).getFileSystem(hc.value)
        part.flatMap { case (cc, entriesOpt) =>
          val perVar: Array[Option[(VariableMeta, Array[Double])]] =
            varsArr.map { vn =>
              entriesOpt.flatMap(_.find(_._1 == vn)).map {
                case (_, wver, h) =>
                  val wv = metasByVarVersion((vn, wver))
                  (wv, ChunkCodec.decodeValues(wv,
                    GraftDataset.readChunkFile(fsLocal, cDir, h)))
              }
            }
          val n = ChunkCodec.tileSize(ChunkCodec.tileDims(v0, cc))
          (0L until n).iterator.flatMap { off =>
            val cell = ChunkCodec.cellOf(v0, cc, off)
            val inRegion = regionArr.forall(r =>
              cell.indices.forall(i =>
                cell(i) >= r(i)._1 && cell(i) < r(i)._2))
            if (!inRegion) Iterator.empty
            else {
              val values = new Array[Double](varsArr.length)
              var i = 0
              while (i < varsArr.length) {
                values(i) = perVar(i) match {
                  case Some((wv, vs))
                      if cell.indices.forall(j => cell(j) < wv.shape(j)) =>
                    vs(ChunkCodec.offsetOf(wv, cc, cell).toInt)
                  case _ => fills(i)
                }
                i += 1
              }
              Iterator.single((cell, values.toSeq))
            }
          }
        }
      }
    cells.toDF("coord", "values")
      .select(col("coord") +: variables.zipWithIndex.map { case (vn, i) =>
        element_at(col("values"), i + 1).as(vn) }: _*)
  }

  /** Change-data capture between two live versions: one row per cell
    * whose DATA differs — `old_value`/`new_value` are null where the
    * cell held no data at that version (outside the shape, unwritten,
    * or the fill value; for float-typed variables "fill" is typically
    * NaN). A real stored value equal to the fill value is
    * indistinguishable from fill by design (same as the read path).
    *
    * Scale shape: the index resolutions for both versions full-outer
    * join on chunk coord, and any chunk with identical
    * (writerVersion, chunkHash) on both sides is pruned WITHOUT
    * reading it — content addressing makes unchanged data free. Cost
    * is proportional to the number of changed chunks, not dataset
    * size; handles grow/shrink (cells appearing/disappearing) and
    * variables added between versions.
    */
  def diffSlab(variable: String, fromVersion: Long,
      toVersion: Long): DataFrame = {
    Seq(fromVersion, toVersion).foreach(requireLive)
    // the logical name may differ across versions (RENAME): anchor on
    // the stable physical index name of whichever side has it
    val direct = metadata(toVersion).variables.find(_.name == variable)
      .orElse(metadata(fromVersion).variables.find(_.name == variable))
    require(direct.isDefined,
      s"no such variable $variable in either version")
    val idxN = direct.get.idx
    val vmFrom = metadata(fromVersion).variables.find(_.idx == idxN)
    val vmTo = metadata(toVersion).variables.find(_.idx == idxN)
    for (a <- vmFrom; b <- vmTo)
      require(a.chunkDims == b.chunkDims,
        "chunkDims are immutable across versions")
    val chunkDims = vmFrom.orElse(vmTo).get.chunkDims
    val rank = chunkDims.length
    val hi = math.max(fromVersion, toVersion)
    val metasByVersion: Map[Long, VariableMeta] =
      decodeMetas(direct.get, hi)

    def resolvedAt(v: Long, suffix: String): DataFrame =
      (if (metadata(v).variables.exists(_.idx == idxN))
         resolveIndex(idxN, v, withStats = false)
       else spark.emptyDataset[(Seq[Long], Long, Long, String)]
         .toDF("coord", "versionId", "writerVersion", "chunkHash"))
        .select(col("coord"), col("writerVersion").as(s"wv$suffix"),
          col("chunkHash").as(s"h$suffix"))

    // identical (writer, hash) => identical tile bytes AND identical
    // decode metadata — but identical BYTES only imply identical CELLS
    // when the as-of VariableMeta masks them identically at both
    // versions: a metadata-only commit (shape shrink/grow, fillValue
    // change) moves the LOGICAL value of cells without rewriting any
    // chunk. A chunk is prunable iff (writer, hash) match AND the fill
    // value is bit-identical AND this chunk's as-of tile extent
    // (clamp(shape - cc*chunkDims, 0, chunkDims) per dim) is the same
    // under both shapes — equal extent + equal fill + equal bytes +
    // equal decode meta => every cell masks and decodes identically.
    // Interior chunks of a grow/shrink still prune; only edge chunks
    // (and everything under a fill change) enumerate.
    val fillEq = (vmFrom, vmTo) match {
      case (Some(a), Some(b)) =>
        java.lang.Double.doubleToLongBits(a.fillValue) ==
          java.lang.Double.doubleToLongBits(b.fillValue)
      case _ => false
    }
    val extentEq: Column = (vmFrom, vmTo) match {
      case (Some(a), Some(b)) if a.shape == b.shape => lit(true)
      case (Some(a), Some(b)) =>
        (0 until rank).map { i =>
          val base = element_at(col("coord"), i + 1) * chunkDims(i)
          def ext(shape: Long) =
            greatest(lit(0L), least(lit(chunkDims(i)), lit(shape) - base))
          ext(a.shape(i)) === ext(b.shape(i))
        }.reduce(_ && _)
      case _ => lit(false)
    }
    val changed = resolvedAt(fromVersion, "F")
      .join(resolvedAt(toVersion, "T"), Seq("coord"), "full_outer")
      .filter(!(lit(fillEq) && extentEq &&
        col("hF") <=> col("hT") && col("wvF") <=> col("wvT")))

    val cDir = chunksDir
    val hc = hconf
    val diffs = changed
      .as[(Seq[Long], Option[Long], Option[String], Option[Long],
        Option[String])]
      .mapPartitions { part =>
        val fsLocal = new Path(cDir).getFileSystem(hc.value)
        def decodeSide(wvOpt: Option[Long], hOpt: Option[String])
            : Option[(VariableMeta, Array[Double])] =
          for (wver <- wvOpt; h <- hOpt) yield {
            val wv = metasByVersion(wver)
            (wv, ChunkCodec.decodeValues(wv,
              GraftDataset.readChunkFile(fsLocal, cDir, h)))
          }
        part.flatMap { case (cc, wvF, hF, wvT, hT) =>
          val fromSide = decodeSide(wvF, hF)
          val toSide = decodeSide(wvT, hT)
          // enumerate the union extent of the two as-of tiles of this
          // chunk (grow/shrink makes them differ)
          def tileExtent(vm: Option[VariableMeta]): Seq[Long] =
            vm.map(v => v.shape.indices.map(i => math.max(0L,
              math.min(chunkDims(i), v.shape(i) - cc(i) * chunkDims(i)))))
              .getOrElse(Seq.fill(rank)(0L))
          val eF = tileExtent(vmFrom)
          val eT = tileExtent(vmTo)
          val ext = (0 until rank).map(i => math.max(eF(i), eT(i)))
          val n = ext.foldLeft(1L)(_ * _)
          def sideValue(cell: Seq[Long], asOfVm: Option[VariableMeta],
              decoded: Option[(VariableMeta, Array[Double])])
              : Option[Double] =
            asOfVm.flatMap { vm =>
              if (!cell.indices.forall(i => cell(i) < vm.shape(i))) None
              else decoded match {
                case Some((wv, vs))
                    if cell.indices.forall(i => cell(i) < wv.shape(i)) =>
                  val x = vs(ChunkCodec.offsetOf(wv, cc, cell).toInt)
                  val isFill = x == vm.fillValue ||
                    (x.isNaN && vm.fillValue.isNaN)
                  if (isFill) None else Some(x)
                case _ => None // unwritten => fill => no data
              }
            }
          (0L until n).iterator.flatMap { off =>
            val rel = new Array[Long](rank)
            var rest = off
            var i = rank - 1
            while (i >= 0) { rel(i) = rest % ext(i); rest /= ext(i); i -= 1 }
            val cell: Seq[Long] =
              (0 until rank).map(i => cc(i) * chunkDims(i) + rel(i))
            val o = sideValue(cell, vmFrom, fromSide)
            val nw = sideValue(cell, vmTo, toSide)
            if (o == nw) Iterator.empty
            else Iterator.single((cell, o, nw))
          }
        }
      }
    diffs.toDF("coord", "old_value", "new_value")
  }

  /** Only the STORED cells of a variable at a version — decoded from
    * resolved chunks, masked to the as-of shape, fill values dropped.
    * Cost is proportional to stored data, never to shape volume (a
    * sparse 1e6×1e6 variable with three written chunks decodes three
    * tiles — [[readSlab]] by contrast generates a fill row for every
    * cell of the declared shape, which is the point of a DENSE read
    * but infeasible as a re-layout source at scale).
    */
  def readStored(variable: String, asOf: Long): DataFrame = {
    val v = metadata(asOf).variable(variable)
    val metasByVersion: Map[Long, VariableMeta] = decodeMetas(v, asOf)
    val grid = v.chunkGrid
    val cDir = chunksDir
    val hc = hconf
    val vb = v
    resolveIndex(v.idx, asOf, withStats = false)
      .select(col("coord"), col("writerVersion"), col("chunkHash"))
      .as[(Seq[Long], Long, String)]
      // chunks beyond the as-of grid (shrunken shapes) hold no live cells
      .filter { t: (Seq[Long], Long, String) =>
        t._1.indices.forall(i => t._1(i) < grid(i))
      }
      .mapPartitions { part =>
        val fsLocal = new Path(cDir).getFileSystem(hc.value)
        part.flatMap { case (cc, ver, h) =>
          val wv = metasByVersion(ver)
          val bytes = GraftDataset.readChunkFile(fsLocal, cDir, h)
          ChunkCodec.decode(wv, bytes).flatMap { case (off, value) =>
            val cell = ChunkCodec.cellOf(wv, cc, off)
            val inShape = cell.indices.forall(i => cell(i) < vb.shape(i))
            val isFill = value == vb.fillValue ||
              (value.isNaN && vb.fillValue.isNaN)
            if (inShape && !isFill) Iterator.single((cell, value))
            else Iterator.empty
          }
        }
      }.toDF("coord", "value")
  }

  /** Re-layout `variable`'s as-of cells under a different chunking as
    * a NEW variable `newName` (chunkDims are immutable per variable —
    * the reference's layout is fixed at variable creation; this is the
    * engine's answer to "the access pattern changed"). One distributed
    * pass over STORED data only: resolved chunks decode straight into
    * the writer's re-chunk shuffle — cells shuffle exactly once, on
    * the NEW chunk key, and work scales with stored cells, not shape
    * volume. Returns the new version id.
    */
  def rechunk(variable: String, asOf: Long, newName: String,
      newChunkDims: Seq[Long]): Long = {
    val v = metadata(asOf).variable(variable)
    require(newChunkDims.length == v.shape.length,
      "newChunkDims rank must match the variable's shape")
    require(newName != variable, "rechunk writes a new variable")
    val head = latestVersion.getOrElse(0L)
    val baseVars = if (head == 0L) Seq.empty else metadata(head).variables
    require(!baseVars.exists(v => v.name == newName || v.idx == newName),
      s"variable $newName already exists (as a name or index key)")
    val newMeta = DatasetMeta(baseVars :+
      VariableMeta(newName, v.dtype, v.shape, newChunkDims, v.fillValue))
    val w = newWriter(newMeta)
    w.writeSlab(newName, readStored(variable, asOf))
    w.commit()
  }

  /** Zero-chunk-copy CLONE (branch) of a variable at a version: the
    * source's resolved index rows at `asOf` are copied under a fresh
    * physical key — one O(index) distributed job, no chunk I/O — and
    * committed as one new version whose metadata adds the clone with
    * the source's geometry. Chunks are SHARED: the commit's normal +1
    * ref per staged row means retention/gc on either side keeps a
    * blob alive while the other still references it (unlike
    * Delta-style shallow clones, vacuuming the source cannot break
    * the clone). Each copied row PRESERVES its original
    * `writerVersion`; the clone's [[Model.VariableMeta.lineage]]
    * records (sourceKey, asOf) so those chunks keep decoding under
    * the metadata they were written with (grow/shrink edge tiles),
    * chaining for clone-of-clone. After the clone the two variables
    * are fully independent: writes, renames, retention and drops on
    * one never affect the other. Contrast [[rechunk]], the O(data)
    * re-layout copy. Returns the committed version id.
    */
  def cloneVariable(variable: String, newName: String,
      asOf: Long = -1L): Long =
    cloneVariables(Seq(variable -> newName), asOf)

  /** Multi-variable form of [[cloneVariable]]: branch SEVERAL
    * variables at the same version in ONE atomic commit (the
    * consistent whole-dataset branch — either every clone lands or
    * none does). One staged-index write job unions all sources'
    * resolved rows; the commit gate is shared.
    */
  def cloneVariables(pairs: Seq[(String, String)],
      asOf: Long = -1L): Long = {
    require(pairs.nonEmpty, "need at least one (source, target) pair")
    val at = if (asOf > 0L) asOf
      else latestVersion.getOrElse(throw new IllegalArgumentException(
        "cannot clone: no committed versions"))
    requireLive(at)
    val head = latestVersion.getOrElse(0L)
    val baseVars = if (head == 0L) Seq.empty else metadata(head).variables
    val newNames = pairs.map(_._2)
    require(newNames.distinct.length == newNames.length,
      s"duplicate clone targets: ${newNames.mkString(", ")}")
    val staged = pairs.map { case (variable, newName) =>
      val src = metadata(at).variable(variable)
      require(newName != variable, "clone needs a distinct name")
      require(!baseVars.exists(v => v.name == newName || v.idx == newName),
        s"variable $newName already exists (as a name or index key)")
      // fresh physical key (epoch-key style): rows copied under it can
      // never interleave with any past or future variable's rows
      val freshKey = s"$newName#${UUID.randomUUID().toString.take(8)}"
      val dst = src.copy(name = newName, indexName = freshKey,
        lineage = src.lineage :+ (src.idx, at),
        mergeBase = 0L) // a fresh branch has its own merge history
      val grid = src.chunkGrid
      val inGrid: Column =
        if (grid.isEmpty) lit(true)
        else grid.indices.map(i => col("coord")(i) < grid(i))
          .reduce(_ && _)
      // the resolved view rekeyed to the fresh key (writerVersion and
      // zone stats ride along verbatim — identical bytes, identical
      // stats); out-of-grid rows left by a shrink don't come
      val rows = resolveIndex(src.idx, at)
        .filter(inGrid)
        .select(lit(freshKey).as("variable"), col("coord"),
          col("chunkHash"), col("writerVersion"),
          col("vmin"), col("vmax"), col("vsum"), col("vabs"))
      (dst, rows)
    }
    val writerId = UUID.randomUUID().toString
    staged.map(_._2).reduce(_ unionAll _)
      .write.parquet(stageIndexPath(writerId))
    // the normal commit gate: conflict validation, blob existence
    // under the lock (a racing gc/expiry can't strand the clone on
    // swept chunks), +1 refs, atomic version publish
    // each fresh clone key is staged exactly once and resolveIndex
    // yields one row per coord, so self-duplication is impossible
    commitStaged(writerId, head,
      DatasetMeta(baseVars ++ staged.map(_._1)),
      Some(staged.map(_._1.idx).toSet), dupPossible = false)
  }

  /** Shared merge analysis (see [[mergeBranch]]): validates the
    * branch/source pair at HEAD and returns the branch's changed
    * chunks with a per-chunk conflict flag, plus the HEAD read from.
    */
  private def mergeAnalysis(branchName: String)
      : (VariableMeta, VariableMeta, DataFrame, Long) = {
    val head = latestVersion.getOrElse(throw new IllegalArgumentException(
      "cannot merge: no committed versions"))
    val headMeta = metadata(head)
    val bvm = headMeta.variable(branchName)
    require(bvm.lineage.nonEmpty,
      s"$branchName is not a clone (no lineage to merge back along)")
    val (srcKey, branchedAt) = bvm.lineage.last
    val srcVm = headMeta.variables.find(_.idx == srcKey).getOrElse(
      throw new IllegalArgumentException(
        s"merge target (index key $srcKey) no longer exists at HEAD — " +
          "dropped, or replaced by INSERT OVERWRITE/TRUNCATE"))
    require(srcVm.shape == bvm.shape && srcVm.chunkDims == bvm.chunkDims,
      s"merge needs identical geometry: ${srcVm.name} has " +
        s"shape=${srcVm.shape.mkString(",")} " +
        s"chunkDims=${srcVm.chunkDims.mkString(",")}; $branchName has " +
        s"${bvm.shape.mkString(",")}/${bvm.chunkDims.mkString(",")}")
    // branch-meta history (snapshot-backed, O(#versions) driver-side):
    // the clone commit (first carrying the branch's key) floors the
    // branch's own changes; versions where the branch's mergeBase
    // ADVANCED are this branch's past merge commits — their source
    // writes are reconciliations, not independent changes
    val branchHist = metasUpTo(head).toSeq.sortBy(_._1)
      .flatMap { case (id, m) =>
        m.variables.find(_.idx == bvm.idx).map(id -> _.mergeBase)
      }
    val cloneVid = branchHist.headOption.map(_._1).getOrElse(head)
    val conflictFloor = math.max(branchedAt, bvm.mergeBase)
    // every merge commit except the newest sits at or below the
    // advanced base (mergeBase_k < M_k <= head_{k+1} = mergeBase_{k+1}),
    // so the exclusion list stays O(1) however many merges ran
    val mergeCommits: Set[Long] =
      branchHist.zip(0L +: branchHist.map(_._2)).collect {
        case ((id, nb), pb) if nb != pb && id > conflictFloor => id
      }.toSet
    val grid = bvm.chunkGrid
    val inGrid: Column =
      if (grid.isEmpty) lit(true)
      else grid.indices.map(i => col("coord")(i) < grid(i)).reduce(_ && _)
    // rows the branch wrote ITSELF (writerVersion is fold-stable,
    // unlike versionId; cloned rows carry pre-clone writer versions so
    // they never qualify) whose content the source doesn't already
    // have — content-addressed hashes make "already merged" and
    // "both sides made the same change" exact equality checks
    val srcCur = resolveIndex(srcVm.idx, head, withStats = false)
      .select(col("coord"), col("writerVersion").as("srcWv"),
        col("chunkHash").as("srcHash"))
    val changed = resolveIndex(bvm.idx, head, withStats = false)
      .filter(col("writerVersion") > cloneVid && inGrid)
      .join(srcCur, Seq("coord"), "left_outer")
      .filter(col("srcHash").isNull ||
        col("srcHash") =!= col("chunkHash"))
      .select(col("coord"), col("writerVersion"), col("chunkHash"),
        col("srcWv"))
    // per-chunk conflict flag: the source's winning write landed
    // after the merge base (the branch point, advanced by each merge)
    // and is not itself one of this branch's merge commits
    val analyzed = changed.withColumn("conflict",
      col("srcWv").isNotNull && col("srcWv") > conflictFloor &&
        !col("srcWv").isin(mergeCommits.toSeq: _*))
    (bvm, srcVm, analyzed, head)
  }

  /** Dry-run of [[mergeBranch]]: the chunk-level change report a user
    * reviews before committing — one row per chunk the branch would
    * apply, `conflict = true` where the source ALSO changed
    * independently since the merge base (the chunks a plain merge
    * would refuse on). Pure read; commits nothing.
    */
  def mergePreview(branchName: String): DataFrame =
    mergeAnalysis(branchName)._3.select(col("coord"),
      col("writerVersion").as("branch_version"),
      col("srcWv").as("source_version"),
      col("conflict"))

  /** Three-way MERGE of a clone back into its source: every chunk the
    * branch wrote since its clone point replaces the source's chunk
    * (chunk-granular, like the git analogy suggests), in one commit.
    * A chunk changed on BOTH sides since the branch point is a
    * conflict — refused with [[Model.CommitConflictException]] unless
    * `force` (branch side wins). Only the branch's CHANGED chunks are
    * decoded (O(changed), never O(variable)), and because re-encoding
    * the same cells under the same geometry is byte-identical, the
    * content-addressed put dedups every merged chunk against the
    * branch's existing blob — a merge writes ~zero new chunk bytes.
    * Both variables must have identical shape/chunkDims at merge time
    * (align with a plain metadata commit first if they diverged); the
    * branch itself is left untouched — drop it separately when done.
    * Returns the merge commit's version id (HEAD unchanged when the
    * branch has no changes to merge).
    */
  def mergeBranch(branchName: String, force: Boolean = false): Long = {
    import spark.implicits._
    val (bvm, srcVm, changed, head) = mergeAnalysis(branchName)
    val headMeta = metadata(head)
    if (changed.limit(1).isEmpty) return head // nothing to merge
    if (!force) {
      val conflicts = changed.filter(col("conflict")).count()
      if (conflicts > 0) throw new CommitConflictException(
        s"$conflicts chunk(s) changed on both ${srcVm.name} and " +
          s"$branchName since the merge base — rebase the branch or " +
          "merge with force (branch side wins)")
    }
    // decode ONLY the changed tiles (under their writers' metadata via
    // the branch's lineage) into the branch's dense view of those
    // chunks — every offset explicit, so the writer's per-chunk merge
    // REPLACES the source tile wholesale
    val metasByVersion = decodeMetas(bvm, head)
    val vb = bvm
    val cDir = chunksDir
    val hc = hconf
    val cells = changed
      .select(col("coord"), col("writerVersion"), col("chunkHash"))
      .as[(Seq[Long], Long, String)]
      .mapPartitions { part =>
        val fsLocal = new Path(cDir).getFileSystem(hc.value)
        part.flatMap { case (cc, wver, h) =>
          val wv = metasByVersion(wver)
          val values = ChunkCodec.decodeValues(wv,
            GraftDataset.readChunkFile(fsLocal, cDir, h))
          val n = ChunkCodec.tileSize(ChunkCodec.tileDims(vb, cc))
          (0L until n).iterator.map { off =>
            val cell = ChunkCodec.cellOf(vb, cc, off)
            val insideOld =
              cell.indices.forall(i => cell(i) < wv.shape(i))
            val value =
              if (insideOld)
                values(ChunkCodec.offsetOf(wv, cc, cell).toInt)
              else vb.fillValue
            (cell, value)
          }
        }
      }.toDF("coord", "value")
    // the merge commit ALSO advances the branch's merge base to the
    // head it read from, marking itself as a reconciliation commit
    val mergedMeta = DatasetMeta(headMeta.variables.map(v =>
      if (v.name == branchName) v.copy(mergeBase = head) else v))
    val w = newWriter(mergedMeta)
    w.writeSlab(srcVm.name, cells)
    w.commit()
  }

  // ---------- write path ----------

  def newWriter(meta: DatasetMeta): SlabWriter =
    new SlabWriter(this, meta, latestVersion.getOrElse(0L))

  private[core] def dirHasData(dir: String): Boolean = {
    val p = new Path(dir)
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.getLen > 0 || st.isDirectory)
  }

  private[core] def appendRefs(deltas: Dataset[RefDelta]): Unit =
    deltas.write.mode("append").parquet(refsDir)

  private[core] def stagePath(writerId: String): String =
    s"$stagingDir/$writerId"

  /** Staged index rows (the version's index partition, pre-commit). */
  private[core] def stageIndexPath(writerId: String): String =
    s"$stagingDir/$writerId/index"

  /** Staged manifest rows — written BEFORE any blob so an in-flight
    * writer's chunks are always enumerable (gc spares them).
    */
  private[core] def stageManifestPath(writerId: String): String =
    s"$stagingDir/$writerId/manifest"

  /** Staged ref-count deltas — written by the fused fast-path
    * validate+refs job, published into [[refsDir]] by file rename at
    * the commit point (never visible on any failure path: fail()
    * deletes the whole stage dir).
    */
  private[core] def stageRefsPath(writerId: String): String =
    s"$stagingDir/$writerId/refs"

  /** Move a writer's staged manifest files into the global manifest
    * (file-level renames; count bounded by parquet part files, not
    * chunks). Runs on every exit path — commit, abort, failed commit —
    * so every blob ever written stays enumerable for gc.
    */
  private[core] def publishStagedManifest(writerId: String): Unit = {
    val src = new Path(stageManifestPath(writerId))
    if (!fs.exists(src)) return
    fs.mkdirs(new Path(manifestDir))
    fs.listStatus(src).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { st =>
        val tgt = new Path(manifestDir, s"${writerId}_${st.getPath.getName}")
        if (!fs.rename(st.getPath, tgt))
          throw new RuntimeException(s"manifest publish rename failed: $tgt")
      }
  }

  /** Abort path: record the writer's blobs in the global manifest (they
    * become unreferenced → reclaimed by gc), then drop staged state.
    * Takes the commit lock so a concurrent gc's manifest rewrite can't
    * lose the newly-published rows.
    */
  private[core] def abortStaged(writerId: String): Unit = withCommitLock {
    publishStagedManifest(writerId)
    fs.delete(new Path(stagePath(writerId)), true)
    ()
  }

  /** Serialized commit critical section: a JVM-level mutex per dataset
    * path (fast path for in-process writers) plus the cross-process
    * atomic lock file (CommitLock — O_CREAT|O_EXCL on local FS, atomic
    * namenode create on HDFS-like stores; stale owners stolen after a
    * 60 s lease).
    */
  private[core] def withCommitLock[T](body: => T): T =
    GraftDataset.jvmLock(path).synchronized {
      CommitLock.withLock(fs, new Path(versionsDir, "_commit.lock"),
        UUID.randomUUID().toString)(body)
    }

  private[core] def commitStaged(writerId: String, snapshot: Long,
      meta: DatasetMeta, stagedIdxsOpt: Option[Set[String]] = None,
      dupPossible: Boolean = true): Long = withCommitLock {
    val stagedIdx = stageIndexPath(writerId)
    val hasStaged = dirHasData(stagedIdx)
    val stagedDF =
      if (hasStaged) spark.read.schema(indexSchema).parquet(stagedIdx)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)

    def fail(e: => Exception): Nothing = {
      // blobs already written become unreferenced manifest entries (gc
      // fodder), never invisible orphans
      publishStagedManifest(writerId)
      fs.delete(new Path(stagePath(writerId)), true)
      throw e
    }

    // ONE validation job for three checks (each would otherwise pay a
    // full job's scheduling overhead):
    //  - self-consistency: the same (variable, coord) staged twice
    //    with different content would tie on versionId at read time
    //    and resolve arbitrarily (hbase_test.clj double-staging).
    //    SKIPPED when the writer attests no variable was staged twice
    //    (dupPossible = false): one writeSlab emits one row per chunk
    //    by construction, so a single-staging writer cannot self-dup —
    //    and the skip removes the check's groupBy exchange from every
    //    commit's critical section.
    //  - conflict detection: any committed version after our snapshot
    //    wrote an overlapping (variable, coord)? (strictly stronger
    //    than the reference's per-coordinate CAS — SURVEY §4.5).
    //    Skipped when nothing committed after the snapshot.
    //  - staged-blob existence: a gc racing this writer's staging may
    //    have swept a deduped blob in the narrow touch/delete window;
    //    under the lock (gc excluded) we catch it HERE and fail the
    //    commit retriably instead of publishing a version referencing
    //    missing chunks. Never skipped — but in the common fast path
    //    (no dup, no later commits) it runs as ONE narrow job with no
    //    exchange (per-partition dedup replaces the distinct).
    val later = versionIds().filter(_ > snapshot)
    val cDir = chunksDir
    val hc = hconf
    def missingFilter(it: Iterator[String]): Iterator[String] = {
      val fsLocal = new Path(cDir).getFileSystem(hc.value)
      val seen = scala.collection.mutable.HashSet.empty[String]
      // blob-first, pack fallback: a writer may have deduped
      // against a blob that packChunks folded (and deleted)
      // between staging and this commit — the bytes live on in
      // the pack, so that is NOT a missing chunk
      it.filter(h => seen.add(h) &&
        !fsLocal.exists(GraftDataset.chunkPath(cDir, h)) &&
        ChunkPack.locate(fsLocal, cDir, h).isEmpty)
    }
    val issues: Map[String, Long] = if (!hasStaged) Map.empty
    else if (!dupPossible && later.isEmpty && stagedIdxsOpt.isDefined) {
      // fast path: the only check left is blob existence — ONE narrow
      // scan of the staged index with no shuffle, which ALSO writes
      // the ref-count deltas (+1 per staged row) to a STAGED refs dir
      // as it validates: the same rows fed two jobs here (validate
      // count, then appendRefs read+write), and fusing them halves
      // the commit's Spark-job constant. The staged refs parquet is
      // published by file rename at the point appendRefs used to run;
      // any failure path deletes the stage dir, so refs from a failed
      // commit are never visible. Missing-blob detection rides a
      // Spark accumulator: task retries can only inflate the count
      // (a retried partition re-adds), never hide a genuinely missing
      // blob, and pass/fail is all the gate needs (the reported count
      // was already approximate — per-partition dedup).
      val missingAcc = spark.sparkContext.longAccumulator(
        "graft.commit.missingBlobs")
      GraftDataset.withDesc(spark, "commit: validate+refs") {
        stagedDF.select(col("chunkHash")).as[String]
          .mapPartitions { it =>
            val fsLocal = new Path(cDir).getFileSystem(hc.value)
            val seen = scala.collection.mutable.HashSet.empty[String]
            it.map { h =>
              if (seen.add(h) &&
                  !fsLocal.exists(GraftDataset.chunkPath(cDir, h)) &&
                  ChunkPack.locate(fsLocal, cDir, h).isEmpty)
                missingAcc.add(1L)
              (h, 1L)
            }
          }.toDF("hash", "delta")
          .write.parquet(stageRefsPath(writerId))
      }
      if (missingAcc.value > 0) Map("missing" -> missingAcc.value)
      else Map.empty
    } else {
      val selfDup =
        if (!dupPossible) spark.emptyDataset[String].toDF("k")
        else stagedDF
          .groupBy(col("variable"), col("coord"))
          .agg(countDistinct(col("chunkHash")).as("n"))
          .filter(col("n") > 1)
          .select(lit("selfdup").as("k"))
      val conflict =
        if (later.isEmpty) spark.emptyDataset[String].toDF("k")
        else stagedDF
          .join(indicesDF.filter(col("versionId") > snapshot),
            Seq("variable", "coord"), "left_semi")
          .select(lit("conflict").as("k"))
      val missing = stagedDF.select(col("chunkHash"))
        .as[String].mapPartitions(missingFilter)
        .toDF("h").select(lit("missing").as("k"))
      // distinct staged index keys ride the same job (k = "key:<idx>")
      // for the retired-key check below — bounded by #variables.
      // Writers that track their staged key set driver-side
      // (stagedIdxsOpt) skip the branch.
      val stagedKeys =
        if (stagedIdxsOpt.isDefined) spark.emptyDataset[String].toDF("k")
        else stagedDF
          .select(concat(lit("key:"), col("variable")).as("k")).distinct()
      GraftDataset.withDesc(spark, "commit: validate") {
        selfDup.unionAll(conflict).unionAll(missing).unionAll(stagedKeys)
          .groupBy(col("k")).agg(count(lit(1)).as("c"))
          .as[(String, Long)].collect().toMap
      }
    }
    if (issues.getOrElse("selfdup", 0L) > 0) fail(new IllegalStateException(
      s"${issues("selfdup")} coordinates staged twice with different " +
        "content in one version"))
    if (issues.getOrElse("conflict", 0L) > 0)
      fail(new CommitConflictException(
        s"${issues("conflict")} staged entries overlap versions " +
          s"committed after snapshot $snapshot"))

    // metadata three-way merge: a concurrent writer may have committed
    // shape/variable changes after our snapshot; committing our
    // snapshot-derived meta verbatim would silently revert them. Merge
    // per-variable (ours where we changed, theirs elsewhere); both
    // sides changing the same variable differently is a conflict.
    val effectiveMeta =
      if (later.isEmpty) meta
      else {
        val snapVars: Map[String, VariableMeta] =
          (if (snapshot == 0L) Seq.empty[VariableMeta]
           else metadata(snapshot).variables).map(v => v.name -> v).toMap
        val latestMeta = metadata(later.max)
        val ourVars = meta.variables.map(v => v.name -> v).toMap
        val theirVars = latestMeta.variables.map(v => v.name -> v).toMap
        // NaN-safe structural equality (case-class == is false for
        // NaN fill values — NaN != NaN). idx is part of the identity:
        // an epoch swap (INSERT OVERWRITE / TRUNCATE) changes ONLY the
        // physical index key, and two swaps racing must conflict, not
        // silently keep one epoch while the other's rows go dark
        def key(v: VariableMeta) = (v.name, v.idx, v.dtype, v.shape,
          v.chunkDims, java.lang.Double.doubleToLongBits(v.fillValue),
          v.lineage, v.mergeBase)
        def same(a: Option[VariableMeta], b: Option[VariableMeta]) =
          a.map(key) == b.map(key)
        def changed(cur: Map[String, VariableMeta]): Set[String] =
          (cur.keySet ++ snapVars.keySet)
            .filter(n => !same(cur.get(n), snapVars.get(n)))
        val ours = changed(ourVars)
        val theirs = changed(theirVars)
        val conflicts =
          (ours & theirs).filter(n => !same(ourVars.get(n), theirVars.get(n)))
        if (conflicts.nonEmpty) fail(new CommitConflictException(
          s"metadata conflict on variables ${conflicts.mkString(", ")}: " +
            s"changed both by this writer and after snapshot $snapshot"))
        val merged = latestMeta.variables.flatMap { v =>
          if (ours(v.name)) ourVars.get(v.name) else Some(v)
        } ++ meta.variables.filter(v =>
          ours(v.name) && !theirVars.contains(v.name))
        DatasetMeta(merged)
      }

    // names AND physical index keys must stay unique: a CREATE reusing
    // a renamed variable's old name would silently interleave two
    // variables' index rows under one key. When the duplicate emerges
    // from the three-way merge (e.g. two RENAMEs of one variable
    // racing), that's a write-write race a fresh-snapshot retry
    // resolves — surface it as the retriable conflict, not a fatal
    Seq(effectiveMeta.variables.map(_.name) -> "names",
        effectiveMeta.variables.map(_.idx) -> "index keys").foreach {
      case (ks, what) =>
        if (ks.distinct.length != ks.length) {
          val msg = s"duplicate variable $what in committed metadata: " +
            ks.diff(ks.distinct).distinct.mkString(", ")
          fail(if (later.nonEmpty)
            new CommitConflictException(s"$msg (raced a concurrent " +
              s"metadata commit after snapshot $snapshot — retry)")
          else new IllegalStateException(msg))
        }
    }

    if (issues.getOrElse("missing", 0L) > 0)
      fail(new CommitConflictException(
        s"~${issues("missing")} staged chunks missing from the store " +
          "(count approximate: deduped per partition / per attempt; " +
          "swept by a concurrent gc) — retry the write against a " +
          "fresh snapshot"))

    // a key INTRODUCED by this commit must never have been used by an
    // earlier variable: index rows of a dropped (or renamed-away)
    // variable can outlive it in the store for as long as any version
    // referencing them is retained, and a re-CREATE reusing the key
    // would resurrect them as phantom cells at the new variable's
    // HEAD. History scan is bounded by the metas snapshot and runs
    // only for key-introducing commits (CREATE / epoch swap).
    val snapKeys =
      (if (snapshot == 0L) Seq.empty[VariableMeta]
       else metadata(snapshot).variables).map(_.idx).toSet
    val carriedKeys =
      if (later.isEmpty) Set.empty[String]
      else metadata(later.max).variables.map(_.idx).toSet
    val newKeys =
      effectiveMeta.variables.map(_.idx).toSet -- snapKeys -- carriedKeys
    if (newKeys.nonEmpty && snapshot != 0L) {
      val historical =
        metasUpTo(snapshot).values.flatMap(_.variables.map(_.idx)).toSet
      val reused = newKeys & historical
      if (reused.nonEmpty) fail(new IllegalStateException(
        s"index keys ${reused.mkString(", ")} were used by an earlier " +
          "(dropped or renamed) variable whose rows may still be " +
          "retained — re-creating under them would resurrect that " +
          "data; use a fresh name or epoch key"))
    }

    // every staged row's index key must exist in the EFFECTIVE meta:
    // a concurrent epoch swap (INSERT OVERWRITE / TRUNCATE) or DROP
    // after our snapshot retires the key our rows were staged under,
    // and committing them anyway would publish data invisible at HEAD
    // — a silently lost update. Retry from a fresh snapshot stages
    // under the live key instead.
    val liveKeys = effectiveMeta.variables.map(_.idx).toSet
    val retiredKeys = stagedIdxsOpt match {
      case Some(keys) => keys.filterNot(liveKeys)
      case None => issues.keys.filter(_.startsWith("key:"))
        .map(_.stripPrefix("key:")).filterNot(liveKeys).toSet
    }
    if (retiredKeys.nonEmpty)
      fail(new CommitConflictException(
        s"staged index rows key on retired index keys " +
          s"${retiredKeys.mkString(", ")} (variable overwritten, " +
          s"truncated, or dropped after snapshot $snapshot — retry)"))

    var id = System.currentTimeMillis()
    val maxExisting = versionIds().headOption.getOrElse(0L)
    if (id <= maxExisting) id = maxExisting + 1

    // ref-count deltas: +1 per new index reference (append-only log
    // replacing the racy RMW at hbase.clj:156-172). The fused fast
    // path already wrote them under the stage dir — publish those by
    // file rename (zero Spark jobs); otherwise run the append job.
    if (hasStaged) {
      val stagedRefs = new Path(stageRefsPath(writerId))
      if (fs.exists(stagedRefs)) {
        fs.mkdirs(new Path(refsDir))
        fs.listStatus(stagedRefs)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .foreach { st =>
            val tgt = new Path(refsDir,
              s"${writerId}_${st.getPath.getName}")
            if (!fs.rename(st.getPath, tgt))
              throw new RuntimeException(
                s"refs publish rename failed: $tgt")
          }
      } else GraftDataset.withDesc(spark, "commit: refs") {
        appendRefs(stagedDF.select(col("chunkHash").as("hash"))
          .withColumn("delta", lit(1L)).as[RefDelta])
      }
    }

    // index partition move + manifest publish, then the version record
    // — the commit point; a version's existence implies its data is in
    // place (SURVEY §3.2)
    if (hasStaged) {
      val target = new Path(s"$indicesDir/versionId=$id")
      if (!fs.rename(new Path(stagedIdx), target))
        throw new RuntimeException(s"rename to $target failed")
    }
    publishStagedManifest(writerId)
    val tmp = new Path(versionsDir, s".tmp-$writerId")
    val out = fs.create(tmp, true)
    out.write(
      (s"""{"versionId":$id,"metadata":${metaToJson(effectiveMeta)}}""")
        .getBytes("UTF-8"))
    out.close()
    if (!fs.rename(tmp, new Path(versionsDir, f"$id%020d.json")))
      throw new RuntimeException("version record rename failed")
    fs.delete(new Path(stagePath(writerId)), true)
    invalidateCaches()
    // the commit is durable at this point — the snapshot is advisory,
    // so its failure must not surface as a commit failure (which would
    // trigger a retry and a duplicate version)
    try maybeWriteMetasSnapshot(id, effectiveMeta)
    catch { case scala.util.control.NonFatal(_) => () }
    id
  }

  /** Advisory auto-maintenance after a batch commit, OFF the commit
    * lock's critical section (the folds take the lock themselves when
    * they decide to run; the already-committed write is never held
    * up, and a maintenance failure never fails it). The streaming
    * sink self-compacts per its own cadence ([[graft.streaming
    * .GraftSink]]); this is the same health policy for plain batch
    * writers, so 200 ad-hoc INSERTs keep hot-dir counts bounded with
    * no manual `CALL g.system.*`:
    *
    *  - `spark.graft.autoMaintain.hotIndexThreshold` (default 64,
    *    0 = off): when the hot index dir accumulates that many
    *    per-version partitions — ONE bounded LIST to check — fold
    *    them ([[compactIndexLog]], O(tail) incremental) and [[gc]]
    *    the folded partitions past
    *    `spark.graft.autoMaintain.gcGraceMs` (default 1h — readers
    *    holding an older segment manifest may still reference them).
    *  - `spark.graft.autoMaintain.packEvery` (default 0 = off): every
    *    N live versions, fold loose blobs into packs
    *    ([[packChunks]]) — opt-in, it rewrites blob bytes.
    */
  private[core] def maybeAutoMaintain(): Unit =
    try {
      val hotThreshold = spark.conf
        .getOption("spark.graft.autoMaintain.hotIndexThreshold")
        .map(_.toInt).getOrElse(64)
      if (hotThreshold > 0 && fs.exists(new Path(indicesDir))) {
        val hot = fs.listStatus(new Path(indicesDir))
          .count(_.getPath.getName.startsWith("versionId="))
        if (hot >= hotThreshold) {
          compactIndexLog()
          // folded partitions are swept by gc after a grace period
          // (readers holding an older manifest may still reference
          // them) — without the sweep the hot LIST grows unbounded
          gc(graceMs = spark.conf
            .getOption("spark.graft.autoMaintain.gcGraceMs")
            .map(_.toLong).getOrElse(3600000L))
          ()
        }
      }
      val packEvery = spark.conf
        .getOption("spark.graft.autoMaintain.packEvery")
        .map(_.toInt).getOrElse(0)
      if (packEvery > 0 && versionIds().length % packEvery == 0) {
        packChunks()
        ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Compact the append-only ref-count delta log into one summed row
    * per hash (the periodic job of SURVEY §4.4's delta-log design).
    * Runs under the commit lock so no commit appends deltas mid-swap;
    * the compacted log is written distributively (no driver collect).
    */
  def compactRefs(): Unit = withCommitLock {
    if (!dirHasData(refsDir)) return
    val tmp = s"$path/refs_compact_${UUID.randomUUID().toString.take(8)}"
    refCounts
      .select(col("hash"), col("refCount").as("delta")).as[RefDelta]
      .write.parquet(tmp) // materialized before the swap below
    fs.delete(new Path(refsDir), true)
    if (!fs.rename(new Path(tmp), new Path(refsDir)))
      throw new RuntimeException("refs compaction swap failed")
  }

  /** Version retention: expire committed versions beyond the newest
    * `keepLast`, removing their version records and index partitions
    * and appending −1 ref deltas for every reference they held (the
    * decrement half of the reference's ref-count protocol,
    * hbase.clj:156-172). Chunks whose references drop to zero become
    * unreferenced and are reclaimed by the next [[gc]]. Runs under the
    * commit lock; returns the expired version ids.
    *
    * Time travel to expired versions fails afterwards — that is the
    * point (bounded history at 100 TB); `keepLast >= 1` always
    * preserves HEAD.
    */
  def expireVersions(keepLast: Int): Seq[Long] = withCommitLock {
    require(keepLast >= 1, "must keep at least the newest version")
    expireLocked(keepLast)
  }

  /** Time-based retention: expire versions older than `cutoffMillis`
    * (version ids ARE commit timestamps, hbase.clj:246-249's
    * epoch-millis ids). HEAD always survives. The cutoff is resolved
    * to a keep-count UNDER the commit lock, so a commit racing the
    * sweep cannot shift the boundary past intent.
    */
  def expireVersionsOlderThan(cutoffMillis: Long): Seq[Long] =
    withCommitLock {
      expireLocked(math.max(1, versionIds().count(_ >= cutoffMillis)))
    }

  // ---------- named version refs (tags) ----------

  private val tagsDir = s"$path/tags"

  /** Pin a name to a live version — a reproducible snapshot handle
    * (e.g. "the corpus release this model trained on"). O(1) metadata
    * file per tag; `VERSION AS OF 'name'` resolves through it and
    * retention refuses to expire a tagged version (drop the tag
    * first). Additive surface — the reference has no refs beyond the
    * raw version ids (hbase.clj:285-297).
    */
  def tag(name: String, version: Long, replace: Boolean = false): Unit = {
    require(name.nonEmpty && !name.exists(c => c == '/' || c == '\\') &&
      !name.startsWith(".") && name.toLongOption.isEmpty,
      s"invalid tag name '$name' (need non-empty, no slashes, " +
        "not a bare number)")
    requireLive(version)
    val tgt = new Path(tagsDir, name)
    if (!replace && fs.exists(tgt))
      throw new IllegalArgumentException(
        s"tag '$name' already exists (pass replace to move it)")
    fs.mkdirs(new Path(tagsDir))
    val tmp = new Path(tagsDir,
      s".tmp-${UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    out.write(version.toString.getBytes("UTF-8"))
    out.close()
    // replace = last-writer-wins swap; fresh create keeps the
    // existence check above as its (advisory) uniqueness guard
    if (replace && fs.exists(tgt)) fs.delete(tgt, false)
    if (!fs.rename(tmp, tgt))
      throw new RuntimeException(s"tag rename to $tgt failed")
  }

  /** Remove a tag; returns whether it existed. */
  def dropTag(name: String): Boolean =
    fs.delete(new Path(tagsDir, name), false)

  /** The version a tag points at, if the tag exists. */
  def resolveTag(name: String): Option[Long] = {
    val p = new Path(tagsDir, name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        Some(new String(bytes, "UTF-8").trim.toLong)
      } finally in.close()
    }
  }

  /** All tags, name -> version (one bounded LIST of the tags dir). */
  def tags(): Seq[(String, Long)] = {
    val d = new Path(tagsDir)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).map(_.getPath.getName)
      .filterNot(_.startsWith("."))
      .flatMap(n => resolveTag(n).map(n -> _)).toSeq.sortBy(_._1)
  }

  private def expireLocked(keepLast: Int): Seq[Long] = {
    val live = versionIds() // newest first
    val expired = live.drop(keepLast)
    if (expired.isEmpty) return Seq.empty
    // tagged versions are pinned: retention folds everything below
    // the boundary, so a tagged version cannot survive individually —
    // refuse loudly instead of silently breaking the tag
    val pinned = tags().filter(t => expired.contains(t._2))
    require(pinned.isEmpty,
      s"retention would expire tagged version(s) " +
        s"${pinned.map(t => s"'${t._1}'=${t._2}").mkString(", ")}; " +
        "drop the tag(s) first")
    val boundary = live(keepLast - 1) // oldest surviving version

    // compact: the full as-of state at the boundary becomes the
    // boundary's index partition, each surviving row keeping its
    // ORIGINAL writer version (decode metadata). Rows of expired
    // versions that were fully superseded simply vanish.
    val compacted = metadata(boundary).variables.map { vm =>
      resolveIndex(vm.idx, boundary)
        .select(lit(vm.idx).as("variable"), col("coord"),
          col("chunkHash"), col("writerVersion"),
          col("vmin"), col("vmax"), col("vsum"), col("vabs"))
    }.reduceOption(_ unionAll _)
    val tmp = s"$path/indices_compact_${UUID.randomUUID().toString.take(8)}"
    compacted.foreach(_.write.parquet(tmp)) // materialized pre-swap

    // ref accounting (hbase.clj:156-172's decrement half): −1 for
    // every row leaving (expired ∪ old boundary partition), +1 for
    // every compacted row — one append job, reading pre-swap state
    val removed = indicesDF.filter(col("versionId") <= boundary)
      .select(col("chunkHash").as("hash")).withColumn("delta", lit(-1L))
    val added = compacted.map(_.select(col("chunkHash").as("hash"))
      .withColumn("delta", lit(1L)))
      .getOrElse(spark.emptyDataset[RefDelta].toDF())
    appendRefs(removed.unionAll(added).as[RefDelta])

    // swap the index layout, durable-state-first: the survivors (and
    // any straddling-segment rewrites) are written as NEW segment dirs
    // and the manifest swap makes them live atomically BEFORE any
    // superseded dir is touched — a crash at any point leaves either
    // the old manifest (old state, fully intact) or the new one (new
    // state, fully intact), never index rows reachable only from an
    // unregistered tmp dir. Segments wholly at/below the boundary are
    // simply dropped from the manifest (grace-swept by gc); segments
    // straddling it rewrite to their > boundary remainder — O(that
    // segment), not O(store).
    val mergedSchemaV = indexSchema.add(StructField("versionId", LongType))
    val segs = readSegments()
    val kept = segs.filter(_.lo >= boundary)
    val rewritten = segs.filter(s => s.lo < boundary && s.hi > boundary)
      .map { s =>
        if (s.dir.isEmpty || !dirHasData(s"$mergedIdxDir/${s.dir}"))
          IndexSegment(boundary, s.hi, s.dir)
        else {
          val segDir = s"seg-${s.hi}-${UUID.randomUUID().toString.take(8)}"
          spark.read.schema(mergedSchemaV)
            .parquet(s"$mergedIdxDir/${s.dir}")
            .filter(col("versionId") > boundary)
            .select(indexColumns.map(col): _*)
            .write.parquet(s"$mergedIdxDir/$segDir")
          IndexSegment(boundary, s.hi, segDir)
        }
      }
    fs.mkdirs(new Path(mergedIdxDir))
    val survivorsSeg =
      if (fs.exists(new Path(tmp))) {
        val segDir = s"seg-$boundary-${UUID.randomUUID().toString.take(8)}"
        spark.read.schema(indexSchema).parquet(tmp)
          .withColumn("versionId", lit(boundary))
          .select(indexColumns.map(col): _*)
          .write.parquet(s"$mergedIdxDir/$segDir")
        IndexSegment(Long.MinValue, boundary, segDir)
      } else IndexSegment(Long.MinValue, boundary, "")
    writeSegManifest(survivorsSeg +: (rewritten ++ kept))
    fs.delete(new Path(tmp), true)
    // cleanup (pure: the manifest boundary already excludes these)
    expired.foreach(id =>
      fs.delete(new Path(s"$indicesDir/versionId=$id"), true))
    fs.delete(new Path(s"$indicesDir/versionId=$boundary"), true)

    // retire the version records (metadata kept for decode). A record
    // already folded into a snapshot sits in the archive — move it
    // from there so the expiry is visible to the hot expired-dir
    // listing (which overrides the snapshot's stale live flag).
    fs.mkdirs(new Path(expiredDir))
    expired.foreach { id =>
      val rec = f"$id%020d.json"
      val hot = new Path(versionsDir, rec)
      val src = if (fs.exists(hot)) hot else new Path(archiveDir, rec)
      fs.rename(src, new Path(expiredDir, rec))
    }
    invalidateCaches()
    // fold the new liveness into a fresh snapshot immediately (expiry
    // is already durable via the record moves; this lets the next fold
    // clear the expired dir and keeps hot listings bounded). Advisory:
    // never fail the already-complete retention over it.
    try {
      versionIds().headOption.foreach(head =>
        maybeWriteMetasSnapshot(head, metadata(head), force = true))
    } catch { case scala.util.control.NonFatal(_) => () }
    expired.sorted
  }

  /** Fold committed per-chunk blob files into large immutable pack
    * files ([[ChunkPack]] — the object-store answer to the small-file
    * problem the reference never has because HBase compacts HFiles for
    * it, hbase.clj:21-23). One distributed pass, one task per hash
    * bucket (2-hex blob dirs, optionally sub-sharded — see
    * `spark.graft.pack.prefixLen` below): each task LISTs its blob
    * subdir once (no per-hash probes), packs every manifest-committed
    * blob, prunes index
    * entries for hashes gc removed from the manifest, and rewrites
    * packs whose live-byte fraction fell below `rewriteLiveFrac`
    * (space reclaim). Superseded index generations / orphaned packs
    * stay for in-flight readers; [[gc]] grace-sweeps them.
    *
    * Runs under the commit lock (single packer; concurrent writers
    * stay lock-free — their fresh blobs are simply not in this run's
    * manifest snapshot and keep working blob-first). Returns the
    * number of blob files folded into packs.
    */
  def packChunks(rewriteLiveFrac: Double = 0.5): Long = withCommitLock {
    val cDir = chunksDir
    val hc = hconf
    val frac = rewriteLiveFrac
    // bucket sharding: first fold pins spark.graft.pack.prefixLen
    // (2 = one bucket per blob dir; 3/4 sub-shard it 16/256-ways for
    // bounded per-task memory at 10^9-chunk scale); later folds reuse
    // the pinned value — see ChunkPack's prefix-length notes
    val configured = spark.conf.getOption("spark.graft.pack.prefixLen")
      .map(_.toInt).getOrElse(2)
    require(configured >= 2 && configured <= 6,
      s"spark.graft.pack.prefixLen must be in [2, 6], got $configured")
    val plen = ChunkPack.pinPrefixLen(fs, cDir, configured)
    // buckets that already hold packs must fold even when every one of
    // their manifest rows died (gc pruned them): marker rows with a
    // null hash pull them into the group pass so their index entries
    // prune and their packs rewrite/orphan
    val packsRoot = ChunkPack.packsRoot(cDir)
    val packedBuckets: Seq[(String, String)] =
      if (!fs.exists(packsRoot)) Seq.empty
      else fs.listStatus(packsRoot).filter(_.isDirectory)
        .map(_.getPath.getName.stripPrefix("b=") -> (null: String)).toSeq
    val totals = manifestDF.select(col("hash")).as[String]
      .map(h => (h.take(plen), h))
      .unionAll(spark.createDataset(packedBuckets))
      .groupByKey(_._1)
      .mapGroups { (b, it) =>
        val fsLocal = new Path(cDir).getFileSystem(hc.value)
        ChunkPack.packBucket(fsLocal, cDir, b,
          it.flatMap(t => Option(t._2)).toSet, frac)
      }
      .toDF("packed", "deduped", "rewritten")
      .agg(sum(col("packed")), sum(col("deduped")), sum(col("rewritten")))
      .as[(Option[Long], Option[Long], Option[Long])]
      .head()
    // executors self-heal via refresh-on-miss; the driver's own cache
    // (point reads, readChunk) refreshes the same way — clear it
    // anyway so same-JVM tests observe the new generation immediately
    ChunkPack.invalidateCache()
    totals._1.getOrElse(0L)
  }

  /** Garbage collection — fully distributed: dead = manifest hashes
    * referenced by no committed index and no in-flight staged write
    * (writers stage their manifest BEFORE writing blobs, so staged
    * chunks are always visible here). Deletes are executor-side;
    * the manifest is rewritten without the deleted rows. Runs under
    * the commit lock so the staged/committed sets can't shift
    * mid-sweep; returns removed count.
    *
    * `graceMs`: blobs whose mtime is fresher than this are spared even
    * if unreferenced — closes the race with a writer that re-referenced
    * (touched) a dead blob after our dead-set snapshot. Belt-and-
    * braces: commitStaged() also validates staged blobs still exist.
    *
    * `staleStagingMs`: staging dirs untouched for longer are presumed
    * crashed writers — their manifests merge into the global manifest
    * (making their blobs collectable) and their staged state is
    * dropped. Stale scan manifests (DSv2 planning artifacts) are swept
    * on the same clock.
    */
  def gc(graceMs: Long = 3600000L,
      staleStagingMs: Long = 86400000L): Long = withCommitLock {
    val now = System.currentTimeMillis()

    def dirMTime(p: Path): Long = {
      val own = fs.getFileStatus(p).getModificationTime
      val kids = fs.listStatus(p).map(_.getModificationTime)
      (own +: kids.toSeq).max
    }

    // stale-writer sweep
    if (fs.exists(new Path(stagingDir))) {
      fs.listStatus(new Path(stagingDir)).filter(_.isDirectory).foreach {
        st =>
          if (now - dirMTime(st.getPath) > staleStagingMs) {
            publishStagedManifest(st.getPath.getName)
            fs.delete(st.getPath, true)
          }
      }
    }
    // stale scan-manifest sweep (DSv2 planning artifacts)
    if (fs.exists(new Path(scansDir))) {
      fs.listStatus(new Path(scansDir)).filter(_.isDirectory).foreach {
        st =>
          if (now - dirMTime(st.getPath) > staleStagingMs)
            fs.delete(st.getPath, true)
      }
    }
    // folded index partitions + superseded merged-store dirs:
    // compactIndexLog / retention leave them in place for in-flight
    // readers (the segment manifest already excludes them); the
    // manifest is the reference set — once the newest manifest
    // outlives the grace period, sweep every per-version dir at or
    // below the merged boundary and every mergedIdxDir entry no
    // current manifest references (superseded segments, crashed tmp
    // manifests)
    segManifestIds().lastOption.foreach { n =>
      val manifestP = new Path(mergedIdxDir, s"_segments-$n.json")
      val segs = readSegments()
      val mb = segs.map(_.hi).maxOption.getOrElse(Long.MinValue)
      if (fs.exists(manifestP) &&
          now - fs.getFileStatus(manifestP).getModificationTime > graceMs) {
        if (fs.exists(new Path(indicesDir)))
          fs.listStatus(new Path(indicesDir)).map(_.getPath).foreach { p =>
            val nm = p.getName
            if (nm.startsWith("versionId=") &&
                nm.stripPrefix("versionId=").toLong <= mb)
              fs.delete(p, true)
          }
        val referenced = segs.map(_.dir).filter(_.nonEmpty).toSet
        val keepManifests =
          segManifestIds().takeRight(2).map(i => s"_segments-$i.json").toSet
        fs.listStatus(new Path(mergedIdxDir)).map(_.getPath).foreach { p =>
          val nm = p.getName
          if (!referenced(nm) && !keepManifests(nm))
            fs.delete(p, true)
        }
      }
    }

    // pack-store sweep: superseded bucket-index generations and packs
    // the newest generation doesn't reference (pack rewrites, folds).
    // One driver LIST of packs/, then one executor task per bucket.
    val packsRoot = ChunkPack.packsRoot(chunksDir)
    if (fs.exists(packsRoot)) {
      val buckets = fs.listStatus(packsRoot).filter(_.isDirectory)
        .map(_.getPath.toString).toSeq
      if (buckets.nonEmpty) {
        val hc2 = hconf
        val grace2 = graceMs
        spark.createDataset(buckets).mapPartitions { it =>
          val nowLocal = System.currentTimeMillis()
          it.map { b =>
            val p = new Path(b)
            val fsLocal = p.getFileSystem(hc2.value)
            ChunkPack.sweepBucket(fsLocal, p, grace2, nowLocal)
          }
        }.reduce(_ + _)
      }
    }

    val stagedSubdirs =
      if (fs.exists(new Path(stagingDir)))
        fs.listStatus(new Path(stagingDir)).filter(_.isDirectory)
          .map(_.getPath).toSeq
      else Seq.empty
    def stagedParts(sub: String, column: String): Seq[DataFrame] =
      stagedSubdirs.map(p => s"$p/$sub").filter(dirHasData).map { d =>
        val sch = if (sub == "index") indexSchema else manifestSchema
        spark.read.schema(sch).parquet(d).select(col(column).as("hash"))
      }
    val stagedHashes =
      (stagedParts("index", "chunkHash") ++ stagedParts("manifest", "hash"))
        .foldLeft(spark.emptyDataset[String].toDF("hash"))(_ unionAll _)

    val live = indicesDF.select(col("chunkHash").as("hash"))
      .unionAll(stagedHashes).distinct()
    val mf = manifestDF.cache()
    val dead = mf.join(live, Seq("hash"), "left_anti")

    val dir = chunksDir
    val hc = hconf
    val grace = graceMs
    // one distributed pass: delete stale dead blobs, keep fresh ones
    // (grace), report which rows actually left the store
    val swept = dead.as[(String, Long)].mapPartitions { it =>
      val fsLocal = new Path(dir).getFileSystem(hc.value)
      val nowLocal = System.currentTimeMillis()
      it.map { case (h, nb) =>
        val p = GraftDataset.chunkPath(dir, h)
        val fresh =
          try nowLocal - fsLocal.getFileStatus(p).getModificationTime < grace
          catch { case _: java.io.IOException => false } // already gone
        if (fresh) (h, nb, false)
        else { fsLocal.delete(p, false); (h, nb, true) }
      }
    }.toDF("hash", "nBytes", "deleted").cache()

    val nDead = swept.filter(col("deleted")).count()
    if (nDead > 0) {
      // rewrite the manifest without the deleted rows (dedup included)
      val tmp = s"$path/manifest_sweep_${UUID.randomUUID().toString.take(8)}"
      mf.join(swept.filter(col("deleted")).select(col("hash")),
          Seq("hash"), "left_anti")
        .write.parquet(tmp)
      fs.delete(new Path(manifestDir), true)
      if (!fs.rename(new Path(tmp), new Path(manifestDir)))
        throw new RuntimeException("manifest sweep swap failed")
    }
    swept.unpersist()
    mf.unpersist()
    nDead
  }
}

object GraftDataset {
  /** Label the Spark jobs of `body` in the UI / listener stream
    * (guide §1.5) — commit-path phases are otherwise anonymous and
    * unattributable when profiling multi-commit flows. Restores the
    * caller's description (thread-local) on exit.
    */
  private[graft] def withDesc[T](spark: SparkSession, d: String)
      (body: => T): T = {
    val sc = spark.sparkContext
    val old = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"graft: $d")
    try body finally sc.setJobDescription(old)
  }

  /** Zone-stats fold shared by the write path and the ANALYZE
    * backfill ([[GraftDataset.analyzeIndexStats]]) — one
    * implementation so recomputed stats are bit-identical to
    * writer-computed ones for the same cells. Semantics are documented
    * on the index schema: min/max under Spark's NaN-greatest order
    * (−0.0 normalized), sums non-null only while order-independent in
    * IEEE doubles (integral finite cells, |mass| within
    * [[SumExactBound]]) or a deterministic non-finite. Fold order
    * never changes any produced value: min/max commute, the exact sum
    * is associative under the bound, and the bound check itself is
    * monotone in the (non-negative) running mass.
    */
  private[core] final class ZoneStatsAcc {
    private var mn = Double.PositiveInfinity
    private var mx = Double.NegativeInfinity
    private var anyNum = false
    private var anyNaN = false
    private var sumOk = true
    private var sum = 0.0
    private var abs = 0.0
    private var posInf = false
    private var negInf = false

    /** Fold in `n` cells of value `raw`. */
    def add(raw: Double, n: Long): Unit = {
      val value = if (raw == 0.0) 0.0 else raw
      if (value.isNaN) anyNaN = true
      else {
        anyNum = true
        if (value < mn) mn = value
        if (value > mx) mx = value
        if (value == Double.PositiveInfinity) posInf = true
        else if (value == Double.NegativeInfinity) negInf = true
        else if (sumOk) {
          val aContrib = math.abs(value) * n
          if (value != math.rint(value) ||
              abs + aContrib > GraftDataset.SumExactBound) sumOk = false
          else { sum += value * n; abs += aContrib }
        }
      }
    }

    /** (vmin, vmax) — None only for a zero-cell fold. */
    def zones: (Option[Double], Option[Double]) =
      if (!anyNum && !anyNaN) (None, None)
      else (Some(if (anyNum) mn else Double.NaN),
        Some(if (anyNaN) Double.NaN else mx))

    /** (vsum, vabs) — None when the sum would be fold-order-dependent. */
    def sums: (Option[Double], Option[Double]) =
      if (!sumOk) (None, None)
      else if (anyNaN || (posInf && negInf))
        (Some(Double.NaN), Some(Double.NaN))
      else if (posInf || negInf)
        (Some(if (posInf) Double.PositiveInfinity
              else Double.NegativeInfinity),
          Some(Double.PositiveInfinity))
      else (Some(sum), Some(abs))
  }

  /** Exactness bound for the zone SUM stats (2^52): a set of integral
    * doubles whose absolute sum stays within it adds EXACTLY in IEEE
    * double arithmetic in any order and over any subset — what makes
    * vsum/vabs safe to fold distributed and to decline past the bound
    * (the half-margin below 2^53 also absorbs the bound check itself
    * being evaluated on rounded partials).
    */
  private[graft] val SumExactBound: Double = 4503599627370496.0 // 2^52

  /** JVM-wide version-record listing counter (see the per-instance
    * [[GraftDataset.versionListEntries]]): gates paths that create
    * their own handles internally, like the streaming source's
    * per-micro-batch planner.
    */
  private[graft] val globalVersionListEntries =
    new java.util.concurrent.atomic.AtomicLong

  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[core] def jvmLock(path: String): Object =
    jvmLocks.computeIfAbsent(path, _ => new Object)

  /** Chunk blob location: sharded by 2-hex-char prefix so no directory
    * holds more than ~1/256 of the chunk population (object-store
    * listing and rename costs degrade with flat multi-million-entry
    * dirs).
    */
  /** Parse one version record / snapshot line
    * `{"versionId":N,"metadata":{...}}` — the balanced-object scan is
    * robust to fields added after `metadata` in future revisions.
    */
  private[core] def parseVersionRecord(json: String): (Long, Model.DatasetMeta) = {
    val idRe = """"versionId":\s*(\d+)""".r
    val id = idRe.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(
      throw new IllegalArgumentException(s"malformed version record"))
    val start = json.indexOf("\"metadata\":") + 11
    var i = json.indexOf('{', start)
    var depth = 0
    var end = -1
    while (end < 0 && i < json.length) {
      json.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) end = i
        case _ => ()
      }
      i += 1
    }
    require(end > 0, s"malformed version record")
    id -> Model.metaFromJson(json.substring(start, end + 1))
  }

  /** Parse one metas-snapshot line — a version record plus the
    * liveness flag (absent in pre-flag snapshots → live; those
    * predate record archiving, so the expired-dir listing still
    * overrides them).
    */
  private[core] def parseSnapshotLine(
      json: String): (Long, Boolean, Model.DatasetMeta) = {
    val (id, meta) = parseVersionRecord(json)
    val live = """"live":\s*(true|false)""".r.findFirstMatchIn(json)
      .forall(_.group(1) == "true")
    (id, live, meta)
  }

  private[graft] def chunkPath(chunksDir: String, hash: String): Path =
    new Path(chunksDir, s"${hash.take(2)}/$hash.bin")

  /** Executor-side content-addressed blob put: create-if-absent
    * (same-hash write is a no-op, hbase.clj:151-153) via a unique tmp
    * + rename, so task retries and concurrent same-hash writers are
    * both safe. An existing blob gets its mtime touched: a gc() whose
    * dead set predates this writer's staged manifest will then see a
    * fresh mtime and spare it (grace period); see gc(). The storage
    * codec is stamped into the blob envelope — hashes stay keyed by
    * the logical payload, so dedup spans codecs.
    */
  private[core] def putChunk(fs: FileSystem, chunksDir: String,
      rec: ChunkRecord, codec: Byte): Unit = {
    val target = chunkPath(chunksDir, rec.hash)
    if (fs.exists(target)) {
      try fs.setTimes(target, System.currentTimeMillis(), -1)
      catch { case _: java.io.IOException => () } // object stores
    } else {
      fs.mkdirs(target.getParent)
      val tmp = new Path(target.getParent,
        s".tmp-${rec.hash}-${UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, false)
      out.write(ChunkCodec.wrapBlob(rec.data, codec)); out.close()
      if (!fs.rename(tmp, target)) fs.delete(tmp, false)
    }
  }

  /** Read one content-addressed chunk blob's LOGICAL payload (the
    * envelope self-describes the storage codec); missing hash is an
    * error (read-chunk throws on unknown hashes, hbase.clj:131-133).
    * Blob-first: recent chunks live as individual files; a missing
    * blob falls through to the packed store ([[ChunkPack]]) before
    * failing.
    */
  private[graft] def readChunkFile(fs: FileSystem, chunksDir: String,
      hash: String): Array[Byte] = {
    val p = chunkPath(chunksDir, hash)
    // the exists→open window races a concurrent pack fold deleting the
    // blob it just copied — treat any vanish as "not a blob (anymore)"
    // and fall through to the pack
    val asBlob: Option[Array[Byte]] =
      try {
        if (!fs.exists(p)) None
        else {
          val len = fs.getFileStatus(p).getLen.toInt
          val buf = new Array[Byte](len)
          val in = fs.open(p)
          try in.readFully(buf) finally in.close()
          Some(buf)
        }
      } catch { case _: java.io.FileNotFoundException => None }
    val wrapped = asBlob
      .orElse(ChunkPack.readPacked(fs, chunksDir, hash))
      .getOrElse(
        throw new IllegalArgumentException(s"no chunk with hash $hash"))
    val payload = ChunkCodec.unwrapBlob(wrapped)
    // opt-in end-to-end integrity: chunks are content-addressed by the
    // sha1 of their logical payload, so a re-hash catches silent
    // storage corruption (bit rot, a torn pack range, a bad object
    // copy) at the read that first touches it. SQLConf propagates to
    // executor tasks of SQL executions; contexts without one default
    // to off.
    if (verifyChecksums && ChunkCodec.sha1Hex(payload) != hash)
      throw new IllegalStateException(
        s"chunk $hash failed checksum verification (stored bytes hash " +
          s"to ${ChunkCodec.sha1Hex(payload)}) — storage corruption in " +
          s"$chunksDir (blob or pack)")
    payload
  }

  private def verifyChecksums: Boolean =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.verifyChecksums", "false").toBoolean
    catch { case _: Throwable => false }
}

/** Stages slab writes for one new version, then commits atomically.
  * Mirrors the reference write lifecycle (SURVEY §3.2): chunks first,
  * then index entries, then the version record — with the manifest
  * staged BEFORE the chunks so every blob is enumerable from the
  * instant it exists.
  */
class SlabWriter private[core] (
    ds: GraftDataset, meta: DatasetMeta, val snapshot: Long) {
  import ds.spark.implicits._

  private val writerId = UUID.randomUUID().toString.take(12)
  private var done = false
  // driver-side ledger of staged physical index keys: lets commit run
  // its retired-key check with zero Spark jobs, and — when no variable
  // was staged twice — skip the self-duplication shuffle entirely (a
  // single writeSlab emits one row per chunk by construction, so only
  // re-staging the SAME variable can self-dup). A writeSlabAligned
  // whose misalignment probe fired marks the key dup-tainted: its
  // duplicate rows are already on disk, and a caller that swallows the
  // error and commits anyway must still be caught by the commit gate.
  private val stagedIdxs = scala.collection.mutable.Set.empty[String]
  private var dupStaged = false
  private def noteStaged(idx: String): Unit =
    if (!stagedIdxs.add(idx)) dupStaged = true

  /** Stage a slab of cells (DataFrame of coord ARRAY<LONG>, value
    * DOUBLE) for `variable`. Cells are re-chunked, merged with the
    * snapshot version's chunk contents (partial-chunk overwrite), tiles
    * encoded + content-hashed, manifest staged, chunks appended
    * (deduped), index rows staged. Everything distributed; nothing
    * collects to the driver.
    *
    * Shuffle shape (guide §2.3/§8 — decide with small rows, move big
    * rows once): NEW cells shuffle exactly once, as primitive
    * (linearChunkId, inTileOffset, value) tuples, into their chunk
    * group; the snapshot's OLD chunk contents never shuffle at all —
    * the as-of index resolves to one chunk-level row per live chunk
    * (cid, writerVersion, hash), those tiny rows cogroup with the new
    * cells, and each affected chunk's old BYTES are point-read and
    * decoded inside the same task that encodes the merged tile. (The
    * previous shape decoded old chunks in a separate stage and
    * shuffled every old CELL through the re-chunk exchange, and paid
    * a distinct + semi-join — two more exchanges and a second full
    * pass over the input — just to find the affected chunk set, which
    * the cogroup now yields for free: chunks with no new cells emit
    * nothing.)
    */
  def writeSlab(variable: String, cells: DataFrame): Unit = {
    require(!done, "writer already committed/aborted")
    val v = meta.variable(variable)
    val oldVarOpt: Option[VariableMeta] =
      if (snapshot == 0L) None
      else ds.metadata(snapshot).variables.find(_.idx == v.idx)
    oldVarOpt.foreach { ov =>
      require(ov.chunkDims == v.chunkDims,
        "chunkDims are immutable across versions")
    }

    val vb = v // serializable copy for the closures
    val grid = v.chunkGrid
    val rank = grid.length
    val cDir = s"${ds.path}/chunks"
    val hc = ds.hconf
    val checkedCells = SlabWriter.applyCheck(cells, v)
    val newCells = checkedCells.select(col("coord"), col("value"))
      .as[(Seq[Long], Double)]
      .map { case (coord, value) =>
        require(coord.length == rank, "cell rank mismatch")
        val ccArr = new Array[Long](rank)
        var cid = 0L
        var d = 0
        while (d < rank) {
          // out-of-shape cells must fail loudly: an out-of-grid chunk
          // coordinate linearizes into an id that can ALIAS an in-grid
          // chunk (and the staged row would be unreadable under the
          // current shape anyway) — grow the shape first (ALTER TABLE
          // / metadata commit), then write
          require(coord(d) >= 0 && coord(d) < vb.shape(d),
            s"cell coordinate ${coord.mkString(",")} outside shape " +
              s"${vb.shape.mkString(",")} of '${vb.name}' — grow the " +
              "variable before writing")
          ccArr(d) = coord(d) / vb.chunkDims(d)
          cid = cid * grid(d) + ccArr(d)
          d += 1
        }
        (cid, ChunkCodec.offsetOf(vb, ccArr.toSeq, coord), value)
      }
    val keyedNew = newCells.groupByKey(_._1)

    val encoded = oldVarOpt match {
      case None =>
        keyedNew.mapGroups { (cid, it) =>
          SlabWriter.encodeTile(vb, grid, rank, cid,
            it.map(t => (t._2, t._3)), None, cDir, hc, Map.empty)
        }
      case Some(_) =>
        val metasByVersion = ds.decodeMetas(v, snapshot)
        // chunk-level metadata rows for the snapshot's index HISTORY
        // (≤ snapshot) — the as-of argmax happens INSIDE the cogroup
        // task below instead of in resolveIndex's groupBy(coord), so
        // the history rows cross exactly ONE exchange (the cid
        // cogroup), not two (resolveIndex's coord exchange + the cid
        // re-key; guide §2.4 — two operations keyed the same way
        // share one exchange). Rows per chunk are bounded by the
        // index-log fold: the merged store holds one winner per
        // (variable, coord) at its boundary, only the post-boundary
        // tail contributes extra versions. Chunk payloads still cross
        // no exchange (point-read in the encode task).
        val oldRows = ds.indicesDF
          .filter(col("versionId") <= snapshot &&
            col("variable") === v.idx)
          .select(col("coord"), col("versionId"),
            coalesce(col("writerVersion"), col("versionId"))
              .as("writerVersion"),
            col("chunkHash"))
          .as[(Seq[Long], Long, Long, String)]
          // linearized ids of out-of-grid chunks can collide with
          // in-grid ids (shrink): drop them before keying — their
          // cells would fall outside the new shape anyway
          .filter { t: (Seq[Long], Long, Long, String) =>
            t._1.indices.forall(i => t._1(i) < grid(i))
          }
          .map { case (cc, vid, ver, h) =>
            var cid = 0L
            var d = 0
            while (d < rank) { cid = cid * grid(d) + cc(d); d += 1 }
            (cid, vid, ver, h)
          }
        keyedNew.cogroup(oldRows.groupByKey(_._1)) { (cid, newIt, oldIt) =>
          // chunks the slab does not touch stay as they are — emit
          // nothing (the old semi-join's "affected" set, for free)
          if (newIt.isEmpty) Iterator.empty
          else {
            // as-of winner among this chunk's history rows: max by
            // (versionId, writerVersion, chunkHash) — the exact
            // prefix resolveIndex's struct-argmax orders by (hex
            // hashes compare identically under UTF8-byte and
            // String order)
            var best: (Long, Long, Long, String) = null
            oldIt.foreach { t =>
              if (best == null || t._2 > best._2 ||
                  (t._2 == best._2 && (t._3 > best._3 ||
                    (t._3 == best._3 && t._4.compareTo(best._4) > 0))))
                best = t
            }
            Iterator.single(SlabWriter.encodeTile(vb, grid, rank, cid,
              newIt.map(t => (t._2, t._3)),
              Option(best).map(t => (t._3, t._4)),
              cDir, hc, metasByVersion))
          }
        }
    }
    stageEncoded(v, encoded)
    noteStaged(v.idx)
  }

  /** Chunk-ALIGNED slab write: every input partition must hold whole
    * chunks (no chunk's cells may span partitions) — exactly what a
    * chunk-keyed graft scan (`spark.graft.scan.keyedPartitions`) of a
    * same-grid variable produces. Cells encode into tiles
    * PER-PARTITION, with no re-chunk shuffle, so a co-partitioned
    * read → transform → write pipeline moves zero cell data across
    * the wire end-to-end — the array-calculus shape at 100 TB (the
    * only wide op left is the chunk-level misalignment probe, one
    * row per chunk). Task heap holds the partition's distinct tiles;
    * a keyed scan feeds exactly one per task.
    *
    * Aligned writes replace chunk contents wholesale — no merge with
    * the snapshot's partial-chunk cells (that merge inherently
    * resolves the old index, a shuffle) — so the target variable must
    * carry no committed chunks: fresh, post-TRUNCATE, or a fresh
    * epoch. Misaligned input (a chunk split across partitions) fails
    * the write before commit via the duplicate probe; the writer can
    * then be aborted cleanly.
    */
  def writeSlabAligned(variable: String, cells: DataFrame): Unit = {
    require(!done, "writer already committed/aborted")
    val v = meta.variable(variable)
    if (snapshot != 0L)
      ds.metadata(snapshot).variables.find(_.idx == v.idx).foreach { ov =>
        require(ov.chunkDims == v.chunkDims,
          "chunkDims are immutable across versions")
        require(ds.resolveIndex(ov.idx, snapshot,
            withStats = false).isEmpty,
          s"writeSlabAligned('${v.name}'): aligned writes replace " +
            "chunks wholesale and need an empty variable (fresh, " +
            "TRUNCATEd, or a fresh epoch) — use writeSlab for " +
            "partial-chunk overwrites")
      }
    val vb = v
    val rank = v.chunkGrid.length
    val encoded = SlabWriter.applyCheck(cells, v)
      .select(col("coord"), col("value"))
      .as[(Seq[Long], Double)]
      .mapPartitions { it =>
        val byChunk = scala.collection.mutable.HashMap
          .empty[Seq[Long], scala.collection.mutable.HashMap[Long, Double]]
        it.foreach { case (coord, value) =>
          require(coord.length == rank, "cell rank mismatch")
          val ccArr = new Array[Long](rank)
          var d = 0
          while (d < rank) {
            require(coord(d) >= 0 && coord(d) < vb.shape(d),
              s"cell coordinate ${coord.mkString(",")} outside shape " +
                s"${vb.shape.mkString(",")} of '${vb.name}' — grow the " +
                "variable before writing")
            ccArr(d) = coord(d) / vb.chunkDims(d)
            d += 1
          }
          val cc: Seq[Long] =
            scala.collection.immutable.ArraySeq.unsafeWrapArray(ccArr)
          val byOff = byChunk.getOrElseUpdate(cc,
            scala.collection.mutable.HashMap.empty[Long, Double])
          val off = ChunkCodec.offsetOf(vb, cc, coord)
          // same-slab duplicate cells: first wins (writeSlab parity)
          if (!byOff.contains(off)) byOff.update(off, value)
        }
        byChunk.iterator.map { case (cc, byOff) =>
          val acc = new GraftDataset.ZoneStatsAcc
          byOff.valuesIterator.foreach(acc.add(_, 1L))
          val tileN = ChunkCodec.tileSize(ChunkCodec.tileDims(vb, cc))
          if (byOff.size < tileN) acc.add(vb.fillValue, tileN - byOff.size)
          val zone = acc.zones
          val zsum = acc.sums
          val bytes = ChunkCodec.encode(vb, cc, byOff.iterator)
          (ChunkRecord(ChunkCodec.sha1Hex(bytes), bytes), cc,
            zone._1, zone._2, zsum._1, zsum._2)
        }
      }
    stageEncoded(v, encoded)
    noteStaged(v.idx)
    // misalignment probe: a chunk whose cells spanned partitions was
    // encoded more than once — two staged index rows at one
    // coordinate. One chunk-level job (rows = chunks, never cells).
    // The commit gate is ARMED while the probe is in flight: rows are
    // already on disk, so a probe that itself fails (transient I/O)
    // must leave a swallowed-error commit facing the full self-dup
    // check, not the attested skip. A clean probe restores the
    // writer's prior taint state.
    val priorDup = dupStaged
    dupStaged = true
    val dup = ds.spark.read.parquet(ds.stageIndexPath(writerId))
      .filter(col("variable") === v.idx)
      .groupBy(col("coord")).count()
      .filter(col("count") > 1).limit(1).collect()
    if (dup.nonEmpty) {
      throw new IllegalArgumentException(
        s"writeSlabAligned('${v.name}'): chunk " +
          s"[${dup.head.getSeq[Long](0).mkString(",")}] spans input " +
          "partitions — the input is not chunk-aligned; read through " +
          "a chunk-keyed scan or use writeSlab")
    }
    dupStaged = priorDup // probe proved this staging duplicate-free
  }

  /** Stage an encoded chunk set: manifest FIRST (every blob
    * enumerable from the instant it exists — no orphan-invisibility
    * window for gc), then blobs + index rows in ONE distributed pass.
    * Shared tail of the re-chunk ([[writeSlab]]) and chunk-aligned
    * ([[writeSlabAligned]]) paths.
    */
  private def stageEncoded(v: VariableMeta,
      encodedIn: Dataset[(ChunkRecord, Seq[Long], Option[Double],
        Option[Double], Option[Double], Option[Double])]): Unit = {
    val encodedRaw = encodedIn.cache()

    // 1) manifest write IS the encode pass (cache materializer): the
    //    chunk count rides it as an accumulator instead of paying a
    //    separate count() job first (guide §1.2 — one fewer pass;
    //    retries can only inflate the count, which only sizes the
    //    coalesce below). The manifest's own partitioning is the
    //    encode plan's output — AQE-coalesced for the re-chunk path,
    //    the input's own partition count for the aligned path —
    //    i.e. proportional to the commit's size either way.
    val nChunksAcc = ds.spark.sparkContext.longAccumulator(
      "graft.stage.nChunks")
    GraftDataset.withDesc(ds.spark, "stage: encode+manifest") {
      encodedRaw.map { case (rec, _, _, _, _, _) =>
        nChunksAcc.add(1L)
        (rec.hash, rec.data.length.toLong) }
        .toDF("hash", "nBytes")
        .write.mode("append").parquet(ds.stageManifestPath(writerId))
    }
    // size the blobs+index staging to the CHUNK COUNT, not the input
    // partitioning: a small commit (a streaming epoch, a DML touch, a
    // single-chunk append) otherwise inherits the parent's full
    // partition count and writes N near-empty parquet part-files per
    // commit — exactly the small-object pressure the hot-dir
    // compaction machinery exists to absorb — plus N task launches.
    // ~2 chunks per task shrinks ONLY genuinely small commits (the
    // cap restores full parallelism from ~2× the core count up, so
    // medium and big writes keep every blob-put slot — an 8-per-task
    // first cut cost medium DML flows ~50% wall by serializing
    // latency-bound puts). coalesce never splits a partition, so
    // writeSlabAligned's chunks-don't-span-partitions property (and
    // its duplicate-row misalignment probe) are unaffected.
    val nChunks = nChunksAcc.value
    val parts = math.max(1L, math.min((nChunks + 1L) / 2L,
      ds.spark.sparkContext.defaultParallelism.toLong)).toInt
    val encoded = encodedRaw.coalesce(parts)
    // 2) blobs AND index rows in ONE distributed pass: each blob put
    //    (content-addressed create-if-absent — idempotent, so task
    //    retries are safe) rides the staged-index write's partition
    //    iterator. Index rows existing before their blobs is harmless
    //    pre-commit; commit re-validates blob existence under the lock.
    val cDir2 = ds.chunksDir
    val hc2 = ds.hconf
    val codec = ChunkCodec.codecOf(
      ds.spark.conf.getOption("spark.graft.chunk.compression")
        .getOrElse("none"))
    val idxKey = v.idx
    GraftDataset.withDesc(ds.spark, "stage: blobs+index") {
      encoded.mapPartitions { it =>
        val fsLocal = new Path(cDir2).getFileSystem(hc2.value)
        val seen = scala.collection.mutable.HashSet.empty[String]
        it.map { case (rec, cc, vmin, vmax, vsum, vabs) =>
          if (seen.add(rec.hash))
            GraftDataset.putChunk(fsLocal, cDir2, rec, codec)
          (idxKey, cc, rec.hash, vmin, vmax, vsum, vabs)
        }
      }.toDF("variable", "coord", "chunkHash", "vmin", "vmax",
        "vsum", "vabs")
        .write.mode("append").parquet(ds.stageIndexPath(writerId))
    }
    encodedRaw.unpersist()
    ()
  }

  /** Validate + publish. Returns the new versionId, or throws
    * [[Model.CommitConflictException]] if an overlapping write or a
    * conflicting metadata change committed after this writer's
    * snapshot (retry by re-staging against a fresh writer).
    */
  def commit(): Long = {
    require(!done, "writer already committed/aborted")
    done = true
    val id = ds.commitStaged(writerId, snapshot, meta,
      Some(stagedIdxs.toSet), dupStaged)
    // post-commit, post-lock: threshold-triggered self-maintenance so
    // long runs of batch commits keep hot-dir counts bounded without
    // manual CALLs (advisory — cannot fail the committed write)
    ds.maybeAutoMaintain()
    id
  }

  /** Drop staged state; the staged manifest is folded into the global
    * manifest so the orphaned chunks are reclaimed by gc().
    */
  def abort(): Unit = {
    done = true
    ds.abortStaged(writerId)
  }
}

object SlabWriter {

  /** Encode ONE chunk's merged tile, executor-side: overlay the
    * slab's new cells (first-wins within the slab — writeSlab parity
    * with the aligned path) on the snapshot chunk's decoded old cells
    * (new cells always win; old cells outside the new shape drop —
    * hbase_test.clj:118-124 overwrite semantics), fold zone stats over
    * the tile exactly as a reader will decode it, and content-hash the
    * encoded bytes. The old chunk's bytes are point-read HERE, in the
    * task that consumes them, so they never cross a shuffle.
    *
    * Zone stats / encode order-independence: ZoneStatsAcc's contract
    * (documented there) makes the fold order immaterial, and
    * ChunkCodec.encode densifies by offset, so the produced bytes —
    * and therefore the content hash — are byte-identical to the
    * previous union+groupByKey implementation for the same cells.
    */
  private[core] def encodeTile(vb: VariableMeta, grid: Seq[Long],
      rank: Int, cid: Long, newIt: Iterator[(Long, Double)],
      oldRef: Option[(Long, String)], cDir: String,
      hc: SerializableHadoopConf,
      metasByVersion: Map[Long, VariableMeta])
      : (ChunkRecord, Seq[Long], Option[Double], Option[Double],
        Option[Double], Option[Double]) = {
    // delinearize the chunk id
    val ccArr = new Array[Long](rank)
    var rest = cid
    var d = rank - 1
    while (d >= 0) { ccArr(d) = rest % grid(d); rest /= grid(d); d -= 1 }
    val cc: Seq[Long] = ccArr.toSeq
    val byOff = scala.collection.mutable.HashMap.empty[Long, Double]
    newIt.foreach { case (off, value) =>
      if (!byOff.contains(off)) byOff.update(off, value)
    }
    oldRef.foreach { case (ver, h) =>
      val wv = metasByVersion(ver)
      val fsLocal = new Path(cDir).getFileSystem(hc.value)
      val bytes = GraftDataset.readChunkFile(fsLocal, cDir, h)
      ChunkCodec.decode(wv, bytes).foreach { case (off, value) =>
        val cell = ChunkCodec.cellOf(wv, cc, off)
        val inNew = cell.indices.forall(i => cell(i) < vb.shape(i))
        if (inNew) {
          val noff = ChunkCodec.offsetOf(vb, cc, cell)
          if (!byOff.contains(noff)) byOff.update(noff, value)
        }
      }
    }
    // zone stats over the tile as a reader will decode it (explicit
    // cells plus fill for unwritten gaps) — min/max under Spark/IEEE
    // TOTAL order, exact sums while order-independent; the shared
    // accumulator documents and owns the exact rules (ANALYZE
    // recomputes with the same code, so backfilled stats are
    // bit-identical to writer-computed ones)
    val acc = new GraftDataset.ZoneStatsAcc
    byOff.valuesIterator.foreach(acc.add(_, 1L))
    val tileN = ChunkCodec.tileSize(ChunkCodec.tileDims(vb, cc))
    if (byOff.size < tileN) acc.add(vb.fillValue, tileN - byOff.size)
    val zone = acc.zones
    val zsum = acc.sums
    val bytes = ChunkCodec.encode(vb, cc, byOff.iterator)
    (ChunkRecord(ChunkCodec.sha1Hex(bytes), bytes), cc,
      zone._1, zone._2, zsum._1, zsum._2)
  }

  /** Enforce the variable's CHECK constraint on a slab of cells —
    * codegen'd into the existing write pass (a `when`/`raise_error`
    * projection over the value column), so enforcement costs zero
    * extra Spark jobs and covers every write surface that funnels
    * through [[SlabWriter.writeSlab]]: SQL INSERT, row-level DML,
    * both streaming sinks, and the Lake API.
    *
    * ANSI CHECK semantics: a NULL predicate result passes. Writes of
    * the fill value are exempt (Spark's `<=>` treats NaN as equal to
    * NaN), so DELETE — which rewrites cells to fill — never trips a
    * value constraint.
    */
  /** (cells with x0..x{r-1} derived, passing-predicate column). */
  private def checkCond(cells: DataFrame,
      v: VariableMeta): (DataFrame, Column) = {
    val rank = v.shape.length
    val base = cells.select(col("coord") +: col("value") +:
      (0 until rank).map(i =>
        element_at(col("coord"), i + 1).as(s"x$i")): _*)
    (base, coalesce(expr(v.check).cast("boolean"), lit(true)) ||
      col("value") <=> lit(v.fillValue))
  }

  private[graft] def applyCheck(cells: DataFrame,
      v: VariableMeta): DataFrame =
    if (v.check.isEmpty) cells
    else {
      val (base, ok) = checkCond(cells, v)
      base.select(col("coord"),
        when(ok, col("value")).otherwise(raise_error(concat(
          lit(s"CHECK constraint '${v.check}' violated on " +
            s"'${v.name}': cell ["),
          concat_ws(",", col("coord").cast("array<string>")),
          lit("] = "), col("value").cast("string")))
          .cast("double")).as("value"))
    }

  /** The rows of `cells` that VIOLATE the constraint (empty DF when
    * none is set) — the existence probe behind ADD CONSTRAINT's
    * existing-data validation.
    */
  private[graft] def checkViolations(cells: DataFrame,
      v: VariableMeta): DataFrame =
    if (v.check.isEmpty) cells.limit(0)
    else {
      val (base, ok) = checkCond(cells, v)
      base.where(!ok).select(col("coord"), col("value"))
    }
}
