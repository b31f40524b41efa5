package graft.core

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
  */
class GraftDataset(val spark: SparkSession, val path: String) {
  import spark.implicits._

  private def fs: FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val chunksDir = s"$path/chunks"
  private val refsDir = s"$path/refs"
  private val indicesDir = s"$path/indices"
  private val versionsDir = s"$path/versions"
  private val stagingDir = s"$path/staging"

  private val indexSchema = StructType(Seq(
    StructField("variable", StringType),
    StructField("coord", ArrayType(LongType, containsNull = false)),
    StructField("chunkHash", StringType)))

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

  /** All committed versions, newest first, optional limit —
    * Connection.versions (hbase.clj:283-297) ordered numerically (the
    * reference leans on lexicographic row-key order; SURVEY §7.4 #5).
    */
  def versionIds(): Seq[Long] = versionIdCache match {
    case Some(ids) if cacheEnabled => ids
    case _ =>
      val d = new Path(versionsDir)
      val ids =
        if (!fs.exists(d)) Seq.empty[Long]
        else fs.listStatus(d).map(_.getPath.getName)
          .filter(_.endsWith(".json"))
          .map(_.stripSuffix(".json").toLong).toSeq.sortBy(-_)
      if (cacheEnabled) versionIdCache = Some(ids)
      ids
  }

  def versions(limit: Option[Int] = None): Seq[Version] = {
    val ids = limit.fold(versionIds())(n => versionIds().take(n))
    ids.map(id => Version(id, metadata(id)))
  }

  def latestVersion: Option[Long] = versionIds().headOption

  /** Connection.metadata (hbase.clj:278-281). */
  def metadata(versionId: Long): DatasetMeta = {
    if (cacheEnabled) {
      val hit = metaCache.get(versionId)
      if (hit != null) return hit
    }
    val m = loadMetadata(versionId)
    if (cacheEnabled) metaCache.put(versionId, m)
    m
  }

  private def loadMetadata(versionId: Long): DatasetMeta = {
    val p = new Path(versionsDir, f"$versionId%020d.json")
    if (!fs.exists(p))
      throw new IllegalArgumentException(s"no version $versionId")
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      val json = new String(bytes, "UTF-8")
      metaFromJson(json.substring(json.indexOf("\"metadata\":") + 11,
        json.length - 1))
    } finally in.close()
  }

  // ---------- raw tables (inspection + join inputs) ----------

  /** The chunk table as a DataFrame (hash, data). Chunks live as
    * content-addressed blob files `chunks/<sha1>.bin` — the KV chunk
    * table (hbase.clj:21-23) as an object store: writes are
    * create-if-absent (idempotent by content hash), point reads open
    * exactly one file, GC deletes files.
    */
  def chunksDF: DataFrame = {
    val hashes = chunkHashes()
    val dir = chunksDir
    spark.createDataset(hashes).mapPartitions { it =>
      val fsLocal = new Path(dir)
        .getFileSystem(new org.apache.hadoop.conf.Configuration())
      it.map(h => ChunkRecord(h, GraftDataset.readChunkFile(fsLocal, dir, h)))
    }.toDF()
  }

  /** All stored chunk hashes (driver-side recursive listing over the
    * 256 prefix shards).
    */
  def chunkHashes(): Seq[String] = {
    val p = new Path(chunksDir)
    if (!fs.exists(p)) Seq.empty
    else {
      val it = fs.listFiles(p, true)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val name = it.next().getPath.getName
        if (name.endsWith(".bin")) out += name.stripSuffix(".bin")
      }
      out.toSeq
    }
  }

  /** Point chunk read — ChunkStore.read-chunk (hbase.clj:124-133). */
  def readChunk(hash: String): Array[Byte] = {
    require(hash.nonEmpty, "chunk hash must be non-empty")
    GraftDataset.readChunkFile(fs, chunksDir, hash)
  }

  def refsDF: DataFrame =
    if (dirHasData(refsDir)) spark.read.parquet(refsDir)
    else spark.emptyDataset[RefDelta].toDF()

  /** All committed index rows with their versionId partition column. */
  def indicesDF: DataFrame = {
    val parts = if (fs.exists(new Path(indicesDir)))
      fs.listStatus(new Path(indicesDir))
        .filter(_.getPath.getName.startsWith("versionId=")).toSeq
    else Seq.empty
    if (parts.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        indexSchema.add(StructField("versionId", LongType)))
    else
      spark.read.option("basePath", indicesDir)
        .schema(indexSchema)
        .parquet(parts.map(_.getPath.toString): _*)
        // partition dir column comes back typed by inference; normalize
        .withColumn("versionId", col("versionId").cast(LongType))
  }

  /** Current ref count of a chunk — ChunkStore.chunk-refs
    * (hbase.clj:135-136) as an aggregate over the delta log.
    */
  def refCounts: DataFrame =
    refsDF.groupBy(col("hash")).agg(sum(col("delta")).as("refCount"))

  // ---------- the as-of read path ----------

  /** Batch as-of index resolution: newest entry per chunk-coord with
    * versionId <= asOf — find-index (hbase.clj:184-198) for the whole
    * variable at once via a max_by-style aggregate (one shuffle on
    * coord; versionId partition pruning bounds the scan).
    */
  def resolveIndex(variable: String, asOf: Long): DataFrame =
    indicesDF
      .filter(col("versionId") <= asOf && col("variable") === variable)
      .groupBy(col("coord"))
      .agg(max(struct(col("versionId"), col("chunkHash"))).as("m"))
      .select(col("coord"), col("m.versionId").as("versionId"),
        col("m.chunkHash").as("chunkHash"))

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
    val asOfMeta = metadata(asOf)
    val v = asOfMeta.variable(variable)
    // metas of every version (chunks decode with the meta they were
    // written under — grow/shrink changes edge-tile dims, SURVEY §7.4 #4)
    val metasByVersion: Map[Long, VariableMeta] =
      versionIds().filter(_ <= asOf).flatMap { id =>
        val m = metadata(id)
        m.variables.find(_.name == variable).map(id -> _)
      }.toMap
    val grid = v.chunkGrid
    val nChunks = grid.product max 1L
    val rank = v.shape.length

    // all chunk coords of the as-of grid, via div/mod arithmetic —
    // no driver-side loop, no cross join; region prunes at chunk level
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
    val wantedChunks = prunedCells.toDF("coord")

    val resolved = resolveIndex(variable, asOf)
    val joined = wantedChunks
      .join(resolved, Seq("coord"), "left")
      .select(col("coord"), col("versionId"), col("chunkHash"))

    val regionArr = region.map(_.toArray)
    val cDir = chunksDir
    val cells = joined.as[(Seq[Long], Option[Long], Option[String])]
      .mapPartitions { part =>
        // batched executor-side point reads of the blob store — the
        // set-oriented replacement for the reference's per-coordinate
        // chunk GET (hbase.clj:124-133)
        val fsLocal = new Path(cDir)
          .getFileSystem(new org.apache.hadoop.conf.Configuration())
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
              val values = ChunkCodec.decode(wv, b).map(_._2).toArray
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

  // ---------- write path ----------

  def newWriter(meta: DatasetMeta): SlabWriter =
    new SlabWriter(this, meta, latestVersion.getOrElse(0L))

  private[core] def dirHasData(dir: String): Boolean = {
    val p = new Path(dir)
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.getLen > 0 || st.isDirectory)
  }

  private[core] def appendChunks(newChunks: Dataset[ChunkRecord]): Unit = {
    // content-addressed dedup: same-hash write is a no-op
    // (hbase.clj:151-153) — executor-side create-if-absent blob writes
    val dir = chunksDir
    newChunks.dropDuplicates("hash").foreachPartition {
      it: Iterator[ChunkRecord] =>
        val fsLocal = new Path(dir)
          .getFileSystem(new org.apache.hadoop.conf.Configuration())
        it.foreach { rec =>
          val target = GraftDataset.chunkPath(dir, rec.hash)
          if (!fsLocal.exists(target)) {
            fsLocal.mkdirs(target.getParent)
            val tmp = new Path(target.getParent,
              s".tmp-${rec.hash}-${UUID.randomUUID().toString.take(8)}")
            val out = fsLocal.create(tmp, false)
            out.write(rec.data); out.close()
            if (!fsLocal.rename(tmp, target)) fsLocal.delete(tmp, false)
          }
        }
    }
  }

  private[core] def appendRefs(deltas: Dataset[RefDelta]): Unit =
    deltas.write.mode("append").parquet(refsDir)

  private[core] def stagePath(writerId: String): String =
    s"$stagingDir/$writerId"

  /** Serialized commit critical section: a JVM-level mutex per dataset
    * path (local create(overwrite=false) is check-then-create, NOT
    * atomic — concurrent in-process writers would both "acquire" the
    * file lock) plus a lock file for cross-process writers (atomic
    * create on HDFS-like stores; single-writer lock is the acceptable
    * v0 fallback per SURVEY §7.4 #1; stale locks older than 60s are
    * stolen).
    */
  private[core] def withCommitLock[T](body: => T): T =
    GraftDataset.jvmLock(path).synchronized { withCommitLockFile(body) }

  private def withCommitLockFile[T](body: => T): T = {
    val lock = new Path(versionsDir, "_commit.lock")
    var acquired = false
    val deadline = System.currentTimeMillis() + 120000
    while (!acquired) {
      try {
        val out = fs.create(lock, false)
        out.writeLong(System.currentTimeMillis()); out.close()
        acquired = true
      } catch {
        case _: java.io.IOException =>
          val age = try {
            System.currentTimeMillis() - fs.getFileStatus(lock)
              .getModificationTime
          } catch { case _: java.io.IOException => 0L }
          if (age > 60000) fs.delete(lock, false)
          else if (System.currentTimeMillis() > deadline)
            throw new RuntimeException("commit lock timeout")
          else Thread.sleep(50)
      }
    }
    try body finally fs.delete(lock, false)
  }

  private[core] def commitStaged(writerId: String, snapshot: Long,
      meta: DatasetMeta): Long = withCommitLock {
    val staged = stagePath(writerId)
    val hasStaged = dirHasData(staged)
    val stagedDF =
      if (hasStaged) spark.read.schema(indexSchema).parquet(staged)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)

    // self-consistency: the same (variable, coord) staged twice with
    // different content would tie on versionId at read time and
    // resolve arbitrarily — reject at the commit boundary
    if (hasStaged) {
      val selfDupes = stagedDF
        .groupBy(col("variable"), col("coord"))
        .agg(countDistinct(col("chunkHash")).as("n"))
        .filter(col("n") > 1).count()
      if (selfDupes > 0) {
        fs.delete(new Path(staged), true)
        throw new IllegalStateException(
          s"$selfDupes coordinates staged twice with different content " +
            "in one version")
      }
    }

    // conflict detection: any committed version after our snapshot that
    // wrote an overlapping (variable, coord)? (strictly stronger than
    // the reference's per-coordinate CAS — SURVEY §4.5)
    val later = versionIds().filter(_ > snapshot)
    if (later.nonEmpty && hasStaged) {
      val conflicting = stagedDF
        .join(indicesDF.filter(col("versionId") > snapshot),
          Seq("variable", "coord"), "left_semi")
        .count()
      if (conflicting > 0) {
        fs.delete(new Path(staged), true)
        throw new CommitConflictException(
          s"$conflicting staged entries overlap versions committed " +
            s"after snapshot $snapshot")
      }
    }

    var id = System.currentTimeMillis()
    val maxExisting = versionIds().headOption.getOrElse(0L)
    if (id <= maxExisting) id = maxExisting + 1

    // ref-count deltas: +1 per new index reference (append-only log
    // replacing the racy RMW at hbase.clj:156-172)
    if (hasStaged)
      appendRefs(stagedDF.select(col("chunkHash").as("hash"))
        .withColumn("delta", lit(1L)).as[RefDelta])

    // index partition move, then the version record — the commit point;
    // a version's existence implies its data is in place (SURVEY §3.2)
    if (hasStaged) {
      val target = new Path(s"$indicesDir/versionId=$id")
      if (!fs.rename(new Path(staged), target))
        throw new RuntimeException(s"rename to $target failed")
    }
    val tmp = new Path(versionsDir, s".tmp-$writerId")
    val out = fs.create(tmp, true)
    out.write(
      (s"""{"versionId":$id,"metadata":${metaToJson(meta)}}""")
        .getBytes("UTF-8"))
    out.close()
    if (!fs.rename(tmp, new Path(versionsDir, f"$id%020d.json")))
      throw new RuntimeException("version record rename failed")
    invalidateCaches()
    id
  }

  /** Compact the append-only ref-count delta log into one summed row
    * per hash (the periodic job of SURVEY §4.4's delta-log design).
    * Runs under the commit lock so no commit appends deltas mid-swap.
    */
  def compactRefs(): Unit = withCommitLock {
    if (!dirHasData(refsDir)) return
    val compacted = refCounts
      .select(col("hash"), col("refCount").as("delta")).as[RefDelta]
      .collect() // one row per live hash — bounded by chunk count
    val tmp = s"$path/refs_compact_${UUID.randomUUID().toString.take(8)}"
    spark.createDataset(compacted.toSeq).write.parquet(tmp)
    fs.delete(new Path(refsDir), true)
    if (!fs.rename(new Path(tmp), new Path(refsDir)))
      throw new RuntimeException("refs compaction swap failed")
  }

  /** Garbage collection: drop chunks referenced by no committed index
    * AND no in-flight staged write (a writer stages chunks before its
    * commit — deleting those would corrupt the version it is about to
    * publish). Runs under the commit lock so the staged/committed sets
    * can't shift mid-sweep; returns removed count.
    */
  def gc(): Long = withCommitLock {
    val stagedDirs =
      if (fs.exists(new Path(stagingDir)))
        fs.listStatus(new Path(stagingDir)).filter(_.isDirectory)
          .map(_.getPath.toString).toSeq.filter(dirHasData)
      else Seq.empty
    val stagedHashes =
      if (stagedDirs.isEmpty)
        spark.emptyDataset[String].toDF("chunkHash")
      else spark.read.schema(indexSchema).parquet(stagedDirs: _*)
        .select(col("chunkHash"))
    val live = indicesDF.select(col("chunkHash"))
      .unionAll(stagedHashes).distinct()
    val dead = spark.createDataset(chunkHashes()).toDF("chunkHash")
      .join(live, Seq("chunkHash"), "left_anti")
      .as[String]
    val dir = chunksDir
    val nDead = dead.mapPartitions { it =>
      // distributed blob deletes — no table rewrite needed
      val fsLocal = new Path(dir)
        .getFileSystem(new org.apache.hadoop.conf.Configuration())
      var n = 0L
      it.foreach { h =>
        if (fsLocal.delete(GraftDataset.chunkPath(dir, h), false)) n += 1
      }
      Iterator.single(n)
    }.collect().sum
    nDead
  }
}

object GraftDataset {
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[core] def jvmLock(path: String): Object =
    jvmLocks.computeIfAbsent(path, _ => new Object)

  /** Chunk blob location: sharded by 2-hex-char prefix so no directory
    * holds more than ~1/256 of the chunk population (object-store
    * listing and rename costs degrade with flat multi-million-entry
    * dirs).
    */
  private[graft] def chunkPath(chunksDir: String, hash: String): Path =
    new Path(chunksDir, s"${hash.take(2)}/$hash.bin")

  /** Read one content-addressed chunk blob; missing hash is an error
    * (read-chunk throws on unknown hashes, hbase.clj:131-133).
    */
  private[graft] def readChunkFile(fs: FileSystem, chunksDir: String,
      hash: String): Array[Byte] = {
    val p = chunkPath(chunksDir, hash)
    if (!fs.exists(p))
      throw new IllegalArgumentException(s"no chunk with hash $hash")
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(buf) finally in.close()
    buf
  }
}

/** Stages slab writes for one new version, then commits atomically.
  * Mirrors the reference write lifecycle (SURVEY §3.2): chunks first,
  * then index entries, then the version record.
  */
class SlabWriter private[core] (
    ds: GraftDataset, meta: DatasetMeta, val snapshot: Long) {
  import ds.spark.implicits._

  private val writerId = UUID.randomUUID().toString.take(12)
  private var done = false

  /** Stage a slab of cells (DataFrame of coord ARRAY<LONG>, value
    * DOUBLE) for `variable`. Cells are re-chunked, merged with the
    * snapshot version's chunk contents (partial-chunk overwrite), tiles
    * encoded + content-hashed, chunks appended (deduped), index rows
    * staged. Everything distributed; nothing collects to the driver.
    */
  def writeSlab(variable: String, cells: DataFrame): Unit = {
    require(!done, "writer already committed/aborted")
    val v = meta.variable(variable)
    val oldVarOpt: Option[VariableMeta] =
      if (snapshot == 0L) None
      else ds.metadata(snapshot).variables.find(_.name == variable)
    oldVarOpt.foreach { ov =>
      require(ov.chunkDims == v.chunkDims,
        "chunkDims are immutable across versions")
    }

    // the re-chunk shuffle moves only primitive tuples
    // (linearChunkId, inTileOffset, value, priority) — no per-cell
    // coordinate Seqs ride the wire
    val vb = v // serializable copy for the closures
    val grid = v.chunkGrid
    val rank = grid.length
    val newCells = cells.select(col("coord"), col("value"))
      .as[(Seq[Long], Double)]
      .map { case (coord, value) =>
        require(coord.length == rank, "cell rank mismatch")
        val ccArr = new Array[Long](rank)
        var cid = 0L
        var d = 0
        while (d < rank) {
          ccArr(d) = coord(d) / vb.chunkDims(d)
          cid = cid * grid(d) + ccArr(d)
          d += 1
        }
        (cid, ChunkCodec.offsetOf(vb, ccArr.toSeq, coord), value, 1)
      }

    // merge with snapshot chunk contents so partially-overwritten
    // chunks keep their old cells (overwrite tests,
    // hbase_test.clj:118-124); old cells outside the new shape drop
    val merged = oldVarOpt match {
      case None => newCells
      case Some(ov) =>
        val affected = newCells.map(_._1).distinct().toDF("cid")
        val cDir = s"${ds.path}/chunks"
        val metasByVersion = ds.versionIds().filter(_ <= snapshot)
          .flatMap { id =>
            ds.metadata(id).variables.find(_.name == variable).map(id -> _)
          }.toMap
        val newShape = v.shape
        val oldCells = ds.resolveIndex(variable, snapshot)
          .as[(Seq[Long], Long, String)]
          // linearized ids of out-of-grid chunks can collide with
          // in-grid ids (shrink): drop them before keying — their
          // cells would fall outside the new shape anyway
          .filter { t: (Seq[Long], Long, String) =>
            t._1.indices.forall(i => t._1(i) < grid(i))
          }
          .map { case (cc, ver, h) =>
            var cid = 0L
            var d = 0
            while (d < rank) { cid = cid * grid(d) + cc(d); d += 1 }
            (cid, cc, ver, h)
          }
          .toDF("cid", "cc", "ver", "h")
          .join(affected, Seq("cid"), "left_semi")
          .as[(Long, Seq[Long], Long, String)]
          .mapPartitions { part =>
            val fsLocal = new Path(cDir)
              .getFileSystem(new org.apache.hadoop.conf.Configuration())
            part.flatMap { case (cid, cc, ver, h) =>
              val wv = metasByVersion(ver)
              val bytes = GraftDataset.readChunkFile(fsLocal, cDir, h)
              ChunkCodec.decode(wv, bytes).flatMap { case (off, value) =>
                val cell = ChunkCodec.cellOf(wv, cc, off)
                val inNew = cell.indices.forall(i => cell(i) < newShape(i))
                if (inNew)
                  Iterator.single(
                    (cid, ChunkCodec.offsetOf(vb, cc, cell), value, 0))
                else Iterator.empty
              }
            }
          }
        newCells.unionAll(oldCells)
    }

    val encoded = merged.groupByKey(_._1).mapGroups { (cid, it) =>
      // delinearize the chunk id, prefer new cells (prio 1) over
      // merged-in old cells (prio 0)
      val ccArr = new Array[Long](rank)
      var rest = cid
      var d = rank - 1
      while (d >= 0) { ccArr(d) = rest % grid(d); rest /= grid(d); d -= 1 }
      val cc: Seq[Long] = ccArr.toSeq
      val byOff = scala.collection.mutable.HashMap.empty[Long, (Double, Int)]
      it.foreach { case (_, off, value, prio) =>
        byOff.get(off) match {
          case Some((_, p)) if p >= prio => ()
          case _ => byOff.update(off, (value, prio))
        }
      }
      val bytes = ChunkCodec.encode(vb, cc,
        byOff.iterator.map { case (off, (value, _)) => (off, value) })
      ChunkRecord(ChunkCodec.sha1Hex(bytes), bytes) -> cc
    }.cache()

    ds.appendChunks(encoded.map(_._1))
    encoded.map { case (rec, cc) => (variable, cc, rec.hash) }
      .toDF("variable", "coord", "chunkHash")
      .write.mode("append").parquet(ds.stagePath(writerId))
    encoded.unpersist()
    ()
  }

  /** Validate + publish. Returns the new versionId, or throws
    * [[Model.CommitConflictException]] if an overlapping write
    * committed after this writer's snapshot (retry by re-staging
    * against a fresh writer).
    */
  def commit(): Long = {
    require(!done, "writer already committed/aborted")
    done = true
    ds.commitStaged(writerId, snapshot, meta)
  }

  /** Drop staged state; orphaned chunks are reclaimed by gc(). */
  def abort(): Unit = {
    done = true
    val fs = new Path(ds.path)
      .getFileSystem(ds.spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(ds.stagePath(writerId)), true)
    ()
  }
}
