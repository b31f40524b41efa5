package graft.core

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}

/** LSM-style packing of the content-addressed blob store.
  *
  * The write path keeps its one-file-per-chunk layout
  * (`chunks/<2hex>/<sha1>.bin` — tmp+rename puts stay idempotent and
  * lock-free, GraftDataset.putChunk), but at 100 TB that's billions of
  * ~64 KB objects: every LIST pages forever and per-object overhead
  * dominates storage cost. [[GraftDataset.packChunks]] folds committed
  * blobs into large immutable pack files, sharded by the same 2-hex
  * hash prefix the blob dirs already use:
  *
  * {{{
  * packs/b=<2hex>/pack-<uuid>.bin    // concatenated wrapped blobs
  * packs/b=<2hex>/index-<n>.txt      // hash \t pack \t offset \t len
  * }}}
  *
  * The highest-`n` index file is the bucket's complete hash→location
  * map (an LSM level manifest: data files append-only, the small
  * metadata file rewritten per fold). Readers stay blob-first — a
  * missing blob falls back to [[locate]], which serves from a
  * process-wide immutable-file cache and self-heals on miss by
  * re-listing the bucket (a concurrent pack run may have folded the
  * blob since the cache was filled). Reference: the blob table of
  * hbase.clj:21-23 — HBase gets packing for free from HFile
  * compaction; this is the object-store equivalent.
  */
object ChunkPack {

  /** A packed chunk's location: `len` bytes at `offset` of `pack`
    * (bucket-relative file name), holding exactly the bytes the blob
    * file held (the wrapped envelope — hashes stay keyed by logical
    * payload, so dedup and codec-stamping behave identically packed
    * or not).
    */
  case class Entry(hash: String, pack: String, offset: Long, len: Long)

  private[core] def packsRoot(chunksDir: String): Path =
    new Path(new Path(chunksDir).getParent, "packs")

  private[core] def bucketDir(chunksDir: String, bucket: String): Path =
    new Path(packsRoot(chunksDir), s"b=$bucket")

  // ---------- bucket prefix length (sub-sharding) ----------
  //
  // Pack buckets shard on the first `prefixLen` hex chars of the hash.
  // 2 matches the blob dirs (256 buckets); 3/4 sub-shard each blob dir
  // 16/256-ways so a fold task's in-memory hash maps shrink
  // proportionally (the blob dir is still LISTed once per sub-shard
  // task, but streamed — names outside the sub-shard never
  // materialize). The length is chosen on the FIRST fold
  // (`spark.graft.pack.prefixLen`) and pinned in `packs/_prefix`
  // forever after: re-sharding an existing pack store would strand
  // packed bytes under bucket dirs readers no longer probe, so later
  // folds ignore the conf and reuse the pinned value.

  private val PrefixMarker = "_prefix"

  /** The pinned prefix length, from the marker (else inferred from the
    * oldest layout's bucket-dir names); None when nothing is packed.
    */
  private[core] def resolvePrefixLen(fs: FileSystem,
      chunksDir: String): Option[Int] = {
    val root = packsRoot(chunksDir)
    val marker = new Path(root, PrefixMarker)
    val fromMarker: Option[Int] =
      try {
        if (!fs.exists(marker)) None
        else {
          val in = fs.open(marker)
          val txt = try {
            val buf = new Array[Byte](16)
            val n = in.read(buf)
            if (n <= 0) "" else new String(buf, 0, n, "UTF-8").trim
          } finally in.close()
          txt.toIntOption
        }
      } catch { case _: java.io.FileNotFoundException => None }
    fromMarker.orElse {
      // pre-marker pack stores: every bucket dir shares one length
      if (!fs.exists(root)) None
      else fs.listStatus(root).iterator.filter(_.isDirectory)
        .map(_.getPath.getName.stripPrefix("b=").length)
        .toSeq.headOption
    }
  }

  /** Pin `len` in the marker if not already pinned (caller holds the
    * dataset commit lock). Returns the effective pinned length.
    */
  private[core] def pinPrefixLen(fs: FileSystem, chunksDir: String,
      len: Int): Int =
    resolvePrefixLen(fs, chunksDir).getOrElse {
      val root = packsRoot(chunksDir)
      fs.mkdirs(root)
      val tmp = new Path(root, s".tmp-prefix-${UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, false)
      try out.write(len.toString.getBytes("UTF-8")) finally out.close()
      if (!fs.rename(tmp, new Path(root, PrefixMarker))) {
        fs.delete(tmp, false)
        // lost a (lock-violating) race — trust whatever landed
        return resolvePrefixLen(fs, chunksDir).getOrElse(len)
      }
      len
    }

  /** Cached prefix length per pack store. Only resolved values are
    * cached (the length is immutable once anything is packed); an
    * unpacked store re-resolves per call so the first fold is seen
    * promptly.
    */
  private val prefixCache = new ConcurrentHashMap[String, Integer]()

  private def prefixLenCached(fs: FileSystem, chunksDir: String): Option[Int] = {
    val key = packsRoot(chunksDir).toString
    Option(prefixCache.get(key)).map(_.intValue).orElse {
      val r = resolvePrefixLen(fs, chunksDir)
      r.foreach { v =>
        if (prefixCache.size > 1024) prefixCache.clear()
        prefixCache.put(key, Integer.valueOf(v))
      }
      r
    }
  }

  private def indexName(id: Long): String = s"index-$id.txt"

  private val IndexRe = "index-(\\d+)\\.txt".r

  /** Ids of all index files present in `bDir`, ascending. */
  private[core] def indexIds(fs: FileSystem, bDir: Path): Seq[Long] =
    if (!fs.exists(bDir)) Seq.empty
    else fs.listStatus(bDir).toSeq.map(_.getPath.getName).collect {
      case IndexRe(n) => n.toLong
    }.sorted

  /** Latest bucket index: (id, entries); (-1, empty) when unpacked. */
  private[core] def readIndex(fs: FileSystem,
      bDir: Path): (Long, Map[String, Entry]) =
    indexIds(fs, bDir).lastOption match {
      case None => (-1L, Map.empty)
      case Some(id) =>
        val in = fs.open(new Path(bDir, indexName(id)))
        val txt =
          try {
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](65536)
            var n = in.read(buf)
            while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
            bos.toString("UTF-8")
          } finally in.close()
        val entries = txt.split('\n').iterator.filter(_.nonEmpty).map {
          line =>
            val f = line.split('\t')
            f(0) -> Entry(f(0), f(1), f(2).toLong, f(3).toLong)
        }.toMap
        (id, entries)
    }

  /** Atomically publish `index-<id>.txt` (unique tmp + rename — the
    * caller holds the dataset commit lock, so `id` is unclaimed).
    */
  private[core] def writeIndex(fs: FileSystem, bDir: Path, id: Long,
      entries: Iterable[Entry]): Unit = {
    fs.mkdirs(bDir)
    val tmp = new Path(bDir, s".tmp-idx-${UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, false)
    try {
      val sb = new StringBuilder
      entries.foreach { e =>
        sb.append(e.hash).append('\t').append(e.pack).append('\t')
          .append(e.offset).append('\t').append(e.len).append('\n')
        if (sb.length > (1 << 20)) {
          out.write(sb.toString.getBytes("UTF-8")); sb.clear()
        }
      }
      out.write(sb.toString.getBytes("UTF-8"))
    } finally out.close()
    if (!fs.rename(tmp, new Path(bDir, indexName(id)))) {
      fs.delete(tmp, false)
      throw new RuntimeException(
        s"pack index swap failed for $bDir #$id")
    }
  }

  // ---------- read path ----------

  /** Process-wide bucket-index cache. Index files are immutable and
    * versioned, so cached content never goes stale — only incomplete
    * (a newer index may exist). Missing hashes re-list before giving
    * up; a bounded clear keeps long-lived executors from pinning every
    * bucket of every dataset they ever touched.
    */
  private val cache =
    new ConcurrentHashMap[String, (Long, Map[String, Entry])]()

  private[graft] def invalidateCache(): Unit = {
    cache.clear(); prefixCache.clear()
  }

  /** Find `hash` in its bucket's pack index, refreshing the cached
    * index from storage if the cached generation misses. Returns None
    * only when the freshest index doesn't know the hash.
    */
  private[core] def locate(fs: FileSystem, chunksDir: String,
      hash: String): Option[Entry] =
    prefixLenCached(fs, chunksDir) match {
      case None => None
      case Some(pl) => locateIn(fs, chunksDir, hash, hash.take(pl))
    }

  private def locateIn(fs: FileSystem, chunksDir: String,
      hash: String, bucket: String): Option[Entry] = {
    val bDir = bucketDir(chunksDir, bucket)
    val key = bDir.toString
    val cached = Option(cache.get(key))
    cached.flatMap(_._2.get(hash)) match {
      case some @ Some(_) => some
      case None =>
        val latest = indexIds(fs, bDir).lastOption.getOrElse(-1L)
        if (latest < 0 || cached.exists(_._1 >= latest)) None
        else {
          val fresh = readIndex(fs, bDir)
          if (cache.size > 1024) cache.clear()
          cache.put(key, fresh)
          fresh._2.get(hash)
        }
    }
  }

  /** Ranged read of a packed chunk's wrapped bytes. Retries once with
    * a cache refresh if the pack file vanished underneath (a fold
    * rewrote the pack and gc swept it past the grace period while this
    * reader held the stale index generation).
    */
  private[core] def readPacked(fs: FileSystem, chunksDir: String,
      hash: String): Option[Array[Byte]] = {
    val pl = prefixLenCached(fs, chunksDir).getOrElse(return None)
    val bDir = bucketDir(chunksDir, hash.take(pl))
    def attempt(e: Entry): Option[Array[Byte]] =
      try {
        val in = fs.open(new Path(bDir, e.pack))
        try {
          in.seek(e.offset)
          val buf = new Array[Byte](e.len.toInt)
          in.readFully(buf)
          Some(buf)
        } finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
    locate(fs, chunksDir, hash).flatMap { e =>
      attempt(e).orElse {
        cache.remove(bDir.toString)
        locate(fs, chunksDir, hash).flatMap(attempt)
      }
    }
  }

  // ---------- pack maintenance (one bucket, executor-side) ----------

  /** Fold one bucket: pack every committed blob in `live` into a new
    * pack file, prune index entries whose hash left the manifest (gc
    * swept it), and rewrite packs whose live-byte fraction fell below
    * `rewriteLiveFrac` (space reclaim — the LSM compaction step).
    * Superseded index generations and orphaned packs are left in
    * place for in-flight readers; [[GraftDataset.gc]] grace-sweeps
    * them. Returns (blobsPacked, blobsDeduped, packsRewritten).
    *
    * Runs on an executor under the dataset commit lock (single
    * packer); `live` is this bucket's slice of the chunk manifest.
    *
    * Memory shape: the task materializes its bucket's hash set and
    * index entries (~100 B each). At 10^9 chunks / 256 buckets that is
    * ~4M entries ≈ 400 MB per task; `spark.graft.pack.prefixLen` = 3/4
    * sub-shards each blob dir 16/256-ways, shrinking the per-task
    * footprint proportionally (the blob dir is LISTed once per
    * sub-shard task, but streamed — out-of-shard names are dropped at
    * the iterator).
    */
  private[core] def packBucket(fs: FileSystem, chunksDir: String,
      bucket: String, live: Set[String],
      rewriteLiveFrac: Double): (Long, Long, Long) = {
    val bDir = bucketDir(chunksDir, bucket)
    val blobDir = new Path(chunksDir, bucket.take(2))
    val present: Set[String] =
      if (!fs.exists(blobDir)) Set.empty
      else {
        val it = fs.listStatusIterator(blobDir)
        val b = Set.newBuilder[String]
        while (it.hasNext) {
          val nm = it.next().getPath.getName
          if (nm.endsWith(".bin") && nm.startsWith(bucket))
            b += nm.stripSuffix(".bin")
        }
        b.result()
      }

    val (curId, oldIdx) = readIndex(fs, bDir)
    val kept = oldIdx.filter { case (h, _) => live(h) }
    val toPack = ((present & live) -- oldIdx.keySet).toSeq.sorted
    // same-content blob re-put after its hash was packed: the pack copy
    // wins (blob-first readers saw identical bytes either way)
    val dupBlobs = (present & live & oldIdx.keySet).toSeq

    // live-byte fraction per referenced pack file
    val packLen: Map[String, Long] =
      if (!fs.exists(bDir)) Map.empty
      else fs.listStatus(bDir).iterator.filter(
          _.getPath.getName.startsWith("pack-"))
        .map(st => st.getPath.getName -> st.getLen).toMap
    val liveByPack: Map[String, Long] =
      kept.values.groupBy(_.pack).map { case (p, es) =>
        p -> es.map(_.len).sum
      }
    val rewrite: Set[String] = packLen.keySet.filter { p =>
      val total = packLen(p)
      total > 0 && liveByPack.getOrElse(p, 0L).toDouble / total <
        rewriteLiveFrac && liveByPack.contains(p)
    }

    val prunedDead = kept.size < oldIdx.size
    if (toPack.isEmpty && rewrite.isEmpty && dupBlobs.isEmpty &&
        !prunedDead)
      return (0L, 0L, 0L)

    val moved = kept.values.filter(e => rewrite(e.pack)).toSeq
    val newEntries = ArrayBuffer.empty[Entry]
    if (toPack.nonEmpty || moved.nonEmpty) {
      val packName = s"pack-${UUID.randomUUID().toString.take(12)}.bin"
      val tmp = new Path(bDir,
        s".tmp-pack-${UUID.randomUUID().toString.take(8)}")
      fs.mkdirs(bDir)
      val out = fs.create(tmp, false)
      var off = 0L
      try {
        toPack.foreach { h =>
          val p = new Path(blobDir, s"$h.bin")
          val len = fs.getFileStatus(p).getLen
          val buf = new Array[Byte](len.toInt)
          val in = fs.open(p)
          try in.readFully(buf) finally in.close()
          out.write(buf)
          newEntries += Entry(h, packName, off, len)
          off += len
        }
        moved.foreach { e =>
          val buf = new Array[Byte](e.len.toInt)
          val in = fs.open(new Path(bDir, e.pack))
          try { in.seek(e.offset); in.readFully(buf) } finally in.close()
          out.write(buf)
          newEntries += Entry(e.hash, packName, off, e.len)
          off += e.len
        }
      } finally out.close()
      if (!fs.rename(tmp, new Path(bDir, packName))) {
        fs.delete(tmp, false)
        throw new RuntimeException(s"pack data swap failed for $bDir")
      }
    }

    val newIdx =
      kept.values.filterNot(e => rewrite(e.pack)) ++ newEntries
    writeIndex(fs, bDir, curId + 1, newIdx)

    // blobs now served from the pack: drop the per-chunk files (the
    // index commit above is the durability point; blob-first readers
    // simply fall through)
    (toPack ++ dupBlobs).foreach { h =>
      fs.delete(new Path(blobDir, s"$h.bin"), false)
    }
    (toPack.size.toLong, dupBlobs.size.toLong, rewrite.size.toLong)
  }

  /** gc's bucket sweep: once the newest index generation outlives the
    * grace period, superseded index files and packs it doesn't
    * reference are unreachable from any fresh read — delete them.
    */
  private[core] def sweepBucket(fs: FileSystem, bDir: Path,
      graceMs: Long, now: Long): Long = {
    val ids = indexIds(fs, bDir)
    ids.lastOption match {
      case None => 0L
      case Some(latest) =>
        val latestP = new Path(bDir, indexName(latest))
        if (now - fs.getFileStatus(latestP).getModificationTime <= graceMs)
          0L
        else {
          val (_, idx) = readIndex(fs, bDir)
          val referenced = idx.values.map(_.pack).toSet
          var n = 0L
          ids.dropRight(1).foreach { id =>
            if (fs.delete(new Path(bDir, indexName(id)), false)) n += 1
          }
          fs.listStatus(bDir).foreach { st =>
            val nm = st.getPath.getName
            val stale = now - st.getModificationTime > graceMs
            if ((nm.startsWith("pack-") && !referenced(nm) && stale) ||
                (nm.startsWith(".tmp-") && stale)) {
              if (fs.delete(st.getPath, st.isDirectory)) n += 1
            }
          }
          n
        }
    }
  }
}
