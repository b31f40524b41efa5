package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.security.MessageDigest

import Model.VariableMeta

/** Chunk tile <-> bytes codec. The reference treats chunk payloads as
  * opaque blobs keyed by SHA-1 of the bytes (hbase.clj:130,145-153;
  * tests hash with DigestUtils/shaHex, hbase_test.clj:177). Our payload
  * is the row-major cell values of one chunk tile in the variable's
  * dtype, big-endian; unwritten cells inside a written chunk hold the
  * fill value.
  */
object ChunkCodec {

  /** JVM-wide count of tile payload decodes — local-mode plan-shape
    * instrumentation (the read-path analog of
    * GraftScan.zoneSkippedChunks): incremental-maintenance tests gate
    * "touched only the changed chunks" on this staying bounded.
    */
  val chunksDecoded = new java.util.concurrent.atomic.AtomicLong

  def sha1Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-1").digest(bytes)
      .map(b => f"$b%02x").mkString

  // ---- blob envelope (storage codec layer) ----
  //
  // Chunks are content-addressed by their LOGICAL payload (sha1 of the
  // raw tile bytes) — the storage codec is transparent: blobs carry a
  // 5-byte envelope `GFC1 <codec>` so readers self-describe, and a
  // dataset can mix codecs (dedup works across them; the first
  // writer's codec wins for a given hash). Pre-envelope blobs (no
  // magic) read as raw.

  private val Magic: Array[Byte] = Array('G', 'F', 'C', '1').map(_.toByte)
  val CodecRaw: Byte = 0
  val CodecGzip: Byte = 1
  val CodecZstd: Byte = 2

  def codecOf(name: String): Byte = name match {
    case "none" | "raw" => CodecRaw
    case "gzip" => CodecGzip
    case "zstd" => CodecZstd
    case other =>
      throw new IllegalArgumentException(s"unknown chunk codec: $other")
  }

  /** Envelope + (optionally compressed) payload -> blob file bytes. */
  def wrapBlob(payload: Array[Byte], codec: Byte): Array[Byte] = {
    val body = codec match {
      case CodecRaw => payload
      case CodecGzip =>
        val bos = new java.io.ByteArrayOutputStream(payload.length / 2 + 64)
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(payload); gz.close()
        bos.toByteArray
      case CodecZstd =>
        // Spark ships zstd-jni on every executor: ~gzip-class ratios
        // at several-x the (de)compression throughput — the numeric
        // tile payloads here are exactly its sweet spot
        com.github.luben.zstd.Zstd.compress(payload, 3)
    }
    val out = new Array[Byte](5 + body.length)
    System.arraycopy(Magic, 0, out, 0, 4)
    out(4) = codec
    System.arraycopy(body, 0, out, 5, body.length)
    out
  }

  /** Blob file bytes -> logical payload (legacy raw passthrough). */
  def unwrapBlob(blob: Array[Byte]): Array[Byte] =
    if (blob.length < 5 || blob(0) != Magic(0) || blob(1) != Magic(1) ||
        blob(2) != Magic(2) || blob(3) != Magic(3)) blob
    else blob(4) match {
      case CodecRaw => java.util.Arrays.copyOfRange(blob, 5, blob.length)
      case CodecGzip =>
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(blob, 5, blob.length - 5))
        val bos = new java.io.ByteArrayOutputStream(blob.length * 4)
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        in.close()
        bos.toByteArray
      case CodecZstd =>
        val body = java.util.Arrays.copyOfRange(blob, 5, blob.length)
        val n = com.github.luben.zstd.Zstd.getFrameContentSize(body)
        require(n >= 0 && n <= Int.MaxValue,
          s"zstd frame content size unavailable ($n)")
        com.github.luben.zstd.Zstd.decompress(body, n.toInt)
      case other =>
        throw new IllegalArgumentException(s"unknown blob codec id $other")
    }

  def width(dtype: String): Int = dtype match {
    case "double" | "long" => 8
    case "float" | "int"   => 4
    case "short"           => 2
    case other => throw new IllegalArgumentException(s"dtype $other")
  }

  /** Cells per chunk tile at `chunkCoord` — edge chunks are clipped to
    * the variable's shape. Scalars (rank 0) have exactly one cell.
    */
  def tileDims(v: VariableMeta, chunkCoord: Seq[Long]): Seq[Long] =
    v.shape.indices.map { i =>
      math.min(v.chunkDims(i), v.shape(i) - chunkCoord(i) * v.chunkDims(i))
    }

  def tileSize(dims: Seq[Long]): Int =
    dims.foldLeft(1L)(_ * _).toInt

  /** Largest magnitude a double represents with integer-exact
    * precision (2^53): the write surface stages values as doubles, so
    * a `long` cell beyond this would silently round — encode rejects
    * it instead (use dtype "double" or split the value).
    */
  val MaxExactLongInDouble: Double = 9007199254740992.0 // 2^53

  /** Encode one tile: values in row-major order over the (clipped) tile
    * dims; `cells` maps in-tile offset -> value; gaps get fillValue.
    */
  def encode(v: VariableMeta, chunkCoord: Seq[Long],
      cells: Iterator[(Long, Double)]): Array[Byte] = {
    val n = tileSize(tileDims(v, chunkCoord))
    val w = width(v.dtype)
    val buf = ByteBuffer.allocate(n * w).order(ByteOrder.BIG_ENDIAN)
    val values = Array.fill(n)(v.fillValue)
    cells.foreach { case (off, value) => values(off.toInt) = value }
    v.dtype match {
      case "double" => values.foreach(buf.putDouble)
      case "float"  => values.foreach(x => buf.putFloat(x.toFloat))
      case "short"  => values.foreach(x => buf.putShort(x.toShort))
      case "int"    => values.foreach(x => buf.putInt(x.toInt))
      case "long"   => values.foreach { x =>
        require(math.abs(x) <= MaxExactLongInDouble,
          s"long cell value $x exceeds 2^53: the double-valued write " +
            "surface cannot represent it exactly — refuse rather than " +
            "silently round (use dtype 'double' if approximate is ok)")
        buf.putLong(x.toLong)
      }
    }
    buf.array()
  }

  /** Typed tile decode for the dtype-faithful read surfaces: `long`
    * payload bits pass through EXACTLY (a double round-trip would
    * round beyond 2^53).
    */
  def decodeLongs(v: VariableMeta, bytes: Array[Byte]): Array[Long] = {
    require(v.dtype == "long", s"decodeLongs on dtype ${v.dtype}")
    chunksDecoded.incrementAndGet()
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val n = bytes.length / 8
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = buf.getLong(i * 8); i += 1 }
    out
  }

  /** Decode a tile's values as a dense array (read hot path — no
    * per-value tuples; index == in-tile offset).
    */
  def decodeValues(v: VariableMeta, bytes: Array[Byte]): Array[Double] = {
    chunksDecoded.incrementAndGet()
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val w = width(v.dtype)
    val n = bytes.length / w
    val out = new Array[Double](n)
    var i = 0
    v.dtype match {
      case "double" => while (i < n) { out(i) = buf.getDouble(i * w); i += 1 }
      case "float"  => while (i < n) { out(i) = buf.getFloat(i * w); i += 1 }
      case "short"  => while (i < n) { out(i) = buf.getShort(i * w); i += 1 }
      case "int"    => while (i < n) { out(i) = buf.getInt(i * w); i += 1 }
      case "long"   => while (i < n) { out(i) = buf.getLong(i * w); i += 1 }
    }
    out
  }

  /** Decode a tile back to (in-tile offset, value) pairs as doubles. */
  def decode(v: VariableMeta, bytes: Array[Byte]): Iterator[(Long, Double)] = {
    chunksDecoded.incrementAndGet()
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val w = width(v.dtype)
    val n = bytes.length / w
    (0 until n).iterator.map { i =>
      val value = v.dtype match {
        case "double" => buf.getDouble(i * w)
        case "float"  => buf.getFloat(i * w).toDouble
        case "short"  => buf.getShort(i * w).toDouble
        case "int"    => buf.getInt(i * w).toDouble
        case "long"   => buf.getLong(i * w).toDouble
      }
      (i.toLong, value)
    }
  }

  /** Row-major in-tile offset of an absolute cell coordinate. */
  def offsetOf(v: VariableMeta, chunkCoord: Seq[Long],
      cell: Seq[Long]): Long = {
    val dims = tileDims(v, chunkCoord)
    var off = 0L
    var i = 0
    while (i < dims.length) {
      val rel = cell(i) - chunkCoord(i) * v.chunkDims(i)
      off = off * dims(i) + rel
      i += 1
    }
    off
  }

  /** Inverse of offsetOf: absolute cell coordinate of an in-tile
    * offset. Hot path (called once per cell in every read loop): one
    * array allocation, no intermediate collections.
    */
  def cellOf(v: VariableMeta, chunkCoord: Seq[Long], off: Long): Seq[Long] = {
    val dims = tileDims(v, chunkCoord)
    val out = new Array[Long](dims.length)
    var rest = off
    var i = dims.length - 1
    while (i >= 0) {
      out(i) = rest % dims(i)
      rest /= dims(i)
      i -= 1
    }
    i = 0
    while (i < out.length) {
      out(i) += chunkCoord(i) * v.chunkDims(i)
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }
}
