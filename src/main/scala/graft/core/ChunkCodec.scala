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

  def sha1Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-1").digest(bytes)
      .map(b => f"$b%02x").mkString

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
      case "long"   => values.foreach(x => buf.putLong(x.toLong))
    }
    buf.array()
  }

  /** Decode a tile back to (in-tile offset, value) pairs as doubles. */
  def decode(v: VariableMeta, bytes: Array[Byte]): Iterator[(Long, Double)] = {
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

  /** Inverse of offsetOf: absolute cell coordinate of an in-tile offset. */
  def cellOf(v: VariableMeta, chunkCoord: Seq[Long], off: Long): Seq[Long] = {
    val dims = tileDims(v, chunkCoord)
    val rel = new Array[Long](dims.length)
    var rest = off
    var i = dims.length - 1
    while (i >= 0) {
      rel(i) = rest % dims(i)
      rest /= dims(i)
      i -= 1
    }
    rel.toSeq.zipWithIndex.map { case (r, d) =>
      r + chunkCoord(d) * v.chunkDims(d)
    }
  }
}
