package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import Model.VariableMeta

/** Law-style property tests of the chunk codec — the engine analog of
  * the reference's chunk-store property suite
  * (hbase_test.clj:83-102). Deterministic seeded sampling (the
  * scalatest/scalacheck bridge isn't in the offline cache).
  */
class ChunkCodecSpec extends AnyFunSuite {

  private def forAll[T](gen: Gen[T])(body: T => Unit): Unit = {
    var seed = Seed(42L)
    (1 to 100).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
    }
  }

  private val metaGen: Gen[VariableMeta] = for {
    rank <- Gen.choose(0, 3)
    shape <- Gen.listOfN(rank, Gen.choose(1L, 9L))
    chunk <- Gen.sequence[Seq[Long], Long](
      shape.map(s => Gen.choose(1L, s)))
    dtype <- Gen.oneOf("double", "float", "short", "int", "long")
    // integer dtypes reject NaN fill at construction
    fill = if (dtype == "double" || dtype == "float") Double.NaN else 0.0
  } yield VariableMeta("v", dtype, shape, chunk, fill)

  test("encode/decode round-trips integral cell values for every dtype") {
    forAll(metaGen) { v =>
      val grid = v.chunkGrid
      val cc: Seq[Long] = grid.map(g => (g - 1) max 0) // edge chunk
      val dims = ChunkCodec.tileDims(v, cc)
      val n = ChunkCodec.tileSize(dims)
      val values = (0L until n).map(i => (i, (i % 100).toDouble))
      val bytes = ChunkCodec.encode(v, cc, values.iterator)
      assert(bytes.length == n * ChunkCodec.width(v.dtype))
      val back = ChunkCodec.decode(v, bytes).toSeq
      assert(back == values)
    }
  }

  test("long tiles: decodeLongs is bit-exact up to 2^53, encode rejects beyond") {
    val v = VariableMeta("v", "long", Seq(4), Seq(4), 0.0)
    // 2^53 - k: integer-exact through the double write surface
    val vals = Seq(0L, 1L, 9007199254740992L, 9007199254740991L - 7)
    val cells = vals.zipWithIndex.map { case (x, i) => (i.toLong, x.toDouble) }
    val bytes = ChunkCodec.encode(v, Seq(0L), cells.iterator)
    assert(ChunkCodec.decodeLongs(v, bytes).toSeq == vals)
    // doubles round-trip too (all values here are ≤ 2^53)
    assert(ChunkCodec.decodeValues(v, bytes).toSeq == vals.map(_.toDouble))
    // beyond 2^53 the double surface cannot be exact — refuse loudly
    intercept[IllegalArgumentException] {
      ChunkCodec.encode(v, Seq(0L), Iterator((0L, 1.8e16)))
    }
    // decodeLongs guards its dtype
    intercept[IllegalArgumentException] {
      ChunkCodec.decodeLongs(
        VariableMeta("v", "double", Seq(4), Seq(4), 0.0), bytes)
    }
  }

  test("offsetOf and cellOf are inverse over whole tiles") {
    forAll(metaGen) { v =>
      val cc: Seq[Long] = v.chunkGrid.map(_ => 0L)
      val n = ChunkCodec.tileSize(ChunkCodec.tileDims(v, cc))
      (0L until n).foreach { off =>
        val cell = ChunkCodec.cellOf(v, cc, off)
        assert(ChunkCodec.offsetOf(v, cc, cell) == off)
        cell.indices.foreach(i => assert(cell(i) < v.shape(i)))
      }
    }
  }

  test("sha1 hashing matches the reference's chunk-id scheme (DigestUtils/shaHex)") {
    // known vector: sha1("abc")
    assert(ChunkCodec.sha1Hex("abc".getBytes("UTF-8")) ==
      "a9993e364706816aba3e25717850c26c9cd0d89d")
  }

  test("identical content yields identical hash (content addressing)") {
    val a = Array[Byte](1, 2, 3, 4)
    assert(ChunkCodec.sha1Hex(a) == ChunkCodec.sha1Hex(a.clone()))
  }
}
