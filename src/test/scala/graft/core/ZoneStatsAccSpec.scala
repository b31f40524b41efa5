package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Law-style property tests of the shared zone-stats accumulator —
  * the exactness contract every SUM/AVG pushdown rests on:
  *
  *  1. ORDER INVARIANCE: any permutation of the fold produces the
  *     same min/max/vsum/vabs (including which side of null the sums
  *     land on) — the planner folds tile stats distributed, in
  *     whatever order the shuffle delivers.
  *  2. EXACTNESS: a non-null vsum equals the BigDecimal-exact sum of
  *     the cells, and vabs the exact sum of |cells| (finite case).
  *  3. SUBSET SAFETY: when the full fold's sums are non-null, every
  *     subset's finite-cell double fold is exact too — what makes
  *     region-boundary decode sums (cell subsets of admitted tiles)
  *     safe to final-merge.
  *  4. NON-FINITE DETERMINISM: NaN/±Inf cells produce the IEEE
  *     outcome (NaN dominates; opposing infinities annihilate) no
  *     matter the order.
  *
  * Deterministic seeded sampling (the scalatest/scalacheck bridge
  * isn't in the offline cache).
  */
class ZoneStatsAccSpec extends AnyFunSuite {

  private def forAll[T](gen: Gen[T])(body: T => Unit): Unit = {
    var seed = Seed(1234L)
    (1 to 200).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
    }
  }

  private val cellGen: Gen[Double] = Gen.frequency(
    6 -> Gen.choose(-1000L, 1000L).map(_.toDouble),
    2 -> Gen.choose(-(1L << 50), 1L << 50).map(_.toDouble),
    1 -> Gen.oneOf(0.0, -0.0, 1.5, -2.25, math.Pi),
    1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity))

  private val cellsGen: Gen[List[Double]] =
    Gen.choose(0, 24).flatMap(n => Gen.listOfN(n, cellGen))

  private def fold(cells: Seq[Double])
      : ((Option[Double], Option[Double]), (Option[Double], Option[Double])) = {
    val acc = new GraftDataset.ZoneStatsAcc
    cells.foreach(acc.add(_, 1L))
    (acc.zones, acc.sums)
  }

  /** Bit-level image for comparison: NaN == NaN, and an accidental
    * -0.0/0.0 swap would be caught too.
    */
  private def bits(
      r: ((Option[Double], Option[Double]), (Option[Double], Option[Double])))
      : Seq[Option[Long]] =
    Seq(r._1._1, r._1._2, r._2._1, r._2._2)
      .map(_.map(java.lang.Double.doubleToLongBits))

  test("fold order never changes any produced stat") {
    forAll(for {
      cells <- cellsGen
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (cells, seed)) { case (cells, s) =>
      val base = bits(fold(cells))
      val shuffled = new scala.util.Random(s).shuffle(cells)
      assert(bits(fold(shuffled)) == base,
        s"order-dependent stats for $cells vs $shuffled")
    }
  }

  test("non-null vsum/vabs are the BigDecimal-exact sums (finite case)") {
    forAll(cellsGen) { cells =>
      val (_, (vsum, vabs)) = fold(cells)
      val finiteCase = cells.forall(c => !c.isNaN && !c.isInfinite)
      if (finiteCase) vsum.foreach { s =>
        val exact = cells.foldLeft(BigDecimal(0))(_ + BigDecimal(_))
        val exactAbs =
          cells.foldLeft(BigDecimal(0))(_ + BigDecimal(_).abs)
        assert(BigDecimal(s) == exact, s"vsum $s != exact $exact: $cells")
        assert(BigDecimal(vabs.get) == exactAbs,
          s"vabs ${vabs.get} != exact $exactAbs: $cells")
      }
    }
  }

  test("subset folds are exact whenever the full fold admits sums") {
    forAll(for {
      cells <- cellsGen
      mask <- Gen.listOfN(cells.length, Gen.oneOf(true, false))
    } yield (cells, mask)) { case (cells, mask) =>
      val (_, (vsum, _)) = fold(cells)
      if (vsum.isDefined) {
        val subset = cells.zip(mask).collect {
          case (c, true) if !c.isNaN && !c.isInfinite => c }
        // the plain double fold (what a region-boundary decode does)
        val folded = subset.foldLeft(0.0)(_ + _)
        val exact = subset.foldLeft(BigDecimal(0))(_ + BigDecimal(_))
        assert(BigDecimal(folded) == exact,
          s"subset double-fold inexact: $subset of $cells")
      }
    }
  }

  test("NaN / opposing infinities produce the deterministic IEEE " +
      "outcome in any order") {
    forAll(cellsGen) { cells =>
      val (_, (vsum, _)) = fold(cells)
      vsum.foreach { s =>
        val anyNaN = cells.exists(_.isNaN)
        val pos = cells.contains(Double.PositiveInfinity)
        val neg = cells.contains(Double.NegativeInfinity)
        if (anyNaN || (pos && neg)) assert(s.isNaN, s"want NaN: $cells")
        else if (pos) assert(s == Double.PositiveInfinity)
        else if (neg) assert(s == Double.NegativeInfinity)
      }
    }
  }

  test("the non-integral and over-mass declines: vsum nulls exactly " +
      "when a finite cell is non-integral or the mass exceeds 2^52") {
    // directed cases around the boundary
    val bound = 4503599627370496.0 // 2^52
    def sums(cells: Seq[Double]) = fold(cells)._2._1
    assert(sums(Seq(1.5)).isEmpty, "non-integral must null")
    assert(sums(Seq(bound)).contains(bound), "at the bound stays exact")
    assert(sums(Seq(bound, 1.0)).isEmpty, "past the bound must null")
    assert(sums(Seq(bound / 2, bound / 2)).contains(bound))
    assert(sums(Seq(bound / 2, bound / 2, 1.0)).isEmpty)
    // a NaN alongside a non-integral finite still nulls (a subset
    // excluding the NaN would be order-dependent)
    assert(sums(Seq(Double.NaN, 1.5)).isEmpty)
    // NaN alongside integral finites is the deterministic NaN
    assert(sums(Seq(Double.NaN, 2.0)).exists(_.isNaN))
  }
}
