package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The exact embedding near-dup operator is O(N²) by nature; its
  * admission guard must refuse to launch above the pair budget and
  * point at the banded sub-quadratic routes instead.
  */
class SimilarityGuardSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("pair budget trips before any quadratic job launches") {
    spark.conf.set("spark.graft.neardup.maxPairs", "1000")
    try {
      // sf0.001 has 500 vectors -> 124750 pairs > 1000
      val e = intercept[IllegalArgumentException] {
        SimilarityOps.exactNearDupPairs(spark, sfDir, 0.4)
      }
      assert(e.getMessage.contains("pair comparisons"))
      assert(e.getMessage.contains("s02")) // points at the scale route
    } finally spark.conf.unset("spark.graft.neardup.maxPairs")
  }

  test("pair count does not overflow at planet-scale vector counts") {
    // 5e9 vectors: the old Long n*(n-1)/2 went negative here, letting
    // pairs <= budget pass at exactly the scale the guard refuses
    val n = 5000000000L
    val pairs = SimilarityOps.pairCount(n)
    assert(pairs > 0 && pairs > 1e18)
    assert(SimilarityOps.pairCount(500) == 124750.0)
  }

  test("within budget the operator still plans and returns pairs") {
    val df = SimilarityOps.exactNearDupPairs(spark, sfDir, 0.4)
    assert(df.columns.toSeq == Seq("va", "vb", "cos_sim"))
    assert(df.count() > 0)
  }
}
