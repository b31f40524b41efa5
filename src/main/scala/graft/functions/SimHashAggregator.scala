package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` building a 64-bit SimHash signature from token
  * hashes: per-bit majority vote (+1 where the token hash has the bit
  * set, −1 where not), signature bit = vote > 0. The buffer is one
  * 64-int vote array, merged associatively — Catalyst runs it as a
  * partial+final hash aggregate, so signatures build map-side with one
  * narrow shuffle (vs. 64 separate SUM columns).
  *
  * Register with `functions.udaf(SimHashAggregator)` — the UDAF/
  * Aggregator extension surface the reference lacks entirely (its
  * protocol methods are the only extension point, SURVEY §2.3).
  */
object SimHashAggregator extends Aggregator[Long, Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(votes: Array[Int], tokenHash: Long): Array[Int] = {
    var i = 0
    while (i < 64) {
      if (((tokenHash >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
      i += 1
    }
    votes
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(votes: Array[Int]): Long = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
