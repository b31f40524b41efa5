package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{BitFunctions, DotProduct, InterleaveBits}
import graft.plans.AsOfStrategy

/** Canonical extension entry point: enables the graft planner strategy
  * and SQL functions on any session via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`).
  * The `GraftAsOf.join` API also self-registers the strategy for
  * sessions built without extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfStrategy)
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBits].getName,
        "interleave_bits"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        InterleaveBits(exprs.head, BitFunctions.bitsOf(exprs(1)))))
  }
}
