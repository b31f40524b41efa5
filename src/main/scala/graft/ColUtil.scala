package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared by the query packs.
  *
  * Cross-engine determinism: the driver hash-compares our parquet output
  * against DuckDB, so floating-point aggregates must not depend on
  * partitioning/accumulation order. `dsum` sums exact decimals; `dotd`
  * folds arrays sequentially left-to-right (same IEEE op sequence DuckDB's
  * list_dot_product performs).
  */
object ColUtil {
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-independent, engine-exact sum of a double column. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Sequential double dot product of two array<double> columns —
    * a native codegen'd Expression (graft.functions.DotProduct) with
    * the same left-to-right IEEE fold the interpreted
    * aggregate(zip_with(...)) form would produce.
    */
  def dotd(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot(a, b)

  /** Cast array<float> to array<double> (so all arithmetic is in double). */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Cosine similarity of two array<double> columns, bit-deterministic. */
  def cosine(a: Column, b: Column): Column =
    dotd(a, b) / (sqrt(dotd(a, a)) * sqrt(dotd(b, b)))
}
