package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BitFunctions

/** Multi-dimensional data clustering for file layout — the
  * OPTIMIZE ZORDER of this engine's parquet/curation side. Rows are
  * sorted by the Morton interleave of their (bucketed) clustering
  * columns, then range-partitioned on that code, so every output
  * file's min/max bounding box is tight in EVERY clustered column at
  * once — a multi-column predicate prunes files on all of its
  * conjuncts, not just the leading sort column.
  *
  * Scale shape: one range-partitioning shuffle (sampled boundaries,
  * the same cost as any global sort-for-write), then a per-partition
  * sort that feeds the writer. No driver state; skew in the code
  * space only shifts boundary samples. At 100 TB this is the standard
  * "cluster then write" pass — the win is on the READ side, where
  * min/max skipping turns box queries from full scans into
  * O(overlapping files).
  */
object LayoutOps {

  /** `df` with a `z` column appended: the Morton code of the given
    * dimension columns, each masked to its low `bits` bits (callers
    * bucket raw values first — e.g. `least(255, col >> 5)` — so the
    * dims are dense small ints; `dims.length * bits` must be ≤ 63).
    */
  def withZ(df: DataFrame, dims: Seq[Column], bits: Int): DataFrame =
    df.withColumn("z", BitFunctions.interleaveBits(array(dims: _*), bits))

  /** Cluster `df` into `numFiles` writer-ready partitions by the
    * Morton code of `dims`: range-partition on (z, tieBreak) and sort
    * within partitions, so each partition — one output file — covers
    * a contiguous code range, i.e. an axis-aligned block of the
    * dimension space.
    */
  def zorderLayout(df: DataFrame, dims: Seq[Column], bits: Int,
      numFiles: Int, tieBreak: Column): DataFrame =
    withZ(df, dims, bits)
      .repartitionByRange(numFiles, col("z"), tieBreak)
      .sortWithinPartitions(col("z"), tieBreak)
}
