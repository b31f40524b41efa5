package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Dataset catalog over a lake directory — the Spark-native `Schema`
  * protocol (create/destroy/list/connect, hbase.clj:299-344). A dataset
  * is one directory holding chunks/, refs/, indices/, versions/
  * (the reference's three HBase tables + our ref-count delta log).
  */
class GraftLake(val spark: SparkSession, val root: String) {

  private[core] def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dsPath(name: String): Path = {
    require(name.nonEmpty && !name.contains("/"),
      s"dataset name must be non-blank, no '/': '$name'")
    new Path(root, name)
  }

  /** Schema.create-dataset (hbase.clj:302-311): blank names rejected. */
  def create(name: String): Unit = {
    val p = dsPath(name)
    require(!fs.exists(p), s"dataset exists: $name")
    Seq("chunks", "refs", "versions", "indices", "staging")
      .foreach(d => fs.mkdirs(new Path(p, d)))
  }

  /** Schema.destroy-dataset (hbase.clj:313-316): recursive delete. */
  def destroy(name: String): Unit = {
    fs.delete(dsPath(name), true); ()
  }

  /** Schema.list-datasets (hbase.clj:318-330). */
  def list(): Seq[String] = {
    val r = new Path(root)
    if (!fs.exists(r)) Seq.empty
    else fs.listStatus(r).filter(_.isDirectory)
      .map(_.getPath.getName).toSeq.sorted
  }

  def exists(name: String): Boolean = fs.exists(dsPath(name))

  /** Schema.connect (hbase.clj:332-344): liveness-probe + handle. */
  def connect(name: String): GraftDataset = {
    if (!exists(name))
      throw new RuntimeException(s"cannot connect: no dataset '$name'")
    new GraftDataset(spark, dsPath(name).toString)
  }

  /** Lake-wide accounting: one row per dataset with the per-dataset
    * [[GraftDataset.stats]] columns (each dataset's manifest/index
    * aggregates are distributed; the union is one tiny row per
    * dataset).
    */
  def stats(): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val statCols = Seq("n_versions", "n_chunks", "total_chunk_bytes",
      "n_index_entries", "ref_total")
    val perDs = list().map { n =>
      connect(n).stats().select(lit(n).as("dataset") +: statCols.map(col): _*)
    }
    if (perDs.isEmpty)
      spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("dataset",
            org.apache.spark.sql.types.StringType) +:
            statCols.map(org.apache.spark.sql.types.StructField(_,
              org.apache.spark.sql.types.LongType))))
    else perDs.reduce(_ unionAll _)
  }
}
