package graft.tools

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession
import graft.core._
import graft.core.Model._

/** Dump `.explain("formatted")` before/after evidence for the round-14
  * read-path change (resolveIndex withStats pruning) into plans/r14/.
  * "Before" is the wide form (`withStats = true`, still the public
  * overload — what every read-path caller used through round 13);
  * "after" is the pruned form the read paths call now.
  *
  * Usage: runMain graft.tools.PlanDump [outDir=plans/r14]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r14"
    new File(outDir).mkdirs()
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("plandump_").toString
    val lake = new GraftLake(spark, root)
    lake.create("d")
    val ds = lake.connect("d")
    val meta = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(8L), Seq(4), Double.NaN)))
    val w = ds.newWriter(meta)
    w.writeSlab("t", (0L until 8L).map(i => (Seq(i), i.toDouble))
      .toDF("coord", "value"))
    val v = w.commit()

    def dump(name: String, plan: String): Unit = {
      val pw = new PrintWriter(s"$outDir/$name")
      try pw.println(plan) finally pw.close()
      println(s"wrote $outDir/$name")
    }
    def fmt(df: org.apache.spark.sql.DataFrame): String = {
      val sb = new StringBuilder
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.toString
    }

    dump("m13_readslab_before.txt",
      "// resolveIndex(variable, asOf) — wide form (withStats = true):\n" +
      "// the shape every read-path caller used through round 13.\n" +
      "// Note ReadSchema carries vmin/vmax/vsum/vabs through the scan\n" +
      "// and the groupBy exchange even though readSlab never reads them.\n\n" +
      fmt(ds.resolveIndex("t", v, withStats = true)))
    dump("m13_readslab_after.txt",
      "// resolveIndex(variable, asOf, withStats = false) — round-14 form\n" +
      "// used by readSlab/readStored/diff/merge/aligned-probe/m05:\n" +
      "// vmin/vmax/vsum/vabs gone from ReadSchema AND the argmax struct\n" +
      "// crossing the exchange.\n\n" +
      fmt(ds.resolveIndex("t", v, withStats = false)))
    spark.stop()
  }
}
