package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import graft.core._
import graft.core.Model._

object ProfileCommit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, d) = starts.get(j.jobId)
        jobs.add((j.jobId, (System.nanoTime() - t0) / 1000000, d))
      }
    })
    val root = java.nio.file.Files.createTempDirectory("prof_").toString
    val lake = new GraftLake(spark, root)
    lake.create("d")
    val ds = lake.connect("d")
    def m(n: Long) = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(n), Seq(4), Double.NaN)))
    // warmup commit
    locally { val w = ds.newWriter(m(6))
      w.writeSlab("t", Seq((Seq(0L), 0.0)).toDF("coord", "value"))
      w.commit() }
    Thread.sleep(300); jobs.clear()
    val t0 = System.nanoTime()
    val w = ds.newWriter(m(6))
    val tw0 = System.nanoTime()
    w.writeSlab("t", Seq((Seq(1L), 1.0)).toDF("coord", "value"))
    val tw1 = System.nanoTime()
    w.commit()
    val t1 = System.nanoTime()
    Thread.sleep(300)
    println(s"TOTAL ${(t1 - t0) / 1000000} ms (writeSlab ${(tw1 - tw0) / 1000000} ms, commit ${(t1 - tw1) / 1000000} ms)")
    jobs.forEach { case (id, ms, d) => println(s"  job $id: ${ms} ms  ${d.take(90)}") }
    // a read for comparison
    jobs.clear(); val t2 = System.nanoTime()
    ds.readSlab("t", ds.latestVersion.get).collect()
    val t3 = System.nanoTime(); Thread.sleep(300)
    println(s"READ ${(t3 - t2) / 1000000} ms")
    jobs.forEach { case (id, ms, d) => println(s"  job $id: ${ms} ms  ${d.take(90)}") }

    // phase breakdown: fresh-variable write (no snapshot merge) vs
    // overwrite (merge path), and a bare resolveIndex
    def m2(n: Long) = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(n), Seq(4), Double.NaN),
      VariableMeta("u", "double", Seq(n), Seq(4), Double.NaN)))
    val t4 = System.nanoTime()
    val w2 = ds.newWriter(m2(6))
    val t5 = System.nanoTime()
    w2.writeSlab("u", Seq((Seq(2L), 2.0)).toDF("coord", "value"))
    val t6 = System.nanoTime()
    w2.writeSlab("t", Seq((Seq(3L), 3.0)).toDF("coord", "value"))
    val t7 = System.nanoTime()
    w2.commit()
    val t8 = System.nanoTime()
    println(s"newWriter ${(t5-t4)/1000000} ms, writeSlab-fresh ${(t6-t5)/1000000} ms, writeSlab-merge ${(t7-t6)/1000000} ms, commit ${(t8-t7)/1000000} ms")
    val t9 = System.nanoTime()
    ds.resolveIndex("t", ds.latestVersion.get).count()
    println(s"resolveIndex+count ${(System.nanoTime()-t9)/1000000} ms")
    spark.stop()

  }
}
