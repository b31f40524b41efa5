package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Attribute a registry query's wall time to its Spark jobs, grouped
  * by job description (guide §1.5/§7.1 without a UI): run ONE query
  * N times, print per-description job count + total ms, plus the gap
  * (wall minus job time = driver-side planning/FS work).
  *
  * Usage: JobProfile <queryName> [runs=2] [sfDir=/root/testdata/sf0.1]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = BenchOne.session()

    val agg = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var jobMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description"))
            .getOrElse("(unlabelled)")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val st = starts.remove(j.jobId)
        if (st != null) {
          val ms = (System.nanoTime() - st._1) / 1000000
          jobMs += ms
          agg.merge(st._2, (1L, ms),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      }
    })

    val sample = BenchOne.sampler(spark, name, sfDir)
    (1 to runs).foreach { i =>
      agg.clear(); jobMs = 0
      val t0 = System.nanoTime()
      val s = sample()
      val wall = (System.nanoTime() - t0) / 1000000
      Thread.sleep(300) // let listener drain
      println(f"[jobprofile] $name run $i: sample=$s%.3f s wall=${wall} ms " +
        f"jobs=${agg.values.stream.mapToLong(_._1).sum} jobMs=$jobMs " +
        f"driverGap=${wall - jobMs} ms")
      import scala.jdk.CollectionConverters._
      agg.asScala.toSeq.sortBy(-_._2._2).foreach { case (d, (n, ms)) =>
        println(f"    $ms%7d ms  n=$n%-4d $d")
      }
    }
    spark.stop()
  }
}
