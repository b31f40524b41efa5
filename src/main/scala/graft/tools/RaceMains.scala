package graft.tools

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.core.{CommitLock, GraftLake}
import graft.core.Model._

/** Subprocess entry point for the cross-process lock-exclusion test:
  * increments a (deliberately non-atomic) counter file `iters` times
  * under [[CommitLock]]. If the lock were check-then-create, racing
  * processes would lose increments.
  */
object LockRaceMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val iters = args(1).toInt
    val fs = new Path(dir).getFileSystem(new Configuration())
    val counter = new java.io.File(dir, "counter.txt")
    val owner = UUID.randomUUID().toString
    (0 until iters).foreach { _ =>
      CommitLock.withLock(fs, new Path(dir, "_lock"), owner) {
        val cur =
          if (!counter.exists()) 0L
          else {
            val src = scala.io.Source.fromFile(counter)
            try src.mkString.trim.toLong finally src.close()
          }
        Thread.sleep(1) // widen the read-modify-write window
        val w = new java.io.FileWriter(counter)
        try w.write((cur + 1).toString) finally w.close()
      }
    }
    println("DONE")
  }
}

/** Subprocess entry point for the two-JVM commit race (the engine
  * analog of the reference's disabled `lots-of-processes` tests,
  * hbase_test.clj:134-138): connects to an existing lake, writes the
  * SAME chunk every racer writes, and commits. Exactly one racer may
  * win; the rest must see [[Model.CommitConflictException]].
  * Exit code: 0 = committed, 42 = conflict (expected loser outcome).
  */
object CommitRaceMain {
  def main(args: Array[String]): Unit = {
    val lakeRoot = args(0)
    val value = args(1).toDouble
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-commit-race")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val meta = DatasetMeta(Seq(
      VariableMeta("temp", "double", Seq(8, 8), Seq(4, 4), Double.NaN)))
    val ds = new GraftLake(spark, lakeRoot).connect("race")
    val w = ds.newWriter(meta)
    w.writeSlab("temp",
      Seq((Seq(0L, 0L), value)).toDF("coord", "value"))
    val code =
      try { w.commit(); println("COMMITTED"); 0 }
      catch {
        case _: CommitConflictException => println("CONFLICT"); 42
      }
    spark.stop()
    sys.exit(code)
  }
}
