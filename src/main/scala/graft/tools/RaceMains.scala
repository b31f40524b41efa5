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
      // generous acquire timeout: 3 procs × 40 iters of 20 ms polls is
      // seconds when idle but can starve past the 120 s default when
      // the whole test suite is loading all cores — patience here, the
      // spec's waitFor stays the overall bound
      CommitLock.withLock(fs, new Path(dir, "_lock"), owner,
        timeoutMs = 600000L) {
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

/** Subprocess entry point for the slow-holder lease test: holds the
  * commit lock for `holdMs` under a deliberately short lease,
  * recording begin/end wall-clock stamps of its critical section to
  * `sect-<owner>.txt`. With heartbeat renewal, a section that outlives
  * its lease many times over must still exclude a racing holder —
  * the spec asserts the recorded intervals never overlap.
  */
object SlowLockHolderMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val owner = args(1)
    val holdMs = args(2).toLong
    val leaseMs = args(3).toLong
    val fs = new Path(dir).getFileSystem(new Configuration())
    def log(line: String): Unit = {
      val w = new java.io.FileWriter(
        new java.io.File(dir, s"sect-$owner.txt"), true)
      try w.write(line + "\n") finally w.close()
    }
    CommitLock.withLock(fs, new Path(dir, "_lock"), owner,
      leaseMs = leaseMs, timeoutMs = 120000L) {
      log(s"begin ${System.currentTimeMillis()}")
      Thread.sleep(holdMs)
      log(s"end ${System.currentTimeMillis()}")
    }
    println("DONE")
  }
}

/** Subprocess entry point for the DDL/DML race: from the SAME
  * snapshot (a file barrier aligns the racers after writer creation),
  * one JVM commits a metadata-only shape grow (the ALTER path), the
  * other a slab write — compatible pairs must BOTH land through the
  * commit-time metadata merge; pairs that change the same variable's
  * metadata differently must see exactly one winner, and the loser's
  * retry against a fresh snapshot must land.
  *
  * Roles: `ddl` = grow to args(2), no data; `dml` = write one cell
  * (coord args(2), value 55) under the snapshot meta; `ddlwrite` =
  * grow to args(2) AND write its last cell; `rename` = rename the
  * variable to `t_<args(2)>` (metadata-only — two racing renames
  * produce a duplicate-index-key merge, which must surface as the
  * retriable conflict). Exit 0 = clean commit, 42 = one conflict
  * then a landed retry.
  */
object DdlDmlRaceMain {
  def main(args: Array[String]): Unit = {
    val lakeRoot = args(0)
    val role = args(1)
    val target = args(2).toLong
    val barrierDir = new java.io.File(args(3))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-ddl-race-$role-$target")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ds = new GraftLake(spark, lakeRoot).connect("race")

    def metaAt(shape: Long) = DatasetMeta(Seq(
      VariableMeta("t", "double", Seq(shape), Seq(4), Double.NaN)))
    def currentVar() =
      ds.metadata(ds.latestVersion.get).variables.head
    def currentShape() = currentVar().shape.head

    // rename: metadata-only, new logical name, stable physical key
    def renamedMeta() = {
      val vm = currentVar()
      DatasetMeta(Seq(vm.copy(name = s"t_$target", indexName = vm.idx)))
    }

    // replace: the INSERT OVERWRITE shape — fresh physical index key
    // (epoch) + the new cells in one commit
    def replacedMeta() = {
      val vm = currentVar()
      DatasetMeta(Seq(vm.copy(indexName = s"t#$target")))
    }

    // one staged attempt; `barrier = true` parks between pinning the
    // snapshot and committing, so both racers genuinely race instead
    // of serializing
    def attempt(barrier: Boolean): Long = {
      val w = role match {
        case "rename" => ds.newWriter(renamedMeta())
        case "replace" =>
          val w0 = ds.newWriter(replacedMeta())
          w0.writeSlab("t",
            Seq((Seq(0L), target.toDouble)).toDF("coord", "value"))
          w0
        case _ =>
          val shape = role match {
            case "dml" => currentShape()
            case _ => math.max(target, currentShape())
          }
          val w0 = ds.newWriter(metaAt(shape)) // snapshot pinned HERE
          if (role != "ddl") {
            val coord = if (role == "dml") target else target - 1
            w0.writeSlab("t",
              Seq((Seq(coord), 55.0)).toDF("coord", "value"))
          }
          w0
      }
      if (barrier) {
        val ready = new java.io.File(barrierDir, s"ready-$role-$target")
        ready.createNewFile()
        val go = new java.io.File(barrierDir, "go")
        val deadline = System.currentTimeMillis() + 60000
        while (!go.exists() && System.currentTimeMillis() < deadline)
          Thread.sleep(10)
      }
      w.commit()
    }

    val code =
      try { attempt(barrier = true); println("COMMITTED"); 0 }
      catch {
        case _: CommitConflictException =>
          println("CONFLICT")
          // retry against a fresh snapshot (no barrier this time)
          attempt(barrier = false)
          println("RETRY_LANDED")
          42
      }
    spark.stop()
    sys.exit(code)
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

/** Subprocess entry point for cross-JVM CLONE/MERGE races on one lake
  * (dataset "race", variable "t"). Roles:
  *  - `clone <name>@<at>`: zero-copy clone of t at version `at`;
  *    retries once on a commit conflict; exits 42 if the name was
  *    taken by a racing winner (the expected loser outcome).
  *  - `write <coord>`: stages a cell write to t BEFORE the barrier
  *    (snapshot pinned, so racers genuinely interleave), commits
  *    after it; retries against a fresh snapshot on conflict.
  *  - `merge <branch>`: merges the branch back into t; retries once
  *    on a commit conflict.
  * A file barrier (`ready-*` / `go`) aligns the commit attempts.
  * Exit code: 0 = landed, 42 = lost-as-expected, else failure.
  */
object CloneMergeRaceMain {
  def main(args: Array[String]): Unit = {
    val lakeRoot = args(0)
    val role = args(1)
    val arg = args(2)
    val barrierDir = new java.io.File(args(3))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-clone-race-$role")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ds = new GraftLake(spark, lakeRoot).connect("race")

    def await(tag: String): Unit = {
      new java.io.File(barrierDir, s"ready-$tag").createNewFile()
      val go = new java.io.File(barrierDir, "go")
      val deadline = System.currentTimeMillis() + 60000
      while (!go.exists() && System.currentTimeMillis() < deadline)
        Thread.sleep(10)
    }

    val code = role match {
      case "clone" =>
        val Array(nm, atS) = arg.split("@")
        await(s"clone-$nm")
        try { ds.cloneVariable("t", nm, atS.toLong)
          println("COMMITTED"); 0 }
        catch {
          case _: CommitConflictException =>
            // retry against fresh state; a winner holding the name by
            // now surfaces as already-exists (the expected loss)
            try { ds.cloneVariable("t", nm, atS.toLong)
              println("RETRY_LANDED"); 0 }
            catch { case _: IllegalArgumentException =>
              println("LOST"); 42 }
          case _: IllegalArgumentException => println("LOST"); 42
        }
      case "write" =>
        def attempt(barrier: Boolean): Unit = {
          val w = ds.newWriter(ds.metadata(ds.latestVersion.get))
          w.writeSlab("t",
            Seq((Seq(arg.toLong), 77.0)).toDF("coord", "value"))
          if (barrier) await(s"write-$arg")
          w.commit()
        }
        try { attempt(barrier = true); println("COMMITTED"); 0 }
        catch { case _: CommitConflictException =>
          attempt(barrier = false); println("RETRY_LANDED"); 0 }
      case "merge" =>
        await(s"merge-$arg")
        try { ds.mergeBranch(arg); println("COMMITTED"); 0 }
        catch { case _: CommitConflictException =>
          ds.mergeBranch(arg); println("RETRY_LANDED"); 0 }
    }
    spark.stop()
    sys.exit(code)
  }
}
