package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins over the chunk grid: two variables with
  * the SAME per-dimension chunk sizes, scanned in chunk-keyed mode
  * (`spark.graft.scan.keyedPartitions`), join on all coordinates
  * with ZERO exchanges — Spark groups the scans' HasPartitionKey
  * partitions by the catalog-resolved `chunk(size, xI)` transforms
  * and streams matching chunk pairs straight into the join. The
  * negative control proves the gate has teeth: mismatched grids are
  * NOT co-partitioned and must shuffle.
  */
class StoragePartitionedJoinSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private def withSpjConfs[T](body: => T): T = {
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.graft.scan.keyedPartitions",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.graft.scan.keyedPartitions", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      body
    } finally saved.foreach { case (k, ov) =>
      ov.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Registers a fresh catalog with tables a (value = lin) and
    * b (value = 2*lin) of the given 2-D chunking.
    */
  private def mkTables(chunksA: String, chunksB: String): String = {
    val cat = s"gspj${counter.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root",
      Files.createTempDirectory("graft_spj_").toString)
    spark.sql(s"CREATE NAMESPACE $cat.vd")
    for ((t, m, ch) <- Seq(("a", 1, chunksA), ("b", 2, chunksB))) {
      spark.sql(s"CREATE TABLE $cat.vd.$t " +
        "(x0 BIGINT, x1 BIGINT, value DOUBLE) " +
        s"TBLPROPERTIES (shape='8,8', chunkDims='$ch')")
      spark.sql(s"INSERT INTO $cat.vd.$t " +
        s"SELECT id DIV 8 AS x0, id % 8 AS x1, " +
        s"CAST($m * id AS DOUBLE) AS value FROM range(64)")
    }
    cat
  }

  private def join(cat: String) =
    spark.sql(s"SELECT sum(a.value + b.value) AS sv, count(*) AS n " +
      s"FROM $cat.vd.a a JOIN $cat.vd.b b " +
      "ON a.x0 = b.x0 AND a.x1 = b.x1")

  test("same chunk grid: join on all coords plans with zero exchanges") {
    withSpjConfs {
      val j = join(mkTables("4,4", "4,4"))
      val row = j.head()
      assert(row.getLong(1) === 64L)
      assert(row.getDouble(0) === 3.0 * 63 * 64 / 2)
      val plan = j.queryExecution.executedPlan.toString
      // the global agg's 4-row SinglePartition gather is legitimate;
      // what must NOT appear is a join-side shuffle or broadcast
      assert(!plan.contains("Exchange hashpartitioning") &&
        !plan.contains("BroadcastExchange"),
        s"expected a storage-partitioned join without join shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // SupportsReportOrdering: chunk cells stream in coordinate
      // order, so the merge join needs no Sort either — the whole
      // join is scan → merge, nothing else
      assert(!plan.contains("Sort ["),
        s"expected the reported ordering to remove the join Sorts:\n$plan")
    }
  }

  test("mismatched chunk grids are not co-partitioned: the join shuffles (negative control)") {
    withSpjConfs {
      val j = join(mkTables("4,4", "2,8"))
      val row = j.head()
      assert(row.getLong(1) === 64L)
      assert(row.getDouble(0) === 3.0 * 63 * 64 / 2)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange hashpartitioning"),
        s"mismatched grids must shuffle — gate is vacuous otherwise:\n$plan")
    }
  }

  test("keyed mode off: plans are unchanged (exchange join) and results agree") {
    val cat = mkTables("4,4", "4,4")
    val j = join(cat)
    assert(j.head().getLong(1) === 64L)
    assert(j.queryExecution.executedPlan.toString.contains("Exchange") ||
      j.queryExecution.executedPlan.toString.contains("Broadcast"))
  }

  test("time-travel self-join (version diff) is co-partitioned: zero join shuffles") {
    withSpjConfs {
      val cat = mkTables("4,4", "4,4")
      spark.sql(s"INSERT INTO $cat.vd.a " +
        "SELECT id DIV 8, id % 8, CAST(1000 + id AS DOUBLE) " +
        "FROM range(8)") // overwrite cells 0..7 in a new version
      val vs = spark.sql(s"CALL $cat.system.history(dataset => 'vd')")
        .select("version_id").collect().map(_.getLong(0)).sorted
      val (v1, v2) = (vs(vs.length - 2), vs.last)
      // the classic "what changed between v1 and v2" as a join — both
      // sides are the SAME grid, so it plans shuffle-free
      val j = spark.sql(s"SELECT count(*) AS n FROM " +
        s"(SELECT * FROM $cat.vd.a VERSION AS OF $v2) cur JOIN " +
        s"(SELECT * FROM $cat.vd.a VERSION AS OF $v1) old " +
        "ON cur.x0 = old.x0 AND cur.x1 = old.x1 " +
        "WHERE cur.value <> old.value")
      assert(j.head().getLong(0) === 8L)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning") &&
        !plan.contains("BroadcastExchange"),
        s"version-diff self-join should be co-partitioned:\n$plan")
    }
  }

  test("keyed scan satisfies a coordinate groupBy without a shuffle") {
    withSpjConfs {
      val cat = mkTables("4,4", "4,4")
      // grouping on all coords: each (x0, x1) group lives in exactly
      // one chunk, so KeyGroupedPartitioning(chunk(x0), chunk(x1))
      // satisfies the aggregate's ClusteredDistribution — map-side
      // complete, no exchange below the agg
      val g = spark.sql(s"SELECT x0, x1, sum(value) AS sv " +
        s"FROM $cat.vd.a GROUP BY x0, x1")
      assert(g.count() === 64L)
      val plan = g.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"group-by-all-coords should not shuffle a keyed scan:\n$plan")
    }
  }

  test("registered m31 query: gate columns match its oracle constants") {
    val r = graft.SparkEntry.queries("m31_storage_partitioned_join")(
      spark, graft.TestSpark.sf).head()
    assert(r.getLong(0) === 64L, "n_rows")
    assert(r.getDouble(1) === 6048.0, "sum_v")
    assert(r.getLong(2) === 1L, "zero_exchanges — SPJ did not engage")
  }

  test("chunk function resolves through the catalog") {
    val cat = mkTables("4,4", "4,4")
    // SQL-surface lookup of the same function the SPJ transforms bind
    val r = spark.sql(s"SELECT $cat.chunk(4L, 11L) AS c").head()
    assert(r.getLong(0) === 2L)
  }
}
