package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Model.{metaFromJson, metaToJson, DatasetMeta, VariableMeta}

/** CHECK constraints: a SQL boolean expression over the cell columns
  * (`x0..x{r-1}`, `value`) stored in variable metadata and enforced on
  * EVERY write surface — SQL INSERT, row-level DML, streaming sinks,
  * the Lake API — because they all funnel through SlabWriter.writeSlab,
  * where enforcement is a codegen'd when/raise_error projection (zero
  * extra jobs). ANSI semantics: NULL passes; fill-value writes
  * (deletions) are exempt.
  */
class CheckConstraintSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val root = Files.createTempDirectory("graft_chk_").toString
  spark.conf.set("spark.sql.catalog.gck", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gck.root", root)
  spark.sql("CREATE NAMESPACE gck.lab")

  private def ds = new graft.core.GraftLake(spark, root).connect("lab")

  test("valid inserts pass; a violating INSERT aborts with no version") {
    spark.sql("CREATE TABLE gck.lab.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='8', chunkDims='4', " +
      "check='value >= 0 AND value <= 100')")
    spark.sql("INSERT INTO gck.lab.t SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(6)")
    assert(spark.sql(
      "SELECT count(*) FROM gck.lab.t WHERE NOT isnan(value)")
      .head().getLong(0) == 6L)
    val before = ds.versionIds().length
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gck.lab.t SELECT CAST(7 AS BIGINT), " +
        "CAST(-5.0 AS DOUBLE)")
    }
    assert(exMessages(e).exists(_.contains("CHECK constraint")),
      s"violation must name the constraint, got: ${exMessages(e)}")
    assert(ds.versionIds().length == before,
      "a violating INSERT must not commit a version")
    assert(spark.sql(
      "SELECT count(*) FROM gck.lab.t WHERE NOT isnan(value)")
      .head().getLong(0) == 6L, "no partial data may land")
  }

  test("DELETE passes despite a value constraint (fill writes exempt)") {
    val before = ds.versionIds().length
    spark.sql("DELETE FROM gck.lab.t WHERE x0 = 2")
    assert(ds.versionIds().length == before + 1)
    assert(spark.sql(
      "SELECT count(*) FROM gck.lab.t WHERE NOT isnan(value)")
      .head().getLong(0) == 5L)
  }

  test("UPDATE through a violating expression aborts, valid one lands") {
    intercept[Exception] {
      spark.sql("UPDATE gck.lab.t SET value = value - 1000 WHERE x0 = 1")
    }
    assert(spark.sql("SELECT value FROM gck.lab.t WHERE x0 = 1")
      .head().getDouble(0) == 1.0, "failed UPDATE must not land")
    spark.sql("UPDATE gck.lab.t SET value = value + 50 WHERE x0 = 1")
    assert(spark.sql("SELECT value FROM gck.lab.t WHERE x0 = 1")
      .head().getDouble(0) == 51.0)
  }

  test("ALTER TABLE tightening validates existing data; reject keeps old") {
    // live values now: 0, 51, 3, 4, 5 — 'value <= 10' is violated by 51
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gck.lab.t SET TBLPROPERTIES " +
        "('check'='value >= 0 AND value <= 10')")
    }
    assert(exMessages(e).exists(_.contains("existing cell")),
      s"ADD CONSTRAINT must cite the counterexample, got ${exMessages(e)}")
    // the old constraint still stands (tightened one never committed)
    intercept[Exception] {
      spark.sql("INSERT INTO gck.lab.t SELECT CAST(7 AS BIGINT), " +
        "CAST(-1.0 AS DOUBLE)")
    }
    // a satisfiable tightening commits and then enforces
    spark.sql("ALTER TABLE gck.lab.t SET TBLPROPERTIES " +
      "('check'='value >= 0 AND value <= 60')")
    intercept[Exception] {
      spark.sql("INSERT INTO gck.lab.t SELECT CAST(7 AS BIGINT), " +
        "CAST(99.0 AS DOUBLE)")
    }
    spark.sql("INSERT INTO gck.lab.t SELECT CAST(7 AS BIGINT), " +
      "CAST(60.0 AS DOUBLE)")
    assert(spark.sql("SELECT value FROM gck.lab.t WHERE x0 = 7")
      .head().getDouble(0) == 60.0)
  }

  test("UNSET TBLPROPERTIES drops the constraint") {
    spark.sql("ALTER TABLE gck.lab.t UNSET TBLPROPERTIES ('check')")
    spark.sql("INSERT INTO gck.lab.t SELECT CAST(6 AS BIGINT), " +
      "CAST(-123.0 AS DOUBLE)")
    assert(spark.sql("SELECT value FROM gck.lab.t WHERE x0 = 6")
      .head().getDouble(0) == -123.0)
  }

  test("coordinate constraints work and REPLACE TABLE inherits them") {
    spark.sql("CREATE TABLE gck.lab.edge (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='8', chunkDims='4', check='x0 % 2 = 0')")
    spark.sql("INSERT INTO gck.lab.edge SELECT CAST(2 AS BIGINT), " +
      "CAST(1.0 AS DOUBLE)")
    intercept[Exception] {
      spark.sql("INSERT INTO gck.lab.edge SELECT CAST(3 AS BIGINT), " +
        "CAST(1.0 AS DOUBLE)")
    }
    // RTAS with no explicit properties inherits the constraint; the
    // staged write itself is subject to it
    intercept[Exception] {
      spark.sql("REPLACE TABLE gck.lab.edge AS " +
        "SELECT CAST(5 AS BIGINT) AS x0, CAST(1.0 AS DOUBLE) AS value")
    }
    spark.sql("REPLACE TABLE gck.lab.edge AS " +
      "SELECT CAST(4 AS BIGINT) AS x0, CAST(9.0 AS DOUBLE) AS value")
    intercept[Exception] {
      spark.sql("INSERT INTO gck.lab.edge SELECT CAST(1 AS BIGINT), " +
        "CAST(1.0 AS DOUBLE)")
    }
  }

  test("bad DDL is rejected at statement time, not first write") {
    intercept[Exception] {
      spark.sql("CREATE TABLE gck.lab.bad (x0 BIGINT, value DOUBLE) " +
        "TBLPROPERTIES (shape='8', chunkDims='4', " +
        "check='no_such_col > 0')")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE gck.lab.bad2 (x0 BIGINT, value DOUBLE) " +
        "TBLPROPERTIES (shape='8', chunkDims='4', check='value >=')")
    }
    assert(!spark.sql("SHOW TABLES IN gck.lab").collect()
      .map(_.getString(1)).exists(Set("bad", "bad2")))
  }

  test("Lake API writes honor the constraint too (shared funnel)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, col, lit}
    val d = ds
    val meta = d.metadata(d.latestVersion.get)
    val v = meta.variable("t") // constraint was UNSET above
    assert(v.check.isEmpty)
    val meta2 = DatasetMeta(meta.variables.map(x =>
      if (x.name == "t") x.copy(check = "value < 1000") else x))
    val w0 = d.newWriter(meta2)
    w0.commit() // metadata-only commit carrying the constraint
    val w = d.newWriter(d.metadata(d.latestVersion.get))
    val badCells = Seq((0L, 5000.0)).toDF("x", "v")
      .select(array(col("x")).as("coord"), col("v").as("value"))
    intercept[Exception] {
      w.writeSlab("t", badCells)
      w.commit()
    }
  }

  test("SHOW TBLPROPERTIES surfaces the live constraint") {
    spark.sql("CREATE TABLE gck.lab.props (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='8', chunkDims='4', check='value > 0')")
    def props = spark.sql("SHOW TBLPROPERTIES gck.lab.props").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("check").contains("value > 0"))
    spark.sql("ALTER TABLE gck.lab.props UNSET TBLPROPERTIES ('check')")
    assert(!props.contains("check"))
  }

  test("check round-trips through the JSON metadata codec") {
    val tricky = """value >= 0 AND x0 != 3 OR value = 1.5"""
    val withQuotes = "substr(string(value), 1, 1) != \"-\" AND x0 > -1"
    for (c <- Seq(tricky, withQuotes, "a\\b = a\\b")) {
      val m = DatasetMeta(Seq(VariableMeta("v", "double", Seq(8), Seq(4),
        Double.NaN, check = c)))
      assert(metaFromJson(metaToJson(m)).variable("v").check == c,
        s"round-trip of '$c'")
    }
    // and absent stays absent
    val none = DatasetMeta(Seq(VariableMeta("v", "double", Seq(8), Seq(4),
      Double.NaN)))
    assert(metaFromJson(metaToJson(none)).variable("v").check.isEmpty)
  }

  private def exMessages(e: Throwable): Seq[String] =
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq
}
