package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Atomic CTAS / RTAS through the StagingTableCatalog surface: create
  * + data land in ONE MVCC version, REPLACE is an epoch swap carrying
  * exactly the query's rows, and a failed CTAS leaves nothing behind.
  */
class CtasSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val root = Files.createTempDirectory("graft_ctas_").toString
  spark.conf.set("spark.sql.catalog.gc1", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gc1.root", root)
  spark.sql("CREATE NAMESPACE gc1.lab")
  spark.sql("CREATE TABLE gc1.lab.src (x0 BIGINT, value DOUBLE) " +
    "TBLPROPERTIES (shape='8', chunkDims='4')")
  spark.sql("INSERT INTO gc1.lab.src SELECT id AS x0, " +
    "CAST(id * 2 AS DOUBLE) AS value FROM range(8)")

  private def ds = new graft.core.GraftLake(spark, root).connect("lab")

  test("CTAS: create + data in ONE atomic version") {
    val before = ds.versionIds().length
    spark.sql("CREATE TABLE gc1.lab.dst " +
      "TBLPROPERTIES (shape='8', chunkDims='4') " +
      "AS SELECT x0, value FROM gc1.lab.src")
    assert(ds.versionIds().length == before + 1,
      "CTAS must commit exactly one version (create + data together)")
    assert(spark.sql("SELECT sum(value) FROM gc1.lab.dst")
      .head().getDouble(0) == 56.0)
    // and the single version time-travels as a unit: one version back
    // there is no dst at all
    val prev = ds.versionIds().sorted.takeRight(2).head
    val metaPrev = ds.metadata(prev)
    assert(!metaPrev.variables.exists(_.name == "dst"))
  }

  test("RTAS: epoch swap to exactly the query's rows; geometry inherited") {
    spark.sql("CREATE TABLE gc1.lab.r1 " +
      "TBLPROPERTIES (shape='8', chunkDims='4') " +
      "AS SELECT x0, value FROM gc1.lab.src")
    val before = ds.versionIds().length
    // no TBLPROPERTIES: shape/chunkDims/dtype/fill inherit from r1
    spark.sql("REPLACE TABLE gc1.lab.r1 AS " +
      "SELECT CAST(0 AS BIGINT) AS x0, CAST(111.0 AS DOUBLE) AS value")
    assert(ds.versionIds().length == before + 1)
    val rows = spark.sql("SELECT x0, value FROM gc1.lab.r1 " +
      "WHERE NOT isnan(value)").collect()
    assert(rows.length == 1 && rows.head.getDouble(1) == 111.0,
      s"replace must carry ONLY the query's rows, got ${rows.length}")
    // history below the replace still shows the old contents
    val prev = ds.versionIds().sorted.takeRight(2).head
    assert(spark.sql(s"SELECT sum(value) FROM gc1.lab.r1 VERSION AS OF $prev")
      .head().getDouble(0) == 56.0)
  }

  test("CREATE OR REPLACE dispatches on existence") {
    spark.sql("CREATE OR REPLACE TABLE gc1.lab.cor " +
      "TBLPROPERTIES (shape='4', chunkDims='2') " +
      "AS SELECT CAST(0 AS BIGINT) AS x0, CAST(1.0 AS DOUBLE) AS value")
    spark.sql("CREATE OR REPLACE TABLE gc1.lab.cor " +
      "AS SELECT CAST(1 AS BIGINT) AS x0, CAST(2.0 AS DOUBLE) AS value")
    val rows = spark.sql("SELECT x0, value FROM gc1.lab.cor " +
      "WHERE NOT isnan(value)").collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L)
  }

  test("failed CTAS aborts atomically: no table, no version, no staging") {
    val before = ds.versionIds().length
    val ex = intercept[Exception] {
      spark.sql("CREATE TABLE gc1.lab.boom " +
        "TBLPROPERTIES (shape='8', chunkDims='4') " +
        "AS SELECT x0, CAST(raise_error('mid-write failure') AS DOUBLE) " +
        "AS value FROM gc1.lab.src")
    }
    assert(ex.getMessage != null)
    assert(ds.versionIds().length == before, "no version may commit")
    assert(!spark.sql("SHOW TABLES IN gc1.lab").collect()
      .map(_.getString(1)).contains("boom"))
    // reading the name fails cleanly
    intercept[Exception] {
      spark.sql("SELECT * FROM gc1.lab.boom").collect()
    }
  }

  test("CTAS with mismatched query schema refuses before staging") {
    val before = ds.versionIds().length
    intercept[Exception] {
      spark.sql("CREATE TABLE gc1.lab.badcols " +
        "TBLPROPERTIES (shape='8', chunkDims='4') " +
        "AS SELECT x0 AS wrong_name, value FROM gc1.lab.src")
    }
    assert(ds.versionIds().length == before)
  }
}
