package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The lake as a SQL catalog: DDL creates datasets/variables through
  * the same MVCC commit protocol, DML inserts commit versions, and
  * `VERSION AS OF` time-travels.
  */
class GraftCatalogSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val root = Files.createTempDirectory("graft_cat_").toString
  spark.conf.set("spark.sql.catalog.g", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.g.root", root)

  test("full SQL lifecycle: namespace, table, insert, select, time travel, drop") {
    spark.sql("CREATE NAMESPACE g.weather")
    spark.sql("CREATE TABLE g.weather.temp (x0 BIGINT, x1 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='4,4', chunkDims='2,2')")
    assert(spark.sql("SHOW TABLES IN g.weather").collect()
      .map(_.getString(1)).toSeq == Seq("temp"))

    spark.sql("INSERT INTO g.weather.temp " +
      "SELECT id % 4 AS x0, id DIV 4 AS x1, CAST(id AS DOUBLE) AS value " +
      "FROM range(16)")
    val v1 = spark.sql("SELECT max(value) FROM g.weather.temp")
      .head().getDouble(0)
    assert(v1 == 15.0)

    spark.sql("INSERT INTO g.weather.temp SELECT 0 AS x0, 0 AS x1, " +
      "999.0 AS value")
    // latest sees the overwrite; VERSION AS OF sees history
    val latest = spark.sql("SELECT value FROM g.weather.temp " +
      "WHERE x0 = 0 AND x1 = 0").head().getDouble(0)
    assert(latest == 999.0)
    val ds = new graft.core.GraftLake(spark, root).connect("weather")
    // versions: CREATE (meta-only), first INSERT, second INSERT
    val vFirstInsert = ds.versionIds().sorted.apply(1)
    val historic = spark.sql(
      s"SELECT value FROM g.weather.temp VERSION AS OF $vFirstInsert " +
        "WHERE x0 = 0 AND x1 = 0").head().getDouble(0)
    assert(historic == 0.0)

    // a second variable via DDL; both listed
    spark.sql("CREATE TABLE g.weather.hum (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='4', chunkDims='2')")
    assert(spark.sql("SHOW TABLES IN g.weather").collect()
      .map(_.getString(1)).toSet == Set("temp", "hum"))

    // MVCC drop: gone at HEAD, history retained
    spark.sql("DROP TABLE g.weather.hum")
    assert(spark.sql("SHOW TABLES IN g.weather").collect()
      .map(_.getString(1)).toSeq == Seq("temp"))
    assert(ds.versionIds().length == 5) // create, insert, insert, create hum, drop hum
  }

  test("streaming reads through the catalog: readStream.table") {
    spark.sql("CREATE NAMESPACE g.feed")
    spark.sql("CREATE TABLE g.feed.m (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='4', chunkDims='2')")
    spark.sql("INSERT INTO g.feed.m SELECT id AS x0, " +
      "CAST(id * 10 AS DOUBLE) AS value FROM range(4)")
    val q = spark.readStream.table("g.feed.m")
      .writeStream.outputMode("append")
      .format("memory").queryName("cat_stream").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cat_stream").count() == 4)
      spark.sql("INSERT INTO g.feed.m SELECT 0 AS x0, 777.0 AS value")
      q.processAllAvailable()
      val rows = spark.table("cat_stream").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.length == 6) // 4 + the rewritten 2-cell chunk
      assert(rows.contains((0L, 777.0)))
    } finally q.stop()

    // a tag works as the stream's start offset: tail only commits
    // AFTER the tagged release
    val ds = new graft.core.GraftLake(spark, root).connect("feed")
    val head = ds.latestVersion.get
    ds.tag("release", head)
    spark.sql("INSERT INTO g.feed.m SELECT 3 AS x0, 888.0 AS value")
    val q2 = spark.readStream.option("startVersion", "release")
      .table("g.feed.m")
      .writeStream.outputMode("append")
      .format("memory").queryName("cat_stream_tag").start()
    try {
      q2.processAllAvailable()
      val rows2 = spark.table("cat_stream_tag").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      // exactly the post-tag commit's chunk (cells 2,3), nothing older
      assert(rows2.toSet == Set((2L, 20.0), (3L, 888.0)),
        s"got ${rows2.toSeq}")
    } finally q2.stop()
  }

  test("ALTER TABLE shape growth: DDL grow -> write -> read round-trip") {
    spark.sql("CREATE NAMESPACE g.growth")
    spark.sql("CREATE TABLE g.growth.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='4', chunkDims='2', fillValue='0.0')")
    spark.sql("INSERT INTO g.growth.t SELECT id AS x0, " +
      "CAST(id + 1 AS DOUBLE) AS value FROM range(4)")
    assert(spark.sql("SELECT count(*) FROM g.growth.t").head().getLong(0) == 4)

    // metadata-only MVCC grow; new region reads as fill until written
    spark.sql("ALTER TABLE g.growth.t SET TBLPROPERTIES ('shape'='8')")
    assert(spark.sql("SELECT count(*) FROM g.growth.t").head().getLong(0) == 8)
    spark.sql("INSERT INTO g.growth.t SELECT 6 AS x0, 70.0 AS value")
    val cells = spark.sql("SELECT x0, value FROM g.growth.t").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cells == Map(0L -> 1.0, 1L -> 2.0, 2L -> 3.0, 3L -> 4.0,
      4L -> 0.0, 5L -> 0.0, 6L -> 70.0, 7L -> 0.0))

    // history still reads under the old shape
    val ds = new graft.core.GraftLake(spark, root).connect("growth")
    val beforeGrow = ds.versionIds().sorted.apply(1) // create, insert, alter, insert
    assert(spark.sql("SELECT count(*) FROM g.growth.t " +
      s"VERSION AS OF $beforeGrow").head().getLong(0) == 4)

    // immutable properties refuse loudly
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE g.growth.t SET TBLPROPERTIES ('chunkDims'='4')")
    }
    assert(e.getMessage.toLowerCase.contains("immutable"))
    // rank changes refuse too
    intercept[Exception] {
      spark.sql("ALTER TABLE g.growth.t SET TBLPROPERTIES ('shape'='8,8')")
    }
  }

  test("dtype-aware fill validation: integer dtypes refuse NaN, default to 0") {
    spark.sql("CREATE NAMESPACE g.fills")
    // explicit NaN fill for an integer dtype would silently read back
    // as 0 through the exact decode paths — refused at DDL time
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE g.fills.bad (x0 BIGINT, value BIGINT) " +
        "TBLPROPERTIES (shape='4', chunkDims='2', dtype='long', " +
        "fillValue='NaN')")
    }
    assert(e.getMessage.contains("not representable"))
    // no fillValue property: integer dtype defaults to 0, and a
    // partial-tile write round-trips (the 2^53 encode guard would have
    // tripped on the old NaN default's gap fill)
    spark.sql("CREATE TABLE g.fills.ok (x0 BIGINT, value BIGINT) " +
      "TBLPROPERTIES (shape='4', chunkDims='2', dtype='long')")
    spark.sql("INSERT INTO g.fills.ok SELECT 0 AS x0, 41 AS value")
    val cells = spark.sql("SELECT x0, value FROM g.fills.ok ORDER BY x0")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(cells.toSeq == Seq(0L -> 41L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
    // ALTER to a NaN fill on the integer dtype refuses the same way
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE g.fills.ok SET TBLPROPERTIES ('fillValue'='NaN')")
    }
    assert(e2.getMessage.contains("not representable"))
  }

  test("dtype evolution: ALTER COLUMN value TYPE is an atomic rechunk epoch swap") {
    spark.sql("CREATE NAMESPACE g.dty")
    spark.sql("CREATE TABLE g.dty.t (x0 BIGINT, value SMALLINT) " +
      "TBLPROPERTIES (shape='8', chunkDims='4', dtype='short')")
    spark.sql("INSERT INTO g.dty.t SELECT id AS x0, " +
      "CAST(id * 3 AS SMALLINT) AS value FROM range(6)")
    val ds = new graft.core.GraftLake(spark, root).connect("dty")
    val vShort = ds.latestVersion.get
    val nBefore = ds.versionIds().length

    // widen short -> long: one commit, values preserved, new schema
    spark.sql("ALTER TABLE g.dty.t ALTER COLUMN value TYPE BIGINT")
    assert(ds.versionIds().length == nBefore + 1,
      "dtype evolution must land as ONE version")
    val sch = spark.table("g.dty.t").schema
    assert(sch("value").dataType ==
      org.apache.spark.sql.types.LongType, sch.treeString)
    val live = spark.sql(
      "SELECT x0, value FROM g.dty.t WHERE value <> 0").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(live == Map(1L -> 3L, 2L -> 6L, 3L -> 9L, 4L -> 12L,
      5L -> 15L), s"got $live")
    // integral fill carries over (short fill 0 -> long fill 0): the
    // unwritten cells still read as fill
    assert(spark.sql("SELECT count(*) FROM g.dty.t WHERE value = 0")
      .head().getLong(0) == 3) // cell 0 (value 0) + unwritten 6, 7

    // time travel BELOW the swap reads the old dtype exactly
    val hist = spark.sql(
      s"SELECT x0, value FROM g.dty.t VERSION AS OF $vShort " +
        "WHERE value <> 0").collect()
      .map(r => r.getLong(0) -> r.getShort(1).toInt).toMap
    assert(hist == Map(1 -> 3, 2 -> 6, 3 -> 9, 4 -> 12, 5 -> 15)
      .map { case (k, v) => k.toLong -> v })

    // further writes land in the new dtype
    spark.sql("INSERT INTO g.dty.t SELECT CAST(6 AS BIGINT), " +
      "CAST(5000000000 AS BIGINT)") // > Int.MaxValue: needs long
    assert(spark.sql("SELECT value FROM g.dty.t WHERE x0 = 6")
      .head().getLong(0) == 5000000000L)

    // narrowing (BIGINT -> SMALLINT) is refused by Spark's analyzer
    // before it reaches the catalog (only up-casts pass)
    val vN = ds.versionIds().length
    val exNarrow = intercept[Exception] {
      spark.sql("ALTER TABLE g.dty.t ALTER COLUMN value TYPE SMALLINT")
    }
    assert(exNarrow.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"),
      exNarrow.getMessage)
    assert(ds.versionIds().length == vN, "failed ALTER must not commit")

    // an up-cast that would LOSE VALUES fails the representability
    // probe: 2^24 + 1 has no exact float form, so BIGINT -> FLOAT
    // (precedence-legal for Spark) must reject and commit nothing
    spark.sql("INSERT INTO g.dty.t SELECT CAST(7 AS BIGINT), " +
      "CAST(16777217 AS BIGINT)")
    val vF = ds.versionIds().length
    val exFloat = intercept[Exception] {
      spark.sql("ALTER TABLE g.dty.t ALTER COLUMN value TYPE FLOAT")
    }
    assert(exFloat.getMessage.contains("not exactly representable"),
      exFloat.getMessage)
    assert(ds.versionIds().length == vF, "failed ALTER must not commit")
  }

  test("ALTER TABLE shape values are validated, not just rank") {
    spark.sql("CREATE NAMESPACE g.shapes")
    spark.sql("CREATE TABLE g.shapes.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='4', chunkDims='2')")
    // a 0 or negative extent would commit a broken chunk grid as a
    // durable metadata version every later read trips over
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE g.shapes.t SET TBLPROPERTIES ('shape'='0')")
    }
    assert(e.getMessage.contains("positive"))
    intercept[Exception] {
      spark.sql("ALTER TABLE g.shapes.t SET TBLPROPERTIES ('shape'='-4')")
    }
    // garbage fillValue refuses with a real message, not a bare
    // NumberFormatException from toDouble
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE g.shapes.t SET TBLPROPERTIES ('fillValue'='oops')")
    }
    assert(e3.getMessage.contains("not a number"))
    // the table is still healthy after the refused DDL
    spark.sql("INSERT INTO g.shapes.t SELECT 1 AS x0, 5.0 AS value")
    assert(spark.sql("SELECT count(*) FROM g.shapes.t").head().getLong(0) == 4)
  }

  test("RENAME TABLE is metadata-only: read, write and time travel survive") {
    spark.sql("CREATE NAMESPACE g.ren")
    spark.sql("CREATE TABLE g.ren.old (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='4', chunkDims='2')")
    spark.sql("INSERT INTO g.ren.old SELECT id AS x0, " +
      "CAST(id * 10 AS DOUBLE) AS value FROM range(4)")
    val preVersion = {
      val lake = new graft.core.GraftLake(spark, root)
      lake.connect("ren").latestVersion.get
    }

    spark.sql("ALTER TABLE g.ren.old RENAME TO g.ren.fresh")
    // the new name reads the SAME data — no index rewrite happened
    val cells = spark.sql("SELECT x0, value FROM g.ren.fresh ORDER BY x0")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(cells == Seq(0L -> 0.0, 1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // old name is gone; catalog lists the new one
    assert(!spark.sql("SHOW TABLES IN g.ren").collect()
      .map(_.getString(1)).contains("old"))
    assert(spark.sql("SHOW TABLES IN g.ren").collect()
      .map(_.getString(1)).contains("fresh"))

    // writes under the new name land on the same index rows
    spark.sql("INSERT INTO g.ren.fresh SELECT 1 AS x0, 99.0 AS value")
    assert(spark.sql("SELECT value FROM g.ren.fresh WHERE x0 = 1")
      .head().getDouble(0) == 99.0)

    // time travel to before the rename: the OLD name resolves there
    assert(spark.sql("SELECT count(*) FROM g.ren.old " +
      s"VERSION AS OF $preVersion").head().getLong(0) == 4)
    // and the pre-rename version still shows pre-overwrite data via
    // the new name's history too (same physical variable)
    assert(spark.sql(s"SELECT value FROM g.ren.old VERSION AS OF " +
      s"$preVersion WHERE x0 = 1").head().getDouble(0) == 10.0)

    // re-creating a table under the retired name is refused: the
    // renamed variable's index rows still key on it
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE g.ren.old (x0 BIGINT, value DOUBLE) " +
        "TBLPROPERTIES (shape='4', chunkDims='2')")
    }
    assert(e.getMessage.contains("already exists"))

    // a second rename keeps the original physical key (idx pinned)
    spark.sql("ALTER TABLE g.ren.fresh RENAME TO g.ren.newest")
    assert(spark.sql("SELECT count(*) FROM g.ren.newest").head()
      .getLong(0) == 4)
    assert(spark.sql("SELECT value FROM g.ren.newest WHERE x0 = 1")
      .head().getDouble(0) == 99.0)

    // renaming BACK to the original name must work — the collision
    // check may not trip on the variable's own stable index key
    spark.sql("ALTER TABLE g.ren.newest RENAME TO g.ren.old")
    assert(spark.sql("SELECT value FROM g.ren.old WHERE x0 = 1")
      .head().getDouble(0) == 99.0)

    // a RETIRED logical name is not a point-lookup alias: chunkAt
    // under a name that does not exist at that version misses instead
    // of phantom-hitting the renamed variable's physical rows
    val ds = new graft.core.GraftLake(spark, root).connect("ren")
    val head = ds.latestVersion.get
    assert(ds.chunkAt("newest", Seq(0L), head).isEmpty)
    assert(ds.chunkAt("old", Seq(0L), head).nonEmpty)
  }

  test("namespace catalog ops") {
    spark.sql("CREATE NAMESPACE g.scratch")
    assert(spark.sql("SHOW NAMESPACES IN g").collect()
      .map(_.getString(0)).contains("scratch"))
    spark.sql("DROP NAMESPACE g.scratch")
    assert(!spark.sql("SHOW NAMESPACES IN g").collect()
      .map(_.getString(0)).contains("scratch"))
  }

  test("INSERT OVERWRITE and TRUNCATE: epoch swap, history intact, O(new-data)") {
    spark.sql("CREATE NAMESPACE g.ow")
    spark.sql("CREATE TABLE g.ow.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='8', chunkDims='4')")
    spark.sql("INSERT INTO g.ow.t SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(8)")
    val ds = new graft.core.GraftLake(spark, root).connect("ow")
    val vFull = ds.latestVersion.get

    // overwrite: HEAD = exactly the new cells over fill — NOT a merge
    // with the old 8 (cells 5-7 must read as NaN-fill, i.e. absent)
    spark.sql("INSERT OVERWRITE g.ow.t SELECT id AS x0, " +
      "CAST(id * 100 AS DOUBLE) AS value FROM range(5)")
    val head = spark.sql(
      "SELECT x0, value FROM g.ow.t WHERE NOT isnan(value)").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(head == (0L until 5L).map(i => i -> i * 100.0).toMap,
      s"overwrite must replace, not merge: $head")

    // time travel below the overwrite sees the pre-overwrite content
    assert(spark.sql(s"SELECT sum(value) FROM g.ow.t VERSION AS OF $vFull")
      .head().getDouble(0) == (0 to 7).sum.toDouble)

    // the overwrite version wrote only the new cells' chunks: 2 new
    // blobs (cells 0-4 span two 4-wide tiles) on top of the original
    // 2 — not a rewrite of the old
    val newIdx = ds.metadata(ds.latestVersion.get).variable("t").idx
    assert(newIdx != "t", "overwrite must swap the physical index key")
    assert(ds.chunkCount() == 4)

    // appends after the overwrite merge onto the NEW epoch only
    spark.sql("INSERT INTO g.ow.t SELECT 0 AS x0, -1.0 AS value")
    val merged = spark.sql(
      "SELECT x0, value FROM g.ow.t WHERE NOT isnan(value)").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(merged == Map(0L -> -1.0, 1L -> 100.0, 2L -> 200.0,
      3L -> 300.0, 4L -> 400.0))

    // TRUNCATE: O(1) metadata-only commit; table reads all-fill
    spark.sql("TRUNCATE TABLE g.ow.t")
    assert(spark.sql("SELECT count(*) FROM g.ow.t WHERE NOT isnan(value)")
      .head().getLong(0) == 0)
    // and the table is writable again on the fresh epoch
    spark.sql("INSERT INTO g.ow.t SELECT 7 AS x0, 7.5 AS value")
    val after = spark.sql(
      "SELECT x0, value FROM g.ow.t WHERE NOT isnan(value)").collect()
    assert(after.length == 1 && after.head.getDouble(1) == 7.5)

    // expiring pre-overwrite history frees ALL old-epoch blobs
    ds.expireVersions(keepLast = 2)
    assert(ds.gc(graceMs = 0L, staleStagingMs = 0L) >= 2L,
      "old-epoch chunks must become unreferenced once history expires")
    assert(spark.sql("SELECT value FROM g.ow.t WHERE x0 = 7")
      .head().getDouble(0) == 7.5)
  }

  test("DROP then re-CREATE must not resurrect the dropped variable's rows") {
    spark.sql("CREATE NAMESPACE g.ph")
    spark.sql("CREATE TABLE g.ph.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='8', chunkDims='4')")
    spark.sql("INSERT INTO g.ph.t SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(8)")
    spark.sql("DROP TABLE g.ph.t")
    // the dropped variable's index rows are still retained (history);
    // the re-CREATE must key on a fresh epoch, not the old "t"
    spark.sql("CREATE TABLE g.ph.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='8', chunkDims='4')")
    assert(spark.sql("SELECT count(*) FROM g.ph.t WHERE NOT isnan(value)")
      .head().getLong(0) == 0,
      "re-created table resurrected the dropped variable's cells")
    val ds = new graft.core.GraftLake(spark, root).connect("ph")
    val vm = ds.metadata(ds.latestVersion.get).variable("t")
    assert(vm.idx != "t", "re-CREATE must auto-assign a fresh epoch key")
    // the new table works normally
    spark.sql("INSERT INTO g.ph.t SELECT 3 AS x0, 33.0 AS value")
    assert(spark.sql(
      "SELECT sum(value) FROM g.ph.t WHERE NOT isnan(value)").head()
      .getDouble(0) == 33.0)

    // the commit layer itself refuses historical-key reuse (the
    // programmatic path has no auto-remap — defense in depth)
    val reuse = graft.core.Model.DatasetMeta(
      ds.metadata(ds.latestVersion.get).variables :+
        graft.core.Model.VariableMeta("t2", "double", Seq(8), Seq(4),
          Double.NaN, indexName = "t"))
    val ex = intercept[IllegalStateException](ds.newWriter(reuse).commit())
    assert(ex.getMessage.contains("earlier"))
  }

  test("DELETE FROM: coordinate-box deletes are MVCC fill writes") {
    spark.sql("CREATE NAMESPACE g.del")
    spark.sql("CREATE TABLE g.del.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='8', chunkDims='4')")
    spark.sql("INSERT INTO g.del.t SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(8)")
    val ds = new graft.core.GraftLake(spark, root).connect("del")
    val vFull = ds.latestVersion.get

    // box delete: cells 2..5 go to fill; the rest survive
    spark.sql("DELETE FROM g.del.t WHERE x0 >= 2 AND x0 <= 5")
    val left = spark.sql(
      "SELECT x0, value FROM g.del.t WHERE NOT isnan(value)").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(left == Map(0L -> 0.0, 1L -> 1.0, 6L -> 6.0, 7L -> 7.0),
      s"unexpected survivors: $left")

    // history below the delete is intact
    assert(spark.sql(s"SELECT sum(value) FROM g.del.t VERSION AS OF $vFull")
      .head().getDouble(0) == (0 to 7).sum.toDouble)

    // deleting an already-empty box commits NOTHING (no useless version)
    val nVersions = ds.versionIds().length
    spark.sql("DELETE FROM g.del.t WHERE x0 >= 2 AND x0 < 4")
    assert(ds.versionIds().length == nVersions,
      "a no-op DELETE must not commit a version")

    // full-variable delete short-circuits to the O(1) epoch swap:
    // metadata-only (no new blobs), table reads empty
    val chunksBefore = ds.chunkCount()
    spark.sql("DELETE FROM g.del.t")
    assert(ds.chunkCount() == chunksBefore,
      "full delete must be metadata-only, not a fill rewrite")
    assert(spark.sql("SELECT count(*) FROM g.del.t WHERE NOT isnan(value)")
      .head().getLong(0) == 0)

    // value predicates route through the delta-based row-level path
    // (gated in RowLevelDmlSpec); the operation scan is LIVE-ONLY, so
    // on this all-fill (NaN) table NEITHER predicate matches anything
    // — not even `value > 3`, which would match NaN under Spark's
    // NaN-greatest ordering on a dense view — and nothing commits
    val vBefore = ds.versionIds().length
    spark.sql("DELETE FROM g.del.t WHERE value < 3.0")
    assert(ds.versionIds().length == vBefore,
      "an empty-match row-level DELETE must not commit a version")
    spark.sql("DELETE FROM g.del.t WHERE value > 3.0")
    assert(ds.versionIds().length == vBefore,
      "fill cells are absent from the live-only scan: no-op, no commit")
    assert(spark.sql("SELECT count(*) FROM g.del.t WHERE NOT isnan(value)")
      .head().getLong(0) == 0)
  }

  test("change feed through the catalog: startVersion read option windows the scan") {
    spark.sql("CREATE NAMESPACE g.cf")
    spark.sql("CREATE TABLE g.cf.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='8', chunkDims='4')")
    spark.sql("INSERT INTO g.cf.t SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(8)")
    val ds = new graft.core.GraftLake(spark, root).connect("cf")
    val v1 = ds.latestVersion.get
    spark.sql("INSERT INTO g.cf.t SELECT 1 AS x0, 111.0 AS value")
    val v2 = ds.latestVersion.get

    // the windowed read reaches newScanBuilder via read options;
    // versionAsOf pins the upper bound through the same path
    val changed = spark.read
      .option("startVersion", v1.toString)
      .option("versionAsOf", v2.toString)
      .table("g.cf.t").collect()
    assert(changed.length == 4, s"got ${changed.length} rows")
    val byCell = changed.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byCell(1L) == 111.0 && byCell(0L) == 0.0 && byCell(3L) == 3.0)

    // an empty window through the catalog is an empty scan
    assert(spark.read.option("startVersion", v2.toString)
      .table("g.cf.t").count() == 0)
    // a tag name works anywhere a version id does: "changes since
    // the last release" without bookkeeping the id
    ds.tag("base", v1)
    assert(spark.read.option("startVersion", "base")
      .option("versionAsOf", v2.toString).table("g.cf.t").count() == 4)
    val terr = intercept[Exception](spark.read
      .option("startVersion", "nosuchtag").table("g.cf.t").collect())
    assert(terr.getMessage.contains("nosuchtag"))
    // and the unwindowed catalog read stays dense
    assert(spark.read.table("g.cf.t").count() == 8)

    // the geometry surfaces through SHOW TBLPROPERTIES
    val props = spark.sql("SHOW TBLPROPERTIES g.cf.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("shape") == "8" && props("chunkDims") == "4")
    assert(props("dtype") == "double")
  }

  test("maintenance procedures: CALL system.{history,compact_index,expire_versions,gc}") {
    spark.sql("CREATE NAMESPACE g.maint")
    spark.sql("CREATE TABLE g.maint.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='8', chunkDims='4')")
    // three data versions; v2 overwrites tile 0 so expiry frees a blob
    spark.sql("INSERT INTO g.maint.t SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(8)")
    spark.sql("INSERT INTO g.maint.t SELECT 0 AS x0, 111.0 AS value")
    spark.sql("INSERT INTO g.maint.t SELECT 1 AS x0, 222.0 AS value")

    // history: 4 live versions (create + 3 inserts), newest first
    val hist = spark.sql("CALL g.system.history(dataset => 'maint')")
      .collect()
    assert(hist.length == 4)
    assert(hist.map(_.getString(0)).toSet == Set("maint"))
    val ids = hist.map(_.getLong(1)).toSeq
    assert(ids == ids.sorted.reverse, "history must be newest-first")
    assert(spark.sql(
      "CALL g.system.history(dataset => 'maint', max_versions => 2)")
      .count() == 2)

    // compact_index folds the three inserts' per-version partitions
    // (the CREATE version is metadata-only — no index partition); a
    // second call has nothing to fold
    assert(spark.sql("CALL g.system.compact_index(dataset => 'maint')")
      .head().getLong(1) == 3L)
    assert(spark.sql("CALL g.system.compact_index(dataset => 'maint')")
      .head().getLong(1) == 0L)

    // expire down to 2: the two oldest ids go; reads stay exact
    val expired = spark.sql(
      "CALL g.system.expire_versions(dataset => 'maint', keep_last => 2)")
      .collect().map(_.getLong(1)).toSeq
    assert(expired == ids.drop(2).sorted.reverse.sorted,
      s"expected the two oldest of $ids expired, got $expired")
    assert(spark.sql("SELECT value FROM g.maint.t WHERE x0 = 0")
      .head().getDouble(0) == 111.0)
    assert(spark.sql("SELECT value FROM g.maint.t WHERE x0 = 1")
      .head().getDouble(0) == 222.0)

    // gc with zero grace reclaims v1's overwritten tile-0 blob
    val swept = spark.sql(
      "CALL g.system.gc(dataset => 'maint', grace_ms => 0, " +
        "stale_staging_ms => 0)").head().getLong(1)
    assert(swept >= 1L, s"expected at least one dead chunk swept, got $swept")
    assert(spark.sql("SELECT sum(value) FROM g.maint.t").head()
      .getDouble(0) == 111.0 + 222.0 + (2 to 7).map(_.toDouble).sum)

    // discovery + error surfaces
    val shown = spark.sql("SHOW PROCEDURES IN g.system").collect()
    assert(shown.length == GraftProcedures.names.length)
    val err = intercept[Exception](
      spark.sql("CALL g.system.nope(dataset => 'maint')").collect())
    assert(err.getMessage.contains("nope"))
  }

  test("tags: named refs pin versions, resolve in VERSION AS OF, block retention") {
    spark.sql("CREATE NAMESPACE g.tags")
    spark.sql("CREATE TABLE g.tags.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='4', chunkDims='4')")
    spark.sql("INSERT INTO g.tags.t SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(4)")
    val ds = new graft.core.GraftLake(spark, root).connect("tags")
    val v1 = ds.latestVersion.get
    spark.sql("INSERT INTO g.tags.t SELECT 0 AS x0, 99.0 AS value")

    // tag an explicit version and HEAD-by-default
    val tagged = spark.sql("CALL g.system.tag(dataset => 'tags', " +
      s"name => 'corpus-v1', version => $v1)").head()
    assert(tagged.getString(1) == "corpus-v1" && tagged.getLong(2) == v1)
    spark.sql("CALL g.system.tag(dataset => 'tags', name => 'release')")

    // time travel through the tag sees v1's cells
    assert(spark.sql(
      "SELECT value FROM g.tags.t VERSION AS OF 'corpus-v1' WHERE x0 = 0")
      .head().getDouble(0) == 0.0)
    assert(spark.sql(
      "SELECT value FROM g.tags.t VERSION AS OF 'release' WHERE x0 = 0")
      .head().getDouble(0) == 99.0)
    val err = intercept[Exception](spark.sql(
      "SELECT * FROM g.tags.t VERSION AS OF 'nope'").collect())
    assert(err.getMessage.contains("nope"))

    // listing, duplicate guard, numeric-name guard
    val listed = spark.sql("CALL g.system.tags(dataset => 'tags')")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toSeq
    assert(listed.map(_._1) == Seq("corpus-v1", "release"))
    assert(listed.head._2 == v1)
    intercept[Exception](spark.sql("CALL g.system.tag(" +
      "dataset => 'tags', name => 'corpus-v1')").collect())
    spark.sql("CALL g.system.tag(dataset => 'tags', " +
      "name => 'corpus-v1', replace => true)")
    intercept[Exception](spark.sql("CALL g.system.tag(" +
      "dataset => 'tags', name => '12345')").collect())

    // retention refuses to expire a tagged version...
    spark.sql("CALL g.system.tag(dataset => 'tags', " +
      s"name => 'pinned', version => $v1)")
    val rerr = intercept[Exception](spark.sql(
      "CALL g.system.expire_versions(dataset => 'tags', keep_last => 1)")
      .collect())
    assert(rerr.getMessage.contains("pinned"))
    // ...until the tag is dropped
    assert(spark.sql("CALL g.system.drop_tag(dataset => 'tags', " +
      "name => 'pinned')").head().getBoolean(2))
    // (corpus-v1/release now point at HEAD; v1 carries no tag)
    assert(spark.sql(
      "CALL g.system.expire_versions(dataset => 'tags', keep_last => 1)")
      .count() >= 1)

    // stats procedure: one live version left, cells intact
    val st = spark.sql("CALL g.system.stats(dataset => 'tags')").head()
    assert(st.getLong(1) == 1L, s"n_versions = ${st.getLong(1)}")
    assert(st.getLong(2) >= 1L && st.getLong(3) > 0L)
  }

  test("TIMESTAMP AS OF time travel: version ids are commit timestamps") {
    spark.sql("CREATE NAMESPACE g.tt")
    spark.sql("CREATE TABLE g.tt.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='4', chunkDims='4')")
    spark.sql("INSERT INTO g.tt.t SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(4)")
    val ds = new graft.core.GraftLake(spark, root).connect("tt")
    val v1 = ds.latestVersion.get
    Thread.sleep(5) // distinct commit millis for the boundary check
    spark.sql("INSERT INTO g.tt.t SELECT 0 AS x0, 99.0 AS value")

    // at v1's own commit instant, the second insert is invisible
    val tsV1 = new java.sql.Timestamp(v1).toString
    assert(spark.read.option("timestampAsOf", tsV1).table("g.tt.t")
      .filter("x0 = 0").head().getDouble(1) == 0.0)
    assert(spark.sql(
      s"SELECT value FROM g.tt.t TIMESTAMP AS OF '$tsV1' WHERE x0 = 0")
      .head().getDouble(0) == 0.0)
    // now (or any later instant) sees the overwrite
    val tsNow = new java.sql.Timestamp(
      System.currentTimeMillis() + 1000L).toString
    assert(spark.sql(
      s"SELECT value FROM g.tt.t TIMESTAMP AS OF '$tsNow' WHERE x0 = 0")
      .head().getDouble(0) == 99.0)
    // a timestamp before every commit is a clear error
    val err = intercept[Exception](spark.read
      .option("timestampAsOf", "1970-01-02 00:00:00")
      .table("g.tt.t").collect())
    assert(err.getMessage.contains("no live version"))
  }

  test("time-based retention: expire_versions(older_than) keeps HEAD") {
    spark.sql("CREATE NAMESPACE g.ttl")
    spark.sql("CREATE TABLE g.ttl.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='4', chunkDims='4')")
    spark.sql("INSERT INTO g.ttl.t SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(4)")
    spark.sql("INSERT INTO g.ttl.t SELECT 0 AS x0, 99.0 AS value")
    val ds = new graft.core.GraftLake(spark, root).connect("ttl")
    val ids = ds.versionIds() // newest first: insert2, insert1, create
    assert(ids.length == 3)

    // cutoff between the create/insert1 pair and insert2: version ids
    // are commit timestamps, so the two older versions expire
    val expired = spark.sql("CALL g.system.expire_versions(" +
      s"dataset => 'ttl', older_than => ${ids.head})")
      .collect().map(_.getLong(1)).toSeq
    assert(expired.toSet == ids.drop(1).toSet,
      s"expected ${ids.drop(1)} expired, got $expired")
    assert(spark.sql("SELECT sum(value) FROM g.ttl.t").head()
      .getDouble(0) == 99.0 + 1.0 + 2.0 + 3.0)

    // a cutoff in the past is a no-op; HEAD always survives even for
    // a cutoff beyond every commit
    assert(spark.sql("CALL g.system.expire_versions(" +
      "dataset => 'ttl', older_than => 1)").count() == 0)
    spark.sql("INSERT INTO g.ttl.t SELECT 1 AS x0, 88.0 AS value")
    val farFuture = System.currentTimeMillis() + 1000000L
    assert(spark.sql("CALL g.system.expire_versions(" +
      s"dataset => 'ttl', older_than => $farFuture)").count() == 1)
    assert(ds.versionIds().length == 1)
    assert(spark.sql("SELECT sum(value) FROM g.ttl.t").head()
      .getDouble(0) == 99.0 + 88.0 + 2.0 + 3.0)

    // exactly one selector must be passed
    val err = intercept[Exception](spark.sql(
      "CALL g.system.expire_versions(dataset => 'ttl', " +
        "keep_last => 1, older_than => 5)").collect())
    assert(err.getMessage.contains("exactly one"))
    val err2 = intercept[Exception](spark.sql(
      "CALL g.system.expire_versions(dataset => 'ttl')").collect())
    assert(err2.getMessage.contains("exactly one"))
  }

  test("CALL clone_table: zero-copy branch readable, writable, time-travelable") {
    spark.sql("CREATE NAMESPACE g.cl")
    spark.sql("CREATE TABLE g.cl.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='6', chunkDims='2')")
    spark.sql("INSERT INTO g.cl.t SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(6)")
    val ds = new graft.core.GraftLake(spark, root).connect("cl")
    val v1 = ds.latestVersion.get
    spark.sql("INSERT INTO g.cl.t SELECT 0 AS x0, 99.0 AS value")

    // clone at the PRE-overwrite version; the branch shows history
    val row = spark.sql("CALL g.system.clone_table(dataset => 'cl', " +
      s"source => 't', target => 'b', version => $v1)").head()
    assert(row.getString(1) == "t" && row.getString(2) == "b" &&
      row.getLong(3) == v1)
    assert(spark.sql("SHOW TABLES IN g.cl").collect()
      .map(_.getString(1)).toSet == Set("t", "b"))
    assert(spark.sql("SELECT value FROM g.cl.b WHERE x0 = 0")
      .head().getDouble(0) == 0.0)
    assert(spark.sql("SELECT value FROM g.cl.t WHERE x0 = 0")
      .head().getDouble(0) == 99.0)

    // the branch takes writes independently
    spark.sql("INSERT INTO g.cl.b SELECT 5 AS x0, -5.0 AS value")
    assert(spark.sql("SELECT value FROM g.cl.b WHERE x0 = 5")
      .head().getDouble(0) == -5.0)
    assert(spark.sql("SELECT value FROM g.cl.t WHERE x0 = 5")
      .head().getDouble(0) == 5.0)
    // ...and time-travels to its own creation state
    val vClone = row.getLong(4)
    assert(spark.sql(
      s"SELECT value FROM g.cl.b VERSION AS OF $vClone WHERE x0 = 5")
      .head().getDouble(0) == 5.0)
    // default-version form clones HEAD
    spark.sql("CALL g.system.clone_table(dataset => 'cl', " +
      "source => 't', target => 'h')")
    assert(spark.sql("SELECT value FROM g.cl.h WHERE x0 = 0")
      .head().getDouble(0) == 99.0)
    // comma-separated lists: a whole-dataset branch in ONE commit
    val ds2 = new graft.core.GraftLake(spark, root).connect("cl")
    val nBefore = ds2.versionIds().length
    val rows = spark.sql("CALL g.system.clone_table(dataset => 'cl', " +
      "source => 't,b', target => 't3,b3')").collect()
    assert(rows.length == 2 &&
      rows.map(_.getString(2)).toSet == Set("t3", "b3"))
    assert(rows.map(_.getLong(4)).distinct.length == 1, "one commit")
    assert(ds2.versionIds().length == nBefore + 1)
    assert(spark.sql("SELECT value FROM g.cl.t3 WHERE x0 = 0")
      .head().getDouble(0) == 99.0)
  }

  test("CALL merge_table: branch changes land back on the source") {
    spark.sql("CREATE NAMESPACE g.mg")
    spark.sql("CREATE TABLE g.mg.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='6', chunkDims='2')")
    spark.sql("INSERT INTO g.mg.t SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(6)")
    spark.sql("CALL g.system.clone_table(dataset => 'mg', " +
      "source => 't', target => 'b')")
    spark.sql("INSERT INTO g.mg.b SELECT 4 AS x0, -4.0 AS value")
    val merged = spark.sql("CALL g.system.merge_table(dataset => 'mg', " +
      "branch => 'b')").head()
    assert(merged.getString(1) == "b" && merged.getLong(2) > 0L)
    assert(spark.sql("SELECT value FROM g.mg.t WHERE x0 = 4")
      .head().getDouble(0) == -4.0)
    // conflicting halves: source and branch both rewrite chunk [0,2)
    spark.sql("INSERT INTO g.mg.t SELECT 0 AS x0, 100.0 AS value")
    spark.sql("INSERT INTO g.mg.b SELECT 1 AS x0, -1.0 AS value")
    val err = intercept[Exception](spark.sql(
      "CALL g.system.merge_table(dataset => 'mg', branch => 'b')")
      .collect())
    assert(err.getMessage.contains("merge base"))
    spark.sql("CALL g.system.merge_table(dataset => 'mg', " +
      "branch => 'b', force => true)")
    // branch side won the chunk: its view has the pre-conflict 0
    assert(spark.sql("SELECT value FROM g.mg.t WHERE x0 = 0")
      .head().getDouble(0) == 0.0)
    assert(spark.sql("SELECT value FROM g.mg.t WHERE x0 = 1")
      .head().getDouble(0) == -1.0)
  }

  test("metadata tables: t.history / t.tags / t.variables, with time travel") {
    spark.sql("CREATE NAMESPACE g.md")
    spark.sql("CREATE TABLE g.md.t (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='8', chunkDims='4', " +
      "check='value >= 0.0')")
    spark.sql("INSERT INTO g.md.t SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(8)")
    spark.sql("INSERT INTO g.md.t SELECT 0 AS x0, 99.0 AS value")

    // history: CREATE + 2 inserts, newest first, ids are epoch millis
    val hist = spark.sql("SELECT version_id, committed_at " +
      "FROM g.md.t.history").collect()
    assert(hist.length == 3)
    val ids = hist.map(_.getLong(0)).toSeq
    assert(ids == ids.sorted.reverse, s"newest first, got $ids")
    assert(hist.forall(r =>
      r.getTimestamp(1).getTime == r.getLong(0)),
      "committed_at must be the version id as a timestamp")
    // agrees with the procedure form
    val procIds = spark.sql("CALL g.system.history(dataset => 'md')")
      .collect().map(_.getLong(1)).toSeq
    assert(ids == procIds)

    // time travel clips the listing to the pinned version
    val vFirst = ids.sorted.apply(1) // the first INSERT's version
    val histAt = spark.sql("SELECT version_id FROM g.md.t.history " +
      s"VERSION AS OF $vFirst").collect().map(_.getLong(0)).toSeq
    assert(histAt == ids.filter(_ <= vFirst))

    // tags: empty, then one ref after CALL tag
    assert(spark.sql("SELECT * FROM g.md.t.tags").collect().isEmpty)
    spark.sql(s"CALL g.system.tag(dataset => 'md', name => 'rel1', " +
      s"version => ${ids.max})")
    val tags = spark.sql("SELECT name, version_id FROM g.md.t.tags")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tags == Seq(("rel1", ids.max)))
    // a tag resolves inside the metadata table's own time travel
    val histAtTag = spark.sql("SELECT version_id FROM g.md.t.history " +
      "VERSION AS OF 'rel1'").collect().map(_.getLong(0)).toSeq
    assert(histAtTag == ids)

    // variables: geometry incl. the CHECK constraint
    val vars = spark.sql("SELECT name, dtype, shape, chunk_dims, " +
      "fill_value, check FROM g.md.t.variables").collect()
    assert(vars.length == 1)
    val v0 = vars.head
    assert(v0.getString(0) == "t" && v0.getString(1) == "double" &&
      v0.getString(2) == "8" && v0.getString(3) == "4" &&
      v0.getDouble(4).isNaN && v0.getString(5) == "value >= 0.0")

    // a second variable appears; VERSION AS OF below its CREATE hides it
    spark.sql("CREATE TABLE g.md.u (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='4', chunkDims='2')")
    assert(spark.sql("SELECT name FROM g.md.t.variables").collect()
      .map(_.getString(0)).toSeq == Seq("t", "u"))
    assert(spark.sql("SELECT name FROM g.md.t.variables " +
      s"VERSION AS OF ${ids.max}").collect()
      .map(_.getString(0)).toSeq == Seq("t"))

    // an unknown kind or unknown variable is not a table
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM g.md.nope.history").collect())
    assert(e.getMessage.contains("nope") ||
      e.getMessage.toLowerCase.contains("table"))
  }

  test("CALL stencil: smoothed grid lands as a first-class table") {
    spark.sql("CREATE NAMESPACE g.sm")
    spark.sql("CREATE TABLE g.sm.t (x0 BIGINT, x1 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='8,8', chunkDims='4,4')")
    spark.sql("INSERT INTO g.sm.t SELECT a.id, b.id, " +
      "CAST(a.id * 8 + b.id AS DOUBLE) FROM range(8) a, range(8) b")
    val row = spark.sql("CALL g.system.stencil(dataset => 'sm', " +
      "table => 't', radius => 1)").head()
    assert(row.getString(1) == "t_sm1")
    assert(spark.sql("SHOW TABLES IN g.sm").collect()
      .map(_.getString(1)).toSet == Set("t", "t_sm1"))
    // interior cell (3,3): mean of the full 9-tap box around 27 is 27
    assert(spark.sql(
      "SELECT value FROM g.sm.t_sm1 WHERE x0 = 3 AND x1 = 3")
      .head().getDouble(0) == 27.0)
    // corner (0,0): mean of {0,1,8,9} = 4.5
    assert(spark.sql(
      "SELECT value FROM g.sm.t_sm1 WHERE x0 = 0 AND x1 = 0")
      .head().getDouble(0) == 4.5)
    // a radius wider than the chunk dims refuses loudly
    val e2 = intercept[Exception](spark.sql(
      "CALL g.system.stencil(dataset => 'sm', table => 't', " +
        "radius => 5)").collect())
    assert(e2.getMessage.contains("radius"))
  }
}
