package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** SQL UPDATE / MERGE INTO / value-predicate DELETE through the
  * delta-based row-level operation surface: each statement lands as
  * ONE MVCC version, deletes are fill writes, coordinate-moving
  * updates split into delete+insert, and history stays
  * time-travelable below every statement.
  */
class RowLevelDmlSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val root = Files.createTempDirectory("graft_dml_").toString
  spark.conf.set("spark.sql.catalog.gd1", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gd1.root", root)
  spark.sql("CREATE NAMESPACE gd1.dml")

  private def ds = new graft.core.GraftLake(spark, root).connect("dml")

  private def mk(name: String): Unit = {
    spark.sql(s"CREATE TABLE gd1.dml.$name (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='8', chunkDims='4')")
    spark.sql(s"INSERT INTO gd1.dml.$name SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(8)")
  }

  private def liveCells(name: String): Map[Long, Double] =
    spark.sql(s"SELECT x0, value FROM gd1.dml.$name " +
      "WHERE NOT isnan(value)").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("UPDATE with a coordinate predicate: one version, values rewritten") {
    mk("u1")
    val before = ds.versionIds().length
    spark.sql("UPDATE gd1.dml.u1 SET value = value * 10 WHERE x0 >= 4")
    assert(ds.versionIds().length == before + 1,
      "an UPDATE must commit exactly one version")
    assert(liveCells("u1") ==
      Map(0L -> 0.0, 1L -> 1.0, 2L -> 2.0, 3L -> 3.0,
        4L -> 40.0, 5L -> 50.0, 6L -> 60.0, 7L -> 70.0))
    // history below the update is intact
    val prev = ds.versionIds().sorted.takeRight(2).head
    val hist = spark.sql(
      s"SELECT sum(value) FROM gd1.dml.u1 VERSION AS OF $prev " +
        "WHERE NOT isnan(value)").head().getDouble(0)
    assert(hist == 28.0)
  }

  test("UPDATE with a VALUE predicate (inexpressible as a box)") {
    mk("u2")
    spark.sql("UPDATE gd1.dml.u2 SET value = -1.0 " +
      "WHERE value >= 5.0 AND value < 7.0")
    assert(liveCells("u2") ==
      Map(0L -> 0.0, 1L -> 1.0, 2L -> 2.0, 3L -> 3.0,
        4L -> 4.0, 5L -> -1.0, 6L -> -1.0, 7L -> 7.0))
  }

  test("coordinate-moving UPDATE splits into delete + insert") {
    mk("u3")
    spark.sql("UPDATE gd1.dml.u3 SET x0 = 0 WHERE x0 = 7")
    val cells = liveCells("u3")
    assert(!cells.contains(7L), "the moved-from cell must read as fill")
    assert(cells(0L) == 7.0, "the moved-to cell carries the row's value")
  }

  test("DELETE with a value predicate routes through the row-level path") {
    mk("d1")
    val before = ds.versionIds().length
    spark.sql("DELETE FROM gd1.dml.d1 WHERE value > 5.5")
    assert(ds.versionIds().length == before + 1)
    assert(liveCells("d1").keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("MERGE INTO: update, delete and insert-into-absent-cell in one statement") {
    // target written only on 0..5; 6..7 are fill (NaN) — the
    // operation scan is LIVE-ONLY, so an absent cell is NOT MATCHED
    // and the upsert takes the INSERT clause (the sparse-store form)
    spark.sql("CREATE TABLE gd1.dml.m1 (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='8', chunkDims='4')")
    spark.sql("INSERT INTO gd1.dml.m1 SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(6)")
    val before = ds.versionIds().length
    spark.sql("""MERGE INTO gd1.dml.m1 t
      USING (SELECT * FROM VALUES
        (CAST(1 AS BIGINT), CAST(100.0 AS DOUBLE), 'up'),
        (CAST(2 AS BIGINT), CAST(0.0 AS DOUBLE), 'del'),
        (CAST(6 AS BIGINT), CAST(600.0 AS DOUBLE), 'up')
        AS s(x0, v, action)) s
      ON t.x0 = s.x0
      WHEN MATCHED AND s.action = 'del' THEN DELETE
      WHEN MATCHED THEN UPDATE SET value = s.v
      WHEN NOT MATCHED THEN INSERT (x0, value) VALUES (s.x0, s.v)""")
    assert(ds.versionIds().length == before + 1,
      "a MERGE must commit exactly one version")
    val cells = liveCells("m1")
    assert(cells(1L) == 100.0, "matched update")
    assert(!cells.contains(2L), "matched delete reads as fill")
    assert(cells(6L) == 600.0, "absent-cell insert lands a value")
    assert(cells(0L) == 0.0 && cells(5L) == 5.0, "untouched rows persist")
  }

  test("MERGE INSERT outside the shape refuses loudly, commits nothing") {
    // an out-of-shape coordinate is NOT MATCHED (live-only scan), so
    // the insert reaches the write — which must reject it (grow the
    // variable first), not alias it into the chunk grid
    mk("m2")
    val before = ds.versionIds().length
    val ex = intercept[Exception] {
      spark.sql("""MERGE INTO gd1.dml.m2 t
        USING (SELECT CAST(9 AS BIGINT) AS x0,
          CAST(900.0 AS DOUBLE) AS v) s
        ON t.x0 = s.x0
        WHEN NOT MATCHED THEN INSERT (x0, value) VALUES (s.x0, s.v)""")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("outside shape")), s"got: ${ex.getMessage}")
    assert(ds.versionIds().length == before, "no version may commit")
  }

  test("value-predicate UPDATE on a sparse variable touches O(live) cells") {
    // 4096-cell variable (1024 chunks), only 4 cells written. The
    // predicate `value >= 0` matches the NaN fill under Spark's
    // NaN-greatest ordering — a dense operation scan would re-stage
    // every unwritten cell (O(shape)); the live-only scan must touch
    // only the one written chunk.
    spark.sql("CREATE TABLE gd1.dml.sp (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='4096', chunkDims='4')")
    spark.sql("INSERT INTO gd1.dml.sp SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(4)")
    def nChunkFiles: Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else 1
      val d = new java.io.File(s"$root/dml/chunks")
      if (d.exists()) walk(d) else 0
    }
    val filesBefore = nChunkFiles
    val versBefore = ds.versionIds().length
    val dec0 = graft.core.ChunkCodec.chunksDecoded.get()
    spark.sql("UPDATE gd1.dml.sp SET value = value + 1 " +
      "WHERE value >= 0.0")
    val wrote = nChunkFiles - filesBefore
    val decodes = graft.core.ChunkCodec.chunksDecoded.get() - dec0
    assert(ds.versionIds().length == versBefore + 1)
    assert(liveCells("sp") ==
      Map(0L -> 1.0, 1L -> 2.0, 2L -> 3.0, 3L -> 4.0))
    assert(wrote <= 3,
      s"UPDATE wrote $wrote chunk files — a dense fill rewrite " +
        "(O(shape)) would write ~1024")
    assert(decodes <= 8,
      s"UPDATE decoded $decodes chunks for a 1-chunk live set")
  }

  test("conflicting same-cell writes in one batch fail the commit") {
    // a coordinate-COLLAPSING update moves two rows onto one cell
    // with different values — Spark's MERGE cardinality check cannot
    // see it (distinct target rows), so the staged-cell dedup must
    // reject it (the Delta/Iceberg duplicate-row contract), not
    // silently keep max(value)
    spark.sql("CREATE TABLE gd1.dml.dup1 (x0 BIGINT, value DOUBLE) " +
      "TBLPROPERTIES (shape='8', chunkDims='4')")
    spark.sql("INSERT INTO gd1.dml.dup1 SELECT id AS x0, " +
      "CAST(id AS DOUBLE) AS value FROM range(6)")
    val before = ds.versionIds().length
    val ex = intercept[Exception] {
      spark.sql("UPDATE gd1.dml.dup1 SET x0 = 0 WHERE x0 >= 4")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("GRAFT_DUPLICATE_CELL")),
      s"got: ${ex.getMessage}")
    assert(ds.versionIds().length == before, "no version may commit")
    assert(liveCells("dup1") == (0L until 6L).map(i =>
      i -> i.toDouble).toMap, "a failed statement leaves the table intact")
    // identical duplicate values are NOT a conflict — they collapse
    spark.sql("UPDATE gd1.dml.dup1 SET x0 = 7, value = 42.0 " +
      "WHERE x0 >= 4")
    val cells = liveCells("dup1")
    assert(cells(7L) == 42.0 && !cells.contains(4L) && !cells.contains(5L))
  }

  test("UPDATE matching nothing commits nothing") {
    mk("u4")
    val before = ds.versionIds().length
    spark.sql("UPDATE gd1.dml.u4 SET value = 1.0 WHERE value > 1e9")
    assert(ds.versionIds().length == before,
      "a no-op DML statement must not commit a version")
    // and no staging residue is left behind
    val staging = new java.io.File(s"$root/dml/staging")
    val leftover =
      if (staging.exists()) staging.listFiles().toSeq else Seq.empty
    assert(leftover.isEmpty, s"staging residue: $leftover")
  }
}
