package graft.sources

import java.nio.file.Files

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Generative mini-soak for the row-level DML surface: random
  * UPDATE / DELETE / MERGE statements against a 2-D variable, checked
  * after every statement against an in-memory cell-map model (the
  * same play as MvccModelSoakSpec, at the SQL layer). Catches
  * coordinate-mapping, split-update and dedup bugs no example-based
  * case hits.
  */
class RowLevelDmlSoakSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val W = 6L // shape 6x6, chunkDims 4x4 -> 4 partial/full tiles

  test("random UPDATE/DELETE/MERGE statements match a cell-map model") {
    val root = Files.createTempDirectory("graft_dmlsoak_").toString
    spark.conf.set("spark.sql.catalog.gsk", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsk.root", root)
    spark.sql("CREATE NAMESPACE gsk.d")
    spark.sql("CREATE TABLE gsk.d.t (x0 BIGINT, x1 BIGINT, value DOUBLE) " +
      s"TBLPROPERTIES (shape='$W,$W', chunkDims='4,4')")
    spark.sql("INSERT INTO gsk.d.t " +
      s"SELECT id % $W AS x0, id DIV $W AS x1, CAST(id AS DOUBLE) " +
      s"AS value FROM range(${W * W})")

    // model: live (non-fill) cells only
    var model: Map[(Long, Long), Double] =
      (0L until W * W).map(i => (i % W, i / W) -> i.toDouble).toMap

    def check(tag: String): Unit = {
      val got = spark.sql("SELECT x0, x1, value FROM gsk.d.t " +
        "WHERE NOT isnan(value)").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got == model,
        s"$tag: store ${got.toSeq.sorted} != model ${model.toSeq.sorted}")
    }

    val rnd = new Random(20260814L)
    for (step <- 1 to 30) {
      rnd.nextInt(3) match {
        case 0 => // box-or-value UPDATE
          val useValue = rnd.nextBoolean()
          val delta = rnd.nextInt(9) + 1
          if (useValue) {
            val cut = rnd.nextInt(40).toDouble
            spark.sql(s"UPDATE gsk.d.t SET value = value + $delta " +
              s"WHERE value >= $cut AND NOT isnan(value)")
            model = model.map { case (k, v) =>
              k -> (if (v >= cut) v + delta else v)
            }
          } else {
            val lo = rnd.nextInt(W.toInt).toLong
            spark.sql(s"UPDATE gsk.d.t SET value = value + $delta " +
              s"WHERE x0 >= $lo AND NOT isnan(value)")
            model = model.map { case (k @ (x0, _), v) =>
              k -> (if (x0 >= lo) v + delta else v)
            }
          }
        case 1 => // value-predicate DELETE of a random band
          val lo = rnd.nextInt(50).toDouble
          val hi = lo + rnd.nextInt(10) + 1
          spark.sql(s"DELETE FROM gsk.d.t " +
            s"WHERE value >= $lo AND value < $hi")
          model = model.filter { case (_, v) => v < lo || v >= hi }
        case 2 => // MERGE: k random coords -> update/delete/upsert
          val picks = Seq.fill(3)((rnd.nextInt(W.toInt).toLong,
            rnd.nextInt(W.toInt).toLong)).distinct
          val rows = picks.zipWithIndex.map { case ((a, b), i) =>
            val act = rnd.nextInt(3) match {
              case 0 => "up"
              case 1 => "del"
              case 2 => "set"
            }
            val v = (step * 100 + i).toDouble
            (a, b, v, act)
          }
          val values = rows.map { case (a, b, v, act) =>
            s"(CAST($a AS BIGINT), CAST($b AS BIGINT), " +
              s"CAST($v AS DOUBLE), '$act')"
          }.mkString(", ")
          spark.sql(s"""MERGE INTO gsk.d.t t
            USING (SELECT * FROM VALUES $values AS s(x0, x1, v, action)) s
            ON t.x0 = s.x0 AND t.x1 = s.x1
            WHEN MATCHED AND s.action = 'del' THEN DELETE
            WHEN MATCHED AND s.action = 'up'
              THEN UPDATE SET value = t.value + s.v
            WHEN MATCHED THEN UPDATE SET value = s.v
            WHEN NOT MATCHED AND s.action = 'set'
              THEN INSERT (x0, x1, value) VALUES (s.x0, s.x1, s.v)""")
          rows.foreach { case (a, b, v, act) =>
            val k = (a, b)
            act match {
              case "del" => model -= k
              case "up" =>
                // an absent (fill) cell is NOT MATCHED under the
                // live-only operation scan: 'up' leaves it absent
                model.get(k).foreach(old => model += k -> (old + v))
              case "set" => model += k -> v // matched set or absent insert
            }
          }
      }
      check(s"step $step")
    }
  }
}
