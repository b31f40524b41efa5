package graft.operators

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the analytics wave (q37-q46, p09/p10, t07,
  * st08) beyond the driver's DuckDB hash gate: the properties that must
  * hold for ANY input, not just the gate tables.
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q37: deciles partition the table (counts sum to total, ranges disjoint)") {
    val total = Tables.load(spark, sf, "orders").count()
    val rows = run("q37_global_decile").orderBy("decile").collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    // value ranges are monotone: decile d's hi <= decile d+1's lo
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"),
        s"overlap between decile ${a.get(0)} and ${b.get(0)}")
    }
    // NTILE-style balance: bucket sizes differ by at most 1
    val ns = rows.map(_.getAs[Long]("n_rows"))
    assert(ns.max - ns.min <= 1, ns.mkString(","))
  }

  test("q38: island accounting is consistent per user") {
    run("q38_gaps_islands").collect().foreach { r =>
      val (ni, lg, nd) = (r.getAs[Long]("n_islands"),
        r.getAs[Long]("longest"), r.getAs[Long]("n_days"))
      assert(ni >= 1 && lg >= 1 && lg <= nd && ni <= nd)
    }
  }

  test("q39: merged sessions cover at least one interval length each") {
    run("q39_interval_merge").collect().foreach { r =>
      val (ns, cov) = (r.getAs[Long]("n_sessions"),
        r.getAs[Long]("covered_ms"))
      assert(cov >= ns * 1800000L, s"sessions=$ns covered=$cov")
    }
  }

  test("q40: one mode per lang, and it is the true max count") {
    val counts = Tables.load(spark, sf, "documents")
      .groupBy("lang", "source").count()
      .groupBy("lang").agg(max("count").as("mx"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("mx")).toMap
    val modes = run("q40_mode").collect()
    assert(modes.map(_.getString(0)).distinct.length == modes.length)
    modes.foreach(r =>
      assert(r.getAs[Long]("mode_n") == counts(r.getString(0))))
  }

  test("q44: spine is dense (row count == day span, no null counts)") {
    val rows = run("q44_date_spine").orderBy("d").collect()
    val span = rows.last.getDate(0).toLocalDate.toEpochDay -
      rows.head.getDate(0).toLocalDate.toEpochDay + 1
    assert(rows.length == span)
    assert(rows.forall(_.getAs[Long]("n") >= 0))
  }

  test("q45: histogram covers all rows in buckets 0..19") {
    val total = Tables.load(spark, sf, "orders").count()
    val rows = run("q45_histogram").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b <= 19 })
  }

  test("p10: running token budget never exceeded, kept set is md5-prefix-closed") {
    val rows = run("p10_token_budget").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("cum") <= 3000L))
    // per source, kept docs are exactly the md5-rank prefix: the max
    // cum equals the sum of kept nt (no holes in the running sum)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("nt")).sum == rs.map(_.getAs[Long]("cum")).max)
    }
  }

  test("p09: per-source quota k=ceil(3*sqrt(n)) is hit exactly when n >= k") {
    val n = Tables.load(spark, sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val picked = run("p09_domain_mix").groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    n.foreach { case (src, cnt) =>
      val k = math.ceil(3 * math.sqrt(cnt.toDouble)).toLong
      assert(picked.getOrElse(src, 0L) == math.min(k, cnt), src)
    }
  }

  test("st08: duplicated replay + watermark dedup == batch aggregate") {
    val got = run("st08_dedup_within_watermark")
    val want = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), graft.ColUtil.dsum(col("value")).as("sum_value"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("t07: pre-token count >= whitespace token count (splitting never merges)") {
    val pre = run("t07_pretokenize").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_pretok")).toMap
    val ws = Tables.load(spark, sf, "documents")
      .groupBy("lang")
      .agg(sum(size(split(trim(col("text")), " "))).as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    ws.foreach { case (lang, n) => assert(pre(lang) >= n, lang) }
  }

  test("t10: one row per eligible doc; shared counts bounded; fraction exact") {
    val eligible = Tables.load(spark, sf, "documents")
      .where(size(split(trim(col("text")), " ")) >= 3).count()
    val rows = run("t10_dup_ngram_frac").collect()
    assert(rows.length == eligible)
    rows.foreach { r =>
      val (ng, sh, fr) = (r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_shared"), r.getAs[Double]("dup_frac"))
      assert(ng >= 1 && sh >= 0 && sh <= ng)
      assert(fr == sh.toDouble / ng)
    }
    // a doc's n_grams is its DISTINCT trigram count, verified directly
    // for the doc with the most grams
    val top = rows.maxBy(_.getAs[Long]("n_grams"))
    val direct = Tables.load(spark, sf, "documents")
      .where(col("doc_id") === top.getAs[Long]("doc_id"))
      .select(explode(expr("transform(sequence(0, " +
        "size(split(trim(text), ' ')) - 3), i -> concat(" +
        "split(trim(text), ' ')[i], ' ', split(trim(text), ' ')[i+1], " +
        "' ', split(trim(text), ' ')[i+2]))")).as("s"))
      .distinct().count()
    assert(top.getAs[Long]("n_grams") == direct)
  }

  test("t11: exactly top-5 per source, scores verifiable and non-increasing") {
    val docs = Tables.load(spark, sf, "documents")
    val nDocs = docs.count().toDouble
    val rows = run("t11_distinctive_terms").collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    val nSources = docs.select("source").distinct().count()
    assert(bySource.size == nSources)
    bySource.foreach { case (src, rs) =>
      assert(rs.length == 5, s"$src has ${rs.length} rows")
      // score recomputes from its own row, and ordering is monotone
      rs.foreach { r =>
        val want = r.getAs[Long]("tf") * (nDocs / r.getAs[Long]("doc_df"))
        assert(r.getAs[Double]("score") ==
          BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble, src)
      }
      val scores = rs.map(_.getAs[Double]("score")).toSeq
      assert(scores == scores.sorted.reverse, s"$src not ranked: $scores")
    }
  }
}
