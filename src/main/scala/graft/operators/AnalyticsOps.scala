package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third wave of relational coverage: global ranking without a global
  * window, gaps-and-islands, interval merging, per-group mode,
  * regex functions, positional explode, navigation windows, date
  * spines, fixed-width histograms, and fuzzy string matching.
  *
  * The scale-sensitive entries (q37) deliberately avoid the
  * single-partition `OVER (ORDER BY ...)` shape: global order is
  * recovered from value-monotone buckets + broadcast prefix offsets,
  * the same distributed-prefix-sum pattern as p07.
  */
object AnalyticsOps extends QueryPack {

  val all: Seq[Q] = Seq(

    // global decile assignment WITHOUT a global-order window: bucket on
    // a price-monotone coarse key, rank within buckets (parallel
    // windows), add broadcast per-bucket prefix offsets -> exact global
    // rank; decile = (rank-1)*10 div N + 1. The oracle states the same
    // thing with the naive single-window form.
    Q("q37_global_decile",
      Some("WITH r AS (SELECT o_orderkey, o_totalprice, " +
        "ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk, " +
        "COUNT(*) OVER () AS n FROM orders) " +
        "SELECT CAST((rnk-1)*10//n + 1 AS BIGINT) AS decile, " +
        "COUNT(*) AS n_rows, min(o_totalprice) AS lo, " +
        "max(o_totalprice) AS hi FROM r GROUP BY 1"),
      (s, d) => {
        val o = Tables.load(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
          .withColumn("bkt", floor(col("o_totalprice") / 1000).cast("long"))
        val counts = o.groupBy(col("bkt")).agg(count(lit(1)).as("cnt"))
        // one row per bucket (bounded by the value range, not the data
        // size) -> the ordered prefix window here is over a tiny DF;
        // the grand total rides along as max(off+cnt) over the SAME
        // pass instead of a second aggregation of the counts subtree,
        // so the plan never depends on exchange reuse to avoid
        // re-scanning orders
        val offs = counts.withColumn("off",
          coalesce(sum(col("cnt")).over(Window.orderBy(col("bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("n_total",
            max(col("off") + col("cnt")).over(Window.partitionBy()))
          .select(col("bkt"), col("off"), col("n_total"))
        val wb = Window.partitionBy(col("bkt"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        o.withColumn("rn", row_number().over(wb))
          .join(broadcast(offs), "bkt")
          .withColumn("rnk", col("off") + col("rn"))
          .withColumn("decile", expr("(rnk-1)*10 div n_total + 1"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_rows"), min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"))
      }),

    // gaps & islands: runs of consecutive active days per user via the
    // classic day - row_number() group key; per-user windows only.
    Q("q38_gaps_islands",
      Some("WITH days AS (SELECT DISTINCT user_id, " +
        "epoch_ms(ts)//86400000 AS day FROM events), " +
        "g AS (SELECT user_id, day, day - ROW_NUMBER() OVER " +
        "(PARTITION BY user_id ORDER BY day) AS grp FROM days), " +
        "isl AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2) " +
        "SELECT user_id, COUNT(*) AS n_islands, " +
        "CAST(MAX(len) AS BIGINT) AS longest, " +
        "CAST(SUM(len) AS BIGINT) AS n_days FROM isl GROUP BY 1"),
      (s, d) => {
        // floor division (not `div`'s truncate-toward-zero) so pre-1970
        // timestamps (negative epoch millis) bucket identically to
        // DuckDB's `//` floor semantics
        val days = Tables.load(s, d, "events")
          .select(col("user_id"),
            floor(unix_millis(col("ts")) / 86400000d).cast("long").as("day"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        days.withColumn("grp", col("day") - row_number().over(w))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("len"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_islands"), max(col("len")).as("longest"),
            sum(col("len")).as("n_days"))
      }),

    // merge overlapping intervals (event -> [ts, ts+30min)): new-group
    // flag when a start exceeds the running max end of all earlier
    // intervals, prefix-sum of flags = merged-group id. Both windows
    // share one partitioning+ordering -> a single shuffle and sort.
    Q("q39_interval_merge",
      Some("WITH iv AS (SELECT user_id, epoch_ms(ts) AS st, " +
        "epoch_ms(ts)+1800000 AS en, event_id FROM events), " +
        "m AS (SELECT user_id, st, en, event_id, " +
        "CASE WHEN st <= max(en) OVER (PARTITION BY user_id " +
        "ORDER BY st, en, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) " +
        "THEN 0 ELSE 1 END AS newgrp FROM iv), " +
        "gr AS (SELECT user_id, st, en, SUM(newgrp) OVER " +
        "(PARTITION BY user_id ORDER BY st, en, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM m), " +
        "merged AS (SELECT user_id, grp, min(st) AS ms, max(en) AS me " +
        "FROM gr GROUP BY 1, 2) " +
        "SELECT user_id, COUNT(*) AS n_sessions, " +
        "CAST(SUM(me-ms) AS BIGINT) AS covered_ms FROM merged GROUP BY 1"),
      (s, d) => {
        val iv = Tables.load(s, d, "events")
          .select(col("user_id"), unix_millis(col("ts")).as("st"),
            (unix_millis(col("ts")) + 1800000L).as("en"), col("event_id"))
        val ord = Window.partitionBy(col("user_id"))
          .orderBy(col("st"), col("en"), col("event_id"))
        val prevMax = max(col("en"))
          .over(ord.rowsBetween(Window.unboundedPreceding, -1))
        iv.withColumn("newgrp",
            when(col("st") <= prevMax, lit(0)).otherwise(lit(1)))
          .withColumn("grp", sum(col("newgrp"))
            .over(ord.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("grp"))
          .agg(min(col("st")).as("ms"), max(col("en")).as("me"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("me") - col("ms")).as("covered_ms"))
      }),

    // per-group mode with a deterministic tie-break (count desc, value
    // asc): the distributed mode shape is count-then-argmax, never a
    // per-group value collect.
    Q("q40_mode",
      Some("WITH c AS (SELECT lang, source, COUNT(*) AS n FROM documents " +
        "GROUP BY 1, 2), " +
        "r AS (SELECT lang, source, n, ROW_NUMBER() OVER " +
        "(PARTITION BY lang ORDER BY n DESC, source) AS rn FROM c) " +
        "SELECT lang, source AS mode_source, n AS mode_n FROM r WHERE rn = 1"),
      (s, d) => {
        val c = Tables.load(s, d, "documents")
          .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("source"))
        c.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("lang"), col("source").as("mode_source"),
            col("n").as("mode_n"))
      }),

    // regex scalar functions: capture-group extract + global replace.
    // Patterns stay in the codepoint-literal subset where Java regex
    // (Spark) and RE2 (DuckDB) agree.
    Q("q41_regex_funcs",
      Some("SELECT doc_id, regexp_extract(text, '(ta[a-z]+)', 1) AS m, " +
        "len(regexp_replace(text, '[aeiou]', '', 'g')) AS n_novowel " +
        "FROM documents"),
      (s, d) => Tables.load(s, d, "documents").select(col("doc_id"),
        regexp_extract(col("text"), "(ta[a-z]+)", 1).as("m"),
        length(regexp_replace(col("text"), "[aeiou]", "")).cast("long")
          .as("n_novowel"))),

    // positional explode: token position parity between posexplode and
    // DuckDB's generate_subscripts.
    Q("q42_posexplode",
      Some("WITH w AS (SELECT doc_id, " +
        "unnest(string_split(trim(text),' ')) AS word, " +
        "generate_subscripts(string_split(trim(text),' '),1) - 1 AS pos " +
        "FROM documents) " +
        "SELECT pos, word, COUNT(*) AS n FROM w WHERE pos < 3 GROUP BY 1, 2"),
      (s, d) => Tables.load(s, d, "documents")
        .select(posexplode(split(trim(col("text")), " ")).as(Seq("pos", "word")))
        .where(col("pos") < 3)
        .groupBy(col("pos").cast("long").as("pos"), col("word"))
        .agg(count(lit(1)).as("n"))),

    // navigation window functions over the full-partition frame:
    // first/last/nth value per user in event-time order.
    Q("q43_window_navigation",
      Some("SELECT DISTINCT user_id, " +
        "first_value(event_type) OVER w AS first_et, " +
        "last_value(event_type) OVER w AS last_et, " +
        "nth_value(event_type, 3) OVER w AS third_et FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"),
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_millis(col("ts")), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.load(s, d, "events").select(col("user_id"),
          first(col("event_type")).over(w).as("first_et"),
          last(col("event_type")).over(w).as("last_et"),
          nth_value(col("event_type"), 3).over(w).as("third_et"))
          .distinct()
      }),

    // date-spine densification: generate the full day range once
    // (bounded by the calendar span, not the row count), left join the
    // per-day counts, zero-fill the gaps.
    Q("q44_date_spine",
      Some("WITH b AS (SELECT min(o_orderdate)::DATE AS lo, " +
        "max(o_orderdate)::DATE AS hi FROM orders), " +
        "spine AS (SELECT unnest(generate_series(lo, hi, " +
        "INTERVAL 1 DAY))::DATE AS d FROM b), " +
        "cnt AS (SELECT o_orderdate::DATE AS d, COUNT(*) AS n FROM orders " +
        "GROUP BY 1) " +
        "SELECT spine.d AS d, COALESCE(n, 0) AS n FROM spine " +
        "LEFT JOIN cnt ON spine.d = cnt.d"),
      (s, dd) => {
        val o = Tables.load(s, dd, "orders")
        val b = o.agg(min(to_date(col("o_orderdate"))).as("lo"),
          max(to_date(col("o_orderdate"))).as("hi"))
        val spine = b.select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 day"))).as("d"))
        val cnt = o.groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(count(lit(1)).as("n"))
        spine.join(cnt, Seq("d"), "left")
          .select(col("d"), coalesce(col("n"), lit(0L)).as("n"))
      }),

    // fixed-width histogram: global min/max via one scalar aggregate
    // broadcast to every row; identical IEEE double arithmetic on both
    // engines keeps boundary rows in the same bucket.
    Q("q45_histogram",
      Some("WITH b AS (SELECT min(o_totalprice) AS lo, " +
        "max(o_totalprice) AS hi FROM orders) " +
        "SELECT CAST(LEAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 20)), " +
        "19) AS BIGINT) AS bucket, COUNT(*) AS n FROM orders, b GROUP BY 1"),
      (s, d) => {
        val o = Tables.load(s, d, "orders")
        val b = o.agg(min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        o.crossJoin(broadcast(b))
          .select(least(floor((col("o_totalprice") - col("lo")) /
            ((col("hi") - col("lo")) / 20)), lit(19L)).cast("long")
            .as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      }),

    // fuzzy matching on a dimension: edit-distance pairs over the
    // broadcast nation dim (the quadratic stays on the small side).
    Q("q46_fuzzy_match",
      Some("SELECT a.n_name AS na, b.n_name AS nb, " +
        "levenshtein(a.n_name, b.n_name) AS dist " +
        "FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey " +
        "WHERE levenshtein(a.n_name, b.n_name) <= 4"),
      (s, dd) => {
        val n = Tables.load(s, dd, "nation")
          .select(col("n_nationkey"), col("n_name"))
        val a = n.toDF("ka", "na")
        val b = n.toDF("kb", "nb")
        a.join(broadcast(b), col("ka") < col("kb"))
          .withColumn("dist", levenshtein(col("na"), col("nb")).cast("long"))
          .where(col("dist") <= 4)
          .select(col("na"), col("nb"), col("dist"))
      }),

    // Bottom-k sample sketch for quantile estimation: the k = 256 rows
    // with the SMALLEST md5 of their primary key form a uniform random
    // sample that is deterministic, mergeable (union → re-take bottom
    // k: each executor keeps its local bottom-k, one tiny reduce
    // merges them — the same associativity HLL registers have), and
    // O(k) memory everywhere. Quantiles read off the sorted sample at
    // floor(q·(k−1)): indexes 128/230/253 for p50/p90/p99. Plans as
    // TakeOrderedAndProject — never a global sort of the data. The
    // oracle replays the identical hash sample, so unlike
    // approx_percentile this sketch hash-gates; QueryPackSpec bounds
    // its error against the exact percentiles too.
    Q("q47_bottomk_quantiles",
      Some("WITH s AS (SELECT md5(l_orderkey || '-' || l_linenumber) " +
        "AS rk, CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem " +
        "ORDER BY rk LIMIT 256), " +
        "a AS (SELECT list_sort(list(v)) AS vs FROM s) " +
        "SELECT vs[128] AS p50, vs[230] AS p90, vs[253] AS p99 FROM a"),
      (s, dd) => {
        val sample = Tables.load(s, dd, "lineitem")
          .select(md5(concat_ws("-",
              col("l_orderkey"), col("l_linenumber"))).as("rk"),
            col("l_extendedprice").cast("double").as("v"))
          .orderBy(col("rk")).limit(256)
        sample.agg(sort_array(collect_list(col("v"))).as("vs"))
          .select(element_at(col("vs"), 128).as("p50"),
            element_at(col("vs"), 230).as("p90"),
            element_at(col("vs"), 253).as("p99"))
      }),

    // Time-series resample + forward fill: per-user daily grid over
    // the global span, each day carrying the user's LAST observation
    // at or before it (nulls before the first). The pandas
    // resample('1D').last().ffill() / LOCF primitive. Scale shape:
    // daily obs = one groupBy (map-side combined); the spine is
    // |users|×|days| — the OUTPUT size, built by a narrow explode off
    // the broadcast global span, never a range join; the fill is a
    // per-user window ordered by day (one shuffle on user_id, bounded
    // per-group sort). Ties inside a day break on (ts, event_id) —
    // event_id unique, so the winner is deterministic.
    Q("q48_resample_ffill",
      Some("WITH b AS (SELECT min(ts::DATE) AS lo, max(ts::DATE) AS hi " +
        "FROM events), " +
        "obs AS (SELECT user_id, d, v FROM (" +
        "SELECT user_id, ts::DATE AS d, CAST(value AS DOUBLE) AS v, " +
        "row_number() OVER (PARTITION BY user_id, ts::DATE " +
        "ORDER BY ts DESC, event_id DESC) AS rn FROM events) " +
        "WHERE rn = 1), " +
        "spine AS (SELECT u.user_id, " +
        "unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d " +
        "FROM (SELECT DISTINCT user_id FROM events) u, b), " +
        "j AS (SELECT s.user_id, s.d, o.v FROM spine s " +
        "LEFT JOIN obs o ON s.user_id = o.user_id AND s.d = o.d) " +
        "SELECT user_id, d, last_value(v IGNORE NULLS) OVER (" +
        "PARTITION BY user_id ORDER BY d " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff " +
        "FROM j"),
      (s, dd) => {
        val e = Tables.load(s, dd, "events")
        val b = e.agg(min(to_date(col("ts"))).as("lo"),
          max(to_date(col("ts"))).as("hi"))
        val obs = e.groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(max(struct(col("ts"), col("event_id"),
            col("value").cast("double").as("v"))).getField("v").as("v"))
        val spine = e.select(col("user_id")).distinct()
          .crossJoin(broadcast(b))
          .select(col("user_id"), explode(sequence(col("lo"), col("hi"),
            expr("interval 1 day"))).as("d"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("d"))
          .rowsBetween(Long.MinValue, 0)
        spine.join(obs, Seq("user_id", "d"), "left")
          .select(col("user_id"), col("d"),
            last(col("v"), ignoreNulls = true).over(w).as("value_ff"))
      }),

    // Linear-interpolation resampling (q48's sibling: pandas
    // `resample().interpolate()` instead of LOCF): per user, each
    // daily spine point takes pv + (nv − pv)·(d − pd)/(nd − pd) from
    // the bracketing observations; points outside [first, last] drop.
    // Determinism: the operands are exact (parquet doubles, integer
    // epoch-days) and the interpolation is ONE fixed-shape IEEE
    // expression, written with identical parenthesization in both
    // engines. Scale: spine join + two windows, all keyed on user_id.
    Q("q50_resample_interp",
      Some("WITH b AS (SELECT min(ts::DATE) AS lo, max(ts::DATE) AS hi " +
        "FROM events), " +
        "obs AS (SELECT user_id, d, v FROM (" +
        "SELECT user_id, ts::DATE AS d, CAST(value AS DOUBLE) AS v, " +
        "row_number() OVER (PARTITION BY user_id, ts::DATE " +
        "ORDER BY ts DESC, event_id DESC) AS rn FROM events) " +
        "WHERE rn = 1), " +
        "spine AS (SELECT u.user_id, " +
        "unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d " +
        "FROM (SELECT DISTINCT user_id FROM events) u, b), " +
        "j AS (SELECT s.user_id, s.d, " +
        "CAST(s.d - DATE '1970-01-01' AS BIGINT) AS dd, o.v FROM spine s " +
        "LEFT JOIN obs o ON s.user_id = o.user_id AND s.d = o.d), " +
        "w AS (SELECT user_id, d, dd, " +
        "last_value(v IGNORE NULLS) OVER (PARTITION BY user_id " +
        "ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS pv, " +
        "last_value(CASE WHEN v IS NOT NULL THEN dd END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY d " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd, " +
        "last_value(v IGNORE NULLS) OVER (PARTITION BY user_id " +
        "ORDER BY d DESC ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) AS nv, " +
        "last_value(CASE WHEN v IS NOT NULL THEN dd END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY d DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nd " +
        "FROM j) " +
        "SELECT user_id, d, CASE WHEN pd = nd THEN pv " +
        "ELSE pv + (nv - pv) * ((dd - pd) / (nd - pd)) END AS value_li " +
        "FROM w WHERE pv IS NOT NULL AND nv IS NOT NULL"),
      (s, dd) => {
        val e = Tables.load(s, dd, "events")
        val b = e.agg(min(to_date(col("ts"))).as("lo"),
          max(to_date(col("ts"))).as("hi"))
        val obs = e.groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(max(struct(col("ts"), col("event_id"),
            col("value").cast("double").as("v"))).getField("v").as("v"))
        val spine = e.select(col("user_id")).distinct()
          .crossJoin(broadcast(b))
          .select(col("user_id"), explode(sequence(col("lo"), col("hi"),
            expr("interval 1 day"))).as("d"))
        val j = spine.join(obs, Seq("user_id", "d"), "left")
          .select(col("user_id"), col("d"),
            expr("unix_date(d)").cast("long").as("dd"), col("v"))
        val wB = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("d"))
          .rowsBetween(Long.MinValue, 0)
        val wF = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("d").desc)
          .rowsBetween(Long.MinValue, 0)
        val obsDd = when(col("v").isNotNull, col("dd"))
        j.select(col("user_id"), col("d"), col("dd"),
          last(col("v"), ignoreNulls = true).over(wB).as("pv"),
          last(obsDd, ignoreNulls = true).over(wB).as("pd"),
          last(col("v"), ignoreNulls = true).over(wF).as("nv"),
          last(obsDd, ignoreNulls = true).over(wF).as("nd"))
          .where(col("pv").isNotNull && col("nv").isNotNull)
          .select(col("user_id"), col("d"),
            when(col("pd") === col("nd"), col("pv"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                ((col("dd") - col("pd")) / (col("nd") - col("pd"))))
              .as("value_li"))
      }),

    // Time-weighted average per user (the irregular-sampling mean a
    // resample-then-avg would bias): Σ v·Δt / span, Δt from lead()
    // over (ts, event_id). Determinism: v is DECIMAL(18,2) and Δt
    // exact millis, so the numerator sums EXACTLY in decimal in both
    // engines; its magnitude (≤ ~1.5e14 unscaled at this corpus'
    // value/span ranges) stays under 2^53, so the decimal→double cast
    // is one correctly-rounded division by 100 on both sides, and the
    // final ÷span is a single IEEE op. Scale: one window + one
    // groupBy, both keyed on user_id — a single shuffle.
    Q("q49_time_weighted_avg",
      Some("WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tsm, " +
        "CAST(value AS DECIMAL(18,2)) AS v FROM events), " +
        "l AS (SELECT user_id, v, tsm, lead(tsm) OVER (" +
        "PARTITION BY user_id ORDER BY tsm, event_id) - tsm AS dt " +
        "FROM e), " +
        "a AS (SELECT user_id, sum(v * dt) AS num, " +
        "max(tsm) - min(tsm) AS span FROM l GROUP BY 1) " +
        "SELECT user_id, round(CAST(num AS DOUBLE) / span, 6) AS twa " +
        "FROM a WHERE span > 0"),
      (s, dd) => {
        val e = Tables.load(s, dd, "events")
          .select(col("user_id"), col("event_id"),
            unix_millis(col("ts")).as("tsm"),
            col("value").cast(org.apache.spark.sql.types
              .DataTypes.createDecimalType(18, 2)).as("v"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("tsm"), col("event_id"))
        e.withColumn("dt", lead(col("tsm"), 1).over(w) - col("tsm"))
          .groupBy(col("user_id"))
          .agg(sum(col("v") * col("dt")).as("num"),
            (max(col("tsm")) - min(col("tsm"))).as("span"))
          .where(col("span") > 0)
          .select(col("user_id"),
            round(col("num").cast("double") / col("span"), 6).as("twa"))
      })
  )
}
