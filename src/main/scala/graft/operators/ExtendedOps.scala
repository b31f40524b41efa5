package graft.operators

import graft.{ColUtil, Q, QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second wave of relational coverage: JSON extraction, min/max agg,
  * decorrelated subqueries, pivot, exact percentiles, approximate
  * distinct sketches.
  */
object ExtendedOps extends QueryPack {

  /** Deterministic HyperLogLog (m = 4096, p = 12) over md5-derived
    * hashes: returns one row per `group` with the HLL estimate of
    * distinct `key` values as `approx` (double). The harmonic sum is
    * exact integer arithmetic scaled by 2^49 (register term
    * 1 << (49−ρ), empty register term 2^49), with linear counting
    * below the standard 2.5·m cutoff. Shared by q26 and the
    * high-cardinality raw-branch test so both exercise the same math.
    */
  def hllApproxDistinct(df: org.apache.spark.sql.DataFrame,
                        group: String, key: String)
      : org.apache.spark.sql.DataFrame = {
    val md = md5(col(key).cast("string"))
    val h = df.select(col(group),
      conv(substring(md, 1, 3), 16, 10).cast("long").as("reg"),
      conv(substring(md, 4, 12), 16, 10).cast("long").as("suf"))
    val r = h.select(col(group), col("reg"),
        when(col("suf") === 0, 49)
          .otherwise(lit(49) - length(bin(col("suf")))).as("rho"))
      .groupBy(col(group), col("reg"))
      .agg(max(col("rho")).as("rho"))
    val g = r.groupBy(col(group))
      .agg(count(lit(1)).as("np"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - rho AS INT))"))
          .as("z_int"))
    val twoP49 = 562949953421312L
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(4096.0))
    g.select(col(group),
        (alpha * lit(16777216.0) * lit(562949953421312.0) /
          ((lit(4096L) - col("np")) * lit(twoP49) + col("z_int"))
            .cast("double")).as("raw"),
        (lit(4096L) - col("np")).as("v"))
      .select(col(group),
        when(col("raw") <= 10240.0 && col("v") > 0,
          lit(4096.0) * log(lit(4096.0) / col("v").cast("double")))
          .otherwise(col("raw")).as("approx"))
  }

  val all: Seq[Q] = Seq(

    // JSON scalar extraction over the events.props column.
    Q("q21_json_extract",
      Some("SELECT event_type, " +
        "CAST(SUM(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k, " +
        "COUNT(*) AS n FROM events GROUP BY event_type"),
      (s, d) => Tables.load(s, d, "events")
        .groupBy(col("event_type"))
        .agg(sum(get_json_object(col("props"), "$.k").cast("int"))
          .as("sum_k"), count(lit(1)).as("n"))),

    // min/max over numerics, strings and timestamps + first-in-order.
    Q("q22_minmax",
      Some("SELECT o_orderpriority, min(o_orderdate) AS first_dt, " +
        "max(o_orderdate) AS last_dt, min(o_orderstatus) AS min_st, " +
        "max(o_totalprice) AS max_price, count(*) AS n " +
        "FROM orders GROUP BY o_orderpriority"),
      (s, d) => Tables.load(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(min(col("o_orderdate")).as("first_dt"),
          max(col("o_orderdate")).as("last_dt"),
          min(col("o_orderstatus")).as("min_st"),
          max(col("o_totalprice")).as("max_price"),
          count(lit(1)).as("n"))),

    // correlated scalar subquery, decorrelated to a join on an exact
    // decimal average (deterministic across engines/partitionings).
    Q("q23_correlated_subquery",
      Some("WITH a AS (SELECT c_nationkey, " +
        "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS nat_avg " +
        "FROM customer GROUP BY c_nationkey) " +
        "SELECT c_custkey, c_acctbal, nat_avg FROM customer " +
        "JOIN a USING (c_nationkey) WHERE c_acctbal > nat_avg"),
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        val a = c.groupBy(col("c_nationkey"))
          .agg((ColUtil.dsum(col("c_acctbal")) / count(lit(1))).as("nat_avg"))
        c.join(broadcast(a), Seq("c_nationkey"))
          .where(col("c_acctbal") > col("nat_avg"))
          .select(col("c_custkey"), col("c_acctbal"), col("nat_avg"))
      }),

    // pivot (returnflag columns per linestatus row).
    Q("q24_pivot",
      Some("SELECT l_linestatus, " +
        "CAST(SUM(CAST(CASE WHEN l_returnflag = 'A' THEN l_quantity END AS DECIMAL(18,4))) AS DOUBLE) AS qty_a, " +
        "CAST(SUM(CAST(CASE WHEN l_returnflag = 'N' THEN l_quantity END AS DECIMAL(18,4))) AS DOUBLE) AS qty_n, " +
        "CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity END AS DECIMAL(18,4))) AS DOUBLE) AS qty_r " +
        "FROM lineitem GROUP BY l_linestatus"),
      (s, d) => Tables.load(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(ColUtil.dsum(col("l_quantity")))
        .select(col("l_linestatus"), col("A").as("qty_a"),
          col("N").as("qty_n"), col("R").as("qty_r"))),

    // exact interpolated percentiles (Spark percentile == DuckDB
    // quantile_cont: same (n-1)*p linear interpolation definition).
    Q("q25_percentile",
      Some("SELECT l_returnflag, " +
        "quantile_cont(l_quantity, 0.5) AS p50_qty, " +
        "quantile_cont(l_extendedprice, 0.9) AS p90_price " +
        "FROM lineitem GROUP BY l_returnflag"),
      (s, d) => Tables.load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_price"))),

    // full analytic window-function battery: lag/lead/rank/dense_rank/
    // ntile over a total per-partition ordering.
    Q("q27_window_funcs",
      Some("SELECT o_custkey, o_orderkey, " +
        "lag(o_orderkey) OVER w AS prev_ok, " +
        "lead(o_orderkey) OVER w AS next_ok, " +
        "rank() OVER w AS rnk, dense_rank() OVER w AS drnk, " +
        "ntile(4) OVER w AS quartile " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey)"),
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.load(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_ok"),
          lead(col("o_orderkey"), 1).over(w).as("next_ok"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"))
      }),

    // three-way fact-dim join through supplier (completes table
    // coverage): revenue by supplier nation.
    Q("q28_supplier_join",
      Some("SELECT n_name, COUNT(*) AS n_items, " +
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name"),
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
          .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        val sup = Tables.load(s, d, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val n = Tables.load(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))
        li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_items"),
            ColUtil.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("revenue"))
      }),

    // salted two-phase aggregation — the skew pattern: heavy keys are
    // split across 16 salt buckets for the first (wide) aggregation,
    // then the salt is dropped and partials combine in a second, tiny
    // aggregation. Result is identical to a direct groupBy (the oracle
    // is the plain GROUP BY), the shuffle is skew-free.
    Q("q29_skew_salted_agg",
      Some("SELECT l_returnflag, COUNT(*) AS n_rows, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem GROUP BY l_returnflag"),
      (s, d) => {
        val salted = Tables.load(s, d, "lineitem")
          .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
          .groupBy(col("l_returnflag"), col("salt"))
          .agg(count(lit(1)).as("pn"),
            sum(col("l_quantity").cast(
              org.apache.spark.sql.types.DataTypes.createDecimalType(18, 4)))
              .as("pq"))
        salted.groupBy(col("l_returnflag"))
          .agg(sum(col("pn")).as("n_rows"),
            sum(col("pq")).cast("double").as("sum_qty"))
      }),

    // the spark.sql(...) entry path: ONE ANSI SQL text executed
    // verbatim by both engines (views registered per call).
    Q("q30_sql_surface", {
      val sqlText =
        "WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice, " +
          "row_number() OVER (PARTITION BY o_custkey " +
          "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) " +
          "SELECT c_custkey, c_name, o_totalprice AS top_price " +
          "FROM customer JOIN r ON c_custkey = o_custkey WHERE rn = 1"
      Some(sqlText)
    },
      (s, d) => {
        Tables.load(s, d, "orders").createOrReplaceTempView("orders")
        Tables.load(s, d, "customer").createOrReplaceTempView("customer")
        s.sql(
          "WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice, " +
            "row_number() OVER (PARTITION BY o_custkey " +
            "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) " +
            "SELECT c_custkey, c_name, o_totalprice AS top_price " +
            "FROM customer JOIN r ON c_custkey = o_custkey WHERE rn = 1")
      }),

    // Approximate distinct-count sketch: a from-scratch HyperLogLog
    // (m = 4096 registers, p = 12, σ ≈ 1.6%) over md5-derived hashes —
    // DETERMINISTIC, so unlike an engine-specific HLL++ the whole
    // sketch replays bit-identically in the oracle. Register = first 3
    // hex chars (12 bits), rank ρ = leading zeros of the next 48 bits
    // + 1 (via length(bin(x)) — pure integer logic in both engines),
    // and the harmonic sum accumulates as EXACT integers scaled by
    // 2^49 (each register's 2^−ρ term is 1 << (49−ρ); an empty
    // register's 2^0 term is 2^49 itself), so no float-order
    // nondeterminism can split the engines. Scale shape: the register fold is a map-side-
    // combining groupBy with ≤ m rows per group out of the shuffle —
    // the standard mergeable-sketch layout. QueryPackSpec still bounds
    // the estimate against the exact count.
    Q("q26_approx_distinct",
      Some("WITH h AS (SELECT l_returnflag, " +
        "CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 3) " +
        "AS BIGINT) AS reg, " +
        "CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 4, 12) " +
        "AS BIGINT) AS suf FROM lineitem), " +
        "r AS (SELECT l_returnflag, reg, " +
        "max(CASE WHEN suf = 0 THEN 49 " +
        "ELSE 49 - length(bin(suf)) END) AS rho FROM h GROUP BY 1, 2), " +
        "g AS (SELECT l_returnflag, count(*) AS np, " +
        "sum((CAST(1 AS BIGINT) << CAST(49 - rho AS INTEGER))) AS z_int " +
        "FROM r GROUP BY 1), " +
        "e AS (SELECT l_returnflag, " +
        "(0.7213 / (1.0 + 1.079 / 4096.0)) * 16777216.0 * " +
        "562949953421312.0 / " +
        "CAST((4096 - np) * 562949953421312 + z_int AS DOUBLE) AS raw, " +
        "4096 - np AS v FROM g), " +
        "x AS (SELECT l_returnflag, count(DISTINCT l_orderkey) " +
        "AS exact_orders FROM lineitem GROUP BY 1) " +
        "SELECT e.l_returnflag, " +
        "round(CASE WHEN raw <= 10240.0 AND v > 0 " +
        "THEN 4096.0 * ln(4096.0 / CAST(v AS DOUBLE)) ELSE raw END, 4) " +
        "AS approx_orders, exact_orders " +
        "FROM e JOIN x USING (l_returnflag)"),
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
        val e = hllApproxDistinct(li, "l_returnflag", "l_orderkey")
        val x = li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_orderkey")).as("exact_orders"))
        e.join(x, "l_returnflag")
          .select(col("l_returnflag"),
            round(col("approx"), 4).as("approx_orders"),
            col("exact_orders"))
      }),

    // lateral explode (UNNEST): tokenize documents, count words, top 20
    // under a total (count desc, word) ordering. The explode runs
    // inside whole-stage codegen (Generate); the top-k plans as
    // TakeOrderedAndProject — no global sort materializes.
    Q("q33_explode_wordcount",
      Some("SELECT word, COUNT(*) AS n FROM (SELECT unnest(" +
        "str_split(text, ' ')) AS word FROM documents) " +
        "WHERE length(word) > 0 GROUP BY word " +
        "ORDER BY n DESC, word LIMIT 20"),
      (s, d) => Tables.load(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(20)),

    // explicit GROUPING SETS beyond rollup/cube (q19/q20): the chosen
    // sets are (priority,status), (priority), () — subtotal rows are
    // identified by GROUPING(col), not a value sentinel, so real NULLs
    // or a literal 'ALL' in the data can never collide with subtotals.
    Q("q34_grouping_sets",
      Some("SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' " +
        "ELSE o_orderpriority END AS pri, " +
        "CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' " +
        "ELSE o_orderstatus END AS status, COUNT(*) AS n, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total " +
        "FROM orders GROUP BY GROUPING SETS " +
        "((o_orderpriority, o_orderstatus), (o_orderpriority), ())"),
      (s, d) => Tables.load(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
            Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          ColUtil.dsum(col("o_totalprice")).as("total"),
          grouping(col("o_orderpriority")).as("gp"),
          grouping(col("o_orderstatus")).as("gs"))
        .select(
          when(col("gp") === 1, lit("ALL"))
            .otherwise(col("o_orderpriority")).as("pri"),
          when(col("gs") === 1, lit("ALL"))
            .otherwise(col("o_orderstatus")).as("status"),
          col("n"), col("total"))),

    // time-RANGE window frame: per-user trailing-1-hour event sum.
    // RANGE frames are peer-inclusive, so equal-ts rows agree across
    // engines without a tie-break; sums ride exact decimals.
    Q("q35_range_frame",
      Some("SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (" +
        "PARTITION BY user_id ORDER BY epoch_ms(ts) " +
        "RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) " +
        "AS DOUBLE) AS trailing_sum FROM events"),
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_ms"))
          .rangeBetween(-3600000L, 0L)
        Tables.load(s, d, "events")
          .withColumn("ts_ms", unix_millis(col("ts")))
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            sum(col("value").cast(DecimalType(18, 4))).over(w)
              .cast("double").as("trailing_sum"))
      }),

    // ordered array aggregation: per customer, its top-3 orders by
    // price as a joined key string. Bounded per-group state: rank with
    // row_number (price desc, key asc tie-break) and count with an
    // unordered window over the SAME partitioning (one shuffle, two
    // Window ops, no extra exchange), filter rn<=3 BEFORE aggregating —
    // collect_list then holds at most 3 structs per group regardless of
    // how many orders a customer has.
    Q("q36_array_topk",
      Some("SELECT o_custkey, array_to_string(" +
        "(list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey))[1:3]" +
        ", ',') AS top3, COUNT(*) AS n_orders " +
        "FROM orders GROUP BY o_custkey"),
      (s, d) => {
        val part = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
        val ranked = part
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.load(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rn", row_number().over(ranked))
          .withColumn("cnt", count(lit(1)).over(part))
          .filter(col("rn") <= 3)
          .groupBy(col("o_custkey"))
          .agg(
            array_join(
              transform(
                sort_array(collect_list(struct(
                  col("rn"), col("o_orderkey").as("ok")))),
                x => x.getField("ok").cast("string")), ",").as("top3"),
            max(col("cnt")).as("n_orders"))
      })
  )
}
