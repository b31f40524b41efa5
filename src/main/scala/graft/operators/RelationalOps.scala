package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational operator inventory — every physical access pattern of the
  * reference backend (see SURVEY.md §2.2; reference
  * `src/io/mandoline/backend/hbase.clj`) re-expressed as declarative
  * Spark plans over the driver test tables, so Catalyst pushes
  * filters/projections to the parquet scan and picks join strategies.
  *
  * Determinism notes (the driver hash-compares against DuckDB):
  *  - double SUMs are computed as per-row DECIMAL(18,4) casts summed
  *    exactly, then cast back to double — identical bits regardless of
  *    partitioning/aggregation order in either engine;
  *  - every window/top-k has a total (tie-broken) ordering.
  */
object RelationalOps extends QueryPack {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Staleness fingerprint of local source files/dirs: a stable hash
    * over every (relative path, length, mtime) — any rewrite of the
    * sources changes it. Driver-side only (bench/test tables).
    */
  private def fingerprint(s: SparkSession, paths: Seq[String]): String = {
    import org.apache.hadoop.fs.Path
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val hc = s.sparkContext.hadoopConfiguration
    def walk(p: Path, rel: String): Unit = {
      val fs = p.getFileSystem(hc)
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).sortBy(_.getPath.getName).foreach(st =>
          walk(st.getPath, s"$rel/${st.getPath.getName}"))
      else {
        val st = fs.getFileStatus(p)
        md.update(s"$rel:${st.getLen}:${st.getModificationTime}\n"
          .getBytes("UTF-8"))
      }
    }
    paths.foreach(p => walk(new Path(p), p))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  val all: Seq[Q] = Seq(

    // Point GET by row key (hbase.clj:72-74,102-103) → equality filter on
    // key column + projection; both pushed to the parquet scan.
    Q("q01_point_get",
      Some("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice " +
        "FROM orders WHERE o_orderkey = 7"),
      (s, d) => Tables.load(s, d, "orders")
        .filter(col("o_orderkey") === 7)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))),

    // Range SCAN with start/stop row (prefix scan, hbase.clj:188-192) →
    // range predicate on a sorted column; parquet row-group min/max skip.
    Q("q02_range_scan",
      Some("SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate " +
        "FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1995-03-01' " +
        "AND l_shipdate < TIMESTAMP '1995-04-01'"),
      (s, d) => Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-04-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_shipdate"))),

    // Full-table SCAN + column projection pushdown (hbase.clj:285-289).
    Q("q03_scan_project",
      Some("SELECT event_id, event_type, user_id FROM events"),
      (s, d) => Tables.load(s, d, "events")
        .select(col("event_id"), col("event_type"), col("user_id"))),

    // Storage-pushed LESS_OR_EQUAL predicate (RowFilter at hbase.clj:190).
    Q("q04_filter_le",
      Some("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
        "WHERE l_quantity <= 5"),
      (s, d) => Tables.load(s, d, "lineitem")
        .filter(col("l_quantity") <= 5)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),

    // Filter by string prefix (startsWith at hbase.clj:320-321).
    Q("q05_prefix_filter",
      Some("SELECT p_partkey, p_name, p_brand FROM part " +
        "WHERE p_name LIKE 'small%'"),
      (s, d) => Tables.load(s, d, "part")
        .filter(col("p_name").startsWith("small"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"))),

    // Hash aggregation with partial/final (map-side combine) — TPC-H Q1
    // shape; covers the reduce-merge + counter-sum patterns
    // (hbase.clj:163-171,194).
    Q("q06_agg_basic",
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag, l_linestatus"""
        .stripMargin.replaceAll("\\s+", " ")),
      (s, d) => Tables.load(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("n_rows"))),

    // As-of resolution: newest entry per key ≤ bound (find-index,
    // hbase.clj:184-198) → window row_number over desc order. Batch form
    // of the reference's per-coordinate argmax.
    Q("q07_asof_argmax",
      Some("SELECT o_custkey, o_orderkey AS last_orderkey, " +
        "o_orderdate AS last_orderdate FROM orders QUALIFY " +
        "row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate DESC, o_orderkey DESC) = 1"),
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        Tables.load(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey").as("last_orderkey"),
            col("o_orderdate").as("last_orderdate"))
      }),

    // Running aggregate over an ordered window (analytic layer; absent in
    // reference, SURVEY §2.3 "window functions").
    Q("q08_window_running",
      Some("SELECT l_suppkey, l_orderkey, l_linenumber, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (" +
        "PARTITION BY l_suppkey " +
        "ORDER BY l_shipdate, l_orderkey, l_linenumber " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) " +
        "AS running_qty FROM lineitem"),
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.load(s, d, "lineitem")
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            sum(dec(col("l_quantity"))).over(w).cast("double")
              .as("running_qty"))
      }),

    // Sort + reverse + limit (versions listing, hbase.clj:287-297) →
    // Spark TakeOrderedAndProject (top-k, no full sort shuffle).
    Q("q09_topk",
      Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
      (s, d) => Tables.load(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // DISTINCT (list-datasets, hbase.clj:330).
    Q("q10_distinct",
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"),
      (s, d) => Tables.load(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()),

    // Star join with broadcast dims (the set-oriented rewrite of the
    // reference's per-coordinate N+1 lookups, SURVEY §3.1): fact table
    // shuffles once; dims broadcast — no shuffle on their side.
    Q("q11_join_broadcast",
      Some("SELECT r_name, COUNT(*) AS n_orders, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS tot " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"),
      (s, d) => {
        val o = Tables.load(s, d, "orders")
          .select(col("o_custkey"), col("o_totalprice"))
        val c = Tables.load(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val n = Tables.load(s, d, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))
        val r = Tables.load(s, d, "region")
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("tot"))
      }),

    // Large fact-fact equi-join (shuffle hash / sort-merge, AQE-planned).
    Q("q12_join_large",
      Some("SELECT o_orderpriority, COUNT(*) AS n_items, " +
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority"),
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        val o = Tables.load(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("revenue"))
      }),

    // The co-located join: both facts pre-bucketed on the join key
    // into the same bucket count, so the sort-merge join consumes the
    // bucket layout directly — ZERO shuffle on the join keys (the only
    // exchange left is the final small group-by). At 100 TB this is
    // THE lever for repeated fact-fact joins: pay the partitioning
    // once at ingest, never again per query. The merge hint pins the
    // plan against broadcast demotion so the property is stable (and
    // PlanAuditSpec gates it). Results are layout-independent, hence
    // the plain-parquet DuckDB oracle.
    Q("q31_bucketed_join",
      Some("SELECT o_orderstatus, COUNT(*) AS n_items, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderstatus"),
      (s, d) => {
        // the ingest-time bucketing pass, paid ONCE: the bucketed
        // copies are reused while the SOURCE files are unchanged — a
        // (path, length, mtime) fingerprint over both source dirs
        // guards staleness, so a regenerated sf dir still triggers a
        // rewrite, but repeated queries (the production shape: bucket
        // at ingest, join forever) skip straight to the join
        import org.apache.hadoop.fs.Path
        val tag = java.lang.Integer.toHexString(d.hashCode)
        val liT = s"graft_bkt_li_$tag"; val oT = s"graft_bkt_o_$tag"
        // the bucketed copies live on whatever shared FS the conf
        // points at (a cluster sets spark.graft.bucketcache.dir to a
        // durable path; the default suits local bench runs)
        val base = s.conf.getOption("spark.graft.bucketcache.dir")
          .getOrElse("/tmp") + s"/graft_bkt_$tag"
        val fs = new Path(base).getFileSystem(
          s.sparkContext.hadoopConfiguration)
        val fp = fingerprint(s,
          Seq(s"$d/lineitem.parquet", s"$d/orders.parquet"))
        val marker = new Path(s"$base/fp_$fp")
        val reusable = fs.exists(marker) &&
          fs.exists(new Path(s"$base/li")) &&
          fs.exists(new Path(s"$base/o"))
        def ensure(tbl: String, key: String, sub: String,
            df: => DataFrame): Unit = {
          if (!reusable) {
            s.sql(s"DROP TABLE IF EXISTS $tbl")
            df.write.mode("overwrite").option("path", s"$base/$sub")
              .bucketBy(8, key).sortBy(key).saveAsTable(tbl)
          } else if (!s.catalog.tableExists(tbl)) {
            // fresh JVM over a valid bucketed copy: re-register the
            // external bucketed table instead of rewriting the data
            s.sql(s"CREATE TABLE $tbl (${df.schema.toDDL}) " +
              s"USING PARQUET CLUSTERED BY ($key) SORTED BY ($key) " +
              s"INTO 8 BUCKETS LOCATION '$base/$sub'")
          }
        }
        ensure(liT, "l_orderkey", "li", Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_quantity")))
        ensure(oT, "o_orderkey", "o", Tables.load(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus")))
        if (!reusable) {
          if (fs.exists(new Path(base)))
            fs.listStatus(new Path(base))
              .filter(_.getPath.getName.startsWith("fp_"))
              .foreach(st => fs.delete(st.getPath, false))
          fs.create(marker, true).close()
        }
        s.table(liT).hint("merge")
          .join(s.table(oT), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_items"),
            dsum(col("l_quantity")).as("total_qty"))
      }),

    // Batch range join (clicks within 1 h before each purchase),
    // bucketed: both sides key on (user_id, hour-bucket), the purchase
    // side exploding to the two buckets its window can span, exact
    // bound applied as a residual. The naive single-key form is an
    // equi join on user_id alone — correct, but every heavy user's
    // clicks×purchases collide in ONE task; adding the time bucket to
    // the join key shards those hot users across time, which is the
    // difference between a skew stall and a balanced shuffle at
    // 100 TB. (st07 is the same semantics as a stream-stream join.)
    Q("q32_range_bucket_join",
      Some("SELECT p.user_id, p.event_id AS purchase_id, " +
        "count(*) AS n_clicks FROM events p JOIN events c " +
        "ON c.user_id = p.user_id AND p.event_type = 'purchase' " +
        "AND c.event_type = 'click' " +
        "AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts " +
        "GROUP BY 1, 2"),
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_ts"),
            expr("unix_micros(ts) div 3600000000").as("bkt"))
        val purch = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("p_ts"))
          .withColumn("pb", expr("unix_micros(p_ts) div 3600000000"))
          .withColumn("bkt", explode(array(col("pb") - 1, col("pb"))))
        purch.join(clicks, Seq("user_id", "bkt"))
          .where(col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts"))
          .groupBy(col("user_id"), col("purchase_id"))
          .agg(count(lit(1)).as("n_clicks"))
      }),

    // Semi join (EXISTS) — content-addressed dedup check shape
    // (newChunks ⋉ existing, SURVEY §4 "content-addressed dedup").
    Q("q13_semi_join",
      Some("SELECT c_custkey, c_name FROM customer c WHERE EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_orderstatus = 'F')"),
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        val o = Tables.load(s, d, "orders")
          .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
      }),

    // Anti join (NOT EXISTS) — left-anti dedup before chunk write
    // (SURVEY §4: newChunks.join(existing, "hash", "left_anti")).
    Q("q14_anti_join",
      Some("SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_orderpriority = 'URGENT')"),
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        val o = Tables.load(s, d, "orders")
          .filter(col("o_orderpriority") === "URGENT").select(col("o_custkey"))
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
      }),

    // Set operations: INTERSECT / EXCEPT (reference has only distinct;
    // additive per SURVEY §2.3 "set ops").
    Q("q15_setops",
      Some("SELECT 'both' AS tag, k AS custkey FROM " +
        "(SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O' " +
        "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') " +
        "UNION ALL SELECT 'only_open' AS tag, k AS custkey FROM " +
        "(SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O' " +
        "EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')"),
      (s, d) => {
        val o = Tables.load(s, d, "orders")
        def ks(st: String) = o.filter(col("o_orderstatus") === st)
          .select(col("o_custkey").as("custkey"))
        val both = ks("O").intersect(ks("F"))
          .select(lit("both").as("tag"), col("custkey"))
        val only = ks("O").except(ks("F"))
          .select(lit("only_open").as("tag"), col("custkey"))
        both.unionAll(only)
      }),

    // Scalar string functions (split/join/replace/format/startsWith —
    // hbase.clj:49,68,176-182,323-326,356-359).
    Q("q16_string_funcs",
      Some("SELECT p_partkey, upper(p_brand) AS brand_u, " +
        "split_part(p_name, ' ', 1) AS first_word, " +
        "replace(p_name, ' ', '_') AS snake, " +
        "length(p_name) AS name_len, " +
        "concat_ws('|', p_brand, p_type) AS bt, " +
        "lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4, " +
        "substring(p_type, 1, 3) AS t3 FROM part"),
      (s, d) => Tables.load(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
        lpad(col("p_size").cast("string"), 4, "0").as("size4"),
        substring(col("p_type"), 1, 3).as("t3"))),

    // Timestamp functions incl. epoch-millis decode (Joda DateTime from
    // version-id millis, hbase.clj:293 → unix_millis/timestamp_millis).
    Q("q17_date_funcs",
      Some("SELECT o_orderkey, year(o_orderdate) AS y, " +
        "month(o_orderdate) AS m, day(o_orderdate) AS dom, " +
        "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, " +
        "epoch_ms(o_orderdate) AS ems FROM orders"),
      (s, d) => Tables.load(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).as("mon"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ems"))),

    // Conditional aggregation + exact distinct count.
    Q("q18_conditional_agg",
      Some("SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders, " +
        "CAST(SUM(CAST(CASE WHEN l_discount > 0.05 THEN l_quantity ELSE 0 END " +
        "AS DECIMAL(18,4))) AS DOUBLE) AS disc_qty, " +
        "COUNT(CASE WHEN l_extendedprice < 1000 THEN 1 END) AS n_cheap " +
        "FROM lineitem GROUP BY l_returnflag"),
      (s, d) => Tables.load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          dsum(when(col("l_discount") > 0.05, col("l_quantity")).otherwise(0))
            .as("disc_qty"),
          count(when(col("l_extendedprice") < 1000, 1)).as("n_cheap"))),

    // ROLLUP grouping sets over a star join.
    Q("q19_rollup",
      Some("SELECT n_name, COUNT(*) AS n_orders, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS tot " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY ROLLUP(n_name)"),
      (s, d) => {
        val o = Tables.load(s, d, "orders")
          .select(col("o_custkey"), col("o_totalprice"))
        val c = Tables.load(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val n = Tables.load(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .rollup(col("n_name"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("tot"))
      }),

    // CUBE grouping sets.
    Q("q20_cube",
      Some("SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"),
      (s, d) => Tables.load(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty")))
  )
}
