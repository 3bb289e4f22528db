package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** SURVEY §2 operator inventory, part 1 (scan/filter/agg/join family).
  *
  * Determinism contract with the DuckDB oracle: every floating-point
  * aggregate is computed over `DECIMAL(12,2)`-cast inputs (exact,
  * order-independent in both engines) and cast to DOUBLE only at the very
  * end; every query ends in a total ORDER BY. DuckDB `SUM(int)` widens to
  * INT128, so integer sums are `CAST(... AS BIGINT)` on the oracle side to
  * match Spark's long.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact 2-decimal fixed-point view of a double column. */
  private def d2(c: Column): Column = c.cast("decimal(12,2)")

  val defs: Seq[QueryDef] = Seq(

    // ---- q01: full-scan filter + hash aggregate (TPC-H Q1 shape) --------
    QueryDef(
      "q01_agg_pricing",
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(12,2)) * CAST(1 + CAST(l_tax AS DECIMAL(12,2)) AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_price,
        CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val disc = (lit(1) - d2(col("l_discount"))).cast("decimal(12,2)")
        val taxf = (lit(1) + d2(col("l_tax"))).cast("decimal(12,2)")
        li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(d2(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(d2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(d2(col("l_extendedprice")) * disc).cast("double").as("sum_disc_price"),
            sum(d2(col("l_extendedprice")) * disc * taxf).cast("double").as("sum_charge"),
            (sum(d2(col("l_quantity"))).cast("double") / count(lit(1))).cast("double").as("avg_qty"),
            (sum(d2(col("l_extendedprice"))).cast("double") / count(lit(1))).cast("double").as("avg_price"),
            (sum(d2(col("l_discount"))).cast("double") / count(lit(1))).cast("double").as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      }),

    // ---- q02: filter + projection + top-k (TakeOrderedAndProject) -------
    QueryDef(
      "q02_filter_topk",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderstatus = 'O'
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
      (s, dir) =>
        t(s, dir, "orders")
          .filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100)),

    // ---- q03: 3-way join + agg + top-k (TPC-H Q3 shape) -----------------
    QueryDef(
      "q03_join_inner",
      Some("""SELECT l_orderkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        o_orderdate
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        val disc = (lit(1) - d2(col("l_discount"))).cast("decimal(12,2)")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum(d2(col("l_extendedprice")) * disc).cast("double").as("revenue"))
          .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      }),

    // ---- q04: EXISTS decorrelated to left-semi (TPC-H Q4 shape) ---------
    QueryDef(
      "q04_exists_semi",
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 48)
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem").filter(col("l_quantity") > 48)
        o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      }),

    // ---- q05: left outer join, null-generating side aggregated ----------
    QueryDef(
      "q05_join_left",
      Some("""SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_cnt,
        CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
        ORDER BY c_custkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(
            count(col("o_orderkey")).as("order_cnt"),
            sum(d2(coalesce(col("o_totalprice"), lit(0)))).cast("double").as("total_spent"))
          .orderBy(col("c_custkey"))
      }),

    // ---- q06: right outer join ------------------------------------------
    QueryDef(
      "q06_join_right",
      Some("""SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS order_cnt
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_mktsegment
        ORDER BY c_custkey"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        o.join(c, o("o_custkey") === c("c_custkey"), "right")
          .groupBy(col("c_custkey"), col("c_mktsegment"))
          .agg(count(col("o_orderkey")).as("order_cnt"))
          .orderBy(col("c_custkey"))
      }),

    // ---- q07: full outer join of two aggregates -------------------------
    QueryDef(
      "q07_join_full",
      Some("""WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS cust_cnt FROM customer GROUP BY c_nationkey),
        sn AS (SELECT s_nationkey AS nk, COUNT(*) AS supp_cnt FROM supplier GROUP BY s_nationkey)
        SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
               COALESCE(cust_cnt, 0) AS cust_cnt, COALESCE(supp_cnt, 0) AS supp_cnt
        FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
        ORDER BY nationkey"""),
      (s, dir) => {
        val cn = t(s, dir, "customer").groupBy(col("c_nationkey").as("cnk"))
          .agg(count(lit(1)).as("cust_cnt"))
        val sn = t(s, dir, "supplier").groupBy(col("s_nationkey").as("snk"))
          .agg(count(lit(1)).as("supp_cnt"))
        cn.join(sn, cn("cnk") === sn("snk"), "full_outer")
          .select(
            coalesce(col("cnk"), col("snk")).as("nationkey"),
            coalesce(col("cust_cnt"), lit(0L)).as("cust_cnt"),
            coalesce(col("supp_cnt"), lit(0L)).as("supp_cnt"))
          .orderBy(col("nationkey"))
      }),

    // ---- q08: left-semi join (IN-subquery form) -------------------------
    QueryDef(
      "q08_join_left_semi",
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        ORDER BY c_custkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      }),

    // ---- q09: left-anti join (NOT EXISTS) -------------------------------
    QueryDef(
      "q09_join_left_anti",
      // the price floor keeps the fixture NON-vacuous: every customer
      // has some order at sf0.01+, but a measurable set has none this
      // large — an anti join that dropped nothing would fail the oracle
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        ORDER BY c_custkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_totalprice") > 250000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy(col("c_custkey"))
      }),

    // ---- q10: right-semi join (rows of the RIGHT side kept) -------------
    // NutQL `lineitem RIGHT SEMI JOIN orders` == orders with >=1 lineitem;
    // lowered by swapping sides into Spark's left_semi.
    QueryDef(
      "q10_join_right_semi",
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
        ORDER BY o_orderkey"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem").filter(col("l_discount") > 0.05)
        o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      }),

    // ---- q11: right-anti join (RIGHT side rows with no match) -----------
    // NutQL `orders[status='P'] RIGHT ANTI JOIN customer` == customers with
    // no 'P'-status order; lowered by swapping sides into left_anti.
    QueryDef(
      "q11_join_right_anti",
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        ORDER BY c_custkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      }),

    // ---- q12: AS-OF join (latest view at-or-before each click) ----------
    // Scale-friendly lowering: instead of a range join (N×M blowup), union
    // both sides and take last-non-null over a per-user ts-ordered window —
    // one shuffle on user_id, linear in input.
    QueryDef(
      "q12_join_asof",
      Some("""WITH b AS (SELECT user_id, ts, MAX(value) AS v_value
                FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
        a AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click')
        SELECT a.event_id, a.user_id, a.ts, a.value AS click_value, b.v_value AS asof_value
        FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.ts >= b.ts
        ORDER BY a.event_id"""),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val b = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("v_value"))
          .select(col("user_id"), col("ts"), lit(0).as("tag"),
            lit(null).cast("long").as("event_id"), col("v_value"),
            lit(null).cast("double").as("click_value"))
        val a = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), lit(1).as("tag"),
            col("event_id"), lit(null).cast("double").as("v_value"),
            col("value").as("click_value"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("tag").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        b.unionByName(a)
          .withColumn("asof_value", last(col("v_value"), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("event_id"), col("user_id"), col("ts"), col("click_value"), col("asof_value"))
          .orderBy(col("event_id"))
      }),

    // ---- q13: theta (non-equi) join -------------------------------------
    QueryDef(
      "q13_join_theta",
      Some("""SELECT c_nationkey AS nationkey, COUNT(*) AS richer_pairs
        FROM customer JOIN supplier
          ON c_nationkey = s_nationkey AND s_acctbal > c_acctbal
        GROUP BY c_nationkey ORDER BY nationkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val sp = t(s, dir, "supplier")
        // no broadcast hint: supplier grows with the scale factor, so let
        // AQE/autoBroadcastJoinThreshold decide (a forced broadcast OOMs at
        // 100×); the equi-key on nationkey keeps this a hash/SMJ join
        c.join(sp,
            c("c_nationkey") === sp("s_nationkey") && sp("s_acctbal") > c("c_acctbal"))
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("richer_pairs"))
          .orderBy(col("nationkey"))
      }),

    // ---- q14: chained multi-join over the star schema (TPC-H Q5 shape) --
    QueryDef(
      "q14_multi_join",
      Some("""SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_name ORDER BY revenue DESC, n_name"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        val sp = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        val disc = (lit(1) - d2(col("l_discount"))).cast("decimal(12,2)")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          // supplier is sf-scaled — no broadcast hint (AQE decides); nation
          // and region are fixed 25/5 rows, so those hints are safe
          .join(sp,
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(d2(col("l_extendedprice")) * disc).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name").asc)
      }),

    // ---- q15: CTE + scalar subquery over it (TPC-H Q15 shape) -----------
    QueryDef(
      "q15_cte_top_supplier",
      Some("""WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue
          FROM lineitem GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey"""),
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val sp = t(s, dir, "supplier")
        val disc = (lit(1) - d2(col("l_discount"))).cast("decimal(12,2)")
        // persist the CTE: it feeds both the join and the MAX scalar —
        // without it, ReuseExchange can miss under AQE re-optimization and
        // lineitem gets scanned + aggregated twice (7.8s in BENCH_r01)
        val revenue = li.groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(d2(col("l_extendedprice")) * disc).cast("double").as("total_revenue"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val maxRev = revenue.agg(max(col("total_revenue")).as("max_rev"))
        sp.join(revenue, col("s_suppkey") === col("supplier_no"))
          .join(broadcast(maxRev), col("total_revenue") === col("max_rev"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy(col("s_suppkey"))
      }),

    // ---- q16-q19: set operators -----------------------------------------
    QueryDef(
      "q16_union_all",
      Some("""SELECT name FROM (
          SELECT c_name AS name FROM customer
          UNION ALL SELECT s_name AS name FROM supplier) u
        ORDER BY name"""),
      (s, dir) =>
        t(s, dir, "customer").select(col("c_name").as("name"))
          .unionAll(t(s, dir, "supplier").select(col("s_name").as("name")))
          .orderBy(col("name"))),

    QueryDef(
      "q17_union_distinct",
      Some("""SELECT nk FROM (
          SELECT c_nationkey AS nk FROM customer
          UNION SELECT s_nationkey AS nk FROM supplier) u
        ORDER BY nk"""),
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("nk"))
          .union(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
          .distinct()
          .orderBy(col("nk"))),

    QueryDef(
      "q18_intersect",
      Some("""SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
        INTERSECT SELECT s_nationkey AS nk FROM supplier
        ORDER BY nk"""),
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_acctbal") > 9000)
          .select(col("c_nationkey").as("nk"))
          .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
          .orderBy(col("nk"))),

    QueryDef(
      "q19_except",
      // order-placing custkeys minus positive-balance custkeys — a
      // NON-empty difference at every SF (nationkey EXCEPT nationkey was
      // vacuously empty: suppliers span all 25 nations)
      Some("""SELECT o_custkey AS k FROM orders
        EXCEPT SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
        ORDER BY k"""),
      (s, dir) =>
        t(s, dir, "orders").select(col("o_custkey").as("k"))
          .except(t(s, dir, "customer").filter(col("c_acctbal") > 0)
            .select(col("c_custkey").as("k")))
          .orderBy(col("k"))),

    // ---- q20: DISTINCT ---------------------------------------------------
    QueryDef(
      "q20_distinct",
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        ORDER BY l_returnflag, l_linestatus"""),
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"))
          .distinct()
          .orderBy(col("l_returnflag"), col("l_linestatus")))
  )
}
