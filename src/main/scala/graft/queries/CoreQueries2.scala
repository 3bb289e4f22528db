package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** SURVEY §2 operator inventory, part 2 (DISTINCT ON, HAVING, limit
  * variants, expressions, subqueries, functions). Same determinism
  * contract as [[CoreQueries]].
  */
object CoreQueries2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def d2(c: Column): Column = c.cast("decimal(12,2)")

  val defs: Seq[QueryDef] = Seq(

    // ---- q21: DISTINCT ON (keep-first by sort key) ----------------------
    QueryDef(
      "q21_distinct_on",
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders) x
        WHERE rn = 1 ORDER BY o_custkey"""),
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
          .orderBy(col("o_custkey"))
      }),

    // ---- q22: GROUP BY + HAVING -----------------------------------------
    QueryDef(
      "q22_having",
      Some("""SELECT n_name, COUNT(*) AS cust_cnt,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal_sum
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name HAVING COUNT(*) > 30
        ORDER BY n_name"""),
      (s, dir) =>
        t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("cust_cnt"), sum(d2(col("c_acctbal"))).cast("double").as("bal_sum"))
          .filter(col("cust_cnt") > 30)
          .orderBy(col("n_name"))),

    // ---- q23: LIMIT with OFFSET -----------------------------------------
    QueryDef(
      "q23_limit_offset",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 50 OFFSET 100"""),
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
          .offset(100)
          .limit(50)),

    // ---- q24: LIMIT n WITH TIES (rank() <= n over the sort key) ---------
    QueryDef(
      "q24_limit_with_ties",
      Some("""SELECT p_partkey, p_size FROM (
          SELECT p_partkey, p_size, RANK() OVER (ORDER BY p_size DESC) AS r
          FROM part) x
        WHERE r <= 10 ORDER BY p_size DESC, p_partkey"""),
      (s, dir) => {
        // Scale-safe WITH TIES: rank() over an unpartitioned window would
        // shuffle the whole table to one task. Instead compute the k-th
        // largest sort-key value with a TakeOrderedAndProject (limit k),
        // broadcast that 1-row threshold, and keep rows >= it — identical
        // semantics (rank <= k ⟺ value >= k-th value), no global window.
        val part = t(s, dir, "part")
        val thr = part.select(col("p_size")).orderBy(col("p_size").desc).limit(10)
          .agg(min(col("p_size")).as("thr"))
        part.join(broadcast(thr), col("p_size") >= col("thr"))
          .select(col("p_partkey"), col("p_size"))
          .orderBy(col("p_size").desc, col("p_partkey"))
      }),

    // ---- q25: searched CASE + simple CASE (TPC-H Q12 shape) -------------
    QueryDef(
      "q25_case_when",
      Some("""SELECT
          CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished' ELSE 'other' END AS status_label,
          CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_cnt,
          CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS low_cnt,
          COUNT(*) AS total_cnt
        FROM orders GROUP BY status_label ORDER BY status_label"""),
      (s, dir) => {
        val statusLabel = when(col("o_orderstatus") === "O", "open")
          .when(col("o_orderstatus") === "F", "finished")
          .otherwise("other").as("status_label")
        val isHigh = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
        t(s, dir, "orders")
          .select(statusLabel, col("o_orderpriority"))
          .groupBy(col("status_label"))
          .agg(
            sum(when(isHigh, 1).otherwise(0)).cast("long").as("high_cnt"),
            sum(when(!isHigh, 1).otherwise(0)).cast("long").as("low_cnt"),
            count(lit(1)).as("total_cnt"))
          .orderBy(col("status_label"))
      }),

    // ---- q26: uncorrelated scalar subquery ------------------------------
    QueryDef(
      "q26_scalar_subquery",
      // 1.5×avg, not 2×avg: totalprice is uniform-ish below 2×avg in the
      // fixture, so the old threshold matched ZERO rows — a scalar
      // lowering that always compared against NULL would have passed
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 1.5 * (
          SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DOUBLE)
          FROM orders)
        ORDER BY o_orderkey"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val avgDf = o.agg(
          (sum(d2(col("o_totalprice"))).cast("double") / count(lit(1))).cast("double").as("avg_price"))
        o.join(broadcast(avgDf))
          .filter(col("o_totalprice") > lit(1.5) * col("avg_price"))
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      }),

    // ---- q27: IN (value list) -------------------------------------------
    QueryDef(
      "q27_in_list",
      Some("""SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, dir) =>
        t(s, dir, "orders")
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("o_orderpriority"))),

    // ---- q28: IN (subquery) → left-semi ---------------------------------
    QueryDef(
      "q28_in_subquery",
      Some("""SELECT p_partkey, p_name FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        ORDER BY p_partkey"""),
      (s, dir) => {
        val p = t(s, dir, "part")
        val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
        p.join(li, p("p_partkey") === li("l_partkey"), "left_semi")
          .select(col("p_partkey"), col("p_name"))
          .orderBy(col("p_partkey"))
      }),

    // ---- q29: NOT IN (subquery) → left-anti (keys are non-null) ---------
    QueryDef(
      "q29_not_in_subquery",
      // the nationkey bound keeps the excluded set a strict subset of the
      // nations at every SF (negative-balance customers alone span all 25
      // nations at sf0.1, which made the old result vacuously empty)
      Some("""SELECT s_suppkey, s_name FROM supplier
        WHERE s_nationkey NOT IN (SELECT c_nationkey FROM customer
                                  WHERE c_acctbal < 0 AND c_nationkey < 7)
        ORDER BY s_suppkey"""),
      (s, dir) => {
        val sp = t(s, dir, "supplier")
        val c = t(s, dir, "customer")
          .filter(col("c_acctbal") < 0 && col("c_nationkey") < 7)
        sp.join(c, sp("s_nationkey") === c("c_nationkey"), "left_anti")
          .select(col("s_suppkey"), col("s_name"))
          .orderBy(col("s_suppkey"))
      }),

    // ---- q30: BETWEEN / LIKE / ILIKE ------------------------------------
    QueryDef(
      "q30_between_like",
      Some("""SELECT p_partkey, p_name, p_type, p_retailprice FROM part
        WHERE p_retailprice BETWEEN 500 AND 1000
          AND (p_type LIKE 'S%' OR p_type ILIKE '%econ%')
        ORDER BY p_partkey"""),
      (s, dir) =>
        // literal prefix/infix patterns: startsWith/contains avoid the
        // regex engine entirely (same semantics as LIKE 'S%' / ILIKE '%econ%')
        t(s, dir, "part")
          .filter(col("p_retailprice").between(500, 1000)
            && (col("p_type").startsWith("S") || lower(col("p_type")).contains("econ")))
          .select(col("p_partkey"), col("p_name"), col("p_type"), col("p_retailprice"))
          .orderBy(col("p_partkey"))),

    // ---- q31: bitwise operators (& | ^ << >> ~) -------------------------
    // NutQL precedence: bitwise binds tighter than comparison. DuckDB `^`
    // is power, so the oracle uses xor().
    QueryDef(
      "q31_bitops",
      Some("""SELECT p_partkey,
          CAST(p_size & 15 AS BIGINT) AS b_and,
          CAST(p_size | 64 AS BIGINT) AS b_or,
          CAST(xor(p_size, 5) AS BIGINT) AS b_xor,
          CAST(p_size << 2 AS BIGINT) AS b_shl,
          CAST(p_size >> 1 AS BIGINT) AS b_shr,
          CAST(~p_size AS BIGINT) AS b_not
        FROM part ORDER BY p_partkey"""),
      (s, dir) =>
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            col("p_size").bitwiseAND(15).cast("long").as("b_and"),
            col("p_size").bitwiseOR(64).cast("long").as("b_or"),
            col("p_size").bitwiseXOR(5).cast("long").as("b_xor"),
            shiftleft(col("p_size"), 2).cast("long").as("b_shl"),
            shiftright(col("p_size"), 1).cast("long").as("b_shr"),
            bitwise_not(col("p_size")).cast("long").as("b_not"))
          .orderBy(col("p_partkey"))),

    // ---- q32: string functions (substring 1-based, + as concat, …) ------
    QueryDef(
      "q32_strings",
      Some("""SELECT c_custkey,
          substring(c_name, 10, 9) AS id_part,
          upper(c_mktsegment) AS seg_up,
          lower(c_name) AS name_lo,
          CAST(length(c_name) AS BIGINT) AS name_len,
          c_name || '|' || c_mktsegment AS tagged,
          replace(c_name, 'Customer#', 'C') AS short_name
        FROM customer ORDER BY c_custkey"""),
      (s, dir) =>
        t(s, dir, "customer")
          .select(
            col("c_custkey"),
            substring(col("c_name"), 10, 9).as("id_part"),
            upper(col("c_mktsegment")).as("seg_up"),
            lower(col("c_name")).as("name_lo"),
            length(col("c_name")).cast("long").as("name_len"),
            concat(col("c_name"), lit("|"), col("c_mktsegment")).as("tagged"),
            // literal replace (not regexp_replace) — keeps Spark and the
            // DuckDB oracle's replace() identical even if the pattern ever
            // contains a regex metacharacter
            replace(col("c_name"), lit("Customer#"), lit("C")).as("short_name"))
          .orderBy(col("c_custkey"))),

    // ---- q33: date functions + interval arithmetic ----------------------
    QueryDef(
      "q33_dates",
      Some("""SELECT o_orderkey,
          CAST(year(o_orderdate) AS BIGINT) AS yr,
          CAST(month(o_orderdate) AS BIGINT) AS mth,
          CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS yyyymmdd,
          o_orderdate + INTERVAL 30 DAY AS due_date,
          CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS ship_days
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey < 500 AND l_linenumber = 1
        ORDER BY o_orderkey"""),
      (s, dir) => {
        val o = t(s, dir, "orders").filter(col("o_orderkey") < 500)
        val li = t(s, dir, "lineitem").filter(col("l_linenumber") === 1)
        o.join(li, col("o_orderkey") === col("l_orderkey"))
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mth"),
            date_format(col("o_orderdate"), "yyyyMMdd").cast("long").as("yyyymmdd"),
            (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("due_date"),
            datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("ship_days"))
          .orderBy(col("o_orderkey"))
      }),

    // ---- q34: IF-THEN-ELSE sugar (FnName::If) ---------------------------
    QueryDef(
      "q34_if_else",
      Some("""SELECT CASE WHEN o_totalprice > 200000 THEN 'big'
                   WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
          COUNT(*) AS cnt
        FROM orders GROUP BY bucket ORDER BY bucket"""),
      (s, dir) =>
        t(s, dir, "orders")
          .select(
            when(col("o_totalprice") > 200000, "big")
              .when(col("o_totalprice") > 100000, "mid")
              .otherwise("small").as("bucket"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("bucket"))),

    // ---- q35: IS NULL / IS NOT NULL on outer-join output ----------------
    QueryDef(
      "q35_is_null",
      Some("""SELECT c_mktsegment,
          CAST(SUM(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS no_order_cnt,
          CAST(SUM(CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS has_order_cnt
        FROM customer c LEFT JOIN
          (SELECT DISTINCT o_custkey FROM orders) o ON c.c_custkey = o.o_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").select(col("o_custkey")).distinct()
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_mktsegment"))
          .agg(
            sum(when(col("o_custkey").isNull, 1).otherwise(0)).cast("long").as("no_order_cnt"),
            sum(when(col("o_custkey").isNotNull, 1).otherwise(0)).cast("long").as("has_order_cnt"))
          .orderBy(col("c_mktsegment"))
      }),

    // ---- q36: countUnique (exact COUNT DISTINCT) ------------------------
    QueryDef(
      "q36_count_distinct",
      Some("""SELECT l_returnflag,
          COUNT(DISTINCT l_suppkey) AS uniq_supp,
          COUNT(DISTINCT l_partkey) AS uniq_part,
          COUNT(*) AS cnt
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_suppkey")).as("uniq_supp"),
            countDistinct(col("l_partkey")).as("uniq_part"),
            count(lit(1)).as("cnt"))
          .orderBy(col("l_returnflag"))),

    // ---- q37: array access (element_at / size) --------------------------
    QueryDef(
      "q37_array_ops",
      Some("""SELECT vec_id, label,
          CAST(embedding[1] AS DOUBLE) AS el1,
          CAST(embedding[64] AS DOUBLE) AS el64,
          CAST(len(embedding) AS BIGINT) AS dim
        FROM embeddings WHERE vec_id < 200 ORDER BY vec_id"""),
      (s, dir) =>
        t(s, dir, "embeddings")
          .filter(col("vec_id") < 200)
          .select(
            col("vec_id"), col("label"),
            element_at(col("embedding"), 1).cast("double").as("el1"),
            element_at(col("embedding"), 64).cast("double").as("el64"),
            size(col("embedding")).cast("long").as("dim"))
          .orderBy(col("vec_id"))),

    // ---- q38: GROUP BY expression ---------------------------------------
    QueryDef(
      "q38_group_by_expr",
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, COUNT(*) AS cnt,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders GROUP BY yr ORDER BY yr"""),
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
          .agg(count(lit(1)).as("cnt"), sum(d2(col("o_totalprice"))).cast("double").as("total"))
          .orderBy(col("yr"))),

    // ---- q39: multi-key mixed-direction ORDER BY ------------------------
    QueryDef(
      "q39_order_multi",
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
        ORDER BY l_returnflag ASC, l_quantity DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 100"""),
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"))
          .orderBy(col("l_returnflag").asc, col("l_quantity").desc,
            col("l_orderkey").asc, col("l_linenumber").asc)
          .limit(100)),

    // ---- q40: min/max/avg over numbers and strings ----------------------
    QueryDef(
      "q40_agg_minmax",
      Some("""SELECT c_mktsegment,
          min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
          CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_bal,
          min(c_name) AS first_name, max(c_name) AS last_name,
          COUNT(*) AS cnt
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, dir) =>
        t(s, dir, "customer")
          .groupBy(col("c_mktsegment"))
          .agg(
            min(col("c_acctbal")).as("min_bal"),
            max(col("c_acctbal")).as("max_bal"),
            (sum(d2(col("c_acctbal"))).cast("double") / count(lit(1))).cast("double").as("avg_bal"),
            min(col("c_name")).as("first_name"),
            max(col("c_name")).as("last_name"),
            count(lit(1)).as("cnt"))
          .orderBy(col("c_mktsegment")))
  )
}
