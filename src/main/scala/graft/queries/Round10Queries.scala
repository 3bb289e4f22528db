package graft.queries

/** Round-10 additions: the two r9 missing-list lifts in the grandparent
  * FLATTEN path (VERDICT r9 tasks #6/#8).
  *
  *  - WITH-bearing plain bodies now flatten (qe190): the body's CTE list
  *    binds uncorrelated first, exactly as in every other subquery-body
  *    position.
  *  - Nested IN with DISTINCT ON flattens under pure EQUALITY
  *    correlation (qe188/qe189): the kept row within a
  *    (correlation-key, ON-key) partition is the same for every binding
  *    selecting that partition, so one keep-first window precomputes the
  *    kept rows before the flatten join. Theta correlation keeps a clean
  *    error (the kept row would be binding-dependent).
  *
  * Reference grammar composes these freely:
  * /root/reference/src/parser/mod.rs:349-360 (DISTINCT ON in any body),
  * :81-105 (WITH in any body position).
  */
object Round10Queries {

  private def engineSql(name: String, oracle: String, nutql: String): QueryDef =
    QueryDef(name, Some(oracle), (s, dir) => Engines.get(s, dir).execute(nutql))

  val defs: Seq[QueryDef] = Seq(

    // ---- depth-3: grandparent-correlated nested IN with DISTINCT ON ----
    // the innermost IN body references o_orderkey THREE scopes up; the
    // keep-first window partitions by (n_nationkey, n_regionkey) — the
    // equality's nested side plus the ON key — in the body's ORDER BY
    engineSql("qe188_nested3_in_distinct_on_grandparent",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM customer WHERE c_custkey = o_custkey AND EXISTS (
             SELECT 1 FROM supplier WHERE s_nationkey = c_nationkey AND
               s_suppkey IN (SELECT DISTINCT ON (n_regionkey) n_nationkey
                             FROM nation WHERE n_nationkey = o_orderkey % 8
                             ORDER BY n_regionkey, n_name DESC)))
         ORDER BY o_orderkey""",
      """select o_orderkey from orders
         where o_orderkey < 300 and exists (
           select 1 from customer where c_custkey = o_custkey and exists (
             select 1 from supplier where s_nationkey = c_nationkey and
               s_suppkey in (select distinct on (n_regionkey) n_nationkey
                             from nation where n_nationkey = o_orderkey % 8
                             order by n_regionkey, n_name desc)))
         order by o_orderkey"""),

    // ---- same shape, NULL-lhs corner: a NULL lhs can never match a
    // kept value (non-negated IN is TRUE-only as a WHERE conjunct) -----
    engineSql("qe189_nested3_in_distinct_on_null_lhs",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM customer WHERE c_custkey = o_custkey AND EXISTS (
             SELECT 1 FROM supplier WHERE s_nationkey = c_nationkey AND
               IF(s_suppkey % 7 = 0, NULL, s_suppkey)
                 IN (SELECT DISTINCT ON (n_regionkey) n_nationkey
                     FROM nation WHERE n_nationkey = o_orderkey % 8
                     ORDER BY n_regionkey, n_name DESC)))
         ORDER BY o_orderkey""",
      """select o_orderkey from orders
         where o_orderkey < 300 and exists (
           select 1 from customer where c_custkey = o_custkey and exists (
             select 1 from supplier where s_nationkey = c_nationkey and
               (case when s_suppkey % 7 = 0 then null else s_suppkey end)
                 in (select distinct on (n_regionkey) n_nationkey
                     from nation where n_nationkey = o_orderkey % 8
                     order by n_regionkey, n_name desc)))
         order by o_orderkey"""),

    // ---- WITH-bearing plain body with grandparent correlation ----------
    // the nested EXISTS body carries its own (uncorrelated) CTE and its
    // WHERE reaches o_orderkey two scopes up — flattens like a plain body
    engineSql("qe190_nested_with_grandparent",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM customer WHERE c_custkey = o_custkey AND EXISTS (
             WITH t AS (SELECT n_nationkey AS nk FROM nation WHERE n_regionkey < 3)
             SELECT 1 FROM t WHERE t.nk = c_nationkey AND t.nk < o_orderkey % 30))
         ORDER BY o_orderkey""",
      """select o_orderkey from orders
         where o_orderkey < 300 and exists (
           select 1 from customer where c_custkey = o_custkey and exists (
             with t as (select n_nationkey as nk from nation where n_regionkey < 3)
             select 1 from t where t.nk = c_nationkey and t.nk < o_orderkey % 30))
         order by o_orderkey"""),

    // ---- [NOT] EXISTS over SET-OP bodies (uncorrelated), both the
    // WHERE-conjunct and expression positions (round-10 lift: the
    // EXISTS lowering previously rejected non-plain bodies outright;
    // IN and scalar subqueries already accepted them) ------------------
    engineSql("qe191_exists_setop_body",
      """SELECT n_name,
           IF(EXISTS (SELECT r_regionkey FROM region WHERE r_regionkey > 3
                      UNION ALL
                      SELECT n_regionkey FROM nation WHERE n_regionkey > 99),
              1, 0) AS f
         FROM nation
         WHERE NOT EXISTS (SELECT r_regionkey FROM region
                           EXCEPT
                           SELECT n_regionkey FROM nation)
         ORDER BY n_name""",
      """select n_name,
           case when exists (select r_regionkey from region where r_regionkey > 3
                             union all
                             select n_regionkey from nation where n_regionkey > 99)
                then 1 else 0 end as f
         from nation
         where not exists (select r_regionkey from region
                           except
                           select n_regionkey from nation)
         order by n_name"""),

    // ---- positive correlated IN with a NULLABLE lhs in WHERE position --
    // (round-10 fuzz find fz198): standard 3-valued IN drops NULL-lhs
    // rows (UNKNOWN), but DuckDB 1.0 plans the WHERE form as an
    // IS-NOT-DISTINCT-FROM semi join and KEEPS them when the membership
    // set contains a NULL — its own projected form disagrees and is
    // standard. The engine implements the standard; the oracle pins the
    // standard reading with coalesce(. , false). The body correlates on
    // c_nationkey and selects a column that is NULL for some suppliers
    // via the CASE, so both the NULL-lhs and NULL-member corners fire.
    engineSql("qe192_in_null_lhs_where",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 200 AND
           coalesce((CASE WHEN c_custkey % 5 = 0 THEN NULL
                          ELSE c_nationkey END)
             IN (SELECT CASE WHEN s_suppkey % 7 = 0 THEN NULL
                             ELSE s_nationkey END
                 FROM supplier WHERE s_nationkey = c_nationkey), false)
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 200 and
           (case when c_custkey % 5 = 0 then null
                 else c_nationkey end)
             in (select case when s_suppkey % 7 = 0 then null
                             else s_nationkey end
                 from supplier where s_nationkey = c_nationkey)
         order by c_custkey"""),

    // ---- depth-3 constant-true aggregate EXISTS (round-10 fuzz find
    // fz203, seed 606): the innermost EXISTS body is an ungrouped
    // aggregate select — one row ALWAYS exists, whatever its WHERE
    // matches (here: never) — so only the outer semi-join chain decides.
    // The old flatten recursion turned it match-dependent at depth 3.
    engineSql("qe193_nested3_agg_exists_constant_true",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM customer WHERE c_custkey = o_custkey AND EXISTS (
             SELECT 1 FROM supplier WHERE s_nationkey = c_nationkey AND EXISTS (
               SELECT count(1) FROM nation
               WHERE n_nationkey = o_orderkey % 40 AND n_regionkey > 99)))
         ORDER BY o_orderkey""",
      """select o_orderkey from orders
         where o_orderkey < 300 and exists (
           select 1 from customer where c_custkey = o_custkey and exists (
             select 1 from supplier where s_nationkey = c_nationkey and exists (
               select count(1) from nation
               where n_nationkey = o_orderkey % 40 and n_regionkey > 99)))
         order by o_orderkey"""),

    // ---- GENERIC grouped theta EXISTS, multi-conjunct correlation ----
    // qe147/qe152/qe169/qe185 now collapse to the monotone scalar
    // threshold, so these two keep the SURVIVORS machinery (rid frame /
    // banded grouped agg / per-rid offset count) under driver oracles:
    // two correlated inequalities cannot orient as a single monotone
    // conjunct…
    engineSql("qe194_exists_theta_grouped_two_conjuncts",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM lineitem
           WHERE l_extendedprice > o_totalprice / 4
             AND l_quantity < o_orderkey % 50
           GROUP BY l_suppkey HAVING min(l_quantity) <= 10
           LIMIT 3 OFFSET 1)
         ORDER BY o_orderkey""",
      """select o_orderkey from orders
         where o_orderkey < 300 and exists (
           select 1 from lineitem
           where l_extendedprice > o_totalprice / 4
             and l_quantity < o_orderkey % 50
           group by l_suppkey having min(l_quantity) <= 10
           limit 3 offset 1)
         order by o_orderkey"""),

    // …and a non-count HAVING declines the threshold collapse even with
    // a single monotone conjunct (per-group max is not a row count; the
    // banded grouped aggregation still computes it result-sized)
    engineSql("qe195_exists_theta_grouped_minmax_having",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT l_returnflag FROM lineitem
           WHERE l_extendedprice > o_totalprice / 3
           GROUP BY l_returnflag HAVING max(l_quantity) >= 49
           LIMIT 5 OFFSET 1)
         ORDER BY o_orderkey""",
      """select o_orderkey from orders
         where o_orderkey < 300 and exists (
           select l_returnflag from lineitem
           where l_extendedprice > o_totalprice / 3
           group by l_returnflag having max(l_quantity) >= 49
           limit 5 offset 1)
         order by o_orderkey"""),

    // ---- grouped theta IN, select = f(group key): the value-threshold
    // collapse's MERGE arm (several groups fold into one member value;
    // the driver-pinned complement of qe136's identity select)
    engineSql("qe196_in_theta_grouped_merged_value",
      """SELECT c_custkey, c_nationkey FROM customer
         WHERE c_custkey < 5000
           AND c_nationkey % 5 IN (SELECT s_nationkey % 5 FROM supplier
                                   WHERE s_acctbal > c_acctbal
                                   GROUP BY s_nationkey HAVING count(1) >= 2)
         ORDER BY c_custkey""",
      """select c_custkey, c_nationkey from customer
         where c_custkey < 5000
           and c_nationkey % 5 in (select s_nationkey % 5 from supplier
                                   where s_acctbal > c_acctbal
                                   group by s_nationkey having count(1) >= 2)
         order by c_custkey""")
  )
}
