package graft.queries

/** Round-11 additions: the r10 missing-list lift — THETA-correlated
  * nested IN with DISTINCT ON now lowers through the prefix-extremum
  * staircase threaded into the grandparent flatten (VERDICT r10 #5).
  * The kept row per ON-group is binding-dependent under an inequality,
  * but it is always a RECORD row (prefix extremum of the correlated
  * side in the body's sort), and "this record is the kept one" is a
  * pure per-row predicate that rides the flatten join as ordinary
  * conjuncts — see Binder.flattenExistsBody.
  *
  * Reference grammar composes these freely:
  * /root/reference/src/parser/mod.rs:349-360 (DISTINCT ON in any body),
  * :1229-1245 (subqueries in any expression position).
  */
object Round11Queries {

  private def engineSql(name: String, oracle: String, nutql: String): QueryDef =
    QueryDef(name, Some(oracle), (s, dir) => Engines.get(s, dir).execute(nutql))

  val defs: Seq[QueryDef] = Seq(

    // ---- depth-3 nested IN DISTINCT ON under grandparent THETA ---------
    // the innermost body's WHERE is an INEQUALITY against o_orderkey
    // THREE scopes up: the kept nation per region varies with the outer
    // row, which the r10 equality-only window could not express (it
    // kept a clean error) — the staircase records per (region) plus the
    // per-row kept test lower it exactly
    engineSql("qe197_nested3_in_distinct_on_theta",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM customer WHERE c_custkey = o_custkey AND EXISTS (
             SELECT 1 FROM supplier WHERE s_nationkey = c_nationkey AND
               s_suppkey % 25 IN (SELECT DISTINCT ON (n_regionkey) n_nationkey
                                  FROM nation
                                  WHERE n_nationkey > o_orderkey % 20
                                  ORDER BY n_regionkey, n_name DESC, n_nationkey)))
         ORDER BY o_orderkey""",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM customer WHERE c_custkey = o_custkey AND EXISTS (
             SELECT 1 FROM supplier WHERE s_nationkey = c_nationkey AND
               s_suppkey % 25 IN (SELECT DISTINCT ON (n_regionkey) n_nationkey
                                  FROM nation
                                  WHERE n_nationkey > o_orderkey % 20
                                  ORDER BY n_regionkey, n_name DESC, n_nationkey)))
         ORDER BY o_orderkey"""),

    // ---- the '<' direction with NULL lhs and NULL member corners -------
    // prefix-MINIMA records; a NULL lhs (every 11th supplier) and a
    // NULL kept value (nation 13) both make the positive IN conjunct
    // UNKNOWN → that supplier row contributes nothing
    engineSql("qe198_nested3_in_distinct_on_theta_nulls",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM customer WHERE c_custkey = o_custkey AND EXISTS (
             SELECT 1 FROM supplier WHERE s_nationkey = c_nationkey AND
               CASE WHEN s_suppkey % 11 = 0 THEN NULL ELSE s_suppkey % 25 END
                 IN (SELECT DISTINCT ON (n_regionkey)
                       CASE WHEN n_nationkey = 13 THEN NULL ELSE n_nationkey END
                     FROM nation WHERE n_nationkey < o_orderkey % 30
                     ORDER BY n_regionkey, n_name, n_nationkey)))
         ORDER BY o_orderkey""",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM customer WHERE c_custkey = o_custkey AND EXISTS (
             SELECT 1 FROM supplier WHERE s_nationkey = c_nationkey AND
               CASE WHEN s_suppkey % 11 = 0 THEN NULL ELSE s_suppkey % 25 END
                 IN (SELECT DISTINCT ON (n_regionkey)
                       CASE WHEN n_nationkey = 13 THEN NULL ELSE n_nationkey END
                     FROM nation WHERE n_nationkey < o_orderkey % 30
                     ORDER BY n_regionkey, n_name, n_nationkey)))
         ORDER BY o_orderkey"""),

    // ---- hoist-past-level subquery-bearing conjunct (pair frame) -------
    // the IN's lhs (c_nationkey) lives one scope up from its conjunct
    // while its body references o_totalprice two scopes up — no
    // intermediate level can lower it (r10: clean error). The round-11
    // pair-frame rail binds it on the explicit (outer × flattened inner)
    // frame, where the LIMIT-IN machinery rid-tags the right thing.
    engineSql("qe199_exists_hoisted_in_limit",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM customer WHERE c_custkey = o_custkey AND EXISTS (
             SELECT 1 FROM nation WHERE n_nationkey = c_nationkey AND
               c_nationkey IN (SELECT s_nationkey FROM supplier
                               WHERE s_acctbal > o_totalprice / 100
                               ORDER BY s_acctbal DESC, s_suppkey LIMIT 5)))
         ORDER BY o_orderkey""",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM customer WHERE c_custkey = o_custkey AND EXISTS (
             SELECT 1 FROM nation WHERE n_nationkey = c_nationkey AND
               c_nationkey IN (SELECT s_nationkey FROM supplier
                               WHERE s_acctbal > o_totalprice / 100
                               ORDER BY s_acctbal DESC, s_suppkey LIMIT 5)))
         ORDER BY o_orderkey"""),

    // ---- deferred membership with OUTER lhs over a set-op body ---------
    // round-11 fuzzer find (fz123/fz450, seed 1103): the [NOT] IN
    // machinery joins the frame it mutates by the lhs, so an outer lhs
    // on the inner frame leaked a raw MISSING_ATTRIBUTES; membership
    // conjuncts with an outer lhs now route to the pair frame.
    engineSql("qe200_nested_notin_setop_outer_lhs",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM customer WHERE c_custkey = o_custkey AND EXISTS (
             SELECT 1 FROM nation WHERE n_nationkey = c_nationkey AND
               o_orderkey % 30 NOT IN (
                 SELECT n_regionkey FROM nation WHERE n_name < 'K'
                 UNION DISTINCT
                 SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000)))
         ORDER BY o_orderkey""",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM customer WHERE c_custkey = o_custkey AND EXISTS (
             SELECT 1 FROM nation WHERE n_nationkey = c_nationkey AND
               o_orderkey % 30 NOT IN (
                 SELECT n_regionkey FROM nation WHERE n_name < 'K'
                 UNION DISTINCT
                 SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000)))
         ORDER BY o_orderkey"""),

    // ---- scalar staircase: HAVING level floor + DESC tie-break ---------
    // the bare count HAVING folds into the staircase as a level floor
    // (levels below 2 never enter the record table) and the DESC
    // tie-break flips the within-level running extreme — both arms of
    // the round-11 qe146 lowering under one oracle
    engineSql("qe201_scalar_theta_group_top1_having",
      """SELECT o_orderkey,
           (SELECT l_suppkey FROM lineitem
            WHERE l_extendedprice > o_totalprice / 4
            GROUP BY l_suppkey HAVING count(1) >= 2
            ORDER BY count(1) DESC, l_suppkey DESC LIMIT 1) AS busiest_supp
         FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""",
      """SELECT o_orderkey,
           (SELECT l_suppkey FROM lineitem
            WHERE l_extendedprice > o_totalprice / 4
            GROUP BY l_suppkey HAVING count(1) >= 2
            ORDER BY count(1) DESC, l_suppkey DESC LIMIT 1) AS busiest_supp
         FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey"""))
}