package graft.queries

/** Round-12 additions: the last two composition rails from VERDICT r11.
  *
  *  - Deferred subquery-bearing conjuncts now combine with a NEGATED
  *    nested sibling: the negated-nested lowering prunes its candidate
  *    pair frame by the deferred conjuncts (semi/anti for top-level
  *    forms, mark-join filters otherwise) instead of erroring
  *    (Binder.lowerExistsNegatedNested `deferred` pool).
  *  - Several outer-varying inequalities under a nested DISTINCT ON
  *    defer the WHOLE conjunct to the enclosing pair frame, where the
  *    per-rid slice window keeps the right row under arbitrary
  *    correlation (the staircase stays the single-inequality plan).
  *
  * Reference grammar composes all of these freely:
  * /root/reference/src/parser/mod.rs:349-360 (DISTINCT ON in any body),
  * :1229-1245 (subqueries in any expression position).
  */
object Round12Queries {

  private def engineSql(name: String, oracle: String, nutql: String): QueryDef =
    QueryDef(name, Some(oracle), (s, dir) => Engines.get(s, dir).execute(nutql))

  private def same(name: String, sql: String): QueryDef =
    engineSql(name, sql, sql)

  val defs: Seq[QueryDef] = Seq(

    // ---- deferred LIMIT-IN + negated nested sibling --------------------
    // qe199's hoist-past-level conjunct (lhs one scope up, body two up)
    // coexisting with a NOT EXISTS that also reaches the outer row —
    // the r11 guard kept this a clean error; both now prune one
    // candidate pair frame. The second supplier body is aliased: the
    // flatten exposes `nation`'s qualifier on the pair frame and each
    // prune fresh-renames its own body.
    same("qe202_negnested_with_deferred_in",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM customer WHERE c_custkey = o_custkey
             AND EXISTS (
               SELECT 1 FROM nation WHERE n_nationkey = c_nationkey AND
                 c_nationkey IN (SELECT s_nationkey FROM supplier
                                 WHERE s_acctbal > o_totalprice / 100
                                 ORDER BY s_acctbal DESC, s_suppkey LIMIT 5))
             AND NOT EXISTS (
               SELECT 1 FROM supplier AS s2 WHERE s2.s_nationkey = c_nationkey
                 AND s2.s_acctbal > o_totalprice / 10))
         ORDER BY o_orderkey"""),

    // ---- GROUPED deferred body + negated nested sibling ----------------
    // the deferred membership's body aggregates per group (min per
    // suppkey%5 bucket) — the per-pair grouped lowering runs on the
    // same pair frame the anti body prunes
    same("qe203_negnested_with_grouped_deferred",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM customer WHERE c_custkey = o_custkey
             AND EXISTS (
               SELECT 1 FROM nation WHERE n_nationkey = c_nationkey AND
                 c_nationkey IN (SELECT min(s_nationkey) FROM supplier
                                 WHERE s_acctbal > o_totalprice / 100
                                 GROUP BY s_suppkey % 5))
             AND NOT EXISTS (
               SELECT 1 FROM supplier AS s2 WHERE s2.s_nationkey = c_nationkey
                 AND s2.s_acctbal > o_totalprice / 10))
         ORDER BY o_orderkey"""),

    // ---- multi-inequality nested DISTINCT ON (depth 3) -----------------
    // qe197's staircase shape with a SECOND outer-varying inequality:
    // no single record table expresses the kept row, so the whole
    // conjunct defers to the enclosing pair frame's slice window
    // (VERDICT r11 missing #1 — the last fuzz-reachable dialect error)
    same("qe204_nested3_distinct_on_multi_ineq",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT 1 FROM customer WHERE c_custkey = o_custkey AND EXISTS (
             SELECT 1 FROM supplier WHERE s_nationkey = c_nationkey AND
               s_suppkey % 25 IN (SELECT DISTINCT ON (n_regionkey) n_nationkey
                                  FROM nation
                                  WHERE n_nationkey > o_orderkey % 20
                                    AND n_nationkey < o_orderkey % 50 + 5
                                  ORDER BY n_regionkey, n_name DESC, n_nationkey)))
         ORDER BY o_orderkey"""),

    // ---- DISTINCT ON + OFFSET EXISTS threshold collapse ----------------
    // found by the round-12 fuzz PLAN cross-check (fz242 was
    // correct-but-generic): existence of more than `off` distinct
    // ON-tuples among theta-passers collapses to ONE scalar — the
    // (off+1)-th best per-tuple extreme of the correlated side — so
    // the plan has zero joins at any outer cardinality. The cap is for
    // the ORACLE only: DuckDB evaluates this EXISTS per outer row
    // (~6 ms/row measured); the engine side is outer-size-independent
    // (Round12Spec pins the join-free plan).
    same("qe205_exists_distinct_on_offset_collapse",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 300 AND EXISTS (
           SELECT DISTINCT ON (l_suppkey) l_extendedprice FROM lineitem
           WHERE l_extendedprice > o_totalprice / 2
           ORDER BY l_suppkey, l_linenumber LIMIT 3 OFFSET 2)
         ORDER BY o_orderkey""")
  )
}
