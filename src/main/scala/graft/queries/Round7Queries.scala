package graft.queries

/** Round-7 additions. Dialect: grandparent-correlated NESTED subqueries
  * with AGGREGATED bodies (VERDICT r6 missing-list #1) — the reference
  * grammar composes IN at any depth with GROUP BY/HAVING in any body
  * (/root/reference/src/parser/mod.rs:1404,1439-1449 + :447-474), and
  * neither Spark's analyzer nor the previous plain-body lowering could
  * express them. The lowering (Binder.joinNestedAggBody) rid-tags the
  * candidate pair frame, groups the correlation join by (rid ∪ GROUP BY
  * keys), and decides membership per group — three-valued for NOT IN.
  * DuckDB resolves grandparent refs natively = the oracle. */
object Round7Queries {

  import graft.Tables
  import graft.pipeline.Curation
  import org.apache.spark.sql.functions.col

  private val streamRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  private def engineSql(name: String, oracle: String, nutql: String): QueryDef =
    QueryDef(name, Some(oracle), (s, dir) => Engines.get(s, dir).execute(nutql))

  val defs: Seq[QueryDef] = Seq(

    // ---- train/val/test split assignment --------------------------------
    // deterministic holdout assignment by the Knuth id mix: a pure
    // projection (no shuffle), stable under corpus growth — a document
    // keeps its split forever. Integer/string output, bit-stable.
    QueryDef(
      "qp78_assign_split",
      Some("""SELECT doc_id,
                CASE WHEN m < 10 THEN 'test'
                     WHEN m < 60 THEN 'val'
                     ELSE 'train' END AS split
              FROM (SELECT doc_id,
                      ((doc_id % 1000003) * 2654435761) % 1000 AS m
                    FROM documents)
              ORDER BY doc_id"""),
      (s, dir) => Curation.assignSplit(
        Tables.load(s, dir, "documents"), "doc_id",
        valPermille = 50, testPermille = 10)),

    // ---- global shuffle order (training-order manifest) -----------------
    // rank of the id mix with ties by id — computed WITHOUT a global
    // single-partition window: fixed-width mix buckets are monotone in
    // the order, per-bucket counts become driver-side cumulative
    // offsets, and the position is offset + rank-within-bucket. The
    // oracle is the literal global window DuckDB can afford at sf0.01.
    QueryDef(
      "qp79_shuffle_positions",
      Some("""SELECT doc_id,
                ROW_NUMBER() OVER (
                  ORDER BY ((doc_id % 1000003) * 2654435761) % 1000000007,
                           doc_id) - 1 AS shuffle_pos
              FROM documents ORDER BY doc_id"""),
      (s, dir) => Curation.shufflePositions(
        Tables.load(s, dir, "documents"), "doc_id")),

    // ---- sliding-window chunking ----------------------------------------
    // overlapping long-doc splits (window 32 tokens, stride 24 — sized so
    // the fixture's 10-99-token docs exercise 1-4 chunks each). Output is
    // chunk metadata only; all-integer arithmetic on the shared BPE-ish
    // token count, bit-stable across engines.
    QueryDef(
      "qp80_chunk_windows",
      Some("""WITH d AS (SELECT doc_id,
                  CAST(len(regexp_extract_all(text, '[\p{L}]+|[0-9]+|[^\p{L}0-9\s]+')) AS BIGINT) n
                FROM documents),
              k AS (SELECT doc_id, n,
                  CAST(unnest(generate_series(0,
                    (CASE WHEN n > 32 THEN n - 32 ELSE 0 END + 23) // 24)) AS BIGINT) AS chunk_id
                FROM d WHERE n > 0)
          SELECT doc_id, chunk_id, chunk_id * 24 AS tok_start,
                 CASE WHEN n - chunk_id * 24 < 32
                      THEN n - chunk_id * 24 ELSE 32 END AS tok_len
          FROM k ORDER BY doc_id, chunk_id"""),
      (s, dir) => Curation.chunkSlidingWindows(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        window = 32, stride = 24)),

    // ---- vocabulary top-k ------------------------------------------------
    // global token-frequency ranking (case-folded BPE-ish tokens, top
    // 100, ties by token text) — the salted two-phase top-k keeps every
    // window partition bounded; counts and rank are integer-exact.
    QueryDef(
      "qp81_vocab_topk",
      Some("""WITH t AS (SELECT unnest(regexp_extract_all(lower(text),
                  '[\p{L}]+|[0-9]+|[^\p{L}0-9\s]+')) AS token
                FROM documents),
              c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
                FROM t GROUP BY token)
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank,
                 token, cnt
          FROM c ORDER BY cnt DESC, token LIMIT 100"""),
      (s, dir) => Curation.vocabTopK(
        Tables.load(s, dir, "documents"), "text", k = 100)),

    // ---- nested NOT IN with a GROUP BY body + grandparent ref -----------
    // the membership set is per-group counts of this order's lines priced
    // above the GRANDPARENT customer's balance, one count per supplier;
    // o_orderkey % 8 lands inside the count range often enough that both
    // membership outcomes occur. NULL-free (count never NULL) — this
    // entry pins the per-group membership logic; qe116 pins the
    // three-valued corner.
    // NOT EXISTS so the membership outcome is decisive at the output:
    // 57 of 300 customers survive at sf0.01, of which 15 ONLY because
    // every high-value order's key-mod lands among its per-supplier
    // counts (42 survive vacuously with no order above the threshold).
    engineSql("qe115_notin_group_grandparent",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 300 AND NOT EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND o_totalprice > 400000
             AND o_orderkey % 8 NOT IN (
               SELECT count(1) FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_extendedprice > c_acctbal
                GROUP BY l_suppkey))
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 300 and not exists (
           select 1 from orders where o_custkey = c_custkey
             and o_totalprice > 400000
             and o_orderkey % 8 not in (
               select count(1) from lineitem
                where l_orderkey = o_orderkey
                  and l_extendedprice > c_acctbal
                group by l_suppkey))
         order by c_custkey"""),

    // ---- …and its three-valued NULL corner ------------------------------
    // the grouped select value is conditionally NULL and the tested value
    // (-o_orderkey) is NEVER in the set, so the outcome is decided purely
    // by NULL-presence vs emptiness: one NULL-valued group makes NOT IN
    // UNKNOWN (pruned), a NULL-free or empty group set keeps the order.
    // 250 of 300 customers survive at sf0.01 vs 294 with the membership
    // test removed — 44 rows are decided by the NULL-group logic alone.
    engineSql("qe116_notin_group_null",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 300 AND EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND o_totalprice > 300000
             AND (0 - o_orderkey) NOT IN (
               SELECT CASE WHEN max(l_quantity) > 40 THEN NULL
                           ELSE min(l_suppkey) END
                 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_extendedprice > c_acctbal
                GROUP BY l_linenumber))
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 300 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_totalprice > 300000
             and (0 - o_orderkey) not in (
               select case when max(l_quantity) > 40 then null
                           else min(l_suppkey) end
                 from lineitem
                where l_orderkey = o_orderkey
                  and l_extendedprice > c_acctbal
                group by l_linenumber))
         order by c_custkey"""),

    // ---- positive nested IN with GROUP BY + HAVING + grandparent ref ----
    // a positive aggregated body cannot flatten either (the flatten join
    // would run below the body's own aggregation), so it reroutes through
    // the pair-frame machinery with a per-group SEMI decision.
    engineSql("qe117_in_group_having_grandparent",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 400 AND EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND o_orderkey % 4 IN (
               SELECT count(1) FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_extendedprice > c_acctbal
                GROUP BY l_suppkey
                HAVING min(l_quantity) < 25))
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 400 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_orderkey % 4 in (
               select count(1) from lineitem
                where l_orderkey = o_orderkey
                  and l_extendedprice > c_acctbal
                group by l_suppkey
                having min(l_quantity) < 25))
         order by c_custkey"""),

    // ---- nested NOT IN over an UNGROUPED aggregate body -----------------
    // SQL: the body yields exactly ONE row per (order, customer) pair —
    // min over an EMPTY set is NULL, making NOT IN UNKNOWN (pruned); a
    // populated set keeps the order iff the min differs from the lhs.
    // Exercises the left-join-back branch of the aggregated lowering.
    engineSql("qe118_notin_ungrouped_agg",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 400 AND EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND o_totalprice > 300000
             AND o_orderkey % 3 NOT IN (
               SELECT min(l_linenumber) FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_extendedprice > c_acctbal))
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 400 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_totalprice > 300000
             and o_orderkey % 3 not in (
               select min(l_linenumber) from lineitem
                where l_orderkey = o_orderkey
                  and l_extendedprice > c_acctbal))
         order by c_custkey"""),

    // ---- grouped body under a THETA-correlated scalar -------------------
    // (VERDICT r6 missing-list #2). The HAVING pins ONE group key, so at
    // most one group survives per outer row and the scalar contract
    // holds; zero surviving groups (no expensive-enough lines, or no 'R'
    // lines among them) → NULL. count(1) keeps every value integer.
    engineSql("qe119_scalar_theta_grouped",
      """SELECT o_orderkey,
           (SELECT count(1) FROM lineitem
             WHERE l_extendedprice > o_totalprice / 2
             GROUP BY l_returnflag HAVING l_returnflag = 'R') AS r_lines
         FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""",
      """select o_orderkey,
           (select count(1) from lineitem
             where l_extendedprice > o_totalprice / 2
             group by l_returnflag having l_returnflag = 'R') as r_lines
         from orders where o_orderkey < 1000 order by o_orderkey"""),

    // ---- correlated scalar top-1 with OFFSET ----------------------------
    // (VERDICT r6 missing-list #3): the second-most-expensive order per
    // customer — rank = offset+1 in the per-key window, NULL for
    // customers with fewer than two orders. Ties broken by o_orderkey
    // so the pick is deterministic in both engines.
    engineSql("qe120_scalar_top1_offset",
      """SELECT c_custkey,
           (SELECT o_orderkey FROM orders WHERE o_custkey = c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 1 OFFSET 1)
             AS second_order
         FROM customer WHERE c_custkey < 500 ORDER BY c_custkey""",
      """select c_custkey,
           (select o_orderkey from orders where o_custkey = c_custkey
             order by o_totalprice desc, o_orderkey limit 1 offset 1)
             as second_order
         from customer where c_custkey < 500 order by c_custkey"""),

    // ---- scalar subquery in INNER JOIN ON referencing the RIGHT side ----
    // (VERDICT r6 missing-list #4). INNER ON ≡ WHERE over the joined
    // frame, so subquery-bearing conjuncts defer to the WHERE machinery
    // after the join — the scalar's correlation key (c_custkey) lives on
    // the join's right relation, which the pre-join scalar broadcast
    // could not see. 1755 of 3000 joined rows survive at sf0.01.
    engineSql("qe121_join_on_scalar_right",
      """SELECT o_orderkey, c_custkey FROM orders
           JOIN customer ON o_custkey = c_custkey
            AND o_totalprice / 200 > (
              SELECT max(p_retailprice) FROM part
               WHERE p_partkey % 100 = c_custkey % 100)
         WHERE o_orderkey < 3000 ORDER BY o_orderkey""",
      """select o_orderkey, c_custkey from orders
           join customer on o_custkey = c_custkey
            and o_totalprice / 200 > (
              select max(p_retailprice) from part
               where p_partkey % 100 = c_custkey % 100)
         where o_orderkey < 3000 order by o_orderkey"""),

    // ---- nested NOT EXISTS with OFFSET + grandparent ref ----------------
    // NOT EXISTS(body LIMIT n OFFSET 2) ⟺ the body yields at most 2 rows
    // — the plain nested body rewrites to HAVING count(1) > 2 and rides
    // the per-pair ungrouped-aggregate lowering with its count-0
    // left-join-back. 271 of 300 customers survive at sf0.01 (29 decided
    // by the counting).
    engineSql("qe122_nested_not_exists_offset",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 300 AND EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND NOT EXISTS (
               SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_extendedprice > c_acctbal / 2
                LIMIT 10 OFFSET 2))
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 300 and exists (
           select 1 from orders where o_custkey = c_custkey
             and not exists (
               select 1 from lineitem
                where l_orderkey = o_orderkey
                  and l_extendedprice > c_acctbal / 2
                limit 10 offset 2))
         order by c_custkey"""),

    // ---- positive nested EXISTS over a GROUP BY body with OFFSET --------
    // existence ⟺ MORE THAN 3 surviving supplier groups per (customer,
    // order) pair — the grouped per-pair lowering counts post-HAVING
    // groups per rid. 271 of 300 at sf0.01.
    engineSql("qe123_nested_exists_group_offset",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 300 AND EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND o_totalprice > 250000
             AND EXISTS (
               SELECT l_suppkey FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_extendedprice > c_acctbal
                GROUP BY l_suppkey HAVING count(1) >= 1
                LIMIT 100 OFFSET 3))
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 300 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_totalprice > 250000
             and exists (
               select l_suppkey from lineitem
                where l_orderkey = o_orderkey
                  and l_extendedprice > c_acctbal
                group by l_suppkey having count(1) >= 1
                limit 100 offset 3))
         order by c_custkey"""),

    // ---- grandparent ref in the nested body's HAVING --------------------
    // the HAVING's non-aggregate side references the GRANDPARENT
    // (c_acctbal), which is constant per candidate pair — it rides the
    // per-pair grouping as a first() aggregate and substitutes per
    // group. 219 of 300 customers qualify at sf0.01.
    engineSql("qe124_nested_having_grandparent",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 300 AND EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND o_orderkey % 4 IN (
               SELECT count(1) FROM lineitem
                WHERE l_orderkey = o_orderkey
                GROUP BY l_suppkey
                HAVING min(l_quantity) < c_acctbal / 200))
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 300 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_orderkey % 4 in (
               select count(1) from lineitem
                where l_orderkey = o_orderkey
                group by l_suppkey
                having min(l_quantity) < c_acctbal / 200))
         order by c_custkey"""),

    // ---- WITH inside subquery bodies ------------------------------------
    // an EXISTS body's own (uncorrelated) CTE list binds before the
    // body's FROM — 258 of 300 customers at sf0.01.
    engineSql("qe125_exists_with_cte",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 300 AND EXISTS (
           WITH big AS (SELECT o_custkey AS k FROM orders
                         WHERE o_totalprice > 400000)
           SELECT 1 FROM big WHERE k = c_custkey)
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 300 and exists (
           with big as (select o_custkey as k from orders
                         where o_totalprice > 400000)
           select 1 from big where k = c_custkey)
         order by c_custkey"""),

    // ...and inside a grandparent-correlated NESTED body: the CTE binds
    // uncorrelated, the selecting body over it keeps its grandparent
    // ref (c_acctbal) and rides the per-pair NOT IN lowering.
    engineSql("qe126_nested_with_grandparent",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 300 AND EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND o_orderkey NOT IN (
               WITH pricey AS (SELECT l_orderkey AS k, l_extendedprice AS p
                               FROM lineitem WHERE l_suppkey < 40)
               SELECT k FROM pricey WHERE p > c_acctbal * 2))
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 300 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_orderkey not in (
               with pricey as (select l_orderkey as k, l_extendedprice as p
                               from lineitem where l_suppkey < 40)
               select k from pricey where p > c_acctbal * 2))
         order by c_custkey"""),

    // ---- scalar subquery in an OUTER JOIN ON, right-correlated ----------
    // the conjunct cannot defer to a post-join filter (it decides which
    // customers null-extend), so the scalar binds PRE-JOIN on the right
    // side and its value column rides orders through the left join.
    // 726 matched + 9 null-extended rows at sf0.01.
    engineSql("qe127_left_join_on_scalar",
      """SELECT c_custkey, o_orderkey FROM customer
           LEFT JOIN orders ON o_custkey = c_custkey
            AND o_totalprice > 6 * (
              SELECT avg(l_extendedprice) FROM lineitem
               WHERE l_orderkey = o_orderkey)
         WHERE c_custkey < 200 ORDER BY c_custkey, o_orderkey""",
      """select c_custkey, o_orderkey from customer
           left join orders on o_custkey = c_custkey
            and o_totalprice > 6 * (
              select avg(l_extendedprice) from lineitem
               where l_orderkey = o_orderkey)
         where c_custkey < 200 order by c_custkey, o_orderkey"""),

    // ---- WITH bodies inside correlated IN / scalar subqueries -----------
    // the body's own CTE list binds uncorrelated before its FROM, so a
    // CTE-named source resolves during the correlation probe and the
    // null-aware NOT IN lowering sees the composed body. The CTE filter
    // keeps the value set partial (o_custkey < 500) so both membership
    // outcomes occur.
    engineSql("qe128_notin_with_body",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 600 AND c_custkey NOT IN (
           WITH big AS (SELECT o_custkey AS k, o_totalprice AS p FROM orders
                         WHERE o_totalprice > 100 AND o_custkey < 500)
           SELECT k FROM big WHERE p > c_acctbal)
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 600 and c_custkey not in (
           with big as (select o_custkey as k, o_totalprice as p from orders
                         where o_totalprice > 100 and o_custkey < 500)
           select k from big where p > c_acctbal)
         order by c_custkey"""),

    // equality-correlated scalar aggregate whose body reads a CTE — the
    // decorrelated group-by-key aggregate rides the CTE's plan
    engineSql("qe129_scalar_with_body",
      """SELECT c_custkey,
                (WITH lo AS (SELECT o_custkey AS k, o_totalprice AS p
                              FROM orders WHERE o_orderstatus = 'F')
                 SELECT max(p) FROM lo WHERE k = c_custkey) AS mx
         FROM customer WHERE c_custkey < 400 ORDER BY c_custkey""",
      """select c_custkey,
                (with lo as (select o_custkey as k, o_totalprice as p
                              from orders where o_orderstatus = 'F')
                 select max(p) from lo where k = c_custkey) as mx
         from customer where c_custkey < 400 order by c_custkey"""),

    // ---- LIMIT / DISTINCT ON bodies in correlated IN --------------------
    // LIMIT sees the PER-OUTER-ROW result set: both sides pick the two
    // smallest-by-linenumber rows of each order before the membership
    // test. Ties share the select value (order col = value col), so the
    // kept set is deterministic in both engines.
    engineSql("qe130_in_limit_body",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 3000 AND 1 IN (
           SELECT l_linenumber FROM lineitem WHERE l_orderkey = o_orderkey
            ORDER BY l_linenumber DESC LIMIT 2)
         ORDER BY o_orderkey""",
      """select o_orderkey from orders
         where o_orderkey < 3000 and 1 in (
           select l_linenumber from lineitem where l_orderkey = o_orderkey
            order by l_linenumber desc limit 2)
         order by o_orderkey"""),

    // NOT IN over a per-key LIMIT 1 OFFSET 1 window — membership against
    // the single second-smallest row, negated (empty post-offset set →
    // NOT IN is true)
    engineSql("qe131_notin_limit_offset",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 3000 AND 2 NOT IN (
           SELECT l_linenumber FROM lineitem WHERE l_orderkey = o_orderkey
            ORDER BY l_linenumber LIMIT 1 OFFSET 1)
         ORDER BY o_orderkey""",
      """select o_orderkey from orders
         where o_orderkey < 3000 and 2 not in (
           select l_linenumber from lineitem where l_orderkey = o_orderkey
            order by l_linenumber limit 1 offset 1)
         order by o_orderkey"""),

    // DISTINCT ON inside a correlated IN body: keep-first per (outer row,
    // ON key) in the body's ORDER BY — first linenumber of each parity
    engineSql("qe132_in_distinct_on_body",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 3000 AND 2 IN (
           SELECT DISTINCT ON (l_linenumber % 2) l_linenumber
             FROM lineitem WHERE l_orderkey = o_orderkey
            ORDER BY l_linenumber % 2, l_linenumber)
         ORDER BY o_orderkey""",
      """select o_orderkey from orders
         where o_orderkey < 3000 and 2 in (
           select distinct on (l_linenumber % 2) l_linenumber
             from lineitem where l_orderkey = o_orderkey
            order by l_linenumber % 2, l_linenumber)
         order by o_orderkey"""),

    // ---- GROUP BY bodies under correlated scalar LIMIT 1 ----------------
    // top-group-per-key: the dominant supplier of each order by summed
    // quantity (quantities are whole numbers, so the double sums are
    // exact and the cross-engine ordering is deterministic; ties break
    // on the suppkey)
    engineSql("qe133_scalar_group_top1",
      """SELECT o_orderkey,
                (SELECT l_suppkey FROM lineitem
                  WHERE l_orderkey = o_orderkey
                  GROUP BY l_suppkey
                  ORDER BY sum(l_quantity) DESC, l_suppkey LIMIT 1) AS top_supp
         FROM orders WHERE o_orderkey < 3000 ORDER BY o_orderkey""",
      """select o_orderkey,
                (select l_suppkey from lineitem
                  where l_orderkey = o_orderkey
                  group by l_suppkey
                  order by sum(l_quantity) desc, l_suppkey limit 1) as top_supp
         from orders where o_orderkey < 3000 order by o_orderkey"""),

    // HAVING + OFFSET composition: the SECOND-heaviest supplier among
    // those contributing at least 2 lines (NULL when fewer than two
    // groups survive the HAVING)
    engineSql("qe134_scalar_group_top1_having",
      """SELECT o_orderkey,
                (SELECT l_suppkey FROM lineitem
                  WHERE l_orderkey = o_orderkey
                  GROUP BY l_suppkey HAVING count(1) >= 2
                  ORDER BY sum(l_quantity) DESC, l_suppkey
                  LIMIT 1 OFFSET 1) AS snd_supp
         FROM orders WHERE o_orderkey < 3000 ORDER BY o_orderkey""",
      """select o_orderkey,
                (select l_suppkey from lineitem
                  where l_orderkey = o_orderkey
                  group by l_suppkey having count(1) >= 2
                  order by sum(l_quantity) desc, l_suppkey
                  limit 1 offset 1) as snd_supp
         from orders where o_orderkey < 3000 order by o_orderkey"""),

    // ---- DISTINCT bodies in correlated scalar lookups -------------------
    // the deduped (key, value) stream enforces the single-row rule over
    // DISTINCT values; the fixture's value (l_orderkey % 7) is constant
    // within each key, so both engines see a legal one-row scalar —
    // orders without lines are NULL through the left join
    engineSql("qe135_scalar_distinct_lookup",
      """SELECT o_orderkey,
                (SELECT DISTINCT l_orderkey % 7 FROM lineitem
                  WHERE l_orderkey = o_orderkey) AS m
         FROM orders WHERE o_orderkey < 3000 ORDER BY o_orderkey""",
      """select o_orderkey,
                (select distinct l_orderkey % 7 from lineitem
                  where l_orderkey = o_orderkey) as m
         from orders where o_orderkey < 3000 order by o_orderkey"""),

    // ---- GROUP BY body under a THETA-correlated IN ----------------------
    // the membership set per customer is the nation keys of supplier
    // groups with ≥2 richer-than-this-customer suppliers — non-equality
    // correlation (s_acctbal > c_acctbal) with an explicit GROUP BY +
    // HAVING, previously rejected on the theta path. 718 of 1500 customers
    // survive at sf0.01 (the custkey bound only trims sf0.1 cost).
    engineSql("qe136_in_theta_grouped",
      """SELECT c_custkey, c_nationkey FROM customer
         WHERE c_custkey < 5000
           AND c_nationkey IN (SELECT s_nationkey FROM supplier
                               WHERE s_acctbal > c_acctbal
                               GROUP BY s_nationkey HAVING count(1) >= 2)
         ORDER BY c_custkey""",
      """select c_custkey, c_nationkey from customer
         where c_custkey < 5000
           and c_nationkey in (select s_nationkey from supplier
                               where s_acctbal > c_acctbal
                               group by s_nationkey having count(1) >= 2)
         order by c_custkey"""),

    // ---- NOT IN over a theta-grouped body with NULL values --------------
    // three-valued corner: a nation group with ≥3 qualifying customers
    // contributes NULL to the set, which makes NOT IN UNKNOWN for the
    // whole row — only orders whose set is empty (390 at sf0.01) or
    // all-non-null with no match (19) survive.
    engineSql("qe137_notin_theta_grouped_null",
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE o_orderkey < 2000 AND o_custkey NOT IN (
           SELECT CASE WHEN count(1) >= 3 THEN NULL ELSE min(c_custkey) END
           FROM customer WHERE c_acctbal > o_totalprice / 40
           GROUP BY c_nationkey)
         ORDER BY o_orderkey""",
      """select o_orderkey, o_custkey from orders
         where o_orderkey < 2000 and o_custkey not in (
           select case when count(1) >= 3 then null else min(c_custkey) end
           from customer where c_acctbal > o_totalprice / 40
           group by c_nationkey)
         order by o_orderkey"""),

    // ---- LIMIT/OFFSET body under a THETA-correlated IN ------------------
    // per customer: the 3rd..22nd most expensive orders above a
    // customer-specific threshold — the window partitions by the outer
    // rid (never a global sort), and membership is decided over the
    // kept slice only. 5 of 300 customers appear in their own slice.
    engineSql("qe138_in_theta_limit",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 300 AND c_custkey IN (
           SELECT o_custkey FROM orders
           WHERE o_totalprice > c_acctbal * 45
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 2)
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 300 and c_custkey in (
           select o_custkey from orders
           where o_totalprice > c_acctbal * 45
           order by o_totalprice desc, o_orderkey limit 2, 20)
         order by c_custkey"""),

    // ---- DISTINCT ON body under a THETA-correlated IN -------------------
    // keep-first per (outer row, l_returnflag) — which row survives
    // depends on the per-row set, so DISTINCT ON is NOT membership-blind
    // here; full tie-break (orderkey, linenumber) keeps both engines'
    // picks identical.
    engineSql("qe139_in_theta_distinct_on",
      """SELECT p_partkey, p_size FROM part
         WHERE p_partkey < 100 AND p_partkey % 50 IN (
           SELECT DISTINCT ON (l_returnflag) l_suppkey % 50 FROM lineitem
           WHERE l_quantity > p_size + 25
           ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey, l_linenumber)
         ORDER BY p_partkey""",
      """select p_partkey, p_size from part
         where p_partkey < 100 and p_partkey % 50 in (
           select distinct on (l_returnflag) l_suppkey % 50 from lineitem
           where l_quantity > p_size + 25
           order by l_returnflag, l_extendedprice desc, l_orderkey, l_linenumber)
         order by p_partkey"""),

    // ---- ORDER BY … LIMIT 1 OFFSET 1 under a THETA-correlated scalar ----
    // the runner-up order below a customer-scaled price ceiling — the
    // per-rid row_number window picks rank 2 of each customer's own
    // matching set (267 distinct picks across 300 customers; 23 NULL
    // where fewer than two orders qualify).
    engineSql("qe140_scalar_theta_top1_offset",
      """SELECT c_custkey,
           (SELECT o_orderkey FROM orders
            WHERE o_totalprice < c_acctbal * 40
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 1 OFFSET 1)
             AS runner_up
         FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""",
      """select c_custkey,
           (select o_orderkey from orders
            where o_totalprice < c_acctbal * 40
            order by o_totalprice desc, o_orderkey limit 1, 1)
             as runner_up
         from customer where c_custkey < 300 order by c_custkey"""),

    // ---- DISTINCT body under a scalar ORDER BY … LIMIT 1 OFFSET 1 -------
    // second-smallest DISTINCT line quantity per order: dedup before the
    // per-key rank makes repeated quantities count once, so the answer
    // differs from the row-level rank whenever the two cheapest lines
    // tie; 292 of 3000 orders have fewer than two distinct quantities
    // (NULL).
    engineSql("qe141_scalar_distinct_top1",
      """SELECT o_orderkey,
           (SELECT DISTINCT l_quantity FROM lineitem
            WHERE l_orderkey = o_orderkey
            ORDER BY l_quantity LIMIT 1 OFFSET 1) AS second_qty
         FROM orders WHERE o_orderkey < 3000 ORDER BY o_orderkey""",
      """select o_orderkey,
           (select distinct l_quantity from lineitem
            where l_orderkey = o_orderkey
            order by l_quantity limit 1, 1) as second_qty
         from orders where o_orderkey < 3000 order by o_orderkey"""),

    // ---- unigram lexical familiarity (perplexity proxy) -----------------
    // corpus token counts joined back per document: familiar_mass is the
    // integer core of a unigram log-prob score (logs/ratios left to the
    // caller for bit-stability). rareMax=100 marks the fixture's one
    // genuinely rare token ('dup', 26 occurrences vs 840+ for the rest).
    QueryDef(
      "qp82_lexical_familiarity",
      Some("""WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                 '[\p{L}]+|[0-9]+|[^\p{L}0-9\s]+')) AS tok FROM documents),
              c AS (SELECT tok, CAST(count(*) AS BIGINT) cnt FROM t GROUP BY tok)
          SELECT d.doc_id,
            COALESCE(x.n_tokens, 0) AS n_tokens,
            COALESCE(x.familiar_mass, 0) AS familiar_mass,
            COALESCE(x.n_rare, 0) AS n_rare
          FROM documents d LEFT JOIN (
            SELECT t.doc_id, CAST(count(*) AS BIGINT) n_tokens,
                   CAST(sum(c.cnt) AS BIGINT) familiar_mass,
                   CAST(count(CASE WHEN c.cnt <= 100 THEN 1 END) AS BIGINT) n_rare
            FROM t JOIN c USING (tok) GROUP BY t.doc_id) x USING (doc_id)
          ORDER BY doc_id"""),
      (s, dir) => Curation.lexicalFamiliarity(
        Tables.load(s, dir, "documents"), "doc_id", "text", rareMax = 100)),

    // ---- Gopher-style rule verdict --------------------------------------
    // keep/drop with the first failing rule named; thresholds sized so
    // the fixture exercises every branch that can fire on it (216
    // too_many_words / 31 long_words / 129 low_stopwords / 124 ok).
    QueryDef(
      "qp83_gopher_verdict",
      Some("""SELECT doc_id,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) END AS n_words,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) * 10
                      // CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) END AS mean_len_x10,
            CAST(len(list_intersect(list_distinct(regexp_split_to_array(trim(text), '\s+')),
                 ['the','a','of','and','to','in','is','it','that','for'])) AS BIGINT) AS stop_hits,
            CASE WHEN n_words < 5 THEN 'too_few_words'
                 WHEN n_words > 60 THEN 'too_many_words'
                 WHEN mean_len_x10 < 35 THEN 'short_words'
                 WHEN mean_len_x10 > 47 THEN 'long_words'
                 WHEN stop_hits < 2 THEN 'low_stopwords'
                 ELSE 'ok' END AS reason,
            (reason = 'ok') AS keep
          FROM documents ORDER BY doc_id"""),
      (s, dir) => Curation.gopherVerdict(
        Tables.load(s, dir, "documents"), "doc_id", "text")),

    // ---- ingest-time quality filtering (streaming curation) -------------
    // the same Gopher verdict applied AT READ TIME over a replayed
    // document stream (file source → append sink): the projection is
    // stateless, so the bounded replay's kept set is row-identical to
    // the batch filter — which IS the oracle. The pattern matters at
    // scale: filtering at ingest means rejected documents never hit
    // storage or a second batch pass.
    QueryDef(
      "qp84_stream_gopher_filter",
      Some("""SELECT doc_id,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) END AS n_words,
            CAST(len(list_intersect(list_distinct(regexp_split_to_array(trim(text), '\s+')),
                 ['the','a','of','and','to','in','is','it','that','for'])) AS BIGINT) AS stop_hits
          FROM documents
          WHERE (CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) END) BETWEEN 5 AND 60
            AND (CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) * 10
                           // CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) END) BETWEEN 35 AND 47
            AND CAST(len(list_intersect(list_distinct(regexp_split_to_array(trim(text), '\s+')),
                 ['the','a','of','and','to','in','is','it','that','for'])) AS BIGINT) >= 2
          ORDER BY doc_id"""),
      (s, dir) =>
        StreamRunner.replayParquet(s, s"$dir/documents.parquet",
            s"qp84_sink_${streamRuns.incrementAndGet()}", "append")(raw =>
          Curation.gopherVerdictProj(raw, "doc_id", "text")
            .filter(col("keep"))
            .select(col("doc_id"), col("n_words"), col("stop_hits")))
          .orderBy(col("doc_id"))),

    // ---- RIGHT SEMI / RIGHT ANTI joins with USING -----------------------
    // side-swapped to Spark's left-flavored variants; the output carries
    // the RIGHT side's columns with the key coalesced from the join.
    // 97 suppliers share a key with a near-ceiling order (qe142); the
    // other 3 don't (qe143).
    engineSql("qe142_right_semi_using",
      """SELECT sk, s_name FROM (SELECT s_suppkey AS sk, s_name FROM supplier) s
         SEMI JOIN (SELECT o_custkey % 100 AS sk FROM orders
                    WHERE o_totalprice > 490000) o USING (sk)
         ORDER BY sk""",
      """select sk, s_name from
           (select o_custkey % 100 as sk from orders
            where o_totalprice > 490000) as o
           right semi join
           (select s_suppkey as sk, s_name from supplier) as s using (sk)
         order by sk"""),
    engineSql("qe143_right_anti_using",
      """SELECT sk, s_name FROM (SELECT s_suppkey AS sk, s_name FROM supplier) s
         ANTI JOIN (SELECT o_custkey % 100 AS sk FROM orders
                    WHERE o_totalprice > 490000) o USING (sk)
         ORDER BY sk""",
      """select sk, s_name from
           (select o_custkey % 100 as sk from orders
            where o_totalprice > 490000) as o
           right anti join
           (select s_suppkey as sk, s_name from supplier) as s using (sk)
         order by sk"""),

    // ---- DISTINCT ON body in a correlated scalar lookup -----------------
    // keep-first per (order, returnflag): the 'R' pin makes at most ONE
    // ON-group per order, so the surviving row is a legal scalar — the
    // priciest returned line's number, NULL for the 836 orders with no
    // returned lines. Full tie-break keeps both engines' picks equal.
    engineSql("qe144_scalar_distinct_on",
      """SELECT o_orderkey,
           (SELECT DISTINCT ON (l_returnflag) l_linenumber FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
            ORDER BY l_returnflag, l_extendedprice DESC, l_linenumber)
             AS top_r_line
         FROM orders WHERE o_orderkey < 3000 ORDER BY o_orderkey""",
      """select o_orderkey,
           (select distinct on (l_returnflag) l_linenumber from lineitem
            where l_orderkey = o_orderkey and l_returnflag = 'R'
            order by l_returnflag, l_extendedprice desc, l_linenumber)
             as top_r_line
         from orders where o_orderkey < 3000 order by o_orderkey"""),

    // ---- LIMIT over one-row aggregate bodies (no-op composition) --------
    // grammars compose LIMIT onto any body; over an ungrouped aggregate
    // it bounds a one-row set and must be a no-op — exercised on BOTH
    // the equality scalar path and the theta IN path in one entry.
    engineSql("qe145_limit_over_agg",
      """SELECT c_custkey,
           (SELECT min(o_totalprice) FROM orders
            WHERE o_custkey = c_custkey LIMIT 1) AS min_spend
         FROM customer
         WHERE c_nationkey IN (SELECT min(s_nationkey) FROM supplier
                               WHERE s_acctbal > c_acctbal LIMIT 1)
         ORDER BY c_custkey""",
      """select c_custkey,
           (select min(o_totalprice) from orders
            where o_custkey = c_custkey limit 1) as min_spend
         from customer
         where c_nationkey in (select min(s_nationkey) from supplier
                               where s_acctbal > c_acctbal limit 1)
         order by c_custkey"""),

    // ---- GROUP BY … ORDER BY agg LIMIT 1 under a THETA scalar -----------
    // the busiest supplier among lines priced above an order-scaled
    // budget: surviving (rid, suppkey) groups rank per rid by their own
    // aggregate (count), ties by key — 56 of 300 orders have no
    // qualifying line (NULL). The window buckets are rid-sized.
    engineSql("qe146_scalar_theta_group_top1",
      """SELECT o_orderkey,
           (SELECT l_suppkey FROM lineitem
            WHERE l_extendedprice > o_totalprice / 4
            GROUP BY l_suppkey
            ORDER BY count(1) DESC, l_suppkey LIMIT 1) AS busiest_supp
         FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""",
      """select o_orderkey,
           (select l_suppkey from lineitem
            where l_extendedprice > o_totalprice / 4
            group by l_suppkey
            order by count(1) desc, l_suppkey limit 1) as busiest_supp
         from orders where o_orderkey < 300 order by o_orderkey"""),

    // ---- aggregated EXISTS under THETA correlation ----------------------
    // existence = at least one supplier group with >= 40 lines priced
    // above an order-scaled threshold; the rid-tagged grouped lowering
    // counts HAVING-surviving groups per outer row (307 of 500).
    engineSql("qe147_exists_theta_grouped",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 500 AND EXISTS (
           SELECT 1 FROM lineitem
           WHERE l_extendedprice > o_totalprice / 3
           GROUP BY l_suppkey HAVING count(1) >= 40)
         ORDER BY o_orderkey""",
      """select o_orderkey from orders
         where o_orderkey < 500 and exists (
           select 1 from lineitem
           where l_extendedprice > o_totalprice / 3
           group by l_suppkey having count(1) >= 40)
         order by o_orderkey"""),

    // ---- ungrouped HAVING body under theta NOT EXISTS -------------------
    // the one-aggregate-row-even-over-empty-sets rule is decisive: a
    // customer with fewer than 25 cheap-enough orders has a HAVING-false
    // row (NOT EXISTS true) — including customers with NO matching
    // orders at all (count = 0), which a bare semi join would get wrong.
    engineSql("qe148_not_exists_theta_having",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 500 AND NOT EXISTS (
           SELECT max(o_orderkey) FROM orders
           WHERE o_totalprice < c_acctbal * 20
           HAVING count(1) >= 25)
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 500 and not exists (
           select max(o_orderkey) from orders
           where o_totalprice < c_acctbal * 20
           having count(1) >= 25)
         order by c_custkey"""),

    // ---- end-to-end training manifest -----------------------------------
    // the composed curation tail (exact dedup → domain cap → split
    // assignment) as one entry: 400 of 500 docs survive the cap at
    // sf0.01 and every split region is represented. The oracle chains
    // the three stages' proven SQL forms.
    QueryDef(
      "qp85_training_manifest",
      Some("""WITH f AS (SELECT doc_id, source,
                md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
              FROM documents),
          d AS (SELECT doc_id, source,
                ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM f),
          kept AS (SELECT doc_id, source FROM d WHERE rn = 1),
          capped AS (SELECT doc_id, source,
                ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY ((doc_id % 1000003) * 2654435761) % 1000000007,
                           doc_id) AS rk
              FROM kept)
          SELECT doc_id, source,
            CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000 < 10 THEN 'test'
                 WHEN ((doc_id % 1000003) * 2654435761) % 1000 < 60 THEN 'val'
                 ELSE 'train' END AS split
          FROM capped WHERE rk <= 20 ORDER BY doc_id"""),
      (s, dir) => Curation.trainingManifest(
        Tables.load(s, dir, "documents"), "doc_id", "text", "source",
        cap = 20)),

    // ---- LIMIT … WITH TIES inside a correlated IN body ------------------
    // the per-key membership set keeps every row tying with the 2nd on
    // the (deliberately collision-heavy) sort key — the rank() cut.
    // DuckDB has no WITH TIES, so the oracle states the rank() form
    // directly; ties are decisive for 11 of 566 kept orders at sf0.01.
    engineSql("qe149_in_limit_with_ties",
      """SELECT o_orderkey FROM orders o
         WHERE o_orderkey < 3000 AND o_custkey % 10 IN (
           SELECT v FROM (
             SELECT l_orderkey AS lk, l_linenumber AS v,
                    rank() OVER (PARTITION BY l_orderkey
                                 ORDER BY l_quantity DESC) rk
             FROM lineitem) t
           WHERE t.lk = o.o_orderkey AND rk <= 2)
         ORDER BY o_orderkey""",
      """select o_orderkey from orders
         where o_orderkey < 3000 and o_custkey % 10 in (
           select l_linenumber from lineitem
           where l_orderkey = o_orderkey
           order by l_quantity desc limit 2 with ties)
         order by o_orderkey"""))
}
