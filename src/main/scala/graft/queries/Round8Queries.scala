package graft.queries

/** Round-8 additions.
  *
  * Diagnostics: qp76a extends qe75's tokenizer pin from `doc_id < 100`
  * to the FULL documents table — its verdict tells us whether the
  * BPE-ish regex (`[\p{L}]+|[0-9]+|[^\p{L}0-9\s]+`,
  * /root/reference-independent; see TextOps.bpeishTokens) is safe for
  * any future oracle on the driver's DuckDB build. qp76 itself no
  * longer depends on it (the packing entry is tokenizer-portable as of
  * r8 — Round6Queries.scala).
  *
  * Dialect: the r7 missing-list corners — theta-correlated scalar
  * DISTINCT bodies, WITH TIES + OFFSET inside correlated IN bodies,
  * nested IN bodies with LIMIT/OFFSET under grandparent correlation —
  * all shapes the reference grammar composes freely
  * (/root/reference/src/parser/mod.rs:1229-1245,293-297,503-544,
  * 1404,1439-1440).
  */
object Round8Queries {

  import org.apache.spark.sql.functions._
  import graft.Tables

  private def engineSql(name: String, oracle: String, nutql: String): QueryDef =
    QueryDef(name, Some(oracle), (s, dir) => Engines.get(s, dir).execute(nutql))

  val defs: Seq[QueryDef] = Seq(

    // ---- full-range tokenizer pin (VERDICT r7 #1a) ----------------------
    // qe75 proved both tokenizers driver-portable for doc_id < 100; this
    // entry drops the filter so the verdict covers every document the
    // suite ever tokenizes. If this is green, the bpeish regex is safe
    // for future oracles on the driver's DuckDB build; if red, the
    // per-column decomposition (ws vs bpeish) localizes the construct.
    QueryDef("qp76a_tokens_full",
      Some("""SELECT doc_id,
                CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
                CAST(len(regexp_extract_all(text, '[\p{L}]+|[0-9]+|[^\p{L}0-9\s]+')) AS BIGINT) AS bpeish_tokens
              FROM documents ORDER BY doc_id"""),
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            size(graft.pipeline.TextOps.tokens(col("text"))).cast("long").as("ws_tokens"),
            graft.pipeline.TextOps.bpeishTokenCount(col("text")).cast("long").as("bpeish_tokens"))
          .orderBy(col("doc_id"))
      }),

    // ---- theta scalar DISTINCT top-1 (VERDICT r7 missing #1) ------------
    // SELECT DISTINCT … ORDER BY … LIMIT 1 OFFSET k under a non-equality
    // correlation: the (k+1)-th DISTINCT value in sort order, per outer
    // row. The equality path proved the dedup-before-rank lowering
    // (qe141/qe144); this pins the theta analog — and rides the band
    // pre-thin, not a BNLJ. Reference: scalar subqueries and DISTINCT
    // compose freely (/root/reference/src/parser/mod.rs:1229-1245,293-297).
    engineSql("qe150_scalar_theta_distinct",
      """SELECT o_orderkey,
           (SELECT DISTINCT l_suppkey FROM lineitem
            WHERE l_extendedprice > o_totalprice / 3
            ORDER BY l_suppkey DESC LIMIT 1 OFFSET 2) AS third_supp
         FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""",
      """select o_orderkey,
           (select distinct l_suppkey from lineitem
            where l_extendedprice > o_totalprice / 3
            order by l_suppkey desc limit 1 offset 2) as third_supp
         from orders where o_orderkey < 300 order by o_orderkey"""),

    // ---- WITH TIES + OFFSET inside a correlated IN body (missing #2) ----
    // per-key threshold-rank semantics: drop the first 2 rows by
    // position, keep through the RANK of the 5th row (ties of the
    // boundary row extend past the fetch). DuckDB has no WITH TIES, so
    // the oracle states the threshold-rank form directly (the same
    // formula the top-level withTies lowering implements). The selected
    // value IS the sort key, so the kept value set is deterministic
    // even where ties straddle the offset. Reference grammar:
    // `LIMIT o,n WITH TIES` (/root/reference/src/parser/mod.rs:503-544).
    engineSql("qe151_in_ties_offset",
      """SELECT o_orderkey FROM orders o
         WHERE o_orderkey < 3000 AND (o_orderkey % 47 + 1) IN (
           SELECT v FROM (
             SELECT lk, v, rn, rk,
                    max(CASE WHEN rn = 5 THEN rk END)
                      OVER (PARTITION BY lk) AS thr
             FROM (
               SELECT l_orderkey AS lk, l_quantity AS v,
                      row_number() OVER w AS rn, rank() OVER w AS rk
               FROM lineitem
               WINDOW w AS (PARTITION BY l_orderkey
                            ORDER BY l_quantity DESC)) s) t
           WHERE t.lk = o.o_orderkey AND rn > 2
             AND (thr IS NULL OR rk <= thr))
         ORDER BY o_orderkey""",
      """select o_orderkey from orders
         where o_orderkey < 3000 and (o_orderkey % 47 + 1) in (
           select l_quantity from lineitem
           where l_orderkey = o_orderkey
           order by l_quantity desc limit 3 offset 2 with ties)
         order by o_orderkey"""),

    // ---- theta grouped EXISTS with LIMIT/OFFSET (ADVICE r7) -------------
    // EXISTS over a GROUP BY body with LIMIT 5 OFFSET 1 under theta
    // correlation ≡ more than 1 HAVING-surviving group per outer row
    // (LIMIT n >= 1 never changes existence; OFFSET feeds the
    // survivors count). Was a hard error while the equality path
    // accepted the same shape.
    engineSql("qe152_exists_theta_limit_offset",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 500 AND EXISTS (
           SELECT l_suppkey FROM lineitem
           WHERE l_extendedprice > o_totalprice / 4
           GROUP BY l_suppkey HAVING count(1) > 40
           LIMIT 5 OFFSET 1)
         ORDER BY o_orderkey""",
      """select o_orderkey from orders
         where o_orderkey < 500 and exists (
           select l_suppkey from lineitem
           where l_extendedprice > o_totalprice / 4
           group by l_suppkey having count(1) > 40
           limit 5 offset 1)
         order by o_orderkey"""),

    // ---- theta ungrouped-HAVING EXISTS with LIMIT (ADVICE r7) -----------
    // the ungrouped body yields at most one aggregate row, so LIMIT 1
    // is a no-op on existence — previously rejected on the theta path.
    engineSql("qe153_exists_theta_having_limit",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 500 AND EXISTS (
           SELECT count(1) FROM lineitem
           WHERE l_extendedprice > o_totalprice / 4
           HAVING count(1) > 100 LIMIT 1)
         ORDER BY o_orderkey""",
      """select o_orderkey from orders
         where o_orderkey < 500 and exists (
           select count(1) from lineitem
           where l_extendedprice > o_totalprice / 4
           having count(1) > 100 limit 1)
         order by o_orderkey"""),

    // ---- nested IN body with LIMIT under grandparent correlation --------
    // (VERDICT r7 missing #3 / task #6.) The nested body references BOTH
    // the parent (o_orderkey) and the grandparent (c_acctbal), so the
    // membership set is the per-(customer, order)-pair top-2 slice —
    // the rid-window lowering. 1 is in the top-2-by-desc linenumber iff
    // the pair's qualifying lineitem count is <= 2. Order keys are
    // unique per pair (l_linenumber), so the kept set is deterministic
    // in both engines.
    engineSql("qe154_nested_in_limit",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 300 AND EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND 1 IN (
               SELECT l_linenumber FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_extendedprice > c_acctbal / 10
                ORDER BY l_linenumber DESC LIMIT 2))
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 300 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 1 in (
               select l_linenumber from lineitem
                where l_orderkey = o_orderkey
                  and l_extendedprice > c_acctbal / 10
                order by l_linenumber desc limit 2))
         order by c_custkey"""),

    // ---- nested NOT IN + LIMIT/OFFSET NULL corners ----------------------
    // Three-valued membership against the per-pair second-smallest
    // slice: a NULL lhs (custkey % 7 = 0) against a NON-EMPTY slice is
    // UNKNOWN → the pair is pruned; an EMPTY slice (fewer than 2
    // qualifying rows) keeps the pair even under a NULL lhs; and a NULL
    // slice VALUE (linenumber 2 maps to NULL) poisons every remaining
    // lhs. ORDER BY stays on the raw linenumber so the kept slice is
    // deterministic while its VALUE can be NULL.
    engineSql("qe155_nested_notin_null_corners",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 300 AND EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND (CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE 3 END) NOT IN (
               SELECT CASE WHEN l_linenumber = 2 THEN NULL ELSE l_linenumber END
                 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_extendedprice > c_acctbal / 10
                ORDER BY l_linenumber LIMIT 1 OFFSET 1))
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 300 and exists (
           select 1 from orders where o_custkey = c_custkey
             and (case when c_custkey % 7 = 0 then null else 3 end) not in (
               select case when l_linenumber = 2 then null else l_linenumber end
                 from lineitem
                where l_orderkey = o_orderkey
                  and l_extendedprice > c_acctbal / 10
                order by l_linenumber limit 1 offset 1))
         order by c_custkey"""),

    // ---- nested IN + LIMIT WITH TIES under grandparent correlation ------
    // The slice orders by a NON-unique key (l_suppkey % 10) so WITH
    // TIES genuinely extends past the LIMIT boundary; the select value
    // equals the order key, so every tie shares the value and the
    // membership set is deterministic in both engines. DuckDB has no
    // WITH TIES syntax; since value = sort key, `0 IN top-1-with-ties`
    // ⟺ `min(value) = 0` (empty set → NULL → UNKNOWN on both sides).
    engineSql("qe156_nested_in_ties",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 300 AND EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND 0 = (
               SELECT min(l_suppkey % 10) FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_extendedprice > c_acctbal / 10))
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 300 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 0 in (
               select l_suppkey % 10 from lineitem
                where l_orderkey = o_orderkey
                  and l_extendedprice > c_acctbal / 10
                order by l_suppkey % 10 limit 1 with ties))
         order by c_custkey"""),

    // ---- DISTINCT ON in a nested IN body (VERDICT r7 missing #4) --------
    // keep-first per (candidate pair, ON key) in the body's ORDER BY —
    // the depth-1 qe132 lowering lifted one level. The membership set
    // per (customer, order) pair is {first even, first odd} qualifying
    // linenumber; 1 is a member iff linenumber 1 qualifies (it is the
    // smallest odd). Order keys are unique per pair, so the kept rows
    // are deterministic in both engines. Reference composes DISTINCT ON
    // at any depth (/root/reference/src/parser/mod.rs:349-360,1404).
    engineSql("qe157_nested_in_distinct_on",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 300 AND EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND 1 IN (
               SELECT DISTINCT ON (l_linenumber % 2) l_linenumber
                 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_extendedprice > c_acctbal / 10
                ORDER BY l_linenumber % 2, l_linenumber))
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 300 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 1 in (
               select distinct on (l_linenumber % 2) l_linenumber
                 from lineitem
                where l_orderkey = o_orderkey
                  and l_extendedprice > c_acctbal / 10
                order by l_linenumber % 2, l_linenumber))
         order by c_custkey"""),

    // ---- DISTINCT ON + LIMIT/OFFSET in a nested IN body -----------------
    // the slice applies AFTER the keep-first: of {first even, first odd}
    // in (parity, linenumber) order, skip 1 keep 1 — membership is the
    // first odd qualifying linenumber when an even one also qualifies.
    engineSql("qe158_nested_in_distinct_on_limit",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 300 AND EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND 3 IN (
               SELECT DISTINCT ON (l_linenumber % 2) l_linenumber
                 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_extendedprice > c_acctbal / 10
                ORDER BY l_linenumber % 2, l_linenumber
                LIMIT 1 OFFSET 1))
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 300 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 3 in (
               select distinct on (l_linenumber % 2) l_linenumber
                 from lineitem
                where l_orderkey = o_orderkey
                  and l_extendedprice > c_acctbal / 10
                order by l_linenumber % 2, l_linenumber
                limit 1 offset 1))
         order by c_custkey"""),

    // ---- EXISTS over a DISTINCT ON body with OFFSET ---------------------
    // existence ⟺ MORE THAN 2 post-DISTINCT-ON rows ⟺ more than 2
    // distinct ON-key tuples — the counting rewrite must count DISTINCT
    // keys, not raw rows (an order with many lineitems but ≤ 2 distinct
    // suppkey buckets must NOT match).
    engineSql("qe159_nested_exists_distinct_on_offset",
      """SELECT c_custkey FROM customer
         WHERE c_custkey < 300 AND EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND EXISTS (
               SELECT DISTINCT ON (l_suppkey % 5) l_suppkey
                 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_extendedprice > c_acctbal / 10
                ORDER BY l_suppkey % 5, l_suppkey
                LIMIT 100 OFFSET 2))
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where c_custkey < 300 and exists (
           select 1 from orders where o_custkey = c_custkey
             and exists (
               select distinct on (l_suppkey % 5) l_suppkey
                 from lineitem
                where l_orderkey = o_orderkey
                  and l_extendedprice > c_acctbal / 10
                order by l_suppkey % 5, l_suppkey
                limit 100 offset 2))
         order by c_custkey"""),

    // ---- depth-1 EXISTS over a plain-DISTINCT body with OFFSET ----------
    // same counting contract one level up: more than 3 DISTINCT
    // l_suppkey % 7 values per order (raw-row counting would also match
    // orders with ≥ 4 lineitems in ≤ 3 buckets — silently wrong before
    // round 8).
    engineSql("qe160_exists_distinct_offset",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey < 3000 AND EXISTS (
           SELECT DISTINCT l_suppkey % 7 FROM lineitem
            WHERE l_orderkey = o_orderkey
            LIMIT 100 OFFSET 3)
         ORDER BY o_orderkey""",
      """select o_orderkey from orders
         where o_orderkey < 3000 and exists (
           select distinct l_suppkey % 7 from lineitem
            where l_orderkey = o_orderkey
            limit 100 offset 3)
         order by o_orderkey"""),

    // ---- OUTER JOIN ON subqueries correlating with BOTH sides -----------
    // (VERDICT r7 missing #5.) The EXISTS references o_orderkey (right)
    // AND c_acctbal (left), so neither side can host the lowered flag
    // pre-join — the candidate-pair route decides each pair, then
    // null-extends customers with no surviving order. DuckDB 1.0 cannot
    // run subqueries in a non-inner ON ("Cannot perform non-inner join
    // on subquery!"), so the oracle states the equivalent aggregate
    // form: EXISTS(price > T) ⟺ max(price) > T (empty set → NULL → no
    // match). Reference allows any ON expression (mod.rs:419-429).
    engineSql("qe161_left_on_exists_both_sides",
      """select c.c_custkey, o.o_orderkey from customer c
         left join (select o_orderkey, o_custkey,
                           (select max(l_extendedprice) from lineitem
                             where l_orderkey = o_orderkey) as mx
                      from orders) o
           on o.o_custkey = c.c_custkey and o.mx > c.c_acctbal / 2
         where c.c_custkey < 300
         order by c.c_custkey, o.o_orderkey""",
      """SELECT c_custkey, o_orderkey FROM customer
         LEFT JOIN orders ON o_custkey = c_custkey
           AND EXISTS (SELECT 1 FROM lineitem
                        WHERE l_orderkey = o_orderkey
                          AND l_extendedprice > c_acctbal / 2)
         WHERE c_custkey < 300
         ORDER BY c_custkey, o_orderkey"""),

    // ---- FULL JOIN ON both-sides IN subquery ----------------------------
    // membership needs the pair: the body filters lineitem by the RIGHT
    // side's suppkey and the LEFT side's custkey bucket. The oracle
    // reconstructs the FULL join from the matched pair set (all keys
    // non-null, so NOT IN is safe there).
    engineSql("qe162_full_on_in_both_sides",
      """with pairs as (
           select c.c_custkey, s.s_suppkey from customer c
           join supplier s on c.c_nationkey = s.s_nationkey
          where exists (select 1 from lineitem l
                         where l.l_suppkey = s.s_suppkey
                           and l.l_partkey % 3 = c.c_custkey % 3
                           and l.l_linenumber = c.c_custkey % 10))
         select c_custkey, s_suppkey from pairs
         union all
         select c_custkey, cast(null as bigint) from customer
          where c_custkey not in (select c_custkey from pairs)
         union all
         select cast(null as bigint), s_suppkey from supplier
          where s_suppkey not in (select s_suppkey from pairs)
         order by c_custkey, s_suppkey""",
      """SELECT c_custkey, s_suppkey FROM customer
         FULL JOIN supplier ON c_nationkey = s_nationkey
           AND c_custkey % 10 IN (SELECT l_linenumber FROM lineitem
                                   WHERE l_suppkey = s_suppkey
                                     AND l_partkey % 3 = c_custkey % 3)
         ORDER BY c_custkey, s_suppkey"""),

    // ---- RIGHT JOIN ON both-sides correlated scalar ---------------------
    // the scalar count filters lineitem by the LEFT side's orderkey and
    // compares against the RIGHT side's suppkey — suppliers keeping no
    // order null-extend.
    engineSql("qe163_right_on_scalar_both_sides",
      """with pairs as (
           select o.o_orderkey, s.s_suppkey from orders o
           join supplier s on o.o_orderkey % 100 = s.s_suppkey
          where (select count(1) from lineitem l
                  where l.l_orderkey = o.o_orderkey
                    and l.l_suppkey > s.s_suppkey) > 2)
         select o_orderkey, s_suppkey from pairs
         union all
         select cast(null as bigint), s_suppkey from supplier
          where s_suppkey not in (select s_suppkey from pairs)
         order by o_orderkey, s_suppkey""",
      """SELECT o_orderkey, s_suppkey FROM orders
         RIGHT JOIN supplier ON o_orderkey % 100 = s_suppkey
           AND (SELECT count(1) FROM lineitem
                 WHERE l_orderkey = o_orderkey
                   AND l_suppkey > s_suppkey) > 2
         ORDER BY o_orderkey, s_suppkey"""),

    // ---- token-budget corpus selection (qp86) ---------------------------
    // greedy by integer quality score (distinct en-stopword hits, the
    // qp56 signal) desc with id tie-break; keep documents while the
    // INCLUSIVE cumulative whitespace-token count fits the budget. All
    // compared quantities are BIGINT (the window sum CASTs — the qp76
    // lesson), so the cut is bit-identical across engines.
    QueryDef("qp86_token_budget",
      Some("""WITH t AS (SELECT doc_id,
                CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
                     ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) END AS n_tokens,
                CAST(len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')),
                     ['the','a','of','and','to','in','is','it','that','for'])) AS BIGINT) AS score
              FROM documents),
             c AS (SELECT doc_id, n_tokens, score,
                CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
              FROM t)
             SELECT doc_id, n_tokens, score, cum_tokens FROM c
             WHERE cum_tokens <= 12000 ORDER BY doc_id"""),
      (s, dir) => graft.pipeline.Curation.tokenBudgetSelect(
        Tables.load(s, dir, "documents"), "doc_id", "text", 12000L)),

    // ---- deterministic per-source hash sampling (qp87) ------------------
    // reproducible weighted downsampling: a fixed LCG permille on the id
    // against a per-source rate table (broadcast; default for unlisted
    // sources). Pure projection + filter — zero shuffle at any scale.
    QueryDef("qp87_hash_sample",
      Some("""WITH t AS (SELECT doc_id, source,
                ((doc_id % 999983) * 1000003 + 12345) % 999983 * 2654435761 % 1000 AS mix
              FROM documents)
             SELECT doc_id, source, mix FROM t
             WHERE mix < CASE WHEN source = 'src0' THEN 900
                              WHEN source = 'src1' THEN 500
                              WHEN source = 'src2' THEN 250
                              WHEN source = 'src3' THEN 100
                              ELSE 400 END
             ORDER BY doc_id"""),
      (s, dir) => graft.pipeline.Curation.hashSample(
        Tables.load(s, dir, "documents"), "doc_id", "source",
        Map("src0" -> 900, "src1" -> 500, "src2" -> 250, "src3" -> 100),
        defaultPermille = 400)),

    // ---- length-bucketed batch construction (qp88) ----------------------
    // sequence-length bucketing: bucket by n_tokens DIV 16, then a
    // deterministic id-ordered rank within the bucket splits into
    // (batch_index, batch_pos) by batch size 8 — batches pad to the
    // bucket ceiling instead of the corpus max. The rank uses the
    // sub-bucketed offset pattern (shufflePositions scoped per bucket),
    // never a bucket-sized window partition.
    QueryDef("qp88_length_batches",
      Some("""WITH t AS (SELECT doc_id,
                CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
                     ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) END AS n_tokens
              FROM documents),
             r AS (SELECT doc_id, n_tokens, n_tokens // 16 AS bucket,
                row_number() OVER (PARTITION BY n_tokens // 16 ORDER BY doc_id) - 1 AS rk
              FROM t)
             SELECT doc_id, n_tokens, bucket, rk // 8 AS batch_index,
                    rk % 8 AS batch_pos
             FROM r ORDER BY doc_id"""),
      (s, dir) => graft.pipeline.Curation.lengthBatches(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        bucketWidth = 16, batchSize = 8)),

    // ---- streaming stream-static enrichment join (qp89) -----------------
    // ingest-time dimension enrichment: the event stream broadcast-joins
    // a static dim table per micro-batch — stateless (no watermark, no
    // state store), so a bounded replay's output is row-identical to the
    // batch join, which is exactly what gives this streaming path a
    // DuckDB oracle. At scale the static side re-broadcasts per batch
    // and the stream side never shuffles.
    QueryDef("qp89_stream_enrich",
      Some("""SELECT e.event_id, e.user_id, s.s_name
              FROM events e
              JOIN supplier s ON e.user_id % 100 + 1 = s.s_suppkey
              ORDER BY e.event_id"""),
      (s, dir) => {
        val dim = Tables.load(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))
        StreamRunner.replayParquet(s, s"$dir/events.parquet",
            s"qp89_sink_${streamRuns.incrementAndGet()}", "append")(raw =>
          raw.join(broadcast(dim),
              pmod(col("user_id"), lit(100L)) + lit(1L) === col("s_suppkey"))
            .select(col("event_id"), col("user_id"), col("s_name")))
          .orderBy(col("event_id"))
      })
  )

  private val streamRuns = new java.util.concurrent.atomic.AtomicInteger(0)
}
