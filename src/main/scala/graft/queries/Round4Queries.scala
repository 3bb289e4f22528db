package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-4 driver-oracle entries, one per VERDICT r3 "next round" item
  * that changes observable behavior: aggregated EXISTS under OR (qe78),
  * dynamic LIKE/ILIKE patterns (qe79), correlated IN with GROUP BY/
  * HAVING and DISTINCT bodies (qe80, qe82), `$n` parameters in
  * table-function args (qe81), Serial32 id assignment (qe83 — the
  * ADVICE r3 overflow scenario, multi-row inserts on a 32-bit serial),
  * and a Structured Streaming micro-batch entry (qp60) so the streaming
  * layer is no longer spec-only: the tumbling-window aggregation runs
  * through readStream → writeStream and its counts hash-match a plain
  * DuckDB GROUP BY (no late data in a replay, so the watermark drops
  * nothing and the streaming result equals the batch result).
  */
object Round4Queries {

  private def script(name: String, oracle: Option[String],
      stmts: String => Seq[String]): QueryDef =
    QueryDef(name, oracle, (s, dir) => {
      val e = Engines.get(s, dir)
      val list = stmts(dir)
      list.init.foreach(e.execute(_))
      e.execute(list.last)
    })

  private def engineSql(name: String, oracle: String, nutql: String): QueryDef =
    QueryDef(name, Some(oracle), (s, dir) => Engines.get(s, dir).execute(nutql))

  /** Unique memory-sink names across repeated runs (bench runs each
    * entry twice in one session). */
  private val streamRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  val defs: Seq[QueryDef] = Seq(

    // ---- aggregated EXISTS (GROUP BY + HAVING) under OR -----------------
    // expression position forces the mark-join flag lowering; the left
    // disjunct keeps the OR from collapsing into a plain conjunct
    engineSql("qe78_exists_having_or",
      """SELECT p_partkey, p_name FROM part
         WHERE p_partkey < 50
            OR EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
                       GROUP BY l_partkey
                       HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 700)
         ORDER BY p_partkey""",
      """select p_partkey, p_name from part
         where p_partkey < 50
            or exists (select 1 from lineitem where l_partkey = p_partkey
                       group by l_partkey
                       having sum(toDecimal(l_quantity, 12, 2)) > 700)
         order by p_partkey"""),

    // ---- dynamic LIKE / ILIKE patterns (any expression rhs) -------------
    // pattern is built per row: matches when the zero-padded customer
    // name ends in the digit c_custkey % 7 — selective and deterministic
    engineSql("qe79_like_dynamic",
      """SELECT c_custkey, c_name FROM customer
         WHERE c_name ILIKE 'customer#%' || CAST(c_custkey % 7 AS VARCHAR)
            OR c_name LIKE '%' || CAST(c_custkey % 11 AS VARCHAR) || '_'
         ORDER BY c_custkey""",
      """select c_custkey, c_name from customer
         where c_name ilike 'customer#%' + toString(c_custkey % 7)
            or c_name like '%' + toString(c_custkey % 11) + '_'
         order by c_custkey"""),

    // ---- correlated IN with a GROUP BY + HAVING body --------------------
    // "customers with exactly 10 orders in some status group of size>=5":
    // the value set is per-group aggregate values, keyed by correlation
    engineSql("qe80_in_grouped",
      """SELECT c_custkey, c_name FROM customer
         WHERE 10 IN (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey
                      GROUP BY o_orderstatus HAVING COUNT(*) >= 5)
         ORDER BY c_custkey""",
      """select c_custkey, c_name from customer
         where 10 in (select count(*) from orders where o_custkey = c_custkey
                      group by o_orderstatus having count(*) >= 5)
         order by c_custkey"""),

    // ---- $n parameters in table-function arguments ----------------------
    QueryDef("qe81_tablefn_params",
      Some("""SELECT CAST(100 AS BIGINT) AS n, CAST(4950 AS BIGINT) AS s,
                     CAST(5 AS BIGINT) AS regions"""),
      (s, dir) => Engines.get(s, dir).execute(
        """select n, s, regions from
             (select count(*) as n, sum(number) as s from numbers($0)) as a
             join (select count(*) as regions from file($1)) as b on 1 = 1""",
        Seq(100, s"$dir/region.parquet"))),

    // ---- correlated IN with a DISTINCT body -----------------------------
    engineSql("qe82_in_distinct",
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE o_orderkey < 1000
           AND o_orderstatus IN (SELECT DISTINCT o_orderstatus FROM orders o2
                                 WHERE o2.o_custkey = orders.o_custkey
                                   AND o2.o_totalprice > 200000)
         ORDER BY o_orderkey""",
      """select o_orderkey, o_orderstatus from orders
         where o_orderkey < 1000
           and o_orderstatus in (select distinct o_orderstatus from orders as o2
                                 where o2.o_custkey = orders.o_custkey
                                   and o2.o_totalprice > 200000)
         order by o_orderkey"""),

    // ---- Serial32 multi-row id assignment (ADVICE r3: the 32-bit cast
    // overflow scenario — ids must come out dense regardless of how the
    // insert batches partition) ------------------------------------------
    script("qe83_serial32",
      Some("""SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd'), (5, 'e'))
              AS t(id, name) ORDER BY id"""),
      _ => Seq(
        "drop table if exists qe83_t",
        "create table qe83_t (id Serial32, name String)",
        "insert into qe83_t (name) values ('a'), ('b'), ('c')",
        "insert into qe83_t (name) values ('d'), ('e')",
        "select id, name from qe83_t order by id")),

    // ---- EXISTS with HAVING over an UNGROUPED aggregate -----------------
    // the local quantity filter leaves MANY parts with an EMPTY inner
    // set, whose ungrouped COUNT row (0) must satisfy the HAVING — a
    // lowering that drops empty keys returns far fewer rows
    engineSql("qe85_exists_empty_having",
      """SELECT p_partkey FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_partkey = p_partkey AND l_quantity > 49
                       HAVING COUNT(*) = 0)
         ORDER BY p_partkey""",
      """select p_partkey from part
         where exists (select 1 from lineitem
                       where l_partkey = p_partkey and l_quantity > 49
                       having count(*) = 0)
         order by p_partkey"""),

    // ---- correlated IN over an ungrouped aggregate ----------------------
    // customers with NO order above the price floor: their subquery
    // value set is {0} (ungrouped COUNT over an empty set), so
    // 0 IN (...) is TRUE — an empty-set-as-no-value lowering misses them
    engineSql("qe86_in_zero_count",
      """SELECT c_custkey, c_name FROM customer
         WHERE 0 IN (SELECT COUNT(*) FROM orders
                     WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey""",
      """select c_custkey, c_name from customer
         where 0 in (select count(*) from orders
                     where o_custkey = c_custkey and o_totalprice > 400000)
         order by c_custkey"""),

    // ---- correlated scalar subquery with GROUP BY (grouped body) --------
    // grouping by the correlation key keeps exactly one group per outer
    // row; customers with no orders get NULL (grouped semantics — no
    // surviving group, unlike the ungrouped count-as-0 case)
    engineSql("qe87_corr_scalar_grouped",
      """SELECT c_custkey,
                (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey
                 GROUP BY o_custkey) AS ocnt
         FROM customer ORDER BY c_custkey""",
      """select c_custkey,
                (select count(*) from orders where o_custkey = c_custkey
                 group by o_custkey) as ocnt
         from customer order by c_custkey"""),

    // ---- correlated scalar subquery with HAVING over ungrouped agg ------
    // the one aggregate row exists even for customers with no orders
    // (count 0), and HAVING filters it — NULL unless count > 5
    engineSql("qe88_corr_scalar_having",
      """SELECT c_custkey,
                (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey
                 HAVING COUNT(*) > 5) AS big
         FROM customer ORDER BY c_custkey""",
      """select c_custkey,
                (select count(*) from orders where o_custkey = c_custkey
                 having count(*) > 5) as big
         from customer order by c_custkey"""),

    // ---- GROUP BY select-alias inside a correlated subquery body --------
    // ClickHouse-style alias grouping (GROUP BY st where st is a select
    // alias), checked against DuckDB's identical alias support
    engineSql("qe89_in_group_alias",
      """SELECT c_custkey FROM customer
         WHERE 'O' IN (SELECT o_orderstatus AS st FROM orders
                       WHERE o_custkey = c_custkey GROUP BY st)
         ORDER BY c_custkey""",
      """select c_custkey from customer
         where 'O' in (select o_orderstatus as st from orders
                       where o_custkey = c_custkey group by st)
         order by c_custkey"""),

    // ---- incremental Summing-view maintenance ---------------------------
    // the view is materialized ONCE, then two separate inserts land via
    // the delta-merge path (O(delta), no source recompute); the final
    // select must show fully merged sums. EngineSpec asserts the
    // materialization stayed FRESH through the inserts (true increment,
    // not invalidate+recompute); this entry proves the merged VALUES.
    script("qe84_summing_delta",
      Some("""SELECT * FROM (VALUES (1, CAST(16 AS BIGINT)), (2, CAST(23 AS BIGINT)),
                                    (3, CAST(30 AS BIGINT)))
              AS t(k, v) ORDER BY k"""),
      _ => Seq(
        "drop view if exists qe84_v",
        "drop table if exists qe84_t",
        "create table qe84_t (k Int32, v Int64)",
        "insert into qe84_t values (1, 10), (2, 20), (1, 5)",
        "create view qe84_v update by Summing order by k as select k, v from qe84_t",
        "optimize table qe84_v",
        "insert into qe84_t values (2, 3), (3, 30)",
        "insert into qe84_t values (1, 1)",
        "select k, v from qe84_v order by k")),

    // ---- content-defined chunking: shared-passage pairs -----------------
    // FULL DuckDB oracle (VERDICT r8 #8, the qp54/qp51 integer-replay
    // recipe): the PORTABLE chunker's window hash is a base-257
    // polynomial of the last min(i, 32) bytes mod 1e9+7 — content-local
    // and minSize-free — so the oracle rebuilds it from byte-prefix
    // hashes (one recursive CTE walking each doc's bytes, one building
    // 257-powers; hash(a..b] = P_b − P_a·257^(b−a) mod p), cuts where
    // the window hash ≡ 0 mod 2^6, hashes each segment with the same
    // algebra, and replays the capped bucket join + pair count. The
    // Buzhash+FNV production path keeps its CdcSpec shift-resilience
    // and planted-passage proofs. Powers capped at 4096 ≡ the chunker's
    // max window; docs are ≤ ~600 bytes (TESTDATA), well under it.
    QueryDef("qp61_cdc_shared_chunks",
      Some(OracleBytes.expand("""WITH RECURSIVE
          d AS (SELECT doc_id, hex(encode(text)) AS hx,
                octet_length(encode(text)) AS len
                FROM documents WHERE octet_length(encode(text)) > 0),
          pre AS (
            SELECT doc_id, 0 AS i, CAST(0 AS BIGINT) AS ph, len, hx FROM d
            UNION ALL
            SELECT doc_id, i + 1, (ph * 257 + BYTEAT{i}) % 1000000007,
                   len, hx
            FROM pre WHERE i < len),
          pw AS (
            SELECT 0 AS e, CAST(1 AS BIGINT) AS v
            UNION ALL SELECT e + 1, (v * 257) % 1000000007 FROM pw WHERE e < 4096),
          wh AS (SELECT a.doc_id, a.i,
                   ((a.ph - b.ph * pw.v) % 1000000007 + 1000000007) % 1000000007 AS wh
                 FROM pre a
                 JOIN pre b ON b.doc_id = a.doc_id AND b.i = a.i - least(a.i, 32)
                 JOIN pw ON pw.e = least(a.i, 32)
                 WHERE a.i >= 1),
          cut AS (SELECT doc_id, i FROM wh WHERE wh % 64 = 0
                  UNION SELECT doc_id, len FROM d),
          seg AS (SELECT doc_id,
                    lag(i, 1, 0) OVER (PARTITION BY doc_id ORDER BY i) AS a,
                    i AS b
                  FROM cut),
          ch AS (SELECT DISTINCT s.doc_id,
                   ((pb.ph - pa.ph * pw.v) % 1000000007 + 1000000007) % 1000000007 AS chunk
                 FROM seg s
                 JOIN pre pa ON pa.doc_id = s.doc_id AND pa.i = s.a
                 JOIN pre pb ON pb.doc_id = s.doc_id AND pb.i = s.b
                 JOIN pw ON pw.e = s.b - s.a),
          capped AS (SELECT doc_id, chunk FROM (
                       SELECT c.*, count(*) OVER (PARTITION BY chunk) bsz FROM ch c)
                     WHERE bsz <= 4096),
          p2 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(count(*) AS BIGINT) AS shared_chunks
                 FROM capped a JOIN capped b ON a.chunk = b.chunk
                 WHERE a.doc_id < b.doc_id
                 GROUP BY a.doc_id, b.doc_id)
          SELECT id_a, id_b, shared_chunks FROM p2
          WHERE shared_chunks >= 2 ORDER BY id_a, id_b""")),
      (s, dir) => graft.pipeline.Dedup.sharedChunkPairs(
        graft.Tables.load(s, dir, "documents"), "doc_id", "text",
        window = 32, maskBits = 6, minSize = 16, minShared = 2,
        portable = true)),

    // ---- quality ratios: punctuation / digits / stopwords ---------------
    // integer counts + a 1e4-scaled integer ratio keep the comparison
    // exact across engines (no float division in the hashed output)
    // the whitespace class is spelled out instead of \s: Java's \s
    // includes vertical tab, RE2's (DuckDB) does not — an enumerated
    // class means both engines strip exactly the same characters. The
    // ratio NULLs on empty text on both sides (DuckDB float division by
    // zero is NULL, so Spark mirrors it with an explicit guard).
    QueryDef("qp62_quality_punct",
      Some("""SELECT doc_id,
                CAST(length(regexp_replace(text, '[\p{L}\p{N} \t\n\r\f\x0B]', '', 'g')) AS BIGINT) AS punct_chars,
                CAST(length(regexp_replace(text, '[^\p{N}]', '', 'g')) AS BIGINT) AS digit_chars,
                CAST(length(text) AS BIGINT) AS total_chars,
                CAST(len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')),
                     ['the','a','of','and','to','in','is','it','that','for'])) AS BIGINT) AS stop_hits,
                CAST(floor(length(regexp_replace(text, '[\p{L}\p{N} \t\n\r\f\x0B]', '', 'g')) * 10000.0
                     / length(text)) AS BIGINT) AS punct_ratio_bp
              FROM documents WHERE doc_id < 100 ORDER BY doc_id"""),
      (s, dir) => {
        val punct = length(regexp_replace(col("text"), "[\\p{L}\\p{N} \\t\\n\\r\\f\\x0B]", ""))
        val digits = length(regexp_replace(col("text"), "[^\\p{N}]", ""))
        val toks = array_distinct(split(trim(lower(col("text"))), "\\s+"))
        graft.Tables.load(s, dir, "documents")
          .filter(col("doc_id") < 100)
          .select(col("doc_id"),
            punct.cast("long").as("punct_chars"),
            digits.cast("long").as("digit_chars"),
            length(col("text")).cast("long").as("total_chars"),
            graft.pipeline.TextOps.stopwordHits(toks, "en").cast("long").as("stop_hits"),
            when(length(col("text")) > 0,
              floor(punct * 10000.0 / length(col("text"))))
              .cast("long").as("punct_ratio_bp"))
          .orderBy(col("doc_id"))
      }),

    // ---- Structured Streaming: tumbling-window type counts --------------
    // readStream over the events fixture → windowedTypeCounts →
    // memory sink (Complete mode — every finalized window), AvailableNow
    // so the query drains the file and stops. Spark's tumbling windows
    // and DuckDB's time_bucket both align to epoch-multiple boundaries,
    // so the 5-minute buckets agree exactly.
    QueryDef("qp60_stream_window",
      Some("""SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start, event_type,
                     COUNT(*) AS cnt
              FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
      (s, dir) =>
        StreamRunner.replayEvents(s, dir,
            s"qp60_sink_${streamRuns.incrementAndGet()}", "complete")(
            graft.streaming.EventStreams.windowedTypeCounts(_))
          .select(col("win_start"), col("event_type"), col("cnt"))
          .orderBy(col("win_start"), col("event_type"))))
}
