package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-3 driver-oracle entries: every SURVEY §2 component that round 2
  * proved only via `sbt test` gets a CORRECTNESS entry here (VERDICT r2
  * item 1) — USING joins, EXPLAIN, DESCRIBE, SET/@config, $n parameters,
  * collection literals, INSERT FROM file(), ALTER DROP/RENAME, random() —
  * plus entries for the new round-3 binder features: correlated scalar
  * subqueries (TPC-H Q17 shape), aggregated EXISTS (Q20 shape), and
  * multi-key LIMIT WITH TIES.
  *
  * Scripts drop-if-exists first so repeated runs stay idempotent; the
  * determinism contract matches the rest of the suite (decimal casts on
  * both sides, total ORDER BY, aliases matching the oracle exactly).
  */
object ExtraQueries {

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

  val defs: Seq[QueryDef] = Seq(

    // ---- USING join (coalesced key column) ------------------------------
    engineSql("qe60_using_join",
      """SELECT nk, n_name, cnt FROM
           (SELECT c_nationkey AS nk, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey) c
           JOIN (SELECT n_nationkey AS nk, n_name FROM nation) n USING (nk)
         ORDER BY nk""",
      """select nk, n_name, cnt from
           (select c_nationkey as nk, count(*) as cnt from customer group by c_nationkey) as c
           join (select n_nationkey as nk, n_name from nation) as n using (nk)
         order by nk"""),

    // ---- EXPLAIN (rows-only: plan text is engine-specific) --------------
    QueryDef("qe61_explain", None, (s, dir) =>
      Engines.get(s, dir).execute(
        "explain select l_returnflag, count(*) as cnt from lineitem group by l_returnflag")),

    // ---- DESCRIBE TABLE (oracle = literal expected rows) ----------------
    script("qe62_describe",
      Some("""SELECT * FROM (VALUES
          ('a', 'Int32', CAST(NULL AS VARCHAR), 'key col'),
          ('b', 'Nullable(String)', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
          ('c', 'Float64', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
          ('d', 'Date', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
          ('e', 'Decimal64(2)', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
          ('f', 'Array(Int64)', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR))
        ) AS t(name, type, "default", comment) ORDER BY name"""),
      _ => Seq(
        "drop table if exists qe62_t",
        """create table qe62_t (
             a Int32 comment 'key col', b Nullable(String), c Float64,
             d Date, e Decimal64(2), f Array(Int64)) order by a""",
        "describe table qe62_t")),

    // ---- SET @config + read-back in an expression -----------------------
    script("qe63_set_config",
      Some("""SELECT p_partkey, p_retailprice FROM part
              WHERE p_retailprice > 900 ORDER BY p_partkey"""),
      _ => Seq(
        "set @price_floor = 900",
        """select p_partkey, p_retailprice from part
           where p_retailprice > @price_floor order by p_partkey""")),

    // ---- $n query parameters (incl. LIMIT $n) ---------------------------
    QueryDef("qe64_params",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_orderkey < 500 AND o_orderstatus = 'O'
              ORDER BY o_orderkey LIMIT 10"""),
      (s, dir) => Engines.get(s, dir).execute(
        """select o_orderkey, o_totalprice from orders
           where o_orderkey < $0 and o_orderstatus = $1
           order by o_orderkey limit $2""",
        Seq(500, "O", 10))),

    // ---- collection literals + index access + tupleElement --------------
    engineSql("qe65_collections",
      """SELECT n_nationkey, 20 AS arr_el, 2 AS map_el, n_name AS tup_el
         FROM nation ORDER BY n_nationkey""",
      """select n_nationkey, [10, 20, 30][2] as arr_el,
                {'x': 1, 'y': 2}['y'] as map_el,
                tupleElement((n_nationkey, n_name), 2) as tup_el
         from nation order by n_nationkey"""),

    // ---- INSERT INTO ... FROM file() ------------------------------------
    script("qe66_insert_from_file",
      Some("SELECT CAST(r_regionkey AS BIGINT) AS rk, r_name AS rname FROM region ORDER BY rk"),
      dir => Seq(
        "drop table if exists qe66_t",
        "create table qe66_t (rk Int64, rname String)",
        s"insert into qe66_t from file('$dir/region.parquet')",
        "select rk, rname from qe66_t order by rk")),

    // ---- ALTER TABLE DROP / RENAME COLUMN -------------------------------
    script("qe67_alter_drop_rename",
      Some("""SELECT * FROM (VALUES (1, CAST(1.5 AS DOUBLE)), (2, CAST(2.5 AS DOUBLE)))
              AS t(a, score) ORDER BY a"""),
      _ => Seq(
        "drop table if exists qe67_t",
        "create table qe67_t (a Int32, b String, c Float64)",
        "insert into qe67_t values (1, 'x', 1.5), (2, 'y', 2.5)",
        "alter table qe67_t drop column b",
        "alter table qe67_t rename column c score",
        "select a, score from qe67_t order by a")),

    // ---- random(): range + distinctness assertions (values are
    // nondeterministic, the ASSERTIONS are the deterministic output) ------
    engineSql("qe68_random",
      """SELECT CAST(1000 AS BIGINT) AS n, CAST(1000 AS BIGINT) AS nonneg,
                CAST(1000 AS BIGINT) AS below_one, CAST(1 AS BIGINT) AS distinct_ok""",
      """select count(*) as n,
                toInt64(countIf(r >= 0.0)) as nonneg,
                toInt64(countIf(r < 1.0)) as below_one,
                toInt64(if countUnique(r) > 900 then 1 else 0 end) as distinct_ok
         from (select random() as r from numbers(1000)) as t"""),

    // ---- correlated scalar subquery (TPC-H Q17 shape, exact decimals) ---
    engineSql("qe69_corr_scalar",
      """SELECT p_partkey FROM part
         WHERE CAST(p_retailprice AS DECIMAL(12,2)) * 2000 <
           (SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
            FROM lineitem WHERE l_partkey = p_partkey)
         ORDER BY p_partkey""",
      """select p_partkey from part
         where toDecimal(p_retailprice, 12, 2) * 2000 <
           (select sum(toDecimal(l_extendedprice, 12, 2))
            from lineitem where l_partkey = p_partkey)
         order by p_partkey"""),

    // ---- EXISTS with GROUP BY + HAVING (TPC-H Q20 shape) ----------------
    engineSql("qe70_exists_groupby",
      """SELECT p_partkey, p_name FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
                       GROUP BY l_partkey
                       HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 700)
         ORDER BY p_partkey""",
      """select p_partkey, p_name from part
         where exists (select 1 from lineitem where l_partkey = p_partkey
                       group by l_partkey
                       having sum(toDecimal(l_quantity, 12, 2)) > 700)
         order by p_partkey"""),

    // ---- OPTIMIZE on a Summing view: materialize, then invalidate -------
    // the SELECT runs after a post-materialization INSERT, so a stale
    // materialization serving reads would return the wrong sums
    script("qe72_optimize_view",
      Some("""SELECT * FROM (VALUES (1, CAST(15 AS BIGINT)), (2, CAST(21 AS BIGINT)),
                                    (3, CAST(7 AS BIGINT)))
              AS t(k, v) ORDER BY k"""),
      _ => Seq(
        "drop view if exists qe72_v",
        "drop table if exists qe72_t",
        "create table qe72_t (k Int32, v Int64)",
        "insert into qe72_t values (1, 10), (2, 20), (1, 5)",
        "create view qe72_v update by Summing order by k as select k, v from qe72_t",
        "optimize table qe72_v",
        "insert into qe72_t values (2, 1), (3, 7)",
        "select k, v from qe72_v order by k")),

    // ---- BPE-ish token counting (brief: whitespace + BPE-ish regex) -----
    QueryDef("qe75_token_bpeish",
      Some("""SELECT doc_id,
                CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
                CAST(len(regexp_extract_all(text, '[\p{L}]+|[0-9]+|[^\p{L}0-9\s]+')) AS BIGINT) AS bpeish_tokens
              FROM documents WHERE doc_id < 100 ORDER BY doc_id"""),
      (s, dir) => {
        import org.apache.spark.sql.functions._
        graft.Tables.load(s, dir, "documents")
          .filter(col("doc_id") < 100)
          .select(col("doc_id"),
            size(graft.pipeline.TextOps.tokens(col("text"))).cast("long").as("ws_tokens"),
            graft.pipeline.TextOps.bpeishTokenCount(col("text")).cast("long").as("bpeish_tokens"))
          .orderBy(col("doc_id"))
      }),

    // ---- non-equi correlated EXISTS (TPC-H Q21 fragment): orders with
    // at least two distinct suppliers among their lineitems -------------
    engineSql("qe77_exists_nonequi",
      """SELECT l1.l_orderkey, COUNT(*) AS line_cnt
         FROM lineitem l1
         WHERE EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND l1.l_orderkey < 1000
         GROUP BY l1.l_orderkey ORDER BY l1.l_orderkey""",
      """select l1.l_orderkey, count(*) as line_cnt
         from lineitem as l1
         where exists (select 1 from lineitem as l2
                       where l2.l_orderkey = l1.l_orderkey
                         and l2.l_suppkey != l1.l_suppkey)
           and l1.l_orderkey < 1000
         group by l1.l_orderkey order by l1.l_orderkey"""),

    // ---- embedding-cosine near-dup pairs (exact quantized tier) ---------
    QueryDef("qe76_embed_neardup",
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) q
                 FROM embeddings WHERE vec_id < 300),
               n AS (SELECT vec_id, q, list_sum(list_transform(q, x -> x * x)) n2 FROM e),
               sc AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                        list_sum(list_transform(list_zip(a.q, b.q), p -> p[1] * p[2])) AS dot,
                        a.n2 AS na, b.n2 AS nb
                      FROM n a JOIN n b ON a.vec_id < b.vec_id)
              SELECT id_a, id_b, dot / sqrt(na * nb) AS cos
              FROM sc WHERE dot >= 0 AND 25 * dot * dot >= 4 * na * nb
              ORDER BY id_a, id_b"""),
      (s, dir) => graft.pipeline.Dedup.embeddingNearDupPairs(
        graft.Tables.load(s, dir, "embeddings"), maxId = 300,
        thresholdNum = 2, thresholdDen = 5)),

    // ---- TPC-H Q22 (reference corpus 9.sql shape): uncorrelated scalar
    // avg + NOT EXISTS + derived table + IN list, decimal-determinized ---
    engineSql("qe74_corpus_q22",
      """SELECT cntrycode, COUNT(*) AS numcust,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
         FROM (SELECT SUBSTRING(c_name, 17, 2) AS cntrycode, c_acctbal
               FROM customer
               WHERE SUBSTRING(c_name, 17, 2) IN ('13','31','23','29','30','18','17')
                 AND CAST(c_acctbal AS DECIMAL(12,2)) *
                   (SELECT COUNT(*) FROM customer
                    WHERE c_acctbal > 0.00
                      AND SUBSTRING(c_name, 17, 2) IN ('13','31','23','29','30','18','17')) >
                   (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2)))
                    FROM customer
                    WHERE c_acctbal > 0.00
                      AND SUBSTRING(c_name, 17, 2) IN ('13','31','23','29','30','18','17'))
                 AND NOT EXISTS (SELECT * FROM orders
                                 WHERE o_custkey = c_custkey AND o_totalprice > 400000)) custsale
         GROUP BY cntrycode ORDER BY cntrycode""",
      """select cntrycode, count(*) as numcust,
                toFloat64(sum(toDecimal(c_acctbal, 12, 2))) as totacctbal
         from (select substring(c_name, 17, 2) as cntrycode, c_acctbal
               from customer
               where substring(c_name, 17, 2) in ('13','31','23','29','30','18','17')
                 and toDecimal(c_acctbal, 12, 2) *
                   (select count(*) from customer
                    where c_acctbal > 0.00
                      and substring(c_name, 17, 2) in ('13','31','23','29','30','18','17')) >
                   (select sum(toDecimal(c_acctbal, 12, 2))
                    from customer
                    where c_acctbal > 0.00
                      and substring(c_name, 17, 2) in ('13','31','23','29','30','18','17'))
                 and not exists (select * from orders
                                 where o_custkey = c_custkey and o_totalprice > 400000)) as custsale
         group by cntrycode order by cntrycode"""),

    // ---- IN / EXISTS subqueries under OR (expression position) ----------
    engineSql("qe73_subquery_or",
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
            OR EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey""",
      """select c_custkey, c_name from customer
         where c_custkey in (select o_custkey from orders where o_orderstatus = 'P')
            or exists (select 1 from orders
                       where o_custkey = c_custkey and o_totalprice > 400000)
         order by c_custkey"""),

    // ---- multi-key LIMIT WITH TIES (broadcast-threshold plan) -----------
    engineSql("qe71_with_ties_multi",
      """SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber FROM
           (SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
                   RANK() OVER (ORDER BY l_returnflag, l_linestatus) AS rk
            FROM lineitem) t
         WHERE rk <= 20
         ORDER BY l_returnflag, l_linestatus, l_orderkey, l_linenumber""",
      """select l_returnflag, l_linestatus, l_orderkey, l_linenumber from (
           select l_returnflag, l_linestatus, l_orderkey, l_linenumber from lineitem
           order by l_returnflag, l_linestatus limit 20 with ties) as t
         order by l_returnflag, l_linestatus, l_orderkey, l_linenumber"""))
}
