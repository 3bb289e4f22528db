package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.Engine

/** Statement-surface correctness entries: each runs a DDL/DML script
  * through the engine and returns the final SELECT; the oracle runs the
  * equivalent multi-statement DuckDB script. This is the driver-checked
  * proof that CREATE/INSERT/ALTER/TRUNCATE/OPTIMIZE actually work, not
  * just parse (VERDICT r1 item 3).
  *
  * Scripts drop-if-exists first so repeated runs (verify, bench warm-up +
  * timed) are idempotent; oracle side uses CREATE OR REPLACE.
  */
object StatementQueries {

  private def script(name: String, oracle: String, stmts: Seq[String]): QueryDef =
    QueryDef(name, Some(oracle), (s, dir) => {
      val e = Engines.get(s, dir)
      stmts.init.foreach(e.execute(_))
      e.execute(stmts.last)
    })

  val defs: Seq[QueryDef] = Seq(

    // ---- CREATE + INSERT VALUES (defaults, nulls, coercion) + SELECT ----
    script("qs41_ddl_insert_select",
      """CREATE OR REPLACE TABLE qs41_t(a INTEGER, b VARCHAR, c DECIMAL(18,2) DEFAULT 2.5);
         INSERT INTO qs41_t VALUES (1, 'x', 9.25), (2, NULL, 0.75);
         INSERT INTO qs41_t(a, b) VALUES (3, 'y'), (4, '4');
         SELECT a, b, CAST(c AS DOUBLE) AS c FROM qs41_t ORDER BY a""",
      Seq(
        "drop table if exists qs41_t",
        """create table qs41_t (a Int32, b Nullable(String), c Decimal64(2) default 2.5)
           order by a""",
        "insert into qs41_t values (1, 'x', 9.25), (2, null, 0.75)",
        "insert into qs41_t (a, b) values (3, 'y'), (4, '4')",
        "select a, b, toFloat64(c) as c from qs41_t order by a")),

    // ---- INSERT INTO ... SELECT (aggregate of a base table) -------------
    script("qs42_insert_from_select",
      """CREATE OR REPLACE TABLE qs42_t(seg VARCHAR, cnt BIGINT, bal DOUBLE);
         INSERT INTO qs42_t
           SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT),
                  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
           FROM customer GROUP BY c_mktsegment;
         SELECT seg, cnt, bal FROM qs42_t ORDER BY seg""",
      Seq(
        "drop table if exists qs42_t",
        "create table qs42_t (seg String, cnt Int64, bal Float64)",
        """insert into qs42_t
           select c_mktsegment, count(*), toFloat64(sum(toDecimal(c_acctbal, 12, 2)))
           from customer group by c_mktsegment""",
        "select seg, cnt, bal from qs42_t order by seg")),

    // ---- CREATE VIEW ... UPDATE BY Summing (corpus 12.sql shape) --------
    script("qs43_summing_view",
      """CREATE OR REPLACE TABLE qs43_s1(supplyid INTEGER, supplier BIGINT);
         CREATE OR REPLACE TABLE qs43_s2(supplyid INTEGER, supplier BIGINT);
         INSERT INTO qs43_s1 VALUES (1, 10), (2, 20), (3, 7);
         INSERT INTO qs43_s2 VALUES (1, 5), (3, 30), (4, 1);
         SELECT supplyid, CAST(SUM(supplier) AS BIGINT) AS supplier FROM (
           SELECT * FROM qs43_s1 UNION ALL SELECT * FROM qs43_s2) u
         GROUP BY supplyid ORDER BY supplyid""",
      Seq(
        "drop view if exists qs43_v",
        "drop table if exists qs43_s1",
        "drop table if exists qs43_s2",
        "create table qs43_s1 (supplyid Int32, supplier Int64)",
        "create table qs43_s2 (supplyid Int32, supplier Int64)",
        "insert into qs43_s1 values (1, 10), (2, 20), (3, 7)",
        "insert into qs43_s2 values (1, 5), (3, 30), (4, 1)",
        """create view qs43_v update by Summing order by supplyid as
           select supplyid, supplier from qs43_s1
           union all
           select supplyid, supplier from qs43_s2""",
        "select supplyid, supplier from qs43_v order by supplyid")),

    // ---- ALTER TABLE ADD COLUMN with default backfill -------------------
    script("qs44_alter_add_column",
      """CREATE OR REPLACE TABLE qs44_t(a INTEGER, b VARCHAR);
         INSERT INTO qs44_t VALUES (1, 'one'), (2, 'two');
         ALTER TABLE qs44_t ADD COLUMN score DOUBLE DEFAULT 1.5;
         INSERT INTO qs44_t VALUES (3, 'three', 9.5);
         SELECT a, b, score FROM qs44_t ORDER BY a""",
      Seq(
        "drop table if exists qs44_t",
        "create table qs44_t (a Int32, b String)",
        "insert into qs44_t values (1, 'one'), (2, 'two')",
        "alter table qs44_t add column score Float64 default 1.5",
        "insert into qs44_t values (3, 'three', 9.5)",
        "select a, b, score from qs44_t order by a")),

    // ---- TRUNCATE then refill -------------------------------------------
    script("qs45_truncate_refill",
      """CREATE OR REPLACE TABLE qs45_t(k INTEGER);
         INSERT INTO qs45_t VALUES (1), (2), (3);
         TRUNCATE qs45_t;
         INSERT INTO qs45_t VALUES (7), (8);
         SELECT k FROM qs45_t ORDER BY k""",
      Seq(
        "drop table if exists qs45_t",
        "create table qs45_t (k Int32)",
        "insert into qs45_t values (1), (2), (3)",
        "truncate table qs45_t",
        "insert into qs45_t values (7), (8)",
        "select k from qs45_t order by k")),

    // ---- table function numbers() ---------------------------------------
    script("qs46_numbers_fn",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(number) AS BIGINT) AS total,
                CAST(MIN(number) AS BIGINT) AS mn, CAST(MAX(number) AS BIGINT) AS mx
         FROM range(0, 1000) t(number)""",
      Seq(
        """select count(*) as n, toInt64(sum(number)) as total,
                  toInt64(min(number)) as mn, toInt64(max(number)) as mx
           from numbers(1000)""")),

    // ---- OPTIMIZE keeps data identical (compaction rewrite) -------------
    script("qs47_optimize_compact",
      """CREATE OR REPLACE TABLE qs47_t(pri VARCHAR, cnt BIGINT);
         INSERT INTO qs47_t
           SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT)
           FROM orders GROUP BY o_orderpriority;
         SELECT pri, cnt FROM qs47_t ORDER BY pri""",
      Seq(
        "drop table if exists qs47_t",
        "create table qs47_t (pri String, cnt Int64)",
        "insert into qs47_t select o_orderpriority, count(*) from orders group by o_orderpriority",
        "optimize table qs47_t",
        "select pri, cnt from qs47_t order by pri")))
}
