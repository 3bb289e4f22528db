package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Round-7 binder paths: grandparent-correlated NESTED subqueries with
  * AGGREGATED bodies (GROUP BY / HAVING / aggregate select under IN) —
  * the per-pair grouped lowering (Binder.joinNestedAggBody). Each test
  * forces the nested route with a grandparent-referencing conjunct that
  * FACTORS (tautology or parity split), so the oracle is an equivalent
  * query the engine computes through the already-proven parent-level
  * correlated-IN machinery. */
class Round7Spec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var engine: Engine = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .appName("round7-spec").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    engine = Engine.forTestdata(spark, dir)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sql(s: String): DataFrame = engine.execute(s)
  private def rows(s: String): Seq[Row] = sql(s).collect().toSeq
  private def keys(s: String): Seq[Long] = rows(s).map(_.getLong(0))

  // ---- grouped nested NOT IN ------------------------------------------

  test("nested NOT IN with GROUP BY body matches the parity-factored oracle") {
    // the grandparent conjunct (c_custkey % 2 = 0) empties the body for
    // odd customers — NOT IN over an empty group set is TRUE — and for
    // even customers reduces to a parent-level grouped NOT IN, which the
    // proven correlated-IN machinery computes independently
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_orderkey % 8 not in (
               select count(1) from lineitem
                where l_orderkey = o_orderkey and c_custkey % 2 = 0
                group by l_suppkey))
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 150 and (
           (c_custkey % 2 = 0 and exists (
             select 1 from orders where o_custkey = c_custkey
               and o_orderkey % 8 not in (
                 select count(1) from lineitem
                  where l_orderkey = o_orderkey group by l_suppkey)))
           or (c_custkey % 2 = 1 and exists (
             select 1 from orders where o_custkey = c_custkey)))
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  test("grouped nested NOT IN keeps three-valued NULL semantics per group") {
    // tautology grandparent ref forces the nested route; the oracle is
    // the identical query without it (parent-level grouped NOT IN)
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 100 and exists (
           select 1 from orders where o_custkey = c_custkey
             and (0 - o_orderkey) not in (
               select case when max(l_quantity) > 45 then null
                           else min(l_suppkey) end
                 from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                group by l_linenumber))
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 100 and exists (
           select 1 from orders where o_custkey = c_custkey
             and (0 - o_orderkey) not in (
               select case when max(l_quantity) > 45 then null
                           else min(l_suppkey) end
                 from lineitem
                where l_orderkey = o_orderkey
                group by l_linenumber))
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  // ---- positive nested IN with GROUP BY + HAVING ----------------------

  test("positive nested IN over a grouped HAVING body reroutes instead of flattening") {
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 200 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_orderkey % 4 in (
               select count(1) from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                group by l_suppkey
                having min(l_quantity) < 30))
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 200 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_orderkey % 4 in (
               select count(1) from lineitem
                where l_orderkey = o_orderkey
                group by l_suppkey
                having min(l_quantity) < 30))
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  // ---- ungrouped aggregate body under nested NOT IN -------------------

  test("ungrouped aggregate nested NOT IN yields one row per pair, NULL over empty") {
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 200 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_orderkey % 3 not in (
               select min(l_linenumber) from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0))
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 200 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_orderkey % 3 not in (
               select min(l_linenumber) from lineitem
                where l_orderkey = o_orderkey))
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  // ---- ADVICE r6: decomposed NOT IN select-item scope guard -----------

  test("NOT IN select item referencing enclosing scopes fails with a clean error") {
    val e = intercept[Exception](rows(
      """select c_custkey from customer
         where exists (
           select 1 from orders where o_custkey = c_custkey
             and o_orderkey not in (
               select l_orderkey + c_custkey from lineitem
                where l_extendedprice > c_acctbal))
         order by c_custkey"""))
    assert(e.getMessage.contains("own relations"),
      s"unexpected: ${e.getMessage}")
  }
}
