package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Round-8 binder paths: nested IN bodies with LIMIT/OFFSET [WITH TIES]
  * under grandparent correlation — the per-rid window-slice lowering
  * (Binder.limitInNestedBody). Each test forces the nested route with a
  * grandparent-referencing tautology, so the oracle is the identical
  * query without it, which the engine computes through the proven
  * depth-1 correlated-IN LIMIT machinery (qe130–qe132/qe151). */
class Round8Spec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var engine: Engine = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .appName("round8-spec").master("local[4]")
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

  // ---- nested IN + LIMIT ----------------------------------------------

  test("nested IN with LIMIT matches the depth-1 oracle under a tautology") {
    // the tautology (c_custkey >= 0) forces the per-rid nested route;
    // without it the same body rides the proven depth-1 LIMIT window
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 1 in (
               select l_linenumber from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                order by l_linenumber desc limit 2))
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 1 in (
               select l_linenumber from lineitem
                where l_orderkey = o_orderkey
                order by l_linenumber desc limit 2))
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  test("nested IN with LIMIT genuinely slices (differs from no-limit)") {
    def q(limit: String): Seq[Long] = keys(
      s"""select c_custkey from customer
         where c_custkey < 300 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 1 in (
               select l_linenumber from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                order by l_linenumber desc $limit))
         order by c_custkey""")
    val sliced = q("limit 2")
    val full = q("limit 1000000")
    // top-2-by-desc contains 1 only for orders with <= 2 lineitems;
    // the full set always contains 1 — the slice must be a strict subset
    assert(sliced.toSet.subsetOf(full.toSet))
    assert(sliced.size < full.size, "LIMIT slice did not restrict membership")
  }

  test("nested NOT IN with LIMIT/OFFSET keeps three-valued NULL semantics") {
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and (case when c_custkey % 7 = 0 then null else 3 end) not in (
               select case when l_linenumber = 2 then null else l_linenumber end
                 from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                order by l_linenumber limit 1 offset 1))
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and (case when c_custkey % 7 = 0 then null else 3 end) not in (
               select case when l_linenumber = 2 then null else l_linenumber end
                 from lineitem
                where l_orderkey = o_orderkey
                order by l_linenumber limit 1 offset 1))
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  test("nested IN with LIMIT WITH TIES extends the boundary rank") {
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 0 in (
               select l_suppkey % 10 from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                order by l_suppkey % 10 limit 1 with ties))
         order by c_custkey""")
    // value = sort key, so 0 ∈ top-1-with-ties ⟺ the per-pair minimum
    // of (l_suppkey % 10) is 0 — an independent scalar-subquery oracle
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 0 = (select min(l_suppkey % 10) from lineitem
                      where l_orderkey = o_orderkey))
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  test("nested IN LIMIT 0 is constant-false; NOT IN LIMIT 0 constant-true") {
    val in0 = keys(
      """select c_custkey from customer
         where c_custkey < 50 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 1 in (
               select l_linenumber from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                order by l_linenumber limit 0))
         order by c_custkey""")
    assert(in0.isEmpty)
    val notIn0 = keys(
      """select c_custkey from customer
         where c_custkey < 50 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 1 not in (
               select l_linenumber from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                order by l_linenumber limit 0))
         order by c_custkey""")
    val withOrders = keys(
      """select c_custkey from customer
         where c_custkey < 50 and exists (
           select 1 from orders where o_custkey = c_custkey)
         order by c_custkey""")
    assert(notIn0 == withOrders)
  }

  test("nested LIMIT 1 over a one-row aggregate body strips as a no-op") {
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 6 in (
               select max(l_linenumber) from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                limit 1))
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 6 in (
               select max(l_linenumber) from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0))
         order by c_custkey""")
    assert(got == want)
  }

  test("nested IN LIMIT error paths stay clean") {
    val noOrder = intercept[GraftException](sql(
      """select c_custkey from customer
         where exists (
           select 1 from orders where o_custkey = c_custkey
             and 1 in (
               select l_linenumber from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                limit 2))"""))
    assert(noOrder.msg.contains("ORDER BY"))
    val withDistinct = intercept[GraftException](sql(
      """select c_custkey from customer
         where exists (
           select 1 from orders where o_custkey = c_custkey
             and 1 in (
               select distinct l_linenumber from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                order by l_linenumber limit 2))"""))
    assert(withDistinct.msg.contains("DISTINCT"))
  }

  // ---- nested IN + DISTINCT ON (VERDICT r7 missing #4) ----------------

  test("nested IN with DISTINCT ON matches the depth-1 oracle under a tautology") {
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 1 in (
               select distinct on (l_linenumber % 2) l_linenumber
                 from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                order by l_linenumber % 2, l_linenumber))
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 1 in (
               select distinct on (l_linenumber % 2) l_linenumber
                 from lineitem
                where l_orderkey = o_orderkey
                order by l_linenumber % 2, l_linenumber))
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  test("nested IN with DISTINCT ON + LIMIT slices the kept rows") {
    // keep-first per parity then OFFSET 1 LIMIT 1 = the first ODD
    // linenumber when an even one exists; equivalently the depth-1 form
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 3 in (
               select distinct on (l_linenumber % 2) l_linenumber
                 from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                order by l_linenumber % 2, l_linenumber limit 1 offset 1))
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and 3 in (
               select distinct on (l_linenumber % 2) l_linenumber
                 from lineitem
                where l_orderkey = o_orderkey
                order by l_linenumber % 2, l_linenumber limit 1 offset 1))
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  // ---- EXISTS + DISTINCT [ON] + OFFSET counts distinct tuples ---------

  test("EXISTS over DISTINCT body with OFFSET counts distinct values, not rows") {
    // orders with > 2 lineitems but <= 2 distinct parity buckets exist
    // in the fixture; raw-row counting would wrongly keep them
    val got = keys(
      """select o_orderkey from orders
         where o_orderkey < 500 and exists (
           select distinct l_linenumber % 2 from lineitem
            where l_orderkey = o_orderkey limit 10 offset 1)
         order by o_orderkey""")
    val want = keys(
      """select o_orderkey from orders
         where o_orderkey < 500
           and (select countUnique(l_linenumber % 2) from lineitem
                 where l_orderkey = o_orderkey) > 1
         order by o_orderkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
    // and the raw-row count differs on this fixture (the test is sharp)
    val raw = keys(
      """select o_orderkey from orders
         where o_orderkey < 500
           and (select count(1) from lineitem
                 where l_orderkey = o_orderkey) > 1
         order by o_orderkey""")
    assert(raw != want, "fixture cannot distinguish distinct- from raw-counting")
  }

  // ---- OUTER JOIN ON subqueries correlating with both sides -----------

  test("LEFT JOIN ON both-sides EXISTS matches the scalar-max pre-join form") {
    // pair route (EXISTS references o_orderkey AND c_acctbal) vs the
    // equivalent right-side-correlated scalar that binds pre-join:
    // EXISTS(price > T) ⟺ max(price) > T
    val got = rows(
      """select c_custkey, o_orderkey from customer
         left join orders on o_custkey = c_custkey
           and exists (select 1 from lineitem
                        where l_orderkey = o_orderkey
                          and l_extendedprice > c_acctbal / 2)
         where c_custkey < 100
         order by c_custkey, o_orderkey""")
    val want = rows(
      """select c_custkey, o_orderkey from customer
         left join orders on o_custkey = c_custkey
           and (select max(l_extendedprice) from lineitem
                 where l_orderkey = o_orderkey) > c_acctbal / 2
         where c_custkey < 100
         order by c_custkey, o_orderkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  test("RIGHT JOIN ON both-sides NOT EXISTS null-extends non-matching keepers") {
    val got = rows(
      """select o_orderkey, s_suppkey from orders
         right join supplier on o_orderkey % 100 = s_suppkey
           and not exists (select 1 from lineitem
                            where l_orderkey = o_orderkey
                              and l_suppkey > s_suppkey)
         order by o_orderkey, s_suppkey""")
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1)))
    // reconstruct from the INNER form (subquery conjuncts on inner ON
    // defer to the proven WHERE machinery): matched pairs + suppliers
    // appearing in none, null-extended
    val pairs = rows(
      """select o_orderkey, s_suppkey from orders
         join supplier on o_orderkey % 100 = s_suppkey
           and not exists (select 1 from lineitem
                            where l_orderkey = o_orderkey
                              and l_suppkey > s_suppkey)""")
      .map(r => (r.getLong(0), r.getLong(1)))
    val matchedSupp = pairs.map(_._2).toSet
    val allSupp = rows("select s_suppkey from supplier").map(_.getLong(0))
    val want = (pairs.map { case (o, s) => (Some(o), s) } ++
        allSupp.filterNot(matchedSupp).map(s => (None: Option[Long], s)))
      .sortBy { case (o, s) => (o.getOrElse(Long.MaxValue), s) }
    assert(pairs.nonEmpty && matchedSupp.size < allSupp.size, "vacuous fixture")
    assert(got.sortBy { case (o, s) => (o.getOrElse(Long.MaxValue), s) } == want)
  }

  test("nested EXISTS over DISTINCT ON body with OFFSET counts ON-key tuples") {
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and exists (
               select distinct on (l_suppkey % 5) l_suppkey
                 from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                order by l_suppkey % 5, l_suppkey limit 100 offset 2))
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and (select countUnique(l_suppkey % 5) from lineitem
                   where l_orderkey = o_orderkey) > 2)
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }
}
