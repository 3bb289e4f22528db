package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Round-6 binder paths: aggregated EXISTS bodies with grandparent-
  * nested subqueries (incl. GROUP BY + OFFSET), expression-position
  * grandparent subqueries with the OR survivor-union distribution, the
  * decomposed three-valued NOT IN anti join, and WITH TIES + OFFSET.
  * Each test's oracle is an equivalent query the engine itself can
  * compute through an independent, already-proven lowering. */
class Round6Spec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var engine: Engine = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .appName("round6-spec").master("local[4]")
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

  // ---- aggregated EXISTS + grandparent-nested + OFFSET ----------------

  test("GROUP BY body with OFFSET and a grandparent-nested conjunct counts surviving groups") {
    // nested conjunct depends only on the grandparent (c_custkey), so
    // the query factors: the engine computes the oracle via IN + a
    // grandparent-free aggregated EXISTS with the same OFFSET
    val got = keys(
      """select c_custkey from customer
         where exists (select o_orderpriority from orders
                       where o_custkey = c_custkey
                         and exists (select 1 from lineitem
                                     where l_orderkey = c_custkey)
                       group by o_orderpriority
                       having count(1) >= 1
                       limit 10 offset 1)
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey in (select l_orderkey from lineitem)
           and exists (select o_orderpriority from orders
                       where o_custkey = c_custkey
                       group by o_orderpriority
                       having count(1) >= 1
                       limit 10 offset 1)
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  // ---- OR distribution: multiset safety under aggregation -------------

  test("a pair satisfying BOTH OR branches is counted once under aggregation") {
    // l_quantity >= 1 is a tautology on the fixture, so every candidate
    // pair satisfies both branches of the OR; the aggregated count must
    // equal the OR-free count (the aggregated path filters, it must
    // never union-duplicate)
    val got = keys(
      """select c_custkey from customer
         where exists (select 1 from orders
                       where o_custkey = c_custkey
                         and (o_totalprice > 0 or exists (
                           select 1 from lineitem
                            where l_orderkey = o_orderkey
                              and l_suppkey % 3 = c_custkey % 3))
                       having count(1) >= 5)
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where exists (select 1 from orders
                       where o_custkey = c_custkey
                       having count(1) >= 5)
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  test("plain-existence OR distribution matches the single-branch unions") {
    val got = keys(
      """select c_custkey from customer
         where exists (select 1 from orders
                       where o_custkey = c_custkey
                         and (o_totalprice > 200000 or exists (
                           select 1 from lineitem
                            where l_orderkey = o_orderkey
                              and l_suppkey % 5 = c_custkey % 5)))
         order by c_custkey""")
    val a = keys(
      """select c_custkey from customer
         where exists (select 1 from orders
                       where o_custkey = c_custkey and o_totalprice > 200000)""")
    val b = keys(
      """select c_custkey from customer
         where exists (select 1 from orders
                       where o_custkey = c_custkey
                         and exists (select 1 from lineitem
                                     where l_orderkey = o_orderkey
                                       and l_suppkey % 5 = c_custkey % 5))""")
    val want = (a.toSet ++ b.toSet).toSeq.sorted
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  // ---- decomposed NOT IN: NULL semantics survive the 3-join split -----

  test("decomposed NOT IN anti join keeps three-valued NULL semantics") {
    // inner select is conditionally NULL; lhs (-c_custkey) never
    // matches. NOT IN is TRUE iff the theta-set is empty or NULL-free —
    // for these, iff it contains no row with l_quantity > 49
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 100 and exists (
           select 1 from orders where o_custkey = c_custkey
             and (0 - c_custkey) not in (
               select case when l_quantity > 49 then null else l_suppkey end
                 from lineitem where l_extendedprice > c_acctbal * 10))
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 100 and exists (
           select 1 from orders where o_custkey = c_custkey
             and not exists (
               select 1 from lineitem
                where l_extendedprice > c_acctbal * 10 and l_quantity > 49))
         order by c_custkey""")
    assert(got == want)
  }

  // ---- WITH TIES + OFFSET ---------------------------------------------

  test("LIMIT n OFFSET o WITH TIES = rank <= o+n minus the first o rows") {
    val got = rows(
      """select o_orderdate from orders
         order by o_orderdate limit 7 offset 4 with ties""")
      .map(_.get(0).toString)
    val all = rows("select o_orderdate from orders order by o_orderdate")
      .map(_.get(0).toString)
    // rank <= 11 ⟺ date <= the 11th date; then drop the first 4
    val thr = all(10)
    val want = all.filter(_ <= thr).drop(4)
    assert(want.nonEmpty && got.nonEmpty)
    assert(got.sorted == want.sorted)
  }

  // ---- bare correlated scalar lookups ---------------------------------

  test("bare lookup returns the single row's value and NULL when unmatched") {
    val got = rows(
      """select c_custkey,
           (select n_name from nation where n_nationkey = c_custkey + 1000) as nn
         from customer where c_custkey < 20 order by c_custkey""")
    assert(got.size == 20 && got.forall(_.isNullAt(1)))
    val looked = rows(
      """select c_custkey,
           (select n_name from nation where n_nationkey = c_nationkey) as nn
         from customer where c_custkey < 50 order by c_custkey""")
    val want = rows(
      """select c_custkey, n_name as nn from customer
         join nation on n_nationkey = c_nationkey
         where c_custkey < 50 order by c_custkey""")
    assert(looked == want)
  }

  test("bare lookup raises when a key matches several rows") {
    val e = intercept[Exception](rows(
      """select c_custkey,
           (select o_orderkey from orders where o_custkey = c_custkey) as k
         from customer order by c_custkey"""))
    assert(e.getMessage.contains("more than one row"))
  }

  test("theta bare lookup gates the value on the range conjunct") {
    val got = rows(
      """select o_orderkey,
           (select c_name from customer
             where c_custkey = o_custkey and c_acctbal < o_totalprice) as buyer
         from orders where o_orderkey < 500 order by o_orderkey""")
    val want = rows(
      """select o_orderkey, c_name as buyer from orders
         left join customer
           on c_custkey = o_custkey and c_acctbal < o_totalprice
         where o_orderkey < 500 order by o_orderkey""")
    assert(got.nonEmpty && got == want)
  }

  test("WITH TIES without OFFSET is unchanged by the offset plumbing") {
    val got = rows(
      """select o_orderdate from orders
         order by o_orderdate limit 11 with ties""")
      .map(_.get(0).toString)
    val all = rows("select o_orderdate from orders order by o_orderdate")
      .map(_.get(0).toString)
    val thr = all(10)
    val want = all.filter(_ <= thr)
    assert(got.sorted == want.sorted)
  }
}
