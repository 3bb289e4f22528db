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

  // ---- grouped bodies under theta-correlated scalars ------------------

  test("theta-correlated scalar with GROUP BY + single-group HAVING") {
    // HAVING pins the 'R' group, so the grouped body returns that one
    // group's count or no row at all; the oracle expresses the same
    // value through the proven UNGROUPED theta path, with CASE mapping
    // the empty-set count 0 back to the grouped path's NULL
    val got = rows(
      """select o_orderkey,
           (select count(1) from lineitem
             where l_extendedprice > o_totalprice / 2
             group by l_returnflag having l_returnflag = 'R') as r
         from orders where o_orderkey < 300 order by o_orderkey""")
    val want = rows(
      """select o_orderkey,
           (select case when count(1) = 0 then null else count(1) end
             from lineitem
             where l_extendedprice > o_totalprice / 2
               and l_returnflag = 'R') as r
         from orders where o_orderkey < 300 order by o_orderkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(want.exists(_.isNullAt(1)) && want.exists(!_.isNullAt(1)),
      "fixture exercises only one branch")
    assert(got == want)
  }

  test("theta-grouped scalar raises when several groups survive") {
    val e = intercept[Exception](rows(
      """select o_orderkey,
           (select count(1) from lineitem
             where l_extendedprice > o_totalprice / 20
             group by l_returnflag) as x
         from orders where o_orderkey < 50 order by o_orderkey"""))
    assert(e.getMessage.contains("more than one row"), s"unexpected: ${e.getMessage}")
  }

  // ---- correlated scalar top-1 with OFFSET ----------------------------

  test("scalar ORDER BY … LIMIT 1 OFFSET 1 picks the second row per key") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = rows(
      """select c_custkey,
           (select o_orderkey from orders where o_custkey = c_custkey
               and o_totalprice > 300000
             order by o_totalprice desc, o_orderkey limit 1 offset 1) as k
         from customer where c_custkey < 100 order by c_custkey""")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val second = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_totalprice") > 300000)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 2)
      .select(col("o_custkey"), col("o_orderkey").as("k"))
    val want = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_custkey") < 100)
      .join(second, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("k"))
      .orderBy(col("c_custkey")).collect().toSeq
    assert(want.exists(_.isNullAt(1)) && want.exists(!_.isNullAt(1)),
      "fixture exercises only one branch")
    assert(got == want)
  }

  test("nested grouped HAVING referencing the grandparent rides a first() aggregate") {
    import org.apache.spark.sql.functions._
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_orderkey % 4 in (
               select count(1) from lineitem
                where l_orderkey = o_orderkey
                group by l_suppkey
                having min(l_quantity) < c_acctbal / 200 + (c_custkey % 2) * 1000))
         order by c_custkey""")
    // independent oracle built directly with the DataFrame API: group
    // lineitem per (order, supplier), join the (customer, order) pairs,
    // apply the HAVING with the outer columns as plain join outputs
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_custkey") < 150)
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val grp = lineitem.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("cnt"), min(col("l_quantity")).as("mq"))
    val want = customer
      .join(orders, col("o_custkey") === col("c_custkey"))
      .join(grp, col("l_orderkey") === col("o_orderkey"))
      .filter(col("mq") <
        col("c_acctbal") / 200 + pmod(col("c_custkey"), lit(2L)) * 1000)
      .filter(pmod(col("o_orderkey"), lit(4L)) === col("cnt"))
      .select(col("c_custkey")).distinct().orderBy(col("c_custkey"))
      .collect().map(_.getLong(0)).toSeq
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  // ---- LIMIT/OFFSET in nested grandparent bodies ----------------------

  test("nested NOT EXISTS with OFFSET counts pre-limit rows per pair") {
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and not exists (
               select 1 from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                limit 5 offset 1))
         order by c_custkey""")
    // NOT EXISTS(body OFFSET 1) ⟺ at most 1 pre-limit row — the oracle
    // is the parent-level ungrouped-HAVING form of the same count
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and not exists (
               select 1 from lineitem
                where l_orderkey = o_orderkey
                having count(1) > 1))
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  test("nested EXISTS over GROUP BY with OFFSET counts surviving groups per pair") {
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and exists (
               select l_suppkey from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                group by l_suppkey limit 10 offset 2))
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and exists (
               select l_suppkey from lineitem
                where l_orderkey = o_orderkey
                group by l_suppkey limit 10 offset 2))
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  test("nested body LIMIT 0 is constant existence") {
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 100 and exists (
           select 1 from orders where o_custkey = c_custkey
             and not exists (
               select 1 from lineitem
                where l_orderkey = o_orderkey and c_custkey >= 0
                limit 0))
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 100 and exists (
           select 1 from orders where o_custkey = c_custkey)
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  // ---- scalar in INNER JOIN ON referencing the right side -------------

  test("inner-join ON scalar correlated against the RIGHT side = WHERE form") {
    val got = rows(
      """select o_orderkey, c_custkey from orders
           join customer on o_custkey = c_custkey
            and o_totalprice / 200 > (
              select max(p_retailprice) from part
               where p_partkey % 100 = c_custkey % 100)
         where o_orderkey < 2000 order by o_orderkey""")
    // INNER ON ≡ WHERE: the oracle binds the same scalar in WHERE
    // position over the joined frame (the established post-join path)
    val want = rows(
      """select o_orderkey, c_custkey from orders
           join customer on o_custkey = c_custkey
         where o_totalprice / 200 > (
              select max(p_retailprice) from part
               where p_partkey % 100 = c_custkey % 100)
           and o_orderkey < 2000 order by o_orderkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got.size < rows(
      """select o_orderkey from orders join customer on o_custkey = c_custkey
         where o_orderkey < 2000""").size, "filter is vacuous")
    assert(got == want)
  }

  // ---- WITH inside subquery bodies ------------------------------------

  test("EXISTS body with its own CTE equals the inlined form") {
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           with big as (select o_custkey as k from orders
                         where o_totalprice > 300000)
           select 1 from big where k = c_custkey)
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_totalprice > 300000)
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  test("nested WITH body keeps its grandparent correlation") {
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_orderkey not in (
               with pricey as (select l_orderkey as k, l_extendedprice as p
                               from lineitem where l_suppkey < 40)
               select k from pricey where p > c_acctbal * 2))
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_orderkey not in (
               select l_orderkey from lineitem
                where l_suppkey < 40 and l_extendedprice > c_acctbal * 2))
         order by c_custkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  test("LEFT JOIN ON scalar correlated with the right side null-extends correctly") {
    import org.apache.spark.sql.functions._
    val got = rows(
      """select c_custkey, o_orderkey from customer
           left join orders on o_custkey = c_custkey
            and o_totalprice > 6 * (
              select avg(l_extendedprice) from lineitem
               where l_orderkey = o_orderkey)
         where c_custkey < 100 order by c_custkey, o_orderkey""")
    val avgP = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_orderkey")).agg(avg(col("l_extendedprice")).as("ap"))
    val ordersAvg = spark.read.parquet(s"$dir/orders.parquet")
      .join(avgP, col("l_orderkey") === col("o_orderkey"), "left")
    val want = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_custkey") < 100)
      .join(ordersAvg, col("o_custkey") === col("c_custkey") &&
        col("o_totalprice") > col("ap") * 6, "left")
      .select(col("c_custkey"), col("o_orderkey"))
      .orderBy(col("c_custkey"), col("o_orderkey")).collect().toSeq
    assert(want.exists(_.isNullAt(1)), "fixture has no null-extended rows")
    assert(got == want)
  }

  // ---- WITH bodies inside correlated IN / scalar subqueries -----------

  test("correlated IN with a WITH body equals the inlined form") {
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 300 and c_custkey in (
           with big as (select o_custkey as k, o_totalprice as p from orders
                         where o_totalprice > 100)
           select k from big where p > c_acctbal)
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 300 and c_custkey in (
           select o_custkey from orders
            where o_totalprice > 100 and o_totalprice > c_acctbal)
         order by c_custkey""")
    assert(got.nonEmpty && got == want)
  }

  test("correlated NOT IN with a WITH body equals the inlined form") {
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 300 and c_custkey not in (
           with big as (select o_custkey as k, o_totalprice as p from orders
                         where o_totalprice > 100 and o_custkey < 50)
           select k from big where p > c_acctbal)
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 300 and c_custkey not in (
           select o_custkey from orders
            where o_totalprice > 100 and o_custkey < 50
              and o_totalprice > c_acctbal)
         order by c_custkey""")
    assert(got.nonEmpty && got == want)
  }

  test("correlated scalar with a WITH body equals the inlined form") {
    val got = rows(
      """select c_custkey,
                (with lo as (select o_custkey as k, o_totalprice as p
                              from orders where o_orderstatus = 'F')
                 select max(p) from lo where k = c_custkey) as mx
         from customer where c_custkey < 200 order by c_custkey""")
    val want = rows(
      """select c_custkey,
                (select max(o_totalprice) from orders
                  where o_orderstatus = 'F' and o_custkey = c_custkey) as mx
         from customer where c_custkey < 200 order by c_custkey""")
    assert(got.nonEmpty && got == want)
  }

  test("uncorrelated scalar with a WITH body works") {
    val got = keys(
      """select c_custkey from customer
         where c_acctbal > (with t as (select avg(c_acctbal) as a from customer)
                            select a from t)
           and c_custkey < 100
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_acctbal > (select avg(c_acctbal) from customer)
           and c_custkey < 100
         order by c_custkey""")
    assert(got.nonEmpty && got == want)
  }

  test("theta-correlated scalar with a WITH body equals the inlined form") {
    val got = rows(
      """select c_custkey,
                (with lo as (select o_custkey as k, o_totalprice as p
                              from orders)
                 select count(1) from lo where p > c_acctbal and k < 500) as n
         from customer where c_custkey < 150 order by c_custkey""")
    val want = rows(
      """select c_custkey,
                (select count(1) from orders
                  where o_totalprice > c_acctbal and o_custkey < 500) as n
         from customer where c_custkey < 150 order by c_custkey""")
    assert(got.nonEmpty && got == want)
  }

  // ---- LIMIT / DISTINCT ON bodies in correlated IN --------------------

  test("correlated IN with LIMIT OFFSET equals the count-threshold oracle") {
    // the body selects its own correlation key, so membership after
    // LIMIT 1 OFFSET 2 holds iff the key has >= 3 orders
    val got = keys(
      """select c_custkey from customer
         where c_custkey in (
           select o_custkey from orders where o_custkey = c_custkey
            order by o_orderkey limit 1 offset 2)
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where (select count(1) from orders
                 where o_custkey = c_custkey) >= 3
         order by c_custkey""")
    assert(got.nonEmpty && got == want)
  }

  test("correlated IN LIMIT equals the min-or-second scalar cross-check") {
    // 1 ∈ (2 smallest linenumbers) iff min = 1 or the 2nd-smallest = 1 —
    // the rhs rides the already-proven scalar top-1 OFFSET machinery.
    // Ties within an order share the select value (order col = value
    // col), so the kept SET is deterministic either way
    val got = keys(
      """select o_orderkey from orders
         where o_orderkey < 2000 and 1 in (
           select l_linenumber from lineitem where l_orderkey = o_orderkey
            order by l_linenumber limit 2)
         order by o_orderkey""")
    val want = keys(
      """select o_orderkey from orders
         where o_orderkey < 2000
           and ((select min(l_linenumber) from lineitem
                  where l_orderkey = o_orderkey) = 1
             or (select l_linenumber from lineitem
                  where l_orderkey = o_orderkey
                  order by l_linenumber limit 1 offset 1) = 1)
         order by o_orderkey""")
    assert(got.nonEmpty && got == want)
  }

  test("correlated NOT IN with LIMIT complements the IN result") {
    // linenumbers are never NULL, so IN ∪ NOT IN partitions the keys
    // (an empty post-limit set makes IN false and NOT IN true)
    val inKeys = keys(
      """select o_orderkey from orders
         where o_orderkey < 2000 and 1 in (
           select l_linenumber from lineitem where l_orderkey = o_orderkey
            order by l_linenumber desc limit 2)
         order by o_orderkey""")
    val notInKeys = keys(
      """select o_orderkey from orders
         where o_orderkey < 2000 and 1 not in (
           select l_linenumber from lineitem where l_orderkey = o_orderkey
            order by l_linenumber desc limit 2)
         order by o_orderkey""")
    val all = keys(
      "select o_orderkey from orders where o_orderkey < 2000 order by o_orderkey")
    assert(inKeys.nonEmpty && notInKeys.nonEmpty)
    assert(inKeys.toSet.intersect(notInKeys.toSet).isEmpty)
    assert((inKeys ++ notInKeys).sorted == all)
  }

  test("correlated IN with DISTINCT ON keeps first per group per outer row") {
    // DISTINCT ON (parity) ordered by (parity, linenumber) keeps the min
    // linenumber per parity; 2 is even, so membership ≡ min-even = 2
    val in2 = keys(
      """select o_orderkey from orders
         where o_orderkey < 2000 and 2 in (
           select distinct on (l_linenumber % 2) l_linenumber
             from lineitem where l_orderkey = o_orderkey
            order by l_linenumber % 2, l_linenumber)
         order by o_orderkey""")
    val want2 = keys(
      """select o_orderkey from orders
         where o_orderkey < 2000
           and (select min(l_linenumber) from lineitem
                 where l_orderkey = o_orderkey and l_linenumber % 2 = 0) = 2
         order by o_orderkey""")
    assert(in2.nonEmpty && in2 == want2)
  }

  // ---- GROUP BY bodies under correlated scalar LIMIT 1 ----------------

  test("grouped scalar top-1 on the group key equals the plain aggregate") {
    // grouping by the selected key and taking the last group in key
    // order is max(key) — a data-independent identity
    val got = rows(
      """select o_orderkey,
                (select l_suppkey from lineitem
                  where l_orderkey = o_orderkey
                  group by l_suppkey order by l_suppkey desc limit 1) as s
         from orders where o_orderkey < 500 order by o_orderkey""")
    val want = rows(
      """select o_orderkey,
                (select max(l_suppkey) from lineitem
                  where l_orderkey = o_orderkey) as s
         from orders where o_orderkey < 500 order by o_orderkey""")
    assert(got.nonEmpty && got == want)
  }

  test("grouped scalar top-1 OFFSET picks the second group") {
    // groups are linenumber parities in parity order; the second group
    // exists (value 1) iff the order has both parities
    val got = rows(
      """select o_orderkey,
                (select l_linenumber % 2 from lineitem
                  where l_orderkey = o_orderkey
                  group by l_linenumber % 2
                  order by l_linenumber % 2 limit 1 offset 1) as p
         from orders where o_orderkey < 500 order by o_orderkey""")
    val want = rows(
      """select o_orderkey,
                case when (select min(l_linenumber % 2) from lineitem
                            where l_orderkey = o_orderkey) = 0
                       and (select max(l_linenumber % 2) from lineitem
                            where l_orderkey = o_orderkey) = 1
                     then 1 end as p
         from orders where o_orderkey < 500 order by o_orderkey""")
    assert(got.nonEmpty && got == want)
  }

  // ---- DISTINCT ON in nested grandparent EXISTS bodies ----------------

  test("nested EXISTS body with DISTINCT ON equals the plain form") {
    // DISTINCT ON cannot change existence — the engine drops it on the
    // plain EXISTS path (grandparent ref forces the nested lowering)
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and exists (
               select distinct on (l_suppkey) l_extendedprice from lineitem
                where l_orderkey = o_orderkey and l_extendedprice > c_acctbal
                order by l_suppkey, l_linenumber))
         order by c_custkey""")
    val want = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and exists (
               select 1 from lineitem
                where l_orderkey = o_orderkey and l_extendedprice > c_acctbal))
         order by c_custkey""")
    assert(got.nonEmpty && got == want)
  }

  test("nested IN body with DISTINCT ON keeps the first row per ON key") {
    // supported since round 8 ([[Binder.sliceInNestedBody]]): the
    // membership set per (customer, order) pair is the first
    // (linenumber, orderkey)-ordered qualifying lineitem of each
    // suppkey. Oracle computed in Scala from the raw tables (the extra
    // orderkey sort key makes the kept row deterministic).
    val got = keys(
      """select c_custkey from customer
         where c_custkey < 150 and exists (
           select 1 from orders where o_custkey = c_custkey
             and o_orderkey in (
               select distinct on (l_suppkey) l_orderkey from lineitem
                where l_extendedprice > c_acctbal
                order by l_suppkey, l_linenumber, l_orderkey))
         order by c_custkey""")
    val li = rows(
      "select l_suppkey, l_linenumber, l_orderkey, l_extendedprice from lineitem")
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getDouble(3)))
    val ords = rows("select o_orderkey, o_custkey from orders")
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = rows(
      "select c_custkey, c_acctbal from customer where c_custkey < 150 order by c_custkey")
      .map(r => (r.getLong(0), r.getDouble(1)))
      .filter { case (ck, ab) =>
        val kept = li.filter(_._4 > ab).groupBy(_._1).values
          .map(_.minBy(t => (t._2, t._3))._3).toSet
        ords.exists(o => o._2 == ck && kept(o._1))
      }.map(_._1)
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  // ---- DISTINCT bodies in correlated scalar lookups -------------------

  test("DISTINCT scalar lookup collapses duplicate values to one row") {
    // every lineitem of an order shares l_orderkey % 7, so the deduped
    // lookup is a legal scalar; without DISTINCT the same body raises
    // on any order with >1 line
    val got = rows(
      """select o_orderkey,
                (select distinct l_orderkey % 7 from lineitem
                  where l_orderkey = o_orderkey) as m
         from orders where o_orderkey < 300 order by o_orderkey""")
    val want = rows(
      """select o_orderkey,
                case when exists (select 1 from lineitem
                                   where l_orderkey = o_orderkey)
                     then o_orderkey % 7 end as m
         from orders where o_orderkey < 300 order by o_orderkey""")
    assert(got.nonEmpty && got == want)
  }

  test("DISTINCT scalar lookup still raises on >1 distinct value") {
    val e = intercept[Exception](rows(
      """select o_orderkey,
                (select distinct l_partkey from lineitem
                  where l_orderkey = o_orderkey) as p
         from orders where o_orderkey < 300 order by o_orderkey"""))
    assert(e.getMessage.contains("more than one row") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("more than one row"))
  }

  test("correlated IN with LIMIT and no ORDER BY fails cleanly") {
    val e = intercept[Exception](rows(
      """select c_custkey from customer
         where c_custkey in (
           select o_custkey from orders where o_custkey = c_custkey limit 2)"""))
    assert(e.getMessage.contains("needs an ORDER BY"))
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

  // ---- theta-grouped IN (session: GROUP BY bodies on the theta path) --

  test("theta-grouped IN equals the aggregated-EXISTS form") {
    // membership of c_nationkey in the grouped set ≡ the group keyed
    // c_nationkey itself survives HAVING — the aggregated-EXISTS path
    // is proven independently (qe78 family)
    val got = keys(
      """select o_orderkey from orders
         where o_orderkey < 200
           and o_orderkey % 10 in (select l_linenumber from lineitem
                                   where l_extendedprice > o_totalprice / 8
                                   group by l_linenumber having count(1) >= 2)
         order by o_orderkey""")
    val want = keys(
      """select o_orderkey from orders
         where o_orderkey < 200
           and (select count(1) from lineitem
                where l_linenumber = o_orderkey % 10
                  and l_extendedprice > o_totalprice / 8) >= 2
         order by o_orderkey""")
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  test("theta IN with an unselective LIMIT equals the no-LIMIT form") {
    val base =
      """select c_custkey from customer
         where c_custkey < 200
           and c_custkey in (select o_custkey from orders
                             where o_totalprice > c_acctbal * 30%s)
         order by c_custkey"""
    val got = keys(base.format(" order by o_totalprice desc, o_orderkey limit 1000000"))
    val want = keys(base.format(""))
    assert(want.nonEmpty, "vacuous fixture")
    assert(got == want)
  }

  test("theta scalar ORDER BY … LIMIT 1 equals the min-aggregate form") {
    val got = rows(
      """select c_custkey,
           (select o_orderkey from orders
            where o_totalprice < c_acctbal * 40
            order by o_orderkey limit 1) as v
         from customer where c_custkey < 200 order by c_custkey""")
    val want = rows(
      """select c_custkey,
           (select min(o_orderkey) from orders
            where o_totalprice < c_acctbal * 40) as v
         from customer where c_custkey < 200 order by c_custkey""")
    assert(want.exists(!_.isNullAt(1)), "vacuous fixture")
    assert(got.map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))) ==
      want.map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))))
  }

  test("DISTINCT ON scalar with a pinned group equals the max-aggregate form") {
    // one possible ON-group ('R') whose kept row's select value is the
    // group key itself — so the survivor equals max(flag) over matches
    val got = rows(
      """select o_orderkey,
           (select distinct on (l_returnflag) l_returnflag from lineitem
            where l_orderkey = o_orderkey and l_returnflag = 'R'
            order by l_returnflag) as f
         from orders where o_orderkey < 500 order by o_orderkey""")
    val want = rows(
      """select o_orderkey,
           (select max(l_returnflag) from lineitem
            where l_orderkey = o_orderkey and l_returnflag = 'R') as f
         from orders where o_orderkey < 500 order by o_orderkey""")
    def norm(rs: Seq[Row]) = rs.map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getString(1))))
    assert(norm(want).exists(_._2.isDefined), "vacuous fixture")
    assert(norm(got) == norm(want))
  }

  test("DISTINCT + LIMIT over a one-row aggregate body are no-ops (both paths)") {
    // equality-correlated scalar and theta IN, each with the full
    // DISTINCT … LIMIT 1 decoration over an ungrouped aggregate
    val got = rows(
      """select c_custkey,
           (select distinct min(o_totalprice) from orders
            where o_custkey = c_custkey limit 1) as v
         from customer where c_custkey < 100
           and c_nationkey in (select distinct min(s_nationkey) from supplier
                               where s_acctbal > c_acctbal limit 1)
         order by c_custkey""")
    val want = rows(
      """select c_custkey,
           (select min(o_totalprice) from orders
            where o_custkey = c_custkey) as v
         from customer where c_custkey < 100
           and c_nationkey in (select min(s_nationkey) from supplier
                               where s_acctbal > c_acctbal)
         order by c_custkey""")
    def norm(rs: Seq[Row]) = rs.map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(norm(got) == norm(want))
  }

  test("LIMIT over a one-row aggregate body is a no-op") {
    val got = rows(
      """select c_custkey,
           (select min(o_totalprice) from orders
            where o_custkey = c_custkey limit 1) as v
         from customer where c_custkey < 100 order by c_custkey""")
    val want = rows(
      """select c_custkey,
           (select min(o_totalprice) from orders
            where o_custkey = c_custkey) as v
         from customer where c_custkey < 100 order by c_custkey""")
    def norm(rs: Seq[Row]) = rs.map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(norm(got) == norm(want))
  }

  test("right semi/anti USING equal their ON-condition forms") {
    val semiU = keys(
      """select sk from
           (select o_custkey % 50 as sk from orders where o_totalprice > 450000) as o
           right semi join (select s_suppkey as sk from supplier) as s using (sk)
         order by sk""")
    val semiOn = keys(
      """select s.sk from
           (select o_custkey % 50 as sk from orders where o_totalprice > 450000) as o
           right semi join (select s_suppkey as sk from supplier) as s on o.sk = s.sk
         order by sk""")
    assert(semiU == semiOn)
    val antiU = keys(
      """select sk from
           (select o_custkey % 50 as sk from orders where o_totalprice > 450000) as o
           right anti join (select s_suppkey as sk from supplier) as s using (sk)
         order by sk""")
    val antiOn = keys(
      """select s.sk from
           (select o_custkey % 50 as sk from orders where o_totalprice > 450000) as o
           right anti join (select s_suppkey as sk from supplier) as s on o.sk = s.sk
         order by sk""")
    assert(antiU == antiOn)
    assert((semiU ++ antiU).sorted ==
      keys("select s_suppkey from supplier order by s_suppkey"))
  }

  test("IN body LIMIT WITH TIES: no-op under a unique sort key, superset otherwise") {
    // unique key (l_orderkey, l_linenumber ordering surrogate via
    // extendedprice ties broken by linenumber): ties change nothing
    val tiesUnique = keys(
      """select o_orderkey from orders
         where o_orderkey < 300 and o_custkey % 10 in (
           select l_linenumber from lineitem
           where l_orderkey = o_orderkey
           order by l_extendedprice desc, l_linenumber limit 2 with ties)
         order by o_orderkey""")
    val plainUnique = keys(
      """select o_orderkey from orders
         where o_orderkey < 300 and o_custkey % 10 in (
           select l_linenumber from lineitem
           where l_orderkey = o_orderkey
           order by l_extendedprice desc, l_linenumber limit 2)
         order by o_orderkey""")
    assert(tiesUnique == plainUnique)
    // colliding key (quantity): the tie cut keeps a SUPERSET membership
    val tiesColl = keys(
      """select o_orderkey from orders
         where o_orderkey < 300 and o_custkey % 10 in (
           select l_linenumber from lineitem
           where l_orderkey = o_orderkey
           order by l_quantity desc limit 2 with ties)
         order by o_orderkey""")
    val plainColl = keys(
      """select o_orderkey from orders
         where o_orderkey < 300 and o_custkey % 10 in (
           select l_linenumber from lineitem
           where l_orderkey = o_orderkey
           order by l_quantity desc, l_linenumber limit 2)
         order by o_orderkey""")
    assert(plainColl.toSet.subsetOf(tiesColl.toSet))
  }

  test("theta-grouped scalar top-1 matches a driver-side brute force") {
    val got = rows(
      """select o_orderkey,
           (select l_suppkey from lineitem
            where l_extendedprice > o_totalprice / 4
            group by l_suppkey
            order by count(1) desc, l_suppkey limit 1) as busiest
         from orders where o_orderkey < 100 order by o_orderkey""")
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    val lines = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_suppkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .filter(_._1 < 100).sortBy(_._1)
    val want = orders.map { case (ok, tp) =>
      val counts = lines.filter(_._2 > tp / 4).groupBy(_._1)
        .view.mapValues(_.length).toMap
      val pick = counts.toSeq.sortBy { case (sk, c) => (-c, sk) }.headOption.map(_._1)
      (ok, pick)
    }.toSeq
    assert(want.exists(_._2.isDefined), "vacuous fixture")
    assert(got == want)
  }
}
