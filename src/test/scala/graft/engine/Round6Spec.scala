package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Round-6: nested NOT IN with grandparent correlation (the last
  * NOT-variant dialect gap — VERDICT r5 missing-list #1). The lowering
  * extends the per-row candidate-pair machinery with a NULL-aware anti
  * join (`lhs = e OR lhs IS NULL OR e IS NULL`), so three-valued NOT IN
  * semantics hold across two scopes. Spark's own analyzer rejects
  * outer references that skip a scope level, so every oracle below is
  * the hand-decorrelated single-scope equivalent. */
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
    Seq("customer", "orders", "lineitem", "nation", "supplier").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sql(s: String): DataFrame = engine.execute(s)
  private def rows(s: String): Seq[Row] = sql(s).collect().toSeq

  // ---- nested NOT IN with grandparent correlation ---------------------

  test("nested NOT IN whose body filters on the grandparent scope") {
    val r = rows(
      """select c_custkey from customer
         where c_custkey < 200
           and exists (select 1 from orders
                       where o_custkey = c_custkey
                         and o_orderkey not in (select l_orderkey from lineitem
                                                where l_extendedprice > c_acctbal))
         order by c_custkey""")
    // oracle: candidate (customer, order) pairs, then a SINGLE-scope
    // correlated NOT IN Spark can check natively
    val oracle = spark.sql(
      """select c_custkey from customer
         where c_custkey < 200
           and c_custkey in (
             select cp.c_custkey from (
               select c_custkey, c_acctbal, o_orderkey
               from customer join orders on o_custkey = c_custkey
               where c_custkey < 200) cp
             where cp.o_orderkey not in (select l_orderkey from lineitem
                                         where l_extendedprice > cp.c_acctbal))
         order by c_custkey""").collect().toSeq
    assert(r.nonEmpty && r == oracle, s"${r.size} vs ${oracle.size}")
  }

  test("nested NOT IN with an outer-referencing lhs routes to the per-row path") {
    // the LHS itself lives in the grandparent scope — the conjunct's
    // top-level refs reach the outer query, so the corrDeep partition
    // (not the local/flattenable one) must claim it
    val r = rows(
      """select c_custkey from customer
         where c_custkey < 200
           and exists (select 1 from orders
                       where o_custkey = c_custkey
                         and c_nationkey not in (select l_linenumber from lineitem
                                                 where l_orderkey = o_orderkey))
         order by c_custkey""")
    val oracle = spark.sql(
      """select c_custkey from customer
         where c_custkey < 200
           and c_custkey in (
             select cp.c_custkey from (
               select c_custkey, c_nationkey, o_orderkey
               from customer join orders on o_custkey = c_custkey
               where c_custkey < 200) cp
             where cp.c_nationkey not in (select l_linenumber from lineitem
                                          where l_orderkey = cp.o_orderkey))
         order by c_custkey""").collect().toSeq
    assert(r.nonEmpty && r == oracle, s"${r.size} vs ${oracle.size}")
  }

  test("nested NOT IN is three-valued: one NULL in the match set kills the pair") {
    sql("drop table if exists r6_o"); sql("drop table if exists r6_m")
    sql("drop table if exists r6_i")
    sql("create table r6_o (ok Int32, bound Int32)")
    sql("create table r6_m (mk Int32, fk Int32)")
    sql("create table r6_i (ik Int32, v Nullable(Int32))")
    // outer 1: middle rows exist; inner set for bound=10 is {5} (no
    //   match vs lhs mk=1? lhs is mk) …construct per-case:
    // ok=1: middle mk=1 → inner set {5} (no 1, no NULL) → NOT IN true → keep
    // ok=2: middle mk=2 → inner set {5, NULL} → UNKNOWN → pair dies → drop
    // ok=3: middle mk=3 → inner set {3} → match → FALSE → drop
    // ok=4: middle mk=4 → inner set empty → TRUE → keep
    sql("insert into r6_o values (1, 10), (2, 20), (3, 30), (4, 40)")
    sql("insert into r6_m values (1, 10), (2, 20), (3, 30), (4, 40)")
    sql("insert into r6_i values (10, 5), (20, 5), (20, null), (30, 3)")
    val r = rows(
      """select ok from r6_o
         where exists (select 1 from r6_m
                       where mk = ok
                         and mk not in (select v from r6_i where ik = bound))
         order by ok""").map(_.getInt(0))
    assert(r == Seq(1, 4), s"three-valued NOT IN over two scopes: $r")
    sql("drop table r6_o"); sql("drop table r6_m"); sql("drop table r6_i")
  }

  test("NOT IN and NOT EXISTS nested bodies compose in one EXISTS body") {
    val r = rows(
      """select c_custkey from customer
         where c_custkey < 100
           and exists (select 1 from orders
                       where o_custkey = c_custkey
                         and o_orderkey not in (select l_orderkey from lineitem
                                                where l_extendedprice > c_acctbal)
                         and not exists (select 1 from lineitem
                                         where l_orderkey = o_orderkey
                                           and l_partkey < c_custkey))
         order by c_custkey""")
    val oracle = spark.sql(
      """select c_custkey from customer
         where c_custkey < 100
           and c_custkey in (
             select cp.c_custkey from (
               select c_custkey, c_acctbal, o_orderkey
               from customer join orders on o_custkey = c_custkey
               where c_custkey < 100) cp
             where cp.o_orderkey not in (select l_orderkey from lineitem
                                         where l_extendedprice > cp.c_acctbal)
               and not exists (select 1 from lineitem
                               where l_orderkey = cp.o_orderkey
                                 and l_partkey < cp.c_custkey))
         order by c_custkey""").collect().toSeq
    assert(r == oracle, s"${r.size} vs ${oracle.size}")
  }
}
