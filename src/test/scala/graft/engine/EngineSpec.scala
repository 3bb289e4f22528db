package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** End-to-end engine tests: NutQL text → Engine.execute → results, over
  * the sf0.001 testdata. The oracle-grade checks live in SparkEntry/Verify;
  * these assert engine semantics (DDL, views, statement surface) the
  * correctness harness can't express as single SELECTs. */
class EngineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var engine: Engine = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .appName("engine-spec").master("local[4]")
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

  test("select with filter, group, order") {
    val r = rows("""
      select o_orderpriority, count(*) as cnt from orders
      where o_orderstatus = 'O'
      group by o_orderpriority order by o_orderpriority""")
    assert(r.nonEmpty)
    assert(r.map(_.getString(0)) == r.map(_.getString(0)).sorted)
  }

  test("expression ladder end-to-end: bitwise tighter than comparison") {
    // p_size & 1 = 1 must parse as (p_size & 1) = 1: odd sizes only
    val odd = rows("select count(*) as n from part where p_size & 1 = 1").head.getLong(0)
    val expected = graft.Tables.load(spark, dir, "part")
      .filter(org.apache.spark.sql.functions.expr("p_size % 2 = 1")).count()
    assert(odd == expected)
  }

  test("joins: inner with group by") {
    val inner = rows("""
      select n_name, count(*) as c from supplier
      join nation on s_nationkey = n_nationkey
      group by n_name order by n_name""")
    assert(inner.nonEmpty)
    // USING requires the column on both sides
    assertThrows[Exception](rows(
      "select count(*) as c from orders join customer using (c_custkey)"))
  }

  test("USING join coalesces key") {
    // build tables with a shared key name via CTEs
    val r = rows("""
      with a as (select n_nationkey as k, n_name from nation),
           b as (select n_nationkey as k, n_regionkey from nation)
      select k, n_name from a join b using (k) order by k limit 5""")
    assert(r.size == 5)
  }

  test("right semi / right anti swap sides") {
    val rs = rows("""
      select o_orderkey from lineitem right semi join orders on l_orderkey = o_orderkey
      order by o_orderkey limit 5""")
    assert(rs.size == 5)
    val ra = rows("""
      select c_custkey from orders right anti join customer on o_custkey = c_custkey
      order by c_custkey""")
    // customers with no orders
    val expected = rows("""
      select c_custkey from customer
      where not exists (select 1 from orders where o_custkey = c_custkey)
      order by c_custkey""")
    assert(ra.map(_.getLong(0)) == expected.map(_.getLong(0)))
  }

  test("exists / not exists / in / not in lower to semi-anti joins") {
    val withOrders = rows("""
      select count(*) as n from customer
      where exists (select 1 from orders where o_custkey = c_custkey)""").head.getLong(0)
    val inForm = rows("""
      select count(*) as n from customer
      where c_custkey in (select o_custkey from orders)""").head.getLong(0)
    assert(withOrders == inForm)
    val without = rows("""
      select count(*) as n from customer
      where not exists (select 1 from orders where o_custkey = c_custkey)""").head.getLong(0)
    val total = rows("select count(*) as n from customer").head.getLong(0)
    assert(withOrders + without == total)
  }

  test("scalar subquery via broadcast cross join") {
    val r = rows("""
      select count(*) as n from orders
      where o_totalprice > (select avg(o_totalprice) from orders)""").head.getLong(0)
    assert(r > 0)
  }

  test("set operations with NutQL precedence") {
    val r = rows("""
      select n_nationkey as k from nation where n_nationkey < 5
      union distinct
      select n_nationkey as k from nation where n_nationkey < 3""")
    assert(r.size == 5)
    val both = rows("""
      select n_nationkey as k from nation where n_nationkey < 5
      intersect
      select n_nationkey as k from nation where n_nationkey < 3""")
    assert(both.size == 3)
  }

  test("distinct on keeps first row per key in order") {
    val r = rows("""
      select distinct on (c_mktsegment) c_mktsegment, c_custkey, c_acctbal
      from customer order by c_acctbal desc, c_custkey""")
    val segs = r.map(_.getString(0))
    assert(segs.distinct.size == segs.size)
    // each kept row holds the max acctbal of its segment
    val maxBySeg = graft.Tables.load(spark, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(org.apache.spark.sql.functions.max("c_acctbal").as("m"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    r.foreach(row => assert(row.getDouble(2) == maxBySeg(row.getString(0))))
  }

  test("limit with ties via broadcast threshold") {
    val ties = rows("""
      select p_partkey, p_size from part order by p_size desc limit 10 with ties""")
    val plain = rows("""
      select p_partkey, p_size from part order by p_size desc limit 10""")
    assert(ties.size >= plain.size)
    val kth = plain.last.getInt(1)
    assert(ties.forall(_.getInt(1) >= kth))
  }

  test("limit offset and limit o,n forms agree") {
    val a = rows("select o_orderkey from orders order by o_orderkey limit 10 offset 5")
    val b = rows("select o_orderkey from orders order by o_orderkey limit 5, 10")
    assert(a.map(_.getLong(0)) == b.map(_.getLong(0)))
  }

  test("interval arithmetic and date functions") {
    val r = rows("""
      select count(*) as n from orders
      where o_orderdate >= toDate('1995-01-01')
        and o_orderdate < toDate('1995-01-01') + interval 1 year""").head.getLong(0)
    val viaYear = rows("""
      select count(*) as n from orders where getYear(o_orderdate) = 1995""").head.getLong(0)
    assert(r == viaYear)
  }

  test("case, if, string concat with +") {
    val r = rows("""
      select if p_size > 25 then 'big' else 'small' end as label,
             case when p_size > 25 then 1 else 0 end as flag,
             p_name + '!' as shouted
      from part order by p_partkey limit 3""")
    assert(r.forall(x => (x.getString(0) == "big") == (x.getInt(1) == 1)))
    assert(r.forall(_.getString(2).endsWith("!")))
  }

  test("table functions numbers() and aggregation over it") {
    val r = rows("select count(*) as n, toInt64(max(number)) as mx from numbers(100)").head
    assert(r.getLong(0) == 100 && r.getLong(1) == 99)
  }

  test("query parameters bind") {
    val df = engine.execute(
      "select count(*) as n from orders where o_orderstatus = $0", Seq("O"))
    assert(df.collect().head.getLong(0) > 0)
  }

  test("set config and read it back in an expression") {
    sql("set @min_size = 40")
    val n = rows("select count(*) as n from part where p_size >= @min_size").head.getLong(0)
    val direct = rows("select count(*) as n from part where p_size >= 40").head.getLong(0)
    assert(n == direct)
  }

  test("explain returns a plan") {
    val plan = rows("explain select count(*) as n from orders").map(_.getString(0)).mkString("\n")
    assert(plan.contains("Physical Plan") || plan.contains("Aggregate"))
  }

  test("DDL round-trip: create, insert values, select, describe, drop") {
    sql("""create table t_round (
            a Int32, b Nullable(String), c Decimal64(2) default 0.5,
            constraint pos check a >= 0
          ) order by a comment 'round trip'""")
    sql("insert into t_round (a, b) values (1, 'x'), (2, 'y'), (3, null)")
    sql("insert into t_round values (4, 'z', 9.25)")
    val r = rows("select a, b, toFloat64(c) as c from t_round order by a")
    assert(r.size == 4)
    assert(r(0).getDouble(2) == 0.5) // default applied
    assert(r(3).getDouble(2) == 9.25)
    assert(r(2).isNullAt(1)) // explicit null into Nullable(String)
    val desc = rows("describe table t_round")
    assert(desc.map(_.getString(0)) == Seq("a", "b", "c"))
    assert(desc(1).getString(1) == "Nullable(String)")
    // constraint rejects bad rows
    assertThrows[GraftException](sql("insert into t_round (a, b) values (-1, 'bad')"))
    sql("drop table t_round")
    assertThrows[GraftException](sql("select * from t_round")) // wait: * needs from known table
  }

  test("insert into ... select + truncate + optimize") {
    sql("create table t_sel (k Int64, total Float64)")
    sql("""insert into t_sel
           select o_custkey, sum(o_totalprice) from orders group by o_custkey""")
    val n1 = rows("select count(*) as n from t_sel").head.getLong(0)
    assert(n1 > 0)
    sql("optimize table t_sel")
    assert(rows("select count(*) as n from t_sel").head.getLong(0) == n1)
    sql("truncate table t_sel")
    assert(rows("select count(*) as n from t_sel").head.getLong(0) == 0)
    sql("drop table t_sel")
  }

  test("serial columns assign unique ids on insert") {
    sql("create table t_ser (id Serial64, v Int32)")
    sql("insert into t_ser (v) values (10), (20), (30)")
    sql("insert into t_ser (v) values (40)")
    val ids = rows("select id from t_ser").map(_.getLong(0))
    assert(ids.distinct.size == 4)
    sql("drop table t_ser")
  }

  test("alter table add/drop/rename column with data rewrite") {
    sql("create table t_alt (a Int32, b String)")
    sql("insert into t_alt values (1, 'one'), (2, 'two')")
    sql("alter table t_alt add column c Float64 default 1.5 after a")
    val desc = rows("describe table t_alt").map(_.getString(0))
    assert(desc == Seq("a", "c", "b"))
    assert(rows("select c from t_alt").forall(_.getDouble(0) == 1.5))
    sql("alter table t_alt rename column c renamed_c")
    assert(rows("describe table t_alt").map(_.getString(0)).contains("renamed_c"))
    sql("alter table t_alt drop column renamed_c")
    assert(rows("describe table t_alt").map(_.getString(0)) == Seq("a", "b"))
    sql("alter table t_alt rename table t_alt2")
    assert(rows("select count(*) as n from t_alt2").head.getLong(0) == 2)
    sql("drop table t_alt2")
  }

  test("corpus 11.sql DDL executes and DESCRIBE matches declared schema") {
    val ddl = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/sql/11.sql")), "UTF-8")
    sql(ddl)
    val desc = rows("describe table uk_price_paid")
    assert(desc.size == 15)
    assert(desc.head.getString(0) == "price" && desc.head.getString(1) == "UInt32")
    assert(desc.find(_.getString(0) == "type").get.getString(1).startsWith("Enum("))
    assert(desc.find(_.getString(0) == "street").get.getString(1) == "Dictionary(String)")
    sql("insert into uk_price_paid (price, date, addr1, addr2, type) values (100000, toDate('2024-01-02'), '1 Main St', '', 'flat')")
    assert(rows("select count(*) as n from uk_price_paid").head.getLong(0) == 1)
    // constraint c_is_new CHECK is_new < 2 rejects is_new = 5
    assertThrows[GraftException](
      sql("insert into uk_price_paid (price, is_new) values (1, 5)"))
    sql("drop table uk_price_paid")
  }

  test("corpus 13.sql INSERT round-trips (typed coercion of string row)") {
    sql("create table test (c1 Int32, c2 Int32, c3 Int32)")
    val ins = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/sql/13.sql")), "UTF-8")
    sql(ins) // VALUES (1,2,3), ('1','2','3') — both rows coerce to ints
    val r = rows("select c1, c2, c3 from test order by c1")
    assert(r.size == 2 && r.forall(x => x.getInt(0) == 1 && x.getInt(1) == 2 && x.getInt(2) == 3))
    sql("drop table test")
  }

  test("summing view over UNION ALL (corpus 12.sql shape)") {
    sql("create table supply1 (supplyid Int32, supplier Int64)")
    sql("create table supply2 (supplyid Int32, supplier Int64)")
    sql("insert into supply1 values (1, 10), (2, 20)")
    sql("insert into supply2 values (1, 5), (3, 30)")
    sql("""create view all_supplier_view
             update by Summing
             order by supplyid
           as
           select supplyid, supplier from supply1
           union all
           select supplyid, supplier from supply2""")
    val r = rows("select supplyid, supplier from all_supplier_view order by supplyid")
    assert(r.map(x => (x.getInt(0), x.getLong(1))) == Seq((1, 15L), (2, 20L), (3, 30L)))
    sql("drop view all_supplier_view")
    sql("drop table supply1")
    sql("drop table supply2")
  }

  test("insert into ... from file() reads external parquet") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-filefn-").toString + "/in.parquet"
    graft.Tables.load(spark, dir, "nation")
      .select("n_nationkey", "n_name").write.parquet(tmp)
    sql("create table t_file (k Int64, name String)")
    sql(s"insert into t_file from file('$tmp')")
    assert(rows("select count(*) as n from t_file").head.getLong(0) == 25)
    // file() also works directly as a FROM source
    val direct = rows(s"select count(*) as n from file('$tmp')").head.getLong(0)
    assert(direct == 25)
    sql("drop table t_file")
  }

  test("wildcard projections: *, qualified t.*, mixed") {
    val all = rows("select * from nation order by n_nationkey limit 2")
    assert(all.head.length == 3) // n_nationkey, n_name, n_regionkey
    val qual = rows("""
      select n.*, r.r_name from nation as n
      join region as r on n.n_regionkey = r.r_regionkey
      order by n.n_nationkey limit 2""")
    assert(qual.head.length == 4)
    val star = rows("""
      select * from nation as n
      join region as r on n.n_regionkey = r.r_regionkey
      order by n.n_nationkey limit 1""")
    assert(star.head.length == 5)
  }

  test("describe database lists catalog entries") {
    val names = rows("describe database").map(_.getString(0))
    assert(names.contains("orders") && names.contains("lineitem"))
  }

  test("collection literals and index access") {
    val r = rows("select [10, 20, 30][2] as x, {'a': 1, 'b': 2}['b'] as y").head
    assert(r.getInt(0) == 20 && r.getInt(1) == 2)
  }

  test("asof join picks latest at-or-before row") {
    val r = rows("""
      with views as (select user_id, ts, value from events where event_type = 'view'),
           clicks as (select event_id, user_id, ts from events where event_type = 'click')
      select clicks.event_id, views.value as asof_value
      from clicks asof join views on clicks.user_id = views.user_id and clicks.ts >= views.ts
      order by clicks.event_id limit 20""")
    assert(r.nonEmpty)
  }

  test("aggregate referenced only in ORDER BY still triggers grouping") {
    val r = rows("""
      select o_orderpriority from orders
      group by o_orderpriority
      order by count(*) desc, o_orderpriority limit 2""")
    val expected = rows("""
      select o_orderpriority, count(*) as c from orders
      group by o_orderpriority order by c desc, o_orderpriority limit 2""")
    assert(r.map(_.getString(0)) == expected.map(_.getString(0)))
  }

  test("scalar subquery in HAVING (TPC-H Q11 shape)") {
    val r = rows("""
      select c_nationkey, toFloat64(sum(toDecimal(c_acctbal, 12, 2))) as bal
      from customer group by c_nationkey
      having toFloat64(sum(toDecimal(c_acctbal, 12, 2))) >
        (select toFloat64(sum(toDecimal(c_acctbal, 12, 2))) * 0.05 from customer)
      order by c_nationkey""")
    assert(r.nonEmpty && r.size < 25)
  }

  test("asof left join matches the proven union+window lowering (q12)") {
    val engineRows = rows("""
      with b as (select user_id, ts, max(value) as v_value
                 from events where event_type = 'view' group by user_id, ts),
           a as (select event_id, user_id, ts, value from events where event_type = 'click')
      select a.event_id, a.value as click_value, b.v_value as asof_value
      from a asof left join b on a.user_id = b.user_id and a.ts >= b.ts
      order by a.event_id""")
    val expected = graft.queries.CoreQueries.defs.find(_.name == "q12_join_asof").get
      .run(spark, dir)
      .select("event_id", "click_value", "asof_value").collect().toSeq
    assert(engineRows.size == expected.size)
    assert(engineRows.map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
      == expected.map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2))))
  }

  test("function semantics: dayOfWeek Monday=1, dateDiff boundaries, range(0)") {
    val r = rows("""
      select toInt64(getDayOfWeek(toDate('2026-08-10'))) as mon,
             toInt64(getDayOfWeek(toDate('2026-08-16'))) as sun,
             toInt64(dateDiff('month', toDate('2024-01-31'), toDate('2024-02-01'))) as m,
             toInt64(dateDiff('hour', toDateTime('2024-01-01 10:59:00'),
                                      toDateTime('2024-01-01 11:01:00'))) as h,
             toInt64(arrayLength(range(0))) as r0,
             toInt64(arrayLength(range(3))) as r3
      from nation limit 1""").head
    assert(r.getLong(0) == 1 && r.getLong(1) == 7) // ClickHouse weekday numbering
    assert(r.getLong(2) == 1 && r.getLong(3) == 1) // boundary crossings, not intervals
    assert(r.getLong(4) == 0 && r.getLong(5) == 3) // range(0) is empty
    // arity errors are clear GraftExceptions, not index crashes
    val e = intercept[GraftException](rows("select maxBy(n_name) as x from nation"))
    assert(e.msg.contains("2 arguments"))
  }

  test("unknown function and unknown table produce clear errors") {
    val e1 = intercept[GraftException](sql("select frobnicate(1) as x from nation"))
    assert(e1.getMessage.contains("unregistered function"))
    val e2 = intercept[GraftException](sql("select 1 as x from no_such_table"))
    assert(e2.getMessage.contains("unknown table"))
  }

  // ---------------- round-3 features ----------------

  test("correlated scalar subquery decorrelates (TPC-H Q17 shape)") {
    val r = rows("""
      select count(*) as n from part
      where p_retailprice < (select 2 * avg(l_extendedprice) from lineitem
                             where l_partkey = p_partkey)""").head.getLong(0)
    // manual decorrelation with the DataFrame API
    import org.apache.spark.sql.functions._
    val li = graft.Tables.load(spark, dir, "lineitem")
    val avgByPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(avg(col("l_extendedprice")).as("a"))
    val expected = graft.Tables.load(spark, dir, "part")
      .join(avgByPart, col("p_partkey") === col("pk"), "left")
      .filter(col("p_retailprice") < lit(2) * col("a")).count()
    assert(r == expected && r > 0)
  }

  test("correlated count subquery yields 0 (not NULL) for unmatched rows") {
    val r = rows("""
      select count(*) as n from customer
      where 0 = (select count(*) from orders where o_custkey = c_custkey)""").head.getLong(0)
    val expected = rows("""
      select count(*) as n from customer
      where not exists (select 1 from orders where o_custkey = c_custkey)""").head.getLong(0)
    assert(r == expected)
  }

  test("non-equi correlated EXISTS (TPC-H Q21 fragment)") {
    val r = rows("""
      select count(*) as n from lineitem as l1
      where exists (select 1 from lineitem as l2
                    where l2.l_orderkey = l1.l_orderkey
                      and l2.l_suppkey != l1.l_suppkey)""").head.getLong(0)
    import org.apache.spark.sql.functions._
    val li = graft.Tables.load(spark, dir, "lineitem")
    val l2 = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val expected = li.join(l2,
        li("l_orderkey") === col("ok2") && li("l_suppkey") =!= col("sk2"), "left_semi")
      .count()
    assert(r == expected && r > 0)
  }

  test("EXISTS with GROUP BY + HAVING (TPC-H Q20 shape)") {
    val r = rows("""
      select count(*) as n from part
      where exists (select 1 from lineitem where l_partkey = p_partkey
                    group by l_partkey having sum(l_quantity) > 50)""").head.getLong(0)
    import org.apache.spark.sql.functions._
    val li = graft.Tables.load(spark, dir, "lineitem")
    val heavy = li.groupBy(col("l_partkey")).agg(sum(col("l_quantity")).as("q"))
      .filter(col("q") > 50)
    val expected = graft.Tables.load(spark, dir, "part")
      .join(heavy, col("p_partkey") === col("l_partkey"), "left_semi").count()
    assert(r == expected && r > 0)
  }

  test("ambiguous unqualified identifier is an error, qualified works") {
    val e = intercept[GraftException](rows("""
      with a as (select n_nationkey as k, n_name from nation),
           b as (select n_regionkey as k, n_name from nation)
      select n_name from a join b on a.k = b.k limit 1"""))
    assert(e.msg.contains("ambiguous column"))
    // the same query with a qualifier runs
    assert(rows("""
      with a as (select n_nationkey as k, n_name from nation),
           b as (select n_regionkey as k, n_name from nation)
      select a.n_name from a join b on a.k = b.k limit 1""").size == 1)
  }

  test("multi-key LIMIT WITH TIES: no window in the plan, rank semantics") {
    val df = sql("""
      select l_returnflag, l_linestatus, l_orderkey from lineitem
      order by l_returnflag, l_linestatus limit 5 with ties""")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
    // rank() <= 5 reference semantics
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    val li = graft.Tables.load(spark, dir, "lineitem")
    val expected = li
      .withColumn("__rk", rank().over(
        W.orderBy(col("l_returnflag").asc, col("l_linestatus").asc)))
      .filter(col("__rk") <= 5).count()
    assert(df.count() == expected)
    // output ordering survives the threshold join (EliminateSorts fix)
    val keys = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
  }

  test("LIMIT accepts $n parameters") {
    val r = engine.execute(
      "select o_orderkey from orders order by o_orderkey limit $0 offset $1",
      Seq(7, 3)).collect()
    val direct = rows("select o_orderkey from orders order by o_orderkey limit 7 offset 3")
    assert(r.map(_.getLong(0)).toSeq == direct.map(_.getLong(0)))
    val e = intercept[GraftException](engine.execute(
      "select o_orderkey from orders limit $0", Seq("x")).collect())
    assert(e.msg.contains("must be an integer"))
  }

  test("scalar subquery: >1 row raises, 0 rows yields NULL not empty") {
    val multi = intercept[Exception](rows(
      "select (select o_orderkey from orders) as x from nation limit 1"))
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + "\n" + chain(t.getCause)
    assert(chain(multi).contains("more than one row"))
    // empty subquery → NULL (the old limit(1)+crossJoin emptied the result)
    val r = rows("""
      select count(*) as n, toInt64(countIf((select max(o_totalprice) from orders
        where o_totalprice < 0) is null)) as nulls
      from nation""").head
    assert(r.getLong(0) == 25 && r.getLong(1) == 25)
  }

  test("Serial32 ids stay dense across partitions (no high-bit overflow)") {
    sql("create table t_ser32 (id Serial32, v Int32)")
    // multi-row VALUES lands each row in its own partition — the old
    // monotonically_increasing_id lowering overflowed here (ADVICE r2)
    sql("insert into t_ser32 (v) values (1), (2), (3), (4), (5)")
    sql("insert into t_ser32 (v) values (6), (7)")
    val ids = rows("select id from t_ser32 order by id").map(_.getInt(0))
    assert(ids == (1 to 7).toList)
    sql("drop table t_ser32")
  }

  test("intDiv is true integral division") {
    val r = rows("""select intDiv(9007199254740993, 2) as big,
                           intDiv(7, 2) as small from nation limit 1""").head
    // 2^53+1 / 2 — the old double-divide path rounded this to 2^52+1
    assert(r.getLong(0) == 4503599627370496L && r.getLong(1) == 3L)
  }

  test("OPTIMIZE ON PARTITION keeps the other partitions' rows") {
    sql("create table t_part (k Int32, p String) partition by p")
    sql("insert into t_part values (1, 'a'), (2, 'a'), (3, 'b'), (4, 'c')")
    sql("optimize table t_part on partition 'a'")
    val r = rows("select k, p from t_part order by k")
    assert(r.map(x => (x.getInt(0), x.getString(1)))
      == Seq((1, "a"), (2, "a"), (3, "b"), (4, "c")))
    // a further partitioned INSERT still reads cleanly (layout preserved)
    sql("insert into t_part values (5, 'd')")
    assert(rows("select count(*) as n from t_part").head.getLong(0) == 5)
    sql("drop table t_part")
  }

  test("CREATE TABLE after RENAME does not clobber the renamed table's data") {
    sql("create table t_ren (k Int32)")
    sql("insert into t_ren values (1), (2)")
    sql("alter table t_ren rename table t_ren2")
    sql("create table t_ren (k Int32)") // same name, fresh directory
    sql("insert into t_ren values (9)")
    assert(rows("select count(*) as n from t_ren2").head.getLong(0) == 2)
    assert(rows("select count(*) as n from t_ren").head.getLong(0) == 1)
    sql("drop table t_ren"); sql("drop table t_ren2")
  }

  test("INSERT with an unknown column errors instead of dropping the value") {
    sql("create table t_badcol (a Int32, b Int32)")
    val e = intercept[GraftException](sql("insert into t_badcol (a, bb) values (1, 2)"))
    assert(e.msg.contains("unknown column 'bb'"))
    sql("drop table t_badcol")
  }

  test("DROP with the wrong entity kind errors") {
    sql("create table t_kind (k Int32)")
    val e = intercept[GraftException](sql("drop view t_kind"))
    assert(e.msg.contains("not a view"))
    sql("drop table t_kind")
  }

  test("RENAME COLUMN keeps metadata bound; DROP of a referenced column errors") {
    sql("""create table t_meta (k Int32, v Int64, constraint pos check k >= 0)
           order by k""")
    sql("insert into t_meta values (1, 10)")
    sql("alter table t_meta rename column k key")
    // constraint now binds against `key`: valid row passes, bad row fails
    sql("insert into t_meta values (2, 20)")
    assertThrows[GraftException](sql("insert into t_meta values (-1, 0)"))
    sql("optimize table t_meta") // ORDER BY key resolves for the sort
    assert(rows("select count(*) as n from t_meta").head.getLong(0) == 2)
    val e = intercept[GraftException](sql("alter table t_meta drop column key"))
    assert(e.msg.contains("referenced by"))
    sql("drop table t_meta")
  }

  test("materialized view invalidates on a dependency hidden in a JOIN condition") {
    sql("create table t_dep (k Int32, v Int64)")
    sql("insert into t_dep values (1, 5)")
    sql("""create view v_dep update by Summing order by k as
           select n.n_nationkey as k, t.v from nation as n
           join t_dep as t on n.n_nationkey = t.k""")
    sql("optimize table v_dep")
    sql("insert into t_dep values (1, 7)") // bump the JOIN-side dependency
    val r = rows("select k, v from v_dep order by k")
    assert(r.map(x => (x.getInt(0), x.getLong(1))) == Seq((1, 12L)))
    sql("drop view v_dep"); sql("drop table t_dep")
  }

  test("GROUP BY without aggregates works (dedup idiom)") {
    val r = rows("select o_orderstatus from orders group by o_orderstatus order by o_orderstatus")
    val expected = rows("select distinct o_orderstatus from orders order by o_orderstatus")
    assert(r.map(_.getString(0)) == expected.map(_.getString(0)) && r.nonEmpty)
  }

  test("SELECT * with a scalar subquery in WHERE keeps the table's schema") {
    val df = sql("""
      select * from nation
      where n_regionkey = (select max(r_regionkey) from region)""")
    assert(df.columns.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(df.count() > 0)
    // machinery columns stay hidden for OR-position subqueries too
    val df2 = sql("""
      select * from nation
      where n_nationkey in (select r_regionkey from region) or n_nationkey = 20""")
    assert(df2.columns.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
  }

  test("USING semi/anti join exposes only left-side columns") {
    val r = sql("""
      with a as (select n_nationkey as k, n_name from nation),
           b as (select n_regionkey as k from nation)
      select * from a left semi join b using (k)""")
    assert(r.columns.toSeq == Seq("k", "n_name"))
    assert(r.count() > 0)
  }

  test("keyless ASOF with a flipped inequality matches the canonical form") {
    val canonical = rows("""
      with v as (select ts, max(value) as vv from events where event_type = 'view' group by ts),
           c as (select event_id, ts from events where event_type = 'click')
      select c.event_id, v.vv from c asof join v on c.ts >= v.ts
      order by c.event_id limit 20""")
    val flipped = rows("""
      with v as (select ts, max(value) as vv from events where event_type = 'view' group by ts),
           c as (select event_id, ts from events where event_type = 'click')
      select c.event_id, v.vv from c asof join v on v.ts <= c.ts
      order by c.event_id limit 20""")
    assert(canonical.map(r => (r.getLong(0), r.getDouble(1)))
      == flipped.map(r => (r.getLong(0), r.getDouble(1))))
  }

  test("aggregates inside map literals are collected") {
    val r = rows("""
      select o_orderstatus, {'n': count(*)}['n'] as cnt from orders
      group by o_orderstatus order by o_orderstatus""")
    val expected = rows("""
      select o_orderstatus, count(*) as cnt from orders
      group by o_orderstatus order by o_orderstatus""")
    assert(r.map(x => (x.getString(0), x.getLong(1)))
      == expected.map(x => (x.getString(0), x.getLong(1))))
  }

  test("Summing view with an expression key errors instead of merging rows") {
    sql("create table t_sumkey (k Int32, v Int64)")
    sql("insert into t_sumkey values (1, 5)")
    sql("create view v_sumkey update by Summing order by k + 1 as select k, v from t_sumkey")
    val e = intercept[GraftException](rows("select * from v_sumkey"))
    assert(e.msg.contains("plain columns"))
    sql("drop view v_sumkey")
    sql("drop table t_sumkey")
  }

  test("EXISTS LIMIT 0 is constant-false in both positions; OFFSET counts rows") {
    // top-level conjunct
    val top = rows("""
      select count(*) as n from nation
      where exists (select 1 from orders limit 0)""").head.getLong(0)
    assert(top == 0)
    // expression position (under OR): only the other disjunct decides
    val or = rows("""
      select count(*) as n from nation
      where n_nationkey = 3 or exists (select 1 from orders limit 0)""").head.getLong(0)
    assert(or == 1)
    // OFFSET o: existence ⟺ more than o pre-limit rows (round 6).
    // orders has far more than 5 rows and far fewer than 10^8.
    val some = rows("""
      select count(*) as n from nation
      where exists (select 1 from orders limit 1 offset 5)""").head.getLong(0)
    assert(some == 25)
    val none = rows("""
      select count(*) as n from nation
      where exists (select 1 from orders limit 1 offset 100000000)""").head.getLong(0)
    assert(none == 0)
    // ...and in expression position
    val orOff = rows("""
      select count(*) as n from nation
      where n_nationkey = 3 or exists (select 1 from orders limit 1 offset 100000000)""")
      .head.getLong(0)
    assert(orOff == 1)
  }

  test("expression-wrapped correlated count sees 0 for unmatched outer rows") {
    // customers with no orders: count(*) = 0, so count(*) + 1 = 1
    val viaWrapped = rows("""
      select count(*) as n from customer
      where 1 = (select count(*) + 1 from orders where o_custkey = c_custkey)""").head.getLong(0)
    val expected = rows("""
      select count(*) as n from customer
      where not exists (select 1 from orders where o_custkey = c_custkey)""").head.getLong(0)
    assert(viaWrapped == expected)
  }

  test("keyless ASOF join (no equality conjunct) uses the fallback and is correct") {
    val got = rows("""
      with v as (select ts, max(value) as vv from events where event_type = 'view' group by ts),
           c as (select event_id, ts from events where event_type = 'click')
      select c.event_id, c.ts, v.vv from c asof join v on c.ts >= v.ts
      order by c.event_id limit 25""")
    assert(got.nonEmpty)
    // reference semantics: vv of the greatest view ts at-or-before each click
    val views = sql("""
      select ts, max(value) as vv from events where event_type = 'view' group by ts""")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getDouble(1))).sortBy(_._1)
    got.foreach { r =>
      val cts = r.getTimestamp(1).getTime
      val expected = views.filter(_._1 <= cts).lastOption.map(_._2)
      assert(expected.contains(r.getDouble(2)),
        s"event ${r.getLong(0)}: got ${r.getDouble(2)}, expected $expected")
    }
  }

  test("scalar subquery in a keyless ASOF condition rides the fallback plan") {
    // round 6: the scalar (here 0, via min(n_nationkey)) cross-joins
    // onto the left frame during binding; the rider column must not
    // leak into the output (missing-list #6)
    val got = rows("""
      with v as (select ts, max(value) as vv from events where event_type = 'view' group by ts),
           c as (select event_id, value as cv from events where event_type = 'click')
      select c.event_id, c.cv, v.vv from c asof join v
        on c.cv >= v.vv * (select min(n_nationkey) + 1 from nation)
      order by c.event_id limit 25""")
    val plain = rows("""
      with v as (select ts, max(value) as vv from events where event_type = 'view' group by ts),
           c as (select event_id, value as cv from events where event_type = 'click')
      select c.event_id, c.cv, v.vv from c asof join v on c.cv >= v.vv
      order by c.event_id limit 25""")
    assert(got.nonEmpty)
    assert(got.head.length == 3, s"rider columns leaked: ${got.head}")
    assert(got == plain) // ×1 is the identity on the ordering bound
  }

  test("IN and EXISTS subqueries under OR (expression position)") {
    val r = rows("""
      select count(*) as n from customer
      where c_custkey in (select o_custkey from orders where o_orderstatus = 'P')
         or exists (select 1 from orders
                    where o_custkey = c_custkey and o_totalprice > 300000)""").head.getLong(0)
    val a = rows("""
      select c_custkey from customer
      where c_custkey in (select o_custkey from orders where o_orderstatus = 'P')""")
      .map(_.getLong(0)).toSet
    val b = rows("""
      select c_custkey from customer
      where exists (select 1 from orders
                    where o_custkey = c_custkey and o_totalprice > 300000)""")
      .map(_.getLong(0)).toSet
    assert(r == (a ++ b).size && r > 0)
    // empty subquery under OR: IN yields false, the OR's other side decides
    val e = rows("""
      select count(*) as n from nation
      where n_nationkey in (select o_custkey from orders where o_custkey < 0)
         or n_nationkey = 3""").head.getLong(0)
    assert(e == 1)
  }

  test("corpus 9.sql (TPC-H Q22) executes end-to-end through the engine") {
    // the fixture customer table has no c_phone column — substitute the
    // digit tail of c_name ('Customer#%09d', positions 17-18) so the
    // corpus query SHAPE (IN list + uncorrelated scalar avg + correlated
    // NOT EXISTS + derived table + group/order) runs unchanged
    val q22 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/sql/9.sql")), "UTF-8")
      .replace("c_phone, 1, 2", "c_name, 17, 2")
    val got = engine.execute(q22).collect()
    // every fixture customer has orders, so the verbatim NOT EXISTS is
    // empty BY DATA — prove rows flow through the same plan by flipping
    // the quantifier (non-empty), then check the verbatim result matches
    // the reference computation exactly (both possibly empty)
    val flipped = engine.execute(q22.replace("not exists", "exists")).collect()
    assert(flipped.nonEmpty)
    // reference computation with the DataFrame API
    import org.apache.spark.sql.functions._
    val c = graft.Tables.load(spark, dir, "customer")
    val o = graft.Tables.load(spark, dir, "orders")
    val codes = Seq("13", "31", "23", "29", "30", "18", "17")
    val inCodes = substring(col("c_name"), 17, 2).isin(codes: _*)
    val avgBal = c.filter(col("c_acctbal") > 0.0 && inCodes)
      .agg(avg(col("c_acctbal"))).head.getDouble(0)
    val expected = c.filter(inCodes && col("c_acctbal") > avgBal)
      .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(substring(col("c_name"), 17, 2).as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), sum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cntrycode"))
      .collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0) && g.getLong(1) == e.getLong(1))
      assert(math.abs(g.getDouble(2) - e.getDouble(2)) < 1e-6 * math.max(1.0, e.getDouble(2).abs))
    }
  }

  test("correlated IN subquery in expression position (under OR)") {
    val r = rows("""
      select count(*) as n from part
      where p_partkey in (select l_partkey from lineitem
                          where l_suppkey = p_partkey % 100 + 1 and l_quantity > 45)
         or p_size > 49""").head.getLong(0)
    val viaSemi = rows("""
      select p_partkey from part
      where p_partkey in (select l_partkey from lineitem
                          where l_suppkey = p_partkey % 100 + 1 and l_quantity > 45)""")
      .map(_.getLong(0)).toSet
    val viaSize = rows("select p_partkey from part where p_size > 49")
      .map(_.getLong(0)).toSet
    assert(r == (viaSemi ++ viaSize).size && viaSemi.nonEmpty)
  }

  test("scalar subquery inside a JOIN ON condition") {
    val r = rows("""
      select count(*) as n from customer
      join orders on c_custkey = o_custkey
        and o_totalprice > (select avg(o_totalprice) from orders)""").head.getLong(0)
    val expected = rows("""
      select count(*) as n from customer
      join (select o_custkey from orders
            where o_totalprice > (select avg(o_totalprice) from orders)) as o
        on c_custkey = o.o_custkey""").head.getLong(0)
    assert(r == expected && r > 0)
  }

  test("OPTIMIZE materializes a Summing view; source mutation invalidates it") {
    sql("create table t_mat (k Int32, v Int64)")
    sql("insert into t_mat values (1, 10), (2, 20), (1, 5)")
    sql("create view v_mat update by Summing order by k as select k, v from t_mat")
    sql("optimize table v_mat")
    // materialized read: plan scans parquet with no aggregate
    val mat = sql("select k, v from v_mat order by k")
    val matPlan = mat.queryExecution.executedPlan.toString
    assert(!matPlan.contains("HashAggregate"), s"expected materialized scan:\n$matPlan")
    assert(mat.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 15L), (2, 20L)))
    // a source INSERT delta-merges (round 4): reads still serve a
    // materialized parquet scan — no recompute — and see the new rows
    sql("insert into t_mat values (3, 7)")
    val fresh = sql("select k, v from v_mat order by k")
    assert(!fresh.queryExecution.executedPlan.toString.contains("HashAggregate"),
      "INSERT should delta-merge the materialization, not invalidate it")
    assert(fresh.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 15L), (2, 20L), (3, 7L)))
    // a NON-mergeable mutation (TRUNCATE) invalidates: reads recompute
    sql("truncate table t_mat")
    sql("insert into t_mat values (4, 1)")
    val recomputed = sql("select k, v from v_mat order by k")
    assert(recomputed.queryExecution.executedPlan.toString.contains("HashAggregate"),
      "TRUNCATE must invalidate the materialization")
    assert(recomputed.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((4, 1L)))
    // re-OPTIMIZE re-materializes the current state
    sql("optimize table v_mat")
    val again = sql("select k, v from v_mat order by k")
    assert(!again.queryExecution.executedPlan.toString.contains("HashAggregate"))
    assert(again.collect().length == 1)
    sql("drop view v_mat")
    sql("drop table t_mat")
  }

  test("CTE caches are released after releaseCaches()") {
    val df = sql("""
      with big as (select l_partkey, count(*) as c from lineitem group by l_partkey)
      select a.l_partkey from big as a join big as b on a.l_partkey = b.l_partkey
      limit 5""")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(df.collect().length == 5)
    val during = spark.sparkContext.getPersistentRDDs.keySet
    assert((during -- before).nonEmpty) // the multi-ref CTE was cached
    engine.releaseCaches()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty) // ...and released
  }
}
