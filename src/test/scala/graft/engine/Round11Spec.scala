package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Round-11 semantics: the SCALAR staircase for theta-correlated
  * GROUP BY top-1 bodies (qe146's plan — VERDICT r10 #1) and its guard
  * rails, pinned fast ≡ generic on NULL-laden fixtures. */
class Round11Spec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var engine: Engine = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .appName("round11-spec").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    engine = Engine.forTestdata(spark, dir)
    sql("DROP TABLE IF EXISTS r11_t"); sql("DROP TABLE IF EXISTS r11_o")
    sql("CREATE TABLE r11_t (g Int64, c Int64)")
    // g=1: {10,9,8,NULL-c}; g=2: {10,10}; g=3: {12}; g=4: {7,7,7,7}
    sql("""INSERT INTO r11_t VALUES
           (1, 10), (1, 9), (1, 8), (1, null),
           (2, 10), (2, 10), (3, 12), (4, 7), (4, 7), (4, 7), (4, 7)""")
    sql("CREATE TABLE r11_o (ok Int64, t Int64)")
    sql("""INSERT INTO r11_o VALUES
           (1, 11), (2, 9), (3, 8), (4, 7), (5, 6), (6, 12), (7, null)""")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sql(s: String): DataFrame = engine.execute(s)
  private def rows(s: String): Seq[Row] = sql(s).collect().toSeq
  private def longOrNull(r: Row, i: Int): Any =
    if (r.isNullAt(i)) null else r.getLong(i)

  // vacuous second conjunct → correlated.size == 2 → the staircase and
  // the banded planner's monotone-single probe both decline → generic
  private val vac = " AND c > t - 900000000000000"
  private val vacLt = " AND c < t + 900000000000000"

  test("scalar grouped theta top-1 staircase: '>' with ASC tie-break") {
    def q(extra: String) = s"""
      SELECT ok, (SELECT g FROM r11_t WHERE c > t$extra
                  GROUP BY g ORDER BY count(1) DESC, g LIMIT 1) AS w
      FROM r11_o ORDER BY ok"""
    val fast = rows(q("")).map(r => (r.getLong(0), longOrNull(r, 1)))
    // t=11→g3 alone; t=9→g2 (count 2); t=8→tie(g1,g2)@2→min g=1;
    // t=7→g1 (count 3); t=6→g4 (count 4); t=12/NULL→empty→NULL
    assert(fast == Seq((1L, 3L), (2L, 2L), (3L, 1L), (4L, 1L),
      (5L, 4L), (6L, null), (7L, null)))
    assert(rows(q(vac)).map(r => (r.getLong(0), longOrNull(r, 1))) == fast)
  }

  test("staircase DESC tie-break flips the tied pick only") {
    def q(extra: String) = s"""
      SELECT ok, (SELECT g FROM r11_t WHERE c > t$extra
                  GROUP BY g ORDER BY count(1) DESC, g DESC LIMIT 1) AS w
      FROM r11_o ORDER BY ok"""
    val fast = rows(q("")).map(r => (r.getLong(0), longOrNull(r, 1)))
    // only the t=8 tie changes: max g of {1,2} = 2
    assert(fast == Seq((1L, 3L), (2L, 2L), (3L, 2L), (4L, 1L),
      (5L, 4L), (6L, null), (7L, null)))
    assert(rows(q(vac)).map(r => (r.getLong(0), longOrNull(r, 1))) == fast)
  }

  test("staircase '<' direction uses prefix-minima levels") {
    def q(extra: String) = s"""
      SELECT ok, (SELECT g FROM r11_t WHERE c < t$extra
                  GROUP BY g ORDER BY count(1) DESC, g LIMIT 1) AS w
      FROM r11_o ORDER BY ok"""
    val fast = rows(q("")).map(r => (r.getLong(0), longOrNull(r, 1)))
    // t=11: g1{10,9,8}=3,g2=2,g4=4→4; t=9: g1{8}=1,g4=4→4; t=8: g4→4;
    // t=7: none→NULL; t=6: none→NULL; t=12: g1=3,g2=2,g3=1,g4=4→4;
    // t NULL→NULL
    assert(fast == Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, null),
      (5L, null), (6L, 4L), (7L, null)))
    assert(rows(q(vacLt)).map(r => (r.getLong(0), longOrNull(r, 1))) == fast)
  }

  test("bare count HAVING folds in as a level floor") {
    def q(extra: String) = s"""
      SELECT ok, (SELECT g FROM r11_t WHERE c > t$extra
                  GROUP BY g HAVING count(1) >= 2
                  ORDER BY count(1) DESC, g LIMIT 1) AS w
      FROM r11_o ORDER BY ok"""
    val fast = rows(q("")).map(r => (r.getLong(0), longOrNull(r, 1)))
    // t=11: only g3@1 → no group reaches 2 → NULL; t=9: g2@2 → 2;
    // t=8: tie g1,g2 → 1; t=7: g1@3 → 1; t=6: g4@4 → 4
    assert(fast == Seq((1L, null), (2L, 2L), (3L, 1L), (4L, 1L),
      (5L, 4L), (6L, null), (7L, null)))
    assert(rows(q(vac)).map(r => (r.getLong(0), longOrNull(r, 1))) == fast)
    // strict form `> 2` ⇒ floor 3
    def q3(extra: String) = s"""
      SELECT ok, (SELECT g FROM r11_t WHERE c > t$extra
                  GROUP BY g HAVING count(1) > 2
                  ORDER BY count(1) DESC, g LIMIT 1) AS w
      FROM r11_o ORDER BY ok"""
    val f3 = rows(q3("")).map(r => (r.getLong(0), longOrNull(r, 1)))
    assert(f3 == Seq((1L, null), (2L, null), (3L, null), (4L, 1L),
      (5L, 4L), (6L, null), (7L, null)))
    assert(rows(q3(vac)).map(r => (r.getLong(0), longOrNull(r, 1))) == f3)
  }

  test("value = count(1) returns the winning level itself") {
    def q(extra: String) = s"""
      SELECT ok, (SELECT count(1) FROM r11_t WHERE c > t$extra
                  GROUP BY g ORDER BY count(1) DESC, g LIMIT 1) AS w
      FROM r11_o ORDER BY ok"""
    val fast = rows(q("")).map(r => (r.getLong(0), longOrNull(r, 1)))
    assert(fast == Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 3L),
      (5L, 4L), (6L, null), (7L, null)))
    assert(rows(q(vac)).map(r => (r.getLong(0), longOrNull(r, 1))) == fast)
  }

  test("NULL group key routes to the generic plan and stays correct") {
    sql("DROP TABLE IF EXISTS r11_n")
    sql("CREATE TABLE r11_n (g Int64, c Int64)")
    sql("""INSERT INTO r11_n VALUES
           (null, 11), (null, 11), (null, 11), (3, 12), (1, 10), (1, 9)""")
    def q(extra: String) = s"""
      SELECT ok, (SELECT g FROM r11_n WHERE c > t$extra
                  GROUP BY g ORDER BY count(1) DESC, g LIMIT 1) AS w
      FROM r11_o ORDER BY ok"""
    val fast = rows(q("")).map(r => (r.getLong(0), longOrNull(r, 1)))
    // t=10: NULL-group count 3 beats g3@1 uniquely → winner value NULL;
    // t=9: NULL@3, g1{10}=1, g3=1 → NULL; t=11: g3 alone → 3
    assert(fast == Seq((1L, 3L), (2L, null), (3L, null), (4L, null),
      (5L, null), (6L, null), (7L, null)))
    assert(rows(q(vac)).map(r => (r.getLong(0), longOrNull(r, 1))) == fast)
  }

  test("guard rails: misfit shapes keep the generic plan and agree") {
    // count ASC leads the sort — not a staircase shape
    def qa(extra: String) = s"""
      SELECT ok, (SELECT g FROM r11_t WHERE c > t$extra
                  GROUP BY g ORDER BY count(1), g LIMIT 1) AS w
      FROM r11_o ORDER BY ok"""
    assert(rows(qa("")).map(r => (r.getLong(0), longOrNull(r, 1))) ==
      rows(qa(vac)).map(r => (r.getLong(0), longOrNull(r, 1))))
    // OFFSET picks the runner-up — not a staircase shape
    def qo(extra: String) = s"""
      SELECT ok, (SELECT g FROM r11_t WHERE c > t$extra
                  GROUP BY g ORDER BY count(1) DESC, g LIMIT 1 OFFSET 1) AS w
      FROM r11_o ORDER BY ok"""
    assert(rows(qo("")).map(r => (r.getLong(0), longOrNull(r, 1))) ==
      rows(qo(vac)).map(r => (r.getLong(0), longOrNull(r, 1))))
    // non-count aggregate rank — not a staircase shape
    def qm(extra: String) = s"""
      SELECT ok, (SELECT g FROM r11_t WHERE c > t$extra
                  GROUP BY g ORDER BY max(c) DESC, g LIMIT 1) AS w
      FROM r11_o ORDER BY ok"""
    assert(rows(qm("")).map(r => (r.getLong(0), longOrNull(r, 1))) ==
      rows(qm(vac)).map(r => (r.getLong(0), longOrNull(r, 1))))
  }

  test("staircase on the qe146 shape over real tables ≡ generic") {
    def q(extra: String) = s"""
      SELECT o_orderkey,
        (SELECT l_suppkey FROM lineitem
         WHERE l_extendedprice > o_totalprice / 4$extra
         GROUP BY l_suppkey
         ORDER BY count(1) DESC, l_suppkey LIMIT 1) AS busiest_supp
      FROM orders WHERE o_orderkey < 120 ORDER BY o_orderkey"""
    val fast = rows(q("")).map(r => (r.getLong(0), longOrNull(r, 1)))
    val gen = rows(q(" AND l_extendedprice > o_totalprice / 4 - 900000000000000"))
      .map(r => (r.getLong(0), longOrNull(r, 1)))
    assert(fast.nonEmpty && fast == gen)
  }
}
