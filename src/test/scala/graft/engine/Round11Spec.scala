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

  // ---- theta-correlated nested IN with DISTINCT ON at depth 3 ----------
  // the depth-2 form rides the pair-frame route (sliceInNestedBody) and
  // already supported theta — at depth 3 the flatten recursion reaches
  // flattenExistsBody, where round 10 kept a clean equality-only error;
  // round 11 threads the prefix-extremum staircase through it. The
  // depth-2 form IS the oracle: same semantics, independent plan.

  // the IN's lhs must be LOCAL to the level holding the conjunct: at
  // depth 3 that is r11n_m2 (lhs2) so the conjunct takes the flatten
  // recursion; the depth-2 oracle uses r11n_m's equal-valued lhs and
  // rides the independent pair-frame plan
  private def nestedPair(inBody: String): (Seq[Long], Seq[Long]) = {
    val d3 = rows(
      s"""SELECT ok FROM r11n_o
          WHERE EXISTS (
            SELECT 1 FROM r11n_m WHERE g = ok AND EXISTS (
              SELECT 1 FROM r11n_m2 WHERE h = g AND
                ${inBody.replace("lhs", "lhs2").replace("g * 100", "h * 100")}))
          ORDER BY ok""").map(_.getLong(0))
    val d2 = rows(
      s"""SELECT ok FROM r11n_o
          WHERE EXISTS (
            SELECT 1 FROM r11n_m WHERE g = ok AND $inBody)
          ORDER BY ok""").map(_.getLong(0))
    (d3, d2)
  }

  test("depth-3 nested IN DISTINCT ON under grandparent THETA keeps the right row") {
    sql("DROP TABLE IF EXISTS r11n_o"); sql("DROP TABLE IF EXISTS r11n_m")
    sql("DROP TABLE IF EXISTS r11n_m2"); sql("DROP TABLE IF EXISTS r11n_t")
    sql("CREATE TABLE r11n_o (ok Int64)")
    sql("INSERT INTO r11n_o VALUES (1), (2), (3), (4)")
    sql("CREATE TABLE r11n_m (g Int64, lhs Int64)")
    sql("INSERT INTO r11n_m VALUES (1, 100), (2, 600), (3, 100), (4, 300)")
    sql("CREATE TABLE r11n_m2 (h Int64, lhs2 Int64)")
    sql("INSERT INTO r11n_m2 VALUES (1, 100), (2, 600), (3, 100), (4, 300)")
    sql("CREATE TABLE r11n_t (oc Int64, q Int64, v Int64, ord Int64)")
    // oc=1: asc-ord rows [100(q35), 200(q15), 300(q45)]; oc=2:
    // [500(q25), 600(q50)]; oc=3 has a NULL-q row before a q=60 row;
    // oc=4's only row has a NULL value
    sql("""INSERT INTO r11n_t VALUES
           (1, 35, 100, 1), (1, 15, 200, 2), (1, 45, 300, 3),
           (2, 25, 500, 1), (2, 50, 600, 2),
           (3, null, 700, 1), (3, 60, 800, 2),
           (4, 70, null, 1)""")
    // ASC kept sets per threshold t=ok*10: t=10/{100,500,800,N};
    // t=20/{100,500,800,N}; t=30/{100,600,800,N}; t=40/{300,600,800,N}
    val (a3, a2) = nestedPair(
      """lhs IN (SELECT DISTINCT ON (oc) v FROM r11n_t
                 WHERE q > ok * 10 ORDER BY oc, ord)""")
    assert(a3 == Seq(1L, 3L, 4L) && a2 == a3)
    // DESC kept sets: {300,600,800,N} for every t here
    val (d3, d2) = nestedPair(
      """lhs IN (SELECT DISTINCT ON (oc) v FROM r11n_t
                 WHERE q > ok * 10 ORDER BY oc, ord DESC)""")
    assert(d3 == Seq(2L, 4L) && d2 == d3)
  }

  test("depth-3 nested theta DISTINCT ON '<' uses prefix-minima records") {
    // kept sets: t=10/{}; t=20/{200}; t=30/{200,500}; t=40/{100,500};
    // lhs = g*100 hits only ok=2
    val (d3, d2) = nestedPair(
      """g * 100 IN (SELECT DISTINCT ON (oc) v FROM r11n_t
                     WHERE q < ok * 10 ORDER BY oc, ord)""")
    assert(d3 == Seq(2L) && d2 == d3)
  }

  test("depth-3 nested theta DISTINCT ON composes with equality correlation") {
    sql("DROP TABLE IF EXISTS r11n_t2")
    sql("CREATE TABLE r11n_t2 (k Int64, oc Int64, q Int64, v Int64, ord Int64)")
    sql("""INSERT INTO r11n_t2 VALUES
           (1, 1, 35, 100, 1), (1, 1, 45, 300, 2),
           (2, 1, 35, 600, 1), (2, 1, 45, 1300, 2)""")
    // k slices partition the staircase: ok=1 (k=1, t=10) keeps 100 =
    // lhs(1); ok=2 (k=2, t=20) keeps 600 = lhs(2); ok=3/4 have no rows
    val (d3, d2) = nestedPair(
      """lhs IN (SELECT DISTINCT ON (oc) v FROM r11n_t2
                 WHERE k = g AND q > ok * 10 ORDER BY oc, ord)""")
    assert(d3 == Seq(1L, 2L) && d2 == d3)
  }

  test("depth-3 nested theta DISTINCT ON, several inequalities: defers to the slice") {
    // round 12 (VERDICT r11 missing #1): the staircase cannot express
    // several outer-varying inequalities, so the WHOLE conjunct defers
    // to the enclosing pair frame and the per-rid slice window keeps
    // the right row — the depth-2 form IS the oracle (same semantics,
    // independent plan), exactly like the single-inequality tests
    val (d3, d2) = nestedPair(
      """lhs IN (SELECT DISTINCT ON (oc) v FROM r11n_t
                 WHERE q > ok * 10 AND q < ok * 100 ORDER BY oc, ord)""")
    assert(d3.nonEmpty && d3 == d2)
    // DESC tie-break through the deferred slice
    val (e3, e2) = nestedPair(
      """lhs IN (SELECT DISTINCT ON (oc) v FROM r11n_t
                 WHERE q > ok * 10 AND q < ok * 100 ORDER BY oc, ord DESC)""")
    assert(e3 == e2)
  }

  // ---- deferred subquery-bearing conjuncts (pair-frame rail) -----------
  // a conjunct whose TOP-LEVEL refs live one scope up while its BODY
  // references the grandparent can lower at no intermediate level — the
  // r10 guard was a clean error; round 11 defers it to the enclosing
  // EXISTS where the explicit pair frame lowers it normally.

  test("hoist-past-level IN with DISTINCT ON lowers on the pair frame") {
    // lhs lives in r11n_m (one up from the conjunct); the body references
    // ok (two up). Kept sets as in the depth-3 staircase test; lhs(g):
    // 100,600,100,300 → ok ∈ {1,3,4}
    val got = rows(
      """SELECT ok FROM r11n_o
         WHERE EXISTS (
           SELECT 1 FROM r11n_m WHERE g = ok AND EXISTS (
             SELECT 1 FROM r11n_m2 WHERE h = g AND
               lhs IN (SELECT DISTINCT ON (oc) v FROM r11n_t
                       WHERE q > ok * 10 ORDER BY oc, ord)))
         ORDER BY ok""").map(_.getLong(0))
    assert(got == Seq(1L, 3L, 4L))
  }

  test("hoist-past-level IN with LIMIT lowers on the pair frame") {
    // body: the two smallest-q rows passing q > ok*10 —
    // t=10/{200,500}; t=20/{500,100}; t=30/{100,300}; t=40/{300,600}
    def q(neg: String) = rows(
      s"""SELECT ok FROM r11n_o
          WHERE EXISTS (
            SELECT 1 FROM r11n_m WHERE g = ok AND EXISTS (
              SELECT 1 FROM r11n_m2 WHERE h = g AND
                lhs $neg IN (SELECT v FROM r11n_t
                             WHERE q > ok * 10 ORDER BY q LIMIT 2)))
          ORDER BY ok""").map(_.getLong(0))
    assert(q("") == Seq(3L, 4L))
    // the negated form is just a per-row predicate on the pair frame
    assert(q("NOT") == Seq(1L, 2L))
  }

  test("deferred set-op membership with outer lhs (fuzzer find fz123/fz450)") {
    // the [NOT] IN machinery joins/filters the frame it mutates BY the
    // lhs — an outer lhs on the inner frame leaked a raw
    // MISSING_ATTRIBUTES before the membership conjunct routed to the
    // pair frame. Set = oc1 non-null v ∪ oc2 v = {100,200,300,500,600}.
    def q(neg: String) = rows(
      s"""SELECT ok FROM r11n_o
          WHERE EXISTS (
            SELECT 1 FROM r11n_m WHERE g = ok AND EXISTS (
              SELECT 1 FROM r11n_m2 WHERE h = g AND
                ok * 100 $neg IN (
                  SELECT v FROM r11n_t WHERE v IS NOT NULL AND oc = 1
                  UNION DISTINCT
                  SELECT v FROM r11n_t WHERE oc = 2)))
          ORDER BY ok""").map(_.getLong(0))
    assert(q("") == Seq(1L, 2L, 3L))
    assert(q("NOT") == Seq(4L))
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
