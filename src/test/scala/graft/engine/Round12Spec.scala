package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Round-12 semantics (VERDICT r11 missing #1/#2 + ADVICE #1):
  *  - a deferred subquery-bearing conjunct combined with a NEGATED
  *    nested sibling lowers on the negated-nested pair frame (was the
  *    r11 1086-guard clean error);
  *  - grouped deferred bodies lower through the same rail;
  *  - several outer-varying inequalities under nested DISTINCT ON defer
  *    the whole conjunct to the enclosing pair frame's slice window
  *    (was the last fuzz-reachable dialect error).
  * Every expected row set below was cross-checked against DuckDB on the
  * identical fixture (round-12 session log). */
class Round12Spec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var engine: Engine = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .appName("round12-spec").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    engine = Engine.forTestdata(spark, dir)
    Seq("r12_o", "r12_m", "r12_m2", "r12_t").foreach(t =>
      sql(s"DROP TABLE IF EXISTS $t"))
    sql("CREATE TABLE r12_o (ok Int64)")
    sql("INSERT INTO r12_o VALUES (1), (2), (3), (4)")
    sql("CREATE TABLE r12_m (g Int64, lhs Int64)")
    sql("INSERT INTO r12_m VALUES (1, 100), (2, 600), (3, 100), (4, 300)")
    sql("CREATE TABLE r12_m2 (h Int64, lhs2 Int64)")
    sql("INSERT INTO r12_m2 VALUES (1, 100), (2, 600), (3, 100), (4, 300)")
    sql("CREATE TABLE r12_t (oc Int64, q Int64, v Int64, ord Int64)")
    sql("""INSERT INTO r12_t VALUES
           (1, 35, 100, 1), (1, 15, 200, 2), (1, 45, 300, 3),
           (2, 25, 500, 1), (2, 50, 600, 2),
           (3, null, 700, 1), (3, 60, 800, 2),
           (4, 70, null, 1)""")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sql(s: String): DataFrame = engine.execute(s)
  private def oks(s: String): Seq[Long] = sql(s).collect().toSeq.map(_.getLong(0))

  // ---- deferred conjuncts combined with a negated nested sibling ------

  test("deferred LIMIT-IN + NOT EXISTS sibling lowers on the pair frame") {
    assert(oks("""
      SELECT ok FROM r12_o
      WHERE EXISTS (
        SELECT 1 FROM r12_m WHERE g = ok
          AND lhs IN (SELECT v FROM r12_t WHERE q > ok * 10 ORDER BY q LIMIT 2)
          AND NOT EXISTS (SELECT 1 FROM r12_t WHERE oc = g AND v > ok * 100))
      ORDER BY ok""") == Seq(4L))
  }

  test("deferred LIMIT-IN + NOT IN sibling") {
    assert(oks("""
      SELECT ok FROM r12_o
      WHERE EXISTS (
        SELECT 1 FROM r12_m WHERE g = ok
          AND lhs IN (SELECT v FROM r12_t WHERE q > ok * 10 ORDER BY q LIMIT 2)
          AND g NOT IN (SELECT oc FROM r12_t WHERE v > ok * 200))
      ORDER BY ok""") == Seq(4L))
  }

  test("deferred conjunct hoisted out of a flatten + negated nested (r11 guard shape)") {
    assert(oks("""
      SELECT ok FROM r12_o
      WHERE EXISTS (
        SELECT 1 FROM r12_m WHERE g = ok
          AND EXISTS (SELECT 1 FROM r12_m2 WHERE h = g AND
                      lhs IN (SELECT v FROM r12_t WHERE q > ok * 10
                              ORDER BY q LIMIT 2))
          AND NOT EXISTS (SELECT 1 FROM r12_m2 AS mm
                          WHERE mm.h = g AND mm.lhs2 > ok * 100))
      ORDER BY ok""") == Seq(3L, 4L))
  }

  test("GROUPED deferred body hoisted out of a flatten + negated nested") {
    assert(oks("""
      SELECT ok FROM r12_o
      WHERE EXISTS (
        SELECT 1 FROM r12_m WHERE g = ok
          AND EXISTS (SELECT 1 FROM r12_m2 WHERE h = g AND
                      lhs IN (SELECT min(v) FROM r12_t WHERE q > ok * 10
                              GROUP BY oc))
          AND NOT EXISTS (SELECT 1 FROM r12_m2 AS mm
                          WHERE mm.h = g AND mm.lhs2 > ok * 100))
      ORDER BY ok""") == Seq(1L, 3L, 4L))
  }

  test("outer-lhs membership + negated nested sibling (ADVICE r11 #1)") {
    // plain body
    assert(oks("""
      SELECT ok FROM r12_o
      WHERE EXISTS (
        SELECT 1 FROM r12_m WHERE g = ok
          AND ok * 100 IN (SELECT v FROM r12_t WHERE v IS NOT NULL)
          AND NOT EXISTS (SELECT 1 FROM r12_m2 AS mm
                          WHERE mm.h = g AND mm.lhs2 > ok * 100))
      ORDER BY ok""") == Seq(1L, 3L))
    // set-op body (subqueryBodiesResolveWithin cannot open it)
    assert(oks("""
      SELECT ok FROM r12_o
      WHERE EXISTS (
        SELECT 1 FROM r12_m WHERE g = ok
          AND ok * 100 IN (SELECT v FROM r12_t WHERE v IS NOT NULL AND oc = 1
                           UNION DISTINCT SELECT v FROM r12_t WHERE oc = 2)
          AND NOT EXISTS (SELECT 1 FROM r12_m2 AS mm
                          WHERE mm.h = g AND mm.lhs2 > ok * 100))
      ORDER BY ok""") == Seq(1L, 3L))
  }

  test("pair-frame + negated nested at the middle level") {
    assert(oks("""
      SELECT ok FROM r12_o
      WHERE EXISTS (
        SELECT 1 FROM r12_m WHERE g = ok AND EXISTS (
          SELECT 1 FROM r12_m2 WHERE h = g
            AND lhs IN (SELECT v FROM r12_t WHERE q > ok * 10 ORDER BY q LIMIT 2)
            AND NOT EXISTS (SELECT 1 FROM r12_t WHERE oc = h AND v > ok * 100)))
      ORDER BY ok""") == Seq(4L))
  }

  // ---- grouped deferred bodies on the pair-frame rail -----------------

  test("grouped deferred body on the pair-frame rail, with HAVING and NOT IN") {
    assert(oks("""
      SELECT ok FROM r12_o
      WHERE EXISTS (
        SELECT 1 FROM r12_m WHERE g = ok AND EXISTS (
          SELECT 1 FROM r12_m2 WHERE h = g AND
            lhs IN (SELECT min(v) FROM r12_t WHERE q > ok * 10 GROUP BY oc)))
      ORDER BY ok""") == Seq(1L, 3L, 4L))
    assert(oks("""
      SELECT ok FROM r12_o
      WHERE EXISTS (
        SELECT 1 FROM r12_m WHERE g = ok AND EXISTS (
          SELECT 1 FROM r12_m2 WHERE h = g AND
            lhs IN (SELECT min(v) FROM r12_t WHERE q > ok * 10
                    GROUP BY oc HAVING count(1) >= 2)))
      ORDER BY ok""") == Seq(1L, 3L))
    assert(oks("""
      SELECT ok FROM r12_o
      WHERE EXISTS (
        SELECT 1 FROM r12_m WHERE g = ok AND EXISTS (
          SELECT 1 FROM r12_m2 WHERE h = g AND
            lhs NOT IN (SELECT min(v) FROM r12_t WHERE q > ok * 10 GROUP BY oc)))
      ORDER BY ok""") == Seq.empty)
  }

  // ---- sibling branches of the deferred-conjunct class ----------------
  // the aggregated and expression-position nested lowerings also carry
  // the correlation pool; deferred/outer-lhs conjuncts must route to
  // the per-pair machinery there too (they do, via the corrDeep
  // partition — these pins keep that true)

  test("deferred/outer-lhs conjuncts beside aggregated and expr-position nesteds") {
    assert(oks("""
      SELECT ok FROM r12_o WHERE EXISTS (
        SELECT g FROM r12_m WHERE g = ok
          AND ok * 100 IN (SELECT v FROM r12_t WHERE v IS NOT NULL)
          AND EXISTS (SELECT 1 FROM r12_m2 WHERE h = g AND lhs2 > ok * 50)
        GROUP BY g HAVING count(1) >= 1)
      ORDER BY ok""") == Seq(1L, 2L))
    assert(oks("""
      SELECT ok FROM r12_o WHERE EXISTS (
        SELECT g FROM r12_m WHERE g = ok
          AND lhs IN (SELECT v FROM r12_t WHERE q > ok * 10 ORDER BY q LIMIT 2)
          AND EXISTS (SELECT 1 FROM r12_m2 WHERE h = g AND lhs2 > ok * 50)
        GROUP BY g HAVING count(1) >= 1)
      ORDER BY ok""") == Seq(4L))
    assert(oks("""
      SELECT ok FROM r12_o WHERE EXISTS (
        SELECT 1 FROM r12_m WHERE g = ok
          AND ok * 100 IN (SELECT v FROM r12_t WHERE v IS NOT NULL)
          AND (EXISTS (SELECT 1 FROM r12_m2 WHERE h = g AND lhs2 > ok * 50)
               OR g > 100))
      ORDER BY ok""") == Seq(1L, 2L))
    assert(oks("""
      SELECT ok FROM r12_o WHERE EXISTS (
        SELECT 1 FROM r12_m WHERE g = ok
          AND lhs IN (SELECT v FROM r12_t WHERE q > ok * 10 ORDER BY q LIMIT 2)
          AND (EXISTS (SELECT 1 FROM r12_m2 WHERE h = g AND lhs2 > ok * 50)
               OR g > 100))
      ORDER BY ok""") == Seq(4L))
  }

  // ---- DISTINCT [ON] + OFFSET EXISTS threshold collapse ---------------
  // round 12: the fuzz plan cross-check surfaced this class as
  // correct-but-generic (fz242, seed 2202) — the OFFSET rewrite's
  // countUniqueRows HAVING now collapses to the (off+1)-th best
  // per-tuple extreme. The vacuous second conjunct forces the generic
  // plan (orientMonotoneSingle declines multi-conjunct pools).

  test("DISTINCT ON + OFFSET EXISTS collapses to a scalar threshold") {
    def q(extra: String) = s"""
      SELECT ok FROM r12_o WHERE EXISTS (
        SELECT DISTINCT ON (oc) v FROM r12_t WHERE q > ok * 12$extra
        ORDER BY oc, ord LIMIT 3 OFFSET 3)
      ORDER BY ok"""
    val fast = oks(q(""))
    // per-oc max q = 45, 50, 60, 70; existence needs > 3 distinct oc
    // among passers, i.e. 4th-best max (45) > ok * 12
    assert(fast == Seq(1L, 2L, 3L))
    assert(oks(q(" AND q > ok * 12 - 900000000000000")) == fast)
    val p = sql(q("")).queryExecution.executedPlan.toString
    Seq("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin",
        "ShuffledHashJoin", "CartesianProduct").foreach(j =>
      assert(!p.contains(j), s"expected join-free collapse, plan has $j"))
    // NOT EXISTS arm + '<' direction + plain-DISTINCT counting
    def qn(extra: String) = s"""
      SELECT ok FROM r12_o WHERE NOT EXISTS (
        SELECT DISTINCT v FROM r12_t WHERE q < ok * 12$extra AND v IS NOT NULL
        ORDER BY v LIMIT 2 OFFSET 1)
      ORDER BY ok"""
    assert(oks(qn("")) == oks(qn(" AND q < ok * 12 + 900000000000000")))
  }

  // ---- multi-inequality DISTINCT ON deferral --------------------------

  test("multi-inequality nested DISTINCT ON at depth 3: all directions") {
    def mi(inBody: String): Seq[Long] = oks(s"""
      SELECT ok FROM r12_o
      WHERE EXISTS (
        SELECT 1 FROM r12_m WHERE g = ok AND EXISTS (
          SELECT 1 FROM r12_m2 WHERE h = g AND $inBody))
      ORDER BY ok""")
    assert(mi("""lhs2 IN (SELECT DISTINCT ON (oc) v FROM r12_t
                 WHERE q > ok * 10 AND q < ok * 40 ORDER BY oc, ord)""")
      == Seq(1L, 3L, 4L))
    assert(mi("""lhs2 IN (SELECT DISTINCT ON (oc) v FROM r12_t
                 WHERE q > ok * 10 AND q < ok * 40 ORDER BY oc, ord DESC)""")
      == Seq(2L, 4L))
    assert(mi("""lhs2 NOT IN (SELECT DISTINCT ON (oc) v FROM r12_t
                 WHERE q > ok * 10 AND q < ok * 40 ORDER BY oc, ord)""")
      == Seq.empty)
    assert(mi("""lhs2 IN (SELECT DISTINCT ON (oc) v FROM r12_t
                 WHERE q < ok * 40 AND q + ord > ok * 5 ORDER BY oc, ord)""")
      == Seq(1L, 3L))
    assert(mi("""lhs2 IN (SELECT DISTINCT ON (oc) v FROM r12_t
                 WHERE oc = h AND q > ok * 5 AND q < ok * 40
                 ORDER BY oc, ord)""")
      == Seq(1L))
    // a non-monotone (<>) correlation defers the same way
    assert(mi("""lhs2 IN (SELECT DISTINCT ON (oc) v FROM r12_t
                 WHERE q <> ok * 35 ORDER BY oc, ord)""")
      == Seq(3L))
  }
}
