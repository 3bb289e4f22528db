package graft.tools

import graft.Sessions

/** Round-12 scratch probe: the negated-nested + deferred-conjunct
  * combination and grouped deferred bodies (VERDICT r11 missing #2),
  * plus multi-inequality DISTINCT ON shapes (missing #1). Runs each
  * labeled query and prints result or error. Not shipped surface. */
object Probe12 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val spark = Sessions.build("graft-probe12")
    spark.sparkContext.setLogLevel("ERROR")
    val eng = graft.queries.Engines.get(spark, sfDir)
    def sql(s: String): Unit = eng.execute(s).collect()
    // Round11Spec fixture tables
    sql("DROP TABLE IF EXISTS p12_o"); sql("DROP TABLE IF EXISTS p12_m")
    sql("DROP TABLE IF EXISTS p12_m2"); sql("DROP TABLE IF EXISTS p12_t")
    sql("CREATE TABLE p12_o (ok Int64)")
    sql("INSERT INTO p12_o VALUES (1), (2), (3), (4)")
    sql("CREATE TABLE p12_m (g Int64, lhs Int64)")
    sql("INSERT INTO p12_m VALUES (1, 100), (2, 600), (3, 100), (4, 300)")
    sql("CREATE TABLE p12_m2 (h Int64, lhs2 Int64)")
    sql("INSERT INTO p12_m2 VALUES (1, 100), (2, 600), (3, 100), (4, 300)")
    sql("CREATE TABLE p12_t (oc Int64, q Int64, v Int64, ord Int64)")
    sql("""INSERT INTO p12_t VALUES
           (1, 35, 100, 1), (1, 15, 200, 2), (1, 45, 300, 3),
           (2, 25, 500, 1), (2, 50, 600, 2),
           (3, null, 700, 1), (3, 60, 800, 2),
           (4, 70, null, 1)""")

    val probes: Seq[(String, String)] = Seq(
      // A. deferred conjunct (body refs ok two scopes up, has LIMIT)
      //    combined with a NEGATED nested sibling that ALSO refs ok
      //    (so it lands in negNested, not the local pool)
      "negnested+deferred" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok
            AND lhs IN (SELECT v FROM p12_t WHERE q > ok * 10 ORDER BY q LIMIT 2)
            AND NOT EXISTS (SELECT 1 FROM p12_t WHERE oc = g AND v > ok * 100))
        ORDER BY ok""",
      // A2. same but the deferred conjunct is membership-outer-lhs
      //     (body resolves within; lhs refs outer) — ADVICE r11 #1 leak
      "negnested+outerlhs" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok
            AND ok * 100 IN (SELECT v FROM p12_t WHERE v IS NOT NULL)
            AND NOT EXISTS (SELECT 1 FROM p12_t WHERE oc = g AND v > ok * 100))
        ORDER BY ok""",
      // A3. ADVICE shape with a SET-OP body (subqueryBodiesResolveWithin
      //     cannot open set-ops and counts them as resolving)
      "negnested+outerlhs-setop" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok
            AND ok * 100 IN (SELECT v FROM p12_t WHERE v IS NOT NULL AND oc = 1
                             UNION DISTINCT SELECT v FROM p12_t WHERE oc = 2)
            AND NOT EXISTS (SELECT 1 FROM p12_t WHERE oc = g AND v > ok * 100))
        ORDER BY ok""",
      // A4. NOT IN variant of the negated nested sibling
      "negnotin+deferred" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok
            AND lhs IN (SELECT v FROM p12_t WHERE q > ok * 10 ORDER BY q LIMIT 2)
            AND g NOT IN (SELECT oc FROM p12_t WHERE v > ok * 200))
        ORDER BY ok""",
      // A5. pair-frame rail (lhs one up, body deeper) + negated nested
      //     sibling at the middle level
      "pairframe+negnested" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok AND EXISTS (
            SELECT 1 FROM p12_m2 WHERE h = g
              AND lhs IN (SELECT v FROM p12_t WHERE q > ok * 10 ORDER BY q LIMIT 2)
              AND NOT EXISTS (SELECT 1 FROM p12_t WHERE oc = h AND v > ok * 100)))
        ORDER BY ok""",
      // B. deferred conjunct whose body is GROUPED
      "grouped-deferred" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok
            AND lhs IN (SELECT min(v) FROM p12_t WHERE q > ok * 10 GROUP BY oc))
        ORDER BY ok""",
      // B2. grouped deferred at depth 3 (defers through the flatten)
      "grouped-deferred-d3" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok AND EXISTS (
            SELECT 1 FROM p12_m2 WHERE h = g AND
              lhs IN (SELECT min(v) FROM p12_t WHERE q > ok * 10 GROUP BY oc)))
        ORDER BY ok""",
      // B3. grouped deferred with HAVING
      "grouped-having-deferred" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok
            AND lhs IN (SELECT min(v) FROM p12_t WHERE q > ok * 10
                        GROUP BY oc HAVING count(1) >= 1))
        ORDER BY ok""",
      // B4. PAIR-FRAME rail (lhs one up, body deeper) with grouped body
      "pairframe-grouped" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok AND EXISTS (
            SELECT 1 FROM p12_m2 WHERE h = g AND
              lhs IN (SELECT min(v) FROM p12_t WHERE q > ok * 10 GROUP BY oc)))
        ORDER BY ok""",
      // B5. pair-frame rail, grouped body with HAVING count floor
      "pairframe-grouped-having" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok AND EXISTS (
            SELECT 1 FROM p12_m2 WHERE h = g AND
              lhs IN (SELECT min(v) FROM p12_t WHERE q > ok * 10
                      GROUP BY oc HAVING count(1) >= 2)))
        ORDER BY ok""",
      // B6. pair-frame rail, NOT IN over a grouped deferred body
      "pairframe-grouped-notin" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok AND EXISTS (
            SELECT 1 FROM p12_m2 WHERE h = g AND
              lhs NOT IN (SELECT min(v) FROM p12_t WHERE q > ok * 10 GROUP BY oc)))
        ORDER BY ok""",
      // C. NOT around a nested deferred conjunct at depth 3
      "not-deferred-d3" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok AND EXISTS (
            SELECT 1 FROM p12_m2 WHERE h = g AND
              NOT (lhs IN (SELECT v FROM p12_t WHERE q > ok * 10
                           ORDER BY q LIMIT 2))))
        ORDER BY ok""",
      // E1. deferred conjunct hoisted OUT OF A FLATTEN + negated nested
      //     sibling — the r11 1086-guard shape
      "flatten-deferred+negnested" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok
            AND EXISTS (SELECT 1 FROM p12_m2 WHERE h = g AND
                        lhs IN (SELECT v FROM p12_t WHERE q > ok * 10
                                ORDER BY q LIMIT 2))
            AND NOT EXISTS (SELECT 1 FROM p12_m2 AS mm WHERE mm.h = g AND mm.lhs2 > ok * 100))
        ORDER BY ok""",
      // E2. grouped deferred hoisted out of a flatten + negated nested
      "flatten-grouped+negnested" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok
            AND EXISTS (SELECT 1 FROM p12_m2 WHERE h = g AND
                        lhs IN (SELECT min(v) FROM p12_t WHERE q > ok * 10
                                GROUP BY oc))
            AND NOT EXISTS (SELECT 1 FROM p12_m2 AS mm WHERE mm.h = g AND mm.lhs2 > ok * 100))
        ORDER BY ok""",
      // E3. outer-lhs membership (body resolves within) + negated nested
      //     — ADVICE r11 #1, no alias collision this time
      "outerlhs+negnested" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok
            AND ok * 100 IN (SELECT v FROM p12_t WHERE v IS NOT NULL)
            AND NOT EXISTS (SELECT 1 FROM p12_m2 WHERE h = g AND lhs2 > ok * 100))
        ORDER BY ok""",
      // E4. set-op-bodied outer-lhs membership + negated nested
      "outerlhs-setop+negnested" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok
            AND ok * 100 IN (SELECT v FROM p12_t WHERE v IS NOT NULL AND oc = 1
                             UNION DISTINCT SELECT v FROM p12_t WHERE oc = 2)
            AND NOT EXISTS (SELECT 1 FROM p12_m2 WHERE h = g AND lhs2 > ok * 100))
        ORDER BY ok""",
      // D. multi-inequality theta DISTINCT ON (missing #1) at depth 2
      "multi-ineq-distincton-d2" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok AND
            lhs IN (SELECT DISTINCT ON (oc) v FROM p12_t
                    WHERE q > ok * 10 AND q < ok * 40 ORDER BY oc, ord))
        ORDER BY ok""",
      // D2. multi-inequality theta DISTINCT ON at depth 3
      "multi-ineq-distincton-d3" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok AND EXISTS (
            SELECT 1 FROM p12_m2 WHERE h = g AND
              lhs2 IN (SELECT DISTINCT ON (oc) v FROM p12_t
                       WHERE q > ok * 10 AND q < ok * 40 ORDER BY oc, ord)))
        ORDER BY ok""",
      "mi-d3-desc" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok AND EXISTS (
            SELECT 1 FROM p12_m2 WHERE h = g AND
              lhs2 IN (SELECT DISTINCT ON (oc) v FROM p12_t
                       WHERE q > ok * 10 AND q < ok * 40 ORDER BY oc, ord DESC)))
        ORDER BY ok""",
      "mi-d3-notin" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok AND EXISTS (
            SELECT 1 FROM p12_m2 WHERE h = g AND
              lhs2 NOT IN (SELECT DISTINCT ON (oc) v FROM p12_t
                           WHERE q > ok * 10 AND q < ok * 40 ORDER BY oc, ord)))
        ORDER BY ok""",
      "mi-d3-lt-pair" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok AND EXISTS (
            SELECT 1 FROM p12_m2 WHERE h = g AND
              lhs2 IN (SELECT DISTINCT ON (oc) v FROM p12_t
                       WHERE q < ok * 40 AND q + ord > ok * 5 ORDER BY oc, ord)))
        ORDER BY ok""",
      "mi-d3-eq-plus-2ineq" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok AND EXISTS (
            SELECT 1 FROM p12_m2 WHERE h = g AND
              lhs2 IN (SELECT DISTINCT ON (oc) v FROM p12_t
                       WHERE oc = h AND q > ok * 5 AND q < ok * 40
                       ORDER BY oc, ord)))
        ORDER BY ok""",
      // F. sibling branches of the ADVICE leak class: the aggregated
      //    and expression-position nested lowerings also bind the pool
      //    as join conditions
      "agg-middle+outerlhs" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT g FROM p12_m WHERE g = ok
            AND ok * 100 IN (SELECT v FROM p12_t WHERE v IS NOT NULL)
            AND EXISTS (SELECT 1 FROM p12_m2 WHERE h = g AND lhs2 > ok * 50)
          GROUP BY g HAVING count(1) >= 1)
        ORDER BY ok""",
      "agg-middle+deferred" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT g FROM p12_m WHERE g = ok
            AND lhs IN (SELECT v FROM p12_t WHERE q > ok * 10 ORDER BY q LIMIT 2)
            AND EXISTS (SELECT 1 FROM p12_m2 WHERE h = g AND lhs2 > ok * 50)
          GROUP BY g HAVING count(1) >= 1)
        ORDER BY ok""",
      "exprnested+outerlhs" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok
            AND ok * 100 IN (SELECT v FROM p12_t WHERE v IS NOT NULL)
            AND (EXISTS (SELECT 1 FROM p12_m2 WHERE h = g AND lhs2 > ok * 50)
                 OR g > 100))
        ORDER BY ok""",
      "exprnested+deferred" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok
            AND lhs IN (SELECT v FROM p12_t WHERE q > ok * 10 ORDER BY q LIMIT 2)
            AND (EXISTS (SELECT 1 FROM p12_m2 WHERE h = g AND lhs2 > ok * 50)
                 OR g > 100))
        ORDER BY ok""",
      "mi-d3-neq" -> """
        SELECT ok FROM p12_o
        WHERE EXISTS (
          SELECT 1 FROM p12_m WHERE g = ok AND EXISTS (
            SELECT 1 FROM p12_m2 WHERE h = g AND
              lhs2 IN (SELECT DISTINCT ON (oc) v FROM p12_t
                       WHERE q <> ok * 35 ORDER BY oc, ord)))
        ORDER BY ok"""
    )
    probes.foreach { case (name, q) =>
      print(f"$name%-28s -> ")
      try {
        val rows = eng.execute(q).collect().map(_.getLong(0)).toSeq
        println(s"OK ${rows.mkString(",")}")
      } catch {
        case e: Throwable =>
          println(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).replaceAll("\\s+", " ").take(220)}")
      }
    }
    spark.stop()
  }
}
