package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.pipeline.{Curation, Dedup, Sketches}
import java.nio.file.{Files, Paths}

/** Parameter-axis fuzz for the pipeline operators (round 13, VERDICT
  * r12 next #7): the dialect fuzzer exercises the Binder over generated
  * QUERIES; the pipeline operators were covered by spec + one oracled
  * driver entry each — i.e. one parameter point. This sweep runs a grid
  * of parameter points per operator (shingle width × threshold for
  * incremental dedup, k × value column for the KMV sketch, k for the
  * exact-k sampler) and dumps each result + a parameterized DuckDB
  * oracle in the Verify format, so `tools/check.py` does the compare
  * with zero new plumbing:
  *
  *   sbt "runMain graft.tools.ParamSweep /root/testdata/sf0.001 /tmp/sweep"
  *   python3 tools/check.py /root/testdata/sf0.001 /tmp/sweep
  *
  * Every oracle is the driver entries' own SQL with the constants
  * substituted — a parameter point that breaks an algebraic boundary
  * (ceil arithmetic at num=den, prefix length at tiny shingle sets,
  * KMV k crossing a group's distinct count) shows up as a hash fail.
  */
object ParamSweep {

  private def shingleExpr(n: Int): String = {
    val terms = (0 until n).map(j => if (j == 0) "w[i]" else s"w[i+$j]").mkString(", ")
    s"list_distinct(list_transform(range(1, greatest(len(w)-${n - 1}, 1) + 1), i -> concat_ws(' ', $terms)))"
  }

  private def incrementalOracle(n: Int, num: Int, den: Int): String =
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w,
          md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) fp FROM documents),
      s AS (SELECT doc_id, fp, ${shingleExpr(n)} sh FROM t),
      corpus AS (SELECT * FROM s WHERE doc_id % 5 <> 0),
      batch AS (SELECT * FROM s WHERE doc_id % 5 = 0),
      ex AS (SELECT DISTINCT b.doc_id FROM batch b JOIN corpus c ON b.fp = c.fp),
      nr AS (SELECT DISTINCT b.doc_id FROM batch b JOIN corpus c
             ON $den * len(list_intersect(b.sh, c.sh)) >= $num * len(list_distinct(list_concat(b.sh, c.sh))))
      SELECT b.doc_id,
        CASE WHEN ex.doc_id IS NOT NULL THEN 'exact'
             WHEN nr.doc_id IS NOT NULL THEN 'near' ELSE 'new' END AS verdict
      FROM batch b LEFT JOIN ex ON ex.doc_id = b.doc_id
      LEFT JOIN nr ON nr.doc_id = b.doc_id ORDER BY b.doc_id"""

  private def kmvOracle(valueCol: String, k: Int): String =
    s"""WITH h AS (SELECT DISTINCT l_returnflag grp,
          ($valueCol * 1103515245 + 12345) % 1000000007 h FROM lineitem
          WHERE $valueCol IS NOT NULL),
      r AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) rk FROM h),
      t AS (SELECT grp, max(h) hk, CAST(count(*) AS BIGINT) m
            FROM r WHERE rk <= $k GROUP BY grp)
      SELECT grp AS l_returnflag,
        CASE WHEN m < $k THEN m
             ELSE CAST(floor(${(k - 1).toLong * 1000000007L}.0 / hk) AS BIGINT) END AS n_est
      FROM t ORDER BY l_returnflag"""

  private def exactKOracle(k: Int): String =
    s"""WITH r AS (SELECT doc_id, source, row_number() OVER (
          PARTITION BY source
          ORDER BY (doc_id * 1664525 + 1013904223) % 1000000007, doc_id) rk
        FROM documents WHERE doc_id IS NOT NULL)
      SELECT doc_id, source, CAST(rk AS INT) AS sample_rank
      FROM r WHERE rk <= $k ORDER BY source, sample_rank"""

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_sweep"
    val spark = Sessions.build("graft-param-sweep")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val cases = scala.collection.mutable.LinkedHashMap
      .empty[String, (() => org.apache.spark.sql.DataFrame, String)]

    // incrementalNearDup: shingle width × threshold (incl. the num=den
    // edge where ceil(t·sz) = sz — prefix length collapses to 1)
    for (n <- Seq(2, 3, 4); (num, den) <- Seq((1, 2), (2, 5), (3, 10), (4, 5), (1, 1))) {
      val docs = () => Tables.load(spark, sfDir, "documents")
      cases(s"sw_incr_n${n}_t${num}_$den") = (() =>
        Dedup.incrementalNearDup(
            docs().filter(col("doc_id") % 5 =!= 0),
            docs().filter(col("doc_id") % 5 === 0),
            "doc_id", "text", shingleN = n, thresholdNum = num, thresholdDen = den)
          .select(col("id").as("doc_id"), col("verdict")),
        incrementalOracle(n, num, den))
    }

    // kmvDistinct: k across the exact/estimator boundary × value column
    for (k <- Seq(2, 8, 64, 256, 4096); vc <- Seq("l_partkey", "l_suppkey")) {
      cases(s"sw_kmv_${vc}_k$k") = (() =>
        Sketches.kmvDistinct(Tables.load(spark, sfDir, "lineitem"),
            vc, "l_returnflag", k = k)
          .select(col("grp").as("l_returnflag"), col("n_est")),
        kmvOracle(vc, k))
    }

    // exactKSample: k from degenerate 1 to over-stratum-size
    for (k <- Seq(1, 3, 17, 1000)) {
      cases(s"sw_exactk_k$k") = (() =>
        Curation.exactKSample(Tables.load(spark, sfDir, "documents"),
            "doc_id", "source", k = k)
          .select(col("id").as("doc_id"), col("source"), col("sample_rank")),
        exactKOracle(k))
    }

    // qualityQuantileFilter: the quantile across its whole domain,
    // including q=0 (keep all) and q=1 (rank rule keeps nothing)
    for ((qn, qd) <- Seq((0, 1), (1, 4), (1, 2), (3, 4), (1, 1))) {
      cases(s"sw_quant_q${qn}_$qd") = (() =>
        Curation.qualityQuantileFilter(Tables.load(spark, sfDir, "documents"),
            "doc_id", "text", "source", qNum = qn, qDen = qd)
          .select(col("id").as("doc_id"), col("source"), col("score"), col("kept")),
        s"""WITH t AS (SELECT doc_id, source,
              CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) tok,
              CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS BIGINT) uniq
            FROM documents),
          sc AS (SELECT doc_id, source,
              CAST(floor(uniq * 1000.0 / tok) AS BIGINT) score FROM t WHERE tok > 0),
          r AS (SELECT doc_id, source, score,
              row_number() OVER (PARTITION BY source ORDER BY score, doc_id) rk,
              count(*) OVER (PARTITION BY source) n FROM sc)
          SELECT doc_id, source, score, (rk * $qd > n * $qn) AS kept FROM r ORDER BY doc_id""")
    }

    // KMV merge property: engine merges an m-way split of events, the
    // oracle sketches the union directly — every point is the merge
    // theorem at a different (k, m)
    for (k <- Seq(2, 16, 64); m <- Seq(2, 3)) {
      cases(s"sw_kmvmerge_k${k}_m$m") = (() => {
        val events = Tables.load(spark, sfDir, "events")
        val parts = (0 until m).map(i => Sketches.kmvSketch(
          events.filter(pmod(col("event_id"), lit(m)) === i),
          "user_id", "event_type", k = k))
        Sketches.kmvEstimate(
            parts.reduce((a, b) => Sketches.kmvMerge(a, b, k = k)), k = k)
          .select(col("grp").as("event_type"), col("n_est"))
      },
        s"""WITH h AS (SELECT DISTINCT event_type grp,
              (user_id * 1103515245 + 12345) % 1000000007 h FROM events
              WHERE user_id IS NOT NULL),
          r AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) rk FROM h),
          t AS (SELECT grp, max(h) hk, CAST(count(*) AS BIGINT) m
                FROM r WHERE rk <= $k GROUP BY grp)
          SELECT grp AS event_type,
            CASE WHEN m < $k THEN m
                 ELSE CAST(floor(${(k - 1).toLong * 1000000007L}.0 / hk) AS BIGINT) END AS n_est
          FROM t ORDER BY event_type""")
    }

    var failed = 0
    cases.foreach { case (name, (run, _)) =>
      try run().coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[sweep] $name failed: ${e.getMessage}")
      }
      finally graft.queries.Engines.releaseAll()
    }
    def q(s: String): String = graft.JsonUtil.quote(s)
    val json = cases.map { case (k, (_, sql)) => s"${q(k)}: ${q(sql)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[sweep] ${cases.size} parameter points dumped to $outDir" +
      (if (failed > 0) s" ($failed FAILED)" else ""))
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
