package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for headline queries — the audit loop
  * for pushdown/broadcast/codegen (run manually; not part of Verify). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Sessions.build("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_agg_pricing", "q14_multi_join", "q24_limit_with_ties",
      "q08_join_left_semi", "qp50_minhash_neardup")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(6000))
    }
    spark.stop()
  }
}
