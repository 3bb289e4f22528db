package graft.tools

import graft.Sessions

/** Scratch: print one-line physical-plan marker summaries for driver
  * entries — which join/window/agg shapes the final plan contains.
  * Used to derive (and re-check) the Round11 plan-marker pins.
  * Usage: runMain graft.tools.PlanDump <sfDir> <names...> */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.build("graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val p = df.queryExecution.executedPlan.toString
        def c(s: String) = p.sliding(s.length).count(_ == s)
        val markers = Seq("__vtthr_", "__vtg_", "__tirid_", "__tlrid_",
          "__tlthr_", "__scce_", "__ssidx_", "__sstb_", "__tgrid_",
          "__tsrid_", "__terid_", "__tbb_", "__pcv_", "__pdbest_",
          "__mtsalt_", "__xtrid_", "__trid_", "__gfpre_", "__pfrid_", "__nerid_", "__aerid_", "__xnrid_",
          "__plv_", "__gfrn_")
          .filter(p.contains).mkString(",")
        println(s"$n  BNLJ=${c("BroadcastNestedLoopJoin")} SMJ=${c("SortMergeJoin")} " +
          s"BHJ=${c("BroadcastHashJoin")} SHJ=${c("ShuffledHashJoin")} " +
          s"Win=${c("Window ")} maxby=${c("max_by")} cart=${c("CartesianProduct")} " +
          s"markers=[$markers]")
        graft.queries.Engines.releaseAll()
      } catch { case e: Throwable => println(s"$n ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
