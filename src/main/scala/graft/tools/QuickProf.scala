package graft.pipeline

import org.apache.spark.sql.functions._
import graft.Sessions

/** Ad-hoc stage profiler — local iteration only, not part of the
  * driver contract. Current target: IVF-PQ quantized tier cost split
  * (codegen recompile per training iteration vs raw scans). */
object QuickProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-quickprof")
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    emb.count()
    def run(): Unit =
      Similarity.ivfPqTopKQuantized(emb, nQueries = 64, k = 10)
        .write.format("noop").mode("overwrite").save()
    time("ivfpq default (warm1)")(run())
    time("ivfpq default (warm2)")(run())
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("ivfpq wholestage-off")(run())
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    time("ivfpq no-codegen")(run())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    time("ivfpq default (warm3)")(run())
    spark.stop()
  }
}
