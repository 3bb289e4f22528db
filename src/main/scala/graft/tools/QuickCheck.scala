package graft.tools
import org.apache.spark.sql.SparkSession
object QuickCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Sessions.build("quick-check")
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      // same sink as Bench: noop write materializes every column and
      // keeps the final sort (count() lets Catalyst prune both, which
      // under-measures — qp63 read 2.5 s by count vs 6.6 s end-to-end)
      df.write.format("noop").mode("overwrite").save()
      println(f"$n%-28s ${(System.nanoTime()-t0)/1e9}%.2fs")
      graft.queries.Engines.releaseAll()
    }
    spark.stop()
  }
}
