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
      val c = df.count()
      println(f"$n%-28s rows=$c%-8d ${(System.nanoTime()-t0)/1e9}%.2fs")
      graft.queries.Engines.releaseAll()
    }
    spark.stop()
  }
}
