package graft.tools

/** Round-12 scratch: print (rows, sum of first column) for driver
  * entries, for a quick diff against DuckDB. Not shipped surface. */
object Probe12b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Sessions.build("probe12b")
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      val rows = graft.SparkEntry.queries(n)(spark, sfDir)
        .collect().map(_.getLong(0))
      println(s"$n ${rows.length} ${rows.sum}")
      graft.queries.Engines.releaseAll()
    }
    spark.stop()
  }
}
