package graft.tools

import graft.Sessions

/** Scratch runner: execute one engine-dialect query against a testdata
  * dir and print the result (or the error). For poking at dialect
  * corners without writing a spec first. Not shipped surface.
  * Usage: runMain graft.tools.SqlProbe <sfDir> <sql...> */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val sql = args.drop(1).mkString(" ")
    val spark = Sessions.build("graft-sqlprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val eng = graft.queries.Engines.get(spark, sfDir)
    try {
      val df = eng.execute(sql)
      df.show(50, truncate = false)
      println(s"rows: ${df.count()}")
    } catch {
      case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
    spark.stop()
  }
}
