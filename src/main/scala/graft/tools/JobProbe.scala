package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import graft.Sessions

/** Scratch profiler (round 10): runs one driver entry through the engine
  * with a listener printing per-job wall times, so the expensive action
  * inside a multi-action lowering can be identified. Not shipped surface.
  * Usage: runMain graft.tools.JobProbe <entryName> [repeats] */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("qe146_scalar_theta_group_top1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-jobprobe")
    spark.sparkContext.setLogLevel("WARN")
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(),
          Option(js.properties).map(_.getProperty("spark.job.description"))
            .flatMap(Option(_)).getOrElse(""))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, desc) =>
          val dt = (System.nanoTime() - t0) / 1e9
          if (dt > 0.05)
            println(f"  job ${je.jobId}%3d ${dt}%7.3f s  ${desc.take(90)}")
        }
    })
    for (i <- 1 to reps) {
      println(s"=== run $i of $name ===")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      graft.queries.Engines.releaseAll(blocking = true)
      System.gc(); Thread.sleep(300)
    }
    spark.stop()
  }
}
