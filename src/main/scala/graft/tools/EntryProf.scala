package graft.tools

/** Per-entry attribution: DataFrame CONSTRUCTION time (parse + bind,
  * including any eager bind-time actions like theta band stats or index
  * builds) vs noop-sink EXECUTION time, over a few repetitions.
  * Optimization-round triage only — not part of the driver contract.
  * Usage: runMain graft.tools.EntryProf <reps> <names…>
  */
object EntryProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val names = args.drop(1).toSeq
    val spark = graft.Sessions.build("entry-prof")
    spark.sparkContext.setLogLevel("ERROR")
    // warm shared machinery once, untimed
    graft.SparkEntry.queries("q03_join_inner")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    graft.queries.Engines.releaseAll()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val verbose = sys.env.contains("GRAFT_PROF_JOBS")
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          jobStartNs.put(js.jobId, System.nanoTime())
          if (verbose) {
            val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
            println(s"[job] start ${js.jobId} $site")
          }
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (verbose) {
            val t0 = Option(jobStartNs.remove(je.jobId))
            val d = t0.map(t => (System.nanoTime() - t) / 1e9).getOrElse(-1.0)
            println(f"[job] end   ${je.jobId} $d%.3f s")
          }
      })
    names.foreach { n =>
      (1 to reps).foreach { r =>
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        val j1 = jobs.get()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        val j2 = jobs.get()
        graft.queries.Engines.releaseAll(blocking = true)
        println(f"[prof] $n rep$r construct ${(t1 - t0) / 1e9}%.3f s (${j1 - j0} jobs)  exec ${(t2 - t1) / 1e9}%.3f s (${j2 - j1} jobs)")
      }
    }
    spark.stop()
  }
}
