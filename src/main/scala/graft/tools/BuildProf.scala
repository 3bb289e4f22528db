package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** Scratch profiler for the corpus shingle-index build internals
  * (optimization-round triage; not part of the driver contract). */
object BuildProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.build("build-prof")
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count()
    val corpus = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 =!= 0)
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep")
      val fps = corpus
        .select(graft.pipeline.TextOps.fingerprint(col("text")).as("__fp"))
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      time("fps")(fps.count())
      val hc = graft.pipeline.Dedup.shingleHashStream(corpus, "doc_id", "text", 3)
        .repartition(col("h"))
        .dropDuplicates("id", "h")
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("hc")(hc.count())
      val dfreq = hc.groupBy(col("h")).agg(count(lit(1)).as("__df"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("dfreq")(dfreq.count())
      val ranked = hc.join(dfreq, "h")
        .withColumn("__sz", count(lit(1)).over(Window.partitionBy(col("id"))))
        .withColumn("__rk", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("__df"), col("h"))))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("ranked")(ranked.count())
      val ceilT = ((col("__sz") * 2 + 5 - 1) / 5).cast("long")
      val rawPrefix = ranked.filter(col("__rk") <= col("__sz") - ceilT + 1)
        .select(col("id"), col("h"), col("__sz"))
      val prefix = rawPrefix
        .withColumn("__bsz", count(lit(1)).over(Window.partitionBy(col("h"))))
        .filter(col("__bsz") <= 4096).drop("__bsz")
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("prefix")(prefix.count())
      val arrs = ranked.groupBy(col("id"))
        .agg(sort_array(collect_list(col("h"))).as("__hs"), count(lit(1)).as("__sz"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("arrs")(arrs.count())
      time("full buildCorpusShingleIndex") {
        val idx = graft.pipeline.Dedup.buildCorpusShingleIndex(
          corpus, "doc_id", "text", 3, 2, 5)
        idx.release(true)
      }
      Seq(fps, hc, dfreq, ranked, prefix, arrs).foreach(_.unpersist(true))
      graft.queries.Engines.releaseAll(blocking = true)
    }
    spark.stop()
  }
}
