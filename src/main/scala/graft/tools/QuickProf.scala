package graft.pipeline

import org.apache.spark.sql.functions._
import graft.Sessions

/** Ad-hoc stage profiler — local iteration only, not part of the
  * driver contract. Current target: the n-gram Jaccard pipeline
  * (qp63 / the qp71 connected-components input). */
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
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count()
    val stream = Dedup.shingleStream(docs, "doc_id", "text", 3).distinct()
    val hashes = stream.select(col("id"), xxhash64(col("s")).as("h"))
      .repartition(col("h"))
    time("hashes count")(println(hashes.count()))
    val dfreq = hashes.groupBy(col("h")).agg(count(lit(1)).as("__df"))
    time("dfreq count")(println(dfreq.count()))
    import org.apache.spark.sql.expressions.Window
    val ranked = hashes.join(dfreq, "h")
      .withColumn("__sz", count(lit(1)).over(Window.partitionBy(col("id"))))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("__df"), col("h"))))
    val ceilT = ((col("__sz") * 2 + 5 - 1) / 5).cast("long")
    val prefix = ranked.filter(col("__rk") <= col("__sz") - ceilT + 1)
      .select(col("id"), col("h"), col("__sz"))
    time("prefix count")(println(prefix.count()))
    val index = Dedup.cappedBuckets(prefix, Seq(col("h")), 4096)
    val cands = index.select(col("h"), col("id").as("id_a"), col("__sz").as("__sza"))
      .join(index.select(col("h"), col("id").as("id_b"), col("__sz").as("__szb")), "h")
      .filter(col("id_a") < col("id_b") &&
        col("__sza") * 2 <= col("__szb") * 5 &&
        col("__szb") * 2 <= col("__sza") * 5)
      .select("id_a", "id_b")
      .distinct()
    time("cands count")(println(cands.count()))
    time("full qp63 (1)") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 2, 5)
        .write.format("noop").mode("overwrite").save()
    }
    time("full qp63 (2)") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 2, 5)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
