package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.pipeline.Dedup

/** Stage-level wall-clock profile of the corpus-index entries (round 13
  * bring-up tool): build / verdict / append / verdict, timed separately
  * at the bench scale, to attribute qp100/qp103 cost before optimizing
  * the wrong stage. */
object IdxProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 2
    val spark = Sessions.build("graft-idx-profile")
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[idxprof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // per-round GC attribution (round 14, VERDICT r13 #2): the index
    // entries' 1.5-2.5x rep variance needed the collector's own numbers
    // to separate "the query got slower" from "a collection landed
    // inside the timed window"
    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    var gcPrev = gcMillis
    (1 to rounds).foreach { round =>
      println(s"[idxprof] ---- round $round ----")
      val docs = Tables.load(spark, sfDir, "documents")
      val corpus = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 =!= 0)
      val b1 = docs.filter(col("doc_id") % 5 === 0)
      val b2 = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 === 0)
      val idx = t("build")(Dedup.buildCorpusShingleIndex(
        corpus, "doc_id", "text", 3, 2, 5))
      t("verdict b1")(Dedup.incrementalNearDupIndexed(idx, b1, "doc_id", "text")
        .write.format("noop").mode("overwrite").save())
      val idx2 = t("append b1")(Dedup.appendToCorpusShingleIndex(
        idx, b1, "doc_id", "text"))
      t("verdict b2")(Dedup.incrementalNearDupIndexed(idx2, b2, "doc_id", "text")
        .write.format("noop").mode("overwrite").save())
      t("release")(graft.queries.Engines.releaseAll(blocking = true))
      val gcNow = gcMillis
      println(f"[idxprof] gc this round: ${(gcNow - gcPrev) / 1000.0}%5.2f s")
      gcPrev = gcNow
    }
    spark.stop()
  }
}
