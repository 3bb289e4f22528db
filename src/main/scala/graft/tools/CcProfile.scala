package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.pipeline.Dedup

/** Stage timing for the near-dup clustering entry (qp71): pair
  * pipeline materialization vs the label-propagation rounds. */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("cc-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    docs.select(xxhash64(col("text"))).agg(max("xxhash64(text)")).count() // warm
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 2, 5)
    time("pairs count")(println("  pairs=" + pairs.count()))
    time("pairs count again")(pairs.count())
    val cc = time("connectedComponents")(
      Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 2, 5)))
    time("labels noop")(cc.write.format("noop").mode("overwrite").save())
    time("full entry again")(
      Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 2, 5))
        .orderBy(col("id"))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
