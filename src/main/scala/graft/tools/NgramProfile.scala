package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Sessions, Tables}
import graft.pipeline.{Dedup, TextOps}

/** Stage-by-stage profiler for the n-gram Jaccard path (qp63), same
  * pattern as [[DedupProfile]]: isolates shingling, hashing, document
  * frequency, prefix ranking, candidate join, and array verify at the
  * SPARK_GRAFT_SF_DIR scale. */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("ngram-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s   (n=$n)")
    }

    println("docs = " + docs.count())
    docs.select(xxhash64(col("text"))).agg(max("xxhash64(text)")).count() // warm

    // the REAL operator's shingle builder — a drifting copy here would
    // silently profile something else than qp63 runs
    val stream = Dedup.shingleStream(docs, "doc_id", "text", 3).distinct()
    val hashes = stream.select(col("id"), xxhash64(col("s")).as("h"))
    time("shingle+distinct+hash")(hashes.count())
    val dfreq = hashes.groupBy(col("h")).agg(count(lit(1)).as("__df"))
    time("dfreq")(dfreq.count())
    val ranked = hashes.join(dfreq, "h")
      .withColumn("__sz", count(lit(1)).over(Window.partitionBy(col("id"))))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("__df"), col("h"))))
    time("ranked (2 windows)")(ranked.count())
    val ceilT = ((col("__sz") * 2 + 5 - 1) / 5).cast("long")
    val prefix = ranked.filter(col("__rk") <= col("__sz") - ceilT + 1)
      .select(col("id"), col("h"), col("__sz"))
    time("prefix")(prefix.count())
    val index = prefix
    val cands = index.select(col("h"), col("id").as("id_a"), col("__sz").as("__sza"))
      .join(index.select(col("h"), col("id").as("id_b"), col("__sz").as("__szb")), "h")
      .filter(col("id_a") < col("id_b") &&
        col("__sza") * 2 <= col("__szb") * 5 &&
        col("__szb") * 2 <= col("__sza") * 5)
      .select("id_a", "id_b")
      .distinct()
    time("cands")(cands.count())
    val arrs = hashes.groupBy(col("id"))
      .agg(sort_array(collect_list(col("h"))).as("__hs"), count(lit(1)).as("__sz"))
    time("arrs")(arrs.count())
    val verified = cands
      .join(arrs.select(col("id").as("id_a"), col("__hs").as("__ha"), col("__sz").as("__sza")), "id_a")
      .join(arrs.select(col("id").as("id_b"), col("__hs").as("__hb"), col("__sz").as("__szb")), "id_b")
      .withColumn("__inter", size(array_intersect(col("__ha"), col("__hb"))))
      .withColumn("__uni", col("__sza") + col("__szb") - col("__inter"))
      .filter(col("__inter") * 5 >= col("__uni") * 2)
    time("verify")(verified.count())
    time("END-TO-END qp63")(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      3, 2, 5).count())
    time("END-TO-END again")(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      3, 2, 5).count())
    spark.stop()
  }
}
