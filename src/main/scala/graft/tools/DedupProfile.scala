package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Sessions, Tables}
import graft.pipeline.{Dedup, TextOps}

/** Stage-by-stage profiler for the MinHash near-dup path (qp50): times
  * each pipeline stage at the SPARK_GRAFT_SF_DIR scale. This is how the
  * interpreted-lambda shingle builder was isolated as the dominant cost
  * (see SCALE.md "Dedup at 100 TB"). */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("dedup-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s   (n=$n)")
    }

    println("docs = " + docs.count())
    // warm
    docs.select(xxhash64(col("text"))).agg(max("xxhash64(text)")).count()

    val tok = docs.select(col("doc_id").as("id"), posexplode(TextOps.tokens(col("text"))))
      .withColumnsRenamed(Map("pos" -> "p", "col" -> "w"))
    time("tokens")(tok.count())
    val wd = Window.partitionBy(col("id")).orderBy(col("p"))
    val leads = (1 until 3).map(i => lead(col("w"), i).over(wd))
    val stream = tok.select(col("id"), col("p"),
        concat_ws(" ", (col("w") +: leads): _*).as("s"),
        leads.last.isNotNull.as("__full"))
      .filter(col("__full") || col("p") === 0)
      .select(col("id"), col("s"))
    time("shingle stream")(stream.count())
    val hashed = stream.select(col("id"), xxhash64(col("s")).as("h"))
    val aggs = (0 until 64).map(j => min(xxhash64(lit(j), col("h"))).as(s"h$j"))
    val sig = hashed.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    time("minhash signature")(sig.count())
    val bandCols = (0 until 16).map(b =>
      xxhash64((lit(b) +: (0 until 4).map(i => col(s"h${b * 4 + i}"))): _*))
    val banded = sig.select(col("id"), posexplode(array(bandCols: _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bh"))
    time("banded")(banded.count())
    val capped = banded
      .withColumn("__bsz", count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
      .filter(col("__bsz") <= 4096).drop("__bsz")
    time("capped")(capped.count())
    val cands = Dedup.lshCandidates(docs, "doc_id", "text")
    time("candidates (full)")(cands.count())
    val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text")
    time("near-dup pairs (full)")(pairs.count())
    spark.stop()
  }
}
