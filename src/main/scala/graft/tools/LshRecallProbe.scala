package graft.tools

import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** One-off probe: exact-vs-LSH pair recall per SF dir and parameter set —
  * decides whether the qp74 LSH entry can carry the exact-tier oracle
  * (recall 1.0 with deterministic planes holds always or never). */
object LshRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("lsh-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = graft.Tables.load(spark, sf, "embeddings")
      val maxId = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
      val exact = Dedup.embeddingNearDupPairs(emb, maxId, 2, 5)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((nbits, tables) <- Seq((1, 8), (2, 8), (1, 12))) {
        val lsh = Dedup.embeddingNearDupPairsLsh(emb, 2, 5, nbits, tables)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"$sf nbits=$nbits tables=$tables exact=${exact.size} " +
          s"lsh=${lsh.size} missed=${(exact -- lsh).size} extra=${(lsh -- exact).size}")
      }
    }
    spark.stop()
  }
}
