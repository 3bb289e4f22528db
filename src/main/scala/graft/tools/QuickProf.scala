package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Sessions

/** Ad-hoc stage profiler for the embedding LSH near-dup pipeline —
  * local iteration only, not part of the driver contract. Lives in the
  * pipeline package to reach the private building blocks. */
object QuickProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-quickprof")
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    emb.count() // warm scan
    val nbits = 1; val tables = 12; val maxBucket = 4096
    val nonNull = emb.filter(col("embedding").isNotNull)
    val dim = 64
    val exploded = nonNull.select(col("vec_id"),
        posexplode(array((0 until tables).map(t =>
          Similarity.signBucket(col("embedding"), t, nbits, dim)): _*)))
      .withColumnsRenamed(Map("pos" -> "tbl", "col" -> "bucket"))
    time("exploded buckets count")(println(exploded.count()))
    val bucketed = Dedup.cappedBuckets(exploded, Seq(col("tbl"), col("bucket")), maxBucket)
    val wId = Window.partitionBy(col("vec_id"))
    val packed = bucketed
      .withColumn("__mask",
        sum(expr(s"shiftleft(bucket, cast(tbl * $nbits as int))")).over(wId))
      .withColumn("__surv",
        sum(expr("shiftleft(cast(1 as bigint), cast(tbl as int))")).over(wId))
    time("packed count")(println(packed.count()))
    def chunk(m: org.apache.spark.sql.Column, t: Int) =
      shiftright(m, t * nbits).bitwiseAND(lit((1L << nbits) - 1))
    val firstCollision = (0 until tables - 1).map { t =>
      (col("tbl") <= t) ||
        shiftright(col("__sa"), t).bitwiseAND(shiftright(col("__sb"), t))
          .bitwiseAND(lit(1L)) === 0 ||
        chunk(col("__ma"), t) =!= chunk(col("__mb"), t)
    }.reduceOption(_ && _).getOrElse(lit(true))
    val candIds = packed.select(col("vec_id").as("id_a"), col("tbl"), col("bucket"),
        col("__mask").as("__ma"), col("__surv").as("__sa"))
      .join(packed.select(col("vec_id").as("id_b"), col("tbl"), col("bucket"),
        col("__mask").as("__mb"), col("__surv").as("__sb")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b") && firstCollision)
      .select(col("id_a"), col("id_b"))
    time("candIds count")(println(candIds.count()))
    val e = emb
      .select(col("vec_id"), graft.functions.VectorOps.quantizeMilli(col("embedding")).as("q"))
      .withColumn("n2", graft.functions.VectorOps.dot(col("q"), col("q")))
    val cands = candIds
      .join(e.select(col("vec_id").as("id_a"), col("q").as("__qa"),
        col("n2").as("__na")), Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("q").as("__qb"),
        col("n2").as("__nb")), Seq("id_b"))
    time("cands joined count")(println(cands.count()))
    time("full pipeline (warm)") {
      Dedup.embeddingNearDupPairsLsh(
          emb, thresholdNum = 2, thresholdDen = 5, nbits = 1, tables = 12)
        .write.format("noop").mode("overwrite").save()
    }
    time("full pipeline (warm 2)") {
      Dedup.embeddingNearDupPairsLsh(
          emb, thresholdNum = 2, thresholdDen = 5, nbits = 1, tables = 12)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
