package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 scale gates (VERDICT r3 #1) and k-means hardening (#5, #9):
  * the brute-force ANN tiers and the exact embedding near-dup tier must
  * reject unbounded inputs with a pointer to their bucketed scale
  * siblings, and k-means must re-seed empty clusters instead of letting
  * nlist silently degrade. */
class GateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("gate-spec").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def emb: DataFrame = graft.Tables.load(spark, dir, "embeddings")

  test("brute-force ANN tiers reject nQueries beyond the cap") {
    val e1 = intercept[IllegalArgumentException](
      Similarity.quantizedDotTopK(emb, nQueries = 1000000, k = 3))
    assert(e1.getMessage.contains("lshCosineTopK") && e1.getMessage.contains("ivfTopK"))
    val e2 = intercept[IllegalArgumentException](
      Similarity.cosineTopK(emb, nQueries = Similarity.MaxBruteForceQueries + 1, k = 3))
    assert(e2.getMessage.contains("brute-force"))
    // at-cap still allowed
    Similarity.cosineTopK(emb, nQueries = Similarity.MaxBruteForceQueries, k = 1)
  }

  test("exact embedding near-dup tier rejects an unbounded id slice") {
    val e = intercept[IllegalArgumentException](
      Dedup.embeddingNearDupPairs(emb, maxId = Long.MaxValue,
        thresholdNum = 2, thresholdDen = 5))
    assert(e.getMessage.contains("embeddingNearDupPairsLsh"))
    // the scale tiers stay ungated (bucketed by construction)
    Dedup.embeddingNearDupPairsLsh(emb, thresholdNum = 2, thresholdDen = 5)
      .queryExecution.optimizedPlan // plan-build only — no job needed
  }

  test("LSH near-dup tier rejects nbits too low for the corpus") {
    // 500 vectors, maxBucket 10: nbits=1 expects 250 per bucket — the
    // cap would drop every bucket, so the gate must fire and name the
    // nbits that fits (500 >> 6 = 7 <= 10)
    // directMaxFraction > 1 pins the BUCKET path: the nbits gate guards
    // bucket capping, which the direct-verify path never reaches
    val e = intercept[IllegalArgumentException](
      Dedup.embeddingNearDupPairsLsh(emb, thresholdNum = 2, thresholdDen = 5,
        nbits = 1, maxBucket = 10, directMaxFraction = 2.0))
    assert(e.getMessage.contains("raise nbits") && e.getMessage.contains("6"),
      s"unexpected: ${e.getMessage}")
    // the suggested nbits passes the gate
    Dedup.embeddingNearDupPairsLsh(emb, thresholdNum = 2, thresholdDen = 5,
      nbits = 6, maxBucket = 10).queryExecution.optimizedPlan
  }

  test("k-means re-seeds empty clusters on a clustered fixture") {
    import spark.implicits._
    // two tight clusters of 50 points each, k=4: at least two initial
    // centroids land in the same blob, so without re-seeding some
    // clusters end empty and keep stale positions
    val pts = (0 until 100).map { i =>
      val base = if (i < 50) 10.0f else -10.0f
      (i.toLong, Array(base + (i % 5) * 0.001f, base - (i % 7) * 0.001f))
    }.toDF("vec_id", "embedding")
    val cs = Similarity.kmeansCentroids(pts, k = 4, iters = 5)
    assert(cs.length == 4)
    // every centroid is distinct (re-seeded ones moved off the stale spot)
    assert(cs.map(_.toSeq).distinct.length == 4,
      s"duplicate/stale centroids: ${cs.map(_.mkString("[", ",", "]")).mkString(" ")}")
  }

  test("k-means re-seed never installs duplicate centroids on duplicate vectors") {
    import spark.implicits._
    // only two DISTINCT vectors across 100 rows, k = 3: re-seeding must
    // not place two centroids on the same duplicate vector, and must
    // tolerate having fewer distinct vectors than k without crashing
    val pts = (0 until 100).map { i =>
      val v = if (i < 50) Array(1.0f, 2.0f) else Array(-3.0f, -4.0f)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val cs = Similarity.kmeansCentroids(pts, k = 3, iters = 4)
    assert(cs.length == 3)
    val distinct = cs.map(_.toSeq).distinct.length
    assert(distinct >= 2, s"collapsed to $distinct centroids")
    // no two re-seeded centroids may coincide unless the corpus forces it
    // (2 distinct vectors here, so exactly one stale/duplicate is allowed)
    assert(cs.map(_.toSeq).groupBy(identity).values.map(_.size).max <= 2)
  }

  test("k-means is deterministic across runs (long-quantized accumulation)") {
    val a = Similarity.kmeansCentroids(emb, k = 8, iters = 3)
    val b = Similarity.kmeansCentroids(emb, k = 8, iters = 3)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(java.util.Arrays.equals(x, y), "centroids differ between runs")
    }
  }

  test("ivfTopK still produces k results per query after the k-means rework") {
    val r = Similarity.ivfTopK(emb, nQueries = 3, k = 3, nlist = 8, nprobe = 3)
      .collect()
    assert(r.length == 9, s"expected 3 queries x 3 results, got ${r.length}")
  }
}
