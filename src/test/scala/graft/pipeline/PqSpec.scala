package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ specs: encoding shape (m codes in range, exact norms),
  * ADC-vs-exact agreement on a quantization-friendly fixture, recall
  * against the brute-force tier on the real embeddings fixture, and
  * determinism. The driver entry qp70 is rows-only (approximate float
  * scores have no DuckDB oracle) — these tests carry the correctness
  * burden, like the LSH/IVF tiers before it. */
class PqSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("pq-spec").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def embeddings(dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  test("pqEncode: m codes per row, all in [0, ksub), norms exact") {
    val emb = embeddings("/root/testdata/sf0.001")
    val cb = Similarity.pqTrain(emb, m = 4, ksub = 8)
    assert(cb.length == 4 && cb.forall(_.length == 8))
    val enc = Similarity.pqEncode(emb, cb)
    val bad = enc.filter(size(col("codes")) =!= 4 ||
      exists(col("codes"), c => c < 0 || c >= 8)).count()
    assert(bad == 0)
    // norms are the exact ones, not reconstructed from codes
    val exact = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        sqrt(graft.functions.VectorOps.dot(col("embedding"), col("embedding"))).as("n2"))
    val drift = enc.join(exact, "vec_id")
      .filter(abs(col("norm") - col("n2")) > 1e-9).count()
    assert(drift == 0)
  }

  test("ADC is exact when vectors ARE codewords") {
    import spark.implicits._
    // 4 distinct 4-dim vectors, m=2 subspaces, ksub=4: k-means with
    // k = #distinct subvectors reproduces them as codewords, so the ADC
    // "approximation" must equal the true dot product exactly
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 1f)), (1L, Array(0f, 1f, 1f, 0f)),
      (2L, Array(1f, 1f, 0f, 0f)), (3L, Array(0f, 0f, 1f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.ivfPqTopK(vecs, nQueries = 4, k = 3,
      nlist = 2, nprobe = 2, m = 2, ksub = 4, kmeansIters = 8)
      .collect()
    val exactTop = Similarity.cosineTopK(vecs, nQueries = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    out.foreach { r =>
      val key = (r.getLong(0), r.getInt(1))
      assert(exactTop(key) == r.getLong(2),
        s"rank mismatch at $key: exact=${exactTop(key)} pq=${r.getLong(2)}")
    }
  }

  test("recall@10 vs brute force is usable on the embeddings fixture") {
    val emb = embeddings("/root/testdata/sf0.01")
    val k = 10; val nq = 20
    val exact = Similarity.cosineTopK(emb, nq, k).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    // m=16 → 4-dim subspaces: random-ish synthetic embeddings are PQ's
    // worst case (no correlation structure to exploit), so the fixture
    // needs fine subspaces where a real corpus could use m=8 on 768
    // dims. nprobe = nlist isolates ADC distortion from IVF probe loss
    // (the probe-loss bound is PipelineSpec's ivfTopK recall test).
    val approx = Similarity.ivfPqTopK(emb, nq, k,
      nlist = 8, nprobe = 8, m = 16, ksub = 16).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = exact.keys.toSeq.map { q =>
      val a = approx.getOrElse(q, Set.empty)
      a.intersect(exact(q)).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    info(s"mean recall@10 = $mean")
    assert(mean >= 0.7, s"mean recall@10 = $mean — PQ tier is not usable")
  }

  test("ivfPqTopK is deterministic across runs") {
    val emb = embeddings("/root/testdata/sf0.001")
    def run() = Similarity.ivfPqTopK(emb, nQueries = 5, k = 5,
      nlist = 4, nprobe = 2, m = 4, ksub = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(run() == run())
  }

  // ---- portable integer tiers (round 10: qp59/qp70 oracle flips) ------

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.get(1).toString.toLong, r.getLong(2), r.getDouble(3))).toSeq

  test("quantized IVF with a full probe equals the quantized brute force") {
    // nprobe = nlist: every candidate survives the coarse filter, so
    // the only difference from quantizedCosineTopK would be a scoring
    // or tie-break divergence — there must be none, bit for bit
    val emb = embeddings("/root/testdata/sf0.001")
    val ivf = Similarity.ivfTopKQuantized(emb, nQueries = 5, k = 3,
      nlist = 4, nprobe = 4)
    val brute = Similarity.quantizedCosineTopK(emb, nQueries = 5, k = 3)
    assert(rows(ivf) == rows(brute))
  }

  test("quantized IVF-PQ with full probe and corpus-wide refine equals brute force") {
    // shortlist refine·k ≥ corpus: ADC only orders the shortlist, the
    // exact refine re-scores every candidate — the result must equal
    // the brute-force tier exactly whatever the codebooks learned
    val emb = embeddings("/root/testdata/sf0.001") // 500 vectors
    val pq = Similarity.ivfPqTopKQuantized(emb, nQueries = 5, k = 3,
      nlist = 4, nprobe = 4, m = 16, ksub = 16, refine = 200)
    val brute = Similarity.quantizedCosineTopK(emb, nQueries = 5, k = 3)
    assert(rows(pq) == rows(brute))
  }

  test("quantized IVF / IVF-PQ are deterministic across runs") {
    val emb = embeddings("/root/testdata/sf0.001")
    def ivf() = rows(Similarity.ivfTopKQuantized(emb, nQueries = 5, k = 3,
      nlist = 16, nprobe = 4))
    def pq() = rows(Similarity.ivfPqTopKQuantized(emb, nQueries = 5, k = 3,
      nlist = 16, nprobe = 4, m = 16, ksub = 16))
    assert(ivf() == ivf())
    assert(pq() == pq())
  }
}
