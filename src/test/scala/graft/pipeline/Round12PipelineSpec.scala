package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 pipeline additions: SemDeDup-style semantic dedup (qp92),
  * incremental cross-snapshot dedup verdicts (qp93), and the per-source
  * quality-quantile filter (qp94). The driver entries carry full DuckDB
  * oracles; these specs pin the operator-level PROPERTIES the oracles
  * can't state — prefix-filter completeness against an all-pairs brute
  * force, the keep-smallest-id semantics on planted duplicates, and the
  * exact dropped-count arithmetic of the rank rule. */
class Round12PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("round12-pipeline-spec").master("local[4]")
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

  private def docs: DataFrame = graft.Tables.load(spark, dir, "documents")
  private def embs: DataFrame = graft.Tables.load(spark, dir, "embeddings")

  // ---- qp92: SemDeDup ---------------------------------------------------

  test("semdedup: planted identical vectors keep exactly the smallest id") {
    import spark.implicits._
    val base = Seq.tabulate(64)(i => (i % 7 - 3).toFloat)
    val other = Seq.tabulate(64)(i => ((i * 3) % 11 - 5).toFloat)
    val rows = Seq(
      (0L, base), (5L, base), (9L, base), // identical triple
      (2L, other), (3L, other.map(-_)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.semanticDedupQuantized(df, nlist = 2, kmeansIters = 2,
      thresholdNum = 99, thresholdDen = 100).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // identical vectors always share a cluster (identical distances,
    // same argmin tie-break) and sit at cosine 1 — only id 0 survives
    assert(out(0L) && !out(5L) && !out(9L))
    // the opposite-sign vector has dot < 0 against `other`: never a dup
    assert(out(3L))
  }

  test("semdedup: drop verdicts match the all-pairs within-cluster truth") {
    val out = Similarity.semanticDedupQuantized(embs, nlist = 8,
      kmeansIters = 2, thresholdNum = 3, thresholdDen = 10).collect()
    val cid = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    val kept = out.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    // brute-force the quantized cosine over every same-cluster pair
    val v = embs.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        graft.functions.VectorOps.quantizeMilli(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def n2(a: Array[Double]) = a.map(x => x * x).sum
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val ids = out.map(_.getLong(0)).sorted
    for (b <- ids) {
      val isDup = ids.exists { a =>
        a < b && cid(a) == cid(b) && n2(v(a)) > 0 && {
          val d = dot(v(a), v(b))
          d >= 0 && 100.0 * d * d >= 9.0 * n2(v(a)) * n2(v(b))
        }
      }
      assert(kept(b) == !isDup, s"vec $b kept=${kept(b)} but isDup=$isDup")
    }
  }

  // ---- qp93: incremental dedup -------------------------------------------

  test("incremental: planted exact/near/new verdicts") {
    import spark.implicits._
    val text = (1 to 60).map(i => s"token$i").mkString(" ")
    val near = (1 to 60).map(i => if (i <= 3) s"edited$i" else s"token$i").mkString(" ")
    val corpus = Seq((100L, text), (101L, "completely different content here " * 10)).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "  " + text + " "), // whitespace-only delta: exact (normalized fp)
      (2L, near),              // 57/60 shared trigram region: near
      (3L, (1 to 60).map(i => s"zzz$i").mkString(" "))). // disjoint: new
      toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(corpus, batch, "doc_id", "text",
      shingleN = 3, thresholdNum = 1, thresholdDen = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "exact", 2L -> "near", 3L -> "new"))
  }

  test("incremental: prefix-filtered verdicts match all-pairs brute force") {
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val out = Dedup.incrementalNearDup(corpus, batch, "doc_id", "text",
      shingleN = 3, thresholdNum = 2, thresholdDen = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def sets(df: DataFrame): Map[Long, Set[String]] =
      Dedup.shingleStream(df, "doc_id", "text", 3).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val cs = sets(corpus); val bs = sets(batch)
    val fps = (df: DataFrame) => df.select(col("doc_id"),
        graft.pipeline.TextOps.fingerprint(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cfp = fps(corpus).values.toSet; val bfp = fps(batch)
    for ((b, sh) <- bs) {
      val expected =
        if (cfp(bfp(b))) "exact"
        else if (cs.values.exists(c =>
          5 * sh.intersect(c).size >= 2 * sh.union(c).size)) "near"
        else "new"
      assert(out(b) == expected, s"doc $b got ${out(b)} want $expected")
    }
    assert(out.keySet == bs.keySet)
  }

  // ---- qp98: PGM (P5) through the generalized netpbm machinery -------------

  test("pgm: encode/parse/resize roundtrip matches a per-pixel reference") {
    import spark.implicits._
    val d = Seq((7L, "the quick brown fox jumps over the lazy dog"),
      (8L, ""), (9L, "ab")).toDF("doc_id", "text")
    val out = Multimodal.ppmPlaneMeta(
      Multimodal.resizePpm(Multimodal.encodePgm(d, "doc_id", "text"), 2, 3))
      .collect().map(r => r.doc_id -> r).toMap
    for ((id, text) <- Seq(7L -> "the quick brown fox jumps over the lazy dog",
        8L -> "", 9L -> "ab")) {
      val raw = text.getBytes("UTF-8")
      val src = if (raw.isEmpty) Array(' '.toByte) else raw
      val (w, h) = (8 + raw.length % 32, 8 + (raw.length * 5) % 32)
      val (ow, oh) = (math.max(w * 2 / 3, 1), math.max(h * 2 / 3, 1))
      var acc = 0L
      for (y <- 0 until oh; x <- 0 until ow) {
        val b = src(((y * h / oh) * w + x * w / ow) % src.length) & 0xFF
        acc = (acc * 131L + b) % 1000000007L
      }
      val m = out(id)
      assert((m.width, m.height) == (ow, oh), s"doc $id dims")
      assert(m.plane_hash == acc, s"doc $id plane hash")
      assert(m.n_bytes == 9 + ow.toString.length + oh.toString.length + ow * oh)
    }
    // the SAME decoder handles both magics side by side
    val mixed = Multimodal.decodePpm(
      Multimodal.encodePgm(d, "doc_id", "text")
        .union(Multimodal.encodePpm(d, "doc_id", "text")))
      .collect()
    assert(mixed.count(_.format == "pgm") == 3 && mixed.count(_.format == "ppm") == 3)
  }

  // ---- qp96: KMV distinct sketch -------------------------------------------

  test("kmv: estimates within the sketch's error envelope; exact below k") {
    val li = graft.Tables.load(spark, dir, "lineitem")
    val est = Sketches.kmvDistinct(li, "l_partkey", "l_returnflag", k = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((g, e) <- exact) {
      val rel = math.abs(est(g).toDouble - e) / e
      // KMV std error ~ 1/sqrt(k-2) ≈ 6.3%; 4 sigma leaves no flake room
      assert(rel < 0.25, s"$g: est ${est(g)} vs exact $e (rel $rel)")
    }
    // k above the true cardinality: the sketch holds everything → exact
    val all = Sketches.kmvDistinct(li, "l_partkey", "l_returnflag", k = 65536)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // hash collisions (~n²/2M) can merge a couple of values; allow 0.5%
    for ((g, e) <- exact)
      assert(math.abs(all(g).toDouble - e) / e < 0.005, s"$g: ${all(g)} vs $e")
  }

  // ---- qp97: exact-k per-source sample --------------------------------------

  test("exact-k sample: per source exactly min(k, n) rows, the k smallest priorities") {
    val out = Curation.exactKSample(docs, "doc_id", "source", k = 7)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val pri = docs.select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).view.mapValues(_.map { case (id, _) =>
        (math.floorMod(id * 1664525L + 1013904223L, 1000000007L), id)
      }.sorted.map(_._2)).toMap
    for ((src, expected) <- pri) {
      val got = out.filter(_._2 == src).sortBy(_._3)
      assert(got.length == math.min(7, expected.length), s"$src size")
      assert(got.map(_._3).toSeq == (1 to got.length), s"$src ranks not contiguous")
      assert(got.map(_._1).toSeq == expected.take(7).toSeq, s"$src wrong members")
    }
  }

  // ---- qp94: quality quantile filter --------------------------------------

  test("quality quantile: exactly floor(n*q) lowest-(score,id) rows drop per source") {
    val out = Curation.qualityQuantileFilter(docs, "doc_id", "text", "source",
      qNum = 1, qDen = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    for ((src, rows) <- out.groupBy(_._2)) {
      val n = rows.length
      val drop = n * 1 / 4
      val sorted = rows.sortBy(r => (r._3, r._1))
      assert(sorted.take(drop).forall(!_._4),
        s"$src: a bottom-$drop row was kept")
      assert(sorted.drop(drop).forall(_._4),
        s"$src: a row above the cut was dropped")
    }
    // every tokenizable document is classified
    assert(out.length == docs.filter(
      size(split(trim(col("text")), "\\s+")) > 0).count())
  }
}
