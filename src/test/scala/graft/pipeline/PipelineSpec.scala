package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline operator tests: planted near-duplicates for the hash-based
  * dedup paths (which have no DuckDB oracle), ANN recall vs brute force,
  * and the multimodal typed-decode path against its SQL mirror. */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  // lazy val (not var+beforeAll): a stable identifier is required for
  // `import spark.implicits._`
  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("pipeline-spec").master("local[4]")
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

  private def plantedDocs(): DataFrame = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
    val nearDup = base.replace("green", "dark") // 1-word edit ⇒ high jaccard
    val other = "completely different content about spark shuffles partitions codegen and catalyst optimizer rules"
    Seq(
      (0L, base), (1L, nearDup), (2L, other),
      (3L, base + " extra trailing words here"), (4L, "tiny doc"))
      .toDF("doc_id", "text")
  }

  test("minhash-LSH finds planted near-duplicates, skips unrelated docs") {
    val pairs = Dedup.nearDuplicatePairs(plantedDocs(), "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, thresholdNum = 1, thresholdDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"expected (0,1) in $pairs")
    assert(pairs.contains((0L, 3L)), s"expected (0,3) in $pairs")
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L },
      s"unrelated doc in $pairs")
  }

  test("exact n-gram Jaccard finds planted pairs and is a superset of MinHash at equal params") {
    val docs = plantedDocs()
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, thresholdNum = 1, thresholdDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((0L, 1L)) && exact.contains((0L, 3L)), s"missing planted pair in $exact")
    assert(!exact.exists { case (a, b) => a == 2L || b == 2L }, s"unrelated doc in $exact")
    // both paths verify with exact Jaccard over the same shingle stream,
    // so every MinHash-recalled pair must also be in the exact set
    val lsh = Dedup.nearDuplicatePairs(docs, "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, thresholdNum = 1, thresholdDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH pairs $lsh not within exact pairs $exact")
  }

  test("n-gram Jaccard maxPosting drops stop-shingle-only candidate pairs") {
    import spark.implicits._
    // 12 docs all sharing one stop-shingle; only 0/1 genuinely near-dup
    val stop = "common filler phrase"
    val docs = (0L until 12L).map { i =>
      val tail = if (i == 1L) "unique payload alpha beta gamma delta"
        else if (i == 0L) "unique payload alpha beta gamma epsilon"
        else s"totally distinct body $i with its own words ${i * 31}"
      (i, s"$stop $tail")
    }.toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, thresholdNum = 1, thresholdDen = 4, maxPosting = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the shared stop-shingle occurs in all 12 docs (> maxPosting) so it
    // cannot generate candidates by itself; 0/1 still pair via their
    // rare shared shingles
    assert(pairs == Set((0L, 1L)), s"expected only (0,1), got $pairs")
  }

  test("LSH candidate generation is a strict subset of all pairs (no cross join)") {
    val docs = graft.Tables.load(spark, dir, "documents")
    val n = docs.count()
    val cands = Dedup.lshCandidates(docs, "doc_id", "text").count()
    assert(cands < n * (n - 1) / 4, s"candidates $cands look like all-pairs for n=$n")
  }

  test("simhash near-dup detects the planted pair") {
    // tiny docs have ~15 shingle features, so each simhash bit is the
    // sign of a short ±1 sum — noisy; a 16-bit budget still cleanly
    // separates the planted pair from unrelated docs (expected ~32)
    val pairs = Dedup.simhashNearDuplicates(plantedDocs(), "doc_id", "text", maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) || pairs.contains((0L, 3L)),
      s"expected a planted pair in $pairs")
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("quantized-dot and cosine top-k agree on the top neighbor") {
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val q = Similarity.quantizedDotTopK(emb, nQueries = 3, k = 1)
      .select("q_id", "vec_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = Similarity.cosineTopK(emb, nQueries = 3, k = 1)
      .select("q_id", "vec_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // quantized-dot is unnormalized: only sanity-check both produce
    // results for every query
    assert(q.keySet == c.keySet && q.size == 3)
  }

  test("LSH ANN recall vs brute-force cosine") {
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val brute = Similarity.cosineTopK(emb, nQueries = 5, k = 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // random embeddings are LSH's worst case: per-table bucket-agreement
    // probability for a near-orthogonal pair is ~(1/2)^nbits, so recall
    // comes from the union over tables: 1-(1-p)^tables ≈ 0.9 here
    val lsh = Similarity.lshCosineTopK(emb, nQueries = 5, k = 3, nbits = 2, tables = 8)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall $recall too low (lsh=$lsh brute=$brute)")
  }

  test("IVF top-k recall vs brute-force cosine") {
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val brute = Similarity.cosineTopK(emb, nQueries = 5, k = 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // random embeddings cluster poorly, but probing 8 of 16 lists covers
    // half the corpus — recall should be well above the 50% floor
    val ivf = Similarity.ivfTopK(emb, nQueries = 5, k = 3, nlist = 16, nprobe = 8)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("kmeans centroids have the right shape and assign all rows") {
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val cents = Similarity.kmeansCentroids(emb, k = 4, iters = 2)
    assert(cents.length == 4)
    val dim = emb.selectExpr("size(embedding)").head().getInt(0)
    assert(cents.forall(_.length == dim))
  }

  test("multimodal typed decode path equals the SQL mirror") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, dir, "documents").limit(50)
    val typed = Multimodal.decodeStub(
      Multimodal.attachBinary(docs, "text").as[Multimodal.MediaItem])
      .toDF().orderBy("doc_id")
      .select("doc_id", "format", "n_bytes", "width", "height", "checksum")
    val viaSql = Multimodal.metaViaSql(docs, "text").orderBy("doc_id")
      .select("doc_id", "format", "n_bytes", "width", "height", "checksum")
    assert(typed.collect().toSeq == viaSql.collect().toSeq)
  }

  test("PPM decoder parses a handcrafted header (comments, multi-digit dims)") {
    val px = Array.fill(7 * 3 * 3)(42.toByte)
    val payload = "P6\n# a comment line\n 7\t3 \n# another\n255\n".getBytes("US-ASCII") ++ px
    val dec = new Multimodal.PpmDecoder
    val meta = dec.decode(Multimodal.MediaItem(1L, "ppm", payload))
    assert(meta.width == 7 && meta.height == 3)
    assert(meta.n_bytes == payload.length.toLong)
    // P5 (grayscale) is part of the supported family since round 12 —
    // one plane byte suffices for 1×1
    val gray = dec.decode(Multimodal.MediaItem(2L, "pgm",
      "P5\n1 1\n255\n ".getBytes("US-ASCII")))
    assert(gray.width == 1 && gray.height == 1)
    intercept[IllegalArgumentException] { // unsupported magic (bitmap)
      dec.decode(Multimodal.MediaItem(4L, "pbm", "P4\n1 1\n ".getBytes("US-ASCII")))
    }
    intercept[IllegalArgumentException] { // truncated pixel plane
      dec.decode(Multimodal.MediaItem(3L, "ppm", "P6\n4 4\n255\n".getBytes("US-ASCII")))
    }
  }

  test("PPM encode -> real decode roundtrip: parsed dims equal the fixture arithmetic") {
    val docs = graft.Tables.load(spark, dir, "documents").limit(50)
    val decoded = Multimodal.decodePpm(
        Multimodal.encodePpm(docs, "doc_id", "text"))
      .toDF().orderBy("doc_id")
      .select("doc_id", "width", "height", "n_bytes").collect()
    val lens = docs.selectExpr("doc_id", "octet_length(cast(text as binary)) as len")
      .orderBy("doc_id").collect()
    decoded.zip(lens).foreach { case (d, l) =>
      val len = l.getInt(1)
      val (w, h) = (8 + len % 32, 8 + (len * 3) % 32)
      assert(d.getInt(1) == w && d.getInt(2) == h)
      // header bytes + pixel plane, nothing more
      val header = s"P6\n$w $h\n255\n".length
      assert(d.getLong(3) == header + w * h * 3L)
    }
  }

  test("word-level MinHash (shingleN = 1) still runs") {
    val pairs = Dedup.nearDuplicatePairs(plantedDocs(), "doc_id", "text",
        shingleN = 1, thresholdNum = 1, thresholdDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // 1-word edit keeps word-set Jaccard high
  }

  test("pathological bucket (10^4 identical docs) is capped, planted pair survives") {
    import spark.implicits._
    // 10,000 identical docs: without the bucket cap every band bucket
    // holds all 10^4 ids and the self-join is ~10^8 rows per band. With
    // the cap the bucket is dropped (those are exact duplicates — the
    // pipeline collapses them with exact dedup first) and the planted
    // near-dup pair elsewhere is still found.
    val bomb = "spam spam spam identical text that should have been exact deduped long ago"
    val a = "the quick brown fox jumps over the lazy dog and runs far away into the green forest"
    val b = a.replace("green", "dark")
    val docs = ((0 until 10000).map(i => (i.toLong, bomb)) ++
      Seq((20000L, a), (20001L, b))).toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text", maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((20000L, 20001L)),
      s"expected only the planted pair, got ${pairs.size} pairs")
    // simhash path: same bomb, same cap behavior
    val shPairs = Dedup.simhashNearDuplicates(docs, "doc_id", "text",
        maxHamming = 16, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shPairs == Set((20000L, 20001L)),
      s"expected only the planted pair, got ${shPairs.size} simhash pairs")
  }

  test("frame-sample and resize stubs keep the per-partition plumbing honest") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, dir, "documents").limit(40)
    val media = Multimodal.attachBinary(docs, "text").as[Multimodal.MediaItem]
    // frame counts must equal the closed-form ceil(ceil(bytes/frame)/stride)
    val frames = Multimodal.frameSampleStub(media, frameBytes = 32, stride = 4)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("sampled"))
    val expected = Multimodal.attachBinary(docs, "text")
      .select(col("doc_id"),
        ceil(ceil(length(col("data")).cast("double") / 32) / 4).cast("long").as("sampled"))
    assert(frames.join(expected.withColumnsRenamed(Map("sampled" -> "exp")), "doc_id")
      .filter(col("sampled") =!= col("exp")).count() == 0)
    // resize by 2 halves the byte count (rounding up) and changes checksums
    val orig = Multimodal.decodeStub(media).toDF()
    val resized = Multimodal.resizeStub(media, factor = 2).toDF()
    val joined = orig.select(col("doc_id"), col("n_bytes").as("nb0"), col("checksum").as("c0"))
      .join(resized.select(col("doc_id"), col("n_bytes").as("nb1"), col("checksum").as("c1")), "doc_id")
    assert(joined.filter(col("nb1") =!= ceil(col("nb0").cast("double") / 2).cast("long")).count() == 0)
    assert(joined.filter(col("c0") === col("c1")).count() == 0)
  }

  test("embedding near-dup: LSH tier is a verified subset of the exact tier") {
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val maxId = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
    val exact = Dedup.embeddingNearDupPairs(emb, maxId, thresholdNum = 2, thresholdDen = 5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // nbits=1, tables=8: per-pair miss probability (1-p)^8 with p >= 0.6
    // for cos >= 0.4 — deterministic planes, so this either always holds
    // or never does. directMaxFraction > 1 forces the BUCKET path (the
    // default gate would pick the direct verify at these degenerate
    // settings — 99.6 % of pairs are candidates)
    val lsh = Dedup.embeddingNearDupPairsLsh(emb, thresholdNum = 2, thresholdDen = 5,
        nbits = 1, tables = 8, directMaxFraction = 2.0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "exact tier found no pairs — threshold too high for fixture")
    assert(lsh.subsetOf(exact), s"LSH emitted unverified pairs: ${lsh -- exact}")
    assert(lsh.nonEmpty, "LSH tier found nothing")
    // the default gate takes the direct path here — recall exactly 1
    val direct = Dedup.embeddingNearDupPairsLsh(emb, thresholdNum = 2, thresholdDen = 5,
        nbits = 1, tables = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(direct == exact)
  }

  test("LSH first-collision dedup ≡ dropDuplicates shape, capping engaged") {
    // the r10 first-collision candidate dedup (packed bucket mask +
    // survival bitmap, bitwise filter) must emit EXACTLY the pairs the
    // old candidate-sized dropDuplicates emitted — including when the
    // skew cap drops buckets, where "first collision" must mean first
    // SURVIVING collision. maxBucket = n/2 passes the expected-
    // population gate (n >> nbits == maxBucket) while any per-table
    // imbalance actually drops the larger bucket.
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
    val n = emb.count()
    val nbits = 1; val tables = 8
    val maxBucket = (n >> 1).toInt
    val dim = emb.select(size(col("embedding")).as("d")).head.getInt(0)
    val exploded = emb.select(col("vec_id"),
        posexplode(array((0 until tables).map(t =>
          Similarity.signBucket(col("embedding"), t, nbits, dim)): _*)))
      .withColumnsRenamed(Map("pos" -> "tbl", "col" -> "bucket"))
    val droppedBuckets = exploded.groupBy(col("tbl"), col("bucket"))
      .count().filter(col("count") > maxBucket).count()
    assert(droppedBuckets > 0, "fixture never trips the cap — the test is vacuous")
    val bucketed = Dedup.cappedBuckets(exploded, Seq(col("tbl"), col("bucket")), maxBucket)
    val refCands = bucketed.select(col("vec_id").as("id_a"), col("tbl"), col("bucket"))
      .join(bucketed.select(col("vec_id").as("id_b"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // apply the operator's threshold-0 verify (norms > 0, dot >= 0) to the
    // reference candidates so both sides compare post-verify
    val e = emb.select(col("vec_id"),
        graft.functions.VectorOps.quantizeMilli(col("embedding")).as("q"))
      .withColumn("n2", graft.functions.VectorOps.dot(col("q"), col("q")))
    val refPairs = refCands
      .join(e.select(col("vec_id").as("id_a"), col("q").as("qa"), col("n2").as("na")), Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("q").as("qb"), col("n2").as("nb")), Seq("id_b"))
      .withColumn("d", graft.functions.VectorOps.dot(col("qa"), col("qb")))
      .filter(col("na") > 0 && col("nb") > 0 && col("d") >= 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.embeddingNearDupPairsLsh(emb, thresholdNum = 0, thresholdDen = 1,
        nbits = nbits, tables = tables, maxBucket = maxBucket,
        directMaxFraction = 2.0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == refPairs,
      s"first-collision path diverged: missing=${refPairs -- got} extra=${got -- refPairs}")
  }

  test("connectedComponents driver union-find ≡ distributed propagation") {
    import spark.implicits._
    // chain 1-2-3-10, pair 5-6, self-loop 8: min-label components
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 8L), (10L, 3L))
      .toDF("id_a", "id_b")
    val drv = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Dedup.clearCcCache()
    val dist = Dedup.connectedComponents(pairs, driverMaxPairs = -1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Dedup.clearCcCache()
    assert(drv == Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 1L),
      (5L, 5L), (6L, 5L), (8L, 8L)))
    assert(dist == drv)
  }

  test("fingerprint is whitespace/case insensitive") {
    import spark.implicits._
    val df = Seq(Tuple1("a  B\tc"), Tuple1("A b C")).toDF("t")
      .select(TextOps.fingerprint(col("t")).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("tokenBudgetSelect is a greedy prefix of the score-desc order") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat and the dog is in a house of it now"), // high score
      (1L, "zzz qqq www rrr"),                             // score 0
      (2L, "the quick fox is in a barn"),                  // mid score
      (3L, "to be or not to be that is the question here"),
      (4L, "")) // empty → 0 tokens
      .toDF("doc_id", "text")
    val kept = Curation.tokenBudgetSelect(docs, "doc_id", "text", 25L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // kept set = longest prefix of (score desc, id) whose cumsum <= 25
    val all = Curation.tokenBudgetSelect(docs, "doc_id", "text", Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val order = all.sortBy(t => (-t._3, t._1))
    var acc = 0L
    val expect = order.takeWhile { t => acc += t._2; acc <= 25L }
      .map(_._1).toSet
    assert(kept.map(_._1).toSet == expect)
    assert(kept.forall(_._4 <= 25L))
    // budget 0 keeps only zero-token docs (cum stays 0)
    val zero = Curation.tokenBudgetSelect(docs, "doc_id", "text", 0L)
      .collect().map(_.getLong(0)).toSet
    assert(zero.forall(id => all.find(_._1 == id).get._2 == 0L))
  }

  test("hashSample keeps exactly the ids under their source's permille") {
    import spark.implicits._
    val docs = (0L until 400L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val rates = Map("src0" -> 1000, "src1" -> 0, "src2" -> 500)
    val kept = Curation.hashSample(docs, "doc_id", "source", rates, defaultPermille = 250)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def mix(id: Long): Long = ((id * 1000003L + 12345L) % 999983L) * 2654435761L % 1000L
    kept.foreach { case (id, src, m) =>
      assert(m == mix(id), s"mix mismatch for $id")
      assert(m < rates.getOrElse(src, 250), s"kept $id over rate")
    }
    // rate-1000 source keeps everything, rate-0 source keeps nothing
    assert(kept.count(_._2 == "src0") == 100)
    assert(!kept.exists(_._2 == "src1"))
    val expected = (0L until 400L).count(i =>
      mix(i) < rates.getOrElse(s"src${i % 4}", 250))
    assert(kept.length == expected)
  }

  test("lengthBatches ranks densely per bucket and fills batches in order") {
    import spark.implicits._
    val docs = (0L until 200L)
      .map(i => (i, Seq.fill((i % 37).toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Curation.lengthBatches(docs, "doc_id", "text",
      bucketWidth = 8, batchSize = 4, idSubBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // per bucket: ranks are dense 0..n-1 in id order
    got.groupBy(_._3).foreach { case (_, rowsB) =>
      val byId = rowsB.sortBy(_._1)
      byId.zipWithIndex.foreach { case ((_, _, _, bi, bp), rk) =>
        assert(bi == rk / 4 && bp == rk % 4,
          s"rank decomposition broken at $rk: ($bi, $bp)")
      }
    }
    // bucket is the token count DIV 8
    got.foreach { case (_, n, b, _, _) => assert(b == n / 8) }
  }

  test("language guess picks the language with most stopword hits") {
    import spark.implicits._
    val df = Seq(
      ("the cat and the dog is in a house of it", "en"),
      ("der hund und die katze ist nicht auf dem zu", "de"),
      ("le chien et la maison est dans les une pour", "fr"),
      ("el perro y la casa es una en los por", "es"),
      ("zzz qqq www", "und")).toDF("text", "expected")
    val got = df.select(col("expected"),
        TextOps.languageGuess(split(lower(col("text")), " ")).as("guess"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)}, got ${r.getString(1)}"))
  }
}
