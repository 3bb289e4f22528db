package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Curation-operator specs: repetition stats on hand-computable
  * fixtures, decontamination hit/miss behavior, PII redaction
  * idempotence + zero-leak, temperature-sampling rate math, and
  * sessionization boundary semantics, duplicated-span removal,
  * sequence packing, and per-domain capping. The driver entries
  * qp65–qp69 and qp75–qp77 carry the DuckDB-oracle burden; these tests
  * pin the semantics on inputs small enough to verify by hand. */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("curation-spec").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("repetitionStats counts words and bigrams exactly") {
    // "a b a b a": words {a:3, b:2}; bigrams [a b, b a, a b, b a] = {a b:2, b a:2}
    val out = Curation.repetitionStats(docs(7L -> "a b a b a"), "doc_id", "text")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_words") == 5)
    assert(r.getAs[Long]("n_distinct_words") == 2)
    assert(r.getAs[Long]("top_word_cnt") == 3)
    assert(r.getAs[Long]("n_bigrams") == 4)
    assert(r.getAs[Long]("n_distinct_bigrams") == 2)
    assert(r.getAs[Long]("top_bigram_cnt") == 2)
  }

  test("repetitionStats: fully repeated doc vs all-distinct doc") {
    val out = Curation.repetitionStats(
      docs(1L -> "x x x x", 2L -> "p q r s"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_distinct_words") == 1)
    assert(out(1L).getAs[Long]("top_bigram_cnt") == 3) // "x x" three times
    assert(out(2L).getAs[Long]("n_distinct_words") == 4)
    assert(out(2L).getAs[Long]("top_bigram_cnt") == 1)
  }

  test("contaminatedIds flags exactly the docs sharing an n-gram") {
    val corpus = docs(
      1L -> "the quick brown fox jumps over the lazy dog",   // contains bench 4-gram
      2L -> "completely unrelated words without any overlap here",
      3L -> "quick brown fox jumps somewhere else entirely")  // shares "quick brown fox jumps"
    val bench = docs(100L -> "a quick brown fox jumps test question")
    val hit = Curation.contaminatedIds(
      corpus, "doc_id", "text", bench, "doc_id", "text", ngram = 4)
      .collect().map(_.getLong(0)).toSet
    assert(hit == Set(1L, 3L))
  }

  test("redactPii removes every planted PII class and is idempotent") {
    val d = docs(1L ->
      ("mail alice.smith+x@corp.example.co phone +1-555-0142 ssn 123-45-6789 " +
        "ip 192.168.0.255 done"))
    val red = d.select(Curation.redactPii(col("text")).as("r"))
    val r = red.collect().head.getString(0)
    assert(r.contains("[EMAIL]") && r.contains("[PHONE]") &&
      r.contains("[SSN]") && r.contains("[IP]"))
    val leaks = red.select(
      (Curation.piiCount(col("r"), Curation.EmailPattern)
        + Curation.piiCount(col("r"), Curation.SsnPattern)
        + Curation.piiCount(col("r"), Curation.PhonePattern)
        + Curation.piiCount(col("r"), Curation.Ipv4Pattern)).as("n"))
      .collect().head.getAs[Number]("n").longValue()
    assert(leaks == 0L)
    val twice = red.select(Curation.redactPii(col("r")).as("r2")).collect().head.getString(0)
    assert(twice == r)
  }

  test("ssn is redacted as SSN, not eaten by the phone pattern") {
    val r = docs(1L -> "ssn 123-45-6789 end")
      .select(Curation.redactPii(col("text"))).collect().head.getString(0)
    assert(r == "ssn [SSN] end")
  }

  test("dotted-quad with 3-digit middle octets redacts as IP, not PHONE") {
    // 192.168.100.200 also matches the phone shape (digits with '.'
    // separators) — the IP pass must run first (ADVICE r5)
    val r = docs(1L -> "host 192.168.100.200 end")
      .select(Curation.redactPii(col("text"))).collect().head.getString(0)
    assert(r == "host [IP] end")
  }

  test("temperatureSample keeps all of the largest source, sqrt-rate of others") {
    import spark.implicits._
    // source A: ids 0..99 (100 docs), source B: ids 100..124 (25 docs)
    val d = ((0L until 100L).map(i => (i, "A")) ++ (100L until 125L).map(i => (i, "B")))
      .toDF("doc_id", "src")
    val out = Curation.temperatureSample(d, "doc_id", "src")
    val rates = out.groupBy("src").agg(max("sample_rate").as("r"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates("A") == 1000L) // largest source: keep everything
    assert(rates("B") == 500L)  // floor(1000*sqrt(25/100))
    // rate 1000 keeps every A row regardless of the id mix
    assert(out.filter($"src" === "A").count() == 100L)
    val keptB = out.filter($"src" === "B").count()
    assert(keptB > 0 && keptB < 25)
  }

  test("sessionize splits on gaps > gap and numbers sessions per user") {
    import spark.implicits._
    val e = Seq(
      (1L, 0L, 10L), (1L, 1000L, 11L), (1L, 5000L, 12L), // user 1: gap 4000 splits at gap=2000
      (2L, 0L, 20L)                                       // user 2: one session
    ).toDF("user_id", "ts", "event_id")
    val out = Curation.sessionize(e, "user_id", "ts", "event_id", gapNanos = 2000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(out.keySet == Set((1L, 1L), (1L, 2L), (2L, 1L)))
    assert(out((1L, 1L)).getAs[Long]("n_events") == 2)
    assert(out((1L, 1L)).getAs[Long]("span_nanos") == 1000L)
    assert(out((1L, 2L)).getAs[Long]("n_events") == 1)
    assert(out((2L, 1L)).getAs[Long]("n_events") == 1)
  }

  test("sessionize boundary: gap exactly equal to the threshold does NOT split") {
    import spark.implicits._
    val e = Seq((1L, 0L, 1L), (1L, 2000L, 2L)).toDF("user_id", "ts", "event_id")
    val out = Curation.sessionize(e, "user_id", "ts", "event_id", gapNanos = 2000L)
    assert(out.count() == 1L)
  }

  test("connectedComponents labels a path, a triangle, and a lone pair") {
    import spark.implicits._
    // path 1-2-3-4 (diameter 3 — needs >1 round), triangle 10-11-12,
    // pair 20-21; min reachable id labels each
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents on an EMPTY pair list returns an empty frame") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(none).count() == 0)
    // ...and keepCanonical then keeps EVERY doc as its own component
    val docs = Seq((1L, 5L), (2L, 9L)).toDF("doc_id", "quality")
    val out = Dedup.keepCanonicalByComponent(docs, "doc_id", none, -col("quality"))
    assert(out.count() == 2 && out.filter(col("is_canonical")).count() == 2)
  }

  test("keepCanonicalByComponent rejects colliding output column names") {
    import spark.implicits._
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val bad = Seq((1L, 7L)).toDF("doc_id", "component")
    val e = intercept[IllegalArgumentException](
      Dedup.keepCanonicalByComponent(bad, "doc_id", pairs, col("doc_id")))
    assert(e.getMessage.contains("component"))
  }

  test("keepCanonicalByComponent keeps exactly one survivor per cluster") {
    import spark.implicits._
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 1L))
      .toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    // survivor = highest quality (rank = -quality), ties by id
    val out = Dedup.keepCanonicalByComponent(docs, "doc_id", pairs, -col("quality"))
    val canon = out.filter(col("is_canonical")).collect()
      .map(r => r.getAs[Long]("component") -> r.getAs[Long]("doc_id")).toMap
    // cluster {1,2,3}: quality 9 tie between 2 and 3 → id 2; doc 7 alone
    assert(canon == Map(1L -> 2L, 7L -> 7L))
    assert(out.filter(col("is_canonical")).count() == 2)
    assert(out.count() == 4)
  }

  // ---- duplicated-span removal ----------------------------------------

  test("spanDedup drops corpus-repeated blocks and reassembles in order") {
    // block size 2, threshold 2: "x y" appears in docs 1,2,3 (3 > 2 →
    // dropped everywhere); every other block is unique and survives.
    val out = Curation.spanDedup(
      docs(1L -> "x y a b", 2L -> "x y c d", 3L -> "x y", 4L -> "p q r"),
      "doc_id", "text", blockTokens = 2, maxOccurrences = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("n_dup_blocks"),
          r.getAs[String]("clean_text"))).toMap
    assert(out(1L) == ((2L, 1L, "a b")))
    assert(out(2L) == ((2L, 1L, "c d")))
    assert(out(3L) == ((1L, 1L, null)))      // everything dropped → NULL
    assert(out(4L) == ((2L, 0L, "p q r")))   // trailing partial block kept
  }

  test("spanDedup keeps NULL-text docs as empty-text rows (one row per doc)") {
    val out = Curation.spanDedup(
      docs(1L -> "a b c d", 2L -> null.asInstanceOf[String], 3L -> "p q"),
      "doc_id", "text", blockTokens = 2, maxOccurrences = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_blocks"), r.getAs[String]("clean_text"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))   // NULL doc not silently dropped
    assert(out(2L) == ((1L, "")))           // one empty block, kept verbatim
  }

  test("spanDedup below threshold keeps text verbatim") {
    val out = Curation.spanDedup(
      docs(1L -> "x y a b", 2L -> "x y c d"),
      "doc_id", "text", blockTokens = 2, maxOccurrences = 2)
      .collect().map(r => r.getAs[String]("clean_text")).toSeq
    assert(out == Seq("x y a b", "x y c d"))
  }

  // ---- training-sequence packing --------------------------------------

  test("packSequences: contiguous offsets within a shard, exact boundary math") {
    val fixture = docs((0L until 40L).map(i => i -> ("tok " * 7).trim): _*)
    val out = Curation.packSequences(fixture, "doc_id", "text",
      capacity = 10, shards = 2).collect()
    assert(out.length == 40)
    out.foreach { r =>
      val (off, n) = (r.getAs[Long]("seq_offset"), r.getAs[Long]("n_tokens"))
      assert(n == 7 && off >= 0 && off < 10)
      // 7-token doc starting at offset off crosses iff off + 7 > 10
      assert(r.getAs[Int]("crosses_boundary") == (if (off + n > 10) 1 else 0))
    }
    // per shard: doc k (0-based in id order) starts at cumulative 7k
    out.groupBy(_.getAs[Long]("shard")).values.foreach { rs =>
      rs.sortBy(_.getAs[Long]("doc_id")).zipWithIndex.foreach { case (r, k) =>
        assert(r.getAs[Long]("seq_index") == 7L * k / 10)
        assert(r.getAs[Long]("seq_offset") == 7L * k % 10)
      }
    }
  }

  test("packSequences: zero-token docs inherit the running offset, never straddle") {
    // ids 0, 8, 16 all land in shard 0 (the Knuth mix is id-mod-8
    // preserving for multiples of 8). Doc 8 is empty: it starts exactly
    // where doc 0 ended, adds nothing to the running total, and its
    // crosses_boundary stays 0 even though it sits mid-sequence.
    val fixture = docs(0L -> ("tok " * 9).trim, 8L -> "", 16L -> ("tok " * 5).trim)
    val out = Curation.packSequences(fixture, "doc_id", "text",
      capacity = 10, shards = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("seq_index"),
          r.getAs[Long]("seq_offset"), r.getAs[Int]("crosses_boundary"))).toMap
    assert(out(0L) == ((9L, 0L, 0L, 0)))
    assert(out(8L) == ((0L, 0L, 9L, 0)))   // empty doc: no straddle
    assert(out(16L) == ((5L, 0L, 9L, 1)))  // 9+5 > 10 → crosses
  }

  test("packSequences: leading empty doc starts at offset 0 without straddle") {
    val out = Curation.packSequences(docs(0L -> "", 8L -> "a b c"),
      "doc_id", "text", capacity = 10, shards = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("seq_offset"), r.getAs[Int]("crosses_boundary"))).toMap
    assert(out(0L) == ((0L, 0)))
    assert(out(8L) == ((0L, 0)))
  }

  // ---- per-source document cap ----------------------------------------

  test("chunkSlidingWindows: exact boundaries, overlap, and short tail") {
    // doc 1: 10 tokens, window 8, stride 4 → chunks [0,8) and [4,10):
    // last index = ceil((10-8)/4) = 1; tail chunk is 6 long
    val out = Curation.chunkSlidingWindows(
      docs(1L -> ("x " * 10).trim), "doc_id", "text",
      window = 8, stride = 4).collect()
    assert(out.map(r => (r.getAs[Long]("chunk_id"),
      r.getAs[Long]("tok_start"), r.getAs[Long]("tok_len"))).toSeq ==
      Seq((0L, 0L, 8L), (1L, 4L, 6L)))
  }

  test("chunkSlidingWindows: every token is covered; empty docs vanish") {
    // doc of n tokens: union of [start, start+len) must be [0, n); an
    // empty doc contributes no chunks at all
    val out = Curation.chunkSlidingWindows(
      docs(1L -> ("t " * 25).trim, 2L -> "", 3L -> ("y " * 8).trim),
      "doc_id", "text", window = 8, stride = 5).collect()
    assert(!out.exists(_.getAs[Long]("doc_id") == 2L))
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    for ((id, n) <- Seq(1L -> 25, 3L -> 8)) {
      val covered = byDoc(id).flatMap { r =>
        val s = r.getAs[Long]("tok_start"); val l = r.getAs[Long]("tok_len")
        s until (s + l)
      }.toSet
      assert(covered == (0 until n).map(_.toLong).toSet)
      // no chunk exceeds the window, and only the LAST chunk may be short
      val lens = byDoc(id).sortBy(_.getAs[Long]("chunk_id"))
        .map(_.getAs[Long]("tok_len"))
      assert(lens.forall(_ <= 8))
      assert(lens.dropRight(1).forall(_ == 8))
    }
  }

  test("vocabTopK ranks by count then token, exactly") {
    // counts: a=3 b=3 c=2 d=1 — ties (a,b) break by token text
    val out = Curation.vocabTopK(
      docs(1L -> "a b c", 2L -> "a b c", 3L -> "a b d"),
      "text", k = 3).collect()
    assert(out.map(r => (r.getAs[Long]("rank"), r.getAs[String]("token"),
      r.getAs[Long]("cnt"))).toSeq ==
      Seq((1L, "a", 3L), (2L, "b", 3L), (3L, "c", 2L)))
  }

  test("vocabTopK case-folds and is unaffected by the salt count") {
    val d = docs(1L -> "The THE the word Word", 2L -> "word apple")
    val r1 = Curation.vocabTopK(d, "text", k = 4, salts = 2).collect()
    val r64 = Curation.vocabTopK(d, "text", k = 4, salts = 64).collect()
    assert(r1.toSeq == r64.toSeq)
    assert(r1.map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt"))).toSeq ==
      Seq("the" -> 3L, "word" -> 3L, "apple" -> 1L))
  }

  test("assignSplit is a stable pure function with permille-exact regions") {
    import spark.implicits._
    val fixture = (0L until 2000L).map(i => (i, "x")).toDF("doc_id", "text")
    val out = Curation.assignSplit(fixture, "doc_id",
      valPermille = 50, testPermille = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 2000)
    // region membership is exactly the mix arithmetic
    out.foreach { case (id, split) =>
      val m = ((id % 1000003L) * 2654435761L) % 1000L
      val want = if (m < 10) "test" else if (m < 60) "val" else "train"
      assert(split == want, s"id $id mix $m")
    }
    // growing the corpus never reassigns an existing document
    val grown = Curation.assignSplit(
      (0L until 4000L).map(i => (i, "x")).toDF("doc_id", "text"),
      "doc_id", valPermille = 50, testPermille = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, s0) => assert(grown(id) == s0) }
  }

  test("shufflePositions is the exact global mix rank, bucketed or not") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val fixture = (0L until 500L).map(i => (i, "x")).toDF("doc_id", "text")
    val got = Curation.shufflePositions(fixture, "doc_id", buckets = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mix = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
      lit(1000000007L))
    val want = fixture
      .withColumn("p", row_number().over(Window.orderBy(mix, col("doc_id"))) - 1)
      .select("doc_id", "p")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got == want)
    // positions are a permutation of 0..n-1
    assert(got.values.toSeq.sorted == (0L until 500L))
  }

  test("domainCap pre-thin bounds the rank window input for a hot source") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // one hot source at 40× the cap; the lossless phase-1 thin must
    // bound what reaches the exact per-source rank at salts·cap
    val fixture = (0L until 220L).map(i => (i, if (i < 200) "hot" else "cold"))
      .toDF("doc_id", "source")
    val thinned = Curation.domainCapPreThin(fixture, "doc_id", "source",
      cap = 5, preThinSalts = 4).collect().groupBy(_.getAs[String]("source"))
    assert(thinned("hot").length <= 4 * 5)   // 200 rows → at most 20 survive
    assert(thinned("cold").length == 20)     // under cap per bucket → all kept
    // …and the two-phase result is identical to the single-window rank
    val got = Curation.domainCap(fixture, "doc_id", "source", cap = 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mix = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
      lit(1000000007L))
    val w = Window.partitionBy(col("source")).orderBy(mix, col("doc_id"))
    val want = fixture.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).select("doc_id", "source").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == want)
  }

  test("domainCap keeps at most cap docs per source, deterministically") {
    import spark.implicits._
    val fixture = (0L until 50L).map(i => (i, if (i < 40) "big" else "small"))
      .toDF("doc_id", "source")
    val a = Curation.domainCap(fixture, "doc_id", "source", cap = 10)
    val bySource = a.collect().groupBy(_.getAs[String]("source"))
    assert(bySource("big").length == 10)     // capped
    assert(bySource("small").length == 10)   // under cap → all kept
    val b = Curation.domainCap(fixture, "doc_id", "source", cap = 10)
    assert(a.collect().toSeq == b.collect().toSeq)  // reproducible pick
  }

  test("trainingManifest dedupes, caps per source, and assigns every split") {
    import spark.implicits._
    // 30 docs in one hot source (ids 0-29, two exact-duplicate pairs)
    // plus 5 in a cold one; cap=10
    val docs = ((0L until 30L).map(i =>
        (i, if (i == 7) "dup text here" else if (i == 9) "dup text here"
            else s"text $i", "hot")) ++
      (30L until 35L).map(i => (i, s"cold $i", "cold")))
      .toDF("doc_id", "text", "source")
    val got = Curation.trainingManifest(docs, "doc_id", "text", "source", cap = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // the exact duplicate (id 9 duplicates id 7) never survives
    assert(!got.exists(_._1 == 9L))
    // cap respected per source; cold side keeps all 5
    val bySource = got.groupBy(_._2)
    assert(bySource("hot").length == 10)
    assert(bySource("cold").length == 5)
    // split values legal, and consistent with assignSplit on the same ids
    val split = Curation.assignSplit(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.forall { case (id, _, s) => split(id) == s })
    // deterministic
    val again = Curation.trainingManifest(docs, "doc_id", "text", "source", cap = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("lexicalFamiliarity: hand-computed counts, rare flags, empty doc") {
    import spark.implicits._
    // corpus counts: aa=3, bb=2, cc=1  → with rareMax=2, bb and cc are rare
    val docs = Seq(
      (1L, "aa aa bb"),    // tokens 3, mass 3+3+2=8, rare 1 (the bb)
      (2L, "aa bb cc"),    // tokens 3, mass 3+2+1=6, rare 2 (bb, cc)
      (3L, ""),            // no tokens at all → zero row survives
      (4L, "  "))          // whitespace only → zero row too
      .toDF("doc_id", "text")
    val got = Curation.lexicalFamiliarity(docs, "doc_id", "text", rareMax = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 3L, 8L, 1L), (2L, 3L, 6L, 2L),
      (3L, 0L, 0L, 0L), (4L, 0L, 0L, 0L)))
  }

  test("gopherVerdict names the FIRST failing rule; every branch fires") {
    import spark.implicits._
    val docs = Seq(
      (1L, "these a with from it is small words here today"), // mean 37, ok
      (2L, "one two"),                                  // too_few_words
      (3L, Seq.fill(70)("the").mkString(" ")),          // too_many_words
      (4L, "a a a a a a a a a a"),                      // mean 10 → short_words
      (5L, "the a gargantuan sesquipedalian communications interminable"), // long
      (6L, "cats dogs bird fish goat frog deer mole"))  // mean 40, low_stop
      .toDF("doc_id", "text")
    val got = Curation.gopherVerdict(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("reason")).toMap
    assert(got == Map(1L -> "ok", 2L -> "too_few_words",
      3L -> "too_many_words", 4L -> "short_words", 5L -> "long_words",
      6L -> "low_stopwords"))
    // keep column mirrors reason
    val keeps = Curation.gopherVerdict(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(keeps == Map(1L -> true, 2L -> false, 3L -> false,
      4L -> false, 5L -> false, 6L -> false))
  }

  test("contaminationMatrix counts distinct shared n-grams per source pair") {
    import spark.implicits._
    val d = Seq(
      (1L, "a", "one two three four five six"),
      (2L, "b", "one two three four five seven"),
      (3L, "b", "one two three four five six"), // dup passage, same pair
      (4L, "c", "totally different words here now then"))
      .toDF("doc_id", "source", "text")
    val got = Curation.contaminationMatrix(d, "doc_id", "source", "text", ngram = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // a's 5-grams: {one..five, two..six}; b's: {one..five, two..seven,
    // two..six}; c shares nothing. DISTINCT grams per source, so doc 3's
    // repeat of doc 1's passage adds set-wise, not count-wise
    assert(got == Seq(("a", "b", 2L)))
  }
}
