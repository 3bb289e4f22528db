package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 pins:
  *  - the overflow-safe tie-split cutoff (ADVICE r13 #1): the old
  *    `tieHash·tie < needDrop·M` comparison overflowed Long once the
  *    boundary tie class passed ~9.2e9 rows — exactly the skewed regime
  *    the approx tier is gated in for. The cutoff form must match the
  *    un-overflowed semantics bit-for-bit at small values AND survive
  *    the overflow regime.
  *  - the exact-threshold quantile tier (VERDICT r13 #6): same pass-2/3
  *    machinery as the approx tier, pass 1 exact — must agree with the
  *    exact rank tier everywhere except the hash-vs-order tie split.
  *  - per-micro-batch working-set release in the replay runner
  *    (ADVICE r13 #3).
  */
class Round14PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("round14-pipeline-spec").master("local[4]")
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

  // ---- overflow-safe tie cutoff -------------------------------------------

  private def cutoffOf(pairs: Seq[(Long, Long)]): Seq[Long] = {
    import spark.implicits._
    pairs.toDF("needDrop", "tie")
      .select(Curation.tieCutoff(col("needDrop"), col("tie")).as("cut"))
      .collect().map(_.getLong(0)).toSeq
  }

  test("tie cutoff: matches BigInt reference across the small grid") {
    val M = BigInt(1000000007L)
    val grid = for {
      tie <- Seq(1L, 2L, 3L, 7L, 100L, 999L)
      needDrop <- Seq(0L, 1L, tie / 2, tie - 1, tie).distinct if needDrop <= tie
    } yield (needDrop, tie)
    val got = cutoffOf(grid)
    grid.zip(got).foreach { case ((nd, tie), cut) =>
      val expect =
        if (nd <= 0) -1L else ((BigInt(nd) * M - 1) / BigInt(tie)).toLong
      assert(cut == expect, s"cutoff($nd, $tie) = $cut, want $expect")
      // semantics: drop iff hash <= cut  ⇔  hash·tie < nd·M (the
      // pre-fix comparison, evaluated here in BigInt so it cannot
      // overflow) — checked at the boundary hashes
      Seq(cut, cut + 1).filter(h => h >= 0 && h < 1000000007L).foreach { h =>
        val oldDrop = BigInt(h) * tie < BigInt(nd) * M
        assert((h <= cut) == oldDrop,
          s"boundary mismatch at hash $h for ($nd, $tie)")
      }
    }
  }

  test("tie cutoff: survives the >9.2e9-row tie-class regime (ADVICE r13 #1)") {
    val M = BigInt(1000000007L)
    // tie classes far beyond Long-overflow of hash·tie; the old form
    // threw under ANSI (or wrapped with ANSI off)
    val grid = Seq(
      (5000000000L, 10000000000L),   // needDrop·M ≈ 5e18·… exceeds via hash·tie
      (9999999999L, 10000000000L),
      (1L, 10000000000L),
      (9223372036854L, 9223372036854L), // needDrop·M ≈ 9.2e21 — DECIMAL territory
      (4611686018427L, 9223372036854L))
    val got = cutoffOf(grid)
    grid.zip(got).foreach { case ((nd, tie), cut) =>
      val expect = ((BigInt(nd) * M - 1) / BigInt(tie)).toLong
      assert(cut == expect, s"cutoff($nd, $tie) = $cut, want $expect")
    }
  }

  test("quantile approx tier: unchanged by the cutoff rewrite (fixture)") {
    // regression pin: the rewrite must be a pure representation change —
    // same kept set as the pre-fix comparison computed in BigInt
    val out = Curation.qualityQuantileFilterApprox(docs, "doc_id", "text",
      "source", qNum = 1, qDen = 4).collect()
    assert(out.nonEmpty)
    // recompute each row's verdict from its source's stats in BigInt
    val scored = out.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = scored.groupBy(_._2)
    // thresholds must match percentile_approx; read them back from the op's
    // own intermediate by reconstructing: the tie split only applies at
    // score == thr, so infer thr per source as the min score with any
    // dropped-above pattern — instead just pin determinism + kept-count
    // plausibility per source here (full equivalence is the BigInt grid
    // test above)
    bySource.foreach { case (src, rows) =>
      val ids = rows.map(_._1).toSet
      val kept = out.filter(r => ids.contains(r.getLong(0)))
        .count(_.getBoolean(3))
      val n = rows.size
      // kept must be within the tie-band tolerance of 3n/4
      assert(math.abs(kept - 3.0 * n / 4) <= math.max(8.0, 0.15 * n),
        s"source $src kept $kept of $n — far from 1−q")
    }
  }

  // ---- exact-threshold tier ------------------------------------------------

  test("quantile exact-threshold tier: agrees with rank tier off the boundary") {
    val exact = Curation.qualityQuantileFilter(docs, "doc_id", "text",
      "source", qNum = 1, qDen = 4).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    val viaThr = Curation.qualityQuantileFilterExactThreshold(docs, "doc_id",
      "text", "source", qNum = 1, qDen = 4).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(exact.keySet == viaThr.keySet)
    // the exact threshold is the score at rank ⌊n·q⌋, so rank rule and
    // threshold+tie-split agree everywhere EXCEPT inside that score's
    // tie class (order-split vs hash-split members differ)
    val boundary = exact.toSeq.groupBy(_._2._1).map { case (src, rows) =>
      val sorted = rows.map { case (_, (_, score, _)) => score }.sorted
      val b = math.max(sorted.size / 4 - 1, 0)
      src -> sorted(b)
    }
    exact.keys.foreach { id =>
      val (src, score, keptExact) = exact(id)
      val keptThr = viaThr(id)._3
      if (score != boundary(src))
        assert(keptExact == keptThr,
          s"doc $id (score $score ≠ boundary ${boundary(src)}) disagrees")
    }
    // per-source kept counts: hash split lands within binomial noise of
    // the rank split's exact count
    exact.toSeq.groupBy(_._2._1).foreach { case (src, rows) =>
      val ke = rows.count(_._2._3)
      val kt = rows.count { case (id, _) => viaThr(id)._3 }
      assert(math.abs(ke - kt) <= math.max(8, rows.size / 8),
        s"source $src: rank tier kept $ke, threshold tier kept $kt")
    }
  }

  test("quantile auto gate: exact AT the boundary, approx one row past it") {
    import spark.implicits._
    // biggest source holds exactly 40 rows
    val df = ((1L to 40L).map(i => (i, s"text number $i with words", "big")) ++
      (41L to 50L).map(i => (i, s"other text $i", "small")))
      .toDF("doc_id", "text", "source")
    // gate fires strictly ABOVE approxOverRows: == stays exact
    val atBoundary = Curation.qualityQuantileAuto(df, "doc_id", "text",
      "source", qNum = 1, qDen = 4, approxOverRows = 40L)
      .queryExecution.executedPlan.toString
    assert(atBoundary.contains("Window"),
      "gate left the exact tier although max source == approxOverRows")
    val pastBoundary = Curation.qualityQuantileAuto(df, "doc_id", "text",
      "source", qNum = 1, qDen = 4, approxOverRows = 39L)
      .queryExecution.executedPlan.toString
    assert(!pastBoundary.contains("Window"),
      "gate kept the exact tier although max source > approxOverRows")
  }

  // ---- KMV build as a bounded-buffer aggregate ----------------------------

  private def refSketch(values: Seq[Long], k: Int): Seq[Long] = {
    val M = 1000000007L
    values.map(v => (((v % M) * 1103515245L + 12345L) % M + M) % M)
      .distinct.sorted.take(k)
  }

  test("kmv aggregate: planted skewed group equals the k-smallest reference") {
    import spark.implicits._
    // one group holds 50k distinct values spread over many partitions —
    // the regime where the old per-group window funneled through one
    // task; plus small groups exercising the exact (<k) path and a
    // duplicate-heavy group exercising buffer distinctness
    val big = (1L to 50000L).map(v => ("big", v))
    val small = (1L to 5L).map(v => ("small", v))
    val dup = Seq.fill(2000)(7L).zipWithIndex.map { case (v, i) => ("dup", v + (i % 3)) }
    val df = spark.sparkContext.parallelize(big ++ small ++ dup, 16)
      .toDF("event_type", "user_id")
    val k = 64
    val got = Sketches.kmvSketch(df, "user_id", "event_type", k).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("big") == refSketch(big.map(_._2), k))
    assert(got("small") == refSketch(small.map(_._2), k))
    assert(got("dup") == refSketch(dup.map(_._2), k))
    // estimate off the skewed group lands within KMV error (~1/sqrt(k))
    val est = Sketches.kmvEstimate(
      Sketches.kmvSketch(df, "user_id", "event_type", k), k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(est("big") - 50000L) < 50000 * 0.5,
      s"KMV estimate ${est("big")} too far from 50000")
    assert(est("small") == 5L && est("dup") == 3L, "exact small-group path broken")
  }

  test("kmv aggregate: plan is partial+final ObjectHashAggregate, no window") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("event_type", "user_id")
    val plan = Sketches.kmvSketch(df, "user_id", "event_type", 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"kmv build still routes through a per-group window:\n$plan")
    val objHash = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(objHash >= 2,
      s"expected partial+final ObjectHashAggregate stages, got $objHash:\n$plan")
    assert(plan.contains("partial_kmv_sketch") || plan.contains("partial kmv_sketch")
      || plan.toLowerCase.contains("partial"),
      s"no partial (map-side) aggregation stage in plan:\n$plan")
  }

  test("kmv aggregate: all-NULL group vanishes (windowed-impl semantics)") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", None), ("nul", None))
      .toDF("event_type", "user_id")
    val got = Sketches.kmvSketch(df, "user_id", "event_type", 8).collect()
    assert(got.map(_.getString(0)).toSet == Set("a"),
      "a group with only NULL values must not appear")
  }

  // ---- bucketed-table index deployment ------------------------------------

  test("disk index: loaded verdicts equal the one-shot operator") {
    val corpus = docs.filter(col("doc_id") % 4 =!= 0)
    val batch = docs.filter(col("doc_id") % 4 === 0)
    val built = Dedup.buildCorpusShingleIndex(corpus, "doc_id", "text",
      shingleN = 3, thresholdNum = 2, thresholdDen = 5)
    Dedup.writeIndexTables(built, "graft_idx_spec", buckets = 4)
    built.release(blocking = true)
    val loaded = Dedup.loadCorpusShingleIndex(spark, "graft_idx_spec")
    assert(loaded.shingleN == 3 && loaded.thresholdNum == 2 &&
      loaded.thresholdDen == 5 && loaded.maxPosting == 4096 &&
      loaded.droppedPostings == 0L, "meta table lost build parameters")
    val viaDisk = Dedup.incrementalNearDupIndexed(loaded, batch, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val oneShot = Dedup.incrementalNearDup(corpus, batch, "doc_id", "text",
        shingleN = 3, thresholdNum = 2, thresholdDen = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaDisk == oneShot)
    graft.queries.Engines.releaseAll(blocking = true)
  }

  test("disk index: verdict plan reads warehouse buckets, never the corpus") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val corpus = docs.filter(col("doc_id") % 4 =!= 0)
    val batch = docs.filter(col("doc_id") % 4 === 0)
    val built = Dedup.buildCorpusShingleIndex(corpus, "doc_id", "text",
      shingleN = 3, thresholdNum = 2, thresholdDen = 5)
    Dedup.writeIndexTables(built, "graft_idx_spec", buckets = 4)
    built.release(blocking = true)
    val loaded = Dedup.loadCorpusShingleIndex(spark, "graft_idx_spec")
    val verdicts = Dedup.incrementalNearDupIndexed(loaded, batch, "doc_id", "text")
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case other => other +: other.children.flatMap(nodes)
    }
    val all = nodes(verdicts.queryExecution.executedPlan)
    // the corpus side is fully disk-resident: the only cache scans left
    // are the BATCH working set (ranked/fingerprint frames batchInput
    // persists by design) — none may carry the corpus filter
    all.collect { case c: InMemoryTableScanExec => c }.foreach(c =>
      assert(!c.toString.contains("NOT ((doc_id"),
        s"loaded-index plan reads a corpus-side session cache: $c"))
    val fileScans = all.collect { case f: FileSourceScanExec => f }
    val (warehouse, parquet) = fileScans.partition(
      _.relation.location.rootPaths.exists(_.toString.contains("graft_idx_spec")))
    // corpus side comes exclusively from the index tables: no live
    // documents scan may carry the corpus filter, and a corpus
    // re-shingle would need exactly that
    parquet.foreach(f => assert(!f.toString.contains("NOT ((doc_id"),
      s"verdict plan re-scans the corpus: $f"))
    assert(warehouse.size >= 3,
      s"expected >=3 index-table scans, got ${warehouse.size}")
    // the join-key bucketing survived the round trip — consumers can
    // co-locate without re-shuffling the corpus-shaped side
    assert(warehouse.exists(_.relation.bucketSpec.exists(
        _.bucketColumnNames == Seq("h"))),
      "postings/dfreq table lost its h-bucketing")
    assert(warehouse.exists(_.relation.bucketSpec.exists(
        _.bucketColumnNames == Seq("id"))),
      "arrays table lost its id-bucketing")
    graft.queries.Engines.releaseAll(blocking = true)
  }

  test("disk index: rebuild re-tightens caps that appends only bound per batch") {
    import spark.implicits._
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    val corpus = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val idx = Dedup.buildCorpusShingleIndex(corpus, "doc_id", "text",
      shingleN = 3, thresholdNum = 2, thresholdDen = 5, maxPosting = 2)
    // at cap, nothing dropped yet
    assert(idx.droppedPostings == 0L)
    val grown = Dedup.appendToCorpusShingleIndex(idx,
      Seq((3L, text), (4L, text)).toDF("doc_id", "text"), "doc_id", "text")
    // the append capped ITS OWN buckets (2 <= 2) — but the combined
    // bucket is 4 > cap, the documented un-audited growth
    assert(grown.droppedPostings == 0L)
    val overCap = Dedup.overCapBuckets(grown.prefix,
      Seq(col("h")), 2).count()
    assert(overCap > 0, "planted combined over-cap bucket missing")
    // rebuild over the compacted corpus: caps re-enforced, drop audited
    val rebuilt = Dedup.buildCorpusShingleIndex(
      corpus.unionAll(Seq((3L, text), (4L, text)).toDF("doc_id", "text")),
      "doc_id", "text", shingleN = 3, thresholdNum = 2, thresholdDen = 5,
      maxPosting = 2)
    assert(rebuilt.droppedPostings > 0L,
      "rebuild did not audit the re-tightened caps")
    // cap semantics drop WHOLE over-cap buckets; with four identical
    // docs every bucket is over cap, so the rebuilt prefix may be empty
    val maxRow = rebuilt.prefix.groupBy(col("h")).count()
      .agg(max(col("count"))).head()
    val maxBucket = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    assert(maxBucket <= 2L, s"rebuild left a bucket of $maxBucket > cap 2")
    // the roundtrip preserves the audit trail
    Dedup.writeIndexTables(rebuilt, "graft_idx_retight", buckets = 2)
    rebuilt.release(blocking = true)
    assert(Dedup.loadCorpusShingleIndex(spark, "graft_idx_retight")
      .droppedPostings == rebuilt.droppedPostings)
    graft.queries.Engines.releaseAll(blocking = true)
  }

  // ---- append-chain depth (VERDICT r13 #5) --------------------------------

  test("index append chain: 5 appends keep verdict parity with fresh builds") {
    val corpus0 = docs.filter(col("doc_id") % 11 >= 5)
    def slice(k: Int): DataFrame = docs.filter(col("doc_id") % 11 === k)
    var idx = Dedup.buildCorpusShingleIndex(corpus0, "doc_id", "text",
      shingleN = 3, thresholdNum = 2, thresholdDen = 5)
    var corpus = corpus0
    val costs = (0 until 5).map { k =>
      val t0 = System.nanoTime()
      idx = Dedup.appendToCorpusShingleIndex(idx, slice(k), "doc_id", "text")
      val dt = (System.nanoTime() - t0) / 1e9
      corpus = corpus.unionAll(slice(k))
      // probe: classify the NEXT slice against the chained index vs a
      // fresh build over the accumulated corpus
      val probe = slice(k + 1)
      val chained = Dedup.incrementalNearDupIndexed(idx, probe, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val freshIdx = Dedup.buildCorpusShingleIndex(corpus, "doc_id", "text",
        shingleN = 3, thresholdNum = 2, thresholdDen = 5)
      val fresh = Dedup.incrementalNearDupIndexed(freshIdx, probe, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      freshIdx.release(blocking = true)
      assert(chained == fresh, s"verdicts diverged at append depth ${k + 1}")
      dt
    }
    info(f"per-append seconds over 5-deep chain: ${costs.map(c => f"$c%.2f").mkString(", ")}")
    // the chain must not super-linearly degrade: the last append stays
    // within an order of magnitude of the first (each is O(|batch|) work
    // plus one more lazy union layer)
    assert(costs.last < costs.head * 10 + 1.0,
      s"append cost exploded along the chain: $costs")
    graft.queries.Engines.releaseAll(blocking = true)
  }

  // ---- codecs on non-ASCII text (VERDICT r13 #7) --------------------------

  test("codecs: non-ASCII doc matches the byte-level simulation (PGM + BMP)") {
    import spark.implicits._
    // multi-byte UTF-8 everywhere: the fixture plane is defined over
    // BYTES, so characters≠bytes must not move a single pixel. The
    // oracles were rewritten to index hex(blob) for the same reason —
    // this spec is the engine half of that contract.
    val text = "héllo wörld ünïcode ありがとう 测试 éàü"
    val raw = text.getBytes("UTF-8")
    assert(raw.length > text.length, "fixture must actually be non-ASCII")
    val df = Seq((3L, text)).toDF("doc_id", "text")
    val M = 1000000007L
    def fold(bytes: Iterator[Int]): Long =
      bytes.foldLeft(0L)((a, b) => (a * 131L + b) % M)

    // PGM: h = 8 + 5·len % 32, single channel, 2/3 resample
    val (w1, h1) = (8 + raw.length % 32, 8 + (raw.length * 5) % 32)
    val (ow1, oh1) = (math.max(w1 * 2 / 3, 1), math.max(h1 * 2 / 3, 1))
    val pgm = Multimodal.ppmPlaneMeta(Multimodal.resizePpm(
      Multimodal.encodePgm(df, "doc_id", "text"), 2, 3)).collect()(0)
    val pgmExpect = fold((0 until ow1 * oh1).iterator.map { i =>
      val idx = ((i / ow1) * h1 / oh1) * w1 + (i % ow1) * w1 / ow1
      raw(idx % raw.length) & 0xFF
    })
    assert(pgm.width == ow1 && pgm.height == oh1 && pgm.plane_hash == pgmExpect,
      s"PGM non-ASCII mismatch: got (${pgm.width},${pgm.height},${pgm.plane_hash})" +
        s" want ($ow1,$oh1,$pgmExpect)")

    // BMP: h = 8 + 7·len % 32, three channels, bottom-up+padded storage
    val (w2, h2) = (8 + raw.length % 32, 8 + (raw.length * 7) % 32)
    val (ow2, oh2) = (math.max(w2 * 2 / 3, 1), math.max(h2 * 2 / 3, 1))
    val bmp = Multimodal.bmpPlaneMeta(Multimodal.resizeBmp(
      Multimodal.encodeBmp(df, "doc_id", "text"), 2, 3)).collect()(0)
    val bmpExpect = fold((0 until ow2 * oh2 * 3).iterator.map { i =>
      val p = i / 3
      val idx = (((p / ow2) * h2 / oh2) * w2 + (p % ow2) * w2 / ow2) * 3 + i % 3
      raw(idx % raw.length) & 0xFF
    })
    assert(bmp.width == ow2 && bmp.height == oh2 && bmp.plane_hash == bmpExpect,
      s"BMP non-ASCII mismatch: got (${bmp.width},${bmp.height},${bmp.plane_hash})" +
        s" want ($ow2,$oh2,$bmpExpect)")

    // TGA: h = 8 + 11·len % 32, RLE roundtrip on multi-byte input
    val (w3, h3) = (8 + raw.length % 32, 8 + (raw.length * 11) % 32)
    val tga = Multimodal.tgaPlaneMeta(
      Multimodal.encodeTga(df, "doc_id", "text")).collect()(0)
    val tgaExpect = (0 until w3 * h3 * 3).foldLeft(0L)((a, i) =>
      (a * 131L + (raw(i % raw.length) & 0xFF)) % 1000000007L)
    assert(tga.width == w3 && tga.height == h3 && tga.plane_hash == tgaExpect,
      s"TGA non-ASCII mismatch: got (${tga.width},${tga.height},${tga.plane_hash})" +
        s" want ($w3,$h3,$tgaExpect)")
  }

  // ---- TGA RLE codec (first compressed container) --------------------------

  private def planeHash(bytes: IndexedSeq[Int]): Long =
    bytes.foldLeft(0L)((a, b) => (a * 131L + b) % 1000000007L)

  test("tga codec: roundtrip facts — header, real compression, exact size") {
    import spark.implicits._
    // heavy repetition → the encoder must actually compress
    val text = "aaaaaaaaaaaaaaaaaaaaaaaa bbbb " * 3
    val raw = text.getBytes("UTF-8")
    val df = Seq((11L, text)).toDF("doc_id", "text")
    val enc = Multimodal.encodeTga(df, "doc_id", "text")
    val payload = enc.collect()(0).data
    val (w, h) = (8 + raw.length % 32, 8 + (raw.length * 11) % 32)
    // container facts: type 10, 24 bpp, little-endian 16-bit geometry,
    // bottom-up descriptor
    assert(payload(2) == 10.toByte && payload(16) == 24.toByte)
    assert(((payload(12) & 0xFF) | ((payload(13) & 0xFF) << 8)) == w)
    assert(((payload(14) & 0xFF) | ((payload(15) & 0xFF) << 8)) == h)
    assert((payload(17) & 0x20) == 0)
    // compression is REAL: far smaller than the uncompressed plane
    assert(payload.length < 18 + w * h * 3 / 2,
      s"RLE did not compress: ${payload.length} vs plane ${w * h * 3}")
    // decode: dims + plane hash equal the byte-level simulation
    val meta = Multimodal.tgaPlaneMeta(enc).collect()(0)
    val expect = planeHash(IndexedSeq.tabulate(w * h * 3)(i =>
      raw(i % raw.length) & 0xFF))
    assert(meta.width == w && meta.height == h && meta.plane_hash == expect)
    assert(meta.n_bytes == payload.length.toLong)
    // exact size vs an independent packet accounting (runs >=2 → 4
    // bytes; maximal singleton stretches → 1 + 3m; per logical row —
    // row order cancels)
    def px(i: Int): (Byte, Byte, Byte) =
      (raw(3 * i % raw.length), raw((3 * i + 1) % raw.length), raw((3 * i + 2) % raw.length))
    var body = 0
    (0 until h).foreach { r =>
      var i = 0
      while (i < w) {
        var run = 1
        while (i + run < w && px(r * w + i + run) == px(r * w + i)) run += 1
        if (run >= 2) { body += 4; i += run }
        else {
          var cnt = 0
          var stop = false
          while (i < w && !stop) {
            var r2 = 1
            while (i + r2 < w && px(r * w + i + r2) == px(r * w + i)) r2 += 1
            if (r2 >= 2) stop = true else { cnt += 1; i += 1 }
          }
          body += 1 + 3 * cnt
        }
      }
    }
    assert(meta.n_bytes == 18L + body,
      s"packet accounting drifted: payload ${meta.n_bytes} vs predicted ${18 + body}")
  }

  test("tga codec: >=128 chunking branches survive a wide synthetic plane") {
    import spark.implicits._
    // one row, 300 px: a 250-run (two run packets: 128 + 122), then 50
    // distinct pixels (one literal packet) — unreachable at fixture
    // geometry, exactly why the spec drives the writer directly
    val w = 300; val h = 2
    val logical = new Array[Byte](w * h * 3)
    (0 until w).foreach { x =>
      val v: Byte = if (x < 250) 7 else (x % 97).toByte
      logical(x * 3) = v; logical(x * 3 + 1) = v; logical(x * 3 + 2) = (x / 255).toByte
    }
    // second row: all-identical (one 128-chunk + 122-chunk + ... 300 = 128+128+44)
    (w until 2 * w).foreach { x =>
      logical(x * 3) = 1; logical(x * 3 + 1) = 2; logical(x * 3 + 2) = 3
    }
    val payload = Multimodal.writeTgaRle(w, h, logical)
    val meta = Multimodal.tgaPlaneMeta(
      Seq(Multimodal.MediaItem(5L, "tga", payload)).toDS()).collect()(0)
    assert(meta.width == w && meta.height == h)
    assert(meta.plane_hash == planeHash(logical.map(_ & 0xFF).toIndexedSeq))
  }

  test("tga codec: malformed payloads fail loudly") {
    import spark.implicits._
    val truncated = Multimodal.encodeTga(
        Seq((1L, "some document text here")).toDF("doc_id", "text"),
        "doc_id", "text")
      .map(m => m.copy(data = m.data.dropRight(5)))(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaItem])
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.tgaPlaneMeta(truncated).collect()
    }
    assert(e.getMessage != null)
  }

  // ---- replay runner per-batch release ------------------------------------

  test("batch scope: survives a release fired inside the body (identity bookkeeping)") {
    import spark.implicits._
    // a body following the documented post-action drain pattern clears
    // the registry mid-scope; positional bookkeeping either crashed on
    // a negative remove count or unpersisted pre-scope frames
    val preScope = PipelineCaches.track(
      Seq(1L, 2L).toDF("x").persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    preScope.count()
    val out = PipelineCaches.releasingBatchScope {
      val inScope = PipelineCaches.track(
        Seq(3L).toDF("y").persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      inScope.count()
      PipelineCaches.releaseAll() // the documented post-action drain
      42
    }
    assert(out == 42)
    // scope exit must not throw and must not have resurrected anything
    PipelineCaches.releaseAll(blocking = true)
    graft.queries.Engines.releaseAll(blocking = true)
  }

  test("replay runner: batch working sets are released per micro-batch") {
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val idx = Dedup.buildCorpusShingleIndex(corpus, "doc_id", "text",
      shingleN = 3, thresholdNum = 1, thresholdDen = 2)
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = graft.queries.StreamRunner.replayParquetBatches(spark,
        s"$dir/documents.parquet", assertStateless = true) { b =>
      Dedup.incrementalNearDupIndexed(idx,
        b.filter(col("doc_id") % 3 === 0), "doc_id", "text")
    }
    assert(out.count() > 0)
    // every micro-batch's two working-set frames must be gone; only the
    // index frames (present before the stream) may remain
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before,
      s"replay leaked cached frames: $before persisted before, $after after")
    idx.release(blocking = true)
    graft.queries.Engines.releaseAll(blocking = true)
  }
}
