package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 pins:
  *  - the FULL PNG filter bank (VERDICT r15 #2): Up/Average/Paeth
  *    encode+decode, byte-simulated bit accounting for the mixed-filter
  *    writer, and EXTERNAL cross-validation both directions against the
  *    JDK ImageIO PNG codec (adaptive per-row filtering — the class of
  *    file the round-15 decoder rejected).
  *  - the LZ77 hash-chain encoder (VERDICT r15 #4): round trip through
  *    OUR inflater and through java.util.zip.Inflater, and a real
  *    compression-ratio bound (the round-15 writers never compressed).
  *  - baseline JPEG stage 1 (VERDICT r15 #3): DC-only closed form,
  *    planted nonzero-AC blocks against a directly-computed reference
  *    IDCT, ImageIO cross-validation both directions, corruption
  *    classes failing loudly.
  *  - append-cap overflow accounting on the LOADED index path (VERDICT
  *    r15 #6): a batch that overflows a bucket's cap is capped
  *    per-batch, counted in droppedPostings, and the rebuild
  *    re-tightens over the combined postings — not fixture luck.
  */
class Round16PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("round16-pipeline-spec").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val M = 1000000007L
  private def fold(bytes: Iterator[Int]): Long =
    bytes.foldLeft(0L)((a, b) => (a * 131L + b) % M)

  // independent filter-bank simulation (encode side: predictors read
  // the RAW plane — mirrors the qp113 oracle, NOT the production code)
  private def simFilter(w: Int, h: Int, plane: Array[Int], r: Int, i: Int): Int = {
    val stride = 3 * w
    val x = plane(r * stride + i)
    val a = if (i < 3) 0 else plane(r * stride + i - 3)
    val b = if (r == 0) 0 else plane((r - 1) * stride + i)
    val c = if (r == 0 || i < 3) 0 else plane((r - 1) * stride + i - 3)
    val pred = (r % 5) match {
      case 0 => 0
      case 1 => a
      case 2 => b
      case 3 => (a + b) / 2
      case 4 =>
        val p = a + b - c
        val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
        if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    ((x - pred) % 256 + 256) % 256
  }

  // ---- PNG: full filter bank ---------------------------------------------

  test("png filter bank: non-ASCII roundtrip + exact bit accounting") {
    import spark.implicits._
    val text = "filtré Paëth ünd Ûp — 平均 テスト"
    val raw = text.getBytes("UTF-8")
    assert(raw.length > text.length, "fixture must actually be non-ASCII")
    val df = Seq((3L, text)).toDF("doc_id", "text")
    val (w, h) = (8 + raw.length % 32, 8 + (raw.length * 23) % 32)
    val plane = Array.tabulate(w * h * 3)(i => raw(i % raw.length) & 0xFF)
    val meta = Multimodal.pngPlaneMeta(
      Multimodal.encodePngFiltered(df, "doc_id", "text")).collect()(0)
    val expectHash = fold(plane.iterator)
    var bits = 3L + 7L + 8L * h
    for (r <- 0 until h; i <- 0 until 3 * w) {
      val v = simFilter(w, h, plane, r, i)
      bits += (if (v >= 144) 9 else 8)
    }
    val expectBytes = 63L + (bits + 7) / 8
    assert(meta.width == w && meta.height == h, s"geometry ${meta.width}x${meta.height}")
    assert(meta.plane_hash == expectHash,
      s"filter-bank plane hash ${meta.plane_hash} != $expectHash")
    assert(meta.n_bytes == expectBytes,
      s"filter-bank bit accounting ${meta.n_bytes} != $expectBytes")
  }

  test("png filter bank: rows carry all five filter types and reconstruct") {
    // pseudorandom plane so Average/Paeth rows have nontrivial deltas
    var seed = 12345L
    def next(): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; ((seed >>> 33) & 0xFF).toInt }
    val (w, h) = (13, 11)
    val logical = Array.fill(w * h * 3)(next().toByte)
    val png = Multimodal.writePngAllFilters(w, h, logical)
    val (dw, dh, back) = Multimodal.parsePngPlane(png, 77L)
    assert(dw == w && dh == h && java.util.Arrays.equals(back, logical),
      "all-filters round trip lost the plane")
    // crack the container open with the PLATFORM inflater and assert
    // the raw stream's per-row filter bytes really cycle 0..4 — the
    // writer must not quietly fall back to None/Sub
    val idatOff = 8 + 25 + 8 // signature + IHDR chunk + IDAT len/type
    val inf = new java.util.zip.Inflater()
    inf.setInput(png, idatOff, png.length - idatOff - 16)
    val rawOut = new Array[Byte](h * (1 + 3 * w))
    val n = inf.inflate(rawOut)
    inf.end()
    assert(n == rawOut.length, s"platform inflate short: $n of ${rawOut.length}")
    for (r <- 0 until h)
      assert((rawOut(r * (1 + 3 * w)) & 0xFF) == r % 5,
        s"row $r filter byte ${rawOut(r * (1 + 3 * w)) & 0xFF} != ${r % 5}")
  }

  test("png: ImageIO-produced PNG (adaptive filters) decodes bit-exactly") {
    val (w, h) = (24, 21)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var seed = 987654321L
    def next(): Int = { seed = seed * 25214903917L + 11; ((seed >>> 16) & 0xFFFFFF).toInt }
    // half noise, half gradient: the JDK writer's per-row adaptive
    // filter heuristic then picks DIFFERENT filters across rows
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (y % 2 == 0) next() else ((x * 11) << 16) | ((y * 7 + x) << 8) | (x + y))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos), "no PNG writer available")
    val (dw, dh, plane) = Multimodal.parsePngPlane(baos.toByteArray, 88L)
    assert(dw == w && dh == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val base = (y * w + x) * 3
      assert((plane(base) & 0xFF) == ((rgb >> 16) & 0xFF) &&
        (plane(base + 1) & 0xFF) == ((rgb >> 8) & 0xFF) &&
        (plane(base + 2) & 0xFF) == (rgb & 0xFF),
        s"pixel ($x,$y) mismatch decoding an ImageIO PNG")
    }
  }

  test("png: our all-filters output decodes under ImageIO identically") {
    var seed = 5555L
    def next(): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; ((seed >>> 33) & 0xFF).toInt }
    val (w, h) = (17, 12)
    val logical = Array.fill(w * h * 3)(next().toByte)
    val png = Multimodal.writePngAllFilters(w, h, logical)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO could not read our PNG")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val base = (y * w + x) * 3
      assert(((rgb >> 16) & 0xFF) == (logical(base) & 0xFF) &&
        ((rgb >> 8) & 0xFF) == (logical(base + 1) & 0xFF) &&
        (rgb & 0xFF) == (logical(base + 2) & 0xFF),
        s"ImageIO disagrees with our encoder at ($x,$y)")
    }
  }

  // ---- PNG: LZ77 matcher --------------------------------------------------

  test("lz77: round-trips through our inflater AND the platform inflater, and compresses") {
    // repetitive plane — cycled text, the shape the matcher must win on
    val src = "the quick brown fox jumps over the lazy dog. ".getBytes("UTF-8")
    val (w, h) = (20, 15)
    val logical = Array.tabulate(w * h * 3)(i => src(i % src.length))
    val lz = Multimodal.writePngLz77(w, h, logical)
    val (dw, dh, back) = Multimodal.parsePngPlane(lz, 99L)
    assert(dw == w && dh == h && java.util.Arrays.equals(back, logical),
      "LZ77 round trip lost the plane")
    // platform cross-check: java.util.zip must inflate our stream to
    // the same filtered raw bytes
    val idatOff = 8 + 25 + 8
    val inf = new java.util.zip.Inflater()
    inf.setInput(lz, idatOff, lz.length - idatOff - 16)
    val rawOut = new Array[Byte](h * (1 + 3 * w))
    val n = inf.inflate(rawOut)
    assert(inf.finished(), "platform inflater not finished on our LZ77 stream")
    inf.end()
    assert(n == rawOut.length)
    // real compression: smaller than the literal-only fixed-Huffman
    // writer on the SAME plane (same filtering), and ratio > 1 vs the
    // raw scanline stream
    val literalOnly = Multimodal.writePngFixedHuffman(w, h, logical)
    assert(lz.length < literalOnly.length,
      s"matcher emitted no wins: lz ${lz.length} >= literals ${literalOnly.length}")
    val rawLen = h * (1 + 3 * w)
    assert(lz.length.toDouble / (rawLen + 63) < 0.5,
      s"repetitive fixture should compress >2x: ${lz.length} vs raw+container ${rawLen + 63}")
  }

  test("lz77: incompressible input still round-trips (literal fallback)") {
    var seed = 424242L
    def next(): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; ((seed >>> 33) & 0xFF).toInt }
    val (w, h) = (9, 8)
    val logical = Array.fill(w * h * 3)(next().toByte)
    val lz = Multimodal.writePngLz77(w, h, logical)
    val (_, _, back) = Multimodal.parsePngPlane(lz, 100L)
    assert(java.util.Arrays.equals(back, logical))
  }

  // ---- JPEG stage 1 -------------------------------------------------------

  test("jpeg: DC-only roundtrip matches the closed form (non-ASCII)") {
    import spark.implicits._
    val text = "JPÉG dç tëst — 直流成分 ✓"
    val raw = text.getBytes("UTF-8")
    assert(raw.length > text.length)
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val (wm, hm) = (1 + raw.length % 8, 1 + (raw.length * 5) % 8)
    val meta = Jpeg.jpegPlaneMeta(
      Jpeg.encodeJpegDc(df, "doc_id", "text")).collect()(0)
    assert(meta.width == 8 * wm && meta.height == 8 * hm,
      s"geometry ${meta.width}x${meta.height} want ${8 * wm}x${8 * hm}")
    // plane = one flat 8x8 block per MCU at the source byte
    val expect = fold((0 until 64 * wm * hm).iterator.map { j =>
      val y = j / (8 * wm); val x = j % (8 * wm)
      raw(((y / 8) * wm + x / 8) % raw.length) & 0xFF
    })
    assert(meta.plane_hash == expect,
      s"jpeg DC plane hash ${meta.plane_hash} != $expect")
  }

  test("jpeg: planted nonzero-AC blocks decode to the reference IDCT") {
    // two MCUs: one with scattered ACs (incl. a >15 zero run forcing
    // ZRL), one DC-only — decoded against an independently-computed
    // double-precision IDCT over the dequantized coefficients
    val blk1 = new Array[Int](64)
    blk1(0) = 17   // DC
    blk1(1) = 5    // AC zigzag 1
    blk1(3) = -7   // run of 1
    blk1(25) = 3   // run of 21 -> ZRL + (5,size)
    blk1(63) = -2  // coefficient 63 exactly (no EOB after)
    val blk2 = Array.tabulate(64)(i => if (i == 0) -30 else 0)
    val payload = Jpeg.writeJpegGray(2, 1, Array(blk1, blk2))
    val (w, h, plane) = Jpeg.decodeJpegGray(payload, 55L)
    assert(w == 16 && h == 8)
    // reference: dequantize (DC x8, AC x16 — the fixture DQT), place
    // zigzag -> natural, IDCT via the textbook double loop
    def referenceBlock(blkZig: Array[Int]): Array[Int] = {
      val natural = new Array[Int](64)
      for (k <- 0 until 64)
        natural(Jpeg.ZigZag(k)) = blkZig(k) * (if (k == 0) 8 else 16)
      val px = new Array[Int](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        var s = 0.0
        for (v <- 0 until 8; u <- 0 until 8) {
          val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
          val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
          s += cu * cv * natural(v * 8 + u) *
            math.cos((2 * x + 1) * u * math.Pi / 16) *
            math.cos((2 * y + 1) * v * math.Pi / 16)
        }
        val value = math.round(s / 4.0).toInt + 128
        px(y * 8 + x) = math.max(0, math.min(255, value))
      }
      px
    }
    val ref1 = referenceBlock(blk1)
    val ref2 = referenceBlock(blk2)
    for (y <- 0 until 8; x <- 0 until 8) {
      assert((plane(y * 16 + x) & 0xFF) == ref1(y * 8 + x),
        s"block 1 pixel ($x,$y): ${plane(y * 16 + x) & 0xFF} != ${ref1(y * 8 + x)}")
      assert((plane(y * 16 + 8 + x) & 0xFF) == ref2(y * 8 + x),
        s"block 2 pixel ($x,$y)")
    }
  }

  test("jpeg: our DC-only output decodes under ImageIO to the same plane") {
    val vals = Array(-128, -1, 0, 1, 64, 127, -64, 33)
    val payload = Jpeg.writeJpegDcGray(4, 2, vals)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    assert(img != null, "ImageIO could not read our JPEG")
    assert(img.getWidth == 32 && img.getHeight == 16)
    val raster = img.getRaster
    for (my <- 0 until 2; mx <- 0 until 4) {
      val want = vals(my * 4 + mx) + 128
      for (by <- 0 until 8; bx <- 0 until 8) {
        val got = raster.getSample(mx * 8 + bx, my * 8 + by, 0)
        assert(math.abs(got - want) <= 1,
          s"ImageIO decodes MCU ($mx,$my) sample ($bx,$by) as $got, want $want")
      }
    }
  }

  test("jpeg: ImageIO-produced JPEG decodes through our decoder (tolerance 2)") {
    val (w, h) = (40, 24)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      r.setSample(x, y, 0, ((math.sin(x / 5.0) + math.cos(y / 3.0)) * 60 + 128).toInt.max(0).min(255))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos), "no JPEG writer available")
    val bytes = baos.toByteArray
    val (dw, dh, plane) = Jpeg.decodeJpegGray(bytes, 66L)
    assert(dw == w && dh == h)
    // compare against ImageIO's OWN re-decode of the same bytes (JPEG
    // is lossy; the spec allows decoder IDCT variance — libjpeg's
    // integer IDCT vs our double-precision one differ by at most ±1,
    // tolerance 2 leaves margin)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val br = back.getRaster
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff, math.abs((plane(y * w + x) & 0xFF) - br.getSample(x, y, 0)))
    assert(maxDiff <= 2, s"our decode diverges from libjpeg by $maxDiff")
  }

  test("jpeg: corruption classes fail loudly") {
    val good = Jpeg.writeJpegDcGray(2, 2, Array(10, 20, 30, 40))
    def expectFail(mutate: Array[Byte] => Array[Byte], what: String): Unit = {
      val bad = mutate(good.clone())
      val e = intercept[IllegalArgumentException](Jpeg.decodeJpegGray(bad, 1L))
      assert(e.getMessage != null, what)
    }
    expectFail(d => d.take(d.length - 10), "truncated entropy data")
    expectFail({ d => d(0) = 0x00; d }, "bad SOI")
    expectFail({ d => d(3) = 0xC2.toByte; d }, "progressive SOF") // APP0 -> SOF2 marker byte
    // non-baseline SOF: flip the SOF0 marker byte to SOF2
    val sofAt = {
      var p = 2; var at = -1
      while (at < 0) {
        if ((good(p) & 0xFF) == 0xFF && (good(p + 1) & 0xFF) == 0xC0) at = p + 1
        else p += 1
      }
      at
    }
    expectFail({ d => d(sofAt) = 0xC2.toByte; d }, "SOF2 progressive")
    // over-subscribed DHT: claim 3 codes of length 1
    val dhtAt = {
      var p = 2; var at = -1
      while (at < 0) {
        if ((good(p) & 0xFF) == 0xFF && (good(p + 1) & 0xFF) == 0xC4) at = p
        else p += 1
      }
      at
    }
    expectFail({ d => d(dhtAt + 5) = 3; d }, "over-subscribed DHT")
    // DRI segment spliced in before SOS must be rejected, not ignored
    val sosAt = {
      var p = 2; var at = -1
      while (at < 0) {
        if ((good(p) & 0xFF) == 0xFF && (good(p + 1) & 0xFF) == 0xDA) at = p
        else p += 1
      }
      at
    }
    val withDri = good.take(sosAt) ++
      Array(0xFF, 0xDD, 0x00, 0x04, 0x00, 0x08).map(_.toByte) ++ good.drop(sosAt)
    intercept[IllegalArgumentException](Jpeg.decodeJpegGray(withDri, 2L))
    // a segment length < 2 (field includes itself) would walk the
    // marker scan backward/in place — must fail, not loop or misparse
    expectFail({ d => d(4) = 0; d(5) = 0; d }, "zero-length APP0 segment")
    // geometry implausible for the payload: claim 65000x65000 in SOF
    expectFail({ d =>
      d(sofAt + 4) = 0xFD.toByte; d(sofAt + 5) = 0xE8.toByte // height 65000
      d(sofAt + 6) = 0xFD.toByte; d(sofAt + 7) = 0xE8.toByte // width 65000
      d
    }, "implausible geometry")
  }

  // ---- append-cap overflow on the loaded path (VERDICT r15 #6) -----------

  test("append cap: overflow is capped per-batch, accounted, and rebuild re-tightens") {
    import spark.implicits._
    // corpus: distinct docs (clean build, dropped = 0 at cap 4);
    // batch: 10 docs sharing one text -> its 2 shingle buckets hold 10
    // postings each, over the cap of 4
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu")).toDF("doc_id", "text")
    val batch = (100L to 109L).map(i => (i, "nu xi omicron pi")).toDF("doc_id", "text")
    val built = Dedup.buildCorpusShingleIndex(corpus, "doc_id", "text",
      shingleN = 3, thresholdNum = 1, thresholdDen = 2, maxPosting = 4)
    assert(built.droppedPostings == 0, "clean corpus must build uncapped")
    Dedup.writeIndexTables(built, "graft_idx_capspec", buckets = 2)
    built.release(blocking = true)
    val loaded = Dedup.loadCorpusShingleIndex(spark, "graft_idx_capspec")
    assert(loaded.maxPosting == 4, "cap must survive the write/load cycle")
    assert(loaded.droppedPostings == 0)
    val (verdicts, appended) = Dedup.classifyAndAppend(loaded, batch, "doc_id", "text")
    val vs = verdicts.collect().map(r => r.getAs[String]("verdict"))
    assert(vs.length == 10)
    // every batch doc is 'new' vs the corpus (no shared shingles) —
    // the capped buckets lose candidates, never invent them
    assert(vs.forall(_ == "new"), s"unexpected verdicts: ${vs.mkString(",")}")
    // the cap FIRED on the batch's own over-full buckets and the
    // accounting survived the loaded path: "nu xi omicron pi" yields 2
    // shingles, each a 10-posting bucket > 4
    assert(appended.droppedPostings == 2,
      s"append must count 2 over-cap buckets, got ${appended.droppedPostings}")
    appended.release(blocking = true)
    // rebuild over corpus ∪ batch at the same cap: re-tightening sees
    // the SAME two over-full buckets (build-time accounting) — and at
    // a cap that fits them, nothing drops
    val rebuiltTight = Dedup.buildCorpusShingleIndex(
      corpus.unionByName(batch), "doc_id", "text",
      shingleN = 3, thresholdNum = 1, thresholdDen = 2, maxPosting = 4)
    assert(rebuiltTight.droppedPostings == 2,
      s"rebuild must re-tighten the combined postings, got ${rebuiltTight.droppedPostings}")
    rebuiltTight.release(blocking = true)
    val rebuiltWide = Dedup.buildCorpusShingleIndex(
      corpus.unionByName(batch), "doc_id", "text",
      shingleN = 3, thresholdNum = 1, thresholdDen = 2, maxPosting = 16)
    assert(rebuiltWide.droppedPostings == 0)
    rebuiltWide.release(blocking = true)
    graft.queries.Engines.releaseAll(blocking = true)
  }
}
