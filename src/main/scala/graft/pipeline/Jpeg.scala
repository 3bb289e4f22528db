package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import Multimodal.{MediaItem, PlaneMeta}

/** Baseline JPEG, stage 1 (round 16 — VERDICT r15 #3): a REAL
  * JFIF/T.81 codec for single-component (grayscale) baseline images —
  * marker walk (SOI/APP0/DQT/SOF0/DHT/SOS/EOI), quantization-table
  * parse in zigzag order, canonical Huffman table construction from
  * DHT counts+symbols, entropy decode of DC differences (category +
  * EXTEND sign logic) and run-length AC symbols (EOB/ZRL/(r,s)),
  * byte-UNSTUFFING (0xFF 0x00), dequantization, the REAL 2-D IDCT,
  * level shift and clamp. The photographic class is no longer entirely
  * simulated: what remains stubbed is only what stage 1 scoped out
  * (multi-component color + chroma subsampling, progressive scans,
  * restart intervals — each rejected with a purposeful error, never
  * decoded wrong).
  *
  * The fixture encoder plants DC-ONLY blocks with Q(0,0) = 8, so each
  * decoded MCU is exactly flat at its source byte (F(0,0) = 8·dc ⇒
  * IDCT = dc everywhere; +128 level shift undoes the encoder's −128)
  * — the closed form the qp114 oracle replays — while the decoder
  * still runs the full general path (the AC state machine consumes
  * the per-block EOB; JpegSpec plants nonzero-AC blocks against a
  * directly-computed reference IDCT and cross-validates both
  * directions against the JDK's ImageIO JPEG codec). `n_bytes` is
  * deliberately absent from the entry: byte stuffing makes payload
  * size bit-alignment-dependent — not SQL-replayable (the qp112
  * precedent).
  *
  * Tables are the public ITU T.81 Annex K luminance set (Tables K.3
  * and K.5), so the payloads are files any JPEG reader opens.
  */
object Jpeg {

  // zigzag index -> natural (row-major) index, T.81 Figure 5
  private[pipeline] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K luminance DC table: counts per code length 1..16 + symbols
  private val DcCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcSymbols = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  // Annex K luminance AC table (Table K.5)
  private val AcCounts = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcSymbols = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // the fixture quantization table, ZIGZAG order: Q(0,0) = 8 makes the
  // DC-only decode closed-form (dequantized DC = 8·dc ⇒ IDCT = dc);
  // the AC slots hold 16 — irrelevant to DC-only planes but real
  // values a general decode dequantizes by
  private val FixtureQuantZig: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 16)

  /** Canonical JPEG Huffman code assignment (T.81 Annex C): symbols in
    * table order get increasing codes, code <<= 1 at each length step.
    * Returns (code, length) per symbol. */
  private def canonicalCodes(counts: Array[Int], symbols: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var si = 0
    val m = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var len = 1
    while (len <= 16) {
      var k = 0
      while (k < counts(len - 1)) {
        m(symbols(si)) = (code, len)
        code += 1; si += 1; k += 1
      }
      code <<= 1
      len += 1
    }
    m.toMap
  }

  /** A decoding table over the same counts/symbols — the sequential
    * canonical walk (first/index per length), the JPEG sibling of
    * Multimodal's deflate `Huff`. Rejects over-subscribed counts. */
  private final class JHuff(counts: Array[Int], symbols: Array[Int],
      what: String, docId: Long) {
    require(counts.length == 16)
    locally {
      var left = 1
      var l = 0
      while (l < 16) {
        left <<= 1
        left -= counts(l)
        if (left < 0)
          throw new IllegalArgumentException(
            s"over-subscribed JPEG $what Huffman table (doc $docId)")
        l += 1
      }
      if (counts.sum != symbols.length)
        throw new IllegalArgumentException(
          s"JPEG $what DHT counts/symbols mismatch (doc $docId)")
    }
    def decode(readBit: () => Int): Int = {
      var code = 0; var first = 0; var index = 0; var len = 1
      while (len <= 16) {
        code |= readBit()
        val count = counts(len - 1)
        if (code - first < count) return symbols(index + (code - first))
        index += count
        first = (first + count) << 1
        code <<= 1
        len += 1
      }
      throw new IllegalArgumentException(
        s"invalid JPEG $what Huffman code (doc $docId)")
    }
  }

  /** MSB-first entropy-bit writer with JPEG byte stuffing (a 0xFF data
    * byte is followed by 0x00) and 1-padding of the final byte. */
  private final class JpegBitWriter(out: java.io.ByteArrayOutputStream) {
    private var cur = 0
    private var n = 0
    private def flushByte(): Unit = {
      out.write(cur)
      if (cur == 0xFF) out.write(0x00)
      cur = 0; n = 0
    }
    def writeBits(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        n += 1
        if (n == 8) flushByte()
        i -= 1
      }
    }
    def finish(): Unit =
      if (n > 0) {
        cur = (cur << (8 - n)) | ((1 << (8 - n)) - 1)
        flushByte()
      }
  }

  private def u16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def marker(out: java.io.ByteArrayOutputStream, m: Int,
      payload: Array[Byte]): Unit = {
    out.write(0xFF); out.write(m)
    out.write(u16(payload.length + 2), 0, 2)
    out.write(payload, 0, payload.length)
  }

  /** Serialize a grayscale baseline JPEG from QUANTIZED coefficient
    * blocks: `blocksZig(k)` holds MCU k's 64 coefficients in ZIGZAG
    * order (the values the entropy coder codes; the decoder multiplies
    * them by the quantization table). Real JFIF container, Annex K
    * Huffman tables, differential DC coding, run-length AC coding
    * ((run, size) symbols, ZRL for 16-zero runs, EOB unless the block
    * codes through coefficient 63), byte stuffing. */
  private[pipeline] def writeJpegGray(wMcu: Int, hMcu: Int,
      blocksZig: Array[Array[Int]]): Array[Byte] = {
    require(blocksZig.length == wMcu * hMcu)
    require(blocksZig.forall(_.length == 64))
    val out = new java.io.ByteArrayOutputStream(64 + 8 * blocksZig.length)
    out.write(0xFF); out.write(0xD8) // SOI
    marker(out, 0xE0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0) ++
      u16(1) ++ u16(1) ++ Array[Byte](0, 0)) // APP0 JFIF 1.1, 1:1, no thumb
    marker(out, 0xDB, Array(0.toByte) ++ FixtureQuantZig.map(_.toByte)) // DQT Pq=0 Tq=0
    val w = 8 * wMcu; val h = 8 * hMcu
    marker(out, 0xC0, Array(8.toByte) ++ u16(h) ++ u16(w) ++
      Array[Byte](1, 1, 0x11, 0)) // SOF0: 8-bit, 1 comp id=1 samp 1x1 tq=0
    marker(out, 0xC4, Array(0x00.toByte) ++ DcCounts.map(_.toByte) ++
      DcSymbols.map(_.toByte)) // DHT class 0 (DC) id 0
    marker(out, 0xC4, Array(0x10.toByte) ++ AcCounts.map(_.toByte) ++
      AcSymbols.map(_.toByte)) // DHT class 1 (AC) id 0
    marker(out, 0xDA, Array[Byte](1, 1, 0x00, 0, 63, 0)) // SOS
    val dcCodes = canonicalCodes(DcCounts, DcSymbols)
    val acCodes = canonicalCodes(AcCounts, AcSymbols)
    val bw = new JpegBitWriter(out)
    def cat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def magnitude(v: Int, t: Int): Int =
      if (v < 0) v + (1 << t) - 1 else v
    var pred = 0
    blocksZig.foreach { blk =>
      val dc = blk(0)
      val diff = dc - pred
      pred = dc
      val t = cat(diff) // 0 for diff = 0
      require(t <= 11, s"DC difference $diff exceeds category 11")
      val (dcode, dlen) = dcCodes(t)
      bw.writeBits(dcode, dlen)
      if (t > 0) bw.writeBits(magnitude(diff, t), t)
      // AC: (run, size) over zigzag 1..63
      var k = 1
      var run = 0
      var lastNonzero = 0
      var j = 63
      while (j >= 1 && lastNonzero == 0) { if (blk(j) != 0) lastNonzero = j; j -= 1 }
      while (k <= lastNonzero) {
        if (blk(k) == 0) { run += 1; k += 1 }
        else {
          while (run > 15) {
            val (zc, zl) = acCodes(0xF0) // ZRL
            bw.writeBits(zc, zl)
            run -= 16
          }
          val s = cat(blk(k))
          require(s <= 10, s"AC coefficient ${blk(k)} exceeds size 10")
          val (ac, al) = acCodes((run << 4) | s)
          bw.writeBits(ac, al)
          bw.writeBits(magnitude(blk(k), s), s)
          run = 0
          k += 1
        }
      }
      if (lastNonzero < 63) {
        val (ecode, elen) = acCodes(0x00) // EOB
        bw.writeBits(ecode, elen)
      }
    }
    bw.finish()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** DC-only convenience form: `mcuVals(k)` is the DC level (−128..127)
    * of MCU k in row-major order. */
  private[pipeline] def writeJpegDcGray(wMcu: Int, hMcu: Int,
      mcuVals: Array[Int]): Array[Byte] = {
    require(mcuVals.forall(v => v >= -128 && v <= 127))
    writeJpegGray(wMcu, hMcu,
      mcuVals.map(dc => Array.tabulate(64)(i => if (i == 0) dc else 0)))
  }

  // precomputed IDCT cosine basis: cosT(x)(u) = cos((2x+1)·u·π/16)
  private val cosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  private val C: Array[Double] = Array.tabulate(8)(u =>
    if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** The REAL 2-D type-III DCT (T.81 A.3.3) over natural-order
    * dequantized coefficients; returns the 64 spatial samples BEFORE
    * the +128 level shift. Double-precision reference form —
    * correctness over speed (blocks are 64 samples; the per-partition
    * decode amortizes the table lookups). */
  private[pipeline] def idct8x8(coef: Array[Int]): Array[Double] = {
    val outv = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          val cy = cosT(y)(v)
          while (u < 8) {
            val f = coef(v * 8 + u)
            if (f != 0) s += C(u) * C(v) * f * cosT(x)(u) * cy
            u += 1
          }
          v += 1
        }
        outv(y * 8 + x) = s / 4.0
        x += 1
      }
      y += 1
    }
    outv
  }

  /** EXTEND (T.81 F.2.2.1): map `v` read as a `t`-bit magnitude field
    * to its signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Decode a single-component baseline JFIF payload to its grayscale
    * plane — the full stage-1 path described in the object scaladoc.
    * Returns (width, height, row-major plane). */
  private[pipeline] def decodeJpegGray(d: Array[Byte], docId: Long): (Int, Int, Array[Byte]) = {
    if (d.length < 4 || (d(0) & 0xFF) != 0xFF || (d(1) & 0xFF) != 0xD8)
      throw new IllegalArgumentException(s"not a JPEG payload (doc $docId)")
    var pos = 2
    def u16at(p: Int): Int = {
      if (p + 2 > d.length)
        throw new IllegalArgumentException(s"truncated JPEG marker (doc $docId)")
      ((d(p) & 0xFF) << 8) | (d(p + 1) & 0xFF)
    }
    // every marker segment must fit the payload BEFORE its body is
    // read — a truncated segment otherwise walks reads past the end;
    // a length < 2 (the field includes itself) would walk BACKWARD
    def segEndAt(p: Int): Int = {
      val len = u16at(p)
      if (len < 2 || p + len > d.length)
        throw new IllegalArgumentException(
          s"JPEG marker segment length $len invalid for payload (doc $docId)")
      p + len
    }
    var w = -1; var h = -1
    val qtables = new Array[Array[Int]](4)
    var compTq = -1
    var dcHuff: JHuff = null
    var acHuff: JHuff = null
    var sosSeen = false
    // ---- marker walk up to SOS --------------------------------------
    while (!sosSeen) {
      if (pos + 2 > d.length)
        throw new IllegalArgumentException(s"truncated JPEG stream (doc $docId)")
      if ((d(pos) & 0xFF) != 0xFF)
        throw new IllegalArgumentException(
          s"expected JPEG marker, got 0x${(d(pos) & 0xFF).toHexString} (doc $docId)")
      val m = d(pos + 1) & 0xFF
      pos += 2
      m match {
        case 0xD8 =>
          throw new IllegalArgumentException(s"unexpected second SOI (doc $docId)")
        case 0xD9 =>
          throw new IllegalArgumentException(s"EOI before SOS (doc $docId)")
        case app if (app >= 0xE0 && app <= 0xEF) || app == 0xFE =>
          pos = segEndAt(pos) // APPn / COM: skip
        case 0xDB =>
          val segEnd = segEndAt(pos)
          var p = pos + 2
          while (p < segEnd) {
            val pq = (d(p) & 0xF0) >> 4
            val tq = d(p) & 0x0F
            if (pq != 0)
              throw new IllegalArgumentException(
                s"16-bit quantization tables unsupported (doc $docId)")
            if (p + 65 > segEnd)
              throw new IllegalArgumentException(s"truncated DQT (doc $docId)")
            qtables(tq) = Array.tabulate(64)(i => d(p + 1 + i) & 0xFF)
            p += 65
          }
          pos = segEnd
        case 0xC0 =>
          val segEnd = segEndAt(pos)
          if ((d(pos + 2) & 0xFF) != 8)
            throw new IllegalArgumentException(
              s"non-8-bit JPEG precision unsupported (doc $docId)")
          h = u16at(pos + 3); w = u16at(pos + 5)
          val ncomp = d(pos + 7) & 0xFF
          if (ncomp != 1)
            throw new IllegalArgumentException(
              s"stage-1 JPEG decode is single-component; got $ncomp (doc $docId)")
          val samp = d(pos + 9) & 0xFF
          if (samp != 0x11)
            throw new IllegalArgumentException(
              s"subsampled JPEG unsupported (doc $docId: sampling 0x${samp.toHexString})")
          compTq = d(pos + 10) & 0xFF
          if (w <= 0 || h <= 0 || w > 65535 || h > 65535 ||
              w.toLong * h > 256L * d.length)
            // true ceiling: a scan needs ≥ 2 bits per 64-pixel MCU
            // (a 1-bit DC cat-0 code + a 1-bit EOB under a degenerate
            // but legal DHT) → at most 256 pixels per payload byte; a
            // header claiming more cannot be satisfied by ANY valid
            // scan and must fail BEFORE the plane allocation (the
            // Annex-K floor is ~85 px/byte, so no legitimate file is
            // near this bound — same discipline as the PNG 1032× and
            // TGA 32× guards)
            throw new IllegalArgumentException(
              s"JPEG geometry implausible (doc $docId: $w x $h in ${d.length} bytes)")
          pos = segEnd
        case sof if sof == 0xC1 || sof == 0xC2 || sof == 0xC3 ||
            (sof >= 0xC5 && sof <= 0xC7) || (sof >= 0xC9 && sof <= 0xCF && sof != 0xCC) =>
          throw new IllegalArgumentException(
            s"non-baseline JPEG (SOF 0x${sof.toHexString}) unsupported (doc $docId)")
        case 0xC4 =>
          val segEnd = segEndAt(pos)
          var p = pos + 2
          while (p < segEnd) {
            val tc = (d(p) & 0xF0) >> 4
            val th = d(p) & 0x0F
            if (p + 17 > segEnd)
              throw new IllegalArgumentException(s"truncated DHT (doc $docId)")
            val counts = Array.tabulate(16)(i => d(p + 1 + i) & 0xFF)
            val total = counts.sum
            if (p + 17 + total > segEnd)
              throw new IllegalArgumentException(s"truncated DHT symbols (doc $docId)")
            val symbols = Array.tabulate(total)(i => d(p + 17 + i) & 0xFF)
            if (th == 0) {
              if (tc == 0) dcHuff = new JHuff(counts, symbols, "DC", docId)
              else acHuff = new JHuff(counts, symbols, "AC", docId)
            }
            p += 17 + total
          }
          pos = segEnd
        case 0xDD =>
          throw new IllegalArgumentException(
            s"restart intervals unsupported in stage-1 JPEG decode (doc $docId)")
        case 0xDA =>
          val segEnd = segEndAt(pos)
          val ncomp = d(pos + 2) & 0xFF
          if (ncomp != 1)
            throw new IllegalArgumentException(
              s"multi-component scan unsupported (doc $docId)")
          val tdta = d(pos + 4) & 0xFF
          if (tdta != 0x00)
            throw new IllegalArgumentException(
              s"scan references non-0 Huffman tables (doc $docId)")
          if ((d(pos + 5) & 0xFF) != 0 || (d(pos + 6) & 0xFF) != 63 ||
              (d(pos + 7) & 0xFF) != 0)
            throw new IllegalArgumentException(
              s"non-sequential spectral selection unsupported (doc $docId)")
          pos = segEnd
          sosSeen = true
        case other =>
          throw new IllegalArgumentException(
            s"unsupported JPEG marker 0xFF${other.toHexString} (doc $docId)")
      }
    }
    val quantZig =
      if (compTq >= 0 && compTq < 4 && qtables(compTq) != null) qtables(compTq)
      else null
    if (w < 0 || quantZig == null || dcHuff == null || acHuff == null)
      throw new IllegalArgumentException(
        s"JPEG scan started before SOF/DQT/DHT complete (doc $docId)")
    // ---- entropy decode ---------------------------------------------
    var bitPos = 0
    def readBit(): Int = {
      if (pos >= d.length)
        throw new IllegalArgumentException(s"truncated JPEG entropy data (doc $docId)")
      val b = d(pos) & 0xFF
      if (b == 0xFF) {
        // stuffed byte: 0xFF 0x00 is a data 0xFF; anything else here
        // is a marker inside the scan (RST unsupported — no DRI)
        if (pos + 1 >= d.length || (d(pos + 1) & 0xFF) != 0x00)
          throw new IllegalArgumentException(
            s"unexpected marker inside JPEG scan (doc $docId)")
      }
      val bit = (b >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) {
        bitPos = 0
        pos += (if (b == 0xFF) 2 else 1) // skip the stuffing 0x00
      }
      bit
    }
    def readBits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    val wMcu = (w + 7) / 8
    val hMcu = (h + 7) / 8
    val plane = new Array[Byte](w * h)
    val coef = new Array[Int](64)
    var pred = 0
    var my = 0
    while (my < hMcu) {
      var mx = 0
      while (mx < wMcu) {
        java.util.Arrays.fill(coef, 0)
        val cat = dcHuff.decode(() => readBit())
        if (cat > 11)
          throw new IllegalArgumentException(
            s"invalid JPEG DC category $cat (doc $docId)")
        val diff = extend(readBits(cat), cat)
        pred += diff
        coef(0) = pred * quantZig(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = acHuff.decode(() => readBit())
          if (rs == 0x00) eob = true // EOB
          else if (rs == 0xF0) k += 16 // ZRL: 16 zeros
          else {
            val run = (rs >> 4) & 0x0F
            val size = rs & 0x0F
            k += run
            if (k > 63)
              throw new IllegalArgumentException(
                s"JPEG AC run overflows the block (doc $docId)")
            coef(ZigZag(k)) = extend(readBits(size), size) * quantZig(k)
            k += 1
          }
        }
        val spatial = idct8x8(coef)
        var by = 0
        while (by < 8) {
          val py = my * 8 + by
          if (py < h) {
            var bx = 0
            while (bx < 8) {
              val px = mx * 8 + bx
              if (px < w) {
                val v = math.round(spatial(by * 8 + bx)).toInt + 128
                plane(py * w + px) =
                  (if (v < 0) 0 else if (v > 255) 255 else v).toByte
              }
              bx += 1
            }
          }
          by += 1
        }
        mx += 1
      }
      my += 1
    }
    // ---- trailer: pad bits, then EOI, nothing after -----------------
    if (bitPos != 0) { pos += (if ((d(pos) & 0xFF) == 0xFF) 2 else 1); bitPos = 0 }
    if (pos + 2 > d.length || (d(pos) & 0xFF) != 0xFF || (d(pos + 1) & 0xFF) != 0xD9)
      throw new IllegalArgumentException(s"JPEG scan not terminated by EOI (doc $docId)")
    if (pos + 2 != d.length)
      throw new IllegalArgumentException(s"trailing bytes after JPEG EOI (doc $docId)")
    (w, h, plane)
  }

  /** Build the DC-only grayscale JPEG fixture from each document:
    * wMcu = 1 + len mod 8, hMcu = 1 + 5·len mod 8 (so the image is up
    * to 64×64), MCU k's DC level = (byte k of the cycled text) − 128 —
    * which the +128 level shift undoes, so the decoded plane is the
    * text bytes, one per flat 8×8 block: the qp114 closed form. */
  def encodeJpegDc(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val raw = if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
        val len = raw.length
        val wM = 1 + len % 8
        val hM = 1 + (len * 5) % 8
        val src = if (len == 0) Array(' '.toByte) else raw
        val vals = Array.tabulate(wM * hM)(k => (src(k % src.length) & 0xFF) - 128)
        MediaItem(id, "jpeg", writeJpegDcGray(wM, hM, vals))
      }
  }

  /** [[PlaneMeta]] for JPEG payloads: plane_hash folds the decoded
    * grayscale plane (one byte per pixel); n_bytes is the container
    * size (not oracled — see the object scaladoc). */
  def jpegPlaneMeta(media: Dataset[MediaItem]): Dataset[PlaneMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h, plane) = decodeJpegGray(m.data, m.doc_id)
        PlaneMeta(m.doc_id, w, h, m.data.length.toLong,
          Multimodal.foldBytes(plane, 0, plane.length))
      }
    }
  }
}
