package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{Dedup, Jpeg, Multimodal}

/** Round-16 additions — the measurement split and the external-file
  * codec legs from VERDICT r15:
  *
  *  - qp108b: the REBUILD half of the round-15 qp108 (verdict #1b —
  *    one entry timing two full index builds + two bucketed writes was
  *    30 % of the official suite): rebuild the index over the compacted
  *    corpus ∪ b1 ∪ b2 (fresh document frequencies, caps re-tightened
  *    over the COMBINED postings), overwrite-write the bucketed tables,
  *    reload, classify batch 3. Self-contained on purpose — it derives
  *    the compacted corpus from the documents table rather than reading
  *    qp108's left-behind warehouse tables, so the isolated fresh-JVM
  *    child and a standalone Verify run measure/verify the same thing
  *    the suite does.
  *  - qp113: PNG with ALL FIVE filter types (None/Sub/Up/Average/Paeth
  *    cycling per row) under fixed-Huffman deflate — verdict #2: the
  *    round-15 inflater decodes any deflate stream, but filter
  *    reconstruction covered only None/Sub, so externally-produced
  *    PNGs (libpng emits Up/Avg/Paeth routinely) could not ingest. The
  *    oracle replays the full filter bank in SQL over the logical
  *    plane (encode-side filters read RAW neighbor values, so every
  *    predictor is closed-form per byte) and accounts the fixed-
  *    Huffman bit stream exactly, as qp111 did for None/Sub.
  *  - qp115: PNG compressed by OUR LZ77 greedy hash-chain matcher
  *    (verdict #4 — the round-15 writers were literal-only): real
  *    match search emitting fixed-Huffman length/distance codes,
  *    decoded by the round-15 inflater. n_bytes is deliberately absent
  *    (greedy match choices aren't SQL-replayable); geometry + decoded
  *    plane prove the round trip, the qp112 idiom.
  *  - qp114: baseline JPEG, DC-only grayscale (verdict #3 stage 1) —
  *    real JFIF marker walk, DQT/DHT/SOF0/SOS parse, Huffman-coded DC
  *    differences with byte-unstuffing, dequantization, the REAL 2-D
  *    IDCT, level shift. The fixture plants DC-only blocks with
  *    Q(0,0) = 8, so the decoded plane is closed-form (each MCU flat
  *    at its source byte) while the decoder still runs the full
  *    general-path machinery; the spec drives nonzero-AC blocks
  *    against a directly-computed reference IDCT. n_bytes absent
  *    (byte-stuffing makes size bit-alignment-dependent — not SQL-
  *    replayable), the qp112 idiom again.
  */
object Round16Queries {

  import OracleBytes.byteAt

  /** The qp108b oracle: batch 3 classified against corpus ∪ b1 ∪ b2 —
    * the post-compaction state. Same order-independence argument as
    * qp108: the rebuild's fresh ranking changes only candidate
    * generation (a superset under any fixed total order); the exact
    * Jaccard verify decides every verdict, which the full-truth join
    * replays. */
  private val rebuildOracle: String =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w,
          md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) fp FROM documents),
      s AS (SELECT doc_id, fp, list_distinct(list_transform(range(1, greatest(len(w)-2, 1) + 1),
              i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) sh FROM t),
      c3 AS (SELECT * FROM s WHERE doc_id % 8 >= 4 OR doc_id % 8 <= 1),
      b3 AS (SELECT * FROM s WHERE doc_id % 8 = 2),
      ex3 AS (SELECT DISTINCT b.doc_id FROM b3 b JOIN c3 c ON b.fp = c.fp),
      nr3 AS (SELECT DISTINCT b.doc_id FROM b3 b JOIN c3 c
              ON 5 * len(list_intersect(b.sh, c.sh)) >= 2 * len(list_distinct(list_concat(b.sh, c.sh))))
      SELECT 3 AS batch, b.doc_id,
        CASE WHEN ex3.doc_id IS NOT NULL THEN 'exact'
             WHEN nr3.doc_id IS NOT NULL THEN 'near' ELSE 'new' END AS verdict
      FROM b3 b LEFT JOIN ex3 ON ex3.doc_id = b.doc_id
      LEFT JOIN nr3 ON nr3.doc_id = b.doc_id
      ORDER BY b.doc_id"""

  val defs: Seq[QueryDef] = Seq(

    // ---- qp108b: rebuild-overwrite → reload → classify ------------------
    QueryDef(
      "qp108b_index_rebuild_classify",
      Some(rebuildOracle),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        // the compacted corpus: base corpus plus the two batches qp108
        // appended — derived from the source table, not qp108's tables
        // (see the object scaladoc for why self-contained)
        val compacted = docs.filter(col("doc_id") % 8 >= 4 || col("doc_id") % 8 <= 1)
        val b3 = docs.filter(col("doc_id") % 8 === 2)
        graft.BenchPhases.timed("qp108b_index_rebuild_classify.rebuild_write") {
          val rebuilt = Dedup.buildCorpusShingleIndex(compacted, "doc_id", "text",
            shingleN = 3, thresholdNum = 2, thresholdDen = 5)
          Dedup.writeIndexTables(rebuilt, "graft_idx_qp108b")
          rebuilt.release(blocking = true)
        }
        val reloaded = Dedup.loadCorpusShingleIndex(s, "graft_idx_qp108b")
        require(reloaded.droppedPostings == 0,
          s"qp108b oracle invalid: posting cap dropped ${reloaded.droppedPostings} bucket(s)")
        // no phase timer around the classify: the verdict frame is lazy
        // (it materializes in the caller's sink), so entry-total minus
        // rebuild_write IS the load+classify leg
        Dedup.incrementalNearDupIndexed(reloaded, b3, "doc_id", "text")
          .withColumn("batch", lit(3))
          .select(col("batch"), col("id").as("doc_id"), col("verdict"))
          .orderBy(col("doc_id"))
      }),

    // ---- qp113: PNG with the FULL filter bank (None/Sub/Up/Avg/Paeth) ---
    // rows cycle type = row mod 5 under fixed-Huffman literal coding;
    // the oracle replays every predictor closed-form (encode-side
    // filters read RAW plane neighbors — no sequential state) and
    // accounts the bit stream exactly, the qp111 idiom. idx spans
    // 3·39·39 = 4563 ≥ 3wh for every possible document.
    QueryDef(
      "qp113_png_filter_bank",
      Some(OracleBytes.expand(
        """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS len,
            hex(encode(text)) AS hx FROM documents),
        g AS (SELECT doc_id, len, hx, 8 + len % 32 AS w,
              8 + (len * 23) % 32 AS h FROM d),
        idx AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 4563)),
        nb AS (SELECT g.doc_id, idx.i,
                (idx.i // (3 * g.w)) % 5 AS ft,
                BYTEAT{idx.i} AS x,
                CASE WHEN (idx.i % (3 * g.w)) >= 3 THEN BYTEAT{idx.i - 3} ELSE 0 END AS a,
                CASE WHEN idx.i >= 3 * g.w THEN BYTEAT{idx.i - 3 * g.w} ELSE 0 END AS b,
                CASE WHEN idx.i >= 3 * g.w AND (idx.i % (3 * g.w)) >= 3
                     THEN BYTEAT{idx.i - 3 * g.w - 3} ELSE 0 END AS c
               FROM g JOIN idx ON idx.i < 3 * g.w * g.h),
        fv AS (SELECT doc_id, i,
                CASE ft
                  WHEN 0 THEN x
                  WHEN 1 THEN ((x - a) % 256 + 256) % 256
                  WHEN 2 THEN ((x - b) % 256 + 256) % 256
                  WHEN 3 THEN ((x - (a + b) // 2) % 256 + 256) % 256
                  ELSE ((x - (CASE
                    WHEN abs(b - c) <= abs(a - c) AND abs(b - c) <= abs(a + b - 2*c) THEN a
                    WHEN abs(a - c) <= abs(a + b - 2*c) THEN b
                    ELSE c END)) % 256 + 256) % 256
                END AS v
               FROM nb),
        bt AS (SELECT doc_id, SUM(CASE WHEN v >= 144 THEN 9 ELSE 8 END) AS pb
               FROM fv GROUP BY doc_id),
        sz AS (SELECT g.doc_id, 3 + 7 + 8 * g.h + bt.pb AS bits
               FROM g JOIN bt USING (doc_id)),
        ph AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(0, w * h * 3), j -> CAST(BYTEAT{j} AS BIGINT))),
                (a, b) -> (a * 131 + b) % 1000000007) AS plane_hash FROM g)
        SELECT g.doc_id, CAST(g.w AS INTEGER) AS width, CAST(g.h AS INTEGER) AS height,
          CAST(63 + (sz.bits + 7) // 8 AS BIGINT) AS n_bytes, ph.plane_hash
        FROM g JOIN sz ON sz.doc_id = g.doc_id JOIN ph ON ph.doc_id = g.doc_id
        ORDER BY g.doc_id""")),
      (s, dir) =>
        Multimodal.pngPlaneMeta(Multimodal.encodePngFiltered(
            Tables.load(s, dir, "documents"), "doc_id", "text"))
          .toDF()
          .orderBy(col("doc_id"))),

    // ---- qp115: PNG compressed by OUR LZ77 hash-chain matcher ------------
    // real match search (graft's own encoder finally COMPRESSES — the
    // spec bounds ratio > 1 on this fixture), decoded by the round-15
    // inflater; greedy match choices aren't SQL-replayable so n_bytes
    // is absent: geometry + decoded plane, the qp112 idiom.
    QueryDef(
      "qp115_png_lz77_roundtrip",
      Some(OracleBytes.expand(
        """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS len,
            hex(encode(text)) AS hx FROM documents),
        g AS (SELECT doc_id, len, hx, 8 + len % 32 AS w,
              8 + (len * 29) % 32 AS h FROM d),
        ph AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(0, w * h * 3), j -> CAST(BYTEAT{j} AS BIGINT))),
                (a, b) -> (a * 131 + b) % 1000000007) AS plane_hash FROM g)
        SELECT g.doc_id, CAST(g.w AS INTEGER) AS width,
          CAST(g.h AS INTEGER) AS height, ph.plane_hash
        FROM g JOIN ph USING (doc_id) ORDER BY g.doc_id""")),
      (s, dir) =>
        Multimodal.pngPlaneMeta(Multimodal.encodePngLz77(
            Tables.load(s, dir, "documents"), "doc_id", "text"))
          .toDF()
          .select(col("doc_id"), col("width"), col("height"), col("plane_hash"))
          .orderBy(col("doc_id"))),

    // ---- qp114: baseline JPEG, DC-only grayscale (stage 1) ---------------
    // the decoded plane is closed-form (each 8×8 MCU flat at its source
    // byte — see the Jpeg scaladoc) while the decoder runs the full
    // marker-walk/DHT/DQT/entropy/IDCT path; n_bytes absent (byte
    // stuffing is bit-alignment-dependent). Pixel j of the w×h plane
    // (w = 8·(1 + len mod 8), h = 8·(1 + 5·len mod 8)) reads MCU
    // (y/8)·wMcu + x/8 of the cycled text bytes.
    QueryDef(
      "qp114_jpeg_dc_roundtrip",
      Some(OracleBytes.expand(
        """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS len,
            hex(encode(text)) AS hx FROM documents),
        g AS (SELECT doc_id, len, hx, 1 + len % 8 AS wm,
              1 + (len * 5) % 8 AS hm FROM d),
        ph AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(0, 64 * wm * hm),
                  j -> CAST(BYTEAT{((j // (8 * wm)) // 8) * wm + (j % (8 * wm)) // 8} AS BIGINT))),
                (a, b) -> (a * 131 + b) % 1000000007) AS plane_hash FROM g)
        SELECT g.doc_id, CAST(8 * g.wm AS INTEGER) AS width,
          CAST(8 * g.hm AS INTEGER) AS height, ph.plane_hash
        FROM g JOIN ph USING (doc_id) ORDER BY g.doc_id""")),
      (s, dir) =>
        Jpeg.jpegPlaneMeta(Jpeg.encodeJpegDc(
            Tables.load(s, dir, "documents"), "doc_id", "text"))
          .toDF()
          .select(col("doc_id"), col("width"), col("height"), col("plane_hash"))
          .orderBy(col("doc_id")))
  )
}
