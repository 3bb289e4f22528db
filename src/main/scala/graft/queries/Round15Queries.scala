package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{Curation, Dedup, Multimodal}

/** Round-15 additions — the production-cadence and codec-class items
  * from VERDICT r14:
  *
  *  - qp108: the FULL deployment loop (missing #2) — build → bucketed
  *    write → fresh LOAD → classifyAndAppend two batches against the
  *    loaded (uncached) index → rebuild-OVERWRITE the same tables over
  *    the compacted corpus → load again → classify a third batch. The
  *    production cadence of SCALE.md §Dedup in one oracled entry.
  *  - qp109: `qualityQuantileAuto`'s APPROX branch end-to-end under a
  *    DuckDB oracle (next #5) — Greenwald–Khanna itself is not engine-
  *    portable, but at accuracy ≫ max-source-rows its per-source
  *    threshold is provably the exact order statistic at rank ⌈n·q⌉
  *    (verified empirically at all three fixture scales, guarded
  *    eagerly in-entry so a fixture change fails loudly, not as a
  *    silent hash mismatch), and the rank-⌈n·q⌉ threshold IS portable.
  *  - qp110: the PNG codec (missing #3) — chunked container with
  *    CRC-32 per chunk, nested zlib/Adler-32, stored-DEFLATE blocks,
  *    per-row None/Sub filters. n_bytes is closed-form per geometry
  *    (stored blocks, chunking included); plane_hash proves the chunk
  *    walk + inflation + filter reconstruction.
  *  - qp111: PNG under REAL entropy coding — literal-only fixed-Huffman
  *    deflate, the oracle accounting the bit stream exactly.
  *  - qp112: PNG compressed by the PLATFORM zlib (java.util.zip
  *    Deflater: LZ77 + dynamic-Huffman blocks), decoded by our full
  *    RFC 1951 inflater — the externally-compressed payload class.
  */
object Round15Queries {

  import OracleBytes.byteAt

  /** The qp110 oracle: PNG container size is closed-form for
    * stored-deflate blocks — raw scanline stream r = h·(1+3w) bytes,
    * ⌈r/65535⌉ stored blocks at 5 bytes of framing each, plus
    * signature 8 + IHDR 25 + IDAT overhead (12 chunk + 2 zlib header +
    * 4 Adler) + IEND 12 = 63. plane_hash folds the logical top-down
    * plane (text bytes cycled), so the filters/zlib framing cancel —
    * the engine must UNDO them to match. */
  private val pngOracle: String =
    s"""WITH d AS (SELECT doc_id, octet_length(encode(text)) AS len,
          hex(encode(text)) AS hx FROM documents),
      g AS (SELECT doc_id, len, hx, 8 + len % 32 AS w,
            8 + (len * 13) % 32 AS h FROM d),
      sz AS (SELECT doc_id, w, h, h * (1 + 3 * w) AS raw FROM g),
      ph AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(0, w * h * 3), j -> CAST(${byteAt("j")} AS BIGINT))),
              (a, b) -> (a * 131 + b) % 1000000007) AS plane_hash FROM g)
      SELECT g.doc_id, CAST(g.w AS INTEGER) AS width, CAST(g.h AS INTEGER) AS height,
        CAST(63 + sz.raw + 5 * (1 + (sz.raw - 1) // 65535) AS BIGINT) AS n_bytes,
        ph.plane_hash
      FROM g JOIN sz USING (doc_id) JOIN ph USING (doc_id) ORDER BY g.doc_id"""

  /** The qp111 oracle: under literal-only FIXED-HUFFMAN deflate the
    * compressed size is a pure function of the FILTERED scanline bytes
    * — 8 bits per value < 144, 9 bits per value ≥ 144 (RFC 1951
    * §3.2.6), plus 3 block-header + 7 EOB bits and 8 per filter byte —
    * so the oracle replays the None/Sub filtering byte-for-byte
    * (odd rows: (b − b₋₃) mod 256 from position 3 on) and accounts the
    * bit stream exactly; ceil-to-bytes + the 63 fixed container bytes.
    * plane_hash folds the logical plane as in qp110. idx spans
    * 3·39·39 = 4563 ≥ 3wh for every possible document. */
  private val pngHuffOracle: String =
    s"""WITH d AS (SELECT doc_id, octet_length(encode(text)) AS len,
          hex(encode(text)) AS hx FROM documents),
      g AS (SELECT doc_id, len, hx, 8 + len % 32 AS w,
            8 + (len * 17) % 32 AS h FROM d),
      idx AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 4563)),
      fb AS (SELECT g.doc_id, idx.i,
              CASE WHEN ((idx.i // (3 * g.w)) % 2) = 1 AND (idx.i % (3 * g.w)) >= 3
                   THEN ((${byteAt("idx.i")} - ${byteAt("idx.i - 3")}) % 256 + 256) % 256
                   ELSE ${byteAt("idx.i")} END AS v
             FROM g JOIN idx ON idx.i < 3 * g.w * g.h),
      bt AS (SELECT doc_id, SUM(CASE WHEN v >= 144 THEN 9 ELSE 8 END) AS pb
             FROM fb GROUP BY doc_id),
      sz AS (SELECT g.doc_id, 3 + 7 + 8 * g.h + bt.pb AS bits
             FROM g JOIN bt USING (doc_id)),
      ph AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(0, w * h * 3), j -> CAST(${byteAt("j")} AS BIGINT))),
              (a, b) -> (a * 131 + b) % 1000000007) AS plane_hash FROM g)
      SELECT g.doc_id, CAST(g.w AS INTEGER) AS width, CAST(g.h AS INTEGER) AS height,
        CAST(63 + (sz.bits + 7) // 8 AS BIGINT) AS n_bytes, ph.plane_hash
      FROM g JOIN sz ON sz.doc_id = g.doc_id JOIN ph ON ph.doc_id = g.doc_id
      ORDER BY g.doc_id"""

  /** The qp108 oracle: two classifications against a GROWING corpus —
    * batch 1 vs the base corpus, batch 2 vs corpus ∪ b1 (the appended
    * index). Verdicts are order-independent of the index's internal
    * prefix ranking (candidates are a superset under any fixed total
    * order; the exact Jaccard verify decides), so the full-truth joins
    * replay both steps. The REBUILD leg (corpus ∪ b1 ∪ b2 → overwrite
    * → reload → classify batch 3) is its own entry, qp108b in
    * [[Round16Queries]] — VERDICT r15 #1b: one entry honestly timing
    * two full index builds plus two bucketed writes was 30 % of the
    * official suite and unattributable under ambient I/O spikes. */
  private val loadedAppendOracle: String =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w,
          md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) fp FROM documents),
      s AS (SELECT doc_id, fp, list_distinct(list_transform(range(1, greatest(len(w)-2, 1) + 1),
              i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) sh FROM t),
      corpus AS (SELECT * FROM s WHERE doc_id % 8 >= 4),
      b1 AS (SELECT * FROM s WHERE doc_id % 8 = 0),
      b2 AS (SELECT * FROM s WHERE doc_id % 8 = 1),
      c2 AS (SELECT * FROM corpus UNION ALL SELECT * FROM b1),
      ex1 AS (SELECT DISTINCT b.doc_id FROM b1 b JOIN corpus c ON b.fp = c.fp),
      nr1 AS (SELECT DISTINCT b.doc_id FROM b1 b JOIN corpus c
              ON 5 * len(list_intersect(b.sh, c.sh)) >= 2 * len(list_distinct(list_concat(b.sh, c.sh)))),
      ex2 AS (SELECT DISTINCT b.doc_id FROM b2 b JOIN c2 c ON b.fp = c.fp),
      nr2 AS (SELECT DISTINCT b.doc_id FROM b2 b JOIN c2 c
              ON 5 * len(list_intersect(b.sh, c.sh)) >= 2 * len(list_distinct(list_concat(b.sh, c.sh)))),
      v AS (SELECT 1 AS batch, b.doc_id,
              CASE WHEN ex1.doc_id IS NOT NULL THEN 'exact'
                   WHEN nr1.doc_id IS NOT NULL THEN 'near' ELSE 'new' END AS verdict
            FROM b1 b LEFT JOIN ex1 ON ex1.doc_id = b.doc_id
            LEFT JOIN nr1 ON nr1.doc_id = b.doc_id
            UNION ALL
            SELECT 2 AS batch, b.doc_id,
              CASE WHEN ex2.doc_id IS NOT NULL THEN 'exact'
                   WHEN nr2.doc_id IS NOT NULL THEN 'near' ELSE 'new' END AS verdict
            FROM b2 b LEFT JOIN ex2 ON ex2.doc_id = b.doc_id
            LEFT JOIN nr2 ON nr2.doc_id = b.doc_id)
      SELECT batch, doc_id, verdict FROM v ORDER BY batch, doc_id"""

  val defs: Seq[QueryDef] = Seq(

    // ---- qp108: appends against a LOADED index --------------------------
    // qp105 proved load+classify; this entry exercises the leg the r14
    // verdict flagged untested: classifyAndAppend against the loaded,
    // UNCACHED bucketed index (only the O(|batch|) deltas and working
    // sets are cached — the corpus side stays warehouse reads, pinned in
    // Round15PipelineSpec). The rebuild-overwrite leg lives in qp108b
    // (VERDICT r15 #1b: the combined entry honestly timed TWO full index
    // builds + TWO bucketed writes and was 30 % of the official suite —
    // split, each leg is a single-build entry whose ambient spikes are
    // attributable). With no overwrite following in-entry, the round-15
    // verdict parquet sink is gone too: nothing invalidates the verdict
    // frames' caches before the bench/Verify sink materializes them,
    // which also removes the tmpdir I/O the driver-window `appends`
    // phase spiked on (ADVICE r15 #2/#3 are thereby moot — no positional
    // union over a written file, no leaked sink directory).
    QueryDef(
      "qp108_loaded_index_append",
      Some(loadedAppendOracle),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 8 >= 4)
        def b(k: Int) = docs.filter(col("doc_id") % 8 === k)
        graft.BenchPhases.timed("qp108_loaded_index_append.build_write") {
          val built = Dedup.buildCorpusShingleIndex(corpus, "doc_id", "text",
            shingleN = 3, thresholdNum = 2, thresholdDen = 5)
          Dedup.writeIndexTables(built, "graft_idx_qp108")
          built.release(blocking = true)
        }
        val loaded = Dedup.loadCorpusShingleIndex(s, "graft_idx_qp108")
        require(loaded.droppedPostings == 0,
          s"qp108 oracle invalid: posting cap dropped ${loaded.droppedPostings} bucket(s)")
        // two separately-phased appends (VERDICT r15 #1a): each call's
        // eager delta materialization is its own sub-timing, so a blown
        // isolated rep points at append 1 vs append 2 vs the build
        val (v1raw, idx1) =
          graft.BenchPhases.timed("qp108_loaded_index_append.append1") {
            Dedup.classifyAndAppend(loaded, b(0), "doc_id", "text")
          }
        val (v2raw, idx2) =
          graft.BenchPhases.timed("qp108_loaded_index_append.append2") {
            Dedup.classifyAndAppend(idx1, b(1), "doc_id", "text")
          }
        require(idx2.droppedPostings == 0,
          s"qp108 oracle invalid after appends: cap dropped ${idx2.droppedPostings} bucket(s)")
        v1raw.withColumn("batch", lit(1))
          .unionByName(v2raw.withColumn("batch", lit(2)))
          .select(col("batch"), col("id").as("doc_id"), col("verdict"))
          .orderBy(col("batch"), col("doc_id"))
      }),

    // ---- qp109: the approx quantile tier end-to-end under the oracle ----
    // qualityQuantileAuto with approxOverRows = 1 forces the GK branch;
    // at accuracy ≫ max source rows the GK summary never compresses, so
    // percentile_approx returns EXACTLY the order statistic at rank
    // ⌈n·q⌉ — which the oracle's window replays — and passes 2–3 are
    // the same oracled machinery as qp106. The eager guard keeps the
    // oracle honest: if a future fixture breaks the accuracy ≫ n
    // premise the entry fails loudly instead of hash-mismatching.
    QueryDef(
      "qp109_quality_quantile_approx",
      Some("""WITH scored AS (
          SELECT doc_id AS id, source,
                 CAST(floor(1000.0 * len(list_distinct(string_split_regex(trim(text), '\s+')))
                      / len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS score
          FROM documents
          WHERE len(string_split_regex(trim(text), '\s+')) > 0),
        thr AS (
          SELECT source, score AS t FROM (
            SELECT source, score,
                   row_number() OVER (PARTITION BY source ORDER BY score, id) rk,
                   count(*) OVER (PARTITION BY source) n
            FROM scored)
          WHERE rk = greatest(1, (n + 3) // 4)),
        st AS (
          SELECT s.source, t, count(*) n,
                 count(CASE WHEN score < t THEN 1 END) below,
                 count(CASE WHEN score = t THEN 1 END) tie
          FROM scored s JOIN thr USING (source) GROUP BY s.source, t),
        cut AS (
          SELECT source, t,
                 CASE WHEN needdrop <= 0 THEN -1
                      ELSE (CAST(needdrop AS HUGEINT) * 1000000007 - 1) // tie END AS c
          FROM (SELECT source, t, tie,
                       greatest(0, least(tie, n // 4 - below)) AS needdrop
                FROM st))
        SELECT s.id, s.source, s.score,
               (s.score > t OR (s.score = t AND
                 ((s.id * 22695477 + 1) % 1000000007 + 1000000007)
                   % 1000000007 > c)) AS kept
        FROM scored s JOIN cut USING (source)
        ORDER BY s.id"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val accuracy = 1000000
        // oracle-validity guard: GK at this accuracy is exact iff no
        // source outgrows it by orders of magnitude — the summary holds
        // every sample while 2·(n/accuracy) < 1, i.e. n < accuracy/2
        // (the auto gate runs the same aggregate again for its dispatch
        // probe — accepted: this one is oracle-validity machinery and
        // the fixture-scale cost is two small aggregate jobs)
        val maxRow = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).head()
        val maxPerSource = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
        require(maxPerSource < accuracy / 2,
          s"qp109 oracle invalid: a source holds $maxPerSource rows >= " +
            s"accuracy/2 (${accuracy / 2}) — GK may compress and drift " +
            "off the exact rank-ceil(n*q) threshold")
        // the gate dispatches approx only when maxPerSource > approxOverRows
        // (strictly greater): a degenerate fixture of single-row sources
        // would silently run the EXACT tier under this entry's name
        require(maxPerSource > 1L,
          "qp109 oracle invalid: every source has <= 1 row, so " +
            "qualityQuantileAuto(approxOverRows = 1) would dispatch the " +
            "exact tier — the entry would no longer exercise GK")
        Curation.qualityQuantileAuto(docs, "doc_id", "text", "source",
          qNum = 1, qDen = 4, approxOverRows = 1L, accuracy = accuracy)
      }),

    // ---- qp110: PNG roundtrip (stored-deflate, CRC'd chunks) -------------
    QueryDef(
      "qp110_png_roundtrip",
      Some(pngOracle),
      (s, dir) =>
        Multimodal.pngPlaneMeta(Multimodal.encodePng(
            Tables.load(s, dir, "documents"), "doc_id", "text"))
          .toDF()
          .orderBy(col("doc_id"))),

    // ---- qp112: decode the platform zlib's output (dynamic Huffman) ------
    // the payload is compressed by java.util.zip.Deflater (default
    // level: LZ77 matches + dynamic-Huffman blocks) and decoded by OUR
    // full RFC 1951 inflater — the externally-compressed class a real
    // pipeline ingests. The oracle checks geometry + decoded plane;
    // n_bytes is deliberately absent (zlib's block-choice heuristics
    // are not replayable in SQL — this entry proves the DECODER).
    QueryDef(
      "qp112_png_zlib_decode",
      Some(s"""WITH d AS (SELECT doc_id, octet_length(encode(text)) AS len,
            hex(encode(text)) AS hx FROM documents),
        g AS (SELECT doc_id, len, hx, 8 + len % 32 AS w,
              8 + (len * 19) % 32 AS h FROM d),
        ph AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(0, w * h * 3), j -> CAST(${byteAt("j")} AS BIGINT))),
                (a, b) -> (a * 131 + b) % 1000000007) AS plane_hash FROM g)
        SELECT g.doc_id, CAST(g.w AS INTEGER) AS width,
          CAST(g.h AS INTEGER) AS height, ph.plane_hash
        FROM g JOIN ph USING (doc_id) ORDER BY g.doc_id"""),
      (s, dir) =>
        Multimodal.pngPlaneMeta(Multimodal.encodePngZlib(
            Tables.load(s, dir, "documents"), "doc_id", "text"))
          .toDF()
          .select(col("doc_id"), col("width"), col("height"), col("plane_hash"))
          .orderBy(col("doc_id"))),

    // ---- qp111: PNG under REAL entropy coding (fixed Huffman) ------------
    // the oracle predicts the entropy-coded size bit-for-bit from the
    // filtered scanlines; plane_hash proves the Huffman decode undid
    // the whole stack (codewords → raw stream → Adler → filters)
    QueryDef(
      "qp111_png_huffman_roundtrip",
      Some(pngHuffOracle),
      (s, dir) =>
        Multimodal.pngPlaneMeta(Multimodal.encodePngHuffman(
            Tables.load(s, dir, "documents"), "doc_id", "text"))
          .toDF()
          .orderBy(col("doc_id")))
  )
}
