package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{Dedup, Multimodal, Sketches}

/** Round-13 additions — the pipeline-depth items from VERDICT r12:
  *
  *  - qp100: the REUSABLE corpus shingle index
  *    ([[graft.pipeline.Dedup.buildCorpusShingleIndex]]) classifying TWO
  *    successive batches against one build — the production
  *    continuous-ingestion shape (VERDICT r12 missing #1). The second
  *    verdict call provably reads only cached index frames
  *    (Round13PipelineSpec pins the batch-only scan plan).
  *  - qp101: ingest-time NEAR dedup (missing #2) — the same indexed
  *    verdict operator run per micro-batch inside foreachBatch against
  *    the prebuilt static index; the streaming query is stateless and
  *    the runner asserts it from the query's own progress events.
  *  - qp102: the KMV merge property end-to-end — two per-half sketches
  *    merged, estimated; the oracle sketches the UNION directly, so a
  *    hash-green entry IS the merge theorem on real data.
  */
object Round13Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- qp100: two batches against one prebuilt corpus index ----------
    // corpus = docs with id%5≠0 ∧ id%7≠0; batch 1 = id%5=0, batch 2 =
    // id%7=0 (minus batch-1 overlap). The index is built ONCE (eager —
    // its cost is paid inside this entry's timing, honestly); both
    // verdict calls are index-read-only. Verdicts match the one-shot
    // qp93 semantics: exact by normalized fingerprint, near by trigram
    // Jaccard >= 2/5 against SOME corpus doc, else new.
    QueryDef(
      "qp100_indexed_incremental_dedup",
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w,
            md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) fp FROM documents),
        s AS (SELECT doc_id, fp, list_distinct(list_transform(range(1, greatest(len(w)-2, 1) + 1),
                i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) sh FROM t),
        corpus AS (SELECT * FROM s WHERE doc_id % 5 <> 0 AND doc_id % 7 <> 0),
        b AS (SELECT 1 AS batch, * FROM s WHERE doc_id % 5 = 0
              UNION ALL
              SELECT 2 AS batch, * FROM s WHERE doc_id % 5 <> 0 AND doc_id % 7 = 0),
        ex AS (SELECT DISTINCT b.batch, b.doc_id FROM b JOIN corpus c ON b.fp = c.fp),
        nr AS (SELECT DISTINCT b.batch, b.doc_id FROM b JOIN corpus c
               ON 5 * len(list_intersect(b.sh, c.sh)) >= 2 * len(list_distinct(list_concat(b.sh, c.sh))))
        SELECT b.batch, b.doc_id,
          CASE WHEN ex.doc_id IS NOT NULL THEN 'exact'
               WHEN nr.doc_id IS NOT NULL THEN 'near' ELSE 'new' END AS verdict
        FROM b LEFT JOIN ex ON ex.batch = b.batch AND ex.doc_id = b.doc_id
        LEFT JOIN nr ON nr.batch = b.batch AND nr.doc_id = b.doc_id
        ORDER BY b.batch, b.doc_id"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 =!= 0)
        val idx = Dedup.buildCorpusShingleIndex(corpus, "doc_id", "text",
          shingleN = 3, thresholdNum = 2, thresholdDen = 5)
        // the UNCAPPED oracle SQL is only equivalent while the posting
        // cap dropped nothing (ADVICE r13 #2) — fail loudly, don't
        // silently hash-mismatch, if a fixture change ever trips it
        require(idx.droppedPostings == 0,
          s"qp100 oracle invalid: posting cap dropped ${idx.droppedPostings} bucket(s)")
        val b1 = Dedup.incrementalNearDupIndexed(idx,
            docs.filter(col("doc_id") % 5 === 0), "doc_id", "text")
          .withColumn("batch", lit(1))
        val b2 = Dedup.incrementalNearDupIndexed(idx,
            docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 === 0),
            "doc_id", "text")
          .withColumn("batch", lit(2))
        b1.unionAll(b2)
          .select(col("batch"), col("id").as("doc_id"), col("verdict"))
          .orderBy(col("batch"), col("doc_id"))
      }),

    // ---- qp101: ingest-time NEAR dedup (stream × static index) ---------
    // every 3rd doc replayed as the arriving stream, classified per
    // micro-batch by the SAME indexed operator qp100 uses in batch mode
    // (threshold 1/2 — different parameters than qp93/qp100 on purpose).
    // The static corpus index is built once before the stream starts;
    // the streaming query holds no state (runner-asserted).
    QueryDef(
      "qp101_stream_ingest_neardup",
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w,
            md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) fp FROM documents),
        s AS (SELECT doc_id, fp, list_distinct(list_transform(range(1, greatest(len(w)-2, 1) + 1),
                i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) sh FROM t),
        corpus AS (SELECT * FROM s WHERE doc_id % 3 <> 0),
        batch AS (SELECT * FROM s WHERE doc_id % 3 = 0),
        ex AS (SELECT DISTINCT b.doc_id FROM batch b JOIN corpus c ON b.fp = c.fp),
        nr AS (SELECT DISTINCT b.doc_id FROM batch b JOIN corpus c
               ON 2 * len(list_intersect(b.sh, c.sh)) >= len(list_distinct(list_concat(b.sh, c.sh))))
        SELECT b.doc_id,
          CASE WHEN ex.doc_id IS NOT NULL THEN 'exact'
               WHEN nr.doc_id IS NOT NULL THEN 'near' ELSE 'new' END AS verdict
        FROM batch b LEFT JOIN ex ON ex.doc_id = b.doc_id
        LEFT JOIN nr ON nr.doc_id = b.doc_id ORDER BY b.doc_id"""),
      (s, dir) => {
        val corpus = Tables.load(s, dir, "documents")
          .filter(col("doc_id") % 3 =!= 0)
        val idx = Dedup.buildCorpusShingleIndex(corpus, "doc_id", "text",
          shingleN = 3, thresholdNum = 1, thresholdDen = 2)
        require(idx.droppedPostings == 0,
          s"qp101 oracle invalid: posting cap dropped ${idx.droppedPostings} bucket(s)")
        StreamRunner.replayParquetBatches(s, s"$dir/documents.parquet",
            assertStateless = true) { b =>
          Dedup.incrementalNearDupIndexed(idx,
            b.filter(col("doc_id") % 3 === 0), "doc_id", "text")
        }.select(col("id").as("doc_id"), col("verdict"))
          .orderBy(col("doc_id"))
      }),

    // ---- qp103: the FULL continuous-ingestion loop ----------------------
    // classify batch 1 against the index, APPEND batch 1 into the index
    // (O(|batch|) deltas under the frozen build-time order — no corpus
    // rebuild), then classify batch 2 against corpus ∪ batch 1: batch-2
    // verdicts can now be exact/near against batch-1 documents. The
    // oracle replays both classifications against their respective
    // corpora with full-truth joins.
    QueryDef(
      "qp103_index_append_loop",
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w,
            md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) fp FROM documents),
        s AS (SELECT doc_id, fp, list_distinct(list_transform(range(1, greatest(len(w)-2, 1) + 1),
                i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) sh FROM t),
        corpus AS (SELECT * FROM s WHERE doc_id % 5 <> 0 AND doc_id % 7 <> 0),
        b1 AS (SELECT * FROM s WHERE doc_id % 5 = 0),
        b2 AS (SELECT * FROM s WHERE doc_id % 5 <> 0 AND doc_id % 7 = 0),
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
        SELECT batch, doc_id, verdict FROM v ORDER BY batch, doc_id"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 =!= 0)
        val b1 = docs.filter(col("doc_id") % 5 === 0)
        val b2 = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 === 0)
        // phase sub-timings (round 15): qp103's isolated spread has been
        // the suite's widest two rounds running — the in-file split
        // attributes a degraded rep to the eager build vs the append
        val idx = graft.BenchPhases.timed("qp103_index_append_loop.build") {
          Dedup.buildCorpusShingleIndex(corpus, "doc_id", "text",
            shingleN = 3, thresholdNum = 2, thresholdDen = 5)
        }
        require(idx.droppedPostings == 0,
          s"qp103 oracle invalid: posting cap dropped ${idx.droppedPostings} bucket(s)")
        // classify + ingest share one batch working set (the production
        // per-batch step); batch 2 then sees corpus ∪ batch 1
        val (v1raw, idx2) = graft.BenchPhases.timed("qp103_index_append_loop.append") {
          Dedup.classifyAndAppend(idx, b1, "doc_id", "text")
        }
        val v1 = v1raw.withColumn("batch", lit(1))
        require(idx2.droppedPostings == 0,
          s"qp103 oracle invalid after append: cap dropped ${idx2.droppedPostings} bucket(s)")
        val v2 = Dedup.incrementalNearDupIndexed(idx2, b2, "doc_id", "text")
          .withColumn("batch", lit(2))
        v1.unionAll(v2)
          .select(col("batch"), col("id").as("doc_id"), col("verdict"))
          .orderBy(col("batch"), col("doc_id"))
      }),

    // ---- qp102: KMV sketch merge — estimate of a UNION from two halves --
    // engine: sketch each event-id-parity half separately, MERGE the two
    // sketches (row-local k-smallest-of-union), estimate. oracle: one
    // direct KMV over the union — equal iff the merge property holds,
    // so this entry is the mergeability proof on real data. k=64 keeps
    // the estimator (not the exact small-group path) engaged: sf0.01
    // events carry ~thousands of distinct users per type.
    QueryDef(
      "qp102_kmv_union_merge",
      Some("""WITH h AS (SELECT DISTINCT event_type grp,
            (user_id * 1103515245 + 12345) % 1000000007 h FROM events
            WHERE user_id IS NOT NULL),
        r AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) rk FROM h),
        t AS (SELECT grp, max(h) hk, CAST(count(*) AS BIGINT) m
              FROM r WHERE rk <= 64 GROUP BY grp)
        SELECT grp AS event_type,
          CASE WHEN m < 64 THEN m
               ELSE CAST(floor(63000000441.0 / hk) AS BIGINT) END AS n_est
        FROM t ORDER BY event_type"""),
      (s, dir) => {
        val events = Tables.load(s, dir, "events")
        val sa = Sketches.kmvSketch(
          events.filter(col("event_id") % 2 === 0), "user_id", "event_type", k = 64)
        val sb = Sketches.kmvSketch(
          events.filter(col("event_id") % 2 =!= 0), "user_id", "event_type", k = 64)
        Sketches.kmvEstimate(Sketches.kmvMerge(sa, sb, k = 64), k = 64)
          .select(col("grp").as("event_type"), col("n_est"))
      }),

    // ---- qp104: REAL 24-bit BMP decode + resample ------------------------
    // the third real codec and a different CONTAINER class: little-endian
    // binary header, BOTTOM-UP row storage, 4-byte row padding. The
    // checksum folds the LOGICAL top-down plane, so a green hash proves
    // the decoder undid the flip and the padding (netpbm never exercised
    // either). Fixture dims h = 8 + 7·len % 32; resample 2/3 nearest.
    // Byte-indexed oracle (round 14): plane bytes come from
    // hex(encode(text)) — see the qp98 note; no character
    // indexing, so the oracle holds on non-ASCII text too.
    QueryDef(
      "qp104_bmp_resize",
      Some(OracleBytes.expand(
        """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS len,
                hex(encode(text)) AS hx FROM documents),
          g AS (SELECT doc_id, len, hx,
                8 + len % 32 AS w, 8 + (len * 7) % 32 AS h FROM d),
          o AS (SELECT doc_id, len, hx, w, h,
                greatest((w * 2) // 3, 1) AS ow, greatest((h * 2) // 3, 1) AS oh FROM g),
          p AS (SELECT doc_id, ow, oh,
                CAST(54 + oh * ((3 * ow + 3) // 4 * 4) AS BIGINT) AS n_bytes,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(range(0, ow * oh * 3), i ->
                    CAST(BYTEAT{((((i // 3) // ow) * h // oh) * w
                      + ((i // 3) % ow) * w // ow) * 3 + (i % 3)} AS BIGINT))),
                  (a, b) -> (a * 131 + b) % 1000000007) AS plane_hash
                FROM o)
          SELECT doc_id, CAST(ow AS INTEGER) AS width,
              CAST(oh AS INTEGER) AS height, n_bytes, plane_hash
          FROM p ORDER BY doc_id""")),
      (s, dir) =>
        Multimodal.bmpPlaneMeta(Multimodal.resizeBmp(Multimodal.encodeBmp(
            Tables.load(s, dir, "documents"), "doc_id", "text"), 2, 3))
          .toDF()
          .orderBy(col("doc_id")))
  )
}
