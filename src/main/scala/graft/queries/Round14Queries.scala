package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{Curation, Dedup, Multimodal}

/** Round-14 additions — the deployment/oracle-depth items from VERDICT
  * r13:
  *
  *  - qp105: the BUCKETED-TABLE index deployment (missing #2) — build
  *    the corpus shingle index, write it through the catalog as
  *    parquet tables bucketed on the join keys, RELEASE every session
  *    cache, reload from disk, classify. A hash-green entry proves a
  *    new session can classify without re-shingling the corpus
  *    (Round14PipelineSpec pins the plan: no live corpus scan, reads
  *    come from warehouse files).
  *  - qp106: the approx quantile tier's pass-2/3 machinery under a
  *    DuckDB oracle (r13 next #6) — GK itself is not engine-portable,
  *    but the rank-selected exact threshold is, and passes 2–3 (tie
  *    stats + overflow-safe hash split) are IDENTICAL code between the
  *    exact-threshold and percentile_approx tiers
  *    ([[graft.pipeline.Curation.tieSplitFromThreshold]]).
  */
object Round14Queries {

  import OracleBytes.byteAt

  /** The qp107 oracle: predict the RLE-compressed TGA payload size and
    * the decoded-plane checksum from the fixture construction. Packet
    * accounting is the gaps-and-islands form — within-row runs via a
    * lag break + prefix-sum island id, run packets (length ≥ 2) at 4
    * bytes, maximal singleton stretches as one literal packet at
    * 1 + 3·m — EXACT because w = 8 + len % 32 ≤ 39 < 128 by
    * construction, so no packet ever chunks (the engine's chunking
    * branch is dead at fixture geometry; see `Multimodal.writeTgaRle`).
    * Row order cancels out of the size (packets never cross rows). */
  private val tgaOracle: String =
    s"""WITH d AS (SELECT doc_id, octet_length(encode(text)) AS len,
          hex(encode(text)) AS hx FROM documents),
      g AS (SELECT doc_id, len, hx, 8 + len % 32 AS w, 8 + (len * 11) % 32 AS h FROM d),
      idx AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 1521)),
      px AS (SELECT g.doc_id, g.w, idx.i, idx.i // g.w AS r,
              ${byteAt("3*idx.i")} * 65536 + ${byteAt("3*idx.i+1")} * 256 +
              ${byteAt("3*idx.i+2")} AS pv
             FROM g JOIN idx ON idx.i < g.w * g.h),
      rns AS (SELECT doc_id, r, i, pv,
               CASE WHEN lag(pv) OVER (PARTITION BY doc_id, r ORDER BY i) = pv
                    THEN 0 ELSE 1 END AS brk
              FROM px),
      isl AS (SELECT doc_id, r, i,
               SUM(brk) OVER (PARTITION BY doc_id, r ORDER BY i) AS runid FROM rns),
      runs AS (SELECT doc_id, r, runid, count(*) AS rl
               FROM isl GROUP BY doc_id, r, runid),
      rx AS (SELECT doc_id, r, runid, rl,
              lag(rl, 1, 0) OVER (PARTITION BY doc_id, r ORDER BY runid) AS prevrl
             FROM runs),
      litg AS (SELECT doc_id, r, runid, rl,
                SUM(CASE WHEN rl = 1 AND prevrl <> 1 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id, r ORDER BY runid) AS gid FROM rx),
      pk AS (SELECT doc_id, CAST(1 + 3 * count(*) AS BIGINT) AS b
             FROM litg WHERE rl = 1 GROUP BY doc_id, r, gid
             UNION ALL
             SELECT doc_id, CAST(4 * count(*) AS BIGINT) AS b
             FROM rx WHERE rl >= 2 GROUP BY doc_id),
      bod AS (SELECT doc_id, SUM(b) AS body FROM pk GROUP BY doc_id),
      ph AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(0, w * h * 3), j -> CAST(${byteAt("j")} AS BIGINT))),
              (a, b) -> (a * 131 + b) % 1000000007) AS plane_hash FROM g)
      SELECT g.doc_id, CAST(g.w AS INTEGER) AS width, CAST(g.h AS INTEGER) AS height,
        CAST(18 + bod.body AS BIGINT) AS n_bytes, ph.plane_hash
      FROM g JOIN bod USING (doc_id) JOIN ph USING (doc_id) ORDER BY g.doc_id"""

  val defs: Seq[QueryDef] = Seq(

    // ---- qp105: index → bucketed tables → fresh load → classify ---------
    // corpus = docs with id%4≠0, batch = id%4=0 (a different split than
    // qp100/qp103 on purpose). The entry's timing honestly includes the
    // build AND the table write — the deployment cost a production
    // pipeline pays once per rebuild cadence.
    QueryDef(
      "qp105_index_disk_roundtrip",
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w,
            md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) fp FROM documents),
        s AS (SELECT doc_id, fp, list_distinct(list_transform(range(1, greatest(len(w)-2, 1) + 1),
                i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) sh FROM t),
        corpus AS (SELECT * FROM s WHERE doc_id % 4 <> 0),
        b AS (SELECT * FROM s WHERE doc_id % 4 = 0),
        ex AS (SELECT DISTINCT b.doc_id FROM b JOIN corpus c ON b.fp = c.fp),
        nr AS (SELECT DISTINCT b.doc_id FROM b JOIN corpus c
               ON 5 * len(list_intersect(b.sh, c.sh)) >= 2 * len(list_distinct(list_concat(b.sh, c.sh))))
        SELECT b.doc_id,
          CASE WHEN ex.doc_id IS NOT NULL THEN 'exact'
               WHEN nr.doc_id IS NOT NULL THEN 'near' ELSE 'new' END AS verdict
        FROM b LEFT JOIN ex ON ex.doc_id = b.doc_id
        LEFT JOIN nr ON nr.doc_id = b.doc_id ORDER BY b.doc_id"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 4 =!= 0)
        val batch = docs.filter(col("doc_id") % 4 === 0)
        // phase sub-timings (VERDICT r14 #2): the entry's one number
        // spans build, bucketed write and load+classify; the in-file
        // phases make an ambient hit attributable — load+classify (the
        // steady-state cost) is the entry total minus these two
        val built = graft.BenchPhases.timed("qp105_index_disk_roundtrip.build") {
          Dedup.buildCorpusShingleIndex(corpus, "doc_id", "text",
            shingleN = 3, thresholdNum = 2, thresholdDen = 5)
        }
        graft.BenchPhases.timed("qp105_index_disk_roundtrip.write") {
          Dedup.writeIndexTables(built, "graft_idx_qp105")
        }
        // from here on NOTHING of the build may be consulted: drop every
        // session cache, then classify purely from the on-disk tables
        built.release(blocking = true)
        val loaded = Dedup.loadCorpusShingleIndex(s, "graft_idx_qp105")
        require(loaded.droppedPostings == 0,
          s"qp105 oracle invalid: posting cap dropped ${loaded.droppedPostings} bucket(s)")
        Dedup.incrementalNearDupIndexed(loaded, batch, "doc_id", "text")
          .select(col("id").as("doc_id"), col("verdict"))
          .orderBy(col("doc_id"))
      }),

    // ---- qp106: exact-threshold quantile filter, tie split oracled ------
    // pass 1: per-source threshold = score at rank ⌊n·q⌋ in (score, id)
    // order — exact, hence replayable in DuckDB; passes 2–3: the SAME
    // stats + overflow-safe tie-cutoff + portable hash split the approx
    // tier runs. q = 1/4 over the per-mille TTR score.
    QueryDef(
      "qp106_quality_quantile_threshold",
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
          WHERE rk = greatest(1, n // 4)),
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
      (s, dir) =>
        Curation.qualityQuantileFilterExactThreshold(
          Tables.load(s, dir, "documents"), "doc_id", "text", "source",
          qNum = 1, qDen = 4)),

    // ---- qp107: RLE-compressed TGA roundtrip ----------------------------
    // the first COMPRESSED container: encode → full packet-stream decode
    // → meta. n_bytes is the compressed size (data-dependent, the
    // oracle's packet accounting predicts it exactly); plane_hash folds
    // the decoded logical plane, so green proves packet parse, run
    // expansion AND the bottom-up un-flip.
    QueryDef(
      "qp107_tga_rle_roundtrip",
      Some(tgaOracle),
      (s, dir) =>
        Multimodal.tgaPlaneMeta(Multimodal.encodeTga(
            Tables.load(s, dir, "documents"), "doc_id", "text"))
          .toDF()
          .orderBy(col("doc_id")))
  )
}
