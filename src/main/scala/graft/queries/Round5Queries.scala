package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.Dedup

/** Round-5 additions: the exact n-gram Jaccard dedup tier (the brief's
  * dedup list names it beside MinHash/SimHash — until now it only
  * existed as qp50's verification step). */
object Round5Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- exact n-gram Jaccard near-dup pairs ----------------------------
    // Prefix-filtered inverted-index candidates + exact array verify —
    // no MinHash approximation anywhere, so the oracle equivalence is
    // exact by construction, not a recall argument. Trigrams at a 0.4
    // threshold exercise a different corner than qp50's 0.5 (and a
    // lower threshold is exactly where LSH banding loses recall and the
    // exact tier earns its keep).
    QueryDef(
      "qp63_ngram_jaccard",
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents),
        s AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w)-2, 1) + 1),
                i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) sh FROM t)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) AS sim
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE 5 * len(list_intersect(a.sh, b.sh)) >= 2 * len(list_distinct(list_concat(a.sh, b.sh)))
        ORDER BY id_a, id_b"""),
      (s, dir) => Dedup.ngramJaccardPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, thresholdNum = 2, thresholdDen = 5)))
}
