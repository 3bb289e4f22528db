package graft.queries

/** Round-8 additions.
  *
  * Diagnostics: qp76a extends qe75's tokenizer pin from `doc_id < 100`
  * to the FULL documents table — its verdict tells us whether the
  * BPE-ish regex (`[\p{L}]+|[0-9]+|[^\p{L}0-9\s]+`,
  * /root/reference-independent; see TextOps.bpeishTokens) is safe for
  * any future oracle on the driver's DuckDB build. qp76 itself no
  * longer depends on it (the packing entry is tokenizer-portable as of
  * r8 — Round6Queries.scala).
  *
  * Dialect: the r7 missing-list corners — theta-correlated scalar
  * DISTINCT bodies, WITH TIES + OFFSET inside correlated IN bodies,
  * nested IN bodies with LIMIT/OFFSET under grandparent correlation —
  * all shapes the reference grammar composes freely
  * (/root/reference/src/parser/mod.rs:1229-1245,293-297,503-544,
  * 1404,1439-1440).
  */
object Round8Queries {

  import org.apache.spark.sql.functions._
  import graft.Tables

  private def engineSql(name: String, oracle: String, nutql: String): QueryDef =
    QueryDef(name, Some(oracle), (s, dir) => Engines.get(s, dir).execute(nutql))

  val defs: Seq[QueryDef] = Seq(

    // ---- full-range tokenizer pin (VERDICT r7 #1a) ----------------------
    // qe75 proved both tokenizers driver-portable for doc_id < 100; this
    // entry drops the filter so the verdict covers every document the
    // suite ever tokenizes. If this is green, the bpeish regex is safe
    // for future oracles on the driver's DuckDB build; if red, the
    // per-column decomposition (ws vs bpeish) localizes the construct.
    QueryDef("qp76a_tokens_full",
      Some("""SELECT doc_id,
                CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
                CAST(len(regexp_extract_all(text, '[\p{L}]+|[0-9]+|[^\p{L}0-9\s]+')) AS BIGINT) AS bpeish_tokens
              FROM documents ORDER BY doc_id"""),
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            size(graft.pipeline.TextOps.tokens(col("text"))).cast("long").as("ws_tokens"),
            graft.pipeline.TextOps.bpeishTokenCount(col("text")).cast("long").as("bpeish_tokens"))
          .orderBy(col("doc_id"))
      })
  )
}
