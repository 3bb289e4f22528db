package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-data-pipeline operators:
  * tokenization, word shingles, MinHash signatures, SimHash, document
  * fingerprints, and quality/language heuristics.
  *
  * Everything is built from codegen'd Spark builtins (higher-order array
  * functions + xxhash64) — no UDFs — so these run inside whole-stage
  * codegen and scale linearly with input bytes.
  */
object TextOps {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count with the empty-document corner mapped to 0:
    * splitting an empty string yields one empty token (in Spark and in
    * DuckDB alike), but a document with no non-space characters has zero
    * tokens. NULL text also counts as 0. SQL mirror:
    * `CASE WHEN COALESCE(trim(text), '') = '' THEN 0
    *       ELSE len(string_split_regex(trim(text), '\s+')) END`. */
  def wsTokenCount(text: Column): Column =
    when(coalesce(trim(text), lit("")) === "", lit(0))
      .otherwise(size(tokens(text)))

  /** Subword-style tokens via a BPE-like pre-tokenizer regex: runs of
    * letters, runs of digits, or runs of other non-space symbols each
    * become one token. This is the cheap, engine-portable stand-in for a
    * real BPE vocab merge — the count it yields tracks LLM token counts
    * far better than whitespace words on punctuation-heavy text.
    * regexp_extract_all (codegen'd, same function in DuckDB) — no
    * higher-order lambdas. */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[\\p{L}]+|[0-9]+|[^\\p{L}0-9\\s]+"), lit(0))

  /** BPE-ish token count (see bpeishTokens). */
  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** Distinct n-word shingles (1-based slice; short docs yield the single
    * shingle of whatever words exist). */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(t) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(t, i, lit(n)))))
  }

  // NOTE: MinHash signatures and SimHash are built in [[Dedup]] via
  // explode + wide codegen'd aggregates, NOT as array-lambda Columns —
  // higher-order functions evaluate on the interpreted path per element
  // and were ~10× slower at sf0.1.

  /** Hamming distance between two packed 64-bit SimHashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Stable document fingerprint: md5 of case-folded, whitespace-collapsed
    * text (reproducible in any engine, unlike engine-native hashes). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  // ---- language-ID heuristic (stopword hits per language) ----

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "por", "para"))

  /** Distinct-stopword hit count for one language. */
  def stopwordHits(toks: Column, lang: String): Column =
    size(array_intersect(array_distinct(toks),
      array(stopwords(lang).map(lit): _*)))

  /** Argmax language with a fixed tie order en > de > fr > es, 'und'
    * (undetermined) when no stopword hits at all. */
  def languageGuess(toks: Column): Column = {
    val en = stopwordHits(toks, "en"); val de = stopwordHits(toks, "de")
    val fr = stopwordHits(toks, "fr"); val es = stopwordHits(toks, "es")
    when(en + de + fr + es === 0, "und")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }
}
