package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.Curation

/** Round-5 corpus-curation entries (qp65–qp69): the training-data
  * pipeline operators a 100 TB curation run needs beyond dedup and
  * similarity — Gopher-style repetition stats, n-gram test-set
  * decontamination, PII detection/redaction, temperature-weighted
  * source mixing, and event sessionization. Every entry is
  * integer-exact (counts and rates, no float thresholds) so the DuckDB
  * oracle compare is bit-stable. */
object CurationQueries {

  /** Unique memory-sink names across repeated runs (bench runs each
    * entry twice in one session). */
  private val streamRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  val defs: Seq[QueryDef] = Seq(

    // ---- Gopher-style repetition stats ----------------------------------
    // exact inputs to the repetition quality filters: word/bigram totals,
    // distinct counts, and top-gram occurrence counts per document
    QueryDef(
      "qp65_repetition_stats",
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents),
          words AS (SELECT doc_id, unnest(w) s FROM t),
          wc AS (SELECT doc_id, s, count(*) c FROM words GROUP BY 1, 2),
          ws AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) n_words,
                   CAST(COUNT(*) AS BIGINT) n_distinct_words,
                   CAST(MAX(c) AS BIGINT) top_word_cnt FROM wc GROUP BY 1),
          bg AS (SELECT doc_id, concat_ws(' ', w[i], w[i+1]) s
                 FROM t, UNNEST(range(1, greatest(len(w)-1, 1) + 1)) u(i)),
          bc AS (SELECT doc_id, s, count(*) c FROM bg GROUP BY 1, 2),
          bs AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) n_bigrams,
                   CAST(COUNT(*) AS BIGINT) n_distinct_bigrams,
                   CAST(MAX(c) AS BIGINT) top_bigram_cnt FROM bc GROUP BY 1)
          SELECT ws.doc_id, n_words, n_distinct_words, top_word_cnt,
                 n_bigrams, n_distinct_bigrams, top_bigram_cnt
          FROM ws JOIN bs ON ws.doc_id = bs.doc_id ORDER BY ws.doc_id"""),
      (s, dir) => Curation.repetitionStats(
        Tables.load(s, dir, "documents"), "doc_id", "text")),

    // ---- n-gram test-set decontamination ---------------------------------
    // benchmark = every 50th document (an evaluation suite is small by
    // construction); corpus docs sharing any word 4-gram with it are
    // contaminated. The benchmark n-gram set broadcasts — the corpus
    // stream is never shuffled.
    QueryDef(
      "qp66_decontaminate",
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents),
          g AS (SELECT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3]) s
                FROM t, UNNEST(range(1, greatest(len(w)-3, 1) + 1)) u(i)),
          bench AS (SELECT DISTINCT s FROM g WHERE doc_id % 50 = 0),
          corp AS (SELECT DISTINCT doc_id, s FROM g WHERE doc_id % 50 <> 0)
          SELECT DISTINCT corp.doc_id FROM corp JOIN bench USING (s)
          ORDER BY doc_id"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Curation.contaminatedIds(
          docs.filter(pmod(col("doc_id"), lit(50)) =!= 0), "doc_id", "text",
          docs.filter(pmod(col("doc_id"), lit(50)) === 0), "doc_id", "text",
          ngram = 4)
      }),

    // ---- PII detection + redaction ---------------------------------------
    // The synthetic corpus carries no PII, so both sides plant the same
    // deterministic contact lines derived from doc_id (visible in the
    // oracle SQL — this tests the operator, not hidden data). The entry
    // checks detection counts per source AND that redaction removes
    // every match (pii_after is computed post-redaction).
    QueryDef(
      "qp67_pii_scrub",
      Some("""WITH p AS (SELECT doc_id, source,
            text || ' contact user' || CAST(doc_id AS VARCHAR) || '@ex.org or +1-555-' ||
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
            CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-6789' ELSE '' END ||
            CASE WHEN doc_id % 5 = 0 THEN ' host 10.0.0.1' ELSE '' END AS t
          FROM documents),
          r AS (SELECT doc_id, source, t,
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                  '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[SSN]', 'g'),
                '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g'),
              '\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}([-. ][0-9]{3,4})?', '[PHONE]', 'g') AS red
          FROM p)
          SELECT source,
            CAST(SUM(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) emails,
            CAST(SUM(len(regexp_extract_all(t, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b'))) AS BIGINT) ssns,
            CAST(SUM(len(regexp_extract_all(t, '\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}([-. ][0-9]{3,4})?'))) AS BIGINT) phones,
            CAST(SUM(len(regexp_extract_all(t, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b'))) AS BIGINT) ips,
            CAST(SUM(len(regexp_extract_all(red, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               + len(regexp_extract_all(red, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b'))
               + len(regexp_extract_all(red, '\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}([-. ][0-9]{3,4})?'))
               + len(regexp_extract_all(red, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b'))) AS BIGINT) pii_after
          FROM r GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val planted = Tables.load(s, dir, "documents").select(
          col("source"),
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@ex.org or +1-555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            when(pmod(col("doc_id"), lit(3)) === 0, lit(" ssn 123-45-6789")).otherwise(lit("")),
            when(pmod(col("doc_id"), lit(5)) === 0, lit(" host 10.0.0.1")).otherwise(lit(""))
          ).as("t"))
        val red = Curation.redactPii(col("t"))
        planted.groupBy(col("source")).agg(
          sum(Curation.piiCount(col("t"), Curation.EmailPattern)).as("emails"),
          sum(Curation.piiCount(col("t"), Curation.SsnPattern)).as("ssns"),
          sum(Curation.piiCount(col("t"), Curation.PhonePattern)).as("phones"),
          sum(Curation.piiCount(col("t"), Curation.Ipv4Pattern)).as("ips"),
          sum(Curation.piiCount(red, Curation.EmailPattern)
            + Curation.piiCount(red, Curation.SsnPattern)
            + Curation.piiCount(red, Curation.PhonePattern)
            + Curation.piiCount(red, Curation.Ipv4Pattern)).as("pii_after"))
          .orderBy(col("source"))
      }),

    // ---- temperature-weighted source mixing ------------------------------
    // strata = lang (the skewed column in the fixture: en dominates);
    // alpha = 1/2 up-weights the small languages relative to raw counts
    QueryDef(
      "qp68_temperature_mix",
      Some("""WITH c AS (SELECT lang, COUNT(*) n FROM documents GROUP BY 1),
          r AS (SELECT lang, CAST(floor(1000 * sqrt(CAST(n AS DOUBLE) / (SELECT MAX(n) FROM c))) AS BIGINT) sample_rate FROM c)
          SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS kept, MAX(r.sample_rate) AS sample_rate
          FROM documents d JOIN r USING (lang)
          WHERE ((d.doc_id % 1000003) * 2654435761) % 1000 < r.sample_rate
          GROUP BY 1 ORDER BY 1"""),
      (s, dir) =>
        Curation.temperatureSample(
          Tables.load(s, dir, "documents"), "doc_id", "lang")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("kept"), max(col("sample_rate")).as("sample_rate"))
          .orderBy(col("lang"))),

    // ---- event sessionization (batch) -------------------------------------
    // 12h gap over the events fixture (~2 events/user/day, so the gap
    // actually splits); ts is nanos-as-long on both sides (epoch_ns in
    // DuckDB), every output column integer-exact
    QueryDef(
      "qp69_sessionize",
      Some("""WITH e AS (SELECT user_id, event_id, epoch_ns(ts) tns FROM events),
          l AS (SELECT user_id, event_id, tns,
                  CASE WHEN lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) IS NULL
                         OR tns - lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) > 43200000000000
                       THEN 1 ELSE 0 END nb FROM e),
          s AS (SELECT user_id, tns,
                  CAST(SUM(nb) OVER (PARTITION BY user_id ORDER BY tns, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) session_seq
                FROM l)
          SELECT user_id, session_seq, CAST(COUNT(*) AS BIGINT) n_events,
                 MIN(tns) session_start, MAX(tns) - MIN(tns) span_nanos
          FROM s GROUP BY 1, 2 ORDER BY 1, 2"""),
      (s, dir) => Curation.sessionize(
        // sessionize wants epoch-nanos longs; derive them from whichever
        // ts layout the fixture ships (nanos-as-long floored to micros
        // ticks — what DuckDB's micros reader sees in epoch_ns — or a
        // micros timestamp scaled up exactly)
        {
          val raw = s.read.parquet(s"$dir/events.parquet")
          raw.schema("ts").dataType match {
            case org.apache.spark.sql.types.LongType =>
              raw.withColumn("ts", expr("ts - pmod(ts, 1000)"))
            case _ =>
              raw.withColumn("ts",
                unix_micros(col("ts").cast("timestamp")) * lit(1000L))
          }
        },
        "user_id", "ts", "event_id",
        gapNanos = 43200000000000L)),

    // ---- stream-stream interval join (funnel / attribution) --------------
    // purchases within 2h of the same user's click, as a REAL streaming
    // query: watermarked both sides, time-bounded join state, append
    // sink. Replaying the bounded fixture in one AvailableNow batch
    // emits every pair (nothing is late), so the batch interval join IS
    // the oracle; the per-user aggregation runs on the sink table.
    QueryDef(
      "qp72_stream_join",
      Some("""SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS pairs
              FROM events a JOIN events b ON b.user_id = a.user_id
               AND a.event_type = 'click' AND b.event_type = 'purchase'
               AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '2 hours'
              GROUP BY 1 ORDER BY 1"""),
      (s, dir) =>
        StreamRunner.replayEvents(s, dir,
            s"qp72_sink_${streamRuns.incrementAndGet()}", "append")(
            graft.streaming.EventStreams
              .followWithin(_, "click", "purchase", within = "2 hours"))
          .groupBy(col("a_user").as("user_id"))
          .agg(count(lit(1)).as("pairs"))
          .orderBy(col("user_id"))),

    // ---- cross-source contamination matrix (round 9) --------------------
    // distinct shared 5-grams per source pair — the source×source
    // leakage view beside qp66's train-vs-benchmark check; oracle
    // replays shingling, the distinct (source, gram) set, the gram
    // bucket cap, and the pair count exactly
    QueryDef(
      "qp91_contamination_matrix",
      Some("""WITH t AS (SELECT doc_id, source,
                string_split_regex(trim(text), '\s+') w FROM documents),
          g AS (SELECT DISTINCT source,
                unnest(list_transform(range(1, greatest(len(w)-4, 1) + 1),
                  i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))) s
                FROM t),
          capped AS (SELECT source, s FROM (
                SELECT g.*, count(*) OVER (PARTITION BY s) bsz FROM g)
              WHERE bsz <= 4096),
          p AS (SELECT a.source AS src_a, b.source AS src_b,
                CAST(count(*) AS BIGINT) AS shared_ngrams
                FROM capped a JOIN capped b ON a.s = b.s
                WHERE a.source < b.source GROUP BY 1, 2)
          SELECT src_a, src_b, shared_ngrams FROM p ORDER BY src_a, src_b"""),
      (s, dir) => graft.pipeline.Curation.contaminationMatrix(
        graft.Tables.load(s, dir, "documents"), "doc_id", "source", "text",
        ngram = 5)))
}
