package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-time curation over a DOCUMENT stream — the streaming
  * complement of the batch incremental-dedup tiers
  * ([[graft.pipeline.Dedup.incrementalNearDup]]): decisions made as
  * data arrives, before anything lands in the corpus.
  */
object IngestOps {

  /** Mark each arriving document novel iff its normalized-text
    * fingerprint is ABSENT from the static corpus fingerprint set: a
    * stateless stream-static equijoin (Spark does not support
    * stream-static anti joins, so this is the standard LEFT OUTER +
    * null-test equivalent — same result, stream side preserved
    * exactly once per row).
    *
    * Scale shape: stateless — no watermark, no state store, each
    * micro-batch joins against the static side independently. The
    * corpus side reduces to its DISTINCT 16-byte fingerprints once per
    * (re)start; at 100 TB that column is still corpus-sized, so the
    * production deployment swaps it for a maintained Bloom filter or a
    * bucketed fingerprint table co-partitioned with the join — the
    * plan shape (per-batch equijoin, no stream state) is unchanged.
    *
    * `stream` must carry (idCol, textCol); `corpus` is read as a
    * static frame. Output: (id, novel). */
  def noveltyAgainst(stream: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val corpusFp = corpus
      .select(graft.pipeline.TextOps.fingerprint(col(textCol)).as("__cfp"))
      .distinct()
    stream
      .select(col(idCol).as("id"),
        graft.pipeline.TextOps.fingerprint(col(textCol)).as("__fp"))
      .join(corpusFp, col("__fp") === col("__cfp"), "left_outer")
      .select(col("id"), col("__cfp").isNull.as("novel"))
  }
}
