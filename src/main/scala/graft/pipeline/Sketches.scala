package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Mergeable sketch operators — the approximate tier for quantities
  * whose exact computation needs a corpus-wide shuffle the sketch
  * avoids. First member: KMV (k-minimum-values) distinct counting
  * (Bar-Yossef et al., RANDOM'02; the ϑ-sketch family) over a PORTABLE
  * integer hash, so the whole sketch — not just its estimate — replays
  * bit-for-bit in an external engine (the qp54/qp59 oracle recipe
  * applied to cardinality estimation).
  *
  * Scale design: a KMV sketch is the k smallest distinct hash values —
  * mergeable by "k smallest of the union of k-smallests", so at 100 TB
  * it accumulates per partition and combines map-side like any
  * algebraic aggregate; nothing corpus-sized ever reaches one node.
  * The exact `countUnique` stays the default at query time; the sketch
  * is for the pipelines that maintain cardinalities incrementally
  * (per-source vocabulary growth, dedup-rate monitoring) where exact
  * re-counts are a full-corpus shuffle per refresh.
  */
object Sketches {

  /** The portable LCG hash shared with the ANN trainers' init sampling
    * ([[Similarity]] portHash): x·1103515245 + 12345 mod 1e9+7 — exact
    * int64 for |x| ≤ ~2⁴³, reproducible in any engine. */
  private def portHash(x: Column): Column =
    pmod(x * lit(1103515245L) + lit(12345L), lit(1000000007L))

  /** KMV distinct-count estimate per group: hash the value column,
    * keep the k smallest DISTINCT hashes per group, and estimate
    * |distinct| as floor((k−1)·M / h_k) where h_k is the k-th minimum
    * and M the hash modulus — the standard KMV estimator, exact-integer
    * inputs and ONE correctly-rounded divide, so the estimate (not just
    * its error bound) is engine-portable. Groups with fewer than k
    * distinct hashes report their EXACT count (the sketch holds every
    * value). Output: (group, n_est). */
  def kmvDistinct(df: DataFrame, valueCol: String, groupCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, "KMV needs k >= 2 (the estimator uses the k-th minimum)")
    val m = 1000000007L
    // distinct count of NON-NULL values (the standard semantics) — and a
    // NULL hash would also order NULLS-FIRST in Spark vs NULLS-LAST in
    // an oracle engine, so the guard is a portability invariant too
    val hashed = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), portHash(col(valueCol)).as("__h"))
      .distinct()
    val topk = hashed
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("__h"))))
      .filter(col("__rk") <= k)
    topk.groupBy(col("grp"))
      .agg(max(col("__h")).as("__hk"), count(lit(1)).as("__m"))
      .select(col("grp"),
        when(col("__m") < k, col("__m"))
          .otherwise(floor(lit(((k - 1).toLong * m).toDouble) / col("__hk"))
            .cast("long"))
          .as("n_est"))
      .orderBy(col("grp"))
  }
}
