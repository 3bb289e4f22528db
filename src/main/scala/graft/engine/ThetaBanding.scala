package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Equi-depth band edges + band-id evaluation for the theta-correlation
  * pre-thin (Binder.thetaBandPlan). Split out of the binder so the
  * banding math is testable against adversarial distributions without
  * driving a whole correlated query (BandingSpec: a 90 %-of-values-in-
  * 1 %-of-the-range cluster must still band near-uniformly — the
  * failure mode that killed fixed-width edges, VERDICT r8 #5).
  */
private[graft] object ThetaBanding {

  /** Interior band edges from approximate percentiles: duplicates of a
    * clustered distribution merge (shrinking the band count instead of
    * emitting empty bands) and edges at/below the min drop (values ≤
    * the first edge are band 0). Result is sorted ascending; empty ⟺
    * the distribution is single-valued and banding would be a no-op. */
  def edges(quantiles: Seq[Double], mn: Double): IndexedSeq[Double] =
    quantiles.distinct.filter(_ > mn).sorted.toIndexedSeq

  /** band(x) = number of edges ≤ x, monotone non-decreasing in x — the
    * property the pre-thin's losslessness proof needs. Evaluated as a
    * balanced when/otherwise tree: ⌈log₂ bands⌉ comparisons per row,
    * plain codegen-friendly expressions (no interpreted lambda on the
    * hot path). NULL in → NULL band (the equi-join drops it; a NULL
    * can never satisfy the inequality). */
  def bandOf(c: Column, edges: IndexedSeq[Double]): Column = {
    require(edges.nonEmpty, "bandOf needs at least one edge")
    def tree(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo.toLong)
      else {
        val mid = (lo + hi + 1) / 2 // band ≥ mid ⟺ x ≥ edges(mid-1)
        when(c >= lit(edges(mid - 1)), tree(mid, hi))
          .otherwise(tree(lo, mid - 1))
      }
    when(c.isNull, lit(null).cast("long")).otherwise(tree(0, edges.length))
  }
}
