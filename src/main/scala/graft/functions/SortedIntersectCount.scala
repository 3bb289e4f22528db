package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: |a ∩ b| for two SORTED long arrays, by a
  * linear merge — no per-row hash-set allocation, participates in
  * whole-stage codegen.
  *
  * This is the verify kernel of the set-similarity joins
  * ([[graft.pipeline.Dedup.ngramJaccardPairs]]): the builtin
  * `size(array_intersect(a, b))` builds a hash set and an output array
  * per ROW, which dominated the candidate-verify stage in profiling
  * (~10 s of qp63's sf0.1 run). A merge over already-sorted signature
  * arrays does the same count allocation-free. Inputs must be sorted
  * ascending with distinct elements (sort_array over a distinct
  * stream); null if either side is null.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        final int $n = $a.numElements();
        final int $m = $b.numElements();
        int $i = 0; int $j = 0; long $c = 0L;
        while ($i < $n && $j < $m) {
          final long $x = $a.getLong($i);
          final long $y = $b.getLong($j);
          if ($x < $y) { $i++; }
          else if ($x > $y) { $j++; }
          else { $c++; $i++; $j++; }
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SetOps {
  import org.apache.spark.sql.GraftSqlBridge

  /** Codegen'd |a ∩ b| over two sorted-distinct array<long> columns. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
