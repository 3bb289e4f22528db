package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two float/double arrays.
  *
  * This is the one hot path where the public API genuinely falls short
  * (brief's preference order (b)): `aggregate(zip_with(a, b, _*_), ...)`
  * evaluates on the interpreted path per element with boxed lambdas,
  * while this expression participates in whole-stage codegen and runs a
  * primitive loop over the unsafe array data. Null semantics: null if
  * either side is null; mismatched lengths are an execution error.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dot_product: length mismatch ($n vs ${b.numElements()})")
    val aF = elemIsFloat(left); val bF = elemIsFloat(right)
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
        final int $n = $a.numElements();
        if ($b.numElements() != $n) {
          throw new IllegalArgumentException(
            "dot_product: length mismatch (" + $n + " vs " + $b.numElements() + ")");
        }
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $getA * $getB;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** floor(x·1000) per element, as exact integer-valued doubles — the
  * quantization the embedding near-dup tiers share with their DuckDB
  * oracle. One virtual call per ROW with a primitive loop inside
  * (CodegenFallback), versus the `transform()` lambda formulation that
  * evaluates an interpreted expression tree per ELEMENT. */
case class QuantizeMilli(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_milli expects array<float|double>, got $other")
  }

  override def dataType: DataType =
    ArrayType(DoubleType, child.dataType.asInstanceOf[ArrayType].containsNull)

  override def prettyName: String = "quantize_milli"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Any](n)
    val isF = elemIsFloat
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = math.floor(x * 1000d)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeMilli =
    copy(child = newChild)
}

object VectorOps {
  import org.apache.spark.sql.GraftSqlBridge

  /** Codegen'd dot product over two array<float|double> columns. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Codegen'd L2 norm. */
  def norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dot(a, a))

  /** floor(x·1000) quantization (see QuantizeMilli). */
  def quantizeMilli(a: Column): Column =
    GraftSqlBridge.column(QuantizeMilli(GraftSqlBridge.expression(a)))
}
