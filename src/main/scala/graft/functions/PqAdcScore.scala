package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: asymmetric-distance (ADC) score for
  * product-quantized vectors — `Σ_j dtab[j·ksub + codes[j]]` where
  * `dtab` is the query's per-(subspace, codeword) partial-score table
  * (array<double>, length m·ksub) and `codes` the corpus row's PQ codes
  * (array<int>, length m).
  *
  * This is the inner loop of IVF-PQ search ([[graft.pipeline.Similarity
  * .ivfPqTopK]]): per candidate row it is m array lookups + adds. The
  * builtin formulation (`aggregate(zip_with(...))` or a posexplode +
  * join per subspace) either interprets lambdas per element or
  * multiplies the candidate stream by m — the same reasons DotProduct
  * exists. ksub is read from the operands (dtab length / codes length).
  * Null if either side is null; malformed lengths are an execution
  * error.
  */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score expects (array<double> dtab, array<int> codes), got $l / $r")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val dtab = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0 || dtab.numElements() % m != 0)
      throw new IllegalArgumentException(
        s"pq_adc_score: dtab length ${dtab.numElements()} not a positive multiple of m=$m")
    val ksub = dtab.numElements() / m
    var acc = 0.0d
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 0 || c >= ksub)
        throw new IllegalArgumentException(s"pq_adc_score: code $c out of [0, $ksub)")
      acc += dtab.getDouble(j * ksub + c)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (dtab, codes) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
        final int $m = $codes.numElements();
        if ($m == 0 || $dtab.numElements() % $m != 0) {
          throw new IllegalArgumentException(
            "pq_adc_score: dtab length " + $dtab.numElements() +
            " not a positive multiple of m=" + $m);
        }
        final int $ksub = $dtab.numElements() / $m;
        double $acc = 0.0;
        for (int $j = 0; $j < $m; $j++) {
          final int $c = $codes.getInt($j);
          if ($c < 0 || $c >= $ksub) {
            throw new IllegalArgumentException(
              "pq_adc_score: code " + $c + " out of [0, " + $ksub + ")");
          }
          $acc += $dtab.getDouble($j * $ksub + $c);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

/** Native PQ encoder: nearest codeword per subspace (squared L2), the
  * codebook carried as an expression CONSTANT. The declarative
  * formulation — m projection columns of array_min over ksub
  * struct(dist, id) literals — inlines m·ksub·dsub literals and
  * m·ksub DotProducts into ONE generated method, which blows janino's
  * method-size limits at real codebook sizes (16×16×4 already fails).
  * Like QuantizeMilli this is CodegenFallback: one virtual call per row
  * with primitive loops inside, O(m·ksub·dsub) flops on flat arrays.
  *
  * The codebook is an IndexedSeq (not Array): case-class equality over
  * arrays is by reference, which silently defeated canonicalization /
  * common-subexpression reuse for semantically identical encode
  * expressions (ADVICE r5) — Vector equality is structural. */
case class PqEncode(child: Expression,
    codebook: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  private val m = codebook.length
  private val ksub = if (m > 0) codebook(0).length else 0
  private val dsub = if (ksub > 0) codebook(0)(0).length else 0
  // flat per-subspace codeword matrix for cache-friendly scans
  @transient private lazy val flat: Array[Array[Double]] =
    codebook.map(cb => cb.flatten.toArray).toArray

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: vector length ${v.numElements()} != m·dsub = ${m * dsub}")
    val isF = elemIsFloat
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val cw = flat(j)
      val base = j * dsub
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d = 0.0d; var t = 0
        while (t < dsub) {
          val x = if (isF) v.getFloat(base + t).toDouble else v.getDouble(base + t)
          val diff = x - cw(c * dsub + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqOps {
  import org.apache.spark.sql.GraftSqlBridge

  /** Codegen'd ADC score: Σ_j dtab[j·ksub + codes[j]]. */
  def adcScore(dtab: Column, codes: Column): Column =
    GraftSqlBridge.column(PqAdcScore(
      GraftSqlBridge.expression(dtab), GraftSqlBridge.expression(codes)))

  /** Native PQ encoding of a vector column (see PqEncode). */
  def encode(v: Column, codebook: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(PqEncode(GraftSqlBridge.expression(v),
      codebook.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq))
}
