package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Portable polynomial string hash (base 257 mod 1e9+7 over the UTF-8
  * bytes): every operand stays exactly representable in int64 in any
  * engine — no wrapping multiplies — so an external DuckDB oracle can
  * replay it bit-for-bit via `list_reduce` over `unicode(s[i])`
  * (byte == codepoint on the ASCII corpus). */
object PolyHash {
  final val P = 1000000007L

  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 257L + (bytes(i) & 0xFF)) % P
      i += 1
    }
    acc
  }
}

/** Portable 64-bit SimHash shingle fingerprint: bit j is the sign test
  * `((h·Kj + Lj) mod P) · 2 >= P` over the [[PolyHash]] char hash h.
  * ONE native expression (a static call inside whole-stage codegen)
  * instead of a 64-term Column tree — the tree form benched 3× slower
  * (deep codegen, per-row re-evaluation); the arithmetic is identical
  * and the (K, L) constants are exported for the DuckDB oracle to
  * inline ([[SimhashPortable.planes]], the lshPlanesInt pattern). */
object SimhashPortable {
  /** (multiplier, addend) per bit — deterministic LCG per bit. */
  val planes: IndexedSeq[(Long, Long)] = (0 until 64).map { j =>
    val rnd = new scala.util.Random(j.toLong * 1000003L + 7L)
    def c() = (rnd.nextLong() & Long.MaxValue) % (PolyHash.P - 1L) + 1L
    (c(), c())
  }
  private val ks = planes.map(_._1).toArray
  private val ls = planes.map(_._2).toArray

  /** Public and statically reachable so generated code calls it. */
  def fingerprint(s: UTF8String): Long = {
    val h = PolyHash.hash(s)
    var out = 0L
    var j = 0
    while (j < 64) {
      if (((h * ks(j) + ls(j)) % PolyHash.P) * 2 >= PolyHash.P) out |= 1L << j
      j += 1
    }
    out
  }
}

case class SimhashFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_fingerprint expects a string, got $other")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_fingerprint"

  override def nullSafeEval(input: Any): Any =
    SimhashPortable.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashPortable.fingerprint($c);")

  override protected def withNewChildInternal(newChild: Expression): SimhashFingerprint =
    copy(child = newChild)
}

object SimhashFingerprint {
  import org.apache.spark.sql.GraftSqlBridge

  def apply(text: Column): Column =
    GraftSqlBridge.column(new SimhashFingerprint(GraftSqlBridge.expression(text)))
}
