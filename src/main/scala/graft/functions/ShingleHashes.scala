package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document shingle hashing in ONE codegen'd expression — the
  * round-16 replacement for the explode → window-`lead` → `concat_ws` →
  * `xxhash64` pipeline that every dedup operator paid per call
  * (optimization guide §2.4 "remove shuffles outright": the window's
  * `partitionBy(id)` exchanged and sorted the exploded TOKEN stream —
  * the widest frame in the whole family, every word of the corpus as a
  * string row — before the pipeline's real hash-keyed exchange).
  *
  * Bit-for-bit contract with the old pipeline (spec-pinned in
  * ShingleHashesSpec): for `tokens = split(trim(text), "\\s+")`,
  *  - n == 1: one hash per token;
  *  - len >= n: hashes of `tokens[i..i+n-1]` joined with a single
  *    space, for i in [0, len-n] (full shingles only);
  *  - 1 <= len < n: ONE partial shingle joining all tokens (the old
  *    `p == 0` row, `concat_ws` skipping the null leads);
  *  - hash = Spark's `xxhash64` (seed 42) over the joined UTF-8 bytes.
  * Duplicates are kept in document order — consumers that need set
  * semantics dedup downstream exactly as before. NULL text → NULL
  * (explode emits nothing, matching posexplode of a null array).
  */
object ShingleOps {
  private val WS: UTF8String = UTF8String.fromString("\\s+")

  /** xxhash64(seed 42) of each n-token shingle of `text` (object doc).
    * Public and statically reachable for generated code. */
  def shingleHashes(text: UTF8String, n: Int): GenericArrayData =
    new GenericArrayData(shingleHashArray(text, n))

  /** The DISTINCT hashes of [[shingleHashes]], sorted ascending —
    * bit-identical to `sort_array(array_distinct(shingle_hashes(t, n)))`
    * (long sort, no nulls possible) but one in-place sort + dedup pass
    * instead of two generic array builtins. Round 17: the per-document
    * base frame for every SET-semantics dedup consumer, which lets the
    * per-doc `dropDuplicates(id, h)` aggregate, the per-doc size window
    * and the `sort_array(collect_list(h))` verify-array aggregate all
    * collapse into this one projection (guide §1.2/§2.3 — the dedup
    * happens before any exchange, so the h-shuffle carries only
    * distinct (id, h) pairs). */
  def shingleHashesDistinct(text: UTF8String, n: Int): GenericArrayData = {
    val a = shingleHashArray(text, n)
    java.util.Arrays.sort(a)
    var w = 0
    var i = 0
    while (i < a.length) {
      if (w == 0 || a(w - 1) != a(i)) { a(w) = a(i); w += 1 }
      i += 1
    }
    new GenericArrayData(
      if (w == a.length) a else java.util.Arrays.copyOf(a, w))
  }

  private def shingleHashArray(text: UTF8String, n: Int): Array[Long] = {
    val toks = text.trim().split(WS, -1)
    val len = toks.length
    // split(regex, -1) never returns an empty array (an empty string
    // yields [""]), so every non-null text emits >= 1 shingle
    val full = len >= n
    val count = if (!full) 1 else len - n + 1
    val width = if (!full) len else n
    val tokBytes = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) { tokBytes(i) = toks(i).getBytes; i += 1 }
    val out = new Array[Long](count)
    // reusable buffer sized to the longest window of `width` tokens
    var bufLen = 0
    i = 0
    var winBytes = 0
    while (i < len) {
      winBytes += tokBytes(i).length + 1
      if (i >= width) winBytes -= tokBytes(i - width).length + 1
      if (winBytes > bufLen) bufLen = winBytes
      i += 1
    }
    val buf = new Array[Byte](bufLen)
    var s = 0
    while (s < count) {
      var pos = 0
      var j = 0
      while (j < width) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val tb = tokBytes(s + j)
        System.arraycopy(tb, 0, buf, pos, tb.length)
        pos += tb.length
        j += 1
      }
      out(s) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          pos, 42L)
      s += 1
    }
    out
  }
}

/** Native expression wrapper over [[ShingleOps.shingleHashes]] — one
  * static call per row inside whole-stage codegen, same shape as
  * [[ChunkFingerprints]]. */
case class ShingleHashes(child: Expression, n: Int,
    distinct: Boolean = false) extends UnaryExpression {

  require(n >= 1 && n <= 64, s"shingle width must be in [1, 64], got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects a string, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String =
    if (distinct) "shingle_hashes_distinct" else "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    if (distinct) ShingleOps.shingleHashesDistinct(input.asInstanceOf[UTF8String], n)
    else ShingleOps.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (distinct) "shingleHashesDistinct" else "shingleHashes"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleOps.$fn($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(text: Column, n: Int): Column =
    GraftSqlBridge.column(new ShingleHashes(GraftSqlBridge.expression(text), n))

  /** `sort_array(array_distinct(shingle_hashes(text, n)))` in one pass. */
  def distinctSorted(text: Column, n: Int): Column =
    GraftSqlBridge.column(
      new ShingleHashes(GraftSqlBridge.expression(text), n, distinct = true))
}
