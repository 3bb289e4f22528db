package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking core (rsync/LBFS lineage), shared by the
  * interpreted eval and the generated code: scan the UTF-8 bytes with a
  * Buzhash-style rolling hash over a fixed window; a position ends a
  * chunk when the window hash's low `maskBits` bits are zero and the
  * chunk has at least `minSize` bytes; each chunk's content is hashed
  * with FNV-1a 64. Boundaries depend only on LOCAL content, so an
  * insertion re-synchronizes within ~window bytes and every unchanged
  * passage keeps its chunk hashes — the property that lets chunk-level
  * dedup find shared passages across shifted/edited documents, which
  * whole-document fingerprints (md5) and even shingle MinHash (capped
  * at similarity estimates) do not expose directly. */
object Cdc {
  /** Deterministic byte → random-64-bit substitution table (splitmix64). */
  private val table: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  private def rotl(v: Long, n: Int): Long = (v << n) | (v >>> (64 - n))

  /** Chunk FNV-1a hashes of `text`'s bytes (see object doc). Public and
    * statically reachable so generated code can call it directly. */
  def chunkHashes(text: UTF8String, window: Int, maskBits: Int, minSize: Int): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val mask = (1L << maskBits) - 1L
    val out = new java.util.ArrayList[Any]()
    var h = 0L
    var chunkStart = 0
    var fnv = 0xCBF29CE484222325L
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xFF
      fnv = (fnv ^ b) * 0x100000001B3L
      h = rotl(h, 1) ^ table(b)
      if (i - chunkStart + 1 > window)
        h ^= rotl(table(bytes(i - window) & 0xFF), window % 64)
      val len = i - chunkStart + 1
      if (len >= minSize && (h & mask) == 0L) {
        out.add(fnv)
        chunkStart = i + 1
        fnv = 0xCBF29CE484222325L
        h = 0L
      }
      i += 1
    }
    if (chunkStart < n || n == 0) out.add(fnv) // trailing partial chunk
    new GenericArrayData(out.toArray)
  }
}

/** Native expression wrapper over [[Cdc.chunkHashes]] — one static call
  * per row from inside whole-stage codegen (no interpreted lambdas, no
  * UDF serialization). Parameters are plan literals by construction. */
case class ChunkFingerprints(child: Expression, window: Int, maskBits: Int, minSize: Int)
    extends UnaryExpression {

  // degenerate parameters fail at PLAN time, not per row: maskBits >= 63
  // makes the mask 0 (JVM shift mod 64) so every byte is a boundary,
  // window <= 0 cancels each byte's contribution immediately (or reads
  // out of bounds), minSize < 1 emits empty chunks
  require(window >= 1 && window <= 4096, s"window must be in [1, 4096], got $window")
  require(maskBits >= 1 && maskBits <= 62, s"maskBits must be in [1, 62], got $maskBits")
  require(minSize >= 1, s"minSize must be >= 1, got $minSize")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chunk_fingerprints expects a string, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "chunk_fingerprints"

  override def nullSafeEval(input: Any): Any =
    Cdc.chunkHashes(input.asInstanceOf[UTF8String], window, maskBits, minSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Cdc.chunkHashes($c, $window, $maskBits, $minSize);")

  override protected def withNewChildInternal(newChild: Expression): ChunkFingerprints =
    copy(child = newChild)
}

object ChunkFingerprints {
  import org.apache.spark.sql.GraftSqlBridge

  def apply(text: Column, window: Int, maskBits: Int, minSize: Int): Column =
    GraftSqlBridge.column(new ChunkFingerprints(
      GraftSqlBridge.expression(text), window, maskBits, minSize))
}
