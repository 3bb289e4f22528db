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

  /** PORTABLE content-defined chunking (the qp54/qp51 recipe applied to
    * CDC): the window hash is a base-257 polynomial of the LAST
    * min(i, window) bytes mod 1e9+7 — strictly content-local (it does
    * NOT reset at boundaries, unlike the Buzhash variant above, and
    * there is no minSize), so every boundary decision and every chunk
    * hash is a function of nearby bytes alone, in bounded int64
    * arithmetic an external engine can replay exactly (DuckDB: two
    * recursive CTEs — byte-prefix hashes and 257-powers — plus window
    * algebra hash(a..b] = P_b − P_a·257^(b−a) mod p). A position ends a
    * chunk when the window hash ≡ 0 (mod 2^maskBits); each chunk's
    * content is hashed with the same polynomial. The Buzhash+FNV path
    * stays the production default (faster, minSize-guarded); this
    * parameterization exists so the shared-chunk operator carries a
    * full external oracle (VERDICT r8 #8). */
  def chunkHashesPortable(text: UTF8String, window: Int, maskBits: Int): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val p = 1000000007L
    val mod = 1L << maskBits
    var powW = 1L // 257^window mod p, built incrementally below
    val out = new java.util.ArrayList[Any]()
    var wh = 0L   // polynomial of the window's bytes
    var ch = 0L   // polynomial of the current chunk's bytes
    var chunkStart = 0
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xFF
      wh = (wh * 257L + b) % p
      ch = (ch * 257L + b) % p
      if (i < window) powW = powW * 257L % p
      if (i >= window) {
        // drop the byte leaving the window: its weight is 257^window
        wh = ((wh - (bytes(i - window) & 0xFF) * powW) % p + p) % p
      }
      if (wh % mod == 0L) {
        out.add(ch)
        ch = 0L
        chunkStart = i + 1
      }
      i += 1
    }
    if (chunkStart < n || n == 0) out.add(ch) // trailing partial chunk
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

/** Native wrapper over [[Cdc.chunkHashesPortable]] — same codegen shape
  * as [[ChunkFingerprints]], oracle-replayable hash arithmetic. */
case class ChunkFingerprintsPortable(child: Expression, window: Int, maskBits: Int)
    extends UnaryExpression {

  require(window >= 1 && window <= 4096, s"window must be in [1, 4096], got $window")
  require(maskBits >= 1 && maskBits <= 62, s"maskBits must be in [1, 62], got $maskBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chunk_fingerprints_portable expects a string, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "chunk_fingerprints_portable"

  override def nullSafeEval(input: Any): Any =
    Cdc.chunkHashesPortable(input.asInstanceOf[UTF8String], window, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Cdc.chunkHashesPortable($c, $window, $maskBits);")

  override protected def withNewChildInternal(newChild: Expression): ChunkFingerprintsPortable =
    copy(child = newChild)
}

object ChunkFingerprintsPortable {
  import org.apache.spark.sql.GraftSqlBridge

  def apply(text: Column, window: Int, maskBits: Int): Column =
    GraftSqlBridge.column(new ChunkFingerprintsPortable(
      GraftSqlBridge.expression(text), window, maskBits))
}
