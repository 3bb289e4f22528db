package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The DECODE STEP IS A STUB — this container has no image/audio codecs,
  * so `decodeStub` derives deterministic fake dimensions from the byte
  * payload. Everything around it is real and tested: the binary column
  * schema, the typed Dataset boundary, the mapPartitions batch shape
  * (one decoder instance per partition, streamed iterator — exactly how
  * a JNI codec or ONNX session would be held), and the downstream
  * aggregation over the decoded metadata.
  */
object Multimodal {

  /** A media row as it would arrive from ingestion. */
  final case class MediaItem(doc_id: Long, format: String, data: Array[Byte])

  /** Decoded/extracted metadata (what a real codec would emit). */
  final case class MediaMeta(
      doc_id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, checksum: String)

  /** Attach a binary payload column (here: the utf-8 text bytes standing
    * in for image bytes) plus a format tag. */
  def attachBinary(docs: DataFrame, textCol: String): DataFrame =
    docs.select(
      col("doc_id"),
      lit("txtimg").as("format"),
      col(textCol).cast("binary").as("data"))

  /** Per-partition decode. A real deployment replaces the body of
    * `fakeDecode` with the codec call; the partition-level structure
    * (open decoder once, stream the iterator, emit typed rows) is the
    * production shape. */
  def decodeStub(media: Dataset[MediaItem]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // one "decoder" per partition — stands in for e.g. opening a JNI
      // codec or model session once per task
      val decoder = new FakeDecoder
      it.map(m => decoder.decode(m))
    }
  }

  /** STUB decoder: dimensions derived only from byte length (so the SQL
    * oracle can mirror it), checksum = md5 of the payload. */
  final class FakeDecoder extends Serializable {
    private val digest = java.security.MessageDigest.getInstance("MD5")
    def decode(m: MediaItem): MediaMeta = {
      val len = m.data.length.toLong
      digest.reset()
      val sum = digest.digest(m.data).map("%02x".format(_)).mkString
      MediaMeta(
        doc_id = m.doc_id,
        format = m.format,
        n_bytes = len,
        width = (64 + len % 512).toInt,   // ??? real codec output
        height = (64 + (len * 7) % 512).toInt, // ??? real codec output
        checksum = sum)
    }
  }

  /** One sampled frame of a (fake) video payload. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int, n_bytes: Long, checksum: String)

  /** Frame-sampling STUB: treats the payload as a sequence of
    * `frameBytes`-sized frames and emits every `stride`-th one — the
    * per-partition structure (one demuxer per task, flatMap over frames)
    * is exactly how a real video decode fans rows out; only the byte
    * slicing stands in for the codec. */
  def frameSampleStub(media: Dataset[MediaItem], frameBytes: Int, stride: Int): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { m =>
        m.data.grouped(frameBytes).zipWithIndex.collect {
          case (frame, i) if i % stride == 0 =>
            digest.reset()
            MediaFrame(m.doc_id, i, frame.length.toLong,
              digest.digest(frame).map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Resize STUB: deterministic byte-stride downsample standing in for a
    * pixel resample — keeps every `factor`-th byte and re-decodes, so
    * the output metadata reflects the smaller payload. Same one-decoder-
    * per-partition shape as decodeStub. */
  def resizeStub(media: Dataset[MediaItem], factor: Int): Dataset[MediaMeta] = {
    require(factor >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val decoder = new FakeDecoder
      it.map { m =>
        val shrunk = m.data.indices.collect { case i if i % factor == 0 => m.data(i) }.toArray
        decoder.decode(MediaItem(m.doc_id, m.format, shrunk))
      }
    }
  }

  /** The same metadata computed purely in SQL (no mapPartitions) — used
    * by the oracle-checked query entry and as the cross-check that the
    * typed path and the SQL path agree. */
  def metaViaSql(docs: DataFrame, textCol: String): DataFrame =
    attachBinary(docs, textCol).select(
      col("doc_id"),
      col("format"),
      length(col("data")).cast("long").as("n_bytes"),
      (lit(64) + pmod(length(col("data")), lit(512))).cast("int").as("width"),
      (lit(64) + pmod(length(col("data")).cast("long") * 7, lit(512L))).cast("int").as("height"),
      md5(col("data")).as("checksum"))
}
