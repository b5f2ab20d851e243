package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * BINARY columns with typed metadata, and a distributed featurization
  * pass with the batch shape a real codec needs.
  *
  * The DECODE STEP IS A STUB — this container ships no image/audio
  * libraries, so [[StubDecoder]] produces deterministic fake features
  * from the raw bytes. Everything around it is real and tested: the
  * schema, the typed Dataset API, the mapPartitions batch shape
  * (one decoder instance per partition — the init-once pattern a JNI
  * codec or ONNX session requires; this is the legitimate use of
  * mapPartitions, matching pyspark's mapInPandas for the same job),
  * and the column-pruning-friendly metadata layout (meta is a separate
  * struct column, so `SELECT media_id, meta.kind` never reads bytes —
  * at 100 TB the scan reads the 40-byte struct, not the megabyte blob).
  */
object MediaPipeline {

  case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRateHz: Int, durationMs: Long)
  case class MediaRecord(media_id: Long, meta: MediaMeta, bytes: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
      features: Array[Float])

  /** At-rest schema for a media table (parquet: blob column encoded as
    * BYTE_ARRAY, metadata as a co-located struct). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sampleRateHz", IntegerType),
      StructField("durationMs", LongType))), nullable = false),
    StructField("bytes", BinaryType)))

  /** Decoder contract: one instance per partition, called per record.
    * Implementations wrap the real codec (JPEG decode → pixel stats,
    * PCM decode → spectral bins, video → frame samples). */
  trait Decoder extends Serializable {
    def features(meta: MediaMeta, bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB decoder standing in for the real codecs (none are available in
    * this environment). Deterministic fake: byte-chunk averages — stable
    * across runs/partitions, so the plumbing is fully testable. Replace
    * ONLY this object to productionize. */
  object StubDecoder extends Decoder {
    def features(meta: MediaMeta, bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (bytes == null || bytes.isEmpty) return out
      val chunk = math.max(1, bytes.length / dim)
      var i = 0
      while (i < dim) {
        var s = 0L
        var j = i * chunk
        val end = math.min(bytes.length, (i + 1) * chunk)
        while (j < end) { s += bytes(j) & 0xff; j += 1 }
        out(i) = if (end > i * chunk) s.toFloat / (end - i * chunk) else 0f
        i += 1
      }
      out
    }
  }

  /** Distributed featurization. mapPartitions so the decoder is
    * instantiated once per partition (not per record) and records flow
    * through as an iterator — constant memory regardless of partition
    * size, no driver involvement. */
  def featurize(media: Dataset[MediaRecord], dim: Int = 8,
      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      val d = decoder // per-partition init point (codec/session handle)
      records.map { r =>
        val len = if (r.bytes == null) 0L else r.bytes.length.toLong
        MediaFeatures(r.media_id, r.meta.kind, len, d.features(r.meta, r.bytes, dim))
      }
    }
  }

  /** STUB resize — real impl decodes, scales, re-encodes. The fake keeps
    * the plumbing honest: output metadata carries the new dimensions and
    * the payload is deterministically derived from (bytes, w, h). */
  def resizeStub(r: MediaRecord, width: Int, height: Int): MediaRecord = {
    // Degenerate payloads pass through with updated dimensions: null text
    // in fromDocuments yields null bytes, and a distributed resize must
    // not throw on them.
    if (r.bytes == null || r.bytes.isEmpty)
      return MediaRecord(r.media_id,
        r.meta.copy(width = width, height = height), Array.emptyByteArray)
    val target = math.max(1, (r.bytes.length.toLong * width * height /
      math.max(1, r.meta.width.toLong * r.meta.height)).toInt)
    val out = new Array[Byte](math.min(target, math.max(1, r.bytes.length)))
    var i = 0
    while (i < out.length) { out(i) = r.bytes(i % math.max(1, r.bytes.length)); i += 1 }
    MediaRecord(r.media_id, r.meta.copy(width = width, height = height), out)
  }

  /** Distributed resize pass (same mapPartitions batch shape). */
  def resize(media: Dataset[MediaRecord], width: Int, height: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(resizeStub(_, width, height)))
  }

  /** STUB frame sampling — real impl seeks keyframes in the container;
    * the fake cuts the payload into `frameCount` equal chunks and emits
    * every `stride`-th as (media_id, frame_idx, frame bytes). The output
    * SHAPE (one row per sampled frame, ordered frame index) is what a
    * downstream embedding stage consumes. */
  def sampleFrames(media: Dataset[MediaRecord], frameCount: Int, stride: Int)
      : Dataset[(Long, Int, Array[Byte])] = {
    import media.sparkSession.implicits._
    require(frameCount > 0 && stride > 0, "frameCount and stride must be positive")
    media.flatMap { r =>
      if (r.bytes == null || r.bytes.isEmpty) Iterator.empty
      else {
        val sz = math.max(1, r.bytes.length / frameCount)
        (0 until frameCount by stride).iterator.map { f =>
          val from = f * sz
          val until = math.min(r.bytes.length, from + sz)
          (r.media_id, f, java.util.Arrays.copyOfRange(r.bytes, math.min(from, r.bytes.length), until))
        }
      }
    }
  }

  /** Demo wiring on harness data: documents' text bytes as the opaque
    * payload (kind "text"), so the pipeline runs end-to-end without any
    * codec. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        struct(
          lit("text").as("kind"), lit(0).as("width"), lit(0).as("height"),
          lit(0).as("sampleRateHz"), lit(0L).as("durationMs")).as("meta"),
        col("text").cast("binary").as("bytes"))
      .as[MediaRecord]
  }
}
