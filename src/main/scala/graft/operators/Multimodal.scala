package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media as opaque `binary`
  * with typed metadata columns, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs ship in
  * this environment): it deterministically derives properties from the
  * payload bytes. Everything around it — schema, metadata-only column
  * pruning, per-partition batch processing, feature vectors, explodeable
  * frame samples — is real Spark plumbing; a production deployment swaps
  * `decodeStub` for a codec call (JNI/javacv on the JVM; in PySpark this
  * stage is a Pandas UDF over mapInPandas with the same row shape).
  */
object Multimodal {

  final case class MediaRow(media_id: Long, media_type: String, content: Array[Byte])
  final case class DecodedMeta(width: Int, height: Int, durationMs: Long,
      sampleRate: Int, nFrames: Int)
  final case class Decoded(media_id: Long, media_type: String,
      meta: DecodedMeta, content: Array[Byte])
  final case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long, digest: Long)

  /** Deterministic media table synthesized from the pages' html payloads:
    * binary content + media_type, no external data. */
  def syntheticMedia(pages: DataFrame): Dataset[MediaRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(
        abs(hash(col("url"))).cast("long").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(abs(hash(col("url"))), lit(3)) + 1).cast("int")).as("media_type"),
        col("html").as("content"))
      .as[MediaRow]
  }

  /** ======== STUB: replace with a real codec ========
    * Derives deterministic pseudo-properties from the payload. The contract
    * (input bytes → DecodedMeta) is what a real decoder satisfies. */
  private def decodeStub(mediaType: String, content: Array[Byte]): DecodedMeta = {
    var h = 1125899906842597L
    var i = 0
    while (i < content.length) { h = 31 * h + (content(i) & 0xff); i += 1 }
    val pos = (h & Long.MaxValue)
    mediaType match {
      case "image" => DecodedMeta(64 + (pos % 1920).toInt, 64 + ((pos >> 11) % 1080).toInt, 0L, 0, 1)
      case "audio" => DecodedMeta(0, 0, 1000 + (pos % 600000), 8000 + ((pos >> 7) % 40000).toInt, 0)
      case _       => DecodedMeta(64 + (pos % 1920).toInt, 64 + ((pos >> 11) % 1080).toInt,
                        1000 + (pos % 120000), 0, 1 + ((pos >> 17) % 300).toInt)
    }
  }

  /** Decode stage: mapPartitions over the typed rows (per-partition batch
    * shape — the JVM analog of an arrow-batched Pandas UDF). Binary stays
    * opaque; only the stub touches it. */
  def decode(media: Dataset[MediaRow]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(m => Decoded(m.media_id, m.media_type, decodeStub(m.media_type, m.content), m.content))
    }
  }

  /** Feature extraction: fixed-dim float vector per media item (hash-mixed
    * from content — deterministic stand-in for a model forward pass). */
  def features(decoded: Dataset[Decoded], dim: Int = 16): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.mapPartitions { it =>
      it.map { d =>
        val f = new Array[Float](dim)
        var h = d.media_id * 0x9E3779B97F4A7C15L
        var i = 0
        while (i < dim) {
          h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
          f(i) = ((h & 0xFFFF).toFloat / 65536f) - 0.5f
          i += 1
        }
        (d.media_id, d.media_type, f.toSeq)
      }
    }.toDF("media_id", "media_type", "embedding")
  }

  /** Resize stage (stub transform): halves image dimensions in metadata and
    * truncates the payload deterministically — shape-preserving plumbing. */
  def resize(decoded: Dataset[Decoded], maxDim: Int): Dataset[Decoded] = {
    import decoded.sparkSession.implicits._
    decoded.map { d =>
      val m = d.meta
      if (m.width <= maxDim && m.height <= maxDim) d
      else {
        val scale = maxDim.toDouble / math.max(m.width, m.height)
        val nw = math.max(1, (m.width * scale).toInt)
        val nh = math.max(1, (m.height * scale).toInt)
        val keep = math.max(1, (d.content.length * scale * scale).toInt)
        d.copy(meta = m.copy(width = nw, height = nh),
          content = d.content.take(keep))
      }
    }
  }

  /** Frame sampling for videos: every `stepMs`, digest derived per frame —
    * one output row per sampled frame (explode shape). */
  def sampleFrames(decoded: Dataset[Decoded], stepMs: Long = 10000L): Dataset[Frame] = {
    import decoded.sparkSession.implicits._
    decoded.filter(_.media_type == "video").flatMap { d =>
      val n = math.min(d.meta.nFrames, (d.meta.durationMs / stepMs + 1).toInt)
      (0 until n).map { i =>
        Frame(d.media_id, i, i * stepMs, d.media_id * 1000003L + i * 7919L)
      }
    }
  }
}
