package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * Metadata decode is REAL: `MediaHeaders.parse` reads actual PNG / BMP /
  * WAV / AVI container headers (magic-byte dispatch + bounds-checked
  * field reads at the formats' public offsets). Only pixel/sample
  * decoding is out of scope for this container (no image/audio libs
  * ship here) — the deterministic `FakeCodec` stands in ONLY for
  * payloads whose magic matches no known container, and for the
  * content-feature vector (in production: a JNI/JavaCV decode feeding an
  * embedding model; the plan shape is unchanged).
  *
  * Scale notes: decode is per-row CPU-bound work with no shuffle —
  * `mapPartitions` keeps codec state (in production the native decoder
  * handle) alive across a partition's rows instead of re-initializing
  * per row. Binary payloads stay off the driver; metadata extraction
  * touches only header bytes, so parquet column/page pruning keeps full
  * payload reads out of metadata-only queries.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class DecodedRow(media_id: Long, kind: String, format: String,
      width: Int, height: Int, n_frames: Int, sample_rate: Int,
      duration_ms: Int, feature: Array[Float])

  /** Deterministic fallback for unknown containers + the stand-in
    * content-feature extractor.
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      val w = 64 + math.abs(h % 512)
      val ht = 64 + math.abs((h / 512) % 512)
      val frames = 1 + math.abs(h % 16)
      (w, ht, frames)
    }
    def feature(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Synthesize a media table with WELL-FORMED binary payloads from the
    * documents table: PNG or BMP for images, PCM WAV for audio, AVI for
    * video — headers written by MediaHeaders with deterministic
    * dimensions derived from doc_id, document text appended as the
    * payload body. Stands in for reading real blobs from parquet binary
    * columns while keeping every downstream byte-parse genuine.
    */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val body = text.getBytes("UTF-8")
        val w = 64 + (id % 512).toInt
        val h = 64 + ((id / 7) % 512).toInt
        (id % 3) match {
          case 0 =>
            val payload = if (id % 2 == 0) MediaHeaders.pngBytes(w, h, body)
              else MediaHeaders.bmpBytes(w, h, body)
            MediaRow(id, "image", payload)
          case 1 =>
            // modulus independent of the id % 3 kind split, so rates
            // actually vary across 8/16/24 kHz
            val rate = 8000 * (1 + ((id / 3) % 3).toInt)
            val nSamples = rate * (1 + (id % 5).toInt) // 1-5 seconds
            MediaRow(id, "audio",
              MediaHeaders.wavBytes(rate, 1, 16, nSamples, body))
          case _ =>
            val frames = 1 + (id % 16).toInt
            MediaRow(id, "video",
              MediaHeaders.aviBytes(w, h, frames, 33333, body))
        }
      }
  }

  /** Batch decode: one codec context per partition, rows streamed through
    * it. Real header parse first; deterministic fallback for unknown
    * magic keeps the operator total.
    */
  def decodeAll(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // production: initialize native decoder once per partition here
      rows.map { r =>
        MediaHeaders.parse(r.payload) match {
          case Some(m) =>
            DecodedRow(r.media_id, r.kind, m.format, m.width, m.height,
              m.nFrames, m.sampleRate, m.durationMs,
              FakeCodec.feature(r.payload))
          case None =>
            val (w, h, f) = FakeCodec.decode(r.payload)
            DecodedRow(r.media_id, r.kind, "unknown", w, h,
              if (r.kind == "video") f else 1, 0, 0,
              FakeCodec.feature(r.payload))
        }
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th frame index.
    * Metadata-driven (frame counts parsed from the AVI main header); in
    * production each emitted row would carry the decoded frame bytes.
    */
  def sampleFrames(decoded: Dataset[DecodedRow], stride: Int = 4): DataFrame =
    decoded.toDF()
      .filter(col("kind") === "video" && col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
}
