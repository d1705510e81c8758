package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The actual codec work is STUBBED (this container ships no image/audio
  * libraries): `FakeCodec` is a deterministic stand-in that "decodes" a
  * fake header from the first bytes. Everything around it — the schema,
  * the mapPartitions batch shape, partition sizing, and the
  * feature/resize/frame-sample operator signatures — is the real Spark
  * plumbing a production decoder would drop into (swap `FakeCodec` for a
  * JNI/JavaCV call; the plan shape is unchanged).
  *
  * Scale notes: decode is per-row CPU-bound work with no shuffle —
  * `mapPartitions` keeps codec state (here trivially, in production the
  * native decoder handle) alive across a partition's rows instead of
  * re-initializing per row. Binary payloads stay off the driver; metadata
  * extraction projects only the header bytes via `substring` where
  * possible so parquet column pruning keeps full payload reads out of
  * metadata-only queries.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class DecodedRow(media_id: Long, kind: String, width: Int,
      height: Int, n_frames: Int, feature: Array[Float])

  /** Deterministic fake codec — stands in for the real decoder. */
  object FakeCodec {
    /** ??? in spirit: a real implementation would parse an actual codec
      * header. The fake derives stable dimensions from the payload bytes.
      */
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

  /** Synthesize a media table with binary payloads from the documents
    * table (deterministic: payload = utf8 bytes of the text). Stands in
    * for reading real image/audio blobs from parquet binary columns.
    */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Batch decode: one codec context per partition, rows streamed through
    * it. Returns typed metadata + a feature vector per row.
    */
  def decodeAll(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // production: initialize native decoder once per partition here
      rows.map { r =>
        val (w, h, f) = FakeCodec.decode(r.payload)
        DecodedRow(r.media_id, r.kind, w, h,
          if (r.kind == "video") f else 1,
          FakeCodec.feature(r.payload))
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th frame index.
    * Pure metadata op (the fake decoder yields frame counts); in
    * production each emitted row would carry the decoded frame bytes.
    */
  def sampleFrames(decoded: Dataset[DecodedRow], stride: Int = 4): DataFrame =
    decoded.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
}
