package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * Metadata decode is REAL: `MediaHeaders.parse` reads actual PNG / BMP /
  * WAV / AVI container headers (magic-byte dispatch + bounds-checked
  * field reads at the formats' public offsets). Pixel/sample decode is
  * REAL for the uncompressed formats: 24bpp BMP rasters (stride-padded
  * bottom-up rows → RGB → Rec.601 luma histogram) and 16-bit PCM WAV
  * (samples → rms/peak/zero-crossings/energy envelope). Compressed
  * codecs (PNG deflate, AVI frame formats) are out of scope for this
  * container (no codec libs ship here) — the deterministic `FakeCodec`
  * stands in for their content features and for payloads whose magic
  * matches no known container (in production: a JNI/JavaCV decode
  * feeding an embedding model; the plan shape is unchanged).
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
    * video — written by MediaHeaders with deterministic dimensions
    * derived from doc_id. EVERY payload now carries real content: BMP
    * rasters and zlib-compressed PNG rasters (per-pixel gradients), PCM
    * WAV samples (integer triangle wave), and uncompressed-DIB AVI
    * frame chunks — so pixel/sample/frame decode downstream is genuine
    * end to end. Stands in for reading real blobs from parquet binary
    * columns while keeping every downstream byte-parse genuine.
    */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"))
      .as[Long]
      .map { id =>
        (id % 3) match {
          case 0 =>
            // small real raster: dims capped so the synthetic corpus
            // stays MBs, pixels a deterministic id-keyed gradient.
            // Even ids encode it as a real zlib PNG (filter type cycled
            // over all five so decode exercises every reconstruction
            // path), odd ids as an uncompressed 24bpp BMP.
            val (pw, ph) = (16 + (id % 48).toInt, 16 + ((id / 5) % 48).toInt)
            val rgb = Array.tabulate(pw * ph) { i =>
              val x = i % pw; val y = i / pw
              (((x * 7 + id) % 256).toInt << 16) |
                (((y * 5 + id / 3) % 256).toInt << 8) |
                ((x + y + id) % 256).toInt
            }
            val payload =
              if (id % 2 == 0)
                MediaHeaders.pngBytesRgb(pw, ph, rgb, ((id / 2) % 5).toInt)
              else MediaHeaders.bmpBytesRgb(pw, ph, rgb)
            MediaRow(id, "image", payload)
          case 1 =>
            // modulus independent of the id % 3 kind split, so rates
            // actually vary across 8/16/24 kHz
            val rate = 8000 * (1 + ((id / 3) % 3).toInt)
            val nSamples = rate * (1 + (id % 5).toInt) / 100 // 10-50 ms
            // integer triangle wave, period keyed off the id
            val period = 64 + (id % 192).toInt
            val samples = Array.tabulate(nSamples) { i =>
              val ph = i % period
              val tri = if (ph < period / 2) ph else period - ph
              ((tri * 4096 / math.max(1, period / 2)) - 2048).toShort
            }
            MediaRow(id, "audio", MediaHeaders.wavBytesPcm16(rate, samples))
          case _ =>
            // real uncompressed-DIB frames: a small per-frame gradient
            // that shifts with the frame index, so frame features vary
            val frames = 1 + (id % 16).toInt
            val (fw, fh) = (8 + (id % 17).toInt, 8 + ((id / 11) % 13).toInt)
            val fs = Array.tabulate(frames) { fi =>
              Array.tabulate(fw * fh) { i =>
                val x = i % fw; val y = i / fw
                (((x * 3 + fi * 11 + id) % 256).toInt << 16) |
                  (((y * 7 + fi * 5) % 256).toInt << 8) |
                  ((x + y + fi + id) % 256).toInt
              }
            }
            MediaRow(id, "video", MediaHeaders.aviBytesDib(fw, fh, 33333, fs))
        }
      }
  }

  /** 8-bin luma histogram over a decoded RGB raster, L1-normalized —
    * a REAL content feature (Rec.601 integer luma), not a byte hash.
    */
  def lumaHistogram(rgb: Array[Int], bins: Int = 8): Array[Float] = {
    val out = new Array[Float](bins)
    if (rgb.isEmpty) return out
    var i = 0
    while (i < rgb.length) {
      val c = rgb(i)
      val r = (c >> 16) & 0xff; val g = (c >> 8) & 0xff; val b = c & 0xff
      val luma = (r * 299 + g * 587 + b * 114) / 1000 // 0..255
      out(math.min(bins - 1, luma * bins / 256)) += 1f
      i += 1
    }
    var j = 0
    while (j < bins) { out(j) /= rgb.length; j += 1 }
    out
  }

  /** Real audio features from PCM samples: [rms, peak, zero-crossing
    * rate, mean, |mean|, energy thirds] — 8 dims, amplitudes normalized
    * to [-1, 1] against the 16-bit range.
    */
  def pcmFeatures(samples: Array[Short]): Array[Float] = {
    val out = new Array[Float](8)
    val n = samples.length
    if (n == 0) return out
    var sum = 0.0; var sumSq = 0.0; var peak = 0.0; var zc = 0
    val third = math.max(1, n / 3)
    val e = new Array[Double](3)
    var i = 0
    while (i < n) {
      val s = samples(i) / 32768.0
      sum += s; sumSq += s * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && (samples(i) >= 0) != (samples(i - 1) >= 0)) zc += 1
      e(math.min(2, i / third)) += s * s
      i += 1
    }
    out(0) = math.sqrt(sumSq / n).toFloat
    out(1) = peak.toFloat
    out(2) = zc.toFloat / n
    out(3) = (sum / n).toFloat
    out(4) = math.abs(sum / n).toFloat
    out(5) = (e(0) / n).toFloat; out(6) = (e(1) / n).toFloat
    out(7) = (e(2) / n).toFloat
    out
  }

  /** Batch decode: one codec context per partition, rows streamed
    * through it. Header parse is real for all four containers, and
    * content decode is now real for all four too: BMP (24bpp raster),
    * PNG (zlib inflate + scanline de-filtering — the JDK ships
    * DEFLATE), WAV (16-bit PCM) and AVI (uncompressed '00db' DIB frame
    * chunks → mean frame histogram). Compressed VIDEO codecs inside AVI
    * remain out of scope (no codec libs here) — such chunks skip and
    * the payload falls back to the deterministic byte-hash feature, as
    * do header-only or unknown payloads. Totality either way.
    */
  def decodeAll(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // production: initialize native decoder once per partition here
      rows.map { r =>
        MediaHeaders.parse(r.payload) match {
          case Some(m) =>
            val feature = m.format match {
              case "bmp" => MediaHeaders.bmpPixels(r.payload)
                .map { case (_, _, rgb) => lumaHistogram(rgb) }
                .getOrElse(FakeCodec.feature(r.payload))
              case "png" => MediaHeaders.pngPixels(r.payload)
                .map { case (_, _, rgb) => lumaHistogram(rgb) }
                .getOrElse(FakeCodec.feature(r.payload))
              case "wav" => MediaHeaders.wavSamples(r.payload)
                .map(pcmFeatures)
                .getOrElse(FakeCodec.feature(r.payload))
              case "avi" => MediaHeaders.aviFrames(r.payload)
                .map { case (_, _, fs) =>
                  // mean per-bin luma histogram across decoded frames
                  val acc = new Array[Float](8)
                  fs.foreach { f =>
                    val hist = lumaHistogram(f)
                    var i = 0
                    while (i < 8) { acc(i) += hist(i); i += 1 }
                  }
                  var i = 0
                  while (i < 8) { acc(i) /= fs.length; i += 1 }
                  acc
                }
                .getOrElse(FakeCodec.feature(r.payload))
              case _ => FakeCodec.feature(r.payload)
            }
            DecodedRow(r.media_id, r.kind, m.format, m.width, m.height,
              m.nFrames, m.sampleRate, m.durationMs, feature)
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
