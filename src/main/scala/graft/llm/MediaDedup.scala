package graft.llm

import org.apache.spark.sql.Dataset

/** Perceptual near-duplicate hashing for video and audio — extending the
  * ImageDedup pattern (map-side integer content hash → skew-hardened
  * pigeonhole banding → exact Hamming verify) to the remaining two
  * modalities, closing the multimodal dedup family.
  *
  * Video: dHash/aHash per SAMPLED frame (stride like
  * Multimodal.sampleFrames — at 100 TB nobody hashes every frame), then
  * MAJORITY-POOLED per bit across the sampled frames (ties → 1): a
  * temporally-pooled 64-bit perceptual signature. Re-encodes, small
  * frame edits, and dropped frames flip few pooled bits; the pooled hash
  * feeds the SAME ImageDedup.nearDup bucketing.
  *
  * Audio: block-energy hashes over the decoded PCM. The samples split
  * into 64 equal blocks; block loudness = integer mean |amplitude|;
  * aHash bit = block ≥ overall mean (the l·64 ≥ total exact-integer
  * compare), dHash bit = block quieter than its right neighbor over a
  * 65-block grid — the 1-D analogue of the image 9×8 difference grid,
  * robust to global gain the way dHash is to brightness.
  *
  * Everything after decode is integer arithmetic on deterministic
  * positions, so the llm_video_neardup / llm_audio_neardup oracles
  * re-derive the identical bits from the synthetic recipes in SQL while
  * the Spark side hashes REAL container bytes (aviFrames / wavSamples):
  * a match proves decode + sampling + pooling + banding end to end.
  */
object MediaDedup {

  final case class MediaHashRow(media_id: Long, n_hashed: Int,
      ahash_hi: Long, ahash_lo: Long, dhash_hi: Long, dhash_lo: Long)

  private def toRow(id: Long, n: Int, a: Long, d: Long): MediaHashRow =
    MediaHashRow(id, n, a >>> 32, a & 0xffffffffL, d >>> 32, d & 0xffffffffL)

  /** Majority pooling per bit (ties → 1) across per-frame hashes. */
  private[graft] def poolBits(hs: Seq[Long]): Long = {
    var out = 0L
    var bit = 0
    while (bit < 64) {
      var c = 0
      hs.foreach(h => if (((h >>> bit) & 1L) == 1L) c += 1)
      if (2 * c >= hs.length) out |= 1L << bit
      bit += 1
    }
    out
  }

  /** Pooled perceptual hashes over REAL AVI decode, frames sampled at
    * `stride`. Undecodable payloads drop (the MediaHeaders totality
    * contract). Pure map-side.
    */
  def videoHashes(media: Dataset[Multimodal.MediaRow], stride: Int = 4)
      : Dataset[MediaHashRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      MediaHeaders.aviFrames(m.payload).flatMap { case (w, h, frames) =>
        val sampled = (0 until frames.length by stride).map(frames)
        val hashes = sampled.map(px => ImageDedup.perceptualHashes(w, h, px))
        // a zero-frame video has no signal: poolBits on an empty list
        // would yield all-ones (2*0 >= 0 per bit) and spuriously pair
        // every such video as an exact near-dup — drop it instead
        if (hashes.isEmpty) None
        else Some(toRow(m.media_id, hashes.length,
          poolBits(hashes.map(_._1)), poolBits(hashes.map(_._2))))
      }
    }
  }

  /** Block-energy (aHash, dHash) of a PCM sample array; None below 65
    * samples (a 65-block grid needs ≥ 1 sample per block).
    */
  private[graft] def audioBlockHashes(samples: Array[Short])
      : Option[(Long, Long)] = {
    val n = samples.length
    if (n < 65) return None
    def blockMean(blocks: Int, k: Int): Long = {
      val lo = k * n / blocks
      val hi = (k + 1) * n / blocks
      var s = 0L
      var i = lo
      while (i < hi) { s += math.abs(samples(i).toInt); i += 1 }
      s / (hi - lo)
    }
    val m64 = Array.tabulate(64)(blockMean(64, _))
    val total = m64.sum
    var a = 0L
    var i = 0
    while (i < 64) { if (m64(i) * 64 >= total) a |= 1L << i; i += 1 }
    val m65 = Array.tabulate(65)(blockMean(65, _))
    var d = 0L
    i = 0
    while (i < 64) { if (m65(i) < m65(i + 1)) d |= 1L << i; i += 1 }
    Some((a, d))
  }

  /** Block-energy hashes over REAL WAV decode. Pure map-side. */
  def audioHashes(media: Dataset[Multimodal.MediaRow])
      : Dataset[MediaHashRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").flatMap { m =>
      MediaHeaders.wavSamples(m.payload).flatMap(audioBlockHashes)
        .map { case (a, d) => toRow(m.media_id, 1, a, d) }
    }
  }
}
