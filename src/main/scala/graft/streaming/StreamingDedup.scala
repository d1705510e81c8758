package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig}

/** MinHash+LSH near-duplicate detection AT INGEST — the streaming twin of
  * llm.Dedup.minhashNearDup, so a corpus pipeline can flag near-dups as
  * documents arrive instead of re-running the batch join nightly.
  *
  * Shape: the stateless prefix (tokens → fused one-pass signature →
  * shingle set → per-band bucket keys) is the SAME column code as the
  * batch operator, computed map-side on the stream; the stateful core is
  * a transformWithState processor keyed by (band_id, band_key) holding
  * the bucket's documents in ListState. A new arrival compares against
  * its bucket peers ONLY (the LSH guarantee: near-dups collide in ≥1
  * band), computes the exact Jaccard inline, and appends itself to the
  * bucket. Pairs caught by several bands dedup downstream.
  *
  * Equivalence contract (pinned in StreamingSpec): on a finite replayed
  * file source, the emitted pairs are EXACTLY
  * `Dedup.minhashNearDup(batch).collect` — same signatures, same
  * buckets, same verification arithmetic (integer set sizes + the
  * portableRound formula).
  *
  * 100 TB/day shape: state is per-bucket document shingle sets, sharded
  * by (band_id, band_key) across the state-store partitions — hot
  * buckets are the same skew the batch operator's bucket join has, and
  * the optional TTL is the production lever: dedup against a trailing
  * window (say 7 days) bounds every bucket's list, which an unbounded
  * corpus history never would. TTL needs TimeMode.ProcessingTime, so the
  * finite-replay tests (TimeMode.None) run without it.
  */
object StreamingDedup {

  final case class BandedDoc(band_id: Int, band_key: String, doc_id: Long,
      sh: Seq[String])
  final case class BucketDoc(doc_id: Long, sh: Seq[String])
  final case class NearDupPair(id_a: Long, id_b: Long, jaccard: Double)

  /** Stateless prefix shared with the batch operator: band keys are the
    * raw signature-slice values (engine-portable, collision-free), the
    * shingle set rides along for in-state verification.
    */
  def bandedDocs(docs: DataFrame, w: Int, k: Int, bands: Int)
      : Dataset[BandedDoc] = {
    val rowsPerBand = k / bands
    require(bands * rowsPerBand == k, "bands must divide signature length")
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"), graft.llm.Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        call_function("graft_minhash_text", col("toks"), lit(w), lit(k))
          .as("sig"),
        graft.llm.Dedup.shinglesFromTokens(col("toks"), w).as("sh"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("sh"),
        posexplode(array((0 until bands).map { b =>
          concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)
              .cast("array<string>"))
        }: _*)).as(Seq("band_id", "band_key")))
      .select(col("band_id"), col("band_key"), col("doc_id"), col("sh"))
      .as[BandedDoc]
  }

  /** Per-bucket state: every document seen in this (band, key) bucket.
    * New rows verify against the bucket list and append themselves;
    * within-batch arrivals process in doc_id order so replay is
    * deterministic regardless of file-listing order.
    */
  private final class BucketProcessor(minJaccard: Double,
      ttl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        (Int, String), BandedDoc, NearDupPair] {
    @transient private var bucket:
        org.apache.spark.sql.streaming.ListState[BucketDoc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bucket = getHandle.getListState[BucketDoc]("bucket",
        org.apache.spark.sql.Encoders.product[BucketDoc],
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: (Int, String),
        rows: Iterator[BandedDoc],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[NearDupPair] = {
      val sorted = rows.toSeq.sortBy(_.doc_id)
      val prior = scala.collection.mutable.ArrayBuffer.empty[BucketDoc]
      bucket.get().foreach(d => prior += d)
      val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
      sorted.foreach { d =>
        val sb = d.sh.toSet
        prior.foreach { p =>
          if (p.doc_id != d.doc_id) {
            val sa = p.sh.toSet
            val inter = sa.count(sb.contains)
            val uni = sa.size + sb.size - inter
            if (uni > 0) {
              // the batch verifier's exact arithmetic: integer set sizes,
              // then the portableRound(…, 4) double formula
              val j = math.floor(inter / uni.toDouble * 10000.0 + 0.5) / 10000.0
              if (j >= minJaccard)
                out += NearDupPair(math.min(p.doc_id, d.doc_id),
                  math.max(p.doc_id, d.doc_id), j)
            }
          }
        }
        val bd = BucketDoc(d.doc_id, d.sh)
        prior += bd
        bucket.appendValue(bd)
      }
      out.iterator
    }
  }

  /** Streaming near-dup pairs (id_a < id_b, jaccard ≥ minJaccard),
    * deduplicated across bands. Requires the RocksDB state-store
    * provider (transformWithState), like sessionizeTws.
    */
  def nearDupPairs(docs: DataFrame, w: Int = 3, k: Int = 32,
      bands: Int = 8, minJaccard: Double = 0.6,
      ttl: Option[java.time.Duration] = None): DataFrame = {
    import docs.sparkSession.implicits._
    bandedDocs(docs, w, k, bands)
      .groupByKey(d => (d.band_id, d.band_key))
      .transformWithState(new BucketProcessor(minJaccard, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
      .toDF()
      // a pair caught by several bands carries the identical jaccard from
      // each; keep one. Unbounded dedup state on infinite streams is the
      // TTL discussion above — finite replay and windowed production both
      // bound it.
      .dropDuplicates("id_a", "id_b")
  }
}
