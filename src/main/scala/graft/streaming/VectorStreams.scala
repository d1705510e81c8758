package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType,
  LongType, StructField, StructType}

/** Streaming vector-index maintenance — the IVF ingest path as a live
  * pipeline. The production shape at 100 TB: the COARSE QUANTIZER (the
  * k-centroid table) is trained once on a bootstrap corpus and frozen —
  * retraining it would invalidate every existing posting — while new
  * vectors stream in and are assigned to their bucket at ingest, so the
  * posting lists an `ivfTopK` probe reads are always current. That
  * split (static quantizer, incremental postings) is exactly how
  * IVF-style services keep index freshness without rebuild storms, and
  * it makes the streaming stage STATELESS: one map-side argmax per
  * arriving vector (the same native `graft_nearest_centroids`
  * expression the batch assign uses — no shuffle, no state store), so
  * ingest throughput scales with input partitions alone.
  *
  * Equivalence contract (StreamingSpec + the stream_ann_ingest oracle):
  * on a finite replayed file source, the emitted assignments are
  * EXACTLY `Similarity.assignToCentroids(batch, cents)` — same centroid
  * table, same argmax arithmetic, same tie-break.
  */
object VectorStreams {

  /** File-stream source over an embeddings parquet (vec_id, embedding,
    * label) — single-file paths are staged into a directory the same
    * way EventStreams does.
    */
  def readEmbeddings(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.readStream.schema(schema)
      .parquet(EventStreams.streamableDir(path))
  }

  /** Assign each arriving vector to its nearest frozen centroid:
    * (vec_id, centroid_id). Pure map-side — the stream stays stateless.
    */
  def assignAtIngest(stream: DataFrame, cents: Seq[(Long, Seq[Float])])
      : DataFrame =
    graft.llm.Similarity.assignToCentroids(stream, cents)
      .select(col("vec_id"), col("centroid_id"))
}
