package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated synthetic tables (TESTDATA.md /
  * FIXTURES.md §B): one parquet per table under `sfDir`.
  *
  * Parquet scans are columnar + vectorized; Catalyst pushes filters and
  * prunes columns, so callers should express selection declaratively and
  * NOT pre-materialize.
  */
final class Tables(spark: SparkSession, sfDir: String) {
  def apply(name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region: DataFrame = apply("region")
  def nation: DataFrame = apply("nation")
  def customer: DataFrame = apply("customer")
  def supplier: DataFrame = apply("supplier")
  def part: DataFrame = apply("part")
  def orders: DataFrame = apply("orders")
  def lineitem: DataFrame = apply("lineitem")
  /** events.parquet has shipped with three different physical encodings of
    * `ts` across testdata regenerations: TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — read as raw nanos via the legacy long
    * mode), plain `timestamp[us]` without a timezone (read as
    * TIMESTAMP_NTZ), and UTC-adjusted `timestamp[us]` (read as
    * TimestampType). Normalize ALL of them here to the session-UTC
    * TimestampType so every downstream operator sees ONE canonical type —
    * the session timezone is UTC, so the NTZ→LTZ cast is value-identical,
    * and the nanos→micros conversion is lossless for this data (values
    * carry at most µs precision). This single normalization point is what
    * keeps range joins, `unix_micros`, and streaming state ops working
    * regardless of how the files were written.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeTs(apply("events"))
  }
  def documents: DataFrame = apply("documents")
  def embeddings: DataFrame = apply("embeddings")
}

object Tables {
  def apply(spark: SparkSession, sfDir: String): Tables =
    new Tables(spark, sfDir)

  /** Normalize a `ts` column to the session-UTC TimestampType whatever the
    * stored encoding was (nanos-as-long, TIMESTAMP_NTZ, or TimestampType).
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol,
          col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
}
