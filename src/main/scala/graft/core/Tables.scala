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
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects. Read it as raw nanos (legacy long mode) and
    * convert to a microsecond TimestampType column — lossless for this data
    * (values carry at most µs precision) and matches DuckDB's view of the
    * same file at µs granularity.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents: DataFrame = apply("documents")
  def embeddings: DataFrame = apply("embeddings")
}

object Tables {
  def apply(spark: SparkSession, sfDir: String): Tables =
    new Tables(spark, sfDir)
}
