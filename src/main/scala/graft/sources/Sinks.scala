package graft.sources

import org.apache.spark.sql.DataFrame

/** Sink surface (SURVEY §2.1 S2/S6): partitioned, size-bounded writes.
  *
  * The reference's `PERIODIC COMMIT 2000` exists to bound memory during
  * ingest; the Spark-native equivalent of "bounded units of durable
  * progress" is file-count/size control on a partitioned columnar write.
  * At 100 TB the knobs that matter are: partition column choice (prune at
  * read time), maxRecordsPerFile (bound file size for downstream
  * parallelism), and sorted-within-partition layout (row-group skipping).
  */
object Sinks {

  /** Parquet write with bounded file size, optionally hash-partitioned
    * by columns (directory partitioning → partition pruning on read).
    */
  def parquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 1_000_000L,
      sortWithinPartitionsBy: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortWithinPartitionsBy.nonEmpty)
        df.sortWithinPartitions(sortWithinPartitionsBy.map(df.col): _*)
      else df
    val w = sorted.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** CSV sink (header, bounded file size). */
  def csv(df: DataFrame, path: String,
      maxRecordsPerFile: Long = 1_000_000L): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .csv(path)

  /** JSON-lines sink. */
  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Plain-text sink (one line per row; `df` must be a single string
    * column) — the raw-lines interchange format corpus pipelines ingest
    * from and export to. Compression codec selectable ("none", "gzip",
    * ...); gzip'd line files stay splittable at the FILE level, so
    * bounded maxRecordsPerFile doubles as the parallelism knob.
    */
  def text(df: DataFrame, path: String, compression: String = "none",
      maxRecordsPerFile: Long = 1_000_000L): Unit =
    df.write.mode("overwrite")
      .option("compression", compression)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .text(path)

  /** ORC sink — same partition/size knobs as parquet; ORC's row-group
    * indexes + bloom filters give the same predicate-skipping story for
    * deployments standardized on ORC.
    */
  def orc(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 1_000_000L): Unit = {
    val w = df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .orc(path)
  }
}
