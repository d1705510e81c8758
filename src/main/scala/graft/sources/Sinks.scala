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

  /** Write-parallelism guard (optimization guide §6): a write whose input
    * plans far narrower than the session's core count runs single-writer
    * (the driver test tables are 1-split scans — see core.Tables), so the
    * encode + compress work serializes. When that is detected, widen:
    * hash-repartition on the partition columns when there are any (keeps
    * ONE file set per directory value — same layout, parallel writers;
    * the guide's Iceberg `hash` distribution mode), round-robin
    * otherwise. On production-shaped input the probe sees enough
    * partitions and this is a no-op — no extra shuffle is ever added to a
    * wide write.
    */
  private def widen(df: DataFrame, partitionBy: Seq[String]): DataFrame = {
    // Only MAP-ONLY inputs are candidates: an input below a shuffle
    // (aggregate/join/window/sort/…) already has AQE-sized distribution,
    // and — decisive — probing an AQE plan's partitioning via .rdd
    // EXECUTES its shuffle stages as jobs, so the probe itself would run
    // the aggregation once before the write ran it again (measured on
    // q62: +0.9 s). On a shuffle-free plan the probe builds the RDD
    // lineage without running anything.
    import org.apache.spark.sql.catalyst.plans.logical._
    val plan = df.queryExecution.analyzed
    // SetOperation (Except/Intersect) shuffles; expression subqueries
    // (scalar-subquery aggregates and the like) hide whole shuffling
    // subtrees from the node-type scan — bail on both, or the .rdd probe
    // below would execute those stages before the write re-runs them
    // (the exact double-execution this guard exists to prevent).
    val shuffled = plan.collectFirst {
      case n @ (_: Aggregate | _: Join | _: Window | _: Distinct |
        _: Deduplicate | _: Sort | _: GlobalLimit |
        _: RepartitionOperation | _: SetOperation) => n
    }.isDefined || plan.subqueriesAll.nonEmpty
    if (shuffled) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 > target) df
    else if (partitionBy.nonEmpty)
      df.repartition(target, partitionBy.map(df.col): _*)
    else df.repartition(target)
  }

  /** Parquet write with bounded file size, optionally hash-partitioned
    * by columns (directory partitioning → partition pruning on read).
    */
  def parquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 1_000_000L,
      sortWithinPartitionsBy: Seq[String] = Nil): Unit = {
    // Unpartitioned columnar writes stay single-writer when narrow: the
    // A/B (q64_snapshot_diff 1.05→1.94 s with a round-robin widen) shows
    // the exchange plus multi-file read-back costs more than parallel
    // encoding saves; directory-partitioned writes DO win from the hash
    // widen (q48a 1.55→1.25 s) because each writer then owns whole
    // partition values and the encode work is heavier.
    val wide = if (partitionBy.nonEmpty) widen(df, partitionBy) else df
    val sorted =
      if (sortWithinPartitionsBy.nonEmpty)
        wide.sortWithinPartitions(sortWithinPartitionsBy.map(wide.col): _*)
      else wide
    val w = sorted.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** CSV sink (header, bounded file size). */
  def csv(df: DataFrame, path: String,
      maxRecordsPerFile: Long = 1_000_000L): Unit =
    widen(df, Nil).write.mode("overwrite")
      .option("header", "true")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .csv(path)

  /** JSON-lines sink. */
  def json(df: DataFrame, path: String): Unit =
    widen(df, Nil).write.mode("overwrite").json(path)

  /** Plain-text sink (one line per row; `df` must be a single string
    * column) — the raw-lines interchange format corpus pipelines ingest
    * from and export to. Compression codec selectable ("none", "gzip",
    * ...); gzip'd line files stay splittable at the FILE level, so
    * bounded maxRecordsPerFile doubles as the parallelism knob.
    */
  def text(df: DataFrame, path: String, compression: String = "none",
      maxRecordsPerFile: Long = 1_000_000L): Unit =
    widen(df, Nil).write.mode("overwrite")
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
    val w = (if (partitionBy.nonEmpty) widen(df, partitionBy) else df)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .orc(path)
  }
}
