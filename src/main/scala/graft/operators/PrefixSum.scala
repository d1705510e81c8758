package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global running total (inclusive prefix sum) of a weight column
  * in the order of a UNIQUE key column — without ever collapsing the
  * data onto one partition.
  *
  * The naive formulation, `sum(w) OVER (ORDER BY key)` with no PARTITION
  * BY, plans as a single-partition window: the entire dataset shuffles to
  * one task, which is exactly the shape that dies first at 100 TB. This
  * operator computes the same result with the classic two-level scan:
  *
  *  1. range-repartition on the key into `buckets` ordered ranges;
  *  2. one tiny aggregation collects the per-bucket subtotals
  *     (`buckets` rows — driver memory is O(buckets), never O(rows));
  *  3. an exclusive prefix over those subtotals becomes each bucket's
  *     offset, broadcast-joined back;
  *  4. a window PARTITIONED by bucket adds the within-bucket running sum.
  *
  * Every step is a narrow shuffle or a broadcast; wall-clock is two
  * passes over the data and the only sort is partition-local. The result
  * is independent of where the sampled range boundaries fall (the prefix
  * sum over key order doesn't care how the order is cut into buckets) —
  * but the boundaries themselves are sampled, so the partitioned frame
  * is materialized ONCE (localCheckpoint) and both consumers (subtotal
  * agg, final window) read that materialization; re-executing the range
  * shuffle per consumer could re-sample different boundaries and tear
  * the bucket ids out from under the offsets. Callers should
  * `graft.core.Checkpoints.release` the RESULT when done with it.
  */
object PrefixSum {

  /** Returns `df` plus a `running_total` long column: the inclusive
    * prefix sum of `weightCol` ordered by `keyCol`.
    *
    * `keyCol` must be unique per row (it is the total order; a tie would
    * make the within-bucket window order — and thus the split of the
    * running total across tied rows — nondeterministic).
    */
  def running(df: DataFrame, keyCol: String, weightCol: String,
      buckets: Int = 32): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")

    // Materialize one range-partitioning so every consumer below sees
    // the same sampled boundaries (and the expensive upstream plan runs
    // once). spark_partition_id() of a range shuffle increases with the
    // range order, which is what makes step 3's prefix correct.
    val parted = df
      .repartitionByRange(buckets, col(keyCol))
      .withColumn("__bucket", spark_partition_id())
      .localCheckpoint()

    val spark = parted.sparkSession
    import spark.implicits._

    // O(buckets) rows to the driver — bounded by the caller's bucket
    // count, not by data volume (the IVF centroid collect pattern).
    // NULL weights count as 0 (the coalesce also keeps the tuple decode
    // below total when an entire bucket is NULL-weighted; the window sum
    // agrees because sum() skips NULLs).
    val subtotals = parted
      .groupBy(col("__bucket"))
      .agg(sum(coalesce(col(weightCol).cast("long"), lit(0L))).as("__sub"))
      .as[(Int, Long)]
      .collect()
      .sortBy(_._1)

    // Exclusive prefix over the subtotals = each bucket's base offset.
    // (Empty buckets are simply absent from both the agg and the join.)
    val offsets = subtotals.map(_._2).scanLeft(0L)(_ + _).init
    val offsetDf = subtotals.map(_._1).zip(offsets).toSeq
      .toDF("__bucket", "__offset")

    val w = Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    parted
      .join(broadcast(offsetDf), Seq("__bucket"))
      .withColumn("running_total",
        sum(col(weightCol).cast("long")).over(w) + col("__offset"))
      .drop("__bucket", "__offset")
  }
}
