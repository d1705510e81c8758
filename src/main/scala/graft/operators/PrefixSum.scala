package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact global running total (inclusive prefix sum) of a weight column
  * in the order of a UNIQUE key column — without ever collapsing the
  * data onto one partition.
  *
  * The naive formulation, `sum(w) OVER (ORDER BY key)` with no PARTITION
  * BY, plans as a single-partition window: the entire dataset shuffles to
  * one task, which is exactly the shape that dies first at 100 TB. This
  * operator computes the same result with the classic two-level scan:
  *
  *  1. range-repartition on the key into `buckets` ordered ranges
  *     (the ONLY shuffle in the operator);
  *  2. one tiny aggregation collects the per-partition subtotals
  *     (`buckets` rows — driver memory is O(buckets), never O(rows));
  *  3. an exclusive prefix over those subtotals becomes each partition's
  *     base offset, shipped to tasks as an O(buckets) closure map;
  *  4. a PARTITION-LOCAL sort + a single mapPartitions accumulator pass
  *     adds the within-partition running sum on top of the offset.
  *
  * Step 4 deliberately avoids `sum() OVER (PARTITION BY bucket)`: the
  * window's ClusteredDistribution requirement would re-shuffle the
  * already-range-partitioned data a second time (RangePartitioning on
  * the key does not satisfy clustering on the derived bucket id even
  * though each range partition holds exactly one bucket). A running
  * accumulator over a sorted partition is genuine per-partition
  * imperative logic — the one place mapPartitions beats the declarative
  * form. Measured at 20M rows (OperatorScaleCheck): one shuffle + one
  * local sort, vs shuffle + shuffle + sort for the window variant.
  *
  * The result is independent of where the sampled range boundaries fall
  * (a prefix sum doesn't care how the order is cut into buckets) — but
  * the boundaries themselves are sampled, so the partitioned frame is
  * materialized ONCE (localCheckpoint) and both consumers (subtotal agg,
  * accumulator pass) read that materialization; re-executing the range
  * shuffle per consumer could re-sample different boundaries and tear
  * the partition ids out from under the offsets. Callers should
  * `graft.core.Checkpoints.release` the RESULT when done with it.
  */
object PrefixSum {

  /** Returns `df` plus a `running_total` long column: the inclusive
    * prefix sum of `weightCol` (cast to long; NULLs count as 0) ordered
    * by `keyCol`.
    *
    * `keyCol` must be unique and non-null per row (it is the total
    * order; a tie would make the within-partition accumulation order —
    * and thus the split of the running total across tied rows —
    * nondeterministic).
    */
  def running(df: DataFrame, keyCol: String, weightCol: String,
      buckets: Int = 0): DataFrame = {
    require(!df.columns.contains("running_total"),
      "input must not already have a running_total column")
    runningMulti(df, keyCol, Seq(weightCol), buckets)
      .withColumnRenamed(s"running_$weightCol", "running_total")
  }

  /** Several independent prefix sums over the SAME key order in one
    * range shuffle + one accumulator pass — a consumer needing both a
    * rank (weight 1) and a weighted offset (e.g. token counts) pays one
    * shuffle instead of two. Returns `df` plus a `running_<weightCol>`
    * long column per requested weight.
    */
  def runningMulti(df: DataFrame, keyCol: String, weightCols: Seq[String],
      buckets: Int = 0): DataFrame = {
    require(buckets >= 0, s"buckets must be >= 0 (0 = auto), got $buckets")
    require(weightCols.nonEmpty, "need at least one weight column")
    val wTmp = weightCols.indices.map(i => s"__w$i")
    val outCols = weightCols.map(w => s"running_$w")
    // __bucket matters most: withColumn would REPLACE an existing one in
    // place and the positional dropRight below would strip real data
    val reserved = Seq("__bucket") ++ wTmp ++ outCols
    require(!df.columns.exists(reserved.contains),
      s"input must not already have ${reserved.mkString("/")} columns")

    // Materialize one range-partitioning so every consumer below sees
    // the same sampled boundaries (and the expensive upstream plan runs
    // once). Partition index of a range shuffle increases with the
    // range order, which is what makes the offset prefix correct. The
    // index is materialized INTO the checkpoint as a column: a runtime
    // TaskContext.getPartitionId() in the final pass would lie under a
    // downstream narrow coalesce (which computes several parent
    // partitions inside one task — e.g. Verify's coalesce(1) writes),
    // whereas checkpointed data cannot change underneath us.
    // Volume-adaptive bucket count (buckets = 0), the
    // DistributedPercentile policy: 256 KB of ESTIMATED bytes per range
    // bucket (the bucket sort is CPU-bound and the estimate undercounts
    // in-memory size ~10-20x — see the grain note there) — the fixed 32
    // paid 32-task stages on kilobyte inputs and would under-partition
    // a 100 TB one. Cut positions never change a prefix sum (it is
    // order-defined, not cut-defined).
    val nBuckets =
      if (buckets >= 1) buckets
      else {
        val per = 256L * 1024
        val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
        ((bytes + per - 1) / per).max(1).min(32768).toInt
      }
    val parted = df.repartitionByRange(nBuckets, col(keyCol))
      .withColumn("__bucket", spark_partition_id())
      .localCheckpoint()
    val work = weightCols.zip(wTmp).foldLeft(parted) { case (d, (w, t)) =>
      d.withColumn(t, coalesce(col(w).cast("long"), lit(0L)))
    }

    // O(buckets) rows to the driver — bounded by the caller's bucket
    // count, not by data volume (the IVF centroid collect pattern).
    // Empty partitions are simply absent (they contribute 0 anyway).
    val subtotals = work
      .groupBy(col("__bucket"))
      .agg(sum(col(wTmp.head)).as("s0"),
        wTmp.tail.zipWithIndex.map { case (t, i) =>
          sum(col(t)).as(s"s${i + 1}") }: _*)
      .collect()
      .map(r => r.getInt(0) -> wTmp.indices.map(i => r.getLong(i + 1)).toArray)
      .sortBy(_._1)

    // Exclusive prefix over the subtotals = each partition's base
    // offsets; small enough to ride along in the task closure.
    val offsets: Map[Int, Array[Long]] =
      subtotals.map(_._1).zip(
        subtotals.map(_._2).scanLeft(Array.fill(wTmp.size)(0L)) {
          (acc, s) => acc.zip(s).map { case (a, b) => a + b }
        }.init).toMap

    val bIdx = work.schema.fieldIndex("__bucket")
    val wIdxs = wTmp.map(work.schema.fieldIndex).toArray
    val outSchema = outCols.foldLeft(df.schema)(
      (sch, c) => sch.add(c, LongType, nullable = false))
    val nW = wIdxs.length
    // One mapPartitions invocation sees exactly one bucket (bucket =
    // partition index by construction, and the function sits below any
    // caller-added repartitioning in the plan), so the offsets are read
    // from the first row's bucket id.
    work
      .sortWithinPartitions(col(keyCol))
      .mapPartitions { it =>
        var accs: Array[Long] = null
        it.map { r =>
          if (accs == null)
            accs = offsets.getOrElse(r.getInt(bIdx),
              Array.fill(nW)(0L)).clone()
          var i = 0
          while (i < nW) { accs(i) += r.getLong(wIdxs(i)); i += 1 }
          Row.fromSeq(r.toSeq.dropRight(1 + nW) ++ accs.toSeq)
        }
      }(Encoders.row(outSchema))
  }
}
