package graft.core

import org.apache.spark.sql.DataFrame

/** Deterministic release of `localCheckpoint`'ed DataFrames.
  *
  * `Dataset.unpersist()` consults only the CacheManager, which never saw
  * a checkpoint: `localCheckpoint` persists the UNDERLYING RDD (the
  * Dataset it returns is a plain scan over that RDD), so unpersist() on
  * the checkpointed frame is a silent no-op and the blocks linger until
  * the ContextCleaner happens to GC the RDD object. Fine for one-shot
  * queries; NOT fine for iterative kernels that checkpoint every
  * superstep (SSSP relaxation, Yen's K×hops spur searches), where
  * nondeterministic cleanup lets storage accumulate across iterations.
  *
  * release() reaches through the checkpoint scan's LogicalRDD leaf and
  * unpersists the RDD itself — immediate, targeted block removal. For
  * any other plan shape it falls back to Dataset.unpersist() (the
  * CacheManager path, correct for cache()/persist() frames).
  */
object Checkpoints {

  /** Internal cache()s a query result depends on, keyed by the result
    * Dataset's identity. A query builder that caches a shared
    * intermediate (q60's basket table feeds five consumers) cannot
    * unpersist it before returning — the plan hasn't executed yet — so
    * it registers the cache here via [[owns]] and the harness's
    * post-execution release(result) frees it. Weak keys: if a caller
    * drops the result without releasing, the entry (not the blocks —
    * those fall to the ContextCleaner, the pre-registry status quo)
    * vanishes with it.
    */
  private val owned = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, Seq[DataFrame]]())

  /** Register cached/checkpointed frames that back `result` so that
    * `release(result)` frees them once the result is materialized.
    * Returns `result` for expression-position use.
    */
  def owns(result: DataFrame, cached: DataFrame*): DataFrame = {
    owned.merge(result, cached.toSeq, (a, b) => a ++ b)
    result
  }

  /** Free the storage behind `df` now. Safe to call more than once.
    *
    * Walks the analyzed plan and unpersists EVERY checkpoint-scan leaf,
    * so it also works on frames *derived* from a checkpoint (the
    * distributed sssp/apsp results are projections over the kernel's
    * final state) — callers that are done with such a result can release
    * it. Only call when no other live frame shares the checkpoint.
    * Also frees any intermediates registered against `df` via [[owns]].
    */
  def release(df: DataFrame): Unit = {
    Option(owned.remove(df)).foreach(_.foreach(release))
    val leaves = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr
    }
    if (leaves.isEmpty) { df.unpersist(); () }
    else leaves.foreach(_.rdd.unpersist(blocking = false))
  }

  /** A stats-clean view of a materialized (checkpointed) frame.
    *
    * Spark 4.x `localCheckpoint` carries the origin plan's ESTIMATED
    * `Statistics` into the LogicalRDD leaf instead of the materialized
    * size. In an iterative kernel whose per-round plan references the
    * state MULTIPLE times under joins (Louvain's sig/kin/base fan-out),
    * the propagated sizeInBytes therefore MULTIPLIES each round — its
    * bit length grows ×3+ per round (measured 34 → 117 → 281 → … →
    * 168 603 bits by round 12), and once it reaches megabits every
    * optimizer pass does Toom-Cook BigInteger multiplications: rounds
    * that compute in 0.5 s plan for minutes. (Kernels that reference
    * state once per round — the SSSP relaxation — only grow the
    * estimate's bits additively and never hit this.)
    *
    * The Row round-trip through createDataFrame yields a leaf with NO
    * origin stats (plain defaultSizeInBytes), resetting the compounding
    * at a constant per-round cost of one decode/encode pass over the
    * state table. AQE re-plans joins from ACTUAL runtime sizes, so the
    * lost estimate does not change physical strategy quality. NOTE:
    * `release` cannot free the underlying checkpoint through the
    * returned view — keep the checkpointed frame and release THAT.
    */
  def freshStats(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)
}
