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

  /** Free the storage behind `df` now. Safe to call more than once. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
        ()
      case _ =>
        df.unpersist()
        ()
    }
}
