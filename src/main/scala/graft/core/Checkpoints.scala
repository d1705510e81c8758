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

  /** Free the storage behind `df` now. Safe to call more than once.
    *
    * Walks the analyzed plan and unpersists EVERY checkpoint-scan leaf,
    * so it also works on frames *derived* from a checkpoint (the
    * distributed sssp/apsp results are projections over the kernel's
    * final state) — callers that are done with such a result can release
    * it. Only call when no other live frame shares the checkpoint.
    */
  def release(df: DataFrame): Unit = {
    val leaves = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr
    }
    if (leaves.isEmpty) { df.unpersist(); () }
    else leaves.foreach(_.rdd.unpersist(blocking = false))
  }
}
