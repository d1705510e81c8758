package graft

import org.apache.spark.sql.DataFrame

/** Central list of all verifiable queries. Each sub-surface contributes
  * its own Seq[GQ]; SparkEntry exposes them in the driver's contract
  * shape (queries map + oracle SQL map).
  */
object Registry {

  /** Driver-computed (LocalRelation) results — the graph kernels' local
    * twins, path reconstructions, sketch readoffs — plan their one write
    * stage at `defaultParallelism` tasks (LocalTableScanExec parallelizes
    * its rows across min(rows, cores)), so a 37k-row community table
    * pays cores-many task dispatches to serialize ~1 MB. Coalesce such
    * results by their EXACT size (LocalRelation stats are row-accurate;
    * guide §2.2 — partition counts track volume, not core count). Only
    * plans whose optimized form IS a LocalRelation are touched: anything
    * distributed keeps its planned parallelism.
    */
  private def sizeLocalResult(df: DataFrame): DataFrame =
    df.queryExecution.optimizedPlan match {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        graft.core.Tables.sizedCoalesce(df)
      case _ => df
    }

  def all: Seq[GQ] =
    (queries.Relational.queries ++ queries.Graph.queries ++
      queries.Llm.queries ++ queries.Streaming.queries ++
      queries.Geo.queries)
      .map(g => g.copy(run = (s, d) => sizeLocalResult(g.run(s, d))))
}
