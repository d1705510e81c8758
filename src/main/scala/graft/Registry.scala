package graft

/** Central list of all verifiable queries. Each sub-surface contributes
  * its own Seq[GQ]; SparkEntry exposes them in the driver's contract
  * shape (queries map + oracle SQL map).
  */
object Registry {
  def all: Seq[GQ] =
    queries.Relational.queries ++ queries.Graph.queries ++
      queries.Llm.queries ++ queries.Streaming.queries ++
      queries.Geo.queries
}
