package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL table function `graft_shortest_path(src, dst)` — the graph
  * surface made SQL-callable like the rest of the engine (SURVEY §7.3's
  * deferred capstone):
  *
  * {{{ SELECT * FROM graft_shortest_path('2022', '2802') }}}
  *
  * returns the (seq, node_id, cost) path rows of
  * `ShortestPaths.dijkstraPath` over the session's edge-list graph.
  *
  * Resolution happens at PLAN time on the driver, exactly like VALUES or
  * `range(...)`: the anchors must be string literals, the path kernel
  * runs once during analysis (microseconds on the reference graph via
  * the LocalGraph fast path; the distributed relaxation kernel above the
  * size threshold — ShortestPaths picks, same as the DataFrame surface),
  * and the resulting rows enter the plan as a local relation. An empty
  * result (unreachable target) is an empty relation with the same
  * schema, matching the DataFrame API's contract.
  */
object ShortestPathTvf {

  val Name = "graft_shortest_path"

  private def litStr(e: Expression, arg: String): String = e match {
    case l: Literal if l.value != null => l.value.toString
    case _ => throw new IllegalArgumentException(
      s"$Name: argument '$arg' must be a non-null string literal, got ${e.sql}")
  }

  /** The TableFunctionRegistry builder (Seq[Expression] => LogicalPlan). */
  def build(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"$Name(src, dst) takes exactly two literal node ids, got ${exprs.length}")
    val src = litStr(exprs(0), "src")
    val dst = litStr(exprs(1), "dst")
    val spark = SparkSession.active
    val pg = graft.queries.Graph.graphFor(spark,
      graft.queries.Graph.edgeListPath)
    graft.algo.ShortestPaths.dijkstraPath(spark, pg, src, dst)
      .queryExecution.logical
  }

  val info: ExpressionInfo =
    new ExpressionInfo(ShortestPathTvf.getClass.getName, Name)

  def identifier: FunctionIdentifier = FunctionIdentifier(Name)
}
