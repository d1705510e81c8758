package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy graph coloring by iterated maximal independent sets (the
  * Jones–Plassmann family): layer c = the MIS of the residual graph,
  * colored c, removed; repeat. Proper by construction (an MIS layer is
  * independent), and the layer count is bounded by Δ+1 on any graph
  * (every uncolored node loses a neighbor per layer at worst). The use
  * case at scale is conflict scheduling: rows sharing a color never
  * share an edge, so each color class updates in one conflict-free
  * parallel wave.
  *
  * Determinism rides entirely on [[IndependentSet.luby]]'s hash-shared
  * priorities, so the whole layered run replays as a fixed-layer SQL
  * chain and hash-verifies (slice 1: 7 layers, max degree 7).
  */
object Coloring {

  /** (node, color 1..k) for every node; `edges` directed, symmetrized
    * inside each MIS call.
    */
  def greedy(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      maxColors: Int = 12, lubyRounds: Int = 8,
      localEdgeThreshold: Long = IndependentSet.LocalEdgeThreshold)
      : DataFrame = {
    val allNodes = nodes.select(col(nodes.columns(0)).as("node"))
    val e = edges.select(col(edges.columns(0)).as("src"),
      col(edges.columns(1)).as("dst")).cache()
    val (nEdges, estBytes) = graft.core.LocalBudget.measureEdges(e)
    if (graft.core.LocalBudget.fitsLocal(nEdges, estBytes,
        localEdgeThreshold)) {
      // ---- local: ONE collect, all MIS layers on driver adjacency ----
      val pairs = e.collect().map(r => (r.getString(0), r.getString(1)))
      e.unpersist()
      val nodeIds = allNodes.collect().map(_.getString(0))
      val adj = collection.mutable.HashMap
        .empty[String, collection.mutable.Set[String]]
      pairs.foreach { case (a, b) =>
        if (a != b) {
          adj.getOrElseUpdate(a, collection.mutable.Set.empty) += b
          adj.getOrElseUpdate(b, collection.mutable.Set.empty) += a
        }
      }
      val color = collection.mutable.HashMap.empty[String, Int]
      var uncolored = nodeIds.toBuffer
      var c = 0
      while (uncolored.nonEmpty && c < maxColors) {
        c += 1
        val unSet = uncolored.toSet
        val layerAdj = adj.map { case (k, vs) =>
          k -> (vs.filter(unSet.contains): collection.Set[String])
        }
        val mis = IndependentSet.lubyLocal(uncolored.toArray, layerAdj,
          lubyRounds)
        mis.foreach(v => color(v) = c)
        uncolored = uncolored.filterNot(mis.contains)
      }
      if (uncolored.nonEmpty)
        throw new IllegalStateException(
          s"coloring (local) left ${uncolored.size} nodes after " +
            s"$maxColors layers")
      import spark.implicits._
      return nodeIds.map(v => (v, color(v))).toSeq.toDF("node", "color")
    }
    var residCp = allNodes.localCheckpoint(true)
    var resid = residCp
    var acc: Option[DataFrame] = None
    var c = 0
    var remaining = residCp.count()
    while (remaining > 0 && c < maxColors) {
      c += 1
      val subEdges = e
        .join(resid.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(resid.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst")
      val mis = IndependentSet.luby(spark, resid, subEdges, lubyRounds,
        localEdgeThreshold)
      val coloredCp = mis.filter(col("in_mis") === 1L)
        .select(col("node"), lit(c).as("color"))
        .localCheckpoint(true)
      val newResidCp = mis.filter(col("in_mis") === 0L).select("node")
        .localCheckpoint(true)
      graft.core.Checkpoints.release(mis)
      graft.core.Checkpoints.release(residCp)
      residCp = newResidCp
      resid = graft.core.Checkpoints.freshStats(newResidCp)
      acc = Some(acc match {
        case None => coloredCp
        case Some(a) =>
          val nxt = a.union(coloredCp).localCheckpoint(true)
          graft.core.Checkpoints.release(a)
          graft.core.Checkpoints.release(coloredCp)
          nxt
      })
      remaining = residCp.count()
      if (sys.env.contains("GRAFT_COLOR_DEBUG"))
        System.err.println(s"[coloring] layer $c remaining=$remaining")
    }
    graft.core.Checkpoints.release(residCp)
    e.unpersist()
    if (remaining > 0) {
      acc.foreach(graft.core.Checkpoints.release)
      throw new IllegalStateException(
        s"coloring left $remaining nodes after $maxColors layers — the " +
          "layer count is bounded by max degree + 1, so raise maxColors " +
          "for this graph")
    }
    acc.get
  }
}
