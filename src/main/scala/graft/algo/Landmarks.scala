package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.PropertyGraph

/** Landmark (pivot) distance oracle — the standard scale answer when
  * pairwise shortest-path queries must be served over a graph too large
  * for per-query traversals (Goldberg–Harrelson ALT / Potamias et al.
  * landmark selection; the reference's APSP call site at
  * neo4j-code.txt:56-77 is exactly the workload this precomputation
  * serves once N² streaming stops being feasible).
  *
  * Precompute, once, for a small landmark set L:
  *   rev[L, u] = d(u → L)   (one multi-source pass on the reversed graph)
  *   fwd[L, v] = d(L → v)   (one multi-source pass on the forward graph)
  * Then any query pair (u, v) is answered from |L| rows per side:
  *   est(u, v) = min_{l ∈ L} rev[l, u] + fwd[l, v]  ≥  d(u, v),
  * with equality whenever some landmark lies on an optimal u→v path.
  *
  * Scale shape: the two distance tables are |L|·|V| rows keyed by
  * landmark — built by the same adaptive multi-source relaxation kernel
  * as g7/g15/g25 (|L| supersteps batched in one pass, nothing driver-
  * side above the LocalBudget), written once and reused by every query.
  * A query batch joins its filtered |A|·|L| and |B|·|L| slices on the
  * landmark key — broadcast-sized for online lookups, shuffle-free when
  * the tables are bucketed by landmark. Estimate arithmetic is one IEEE
  * add + an order-independent min over doubles + round(·,4), so the
  * whole pipeline hash-oracles against the chained-relaxation CTEs.
  */
object Landmarks {

  /** Triangle-inequality upper-bound estimates for every pair in
    * `srcSet` × `dstSet` (u ≠ v) reachable through at least one
    * landmark: (src_id, dst_id, n_via, est) where n_via counts the
    * landmarks with both legs finite and est = min over them, rounded
    * to 4 decimals (the g7 presentation contract).
    */
  def estimates(spark: SparkSession, g: PropertyGraph,
      landmarks: Seq[String], srcSet: Seq[String], dstSet: Seq[String])
      : DataFrame = {
    // absent ids contribute nothing (they have no distance rows); the
    // landmark set must also be restricted up front because the kernels
    // reject unknown sources. Bounded by |landmarks| — driver-safe.
    val present = g.nodes.select(col(g.nodes.columns(0)).cast("string"))
      .filter(col(g.nodes.columns(0)).isin(landmarks: _*))
      .collect().map(_.getString(0)).toSeq
    if (present.isEmpty) {
      // no landmark exists in the graph → no pair is estimable; an empty
      // typed frame, not a crash (parallelize rejects 0 partitions)
      import spark.implicits._
      return Seq.empty[(String, String, Long, Double)]
        .toDF("src_id", "dst_id", "n_via", "est")
    }
    val fwd = ShortestPaths.apsp(spark, g, Some(present))
    // d(u → L) = d(L → u) on the reversed multigraph; apsp materializes
    // eagerly (local CSR collect or checkpointed supersteps), so the
    // temporary reversed projection cache is dropped right after.
    val revG = PropertyGraph(g.nodes,
      g.edges.select(col("dst").as("src"), col("src").as("dst"),
        col("roadId"), col("cost")))
    val rev = ShortestPaths.apsp(spark, revG, Some(present))
    revG.projection.unpersist()
    val du = rev.filter(col("target_id").isin(srcSet: _*))
      .select(col("source_id").as("lm"), col("target_id").as("src_id"),
        col("distance").as("du"))
    val dv = fwd.filter(col("target_id").isin(dstSet: _*))
      .select(col("source_id").as("lm"), col("target_id").as("dst_id"),
        col("distance").as("dv"))
    du.join(dv, Seq("lm"))
      .filter(col("src_id") =!= col("dst_id"))
      .groupBy("src_id", "dst_id")
      .agg(count(lit(1)).as("n_via"),
        round(min(col("du") + col("dv")), 4).as("est"))
  }

  /** ALT (A*, Landmarks, Triangle inequality — Goldberg–Harrelson):
    * the same landmark tables as LOWER bounds steering A*. For target t
    * and landmark L, d(v,t) ≥ max(d(v,L) − d(t,L), d(L,t) − d(L,v));
    * the heuristic is the max over landmarks, floored at 0 — admissible
    * AND consistent, so A* under it returns the exact Dijkstra distance
    * while expanding fewer nodes. ∞ conventions: a finite-minus-∞
    * difference says nothing (skip); ∞-minus-finite proves v cannot
    * reach t at all (if v→t and t→L then v→L), so h = ∞ and the search
    * prunes v outright.
    *
    * Computes the |L| forward + |L| reverse tables with the sequential
    * kernel on the shared dense index space (LocalGraph.reverse — no id
    * remapping); driver cost O(|L|·(m + n log n)).
    */
  def altHeuristic(lg: LocalGraph, landmarkIds: Seq[Int], target: Int)
      : Array[Double] = {
    val rev = LocalGraph.reverse(lg)
    val fwd = landmarkIds.map(l => LocalKernels.sssp(lg, l)._1).toArray
    val toL = landmarkIds.map(l => LocalKernels.sssp(rev, l)._1).toArray
    val h = new Array[Double](lg.n)
    var v = 0
    while (v < lg.n) {
      var best = 0.0
      var i = 0
      while (i < fwd.length) {
        // d(v,t) ≥ d(v,L) − d(t,L)   [reverse table: toL(i)(x) = d(x→L)]
        val a = toL(i)(v) - toL(i)(target)
        if (!a.isNaN && a > best) best = a
        // d(v,t) ≥ d(L,t) − d(L,v)
        val b = fwd(i)(target) - fwd(i)(v)
        if (!b.isNaN && b > best) best = b
        i += 1
      }
      h(v) = best
      v += 1
    }
    h
  }
}
