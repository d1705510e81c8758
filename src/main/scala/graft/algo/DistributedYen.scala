package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Yen's K loopless shortest paths over the DISTRIBUTED relaxation
  * kernel — the scale path for graphs whose projection exceeds the
  * driver threshold. The Yen outer loop is inherently sequential
  * (each accepted path seeds the next round's spur searches), so the
  * driver orchestrates; within ONE round the spur searches are mutually
  * independent (their ban masks derive only from already-ACCEPTED
  * paths), so the round runs as ONE batched multi-spur relaxation:
  * state keyed by (spur, nodeId), each spur's tiny ban masks applied as
  * broadcast anti-joins at candidate generation, per-spur frontier-level
  * early exit, and a level-batched backward walk that reconstructs ALL
  * spur paths in max-hops lookup jobs instead of sum-of-hops.
  *
  * Why batching (round 18, the r15 VERDICT's #5): a single spur search
  * at cluster scale is dominated by superstep SCHEDULING, not data
  * volume — k·|path| sequential searches paid that latency k·|path|
  * times (448–944 s for one k=3 query at 2M edges). Sharing supersteps
  * across a round's spurs cuts the job count from Σ_spurs(rounds_s) to
  * max_s(rounds_s); per-spur early exit prunes each settled spur's rows
  * from the shared frontier, so the extra data volume decays as spurs
  * finish. Correctness is per-spur independent: the batched kernel is
  * |spurs| disjoint single-source relaxations that happen to share jobs
  * (every join/agg key leads with `spur` — no cross-spur row ever
  * merges), and the settling argument (target dist ≤ min frontier dist
  * ⇒ final, non-negative weights) applies per spur exactly as in
  * [[DistributedSSSP]].
  *
  * Determinism: batched results are read back and enqueued in ascending
  * spur-index order — the same candidate-pool insertion sequence as the
  * sequential loop, so tie behavior is identical (asserted by
  * GraphAlgoSpec batched ≡ sequential).
  */
object DistributedYen {

  final case class Path(nodes: Vector[String], costs: Vector[Double]) {
    def total: Double = costs.last
  }

  /** One spur search: start at `source`, per-spur banned edge pairs and
    * banned nodes (both tiny — derived from already-accepted paths).
    */
  final case class SpurSpec(id: Int, source: String,
      bannedEdges: Seq[(String, String)], bannedNodes: Seq[String])

  private def checkpointed(df: DataFrame): DataFrame =
    df.localCheckpoint(true)

  /** All spur searches of one Yen round as ONE relaxation loop.
    * `edges` must already be a (src, dst, cost) frame (caller persists).
    * Returns spur id → (nodes, running costs) for spurs that reach
    * `target`; unreachable spurs are absent.
    */
  private[algo] def runSpurBatch(spark: SparkSession, edges: DataFrame,
      spurs: Seq[SpurSpec], target: String,
      maxIter: Int = 100000): Map[Int, (Seq[String], Seq[Double])] = {
    import spark.implicits._
    require(spurs.map(_.id).distinct.length == spurs.length,
      "duplicate spur ids")
    // degenerate spur (source == target): the empty path, settled now
    val (trivial, live) = spurs.partition(_.source == target)
    val trivialOut = trivial.map(s =>
      s.id -> (Seq(s.source), Seq(0.0))).toMap
    if (live.isEmpty) return trivialOut

    val bannedE = live.flatMap(s =>
      s.bannedEdges.map(p => (s.id, p._1, p._2)))
    val bannedN = live.flatMap(s => s.bannedNodes.map(n => (s.id, n)))
    val bannedEDf = if (bannedE.isEmpty) None
      else Some(bannedE.toDF("b_spur", "b_src", "b_dst"))
    val bannedNDf = if (bannedN.isEmpty) None
      else Some(bannedN.toDF("bn_spur", "bn_node"))

    var state = checkpointed(live.map(s => (s.id, s.source, 0.0, ""))
      .toDF("spur", "nodeId", "dist", "pred")
      .repartition(col("nodeId")))
    var frontier = state
    var iter = 0
    var done = false

    while (!done && iter < maxIter) {
      // candidate relaxations; ban masks are per-spur broadcast
      // anti-joins — a banned (u, v) edge kills the (spur, pred=u,
      // nodeId=v) candidate, a banned node kills every candidate
      // landing on it (sources are never banned, so banned nodes are
      // unreachable rather than filtered from the edge set)
      val cand0 = frontier.join(edges, frontier("nodeId") === edges("src"))
        .select(col("spur"), col("dst").as("nodeId"),
          (col("dist") + col("cost")).as("dist"), col("src").as("pred"))
      val cand1 = bannedEDf.fold(cand0)(b => cand0.join(broadcast(b),
        col("spur") === col("b_spur") && col("pred") === col("b_src") &&
          col("nodeId") === col("b_dst"), "left_anti"))
      val cand2 = bannedNDf.fold(cand1)(b => cand1.join(broadcast(b),
        col("spur") === col("bn_spur") && col("nodeId") === col("bn_node"),
        "left_anti"))
      val cand = cand2.groupBy(col("spur"), col("nodeId"))
        .agg(min(struct(col("dist"), col("pred"))).as("s"))
        .select(col("spur"), col("nodeId"),
          col("s.dist").as("dist"), col("s.pred").as("pred"))

      val improved = checkpointed(cand.join(
          state.select(col("spur").as("o_spur"),
            col("nodeId").as("o_nodeId"), col("dist").as("o_dist")),
          cand("spur") === col("o_spur") &&
            cand("nodeId") === col("o_nodeId"), "left_outer")
        .filter(col("o_dist").isNull || col("dist") < col("o_dist"))
        .select(col("spur"), col("nodeId"), col("dist"), col("pred")))

      if (improved.isEmpty) {
        done = true
        graft.core.Checkpoints.release(improved)
      } else {
        val newState = checkpointed(
          state.join(improved.select(col("spur").as("i_spur"),
                col("nodeId").as("i_nodeId")),
              state("spur") === col("i_spur") &&
                state("nodeId") === col("i_nodeId"), "left_anti")
            .union(improved))
        graft.core.Checkpoints.release(state)
        if (frontier ne state) graft.core.Checkpoints.release(frontier)
        state = newState

        // per-spur settling: a spur whose target dist ≤ its min frontier
        // dist can never improve (non-negative weights) — drop its rows
        // from the shared frontier so finished spurs stop paying for
        // unfinished ones. ONE action: small agg-join collect (≤ |spurs|
        // rows), same per-superstep cost shape as the single-source
        // kernel's early-exit check.
        val settledRows = improved.groupBy(col("spur"))
          .agg(min(col("dist")).as("f"))
          .join(state.filter(col("nodeId") === lit(target))
              .groupBy(col("spur")).agg(min(col("dist")).as("t")),
            Seq("spur"), "left_outer")
          .collect()
        val settled = settledRows.filter(r =>
          !r.isNullAt(2) && r.getDouble(2) <= r.getDouble(1))
          .map(_.getInt(0)).toSet
        if (settled.isEmpty) frontier = improved
        else {
          frontier = checkpointed(
            improved.filter(!col("spur").isin(settled.toSeq: _*)))
          graft.core.Checkpoints.release(improved)
          if (frontier.isEmpty) done = true
        }
      }
      iter += 1
    }

    // level-batched backward walk: one broadcast-join lookup job per
    // path-hop LEVEL, shared across all spurs (max-hops jobs, not
    // sum-of-hops). Driver memory is O(|spurs| · path length).
    val tRows = state.filter(col("nodeId") === lit(target))
      .select(col("spur"), col("dist"), col("pred")).collect()
    val nodesBuf = scala.collection.mutable.Map.empty[Int,
      scala.collection.mutable.ArrayBuffer[String]]
    val distsBuf = scala.collection.mutable.Map.empty[Int,
      scala.collection.mutable.ArrayBuffer[Double]]
    val seen = scala.collection.mutable.Map.empty[Int,
      scala.collection.mutable.HashSet[String]]
    val srcOf = live.map(s => s.id -> s.source).toMap
    var cur = scala.collection.mutable.Map.empty[Int, String]
    val dead = scala.collection.mutable.HashSet.empty[Int]
    tRows.foreach { r =>
      val id = r.getInt(0)
      nodesBuf(id) = scala.collection.mutable.ArrayBuffer(target)
      distsBuf(id) = scala.collection.mutable.ArrayBuffer(r.getDouble(1))
      seen(id) = scala.collection.mutable.HashSet(target)
      cur(id) = r.getString(2)
    }
    var walking = true
    while (walking) {
      val pending = cur.toSeq.filter { case (id, n) =>
        !dead(id) && n != srcOf(id) }
      if (pending.isEmpty) walking = false
      else {
        val lookup = pending.map { case (id, n) => (id, n) }
          .toDF("spur", "nodeId")
        val got = state.join(broadcast(lookup), Seq("spur", "nodeId"))
          .select(col("spur"), col("nodeId"), col("dist"), col("pred"))
          .collect()
        val gotBySpur = got.map(r => r.getInt(0) ->
          (r.getString(1), r.getDouble(2), r.getString(3))).toMap
        pending.foreach { case (id, n) =>
          gotBySpur.get(id) match {
            case Some((node, d, pred)) if seen(id).add(node) =>
              nodesBuf(id) += node; distsBuf(id) += d; cur(id) = pred
            case _ => dead += id // missing row or pred cycle: no path
          }
        }
      }
    }
    graft.core.Checkpoints.release(state)
    if (frontier ne state) graft.core.Checkpoints.release(frontier)
    val out = cur.keys.filterNot(dead).map { id =>
      val ns = (nodesBuf(id) += srcOf(id)).reverse.toSeq
      val ds = (distsBuf(id) += 0.0).reverse.toSeq
      id -> (ns, ds)
    }.toMap
    trivialOut ++ out
  }

  /** Sequential single-spur search — the batched kernel's equivalence
    * twin (GraphAlgoSpec pins batched ≡ sequential path-for-path).
    */
  private def shortest(spark: SparkSession, edges: DataFrame,
      src: String, dst: String,
      bannedE: Seq[(String, String)], bannedN: Seq[String]): Option[Path] = {
    val state = DistributedSSSP.run(spark, edges, Seq(src),
      target = Some(dst), bannedEdges = bannedE, bannedNodes = bannedN)
    val res = DistributedSSSP.reconstructPath(state, src, dst)
    graft.core.Checkpoints.release(state)
    res.map { case (ns, cs) => Path(ns.toVector, cs.toVector) }
  }

  /** `batchSpurs = true` (default) runs each Yen round's independent
    * spur searches as one multi-spur relaxation; `false` is the
    * sequential per-spur reference path (result-identical by
    * construction — same insertion order into the candidate pool).
    */
  def run(spark: SparkSession, edges: DataFrame, src: String, dst: String,
      k: Int, batchSpurs: Boolean = true): Seq[Path] = {
    val e = edges.select(col(edges.columns(0)).as("src"),
        col(edges.columns(1)).as("dst"), col(edges.columns(2)).as("cost"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val accepted = scala.collection.mutable.ArrayBuffer.empty[Path]
      val first =
        if (batchSpurs)
          runSpurBatch(spark, e, Seq(SpurSpec(0, src, Nil, Nil)), dst)
            .get(0).map { case (ns, cs) => Path(ns.toVector, cs.toVector) }
        else shortest(spark, e, src, dst, Nil, Nil)
      first match {
        case None => return Seq.empty
        case Some(p) => accepted += p
      }
      implicit val ord: Ordering[(Path, Int)] = Ordering.by(-_._1.total)
      val candidates =
        scala.collection.mutable.PriorityQueue.empty[(Path, Int)]
      val seen = scala.collection.mutable.HashSet[Vector[String]](
        accepted.head.nodes)
      var lastDev = 0 // Lawler's modification, as in LocalKernels.yen

      while (accepted.length < k) {
        val prev = accepted.last
        // ban masks depend only on `accepted` — frozen for the round, so
        // every spur search below is independent of the others
        val specs = (lastDev until prev.nodes.length - 1).map { i =>
          val spur = prev.nodes(i)
          val root = prev.nodes.slice(0, i + 1)
          val bannedE = accepted.toSeq
            .filter(p => p.nodes.length > i + 1 && p.nodes.startsWith(root))
            .map(p => (spur, p.nodes(i + 1)))
            .distinct
          (i, spur, root, prev.costs(i), bannedE, root.dropRight(1))
        }
        val results: Map[Int, Path] =
          if (batchSpurs)
            runSpurBatch(spark, e,
              specs.map { case (i, spur, _, _, bE, bN) =>
                SpurSpec(i, spur, bE, bN) }, dst)
              .map { case (i, (ns, cs)) =>
                i -> Path(ns.toVector, cs.toVector) }
          else specs.flatMap { case (i, spur, _, _, bE, bN) =>
            shortest(spark, e, spur, dst, bE, bN).map(i -> _)
          }.toMap
        // enqueue in ascending spur-index order: identical candidate-pool
        // insertion sequence across both execution modes
        specs.foreach { case (i, _, root, rootCost, _, _) =>
          results.get(i).foreach { sp =>
            val nodes = root.dropRight(1) ++ sp.nodes
            if (!seen.contains(nodes)) {
              seen += nodes
              val costs = prev.costs.slice(0, i) ++
                sp.costs.map(_ + rootCost)
              candidates.enqueue((Path(nodes, costs), i))
            }
          }
        }
        if (candidates.isEmpty) return accepted.toSeq
        val (best, dev) = candidates.dequeue()
        accepted += best
        lastDev = dev
      }
      accepted.toSeq
    } finally e.unpersist()
  }
}
