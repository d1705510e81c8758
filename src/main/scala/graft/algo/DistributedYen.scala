package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Yen's K loopless shortest paths over the DISTRIBUTED relaxation
  * kernel — the scale path for graphs whose projection exceeds the
  * driver threshold. The Yen outer loop is inherently sequential
  * (each accepted path seeds the next round's spur searches), so the
  * driver orchestrates; each spur search is a full distributed Dijkstra
  * with edge/node masks pushed down as broadcast anti-joins
  * (DistributedSSSP bannedEdges/bannedNodes).
  *
  * Cost model: K × (path hops) spur searches, each a kernel run —
  * exactly the published Yen complexity with the SSSP term distributed.
  * Results are bit-identical to LocalKernels.yen (asserted by
  * GraphAlgoSpec).
  */
object DistributedYen {

  final case class Path(nodes: Vector[String], costs: Vector[Double]) {
    def total: Double = costs.last
  }

  private def shortest(spark: SparkSession, edges: DataFrame,
      src: String, dst: String,
      bannedE: Seq[(String, String)], bannedN: Seq[String]): Option[Path] = {
    val state = DistributedSSSP.run(spark, edges, Seq(src),
      target = Some(dst), bannedEdges = bannedE, bannedNodes = bannedN)
    val res = DistributedSSSP.reconstructPath(state, src, dst)
    graft.core.Checkpoints.release(state)
    res.map { case (ns, cs) => Path(ns.toVector, cs.toVector) }
  }

  def run(spark: SparkSession, edges: DataFrame, src: String, dst: String,
      k: Int): Seq[Path] = {
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Path]
    shortest(spark, edges, src, dst, Nil, Nil) match {
      case None => return Seq.empty
      case Some(p) => accepted += p
    }
    implicit val ord: Ordering[(Path, Int)] = Ordering.by(-_._1.total)
    val candidates = scala.collection.mutable.PriorityQueue.empty[(Path, Int)]
    val seen = scala.collection.mutable.HashSet[Vector[String]](
      accepted.head.nodes)
    var lastDev = 0 // Lawler's modification, as in LocalKernels.yen

    while (accepted.length < k) {
      val prev = accepted.last
      var i = lastDev
      while (i < prev.nodes.length - 1) {
        val spur = prev.nodes(i)
        val root = prev.nodes.slice(0, i + 1)
        val rootCost = prev.costs(i)
        val bannedE = accepted.toSeq
          .filter(p => p.nodes.length > i + 1 && p.nodes.startsWith(root))
          .map(p => (spur, p.nodes(i + 1)))
          .distinct
        val bannedN = root.dropRight(1)
        shortest(spark, edges, spur, dst, bannedE, bannedN).foreach { sp =>
          val nodes = root.dropRight(1) ++ sp.nodes
          if (!seen.contains(nodes)) {
            seen += nodes
            val costs = prev.costs.slice(0, i) ++ sp.costs.map(_ + rootCost)
            candidates.enqueue((Path(nodes, costs), i))
          }
        }
        i += 1
      }
      if (candidates.isEmpty) return accepted.toSeq
      val (best, dev) = candidates.dequeue()
      accepted += best
      lastDev = dev
    }
    accepted.toSeq
  }
}
