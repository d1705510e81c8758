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
  * Within ONE round the spur searches are mutually independent (their
  * ban masks derive only from already-ACCEPTED paths), so they run as
  * CONCURRENT Spark jobs (round-13: the scale lever the r12 audit
  * documented); superstep scheduling, not data volume, dominates a
  * single spur search at cluster scale, and concurrent jobs overlap
  * exactly that. Determinism is preserved because results are awaited
  * and enqueued in ascending spur-index order — the same candidate
  * insertion sequence as the sequential loop, and the candidate pool's
  * tie behavior depends only on insertion order.
  *
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

  /** `maxConcurrentSpurs` bounds the per-round Spark-job concurrency:
    * each spur search is a driver-orchestrated superstep loop of small
    * jobs, so a handful of concurrent searches overlap scheduling
    * without oversubscribing the cluster. 1 = the former sequential
    * behavior (result-identical by construction).
    */
  def run(spark: SparkSession, edges: DataFrame, src: String, dst: String,
      k: Int, maxConcurrentSpurs: Int = 8): Seq[Path] = {
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
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(maxConcurrentSpurs, specs.size)))
      val ec = scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val launched = specs.map { case (i, spur, root, rootCost, bE, bN) =>
          (i, root, rootCost,
            scala.concurrent.Future(shortest(spark, edges, spur, dst,
              bE, bN))(ec))
        }
        // await + enqueue in ascending spur-index order: identical
        // candidate-pool insertion sequence to the sequential loop
        launched.foreach { case (i, root, rootCost, fut) =>
          scala.concurrent.Await.result(fut,
            scala.concurrent.duration.Duration.Inf).foreach { sp =>
            val nodes = root.dropRight(1) ++ sp.nodes
            if (!seen.contains(nodes)) {
              seen += nodes
              val costs = prev.costs.slice(0, i) ++
                sp.costs.map(_ + rootCost)
              candidates.enqueue((Path(nodes, costs), i))
            }
          }
        }
      } finally pool.shutdown()
      if (candidates.isEmpty) return accepted.toSeq
      val (best, dev) = candidates.dequeue()
      accepted += best
      lastDev = dev
    }
    accepted.toSeq
  }
}
