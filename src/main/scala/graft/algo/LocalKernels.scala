package graft.algo

import java.util.PriorityQueue

/** Sequential weighted shortest-path kernels over a LocalGraph.
  * These are (a) the small-graph fast path and (b) the independent oracle
  * the test suite freezes goldens from (SURVEY §5.2.2).
  *
  * All kernels are binary-heap Dijkstra variants — the "improvement
  * direction" the reference proposes but never implements (IMPL.md:831-836).
  */
object LocalKernels {

  final case class PathResult(
      nodes: Array[Int],       // dense ids, source..target order
      costs: Array[Double],    // running cost at each node (cum. distance)
      totalCost: Double)

  /** Dijkstra with early target exit. Returns None if unreachable.
    * `bannedEdges`/`bannedNodes` support Yen spur searches: a banned edge
    * is identified by (srcDense << 32 | edgeOrdinal) — see yen().
    */
  def dijkstra(g: LocalGraph, source: Int, target: Int,
      bannedEdgeIdx: java.util.HashSet[Int] = new java.util.HashSet[Int](),
      bannedNodes: java.util.HashSet[Int] = new java.util.HashSet[Int]())
      : Option[PathResult] = {
    search(g, source, target, heuristic = null, bannedEdgeIdx, bannedNodes)
  }

  /** A* with an admissible Euclidean heuristic in meters (SURVEY §4.3:
    * the reference's haversine-on-projected-coords heuristic was
    * inadmissible and returned a suboptimal 54140.0; with an admissible
    * heuristic A* must agree with Dijkstra).
    */
  def astar(g: LocalGraph, source: Int, target: Int): Option[PathResult] = {
    val tx = g.xs(target); val ty = g.ys(target)
    val h: Int => Double =
      if (tx.isNaN || ty.isNaN) null
      else { v =>
        val dx = g.xs(v) - tx; val dy = g.ys(v) - ty
        if (dx.isNaN || dy.isNaN) 0.0 else math.sqrt(dx * dx + dy * dy)
      }
    search(g, source, target, h, new java.util.HashSet[Int](),
      new java.util.HashSet[Int]())
  }

  /** Single-source all-targets distances (no early exit). dist(i) =
    * Double.PositiveInfinity when unreachable. pred(i) = -1 for source /
    * unreached.
    */
  def sssp(g: LocalGraph, source: Int): (Array[Double], Array[Int]) = {
    val dist = Array.fill(g.n)(Double.PositiveInfinity)
    val pred = Array.fill(g.n)(-1)
    val settled = new Array[Boolean](g.n)
    val pq = new PriorityQueue[(Double, Int)](
      (a: (Double, Int), b: (Double, Int)) => java.lang.Double.compare(a._1, b._1))
    dist(source) = 0.0
    pq.add((0.0, source))
    while (!pq.isEmpty) {
      val (d, u) = pq.poll()
      if (!settled(u)) {
        settled(u) = true
        var e = g.offsets(u)
        while (e < g.offsets(u + 1)) {
          val v = g.targets(e); val nd = d + g.costs(e)
          if (nd < dist(v)) { dist(v) = nd; pred(v) = u; pq.add((nd, v)) }
          e += 1
        }
      }
    }
    (dist, pred)
  }

  private def search(g: LocalGraph, source: Int, target: Int,
      heuristic: Int => Double,
      bannedEdgeIdx: java.util.HashSet[Int],
      bannedNodes: java.util.HashSet[Int]): Option[PathResult] = {
    val dist = Array.fill(g.n)(Double.PositiveInfinity)
    val pred = Array.fill(g.n)(-1)
    val settled = new Array[Boolean](g.n)
    val pq = new PriorityQueue[(Double, Int)](
      (a: (Double, Int), b: (Double, Int)) => java.lang.Double.compare(a._1, b._1))
    def h(v: Int): Double = if (heuristic == null) 0.0 else heuristic(v)
    dist(source) = 0.0
    pq.add((h(source), source))
    var found = false
    while (!pq.isEmpty && !found) {
      val (_, u) = pq.poll()
      if (!settled(u)) {
        settled(u) = true
        if (u == target) found = true
        else {
          var e = g.offsets(u)
          while (e < g.offsets(u + 1)) {
            val v = g.targets(e)
            if (!bannedEdgeIdx.contains(e) && !bannedNodes.contains(v)) {
              val nd = dist(u) + g.costs(e)
              if (nd < dist(v)) {
                dist(v) = nd; pred(v) = u; pq.add((nd + h(v), v))
              }
            }
            e += 1
          }
        }
      }
    }
    if (!found) None
    else {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
      var cur = target
      while (cur != -1) { buf += cur; cur = pred(cur) }
      val path = buf.reverseIterator.toArray
      Some(PathResult(path, path.map(dist), dist(target)))
    }
  }

  /** Yen's K loopless shortest paths (reference: neo4j-code.txt:127-145,
    * k=3). Spur searches reuse dijkstra() with banned edge indices (edges
    * out of the spur node used by already-accepted paths sharing the root)
    * and banned nodes (root-path nodes except the spur node).
    *
    * Uses Lawler's modification: a path accepted via spur index j only
    * generates new spurs from index j onward — spurs before j were
    * already enumerated when its parent path was processed. Roughly
    * halves the spur-search count.
    */
  def yen(g: LocalGraph, source: Int, target: Int, k: Int): Seq[PathResult] = {
    val accepted = scala.collection.mutable.ArrayBuffer.empty[PathResult]
    var lastDev = 0 // Lawler: deviation index of the last accepted path
    dijkstra(g, source, target) match {
      case None => return Seq.empty
      case Some(p) => accepted += p
    }
    // candidate pool (with spur index) keyed by node seq to avoid dups
    val candidates = new java.util.PriorityQueue[(PathResult, Int)](
      (a: (PathResult, Int), b: (PathResult, Int)) =>
        java.lang.Double.compare(a._1.totalCost, b._1.totalCost))
    val seen = scala.collection.mutable.HashSet[Seq[Int]](
      accepted.head.nodes.toSeq)
    while (accepted.length < k) {
      val prev = accepted.last
      var i = lastDev
      while (i < prev.nodes.length - 1) {
        val spur = prev.nodes(i)
        val rootNodes = prev.nodes.slice(0, i + 1)
        val rootCost = prev.costs(i)
        val bannedE = new java.util.HashSet[Int]()
        val bannedN = new java.util.HashSet[Int]()
        accepted.foreach { p =>
          if (p.nodes.length > i + 1 &&
              java.util.Arrays.equals(p.nodes.slice(0, i + 1), rootNodes)) {
            // ban the edge (spur -> p.nodes(i+1)): find its CSR ordinal(s)
            var e = g.offsets(spur)
            while (e < g.offsets(spur + 1)) {
              if (g.targets(e) == p.nodes(i + 1)) bannedE.add(e)
              e += 1
            }
          }
        }
        rootNodes.dropRight(1).foreach(bannedN.add(_))
        dijkstra(g, spur, target, bannedE, bannedN).foreach { spurPath =>
          val nodesAll = rootNodes.dropRight(1) ++ spurPath.nodes
          if (seen.add(nodesAll.toSeq)) {
            val costsAll = rootNodes.dropRight(1).indices
              .map(j => prev.costs(j)).toArray ++
              spurPath.costs.map(_ + rootCost)
            candidates.add((PathResult(nodesAll, costsAll,
              rootCost + spurPath.totalCost), i))
          }
        }
        i += 1
      }
      if (candidates.isEmpty) return accepted.toSeq
      val (best, dev) = candidates.poll()
      accepted += best
      lastDev = dev
    }
    accepted.toSeq
  }
}
