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

  /** Primitive-array binary min-heap (priority, node) — avoids the boxed
    * (Double, Int) tuples of java.util.PriorityQueue, which dominated
    * kernel time on dense spur-search workloads (Yen). Lazy deletion:
    * stale entries are skipped via the caller's settled check.
    */
  private final class MinHeap(initialCapacity: Int) {
    private var prio = new Array[Double](math.max(initialCapacity, 16))
    private var node = new Array[Int](prio.length)
    private var n = 0
    def isEmpty: Boolean = n == 0
    def add(p: Double, v: Int): Unit = {
      if (n == prio.length) {
        prio = java.util.Arrays.copyOf(prio, n * 2)
        node = java.util.Arrays.copyOf(node, n * 2)
      }
      var i = n; n += 1
      while (i > 0 && prio((i - 1) >> 1) > p) {
        val par = (i - 1) >> 1
        prio(i) = prio(par); node(i) = node(par); i = par
      }
      prio(i) = p; node(i) = v
    }
    /** Removes and returns the min node (its priority via lastPrio). */
    var lastPrio: Double = 0.0
    def poll(): Int = {
      val top = node(0); lastPrio = prio(0)
      n -= 1
      if (n > 0) {
        val p = prio(n); val v = node(n)
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = l + 1
          var c = -1
          if (l < n) c = if (r < n && prio(r) < prio(l)) r else l
          if (c >= 0 && prio(c) < p) {
            prio(i) = prio(c); node(i) = node(c); i = c
          } else done = true
        }
        prio(i) = p; node(i) = v
      }
      top
    }
  }

  /** Reusable per-search scratch state with touched-node reset: repeated
    * searches over the same graph (Yen runs K×path-length spur searches)
    * reset only the entries the previous search wrote instead of
    * reallocating/zeroing three n-sized arrays each time.
    */
  final class Workspace(n: Int) {
    val dist: Array[Double] = Array.fill(n)(Double.PositiveInfinity)
    val pred: Array[Int] = Array.fill(n)(-1)
    val settled: Array[Boolean] = new Array[Boolean](n)
    private val touched = new Array[Int](n)
    private var nTouched = 0
    @inline def touch(v: Int): Unit = { touched(nTouched) = v; nTouched += 1 }
    def reset(): Unit = {
      var i = 0
      while (i < nTouched) {
        val v = touched(i)
        dist(v) = Double.PositiveInfinity; pred(v) = -1; settled(v) = false
        i += 1
      }
      nTouched = 0
    }
  }

  /** Dijkstra with early target exit. Returns None if unreachable.
    * `bannedEdges`/`bannedNodes` support Yen spur searches: a banned edge
    * is identified by (srcDense << 32 | edgeOrdinal) — see yen().
    */
  def dijkstra(g: LocalGraph, source: Int, target: Int,
      bannedEdgeIdx: java.util.HashSet[Int] = new java.util.HashSet[Int](),
      bannedNodes: java.util.HashSet[Int] = new java.util.HashSet[Int](),
      ws: Workspace = null): Option[PathResult] = {
    search(g, source, target, heuristic = null, bannedEdgeIdx, bannedNodes, ws)
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
    val pq = new MinHeap(64)
    dist(source) = 0.0
    pq.add(0.0, source)
    while (!pq.isEmpty) {
      val u = pq.poll()
      val d = pq.lastPrio
      if (!settled(u)) {
        settled(u) = true
        var e = g.offsets(u)
        while (e < g.offsets(u + 1)) {
          val v = g.targets(e); val nd = d + g.costs(e)
          if (nd < dist(v)) { dist(v) = nd; pred(v) = u; pq.add(nd, v) }
          e += 1
        }
      }
    }
    (dist, pred)
  }

  private def search(g: LocalGraph, source: Int, target: Int,
      heuristic: Int => Double,
      bannedEdgeIdx: java.util.HashSet[Int],
      bannedNodes: java.util.HashSet[Int],
      ws0: Workspace = null): Option[PathResult] = {
    val ws = if (ws0 == null) new Workspace(g.n) else { ws0.reset(); ws0 }
    val dist = ws.dist
    val pred = ws.pred
    val settled = ws.settled
    val pq = new MinHeap(64)
    def h(v: Int): Double = if (heuristic == null) 0.0 else heuristic(v)
    dist(source) = 0.0
    ws.touch(source)
    pq.add(h(source), source)
    var found = false
    while (!pq.isEmpty && !found) {
      val u = pq.poll()
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
                if (dist(v).isInfinite) ws.touch(v)
                dist(v) = nd; pred(v) = u; pq.add(nd + h(v), v)
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
    val ws = new Workspace(g.n) // shared scratch across all spur searches
    dijkstra(g, source, target, ws = ws) match {
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
        dijkstra(g, spur, target, bannedE, bannedN, ws).foreach { spurPath =>
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
