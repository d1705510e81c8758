package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Strongly-connected components over the directed property graph — the
  * honest complement to GraphComponents' WCC on the reference corpus
  * (the road network is directed: one-way segments make SCC ≠ WCC).
  * Component label = lexicographic minimum member node id, the same
  * total, engine-portable convention as WCC (VARCHAR min orders byte-wise
  * identically in Spark and the DuckDB oracle), and — unlike the
  * iteration order of any particular algorithm — the OUTPUT is canonical,
  * so the local and distributed kernels and the oracle's reachability
  * closure all agree bit-for-bit.
  *
  * Adaptive dispatch, same policy as GraphComponents/ShortestPaths: a
  * slice whose edge list fits on the driver resolves with one collect +
  * iterative Tarjan (O(V+E), audited against tools/scc_golden.py); above
  * the threshold the distributed path runs FW-BW label refinement — the
  * standard distributed SCC decomposition (Fleischer/Hendrickson/Pınar's
  * divide-and-conquer expressed as min-label coloring, the same scheme
  * GraphX's SCC and the tools/scc_golden.py simulation use):
  *
  *  1. trim: a node with no in-edges or no out-edges in the remaining
  *     subgraph can sit on no cycle → it is its own singleton SCC.
  *     Bounded passes (chains trim O(1) layers per pass, so trimming to
  *     fixpoint would cost O(diameter) rounds for nothing — refinement
  *     below handles what trim leaves);
  *  2. F = per-node min label forward-reachable within the node's current
  *     color class; B = the same backward (min label that reaches the
  *     node). Each is a min-label fixpoint: state is (node, f), one
  *     shuffle join per hop against the remaining edges, localCheckpoint
  *     per step to cut lineage;
  *  3. nodes with F == B are DONE: F(v)=B(v)=m means v⇝m and m⇝v inside
  *     one color class, so v ∈ SCC(m), and all of SCC(m) shares the same
  *     (F, B) (mutually-reachable nodes in one class have identical
  *     reachable sets) — finalize with component = F, remove the nodes,
  *     contract the edge list;
  *  4. survivors refine: color' = (color, F, B) — SCCs are never split
  *     by refinement (same class ⇒ same F/B inside an SCC), classes
  *     strictly shrink, so the loop terminates; real graphs converge in
  *     a handful of outer rounds (slice 1: 2).
  *
  * 100 TB shape: nothing node- or edge-scale ever collects on this path;
  * per-round state is one (node, color, f, b) table and the contracted
  * edge list, both shuffle-partitioned by node id; finalized SCCs leave
  * the working set, so the tables shrink monotonically — the giant-SCC
  * core of a web/social graph finalizes in round 1 (F=B=global min label
  * inside it) and later rounds run on the small periphery.
  */
object StronglyConnected {

  /** Same production-safe driver budget as GraphComponents. */
  val LocalEdgeThreshold: Long = graft.core.LocalBudget.MaxLocalEdges

  /** (node, component) for every node in `nodes`; `edges` is directed
    * (src, dst); parallel edges and self-loops are tolerated. Isolated
    * nodes become singleton components.
    */
  def scc(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      maxOuter: Int = 30,
      localEdgeThreshold: Long = LocalEdgeThreshold): DataFrame = {
    val e = edges.select(col(edges.columns(0)).cast("string").as("src"),
        col(edges.columns(1)).cast("string").as("dst"))
      .filter(col("src") =!= col("dst")).distinct().cache()
    val (nEdges, estBytes) = graft.core.LocalBudget.measureEdges(e)
    if (graft.core.LocalBudget.fitsLocal(nEdges, estBytes,
        localEdgeThreshold)) {
      val pairs = e.collect().map(r => (r.getString(0), r.getString(1)))
      e.unpersist()
      val nodeIds = nodes.select(col(nodes.columns(0)).cast("string"))
        .collect().map(_.getString(0))
      return localTarjan(spark, nodeIds, pairs)
    }
    distributed(spark, nodes, e, maxOuter)
  }

  /** Iterative Tarjan (explicit work stack — recursion would blow the JVM
    * stack on deep road-network chains), labeling each SCC by its min
    * member. Mirrors the independent tools/scc_golden.py audit.
    */
  private[algo] def localTarjan(spark: SparkSession,
      nodeIds: Array[String],
      pairs: Array[(String, String)]): DataFrame = {
    import spark.implicits._
    val adj = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[String]]
    pairs.foreach { case (s, d) =>
      adj.getOrElseUpdate(s,
        scala.collection.mutable.ArrayBuffer.empty[String]) += d
    }
    val index = scala.collection.mutable.HashMap.empty[String, Int]
    val low = scala.collection.mutable.HashMap.empty[String, Int]
    val onStack = scala.collection.mutable.HashSet.empty[String]
    val stack = scala.collection.mutable.ArrayBuffer.empty[String]
    val label = scala.collection.mutable.HashMap.empty[String, String]
    var counter = 0
    val empty = scala.collection.mutable.ArrayBuffer.empty[String]
    nodeIds.foreach { root =>
      if (!index.contains(root)) {
        // work entries: (node, next-neighbor position)
        val work = scala.collection.mutable.ArrayBuffer[(String, Int)]((root, 0))
        while (work.nonEmpty) {
          val (v, pi) = work.last
          if (pi == 0) {
            index(v) = counter; low(v) = counter; counter += 1
            stack += v; onStack += v
          }
          val nbrs = adj.getOrElse(v, empty)
          var i = pi
          var recursed = false
          while (i < nbrs.length && !recursed) {
            val w = nbrs(i)
            if (!index.contains(w)) {
              work(work.length - 1) = (v, i + 1)
              work += ((w, 0))
              recursed = true
            } else {
              if (onStack.contains(w)) low(v) = math.min(low(v), index(w))
              i += 1
            }
          }
          if (!recursed) {
            work.remove(work.length - 1)
            if (work.nonEmpty) {
              val p = work.last._1
              low(p) = math.min(low(p), low(v))
            }
            if (low(v) == index(v)) {
              val comp = scala.collection.mutable.ArrayBuffer.empty[String]
              var done = false
              while (!done) {
                val w = stack.remove(stack.length - 1)
                onStack -= w; comp += w
                if (w == v) done = true
              }
              val m = comp.min
              comp.foreach(label(_) = m)
            }
          }
        }
      }
    }
    nodeIds.toSeq.map(nId => (nId, label.getOrElse(nId, nId)))
      .toDF("node", "component")
  }

  /** FW-BW min-label refinement; `e` is the deduped loop-free edge set
    * (already cached by the caller).
    */
  private def distributed(spark: SparkSession, nodes: DataFrame,
      e: DataFrame, maxOuter: Int): DataFrame = {
    // active = (node, color); survivors of each round refine their color
    var active = nodes.select(col(nodes.columns(0)).cast("string").as("node"))
      .withColumn("color", lit(""))
      .localCheckpoint(true)
    var cedges = e.localCheckpoint(true)
    e.unpersist()
    var done: DataFrame = null // accumulated (node, component)
    var iter = 0
    while (active != null && iter < maxOuter) {
      iter += 1
      // --- 1. bounded trim passes -------------------------------------
      var trimPass = 0
      var trimmedAny = true
      while (trimmedAny && trimPass < 2) {
        trimPass += 1
        val hasOut = cedges.select(col("src").as("node")).distinct()
        val hasIn = cedges.select(col("dst").as("node")).distinct()
        val trimmed = active.select("node")
          .except(hasOut.intersect(hasIn))
          .withColumn("component", col("node"))
          .localCheckpoint(true)
        val nTrimmed = trimmed.count()
        if (nTrimmed == 0) { graft.core.Checkpoints.release(trimmed); trimmedAny = false }
        else {
          done = append(done, trimmed)
          val nextActive = active.join(trimmed.select("node"), Seq("node"),
              "left_anti").localCheckpoint(true)
          graft.core.Checkpoints.release(active)
          active = nextActive
          val keep = active.select("node")
          val nextEdges = cedges
            .join(keep.withColumnRenamed("node", "src"), Seq("src"))
            .join(keep.withColumnRenamed("node", "dst"), Seq("dst"))
            .select("src", "dst").localCheckpoint(true)
          graft.core.Checkpoints.release(cedges)
          cedges = nextEdges
        }
      }
      if (active.isEmpty) {
        graft.core.Checkpoints.release(active)
        graft.core.Checkpoints.release(cedges)
        active = null
      } else {
        // --- 2. F and B min-label fixpoints within color classes ------
        // edges restricted to same-color endpoints once per round
        val colored = cedges
          .join(active.withColumnRenamed("node", "src")
            .withColumnRenamed("color", "c_src"), Seq("src"))
          .join(active.withColumnRenamed("node", "dst")
            .withColumnRenamed("color", "c_dst"), Seq("dst"))
          .filter(col("c_src") === col("c_dst"))
          .select("src", "dst").localCheckpoint(true)
        val f = fixpoint(active.select(col("node"), col("node").as("lbl")),
          colored, forward = true)
        val b = fixpoint(active.select(col("node"), col("node").as("lbl")),
          colored, forward = false)
        graft.core.Checkpoints.release(colored)
        val fb = active.join(f.withColumnRenamed("lbl", "f"), Seq("node"))
          .join(b.withColumnRenamed("lbl", "b"), Seq("node"))
          .localCheckpoint(true)
        graft.core.Checkpoints.release(f)
        graft.core.Checkpoints.release(b)
        // --- 3. finalize converged nodes ------------------------------
        val conv = fb.filter(col("f") === col("b"))
          .select(col("node"), col("f").as("component"))
          .localCheckpoint(true)
        done = append(done, conv)
        val survivors = fb.filter(col("f") =!= col("b"))
          .select(col("node"),
            concat_ws("|", col("color"), col("f"), col("b")).as("color"))
          .localCheckpoint(true)
        graft.core.Checkpoints.release(fb)
        graft.core.Checkpoints.release(active)
        graft.core.Checkpoints.release(conv)
        active = survivors
        if (active.isEmpty) {
          graft.core.Checkpoints.release(active)
          graft.core.Checkpoints.release(cedges)
          active = null
        } else {
          val keep = active.select("node")
          val nextEdges = cedges
            .join(keep.withColumnRenamed("node", "src"), Seq("src"))
            .join(keep.withColumnRenamed("node", "dst"), Seq("dst"))
            .select("src", "dst").localCheckpoint(true)
          graft.core.Checkpoints.release(cedges)
          cedges = nextEdges
        }
      }
      if (sys.env.contains("GRAFT_SCC_DEBUG"))
        System.err.println(s"[scc] outer $iter active=" +
          (if (active == null) 0 else active.count()))
    }
    if (active != null) {
      graft.core.Checkpoints.release(active)
      graft.core.Checkpoints.release(cedges)
      graft.core.Checkpoints.release(done)
      throw new IllegalStateException(
        s"scc did not converge within $maxOuter refinement rounds — " +
          "FW-BW refinement strictly splits classes each round, so " +
          "hitting this bound indicates a pathological input")
    }
    if (done == null) {
      // empty node set: nothing was ever trimmed or finalized, so no
      // batch reached `done` — return an empty, correctly-typed frame
      // instead of null (callers .select on the result)
      import spark.implicits._
      Seq.empty[(String, String)].toDF("node", "component")
    } else done
  }

  /** Min-label reachability fixpoint: lbl(v) ← min over the forward
    * (src→dst pulls from dst) or backward (dst pulls from src) neighbor
    * labels, iterated to convergence. One shuffle join per hop; the
    * iterated state is exactly |active| rows.
    */
  private def fixpoint(init: DataFrame, edges: DataFrame,
      forward: Boolean): DataFrame = {
    val (from, to) = if (forward) ("dst", "src") else ("src", "dst")
    var cur = init.localCheckpoint(true)
    var changed = 1L
    while (changed > 0) {
      val pulled = edges
        .join(cur.withColumnRenamed("node", from)
          .withColumnRenamed("lbl", "n_lbl"), Seq(from))
        .groupBy(col(to).as("node")).agg(min(col("n_lbl")).as("n_lbl"))
      val next = cur.join(pulled, Seq("node"), "left_outer")
        .select(col("node"),
          least(col("lbl"), coalesce(col("n_lbl"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      changed = next.join(cur.withColumnRenamed("lbl", "old"), Seq("node"))
        .filter(col("lbl") =!= col("old")).count()
      graft.core.Checkpoints.release(cur)
      cur = next
    }
    cur
  }

  /** Accumulate finalized labels; checkpointed so the union chain never
    * grows a lineage.
    */
  private def append(acc: DataFrame, part: DataFrame): DataFrame =
    if (acc == null) part.localCheckpoint(true)
    else {
      val next = acc.union(part).localCheckpoint(true)
      graft.core.Checkpoints.release(acc)
      next
    }
}
