package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weakly-connected components over the property graph — the standard
  * graph-library companion to the shortest-path family (the reference's
  * platform ships it as `gds.wcc`; reference scope: neo4j-code.txt's GDS
  * projection workflow). Component label = lexicographic minimum member
  * node id, a total, engine-portable choice (VARCHAR min orders the same
  * byte-wise in Spark and the SQL oracle).
  *
  * Same adaptive dispatch policy as ShortestPaths: a slice whose edge
  * list fits comfortably on the driver resolves in one collect +
  * union-find; above the threshold the distributed path runs
  * min-hooking with edge contraction (the Shiloach–Vishkin hook step
  * expressed as a per-root min-reduction, plus graph contraction each
  * round — the classic MapReduce-CC formulation):
  *
  *  1. hook: every root r with a smaller-rooted neighbor attaches to
  *     min(neighbor roots) — strictly decreasing, so hook chains are
  *     acyclic;
  *  2. the hook map (|hooked roots| rows, shrinking every round) is
  *     pointer-jumped to closure ON ITSELF — the only iterated state is
  *     this small table, never the node set;
  *  3. node labels and the contracted edge list re-map through the
  *     closed hooks; self-loop edges drop, so the edge table shrinks
  *     monotonically and the next round's shuffles are cheaper.
  *
  * Plain min-label propagation (one hop per superstep) was measured at
  * ~O(diameter) rounds on the road network — near-sequential node ids
  * along roads defeat pointer jumping's doubling argument — while
  * hook+contract merges entire components pairwise: O(log n) rounds on
  * real graphs. Each round shuffles node-id-keyed joins only;
  * localCheckpoints cut lineage; nothing node- or edge-scale collects.
  */
object GraphComponents {

  /** Production-safe driver budget: 5M edges ≈ a few hundred MB of Row
    * overhead, far below executor/driver heaps; beyond it the
    * distributed path costs only O(log n) rounds.
    */
  val LocalEdgeThreshold: Long = graft.core.LocalBudget.MaxLocalEdges

  /** (node, component) for every node in `nodes`; `edges` is directed
    * (src, dst) and is symmetrized internally — isolated nodes become
    * their own singleton component.
    */
  def wcc(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 50,
      localEdgeThreshold: Long = LocalEdgeThreshold): DataFrame = {
    val e = edges.select(col(edges.columns(0)).as("src"),
      col(edges.columns(1)).as("dst")).cache()
    val (nEdges, estBytes) = graft.core.LocalBudget.measureEdges(e)
    if (graft.core.LocalBudget.fitsLocal(nEdges, estBytes,
        localEdgeThreshold)) {
      val pairs = e.collect().map(r => (r.getString(0), r.getString(1)))
      e.unpersist()
      val nodeIds = nodes.select(col(nodes.columns(0)).cast("string"))
        .collect().map(_.getString(0))
      val parent = scala.collection.mutable.HashMap.empty[String, String]
      def find(x: String): String = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nxt = parent(c); parent(c) = r; c = nxt
        }
        r
      }
      pairs.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      import spark.implicits._
      return nodeIds.map(nId => (nId, find(nId))).toSeq
        .toDF("node", "component")
    }
    // ---- distributed: min-hook + contract ------------------------------
    // Every loop state keeps TWO handles: the checkpoint (releasable)
    // and a stats-clean freshStats view the next round's plans read.
    // hooks/cedges/labels all fan out under several joins per round, so
    // without the barrier the propagated sizeInBytes estimate compounds
    // multiplicatively — the audited result carried a 3.3-MEGABIT
    // statistic and every later optimizer pass paid BigInteger math on
    // it (see Checkpoints.freshStats).
    var labelsCp = nodes.select(col(nodes.columns(0)).as("node"))
      .withColumn("component", col("node"))
      .localCheckpoint(true)
    var labels = labelsCp
    // contracted edge list between CURRENT roots, symmetric, loop-free
    var cedgesCp = e.select(col("src").as("a"), col("dst").as("b"))
      .union(e.select(col("dst").as("a"), col("src").as("b")))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
    var cedges = cedgesCp
    e.unpersist()
    var iter = 0
    var hookCount = 1L
    while (hookCount > 0 && iter < maxIter) {
      // 1. hook every root to its minimum smaller neighbor root
      var hooksCp = cedges.filter(col("b") < col("a"))
        .groupBy(col("a").as("root")).agg(min(col("b")).as("tgt"))
        .localCheckpoint(true)
      var hooks = graft.core.Checkpoints.freshStats(hooksCp)
      hookCount = hooksCp.count()
      if (hookCount > 0) {
        // 2. close the hook map on itself (chains a→b→c… halve per jump;
        //    the iterated table is |hooks| rows, never the node set)
        var jumped = 1L
        while (jumped > 0) {
          val h2cp = hooks.as("h")
            .join(hooks.select(col("root").as("t_root"),
              col("tgt").as("t_tgt")),
              col("h.tgt") === col("t_root"), "left_outer")
            .select(col("h.root").as("root"),
              coalesce(col("t_tgt"), col("h.tgt")).as("tgt"))
            .localCheckpoint(true)
          val h2 = graft.core.Checkpoints.freshStats(h2cp)
          jumped = h2.join(hooks.select(col("root"),
              col("tgt").as("old_t")), Seq("root"))
            .filter(col("tgt") =!= col("old_t")).count()
          graft.core.Checkpoints.release(hooksCp)
          hooksCp = h2cp
          hooks = h2
        }
        // 3. re-map labels and contract the edge list through the hooks
        val nextLabelsCp = labels
          .join(hooks.select(col("root").as("component"), col("tgt")),
            Seq("component"), "left_outer")
          .select(col("node"),
            coalesce(col("tgt"), col("component")).as("component"))
          .localCheckpoint(true)
        graft.core.Checkpoints.release(labelsCp)
        labelsCp = nextLabelsCp
        labels = graft.core.Checkpoints.freshStats(nextLabelsCp)
        val remappedCp = cedges
          .join(hooks.select(col("root").as("a"), col("tgt").as("na")),
            Seq("a"), "left_outer")
          .join(hooks.select(col("root").as("b"), col("tgt").as("nb")),
            Seq("b"), "left_outer")
          .select(coalesce(col("na"), col("a")).as("a"),
            coalesce(col("nb"), col("b")).as("b"))
          .filter(col("a") =!= col("b")).distinct()
          .localCheckpoint(true)
        graft.core.Checkpoints.release(cedgesCp)
        cedgesCp = remappedCp
        cedges = graft.core.Checkpoints.freshStats(remappedCp)
      }
      graft.core.Checkpoints.release(hooksCp)
      iter += 1
      if (sys.env.contains("GRAFT_WCC_DEBUG"))
        System.err.println(s"[wcc] round $iter hooks=$hookCount")
    }
    graft.core.Checkpoints.release(cedgesCp)
    if (hookCount > 0) {
      // the labels checkpoint is never handed to the caller on this path,
      // so release it before failing (KCore's non-convergence path does
      // the same for its undirected edge state)
      graft.core.Checkpoints.release(labelsCp)
      throw new IllegalStateException(
        s"wcc did not converge within $maxIter rounds " +
          s"(last round hooked $hookCount roots); raise maxIter — " +
          "hook+contract needs O(log n) rounds, so hitting this bound " +
          "indicates a pathological input, not a tuning matter")
    }
    labelsCp
  }
}
