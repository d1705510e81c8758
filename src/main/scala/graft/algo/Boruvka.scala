package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimum spanning forest over the property graph — the classic
  * graph-library companion the reference's platform ships as
  * `gds.spanningTree` (reference scope: neo4j-code.txt's GDS projection
  * workflow; IMPL.md treats the road network as an undirected cost
  * surface for exactly this kind of maintenance query — "which subset of
  * roads keeps everything connected at minimum total length").
  *
  * The engine-portability insight that makes an MST hash-oracle-able at
  * all: under the STRICT TOTAL ORDER (cost, a, b) — canonical a < b
  * endpoint strings as tie-breaks — edge weights are effectively
  * distinct, and the minimum spanning forest is UNIQUE. Any correct
  * algorithm on any engine must produce the identical edge set, so the
  * local fast path can run Kruskal, the distributed path Borůvka, and
  * the DuckDB oracle a fixed-round Borůvka CTE chain, with bit-equality
  * guaranteed by the mathematics rather than by lockstep replay.
  *
  * Distributed shape (Borůvka 1926; the MapReduce-MST formulation):
  * each round every component picks its minimum out-edge in the total
  * order, the chosen-edge pointer graph (whose only cycles are mutual-
  * choice 2-cycles) is severed at the 2-cycle minimum and pointer-jumped
  * to its roots, labels and the contracted component-level edge list
  * re-map through the closed hooks. Components at least halve per round
  * → O(log n) rounds; the per-round shuffles are component-keyed joins
  * over a MONOTONICALLY SHRINKING edge list (the contraction pre-
  * aggregates parallel component edges to their minimum, so |edges|
  * is bounded by cross-component pairs); nothing node- or edge-scale
  * ever collects. This is the WCC hook+contract kernel
  * (GraphComponents.wcc) carrying an edge payload.
  */
object Boruvka {

  val LocalEdgeThreshold: Long = graft.core.LocalBudget.MaxLocalEdges

  /** Minimum spanning forest of the UNDIRECTED view of `edges`
    * (src, dst, cost): parallel/reverse edges collapse to the
    * min-cost canonical pair, self-loops drop. Returns one row per
    * forest edge: (src, dst, cost) with src < dst; n_nodes − n_components
    * rows total. Isolated nodes contribute no rows (they are their own
    * singleton trees).
    */
  def mst(spark: SparkSession, edges: DataFrame,
      maxRounds: Int = 20,
      localEdgeThreshold: Long = LocalEdgeThreshold): DataFrame = {
    val cols = edges.columns
    val cand = edges.select(col(cols(0)).as("s"), col(cols(1)).as("d"),
        col(cols(2)).cast("double").as("cost"))
      .filter(col("s") =!= col("d"))
      .groupBy(least(col("s"), col("d")).as("a"),
        greatest(col("s"), col("d")).as("b"))
      .agg(min(col("cost")).as("cost"))
      .cache()
    val (nEdges, estBytes) = graft.core.LocalBudget.measureEdges(
      cand.select("a", "b"))
    if (graft.core.LocalBudget.fitsLocal(nEdges, estBytes + 8 * nEdges,
        localEdgeThreshold)) {
      // ---- local: Kruskal over the sorted edge array ------------------
      val ord = graft.algo.IndependentSet.Utf8Order
      val rows = cand.collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sortWith { case ((a1, b1, c1), (a2, b2, c2)) =>
          // ascending (cost, a, b) in the engines' UTF-8 binary order.
          // Costs compare via Double.compare: `c1 != c2` is NOT a strict
          // weak order when a cost is NaN (NaN != NaN but also !(NaN<x)),
          // and TimSort throws on contract violations; Double.compare
          // totals the order with NaN largest — the same rank Spark's
          // nan-safe ordering gives it on the distributed path.
          val cc = java.lang.Double.compare(c1, c2)
          if (cc != 0) cc < 0
          else if (a1 != a2) ord.lt(a1, a2)
          else ord.lt(b1, b2)
        }
      cand.unpersist()
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
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Double)]
      rows.foreach { case (a, b, c) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
          out += ((a, b, c))
        }
      }
      import spark.implicits._
      return out.toSeq.toDF("src", "dst", "cost")
    }
    // ---- distributed: Borůvka hook + sever + jump + contract ----------
    // Component-level edges carry their ORIGINAL endpoints: (pa, pb)
    // are current component labels, (a, b, cost) the original edge that
    // realizes the minimum between them — what the output needs and what
    // the (cost, a, b) total order tie-breaks on.
    var cedgesCp = cand
      .select(col("a").as("pa"), col("b").as("pb"),
        col("cost"), col("a"), col("b"))
      .localCheckpoint(true)
    var cedges = cedgesCp
    cand.unpersist()
    var chosenAll: Option[DataFrame] = None
    var round = 0
    var merged = 1L
    while (merged > 0 && round < maxRounds) {
      // 1. every component's minimum out-edge in the (cost, a, b) order
      val out = cedges.select(col("pa").as("c"), col("pb").as("o"),
          col("cost"), col("a"), col("b"))
        .union(cedges.select(col("pb").as("c"), col("pa").as("o"),
          col("cost"), col("a"), col("b")))
      val chosenCp = out
        .groupBy("c")
        .agg(min(struct(col("cost"), col("a"), col("b"), col("o")))
          .as("m"))
        .select(col("c"), col("m.o").as("o"), col("m.cost").as("cost"),
          col("m.a").as("a"), col("m.b").as("b"))
        .localCheckpoint(true)
      val chosen = graft.core.Checkpoints.freshStats(chosenCp)
      merged = chosenCp.count()
      if (merged > 0) {
        // 2. sever the pointer graph's 2-cycles at their minimum label:
        //    the chosen map c→o is a functional graph whose only cycles
        //    are mutual choices (strict total order); the smaller label
        //    of each pair becomes a root
        var hooksCp = chosen.as("m")
          .join(chosen.select(col("c").as("oc"), col("o").as("oo")),
            col("m.o") === col("oc"), "left_outer")
          .select(col("m.c").as("c"),
            when(col("oo") === col("m.c") && col("m.c") < col("m.o"),
              col("m.c")).otherwise(col("m.o")).as("t"))
          .localCheckpoint(true)
        var hooks = graft.core.Checkpoints.freshStats(hooksCp)
        // 3. pointer-jump the severed forest to its roots (the iterated
        //    state is |components| rows, halving per jump)
        var jumped = 1L
        while (jumped > 0) {
          val h2cp = hooks.as("h")
            .join(hooks.select(col("c").as("tc"), col("t").as("tt")),
              col("h.t") === col("tc"), "left_outer")
            .select(col("h.c").as("c"),
              coalesce(col("tt"), col("h.t")).as("t"))
            .localCheckpoint(true)
          val h2 = graft.core.Checkpoints.freshStats(h2cp)
          jumped = h2.join(hooks.select(col("c"), col("t").as("old_t")),
              Seq("c"))
            .filter(col("t") =!= col("old_t")).count()
          graft.core.Checkpoints.release(hooksCp)
          hooksCp = h2cp
          hooks = h2
        }
        // 4. contract: re-map both endpoints through the closed hooks,
        //    drop intra-component edges, and pre-aggregate parallel
        //    component pairs back to their (cost, a, b) minimum so the
        //    edge list SHRINKS monotonically
        val remappedCp = cedges
          .join(hooks.select(col("c").as("pa"), col("t").as("npa")),
            Seq("pa"), "left_outer")
          .join(hooks.select(col("c").as("pb"), col("t").as("npb")),
            Seq("pb"), "left_outer")
          .select(coalesce(col("npa"), col("pa")).as("qa"),
            coalesce(col("npb"), col("pb")).as("qb"),
            col("cost"), col("a"), col("b"))
          .filter(col("qa") =!= col("qb"))
          .groupBy(least(col("qa"), col("qb")).as("pa"),
            greatest(col("qa"), col("qb")).as("pb"))
          .agg(min(struct(col("cost"), col("a"), col("b"))).as("m"))
          .select(col("pa"), col("pb"), col("m.cost").as("cost"),
            col("m.a").as("a"), col("m.b").as("b"))
          .localCheckpoint(true)
        graft.core.Checkpoints.release(cedgesCp)
        cedgesCp = remappedCp
        cedges = graft.core.Checkpoints.freshStats(remappedCp)
        graft.core.Checkpoints.release(hooksCp)
        // 5. accumulate the chosen edges (both merge partners may choose
        //    the same edge → distinct)
        val roundEdges = chosen.select(col("a"), col("b"), col("cost"))
          .distinct().localCheckpoint(true)
        chosenAll = Some(chosenAll match {
          case None => roundEdges
          case Some(acc) =>
            val nxt = acc.union(roundEdges).localCheckpoint(true)
            graft.core.Checkpoints.release(acc)
            graft.core.Checkpoints.release(roundEdges)
            nxt
        })
      }
      graft.core.Checkpoints.release(chosenCp)
      round += 1
      if (sys.env.contains("GRAFT_MST_DEBUG"))
        System.err.println(s"[mst] round $round merged=$merged")
    }
    // converged iff the last round merged nothing OR contracted the edge
    // list to empty (the final merging round may be the budget's last —
    // an empty cross-component edge list IS the fixpoint)
    val done = merged == 0 || cedgesCp.count() == 0
    graft.core.Checkpoints.release(cedgesCp)
    if (!done) {
      chosenAll.foreach(graft.core.Checkpoints.release)
      throw new IllegalStateException(
        s"boruvka did not converge within $maxRounds rounds — components " +
          "at least halve per round, so this indicates a pathological " +
          "input, not a tuning matter")
    }
    chosenAll match {
      case Some(acc) =>
        acc.select(col("a").as("src"), col("b").as("dst"), col("cost"))
      case None =>
        import spark.implicits._
        Seq.empty[(String, String, Double)].toDF("src", "dst", "cost")
    }
  }
}
