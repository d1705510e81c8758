package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Louvain-style community detection (the reference platform's
  * production-tier gds.louvain behind neo4j-code.txt:4-11), in the only
  * formulation that is hash-oracle-able: SYNCHRONOUS modularity-gain
  * local moving with a total, deterministic update rule and a FIXED
  * round count.
  *
  * Classic Louvain sweeps nodes in random order, moves each to the
  * neighboring community with the highest modularity gain, then
  * coarsens — no two runs agree. Here the move rule is made exact and
  * parallel:
  *
  *  - the gain of node i joining community c is compared via the
  *    INTEGER score  sc(i,c) = 2m·w(i,c) − k(i)·(Σtot(c) − [i∈c]·k(i)),
  *    which is the standard ΔQ multiplied through by 2m² (a positive
  *    constant, so the argmax is unchanged) — every term is a count or
  *    a degree sum, so both engines compute identical BIGINTs and the
  *    pick is order-independent. (Bound: |sc| ≤ 2m·k(i) + k(i)·2m,
  *    safe in 64 bits while 4·m·max_deg < 2⁶³ — at 10¹² edges that
  *    allows max degree ~10⁶.)
  *  - every MOVABLE node simultaneously adopts argmax_c sc(i,c) over
  *    {its neighbors' communities} ∪ {its own}, ties broken by MINIMUM
  *    community label (a total order, same in both engines).
  *  - movable sets alternate by node parity (first hex digit of
  *    md5(node) odd → moves on odd rounds, even → even rounds): the
  *    standard coloring trick that stops synchronous move rules from
  *    oscillating (two hubs swapping communities forever), while
  *    staying a pure per-node predicate both engines evaluate
  *    identically.
  *  - a FIXED 16 rounds (8 full parity sweeps) is the contract, g16's
  *    chained-peel convention: the round count is part of the
  *    semantics, so the DataFrame loop and the DuckDB 16-step chained
  *    CTE compute the identical community table.
  *
  * `run` is the single-level contract (g28). `runTwoLevel` adds the
  * COARSENING phase classic Louvain is known for — deterministically:
  * level-1 communities contract into super-nodes whose edge weights
  * are the inter-community und-row multiplicities (internal rows
  * become self-loops, so weighted degrees are conserved: Σk = 2m
  * unchanged), and the SAME synchronous move rule runs on the weighted
  * coarse graph for a fixed round budget (w(i,c) sums edge weights,
  * self-loops excluded from w but included in k — textbook ΔQ). The
  * "engine-dependent merge order" objection to coarsening disappears
  * because contraction happens at one fixed barrier and the coarse
  * sweep is the same deterministic parity rule.
  *
  * Scale shape: each round is two aggregations (Σtot per community —
  * tiny, ≤|communities| rows; w(i,c) — one shuffle keyed by node) plus
  * one join back; state is one (node, community, parity) row per node.
  * Contraction is one further keyed aggregation, and the coarse graph
  * is |communities|-sized — strictly cheaper than level 1. Nothing
  * collects to the driver on the distributed path, so the same rounds
  * run unchanged at 100 TB; localCheckpoint cuts lineage per round and
  * Checkpoints.release frees the previous state eagerly.
  */
object Louvain {

  /** (node, community) after `rounds` synchronous parity-alternating
    * modularity-gain rounds. `edges` is directed (src, dst) and
    * symmetrized internally; parallel edges collapse (the unweighted
    * modularity contract: neighbor multiplicity is 0/1 per pair) and
    * self-loops drop.
    */
  def run(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      rounds: Int = 16,
      localEdgeThreshold: Long = graft.core.LocalBudget.MaxLocalEdges)
      : DataFrame = {
    val e = edges.select(col(edges.columns(0)).cast("string").as("a"),
      col(edges.columns(1)).cast("string").as("b"))
    // Adaptive dispatch (the PageRank.run policy, shared byte budget):
    // 16 distributed rounds on a driver-sized graph are scheduling
    // overhead; the sequential twin computes the identical table,
    // pinned bit-equal by GraphAlgoSpec on both paths.
    val (nEdges, estBytes) = graft.core.LocalBudget.measureEdges(e)
    if (graft.core.LocalBudget.fitsLocal(nEdges, estBytes,
        localEdgeThreshold)) {
      val pairs = e.collect().map(r => (r.getString(0), r.getString(1)))
      val ids = nodes.select(col(nodes.columns(0)).cast("string"))
        .collect().map(_.getString(0))
      val idSet = ids.toSet
      val known = pairs.filter(p => idSet(p._1) && idSet(p._2))
      val labels = localReference(ids, known, rounds)
      import spark.implicits._
      return ids.toSeq.map(n => (n, labels(n))).toDF("node", "community")
    }
    val (und, degs, twoM) = prepare(spark, nodes, e)
    val labels0 = degs.select(col("node"), col("node").as("lbl"))
      .localCheckpoint(true)
    val labels = moveLoop(und.withColumn("w", lit(1L)), degs, twoM,
      labels0, rounds)
    graft.core.Checkpoints.release(und)
    val out = labels.select(col("node"), col("lbl").as("community"))
    graft.core.Checkpoints.release(degs)
    out
  }

  /** WEIGHTED Louvain (gds.louvain with relationshipWeightProperty):
    * the same synchronous parity contract with edge weights in integer
    * micro-units. `edges` is (src, dst, weightMicro: Long, positive);
    * the undirected weight of an unordered pair is the MIN over every
    * directed weight between its endpoints (parallel/asymmetric edges
    * collapse to the strongest tie consistently in both engines), and
    * the score uses weighted degrees and 2m = Σw. Overflow bound:
    * |sc| ≤ 2·(Σw)·k_max — with micro-unit weights Σw ≈ 10³·Σcost, so
    * the 64-bit bound trips earlier than the unweighted variant; keep
    * Σw·k_max < 2⁶² (document per corpus).
    */
  def runWeighted(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      rounds: Int = 16,
      localEdgeThreshold: Long = graft.core.LocalBudget.MaxLocalEdges)
      : DataFrame = {
    val e = edges.select(col(edges.columns(0)).cast("string").as("a"),
      col(edges.columns(1)).cast("string").as("b"),
      col(edges.columns(2)).cast("long").as("w"))
    val (nEdges, estBytes) = graft.core.LocalBudget.measureEdges(
      e.select("a", "b"))
    // measureEdges prices only the two id columns; the collect below
    // also pulls the Long weight — charge it (8 B/row) against the
    // budget so the local-path guard reflects actual driver bytes.
    if (graft.core.LocalBudget.fitsLocal(nEdges, estBytes + 8L * nEdges,
        localEdgeThreshold)) {
      val triples = e.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val ids = nodes.select(col(nodes.columns(0)).cast("string"))
        .collect().map(_.getString(0))
      val idSet = ids.toSet
      val known = triples.filter(t => idSet(t._1) && idSet(t._2))
      val labels = localWeightedReference(ids, known, rounds)
      import spark.implicits._
      return ids.toSeq.map(n => (n, labels(n))).toDF("node", "community")
    }
    val ns = nodes.select(col(nodes.columns(0)).cast("string").as("node"))
    // both orientations, min weight across every directed edge of the
    // unordered pair; self-loops drop; endpoints restricted to known ids
    val und = e.union(e.select(col("b").as("a"), col("a").as("b"),
        col("w")))
      .filter(col("a") =!= col("b"))
      .join(ns.select(col("node").as("a")), Seq("a"), "left_semi")
      .join(ns.select(col("node").as("b")), Seq("b"), "left_semi")
      .groupBy("a", "b").agg(min(col("w")).as("w"))
      .localCheckpoint(true)
    val twoM = und.agg(coalesce(sum(col("w")), lit(0L))).head().getLong(0)
    val degs = ns.join(und.withColumnRenamed("a", "node"), Seq("node"),
        "left_outer")
      .groupBy("node").agg(coalesce(sum(col("w")), lit(0L)).as("deg"))
      .withColumn("odd", substring(md5(col("node")), 1, 1)
        .isin("1", "3", "5", "7", "9", "b", "d", "f"))
      .localCheckpoint(true)
    val labels0 = degs.select(col("node"), col("node").as("lbl"))
      .localCheckpoint(true)
    val labels = moveLoop(und, degs, twoM, labels0, rounds)
    graft.core.Checkpoints.release(und)
    val out = labels.select(col("node"), col("lbl").as("community"))
    graft.core.Checkpoints.release(degs)
    out
  }

  /** In-memory twin of runWeighted — weighted symmetrized adjacency +
    * the shared weighted move recurrence.
    */
  private[graft] def localWeightedReference(nodeIds: Array[String],
      triples: Array[(String, String, Long)], rounds: Int)
      : Map[String, String] = {
    val wMap = scala.collection.mutable.HashMap
      .empty[(String, String), Long]
    triples.filter(t => t._1 != t._2)
      .flatMap(t => Seq((t._1, t._2, t._3), (t._2, t._1, t._3)))
      .foreach { case (a, b, w) =>
        val k = (a, b)
        wMap(k) = wMap.get(k).map(math.min(_, w)).getOrElse(w)
      }
    val wAdj: Map[String, Array[(String, Long)]] = wMap.toArray
      .map { case ((a, b), w) => (a, (b, w)) }
      .groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    val deg: Map[String, Long] = nodeIds.map(n =>
      n -> wAdj.get(n).map(_.map(_._2).sum).getOrElse(0L)).toMap
    val twoM = wMap.valuesIterator.sum
    weightedMoveRounds(nodeIds, wAdj, deg, twoM, rounds,
      nodeIds.map(n => n -> n).toMap)
  }

  /** Two-level (hierarchical) Louvain: `rounds` level-1 moving rounds,
    * one deterministic contraction, `coarseRounds` weighted rounds on
    * the coarse graph, labels projected back to the original nodes —
    * (node, community) where community is the final coarse label.
    * Exactly runMultiLevel with the level budget fixed at 2 (the g30
    * contract).
    */
  def runTwoLevel(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      rounds: Int = 16, coarseRounds: Int = 8,
      localEdgeThreshold: Long = graft.core.LocalBudget.MaxLocalEdges)
      : DataFrame =
    runMultiLevel(spark, nodes, edges, rounds, coarseRounds,
      maxLevels = 2, localEdgeThreshold)

  /** FULL multi-level Louvain (gds.louvain's level iteration,
    * `maxLevels` parity with its maxLevels knob): level 1 runs the
    * unweighted move rounds, then contraction + weighted coarse rounds
    * repeat until either a level moves NOTHING or the deterministic
    * level cap is hit. Every level contracts against the composed
    * (original node → current community) mapping, so level-j edge
    * weights are original und-row counts between level-j communities —
    * identical whether contraction iterates graph-by-graph or composes
    * against the base graph (weights were row counts all along), which
    * is what lets one fixed-depth oracle replay the whole hierarchy.
    *
    * DETERMINISM OF THE EARLY STOP: a level whose move loop returns
    * the identity labeling contracts to the very same graph (labels
    * ARE the node ids), so every later level recomputes the identical
    * identity — the stop never changes the result vs running the full
    * cap, it only skips provable no-ops. The driver oracle therefore
    * replays exactly `maxLevels − 1` coarse levels unconditionally.
    *
    * Scale shape: each level is one keyed aggregation (contraction)
    * plus `coarseRounds` move rounds on a graph of |communities|
    * nodes — strictly shrinking per level; the composed mapping stays
    * one row per ORIGINAL node and is the only state that does not
    * shrink. Nothing collects on the distributed path; the no-move
    * convergence test is a count().
    */
  def runMultiLevel(spark: SparkSession, nodes: DataFrame,
      edges: DataFrame, rounds: Int = 16, coarseRounds: Int = 8,
      maxLevels: Int = 4,
      localEdgeThreshold: Long = graft.core.LocalBudget.MaxLocalEdges)
      : DataFrame = {
    require(maxLevels >= 1, s"maxLevels must be >= 1, got $maxLevels")
    val e = edges.select(col(edges.columns(0)).cast("string").as("a"),
      col(edges.columns(1)).cast("string").as("b"))
    val (nEdges, estBytes) = graft.core.LocalBudget.measureEdges(e)
    if (graft.core.LocalBudget.fitsLocal(nEdges, estBytes,
        localEdgeThreshold)) {
      val pairs = e.collect().map(r => (r.getString(0), r.getString(1)))
      val ids = nodes.select(col(nodes.columns(0)).cast("string"))
        .collect().map(_.getString(0))
      val idSet = ids.toSet
      val known = pairs.filter(p => idSet(p._1) && idSet(p._2))
      val labels = localMultiLevel(ids, known, rounds, coarseRounds,
        maxLevels)
      import spark.implicits._
      return ids.toSeq.map(n => (n, labels(n))).toDF("node", "community")
    }
    val (und, degs, twoM) = prepare(spark, nodes, e)
    val labels0 = degs.select(col("node"), col("node").as("lbl"))
      .localCheckpoint(true)
    // q = composed mapping original node → current community
    var q = moveLoop(und.withColumn("w", lit(1L)), degs, twoM,
      labels0, rounds)
    var level = 1
    var converged = false
    while (level < maxLevels && !converged) {
      // ---- contraction: communities → weighted super-nodes -----------
      // W(c1,c2) = # und rows between the communities (symmetric;
      // c1=c2 rows are the self-loop weight = 2 × internal undirected
      // edges). k(c) = Σ_c2 W(c,c2) = Σ_{i∈c} deg(i), so Σk stays 2m.
      val wFull = und
        .join(q.select(col("node").as("a"), col("lbl").as("c1")),
          Seq("a"))
        .join(q.select(col("node").as("b"), col("lbl").as("c2")),
          Seq("b"))
        .groupBy("c1", "c2").agg(count(lit(1)).as("w"))
        .localCheckpoint(true)
      // every community appears (isolated communities keep k = 0)
      val coarseDegs = q.select(col("lbl").as("node")).distinct()
        .join(wFull.groupBy(col("c1").as("node"))
            .agg(sum(col("w")).as("deg")),
          Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
        .withColumn("odd", substring(md5(col("node")), 1, 1)
          .isin("1", "3", "5", "7", "9", "b", "d", "f"))
        .localCheckpoint(true)
      val coarse0 = coarseDegs.select(col("node"), col("node").as("lbl"))
        .localCheckpoint(true)
      // self-loops feed k (via coarseDegs) but not w(i,c): the move
      // score counts links to OTHER members only — textbook ΔQ
      val lj = moveLoop(
        wFull.filter(col("c1") =!= col("c2"))
          .select(col("c1").as("a"), col("c2").as("b"), col("w")),
        coarseDegs, twoM, coarse0, coarseRounds)
      if (lj.filter(col("node") =!= col("lbl")).count() == 0L) {
        // identity level — every further level is a provable no-op
        converged = true
        graft.core.Checkpoints.release(lj)
      } else {
        val proj = lj.select(col("node").as("c_from"),
          col("lbl").as("c_to"))
        val q2 = q.join(proj, q("lbl") === proj("c_from"))
          .select(q("node"), col("c_to").as("lbl"))
          .localCheckpoint(true)
        graft.core.Checkpoints.release(q)
        graft.core.Checkpoints.release(lj)
        q = q2
      }
      graft.core.Checkpoints.release(wFull)
      graft.core.Checkpoints.release(coarseDegs)
      level += 1
    }
    graft.core.Checkpoints.release(und)
    graft.core.Checkpoints.release(degs)
    q.select(col("node"), col("lbl").as("community"))
  }

  /** Symmetrized distinct neighbor pairs among known nodes, per-node
    * degrees + move parity, and 2m. All checkpoint-backed; callers
    * release. Filters both endpoints to the node set, matching the
    * local twin's idSet filter.
    */
  private def prepare(spark: SparkSession, nodes: DataFrame, e: DataFrame)
      : (DataFrame, DataFrame, Long) = {
    val ns = nodes.select(col(nodes.columns(0)).cast("string").as("node"))
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b")).distinct()
      .join(ns.select(col("node").as("a")), Seq("a"), "left_semi")
      .join(ns.select(col("node").as("b")), Seq("b"), "left_semi")
      .select("a", "b")
      .localCheckpoint(true)
    val twoM = und.count() // each unordered pair appears twice = 2m
    val degs = ns.join(und.withColumnRenamed("a", "node"), Seq("node"),
        "left_outer")
      .groupBy("node").agg(count(col("b")).as("deg"))
      .withColumn("odd", substring(md5(col("node")), 1, 1)
        .isin("1", "3", "5", "7", "9", "b", "d", "f"))
      .localCheckpoint(true)
    (und, degs, twoM)
  }

  /** The shared synchronous parity-alternating move loop over a
    * weighted adjacency `adj(a, b, w)` (a ≠ b rows only; level 1 uses
    * unit weights) and `degs(node, deg, odd)`. Returns the final
    * (node, lbl) table (checkpoint-backed; callers project under their
    * own renames, e.g. runTwoLevel's `proj` frame).
    */
  private def moveLoop(adj: DataFrame, degs: DataFrame, twoM: Long,
      labels0: DataFrame, rounds: Int): DataFrame = {
    // labelsCp is the checkpoint handle (releasable); labels is the
    // stats-clean view each round reads — the round plan fans the state
    // out under THREE joins, so without the barrier the propagated
    // sizeInBytes estimate compounds multiplicatively per round (see
    // Checkpoints.freshStats) and optimizer time explodes
    var labelsCp = labels0
    var labels = labels0
    for (i <- 1 to rounds) {
      val sig = labels.join(degs.select("node", "deg"), Seq("node"))
        .groupBy(col("lbl").as("cand")).agg(sum("deg").as("s"))
      val kin = adj
        .join(labels.select(col("node").as("b"), col("lbl").as("cand")),
          Seq("b"))
        .groupBy(col("a").as("node"), col("cand"))
        .agg(sum(col("w")).as("kic"))
      val base = labels.join(degs.select("node", "deg", "odd"), Seq("node"))
      // candidates = neighbor communities ∪ own (kic 0 when no neighbor
      // shares it); max(kic) collapses the own-row duplicate
      val cand = base.join(kin, Seq("node"))
        .select(col("node"), col("lbl").as("own"), col("deg"),
          col("cand"), col("kic"))
        .union(base.select(col("node"), col("lbl").as("own"), col("deg"),
          col("lbl").as("cand"), lit(0L).as("kic")))
        .groupBy("node", "own", "deg", "cand").agg(max("kic").as("kic"))
      val scored = cand.join(sig, Seq("cand"))
        .withColumn("sc", lit(twoM) * col("kic") -
          col("deg") * (col("s") -
            when(col("cand") === col("own"), col("deg")).otherwise(lit(0L))))
      // argmax score, min-label tie-break, as an arg-min over a struct
      // with a total order — deterministic in every engine
      val pick = scored
        .select(col("node"),
          struct((-col("sc")).as("ns"), col("cand").as("cand")).as("p"))
        .groupBy("node").agg(min(col("p")).as("p"))
        .select(col("node"), col("p.cand").as("new_lbl"))
      val next = base.join(pick, Seq("node"), "left_outer")
        .select(col("node"),
          when(col("odd") === lit(i % 2 == 1),
            coalesce(col("new_lbl"), col("lbl"))).otherwise(col("lbl"))
            .as("lbl"))
        .localCheckpoint(true)
      graft.core.Checkpoints.release(labelsCp)
      labelsCp = next
      labels = graft.core.Checkpoints.freshStats(next)
    }
    labelsCp
  }

  /** Per-community CONDUCTANCE over the symmetrized distinct-pair
    * graph (the gds.conductance companion metric): for each community
    * c, cut(c) = # crossing und rows with their a-side in c (= crossing
    * unordered pairs adjacent to c, counted once per side), vol(c) =
    * Σ_{i∈c} deg(i), and φ(c) = cut / min(vol, 2m − vol) (0 when the
    * denominator is 0 — an isolated or all-graph community). cut and
    * vol are exact integers; φ is one IEEE division of two exact
    * integers, portable-rounded to 6 dp — hash-oracle-able end to end.
    * Output: (community, n_nodes, cut, vol, conductance).
    */
  def conductance(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      labels: DataFrame): DataFrame = {
    val e = edges.select(col(edges.columns(0)).cast("string").as("a"),
      col(edges.columns(1)).cast("string").as("b"))
    val (und, degs, twoM) = prepare(spark, nodes, e)
    val l = labels.select(col(labels.columns(0)).cast("string").as("node"),
      col(labels.columns(1)).cast("string").as("lbl"))
    val cut = und
      .join(l.select(col("node").as("a"), col("lbl").as("la")), Seq("a"))
      .join(l.select(col("node").as("b"), col("lbl").as("lb")), Seq("b"))
      .filter(col("la") =!= col("lb"))
      .groupBy(col("la").as("community")).agg(count(lit(1)).as("cut"))
    val vol = l.join(degs.select("node", "deg"), Seq("node"))
      .groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("vol"))
    val denom = least(col("vol"), lit(twoM) - col("vol"))
    val out = vol.join(cut, Seq("community"), "left_outer")
      .select(col("community"), col("n_nodes"),
        coalesce(col("cut"), lit(0L)).as("cut"), col("vol"),
        graft.llm.TextAnalysis.portableRound(
          when(denom === 0L, lit(0.0))
            .otherwise(coalesce(col("cut"), lit(0L)).cast("double") / denom),
          6).as("conductance"))
      .localCheckpoint(true)
    graft.core.Checkpoints.release(und)
    graft.core.Checkpoints.release(degs)
    out
  }

  /** Reference implementation of the same contract for audits: plain
    * in-memory synchronous parity-alternating rounds. Exercised by
    * GraphAlgoSpec against the DataFrame loop — any drift in the score
    * or the tie-break shows up as a diff here before the driver's
    * oracle sees it.
    */
  private[graft] def localReference(nodeIds: Array[String],
      pairs: Array[(String, String)], rounds: Int): Map[String, String] = {
    val und = pairs.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
    val wAdj: Map[String, Array[(String, Long)]] = und.groupBy(_._1)
      .map { case (k, es) => k -> es.map(e => (e._2, 1L)) }
    val deg: Map[String, Long] =
      nodeIds.map(n => n -> wAdj.get(n).map(_.length.toLong).getOrElse(0L))
        .toMap
    weightedMoveRounds(nodeIds, wAdj, deg, und.length.toLong, rounds,
      nodeIds.map(n => n -> n).toMap)
  }

  /** In-memory twin of runTwoLevel: level-1 rounds, contraction with
    * self-loop-aware weighted degrees, weighted coarse rounds,
    * projection — localMultiLevel at the fixed level budget 2.
    */
  private[graft] def localTwoLevel(nodeIds: Array[String],
      pairs: Array[(String, String)], rounds: Int, coarseRounds: Int)
      : Map[String, String] =
    localMultiLevel(nodeIds, pairs, rounds, coarseRounds, maxLevels = 2)

  /** In-memory twin of runMultiLevel: contraction is recomputed from
    * the base und rows against the COMPOSED mapping each level (same
    * equivalence as the distributed path), and an identity level stops
    * the loop.
    */
  private[graft] def localMultiLevel(nodeIds: Array[String],
      pairs: Array[(String, String)], rounds: Int, coarseRounds: Int,
      maxLevels: Int): Map[String, String] = {
    var q = localReference(nodeIds, pairs, rounds)
    val und = pairs.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
    var level = 1
    var converged = false
    while (level < maxLevels && !converged) {
      val wMap = scala.collection.mutable.HashMap
        .empty[(String, String), Long].withDefaultValue(0L)
      und.foreach { case (a, b) => wMap((q(a), q(b))) += 1L }
      val coarseIds = q.values.toArray.distinct.sorted
      val k = scala.collection.mutable.HashMap.empty[String, Long]
        .withDefaultValue(0L)
      wMap.foreach { case ((c1, _), w) => k(c1) += w }
      val wAdj: Map[String, Array[(String, Long)]] = wMap.toArray
        .collect { case ((c1, c2), w) if c1 != c2 => (c1, (c2, w)) }
        .groupBy(_._1).map { case (c, es) => c -> es.map(_._2) }
      val lj = weightedMoveRounds(coarseIds, wAdj,
        coarseIds.map(c => c -> k(c)).toMap, und.length.toLong,
        coarseRounds, coarseIds.map(c => c -> c).toMap)
      if (lj.forall { case (n, l) => n == l }) converged = true
      else q = q.map { case (n, c) => n -> lj(c) }
      level += 1
    }
    q
  }

  /** The weighted synchronous move recurrence both in-memory paths
    * share (unit weights at level 1).
    */
  private def weightedMoveRounds(ids: Array[String],
      wAdj: Map[String, Array[(String, Long)]], deg: Map[String, Long],
      twoM: Long, rounds: Int, init: Map[String, String])
      : Map[String, String] = {
    val odd: Map[String, Boolean] = ids.map(n => n -> oddParity(n)).toMap
    var lbl = init
    for (i <- 1 to rounds) {
      val sig: Map[String, Long] = ids.groupBy(lbl)
        .map { case (c, ns) => c -> ns.map(deg).sum }
      lbl = ids.map { n =>
        if (odd(n) != (i % 2 == 1)) n -> lbl(n)
        else {
          val own = lbl(n); val d = deg(n)
          val kin = scala.collection.mutable.HashMap.empty[String, Long]
            .withDefaultValue(0L)
          wAdj.getOrElse(n, Array.empty[(String, Long)])
            .foreach { case (m, w) => kin(lbl(m)) += w }
          val best = (kin.keySet.toSet + own).toSeq.map { c =>
            val sc = twoM * kin(c) -
              d * (sig.getOrElse(c, 0L) - (if (c == own) d else 0L))
            (-sc, c)
          }.min
          n -> best._2
        }
      }.toMap
    }
    lbl
  }

  /** Integer modularity numerator Q·(2m)² = Σ_C (2m·W(C,C) − Σtot(C)²)
    * of a partition over the symmetrized distinct pairs — the audit
    * metric the two-level spec uses (larger is better; exact integers,
    * so cross-level comparison is exact).
    */
  private[graft] def modularityNum(nodeIds: Array[String],
      pairs: Array[(String, String)], lbl: Map[String, String]): BigInt = {
    val idSet = nodeIds.toSet
    val und = pairs
      .filter(p => p._1 != p._2 && idSet(p._1) && idSet(p._2))
      .flatMap(p => Seq(p, p.swap)).distinct
    val twoM = BigInt(und.length)
    val deg = scala.collection.mutable.HashMap.empty[String, Long]
      .withDefaultValue(0L)
    und.foreach { case (a, _) => deg(a) += 1L }
    val intra = scala.collection.mutable.HashMap.empty[String, Long]
      .withDefaultValue(0L)
    und.foreach { case (a, b) => if (lbl(a) == lbl(b)) intra(lbl(a)) += 1L }
    val tot = scala.collection.mutable.HashMap.empty[String, BigInt]
      .withDefaultValue(BigInt(0))
    nodeIds.foreach(n => tot(lbl(n)) += deg(n))
    lbl.values.toSet.iterator.map { (c: String) =>
      twoM * intra(c) - tot(c) * tot(c)
    }.sum
  }

  /** True iff the first hex digit of md5(s) is odd — the move-parity
    * predicate, evaluated identically by Spark's and DuckDB's md5.
    */
  private[graft] def oddParity(s: String): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) >> 4) & 1) == 1
  }
}
