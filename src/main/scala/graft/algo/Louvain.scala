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
  *    INTEGER score  sc(i,c) = 2m·k(i,c) − k(i)·(Σtot(c) − [i∈c]·k(i)),
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
  *    CTE compute the identical community table. No coarsening phase:
  *    at a fixed round budget single-level moving is the deterministic
  *    core (coarsening's community-merge order is engine-dependent).
  *
  * Scale shape: each round is two aggregations (Σtot per community —
  * tiny, ≤|communities| rows; k(i,c) — one shuffle keyed by node) plus
  * one join back; state is one (node, community, parity) row per node.
  * Nothing collects to the driver on the distributed path, so the same
  * 16 rounds run unchanged at 100 TB; localCheckpoint cuts lineage per
  * round and Checkpoints.release frees the previous state eagerly.
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
    val ns = nodes.select(col(nodes.columns(0)).cast("string").as("node"))
    // undirected distinct neighbor pairs among known nodes (both
    // orientations present), matching the local twin's idSet filter
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b")).distinct()
      .join(ns.select(col("node").as("a")), Seq("a"), "left_semi")
      .join(ns.select(col("node").as("b")), Seq("b"), "left_semi")
      .select("a", "b")
      .localCheckpoint(true)
    val twoM = und.count() // each unordered pair appears twice = 2m
    // per-node degree (0 for isolated) + move parity, both round-invariant
    val degs = ns.join(und.withColumnRenamed("a", "node"), Seq("node"),
        "left_outer")
      .groupBy("node").agg(count(col("b")).as("deg"))
      .withColumn("odd", substring(md5(col("node")), 1, 1)
        .isin("1", "3", "5", "7", "9", "b", "d", "f"))
      .localCheckpoint(true)
    var labels = degs.select(col("node"), col("node").as("lbl"))
      .localCheckpoint(true)
    for (i <- 1 to rounds) {
      val sig = labels.join(degs.select("node", "deg"), Seq("node"))
        .groupBy(col("lbl").as("cand")).agg(sum("deg").as("s"))
      val kin = und
        .join(labels.select(col("node").as("b"), col("lbl").as("cand")),
          Seq("b"))
        .groupBy(col("a").as("node"), col("cand"))
        .agg(count(lit(1)).as("kic"))
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
      graft.core.Checkpoints.release(labels)
      labels = next
    }
    graft.core.Checkpoints.release(und)
    val out = labels.select(col("node"), col("lbl").as("community"))
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
    val nbrs = und.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    val deg: Map[String, Long] =
      nodeIds.map(n => n -> nbrs.get(n).map(_.length.toLong).getOrElse(0L))
        .toMap
    val twoM = und.length.toLong
    val odd: Map[String, Boolean] = nodeIds.map(n => n -> oddParity(n)).toMap
    var lbl: Map[String, String] = nodeIds.map(n => n -> n).toMap
    for (i <- 1 to rounds) {
      val sig: Map[String, Long] = nodeIds.groupBy(lbl)
        .map { case (c, ns) => c -> ns.map(deg).sum }
      lbl = nodeIds.map { n =>
        if (odd(n) != (i % 2 == 1)) n -> lbl(n)
        else {
          val own = lbl(n); val d = deg(n)
          val kin: Map[String, Long] = nbrs.getOrElse(n, Array.empty[String])
            .map(lbl).groupBy(identity)
            .map { case (c, xs) => c -> xs.length.toLong }
          val best = (kin.keySet + own).toSeq.map { c =>
            val sc = twoM * kin.getOrElse(c, 0L) -
              d * (sig.getOrElse(c, 0L) - (if (c == own) d else 0L))
            (-sc, c)
          }.min
          n -> best._2
        }
      }.toMap
    }
    lbl
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
