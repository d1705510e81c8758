package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over the projected simple digraph, in EXACT integer
  * arithmetic — the graph-library centrality companion to the
  * shortest-path family (the reference's platform ships it as
  * `gds.pageRank`).
  *
  * Why integers: the float formulation's per-node sum of incoming
  * contributions depends on partial-aggregation order, which differs
  * between engines (and between runs), so it can never hash-match a SQL
  * oracle. Holding rank as integer micro-mass (total mass 10¹²) makes
  * every step — contribution `r div deg`, damping `(85·Σ) div 100`,
  * teleport base — exact integer arithmetic whose sums are
  * order-independent, so a fixed iteration count is bit-identical in any
  * engine (the llm.Scoring micro-unit trick applied to an iterative
  * kernel). Truncation loses < deg ulps of micro-mass per node per step:
  * at 10¹² total mass that is a ~10⁻⁹ relative perturbation, far below
  * any ranking-relevant difference, and identical in both engines.
  *
  * Semantics: standard damping d = 0.85, teleport (1−d)/N; mass arriving
  * at dangling nodes (no out-edges after projection) leaks rather than
  * redistributing — the common simplification, stated here because it is
  * part of the oracle contract.
  *
  * Scale design: per iteration, one join of the rank vector with the
  * edge list keyed by src and one aggregation keyed by dst — the
  * canonical distributed PageRank shape (both shuffles are node-id
  * keyed and AQE-coalesced; the out-degree table is computed once and
  * cached). Rank state is localCheckpointed every iteration so the
  * lineage stays O(1) deep across the loop, and the previous state is
  * unpersisted as soon as its successor materializes. Nothing
  * graph-sized ever reaches the driver.
  */
object PageRank {

  /** Same adaptive dispatch policy as ShortestPaths/GraphComponents: a
    * graph whose edge list fits on the driver runs the identical integer
    * recurrence sequentially (10 distributed iterations on a 3 705-node
    * graph are pure scheduling overhead); GraphAlgoSpec pins the two
    * paths bit-equal, GraphScaleCheck exercises the distributed one at
    * 2M edges.
    */
  val LocalEdgeThreshold: Long = graft.core.LocalBudget.MaxLocalEdges

  /** (node, rank_micro) after `iters` iterations; `nodes` is a
    * one-column node-id frame, `edges` a (src, dst) simple digraph.
    */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int = 10,
      mass: Long = 1_000_000_000_000L,
      localEdgeThreshold: Long = LocalEdgeThreshold): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val nodeIds = nodes.select(col(nodes.columns(0)).as("node"))
    val e = edges.select(col(edges.columns(0)).as("src"),
      col(edges.columns(1)).as("dst")).cache()
    val (nEdges, estBytes) = graft.core.LocalBudget.measureEdges(e)
    if (graft.core.LocalBudget.fitsLocal(nEdges, estBytes,
        localEdgeThreshold)) {
      val pairs = e.collect().map(r => (r.getString(0), r.getString(1)))
      e.unpersist()
      val ids = nodeIds.collect().map(_.getString(0))
      val n = ids.length
      require(n > 0, "empty node set")
      val unit = mass / n
      val base = 15L * unit / 100L
      val deg = pairs.groupBy(_._1).map { case (s, es) =>
        s -> es.length.toLong }
      var r = ids.map(_ -> unit).toMap
      for (_ <- 1 to iters) {
        val in = scala.collection.mutable.HashMap.empty[String, Long]
          .withDefaultValue(0L)
        // r.get: an edge whose src is outside the node frame contributes
        // nothing — same as the distributed path's inner join of ranks
        // with deg (deg still counts ALL out-edges, so mass sent toward
        // ids outside the node set leaks identically on both paths)
        pairs.foreach { case (s, d) =>
          r.get(s).foreach(rs => in(d) += rs / deg(s)) }
        r = ids.map(v => v -> (base + 85L * in(v) / 100L)).toMap
      }
      val spark = nodes.sparkSession
      import spark.implicits._
      return ids.map(v => (v, r(v))).toSeq.toDF("node", "rank_micro")
    }
    // N is a bounded driver scalar (one count), not a data collect
    val n = nodeIds.count()
    require(n > 0, "empty node set")
    val unit = mass / n
    val base = 15L * unit / 100L
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).cache()
    var ranks = nodeIds.withColumn("r", lit(unit)).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contribs = ranks.join(deg, ranks("node") === deg("src"))
        .selectExpr("src", "r div deg AS c")
      val sums = e.join(contribs, Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum("c").as("m"))
      val next = nodeIds.join(sums, Seq("node"), "left_outer")
        .selectExpr("node",
          s"CAST($base + (85 * coalesce(m, CAST(0 AS BIGINT))) div 100" +
            " AS BIGINT) AS r")
        .localCheckpoint(true)
      graft.core.Checkpoints.release(ranks)
      ranks = next
    }
    deg.unpersist()
    e.unpersist()
    ranks.select(col("node"), col("r").as("rank_micro"))
  }

  /** Personalized PageRank: the teleport mass returns to ONE seed node
    * instead of spreading uniformly — the similarity/recommendation
    * variant (`gds.pageRank` with sourceNodes). Same exact-integer
    * discipline as `run`: all mass starts at the seed, each round
    * r(v) = [v = seed]·(15·mass div 100) + (85·Σ_in contrib) div 100,
    * so every sum is order-independent and the chained-CTE oracle is
    * bit-identical. Dangling/truncation leakage as in `run`.
    */
  def personalized(nodes: DataFrame, edges: DataFrame, seed: String,
      iters: Int = 10, mass: Long = 1_000_000_000_000L,
      localEdgeThreshold: Long = LocalEdgeThreshold): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val nodeIds = nodes.select(col(nodes.columns(0)).as("node"))
    val e = edges.select(col(edges.columns(0)).as("src"),
      col(edges.columns(1)).as("dst")).cache()
    val (nEdges, estBytes) = graft.core.LocalBudget.measureEdges(e)
    val base = 15L * mass / 100L
    if (graft.core.LocalBudget.fitsLocal(nEdges, estBytes,
        localEdgeThreshold)) {
      val pairs = e.collect().map(r => (r.getString(0), r.getString(1)))
      e.unpersist()
      val ids = nodeIds.collect().map(_.getString(0))
      require(ids.contains(seed), s"seed $seed not in node set")
      val deg = pairs.groupBy(_._1).map { case (s, es) =>
        s -> es.length.toLong }
      var r = ids.map(v => v -> (if (v == seed) mass else 0L)).toMap
      for (_ <- 1 to iters) {
        val in = scala.collection.mutable.HashMap.empty[String, Long]
          .withDefaultValue(0L)
        pairs.foreach { case (s, d) =>
          r.get(s).foreach(rs => in(d) += rs / deg(s)) }
        r = ids.map(v =>
          v -> ((if (v == seed) base else 0L) + 85L * in(v) / 100L)).toMap
      }
      val spark = nodes.sparkSession
      import spark.implicits._
      return ids.map(v => (v, r(v))).toSeq.toDF("node", "rank_micro")
    }
    // Same precondition as the local path: a missing seed must fail
    // loudly, not return an all-zero vector. One bounded count, once.
    require(nodeIds.filter(col("node") === lit(seed)).limit(1).count() == 1,
      s"seed $seed not in node set")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).cache()
    var ranks = nodeIds.withColumn("r",
        when(col("node") === lit(seed), lit(mass)).otherwise(lit(0L)))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contribs = ranks.join(deg, ranks("node") === deg("src"))
        .selectExpr("src", "r div deg AS c")
      val sums = e.join(contribs, Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum("c").as("m"))
      // teleport term via the Column API — `seed` is a data value, never
      // spliced into SQL text (quotes in ids parse fine this way)
      val next = nodeIds.join(sums, Seq("node"), "left_outer")
        .select(col("node"),
          (when(col("node") === lit(seed), lit(base)).otherwise(lit(0L)) +
            expr("(85 * coalesce(m, CAST(0 AS BIGINT))) div 100"))
            .cast("bigint").as("r"))
        .localCheckpoint(true)
      graft.core.Checkpoints.release(ranks)
      ranks = next
    }
    deg.unpersist()
    e.unpersist()
    ranks.select(col("node"), col("r").as("rank_micro"))
  }
}
