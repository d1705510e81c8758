package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal independent set by Luby's algorithm (1986) — the classic
  * symmetry-breaking primitive (conflict-free scheduling, graph
  * coloring's first layer, parallel greedy matching's dual; reference
  * scope: the GDS algorithm-library workflow of neo4j-code.txt).
  *
  * Determinism contract: round-r priorities are md5(r ++ ":" ++ node) —
  * re-randomized per round as Luby requires, but from a hash both
  * engines share, so the entire run replays as a fixed-round SQL chain
  * and the RESULT hash-verifies (the g21 walk-chain idiom applied to a
  * symmetry-breaking loop). A node joins the MIS when its (priority,
  * id) pair beats every undecided neighbor's; winners' neighborhoods
  * are excluded; the undecided subgraph contracts. Each round kills a
  * constant fraction of edges in expectation → O(log n) rounds (slice 1
  * finishes in 3; the fixed budget pads to 8 — exhausted-input rounds
  * are no-ops, and the run fails loudly if the budget is ever short).
  *
  * 100 TB shape: per round, two node-keyed joins over the SHRINKING
  * undecided edge list and anti-joins over the undecided node set —
  * nothing collects, no global window; localCheckpoints cut lineage.
  */
object IndependentSet {

  /** (node, in_mis 1|0) for every node in `nodes`; `edges` is directed
    * (src, dst), symmetrized internally, self-loops dropped. Isolated
    * nodes enter the MIS in round 1 (no undecided neighbor beats them).
    */
  def luby(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      rounds: Int = 8): DataFrame = {
    val allNodes = nodes.select(col(nodes.columns(0)).as("node"))
    var undCp = allNodes.localCheckpoint(true)
    var und = undCp
    val e0 = edges.select(col(edges.columns(0)).as("a"),
        col(edges.columns(1)).as("b"))
    var ueCp = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
    var ue = ueCp
    var misAcc: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      val pr = und.select(col("node"),
        md5(concat(lit(s"$r:"), col("node"))).as("p"))
      // a node loses when ANY undecided neighbor's (priority, id) pair
      // beats its own — strict: the pairs are distinct by the id field
      val losers = ue
        .join(pr.select(col("node").as("a"), col("p").as("pa")), Seq("a"))
        .join(pr.select(col("node").as("b"), col("p").as("pb")), Seq("b"))
        .filter(struct(col("pb"), col("b")) > struct(col("pa"), col("a")))
        .select(col("a").as("node")).distinct()
      val candCp = und.join(losers, Seq("node"), "left_anti")
        .localCheckpoint(true)
      val cand = graft.core.Checkpoints.freshStats(candCp)
      val excl = ue.join(cand.select(col("node").as("b")), Seq("b"))
        .select(col("a").as("node")).distinct()
      val newUndCp = und.join(cand, Seq("node"), "left_anti")
        .join(excl, Seq("node"), "left_anti")
        .localCheckpoint(true)
      graft.core.Checkpoints.release(undCp)
      undCp = newUndCp
      und = graft.core.Checkpoints.freshStats(newUndCp)
      val newUeCp = ue
        .join(und.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(und.select(col("node").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(true)
      graft.core.Checkpoints.release(ueCp)
      ueCp = newUeCp
      ue = graft.core.Checkpoints.freshStats(newUeCp)
      misAcc = Some(misAcc match {
        case None => candCp
        case Some(acc) =>
          val nxt = acc.union(cand).localCheckpoint(true)
          graft.core.Checkpoints.release(acc)
          graft.core.Checkpoints.release(candCp)
          nxt
      })
      if (sys.env.contains("GRAFT_MIS_DEBUG"))
        System.err.println(s"[mis] round $r")
    }
    val leftover = undCp.count()
    graft.core.Checkpoints.release(ueCp)
    if (leftover > 0) {
      graft.core.Checkpoints.release(undCp)
      misAcc.foreach(graft.core.Checkpoints.release)
      throw new IllegalStateException(
        s"luby did not decide $leftover nodes within $rounds rounds; " +
          "raise the budget (each round kills a constant edge fraction " +
          "in expectation, so this signals a pathological input)")
    }
    graft.core.Checkpoints.release(undCp)
    val mis = misAcc.get
    allNodes.join(mis.withColumn("in_mis", lit(1L)), Seq("node"),
        "left_outer")
      .select(col("node"), coalesce(col("in_mis"), lit(0L)).as("in_mis"))
  }
}
