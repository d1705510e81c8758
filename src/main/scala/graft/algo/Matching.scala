package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal matching by locally-maximal edges (the Israeli–Itai /
  * Luby-on-the-line-graph family) — MIS's edge-side twin and the
  * symmetry-breaking primitive behind parallel pairing workloads
  * (entity-resolution pair assignment, two-sided dedup arbitration,
  * round-based load pairing).
  *
  * Same determinism contract as [[IndependentSet]]: round-r edge
  * priorities are md5(r ++ ":" ++ a ++ ":" ++ b) — re-randomized per
  * round, engine-shared — and an edge enters the matching when its
  * (priority, a, b) triple is the maximum among ALL undecided edges at
  * BOTH endpoints, computed as two per-endpoint max-reductions (never an
  * edge×edge adjacency join: the incidence max is one groupBy over the
  * shrinking edge list). Matched endpoints leave; incident edges drop;
  * a constant fraction of edges dies per round in expectation →
  * O(log m) rounds. The whole Las-Vegas run replays as a fixed-round
  * SQL chain, so the matched edge set hash-verifies.
  */
object Matching {

  val LocalEdgeThreshold: Long = graft.core.LocalBudget.MaxLocalEdges

  /** Greedy WEIGHTED matching by locally-dominant edges (Preis 1999 /
    * Hoepman 2004): an edge matches when it is the heaviest undecided
    * edge at BOTH endpoints under the strict total order
    * (cost, a, b) — under which the sequential heaviest-first greedy
    * matching is UNIQUE, so the parallel rounds, a sequential twin, and
    * the SQL replay agree by mathematics (the g39 argument applied to
    * matchings). Guarantees ≥ ½ the maximum-weight matching. Parallel
    * edges collapse to their MAX cost (only the heaviest can ever
    * dominate). Returns (src, dst, cost), src < dst.
    */
  def heaviest(spark: SparkSession, edges: DataFrame,
      rounds: Int = 10,
      localEdgeThreshold: Long = LocalEdgeThreshold): DataFrame = {
    val cols = edges.columns
    val e0 = edges.select(col(cols(0)).as("s"), col(cols(1)).as("d"),
        col(cols(2)).cast("double").as("cost"))
      .filter(col("s") =!= col("d"))
      .groupBy(least(col("s"), col("d")).as("a"),
        greatest(col("s"), col("d")).as("b"))
      .agg(max(col("cost")).as("cost"))
      .cache()
    val (nEdges, estBytes) = graft.core.LocalBudget.measureEdges(
      e0.select("a", "b"))
    if (graft.core.LocalBudget.fitsLocal(nEdges, estBytes + 8 * nEdges,
        localEdgeThreshold)) {
      // ---- local: THE unique greedy heaviest-first matching ----------
      val canon = e0.collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      e0.unpersist()
      val ord = IndependentSet.Utf8Order
      val ordered = canon.sortWith { case ((a1, b1, c1), (a2, b2, c2)) =>
        // descending (cost, a, b) in the engines' UTF-8 binary order.
        // Double.compare, not !=/>: NaN costs would break sortWith's
        // strict-weak-order contract (TimSort IllegalArgumentException)
        // and diverge from Spark's nan-safe order on the distributed
        // path; Double.compare ranks NaN largest, matching Spark.
        val cc = java.lang.Double.compare(c1, c2)
        if (cc != 0) cc > 0
        else if (a1 != a2) ord.gt(a1, a2)
        else ord.gt(b1, b2)
      }
      val used = collection.mutable.Set.empty[String]
      val out = collection.mutable.ArrayBuffer
        .empty[(String, String, Double)]
      ordered.foreach { case e @ (a, b, _) =>
        if (!used.contains(a) && !used.contains(b)) {
          used += a; used += b; out += e
        }
      }
      import spark.implicits._
      return out.toSeq.toDF("src", "dst", "cost")
    }
    var ueCp = e0.localCheckpoint(true)
    e0.unpersist()
    var ue = ueCp
    var matchedAcc: Option[DataFrame] = None
    var remaining = ueCp.count()
    var r = 0
    while (remaining > 0 && r < rounds) {
      r += 1
      val inc = ue.select(col("a").as("node"),
          struct(col("cost"), col("a"), col("b")).as("k"))
        .union(ue.select(col("b").as("node"),
          struct(col("cost"), col("a"), col("b")).as("k")))
      val winners = inc.groupBy("node").agg(max(col("k")).as("w"))
      val matchedCp = ue
        .join(winners.select(col("node").as("a"), col("w").as("wa")),
          Seq("a"))
        .join(winners.select(col("node").as("b"), col("w").as("wb")),
          Seq("b"))
        .filter(struct(col("cost"), col("a"), col("b")) === col("wa") &&
          struct(col("cost"), col("a"), col("b")) === col("wb"))
        .select(col("a"), col("b"), col("cost"))
        .localCheckpoint(true)
      val matched = graft.core.Checkpoints.freshStats(matchedCp)
      val gone = matched.select(col("a").as("node"))
        .union(matched.select(col("b").as("node"))).distinct()
      val newUeCp = ue
        .join(gone.select(col("node").as("a")), Seq("a"), "left_anti")
        .join(gone.select(col("node").as("b")), Seq("b"), "left_anti")
        .select(col("a"), col("b"), col("cost"))
        .localCheckpoint(true)
      graft.core.Checkpoints.release(ueCp)
      ueCp = newUeCp
      ue = graft.core.Checkpoints.freshStats(newUeCp)
      matchedAcc = Some(matchedAcc match {
        case None => matchedCp
        case Some(acc) =>
          val nxt = acc.union(matched).localCheckpoint(true)
          graft.core.Checkpoints.release(acc)
          graft.core.Checkpoints.release(matchedCp)
          nxt
      })
      remaining = ueCp.count()
    }
    graft.core.Checkpoints.release(ueCp)
    if (remaining > 0) {
      matchedAcc.foreach(graft.core.Checkpoints.release)
      throw new IllegalStateException(
        s"weighted matching left $remaining undecided edges after " +
          s"$rounds rounds — the globally heaviest edge matches every " +
          "round, so this signals a pathological input")
    }
    matchedAcc match {
      case Some(m) => m.select(col("a").as("src"), col("b").as("dst"),
        col("cost"))
      case None =>
        import spark.implicits._
        Seq.empty[(String, String, Double)].toDF("src", "dst", "cost")
    }
  }

  /** Matched edges (src, dst) with src < dst over the undirected view of
    * `edges`; no two rows share an endpoint (spec-pinned), and every
    * dropped edge has a matched endpoint (maximality).
    */
  def maximal(spark: SparkSession, edges: DataFrame,
      rounds: Int = 8,
      localEdgeThreshold: Long = LocalEdgeThreshold): DataFrame = {
    val e0 = edges.select(col(edges.columns(0)).as("s"),
        col(edges.columns(1)).as("d"))
      .filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("a"),
        greatest(col("s"), col("d")).as("b"))
      .distinct()
      .cache()
    val (nEdges, estBytes) = graft.core.LocalBudget.measureEdges(e0)
    if (graft.core.LocalBudget.fitsLocal(nEdges, estBytes,
        localEdgeThreshold)) {
      // ---- local replay of the per-round dominance recurrence --------
      var ue = e0.collect().map(r => (r.getString(0), r.getString(1)))
        .toSet
      e0.unpersist()
      val out = collection.mutable.ArrayBuffer.empty[(String, String)]
      var r = 0
      while (r < rounds && ue.nonEmpty) {
        r += 1
        val pe = ue.iterator
          .map(e => e -> IndependentSet.md5hex(s"$r:${e._1}:${e._2}"))
          .toMap
        val tupleOrd = Ordering.Tuple3(IndependentSet.Utf8Order,
          IndependentSet.Utf8Order, IndependentSet.Utf8Order)
        val win = collection.mutable.HashMap
          .empty[String, (String, String, String)]
        ue.foreach { case e @ (a, b) =>
          val k = (pe(e), a, b)
          Seq(a, b).foreach { n =>
            if (!win.contains(n) || tupleOrd.gt(k, win(n))) win(n) = k
          }
        }
        val m = ue.filter { case e @ (a, b) =>
          val k = (pe(e), a, b)
          win(a) == k && win(b) == k
        }
        out ++= m
        val gone = m.flatMap(e => Seq(e._1, e._2))
        ue = ue.filter(e => !gone.contains(e._1) && !gone.contains(e._2))
      }
      if (ue.nonEmpty)
        throw new IllegalStateException(
          s"matching (local) left ${ue.size} undecided edges after " +
            s"$rounds rounds")
      import spark.implicits._
      return out.toSeq.toDF("src", "dst")
    }
    var ueCp = e0.localCheckpoint(true)
    e0.unpersist()
    var ue = ueCp
    var matchedAcc: Option[DataFrame] = None
    // early exit on an empty undecided edge list: later rounds are
    // provably no-ops, identical result to the full budget
    var remainingEdges = ueCp.count()
    var r = 0
    while (r < rounds && remainingEdges > 0) {
      r += 1
      val pe = ue.select(col("a"), col("b"),
        md5(concat(lit(s"$r:"), col("a"), lit(":"), col("b"))).as("p"))
      // per-endpoint winner: the max (p, a, b) among incident edges
      val inc = pe.select(col("a").as("node"),
          struct(col("p"), col("a"), col("b")).as("k"))
        .union(pe.select(col("b").as("node"),
          struct(col("p"), col("a"), col("b")).as("k")))
      val winners = inc.groupBy("node").agg(max(col("k")).as("w"))
      // matched = edges that are the winner at BOTH endpoints
      val matchedCp = pe
        .join(winners.select(col("node").as("a"), col("w").as("wa")),
          Seq("a"))
        .join(winners.select(col("node").as("b"), col("w").as("wb")),
          Seq("b"))
        .filter(struct(col("p"), col("a"), col("b")) === col("wa") &&
          struct(col("p"), col("a"), col("b")) === col("wb"))
        .select(col("a"), col("b"))
        .localCheckpoint(true)
      val matched = graft.core.Checkpoints.freshStats(matchedCp)
      // drop every edge incident to a matched endpoint
      val gone = matched.select(col("a").as("node"))
        .union(matched.select(col("b").as("node"))).distinct()
      val newUeCp = ue
        .join(gone.select(col("node").as("a")), Seq("a"), "left_anti")
        .join(gone.select(col("node").as("b")), Seq("b"), "left_anti")
        .select(col("a"), col("b"))
        .localCheckpoint(true)
      graft.core.Checkpoints.release(ueCp)
      ueCp = newUeCp
      ue = graft.core.Checkpoints.freshStats(newUeCp)
      matchedAcc = Some(matchedAcc match {
        case None => matchedCp
        case Some(acc) =>
          val nxt = acc.union(matched).localCheckpoint(true)
          graft.core.Checkpoints.release(acc)
          graft.core.Checkpoints.release(matchedCp)
          nxt
      })
      remainingEdges = ueCp.count()
      if (sys.env.contains("GRAFT_MATCH_DEBUG"))
        System.err.println(s"[matching] round $r remaining=$remainingEdges")
    }
    val leftover = remainingEdges
    if (leftover > 0) {
      graft.core.Checkpoints.release(ueCp)
      matchedAcc.foreach(graft.core.Checkpoints.release)
      throw new IllegalStateException(
        s"matching left $leftover undecided edges after $rounds rounds; " +
          "raise the budget (a constant edge fraction dies per round in " +
          "expectation, so this signals a pathological input)")
    }
    graft.core.Checkpoints.release(ueCp)
    matchedAcc match {
      case Some(m) => m.select(col("a").as("src"), col("b").as("dst"))
      case None =>
        import spark.implicits._
        Seq.empty[(String, String)].toDF("src", "dst")
    }
  }
}
