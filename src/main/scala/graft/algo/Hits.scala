package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hubs & authorities, Kleinberg) over the projected simple
  * digraph — the link-analysis companion to PageRank (`gds.alpha.hits`
  * on the reference's platform), in the same EXACT-integer discipline.
  *
  * Contract: the classic L2 normalization is irrational and can never
  * hash-match across engines, so the pinned semantics are HITS with L1
  * normalization in parts-per-million fixed point: each round
  *
  *   auth_raw(v) = Σ_{u→v} hub(u)          (integer, order-independent)
  *   auth(v)     = (auth_raw(v)·10⁶ div Σ_w auth_raw(w)) · 10⁶
  *   hub_raw(u)  = Σ_{u→v} auth(v)
  *   hub(u)      = (hub_raw(u)·10⁶ div Σ_w hub_raw(w)) · 10⁶
  *
  * for a fixed iteration count. The ppm-then-rescale form is chosen for
  * overflow safety, not convenience: values stay ≤ 10¹² and raws ≤
  * 10¹²·maxdeg, so every product in the recurrence fits a 64-bit long in
  * BOTH engines (raw·10⁶ ≤ 10¹⁸ < 2⁶³) — a direct raw·10¹² div total
  * would overflow BIGINT on Spark while DuckDB silently promoted to
  * HUGEINT, and the two engines would diverge exactly where it matters.
  * L1-vs-L2 changes only the scale of the fixpoint, not the ranking.
  *
  * Degenerate rounds (a raw vector summing to 0 — no edges) keep the
  * previous vector, so the recurrence stays total.
  *
  * Scale shape: two node-keyed join+agg shuffles per round (auth pull,
  * hub pull) + two scalar sums; state is one (node, hub, auth) row per
  * node, localCheckpointed per round; adaptive driver path below the
  * shared 5M-edge budget, pinned bit-equal in GraphAlgoSpec.
  */
object Hits {

  val LocalEdgeThreshold: Long = graft.core.LocalBudget.MaxLocalEdges
  val Mass: Long = 1_000_000_000_000L
  private val Ppm = 1_000_000L

  /** (node, hub_micro, auth_micro) after `iters` rounds. */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int = 10,
      localEdgeThreshold: Long = LocalEdgeThreshold): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val nodeIds = nodes.select(col(nodes.columns(0)).as("node"))
    val e = edges.select(col(edges.columns(0)).as("src"),
      col(edges.columns(1)).as("dst")).distinct().cache()
    val (nEdges, estBytes) = graft.core.LocalBudget.measureEdges(e)
    if (graft.core.LocalBudget.fitsLocal(nEdges, estBytes,
        localEdgeThreshold)) {
      val pairs = e.collect().map(r => (r.getString(0), r.getString(1)))
      e.unpersist()
      val ids = nodeIds.collect().map(_.getString(0))
      return localRun(nodes.sparkSession, ids, pairs, iters)
    }
    val n = nodeIds.count()
    require(n > 0, "empty node set")
    val unit = Mass / n
    var state = nodeIds.select(col("node"), lit(unit).as("hub"),
      lit(unit).as("auth")).localCheckpoint(true)
    for (_ <- 1 to iters) {
      // auth pull: sum hub over in-edges, ppm-normalize
      val authRaw = e.join(state.select(col("node").as("src"),
          col("hub")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum("hub").as("raw"))
      val withAuthRaw = state
        .join(authRaw, Seq("node"), "left_outer")
        .select(col("node"), col("hub"), col("auth"),
          coalesce(col("raw"), lit(0L)).as("raw"))
        .localCheckpoint(true)
      val s1 = withAuthRaw.agg(sum("raw")).head().getLong(0)
      val afterAuth =
        if (s1 == 0L) withAuthRaw.select(col("node"), col("hub"), col("auth"))
        else withAuthRaw.selectExpr("node", "hub",
          s"CAST((raw * $Ppm div $s1) * $Ppm AS BIGINT) AS auth")
      // hub pull: sum the NEW auth over out-edges, ppm-normalize
      val hubRaw = e.join(afterAuth.select(col("node").as("dst"),
          col("auth")), Seq("dst"))
        .groupBy(col("src").as("node")).agg(sum("auth").as("raw"))
      val withHubRaw = afterAuth
        .join(hubRaw, Seq("node"), "left_outer")
        .select(col("node"), col("hub"), col("auth"),
          coalesce(col("raw"), lit(0L)).as("raw"))
        .localCheckpoint(true)
      val s2 = withHubRaw.agg(sum("raw")).head().getLong(0)
      val next =
        (if (s2 == 0L) withHubRaw.select(col("node"), col("hub"), col("auth"))
         else withHubRaw.selectExpr("node",
           s"CAST((raw * $Ppm div $s2) * $Ppm AS BIGINT) AS hub", "auth"))
        .localCheckpoint(true)
      graft.core.Checkpoints.release(state)
      graft.core.Checkpoints.release(withAuthRaw)
      graft.core.Checkpoints.release(withHubRaw)
      state = next
    }
    e.unpersist()
    state.select(col("node"), col("hub").as("hub_micro"),
      col("auth").as("auth_micro"))
  }

  private[algo] def normScalar(raw: Long, total: Long): Long =
    (raw * Ppm / total) * Ppm

  /** Sequential twin of the distributed recurrence (adaptive path). */
  private def localRun(spark: org.apache.spark.sql.SparkSession,
      ids: Array[String], pairs: Array[(String, String)],
      iters: Int): DataFrame = {
    import spark.implicits._
    require(ids.nonEmpty, "empty node set")
    val present = ids.toSet
    val unit = Mass / ids.length
    var hub = ids.map(_ -> unit).toMap
    var auth = ids.map(_ -> unit).toMap
    for (_ <- 1 to iters) {
      val authRaw = scala.collection.mutable.HashMap.empty[String, Long]
        .withDefaultValue(0L)
      pairs.foreach { case (s, d) =>
        if (present.contains(d)) hub.get(s).foreach(h => authRaw(d) += h) }
      val s1 = ids.iterator.map(authRaw).sum
      if (s1 != 0L) auth = ids.map(v => v -> normScalar(authRaw(v), s1)).toMap
      val hubRaw = scala.collection.mutable.HashMap.empty[String, Long]
        .withDefaultValue(0L)
      pairs.foreach { case (s, d) =>
        if (present.contains(s)) auth.get(d).foreach(a => hubRaw(s) += a) }
      val s2 = ids.iterator.map(hubRaw).sum
      if (s2 != 0L) hub = ids.map(v => v -> normScalar(hubRaw(v), s2)).toMap
    }
    ids.toSeq.map(v => (v, hub(v), auth(v)))
      .toDF("node", "hub_micro", "auth_micro")
  }
}
