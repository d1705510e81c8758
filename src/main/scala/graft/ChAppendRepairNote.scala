package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured note for the CH-under-append question (r15 VERDICT #8): is a
  * delta-repair path (invalidate + re-contract only ranks touching new
  * edges) worth building, or is the current rebuild-on-append contract
  * (ShortestPaths.chSummary staleness doc; ChDistributedSpec pins it
  * fail-safe) the right one at road-graph densities?
  *
  * The measurement, on the REAL growing-slice workflow (slice 1 → +
  * slice 2): any rank-preserving repair must re-contract at least every
  * node contracted at or after the FIRST rank whose contraction
  * neighborhood the delta touches — when node v was contracted, its
  * shortcut set was derived from the adjacency existing at that moment,
  * so a new edge incident to a lower-or-equal-rank node can change what
  * every later contraction should have produced (Geisberger et al. 2008
  * §5 discusses exactly this cascade; practical systems bound it with
  * per-node supporting sets, which we do not store). So the repair lower
  * bound = n − min(rank over delta endpoints), and if delta endpoints
  * hit LOW ranks — which uniformly-scattered road growth does — repair
  * re-contracts nearly everything and rebuild is strictly simpler.
  *
  * Usage: runMain graft.ChAppendRepairNote
  */
object ChAppendRepairNote {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val pg1 = graph.EdgeListIngest.build(spark, queries.Graph.DefaultEdgeList)
    val lg1 = algo.LocalGraph.fromProjection(pg1.projection, None)
    val (ch1, t1) = timed { algo.ContractionHierarchy.build(lg1) }

    val pg2 = graph.EdgeListIngest.append(spark, pg1,
      queries.Graph.Slice2EdgeList)
    val lg2 = algo.LocalGraph.fromProjection(pg2.projection, None)
    val (_, t2) = timed { algo.ContractionHierarchy.build(lg2) }

    // the delta: projection pairs present after the append but not before
    val delta = pg2.projection.select("src", "dst")
      .exceptAll(pg1.projection.select("src", "dst"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val endpoints = delta.flatMap(p => Seq(p._1, p._2)).distinct
      .filter(id => lg1.index.containsKey(id)) // new nodes have no rank
    val ranks = endpoints.map(id => ch1.rank(lg1.idOf(id)))
    val rMin = if (ranks.isEmpty) lg1.n else ranks.min
    val mustRecontract = lg1.n - rMin

    println(f"[ch-append] slice1 build ${t1 * 1000}%.0f ms " +
      f"(${lg1.n}%,d nodes), slice1+2 rebuild ${t2 * 1000}%.0f ms " +
      f"(${lg2.n}%,d nodes)")
    println(f"[ch-append] delta: ${delta.length}%,d new projection " +
      f"pairs, ${endpoints.length}%,d pre-existing endpoints, min rank " +
      f"$rMin of ${lg1.n} -> a rank-preserving repair re-contracts >= " +
      f"$mustRecontract nodes (${100.0 * mustRecontract / lg1.n}%.1f%%)")
    println(f"""{"slice1_build_ms":${t1 * 1000}%.0f,""" +
      f""""rebuild_ms":${t2 * 1000}%.0f,"delta_pairs":${delta.length},""" +
      f""""min_delta_rank":$rMin,"n":${lg1.n},""" +
      f""""repair_lower_bound_pct":${100.0 * mustRecontract / lg1.n}%.1f}""")
    spark.stop()
  }
}
