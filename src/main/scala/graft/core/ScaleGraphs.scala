package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared synthetic-graph builders + certificates for the scale-check
  * mains (GeoScaleCheck, DecadeScaleCheck). One definition of the
  * community-blocked triangle-rich graph and of the per-node-count diff
  * so the two harnesses cannot drift into certifying different things.
  */
object ScaleGraphs {

  /** Canonical undirected simple edges of a community-blocked random
    * graph: `blockSz`-node blocks, edges drawn intra-block from two
    * independent hash streams — triangle-RICH by construction (a
    * uniform random graph of the same size is near-triangle-free), the
    * regime where triangle volume rather than edge volume is the cost.
    * Deterministic (xxhash64 seeds 5/7/11), node ids `t%07d`.
    */
  def blockedTriangleEdges(spark: SparkSession, nNodes: Int,
      nEdges: Int, blockSz: Long = 250L): DataFrame = {
    val nBlocks = nNodes / blockSz
    val blockOf = pmod(xxhash64(col("id"), lit(5)), lit(nBlocks))
    spark.range(nEdges).select(
        format_string("t%07d", blockOf * blockSz +
          pmod(xxhash64(col("id"), lit(7)), lit(blockSz))).as("src"),
        format_string("t%07d", blockOf * blockSz +
          pmod(xxhash64(col("id"), lit(11)), lit(blockSz))).as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
  }

  /** Node frame matching [[blockedTriangleEdges]]' id space. */
  def blockedTriangleNodes(spark: SparkSession, nNodes: Int): DataFrame =
    spark.range(nNodes)
      .select(format_string("t%07d", col("id")).as("node"))

  /** The 90/10 standing/delta split contract used by the incremental-
    * maintenance certificates: pmod(xxhash64(a, b), 10) == 0 is the
    * delta. Returns (standing, delta) — disjoint by construction over
    * a canonical distinct edge set.
    */
  def standingDeltaSplit(und: DataFrame): (DataFrame, DataFrame) = {
    val split = pmod(xxhash64(col("a"), col("b")), lit(10))
    (und.filter(split =!= 0), und.filter(split === 0))
  }

  /** Rows where two (node, n_triangles)-shaped frames disagree
    * (full-outer, null-sensitive) — 0 means bit-identical counts.
    */
  def perNodeCountDiff(x: DataFrame, y: DataFrame): Long =
    x.as("x").join(y.as("y"), col("x.node") === col("y.node"),
        "full_outer")
      .filter(col("x.n_triangles").isNull ||
        col("y.n_triangles").isNull ||
        col("x.n_triangles") =!= col("y.n_triangles")).count()
}
