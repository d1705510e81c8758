package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighbor-set Jaccard node similarity — the reference platform's
  * `gds.nodeSimilarity`: pairs of nodes whose OUT-neighbor sets overlap
  * with Jaccard ≥ a num/den threshold, reported with exact integer
  * intersection/union counts (hash-oracle-able as-is; no float ratio in
  * the contract).
  *
  * Implementation is a direct reuse of the prefix-filtered AllPairs core
  * built for document near-dup (`llm.Dedup.jaccardPairsFromSets`):
  * neighbor sets are just element sets, and the rarest-first prefix
  * filter + PPJoin positional bound are lossless at the threshold, so
  * the output equals the naive common-neighbor join the SQL oracle runs
  * — while candidate volume stays bounded on hub-heavy graphs where the
  * naive wedge join explodes as Σ indeg(shared)².
  *
  * Per-node adjacency arrays are the operator's contract (as in GDS) —
  * bounded by max out-degree, the one scale knob a caller must respect.
  */
object NodeSimilarity {

  /** (node_a, node_b, n_common, n_union) for every unordered pair with
    * |N(a) ∩ N(b)| / |N(a) ∪ N(b)| ≥ minJacNum/minJacDen; `edges` is a
    * (src, dst) digraph, parallel edges collapsed internally.
    */
  def jaccard(edges: DataFrame, minJacNum: Int = 1,
      minJacDen: Int = 3): DataFrame = {
    val nbr = edges.select(col(edges.columns(0)).as("n"),
      col(edges.columns(1)).as("v")).distinct()
    val sets = nbr.groupBy(col("n"))
      .agg(array_sort(collect_set(col("v"))).as("nbrs"))
    graft.llm.Dedup.jaccardPairsFromSets(sets, minJacNum, minJacDen)
      .select(col("id_a").as("node_a"), col("id_b").as("node_b"),
        col("n_common"), col("n_union"))
  }
}
