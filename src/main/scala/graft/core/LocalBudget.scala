package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared driver-budget guard for the graph kernels' adaptive local
  * paths (PageRank, HITS, k-core, betweenness, triangles, SCC, WCC,
  * label propagation, shortest paths).
  *
  * Round-8 review note: each kernel carried its own 5M-ROW threshold,
  * but what actually bounds the local path is driver HEAP — 5M edges of
  * 3-char ids and 5M edges of 200-char URLs are very different collects.
  * This helper measures the real payload (one aggregation job over the
  * already-cached edge frame, replacing the count() the kernels ran
  * anyway) and admits the local path only while the estimated collected
  * size fits a fixed byte budget. One constant, every call site.
  *
  * The per-kernel `localEdgeThreshold` parameter survives as a row-count
  * backstop and as the spec hook (pass 0 to force the distributed path);
  * its default is high enough that the byte budget is the binding
  * constraint for realistic ids.
  */
object LocalBudget {

  /** Collected-edge-list budget: ~0.5 GiB of driver heap. At the JVM
    * cost model below this admits ≈4–5M short-id edges — the same
    * operating point as the old row threshold — but refuses long-id
    * graphs that would have fit the row count and blown the heap.
    */
  val MaxLocalBytes: Long = 512L * 1024 * 1024

  /** JVM overhead per collected (String, String) row beyond the id
    * characters: two String headers + two char arrays + the tuple +
    * array slot ≈ 100 B.
    */
  val RowOverheadBytes: Long = 100L

  /** Row-count backstop (kept as the dispatch parameter's default so
    * explicit thresholds in specs keep working; bytes bind first).
    */
  val MaxLocalEdges: Long = 50_000_000L

  /** Tighter default for SEQUENTIAL O(V·L) twins (the walk kernels: one
    * single-threaded md5 digest per node per step). The byte budget is
    * tuned for local paths whose cost is one collect + near-linear
    * array work; a walk twin at the top of that band would grind
    * through tens of millions of digests on one core while the
    * distributed path finishes its L supersteps. 2M edges keeps the
    * twin's digest count in the hundreds of milliseconds.
    */
  val MaxSequentialWalkEdges: Long = 2_000_000L

  /** Tighter default for the quality classifier's feature-table
    * collect: the sequential fit is linear, but collecting millions of
    * (doc, label, f, x) Rows single-threaded costs more than the
    * distributed path's handful of aggregates (measured at the 10×
    * corpus: local 12 s at ~3M feature rows vs distributed 6 s at ~7M).
    * 1M rows keeps the local path in the sub-second band it exists for;
    * both paths are pinned bit-equal, so dispatch is purely a cost
    * choice.
    */
  val MaxLocalFeatureRows: Long = 1_000_000L

  /** (rowCount, estimatedCollectedBytes) of a string edge frame, from
    * ONE aggregation job over its first two columns — callers use this
    * in place of the plain count() they ran before dispatching.
    */
  def measureEdges(e: DataFrame): (Long, Long) = {
    val r = e.agg(
      count(lit(1)),
      coalesce(sum(length(col(e.columns(0)).cast("string")) +
        length(col(e.columns(1)).cast("string"))), lit(0L))).head()
    val n = r.getLong(0)
    // 2 bytes/char (JVM strings are UTF-16 at worst) + per-row overhead
    (n, 2L * r.getLong(1) + n * RowOverheadBytes)
  }

  /** True iff a collect of `nEdges` rows / `estBytes` bytes fits the
    * driver budget AND the caller's row backstop.
    */
  def fitsLocal(nEdges: Long, estBytes: Long, edgeCap: Long): Boolean =
    nEdges <= edgeCap && estBytes <= MaxLocalBytes
}
