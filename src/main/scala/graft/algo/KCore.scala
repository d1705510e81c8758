package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core decomposition (membership + in-core degree for a fixed k) —
  * the reference platform's `gds.kcore` family: iteratively peel nodes
  * of undirected-simple degree < k until the residual graph is stable;
  * the survivors are the k-core.
  *
  * Adaptive dispatch like every other kernel: driver peeling below the
  * edge threshold; above it, each distributed round is one degree
  * aggregation plus two anti-joins that drop edges touching peeled
  * nodes (the peeled set shrinks round over round and broadcasts).
  * Round count equals the peel depth — small on real graphs (9 on the
  * reference network), but degenerate chains peel O(n) rounds, which is
  * inherent to k-core (the decomposition is P-complete); `maxIter`
  * bounds the loop and the local path covers every graph that fits on
  * the driver.
  */
object KCore {

  val LocalEdgeThreshold: Long = graft.core.LocalBudget.MaxLocalEdges

  /** (node, core_degree) for every member of the k-core of the
    * undirected simple projection of `edges`.
    */
  def core(spark: SparkSession, edges: DataFrame, k: Int = 2,
      maxIter: Int = 100,
      localEdgeThreshold: Long = LocalEdgeThreshold): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e = edges.select(col(edges.columns(0)).as("s"),
      col(edges.columns(1)).as("d"))
    var und = e.filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("a"),
        greatest(col("s"), col("d")).as("b"))
      .distinct().localCheckpoint(true)
    if ({ val (n, b) = graft.core.LocalBudget.measureEdges(und)
          graft.core.LocalBudget.fitsLocal(n, b, localEdgeThreshold) }) {
      val pairs = und.collect().map(r => (r.getString(0), r.getString(1)))
      graft.core.Checkpoints.release(und)
      val adj = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.Set[String]]
      pairs.foreach { case (x, y) =>
        adj.getOrElseUpdate(x, scala.collection.mutable.Set.empty) += y
        adj.getOrElseUpdate(y, scala.collection.mutable.Set.empty) += x
      }
      var changed = true
      while (changed) {
        val drop = adj.collect { case (n, vs) if vs.size < k => n }.toSeq
        changed = drop.nonEmpty
        drop.foreach { n =>
          adj(n).foreach(v => adj(v) -= n)
          adj.remove(n)
        }
      }
      import spark.implicits._
      return adj.toSeq.map { case (n, vs) => (n, vs.size.toLong) }
        .toDF("node", "core_degree")
    }
    var iter = 0
    var changed = 1L
    var nEdges = und.count()
    while (changed > 0 && iter < maxIter) {
      val deg = und.select(col("a").as("n"))
        .union(und.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      val peeled = deg.filter(col("dg") < k).select(col("n"))
      val next = und
        .join(peeled.select(col("n").as("a")), Seq("a"), "left_anti")
        .join(peeled.select(col("n").as("b")), Seq("b"), "left_anti")
        .select(col("a"), col("b"))
        .localCheckpoint(true)
      val nNext = next.count()
      changed = nEdges - nNext
      nEdges = nNext
      graft.core.Checkpoints.release(und)
      und = next
      iter += 1
    }
    if (changed > 0) {
      graft.core.Checkpoints.release(und)
      throw new IllegalStateException(
        s"k-core peel did not converge within $maxIter rounds " +
          s"(last round removed $changed edges); raise maxIter — " +
          "peel depth is graph-inherent (chains peel O(n) rounds), and " +
          "a partial residual graph is NOT the k-core")
    }
    val out = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("core_degree"))
      .localCheckpoint(true)
    graft.core.Checkpoints.release(und)
    out
  }
}
