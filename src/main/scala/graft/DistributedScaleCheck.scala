package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.algo.{DistributedSSSP, LocalGraph, LocalKernels}
import graft.graph.EdgeListIngest

/** Validation main for the distributed relaxation kernel at realistic
  * superstep counts (SURVEY §7.5 risk #1: per-iteration lineage hygiene).
  * Runs the DataFrame kernel on the LARGEST shipped slice and checks the
  * result against the sequential CSR kernel. Success criteria: agreement
  * to 1e-9 and stable per-superstep wall time (no superlinear planning
  * growth).
  *
  * Usage: runMain graft.DistributedScaleCheck [sliceNo] [delta]
  */
object DistributedScaleCheck {
  def main(args: Array[String]): Unit = {
    val slice = args.headOption.getOrElse("7")
    val delta = args.drop(1).headOption.map(_.toDouble)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = s"/root/reference/Shenzhen_Edgelist_$slice.csv"
    val pg = EdgeListIngest.build(spark, path).cache()
    val lg = LocalGraph.fromProjection(pg.projection, Some(pg.nodes))
    val src = queries.Graph.Src
    val dst = queries.Graph.Dst

    // sequential reference
    val (dist, _) = LocalKernels.sssp(lg, lg.idOf(src))
    val expect = dist(lg.idOf(dst))
    println(f"[check] slice $slice: ${lg.n} nodes, sequential dist($src→$dst) = $expect%.6f")

    // distributed single-pair with early exit
    var t0 = System.nanoTime()
    val state = DistributedSSSP.run(spark, pg.projection, Seq(src),
      target = Some(dst), delta = delta)
    val got = state.filter(col("nodeId") === dst)
      .select("dist").collect().headOption.map(_.getDouble(0))
    val tPair = (System.nanoTime() - t0) / 1e9
    println(f"[check] distributed single-pair: dist=${got.getOrElse(Double.NaN)}%.6f in $tPair%.1f s (delta=$delta)")
    require(got.exists(g => math.abs(g - expect) < 1e-9), "single-pair mismatch")

    // path reconstruction: per-hop bounded lookups only (never a full
    // state collect) — must agree with the sequential kernel's total
    t0 = System.nanoTime()
    val rec = DistributedSSSP.reconstructPath(
      state.filter(col("source") === src), src, dst)
    val tRec = (System.nanoTime() - t0) / 1e9
    require(rec.exists(r => math.abs(r._2.last - expect) < 1e-9),
      "path reconstruction mismatch")
    println(f"[check] reconstructed path: ${rec.get._1.length} nodes in $tRec%.1f s (one ≤1-row lookup per hop)")

    // distributed full SSSP (no early exit) — the long-iteration stressor
    t0 = System.nanoTime()
    val full = DistributedSSSP.run(spark, pg.projection, Seq(src), delta = delta)
    val rows = full.select("nodeId", "dist").collect()
    val tFull = (System.nanoTime() - t0) / 1e9
    println(f"[check] distributed full SSSP: ${rows.length} reachable in $tFull%.1f s")
    var bad = 0
    rows.foreach { r =>
      val i = lg.index.getOrDefault(r.getString(0), -1)
      if (i < 0 || math.abs(dist(i) - r.getDouble(1)) > 1e-9) bad += 1
    }
    val reachableSeq = dist.count(_.isFinite)
    require(bad == 0, s"$bad distance mismatches")
    require(rows.length == reachableSeq,
      s"reachable mismatch: dist=${rows.length} vs seq=$reachableSeq")
    println(s"[check] PASS — all ${rows.length} distances agree with the sequential kernel")
    spark.stop()
  }
}
