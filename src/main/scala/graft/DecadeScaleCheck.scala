package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Third-decade scale certification: the volume-bound distributed
  * kernels (WCC, PageRank, SSSP, k-core) at 10× GraphScaleCheck's full
  * scale — default 2M nodes / 20M edges — always forced-distributed
  * (`localEdgeThreshold = 0`).
  *
  * At 200k/2M edges (GraphScaleCheck, notes/distributed_scale_r13.md)
  * the kernels are superstep-scheduling-bound; this harness probes the
  * regime where DATA VOLUME starts to dominate — the axis a real
  * cluster parallelizes. Exactness vs independent references (driver
  * union-find / sequential CSR / driver peel) is already certified at
  * 2M edges; at 20M a driver-side reference would itself be the
  * bottleneck, so each kernel here carries a SELF-VERIFYING certificate
  * instead:
  *
  *  - WCC: no edge crosses components (union-closure), every label is
  *    its component's minimum member, and the labeling is bit-identical
  *    under a different input partitioning;
  *  - PageRank: bit-identical under repartitioning (the integer
  *    micro-mass formulation's whole point) + mass conservation;
  *  - SSSP: the full relaxation-FIXPOINT certificate — no edge from a
  *    reached node can improve any distance, and no edge escapes the
  *    reached set — which is a complete optimality proof for the
  *    returned distance map, not a spot check;
  *  - k-core: every returned member has degree ≥ k inside the returned
  *    subgraph (the defining property).
  *
  * Usage: runMain graft.DecadeScaleCheck [nNodes] [nEdges]
  */
object DecadeScaleCheck {

  def main(args: Array[String]): Unit = {
    val nNodes = args.headOption.map(_.toInt).getOrElse(2_000_000)
    val nEdges = args.lift(1).map(_.toInt).getOrElse(20_000_000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val t00 = System.nanoTime()

    val nodes = spark.range(nNodes)
      .select(format_string("r%07d", col("id")).as("node"))
    val edges = spark.range(nEdges)
      .select(
        format_string("r%07d",
          pmod(xxhash64(col("id")), lit(nNodes.toLong))).as("src"),
        format_string("r%07d",
          pmod(xxhash64(col("id"), lit(1)), lit(nNodes.toLong))).as("dst"))
      .cache()
    edges.count()

    // ---- 1. WCC ---------------------------------------------------------
    val (wcc, tWcc) = timed {
      val w = algo.GraphComponents.wcc(spark, nodes, edges,
        localEdgeThreshold = 0L).cache()
      w.count(); w
    }
    val crossing = edges.join(wcc.withColumnRenamed("node", "src")
        .withColumnRenamed("component", "cs"), Seq("src"))
      .join(wcc.withColumnRenamed("node", "dst")
        .withColumnRenamed("component", "cd"), Seq("dst"))
      .filter(col("cs") =!= col("cd")).count()
    require(crossing == 0, s"wcc: $crossing edges cross components")
    val badMin = wcc.groupBy(col("component"))
      .agg(min(col("node")).as("mn"))
      .filter(col("component") =!= col("mn")).count()
    require(badMin == 0, s"wcc: $badMin labels are not component minima")
    val wcc2 = algo.GraphComponents.wcc(spark,
      nodes.repartition(13), edges.repartition(17),
      localEdgeThreshold = 0L)
    val wccDiff = wcc.as("a").join(wcc2.as("b"), Seq("node"))
      .filter(col("a.component") =!= col("b.component")).count()
    require(wccDiff == 0, s"wcc: $wccDiff labels partition-dependent")
    val nComp = wcc.select("component").distinct().count()
    println(f"[decade] wcc: $nNodes%,d nodes / $nEdges%,d edges -> " +
      f"$nComp%,d components in $tWcc%.1f s " +
      f"(union-closed, min-labeled, repartition-invariant)")
    wcc.unpersist(); graft.core.Checkpoints.release(wcc)

    // ---- 2. PageRank ----------------------------------------------------
    val (pr, tPr) = timed {
      val p = algo.PageRank.run(nodes, edges, iters = 10,
        localEdgeThreshold = 0L).cache()
      p.count(); p
    }
    val pr2 = algo.PageRank.run(nodes.repartition(13),
      edges.repartition(17), iters = 10, localEdgeThreshold = 0L)
    val prDiff = pr.as("a").join(pr2.as("b"), Seq("node"))
      .filter(col("a.rank_micro") =!= col("b.rank_micro")).count()
    require(prDiff == 0, s"pagerank: $prDiff ranks partition-dependent")
    val massKept = pr.agg(sum("rank_micro")).head().getLong(0).toDouble /
      1_000_000_000_000L.toDouble
    require(massKept > 0.8 && massKept <= 1.0,
      f"pagerank: mass ratio $massKept%.3f outside (0.8, 1]")
    println(f"[decade] pagerank x10: $nNodes%,d nodes / $nEdges%,d edges " +
      f"-> $tPr%.1f s (repartition-invariant, mass $massKept%.3f)")
    pr.unpersist(); graft.core.Checkpoints.release(pr)

    // ---- 3. SSSP (weighted, fixpoint-certified) --------------------------
    val wEdges = spark.range(nEdges)
      .select(
        format_string("r%07d",
          pmod(xxhash64(col("id")), lit(nNodes.toLong))).as("src"),
        format_string("r%07d",
          pmod(xxhash64(col("id"), lit(1)), lit(nNodes.toLong))).as("dst"),
        (pmod(xxhash64(col("id"), lit(33)), lit(9L)) + 1)
          .cast("double").as("cost"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(min("cost").as("cost"))
      .cache()
    val src = wEdges.groupBy("src").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("src")).head().getString(0)
    val (state, tSp) = timed {
      val st = algo.DistributedSSSP.run(spark, wEdges, Seq(src)).cache()
      st.count(); st
    }
    val nReached = state.count()
    require(nReached > nNodes / 2,
      s"sssp reached only $nReached — degenerate source")
    // the complete optimality certificate: no relaxable edge exists,
    // and the reached set is closed (an edge from a reached src to an
    // unreached dst would itself be relaxable — cd null catches it)
    val relaxable = wEdges
      .join(state.select(col("nodeId").as("src"), col("dist").as("ds")),
        Seq("src"))
      .join(state.select(col("nodeId").as("dst"), col("dist").as("dd")),
        Seq("dst"), "left")
      .filter(col("dd").isNull ||
        col("ds") + col("cost") < col("dd") - lit(1e-9)).count()
    require(relaxable == 0, s"sssp: $relaxable relaxable edges remain")
    println(f"[decade] sssp: $nNodes%,d nodes / ${nEdges}%,d edge draws " +
      f"-> $nReached%,d reached in $tSp%.1f s (relaxation fixpoint: " +
      "0 improvable edges, reached set closed)")
    graft.core.Checkpoints.release(state)

    // ---- 4. k-core (k=3) --------------------------------------------------
    val (core3, tKc) = timed {
      val c = algo.KCore.core(spark, edges, k = 3,
        localEdgeThreshold = 0L).cache()
      c.count(); c
    }
    val members = core3.select(col("node"))
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    val induced = und
      .join(members.select(col("node").as("a")), Seq("a"))
      .join(members.select(col("node").as("b")), Seq("b"))
    val degs = induced.select(col("a").as("n"))
      .unionAll(induced.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val under = members.join(degs, col("node") === col("n"), "left")
      .filter(col("deg").isNull || col("deg") < 3).count()
    require(under == 0, s"kcore: $under members under degree 3")
    println(f"[decade] kcore k=3: ${core3.count()}%,d members in " +
      f"$tKc%.1f s (induced min degree >= 3)")
    core3.unpersist(); graft.core.Checkpoints.release(core3)

    // ---- 5. triangles + incremental fold --------------------------------
    // the uniform graph above is triangle-poor (expected density m³/n⁶
    // per triple), so this section draws its OWN community-blocked graph
    // (250-node blocks, ~2500 intra-block edges each → ~10M triangles)
    // — the regime where triangle volume, not edge volume, is the cost.
    // Certificates: (a) direct count bit-identical under a different
    // input partitioning; (b) the incremental fold (90% standing + 10%
    // delta, a DIFFERENT code path enumerating only delta-touching
    // triangles) lands on the same counts node for node.
    edges.unpersist()
    val triNodes = core.ScaleGraphs.blockedTriangleNodes(spark, nNodes)
    val triUnd = core.ScaleGraphs.blockedTriangleEdges(spark, nNodes,
      nEdges).persist()
    val nTriEdges = triUnd.count()
    val (direct, tTri) = timed {
      val d = algo.Triangles.perNode(triNodes, triUnd,
        localEdgeThreshold = 0L).persist()
      d.count(); d
    }
    val repart = algo.Triangles.perNode(triNodes, triUnd.repartition(17),
      localEdgeThreshold = 0L)
    require(core.ScaleGraphs.perNodeCountDiff(direct, repart) == 0,
      "triangles: counts differ under repartitioning")
    graft.core.Checkpoints.release(repart)
    val total = direct.agg(sum(col("n_triangles"))).collect()(0).getLong(0)
    val (triOldRaw, triNewRaw) = core.ScaleGraphs.standingDeltaSplit(triUnd)
    val triOld = triOldRaw.persist()
    val triNew = triNewRaw.persist()
    val (triBase, tTriBase) = timed {
      val b = algo.Triangles.perNode(triNodes, triOld,
        localEdgeThreshold = 0L).persist()
      b.count(); b
    }
    val (inc, tTriFold) = timed {
      val f = algo.Triangles.foldDelta(triBase, triOld, triNew).persist()
      f.count(); f
    }
    require(core.ScaleGraphs.perNodeCountDiff(inc, direct) == 0,
      "triangles: incremental != direct")
    println(f"[decade] triangles: $nTriEdges%,d blocked edges -> " +
      f"${total / 3}%,d triangles in $tTri%.1f s (repartition-stable); " +
      f"incremental fold $tTriFold%.1f s vs recount $tTri%.1f s " +
      f"(base $tTriBase%.1f s), incremental == direct")
    Seq(inc, triBase, direct).foreach { d =>
      d.unpersist(); graft.core.Checkpoints.release(d)
    }
    triNew.unpersist(); triOld.unpersist(); triUnd.unpersist()

    println(f"[decade] total ${(System.nanoTime() - t00) / 1e9}%.1f s " +
      f"at $nNodes%,d nodes / $nEdges%,d edges")
    spark.stop()
  }
}
