package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale validation for the round-5 graph additions (WCC, PageRank) at
  * 100–1000× the reference graph, including the ADVERSARIAL shape that
  * defeats naive label propagation:
  *
  *  1. a 1M-node PATH with sequential node ids — min-label propagation
  *     moves the min one hop per superstep here (1M supersteps); the
  *     hook+contract design must instead finish in one hook round whose
  *     1M-long hook chain is closed by O(log n) pointer jumps on the
  *     hook table;
  *  2. a 500k-node / 2M-edge random graph — forced-distributed WCC must
  *     equal the driver union-find bit for bit;
  *  3. PageRank on a 1M-node random digraph — results must be identical
  *     under a different input partitioning (the integer formulation's
  *     whole point: no summation-order sensitivity), with total mass
  *     conserved up to truncation-and-dangling leakage.
  *
  * Usage: runMain graft.GraphScaleCheck [nPath] [nRandNodes] [nRandEdges]
  */
object GraphScaleCheck {

  def main(args: Array[String]): Unit = {
    val nPath = args.headOption.map(_.toInt).getOrElse(1_000_000)
    val nRandNodes = args.lift(1).map(_.toInt).getOrElse(500_000)
    val nRandEdges = args.lift(2).map(_.toInt).getOrElse(2_000_000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- 1. adversarial path graph -------------------------------------
    // n0000000 — n0000001 — ... — n0999999, ids sorted along the path
    val pathNodes = spark.range(nPath)
      .select(format_string("n%07d", col("id")).as("node"))
    val pathEdges = spark.range(nPath - 1)
      .select(format_string("n%07d", col("id")).as("src"),
        format_string("n%07d", col("id") + 1).as("dst"))
    val (pathLabels, tPath) = timed {
      algo.GraphComponents.wcc(spark, pathNodes, pathEdges,
        localEdgeThreshold = 0L).cache()
    }
    val nPathLabels = pathLabels.count()
    val distinctPath = pathLabels.select("component").distinct().collect()
    require(nPathLabels == nPath && distinctPath.length == 1 &&
      distinctPath(0).getString(0) == "n0000000",
      s"path WCC wrong: $nPathLabels rows, ${distinctPath.length} comps")
    pathLabels.unpersist()
    println(f"[scale] wcc path: $nPath%,d-node sequential-id chain -> " +
      f"1 component in $tPath%.1f s (hook chain closed by log-n jumps)")

    // ---- 2. random graph: forced-distributed ≡ driver union-find -------
    val randEdges = spark.range(nRandEdges)
      .select(
        format_string("r%07d", pmod(xxhash64(col("id")), lit(nRandNodes.toLong))).as("src"),
        format_string("r%07d", pmod(xxhash64(col("id"), lit(1)), lit(nRandNodes.toLong))).as("dst"))
      .cache()
    val randNodes = spark.range(nRandNodes)
      .select(format_string("r%07d", col("id")).as("node"))
    val (distLabels, tDist) = timed {
      algo.GraphComponents.wcc(spark, randNodes, randEdges,
        localEdgeThreshold = 0L).cache()
    }
    val (localLabels, tLocal) = timed {
      algo.GraphComponents.wcc(spark, randNodes, randEdges).cache()
    }
    val nDiff = distLabels.as("d")
      .join(localLabels.as("l"), Seq("node"))
      .filter(col("d.component") =!= col("l.component")).count()
    val nComp = distLabels.select("component").distinct().count()
    require(nDiff == 0, s"distributed != local on $nDiff nodes")
    distLabels.unpersist(); localLabels.unpersist()
    println(f"[scale] wcc random: $nRandNodes%,d nodes / $nRandEdges%,d edges -> " +
      f"$nComp comps, distributed $tDist%.1f s == union-find $tLocal%.1f s, 0 diffs")

    // ---- 3. PageRank: partitioning-independence + mass conservation ----
    val prNodes = spark.range(nRandNodes)
      .select(format_string("r%07d", col("id")).as("node"))
    val prEdges = randEdges.filter(col("src") =!= col("dst")).distinct()
    val (pr1, tPr) = timed {
      algo.PageRank.run(prNodes, prEdges, iters = 10,
        localEdgeThreshold = 0L).cache()
    }
    val n1 = pr1.count()
    val pr2 = algo.PageRank.run(prNodes.repartition(13),
      prEdges.repartition(7), iters = 10, localEdgeThreshold = 0L)
    val prDiff = pr1.as("a").join(pr2.as("b"), Seq("node"))
      .filter(col("a.rank_micro") =!= col("b.rank_micro")).count()
    require(prDiff == 0, s"pagerank differs under repartition on $prDiff nodes")
    val mass = pr1.agg(sum("rank_micro")).head().getLong(0)
    require(mass <= 1_000_000_000_000L && mass > 400_000_000_000L,
      s"mass out of range: $mass")
    pr1.unpersist(); randEdges.unpersist()
    println(f"[scale] pagerank: $n1%,d nodes x 10 iters in $tPr%.1f s, " +
      f"repartition-invariant, mass=${mass / 1e12}%.3f of 1.0")

    // ---- 4. triangles: distributed ≡ driver brute force ----------------
    val triEdges = spark.range(nRandEdges)
      .select(
        format_string("r%07d", pmod(xxhash64(col("id"), lit(3)), lit(nRandNodes.toLong))).as("src"),
        format_string("r%07d", pmod(xxhash64(col("id"), lit(4)), lit(nRandNodes.toLong))).as("dst"))
    val triNodes = spark.range(nRandNodes)
      .select(format_string("r%07d", col("id")).as("node"))
    val (tri, tTri) = timed {
      algo.Triangles.perNode(triNodes, triEdges, localEdgeThreshold = 0L)
        .cache()
    }
    val triTotal = tri.agg(sum("n_triangles")).head().getLong(0)
    // driver brute force: wedge check over adjacency sets (Σdeg² bounded
    // at this density) — exact per-node comparison
    val undLocal = triEdges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")), greatest(col("src"), col("dst")))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val adj = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.TreeSet[String]]
    undLocal.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.TreeSet.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.TreeSet.empty) += a
    }
    val cnt = scala.collection.mutable.HashMap.empty[String, Long]
      .withDefaultValue(0L)
    adj.foreach { case (a, nbrs) =>
      val above = nbrs.iteratorFrom(a).filter(_ > a).toArray
      var i = 0
      while (i < above.length) {
        var j = i + 1
        while (j < above.length) {
          if (adj(above(i)).contains(above(j))) {
            cnt(a) += 1; cnt(above(i)) += 1; cnt(above(j)) += 1
          }
          j += 1
        }
        i += 1
      }
    }
    val gotTri = tri.filter(col("n_triangles") > 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(gotTri == cnt.toMap,
      s"triangles: distributed != brute force (${gotTri.size} vs ${cnt.size} nonzero nodes)")
    tri.unpersist()
    println(f"[scale] triangles: $nRandNodes%,d nodes / $nRandEdges%,d edges -> " +
      f"${triTotal / 3}%,d triangles in $tTri%.1f s, ≡ driver brute force")

    // ---- 5. k-core: forced-distributed ≡ driver peel -------------------
    val (kc, tKc) = timed {
      algo.KCore.core(spark, triEdges, k = 3, localEdgeThreshold = 0L)
        .cache()
    }
    val kcLocal = algo.KCore.core(spark, triEdges, k = 3)
    val kcDiff = kc.as("a").join(kcLocal.as("b"), Seq("node"), "full_outer")
      .filter(col("a.core_degree").isNull || col("b.core_degree").isNull ||
        col("a.core_degree") =!= col("b.core_degree")).count()
    val kcN = kc.count()
    require(kcDiff == 0, s"kcore: distributed != driver peel on $kcDiff nodes")
    kc.unpersist()
    println(f"[scale] kcore: $nRandNodes%,d nodes / $nRandEdges%,d edges -> " +
      f"$kcN%,d in the 3-core in $tKc%.1f s, ≡ driver peel")

    // ---- 6. SCC: forced-distributed FW-BW ≡ driver Tarjan --------------
    // Random digraphs at this density carry a giant SCC + log-ish
    // diameter — the realistic shape for the refinement's inner
    // fixpoints. (A 1M-node directed CYCLE would need O(n) inner hops:
    // label-propagation SCC is O(diameter) per round like every
    // published distributed SCC — GraphX's included — and unlike WCC
    // there is no lossless hook/contract for DIRECTED reachability.
    // Trim handles DAG tails; high-diameter cores are the documented
    // worst case.)
    val sccNodes = spark.range(nRandNodes)
      .select(format_string("r%07d", col("id")).as("node"))
    val sccEdges = spark.range(nRandEdges)
      .select(
        format_string("r%07d", pmod(xxhash64(col("id"), lit(7)), lit(nRandNodes.toLong))).as("src"),
        format_string("r%07d", pmod(xxhash64(col("id"), lit(8)), lit(nRandNodes.toLong))).as("dst"))
      .cache()
    val (sccDist, tScc) = timed {
      algo.StronglyConnected.scc(spark, sccNodes, sccEdges,
        localEdgeThreshold = 0L).cache()
    }
    val sccLocal = algo.StronglyConnected.scc(spark, sccNodes, sccEdges)
    val sccDiff = sccDist.as("a").join(sccLocal.as("b"), Seq("node"))
      .filter(col("a.component") =!= col("b.component")).count()
    val nScc = sccDist.select("component").distinct().count()
    require(sccDiff == 0, s"scc: distributed != Tarjan on $sccDiff nodes")
    require(sccDist.count() == nRandNodes, "scc must label every node")
    sccDist.unpersist(); sccEdges.unpersist()
    println(f"[scale] scc: $nRandNodes%,d nodes / $nRandEdges%,d edges -> " +
      f"$nScc%,d SCCs in $tScc%.1f s, ≡ driver Tarjan")

    // ---- 7. label propagation: repartition-independence ----------------
    // the arg-min struct aggregation is order-independent by
    // construction; a different input partitioning must reproduce every
    // label bit for bit (the PageRank check's analogue)
    val (lpa1, tLpa) = timed {
      algo.LabelPropagation.run(spark, triNodes, triEdges, rounds = 8,
        localEdgeThreshold = 0L).cache()
    }
    val lpa2 = algo.LabelPropagation.run(spark, triNodes.repartition(13),
      triEdges.repartition(7), rounds = 8, localEdgeThreshold = 0L)
    val lpaDiff = lpa1.as("a").join(lpa2.as("b"), Seq("node"))
      .filter(col("a.community") =!= col("b.community")).count()
    val nComm = lpa1.select("community").distinct().count()
    require(lpaDiff == 0, s"lpa differs under repartition on $lpaDiff nodes")
    lpa1.unpersist()
    println(f"[scale] labelprop: $nRandNodes%,d nodes x 8 rounds -> " +
      f"$nComm%,d communities in $tLpa%.1f s, repartition-invariant")

    // ---- 8. betweenness: forced-distributed ≡ local Brandes ------------
    // smaller graph (the σ/δ propagations run a fixed round budget), 16
    // sampled sources — the sampled-source production shape
    val bcN = math.max(nRandNodes / 10, 1000)
    val bcNodes = spark.range(bcN)
      .select(format_string("r%07d", col("id")).as("node"))
    val bcEdges = spark.range(bcN * 4L)
      .select(
        format_string("r%07d", pmod(xxhash64(col("id"), lit(9)), lit(bcN.toLong))).as("src"),
        format_string("r%07d", pmod(xxhash64(col("id"), lit(10)), lit(bcN.toLong))).as("dst"),
        (pmod(xxhash64(col("id"), lit(11)), lit(9L)) + 1).cast("double").as("cost"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(min("cost").as("cost"))
      .cache()
    val bcSources = (0 until 16).map(i => f"r${i * 37}%07d")
    val (bcDist, tBc) = timed {
      algo.Betweenness.run(spark, bcNodes, bcEdges, bcSources,
        maxHops = 40, localEdgeThreshold = 0L).cache()
    }
    val bcLocal = algo.Betweenness.run(spark, bcNodes, bcEdges, bcSources)
    val bcDiff = bcDist.as("a").join(bcLocal.as("b"), Seq("node"))
      .filter(col("a.bc_micro") =!= col("b.bc_micro")).count()
    require(bcDiff == 0, s"betweenness: distributed != local on $bcDiff nodes")
    val bcPos = bcDist.filter(col("bc_micro") > 0).count()
    bcDist.unpersist(); bcEdges.unpersist()
    println(f"[scale] betweenness: $bcN%,d nodes, 16 sources -> " +
      f"$bcPos%,d positive-bc nodes in $tBc%.1f s, ≡ local Brandes")

    // ---- 9. node2vec walks: distributed ≡ in-memory reference ----------
    // walk corpora are the embedding-training input; the check is the
    // exact contract (md5 picks, weighted intervals) at 20× slice scale
    // plus repartition-invariance of the join/window pipeline
    val nvN = math.max(nRandNodes / 5, 1000)
    val nvNodes = spark.range(nvN)
      .select(format_string("r%07d", col("id")).as("node"))
    val nvEdges = spark.range(nvN * 4L)
      .select(
        format_string("r%07d", pmod(xxhash64(col("id"), lit(13)), lit(nvN.toLong))).as("src"),
        format_string("r%07d", pmod(xxhash64(col("id"), lit(14)), lit(nvN.toLong))).as("dst"))
      .filter(col("src") =!= col("dst")).distinct().cache()
    val (nv, tNv) = timed {
      algo.RandomWalks.node2vecWalks(nvNodes, nvEdges,
        numWalks = 2, length = 8, localEdgeThreshold = 0L).cache()
    }
    val nvRows = nv.count()
    val nvRef = algo.RandomWalks.localNode2vecReference(
      nvNodes.collect().map(_.getString(0)),
      nvEdges.collect().map(r => (r.getString(0), r.getString(1))), 2, 8)
    val nvGot = nv.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    require(nvGot == nvRef,
      s"node2vec: distributed (${nvGot.size}) != reference (${nvRef.size})")
    val nv2 = algo.RandomWalks.node2vecWalks(nvNodes.repartition(13),
      nvEdges.repartition(7), numWalks = 2, length = 8,
      localEdgeThreshold = 0L)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    require(nv2 == nvGot, "node2vec differs under repartition")
    nv.unpersist(); nvEdges.unpersist()
    println(f"[scale] node2vec: $nvN%,d nodes x 2 walks x 8 steps -> " +
      f"$nvRows%,d corpus rows in $tNv%.1f s, ≡ reference, " +
      "repartition-invariant")

    // ---- 10. node similarity: prefix-filtered AllPairs ≡ wedge join ----
    // neighbor-set Jaccard is the one kernel whose naive form explodes as
    // Σ indeg(shared)²; the check runs the AllPairs operator at 50k nodes
    // / ~190k edges and verifies the FULL pair set against a driver
    // common-neighbor (wedge) reference computed the naive way
    val nsN = math.max(nRandNodes / 10, 1000)
    val nsEdges = spark.range(nsN * 4L)
      .select(
        format_string("r%07d", pmod(xxhash64(col("id"), lit(17)), lit(nsN.toLong))).as("src"),
        format_string("r%07d", pmod(xxhash64(col("id"), lit(18)), lit(nsN.toLong))).as("dst"))
      .filter(col("src") =!= col("dst")).distinct().cache()
    val (nsPairs, tNs) = timed {
      algo.NodeSimilarity.jaccard(nsEdges, minJacNum = 1, minJacDen = 3)
        .cache()
    }
    val nsGot = nsPairs.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val nsAdj = nsEdges.collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (k, es) => k -> es.map(_._2).toSet }
    val nsByNbr = nsAdj.toSeq.flatMap { case (n, vs) => vs.map(_ -> n) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sorted }
    val common = scala.collection.mutable.HashMap
      .empty[(String, String), Long]
    nsByNbr.values.foreach { ns =>
      var i = 0
      while (i < ns.length) {
        var j = i + 1
        while (j < ns.length) {
          common.updateWith((ns(i), ns(j)))(c => Some(c.getOrElse(0L) + 1L))
          j += 1
        }
        i += 1
      }
    }
    val nsRef = common.iterator.flatMap { case ((a, b), c) =>
      val u = nsAdj(a).size + nsAdj(b).size - c
      if (c * 3L >= u) Some((a, b, c, u.toLong)) else None
    }.toSet
    require(nsGot == nsRef,
      s"node-similarity: AllPairs (${nsGot.size}) != wedge reference " +
        s"(${nsRef.size})")
    nsPairs.unpersist(); nsEdges.unpersist()
    println(f"[scale] node-similarity: $nsN%,d nodes -> ${nsGot.size}%,d " +
      f"pairs in $tNs%.1f s, ≡ driver wedge join")

    // ---- 11. louvain: repartition-independence -------------------------
    // every move is an arg-min over an all-integer score struct, so like
    // LPA/PageRank the full 8-round community table must be bit-identical
    // under a different input partitioning
    val (lv1, tLv) = timed {
      algo.Louvain.run(spark, triNodes, triEdges, rounds = 8,
        localEdgeThreshold = 0L).cache()
    }
    val lv2 = algo.Louvain.run(spark, triNodes.repartition(13),
      triEdges.repartition(7), rounds = 8, localEdgeThreshold = 0L)
    val lvDiff = lv1.as("a").join(lv2.as("b"), Seq("node"))
      .filter(col("a.community") =!= col("b.community")).count()
    val lvComm = lv1.select("community").distinct().count()
    require(lvDiff == 0, s"louvain differs under repartition on $lvDiff nodes")
    require(lvComm < nRandNodes, "louvain never moved a node")
    lv1.unpersist()
    println(f"[scale] louvain: $nRandNodes%,d nodes x 8 rounds -> " +
      f"$lvComm%,d communities in $tLv%.1f s, repartition-invariant")

    // ---- 12. two-level louvain: coarsening at scale --------------------
    // contraction + 4 weighted rounds on top of 8 level-1 rounds; the
    // coarse phase must never lose exact-integer modularity vs level 1
    // and must be strictly cheaper than level 1 (|communities| < |V|)
    val (lv2l, tLv2) = timed {
      algo.Louvain.runTwoLevel(spark, triNodes, triEdges, rounds = 8,
        coarseRounds = 4, localEdgeThreshold = 0L).cache()
    }
    val lv2lComm = lv2l.select("community").distinct().count()
    require(lv2lComm <= lvComm,
      s"two-level coarse phase INCREASED community count: " +
        s"$lv2lComm > $lvComm")
    val lv2lRows = lv2l.count()
    require(lv2lRows == nRandNodes,
      s"two-level louvain dropped nodes: $lv2lRows != $nRandNodes")
    lv2l.unpersist()
    println(f"[scale] louvain2l: $nRandNodes%,d nodes x (8+4) rounds -> " +
      f"$lv2lComm%,d communities (level-1 $lvComm%,d) in $tLv2%.1f s")

    // ---- 13. MST at scale: distributed Borůvka on the random graph ----
    // contraction must converge in O(log n) rounds; the forest must have
    // exactly n − #components edges (acyclic + maximal) and reproduce
    // the WCC component structure
    val wEdges = randEdges.withColumn("cost",
      (conv(substring(md5(concat(col("src"), lit(":"), col("dst"))),
        1, 6), 16, 10).cast("double") + 1.0))
    val (mstE, tMst) = timed {
      algo.Boruvka.mst(spark, wEdges, localEdgeThreshold = 0L).cache()
    }
    val nMst = mstE.count()
    require(nMst == nRandNodes - nComp,
      s"mst edge count $nMst != $nRandNodes - $nComp")
    mstE.unpersist()
    println(f"[scale] mst: $nRandNodes%,d nodes / $nRandEdges%,d edges -> " +
      f"$nMst%,d forest edges in $tMst%.1f s")

    // ---- 14. MIS + matching at scale: symmetry-breaking rounds --------
    // the adversarial PATH graph is the worst case for coordination-free
    // greedy (long dependency chains); the hash-priority rounds must
    // still finish inside the fixed budget and satisfy the invariants on
    // a sampled neighborhood
    val (misL, tMis) = timed {
      algo.IndependentSet.luby(spark, pathNodes, pathEdges, rounds = 16,
        localEdgeThreshold = 0L)
        .cache()
    }
    val misIn = misL.filter(col("in_mis") === 1L).count()
    require(misIn >= nPath / 3 && misIn <= (nPath + 1) / 2,
      s"path MIS size $misIn outside [n/3, n/2]")
    misL.unpersist()
    println(f"[scale] mis: $nPath%,d-node path -> $misIn%,d in-set " +
      f"in $tMis%.1f s (16-round budget)")
    val (matchE, tMatch) = timed {
      algo.Matching.maximal(spark, pathEdges, rounds = 16,
        localEdgeThreshold = 0L).cache()
    }
    val nMatch = matchE.count()
    val matchEnds = matchE.select(col("src").as("n"))
      .union(matchE.select(col("dst").as("n")))
    require(matchEnds.distinct().count() == 2 * nMatch,
      "matching shares endpoints")
    require(nMatch >= nPath / 3, s"path matching $nMatch below n/3")
    matchE.unpersist()
    println(f"[scale] matching: ${nPath - 1}%,d-edge path -> $nMatch%,d " +
      f"pairs in $tMatch%.1f s (16-round budget)")

    // ---- 15. k-truss under skew: distributed peel ≡ local peel --------
    // hub-heavy graph (100 hubs absorb ~25% of endpoints, degree ~500 vs
    // tail ~20): the shape that blows up an unoriented triangle join.
    // The peel's degree-ordered orientation bounds wedge volume at
    // Σ min(deg)² — hubs orient AWAY, so their 500² wedges never
    // enumerate. Forced-distributed must equal the driver peel exactly.
    // 200 blocks of 100 nodes; tail edges stay block-local (~15% intra-
    // block density ⇒ triangle-rich, so the 4-truss is substantial — a
    // uniform random graph at this size is triangle-sparse and would
    // certify an almost-empty peel)
    val tkN = 20_000
    val tkE = 200_000L
    val tkBlock = pmod(xxhash64(col("id"), lit(25)), lit(200L)) * 100
    val tkEdges = spark.range(tkE).select(
      when(pmod(xxhash64(col("id"), lit(21)), lit(4L)) === 0,
        format_string("h%03d", pmod(xxhash64(col("id"), lit(23)), lit(100L))))
        .otherwise(format_string("t%06d",
          tkBlock + pmod(xxhash64(col("id"), lit(22)), lit(100L)))).as("src"),
      format_string("t%06d",
        tkBlock + pmod(xxhash64(col("id"), lit(24)), lit(100L))).as("dst"))
      .cache()
    val (tkDist, tTk) = timed {
      algo.Truss.truss(spark, tkEdges, k = 4, maxRounds = 32,
        localEdgeThreshold = 0L).cache()
    }
    val tkDistN = tkDist.count()
    val tkLocal = algo.Truss.truss(spark, tkEdges, k = 4, maxRounds = 32)
    val tkDiff = tkDist.as("a")
      .join(tkLocal.as("b"), Seq("src", "dst"), "full_outer")
      .filter(col("a.src").isNull || col("b.src").isNull).count()
    require(tkDiff == 0, s"ktruss: distributed != local peel on $tkDiff edges")
    require(tkDistN > 0, "ktruss: empty 4-truss — skew graph too sparse")
    tkDist.unpersist(); tkEdges.unpersist()
    println(f"[scale] ktruss: $tkN%,d+100hub nodes / $tkE%,d edges -> " +
      f"$tkDistN%,d 4-truss edges in $tTk%.1f s, ≡ driver peel (skewed)")

    // ---- 16. SSSP: forced-distributed relaxation at full scale --------
    // the weighted random graph twin of check 2 — every superstep is one
    // frontier⋈edges shuffle + one min-struct merge, state checkpointed
    // per superstep; must agree with the sequential CSR kernel on every
    // reachable node
    val spEdges = spark.range(nRandEdges).select(
        format_string("r%07d", pmod(xxhash64(col("id"), lit(31)),
          lit(nRandNodes.toLong))).as("src"),
        format_string("r%07d", pmod(xxhash64(col("id"), lit(32)),
          lit(nRandNodes.toLong))).as("dst"),
        (pmod(xxhash64(col("id"), lit(33)), lit(9L)) + 1)
          .cast("double").as("cost"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(min("cost").as("cost"))
      .cache()
    // source = max-out-degree node (deterministic, and guaranteed inside
    // the giant component — a FIXED id can land on a node with no
    // out-edges at some scales, which certifies nothing)
    val spSrc = spEdges.groupBy("src").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("src")).head().getString(0)
    val (spState, tSp) = timed {
      val st = algo.DistributedSSSP.run(spark, spEdges, Seq(spSrc))
      st.count(); st
    }
    // coords are irrelevant here (no A*), so no nodes frame
    val spLg = algo.LocalGraph.fromProjection(spEdges, None)
    val (spDist, _) = algo.LocalKernels.sssp(spLg, spLg.idOf(spSrc))
    val spRows = spState.select("nodeId", "dist").collect()
    var spBad = 0
    spRows.foreach { r =>
      val i = spLg.index.getOrDefault(r.getString(0), -1)
      if (i < 0 || math.abs(spDist(i) - r.getDouble(1)) > 1e-9) spBad += 1
    }
    require(spBad == 0, s"sssp: $spBad distance mismatches vs CSR kernel")
    require(spRows.length == spDist.count(_.isFinite),
      s"sssp reachable mismatch: ${spRows.length} vs " +
        s"${spDist.count(_.isFinite)}")
    require(spRows.length > nRandNodes / 2,
      s"sssp reached only ${spRows.length} nodes — degenerate source")
    println(f"[scale] sssp: $nRandNodes%,d nodes / $nRandEdges%,d edges -> " +
      f"${spRows.length}%,d reachable in $tSp%.1f s, ≡ sequential CSR")

    // ---- 17. Yen k=3: batched multi-spur relaxation at full scale ------
    // target at the 75th distance percentile (multi-hop but not the
    // pathological diameter tail); each Yen round's independent spur
    // searches run as ONE multi-spur relaxation (state keyed by
    // (spur, node), broadcast ban masks, per-spur early exit) — job
    // count per round is max-of-spur-rounds, not sum (round 18; the
    // former sum-of-searches shape measured 448–944 s here). Totals
    // must be bit-identical to the sequential Yen.
    val spByDist = spRows.sortBy(_.getDouble(1))
    val spDst = spByDist((spByDist.length * 3) / 4).getString(0)
    graft.core.Checkpoints.release(spState)
    val (yenPaths, tYen) = timed {
      algo.DistributedYen.run(spark, spEdges, spSrc, spDst, k = 3)
    }
    val yenLocal = algo.LocalKernels.yen(
      spLg, spLg.idOf(spSrc), spLg.idOf(spDst), 3)
    require(yenPaths.length == yenLocal.length,
      s"yen: ${yenPaths.length} paths vs local ${yenLocal.length}")
    yenPaths.zip(yenLocal).zipWithIndex.foreach { case ((d, l), i) =>
      require(math.abs(d.total - l.totalCost) < 1e-9,
        s"yen path $i total ${d.total} != local ${l.totalCost}")
    }
    spEdges.unpersist()
    println(f"[scale] yen: k=3 to 75th-pct target ($spDst) -> totals " +
      f"${yenPaths.map(p => f"${p.total}%.1f").mkString("/")} " +
      f"in $tYen%.1f s, ≡ sequential Yen")

    // ---- 18. contraction hierarchy: forced-distributed batch build -----
    // road-like grid (the CH-friendly shape: bounded degree, huge
    // diameter — a uniform random graph's log diameter certifies
    // nothing about hierarchy depth) at 42k nodes / 167k directed
    // edges; integer costs make CH distance ≡ Dijkstra an EXACT double
    // equality after shortcut unpacking. The build runs the batch
    // independent-set rounds distributed and finishes the densified
    // core on the driver (DistributedCH doc); serving assembles into
    // the same structure the g38 query uses.
    //
    // Size is the MEASURED end-to-end envelope, not an aspiration
    // (round 17): at 1050×500 / 2.1M edges the working set never drops
    // below ~600k edges — a w×h grid's CH top is a near-clique on
    // ~min(w,h) separator nodes (~tw² working edges by construction),
    // so the distributed rate decays toward 1/(deg+1) while the
    // witness-checked sequential finish on a 600k-edge core runs for
    // hours. Grids are CH's adversarial topology (real road networks
    // have low highway dimension and contract far better); the stall
    // policy (DistributedCH: tractable-size OR rate-floor handoff,
    // hard-capped) turns that wall into a bounded, logged handoff
    // instead of a silent multi-hour hang. notes/ROUND17.md records the
    // measured 1050×500 round economics.
    val gw = 300L; val gh = 140L
    val chN = (gw * gh).toInt
    def gid(cc: org.apache.spark.sql.Column) = format_string("g%07d", cc)
    val hIdx = spark.range(gh * (gw - 1))
      .select((col("id") / (gw - 1)).cast("long").as("r"),
        (col("id") % (gw - 1)).as("c"))
      .select((col("r") * gw + col("c")).as("a"),
        (col("r") * gw + col("c") + 1).as("b"))
    val vIdx = spark.range((gh - 1) * gw)
      .select(col("id").as("a"), (col("id") + gw).as("b"))
    val undPairs = hIdx.unionByName(vIdx)
    val chEdges0 = undPairs.select(gid(col("a")).as("src"),
        gid(col("b")).as("dst"),
        (pmod(xxhash64(col("a"), col("b"), lit(41)), lit(9L)) + 1)
          .cast("double").as("cost"))
      .unionByName(undPairs.select(gid(col("b")).as("src"),
        gid(col("a")).as("dst"),
        (pmod(xxhash64(col("b"), col("a"), lit(42)), lit(9L)) + 1)
          .cast("double").as("cost")))
      .cache()
    val chNodes = spark.range(chN.toLong).select(gid(col("id")).as("node"))
    val nChEdges = chEdges0.count()
    val (chBuilt, tChB) = timed {
      algo.DistributedCH.build(spark, chNodes, chEdges0)
    }
    val chLg = algo.LocalGraph.fromProjection(chEdges0, None)
    val chServe = algo.DistributedCH.assemble(spark, chLg, chBuilt)
    val chRnd = new scala.util.Random(7)
    var chWorstSettled = 0
    for (i <- 0 until 25) {
      val s = chRnd.nextInt(chN)
      val t = chRnd.nextInt(chN)
      val (res, settled) = chServe.query(chLg, s, t)
      val dij = algo.LocalKernels.dijkstra(chLg, s, t)
      require(res.isDefined && dij.isDefined,
        s"ch pair $i unreachable on a connected grid")
      val got = algo.LocalKernels.rewalk(chLg, res.get).last
      require(got == dij.get.totalCost,
        s"ch query $i: $got != dijkstra ${dij.get.totalCost}")
      chWorstSettled = math.max(chWorstSettled, settled)
    }
    chEdges0.unpersist()
    graft.core.Checkpoints.release(chBuilt.chEdges)
    graft.core.Checkpoints.release(chBuilt.ranks)
    println(f"[scale] ch: $chN%,d-node grid / $nChEdges%,d edges -> " +
      f"distributed build $tChB%.1f s (${chBuilt.rounds} levels, " +
      f"${chBuilt.nShortcuts}%,d shortcuts); 25 queries ≡ Dijkstra " +
      f"exactly, worst upward scope $chWorstSettled settled " +
      f"(blind Dijkstra settles ~${chN / 2}%,d)")

    // ---- 19. HyperANF: register advance at full scale -------------------
    // pure DataFrame algebra (no local path exists or is needed): one
    // edge-keyed join + one (node, bucket) max agg per round over the
    // 2M-edge digraph. Certificates: per-radius totals repartition-
    // invariant and a prefix property (radius-k values independent of
    // the horizon), nf_occ strictly monotone, and sampled per-node
    // occupied-register counts within collision expectation
    // m·(1−(1−1/m)^ball) of exact BFS ball sizes.
    val haEdges = spark.range(nRandEdges)
      .select(
        format_string("r%07d", pmod(xxhash64(col("id"), lit(51)),
          lit(nRandNodes.toLong))).as("src"),
        format_string("r%07d", pmod(xxhash64(col("id"), lit(52)),
          lit(nRandNodes.toLong))).as("dst"))
      .filter(col("src") =!= col("dst")).distinct().cache()
    val haNodes = spark.range(nRandNodes)
      .select(format_string("r%07d", col("id")).as("node"))
    val (ha3, tHa) = timed {
      algo.HyperAnf.neighborhoodFunction(spark, haNodes, haEdges, rounds = 3)
    }
    require(ha3.map(_._3).sliding(2).forall(p => p(1) > p(0)),
      s"nf_occ not strictly monotone: ${ha3.map(_._3).mkString(",")}")
    val ha2 = algo.HyperAnf.neighborhoodFunction(spark,
      haNodes.repartition(13), haEdges.repartition(7), rounds = 2)
    require(ha3.take(3) == ha2,
      "hyperanf differs under repartition / horizon prefix")
    // sampled exactness: 20 nodes' occupied counts vs exact 2-hop balls
    val haBalls = algo.HyperAnf.ballEstimates(spark, haNodes, haEdges, 2)
    val adjMap = haEdges.collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    val sampleIds = (0 until 20).map(i => f"r${i * 23456}%07d")
    val occGot = haBalls
      .filter(col("node").isin(sampleIds: _*))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    sampleIds.foreach { s =>
      val b1 = adjMap.getOrElse(s, Array.empty[String])
      val ball = (Set(s) ++ b1 ++
        b1.flatMap(v => adjMap.getOrElse(v, Array.empty[String]))).size
      val expOcc = 256.0 * (1.0 - math.pow(255.0 / 256.0, ball.toDouble))
      val got = occGot(s).toDouble
      require(got <= ball && math.abs(got - expOcc) <= 0.25 * expOcc + 3,
        s"node $s: occ $got vs exact ball $ball (exp $expOcc)")
    }
    graft.core.Checkpoints.release(haBalls)
    haEdges.unpersist()
    println(f"[scale] hyperanf: $nRandNodes%,d nodes / $nRandEdges%,d " +
      f"edges x 3 rounds -> nf_occ ${ha3.map(_._3).mkString("/")} in " +
      f"$tHa%.1f s; repartition-invariant, horizon-prefix-stable, 20 " +
      "sampled balls within collision expectation of exact BFS")

    // ---- 20. whole-graph profile at full scale --------------------------
    // g50's statistics on the 500k-node / 2M-edge random graph: every
    // emitted integer must be BIT-EQUAL under a different input
    // partitioning (the exact-arithmetic contract is the whole point),
    // and the structural invariants must hold at scale: 3·triangles ≤
    // wedges (every triangle closes three wedges), per-node local CC ≤ 1
    // implies lcc_micro_sum ≤ 1e6·n, |assortativity| ≤ 1 via num ≤ den.
    val gpNodes = spark.range(nRandNodes)
      .select(format_string("r%07d", col("id")).as("node"))
    val (gpRow, tGp) = timed {
      algo.GraphProfile.stats(gpNodes, randEdges).collect()(0)
    }
    val (gpWedges, gpTri, gpLcc, gpNum, gpDen) =
      (gpRow.getLong(4), gpRow.getLong(5), gpRow.getLong(6),
        gpRow.getLong(7), gpRow.getLong(8))
    require(3 * gpTri <= gpWedges,
      s"profile invariant: 3*tri $gpTri > wedges $gpWedges")
    require(gpLcc >= 0 && gpLcc <= 1000000L * nRandNodes,
      s"profile invariant: lcc_micro_sum $gpLcc out of range")
    require(gpDen > 0 && math.abs(gpNum) <= gpDen,
      s"profile invariant: |assort_num| $gpNum > assort_den $gpDen")
    val gpRow2 = algo.GraphProfile.stats(gpNodes.repartition(13),
      randEdges.repartition(7)).collect()(0)
    require(gpRow == gpRow2, "graph profile differs under repartition")
    println(f"[scale] profile: $nRandNodes%,d nodes / $nRandEdges%,d " +
      f"edges -> tri $gpTri%,d wedges $gpWedges%,d assort " +
      f"${gpRow.getDouble(10)}%.6f in $tGp%.1f s; repartition-bit-equal, " +
      "invariants (3T<=W, lcc<=1e6n, |num|<=den) hold")

    println(f"""{"wcc_path_sec":$tPath%.1f,"wcc_rand_sec":$tDist%.1f,"pagerank_sec":$tPr%.1f,"triangles_sec":$tTri%.1f,"kcore_sec":$tKc%.1f,"scc_sec":$tScc%.1f,"labelprop_sec":$tLpa%.1f,"betweenness_sec":$tBc%.1f,"node2vec_sec":$tNv%.1f,"nodesim_sec":$tNs%.1f,"louvain_sec":$tLv%.1f,"louvain2l_sec":$tLv2%.1f,"mst_sec":$tMst%.1f,"mis_sec":$tMis%.1f,"matching_sec":$tMatch%.1f,"ktruss_sec":$tTk%.1f,"sssp_sec":$tSp%.1f,"yen3_sec":$tYen%.1f,"ch_build_sec":$tChB%.1f,"hyperanf_sec":$tHa%.1f,"profile_sec":$tGp%.1f,"ch_levels":${chBuilt.rounds},"ch_shortcuts":${chBuilt.nShortcuts},"n_path":$nPath,"n_rand_nodes":$nRandNodes,"n_rand_edges":$nRandEdges}""")
    spark.stop()
  }
}
