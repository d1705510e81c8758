package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** GraphScaleCheck §18b as its own main: DistributedCH on ROAD-LIKE
  * topology at ≥1M edges — the measurement the grid experiments could
  * not supply (round 17 measured w×h grids structurally CH-adversarial:
  * the top of the hierarchy is a near-clique on ~min(w,h) separator
  * nodes, so a 2.1M-edge grid never converges; see GraphScaleCheck §18
  * and notes/ROUND17.md).
  *
  * The road-like instance is the REAL road network tiled: T = tx×ty
  * copies of the Shenzhen slice-1 projection (undirected-symmetrized,
  * integer-quantized costs), adjacent tiles stitched through 4
  * hash-chosen gateway nodes per border — the structure of actual road
  * atlases, where regions connect through FEW arterial nodes rather
  * than a grid's entire-side separators. Prediction (Geisberger et al.
  * 2008, low highway dimension): tile interiors contract in parallel at
  * the slice's own healthy rate, the working set collapses toward the
  * gateway skeleton (~4·T nodes), and the driver finish receives a
  * small sparse core — no grid wall.
  *
  * Certificates: the distributed+hybrid build COMPLETES with a bounded,
  * logged handoff, and ≥25 random queries over the assembled hierarchy
  * equal blind Dijkstra on the full tiled graph EXACTLY (integer costs;
  * both sides re-accumulate costs forward along original edges).
  *
  * Usage: runMain graft.ChRoadScaleCheck [tx] [ty]   (default 11×10 →
  * ~407k nodes / ~1.8M directed edges). Needs SPARK_DRIVER_MEM=64g like
  * GraphScaleCheck §18.
  */
object ChRoadScaleCheck {

  def main(args: Array[String]): Unit = {
    val tx = args.headOption.map(_.toInt).getOrElse(11)
    val ty = args.lift(1).map(_.toInt).getOrElse(10)
    val nTiles = tx * ty
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

    // slice-1 projection, undirected-symmetrized with integer costs:
    // direction is irrelevant to the contraction-topology question, and
    // integer costs make CH ≡ Dijkstra an exact double equality
    val pg = graph.EdgeListIngest.build(spark, queries.Graph.DefaultEdgeList)
    val und = pg.projection
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"), col("cost"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b")
      .agg(greatest(round(min(col("cost"))), lit(1.0)).as("cost"))
      .cache()
    val sliceNodes = pg.nodes.select(col("nodeId")).cache()
    val nSliceNodes = sliceNodes.count()

    // 4 gateway nodes per tile, hash-chosen (engine-shared md5 idiom)
    val gateways = sliceNodes
      .orderBy(md5(col("nodeId"))).limit(4)
      .collect().map(_.getString(0)).toSeq
    println(s"[road] gateways: ${gateways.mkString(", ")}")

    def tiled(node: org.apache.spark.sql.Column,
        tid: org.apache.spark.sql.Column) =
      format_string("t%03d_%s", tid, node)
    val tiles = spark.range(nTiles.toLong).select(col("id").as("tid"))
    val tileEdges = tiles.crossJoin(und)
      .select(tiled(col("a"), col("tid")).as("src"),
        tiled(col("b"), col("tid")).as("dst"), col("cost"))
    val roadEdges = tileEdges.unionByName(tileEdges
        .select(col("dst").as("src"), col("src").as("dst"), col("cost")))
      .cache()
    val roadNodes = tiles.crossJoin(sliceNodes)
      .select(tiled(col("nodeId"), col("tid")).as("node"))

    // stitches: tile (i, j) ↔ right and down neighbors through each
    // gateway, cost 7 both ways — tiny driver-side set
    val stitch = (for {
      i <- 0 until ty; j <- 0 until tx
      (ni, nj) <- Seq((i, j + 1), (i + 1, j))
      if ni < ty && nj < tx
      g <- gateways
      (u, v) <- {
        val a = f"t${i * tx + j}%03d_$g"
        val b = f"t${ni * tx + nj}%03d_$g"
        Seq((a, b), (b, a))
      }
    } yield (u, v, 7.0)).toDF("src", "dst", "cost")
    val allEdges = roadEdges.unionByName(stitch).cache()
    val nEdges = allEdges.count()
    val nNodes = nTiles * nSliceNodes
    println(f"[road] tiled graph: $tx×$ty tiles -> $nNodes%,d nodes / " +
      f"$nEdges%,d directed edges")

    val (built, tBuild) = timed {
      algo.DistributedCH.build(spark, roadNodes, allEdges, verbose = true)
    }
    println(f"[road] build: $tBuild%.1f s, ${built.rounds} levels, " +
      f"${built.nShortcuts}%,d shortcuts")

    val lg = algo.LocalGraph.fromProjection(allEdges, None)
    val serve = algo.DistributedCH.assemble(spark, lg, built)
    val rnd = new scala.util.Random(7)
    val sliceIds = sliceNodes.collect().map(_.getString(0))
    var worstSettled = 0
    var nQ = 0
    val (_, tQ) = timed {
      for (i <- 0 until 25) {
        val s = lg.idOf(f"t${rnd.nextInt(nTiles)}%03d_" +
          sliceIds(rnd.nextInt(sliceIds.length)))
        val t = lg.idOf(f"t${rnd.nextInt(nTiles)}%03d_" +
          sliceIds(rnd.nextInt(sliceIds.length)))
        val (res, settled) = serve.query(lg, s, t)
        val dij = algo.LocalKernels.dijkstra(lg, s, t)
        require(res.isDefined == dij.isDefined,
          s"road ch pair $i: reachability mismatch")
        res.foreach { p =>
          val got = algo.LocalKernels.rewalk(lg, p).last
          require(got == dij.get.totalCost,
            s"road ch query $i: $got != dijkstra ${dij.get.totalCost}")
          nQ += 1
        }
        worstSettled = math.max(worstSettled, settled)
      }
    }
    graft.core.Checkpoints.release(built.chEdges)
    graft.core.Checkpoints.release(built.ranks)
    println(f"[road] queries: 25 pairs ($nQ reachable) ≡ Dijkstra " +
      f"exactly in $tQ%.1f s, worst upward scope $worstSettled settled " +
      f"(blind Dijkstra settles ~${nNodes / 2}%,d)")
    println(f"""{"road_nodes":$nNodes,"road_edges":$nEdges,""" +
      f""""build_sec":$tBuild%.1f,"levels":${built.rounds},""" +
      f""""shortcuts":${built.nShortcuts},"query_sec":$tQ%.1f,""" +
      f""""worst_settled":$worstSettled}""")
    spark.stop()
  }
}
