package graft

import org.apache.spark.sql.SparkSession
import graft.algo.{LocalGraph, LocalKernels}
import graft.graph.{EdgeListIngest, PropertyGraph}

/** Incremental-maintenance sweep over the reference's 7 growing slices
  * (standalone.txt:1-11's actual workflow): slice 1 builds from
  * scratch, every later slice APPENDS (EdgeListIngest.append), and at
  * each step the maintained graph is checked against a from-scratch
  * build of the same slice — node/edge/pending counts AND the canonical
  * 2022→2802 Dijkstra cost (g2's anchor), so the check covers both set
  * equality and query-result equality. Prints one line per slice plus
  * the incremental-vs-rebuild wall-time split, which is the point of
  * the operator: append cost tracks the DELTA, rebuild cost tracks the
  * accumulated corpus.
  */
object AppendSweep {
  def main(args: Array[String]): Unit = {
    val streamMode = args.contains("stream")
    val slices = args.filter(_ != "stream") match {
      case a if a.nonEmpty => a.map(_.toInt).toSeq
      case _ => (1 to 7)
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dijkstraCost(pg: PropertyGraph): Double = {
      val lg = LocalGraph.fromProjection(pg.projection, Some(pg.nodes))
      LocalKernels.dijkstra(lg, lg.idOf(queries.Graph.Src),
        lg.idOf(queries.Graph.Dst)).map(_.totalCost).getOrElse(-1.0)
    }
    def counts(pg: PropertyGraph): (Long, Long, Long) =
      (pg.nodes.count(), pg.edges.count(),
        pg.pending.map(_.count()).getOrElse(-1L))

    if (streamMode) {
      // STREAMING drain: all requested slices dropped into one stream
      // directory, one file per micro-batch, maintained live — must
      // equal a from-scratch build of the LAST slice (slices are
      // cumulative), including the canonical Dijkstra cost
      val dir = java.nio.file.Files.createTempDirectory("graft-sweep-stream")
      slices.foreach { i =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"/root/reference/Shenzhen_Edgelist_$i.csv"),
          dir.resolve(f"$i%04d.csv"))
      }
      val t0 = System.nanoTime()
      val streamed = graft.streaming.GraphStreams
        .maintainFromFiles(spark, dir.toString)
      val (nI, eI, pI) = counts(streamed)
      val tStream = (System.nanoTime() - t0) / 1e9
      val scratch = EdgeListIngest
        .build(spark, s"/root/reference/Shenzhen_Edgelist_${slices.last}.csv")
        .cache()
      val (nS, eS, pS) = counts(scratch)
      val dI = dijkstraCost(streamed)
      val dS = dijkstraCost(scratch)
      require(nI == nS && eI == eS && pI == pS && dI == dS,
        s"stream mismatch: streamed=($nI,$eI,$pI,$dI) scratch=($nS,$eS,$pS,$dS)")
      println(f"[sweep] STREAMED ${slices.size} slices in $tStream%.1f s: " +
        f"$nI nodes / $eI edges / $pI pending, dijkstra $dI%.3f ≡ " +
        "from-scratch build of the last slice")
      spark.stop()
      return
    }
    println("| slice | nodes | edges | pending | append_s | rebuild_s | dijkstra ≡ |")
    println("|---|---|---|---|---|---|---|")
    var inc: PropertyGraph = null
    slices.foreach { i =>
      val path = s"/root/reference/Shenzhen_Edgelist_$i.csv"
      val t0 = System.nanoTime()
      inc = if (inc == null) EdgeListIngest.build(spark, path).cache()
        else {
          val next = EdgeListIngest.append(spark, inc, path)
          // materialize the new generation, then drop the old caches
          val mat = PropertyGraph(
            next.nodes.localCheckpoint(true),
            next.edges.localCheckpoint(true),
            pending = next.pending.map(_.localCheckpoint(true)))
          inc.unpersistAll()
          mat
        }
      val (nI, eI, pI) = counts(inc)
      val tInc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val scratch = EdgeListIngest.build(spark, path).cache()
      val (nS, eS, pS) = counts(scratch)
      val tScr = (System.nanoTime() - t1) / 1e9
      val dI = dijkstraCost(inc)
      val dS = dijkstraCost(scratch)
      val ok = nI == nS && eI == eS && pI == pS && dI == dS
      require(ok, s"slice $i mismatch: inc=($nI,$eI,$pI,$dI) " +
        s"scratch=($nS,$eS,$pS,$dS)")
      println(f"| $i | $nI | $eI | $pI | $tInc%.2f | $tScr%.2f | ✓ ($dI%.3f) |")
      scratch.unpersistAll()
    }
    spark.stop()
  }
}
