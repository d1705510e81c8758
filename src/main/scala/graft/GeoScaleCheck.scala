package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Geo

/** Scale validation for the round-15 additions, with exactness
  * certificates computed in the same run (the GraphScaleCheck pattern):
  *
  *  1. grid-banded radius join at millions of points — candidate volume
  *     must stay cell-bounded (wall time is the witness), and the pair
  *     set must equal brute force on interior sample windows (a window
  *     pair's membership depends only on points inside the window, so
  *     the window restriction of the banded join IS comparable to a
  *     window-local brute force);
  *  2. density hotspots at 20M points — the aggregate output stays
  *     bounded by the box geometry and conserves mass;
  *  3. incremental triangle maintenance at 2M edges, forced-distributed:
  *     foldDelta over a 90/10 split must equal the from-scratch count
  *     bit for bit, and the steady-state fold must cost a fraction of
  *     the recount.
  *
  * Usage: runMain graft.GeoScaleCheck [nPoints] [radiusM] [nRandNodes] [nRandEdges]
  */
object GeoScaleCheck {

  def main(args: Array[String]): Unit = {
    val nPoints = args.headOption.map(_.toLong).getOrElse(5_000_000L)
    val radiusM = args.lift(1).map(_.toLong).getOrElse(50L)
    val nRandNodes = args.lift(2).map(_.toInt).getOrElse(500_000)
    val nRandEdges = args.lift(3).map(_.toInt).getOrElse(2_000_000)
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

    // ---- 1. radius join at nPoints -------------------------------------
    val pts = spark.range(nPoints).select(col("id"),
      Geo.xMeters(col("id")).as("x"), Geo.yMeters(col("id")).as("y"))
      .persist()
    pts.count()
    val ((pairs, nPairs), tJoin) = timed {
      val p = Geo.radiusJoin(pts, radiusM).persist()
      (p, p.count())
    }
    val bad = pairs.filter(col("d2") > radiusM * radiusM ||
      col("id_a") >= col("id_b")).count()
    require(bad == 0, s"radius join emitted $bad out-of-contract pairs")
    require(nPairs > 0, "radius join found no pairs — radius too small")
    println(f"[geo-scale] radius join: $nPoints%,d points, r=$radiusM m -> " +
      f"$nPairs%,d pairs in $tJoin%.1f s")

    // window exactness: 3 interior 1 km × 1 km windows; the banded
    // join restricted to window-interior endpoints must equal a brute
    // force over the window's points alone
    Seq((20000L, 30000L), (51000L, 74000L), (83000L, 130000L)).foreach {
      case (x0, y0) =>
        val inWin = (x: org.apache.spark.sql.Column,
            y: org.apache.spark.sql.Column) =>
          x >= x0 && x < x0 + 1000L && y >= y0 && y < y0 + 1000L
        val winPts = pts.filter(inWin(col("x"), col("y")))
        val brute = Geo.radiusJoinBrute(winPts, radiusM)
          .select("id_a", "id_b", "d2").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val banded = pairs
          .filter(inWin(col("x_a"), col("y_a")) &&
            inWin(col("x_b"), col("y_b")))
          .select("id_a", "id_b", "d2").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        require(banded == brute,
          s"window ($x0,$y0): banded ${banded.size} != brute ${brute.size}")
        println(f"[geo-scale] window ($x0%,d, $y0%,d): " +
          f"${brute.size}%,d pairs, banded == brute")
    }
    pairs.unpersist()

    // ---- 2. hotspots at 4×nPoints --------------------------------------
    val big = spark.range(nPoints * 4).select(
      Geo.xMeters(col("id")).as("x"), Geo.yMeters(col("id")).as("y"))
    val (grid, tHot) = timed {
      Geo.hotspots(big, 5000L).collect()
    }
    val maxCells = (Geo.BoxX / 5000L) * (Geo.BoxY / 5000L)
    require(grid.length <= maxCells, s"grid ${grid.length} > $maxCells")
    val mass = grid.map(_.getLong(grid.head.fieldIndex("n_points"))).sum
    require(mass == nPoints * 4, s"hotspot mass $mass != ${nPoints * 4}")
    println(f"[geo-scale] hotspots: ${nPoints * 4}%,d points -> " +
      f"${grid.length}%,d cells in $tHot%.1f s, mass conserved")
    pts.unpersist()

    // ---- 3. incremental triangles at nRandEdges, forced-distributed ----
    // community-blocked triangle-rich graph + 90/10 split, both from
    // core.ScaleGraphs (shared with DecadeScaleCheck section 5 so the
    // two harnesses certify the SAME contract at their two scales)
    val nodes = core.ScaleGraphs.blockedTriangleNodes(spark, nRandNodes)
    val und = core.ScaleGraphs.blockedTriangleEdges(spark, nRandNodes,
      nRandEdges).persist()
    val (undOldRaw, undNewRaw) = core.ScaleGraphs.standingDeltaSplit(und)
    val undOld = undOldRaw.persist()
    val undNew = undNewRaw.persist()
    val (nOld, nNew) = (undOld.count(), undNew.count())
    val (base, tBase) = timed {
      val b = algo.Triangles.perNode(nodes, undOld,
        localEdgeThreshold = 0L).persist()
      b.count()
      b
    }
    val (inc, tFold) = timed {
      val f = algo.Triangles.foldDelta(base, undOld, undNew).persist()
      f.count()
      f
    }
    val (direct, tDirect) = timed {
      val d = algo.Triangles.perNode(nodes, und,
        localEdgeThreshold = 0L).persist()
      d.count()
      d
    }
    require(core.ScaleGraphs.perNodeCountDiff(inc, direct) == 0,
      "incremental != direct")
    val total = direct.agg(sum(col("n_triangles"))).collect()(0).getLong(0)
    require(total / 3 > 10000,
      s"graph too triangle-poor (${total / 3}) for a meaningful certificate")
    println(f"[geo-scale] incremental triangles: $nOld%,d standing + " +
      f"$nNew%,d delta edges -> fold $tFold%.1f s vs recount " +
      f"$tDirect%.1f s (base $tBase%.1f s), ${total / 3}%,d triangles, " +
      "incremental == direct")
    Seq(inc, base, direct).foreach { d =>
      d.unpersist(); graft.core.Checkpoints.release(d)
    }
    undNew.unpersist(); undOld.unpersist(); und.unpersist()

    println(f"""{"n_points":$nPoints,"radius_m":$radiusM,"n_pairs":$nPairs,"join_sec":$tJoin%.1f,"hotspot_sec":$tHot%.1f,"tri_fold_sec":$tFold%.1f,"tri_recount_sec":$tDirect%.1f,"tri_base_sec":$tBase%.1f}""")
    spark.stop()
  }
}
