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

    // ---- 1b. radius join under 80/20 CLUSTERED skew ---------------------
    // real geodata is heavy-tailed, not Poisson: here ~80% of points
    // pile into 20 md5-placed 8 km × 8 km hotspots (≈200k points each —
    // 3,000× the background density), ~20% disperse uniformly. The
    // cell-size policy's guarantee is that banded candidate volume
    // tracks OUTPUT volume within a constant (≈9·cell²/(πr²/2) ≈ 6 at
    // cell = r) REGARDLESS of clustering — both scale with density² —
    // so the check logs the actual candidate volume and requires the
    // ratio to hold, then re-proves exactness inside the DENSEST cell
    // (banded ≡ brute on the worst window, not just Poisson interiors).
    val skewRadius = 25L
    val hotW = 8000L
    val h2 = md5(col("id").cast("string"))
    def hx(start: Int, len: Int) =
      conv(substring(h2, start, len), 16, 10).cast("long")
    val hotIdx = hx(17, 2) % 20
    val hc = md5(concat(lit("hot:"), hotIdx.cast("string")))
    val hcx = conv(substring(hc, 1, 8), 16, 10).cast("long") %
      (Geo.BoxX - hotW)
    val hcy = conv(substring(hc, 9, 8), 16, 10).cast("long") %
      (Geo.BoxY - hotW)
    val isHot = hx(19, 2) < 205 // ≈ 80% of keys
    val skewPts = spark.range(nPoints).select(col("id"),
        when(isHot, hcx + hx(21, 4) % hotW)
          .otherwise(Geo.xMeters(col("id"))).as("x"),
        when(isHot, hcy + hx(25, 4) % hotW)
          .otherwise(Geo.yMeters(col("id"))).as("y"))
      .persist()
    skewPts.count()
    val ((skPairs, nSkPairs), tSkew) = timed {
      val p = Geo.radiusJoin(skewPts, skewRadius).persist()
      (p, p.count())
    }
    val skBad = skPairs.filter(col("d2") > skewRadius * skewRadius ||
      col("id_a") >= col("id_b")).count()
    require(skBad == 0, s"skew radius join emitted $skBad bad pairs")
    // the candidate volume the banded join actually paid: Σ over
    // adjacent cell pairs of |probe cell|·|build cell|
    val bld = Geo.withCells(skewPts, skewRadius)
      .groupBy("cx", "cy").agg(count(lit(1)).as("nb"))
    val offs = Seq(-1L, 0L, 1L)
    val candVol = bld
      .withColumn("ox", explode(typedLit(offs)))
      .withColumn("oy", explode(typedLit(offs)))
      .select((col("cx") + col("ox")).as("cx"),
        (col("cy") + col("oy")).as("cy"), col("nb").as("na"))
      .join(bld, Seq("cx", "cy"))
      .agg(sum(col("na") * col("nb"))).head().getLong(0)
    val candRatio = candVol.toDouble / math.max(nSkPairs, 1L)
    require(candRatio < 25.0,
      f"clustered skew broke the cell policy: $candVol%,d candidates " +
        f"for $nSkPairs%,d pairs ($candRatio%.1f×)")
    // exactness at the DENSEST 1 km cell (deep inside a hotspot)
    val dens = Geo.hotspots(skewPts, 1000L)
      .orderBy(desc("n_points"), asc("cx"), asc("cy")).head()
    val (wx, wy) = (dens.getLong(dens.fieldIndex("cx")) * 1000L,
      dens.getLong(dens.fieldIndex("cy")) * 1000L)
    val inHotWin = (x: org.apache.spark.sql.Column,
        y: org.apache.spark.sql.Column) =>
      x >= wx && x < wx + 1000L && y >= wy && y < wy + 1000L
    val winPts = skewPts.filter(inHotWin(col("x"), col("y"))).persist()
    val nWin = winPts.count()
    val bruteHot = Geo.radiusJoinBrute(winPts, skewRadius)
      .select("id_a", "id_b", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bandedHot = skPairs
      .filter(inHotWin(col("x_a"), col("y_a")) &&
        inHotWin(col("x_b"), col("y_b")))
      .select("id_a", "id_b", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    require(bandedHot == bruteHot,
      s"densest window: banded ${bandedHot.size} != brute ${bruteHot.size}")
    winPts.unpersist(); skPairs.unpersist(); skewPts.unpersist()
    println(f"[geo-scale] clustered skew: $nPoints%,d points (80%% in 20 " +
      f"hotspots), r=$skewRadius m -> $nSkPairs%,d pairs in $tSkew%.1f s; " +
      f"candidates $candVol%,d (${candRatio}%.1f× output, policy holds); " +
      f"densest 1 km cell ($nWin%,d pts): banded == brute " +
      f"(${bruteHot.size}%,d pairs)")

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

    println(f"""{"n_points":$nPoints,"radius_m":$radiusM,"n_pairs":$nPairs,"join_sec":$tJoin%.1f,"skew_pairs":$nSkPairs,"skew_join_sec":$tSkew%.1f,"skew_cand_ratio":$candRatio%.1f,"hotspot_sec":$tHot%.1f,"tri_fold_sec":$tFold%.1f,"tri_recount_sec":$tDirect%.1f,"tri_base_sec":$tBase%.1f}""")
    spark.stop()
  }
}
