package graft.queries

import org.apache.spark.sql.functions._
import graft.GQ
import graft.core.Tables
import graft.streaming.EventStreams

/** Geospatial surface: grid-bucketed radius join, density hotspots, and
  * a streaming hotspot twin. Coordinates are deterministic integer
  * planar points derived from entity keys (operators/Geo.scala), so both
  * engines compute the identical exact geometry — the operators' shapes
  * (cell-banded join, bounded-cell aggregation) are the real subject.
  */
object Geo {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir)

  private val ops = graft.operators.Geo

  /** Shared oracle for the hotspot contract (batch + streamed twin):
    * event density per 5 km cell, top 10 by count with (cx, cy) as the
    * deterministic tiebreak.
    */
  private val hotspotSql: String =
    s"""WITH pts AS (
       |  SELECT ${ops.xSql("user_id")} AS x, ${ops.ySql("user_id")} AS y
       |  FROM events),
       |cells AS (
       |  SELECT x // 5000 AS cx, y // 5000 AS cy, count(*) AS n_points,
       |    CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y
       |  FROM pts GROUP BY 1, 2)
       |SELECT cx, cy, n_points, sum_x, sum_y FROM cells
       |ORDER BY n_points DESC, cx, cy LIMIT 10""".stripMargin

  val queries: Seq[GQ] = Seq(

    // Grid-bucketed radius join: customer pairs within 1 km, rolled up
    // by market-segment pair. The engine side goes through the 3×3
    // cell-neighborhood equi join (never n²); the oracle replays the
    // same banding in SQL. sum(d2) is an exact integer, so the hash
    // pins every pair's membership AND geometry.
    GQ("q73_geo_radius_join",
      (s, dir) => {
        val pts = t(s, dir).customer.select(
          col("c_custkey").as("id"), col("c_mktsegment").as("seg"),
          ops.xMeters(col("c_custkey")).as("x"),
          ops.yMeters(col("c_custkey")).as("y"))
        ops.radiusJoin(pts, 1000L)
          .select(least(col("seg_a"), col("seg_b")).as("seg_lo"),
            greatest(col("seg_a"), col("seg_b")).as("seg_hi"), col("d2"))
          .groupBy(col("seg_lo"), col("seg_hi"))
          .agg(count(lit(1)).as("n_pairs"), sum(col("d2")).as("sum_d2"))
      },
      Some(s"""WITH pts AS (
             |  SELECT c_custkey AS id, c_mktsegment AS seg,
             |    ${ops.xSql("c_custkey")} AS x, ${ops.ySql("c_custkey")} AS y
             |  FROM customer),
             |cells AS (SELECT *, x // 1000 AS cx, y // 1000 AS cy FROM pts),
             |offs AS (SELECT * FROM (VALUES (-1), (0), (1)) v(o)),
             |probe AS (
             |  SELECT id, seg, x, y, cx + ox.o AS pcx, cy + oy.o AS pcy
             |  FROM cells CROSS JOIN offs ox CROSS JOIN offs oy),
             |pairs AS (
             |  SELECT a.seg AS sa, b.seg AS sb,
             |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
             |  FROM probe a JOIN cells b
             |    ON a.pcx = b.cx AND a.pcy = b.cy AND a.id < b.id)
             |SELECT least(sa, sb) AS seg_lo, greatest(sa, sb) AS seg_hi,
             |  count(*) AS n_pairs, CAST(sum(d2) AS BIGINT) AS sum_d2
             |FROM pairs WHERE d2 <= 1000000 GROUP BY 1, 2""".stripMargin)),

    // Density hotspots: event volume per 5 km grid cell, top 10. The
    // aggregate output is bounded by the grid (20×30 cells max), so the
    // top-k runs over a constant-size relation at any stream volume.
    GQ("q74_geo_hotspots",
      (s, dir) => {
        val pts = t(s, dir).events.select(
          ops.xMeters(col("user_id")).as("x"),
          ops.yMeters(col("user_id")).as("y"))
        ops.hotspots(pts, 5000L)
          .orderBy(col("n_points").desc, col("cx"), col("cy"))
          .limit(10)
          .select(col("cx"), col("cy"), col("n_points"),
            col("sum_x"), col("sum_y"))
      },
      Some(hotspotSql)),

    // REAL streaming twin of q74: the same bounded-cell density grid
    // maintained incrementally over the event file stream — counts and
    // coordinate sums are mergeable, so micro-batch increments converge
    // on exactly the batch grid (state ≤ 600 cells by construction).
    // Streamed ≡ batch ≡ SQL in one hash.
    GQ("stream_geo_hotspots",
      (s, dir) => {
        val grid = Streaming.runToMemory(s, "graft_stream_geo", "complete")(
          ops.hotspots(
            EventStreams.readEvents(s, s"$dir/events.parquet").select(
              ops.xMeters(col("user_id")).as("x"),
              ops.yMeters(col("user_id")).as("y")), 5000L))
        grid.orderBy(col("n_points").desc, col("cx"), col("cy")).limit(10)
          .select(col("cx"), col("cy"), col("n_points"),
            col("sum_x"), col("sum_y"))
      },
      Some(hotspotSql)),

    // stream_geo_hotspots' UPDATE-MODE twin — third member of the
    // changelog-emission family (after stream_hll_update and
    // stream_cms_update), and the first whose per-key state is a TUPLE
    // (count, sum_x, sum_y) rather than a single monotone value. The
    // fold generalizes: any arriving point in a cell strictly increases
    // its count, so every update-mode emission of a cell carries a
    // strictly larger count than the previous one — argmax-by-count per
    // cell (one struct-max, count leading) therefore reconstructs the
    // latest CONSISTENT (count, sum_x, sum_y) snapshot without assuming
    // the sums themselves are monotone. Events staged as 4 chunk files,
    // one per trigger, so the driver run itself fires several genuine
    // update emissions; q74's oracle verbatim — changelog-fold ≡
    // complete ≡ batch ≡ SQL in one hash.
    GQ("stream_geo_update",
      (s, dir) => {
        val changelog = Streaming.runToMemory(s, "graft_stream_geou",
          "update")(
          ops.hotspots(
            EventStreams.readEvents(s, s"$dir/events.parquet",
              maxFilesPerTrigger = Some(1), chunks = 4).select(
              ops.xMeters(col("user_id")).as("x"),
              ops.yMeters(col("user_id")).as("y")), 5000L))
        val grid = changelog.groupBy("cx", "cy")
          .agg(max(struct(col("n_points"), col("sum_x"), col("sum_y")))
            .as("m"))
          .select(col("cx"), col("cy"), col("m.n_points").as("n_points"),
            col("m.sum_x").as("sum_x"), col("m.sum_y").as("sum_y"))
        grid.orderBy(col("n_points").desc, col("cx"), col("cy")).limit(10)
          .select(col("cx"), col("cy"), col("n_points"),
            col("sum_x"), col("sum_y"))
      },
      Some(hotspotSql))
  )
}
