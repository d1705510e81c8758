package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Geo

/** Invariants for the geospatial family beyond the DuckDB hash oracle:
  * the cell-banded radius join must find EXACTLY the brute-force pair
  * set (banding is an optimization, never a semantics change), the
  * plan must stay equi-join-shaped (the 100 TB property), and the
  * hotspot grid must stay bounded by the box geometry whatever the
  * input volume.
  */
class GeoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = core.Sessions.local(4, "graft-geo-test")
  private val Sf = "/root/testdata/sf0.001"

  private def custPoints = core.Tables(spark, Sf).customer.select(
    col("c_custkey").as("id"),
    Geo.xMeters(col("c_custkey")).as("x"),
    Geo.yMeters(col("c_custkey")).as("y"))

  test("cell-banded radius join ≡ brute force, pair for pair") {
    // 5 km at sf0.001's 150 points gives a healthy non-empty pair set
    // (the oracled q73 runs 1 km at the sf0.01 gate's 1500 points)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a"), col("id_b"), col("d2")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = pairs(Geo.radiusJoin(custPoints, 5000L))
    val brute = pairs(Geo.radiusJoinBrute(custPoints, 5000L))
    assert(banded.nonEmpty, "radius join found no pairs at sf0.001")
    assert(banded === brute)
    // every reported pair really is inside the radius
    banded.foreach { case (a, b, d2) =>
      assert(a < b && d2 <= 5000L * 5000L)
    }
  }

  test("radius join plans as an equi join — no cartesian, no nested loop") {
    val p = Geo.radiusJoin(custPoints, 500L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("hotspot grid is bounded by the box geometry, counts conserve") {
    val ev = core.Tables(spark, Sf).events.select(
      Geo.xMeters(col("user_id")).as("x"),
      Geo.yMeters(col("user_id")).as("y"))
    val grid = Geo.hotspots(ev, 5000L).collect()
    val maxCells = (Geo.BoxX / 5000L) * (Geo.BoxY / 5000L)
    assert(grid.length <= maxCells)
    val n = grid.map(_.getLong(grid.head.fieldIndex("n_points"))).sum
    assert(n === core.Tables(spark, Sf).events.count())
  }

  test("coordinate derivation stays inside the box and disperses keys") {
    val pts = custPoints.agg(
      min(col("x")), max(col("x")), min(col("y")), max(col("y")),
      countDistinct(col("x"), col("y")).as("nd"), count(lit(1)).as("n"))
      .collect()(0)
    assert(pts.getLong(0) >= 0L && pts.getLong(1) < Geo.BoxX)
    assert(pts.getLong(2) >= 0L && pts.getLong(3) < Geo.BoxY)
    // md5 digit windows: distinct keys land on distinct points at this
    // key count (collision odds ~n²/2·1.5e10 — negligible at 150 keys)
    assert(pts.getLong(4) === pts.getLong(5))
  }

  test("g46 incremental triangles ≡ g12 direct count, node for node") {
    def counts(name: String) =
      SparkEntry.queries(name)(spark, Sf).collect()
        .map(r => r.get(0) -> r.getLong(1)).toMap
    val inc = counts("g46_incremental_triangles")
    val full = counts("g12_triangles")
    assert(inc.nonEmpty && inc === full)
  }
}
