package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed geospatial operators over planar integer coordinates.
  *
  * The synthetic tables carry no geo columns, so points are DERIVED
  * deterministically from an integer key: two independent 32-bit md5
  * digit windows (the CmsOracle / SimOracle cross-engine hash idiom —
  * a multiplicative congruential scramble was tried first and rejected:
  * it lays keys on a lattice whose minimum pair distance exceeds any
  * useful radius) mapped into a 100 km × 150 km plane with 1 m
  * resolution. Everything downstream is
  * exact 64-bit integer arithmetic — squared distances, cell ids — so
  * the Spark engine and the DuckDB oracle agree bit-for-bit (no trig,
  * no float rounding at the radius boundary). At city scale a planar
  * projection (UTM-style) is the standard GIS practice; swapping in
  * haversine over real lat/lon changes only the distance expression,
  * not the bucketing shape.
  *
  * Scale shape (100 TB thinking): the radius join buckets points into
  * cells whose edge equals the search radius, expands the LEFT side to
  * its 3×3 cell neighborhood, and equi-joins on the cell id — candidate
  * volume is Σ_cells |cell|·|neighborhood|, never n². Cell occupancy is
  * bounded by density × cell area, so the join is skew-proof by
  * construction; the 9× left-side expansion is map-side (a Generate,
  * no shuffle). This is the same banding discipline as the MinHash/
  * SimHash dedup family (llm/Dedup.scala), applied to 2-D space.
  */
object Geo {

  /** Plane extents in metres (100 km × 150 km). */
  val BoxX = 100000L
  val BoxY = 150000L

  /** Deterministic planar x/y in metres from an integer key: hex window
    * [1,8] of md5(key) for x (8 digits), [9,16] for y — 32 bits of
    * entropy each,
    * exact integer arithmetic after the parse, so Spark and DuckDB agree
    * bit-for-bit (both emit lowercase-hex md5 of the identical decimal
    * string rendering of the key).
    */
  def xMeters(key: Column): Column = hex32(key, 1) % lit(BoxX)
  def yMeters(key: Column): Column = hex32(key, 9) % lit(BoxY)

  private def hex32(key: Column, start: Int): Column =
    conv(substring(md5(key.cast("string")), start, 8), 16, 10).cast("long")

  /** SQL fragments of the same derivation for the DuckDB oracle
    * (positional hex-digit parse — DuckDB has no base-16 conv).
    */
  def xSql(key: String): String = s"(${hex32Sql(key, 1)} % $BoxX)"
  def ySql(key: String): String = s"(${hex32Sql(key, 9)} % $BoxY)"

  private def hex32Sql(key: String, start: Int): String =
    (0 until 8).map { i =>
      val place = 1L << (4 * (7 - i))
      s"(strpos('0123456789abcdef', substr(md5(CAST($key AS VARCHAR)), ${start + i}, 1)) - 1) * $place"
    }.mkString("(", " + ", ")")

  /** Attach integer cell ids with edge `cellM` metres. Coordinates are
    * non-negative by construction, so truncating `div` == floor division
    * (DuckDB `//`) — negative-operand divergence can't happen.
    */
  def withCells(pts: DataFrame, cellM: Long): DataFrame =
    pts.withColumn("cx", expr(s"x div $cellM"))
      .withColumn("cy", expr(s"y div $cellM"))

  /** All unordered point pairs within `radiusM` metres (Euclidean).
    * Input needs columns (id, x, y) plus any payload; output carries
    * both sides' payloads suffixed _a/_b plus the exact squared
    * distance `d2`. Each qualifying pair is emitted exactly once:
    * the left side expands to its 9-cell neighborhood, the right side
    * keeps its true cell, and `id_a < id_b` keeps one orientation.
    */
  def radiusJoin(pts: DataFrame, radiusM: Long): DataFrame = {
    val cells = withCells(pts, radiusM)
    val offsets = Seq(-1L, 0L, 1L)
    val probe = cells
      .withColumn("ox", explode(typedLit(offsets)))
      .withColumn("oy", explode(typedLit(offsets)))
      .withColumn("cx", col("cx") + col("ox"))
      .withColumn("cy", col("cy") + col("oy"))
      .drop("ox", "oy")
    val a = probe.columns.foldLeft(probe)((d, c) => d.withColumnRenamed(c, c + "_a"))
    val b = cells.columns.foldLeft(cells)((d, c) => d.withColumnRenamed(c, c + "_b"))
    a.join(b, col("cx_a") === col("cx_b") && col("cy_a") === col("cy_b") &&
        col("id_a") < col("id_b"))
      .withColumn("d2",
        (col("x_a") - col("x_b")) * (col("x_a") - col("x_b")) +
          (col("y_a") - col("y_b")) * (col("y_a") - col("y_b")))
      .filter(col("d2") <= lit(radiusM * radiusM))
      .drop("cx_a", "cy_a", "cx_b", "cy_b")
  }

  /** Brute-force reference for specs: the same pair set via an id-only
    * cross pairing — O(n²), test-scale only.
    */
  def radiusJoinBrute(pts: DataFrame, radiusM: Long): DataFrame = {
    val a = pts.columns.foldLeft(pts)((d, c) => d.withColumnRenamed(c, c + "_a"))
    val b = pts.columns.foldLeft(pts)((d, c) => d.withColumnRenamed(c, c + "_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("d2",
        (col("x_a") - col("x_b")) * (col("x_a") - col("x_b")) +
          (col("y_a") - col("y_b")) * (col("y_a") - col("y_b")))
      .filter(col("d2") <= lit(radiusM * radiusM))
  }

  /** Grid-density hotspots: count + exact centroid numerators per
    * `cellM` cell. One map-side cell assignment + one keyed agg; the
    * cell count is bounded by (BoxX/cellM)·(BoxY/cellM) regardless of
    * input volume, so the post-agg top-k is trivially cheap.
    */
  def hotspots(pts: DataFrame, cellM: Long): DataFrame =
    withCells(pts, cellM)
      .groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"))
}
