package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (z-order) interleaving for multi-dimensional data clustering
  * (q58) — the layout tool behind "OPTIMIZE ZORDER BY" in lakehouse
  * engines: sort/partition 100 TB by the bit-interleaving of two query
  * dimensions and a rectangular predicate prunes on ONE derived column,
  * because z is monotone in each coordinate while the other is held
  * fixed (increasing x changes only the even-position bits, upward) —
  * so every point of the box [xlo,xhi]×[ylo,yhi] has
  * z ∈ [z(xlo,ylo), z(xhi,yhi)], and a z-range partition filter is a
  * correct (superset) prune for any box.
  *
  * Three bit-exact twins of the same arithmetic: the Column form (plain
  * shiftleft/and/or built-ins — codegen'd, no UDF), the Long form (for
  * driver-side bound computation), and the SQL form (so the z values
  * themselves hash-verify in the DuckDB oracle).
  */
object ZOrder {

  /** Bits per coordinate for the q58 layout: day index and quantity both
    * fit 12 bits; z < 2²⁴.
    */
  val Bits = 12

  /** Partition-bucket shift: zbucket = z >> 18 → at most 64 directories
    * whatever the SF (the bucket granularity is a LAYOUT choice — more
    * buckets = finer pruning, more small files).
    */
  val BucketShift = 18

  /** Column-algebra interleave: x's bit i → position 2i, y's → 2i+1. */
  def interleave(x: Column, y: Column, bits: Int = Bits): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Driver-side twin for computing prune bounds from box corners. */
  def interleaveLong(x: Long, y: Long, bits: Int = Bits): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  /** SQL twin over integer expressions (DuckDB `>> << & |`). */
  def interleaveSql(x: String, y: String, bits: Int = Bits): String =
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) | (((($y) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
}
