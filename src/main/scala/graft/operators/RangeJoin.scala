package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: pair every left row, carrying a time interval
  * [lo, hi], with the right rows whose timestamp falls inside it —
  * another operator Spark lacks natively (a raw `r.ts BETWEEN l.lo AND
  * l.hi` predicate plans as broadcast nested-loop or cartesian).
  *
  * Scale design: the published "binned interval join" trick (used by the
  * Databricks range-join hint and interval-join implementations in
  * stream processors): quantize time into fixed buckets of
  * `bucketSeconds`, explode each left interval to the buckets it spans,
  * map each right row to its single bucket, then EQUI-join on
  * (keys, bucket) and re-filter with the exact predicate. The inequality
  * join becomes a hash join whose fan-out is |interval|/bucket + 1 per
  * left row — pick bucketSeconds ≈ the typical interval length so the
  * explode factor stays ~2. All Catalyst machinery (AQE, skew split,
  * broadcast promotion) applies to the equi-join as usual.
  *
  * Left and right must not share column names other than `keys` (rename
  * before calling); both bound columns are inclusive.
  */
object RangeJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftLo: String, leftHi: String, rightTs: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val w = lit(bucketSeconds.toDouble)
    // TIMESTAMP_NTZ has no direct cast to double — route it through the
    // session-UTC TimestampType first (value-identical under a UTC
    // session) so callers feeding un-normalized columns still plan
    def bucketOf(df: DataFrame, c: String) = {
      val base = df.schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampNTZType =>
          col(c).cast(org.apache.spark.sql.types.TimestampType)
        case _ => col(c)
      }
      floor(base.cast("double") / w).cast("long")
    }

    val lb = left.withColumn("__b",
      explode(sequence(bucketOf(left, leftLo), bucketOf(left, leftHi))))
    val rb = right.withColumn("__b", bucketOf(right, rightTs))

    lb.join(rb, keys :+ "__b")
      .filter(col(rightTs) >= col(leftLo) && col(rightTs) <= col(leftHi))
      .drop("__b")
  }
}
