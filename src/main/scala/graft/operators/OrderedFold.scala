package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Streaming per-key ordered fold for inherently sequential recurrences
  * (EWMA: acc' = α·v + (1-α)·acc, seeded with the first value).
  *
  * Execution shape: repartition(key) + sortWithinPartitions + one
  * streaming pass per partition. O(1) fold state per key, and the sort
  * is Spark's external (spillable) sort — so a pathological hot key
  * (one bot user with 10⁸ events) costs disk bandwidth, never an
  * in-memory aggregation buffer. This deliberately replaces a
  * collect_list+aggregate formulation, which materializes each key's
  * full history in a single buffer array and dies on skew at scale.
  *
  * The fold is the EXACT left fold over doubles in (o1, o2, value)
  * order — no segmented/affine reassociation (0.7ⁿ·acc + b computes
  * different IEEE doubles), because hash oracles compare the folded
  * bits. `value` as the final sort key makes the order total even if an
  * (o1, o2) pair duplicates.
  */
object OrderedFold {

  /** EWMA per key over rows ordered by (o1, o2, value); key/o1/o2 must
    * be integral, value numeric. Returns (key, n_events, ewma_raw).
    */
  def ewmaByKey(df: DataFrame, key: String, o1: String, o2: String,
      value: String, alpha: Double): DataFrame = {
    import df.sparkSession.implicits._
    val a = alpha
    val b = 1.0 - alpha
    df.select(col(key).cast("long"), col(o1).cast("long"),
        col(o2).cast("long"), col(value).cast("double"))
      .as[(Long, Long, Long, Double)]
      .repartition(col(key))
      .sortWithinPartitions(col(key), col(o1), col(o2), col(value))
      .mapPartitions { it =>
        val rows = it.buffered
        new Iterator[(Long, Long, Double)] {
          override def hasNext: Boolean = rows.hasNext
          override def next(): (Long, Long, Double) = {
            val (k, _, _, v0) = rows.next()
            var n = 1L
            var acc = v0
            while (rows.hasNext && rows.head._1 == k) {
              acc = a * rows.next()._4 + b * acc
              n += 1
            }
            (k, n, acc)
          }
        }
      }
      .toDF(key, "n_events", "ewma_raw")
  }
}
