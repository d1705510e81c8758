package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation tools. AQE's skew-join split
  * (spark.sql.adaptive.skewJoin) is the first line of defense and is on
  * by default in every graft session; these helpers cover the cases AQE
  * can't re-plan — e.g. a hot key whose rows exceed one executor's
  * memory even after splitting, or deterministic pre-salting for bucketed
  * pipelines.
  */
object Skew {

  /** Salted equi-join: the left (skewed) side gets a deterministic salt
    * in [0, saltFactor) derived from a unique column, the right side is
    * replicated saltFactor times, and the join key becomes
    * (key, salt) — a hot key's rows spread over saltFactor partitions
    * instead of one. Semantics identical to
    * left.join(right, keys, "inner"); replication multiplies the small
    * side only (keep saltFactor × |right| broadcastable or modest).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftUniqueCol: String, saltFactor: Int = 8): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(leftUniqueCol)), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase (salted) aggregation for a hot grouping key: partial
    * aggregate on (key, salt), then final aggregate on key. For
    * algebraic aggregates Spark's map-side partial aggregation already
    * does this implicitly; the explicit form exists for aggregates whose
    * partial state must be bounded per task (e.g. collect-like) —
    * caller supplies both phases.
    */
  def twoPhaseAgg(df: DataFrame, keys: Seq[String], uniqueCol: String,
      partial: Seq[Column], fin: Seq[Column],
      saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col(uniqueCol)), lit(saltFactor)).cast("int"))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(fin.head, fin.tail: _*)
  }
}
