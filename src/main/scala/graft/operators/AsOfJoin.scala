package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the single most recent
  * right row with the same key whose timestamp is ≤ the left timestamp
  * (the time-series "last known value" join — Spark has no native
  * operator for it).
  *
  * Scale design: the naive formulation is a range join (left × right on
  * key + inequality) that Catalyst can only execute as a broadcast
  * nested-loop or a per-key sort with quadratic worst case. This
  * implementation instead UNIONS both sides, tags them, and takes one
  * window pass — `last(right_payload, ignoreNulls)` over
  * (key ORDER BY ts, tag) — which costs exactly one hash shuffle on the
  * key plus one partition-local sort, the same as a sort-merge join, and
  * never materializes a candidate pair set. At 100 TB this is the only
  * shape that survives: cost is O(|L|+|R|) shuffle + sort, independent
  * of how many right rows precede each left row.
  *
  * Equal timestamps: the right row sorts BEFORE the left row (tag order),
  * so a right event at exactly the left timestamp IS matched — the same
  * inclusive `l.ts >= r.ts` convention as DuckDB/pandas ASOF joins.
  * Ties within the right side on (key, ts) are broken arbitrarily;
  * callers needing determinism must deduplicate (key, ts) first.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val leftCols = left.columns.toSeq
    val payloadCols = rightTs +: rightCols

    val lStructT = left.select(struct(leftCols.map(col): _*).as("__l"))
      .schema("__l").dataType
    val rStructT = right.select(struct(payloadCols.map(col): _*).as("__r"))
      .schema("__r").dataType

    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__tag"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(rStructT).as("__r")): _*)
    // a null-timestamp right row would sort FIRST under ascending order
    // and then match every left row of its key — it can never legally
    // match anything (null is not ≤ any ts), so drop it up front. The
    // same goes for null KEYS: Window.partitionBy groups null keys into
    // one partition, which would make null match null — SQL equi-join
    // (and ASOF) semantics say NULL never equals NULL, so null-keyed
    // right rows are dropped too. Left rows with null timestamps or
    // null keys stay: they meet no right rows and come out with a null
    // match — preserved, not silently dropped.
    val rightFilter = keys.map(col(_).isNotNull)
      .foldLeft(col(rightTs).isNotNull)(_ && _)
    val r = right.filter(rightFilter).select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__tag"),
        lit(null).cast(lStructT).as("__l"),
        struct(payloadCols.map(col): _*).as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc_nulls_first, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(c => col(s"__l.`$c`").as(c)) ++
        payloadCols.map(c => col(s"__match.`$c`").as(s"$prefix$c")): _*)
  }
}
