package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog distinct-count sketch as plain DataFrame
  * algebra (q57 / stream_hll_distinct) — the cardinality twin of
  * [[CountMin]]'s frequency sketch. Flajolet et al.'s estimator, built
  * so the ESTIMATE itself (not just its error bound) replays bit-exactly
  * in a SQL oracle:
  *
  *  - the register index is the first 2 md5 hex digits (16² = 256 = m,
  *    exactly uniform, no mod bias);
  *  - the rank ρ = 1 + leading-zero-bits of the NEXT 8 hex digits
  *    (a 32-bit value) is computed by STRING algebra — leading-zero hex
  *    digits via regexp, the first non-zero nibble's zero bits via CASE —
  *    never via log2/floor, whose libm rounding is engine-dependent;
  *  - the harmonic sum Σ 2^−ρ is a sum of dyadic rationals with exponent
  *    range 33 < 53, so it is EXACT in IEEE double regardless of
  *    summation order — the one float sum in this repo that is
  *    legitimately order-independent;
  *  - the final estimate α·m²/S is then a single correctly-rounded
  *    division of two doubles both engines hold bit-equal, so even the
  *    approximate value hash-verifies (the q53/llm_pq_topk pattern).
  *
  * Why this shape at 100 TB: the register table is ONE groupBy(bucket)
  * .agg(max(ρ)) — map-side partial max bounds per-task state at m = 256
  * rows whatever the corpus, and max is MERGEABLE, so partition sketches,
  * day sketches, or streaming micro-batch increments converge on exactly
  * the corpus sketch (stream_hll_distinct pins streamed ≡ batch ≡ SQL in
  * one hash). Estimating a distinct count this way costs one scan and a
  * 256-row reduce where COUNT(DISTINCT) costs a full shuffle of the key
  * space.
  *
  * The hash contract carries the RAW estimator only. The small-range
  * (linear counting) correction needs ln(), whose last-ulp rounding
  * differs across libm implementations, so [[smallRangeEstimate]] exists
  * Scala-side for real use and is spec-tested (AccuracySpec), but driver
  * rows only sketch keys with ≥ 2.5·m distinct values where the raw
  * estimator is the published-accuracy regime.
  */
object HyperLogLog {

  /** Register count m = 256: 2 exact hex digits, σ ≈ 1.04/√m ≈ 6.5%. */
  val M = 256

  /** α₂₅₆·m², embedded as ONE double in both engines (the Spark literal
    * and the SQL literal are this value's decimal string, so both parse
    * to the identical IEEE double).
    */
  val AlphaM2: Double = 0.7213 / (1.0 + 1.079 / M) * M * M

  /** (bucket, rho) of a key column. `key` must already be a string (the
    * caller casts — the cast is part of the hash contract).
    */
  def bucketAndRho(key: Column): (Column, Column) = {
    val h = md5(key)
    val bucket = conv(substring(h, 1, 2), 16, 10).cast("int")
    val hex8 = substring(h, 3, 8)
    // leading-zero hex digits, then the first non-zero nibble's zero bits
    val z = length(regexp_extract(hex8, "^(0*)", 1))
    val c = hex8.substr(z + lit(1), lit(1))
    val nib = when(c === "1", 3)
      .when(c.isin("2", "3"), 2)
      .when(c.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    val rho = when(z === 8, 33).otherwise(z * 4 + nib + 1)
    (bucket, rho)
  }

  /** The sketch: (bucket, r) with r = max ρ, ≤ m rows. On a streaming
    * input this is a complete-mode max aggregation whose state is
    * bounded at m rows by construction — no watermark needed.
    */
  def sketch(keys: DataFrame, key: Column): DataFrame = {
    val (bucket, rho) = bucketAndRho(key)
    keys.select(bucket.as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("r"))
  }

  /** THE harmonic sum — the one expression the whole cross-engine hash
    * contract rests on, defined once and shared by every estimate
    * (estimate / estimateBy / smallRangeEstimate; HllOracle mirrors it
    * in SQL via `HllOracle.estSql`). Absent registers contribute
    * 2⁰ = 1; the coalesce makes an EMPTY register frame (no keys seen
    * yet) the all-absent sum S = m rather than NULL.
    */
  private def harmonicSum: Column =
    (coalesce(sum(lit(1.0) / expr("shiftleft(cast(1 as bigint), r)")),
      lit(0.0)) + (lit(M) - count(lit(1))) * 1.0)

  /** Raw HLL estimate from a register frame: one row, `n_est` BIGINT. */
  def estimate(registers: DataFrame): DataFrame =
    registers.agg(harmonicSum.as("s"))
      .select(floor(lit(AlphaM2) / col("s")).cast("long").as("n_est"))

  /** Grouped sketch: (groupCols*, bucket, r) — one m-row register set
    * per group, still one map-side-combined groupBy.
    */
  def sketchBy(keys: DataFrame, key: Column, groupCols: Seq[String])
      : DataFrame = {
    val (bucket, rho) = bucketAndRho(key)
    keys.select(groupCols.map(col) :+ bucket.as("bucket") :+
        rho.as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("r"))
  }

  /** Per-group raw estimate from a grouped register frame. */
  def estimateBy(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers.groupBy(groupCols.map(col): _*)
      .agg(harmonicSum.as("s"))
      .select(groupCols.map(col) :+
        floor(lit(AlphaM2) / col("s")).cast("long").as("n_est"): _*)

  /** Per-group raw estimate + occupied-register count in ONE
    * aggregation — `n_est` is [[estimateBy]]'s expression verbatim,
    * `n_occ` the group's register-row count. One action where
    * estimate-then-count would take two (the HyperANF readoff shape:
    * 7 radii × 2 actions was pure scheduling overhead at slice scale).
    */
  def estimateOccBy(registers: DataFrame, groupCols: Seq[String])
      : DataFrame =
    registers.groupBy(groupCols.map(col): _*)
      .agg(harmonicSum.as("s"), count(lit(1)).as("n_occ"))
      .select(groupCols.map(col) :+
        floor(lit(AlphaM2) / col("s")).cast("long").as("n_est") :+
        col("n_occ"): _*)

  /** Linear-counting small-range correction (E ≤ 2.5m with empty
    * registers → m·ln(m/V)). Scala-side only: ln() keeps this out of
    * the cross-engine hash contract (see class doc).
    */
  def smallRangeEstimate(registers: DataFrame): DataFrame = {
    val est = registers.agg(harmonicSum.as("s"),
        (lit(M) - count(lit(1))).cast("double").as("v"))
      .select((lit(AlphaM2) / col("s")).as("e"), col("v"))
    est.select(
      when(col("e") <= 2.5 * M && col("v") > 0,
        floor(lit(M.toDouble) * log(lit(M.toDouble) / col("v"))))
        .otherwise(floor(col("e")))
        .cast("long").as("n_est"))
  }
}
