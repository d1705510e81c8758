package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic count-min sketch as plain DataFrame algebra (q53 /
  * stream_heavy_hitters). Cormode–Muthukrishnan's point-query sketch,
  * built so the whole thing — not just its error bound — replays in a
  * SQL oracle: the depth hash rows are md5-derived (engine-portable,
  * like every hash in this repo), the cells are exact integer counts,
  * and estimates are min-over-rows.
  *
  * Why this shape at 100 TB:
  *  - the sketch is ONE groupBy over (row, bucket) — Spark's map-side
  *    partial aggregation bounds per-task state at depth×width cells
  *    regardless of corpus size, and the shuffle moves at most that
  *    many rows per task;
  *  - cells are plain sums, so the sketch is MERGEABLE: partition
  *    sketches, day sketches, or micro-batch increments add up to the
  *    corpus sketch — which is exactly what a streaming complete-mode
  *    aggregation over the same columns computes incrementally
  *    (stream_heavy_hitters pins streamed ≡ batch ≡ oracle in one
  *    hash);
  *  - point estimates touch depth cells per key through a broadcast
  *    of the (tiny) sketch — no second corpus pass.
  *
  * Width 1024 from 3 md5 hex digits: 16³ = 4096 is a multiple of
  * 1024, so the mod is EXACTLY uniform, and only digits that matter
  * are parsed (16³ ≡ 0 mod 1024 makes longer prefixes pointless).
  */
object CountMin {

  val Depth = 4
  val Width = 1024

  /** Row-j bucket of a token: first 3 md5 hex digits of "j:tok" mod
    * Width. Codegen'd built-ins only (md5/conv/substring).
    */
  def bucket(j: Column, tok: Column): Column =
    conv(substring(md5(concat(j.cast("string"), lit(":"), tok)),
      1, 3), 16, 10).cast("long") % Width

  /** The whitespace token stream of a documents frame (batch or
    * streaming — unified API).
    */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")

  /** One row per hash function, exploded map-side. */
  private def rowsCol: Column =
    explode(array((0 until Depth).map(lit): _*)).as("j")

  /** The sketch: (j, bucket, cnt), ≤ Depth×Width rows. On a streaming
    * input this is a complete-mode aggregation whose state is bounded
    * by construction — no watermark needed.
    */
  def sketch(toks: DataFrame): DataFrame =
    toks.select(col("tok"), rowsCol)
      .select(col("j"), bucket(col("j"), col("tok")).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))

  /** Point estimates for the keys of `top` (tok, n_exact): probes the
    * sketch's Depth cells per key via a broadcast join, est = min.
    */
  def estimates(top: DataFrame, sk: DataFrame): DataFrame =
    top.select(col("tok"), col("n_exact"), rowsCol)
      .withColumn("bucket", bucket(col("j"), col("tok")))
      .join(broadcast(sk), Seq("j", "bucket"))
      .groupBy("tok", "n_exact").agg(min(col("cnt")).as("n_est"))
      .select("tok", "n_exact", "n_est")
}
