package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}

/** Scale sanity for the join operators Spark lacks natively (the
  * DistributedScaleCheck pattern applied to AsOfJoin/RangeJoin): run at
  * tens of millions of rows — 1000× the sf0.1 events table — and
  * validate exactness against the brute-force formulation on a sampled
  * key subset (the full brute force is quadratic and infeasible, which
  * is the point of these operators).
  *
  * Usage: runMain graft.OperatorScaleCheck [nRight] [nKeys]
  * Defaults: 20M right rows / 2M left rows over 500k keys.
  */
object OperatorScaleCheck {

  def main(args: Array[String]): Unit = {
    val nRight = args.headOption.map(_.toLong).getOrElse(20_000_000L)
    val nLeft = nRight / 10
    val nKeys = args.lift(1).map(_.toLong).getOrElse(500_000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic pseudo-random timestamps from the row id (no rand():
    // reruns and the sampled-key validation must see identical data;
    // xxhash64 avoids ANSI long-overflow that a multiplicative hash hits)
    val left = spark.range(nLeft).select(col("id").as("l_id"),
      pmod(col("id"), lit(nKeys)).as("k"),
      pmod(xxhash64(col("id"), lit(1)), lit(1L << 40)).as("ts"))
      .persist()
    val right = spark.range(nRight).select(col("id").as("r_id"),
      pmod(xxhash64(col("id"), lit(2)), lit(nKeys)).as("k"),
      pmod(xxhash64(col("id"), lit(3)), lit(1L << 40)).as("ts"))
      .persist()
    println(s"[scale] left=${left.count()} right=${right.count()} keys=$nKeys")

    // ---- as-of join ----------------------------------------------------
    var t0 = System.nanoTime()
    val asof = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts",
      Seq("r_id"))
    val nAsof = asof.count()
    val asofSec = (System.nanoTime() - t0) / 1e9
    println(f"[scale] asof: $nAsof rows in $asofSec%.1f s (one shuffle)")
    require(nAsof == nLeft, s"as-of must preserve every left row: $nAsof")

    // sampled-key exactness: brute force on 5 keys only. The right side
    // is deduplicated on (k, ts) first: the operator's window breaks
    // (k, ts) ties arbitrarily while the brute force's max(struct) is
    // deterministic, so a duplicate-timestamp collision would flake the
    // comparison without being a real disagreement. The dedup itself
    // must be DETERMINISTIC across the separate fast/brute jobs
    // (dropDuplicates keeps a fetch-order-dependent row), hence max().
    val sampleKeys = (0L until 5L).map(_ * (nKeys / 7) + 1)
    val lS = left.filter(col("k").isin(sampleKeys: _*))
    val rS = right.filter(col("k").isin(sampleKeys: _*))
      .groupBy("k", "ts").agg(max(col("r_id")).as("r_id"))
    val fast = AsOfJoin.backward(lS, rS, Seq("k"), "ts", "ts", Seq("r_id"))
      .select(col("l_id"), col("asof_r_id")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val brute = lS.as("l").join(rS.as("r"),
        col("l.k") === col("r.k") && col("r.ts") <= col("l.ts"), "left_outer")
      .groupBy(col("l.l_id").as("l_id"))
      .agg(max(struct(col("r.ts"), col("r.r_id"))).as("m"))
      .select(col("l_id"), col("m.r_id")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    require(fast == brute, "as-of sampled-key mismatch vs brute force")
    println(s"[scale] asof: sampled-key brute-force check OK (${fast.size} rows)")

    // ---- range join ----------------------------------------------------
    // window sized so the expected pair count is substantial
    // (~nLeft × perKeyRight × window/2^40 ≈ 600k at the defaults)
    val window = 1L << 33
    val lInt = left.select(col("l_id"), col("k"), col("ts").as("lo"),
      (col("ts") + window).as("hi"))
    t0 = System.nanoTime()
    val ranged = RangeJoin.intervalJoin(lInt, right, Seq("k"),
      "lo", "hi", "ts", bucketSeconds = window)
    val nRange = ranged.count()
    val rangeSec = (System.nanoTime() - t0) / 1e9
    println(f"[scale] range: $nRange pairs in $rangeSec%.1f s (equi-join plan)")

    val fastR = RangeJoin.intervalJoin(
        lInt.filter(col("k").isin(sampleKeys: _*)), rS, Seq("k"),
        "lo", "hi", "ts", bucketSeconds = window)
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteR = lInt.filter(col("k").isin(sampleKeys: _*)).as("l")
      .join(rS.as("r"), col("l.k") === col("r.k") &&
        col("r.ts") >= col("l.lo") && col("r.ts") <= col("l.hi"))
      .select(col("l.l_id"), col("r.r_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    require(fastR == bruteR, "range sampled-key mismatch vs brute force")
    println(s"[scale] range: sampled-key brute-force check OK (${fastR.size} pairs)")

    // ---- distributed prefix sum ---------------------------------------
    // 20M-row exact running total through the two-pass bucket design; a
    // single-partition window at this size would serialize the whole
    // dataset through one task. Validated two ways: the global invariant
    // (max running_total = total weight) and sampled-point exactness
    // against brute-force filter-sums.
    val base = spark.range(nRight).select(col("id"),
      pmod(xxhash64(col("id"), lit(4)), lit(100L)).as("w"))
    t0 = System.nanoTime()
    val cum = graft.operators.PrefixSum.running(base, "id", "w", 64)
    val agg0 = cum.agg(count(lit(1)), max("running_total")).head()
    val (nCum, maxCum) = (agg0.getLong(0), agg0.getLong(1))
    val cumSec = (System.nanoTime() - t0) / 1e9
    println(f"[scale] prefix: $nCum rows in $cumSec%.1f s (64 buckets)")
    val totalW = base.agg(sum("w")).head().getLong(0)
    require(nCum == nRight, s"prefix sum dropped rows: $nCum")
    require(maxCum == totalW,
      s"prefix total $maxCum != weight total $totalW")
    val samples = (1L to 5L).map(_ * (nRight / 7))
    val gotP = cum.filter(col("id").isin(samples: _*))
      .select("id", "running_total").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // all five oracle sums in ONE conditional-sum pass over base (five
    // separate filter+agg jobs would rescan 20M rows five times)
    val wantRow = base.agg(
      sum(when(col("id") <= samples.head, col("w"))),
      samples.tail.map(k => sum(when(col("id") <= k, col("w")))): _*).head()
    val wantP = samples.zipWithIndex
      .map { case (k, i) => k -> wantRow.getLong(i) }.toMap
    require(gotP == wantP, "prefix sampled-point mismatch vs brute force")
    graft.core.Checkpoints.release(cum)
    println(s"[scale] prefix: sampled-point brute-force check OK (${gotP.size} points)")

    // ---- per-key ordered EWMA fold: hot-key boundedness ----------------
    // One bot user owns every 10th event (2M rows at the default — 400×
    // the average key); the streaming fold must complete with O(1) fold
    // state, and its doubles must be BIT-identical to the collect_list+
    // aggregate formulation it replaced (same left fold, same order).
    val hotShare = 10L
    val ev = spark.range(nRight).select(
      when(pmod(col("id"), lit(hotShare)) === 0, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(5)), lit(nKeys)) + 1)
        .as("user_id"),
      col("id").as("tsu"), col("id").as("event_id"),
      (pmod(xxhash64(col("id"), lit(6)), lit(1000L)).cast("double")
        / lit(1000.0)).as("value"))
    t0 = System.nanoTime()
    val folded = graft.operators.OrderedFold
      .ewmaByKey(ev, "user_id", "tsu", "event_id", "value", alpha = 0.3)
      .persist()
    val aggE = folded.agg(count(lit(1)), sum("n_events")).head()
    val (nUsers, nEvTot) = (aggE.getLong(0), aggE.getLong(1))
    val ewmaSec = (System.nanoTime() - t0) / 1e9
    println(f"[scale] ewma: $nUsers users / $nEvTot events in $ewmaSec%.1f s" +
      " (streaming fold, hot user = 10% of stream)")
    require(nEvTot == nRight, s"ewma fold dropped events: $nEvTot")
    val hotN = folded.filter(col("user_id") === 0L)
      .select("n_events").head().getLong(0)
    require(hotN == nRight / hotShare, s"hot user event count: $hotN")
    // bit-exactness vs the buffer-based formulation, on the hot user AND
    // five ordinary users (the buffered form is fine at check scale —
    // at 10⁸ it would not be, which is exactly why the operator exists)
    val checkUsers = 0L +: (1L to 5L).map(_ * (nKeys / 11) + 1)
    val evS = ev.filter(col("user_id").isin(checkUsers: _*))
    val bruteE = evS.groupBy("user_id")
      .agg(aggregate(
        transform(
          array_sort(collect_list(
            struct(col("tsu"), col("event_id"), col("value")))),
          e => e.getField("value")),
        lit(null).cast("double"),
        (acc, x) => when(acc.isNull, x)
          .otherwise(lit(0.3) * x + lit(0.7) * acc)).as("ewma_raw"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fastE = folded.filter(col("user_id").isin(checkUsers: _*))
      .select("user_id", "ewma_raw").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    require(fastE == bruteE,
      s"ewma fold mismatch vs buffered formulation: $fastE vs $bruteE")
    folded.unpersist()
    println(s"[scale] ewma: hot-user + sampled bit-exactness OK (${fastE.size} keys)")

    println(f"""{"asof_rows":$nAsof,"asof_sec":$asofSec%.1f,"range_pairs":$nRange,"range_sec":$rangeSec%.1f,"prefix_sec":$cumSec%.1f,"ewma_sec":$ewmaSec%.1f,"n_right":$nRight,"n_keys":$nKeys}""")
    spark.stop()
  }
}
