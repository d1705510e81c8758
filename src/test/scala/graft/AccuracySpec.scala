package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Similarity

/** Error bounds for the approximate operators that have no DuckDB oracle:
  * HLL distinct counts and the k-means-refined IVF index.
  */
class AccuracySpec extends AnyFunSuite {

  lazy val spark: SparkSession = core.Sessions.local(4, "graft-acc-test")

  val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct (HLL, engine-native) within 5% of exact") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("KMV bottom-k distinct estimate (q31) within its error bound") {
    // k = 256 → standard error 1/sqrt(k-2) ≈ 6.3%; assert 3σ. Groups
    // with fewer than k distinct values are exact by construction.
    val rows = SparkEntry.queries("q31_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kmv = r.getDouble(1)
      val exact = r.getLong(2).toDouble
      assert(math.abs(kmv - exact) / exact < 0.19,
        s"${r.getString(0)}: kmv=$kmv exact=$exact")
    }
  }

  test("count-min sketch heavy hitters: overestimate-only, bounded error") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val n = toks.count()
    val eps = 0.001
    val sketch = toks.stat.countMinSketch("tok", eps, 0.99, 42)
    val exact = toks.groupBy("tok").count()
      .orderBy(col("count").desc, col("tok").asc).limit(20)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    exact.foreach { case (tok, cnt) =>
      val est = sketch.estimateCount(tok)
      // count-min never underestimates; error bounded by eps × stream size
      assert(est >= cnt, s"$tok: est=$est < exact=$cnt")
      assert(est <= cnt + (eps * n).toLong + 1, s"$tok: est=$est exact=$cnt")
    }
  }

  test("q53 deterministic CMS: overestimate-only, ε-bounded, repartition-stable") {
    // The driver-pinned DataFrame-native sketch (depth 4, width 1024):
    // min-over-rows estimates can only collide UP (est ≥ exact, the CMS
    // guarantee), and each row's collision mass is bounded by the
    // stream size over the width (assert 3× slack — the Markov bound
    // holds per row, the min tightens it).
    val rows = SparkEntry.queries("q53_heavy_hitters")(spark, sf).collect()
    assert(rows.length === 20)
    val n = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "").count()
    rows.foreach { r =>
      val exact = r.getLong(1); val est = r.getLong(2)
      assert(est >= exact, s"${r.getString(0)}: est=$est < exact=$exact")
      assert(est <= exact + 3L * n / 1024 + 1,
        s"${r.getString(0)}: est=$est exact=$exact n=$n")
    }
    // determinism: the sketch and the top-20 set must not depend on the
    // physical partitioning of the token stream
    val again = SparkEntry.queries("q53_heavy_hitters")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === rows.map(r => (r.getString(0), r.getLong(1),
      r.getLong(2))).toSet)
  }

  test("q57 deterministic HLL: error-bounded, mergeable, repartition-stable") {
    import graft.operators.HyperLogLog
    // error bound on a real cardinality (10k sequential keys → raw
    // regime): σ = 1.04/√256 ≈ 6.5%; assert 3σ
    val keys = spark.range(10000).select(col("id").cast("string").as("k"))
    val sk = HyperLogLog.sketch(keys, col("k"))
    val est = HyperLogLog.estimate(sk).head().getLong(0)
    assert(math.abs(est - 10000.0) / 10000.0 < 0.195, s"est=$est")
    // register maxima are mergeable: sketch(A ∪ B) = max-merge of the
    // two half sketches — the property that makes partition/day/
    // micro-batch sketches compose at 100 TB
    val a = HyperLogLog.sketch(
      spark.range(5000).select(col("id").cast("string").as("k")), col("k"))
    val b = HyperLogLog.sketch(
      spark.range(5000, 10000).select(col("id").cast("string").as("k")),
      col("k"))
    val merged = a.unionByName(b).groupBy("bucket").agg(max(col("r")).as("r"))
    val whole = sk.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(merged.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      === whole)
    // physical partitioning must not change a max-reduce
    val re = HyperLogLog.sketch(keys.repartition(13), col("k"))
    assert(re.collect().map(r => (r.getInt(0), r.getInt(1))).toSet === whole)
    // small-range correction (Scala-side, out of the hash contract):
    // 100 distinct ≪ 2.5m — linear counting must be much tighter than
    // the raw estimator down here
    val tiny = spark.range(100).select(col("id").cast("string").as("k"))
    val lc = HyperLogLog.smallRangeEstimate(
      HyperLogLog.sketch(tiny, col("k"))).head().getLong(0)
    assert(math.abs(lc - 100.0) / 100.0 < 0.15, s"linear-counting est=$lc")
  }

  test("quantile sketch bins: estimate = floor of the exact disc " +
      "percentile; mergeable across splits") {
    // the stream_quantile_sketch recurrence in batch form: with unit
    // bins = floor(value) and threshold ceil(pct·n/100), the selected
    // bin is exactly floor(percentile_disc(pct)) — zero slack, because
    // the bin of the k-th order statistic is the first bin whose
    // cumulative count reaches k
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("value"))
    val binned = ev.select(least(greatest(floor(col("value")), lit(0)),
      lit(511)).cast("int").as("bin"))
    val regs = binned.groupBy("bin").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = regs.values.sum
    val exact = ev.collect().map(_.getDouble(0)).sorted
    for (pct <- Seq(50, 90, 99)) {
      val t = (pct * n + 99) / 100
      val est = regs.keys.toSeq.sorted
        .scanLeft((0, 0L)) { case ((_, c), b) => (b, c + regs(b)) }
        .drop(1).find(_._2 >= t).get._1
      val disc = exact((t - 1).toInt)
      assert(est === math.min(math.max(disc.floor.toInt, 0), 511),
        s"pct=$pct est=$est disc=$disc")
    }
    // mergeability: bin counts are plain sums — sketches of any
    // deterministic row split add up to the whole-corpus sketch
    def sketchOf(df: org.apache.spark.sql.DataFrame) =
      df.select(least(greatest(floor(col("value")), lit(0)), lit(511))
          .cast("int").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val a = sketchOf(ev.filter(col("value") < 50))
    val b = sketchOf(ev.filter(col("value") >= 50))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged === regs)
  }

  test("k-means refinement preserves centroid count and improves spread") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val seeds = Similarity.seedCentroids(emb, 8)
    val assigned0 = Similarity.assignToCentroids(emb, seeds)
    val refined = Similarity.kmeansRefine(spark, assigned0)
    assert(refined.count() === assigned0.select("centroid_id").distinct().count())
    // refined centroid = mean of members: spot-check against a manual mean
    val cid = refined.select("c_id").orderBy(col("c_id").asc).head().getLong(0)
    val members = assigned0.filter(col("centroid_id") === cid)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("pos").agg(avg(col("v")).as("m"))
      .orderBy("pos").collect().map(_.getDouble(1))
    val got = refined.filter(col("c_id") === cid)
      .head().getSeq[Float](1).toArray
    members.zip(got).foreach { case (m, g) =>
      assert(math.abs(m - g) < 1e-5)
    }
    // one refine step must not reduce mean member-to-centroid similarity
    def meanSim(assigned: org.apache.spark.sql.DataFrame,
        cents: org.apache.spark.sql.DataFrame): Double =
      assigned.join(cents, col("centroid_id") === col("c_id"))
        .select(avg(Similarity.cosine(col("embedding"), col("c_vec"))))
        .head().getDouble(0)
    val before = meanSim(assigned0, seeds)
    val after = meanSim(Similarity.assignToCentroids(emb, refined), refined)
    assert(after >= before - 1e-6, s"before=$before after=$after")
  }
}
