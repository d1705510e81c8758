package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: synthesize an sf1.0-equivalent dataset by replicating
  * an sf0.1 directory N times with disjoint key ranges, so headline
  * queries can be timed at 10× driver scale (VERDICT r8 item 4) without
  * violating the read-only testdata contract (output goes under
  * target/). Referential integrity is preserved: every foreign key is
  * shifted by the SAME per-replica offset as the primary key it
  * references, so join/aggregate cardinalities scale exactly linearly.
  * Fixed-cardinality dimensions (region, nation) keep one copy — at
  * real scale factors those tables are constant too (TPC-H semantics).
  *
  * Text/vector payloads are copied verbatim: replicated documents mean
  * every doc has N exact twins, which makes the dedup family's groups
  * N× LARGER — the harder direction, so timings are conservative.
  *
  * Usage: runMain graft.ScaleUp [srcDir] [dstDir] [copies]
  */
object ScaleUp {
  /** Offset unit between replicas — far above any key in the source. */
  val Stride = 1_000_000_000L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/target/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // table -> long key columns shifted per replica
    val shifted: Seq[(String, Seq[String])] = Seq(
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    val asIs = Seq("region", "nation")

    def replicate(df: DataFrame, keys: Seq[String]): DataFrame = {
      val r = spark.range(copies).select(col("id").as("__r"))
      keys.foldLeft(df.crossJoin(r)) { (d, k) =>
        d.withColumn(k, col(k) + col("__r") * lit(Stride))
      }.drop("__r")
    }

    asIs.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t: copied as-is")
    }
    shifted.foreach { case (t, keys) =>
      val in = spark.read.parquet(s"$src/$t.parquet")
      replicate(in, keys).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      val n = spark.read.parquet(s"$dst/$t.parquet").count()
      println(s"[scaleup] $t: ${copies}x -> $n rows")
    }
    spark.stop()
  }
}
