package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: pre-bucketing both fact tables on the join
  * key removes the per-query shuffle entirely — the technique that turns
  * a repeated 100 TB orders⋈lineitem from a full-network shuffle per run
  * into a local merge per bucket. Asserts both the plan shape (no
  * Exchange) and result equality with the shuffled join.
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = core.Sessions.local(4, "graft-bucket-test")

  val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without any shuffle and match the shuffled join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")

    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$dir/b_orders").mode("overwrite")
      .saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$dir/b_lineitem").mode("overwrite")
      .saveAsTable("b_lineitem")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val p = bucketed.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"), p)  // NO shuffle

      val shuffled = orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey"))
      val ps = shuffled.queryExecution.executedPlan.toString
      assert(ps.contains("Exchange hashpartitioning"), ps) // baseline DOES

      assert(bucketed.count() === shuffled.count())
      // spot-check an aggregate over the join, not just cardinality
      val a = bucketed.agg(round(sum(col("l_quantity")), 4)).head().getDouble(0)
      val b = shuffled.agg(round(sum(col("l_quantity")), 4)).head().getDouble(0)
      assert(a === b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("q54 driver query equals the shuffled formulation (and self-pins its plan)") {
    // q54 throws if an Exchange appears under its join+per-key agg, so
    // invoking it at all exercises the plan pin; here pin the VALUES
    // against the plain shuffled join the oracle uses
    val got = SparkEntry.queries("q54_bucketed_join")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val plain = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum((col("l_quantity").cast("decimal(15,2)") * 100).cast("long"))
          .as("q"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), sum("n").as("n_lines"),
        sum("q").as("qty_cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === plain)
  }
}
