package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Skew

/** Salted-join / two-phase-agg equivalence with the unsalted plans. */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = core.Sessions.local(4, "graft-skew-test")

  val sf = "/root/testdata/sf0.001"

  test("saltedJoin equals plain inner join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .select("l_orderkey", "o_totalprice")
    val plain = li.join(o, Seq("l_orderkey"))
      .agg(count(lit(1)), round(sum(col("o_totalprice")), 2)).head()
    val salted = Skew.saltedJoin(li, o, Seq("l_orderkey"),
        leftUniqueCol = "l_linenumber", saltFactor = 8)
      .agg(count(lit(1)), round(sum(col("o_totalprice")), 2)).head()
    assert(plain === salted)
  }

  test("twoPhaseAgg equals direct aggregation") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val two = Skew.twoPhaseAgg(li, Seq("l_returnflag"), "l_orderkey",
        partial = Seq(count(lit(1)).as("pn"), sum("l_quantity").as("pq")),
        fin = Seq(sum("pn").as("n"), round(sum("pq"), 4).as("q")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(direct === two)
  }

  test("q55 salted join + two-phase agg equals the plain join + group-by") {
    // the driver query composes both tools; pin it against the unsalted
    // formulation the oracle uses
    val got = SparkEntry.queries("q55_skew_salted")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val p = spark.read.parquet(s"$sf/part.parquet")
    val plain = li.join(p, col("p_partkey") === col("l_partkey"))
      .groupBy("p_type")
      .agg(count(lit(1)).as("n"),
        sum((col("l_extendedprice").cast("decimal(15,2)") * 100)
          .cast("long")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === plain)
  }
}
