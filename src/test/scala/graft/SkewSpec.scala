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
}
