package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks

/** Source/sink round-trips: partitioned parquet with pruning, CSV, JSON. */
class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = core.Sessions.local(4, "graft-src-test")

  val sf = "/root/testdata/sf0.001"
  def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$name")
    d.toFile.deleteOnExit()
    s"$d/out"
  }

  test("partitioned parquet sink round-trips and prunes partitions") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val path = tmp("part")
    Sinks.parquet(orders, path, partitionBy = Seq("o_orderstatus"),
      maxRecordsPerFile = 500)
    val back = spark.read.parquet(path)
    assert(back.count() === orders.count())
    // partition pruning: reading one status must scan only its directory
    val pruned = back.filter(col("o_orderstatus") === "F")
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(pruned.count() ===
      orders.filter(col("o_orderstatus") === "F").count())
    // file-size bound respected
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("o_orderstatus="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
  }

  test("csv sink round-trips with header") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val path = tmp("csv")
    Sinks.csv(nation, path)
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(path)
    assert(back.count() === nation.count())
    assert(back.columns.toSeq === nation.columns.toSeq)
  }

  test("json sink round-trips") {
    val region = spark.read.parquet(s"$sf/region.parquet")
    val path = tmp("json")
    Sinks.json(region, path)
    val back = spark.read.json(path)
    assert(back.count() === region.count())
  }

  test("text sink round-trips raw lines, plain and gzip") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text"))
    for (codec <- Seq("none", "gzip")) {
      val path = tmp(s"text_$codec")
      Sinks.text(docs, path, compression = codec)
      val back = spark.read.text(path)
      assert(back.count() === docs.count())
      // content preserved exactly (as a multiset of lines)
      assert(back.groupBy("value").count().orderBy("value").collect().toSeq
        === docs.groupBy("text").count().orderBy("text").collect().toSeq)
    }
  }

  test("partitioned ORC sink round-trips with filter pushdown") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val path = tmp("orc")
    Sinks.orc(orders, path, partitionBy = Seq("o_orderstatus"))
    val back = spark.read.orc(path)
    assert(back.count() === orders.count())
    val filtered = back.filter(col("o_totalprice") > 100000.0)
    // predicate reaches the ORC scan (row-group skipping territory)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"), p)
    assert(filtered.count() ===
      orders.filter(col("o_totalprice") > 100000.0).count())
  }
}
