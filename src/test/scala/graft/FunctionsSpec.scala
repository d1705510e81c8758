package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.llm.Similarity

/** Native Catalyst expression ≡ higher-order-function formulation. */
class FunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = core.Sessions.local(4, "graft-fn-test")

  val sf = "/root/testdata/sf0.001"

  test("graft_cosine (codegen Expression) matches HOF cosine bit-for-bit") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    GraftFunctions.register(spark)
    val both = emb.limit(100).select(
      col("vec_id"),
      Similarity.cosineHof(col("embedding"), col("embedding")).as("hof_self"),
      call_function("graft_cosine", col("embedding"), col("embedding"))
        .as("native_self"))
    both.collect().foreach { r =>
      assert(r.getDouble(1) === r.getDouble(2))
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    }
    // cross-pair check against a fixed vector
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toIndexedSeq
    val qcol = array(q.map(x => lit(x)): _*)
    val cross = emb.limit(100).select(
      Similarity.cosineHof(col("embedding"), qcol).as("hof"),
      call_function("graft_cosine", col("embedding"), qcol).as("native"))
    cross.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("graft_cosine is SQL-callable") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sf/embeddings.parquet")
      .createOrReplaceTempView("emb_fn_test")
    val r = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM emb_fn_test LIMIT 5")
      .collect()
    r.foreach(row => assert(math.abs(row.getDouble(0) - 1.0) < 1e-9))
  }
}
