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

  test("registered functions reject wrong input types at analysis time") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sf/embeddings.parquet")
      .createOrReplaceTempView("emb_typecheck")
    // array<double> must fail analysis, not silently return garbage
    val doubleArr = "transform(embedding, x -> CAST(x AS DOUBLE))"
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT graft_cosine($doubleArr, $doubleArr) FROM emb_typecheck")
        .collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_simhash(embedding) FROM emb_typecheck").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_minhash(embedding, 32) FROM emb_typecheck")
        .collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hyperplane(CAST(vec_id AS STRING), 48) FROM emb_typecheck")
        .collect()
    }
  }

  test("signature-length knobs must be positive integer literals") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sf/documents.parquet")
      .createOrReplaceTempView("docs_typecheck")
    // non-literal k previously NPE'd deep in eval(null); now a clear error
    val e = intercept[Exception] {
      spark.sql("""SELECT graft_minhash(split(text, ' '), CAST(doc_id AS INT))
                  |FROM docs_typecheck""".stripMargin).collect()
    }
    assert(e.getMessage.contains("literal integer") ||
      Option(e.getCause).exists(_.getMessage.contains("literal integer")))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_minhash(split(text, ' '), -3) FROM docs_typecheck")
        .collect()
    }
    assert(e2.getMessage.contains("positive") ||
      Option(e2.getCause).exists(_.getMessage.contains("positive")))
  }

  test("GraftExtensions wires every function into an extension-built session") {
    val prev = spark // force base session creation first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]").appName("graft-ext-test")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    try {
      ext.read.parquet(s"$sf/embeddings.parquet")
        .createOrReplaceTempView("emb_ext_test")
      val r = ext.sql(
        """SELECT graft_cosine(embedding, embedding) AS c,
          |graft_hyperplane(embedding, 48) AS h FROM emb_ext_test LIMIT 3"""
          .stripMargin).collect()
      r.foreach { row =>
        assert(math.abs(row.getDouble(0) - 1.0) < 1e-9)
        assert((row.getLong(1) >>> 48) === 0L)
      }
      // validation is shared with the programmatic path: bad k fails clearly
      val e = intercept[Exception] {
        ext.sql("SELECT graft_minhash(array('a','b'), 0)").collect()
      }
      assert(e.getMessage.contains("positive") ||
        Option(e.getCause).exists(_.getMessage.contains("positive")))
    } finally {
      ext.catalog.dropTempView("emb_ext_test")
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("graft_count_in_set equals the HOF filter formulation") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val markers = Seq("the", "a", "an", "and", "or", "of", "in", "to")
    val toks = split(lower(trim(col("text"))), "\\s+")
    val both = docs.limit(200).select(
      call_function("graft_count_in_set", toks,
        array(markers.map(lit): _*)).as("native"),
      size(filter(toks, t => t.isin(markers: _*))).as("hof"))
    both.collect().foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // non-literal set argument fails clearly
    docs.createOrReplaceTempView("docs_cis")
    val e = intercept[Exception] {
      spark.sql("""SELECT graft_count_in_set(split(text, ' '), split(text, ' '))
                  |FROM docs_cis""".stripMargin).collect()
    }
    assert(e.getMessage.contains("literal array") ||
      Option(e.getCause).exists(_.getMessage.contains("literal array")))
  }

  test("graft_nearest_centroids ≡ greatest/sort_array over literal structs") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = emb.orderBy(col("vec_id").asc).limit(7)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    // the formulation the native kernel replaced: greatest over
    // struct(cosine(emb, lit_vec), c_id) candidates — must agree on
    // every row, including the argmax tiebreak, for n = 1 ...
    val litCands = cents.map { case (id, v) =>
      struct(call_function("graft_cosine", col("embedding"),
        array(v.map(x => lit(x)): _*)).as("sim"), lit(id).as("c_id"))
    }
    val both = emb.select(
      greatest(litCands: _*).getField("c_id").as("old_best"),
      element_at(Similarity.nearestCentroids(col("embedding"), cents, 1), 1)
        .as("new_best"),
      // ... and on the full probe ordering for n = 3 (sim desc, c_id
      // desc via ascending sort on negated fields)
      transform(slice(sort_array(array(cents.map { case (id, v) =>
        struct((-call_function("graft_cosine", col("embedding"),
          array(v.map(x => lit(x)): _*))).as("nsim"), (-lit(id)).as("nc_id"))
      }: _*)), 1, 3), p => -p.getField("nc_id")).as("old_top3"),
      Similarity.nearestCentroids(col("embedding"), cents, 3).as("new_top3"))
    both.collect().foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getSeq[Long](2) === r.getSeq[Long](3))
    }
  }

  test("graft_nearest_centroids: broadcast dedup + bounded LRU across a 50-iteration loop") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq((1L, Seq(1.0f, 0.0f))).toDF("id", "embedding")
    def run(tableSeed: Int): Unit = {
      val cents = Seq((tableSeed.toLong, Seq(tableSeed.toFloat, 1.0f)))
      rows.select(Similarity.nearestCentroids(col("embedding"), cents, 1))
        .collect()
    }
    // identical table re-analyzed: count must not grow per call
    run(1000); val afterFirst = GraftFunctions.centroidBroadcastCount
    run(1000); run(1000)
    assert(GraftFunctions.centroidBroadcastCount === afterFirst)
    // 50 distinct tables (the kmeans-loop shape): LRU caps live handles —
    // superseded iterations' broadcasts are destroyed, not accumulated
    (1 to 50).foreach(run)
    assert(GraftFunctions.centroidBroadcastCount <= 4)
    // and the surviving cached entry still evaluates correctly
    run(50)
    assert(GraftFunctions.centroidBroadcastCount <= 4)
  }

  test("graft_nearest_centroids: ties to larger id, null-safe, n > k capped") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val v = Seq(1.0f, 2.0f, 3.0f)
    // centroids 10 and 20 are identical → equal sims → larger id wins
    val cents = Seq((10L, v), (20L, v), (5L, Seq(-1.0f, -2.0f, -3.0f)))
    val rows = Seq((1L, Some(v)), (2L, None))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        Similarity.nearestCentroids(
          col("embedding").cast("array<float>"), cents, 5).as("top"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(rows(1L) === Seq(20L, 10L, 5L)) // tie → 20 before 10; capped at k=3
    assert(rows(2L) === null)              // null embedding → null result
  }

  test("graft_hyperplane: deterministic, bit-bounded, near-dup vectors collide") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val bits = emb.limit(50).select(
      call_function("graft_hyperplane", col("embedding"), lit(48)).as("b1"),
      call_function("graft_hyperplane", col("embedding"), lit(48)).as("b2"))
      .collect()
    bits.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))            // deterministic
      assert((r.getLong(0) >>> 48) === 0L)             // only low 48 bits set
    }
    // two DISTINCT rows carrying the same embedding must produce the
    // same bits (cross-row bucket collision, not just determinism)
    val v = emb.filter(col("vec_id") === 3).select("embedding")
      .head().getSeq[Float](0)
    import spark.implicits._
    val two = Seq((1L, v), (2L, v)).toDF("id", "embedding")
      .select(call_function("graft_hyperplane", col("embedding"), lit(48)))
      .collect().map(_.getLong(0))
    assert(two(0) === two(1))
  }
}
