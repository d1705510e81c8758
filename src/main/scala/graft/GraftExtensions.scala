package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: wires the graft native functions
  * into any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), so external Spark apps get
  * `graft_cosine` / `graft_minhash` / `graft_minhash_text` /
  * `graft_simhash` / `graft_hyperplane` in SQL without touching graft
  * code. The same registrations happen lazily via
  * `GraftFunctions.register` for programmatic users; both paths share
  * the literal-argument validation (a non-literal k/w/nBits fails with a
  * clear message instead of an NPE) and the expressions themselves
  * type-check their array inputs at analysis time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    import graft.functions._
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "graft_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarityExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "graft_minhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSignatureExpr(exprs(0),
          GraftFunctions.litPosInt(exprs(1), "graft_minhash", "k"))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_text"),
      new ExpressionInfo(classOf[MinHashTextExpr].getName, "graft_minhash_text"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashTextExpr(exprs(0),
          GraftFunctions.litPosInt(exprs(1), "graft_minhash_text", "w"),
          GraftFunctions.litPosInt(exprs(2), "graft_minhash_text", "k"))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashExpr(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane"),
      new ExpressionInfo(classOf[HyperplaneBitsExpr].getName, "graft_hyperplane"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HyperplaneBitsExpr(exprs(0),
          GraftFunctions.litPosInt(exprs(1), "graft_hyperplane", "nBits"))))
    ext.injectFunction((
      FunctionIdentifier("graft_count_in_set"),
      new ExpressionInfo(classOf[TokenSetCountExpr].getName, "graft_count_in_set"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TokenSetCountExpr(exprs(0),
          GraftFunctions.litStringSeq(exprs(1), "graft_count_in_set", "set"))))
    ext.injectFunction((
      FunctionIdentifier("graft_nearest_centroids"),
      new ExpressionInfo(classOf[NearestCentroidsExpr].getName,
        "graft_nearest_centroids"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftFunctions.buildNearestCentroids(exprs)))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncodeExpr].getName, "graft_pq_encode"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftFunctions.buildPqEncode(exprs)))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContainsExpr].getName,
        "graft_bloom_contains"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomContainsExpr(exprs(0), new BloomBits(
          GraftFunctions.litLongSeq(exprs(1), "graft_bloom_contains", "words").toArray,
          GraftFunctions.litPosInt(exprs(2), "graft_bloom_contains", "k")))))
    // SQL-callable graph surface: SELECT * FROM graft_shortest_path(src,
    // dst) — plan-time table function, anchors must be literals.
    ext.injectTableFunction((
      ShortestPathTvf.identifier, ShortestPathTvf.info,
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShortestPathTvf.build(exprs)))
  }
}
