package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * ArrayType(FloatType) columns, with whole-stage codegen.
  *
  * Rationale (SURVEY §2.11 extension ladder): the higher-order-function
  * formulation (zip_with + aggregate ×3) walks each array three times and
  * allocates an intermediate array per row; this expression is one fused
  * loop, no allocation, inlined into the generated stage — the preferred
  * shape for a 100 TB ANN scan. Semantics match llm.Similarity.cosine
  * bit-for-bit (double accumulation over float inputs), asserted by
  * FunctionsSpec.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  // analysis-time guard: getFloat over a non-float array would read
  // misaligned bytes and silently return garbage (the ExpectsInputTypes
  // mixin is private[sql], so the check lives here directly)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  // pure + deterministic → literal inputs constant-fold at plan time
  override def foldable: Boolean = children.forall(_.foldable)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

object GraftFunctions {
  /** Evaluate a function argument that must be a foldable positive
    * integer literal (signature-length / shingle-width knobs baked into
    * the expression at plan time). A non-literal column reference here
    * would otherwise NPE deep in eval(null) with no context.
    */
  private[graft] def litPosInt(e: Expression, fn: String, arg: String): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a literal integer, got non-foldable ${e.sql}")
    e.eval(null) match {
      case n: Number if n.intValue > 0 => n.intValue
      case other =>
        throw new IllegalArgumentException(
          s"$fn: argument '$arg' must be a positive integer literal, got $other")
    }
  }

  /** Evaluate a function argument that must be a foldable array of
    * non-null string literals (marker/stopword sets baked into the
    * expression at plan time).
    */
  private[graft] def litStringSeq(e: Expression, fn: String,
      arg: String): Seq[String] = {
    val ok = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => e.foldable
      case _ => false
    }
    if (!ok)
      throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a literal array<string>, got ${e.sql}")
    e.eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map { i =>
          val s = a.getUTF8String(i)
          if (s == null) throw new IllegalArgumentException(
            s"$fn: argument '$arg' must not contain nulls")
          s.toString
        }
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a literal array<string>, got $other")
    }
  }

  /** Evaluate a function argument that must be a foldable array<bigint>
    * literal (centroid-id tables baked into the expression at plan time).
    */
  private[graft] def litLongSeq(e: Expression, fn: String,
      arg: String): Seq[Long] = {
    val ok = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => e.foldable
      case _ => false
    }
    if (!ok)
      throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a literal array<bigint>, got ${e.sql}")
    e.eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toLongArray().toSeq
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a literal array<bigint>, got $other")
    }
  }

  /** Evaluate a function argument that must be a foldable
    * array<array<float>> literal (centroid-vector tables).
    */
  private[graft] def litFloatMatrix(e: Expression, fn: String,
      arg: String): Seq[Seq[Float]] = {
    val ok = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, _), _) => e.foldable
      case _ => false
    }
    if (!ok)
      throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a literal array<array<float>>, got ${e.sql}")
    e.eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map { i =>
          val row = a.getArray(i)
          if (row == null) throw new IllegalArgumentException(
            s"$fn: argument '$arg' must not contain null vectors")
          row.toFloatArray().toSeq
        }
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a literal array<array<float>>, got $other")
    }
  }

  /** Analysis-time builder for graft_nearest_centroids: evaluate the
    * literal ids/vecs table ONCE, ship it as a Spark broadcast, and hand
    * the expression only the handle — executors fetch the table once
    * (torrent blocks) instead of re-deserializing it with every task, so
    * the autoCentroids 2²⁰ cap (≈256 MB of floats) stops implying
    * hundreds of MB of per-task serialized literal. Runs during
    * analysis, so the active session's SparkContext is in scope.
    */
  /** Broadcast lifecycle: Catalyst re-analyzes a fresh plan copy many
    * times per query, and a kmeans/IVF loop issues a fresh query per
    * iteration — naively that is a new broadcast per analysis, reclaimed
    * only when ContextCleaner's GC-driven sweep eventually notices
    * (slow-burn executor/disk pressure with wide centroid tables in a
    * long-lived session). Two-part fix: (1) identical tables dedup to ONE
    * broadcast via a content digest, so re-analysis is free; (2) distinct
    * tables (loop iterations) enter a small LRU whose evictions are
    * DESTROYED eagerly — by eviction time the evicted iteration's query
    * has long since finished. Keyed by applicationId so a new context
    * never sees a stale handle; stopped contexts purge on access.
    */
  private val MaxCachedCentroidBroadcasts = 4
  private val centroidBroadcasts =
    new java.util.LinkedHashMap[(String, String),
        org.apache.spark.broadcast.Broadcast[CentroidTable]](16, 0.75f, true)

  private[graft] def centroidBroadcastCount: Int =
    centroidBroadcasts.synchronized { centroidBroadcasts.size }

  private def digestOf(t: CentroidTable): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val bb = java.nio.ByteBuffer.allocate(8)
    def putLong(v: Long): Unit = {
      bb.clear(); bb.putLong(v); md.update(bb.array())
    }
    // length-prefix every section and row: without delimiters two
    // different (ids, vecs) splits that concatenate to the same byte
    // stream would collide and silently share one broadcast table
    putLong(t.ids.length.toLong)
    t.ids.foreach(putLong)
    putLong(t.vecs.length.toLong)
    t.vecs.foreach { row =>
      putLong(row.length.toLong)
      val vb = java.nio.ByteBuffer.allocate(4 * row.length)
      row.foreach(vb.putFloat)
      md.update(vb.array())
    }
    md.digest().map("%02x".format(_)).mkString
  }

  private[graft] def buildNearestCentroids(
      exprs: Seq[Expression]): Expression =
    NearestCentroidsExpr(exprs(0),
      broadcastCentroidTable(new CentroidTable(
        litLongSeq(exprs(1), "graft_nearest_centroids", "ids").toArray,
        litFloatMatrix(exprs(2), "graft_nearest_centroids", "vecs")
          .map(_.toArray).toArray)),
      litPosInt(exprs(3), "graft_nearest_centroids", "n"))

  /** graft_pq_encode(embedding, vecs, kCodes): the codebook is a literal
    * array<array<float>> of M·kCodes rows (layout mIdx·kCodes + c), all
    * the same width; it shares the centroid broadcast dedup/LRU cache,
    * so re-analysis of the same codebook is free and training-loop
    * iterations evict eagerly.
    */
  private[graft] def buildPqEncode(exprs: Seq[Expression]): Expression = {
    val rows = litFloatMatrix(exprs(1), "graft_pq_encode", "vecs")
    val kCodes = litPosInt(exprs(2), "graft_pq_encode", "kCodes")
    require(rows.nonEmpty && rows.length % kCodes == 0,
      s"graft_pq_encode: vecs rows (${rows.length}) must be a non-empty " +
        s"multiple of kCodes ($kCodes)")
    require(rows.forall(_.length == rows.head.length),
      "graft_pq_encode: all codebook rows must have the same width")
    val table = new CentroidTable(
      Array.tabulate(rows.length)(_.toLong),
      rows.map(_.toArray).toArray)
    PqEncodeExpr(exprs(0), broadcastCentroidTable(table), kCodes)
  }

  /** Dedup + LRU-cached broadcast of a centroid/codebook table (see the
    * lifecycle note above buildNearestCentroids' former inline body).
    */
  private[graft] def broadcastCentroidTable(table: CentroidTable)
      : org.apache.spark.broadcast.Broadcast[CentroidTable] = {
    val sc = SparkSession.active.sparkContext
    val key = (sc.applicationId, digestOf(table))
    centroidBroadcasts.synchronized {
      val it = centroidBroadcasts.entrySet().iterator()
      while (it.hasNext) {
        if (it.next().getKey._1 != sc.applicationId) it.remove()
      }
      val cached = centroidBroadcasts.get(key)
      if (cached != null) cached
      else {
        val fresh = sc.broadcast(table)
        centroidBroadcasts.put(key, fresh)
        if (centroidBroadcasts.size > MaxCachedCentroidBroadcasts) {
          val eldest = centroidBroadcasts.entrySet().iterator().next()
          // non-blocking destroy: the evicted iteration's query finished
          // before this one was even built
          try eldest.getValue.destroy()
          catch { case scala.util.control.NonFatal(_) => () }
          centroidBroadcasts.remove(eldest.getKey)
        }
        fresh
      }
    }
  }

  // per-session registration guard: column builders call register() on
  // every invocation (langScores alone calls it four times per column),
  // so short-circuit repeat registrations instead of re-replacing all
  // functions and spamming "replaced a previously registered function"
  // warnings. Weak keys: a stopped session must not be pinned in memory.
  private val registeredSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register SQL-callable graft functions on a session. Idempotent and
    * cheap to call repeatedly.
    */
  def register(spark: SparkSession): Unit = {
    if (registeredSessions.put(spark, java.lang.Boolean.TRUE) != null) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => CosineSimilarityExpr(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash",
      exprs => MinHashSignatureExpr(exprs(0),
        litPosInt(exprs(1), "graft_minhash", "k")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_text",
      exprs => MinHashTextExpr(exprs(0),
        litPosInt(exprs(1), "graft_minhash_text", "w"),
        litPosInt(exprs(2), "graft_minhash_text", "k")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash",
      exprs => SimHashExpr(exprs(0)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hyperplane",
      exprs => HyperplaneBitsExpr(exprs(0),
        litPosInt(exprs(1), "graft_hyperplane", "nBits")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_count_in_set",
      exprs => TokenSetCountExpr(exprs(0),
        litStringSeq(exprs(1), "graft_count_in_set", "set")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest_centroids",
      buildNearestCentroids,
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_encode",
      buildPqEncode,
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => BloomContainsExpr(exprs(0), new BloomBits(
        litLongSeq(exprs(1), "graft_bloom_contains", "words").toArray,
        litPosInt(exprs(2), "graft_bloom_contains", "k"))),
      "built-in")
    // table function: SELECT * FROM graft_shortest_path('a', 'b')
    spark.sessionState.tableFunctionRegistry.registerFunction(
      ShortestPathTvf.identifier, ShortestPathTvf.info,
      ShortestPathTvf.build _)
  }

  /** Column-API form (requires register() on the active session). */
  def graftCosine(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_cosine", a, b)
  }
}
