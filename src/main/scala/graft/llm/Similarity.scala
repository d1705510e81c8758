package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}

/** Similarity search over an embedding column (ArrayType(FloatType)).
  *
  * Scale design: brute-force top-k is a single map-side cosine + global
  * top-k (TakeOrderedAndProject — no full sort, no shuffle of the data,
  * only k rows per partition reach the driver-side merge). The IVF variant
  * is the 100 TB path: vectors are pre-partitioned by nearest centroid;
  * a query probes only `nProbe` partitions, turning a full scan into a
  * pruned partition read (parquet partition pruning on `centroid_id`).
  */
object Similarity {

  /** Cosine similarity between two float-array columns, computed in
    * double precision. Dispatches to the native fused-loop Catalyst
    * expression (functions.CosineSimilarityExpr — one traversal, no
    * intermediate arrays); semantics are identical to the higher-order-
    * function formulation below (asserted bit-for-bit by FunctionsSpec).
    */
  def cosine(a: Column, b: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    graft.functions.GraftFunctions.register(spark)
    org.apache.spark.sql.functions.call_function("graft_cosine", a, b)
  }

  /** Reference formulation via codegen'd higher-order functions — kept
    * as the cross-check oracle for the native expression.
    */
  def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) =>
      x.cast("double") * y.cast("double")), lit(0.0d), (acc, v) => acc + v)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0d), (acc, v) => acc + v)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0d), (acc, v) => acc + v)
    dot / (sqrt(na) * sqrt(nb))
  }

  private def litVec(v: Seq[Float]): Column =
    array(v.map(x => lit(x)): _*)

  /** Exact brute-force cosine top-k against a literal query vector. */
  def bruteForceTopK(emb: DataFrame, query: Seq[Float], k: Int): DataFrame =
    emb.select(col("vec_id"),
        round(cosine(col("embedding"), litVec(query)), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)

  /** IVF index: assign every vector to its nearest centroid. Centroids
    * are a deterministic sample (lowest `nCentroids` vec_ids) — a stand-in
    * for k-means that keeps the pipeline reproducible; the partition/probe
    * mechanics are identical. Returns (vec_id, embedding, centroid_id).
    */
  def seedCentroids(emb: DataFrame, nCentroids: Int = 16): DataFrame =
    emb.orderBy(col("vec_id").asc).limit(nCentroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))

  /** Assign every vector to its nearest centroid from an explicit
    * (c_id, c_vec) table. The centroid table is k rows by construction,
    * so it is collected and inlined as literal vectors: the argmax
    * becomes `greatest` over k struct(sim, c_id) candidates — a pure
    * map-side projection with NO shuffle (the crossJoin + groupBy
    * formulation shuffled every embedding twice per assignment round,
    * which dominates k-means cost and is exactly the shuffle a 100 TB
    * corpus cannot afford).
    */
  def assignToCentroids(emb: DataFrame, centroids: DataFrame): DataFrame =
    assignToCentroids(emb, centroids.select(col("c_id"), col("c_vec"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq)

  /** Same, from already-collected centroids — callers that also need the
    * centroid values locally (probe ranking) collect once, not twice.
    */
  def assignToCentroids(emb: DataFrame,
      cents: Seq[(Long, Seq[Float])]): DataFrame = {
    require(cents.nonEmpty, "assignToCentroids: empty centroid table")
    val cands = cents.map { case (id, v) =>
      struct(cosine(col("embedding"), litVec(v)).as("sim"),
        lit(id).as("c_id"))
    }
    val best =
      if (cands.length == 1) cands.head else greatest(cands: _*)
    emb.select(col("vec_id"), col("embedding"),
      best.getField("c_id").as("centroid_id"))
  }

  def ivfAssign(spark: SparkSession, emb: DataFrame, nCentroids: Int = 16)
      : DataFrame =
    assignToCentroids(emb, seedCentroids(emb, nCentroids))

  /** One k-means centroid-refinement iteration: replace each centroid
    * with the element-wise mean of its assigned vectors, computed by the
    * typed CentroidMean Aggregator (map-side combinable). Iterating
    * assign→refine converges toward real k-means; even one iteration
    * moves the seeded centroids to density centers and tightens IVF
    * recall.
    */
  def kmeansRefine(spark: SparkSession, assigned: DataFrame, dim: Int = 64)
      : DataFrame = {
    import spark.implicits._
    val agg = new graft.functions.CentroidMean(dim)
    assigned.select(col("centroid_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("c_vec"))
      .toDF("c_id", "c_vec")
      .select(col("c_id"), col("c_vec").cast(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
  }

  /** Full k-means clustering: seeded assign → refine loop. Each
    * iteration is one broadcast nested-loop assignment plus one
    * map-side-combinable mean aggregation — no O(n²) stage anywhere,
    * so iterations scale linearly with the corpus.
    */
  def kmeans(spark: SparkSession, emb: DataFrame, k: Int, iters: Int = 5)
      : DataFrame = {
    var cents = seedCentroids(emb, k)
    var prev: Option[DataFrame] = None
    var i = 0
    while (i < iters) {
      val next = kmeansRefine(spark, assignToCentroids(emb, cents)).cache()
      next.count()
      // drop the previous iteration's cached centroids — repeated kmeans
      // calls in a long-lived session must not accumulate cached blocks
      prev.foreach(_.unpersist())
      prev = Some(next)
      cents = next
      i += 1
    }
    val out = assignToCentroids(emb, cents)
    prev.foreach(_.unpersist())
    out
  }

  /** IVF probe: search only the `nProbe` centroids closest to the query.
    * At scale the assignment is written partitioned by centroid_id
    * (Sinks.parquet(partitionBy = Seq("centroid_id"))) so this becomes a
    * partition-pruned scan — the isin filter lands in PartitionFilters
    * and only nProbe directories are read (pinned by PlanSpec "IVF probe
    * over a centroid-partitioned index is a pruned scan").
    */
  def ivfTopK(spark: SparkSession, assigned: DataFrame, centroids: DataFrame,
      query: Seq[Float], k: Int, nProbe: Int = 4): DataFrame = {
    val q = litVec(query)
    val probeIds = centroids
      .select(col("c_id"), cosine(col("c_vec"), q).as("sim"))
      .orderBy(col("sim").desc, col("c_id").asc)
      .limit(nProbe)
      .collect().map(_.getLong(0))
    assigned
      .filter(col("centroid_id").isin(probeIds: _*))
      .select(col("vec_id"), round(cosine(col("embedding"), q), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF-bucketed APPROXIMATE k-NN join — the scale path when the query
    * side is the whole corpus (knnJoin's driver-held query array stops
    * making sense at millions of queries). Both sides bucket by
    * centroid: every vector probes its `nProbe` nearest centroids
    * (map-side, centroids inlined as literals — same zero-shuffle
    * argmax as assignToCentroids, extended to top-nProbe), candidates
    * come from the bucket equi-join, and a per-query window ranks them.
    * Per-query candidate volume is Σ probed-bucket sizes ≈
    * |corpus|·nProbe/nCentroids — the IVF contract: scale nCentroids
    * with the corpus and the join stays bucket-local, never all-pairs.
    *
    * Approximate: a true neighbor outside every probed bucket is
    * missed (recall vs exact knnJoin measured and floor-pinned in the
    * spec; planted identical twins prove recall 1.0 on duplicates).
    * Fully deterministic (seeded centroids, fixed iteration), so the
    * whole pipeline is DuckDB-expressible and the driver query is
    * hash-verified end to end. Ties: centroid ranks break by c_id DESC
    * (assignToCentroids' greatest-struct semantics), neighbor ranks by
    * vec_id ASC.
    *
    * Contract: null embeddings are dropped up front; zero-norm vectors
    * (NaN cosine) are undefined behavior — engines order NaN
    * differently, so filter them out upstream. The literal-inlined
    * centroid set caps nCentroids at ~100 (plan size grows per
    * centroid); a deployment needing thousands of buckets would swap
    * the inlined argmax for a broadcast centroid-table join — the
    * bucket-join shape downstream is unchanged.
    */
  def ivfKnnJoin(spark: SparkSession, emb: DataFrame, k: Int = 5,
      nCentroids: Int = 16, nProbe: Int = 4, dim: Int = 64): DataFrame = {
    require(k >= 1 && nProbe >= 1 && nCentroids >= nProbe,
      s"need nCentroids >= nProbe >= 1 and k >= 1")
    val vecs = emb.filter(col("embedding").isNotNull)
    val seeds = seedCentroids(vecs, nCentroids)
    val refined =
      kmeansRefine(spark, assignToCentroids(vecs, seeds), dim).cache()
    val cents = refined.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    refined.unpersist()
    val assigned = assignToCentroids(vecs, cents)
    // per-vector top-nProbe probe centroids: sort_array on literal
    // struct candidates, negated sim for descending order — map-side
    val cands = array(cents.map { case (id, v) =>
      struct((-cosine(col("embedding"), litVec(v))).as("nsim"),
        (-lit(id)).as("nc_id"))
    }: _*)
    val probes = vecs.select(col("vec_id").as("q_id"),
        col("embedding").as("q_vec"),
        explode(slice(sort_array(cands), 1, nProbe)).as("p"))
      .select(col("q_id"), col("q_vec"), (-col("p.nc_id")).as("probe_cid"))
    val ranked = probes.join(assigned,
        probes("probe_cid") === assigned("centroid_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("q_vec"), col("embedding")).as("sim"))
    topKPerQuery(ranked, k)
  }

  /** Shared k-NN tail: rank (q_id, vec_id, sim) candidates per query —
    * descending sim, ascending vec_id tiebreak on EXACT doubles — keep
    * k, round only on output.
    */
  private def topKPerQuery(cands: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    cands
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), round(col("sim"), 6).as("cosine"))
  }

  /** Exact k-NN JOIN: for every query vector, the k most-cosine-similar
    * corpus vectors (the query's own vec_id excluded). The multi-query
    * generalization of bruteForceTopK, and the batch shape of
    * embedding-space retrieval/labelling jobs.
    *
    * Scale design — the naive formulation (crossJoin + window rank per
    * query) materializes |corpus| × |queries| rows through a shuffle and
    * then sorts per-query groups of corpus size; both die at 100 TB.
    * Here each corpus partition keeps a BOUNDED per-query heap
    * (queries × k entries), emits only its local top-k, and a final
    * window ranks the partitions × k × queries survivors — the corpus
    * is scanned once, nothing corpus-sized is shuffled or grouped. The
    * query side is a driver-held array (bounded-collect contract, like
    * the IVF centroid table): this is a many-few join, not many-many.
    *
    * Cosine accumulates left to right in double exactly like the native
    * CosineSimilarityExpr / the DuckDB list_sum oracle formulation, so
    * results are hash-comparable across engines. Ranking ties break by
    * ascending vec_id on EXACT doubles (rounding only on output).
    */
  def knnJoin(emb: DataFrame, queries: Seq[(Long, Seq[Float])],
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(queries.nonEmpty, "need at least one query vector")
    val spark = emb.sparkSession
    val qArr = queries.map { case (id, v) => (id, v.toArray) }.toArray
    val bq = spark.sparkContext.broadcast(qArr)

    // head of the priority queue = the WORST kept candidate (lowest
    // sim; ties: larger vec_id), so eviction is an O(log k) replace
    val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    val midSchema = new StructType()
      .add("q_id", LongType, nullable = false)
      .add("vec_id", LongType, nullable = false)
      .add("sim", DoubleType, nullable = false)
    val partial = emb.select(col("vec_id"), col("embedding"))
      .mapPartitions { it =>
        val qs = bq.value
        val heaps = qs.map(_ =>
          new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
            worstFirst))
        it.foreach { r =>
          val id = r.getLong(0)
          // null embeddings are ignored (the native cosine yields NULL
          // sim there, which a top-k can never rank)
          val vSeq = if (r.isNullAt(1)) null else r.getSeq[Float](1)
          val v = if (vSeq == null) null else vSeq.toArray // unbox once
          var qi = 0
          while (v != null && qi < qs.length) {
            val (qid, qv) = qs(qi)
            if (id != qid) {
              // same accumulation order AND length semantics as
              // CosineSimilarityExpr: min-length prefix, prefix norms
              val n = math.min(v.length, qv.length)
              var dot = 0.0; var na = 0.0; var nb = 0.0
              var i = 0
              while (i < n) {
                val xi = v(i).toDouble; val yi = qv(i).toDouble
                dot += xi * yi; na += xi * xi; nb += yi * yi
                i += 1
              }
              val sim = dot / (math.sqrt(na) * math.sqrt(nb))
              val h = heaps(qi)
              if (h.size < k) h.enqueue((sim, id))
              else if (worstFirst.compare((sim, id), h.head) < 0) {
                // candidate orders BEFORE the current worst → better
                h.dequeue(); h.enqueue((sim, id))
              }
            }
            qi += 1
          }
        }
        qs.iterator.zip(heaps.iterator).flatMap { case ((qid, _), h) =>
          h.iterator.map { case (sim, id) => Row(qid, id, sim) }
        }
      }(Encoders.row(midSchema))

    // partitions × queries × k survivors — window cost is bounded by
    // the partition count, not the corpus
    topKPerQuery(partial, k)
  }
}
