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

  /** Heap ordering for bounded top-k: head = the WORST kept candidate
    * (lowest sim; ties: larger vec_id), so eviction is an O(log k)
    * replace. Serializable — it is closed over by executor-side tasks.
    */
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] with Serializable {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

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

  /** Top-`n` nearest centroid ids (cosine desc, ties to larger c_id) of
    * the embedding column against a collected centroid table — the
    * native NearestCentroidsExpr kernel. The table rides the plan as ONE
    * literal pair (ids, matrix) shared by all rows, so plan size and
    * codegen compile time are independent of the centroid count: the
    * previous greatest/sort_array-over-literal-structs formulation grew
    * the generated Java linearly with k, capping usable tables at ~100
    * centroids and costing cold runs seconds of Janino compile.
    */
  private[graft] def nearestCentroids(emb: Column,
      cents: Seq[(Long, Seq[Float])], n: Int): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    graft.functions.GraftFunctions.register(spark)
    call_function("graft_nearest_centroids", emb,
      typedLit(cents.map(_._1)), typedLit(cents.map(_._2)), lit(n))
  }

  /** Assign every vector to its nearest centroid from an explicit
    * (c_id, c_vec) table. The centroid table is k rows by construction,
    * so it is collected and baked into a native argmax expression — a
    * pure map-side projection with NO shuffle (the crossJoin + groupBy
    * formulation shuffled every embedding twice per assignment round,
    * which dominates k-means cost and is exactly the shuffle a 100 TB
    * corpus cannot afford). Null embeddings assign to a null centroid.
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
    emb.select(col("vec_id"), col("embedding"),
      element_at(nearestCentroids(col("embedding"), cents, 1), 1)
        .as("centroid_id"))
  }

  /** Centroid-count policy for the IVF family: k(n) = max(16, ⌈√n⌉),
    * capped at 2²⁰ (the centroid table is collected and inlined into
    * the map-side argmax, so it must stay memory-resident). √n balances
    * the two costs that grow with corpus size — per-vector probe work
    * (∝ k) and per-query candidate volume (∝ nProbe·n/k): both land at
    * O(√n), so mean bucket size ≈ √n and the bucket join never drifts
    * toward all-pairs as the corpus grows. This is the "scale nCentroids
    * with the corpus" contract made executable: callers that pass
    * nCentroids = 0 (the default) get the policy; explicit values are
    * for oracled/benchmarked pipelines that need a pinned count.
    */
  def autoCentroids(n: Long): Int =
    math.min(1L << 20,
      math.max(16L, math.ceil(math.sqrt(math.max(0L, n).toDouble)).toLong))
      .toInt

  def ivfAssign(spark: SparkSession, emb: DataFrame, nCentroids: Int = 0)
      : DataFrame = {
    // auto mode pays one count() job to size k — the index build is
    // already a multi-pass operation, so the extra scan is noise there
    val k = if (nCentroids > 0) nCentroids else autoCentroids(emb.count())
    assignToCentroids(emb, seedCentroids(emb, k))
  }

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
    // cache the corpus for the refine loop: every iteration re-reads it
    // for assignment + mean aggregation, so an uncached loop costs
    // 2·iters full corpus scans — the dominant I/O at 100 TB (disk-
    // spillable storage level, same trade MLlib's KMeans makes).
    // If the CALLER already persisted emb, reuse their cache and leave
    // its lifecycle alone — persist+unpersist here would silently drop
    // a cache the caller still depends on (CacheManager keys by plan).
    val callerCached =
      emb.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val vecs = if (callerCached) emb
      else emb.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = seedCentroids(vecs, k)
    var prev: Option[DataFrame] = None
    var i = 0
    while (i < iters) {
      val next = kmeansRefine(spark, assignToCentroids(vecs, cents)).transform(graft.core.Tables.shrinkForCache(_)).cache()
      next.count()
      // drop the previous iteration's cached centroids — repeated kmeans
      // calls in a long-lived session must not accumulate cached blocks
      prev.foreach(_.unpersist())
      prev = Some(next)
      cents = next
      i += 1
    }
    // final assignment: collect the k refined centroids BEFORE releasing
    // the loop caches, so the returned (lazy) plan holds only literals
    val out = assignToCentroids(emb,
      cents.select(col("c_id"), col("c_vec")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq)
    prev.foreach(_.unpersist())
    if (!callerCached) vecs.unpersist()
    out
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. '23): k-means
    * the corpus, then inside each cluster drop every vector that has a
    * LOWER-id neighbor with cosine ≥ `minCosine` — one deterministic
    * representative (the lowest id) survives per semantic-duplicate set,
    * without computing a transitive closure. Returns the survivors as
    * (vec_id, centroid_id).
    *
    * Scale design — this is exactly why SemDeDup clusters first: the
    * pairwise cosine test runs only INSIDE clusters, so the self-join is
    * bucket-local (one shuffle per side on centroid_id, candidate volume
    * Σ cluster² instead of corpus²). k scales with the corpus to keep
    * clusters bounded; the assignment itself is the zero-shuffle
    * map-side argmax (assignToCentroids). The two join branches re-run
    * that map-side assignment rather than caching it — recompute is one
    * scan + argmax, cheaper at scale than pinning a corpus-sized cache.
    */
  def semanticDedup(spark: SparkSession, emb: DataFrame, k: Int = 8,
      iters: Int = 2, minCosine: Double = 0.95): DataFrame = {
    val assigned = kmeans(spark, emb, k, iters)
    val a = assigned.select(col("centroid_id"),
      col("vec_id").as("a_id"), col("embedding").as("a_vec"))
    val b = assigned.select(col("centroid_id"),
      col("vec_id").as("b_id"), col("embedding").as("b_vec"))
    val dropped = a.join(b, Seq("centroid_id"))
      .filter(col("a_id") < col("b_id") &&
        cosine(col("a_vec"), col("b_vec")) >= minCosine)
      .select(col("b_id").as("vec_id")).distinct()
    assigned.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("centroid_id"))
  }

  /** Symmetric per-vector int8 quantization — the standard embedding
    * compression step before shipping vectors to an ANN index (scale =
    * max|v|/127, q_i = round(v_i/scale) ∈ [-127, 127]). Returns per
    * vector the scale, the quantized checksums (exact integer sums, so
    * order-independent and oracle-hashable) and the worst reconstruction
    * error, scaled to nano-units per the Scoring determinism contract.
    * Pure map-side: one projection, no shuffle, survives any scale as a
    * scan. Zero vectors quantize to all-zero with zero error.
    */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val vd = transform(col("embedding"), x => x.cast("double"))
    val nano = (c: Column) => round(c * 1e9, 0).cast("long")
    emb.select(col("vec_id"), vd.as("vd"),
        (array_max(transform(vd, x => abs(x))) / lit(127.0)).as("scale"))
      .select(col("vec_id"), col("vd"), col("scale"),
        transform(col("vd"), x =>
          when(col("scale") === 0.0, lit(0.0))
            .otherwise(round(x / col("scale"), 0))).as("q"))
      .select(col("vec_id"),
        nano(col("scale")).as("scale_nano"),
        aggregate(col("q"), lit(0.0), (acc, x) => acc + x)
          .cast("long").as("q_sum"),
        aggregate(col("q"), lit(0.0), (acc, x) => acc + abs(x))
          .cast("long").as("q_l1"),
        nano(array_max(zip_with(col("vd"), col("q"),
          (x, qi) => abs(x - qi * col("scale"))))).as("max_err_nano"))
  }

  /** L2 norm of a float-vector column, quantized to integer micro-units
    * (round(‖v‖·1e6) as long). The micro quantization is what makes
    * norms SUMMABLE with a hash-checked oracle: integer sums are
    * order-independent, where a double sum depends on partial-
    * aggregation order (the llm.Scoring determinism contract).
    */
  def l2NormMicro(v: Column): Column =
    round(sqrt(aggregate(
      transform(v, x => x.cast("double") * x.cast("double")),
      lit(0.0d), (acc, x) => acc + x)) * 1e6, 0).cast("long")

  /** Element-wise mean embedding per group (the CentroidMean typed
    * Aggregator through the untyped-aggregation bridge): map-side
    * combinable, shuffle = groups × dim. The float-cast finish absorbs
    * double summation-order noise — the same contract the k-means
    * refine oracle relies on.
    */
  def meanPool(emb: DataFrame, groupCol: Column, dim: Int = 64): DataFrame =
    emb.groupBy(groupCol.as("group_id"))
      .agg(count(lit(1)).as("n_vecs"),
        udaf(new graft.functions.CentroidMean(dim),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
          .apply(col("embedding")).as("pooled"))

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
    * differently, so filter them out upstream. The centroid table rides
    * the plan as one reference object (NearestCentroidsExpr), so
    * thousands of buckets are fine; beyond memory-resident table sizes a
    * deployment would swap the map-side argmax for a broadcast
    * centroid-table join — the bucket-join shape downstream is
    * unchanged.
    */
  def ivfKnnJoin(spark: SparkSession, emb: DataFrame, k: Int = 5,
      nCentroids: Int = 0, nProbe: Int = 4, dim: Int = 64): DataFrame = {
    require(k >= 1 && nProbe >= 1,
      s"need nProbe >= 1 and k >= 1")
    val vecs = emb.filter(col("embedding").isNotNull)
    // nCentroids = 0 → the √n policy (autoCentroids), so a growing
    // corpus cannot silently keep 16 buckets and drift toward all-pairs
    val nCent =
      if (nCentroids > 0) nCentroids
      else math.max(autoCentroids(vecs.count()), nProbe)
    require(nCent >= nProbe, s"need nCentroids >= nProbe, got $nCent < $nProbe")
    val seeds = seedCentroids(vecs, nCent)
    // collected exactly once — no cache (see graphAnn: a cache() here
    // also pinned the refine aggregation's reduce partitions)
    val refined =
      kmeansRefine(spark, assignToCentroids(vecs, seeds), dim)
    val cents = refined.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val assigned = assignToCentroids(vecs, cents)
    // per-vector top-nProbe probe centroids — the same native kernel as
    // the assignment argmax, n = nProbe; map-side, no shuffle
    val probes = vecs.select(col("vec_id").as("q_id"),
        col("embedding").as("q_vec"),
        explode(nearestCentroids(col("embedding"), cents, nProbe))
          .as("probe_cid"))
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
    *
    * A per-partition bounded-heap pass runs BEFORE the window: each
    * partition keeps at most k candidates per query it sees, so the
    * window's shuffle moves ≤ partitions × queries × k rows instead of
    * every candidate (the IVF join feeds |corpus|·nProbe/nCentroids
    * candidates per query — at scale that shuffle, not the cosine math,
    * is the bottleneck). Partial top-k is exact: per-query global top-k
    * under the total order (sim desc, vec_id asc) survives any
    * partition-local pre-filter that keeps each partition's local top-k.
    */
  /** (q_id, vec_id, sim) row shape shared by the heap passes. */
  private val candSchema = new StructType()
    .add("q_id", LongType, nullable = false)
    .add("vec_id", LongType, nullable = false)
    .add("sim", DoubleType, nullable = false)

  private def topKPerQuery(cands: DataFrame, k: Int): DataFrame = {
    val partial = cands.select(col("q_id"), col("vec_id"), col("sim"))
      .mapPartitions { it =>
        val heaps = new java.util.HashMap[
          Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]()
        it.foreach { r =>
          if (!r.isNullAt(2)) {
            val h = heaps.computeIfAbsent(r.getLong(0), _ =>
              new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
                worstFirst))
            val cand = (r.getDouble(2), r.getLong(1))
            if (h.size < k) h.enqueue(cand)
            else if (worstFirst.compare(cand, h.head) < 0) {
              h.dequeue(); h.enqueue(cand)
            }
          }
        }
        import scala.jdk.CollectionConverters._
        heaps.entrySet().iterator().asScala.flatMap { e =>
          e.getValue.iterator.map { case (sim, id) => Row(e.getKey, id, sim) }
        }
      }(Encoders.row(candSchema))
    rankTail(partial, k)
  }

  /** Final exact ranking over already-bounded candidates: one window
    * pass, rounding only on output.
    */
  private def rankTail(bounded: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    bounded
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
      }(Encoders.row(candSchema))

    // partitions × queries × k survivors, already partition-bounded —
    // go straight to the ranking window (a second heap pass would only
    // add a serialization boundary)
    rankTail(partial, k)
  }

  /** Graph-based ANN — the HNSW-class retrieval structure (a routable
    * proximity graph + greedy beam search; HNSW's layer 0 IS a pruned
    * k-NN graph, and the published scalable builds construct it from
    * bucketed candidates exactly like this). Everything is
    * deterministic, so even the APPROXIMATE result is DuckDB-oracle-able
    * end to end — the same property that makes llm_knn_join_ivf
    * hash-verifiable:
    *
    *  BUILD: seeds → one k-means refine → each vector draws candidate
    *  neighbors from its top-`graphProbes` centroid buckets (map-side
    *  native argmax, no shuffle); exact cosine over bucket-co-resident
    *  pairs; keep top-`m` per vector by (sim DESC, id ASC). Candidate
    *  volume is Σ_buckets |b|² bounded by the √n centroid policy —
    *  never all-pairs.
    *
    *  SEARCH: each query is first ROUTED through the coarse centroid
    *  layer — its top-`entryProbes` centroids by cosine (the same
    *  map-side argmax the build uses; the centroid table is already
    *  collected) — and the beam starts from those buckets' entry
    *  points only (entry point of a bucket = its most central vector:
    *  argmax cosine to own centroid, ties to smaller id). This bounds
    *  entry fan-out at `entryProbes` per query regardless of corpus
    *  size (r9 verdict item 9: one-entry-per-bucket start meant √n
    *  initial beam rows per query under the auto-centroid policy —
    *  ~31k at n = 10⁹). Then `rounds` beam expansions — beam ∪
    *  out-neighbors(beam), re-ranked by exact cosine to the query,
    *  keep top-`efSearch` — then top-`k` of the final beam,
    *  self-matches excluded. Each round is one equi-join against the
    *  adjacency table + one bounded per-query rank; beam state is
    *  |queries|·efSearch rows, independent of corpus size.
    *  entryProbes = 0 restores the legacy all-buckets entry set (the
    *  exhaustive-entry variant, only sensible at small centroid
    *  counts).
    *
    * Recall scales with efSearch/rounds exactly as published graph-ANN
    * does; the planted-cluster spec pins recall ≥ 0.9 at the defaults.
    * `queries` must have (q_id: Long, q_vec: Array[Float]) columns.
    * Returns (q_id, vec_id, cosine) — cosine rounded only on output.
    *
    * nCentroids = 0 (the default) applies the √n autoCentroids policy —
    * the binding scale knob: with a FIXED bucket count the build's
    * candidate volume Σ|b|² grows quadratically (the r9 10× scale run
    * measured 50× cost for 10× data on the oracle-pinned 16), while √n
    * keeps it O(n^1.5). Explicit values are for oracled pipelines that
    * need a literal centroid count.
    */
  def graphAnn(spark: SparkSession, emb: DataFrame, queries: DataFrame,
      k: Int = 10, m: Int = 6, efSearch: Int = 24, rounds: Int = 3,
      nCentroids: Int = 0, graphProbes: Int = 2, dim: Int = 64,
      entryProbes: Int = 4)
      : DataFrame = {
    require(k >= 1 && m >= 1 && efSearch >= k && rounds >= 1,
      s"need k>=1, m>=1, efSearch>=k, rounds>=1")
    require(entryProbes >= 0, "entryProbes must be >= 0 (0 = all buckets)")
    import spark.implicits._
    // checkpointed (not cached) because the corpus is re-read by the
    // probe explode, the adjacency build, the entry argmax, and one
    // rescore per beam round — and a checkpoint is released by the
    // harness's Checkpoints.release walk over the returned plan, where
    // a cache() would leak across queries
    val allVecs = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    // Clone-cluster collapse (the r9 simhash lesson in vector space):
    // exact-duplicate embeddings — the dominant shape of real corpora
    // (boilerplate, mirrored documents) — all land in the same buckets,
    // so the |b|²-bounded adjacency build and every beam round pay
    // QUADRATICALLY in clone count (measured ~50× cost at the 10×-clone
    // sf1 sweep, round 12). Distinct vectors carry all the geometry:
    // build and search over one representative per distinct embedding
    // (min vec_id — pure equality grouping, no float hashing), expand
    // the final beam back to member ids; cosine depends only on the
    // vector, so members inherit the rep's score EXACTLY.
    val vecs = allVecs.groupBy(col("embedding"))
      .agg(min(col("vec_id")).as("vec_id"))
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val nCent =
      if (nCentroids > 0) nCentroids else autoCentroids(vecs.count())
    val seeds = seedCentroids(vecs, nCent)
    // collected exactly once — no cache (a cache() here also pinned the
    // refine aggregation's 32 reduce partitions, since cached plans skip
    // AQE coalescing; uncached, the collect runs with AQE)
    val refined = kmeansRefine(spark, assignToCentroids(vecs, seeds), dim)
    val cents = refined.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    // ---- build: bucketed m-NN adjacency (over distinct vectors) -----
    val probed = vecs.select(col("vec_id"), col("embedding"),
      explode(nearestCentroids(col("embedding"), cents, graphProbes))
        .as("cid"))
    val aSide = probed.select(col("cid"), col("vec_id").as("src"),
      col("embedding").as("src_vec"))
    val bSide = probed.select(col("cid"), col("vec_id").as("dst"),
      col("embedding").as("dst_vec"))
    val adj = aSide.join(bSide, Seq("cid"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        cosine(col("src_vec"), col("dst_vec")).as("sim"))
      .dropDuplicates("src", "dst")   // pair may share several buckets
      .withColumn("rn", row_number().over(
        Window.partitionBy("src").orderBy(col("sim").desc, col("dst").asc)))
      .filter(col("rn") <= m)
      .select(col("src"), col("dst"))
      .localCheckpoint(true)   // reused by every beam round
    // ---- entry points: most central vector per bucket ---------------
    val centDf = cents.toDF("c_id", "c_vec")
    val entries = assignToCentroids(vecs, cents)
      .join(broadcast(centDf), col("centroid_id") === col("c_id"))
      .select(col("centroid_id"),
        struct(cosine(col("embedding"), col("c_vec")).as("sim"),
          (-col("vec_id")).as("nid")).as("s"))
      .groupBy("centroid_id").agg(max(col("s")).as("s"))
      .select(col("centroid_id"), (-col("s.nid")).as("vec_id"))
    val q = queries.select(col("q_id"), col("q_vec")).localCheckpoint(true)
    // ---- search: coarse routing, then beam expansion rounds ---------
    // entry routing is the same map-side centroid argmax as the build's
    // probe step — no shuffle, fan-out fixed at entryProbes per query
    var beam =
      if (entryProbes > 0)
        q.select(col("q_id"),
            explode(nearestCentroids(col("q_vec"), cents, entryProbes))
              .as("centroid_id"))
          .join(entries, Seq("centroid_id"))
          .select(col("q_id"), col("vec_id")).distinct()
      else
        q.select(col("q_id"))
          .crossJoin(entries.select("vec_id").distinct())
          .select(col("q_id"), col("vec_id"))
    def rescore(cand: DataFrame): DataFrame = cand
      .join(vecs, Seq("vec_id"))
      .join(q, Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("embedding"), col("q_vec")).as("sim"))
    for (_ <- 1 to rounds) {
      val nbrs = beam.join(adj, beam("vec_id") === adj("src"))
        .select(col("q_id"), col("dst").as("vec_id"))
      // ONE exchange per round (guide §2.4): rescore first (broadcast
      // joins — beam is the tiny build side, so they impose no
      // distribution), then establish the q_id partitioning once and let
      // BOTH the duplicate-drop (grouping keys ⊇ partition key) and the
      // rank window reuse it. The old shape paid two exchanges per round:
      // distinct's (q_id, vec_id) hash plus the window's q_id hash.
      // Duplicates between beam and nbrs are rescored redundantly before
      // the drop — identical rows (cosine is deterministic), bounded by
      // 2× the beam.
      beam = rescore(beam.union(nbrs))
        .repartition(col("q_id"))
        .dropDuplicates("q_id", "vec_id")
        .withColumn("rn", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("vec_id").asc)))
        .filter(col("rn") <= efSearch)
        .select(col("q_id"), col("vec_id"))
    }
    // ---- expand: rep beam → every member id sharing the embedding ---
    // (members inherit the rep's exact cosine; the self-exclusion moves
    // to the member id so a query's exact TWINS remain legitimate
    // cosine-1.0 results while the query row itself never self-matches)
    val members = allVecs
      .join(vecs.select(col("vec_id").as("rep_id"), col("embedding")),
        Seq("embedding"))
      .select(col("rep_id"), col("vec_id").as("member_id"))
    rescore(beam)
      .join(members, col("vec_id") === col("rep_id"))
      .select(col("q_id"), col("member_id").as("vec_id"), col("sim"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("rn", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("vec_id").asc)))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), round(col("sim"), 6).as("cosine"))
  }

  // ---- product quantization (PQ + ADC; Jégou et al. 2011) -------------

  /** Trained PQ codebook: `m` contiguous subspaces of `subDim` dims,
    * `kCodes` codes per subspace; `books(mIdx * kCodes + c)` is the code
    * vector. Driver-held by construction: m·kCodes rows of subDim floats
    * (8·16·8 floats = 4 KB at the defaults) regardless of corpus size.
    */
  final case class PqModel(m: Int, kCodes: Int, subDim: Int,
      books: IndexedSeq[Seq[Float]]) {
    require(books.length == m * kCodes,
      s"PqModel: expected ${m * kCodes} codebook rows, got ${books.length}")
  }

  private def pqEncodeCol(emb: Column, books: Seq[Seq[Float]],
      kCodes: Int): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    graft.functions.GraftFunctions.register(spark)
    call_function("graft_pq_encode", emb, typedLit(books), lit(kCodes))
  }

  /** Train a product quantizer: seed each subspace's codebook with the
    * subvectors of the `kCodes` lowest-vec_id embeddings (the same
    * deterministic seeding contract as seedCentroids), then run
    * `refineIters` Lloyd iterations per subspace — encode (map-side
    * argmin, broadcast codebook, NO shuffle) and replace each code with
    * the element-wise mean of its assigned subvectors (CentroidMean,
    * map-side combinable; a code with no members keeps its previous
    * vector so the codebook never loses rows and indices never shift).
    *
    * Scale: each iteration is one corpus scan + one (m·corpus)-row
    * aggregation keyed by (subspace, code) — m·kCodes groups, so the
    * reduce side is trivially small; nothing corpus-sized is collected
    * (the codebook itself is m·kCodes·subDim floats on the driver).
    */
  def pqTrain(spark: SparkSession, emb: DataFrame, kCodes: Int = 16,
      subDim: Int = 8, refineIters: Int = 1): PqModel = {
    require(kCodes >= 1 && subDim >= 1 && refineIters >= 0)
    val seedRows = emb.orderBy(col("vec_id").asc).limit(kCodes)
      .select("embedding").collect().map(_.getSeq[Float](0))
    require(seedRows.nonEmpty, "pqTrain: empty corpus")
    val dim = seedRows.head.length
    require(dim % subDim == 0,
      s"pqTrain: dim $dim not divisible by subDim $subDim")
    val m = dim / subDim
    val kEff = math.min(kCodes, seedRows.length)
    var books: IndexedSeq[Seq[Float]] =
      for (mi <- 0 until m; c <- 0 until kEff)
        yield seedRows(c).slice(mi * subDim, (mi + 1) * subDim)
    var it = 0
    while (it < refineIters) {
      val enc = emb.select(col("embedding"),
        pqEncodeCol(col("embedding"), books, kEff).as("codes"))
      val means = enc
        .select(col("embedding"), posexplode(col("codes")).as(Seq("mi", "code")))
        .select(col("mi"), col("code"),
          slice(col("embedding"), col("mi") * subDim + 1, lit(subDim)).as("sub"))
        .groupBy("mi", "code")
        .agg(udaf(new graft.functions.CentroidMean(subDim),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
          .apply(col("sub")).as("bv"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2)).toMap
      books = for (mi <- 0 until m; c <- 0 until kEff)
        yield means.getOrElse((mi, c), books(mi * kEff + c))
      it += 1
    }
    PqModel(m, kEff, subDim, books)
  }

  /** Encode the corpus: (vec_id, codes array<int> of length m). One
    * map-side scan with the broadcast codebook — the 100 TB contract:
    * the encoded table is m small ints per vector (m bytes once stored),
    * a 32× size reduction at 64-dim/8-subspace defaults, and it is what
    * every ADC query scans INSTEAD of the float corpus.
    */
  def pqEncode(emb: DataFrame, model: PqModel): DataFrame =
    emb.select(col("vec_id"),
      pqEncodeCol(col("embedding"), model.books, model.kCodes).as("codes"))

  /** Per-subspace ADC lookup tables for one query: micro-unit integer
    * L2 distances from the query's subvector to every code vector
    * (round(1e6·Σ(x−y)²) — integer so the per-row sum over subspaces is
    * association-order-independent, the Scoring determinism contract).
    */
  def pqAdcTables(model: PqModel, query: Seq[Float]): Seq[Seq[Long]] =
    for (mi <- 0 until model.m) yield
      for (c <- 0 until model.kCodes) yield {
        val bv = model.books(mi * model.kCodes + c)
        var d = 0.0
        var j = 0
        while (j < model.subDim) {
          val qj = if (mi * model.subDim + j < query.length)
            query(mi * model.subDim + j).toDouble else 0.0
          val diff = qj - bv(j).toDouble
          d += diff * diff
          j += 1
        }
        math.round(d * 1e6)
      }

  /** Asymmetric-distance top-k over the ENCODED corpus: per row, sum the
    * per-subspace table entries selected by the codes (zip_with +
    * integer fold — whole-stage-codegen'd builtins, no UDF) and take the
    * k smallest. TakeOrderedAndProject: only k rows per partition reach
    * the driver merge; the scan reads m ints per vector, never the
    * embeddings. Approximate by construction (quantization error);
    * recall is floor-pinned in the spec against exact brute force.
    */
  def pqAdcTopK(encoded: DataFrame, model: PqModel, query: Seq[Float],
      k: Int): DataFrame = {
    val tables = pqAdcTables(model, query)
    encoded.select(col("vec_id"),
        aggregate(
          zip_with(col("codes"), typedLit(tables),
            (c, t) => element_at(t, c + lit(1))),
          lit(0L), (acc, x) => acc + x).as("adc_micro"))
      .orderBy(col("adc_micro").asc, col("vec_id").asc)
      .limit(k)
  }

  /** ADC shortlist → exact re-rank, the production PQ serving shape:
    * the corpus-sized scan touches ONLY the encoded table (m ints per
    * vector); the float embeddings are read for just the `shortlist`
    * surviving ids via a broadcast semi-join (shortlist is k-bounded —
    * rows on the driver ≤ shortlist, never corpus-sized). The exact
    * distance quantizes per-dimension to integer micro-units
    * (round(diff²·1e6), the Scoring determinism idiom) so the 64-term
    * sum is association-order-independent and DuckDB-replayable.
    */
  /** IVF+PQ index build (FAISS IVFPQ with `by_residual=false` — one
    * GLOBAL codebook instead of per-bucket residual encoding; the
    * residual variant buys recall at the cost of per-centroid ADC
    * tables, and the no-residual form is the documented FAISS option
    * this engine pins because it keeps query tables bucket-independent
    * and the whole pipeline DuckDB-replayable). One map-side projection
    * computes BOTH the coarse assignment (inlined centroid argmax) and
    * the PQ codes (broadcast codebook) — zero shuffles, one corpus scan.
    * The index row is (vec_id, centroid_id, m small ints): written
    * partitioned by centroid_id it is the 100 TB layout — a probe is a
    * partition-pruned scan of m ints per vector, floats never read.
    */
  def ivfPqIndex(emb: DataFrame, cents: Seq[(Long, Seq[Float])],
      model: PqModel): DataFrame =
    emb.select(col("vec_id"),
      element_at(nearestCentroids(col("embedding"), cents, 1), 1)
        .as("centroid_id"),
      pqEncodeCol(col("embedding"), model.books, model.kCodes).as("codes"))

  /** IVF+PQ query: rank centroids for the query (cosine, the coarse
    * quantizer's own metric — k_c rows, driver-side like ivfTopK), prune
    * the index scan to the `nProbe` probed buckets, and ADC-rank the
    * survivors by micro-unit integer L2. Candidate volume is
    * Σ probed-bucket sizes ≈ n·nProbe/k_c (the IVF contract) and each
    * candidate costs m table lookups over the encoded ints — the float
    * corpus is never touched at query time. Approximate on two axes
    * (bucket miss + quantization error), both deterministic, so the
    * result hash-verifies against the composed KmOracle+PqOracle replay.
    */
  def ivfPqTopK(index: DataFrame, centroids: DataFrame, model: PqModel,
      query: Seq[Float], k: Int, nProbe: Int = 4): DataFrame = {
    val probeIds = centroids
      .select(col("c_id"), cosine(col("c_vec"), litVec(query)).as("sim"))
      .orderBy(col("sim").desc, col("c_id").asc)
      .limit(nProbe)
      .collect().map(_.getLong(0))
    val tables = pqAdcTables(model, query)
    index.filter(col("centroid_id").isin(probeIds: _*))
      .select(col("vec_id"),
        aggregate(
          zip_with(col("codes"), typedLit(tables),
            (c, t) => element_at(t, c + lit(1))),
          lit(0L), (acc, x) => acc + x).as("adc_micro"))
      .orderBy(col("adc_micro").asc, col("vec_id").asc)
      .limit(k)
  }

  def pqAdcRerank(emb: DataFrame, encoded: DataFrame, model: PqModel,
      query: Seq[Float], k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"pqAdcRerank: shortlist $shortlist < k $k")
    val cand = pqAdcTopK(encoded, model, query, shortlist).select("vec_id")
    emb.join(broadcast(cand), "vec_id")
      .select(col("vec_id"),
        aggregate(
          zip_with(col("embedding"), typedLit(query), (x, y) => {
            val d = x.cast("double") - y.cast("double")
            round(d * d * lit(1e6), 0).cast("long")
          }),
          lit(0L), (acc, x) => acc + x).as("l2_micro"))
      .orderBy(col("l2_micro").asc, col("vec_id").asc)
      .limit(k)
  }
}
