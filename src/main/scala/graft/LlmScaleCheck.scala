package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity for the round-3 operators (the OperatorScaleCheck
  * pattern): run at 2-3 orders of magnitude above the sf0.1 bench corpus
  * and validate exactness where brute force is feasible, planted-pair
  * recall where it is not (completeness of prefix filtering is
  * theorem-backed and spec-pinned at small scale; what scale adds is
  * evidence the plan SHAPE survives — no collect blow-ups, no quadratic
  * stage, wall-clock sane).
  *
  * Usage: runMain graft.LlmScaleCheck [nDocs] [nVecs] [nRows]
  * Defaults: 200k docs / 1M vectors / 20M percentile rows.
  */
object LlmScaleCheck {

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200_000L)
    val nVecs = args.lift(1).map(_.toLong).getOrElse(1_000_000L)
    val nRows = args.lift(2).map(_.toLong).getOrElse(20_000_000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- jaccardNearDup: 200k synthetic docs + 1k planted near-dups ---
    // 40 words per doc from a ~65k-word hash vocabulary (few accidental
    // shingle collisions); each planted twin changes one middle word →
    // Jaccard ≈ 35/41 ≈ 0.85, comfortably above the 0.6 threshold.
    val nPlant = 1000L
    val words = (0 until 40).map(j =>
      concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(65536L))))
    val base = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", words: _*).as("text"))
    val twins = spark.range(nPlant).select(
      (col("id") + 10_000_000L).as("doc_id"),
      concat_ws(" ", words.zipWithIndex.map { case (w, j) =>
        if (j == 20) lit("CHANGED") else w
      }: _*).as("text"))
    val docs = base.union(twins)
    var t0 = System.nanoTime()
    val pairs = graft.llm.Dedup.jaccardNearDup(docs, w = 3,
      minJacNum = 3, minJacDen = 5)
    val nPairs = pairs.count()
    val jacSec = (System.nanoTime() - t0) / 1e9
    println(f"[scale] jaccard: ${nDocs + nPlant} docs -> $nPairs pairs in $jacSec%.1f s")
    // every planted (id, id+10M) twin must be found — recall 1.0, no LSH luck
    val found = pairs
      .filter(col("id_b") === col("id_a") + 10_000_000L &&
        col("id_a") < nPlant)
      .count()
    require(found == nPlant, s"planted-twin recall $found/$nPlant")
    println(s"[scale] jaccard: planted-twin recall $found/$nPlant OK")
    graft.core.Checkpoints.release(pairs)

    // ---- knnJoin: 1M 16-dim vectors, 8 queries, planted duplicates ----
    // query q's exact duplicate is planted at id q+5M and must rank 1st;
    // full exactness cross-checked against a crossJoin brute force for
    // the same 8 queries (8M cosines — feasible, unlike all-pairs).
    val dim = 16
    val vecExpr = array((0 until dim).map(j =>
      ((pmod(xxhash64(col("vec_id"), lit(j)), lit(2000L)) - 1000.0)
        / 1000.0).cast("float")): _*)
    val nQ = 8
    val corpus0 = spark.range(nVecs).select(col("id").as("vec_id"))
      .select(col("vec_id"), vecExpr.as("embedding"))
    // the planted twin carries query q's exact vector (hash of q, id
    // shifted only in the output alias)
    val dups = spark.range(nQ).select(col("id").as("q"))
      .select((col("q") + 5_000_000L).as("vec_id"),
        array((0 until dim).map(j =>
          ((pmod(xxhash64(col("q"), lit(j)), lit(2000L)) - 1000.0)
            / 1000.0).cast("float")): _*).as("embedding"))
    val corpus = corpus0.union(dups)
    val queries = corpus0.filter(col("vec_id") < nQ)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).sortBy(_._1).toSeq
    t0 = System.nanoTime()
    val knn = graft.llm.Similarity.knnJoin(corpus, queries, k = 5).cache()
    val nKnn = knn.count()
    val knnSec = (System.nanoTime() - t0) / 1e9
    println(f"[scale] knn: ${nVecs + nQ} vecs x $nQ queries -> $nKnn rows in $knnSec%.1f s")
    val ranked = knn.collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(-_.getDouble(2)).head
      }
    (0 until nQ).foreach { q =>
      val top = ranked(q.toLong)
      require(top.getLong(1) == q + 5_000_000L && top.getDouble(2) == 1.0,
        s"query $q top-1 = (${top.getLong(1)}, ${top.getDouble(2)}), " +
          "expected its planted duplicate at cosine 1.0")
    }
    println(s"[scale] knn: planted-duplicate top-1 for all $nQ queries OK")
    // brute force over the same queries (8M-row crossJoin, window top-k)
    val qdf = corpus0.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    val brute = corpus.crossJoin(qdf).filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim",
        graft.llm.Similarity.cosine(col("embedding"), col("qv")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("q_id"), col("vec_id"), round(col("sim"), 6).as("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = knn.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    require(got == brute, "knn mismatch vs crossJoin brute force")
    println(s"[scale] knn: ≡ brute force on all $nQ queries (${got.size} rows) OK")
    knn.unpersist()

    // ---- ivfKnnJoin: 40k vectors (20k + a twin each), corpus-vs-corpus
    // Every vector is a query here, so candidate volume is
    // n · nProbe · bucketSize — the knob that keeps it off all-pairs is
    // nCentroids. Twin recall must be 1.0 (identical vectors share every
    // probe), which exercises bucket assignment + join end to end at
    // 20× the bench corpus.
    val nIvf = 20_000L
    val ivfBase = spark.range(nIvf).select(col("id").as("vec_id"))
      .select(col("vec_id"), vecExpr.as("embedding"))
    val ivfTwins = ivfBase.select((col("vec_id") + 20_000_000L).as("vec_id"),
      col("embedding"))
    t0 = System.nanoTime()
    val ivfOut = graft.llm.Similarity.ivfKnnJoin(spark,
        ivfBase.union(ivfTwins), k = 3, nCentroids = 64, nProbe = 2)
      .cache()
    val nIvfRows = ivfOut.count()
    val ivfSec = (System.nanoTime() - t0) / 1e9
    println(f"[scale] ivf-knn: ${2 * nIvf} vecs -> $nIvfRows rows in $ivfSec%.1f s")
    val twinHits = ivfOut
      .filter(col("vec_id") === col("q_id") + 20_000_000L &&
        col("cosine") === 1.0)
      .count()
    require(twinHits == nIvf,
      s"ivf twin recall $twinHits/$nIvf (base-side queries)")
    println(s"[scale] ivf-knn: twin recall $twinHits/$nIvf OK")
    ivfOut.unpersist()

    // ---- DistributedPercentile: 20M rows, 5 groups, vs built-in -------
    val pr = spark.range(nRows).select(
      pmod(col("id"), lit(5L)).cast("string").as("g"),
      (pmod(xxhash64(col("id"), lit(9)), lit(1_000_000L)).cast("double")
        / 997.0).as("v"))
    t0 = System.nanoTime()
    val sel = graft.operators.DistributedPercentile.exact(
      pr, "g", "v", Seq("p50" -> 0.5, "p99" -> 0.99), buckets = 64)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    val pSec = (System.nanoTime() - t0) / 1e9
    println(f"[scale] percentile: $nRows rows in $pSec%.1f s (selection)")
    val builtin = pr.groupBy(col("g"))
      .agg(expr("percentile(v, array(0.5, 0.99))").as("ps"))
      .collect().map(r => r.getString(0) -> {
        val s = r.getSeq[Double](1); (s(0), s(1))
      }).toMap
    require(sel == builtin,
      s"selection percentiles != built-in: $sel vs $builtin")
    println(s"[scale] percentile: bit-identical to built-in on ${sel.size} groups OK")

    // ---- minhashNearDup at 201k docs, planted EXACT duplicates --------
    // an exact twin shares the full signature, hence every band → LSH
    // recall is structurally 1.0 (no hash luck); exercises the
    // md5-family signatures + value-keyed banding + verify join at
    // 40× the bench corpus
    val mhTwins = spark.range(nPlant).select(
      (col("id") + 30_000_000L).as("doc_id"),
      concat_ws(" ", words: _*).as("text"))
    t0 = System.nanoTime()
    val mhPairs = graft.llm.Dedup.minhashNearDup(base.union(mhTwins),
      w = 3, k = 32, bands = 8, minJaccard = 0.9)
    val mhFound = mhPairs
      .filter(col("id_b") === col("id_a") + 30_000_000L &&
        col("id_a") < nPlant && col("jaccard") === 1.0)
      .count()
    val mhSec = (System.nanoTime() - t0) / 1e9
    require(mhFound == nPlant, s"minhash exact-twin recall $mhFound/$nPlant")
    println(f"[scale] minhash: ${nDocs + nPlant} docs, exact-twin recall $mhFound/$nPlant in $mhSec%.1f s")
    graft.core.Checkpoints.release(mhPairs)

    // ---- bm25 + bigramNll + invertedIndex over the synthetic corpus ---
    // `docs` reuses the jaccard corpus (~200k 40-token docs, ~65k-word
    // vocabulary). Query terms are hash-vocabulary words: each appears
    // in ~ 40/65536 of docs, so dfs are in the hundreds — a realistic
    // selective retrieval query.
    val bmTerms = Seq("w0", "w7", "w123", "w4096")
    t0 = System.nanoTime()
    val bm = graft.llm.Scoring.bm25(docs, bmTerms).cache()
    val bmRows = bm.count()
    val bmSec = (System.nanoTime() - t0) / 1e9
    val bmBad = bm.filter(col("n_matched") > bmTerms.size ||
      col("score") <= 0.0).count()
    require(bmRows > 0 && bmBad == 0,
      s"bm25: $bmRows rows, $bmBad violate n_matched<=|terms| / score>0")
    println(f"[scale] bm25: ${nDocs + nPlant} docs -> $bmRows scored in $bmSec%.1f s")
    bm.unpersist(); graft.core.Checkpoints.release(bm)

    t0 = System.nanoTime()
    val lm = graft.llm.Scoring.bigramNll(docs).cache()
    val lmRows = lm.count()
    val lmSec = (System.nanoTime() - t0) / 1e9
    // every doc has 40 tokens → 39 bigrams → exactly one row per doc,
    // positive NLL (probabilities are < 1 under add-k smoothing)
    val lmBad = lm.filter(col("n_bigrams") =!= 39 || col("avg_nll") <= 0.0)
      .count()
    require(lmRows == nDocs + nPlant && lmBad == 0,
      s"bigramNll: $lmRows rows (want ${nDocs + nPlant}), $lmBad bad")
    println(f"[scale] bigram-nll: $lmRows docs scored in $lmSec%.1f s")
    lm.unpersist(); graft.core.Checkpoints.release(lm)

    t0 = System.nanoTime()
    val inv = graft.llm.Scoring.invertedIndex(docs, shards = 64)
    val invRows = inv.count()
    val invSec = (System.nanoTime() - t0) / 1e9
    require(invRows > 0, "invertedIndex: empty")
    println(f"[scale] inverted-index: $invRows (tok,shard) rows in $invSec%.1f s")

    // ---- contaminationBloom ≡ contamination at 20× bench scale --------
    // bench = 10k docs → ~380k distinct shingles → a 4M-bit filter; the
    // equality check proves the bloom pre-filter + exact verify rebuilds
    // the broadcast operator's result bit-for-bit at scale.
    val benchDocs = docs.filter(col("doc_id") < 10_000L)
    t0 = System.nanoTime()
    val cb = graft.llm.Curation.contaminationBloom(docs, benchDocs, w = 5)
      .cache()
    val cbRows = cb.count()
    val cbSec = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val cbx = graft.llm.Curation.contamination(docs, benchDocs, w = 5).cache()
    cbx.count()
    val cxSec = (System.nanoTime() - t0) / 1e9
    val diff = cb.as("a").join(cbx.as("b"), Seq("doc_id"), "full_outer")
      .filter(coalesce(col("a.n_ngrams"), lit(-1L)) =!=
          coalesce(col("b.n_ngrams"), lit(-1L)) ||
        coalesce(col("a.n_contaminated"), lit(-1L)) =!=
          coalesce(col("b.n_contaminated"), lit(-1L)))
      .count()
    require(diff == 0, s"contaminationBloom != contamination on $diff docs")
    println(f"[scale] contamination: bloom $cbSec%.1f s ≡ broadcast $cxSec%.1f s over $cbRows docs OK")
    cb.unpersist(); cbx.unpersist()
    graft.core.Checkpoints.release(cb); graft.core.Checkpoints.release(cbx)

    // ---- assignToCentroids at 1024 centroids (the de-capped path) -----
    // The literal-struct formulation this replaced died (plan/codegen
    // blow-up) near ~100 centroids; the reference-object kernel must
    // handle 1024 as one map-side projection over the 1M-vector corpus.
    val centSeeds = corpus0.filter(col("vec_id") < 1024L)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    // one timed pass that folds every validated property into a single
    // aggregate — separate count() actions on the uncached frame would
    // each recompute the full assignment and double-count the seconds
    val centIds = centSeeds.map(_._1).toSet
    t0 = System.nanoTime()
    val asgRow = graft.llm.Similarity.assignToCentroids(corpus0, centSeeds)
      .agg(count(lit(1)).as("rows"),
        sum(when(!col("centroid_id").isin(centIds.toSeq: _*), 1L)
          .otherwise(0L)).as("bad"),
        sum(when(col("vec_id") < 1024L &&
          col("vec_id") === col("centroid_id"), 1L).otherwise(0L)).as("self"))
      .collect().head
    val asgSec = (System.nanoTime() - t0) / 1e9
    val (asgRows, asgBad, selfOk) =
      (asgRow.getLong(0), asgRow.getLong(1), asgRow.getLong(2))
    require(asgRows == nVecs && asgBad == 0,
      s"assign: $asgRows rows (want $nVecs), $asgBad outside centroid set")
    // a vector that IS centroid j must assign to j (cosine 1 with
    // itself; distinct hash vectors make exact ties vanishingly rare)
    require(selfOk == 1024L, s"self-assignment $selfOk/1024")
    println(f"[scale] assign: $nVecs vecs x 1024 centroids in $asgSec%.1f s, self-assignment 1024/1024 OK")

    // ---- crossNearDup: 201k corpus × 1k bench, planted paraphrases ----
    // The bench side is every 200th base doc with ONE word changed — a
    // paraphrase exact n-gram contamination would score low on, but
    // Jaccard = 35/41 ≈ 0.854 flags. LSH recall at that similarity is
    // probabilistic BY DESIGN: a 4-row band matches with 0.854⁴ ≈ 0.53,
    // any of 8 bands with 1−(1−0.53)⁸ ≈ 0.998 — so assert ≥ 99% (the
    // observed 4/1000 misses are the S-curve working as specified, and
    // exactly what the minJaccard=0.6 operating point promises at 0.85).
    // Structural recall 1.0 holds only for identical texts; that case is
    // pinned by the exact-twin sections above and the LlmOpsSpec copy.
    // bench ids offset by +60M: equal-id pairs are excluded by the
    // operator's self-pair contract, and these are DIFFERENT documents
    // that happen to paraphrase corpus docs — the realistic shape
    val xBench = spark.range(nPlant).select((col("id") * 200).as("id"))
      .select((col("id") + 60_000_000L).as("doc_id"),
        concat_ws(" ", words.zipWithIndex.map { case (w, j) =>
          if (j == 20) lit("XBENCH") else w
        }: _*).as("text"))
    t0 = System.nanoTime()
    val xFlagged = graft.llm.Dedup.crossNearDup(docs, xBench,
      w = 3, k = 32, bands = 8, minJaccard = 0.6).cache()
    val xRows = xFlagged.count()
    val xSec = (System.nanoTime() - t0) / 1e9
    val xHits = xFlagged.filter(col("doc_id") % 200 === 0 &&
      col("doc_id") < nPlant * 200).count()
    require(xHits >= (nPlant * 99L) / 100L,
      s"crossNearDup planted-paraphrase recall $xHits/$nPlant (< 99%)")
    println(f"[scale] cross-neardup: ${nDocs + nPlant} docs x $nPlant bench " +
      f"-> $xRows flagged in $xSec%.1f s, paraphrase recall $xHits/$nPlant OK")
    xFlagged.unpersist()
    graft.core.Checkpoints.release(xFlagged)

    // ---- autoCentroids policy: buckets stay bounded as n grows --------
    // With nCentroids = 0 (the default) the √n policy sizes the index:
    // mean bucket ≈ √n at every scale, so candidate volume per query
    // stays O(nProbe·√n) instead of silently drifting toward all-pairs
    // on a fixed 16-bucket index. Checked at two corpus sizes: centroid
    // count matches the policy, mean bucket tracks √n, and the largest
    // bucket stays within a constant factor of the mean.
    var autoSec = 0.0
    Seq(nVecs / 4, nVecs).foreach { n =>
      val sub = corpus0.filter(col("vec_id") < n)
      val kAuto = graft.llm.Similarity.autoCentroids(n)
      t0 = System.nanoTime()
      val stats = graft.llm.Similarity.ivfAssign(spark, sub)
        .groupBy("centroid_id").count()
        .agg(count(lit(1)).as("nb"), max("count").as("mx"),
          avg("count").as("mean"))
        .collect().head
      autoSec += (System.nanoTime() - t0) / 1e9
      val (nB, maxB, meanB) =
        (stats.getLong(0), stats.getLong(1), stats.getDouble(2))
      require(nB == kAuto.toLong,
        s"autoCentroids($n): $nB buckets, policy says $kAuto")
      require(meanB <= 4.0 * math.sqrt(n.toDouble),
        f"autoCentroids($n): mean bucket $meanB%.0f drifted off √n")
      require(maxB <= 20.0 * meanB,
        f"autoCentroids($n): max bucket $maxB vs mean $meanB%.0f — skew unbounded")
      println(f"[scale] auto-ivf: n=$n k=$kAuto mean=$meanB%.0f max=$maxB OK")
    }
    println(f"[scale] auto-ivf: √n policy bucket boundedness at 2 scales in $autoSec%.1f s")

    // ---- paragraphDedup at ~201k docs, planted full-document copies ---
    // copies of the first nPlant docs (ids +40M) must reassemble to
    // empty (every chunk seen earlier); the hash-vocabulary originals
    // have globally unique chunks and must survive intact
    val pdTwins = spark.range(nPlant).select(
      (col("id") + 40_000_000L).as("doc_id"),
      concat_ws(" ", words: _*).as("text"))
    t0 = System.nanoTime()
    val pd = graft.llm.Dedup.paragraphDedup(base.union(pdTwins),
      chunkSize = 16).cache()
    val pdRows = pd.count()
    val pdSec = (System.nanoTime() - t0) / 1e9
    val pdCopyBad = pd.filter(col("doc_id") >= 40_000_000L &&
      (col("n_kept") =!= 0L || col("text_dedup") =!= lit(""))).count()
    val pdOrigBad = pd.filter(col("doc_id") < 40_000_000L &&
      col("n_kept") =!= col("n_chunks")).count()
    require(pdRows == nDocs + nPlant && pdCopyBad == 0 && pdOrigBad == 0,
      s"paragraphDedup: $pdRows rows, $pdCopyBad surviving copies, " +
        s"$pdOrigBad truncated originals")
    println(f"[scale] paragraph-dedup: $pdRows docs in $pdSec%.1f s, " +
      s"all $nPlant planted copies emptied OK")
    pd.unpersist()

    // ---- semanticDedup at 200k vectors, 256 clusters ------------------
    // 100k hash vectors + an exact twin each (+50M): SemDeDup's contract
    // is that the bucket-local pairwise test sees every twin (identical
    // vectors share a cluster), so survivors = exactly the originals.
    // 256 clusters keep buckets ~800 wide — the Σ cluster² candidate
    // volume stays ~12⁸, streamed through the join filter, never
    // materialized.
    val nSem = 100_000L
    val semBase = spark.range(nSem).select(col("id").as("vec_id"))
      .select(col("vec_id"), vecExpr.as("embedding"))
    val semTwins = semBase.select((col("vec_id") + 50_000_000L).as("vec_id"),
      col("embedding"))
    t0 = System.nanoTime()
    val sem = graft.llm.Similarity.semanticDedup(spark,
      semBase.union(semTwins), k = 256, iters = 1, minCosine = 0.95).cache()
    val semRows = sem.count()
    val semSec = (System.nanoTime() - t0) / 1e9
    val semKeptOrig = sem.filter(col("vec_id") < nSem).count()
    // every planted twin must drop (its original is a lower-id cosine-1.0
    // neighbor in the same cluster) → all survivors are originals. A few
    // ORIGINALS also drop legitimately: at 100k 16-dim hash vectors,
    // natural cosine ≥ 0.95 pairs exist (observed ~35), and dropping the
    // higher id of each IS the operator's contract — so bound, don't pin.
    require(semRows == semKeptOrig && semRows >= (nSem * 999L) / 1000L,
      s"semanticDedup: $semRows survivors, $semKeptOrig originals " +
        s"(want all-original, ≥ ${(nSem * 999L) / 1000L})")
    println(f"[scale] semantic-dedup: ${2 * nSem} vecs -> $semRows " +
      f"survivors in $semSec%.1f s, all ${nSem} twins dropped, " +
      f"${nSem - semRows} natural near-dups collapsed OK")
    sem.unpersist()

    // ---- quantizeInt8 over the 1M-vector corpus (map-side) ------------
    // single timed pass (same one-aggregate shape as the assign check)
    t0 = System.nanoTime()
    val qzRow = graft.llm.Similarity.quantizeInt8(corpus0)
      .agg(count(lit(1)).as("rows"),
        sum(when(col("max_err_nano") > col("scale_nano") / 2 + 1, 1L)
          .otherwise(0L)).as("bad"))
      .collect().head
    val qzSec = (System.nanoTime() - t0) / 1e9
    val (qzRows, qzBad) = (qzRow.getLong(0), qzRow.getLong(1))
    require(qzRows == nVecs && qzBad == 0,
      s"quantize: $qzRows rows, $qzBad exceed half-step error")
    println(f"[scale] quantize: $nVecs vecs in $qzSec%.1f s, " +
      "reconstruction within half-step everywhere OK")

    // ---- shuffleShards: 2M docs, exact per-shard permutations ---------
    val nShuf = 2_000_000L
    val shufDocs = spark.range(nShuf).select(col("id").as("doc_id"))
    t0 = System.nanoTime()
    val sharded = graft.llm.Curation.shuffleShards(shufDocs, nShards = 16)
      .cache()
    val shardStats = sharded.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("d")).collect()
    val shufSec = (System.nanoTime() - t0) / 1e9
    require(shardStats.length == 16 &&
      shardStats.forall(r => r.getLong(2) == 1L &&
        r.getLong(3) == r.getLong(1) && r.getLong(4) == r.getLong(1)),
      s"shuffleShards: shard positions are not exact permutations")
    // order consistency on a sample: within a shard, pos must order
    // exactly like the md5 shuffle key it was derived from
    val sample = sharded.filter(pmod(xxhash64(col("doc_id")), lit(200L)) === 0)
      .withColumn("skey",
        md5(concat(lit("shuf:"), col("doc_id").cast("string"))))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getString(3)))
    sample.groupBy(_._1).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._2).map(_._3)
      require(byPos.sameElements(byPos.sorted),
        "shuffleShards: pos order does not match shuffle-key order")
    }
    sharded.unpersist()
    println(f"[scale] shuffle-shards: $nShuf%,d docs -> 16 exact " +
      f"permutations in $shufSec%.1f s (${sample.length} sampled for order)")

    // ---- domainMixture: 2M docs over 6 heavily skewed domains ---------
    val nMix = 2_000_000L
    val mixWords = (0 until 12).map(j =>
      concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(65536L))))
    val h = pmod(xxhash64(col("id"), lit(7)), lit(100L))
    val mixDocs = spark.range(nMix).select(col("id").as("doc_id"),
      concat_ws(" ", mixWords: _*).as("text"),
      when(h < 50, "d0").when(h < 75, "d1").when(h < 87, "d2")
        .when(h < 94, "d3").when(h < 98, "d4").otherwise("d5").as("lang"))
      .cache()
    // τ = 0.25 keeps even the 2% domain's rate below 1.0 (no clamping),
    // so expected size is exactly τ·N and rates stay STRICTLY monotone
    t0 = System.nanoTime()
    val mixed = graft.llm.Curation.domainMixture(mixDocs, "lang", tau = 0.25)
      .cache()
    val nMixed = mixed.count()
    val mixSec = (System.nanoTime() - t0) / 1e9
    require(math.abs(nMixed - 0.25 * nMix) < 0.015 * nMix,
      s"domainMixture: sampled $nMixed of $nMix, expected ~${nMix / 4}")
    // temperature property at scale: rates strictly increase as domain
    // size decreases (α = 0.5 upweights the tail)
    val mixRates = mixed.select("lang", "r_micro").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mixCounts = mixDocs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySize = mixCounts.toSeq.sortBy(-_._2).map(_._1)
    require(bySize.map(mixRates).sliding(2).forall(p => p(0) < p(1)),
      s"domainMixture: rates not monotone in domain size: $mixRates")
    mixed.unpersist(); mixDocs.unpersist()
    println(f"[scale] domain-mixture: $nMix%,d docs / 6 domains -> " +
      f"$nMixed sampled (τ=0.25) in $mixSec%.1f s, tail upweighted OK")

    // ---- dupNgrams: viral boilerplate gram across 100k docs -----------
    // half the corpus carries the same appended sentence — the hot-key
    // shape (one gram, 100k docs) the two-phase aggregation must absorb
    val viral = " terms of service apply here now"
    val dupDocs = base.withColumn("text",
      when(pmod(col("doc_id"), lit(2L)) === 0, concat(col("text"), lit(viral)))
        .otherwise(col("text")))
    t0 = System.nanoTime()
    val topGrams = graft.llm.Dedup.dupNgrams(dupDocs, w = 5, minDocs = 2,
      k = 20).collect()
    val dngSec = (System.nanoTime() - t0) / 1e9
    // the 6-token sentence yields two fully-inside 5-grams, tied on both
    // counts → the gram-ASC tiebreak puts "of service…" first
    val expectViral = nDocs / 2
    val top2 = topGrams.take(2).map(r => r.getString(0) -> r.getLong(1))
    require(top2.toSeq == Seq(
        "of service apply here now" -> expectViral,
        "terms of service apply here" -> expectViral),
      s"dupNgrams: top grams wrong: ${top2.toSeq}")
    println(f"[scale] dup-ngrams: $nDocs%,d docs, viral gram x$expectViral " +
      f"found top-1 in $dngSec%.1f s (hot-key two-phase agg)")

    // ---- quality classifier: 200k docs, planted signal, DISTRIBUTED --
    // the feature table (~7M (doc,f) rows) exceeds the LocalBudget, so
    // this exercises the centroid/scoring/threshold passes as real
    // shuffles; half the docs carry five extra marker tokens and the
    // Rocchio model must recover the parity label almost perfectly
    // (base words are id-hash-derived, independent of the label)
    val qcDocs = base
      .withColumn("label", pmod(col("doc_id"), lit(2L)))
      .withColumn("text", when(col("label") === 1L,
        concat(col("text"), lit(" qmark alpha beta gamma delta")))
        .otherwise(col("text")))
      .select(col("doc_id"), col("label"), col("text"))
    t0 = System.nanoTime()
    val qcOut = graft.llm.QualityClassifier.train(qcDocs).cache()
    val qcN = qcOut.count()
    val qcSec = (System.nanoTime() - t0) / 1e9
    val qcErr = qcOut.filter(col("pred") =!= col("label")).count()
    qcOut.unpersist()
    // 64 hash buckets under 40 noise words per doc leave real collision
    // noise on a 5-marker signal: measured 6.3% training error — far
    // beyond the 50% majority baseline, gated at 10%
    require(qcErr * 10 < qcN,
      s"classifier failed to learn the planted signal: $qcErr/$qcN wrong")
    println(f"[scale] quality-classifier: $qcN%,d docs distributed, " +
      f"$qcErr wrong in $qcSec%.1f s")

    // ---- ngramNovelty at ~201k docs, clone-dense ----------------------
    // base corpus + nPlant exact clones (ids +70M): exactness invariants
    // that must hold at ANY scale by the ownership algebra — every
    // distinct gram is first-owned exactly once (Σ n_first = |grams|),
    // clones of an earlier doc own nothing (novelty 0), and the
    // clone-free originals own everything (hash-vocabulary grams are
    // globally unique with overwhelming probability at 36 grams/doc —
    // verified, not assumed).
    val nvTwins = spark.range(nPlant).select(
      (col("id") + 70_000_000L).as("doc_id"),
      concat_ws(" ", words: _*).as("text"))
    t0 = System.nanoTime()
    val nv = graft.llm.Dedup.ngramNovelty(base.union(nvTwins), w = 5)
      .cache()
    val nvRows = nv.count()
    val nvSec = (System.nanoTime() - t0) / 1e9
    val nvFirstSum = nv.agg(sum("n_first")).head().getLong(0)
    // independent distinct-gram count for the exactly-once-owned check
    val nvGramCnt = base.union(nvTwins)
      .select(graft.llm.Dedup.tokens(col("text")).as("toks"))
      .select(explode(expr("filter(transform(toks, (x, i) -> " +
        "CASE WHEN i <= size(toks) - 5 " +
        "THEN array_join(slice(toks, i + 1, 5), ' ') END), " +
        "g -> g IS NOT NULL)")).as("g"))
      .distinct().count()
    require(nvFirstSum == nvGramCnt,
      s"ngramNovelty: sum(n_first) $nvFirstSum != $nvGramCnt distinct grams")
    val nvCloneBad = nv.filter(col("doc_id") >= 70_000_000L &&
      col("novelty_micro") =!= 0L).count()
    val nvOrigOwned = nv.filter(col("doc_id") < nPlant &&
      col("novelty_micro") === 1000000L).count()
    require(nvRows == nDocs + nPlant && nvCloneBad == 0,
      s"ngramNovelty: $nvRows rows, $nvCloneBad clones with novelty > 0")
    require(nvOrigOwned == nPlant,
      s"ngramNovelty: only $nvOrigOwned/$nPlant cloned ORIGINALS fully novel")
    println(f"[scale] ngram-novelty: $nvRows%,d docs (${nPlant} clones) " +
      f"in $nvSec%.1f s; sum(n_first)=$nvFirstSum%,d, clones all 0, " +
      "cloned originals all 1.0 OK")
    nv.unpersist()

    println(f"""{"jaccard_docs":${nDocs + nPlant},"jaccard_pairs":$nPairs,"jaccard_sec":$jacSec%.1f,"knn_vecs":${nVecs + nQ},"knn_sec":$knnSec%.1f,"ivf_vecs":${2 * nIvf},"ivf_sec":$ivfSec%.1f,"pct_rows":$nRows,"pct_sec":$pSec%.1f,"bm25_sec":$bmSec%.1f,"bigram_sec":$lmSec%.1f,"invidx_sec":$invSec%.1f,"contam_bloom_sec":$cbSec%.1f,"assign1024_sec":$asgSec%.1f,"auto_ivf_sec":$autoSec%.1f,"cross_neardup_sec":$xSec%.1f,"paragraph_sec":$pdSec%.1f,"semantic_sec":$semSec%.1f,"quantize_sec":$qzSec%.1f,"shuffle_shards_sec":$shufSec%.1f,"domain_mixture_sec":$mixSec%.1f,"dup_ngrams_sec":$dngSec%.1f,"quality_classifier_sec":$qcSec%.1f,"ngram_novelty_sec":$nvSec%.1f}""")
    spark.stop()
  }
}
