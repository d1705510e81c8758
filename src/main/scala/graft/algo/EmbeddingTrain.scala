package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Node-embedding training over a skip-gram pair table — the stage that
  * turns RandomWalks.skipGramPairs' (center, context, n_pairs) corpus
  * into per-node vectors, completing the DeepWalk/node2vec pipeline
  * (walks → windows → embeddings; the reference's platform ships this
  * as the train mode of `gds.node2vec`, the library behind
  * `neo4j-code.txt:4-11`).
  *
  * Why not float SGD: word2vec-style training is a stream of tiny
  * non-commutative float updates — result depends on update order and
  * thread interleaving, so no two runs agree, let alone two engines. The
  * hash-oracle-able formulation used here is CLOSED-FORM-PER-EPOCH
  * fixed-point iteration: each epoch every center vector moves toward
  * the n_pairs-weighted integer mean of its context vectors,
  *
  *   em'(v,k) = (7·em(v,k) + 3·(Σ n_pairs·em(c,k) div Σ n_pairs)) div 10
  *
  * with all state held as nonnegative integers below a prime modulus.
  * Every sum is order-independent, every division is on nonnegative
  * operands (so truncating and floor division agree across engines),
  * and the fixed epoch count is part of the contract — the DataFrame
  * loop and a DuckDB chained CTE compute the identical table. The
  * fixpoint this iterates is the skip-gram co-occurrence smoother:
  * nodes sharing walk contexts (same community) converge toward a
  * common point, nodes that never co-occur keep independent
  * pseudo-random positions — exactly the geometry skip-gram SGD is
  * trained to produce, in an arithmetic both engines reproduce bit for
  * bit. Init is the corpus' fixed-randomness convention (the md5 family
  * of RandomWalks): em0(v,k) = H(v|k) mod M, H = first 8 md5 hex
  * digits — deterministic, id-type-agnostic, cross-engine.
  *
  * Scale shape: state is |V|·d rows; each epoch is one equi-join of the
  * pair table with the embedding state keyed by context node + one
  * (center, dim) aggregation + one join back — the PageRank superstep
  * pattern with a d-row fanout. The pair-total table is computed once.
  * localCheckpoint cuts lineage per epoch; nothing corpus-sized reaches
  * the driver on the distributed path. The adaptive local twin (shared
  * core.LocalBudget byte guard) runs the identical recurrence
  * sequentially for driver-sized corpora, pinned bit-equal in
  * GraphAlgoSpec.
  */
object EmbeddingTrain {

  /** Prime modulus: init values spread uniformly in [0, M); the update
    * is a convex integer combination so every epoch stays in [0, M).
    */
  val Modulus: Long = 999983L

  /** (node, dim, val) after `epochs` epochs. `nodes` is a one-column
    * node-id frame (every node gets a vector — nodes without pairs keep
    * their init vector); `pairs` is (center, context, n_pairs) with
    * center/context drawn from the node set.
    */
  def train(nodes: DataFrame, pairs: DataFrame, dims: Int = 4,
      epochs: Int = 6,
      localPairThreshold: Long = graft.core.LocalBudget.MaxLocalEdges)
      : DataFrame = {
    require(dims >= 1 && epochs >= 0, "dims >= 1 and epochs >= 0")
    val nd = nodes.select(col(nodes.columns(0)).cast("string").as("node"))
    val p = pairs.select(col(pairs.columns(0)).cast("string").as("center"),
      col(pairs.columns(1)).cast("string").as("context"),
      col(pairs.columns(2)).cast("long").as("n_pairs")).cache()
    val (nPairs, estBytes) = graft.core.LocalBudget.measureEdges(p)
    if (graft.core.LocalBudget.fitsLocal(nPairs, estBytes,
        localPairThreshold)) {
      val rows = p.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2)))
      p.unpersist()
      val ids = nd.collect().map(_.getString(0))
      return localTrain(nodes.sparkSession, ids, rows, dims, epochs)
    }
    val dimLits = (0 until dims).map(lit(_))
    var em = nd.select(col("node"), explode(array(dimLits: _*)).as("dim"))
      .withColumn("val",
        conv(substring(md5(concat_ws("|", col("node"), col("dim"))), 1, 8),
          16, 10).cast("long") % Modulus)
      .localCheckpoint(true)
    val tot = p.groupBy("center").agg(sum("n_pairs").as("n_tot"))
      .localCheckpoint(true)
    for (_ <- 1 to epochs) {
      val ctx = p
        .join(em.select(col("node").as("context"), col("dim"), col("val")),
          Seq("context"))
        .groupBy(col("center"), col("dim"))
        .agg(sum(col("n_pairs") * col("val")).as("cs"))
      val next = em
        .join(ctx.withColumnRenamed("center", "node"), Seq("node", "dim"),
          "left_outer")
        .join(tot.withColumnRenamed("center", "node"), Seq("node"),
          "left_outer")
        .selectExpr("node", "dim",
          "CAST(CASE WHEN n_tot IS NULL OR n_tot = 0 THEN val " +
            "ELSE (7 * val + 3 * (coalesce(cs, CAST(0 AS BIGINT))" +
            " div n_tot)) div 10 END AS BIGINT) AS val")
        .localCheckpoint(true)
      graft.core.Checkpoints.release(em)
      em = next
    }
    graft.core.Checkpoints.release(tot)
    p.unpersist()
    em.select(col("node"), col("dim"), col("val"))
  }

  /** Sequential twin of the distributed recurrence (adaptive path) —
    * identical md5 init and integer update, pinned bit-equal in
    * GraphAlgoSpec.
    */
  private[graft] def localTrain(spark: SparkSession, ids: Array[String],
      pairRows: Array[(String, String, Long)], dims: Int, epochs: Int)
      : DataFrame = {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(key: String): Long = {
      val hex = md.digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val idSet = ids.toSet
    var em: Map[(String, Int), Long] =
      (for (v <- ids; k <- 0 until dims)
        yield (v, k) -> (h(s"$v|$k") % Modulus)).toMap
    // context lookups mirror the distributed inner join: a context
    // outside the node frame contributes nothing, but its n_pairs still
    // lands in the center's total (tot is computed over ALL pairs)
    val tot = pairRows.groupBy(_._1).map { case (c, rs) =>
      c -> rs.map(_._3).sum }
    for (_ <- 1 to epochs) {
      val cs = scala.collection.mutable.HashMap.empty[(String, Int), Long]
        .withDefaultValue(0L)
      pairRows.foreach { case (c, x, n) =>
        if (idSet(x)) {
          var k = 0
          while (k < dims) { cs((c, k)) += n * em((x, k)); k += 1 }
        }
      }
      em = em.map { case ((v, k), old) =>
        tot.get(v) match {
          case Some(n) if n > 0 =>
            (v, k) -> ((7L * old + 3L * (cs((v, k)) / n)) / 10L)
          case _ => (v, k) -> old
        }
      }
    }
    (for (v <- ids; k <- 0 until dims) yield (v, k, em((v, k))))
      .toSeq.toDF("node", "dim", "val")
  }
}
