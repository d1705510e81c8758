package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic random-walk sampling over the projected digraph — the
  * DeepWalk/node2vec corpus-generation shape (walk sequences feed a
  * skip-gram embedding trainer exactly like text token windows), which
  * makes it a training-data-pipeline operator as much as a graph one.
  *
  * True pseudo-random walks can never be cross-engine-checked, so the
  * contract fixes the randomness the md5 way (the fingerprint/sampling
  * convention of the llm family): at step t of walk w started at v,
  * standing on u, the next hop is
  *
  *   nbr(u)[ H(v|w|t|u) mod outdeg(u) ]
  *
  * where nbr(u) is u's out-neighbors in ascending id order and H is the
  * first 8 hex digits of md5 parsed as an integer — uniform enough for
  * sampling, bit-identical in Spark (`conv(substr(md5…))`) and DuckDB
  * (hex-digit positional sum, the minhash oracle technique). Walks stop
  * early at dead-end nodes. Every (node, walk) pair emits its step-0
  * row, so isolated nodes still appear in the corpus.
  *
  * Scale shape: the neighbor-index table (row_number per src) and the
  * degree table are computed once; each of the L steps is one equi-join
  * of the frontier against them, keyed by current node — no driver
  * collection, no per-row UDF (the hash is codegen'd md5/conv), state
  * is exactly |frontier| rows and only ever shrinks (dead ends). L and
  * W are fixed small constants, so the whole operator is L shuffles
  * over a corpus ≤ |V|·W rows — unchanged at 100 TB.
  */
object RandomWalks {

  /** Exploded walk corpus: (start_id, walk_id, step, node_id), one row
    * per visited node per walk, steps 0..length.
    */
  def walks(nodes: DataFrame, edges: DataFrame, numWalks: Int = 2,
      length: Int = 8): DataFrame = {
    require(numWalks >= 1 && length >= 1, "numWalks and length must be >= 1")
    val nodeIds = nodes.select(col(nodes.columns(0)).cast("string").as("node"))
    val e = edges.select(col(edges.columns(0)).cast("string").as("src"),
      col(edges.columns(1)).cast("string").as("dst")).distinct()
    // ascending-id neighbor index + out-degree, computed once
    val nbr = e.withColumn("idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("src").orderBy("dst")) - 1)
      .localCheckpoint(true)
    val deg = nbr.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val walkIds = (0 until numWalks).map(lit(_))
    var frontier = nodeIds
      .select(col("node").as("start"),
        explode(array(walkIds: _*)).as("walk"),
        col("node").as("cur"))
      .localCheckpoint(true)
    var out = frontier.select(col("start"), col("walk"),
      lit(0).as("step"), col("cur").as("node"))
      .localCheckpoint(true)
    for (t <- 1 to length) {
      val key = concat_ws("|", col("start"), col("walk"), lit(t), col("cur"))
      val withPick = frontier
        .join(deg, col("cur") === deg("src"))
        .withColumn("pick",
          conv(substring(md5(key), 1, 8), 16, 10).cast("long") % col("deg"))
        .select(col("start"), col("walk"), col("cur"), col("pick"))
      val next = withPick
        .join(nbr, withPick("cur") === nbr("src") &&
          withPick("pick") === nbr("idx"))
        .select(col("start"), col("walk"), col("dst").as("cur"))
        .localCheckpoint(true)
      val level = next.select(col("start"), col("walk"),
        lit(t).as("step"), col("cur").as("node"))
      val nextOut = out.union(level).localCheckpoint(true)
      graft.core.Checkpoints.release(out)
      graft.core.Checkpoints.release(frontier)
      out = nextOut
      frontier = next
    }
    graft.core.Checkpoints.release(frontier)
    graft.core.Checkpoints.release(nbr)
    graft.core.Checkpoints.release(deg)
    out.select(col("start").as("start_id"), col("walk").as("walk_id"),
      col("step"), col("node").as("node_id"))
  }

  /** In-memory reference of the same contract for audits. */
  private[graft] def localReference(nodeIds: Array[String],
      pairs: Array[(String, String)], numWalks: Int, length: Int)
      : Set[(String, Int, Int, String)] = {
    val nbrs = pairs.distinct.groupBy(_._1)
      .map { case (k, es) => k -> es.map(_._2).distinct.sorted }
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(key: String): Long = {
      val hex = md.digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val out = scala.collection.mutable.Set.empty[(String, Int, Int, String)]
    for (v <- nodeIds; w <- 0 until numWalks) {
      var cur = v
      out += ((v, w, 0, cur))
      var t = 1
      var alive = true
      while (t <= length && alive) {
        nbrs.get(cur) match {
          case Some(ns) =>
            cur = ns((h(s"$v|$w|$t|$cur") % ns.length).toInt)
            out += ((v, w, t, cur))
          case None => alive = false
        }
        t += 1
      }
    }
    out.toSet
  }
}
