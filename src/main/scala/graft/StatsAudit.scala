package graft

import org.apache.spark.sql.DataFrame

/** Dev-only diagnostic: run each iterative distributed kernel on slice 1
  * (forced-distributed) and report the BIT LENGTH of the result plan's
  * propagated sizeInBytes statistic plus wall time. Spark 4.x
  * localCheckpoint propagates ESTIMATED origin stats into the
  * checkpoint leaf; kernels whose round plan fans the state out under
  * several joins compound the estimate multiplicatively per round (bits
  * ×3 — the Louvain failure core.Checkpoints.freshStats documents), and
  * a megabit statistic makes every later optimizer pass over the result
  * do Toom-Cook BigInteger math. Anything reported here in the
  * kilobit+ range deserves the freshStats barrier.
  */
object StatsAudit {
  def main(args: Array[String]): Unit = {
    val spark = core.Sessions.local(4, "graft-stats-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val pg = graph.EdgeListIngest
      .build(spark, "/root/reference/Shenzhen_Edgelist_1.csv").cache()
    val nodes = pg.nodes.select("nodeId")
    val edges = pg.projection.select("src", "dst")
    val weighted = pg.projection.select("src", "dst", "cost")

    def audit(name: String)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = mk
      val n = df.count()
      val bits = df.queryExecution.optimizedPlan.stats.sizeInBytes
        .bigInteger.bitLength
      println(f"[stats-audit] $name%-22s rows=$n%7d statBits=$bits%9d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%6.1f s")
      core.Checkpoints.release(df)
    }

    audit("wcc")(algo.GraphComponents.wcc(spark, nodes, edges,
      localEdgeThreshold = 0L))
    audit("pagerank")(algo.PageRank.run(nodes, edges, iters = 10,
      localEdgeThreshold = 0L))
    audit("labelprop")(algo.LabelPropagation.run(spark, nodes, edges,
      rounds = 16, localEdgeThreshold = 0L))
    audit("hits")(algo.Hits.run(nodes, edges, iters = 10,
      localEdgeThreshold = 0L))
    audit("kcore")(algo.KCore.core(spark, edges,
      localEdgeThreshold = 0L))
    audit("louvain")(algo.Louvain.run(spark, nodes, edges, rounds = 16,
      localEdgeThreshold = 0L))
    audit("louvain2l")(algo.Louvain.runTwoLevel(spark, nodes, edges,
      rounds = 16, coarseRounds = 8, localEdgeThreshold = 0L))
    audit("scc")(algo.StronglyConnected.scc(spark, nodes, edges,
      localEdgeThreshold = 0L))
    audit("sssp")(algo.DistributedSSSP.run(spark, weighted, Seq("2022")))
    audit("louvainW")(algo.Louvain.runWeighted(spark, nodes,
      weighted.select(org.apache.spark.sql.functions.col("src"),
        org.apache.spark.sql.functions.col("dst"),
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.col("cost") * 1000 + 0.5)
          .cast("long").as("w")),
      rounds = 16, localEdgeThreshold = 0L))
    audit("embed_train")(algo.EmbeddingTrain.train(nodes,
      algo.RandomWalks.skipGramPairs(
        algo.RandomWalks.walks(nodes, edges, numWalks = 2, length = 8,
          localEdgeThreshold = 0L), window = 2),
      localPairThreshold = 0L))
    audit("mst")(algo.Boruvka.mst(spark, weighted,
      localEdgeThreshold = 0L))
    audit("mis")(algo.IndependentSet.luby(spark, nodes, edges,
      localEdgeThreshold = 0L))
    audit("matching")(algo.Matching.maximal(spark, edges,
      localEdgeThreshold = 0L))
    audit("matchingW")(algo.Matching.heaviest(spark, weighted,
      localEdgeThreshold = 0L))
    audit("coloring")(algo.Coloring.greedy(spark, nodes, edges,
      localEdgeThreshold = 0L))
    spark.stop()
  }
}
