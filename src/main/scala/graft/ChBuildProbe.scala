package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tuning probe for the distributed CH build: grid of [gw]×[gh] nodes,
  * verbose per-round logging, query sample vs Dijkstra. Usage:
  * runMain graft.ChBuildProbe [gw] [gh] [localFinishEdges]
  */
object ChBuildProbe {
  def main(args: Array[String]): Unit = {
    val gw = args.headOption.map(_.toLong).getOrElse(300L)
    val gh = args.lift(1).map(_.toLong).getOrElse(140L)
    val finish = args.lift(2).map(_.toLong).getOrElse(50000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def gid(cc: org.apache.spark.sql.Column) = format_string("g%07d", cc)
    val hIdx = spark.range(gh * (gw - 1))
      .select((col("id") / (gw - 1)).cast("long").as("r"),
        (col("id") % (gw - 1)).as("c"))
      .select((col("r") * gw + col("c")).as("a"),
        (col("r") * gw + col("c") + 1).as("b"))
    val vIdx = spark.range((gh - 1) * gw)
      .select(col("id").as("a"), (col("id") + gw).as("b"))
    val undPairs = hIdx.unionByName(vIdx)
    val chEdges0 = undPairs.select(gid(col("a")).as("src"),
        gid(col("b")).as("dst"),
        (pmod(xxhash64(col("a"), col("b"), lit(41)), lit(9L)) + 1)
          .cast("double").as("cost"))
      .unionByName(undPairs.select(gid(col("b")).as("src"),
        gid(col("a")).as("dst"),
        (pmod(xxhash64(col("b"), col("a"), lit(42)), lit(9L)) + 1)
          .cast("double").as("cost")))
      .cache()
    val n = (gw * gh).toInt
    val nodes = spark.range(n.toLong).select(gid(col("id")).as("node"))
    println(s"[probe] grid ${gw}x$gh = $n nodes, ${chEdges0.count()} edges")
    val t0 = System.nanoTime()
    val built = algo.DistributedCH.build(spark, nodes, chEdges0,
      localFinishEdges = finish, verbose = true)
    println(f"[probe] build ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"levels=${built.rounds}, shortcuts=${built.nShortcuts}")
    val lg = algo.LocalGraph.fromProjection(chEdges0, None)
    val ch = algo.DistributedCH.assemble(spark, lg, built)
    val rnd = new scala.util.Random(7)
    for (i <- 0 until 10) {
      val s = rnd.nextInt(n); val t = rnd.nextInt(n)
      val got = ch.query(lg, s, t)._1
        .map(p => algo.LocalKernels.rewalk(lg, p).last)
      val want = algo.LocalKernels.dijkstra(lg, s, t).map(_.totalCost)
      require(got == want, s"pair $i: $got != $want")
    }
    println("[probe] 10 queries == dijkstra")
    spark.stop()
  }
}
