package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: demonstrate that the IVF √n centroid policy (and not
  * the oracle-pinned 16-centroid constant in llm_knn_join_ivf) is the
  * operator's scale path. The r9 10× scale run measured the PINNED
  * query at 34× cost for 10× data — quadratic, as expected when bucket
  * count stays fixed while the corpus grows. This main times
  * ivfKnnJoin at a given SF dir with nCentroids = 16 (the pinned
  * constant) vs nCentroids = 0 (the autoCentroids √n policy) so the
  * difference is a measured fact, not an argument.
  *
  * Usage: runMain graft.ScalePolicyCheck [sfDir] [reps]
  */
object ScalePolicyCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).cache()
    val n = emb.count()
    println(s"[policy] corpus n=$n, autoCentroids=" +
      s"${graft.llm.Similarity.autoCentroids(n)}")
    def time(label: String)(f: => Unit): Unit = (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"[policy] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("ivfKnnJoin nCentroids=16 (oracle-pinned)") {
      graft.llm.Similarity.ivfKnnJoin(spark, emb, k = 5,
        nCentroids = 16, nProbe = 4)
        .write.format("noop").mode("overwrite").save()
    }
    time("ivfKnnJoin nCentroids=0 (sqrt-n policy)") {
      graft.llm.Similarity.ivfKnnJoin(spark, emb, k = 5,
        nCentroids = 0, nProbe = 4)
        .write.format("noop").mode("overwrite").save()
    }
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    time("graphAnn nCentroids=16 (oracle-pinned)") {
      val d = graft.llm.Similarity.graphAnn(spark, emb, queries,
        nCentroids = 16)
      d.write.format("noop").mode("overwrite").save()
      graft.core.Checkpoints.release(d)
    }
    time("graphAnn nCentroids=0 (sqrt-n policy)") {
      val d = graft.llm.Similarity.graphAnn(spark, emb, queries)
      d.write.format("noop").mode("overwrite").save()
      graft.core.Checkpoints.release(d)
    }
    spark.stop()
  }
}
