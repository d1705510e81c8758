package graft
import org.apache.spark.sql.SparkSession
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val df0 = fn(spark, sfDir)
    df0.write.format("noop").mode("overwrite").save()
    graft.core.Checkpoints.release(df0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = j.stageInfos.lastOption.map(_.details.linesIterator
            .filter(l => l.contains("graft") || l.contains("Dataset") ||
              l.contains("checkpoint")).take(2).mkString(" | "))
            .getOrElse("")
          println(s"[job] id=${j.jobId} stages=${j.stageInfos.size} tasks=${j.stageInfos.map(_.numTasks).sum} $site")
        }
      })
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    graft.core.Checkpoints.release(df)
    println(f"[total] ${(System.nanoTime()-t0)/1e9}%.2f s")
    Thread.sleep(500)
    spark.stop()
  }
}
