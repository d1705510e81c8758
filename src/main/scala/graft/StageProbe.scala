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
    // warm rep
    val df0 = fn(spark, sfDir)
    df0.write.format("noop").mode("overwrite").save()
    graft.core.Checkpoints.release(df0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          println(s"[stage] tasks=${s.stageInfo.numTasks} name=${s.stageInfo.name} details=${s.stageInfo.details.linesIterator.toSeq.drop(1).take(3).mkString(" | ")}")
        }
      })
    val df = fn(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    graft.core.Checkpoints.release(df)
    Thread.sleep(500)
    spark.stop()
  }
}
