package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Local mode is a single JVM; `spark.sql.shuffle.partitions` is sized to
  * the core count instead of the default 200 so small-SF shuffles don't
  * drown in empty tasks. AQE stays on so the same plans re-split/coalesce
  * correctly on a real cluster at 100 TB (skew-join handling, dynamic
  * partition coalescing).
  */
object Sessions {
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply graft defaults to an externally-built session (driver contract
    * sessions from Verify/Bench): UTC + AQE; shuffle partitions are left
    * to the caller.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}
