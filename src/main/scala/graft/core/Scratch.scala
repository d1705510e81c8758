package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Scratch-directory lifecycle + inert-result helpers shared by the
  * side-effecting sink/serve queries (q48a/q48b/q49–q52, g34).
  *
  * The driver contract for such queries is: all IO happens during
  * registry-function evaluation, the returned frame is a LocalRelation
  * over collected rows, and the scratch dir is gone by the time the
  * function returns (PlanSpec pins the inert shape). Anything lazy over
  * the scratch would re-scan a deleted/overwritten path at the driver's
  * write-out time — the r9 failure mode.
  */
object Scratch {

  /** Run `body` against a fresh scratch dir; best-effort recursive
    * cleanup after. `body` must return nothing that could re-scan the
    * scratch (collect first, return a LocalRelation).
    */
  def withScratch[A](prefix: String)(body: String => A): A = {
    val base = java.nio.file.Files.createTempDirectory(prefix)
    try body(base.toString)
    finally {
      try {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        Files.walk(base).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }
  }

  /** Root for EPHEMERAL streaming checkpoint/state-store scratch.
    *
    * A Structured Streaming query's checkpoint carries offset/commit WALs
    * and per-partition state-store delta files, each fsync'd per
    * micro-batch. For the finite-replay driver queries (file source →
    * memory sink, stopped and discarded within the query function) that
    * durability buys nothing — the checkpoint is dead the moment the
    * query returns — but every fsync pays real disk latency. Point the
    * scratch at tmpfs when one is available; durable sinks (the
    * stream_file_sink query) keep their checkpoint NEXT TO the sink on
    * real disk, because there the checkpoint IS the exactly-once
    * contract.
    *
    * Overridable via SPARK_GRAFT_STREAM_SCRATCH (set it to a durable
    * path in deployments where even test-shaped streams must survive a
    * process restart).
    */
  lazy val streamScratchRoot: String =
    sys.env.get("SPARK_GRAFT_STREAM_SCRATCH").getOrElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) shm.getAbsolutePath
      else System.getProperty("java.io.tmpdir")
    }

  /** Run `body` with a fresh checkpoint dir under [[streamScratchRoot]];
    * recursive cleanup after (the stream must be stopped inside `body`).
    */
  def withStreamCheckpoint[A](prefix: String)(body: String => A): A = {
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(streamScratchRoot), prefix)
    try body(base.toString)
    finally {
      try {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        Files.walk(base).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }
  }

  /** Inert LocalRelation result for side-effecting queries. */
  def localResult(s: SparkSession, schema: StructType, rows: Seq[Row])
      : DataFrame = {
    import scala.jdk.CollectionConverters._
    s.createDataFrame(rows.asJava, schema)
  }
}
