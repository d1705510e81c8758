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

  /** Inert LocalRelation result for side-effecting queries. */
  def localResult(s: SparkSession, schema: StructType, rows: Seq[Row])
      : DataFrame = {
    import scala.jdk.CollectionConverters._
    s.createDataFrame(rows.asJava, schema)
  }
}
