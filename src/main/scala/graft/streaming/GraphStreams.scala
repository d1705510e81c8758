package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.graph.{EdgeListIngest, PropertyGraph}

/** Streaming graph maintenance — the reference's growing-slice workflow
  * (standalone.txt:1-11 re-imports ever-larger edge lists) as a LIVE
  * pipeline: a file-source stream of edge-list CSVs MERGEs into the
  * running property graph one micro-batch at a time via
  * `EdgeListIngest.appendRaw`, the Delta-style per-batch upsert shape
  * (Structured Streaming's foreachBatch is the documented idempotent-
  * merge hook).
  *
  * Invariant carried over from the batch append contract (pinned by
  * GraphAlgoSpec + StreamingSpec): after the stream drains, the
  * maintained graph — nodes, materialized edges, AND the pending
  * dangling-endpoint backlog — is identical to a from-scratch build
  * over the union of every file's rows, regardless of file order or
  * batch boundaries.
  *
  * Scale shape: each micro-batch costs work proportional to the DELTA
  * plus the pending backlog (anti-joins on natural keys + broadcast
  * endpoint resolution), never the accumulated graph; graph state lives
  * in localCheckpoint'ed frames that are swapped atomically per batch —
  * the previous generation is released only after the next one is
  * eagerly materialized, so micro-batch frames (which expire with their
  * batch) are never referenced afterwards.
  */
object GraphStreams {

  /** Drain a directory of edge-list CSVs as a one-file-per-micro-batch
    * stream and return the maintained graph. Blocks until every file
    * already in `dir` is processed.
    */
  def maintainFromFiles(spark: SparkSession, dir: String,
      initial: Option[PropertyGraph] = None): PropertyGraph = {
    var pg = initial.getOrElse(EdgeListIngest.emptyGraph(spark))
    var generation = 0   // 0 = initial frames, not checkpoint-owned
    val src = spark.readStream
      .schema(EdgeListIngest.schema)
      .option("header", "true")
      .option("maxFilesPerTrigger", 1)
      .csv(dir)
    graft.core.Scratch.withStreamCheckpoint("graft-ckpt-gmaint-") { ck =>
    val q = src.writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.{col, lit}
        val next = EdgeListIngest.appendRaw(spark, pg, batch,
          cacheCandidates = false)
        // materialize BEFORE the batch frame expires / old state drops.
        // ONE tagged-union checkpoint instead of three separate ones:
        // nodes, edges and pending all hang off the same candidate/
        // backlog subtrees, so materializing them as one action lets the
        // scheduler reuse the shared exchanges within a single plan and
        // pays one checkpoint job per batch instead of three (the query
        // ran 50 jobs for 2 batches). The three graph frames are narrow
        // tag-filters over the shared checkpoint; releasing any of them
        // releases the one underlying RDD (release is idempotent).
        val nullS = lit(null).cast("string")
        val nullD = lit(null).cast("double")
        val tagged = next.nodes.select(lit(0).as("tag"), col("nodeId"),
            col("x"), col("y"), nullS.as("src"), nullS.as("dst"),
            nullS.as("roadId"), nullD.as("cost"))
          .unionByName(next.edges.select(lit(1).as("tag"),
            nullS.as("nodeId"), nullD.as("x"), nullD.as("y"),
            col("src"), col("dst"), col("roadId"), col("cost")))
          .unionByName(next.pending.get.select(lit(2).as("tag"),
            nullS.as("nodeId"), nullD.as("x"), nullD.as("y"),
            col("src"), col("dst"), col("roadId"), col("cost")))
          .localCheckpoint(true)
        val mat = PropertyGraph(
          tagged.filter(col("tag") === 0)
            .select(col("nodeId"), col("x"), col("y")),
          tagged.filter(col("tag") === 1)
            .select(col("src"), col("dst"), col("roadId"), col("cost")),
          pending = Some(tagged.filter(col("tag") === 2)
            .select(col("src"), col("dst"), col("roadId"), col("cost"))))
        if (generation > 0) {
          graft.core.Checkpoints.release(pg.nodes)
          graft.core.Checkpoints.release(pg.edges)
          pg.pending.foreach(graft.core.Checkpoints.release)
        }
        // free only frames appendRaw itself ADDED this batch (with
        // cacheCandidates = false that is none — next.underlying aliases
        // pg.underlying). Releasing all of next.underlying here freed
        // the CALLER-supplied initial graph's registered caches on the
        // first micro-batch while the caller may still hold that graph
        // (r16 advice).
        next.underlying.diff(pg.underlying)
          .foreach(graft.core.Checkpoints.release)
        pg = mat
        generation += 1
        ()
      }
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    pg
    }
  }
}
