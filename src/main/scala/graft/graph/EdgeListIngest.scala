package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV → property-multigraph ingest, reproducing the reference pipeline's
  * semantics (reference: IMPL.md:186-231, :276-285):
  *
  *  - typed scan with explicit schema (string→double casts up front — the
  *    reference hit runtime errors until it added `toFloat`, IMPL.md:266-285);
  *  - padding rows (`,,,,,` to 100 806 lines) dropped via START_NODE null
  *    filter;
  *  - nodes derived ONLY from START_NODE + its coords, deduped on the full
  *    (nodeId, x, y) tuple (Cypher `MERGE` on all three props, IMPL.md:190/204);
  *  - edges resolved against the node set with INNER semantics — a row whose
  *    END_NODE never appears as a START_NODE is silently dropped (the
  *    reference's dual `MATCH` lookups, IMPL.md:215-216; 9 999 rows → 9 696
  *    edges, IMPL.md:754);
  *  - parallel edges with distinct (roadId, cost) survive; exact duplicate
  *    (src, dst, roadId, cost) tuples collapse (relationship `MERGE` with
  *    inline props, IMPL.md:282).
  *
  * Scale: the scan is a splittable CSV read; dedup and endpoint resolution
  * are hash shuffles on the natural keys. The node side is tiny relative to
  * edges (37k nodes per 100k edges) so endpoint resolution broadcasts the
  * node-id set — at 100 TB edge scale the node set may no longer fit a
  * broadcast, in which case Catalyst/AQE falls back to a shuffled hash join
  * automatically; nothing here assumes single-node.
  */
object EdgeListIngest {

  val schema: StructType = StructType(Seq(
    StructField("XCoord", DoubleType),
    StructField("YCoord", DoubleType),
    StructField("START_NODE", StringType),
    StructField("END_NODE", StringType),
    StructField("EDGE", StringType),
    StructField("LENGTH", DoubleType)))

  /** Raw typed scan with padding rows removed. The slice CSVs are single
    * ~5 MB files that plan as ONE scan split (below the 4 MB open-cost
    * floor), so node derivation, edge dedup and the resolution joins all
    * started from a single-task stage; the narrow-scan spread
    * (core.Tables doc) fans the parsed rows across cores once — a no-op
    * on multi-file production input.
    */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    graft.core.Tables.spreadNarrowScan(spark,
      spark.read
        .option("header", "true")
        .schema(schema)
        .csv(path)
        .filter(col("START_NODE").isNotNull))

  /** Node derivation: distinct (START_NODE, XCoord, YCoord). */
  def nodes(raw: DataFrame): DataFrame =
    raw.select(
        col("START_NODE").as("nodeId"),
        col("XCoord").as("x"),
        col("YCoord").as("y"))
      .dropDuplicates("nodeId", "x", "y")

  private val EdgeCols = Seq("src", "dst", "roadId", "cost")

  /** Exact-tuple-deduped edge candidates, endpoints not yet resolved. */
  def dedupEdges(raw: DataFrame): DataFrame =
    raw.select(
        col("START_NODE").as("src"),
        col("END_NODE").as("dst"),
        col("EDGE").as("roadId"),
        col("LENGTH").as("cost"))
      .dropDuplicates(EdgeCols)

  /** Inner endpoint resolution against the node-id set. */
  private def resolve(candidates: DataFrame, nodes: DataFrame): DataFrame = {
    val nodeIds = nodes.select(col("nodeId")).distinct()
    candidates
      .join(broadcast(nodeIds).withColumnRenamed("nodeId", "src"), Seq("src"))
      .join(broadcast(nodeIds).withColumnRenamed("nodeId", "dst"), Seq("dst"))
      .select(EdgeCols.map(col): _*)
  }

  /** Edge build: exact-tuple dedup + inner endpoint resolution. */
  def edges(raw: DataFrame, nodes: DataFrame): DataFrame =
    resolve(dedupEdges(raw), nodes)

  /** Full pipeline: CSV path → cached PropertyGraph. The raw scan is
    * cached: node derivation, edge dedup and both endpoint-resolution
    * broadcasts all read it, so an uncached build re-parses the CSV
    * three times before the graph caches fill.
    *
    * `pending` records the deduped candidate edges whose endpoints did
    * NOT resolve (the reference's silently-dropped rows, IMPL.md:754).
    * Keeping them makes `append` exactly equivalent to a from-scratch
    * rebuild: a later slice can add the missing endpoint and the edge
    * materializes then, as it would have in a full re-import.
    */
  def build(spark: SparkSession, path: String): PropertyGraph = {
    val raw = readRaw(spark, path).cache()
    // The graph frames are cached and re-read by EVERY g-query in the
    // session; volume-size their cached partition counts (a ~1 MB slice
    // graph does not need cores-many tasks per read — core.Tables doc).
    // The spread raw scan keeps full parse parallelism; only the
    // long-lived caches coalesce.
    val n = graft.core.Tables.sizedCoalesce(nodes(raw))
    val cand = dedupEdges(raw)
    val e = graft.core.Tables.sizedCoalesce(resolve(cand, n))
    val pend = graft.core.Tables.sizedCoalesce(
      cand.join(e, EdgeCols, "left_anti"))
    // raw is registered so unpersistAll() can release it with the graph
    PropertyGraph(n, e, underlying = Seq(raw), pending = Some(pend))
  }

  /** Incremental batch append — the reference's actual workflow
    * (standalone.txt:1-11 re-imports growing slices; IMPL.md:186-231
    * MERGE semantics make that idempotent). Instead of re-ingesting
    * from scratch, this merges one new slice into an existing graph:
    *
    *  - new node tuples = slice nodes anti-joined on (nodeId, x, y) —
    *    Cypher MERGE-on-all-props semantics, existing tuples no-op;
    *  - candidate edges = slice's deduped tuples plus the graph's
    *    `pending` backlog, minus tuples already materialized;
    *  - candidates resolve against the GROWN node set (a previously
    *    dangling END_NODE can appear in the new slice and revive a
    *    pending edge — exactly what a full re-import would produce);
    *  - unresolved candidates become the new pending backlog.
    *
    * Contract (pinned by IngestSpec): append(build(A), B) has the same
    * node/edge/pending sets as a from-scratch build over A ∪ B's raw
    * rows, for ANY slices A, B — cumulative or disjoint. Nodes only
    * ever grow, so resolution is monotone and the equivalence is exact.
    *
    * Scale: one anti-join per side keyed on the natural keys plus the
    * same broadcast resolution as `build`; the work is proportional to
    * the DELTA (new slice + pending backlog), not the accumulated
    * graph, which is what makes per-batch maintenance viable at 100 TB
    * (re-ingest is Σ slices = quadratic over a growing feed).
    */
  def append(spark: SparkSession, pg: PropertyGraph, path: String)
      : PropertyGraph = {
    val raw = readRaw(spark, path).cache()
    val ap = appendRaw(spark, pg, raw)
    // keep appendRaw's own underlying entries (the candidates
    // checkpoint) — replacing the list would leak them
    ap.copy(underlying = raw +: ap.underlying)
  }

  /** The merge core on an already-typed raw frame — streaming
    * micro-batches (GraphStreams.maintainFromFiles) call this per
    * batch; the batch path above wraps readRaw. Does NOT cache or
    * track `raw`: its lifecycle belongs to the caller (a streaming
    * micro-batch frame expires when the batch ends, so the caller must
    * materialize the result before the next batch).
    */
  def appendRaw(spark: SparkSession, pg: PropertyGraph, rawIn: DataFrame,
      cacheCandidates: Boolean = true): PropertyGraph = {
    val raw = rawIn.filter(col("START_NODE").isNotNull)
    val newNodes = nodes(raw)
      .join(pg.nodes, Seq("nodeId", "x", "y"), "left_anti")
    // union concatenates the parent's volume-sized partitions with the
    // delta's shuffle partitions; re-size so the appended graph's caches
    // (and the streaming maintainer's per-batch checkpoints) stay at a
    // volume-appropriate count across generations
    val allNodes = graft.core.Tables.sizedCoalesce(
      pg.nodes.unionByName(newNodes))
    val backlog = pg.pending.getOrElse(
      pg.edges.filter(lit(false)).select(EdgeCols.map(col): _*))
    // The candidate table (delta ∪ backlog, deduped, minus already-
    // materialized) fans out into resolved, pend AND allEdges; left lazy,
    // every reference inlines the whole upstream plan and g27's summary
    // tree measured ~200 KB / 195 Exchange nodes — the optimizer walks
    // all of it even though AQE reuses the exchanges at runtime. cache()
    // collapses the fan-out: CacheManager substitutes the registered
    // subtree with one InMemoryRelation in every dependent BEFORE
    // optimization, so each reference costs one cached-scan leaf, and the
    // memo survives the harness's post-run Checkpoints.release(result)
    // (which unpersists checkpoint leaves — a localCheckpoint here was
    // measured to break repeat runs of the memoized graph). The cached
    // table is DELTA-sized (delta + backlog, the append contract's own
    // bound). Ownership: rides in `underlying`, released with the graph;
    // the streaming caller releases per batch.
    // `cacheCandidates = false` (the streaming maintainer) keeps the
    // table lazy: there each micro-batch eagerly checkpoints the three
    // result frames anyway, and the cache round-trip measured SLOWER
    // (3.2 → 3.6 s on stream_graph_append) while the batch path won big
    // (g27 steady 2.7 → 1.6 s, 31 → 11 jobs).
    val candBase = graft.core.Tables.sizedCoalesce(
      dedupEdges(raw).unionByName(backlog)
        .dropDuplicates(EdgeCols)
        .join(pg.edges, EdgeCols, "left_anti"))
    val candidates = if (cacheCandidates) candBase.cache() else candBase
    val resolved = resolve(candidates, allNodes)
    val allEdges = graft.core.Tables.sizedCoalesce(
      pg.edges.unionByName(resolved))
    val pend = candidates.join(resolved, EdgeCols, "left_anti")
    PropertyGraph(allNodes, allEdges,
      underlying = (if (cacheCandidates) Seq(candidates) else Nil) ++
        pg.underlying,
      pending = Some(pend))
  }

  /** An empty graph — the identity element for `append`/`appendRaw`
    * (streaming maintenance starts from it).
    */
  def emptyGraph(spark: SparkSession): PropertyGraph = {
    import org.apache.spark.sql.Row
    val nodes = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("nodeId", StringType),
        StructField("x", DoubleType), StructField("y", DoubleType))))
    val edges = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("src", StringType),
        StructField("dst", StringType), StructField("roadId", StringType),
        StructField("cost", DoubleType))))
    PropertyGraph(nodes, edges,
      pending = Some(edges.filter(lit(false))))
  }
}
