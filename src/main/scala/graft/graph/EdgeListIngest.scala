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

  /** Raw typed scan with padding rows removed. */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(schema)
      .csv(path)
      .filter(col("START_NODE").isNotNull)

  /** Node derivation: distinct (START_NODE, XCoord, YCoord). */
  def nodes(raw: DataFrame): DataFrame =
    raw.select(
        col("START_NODE").as("nodeId"),
        col("XCoord").as("x"),
        col("YCoord").as("y"))
      .dropDuplicates("nodeId", "x", "y")

  /** Edge build: exact-tuple dedup + inner endpoint resolution. */
  def edges(raw: DataFrame, nodes: DataFrame): DataFrame = {
    val nodeIds = nodes.select(col("nodeId")).distinct()
    raw.select(
        col("START_NODE").as("src"),
        col("END_NODE").as("dst"),
        col("EDGE").as("roadId"),
        col("LENGTH").as("cost"))
      .dropDuplicates("src", "dst", "roadId", "cost")
      .join(broadcast(nodeIds).withColumnRenamed("nodeId", "src"), Seq("src"))
      .join(broadcast(nodeIds).withColumnRenamed("nodeId", "dst"), Seq("dst"))
      .select(col("src"), col("dst"), col("roadId"), col("cost"))
  }

  /** Full pipeline: CSV path → cached PropertyGraph. The raw scan is
    * cached: node derivation, edge dedup and both endpoint-resolution
    * broadcasts all read it, so an uncached build re-parses the CSV
    * three times before the graph caches fill.
    */
  def build(spark: SparkSession, path: String): PropertyGraph = {
    val raw = readRaw(spark, path).cache()
    val n = nodes(raw)
    val e = edges(raw, n)
    // raw is registered so unpersistAll() can release it with the graph
    PropertyGraph(n, e, underlying = Seq(raw))
  }
}
