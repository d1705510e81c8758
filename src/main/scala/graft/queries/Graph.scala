package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.GQ
import graft.algo.ShortestPaths
import graft.graph.{EdgeListIngest, PropertyGraph}

/** The reference's own query corpus (neo4j-code.txt's 8 canonical queries)
  * re-expressed Spark-first. The anchors 2022→80240 and the result shapes
  * mirror the reference; see SURVEY §2.9/§3.
  *
  * These read the Shenzhen edge list from the read-only reference checkout
  * (slice selectable via GRAFT_EDGELIST); the driver's sfDir is irrelevant
  * to them. The ingest-count query is DuckDB-oracle-checkable (read_csv);
  * the iterative algorithms are not SQL-expressible, so they carry no
  * oracle and are instead cross-validated by the ScalaTest suite
  * (local CSR kernel ≡ distributed relaxation kernel ≡ ScalaCheck
  * properties, SURVEY §5.2.3).
  */
object Graph {

  val DefaultEdgeList = "/root/reference/Shenzhen_Edgelist_1.csv"
  def edgeListPath: String =
    sys.env.getOrElse("GRAFT_EDGELIST", DefaultEdgeList)

  /** Canonical anchors. The reference's query pair is 2022→80240, but
    * node 80240 exists only in the unshipped 100 972-row file (verified:
    * it appears in NO shipped slice) — so, per SURVEY §5.2.2, we freeze
    * our own golden on slice 1: 2022→2802, the farthest reachable node
    * (independent-oracle distance 9221.720430639).
    */
  val Src = "2022"
  val Dst = "2802"

  // Memoize the built graph per (session, path): the 8 graph queries share
  // one ingest instead of re-reading the CSV per query. A WeakHashMap on
  // the session would never evict here — the cached PropertyGraph's
  // DataFrames strongly reference their SparkSession, so the value would
  // pin the weak key forever. Instead: key on session identity (not
  // hashCode, which can collide) and purge entries whose SparkContext has
  // stopped on every access, plus an explicit release() for callers that
  // cycle sessions on a live context.
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), PropertyGraph]()
  def graphFor(spark: SparkSession, path: String): PropertyGraph = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getKey._1.sparkContext.isStopped) it.remove()
    }
    cache.computeIfAbsent((spark, path),
      { case (s, p) => EdgeListIngest.build(s, p).cache() })
  }

  /** Drop and unpersist every graph cached for `spark`. */
  def release(spark: SparkSession): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) {
        if (!spark.sparkContext.isStopped) e.getValue.unpersistAll()
        it.remove()
      }
    }
  }

  private def g(s: SparkSession): PropertyGraph = graphFor(s, edgeListPath)

  val queries: Seq[GQ] = Seq(

    // S1-S4 + J1: ingest pipeline with the reference's dedup semantics;
    // slice 1 must yield 3 705 nodes / 9 696 edges (standalone.txt:2,
    // IMPL.md:754).
    GQ("g1_ingest_counts",
      (s, _) => {
        val pg = g(s)
        pg.nodes.agg(count(lit(1)).as("n_nodes"))
          .crossJoin(pg.edges.agg(count(lit(1)).as("n_edges")))
      },
      Some(s"""WITH raw AS (
              |  SELECT * FROM read_csv('${DefaultEdgeList}', header=true,
              |    columns={'XCoord':'DOUBLE','YCoord':'DOUBLE',
              |      'START_NODE':'VARCHAR','END_NODE':'VARCHAR',
              |      'EDGE':'VARCHAR','LENGTH':'DOUBLE'})
              |  WHERE START_NODE IS NOT NULL),
              |nodes AS (SELECT DISTINCT START_NODE, XCoord, YCoord FROM raw),
              |ids AS (SELECT DISTINCT START_NODE FROM nodes),
              |edges AS (SELECT DISTINCT START_NODE, END_NODE, EDGE, LENGTH
              |  FROM raw WHERE START_NODE IN (SELECT * FROM ids)
              |  AND END_NODE IN (SELECT * FROM ids))
              |SELECT (SELECT count(*) FROM nodes) AS n_nodes,
              |       (SELECT count(*) FROM edges) AS n_edges""".stripMargin)),

    // G1: Dijkstra path stream (neo4j-code.txt:2-17 shape).
    GQ("g2_dijkstra_path",
      (s, _) => ShortestPaths.dijkstraPath(s, g(s), Src, Dst)),

    // G1 summary: count + Max (neo4j-code.txt:19-36).
    GQ("g3_dijkstra_summary",
      (s, _) => ShortestPaths.dijkstraSummary(s, g(s), Src, Dst)),

    // G2: delta-stepping SSSP distances (neo4j-code.txt:39-54). The
    // reference slices the collected result [29920..29930); our surface
    // keeps the full distance table and exposes the slice as a top-k page
    // ordered by (distance, node_id).
    GQ("g4_sssp_distances",
      (s, _) => ShortestPaths.sssp(s, g(s), Src)
        .select(col("node_id"), round(col("distance"), 4).as("distance"))
        .orderBy(col("distance").asc, col("node_id").asc)),

    // G4: A* with admissible Euclidean heuristic (SURVEY §4.3 decision:
    // agrees with Dijkstra, diverging deliberately from the reference's
    // inadmissible-heuristic 54140.0 artifact).
    GQ("g5_astar_summary",
      (s, _) => ShortestPaths.astarSummary(s, g(s), Src, Dst)),

    // G5: Yen K=3 loopless shortest paths (neo4j-code.txt:127-145):
    // summary shape (path_index, path_node_number, total_cost) plus the
    // reduce-over-costs total (neo4j-code.txt:145).
    GQ("g6_yen_k3",
      (s, _) => ShortestPaths.yen(s, g(s), Src, Dst, 3)
        .select(col("path_index"),
          size(col("node_ids")).as("path_node_number"),
          round(aggregate(col("costs"), lit(0.0), (acc, x) => acc + x), 4)
            .as("reduce_total"),
          col("total_cost"))),

    // G3: APSP ranking query (neo4j-code.txt:56-77): finite distances,
    // self-pairs excluded, top-10 longest, id-tie-broken. Source set kept
    // explicit so the query scales as multi-source SSSP, never N².
    GQ("g7_apsp_top10",
      (s, _) => {
        val sources = (0 until 200).map(i => (i * 17 + 1).toString)
        val pg = g(s)
        val present = pg.nodes.select("nodeId")
          .filter(col("nodeId").isin(sources: _*))
          .collect().map(_.getString(0)).toSeq
        ShortestPaths.apsp(s, pg, Some(present))
          .filter(col("source_id") =!= col("target_id"))
          .select(col("source_id"), col("target_id"),
            round(col("distance"), 4).as("distance"))
          .orderBy(col("distance").desc, col("source_id").asc,
            col("target_id").asc)
          .limit(10)
      }),

    // S6 write-back shape: distances joined back onto the node table
    // (writeProperty 'sssp', neo4j-code.txt:33) — J2 id join-back.
    GQ("g8_sssp_writeback",
      (s, _) => {
        val pg = g(s)
        val dist = ShortestPaths.sssp(s, pg, Src)
        pg.nodes.join(dist, pg.nodes("nodeId") === dist("node_id"), "left_outer")
          .select(col("nodeId").as("node_id"), col("x"), col("y"),
            round(col("distance"), 4).as("sssp"))
      })
  )
}
