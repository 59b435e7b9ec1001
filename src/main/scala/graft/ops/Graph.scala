package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Graph analytics over relations (no GraphX dependency — the
  * DataFrame join formulation IS the scalable one: every step is an
  * equi-join Catalyst can plan, broadcast, and AQE-tune).
  *
  * Cyclic label propagation (connected components) lives in
  * Dedup.dedupClusters; this file holds the join-shaped graph
  * queries.
  */
object Graph {

  /** Co-purchase edges: parts that appear in the same order, as
    * canonical (p1 < p2) distinct pairs. One self-equi-join of the
    * projected lineitem scan on l_orderkey; the p1 < p2 predicate
    * halves the output and canonicalizes direction at the join, not
    * after.
    */
  private def coOrderEdgesPlan(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
    val a = li.toDF("ok", "p1")
    val b = li.toDF("ok", "p2")
    a.join(b, Seq("ok")).filter(col("p1") < col("p2"))
      .select(col("p1"), col("p2")).distinct()
  }

  /** The edge relation, materialized ONCE per corpus to scratch
    * parquet and shared by every graph query (triangles and the
    * degree histogram previously each recomputed the self-join +
    * distinct — the single most expensive shuffle in the graph
    * suite). On a cluster this is the standard shape: derive the
    * edge list once, persist it, run N analytics over it.
    */
  private def coOrderEdges(s: SparkSession, d: String): DataFrame =
    graft.util.ScratchIndex.materialize(
      s, s"edges_v1_${d.hashCode.toHexString}")(coOrderEdgesPlan(s, d))

  /** Triangle count over the co-purchase graph: the classic
    * three-way distributed equi-join on canonically-oriented edges
    * (p1<p2<p3 counts each triangle exactly once). Plan shape at
    * scale: edges shuffle once per join key; AQE picks the join
    * strategy per stage; the final count is a full partial-agg
    * reduce. Emits graph summary stats alongside the count so the
    * oracle hash pins more than one number.
    */
  def triangles(s: SparkSession, d: String): DataFrame = {
    val e = coOrderEdges(s, d)
    // Adjacency-intersection formulation: the wedge relation of the
    // naive three-way join is ~40× the edge count (49M rows at sf0.1)
    // and dominates whether shuffled OR broadcast-probed. Instead:
    // build each vertex's sorted out-neighbor list once (one shuffle
    // of the edges), then for edge (a,b) the triangles it closes are
    // |N⁺(a) ∩ N⁺(b)| — a fused allocation-free merge per edge, no
    // wedge row ever materialized. Counts each triangle once at its
    // two smallest vertices. No join hints: the adjacency relation
    // does NOT fit in executor memory at cluster scale, so the
    // strategy must stay AQE's call — broadcast while small, a
    // shuffle join co-partitioned with the edge list beyond that;
    // the per-edge kernel is the same either way.
    val adj = e.groupBy(col("p1").as("v"))
      .agg(sort_array(collect_list(col("p2"))).as("nbrs"))
    val tri = e
      .join(adj.withColumnRenamed("nbrs", "na"),
        col("p1") === col("v")).drop("v")
      .join(adj.withColumnRenamed("nbrs", "nb"),
        col("p2") === col("v")).drop("v")
      .select(graft.functions.SetSimilarityFunctions
        .sorted_long_intersect(col("na"), col("nb")).as("closes"))
      .agg(sum(col("closes")).as("n_triangles"))
    val stats = e.agg(
      count(lit(1)).as("n_edges"),
      countDistinct(col("p1")).as("n_left_vertices"),
      max(col("p2")).as("max_vertex"))
    tri.crossJoin(stats)
      .select(col("n_triangles"), col("n_edges"),
        col("n_left_vertices"), col("max_vertex"))
  }

  val trianglesSql: String =
    """WITH e AS (
      |  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      |  FROM lineitem a
      |  JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |)
      |SELECT (SELECT count(*)
      |        FROM e e1
      |        JOIN e e2 ON e1.p2 = e2.p1
      |        JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2) AS n_triangles,
      |       count(*) AS n_edges,
      |       count(DISTINCT p1) AS n_left_vertices,
      |       max(p2) AS max_vertex
      |FROM e""".stripMargin

  /** Per-vertex degree distribution of the co-purchase graph: degree
    * = #distinct co-ordered partners (both directions), histogrammed.
    * Two narrow shuffles (edge dedup, degree agg) — the profile query
    * run before any triangle/motif job to bound the skew.
    */
  def degreeHistogram(s: SparkSession, d: String): DataFrame = {
    val e = coOrderEdges(s, d)
    e.select(col("p1").as("v")).unionAll(e.select(col("p2").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_vertices"))
      .orderBy("degree")
  }

  val degreeHistogramSql: String =
    """WITH e AS (
      |  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      |  FROM lineitem a
      |  JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), deg AS (
      |  SELECT v, count(*) AS degree
      |  FROM (SELECT p1 AS v FROM e UNION ALL SELECT p2 AS v FROM e)
      |  GROUP BY v
      |)
      |SELECT degree, count(*) AS n_vertices
      |FROM deg GROUP BY degree ORDER BY degree""".stripMargin

  /** Hop cap for [[bfsHops]]: 4 join rounds bound both engines'
    * iteration, and on this co-purchase graph (diameter ~3-4) the
    * 4-hop ball already covers the reachable component.
    */
  private val MaxHops = 4

  /** Bounded multi-source BFS: minimum hop distance from the seed set
    * (vertices with id <= 5) over the undirected co-purchase graph,
    * capped at [[MaxHops]]. The propagation primitive behind
    * link-graph curation (seed-quality expansion, spam-distance
    * labeling) expressed as the scalable join iteration: each hop is
    * ONE frontier⋈edges equi-join + distinct + anti-join against the
    * visited set — no vertex ever carries more than its (id, dist)
    * pair, so a hop shuffles O(frontier × avg-degree) rows regardless
    * of graph size, and the hop count (not the corpus) bounds the
    * number of shuffles. Per-level frontiers are persisted (each is
    * consumed by the next join AND the growing visited union) and the
    * whole loop runs inside a ScratchIndex.materialize thunk — the
    * converged distance table is written once per corpus, distributed,
    * and re-read thereafter (the dedupClusters discipline; BFS output
    * is a derived index a pipeline queries many times). Distances are
    * exact integers — no float-tie surface.
    */
  def bfsHops(s: SparkSession, d: String): DataFrame = {
    var toRelease: List[DataFrame] = Nil
    val dists = graft.util.ScratchIndex.materialize(
        s, s"bfshops_v1_${d.hashCode.toHexString}") {
      val e0 = coOrderEdges(s, d)
      // undirected walk over canonical (p1 < p2) edges
      val e = e0.select(col("p1").as("a"), col("p2").as("b"))
        .unionAll(e0.select(col("p2").as("a"), col("p1").as("b")))
      var frontier = e.select(col("a").as("v")).distinct()
        .filter(col("v") <= 5).persist()
      toRelease ::= frontier
      var visited = frontier.withColumn("dist", lit(0L))
      for (h <- 1 to MaxHops) {
        val next = frontier.join(e, frontier("v") === e("a"))
          .select(col("b").as("v")).distinct()
          .join(visited.select(col("v")), Seq("v"), "left_anti")
          .persist()
        toRelease ::= next
        visited = visited
          .unionByName(next.withColumn("dist", lit(h.toLong)))
        frontier = next
      }
      visited
    }
    toRelease.foreach(_.unpersist())
    dists.orderBy("v")
  }

  /** Recursive-CTE replay: UNION (not UNION ALL) semantics dedup the
    * generated (v, d) pairs per level, so the walk's row count is
    * bounded by vertices × (MaxHops+1) instead of multiplying by the
    * average degree each hop; min(d) collapses multi-path reaches to
    * the BFS distance.
    */
  val bfsHopsSql: String =
    """WITH e0 AS (
      |  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      |  FROM lineitem a
      |  JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e AS (
      |  SELECT p1 AS a, p2 AS b FROM e0
      |  UNION ALL SELECT p2, p1 FROM e0
      |), walk AS (
      |  WITH RECURSIVE r(v, d) AS (
      |    SELECT DISTINCT a AS v, 0 AS d FROM e WHERE a <= 5
      |    UNION
      |    SELECT e.b, r.d + 1 FROM r JOIN e ON r.v = e.a WHERE r.d < 4
      |  ) SELECT * FROM r
      |)
      |SELECT v, min(d) AS dist FROM walk GROUP BY v ORDER BY v""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_triangles"  -> (triangles _),
    "graph_degree_hist" -> (degreeHistogram _),
    "graph_bfs_hops"   -> (bfsHops _),
  )

  val oracle: Map[String, String] = Map(
    "graph_triangles"  -> trianglesSql,
    "graph_degree_hist" -> degreeHistogramSql,
    "graph_bfs_hops"   -> bfsHopsSql,
  )
}
