package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Iterative graph analytics beyond connected components: fixed-iteration PageRank —
 * the GraphX/Pregel capability class expressed as pure DataFrame iteration, the same
 * large-scale shape as Dedup.connectedComponents: edges pre-partitioned + cached on the
 * join key, ONE shuffle per iteration (the contribution groupBy), localCheckpoint each
 * round so the logical plan and Catalyst re-analysis cost stay O(1) in iterations, and
 * the driver loops over ITERATIONS, never rows.
 *
 * PageRank is run to a FIXED iteration count (not convergence) so the result is exactly
 * replayable: the DuckDB oracle unrolls the same three power-iteration steps as chained
 * CTEs and must hash-match after rounding to 6 decimals (the only cross-engine delta is
 * double-summation order, ~1e-15 — far below the rounding grain).
 */
object GraphOps {

  /**
   * Fixed-iteration damped PageRank over a symmetric (src, dst) edge list. Multi-edges
   * are deduplicated internally (the adjacency build is set-valued), so callers may pass
   * a raw pair list. Returns (id, pr) for every node with at least one edge. Symmetry
   * means every node has both in- and out-degree, so no dangling-mass redistribution
   * term is needed.
   */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85): DataFrame = {
    // Adjacency-set build: ONE shuffle (groupBy src) dedups multi-edges, computes the
    // out-degree, and leaves the frame hash-partitioned on src all at once — the
    // explode back to (src, dst, w=1/deg) is map-only and keeps that partitioning for
    // the cached per-iteration frame. (The GraphX representation: per-vertex adjacency;
    // per-group memory is one node's neighbor set, the same bound GraphX carries.)
    val ew = edges.select(col("src"), col("dst"))
      .groupBy(col("src")).agg(collect_set(col("dst")).as("dsts"))
      .select(col("src"), explode(col("dsts")).as("dst"),
        (lit(1.0) / size(col("dsts"))).as("w"))
      .cache()
    // Node count off the CACHED frame (first action, so it also populates the cache);
    // counting via `deg` would re-run the whole edge lineage a second time.
    val n = ew.select(col("src")).distinct().count()
    var ranks = ew.select(col("src").as("id")).distinct()
      .select(col("id"), lit(1.0 / n).as("pr")).localCheckpoint()
    var it = 0
    while (it < iterations) {
      val contribs = ew
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), (col("pr") * col("w")).as("c"))
      val next = contribs.groupBy(col("id"))
        .agg((lit((1.0 - damping) / n) + lit(damping) * sum(col("c"))).as("pr"))
        .localCheckpoint()
      ranks.unpersist()
      ranks = next
      it += 1
    }
    ew.unpersist()
    ranks
  }

  /**
   * `q_pagerank`: top-50 parts by PageRank over the co-purchase graph (parts sharing an
   * order, both directions). Scores rounded to 6 decimals for a total cross-engine
   * order (pr6 desc, then partkey).
   */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    // Co-purchase pairs WITHOUT a fact-fact self-join: one groupBy(order) shuffle of the
    // scan (vs shuffling both join sides), then the per-order part set expands to ordered
    // pairs map-side (orders hold a handful of parts, so the blow-up is local and tiny).
    val li = TableIO.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
    val perOrder = li.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
    val edges = perOrder
      .select(explode(col("ps")).as("src"), col("ps"))
      .select(col("src"), explode(col("ps")).as("dst"))
      .filter(col("src") =!= col("dst"))
    pageRank(edges, iterations = 3)
      .select(col("id").as("l_partkey"), round(col("pr"), 6).as("pr6"))
      .orderBy(col("pr6").desc, col("l_partkey"))
      .limit(50)
  }

  val qPagerankSql: String =
    """WITH edges AS (
      |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      |), deg AS (
      |  SELECT src, count(*) AS deg FROM edges GROUP BY src
      |), nn AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n FROM deg
      |), r0 AS (
      |  SELECT src AS id, 1.0 / (SELECT n FROM nn) AS pr FROM deg
      |), r1 AS (
      |  SELECT e.dst AS id,
      |         0.15 / (SELECT n FROM nn) + 0.85 * sum(r.pr / d.deg) AS pr
      |  FROM edges e JOIN r0 r ON r.id = e.src JOIN deg d ON d.src = e.src
      |  GROUP BY e.dst
      |), r2 AS (
      |  SELECT e.dst AS id,
      |         0.15 / (SELECT n FROM nn) + 0.85 * sum(r.pr / d.deg) AS pr
      |  FROM edges e JOIN r1 r ON r.id = e.src JOIN deg d ON d.src = e.src
      |  GROUP BY e.dst
      |), r3 AS (
      |  SELECT e.dst AS id,
      |         0.15 / (SELECT n FROM nn) + 0.85 * sum(r.pr / d.deg) AS pr
      |  FROM edges e JOIN r2 r ON r.id = e.src JOIN deg d ON d.src = e.src
      |  GROUP BY e.dst
      |)
      |SELECT id AS l_partkey, round(pr, 6) AS pr6
      |FROM r3
      |ORDER BY pr6 DESC, l_partkey
      |LIMIT 50""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> (qPagerank(_, _)))

  val oracles: Map[String, String] = Map(
    "q_pagerank" -> qPagerankSql)
}
