package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosineSimilarity
import graft.sources.TableIO

/**
 * Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the embedding space,
 * then drop near-duplicates WITHIN each cluster — the curation step that removes
 * semantically redundant documents (not just textual near-copies, which the
 * MinHash/SimHash lanes catch) before training.
 *
 * Scale shape: the O(n²) pair space of naive embedding dedup collapses to a per-cluster
 * quadratic bounded by cluster size. Clustering is the IVF machinery reused verbatim —
 * a sampled spherical-k-means quantizer (bounded 0.5 MB driver sample, broadcast
 * centroids) and a map-only typed assignment kernel (Similarity.ivfAssign), so the only
 * shuffle is O(n) on the cluster key and per-cluster work is (n/k)² — scale by raising
 * `k` so clusters stay partition-sized, exactly the IVF argument. No whole-corpus
 * comparison ever happens.
 *
 * Keep policy: within a cluster, a vector is dropped iff some LOWER-id cluster-mate has
 * cosine >= tau (keep-min-id, same convention as the text dedup lanes) — deterministic
 * given an assignment.
 *
 * Correctness split (the dedup_embedding pattern): the production form
 * (`dedup_semantic`, k-means clusters) is rows-only for the driver because sampled
 * k-means is not SQL-expressible; the WITHIN-CLUSTER dedup semantics are hash-proven by
 * `dedup_semantic_fixed`, which routes the SAME dedup code over a deterministic
 * SQL-expressible assignment (centroids = the k lowest-vec_id embeddings, nearest by
 * cosine, ties to the lower centroid id) and matches a DuckDB replay end-to-end.
 * SemanticDedupSpec adds planted-cluster recall/precision on the k-means form.
 */
object SemanticDedup {

  /** Target cluster occupancy: k scales as n/256, so per-cluster pair work is bounded
    * (~32k pairs) at ANY corpus size — the same corpus-adaptive-geometry discipline as
    * Similarity.lshParams (whose fixed geometry was round 5's one genuine super-linear
    * plan until the sf1 rehearsal caught it; the fixed-k form here was the second,
    * caught by the same rehearsal re-run: 0.66 s -> 10.8 s isolated at 10x data). */
  private val TargetOccupancy = 256

  private[graft] def adaptiveK(n: Long, floor: Int): Int =
    math.max(floor, math.ceil(n / TargetOccupancy.toDouble)).toInt

  /**
   * (vec_id, cluster, keep): every vector with its cluster and a 0/1 keep flag —
   * keep = 0 iff a lower-id vector in the same cluster has cosine >= tau. The pair join
   * shuffles on the cluster key only; the cosine verification runs the native codegen
   * kernel on the surviving candidate pairs.
   */
  private[graft] def dedupWithinClusters(assign: DataFrame, vecs: DataFrame,
      tau: Double): DataFrame = {
    val a = assign.select(col("vec_id").as("a_id"), col("cluster"))
    val b = assign.select(col("vec_id").as("b_id"), col("cluster"))
    val dups = a.join(b, Seq("cluster"))
      .filter(col("b_id") < col("a_id"))
      .join(vecs.select(col("vec_id").as("a_id"), col("embedding").as("ea")), "a_id")
      .join(vecs.select(col("vec_id").as("b_id"), col("embedding").as("eb")), "b_id")
      .filter(cosineSimilarity(col("ea"), col("eb")) >= tau)
      .select(col("a_id").as("vec_id")).distinct()
    assign.join(dups.withColumn("dup", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        when(col("dup").isNotNull, lit(0)).otherwise(lit(1)).as("keep"))
  }

  /** Production form: sampled-spherical-k-means clusters (Similarity.trainQuantizer /
    * ivfAssign — broadcast centroids, map-only assignment), then within-cluster dedup.
    * `k <= 0` (the default) derives the cluster count from the corpus size so occupancy
    * stays bounded — pass an explicit k only to pin geometry in tests. */
  def semanticDedup(vecs: DataFrame, k: Int = -1, tau: Double = 0.45): DataFrame = {
    val kEff = if (k > 0) k else adaptiveK(vecs.count(), floor = 16)
    val cents = Similarity.trainQuantizer(vecs, kEff)
    val assign = Similarity.ivfAssign(vecs, 1, cents)
      .select(col("vec_id"), col("list_id").as("cluster"))
    dedupWithinClusters(assign, vecs, tau).orderBy(col("vec_id"))
  }

  def dedupSemantic(spark: SparkSession, dir: String): DataFrame =
    semanticDedup(TableIO.embeddings(spark, dir))

  /**
   * Oracle twin: deterministic fixed centroids (the `k` lowest-vec_id embeddings),
   * assignment by max cosine with ties to the lower centroid id — every step
   * SQL-expressible, so the whole pipeline (assignment + within-cluster dedup) is
   * hash-checked against DuckDB. Routes through the same [[dedupWithinClusters]] as the
   * production form.
   */
  def semanticDedupFixed(vecs: DataFrame, k: Int = -1, tau: Double = 0.45): DataFrame = {
    // corpus-adaptive k (floor 8) exactly as the SQL twin computes it — the oracle form
    // must not keep the quadratic fixed-k geometry the production form escapes
    val kEff = if (k > 0) k else adaptiveK(vecs.count(), floor = 8)
    val cents = vecs.orderBy(col("vec_id")).limit(kEff)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = vecs.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .withColumn("cos", cosineSimilarity(col("embedding"), col("ce")))
    val assign = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cid"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("cluster"))
    dedupWithinClusters(assign, vecs, tau).orderBy(col("vec_id"))
  }

  def dedupSemanticFixed(spark: SparkSession, dir: String): DataFrame =
    semanticDedupFixed(TableIO.embeddings(spark, dir))

  def dedupSemanticFixedSql(tau: Double): String =
    s"""WITH cents AS (
       |  SELECT vec_id AS cid, embedding AS ce FROM embeddings ORDER BY vec_id
       |  LIMIT greatest(8, CAST(ceil((SELECT count(*) FROM embeddings) / 256.0) AS BIGINT))
       |), scored AS (
       |  SELECT e.vec_id, c.cid,
       |         list_cosine_similarity(e.embedding, c.ce) AS cos
       |  FROM embeddings e CROSS JOIN cents c
       |), assign AS (
       |  SELECT vec_id, cid AS cluster FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
       |    FROM scored) t
       |  WHERE rn = 1
       |), dups AS (
       |  SELECT DISTINCT a.vec_id
       |  FROM assign a
       |  JOIN assign b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id
       |  WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= $tau
       |)
       |SELECT a.vec_id, a.cluster,
       |       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
       |FROM assign a LEFT JOIN dups d ON a.vec_id = d.vec_id
       |ORDER BY a.vec_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_semantic" -> (dedupSemantic(_, _)),
    "dedup_semantic_fixed" -> (dedupSemanticFixed(_, _)))

  val oracles: Map[String, String] = Map(
    // dedup_semantic intentionally omitted: sampled k-means is not SQL-expressible;
    // the within-cluster dedup semantics are hash-proven by the fixed twin below
    "dedup_semantic_fixed" -> dedupSemanticFixedSql(0.45))
}
