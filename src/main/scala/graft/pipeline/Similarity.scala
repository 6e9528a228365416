package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosineSimilarity, dotProduct}
import graft.sources.TableIO

/**
 * Approximate-nearest-neighbor search over the `embeddings` table (`array<float>` column).
 *
 * Two paths, both distributed:
 *  - Brute force (the correctness baseline): broadcast the query set, scan the corpus once,
 *    per-query top-k via window rank. Linear in corpus size; at 100 TB this is one full
 *    scan per query batch — acceptable for offline eval, not for serving.
 *  - Random-hyperplane LSH (the scale path): 12-bit signature buckets the corpus; queries
 *    probe only their own bucket. Shuffle is O(n) on the bucket key; per-bucket top-k.
 *    Recall vs brute force is asserted in SimilaritySpec.
 */
object Similarity {

  /** Top-k neighbors for each query vector (vec_id < nQueries), brute force. */
  def annBruteforce(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = TableIO.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(queries).join(corpus, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineSimilarity(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cos4"))
      .orderBy(col("query_id"), col("rank"))
  }

  def annBruteforceSql(nQueries: Int, k: Int): String =
    s"""SELECT query_id, rank, neighbor_id, cos4 FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(CAST(list_cosine_similarity(q.embedding, c.embedding) AS DOUBLE), 4) AS cos4,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank
       |  FROM embeddings q, embeddings c
       |  WHERE q.vec_id < $nQueries AND q.vec_id <> c.vec_id) t
       |WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  // ---- LSH path -------------------------------------------------------------------------

  private val Dim = 64
  private val SigBits = 12

  /** Deterministic random hyperplanes (seeded), materialized as literal float arrays. */
  private lazy val hyperplanes: Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(8123402L)
    Seq.fill(SigBits)(Seq.fill(Dim)((rnd.nextGaussian()).toFloat))
  }

  /** Append a `bucket` column: 12-bit random-hyperplane signature of `embedding`. */
  def withLshBucket(df: DataFrame): DataFrame = {
    val bits = hyperplanes.zipWithIndex.map { case (h, i) =>
      when(dotProduct(col("embedding"), typedLit(h)) > 0.0, lit(1 << i)).otherwise(lit(0))
    }
    df.withColumn("bucket", bits.reduce(_ + _))
  }

  /**
   * Bucketed ANN: queries probe only their own signature bucket. Output shape matches
   * annBruteforce; recall is < 1 by construction (single probe), so this is rows-only for
   * the driver and recall-asserted in SimilaritySpec.
   */
  def annLsh(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = withLshBucket(TableIO.embeddings(spark, dir))
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"), col("bucket"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    queries.join(corpus, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineSimilarity(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cos4"))
      .orderBy(col("query_id"), col("rank"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> (annBruteforce(_, _)),
    "ann_lsh" -> (annLsh(_, _)))

  val oracles: Map[String, String] = Map(
    "ann_bruteforce" -> annBruteforceSql(10, 5))
    // ann_lsh: approximate by design -> rows-only + recall spec
}
