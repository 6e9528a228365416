package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Deduplication operators for LLM training-data pipelines — the capability layer the
 * reference never had (gazelle_plugin stops at SQL operators; graft extends the engine to
 * the data-curation workload it would actually run at 100 TB).
 *
 * Scale design:
 *  - Exact dedup groups on a 128-bit content hash (md5), never on raw text: shuffle rows
 *    are ~40 B instead of ~10 KB documents.
 *  - MinHash/LSH is O(n·bands) shuffle — candidate pairs are generated only inside LSH
 *    buckets, never via an O(n²) cross join. Bucket skew (a degenerate band hash) is
 *    bounded because signatures are uniform; a production guard would cap bucket size.
 *  - Candidate verification (exact Jaccard) joins the gram sets of candidate pairs only.
 *  - SimHash reduces each doc to 64 bits; banding the bits gives hamming-ball candidates
 *    with the same O(n·blocks) shuffle shape.
 *  - Embedding near-dup at this SF is a self-join; the 100 TB path is ann-style bucketing
 *    (see Similarity.annLsh) — both are provided.
 */
object Dedup {

  // ---- shared: token 3-gram shingles --------------------------------------------------

  /** (doc_id, grams: array<string>) — distinct token 3-grams, docs with >= 3 tokens. */
  def gramSets(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs.select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(0), size(col("toks")) - 3), i =>
          concat_ws(" ",
            element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2),
            element_at(col("toks"), i + 3)))).as("grams"))
  }

  /** Exact Jaccard over gram sets for a (a_id, b_id) candidate-pair frame. */
  private def verifiedJaccard(candidates: DataFrame, grams: DataFrame): DataFrame = {
    val ga = grams.select(col("doc_id").as("a_id"), col("grams").as("ga"))
    val gb = grams.select(col("doc_id").as("b_id"), col("grams").as("gb"))
    candidates
      .join(ga, "a_id").join(gb, "b_id")
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jacc",
        col("inter") * lit(1.0) / (size(col("ga")) + size(col("gb")) - col("inter")))
      .select(col("a_id"), col("b_id"), col("jacc"))
  }

  // ---- exact dedup ---------------------------------------------------------------------

  /** Exact dedup summary: total/distinct/duplicate counts, grouping on md5(text). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val docs = TableIO.documents(spark, dir)
    val groups = docs.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("copies"), min(col("doc_id")).as("keeper"))
    groups.agg(
      sum(col("copies")).as("n_docs"),
      count(lit(1)).as("n_distinct"),
      sum(col("copies") - 1).as("n_dupes"))
  }

  val dedupExactSql: String =
    """SELECT CAST(sum(copies) AS BIGINT) AS n_docs,
      |  count(*) AS n_distinct,
      |  CAST(sum(copies - 1) AS BIGINT) AS n_dupes
      |FROM (SELECT md5(text) AS h, count(*) AS copies, min(doc_id) AS keeper
      |      FROM documents GROUP BY md5(text))""".stripMargin

  // ---- MinHash + LSH -------------------------------------------------------------------

  private val MinhashPrime = 2147483647L // 2^31 - 1; keeps a*h+b < 2^62 (ANSI-safe, no overflow)
  private val NumHashes = 128
  private val Bands = 32 // 4 rows per band -> s-curve threshold ~ (1/32)^(1/4) ~ 0.42

  private lazy val minhashCoefs: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(20240812L)
    Seq.fill(NumHashes)((math.abs(rnd.nextLong()) % (MinhashPrime - 1) + 1,
      math.abs(rnd.nextLong()) % MinhashPrime))
  }

  /** (doc_id, sig_0..sig_127) MinHash signature via affine permutations of a 31-bit gram hash. */
  def minhashSignatures(grams: DataFrame): DataFrame = {
    val hashed = grams
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), pmod(xxhash64(col("gram")), lit(MinhashPrime)).as("gh"))
    val aggs = minhashCoefs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("gh") * a + b, lit(MinhashPrime))).as(s"sig_$i")
    }
    hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** (doc_id, band, bh) — one row per LSH band; the shuffle key of the near-dup join. */
  def lshBands(signatures: DataFrame): DataFrame = {
    val bandStructs = (0 until Bands).map { b =>
      val cols = (0 until 4).map(r => col(s"sig_${b * 4 + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }
    signatures
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh"))
  }

  /**
   * MinHash-LSH near-duplicate pairs, verified with exact Jaccard >= threshold.
   * With 128 perms / 32 bands, recall at j >= 0.8 is ~1 - (1 - 0.8^4)^32 > 0.999998, so the
   * verified output equals the exhaustive-jaccard oracle on any realistic data.
   */
  def dedupMinhash(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val grams = gramSets(TableIO.documents(spark, dir))
    val bands = lshBands(minhashSignatures(grams))
    val x = bands.select(col("doc_id").as("a_id"), col("band"), col("bh"))
    val y = bands.select(col("doc_id").as("b_id"), col("band"), col("bh"))
    val candidates = x.join(y, Seq("band", "bh"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    verifiedJaccard(candidates, grams)
      .filter(col("jacc") >= threshold)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Exhaustive-jaccard oracle (DuckDB explores all pairs; graft only LSH candidates). */
  def jaccardPairsSql(threshold: Double): String =
    s"""WITH grams AS (
       |  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
       |                                for i in range(1, len(t)-1)]) AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
       |  WHERE len(t) >= 3)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  len(list_intersect(a.g, b.g)) * 1.0
       |    / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS jacc
       |FROM grams a, grams b
       |WHERE a.doc_id < b.doc_id
       |  AND len(list_intersect(a.g, b.g)) * 1.0
       |    / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= $threshold
       |ORDER BY a_id, b_id""".stripMargin

  // ---- n-gram Jaccard via inverted index ----------------------------------------------

  /**
   * N-gram Jaccard near-dup at a lower threshold via an inverted gram index: candidates are
   * docs sharing >= 1 gram. At 100 TB add a document-frequency cutoff on index grams (drop
   * grams with df > F); here the full index keeps the result exactly equal to the oracle.
   */
  def dedupNgramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val grams = gramSets(TableIO.documents(spark, dir))
    val inv = grams.select(col("doc_id"), explode(col("grams")).as("gram"))
    val candidates = inv.select(col("doc_id").as("a_id"), col("gram"))
      .join(inv.select(col("doc_id").as("b_id"), col("gram")), Seq("gram"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    verifiedJaccard(candidates, grams)
      .filter(col("jacc") >= threshold)
      .orderBy(col("a_id"), col("b_id"))
  }

  // ---- SimHash -------------------------------------------------------------------------

  private val SimhashBlocks = 8

  /** (doc_id, simhash) — 64-bit SimHash over token xxhash64 values. */
  def simhashes(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("th"))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("th"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$j")
    }
    val agg = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val assembled = (0 until 64).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc_id"), assembled.as("simhash"))
  }

  /**
   * SimHash near-dup pairs with hamming distance <= maxHamming, candidates from 8-bit block
   * bands (pigeonhole guarantees recall for hamming < 8; planted near-dups land well under).
   * Hash-seeded — not SQL-expressible, so driver check is rows-only; DedupSpec asserts
   * recall against the exact-jaccard pairs.
   */
  def dedupSimhash(spark: SparkSession, dir: String, maxHamming: Int = 12): DataFrame = {
    val sh = simhashes(TableIO.documents(spark, dir))
    val blocks = (0 until SimhashBlocks).map { k =>
      struct(lit(k).as("blk"), shiftright(col("simhash"), k * 8).bitwiseAND(lit(255L)).as("bv"))
    }
    val banded = sh.select(col("doc_id"), col("simhash"), explode(array(blocks: _*)).as("e"))
      .select(col("doc_id"), col("simhash"), col("e.blk").as("blk"), col("e.bv").as("bv"))
    val x = banded.select(col("doc_id").as("a_id"), col("simhash").as("ha"), col("blk"), col("bv"))
    val y = banded.select(col("doc_id").as("b_id"), col("simhash").as("hb"), col("blk"), col("bv"))
    x.join(y, Seq("blk", "bv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("ha"), col("hb")).distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }

  // ---- embedding cosine near-dup -------------------------------------------------------

  /**
   * Embedding near-dup pairs (cosine >= tau) via the native CosineSimilarity expression.
   * Self-join here (correctness form); the 100 TB path buckets by LSH signature first
   * (Similarity.annLsh) so the pair space is per-bucket.
   */
  def dedupEmbedding(spark: SparkSession, dir: String, tau: Double = 0.45): DataFrame = {
    import graft.functions.VectorFunctions.cosineSimilarity
    val e = TableIO.embeddings(spark, dir)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", cosineSimilarity(col("ea"), col("eb")))
      .filter(col("cos") >= tau)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos4"))
      .orderBy(col("a_id"), col("b_id"))
  }

  def dedupEmbeddingSql(tau: Double): String =
    s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |  round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS cos4
       |FROM embeddings a, embeddings b
       |WHERE a.vec_id < b.vec_id
       |  AND list_cosine_similarity(a.embedding, b.embedding) >= $tau
       |ORDER BY a_id, b_id""".stripMargin

  // ---- registry ------------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact(_, _)),
    "dedup_minhash" -> (dedupMinhash(_, _)),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard(_, _)),
    "dedup_simhash" -> (dedupSimhash(_, _)),
    "dedup_embedding" -> (dedupEmbedding(_, _)))

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_minhash" -> jaccardPairsSql(0.8),
    "dedup_ngram_jaccard" -> jaccardPairsSql(0.5),
    // dedup_simhash intentionally omitted: hash-seeded, spec-verified (rows-only here)
    "dedup_embedding" -> dedupEmbeddingSql(0.45))
}
