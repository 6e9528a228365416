package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Positional inverted-index retrieval and corpus-overlap estimation — the two index
 * structures a corpus engine needs beyond bag-of-words scoring (BM25/TF-IDF already
 * live in TextRetrieval): exact PHRASE queries via a positional index, and
 * source-vs-source vocabulary overlap both exact and as a MinHash sketch (the form
 * that stays cheap when each source is terabytes).
 */
object TextIndex {

  // ----------------------------------------------------------- text_phrase

  /**
   * `text_phrase`: exact phrase search through a positional inverted index. The three
   * most frequent corpus trigrams become the phrase queries; each is answered by
   * joining the (term, doc_id, pos) index against itself with pos-adjacency — the
   * standard positional-postings AND-merge, expressed as equi-joins Catalyst can plan.
   *
   * Scale shape: the index legs are pre-filtered by a BROADCAST of the phrase terms
   * (a query-sized dimension), so only matching postings ever shuffle, partitioned by
   * (phrase, doc_id, start) — never the full index. The DuckDB oracle answers the same
   * queries by direct trigram containment (a different algorithm), making the oracle
   * an independent witness of the index semantics.
   */
  def textPhrase(spark: SparkSession, dir: String, nPhrases: Int = 3): DataFrame = {
    val docs = TableIO.documents(spark, dir).filter(col("text").isNotNull)
    val toks = docs.select(col("doc_id"),
      posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "term")))
    val phrases = docs.select(split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= 3)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))"))
        .as("phrase"))
      .groupBy(col("phrase")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("phrase")).limit(nPhrases)
      .select(col("phrase"), split(col("phrase"), " ").as("w"))
    val legs = (0 to 2).map { i =>
      toks.join(broadcast(phrases.select(col("phrase"), col("w")(i).as("term"))), "term")
        .select(col("phrase"), col("doc_id"), (col("pos") - i).as("start"))
    }
    legs.reduce(_.join(_, Seq("phrase", "doc_id", "start")))
      .groupBy(col("phrase"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_occ"))
      .orderBy(col("phrase"))
  }

  val textPhraseSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |  FROM documents WHERE text IS NOT NULL),
      |ex AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS phrase
      |  FROM t WHERE len(w) >= 3),
      |top3 AS (
      |  SELECT phrase, count(*) AS cnt FROM ex GROUP BY 1
      |  ORDER BY cnt DESC, phrase LIMIT 3)
      |SELECT e.phrase, CAST(count(DISTINCT e.doc_id) AS BIGINT) AS n_docs,
      |       count(*) AS n_occ
      |FROM ex e JOIN top3 USING (phrase)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------- corpus_overlap

  /** (source, term) distinct vocabulary frame — one map-side-combined distinct. */
  private def vocab(spark: SparkSession, dir: String): DataFrame =
    TableIO.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .distinct()

  /**
   * `corpus_overlap`: exact vocabulary Jaccard for every pair of sources — the
   * corpus-composition diagnostic run before mixing training sources. The
   * intersection join partitions BY TERM (each term meets at most |sources| rows), so
   * no pair ever materializes both vocabularies on one task; per-source sizes ride a
   * broadcast dimension.
   */
  def corpusOverlap(spark: SparkSession, dir: String): DataFrame = {
    val v = vocab(spark, dir)
    val sizes = v.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = v.as("a").join(v.as("b"), "term")
      .filter(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("na"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("nb"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_inter"),
        round(col("n_inter") / (col("na") + col("nb") - col("n_inter")), 4).as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val corpusOverlapSql: String =
    """WITH v AS (
      |  SELECT DISTINCT source, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents WHERE text IS NOT NULL),
      |sizes AS (SELECT source, count(*) AS n FROM v GROUP BY 1),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
      |  FROM v a JOIN v b USING (term) WHERE a.source < b.source GROUP BY 1, 2)
      |SELECT i.src_a, i.src_b, i.n_inter,
      |       round(i.n_inter / (sa.n + sb.n - i.n_inter), 4) AS jaccard
      |FROM inter i
      |JOIN sizes sa ON sa.source = i.src_a
      |JOIN sizes sb ON sb.source = i.src_b
      |ORDER BY src_a, src_b""".stripMargin

  // ------------------------------------------------ corpus_overlap_minhash

  private final val MhK = 128

  /** Deterministic 64-bit hash of `term` under permutation `i` (splitmix64 finalizer
    * over a seed-offset murmur of the term). */
  private[graft] def permHash(term: String, i: Int): Long = {
    var z = scala.util.hashing.MurmurHash3.stringHash(term).toLong +
      (i + 1) * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /**
   * `corpus_overlap_minhash`: the same pairwise vocabulary Jaccard as
   * `corpus_overlap`, estimated from K=128 MinHash signature components — the sketch
   * that replaces the term-level intersection join with one constant-width signature
   * per source (K longs), so pairwise comparison cost is |sources|² x K regardless of
   * corpus size. Per-partition mins fold in a single typed pass (fixed K-long state);
   * signatures merge by elementwise min through reduceGroups' partial aggregation.
   * Estimates are approximate by design -> rows-only for the driver; TextIndexSpec
   * bounds the error against the exact twin.
   */
  def corpusOverlapMinhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = vocab(spark, dir).select(col("source"), col("term"))
      .as[(String, String)]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap.empty[String, Array[Long]]
        it.foreach { case (src, term) =>
          val a = acc.getOrElseUpdate(src, Array.fill(MhK)(Long.MaxValue))
          var i = 0
          while (i < MhK) { val h = permHash(term, i); if (h < a(i)) a(i) = h; i += 1 }
        }
        acc.iterator.map { case (s, a) => (s, a.toSeq) }
      }
      .groupByKey(_._1)
      .reduceGroups((x, y) => (x._1, x._2.zip(y._2).map(p => math.min(p._1, p._2))))
      .map(_._2)
      .toDF("source", "sig")
    sigs.as("a").join(sigs.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        round(expr(
          "aggregate(zip_with(a.sig, b.sig, (x, y) -> IF(x = y, 1, 0)), 0, (s, v) -> s + v)")
          .cast("double") / lit(MhK), 4).as("jaccard_est"))
      .orderBy(col("src_a"), col("src_b"))
  }

  // ------------------------------------------------------------ registry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_phrase" -> (textPhrase(_, _, 3)),
    "corpus_overlap" -> (corpusOverlap(_, _)),
    "corpus_overlap_minhash" -> (corpusOverlapMinhash(_, _)))

  // corpus_overlap_minhash is rows-only by declared design (sketch estimate); the
  // exact twin corpus_overlap carries the hash-matched oracle and TextIndexSpec
  // carries the sketch error bound
  val oracles: Map[String, String] = Map(
    "text_phrase" -> textPhraseSql,
    "corpus_overlap" -> corpusOverlapSql)
}
