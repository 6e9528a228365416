package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Ranked retrieval over the corpus: BM25 scoring as pure relational algebra — the shape a
 * training-data pipeline uses to mine for topical documents at 100 TB.
 *
 * Plan shape (and why it scales):
 *   - tokenize: map-only explode of codegen'd `split` (no UDF, no driver)
 *   - term frequencies: ONE shuffle on (doc_id, term) with map-side partial counts
 *   - doc lengths: derived from the tf frame (sum of tf per doc) — reuses the combined
 *     frame instead of re-shuffling raw tokens (|tf| << |tokens| on natural text)
 *   - corpus stats (N, avgdl) and per-term document frequencies for the QUERY terms only:
 *     tiny one-row / few-row frames, broadcast into the scoring join
 *   - score: broadcast joins + one final groupBy(doc_id) over rows already filtered to
 *     query terms — the big shuffle carries only matching (doc, term) rows
 *
 * Everything is exact arithmetic over counts, so the DuckDB oracle reproduces it to
 * 1 ulp and a round(5) at the edge makes the comparison stable. No top-k cut inside the
 * operator: the k-boundary is where two engines' fp noise could legitimately disagree,
 * so ranking cuts belong to the caller (via TopKPerKey) — the operator returns every
 * document matching at least one query term.
 */
object TextRetrieval {

  /** Lowercase word tokens, empty strings dropped (leading punctuation artifacts). */
  private def tokens(text: Column): Column =
    filter(split(lower(text), "\\W+"), t => length(t) > 0)

  /**
   * BM25 scores for `queryTerms` over a (doc_id, text) frame. Returns
   * (doc_id, n_hits, score) for every document containing >= 1 query term.
   * Standard Robertson/Sparck-Jones parameters k1=1.2, b=0.75; idf = ln(1 + (N-df+.5)/(df+.5)).
   */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must not be empty")
    val toks = TableIO.fanOut(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val dfreq = tf.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = col("tf") * (k1 + 1) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))

    tf.filter(col("term").isin(queryTerms: _*))
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id") // both sides shuffle on doc_id; rows are already query-term-only
      .crossJoin(broadcast(corpus))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), round(sum(idf * tfNorm), 5).as("score"))
  }

  /** Driver-contract query: BM25 for three corpus terms over `documents`. */
  def bm25Query(spark: SparkSession, dir: String): DataFrame =
    bm25(TableIO.documents(spark, dir), Seq("spark", "join", "window"))
      .orderBy(col("doc_id"))

  val bm25Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '\W+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM toks WHERE len(term) > 0 GROUP BY 1, 2
      |), dl AS (
      |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
      |), corpus AS (
      |  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
      |), dfreq AS (
      |  SELECT term, count(*) AS df FROM tf
      |  WHERE term IN ('spark', 'join', 'window') GROUP BY 1
      |)
      |SELECT f.doc_id, count(*) AS n_hits,
      |  round(sum(
      |    ln(1 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
      |    * f.tf * (1.2 + 1) / (f.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / c.avgdl))
      |  ), 5) AS score
      |FROM tf f
      |JOIN dfreq d USING (term)
      |JOIN dl l USING (doc_id)
      |CROSS JOIN corpus c
      |WHERE f.term IN ('spark', 'join', 'window')
      |GROUP BY f.doc_id
      |ORDER BY f.doc_id""".stripMargin

  /**
   * TF-IDF keyword extraction: the top-k characteristic terms of every document — the
   * per-document twin of `text_topgrams` (corpus-global) and the classic first feature
   * of topical mining / clustering labels.
   *
   * Plan shape: tf = ONE map-side-combined shuffle on (doc_id, term); df = ONE combine
   * on term (|vocab| rows — joined back by term as a plain shuffle join, since at corpus
   * scale the vocabulary is not broadcastable by assumption); the per-doc top-k is a
   * rank<=k window that RankLimitRule rewrites onto the native TopKPerKey pre-limit, so
   * no per-document full sort materializes. idf = ln((1+N)/(1+df)) + 1 (smoothed,
   * sklearn-style); scores rounded to 6 before ranking so both engines rank identical
   * numbers; ties broken by term.
   */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = TableIO.fanOut(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpus = docs.agg(count(lit(1)).as("n_docs"))
    val idf = log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + 1.0
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(corpus))
      .withColumn("score6", round(col("tf") * idf, 6))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score6").desc, col("term"))))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("term"), col("score6"))
  }

  /** Driver-contract query: top-3 TF-IDF terms per document. */
  def tfidfQuery(spark: SparkSession, dir: String): DataFrame =
    tfidfTopTerms(TableIO.documents(spark, dir), 3)
      .orderBy(col("doc_id"), col("rk"))

  val tfidfSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '\W+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM toks WHERE len(term) > 0 GROUP BY 1, 2
      |), dfreq AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY 1
      |), corpus AS (
      |  SELECT count(*) AS n_docs FROM documents
      |), scored AS (
      |  SELECT f.doc_id, f.term,
      |         round(f.tf * (ln((1.0 + c.n_docs) / (1.0 + d.df)) + 1.0), 6) AS score6
      |  FROM tf f JOIN dfreq d USING (term) CROSS JOIN corpus c
      |), ranked AS (
      |  SELECT doc_id, term, score6,
      |         row_number() OVER (PARTITION BY doc_id
      |                            ORDER BY score6 DESC, term) AS rk
      |  FROM scored
      |)
      |SELECT doc_id, CAST(rk AS INT) AS rk, term, score6
      |FROM ranked WHERE rk <= 3
      |ORDER BY doc_id, rk""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bm25" -> bm25Query _,
    "text_tfidf" -> tfidfQuery _)

  val oracles: Map[String, String] = Map(
    "text_bm25" -> bm25Sql,
    "text_tfidf" -> tfidfSql)
}
