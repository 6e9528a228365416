package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Interpolated Kneser-Ney bigram language model (Kneser & Ney '95; Chen & Goodman '98
 * eq. 4.25) trained and evaluated as pure relational plans — the count-based LM that
 * backs classic data-quality scoring (KenLM-style perplexity gates on corpus text,
 * cf. CCNet) reduced to its data-engine core:
 *
 *   P(w2|w1) = max(c(w1 w2) - D, 0)/c(w1) + D * N1+(w1 ·)/c(w1) * N1+(· w2)/N1+(· ·)
 *
 * with absolute discount D = 0.75. Every statistic is one map-side-combined groupBy
 * over the bigram frame (vocabulary-squared-bounded, Heaps-law sublinear in corpus
 * size — never corpus-sized): context totals and fan-out partition by w1,
 * continuation counts by w2, and the distinct-bigram total rides a 1-row broadcast.
 * Evaluation joins per-language bigram counts back to the model — a model-sized join,
 * and the only corpus-sized work in the whole plan is the initial tokenize+count.
 */
object LanguageModel {

  private final val D = 0.75

  /** (lang, w1, w2) bigram occurrences of every document. */
  private def bigrams(spark: SparkSession, dir: String): DataFrame =
    TableIO.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("lang"), split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("lang"), explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i+1] AS w2))"))
        .as("b"))
      .select(col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** KN-smoothed conditional probability frame (w1, w2, p) from a bigram frame. */
  private[graft] def knModel(pairs: DataFrame): DataFrame = {
    val c12 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val ctx = c12.groupBy(col("w1"))
      .agg(sum(col("c")).as("c1"), count(lit(1)).as("n1f"))
    val cont = c12.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val tot = c12.agg(count(lit(1)).as("bb"))
    // operand order mirrors the oracle SQL exactly so per-row doubles are identical
    c12.join(ctx, "w1").join(cont, "w2").crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"),
        (greatest(col("c") - lit(D), lit(0.0)) / col("c1") +
          lit(D) * col("n1f") / col("c1") * col("n1b") / col("bb")).as("p"))
  }

  /**
   * `text_kn_lm`: per-language cross-entropy (bits/bigram) of the corpus under the
   * corpus-trained KN bigram model — the relative-quality ranking of each language
   * slice against the global token distribution.
   */
  def textKnLm(spark: SparkSession, dir: String): DataFrame = {
    val pairs = bigrams(spark, dir)
    val el = pairs.groupBy(col("lang"), col("w1"), col("w2")).agg(count(lit(1)).as("ec"))
    el.join(knModel(pairs), Seq("w1", "w2"))
      .groupBy(col("lang"))
      .agg(sum(col("ec")).as("n_bigrams"),
        round(-sum(col("ec") * log2(col("p"))) / sum(col("ec")), 4).as("xent"))
      .orderBy(col("lang"))
  }

  val textKnLmSql: String =
    """WITH t AS (
      |  SELECT lang, string_split_regex(trim(text), '\s+') AS w
      |  FROM documents WHERE text IS NOT NULL),
      |pairs AS (
      |  SELECT lang, b.w1 AS w1, b.w2 AS w2
      |  FROM (SELECT lang, unnest(list_transform(generate_series(1, len(w) - 1),
      |          i -> {'w1': w[i], 'w2': w[i+1]})) AS b
      |        FROM t WHERE len(w) >= 2)),
      |c12 AS (SELECT w1, w2, count(*) AS c FROM pairs GROUP BY 1, 2),
      |ctx AS (SELECT w1, sum(c) AS c1, count(*) AS n1f FROM c12 GROUP BY 1),
      |cont AS (SELECT w2, count(*) AS n1b FROM c12 GROUP BY 1),
      |tot AS (SELECT count(*) AS bb FROM c12),
      |p AS (
      |  SELECT c12.w1, c12.w2,
      |    greatest(c12.c - 0.75, 0.0) / ctx.c1 + 0.75 * ctx.n1f / ctx.c1 * cont.n1b / tot.bb AS p
      |  FROM c12 JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tot),
      |el AS (SELECT lang, w1, w2, count(*) AS ec FROM pairs GROUP BY 1, 2, 3)
      |SELECT lang, CAST(sum(ec) AS BIGINT) AS n_bigrams,
      |       round(-sum(ec * log2(p)) / sum(ec), 4) AS xent
      |FROM el JOIN p USING (w1, w2) GROUP BY 1 ORDER BY 1""".stripMargin

  /**
   * `text_kn_top`: the 10 most probable continuations of the corpus's most frequent
   * context token — the "predict the next token" serving query over the same model.
   * TakeOrdered top-k; ties break on the continuation text.
   */
  def textKnTop(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val pairs = bigrams(spark, dir)
    val model = knModel(pairs)
    val ctx0 = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      .orderBy(col("c1").desc, col("w1")).limit(1).select(col("w1"))
    model.join(broadcast(ctx0), "w1")
      .orderBy(col("p").desc, col("w2")).limit(k)
      .select(col("w1"), col("w2"), round(col("p"), 6).as("p6"))
  }

  val textKnTopSql: String =
    """WITH t AS (
      |  SELECT lang, string_split_regex(trim(text), '\s+') AS w
      |  FROM documents WHERE text IS NOT NULL),
      |pairs AS (
      |  SELECT b.w1 AS w1, b.w2 AS w2
      |  FROM (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
      |          i -> {'w1': w[i], 'w2': w[i+1]})) AS b
      |        FROM t WHERE len(w) >= 2)),
      |c12 AS (SELECT w1, w2, count(*) AS c FROM pairs GROUP BY 1, 2),
      |ctx AS (SELECT w1, sum(c) AS c1, count(*) AS n1f FROM c12 GROUP BY 1),
      |cont AS (SELECT w2, count(*) AS n1b FROM c12 GROUP BY 1),
      |tot AS (SELECT count(*) AS bb FROM c12),
      |p AS (
      |  SELECT c12.w1, c12.w2,
      |    greatest(c12.c - 0.75, 0.0) / ctx.c1 + 0.75 * ctx.n1f / ctx.c1 * cont.n1b / tot.bb AS p
      |  FROM c12 JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tot),
      |ctx0 AS (SELECT w1 FROM (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1)
      |         ORDER BY c1 DESC, w1 LIMIT 1)
      |SELECT p.w1, p.w2, round(p.p, 6) AS p6
      |FROM p JOIN ctx0 USING (w1)
      |ORDER BY p.p DESC, p.w2 LIMIT 10""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_kn_lm" -> (textKnLm(_, _)),
    "text_kn_top" -> (textKnTop(_, _, 10)))

  val oracles: Map[String, String] = Map(
    "text_kn_lm" -> textKnLmSql,
    "text_kn_top" -> textKnTopSql)
}
