package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Text-analysis operators for training-data curation: language ID, quality scoring,
 * token counting, document fingerprinting. All pure column expressions (whole-stage
 * codegen; no UDFs), so they pipeline with the parquet scan at any scale.
 *
 * Ratios and scores are emitted as raw doubles: both engines evaluate the identical
 * int/int -> double expression, so the bits match without rounding games.
 */
object TextAnalysis {

  private val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Token counts: whitespace tokens and a BPE-ish regex segmentation. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(BpeishPattern), lit(0))).as("n_bpe_tokens"),
      length(col("text")).as("n_chars_calc"))

  def textTokens(spark: SparkSession, dir: String): DataFrame =
    tokenCounts(TableIO.documents(spark, dir))

  val textTokensSql: String =
    s"""SELECT doc_id,
       |  len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
       |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens,
       |  length(text) AS n_chars_calc
       |FROM documents""".stripMargin

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  private val StopwordSet = Stopwords.toSet

  /**
   * Quality features + a composite score (identical formula on both sides). Computed in a
   * typed JIT kernel — tokenization + per-char scans per doc are CPU-bound and interpreted
   * HOF lambdas (`filter(toks, isin)`) measured several times slower. Edge semantics match
   * the declarative form: SQL `trim` strips SPACES only (not Java String.trim's control
   * chars), and ratios over an empty text are null, not NaN.
   */
  def qualityFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val stops = StopwordSet
    TableIO.fanOut(docs)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, raw) =>
        val text = if (raw == null) "" else raw // null-safe like the SQL expression ops
        var b = 0; var e = text.length
        while (b < e && text.charAt(b) == ' ') b += 1
        while (e > b && text.charAt(e - 1) == ' ') e -= 1
        // limit -1 keeps trailing empty strings: Java's default split drops them while
        // DuckDB's string_split_regex keeps them — text ending in "\n" must tokenize
        // identically on both engines
        val toks = text.substring(b, e).split("\\s+", -1)
        val n = toks.length
        var stop = 0
        var i = 0
        while (i < n) { if (stops.contains(toks(i))) stop += 1; i += 1 }
        var alpha = 0
        var j = 0
        while (j < text.length) { val c = text.charAt(j); if (c >= 'a' && c <= 'z') alpha += 1; j += 1 }
        val stopR = stop * 1.0 / n
        val alphaR = if (text.isEmpty) None else Some(alpha * 1.0 / text.length)
        val score = alphaR.map(ar => stopR * 0.4 + ar * 0.4 + (if (n >= 20) 0.2 else 0.0))
        (id, n, stopR, alphaR, text.length * 1.0 / n, score)
      }
      .toDF("doc_id", "n_tokens", "stopword_ratio", "alpha_ratio", "chars_per_token",
        "quality_score")
  }

  def textQuality(spark: SparkSession, dir: String): DataFrame =
    qualityFeatures(TableIO.documents(spark, dir))

  val textQualitySql: String =
    s"""SELECT doc_id, n_tokens, stopword_ratio, alpha_ratio, chars_per_token,
       |  stopword_ratio * 0.4 + alpha_ratio * 0.4
       |    + CASE WHEN n_tokens >= 20 THEN 0.2 ELSE 0.0 END AS quality_score
       |FROM (
       |  SELECT doc_id,
       |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |    len(list_filter(string_split_regex(trim(text), '\\s+'),
       |        x -> x IN ('the','a','of','and','to','in','is'))) * 1.0
       |      / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio,
       |    length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text) AS alpha_ratio,
       |    length(text) * 1.0 / len(string_split_regex(trim(text), '\\s+')) AS chars_per_token
       |  FROM documents)""".stripMargin

  /**
   * Gopher-style repetition signals: the fraction of tokens taken by the single most
   * frequent unigram and by the most frequent bigram — the classic filters for
   * boilerplate/spam in LLM corpora (high top-n-gram mass = repetitive junk). Per-row
   * mode-counting needs a hash map per doc, so this is a typed JIT kernel (map-only after
   * fanOut, zero shuffle at any corpus size); fractions are exact int/int divisions so
   * both engines produce identical doubles.
   */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    TableIO.fanOut(docs)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, raw) =>
        val text = if (raw == null) "" else raw // null-safe like the SQL expression ops
        var b = 0; var e = text.length
        while (b < e && text.charAt(b) == ' ') b += 1
        while (e > b && text.charAt(e - 1) == ' ') e -= 1
        // limit -1 keeps trailing empty strings: Java's default split drops them while
        // DuckDB's string_split_regex keeps them — text ending in "\n" must tokenize
        // identically on both engines
        val toks = text.substring(b, e).split("\\s+", -1)
        val n = toks.length
        val uni = new java.util.HashMap[String, Int](n * 2)
        var i = 0
        var maxUni = 0
        while (i < n) {
          val c = uni.merge(toks(i), 1, (a, x) => a + x)
          if (c > maxUni) maxUni = c
          i += 1
        }
        val big = new java.util.HashMap[String, Int](n * 2)
        var maxBig = 0
        i = 0
        while (i + 1 < n) {
          val c = big.merge(toks(i) + " " + toks(i + 1), 1, (a, x) => a + x)
          if (c > maxBig) maxBig = c
          i += 1
        }
        val topTok = maxUni * 1.0 / n
        val topBigram = if (n > 1) maxBig * 1.0 / (n - 1) else 0.0
        (id, n, topTok, topBigram)
      }
      .toDF("doc_id", "n_tokens", "top_tok_frac", "top_bigram_frac")
  }

  def textRepetition(spark: SparkSession, dir: String): DataFrame =
    repetitionSignals(TableIO.documents(spark, dir))

  val textRepetitionSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
      |uni AS (
      |  SELECT doc_id, max(c) AS max_uni, CAST(sum(c) AS BIGINT) AS n FROM (
      |    SELECT doc_id, tok, count(*) AS c
      |    FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
      |    GROUP BY 1, 2) GROUP BY 1),
      |big AS (
      |  SELECT doc_id, max(c) AS max_big FROM (
      |    SELECT doc_id, bg, count(*) AS c FROM (
      |      SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg
      |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
      |            FROM t WHERE len(toks) > 1))
      |    GROUP BY 1, 2) GROUP BY 1)
      |SELECT uni.doc_id, CAST(n AS INT) AS n_tokens,
      |  max_uni * 1.0 / n AS top_tok_frac,
      |  coalesce(max_big * 1.0 / (n - 1), 0.0) AS top_bigram_frac
      |FROM uni LEFT JOIN big ON uni.doc_id = big.doc_id
      |ORDER BY uni.doc_id""".stripMargin

  /**
   * The user-facing quality GATE: keep documents above a composite-score threshold with
   * sane length bounds — the filter a curation pipeline applies before tokenization.
   * Summarized per lang so the driver check is stable.
   */
  def textQualityFilter(spark: SparkSession, dir: String, minScore: Double = 0.5): DataFrame = {
    val q = textQuality(spark, dir)
    val docs = TableIO.documents(spark, dir).select(col("doc_id"), col("lang"))
    q.filter(col("quality_score") >= minScore &&
        col("n_tokens") >= 5 && col("n_tokens") <= 5000)
      .join(docs, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), round(avg(col("quality_score")), 6).as("avg_score"))
      .orderBy(col("lang"))
  }

  def textQualityFilterSql(minScore: Double): String =
    s"""WITH q AS ($textQualitySql)
       |SELECT d.lang AS lang, count(*) AS n_kept, round(avg(q.quality_score), 6) AS avg_score
       |FROM q JOIN documents d ON q.doc_id = d.doc_id
       |WHERE q.quality_score >= $minScore AND q.n_tokens BETWEEN 5 AND 5000
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-language marker lists (disjoint so the argmax is unambiguous). */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and"),
    "de" -> Seq("der", "und", "ist"),
    "fr" -> Seq("le", "et", "les"),
    "es" -> Seq("el", "y", "los"),
    "zh" -> Seq("的", "是", "了"))

  /**
   * N-gram/stopword language-ID heuristic: score = marker-token hits per language,
   * prediction = first language (fixed order) with the maximal score. Deterministic and
   * SQL-expressible, so it is oracle-checked end to end.
   */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val scored = docs.select(
      (col("doc_id") +: LangMarkers.map { case (lang, ms) =>
        size(filter(toks, t => t.isin(ms: _*))).as(s"s_$lang")
      }): _*)
    val langs = LangMarkers.map(_._1)
    val maxScore = greatest(langs.map(l => col(s"s_$l")): _*)
    val predicted = langs.foldRight(lit("unknown"): Column) { (l, rest) =>
      when(col(s"s_$l") === maxScore, lit(l)).otherwise(rest)
    }
    // foldRight gives en > de > fr > es > zh precedence on ties (first when wins)
    scored.withColumn("predicted", predicted)
  }

  def textLangid(spark: SparkSession, dir: String): DataFrame =
    languageId(TableIO.documents(spark, dir))

  val textLangidSql: String = {
    val scoreExprs = LangMarkers.map { case (lang, ms) =>
      val list = ms.map(m => s"'$m'").mkString(",")
      s"len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x IN ($list))) AS s_$lang"
    }.mkString(",\n    ")
    val langs = LangMarkers.map(_._1)
    val greatestExpr = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val caseChain = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString("CASE ", " ", " ELSE 'unknown' END")
    s"""SELECT doc_id, s_en, s_de, s_fr, s_es, s_zh, $caseChain AS predicted
       |FROM (
       |  SELECT *, $greatestExpr AS m FROM (
       |    SELECT doc_id,
       |    $scoreExprs
       |    FROM documents))""".stripMargin
  }

  /** Document fingerprint: md5 over whitespace-normalized text (stable content identity). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(regexp_replace(trim(col("text")), "\\s+", " ")).as("fingerprint"))

  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    fingerprints(TableIO.documents(spark, dir))

  val textFingerprintSql: String =
    """SELECT doc_id, md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fingerprint
      |FROM documents""".stripMargin

  // ---- PII scrubbing -------------------------------------------------------------------

  // Patterns restricted to syntax with identical semantics in Java regex (Spark) and
  // RE2 (DuckDB): char classes, bounded repetition, \b word boundaries. No lookaround.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  private val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /**
   * PII scrub: redact emails/phone-numbers/IPv4s and count what was removed. A curation
   * pipeline runs this as a map-only pass fused into the scan (pure codegen expressions,
   * no UDF, no shuffle) — the counts make redaction auditable per document. Redaction is
   * sequential (email → phone → IP), so each count is taken on the text AS THAT STAGE
   * SEES IT: n_phones/n_ips equal the number of [PHONE]/[IP] tokens actually inserted
   * (an IP inside an already-redacted email is not phantom-counted).
   */
  def piiScrub(docs: DataFrame): DataFrame = {
    val afterEmail = regexp_replace(col("text"), EmailRe, "[EMAIL]")
    val afterPhone = regexp_replace(afterEmail, PhoneRe, "[PHONE]")
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(PhoneRe), lit(0))).as("n_phones"),
      size(regexp_extract_all(afterPhone, lit(Ipv4Re), lit(0))).as("n_ips"),
      regexp_replace(afterPhone, Ipv4Re, "[IP]").as("clean_text"))
  }

  def textPii(spark: SparkSession, dir: String): DataFrame =
    piiScrub(TableIO.documents(spark, dir))

  val textPiiSql: String =
    s"""WITH staged AS (
       |  SELECT doc_id, text,
       |    regexp_replace(text, '$EmailRe', '[EMAIL]', 'g') AS after_email
       |  FROM documents
       |), staged2 AS (
       |  SELECT doc_id, text, after_email,
       |    regexp_replace(after_email, '$PhoneRe', '[PHONE]', 'g') AS after_phone
       |  FROM staged
       |)
       |SELECT doc_id,
       |  len(regexp_extract_all(text, '$EmailRe')) AS n_emails,
       |  len(regexp_extract_all(after_email, '$PhoneRe')) AS n_phones,
       |  len(regexp_extract_all(after_phone, '$Ipv4Re')) AS n_ips,
       |  regexp_replace(after_phone, '$Ipv4Re', '[IP]', 'g') AS clean_text
       |FROM staged2""".stripMargin

  // ---- normalization -------------------------------------------------------------------

  /** Canonical text normalization (lowercase, strip punctuation to spaces, collapse
    * whitespace) — the standard pre-tokenization pass; map-only codegen expressions. */
  def normalize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9\\s]", " "),
        "\\s+", " ")).as("norm_text"))

  def textNormalize(spark: SparkSession, dir: String): DataFrame =
    normalize(TableIO.documents(spark, dir))

  val textNormalizeSql: String =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
      |                      '\s+', ' ', 'g')) AS norm_text
      |FROM documents""".stripMargin

  // ---- corpus n-gram statistics --------------------------------------------------------

  /**
   * Corpus-wide top-K bigrams: per-doc bigram construction is a map-only array transform
   * fused with the scan; the count is a map-side-combinable groupBy (shuffle rows =
   * distinct bigrams, not corpus tokens); final top-K is a TakeOrdered, never a global
   * sort. Ties broken by bigram text so the result is deterministic on both engines.
   */
  def topBigrams(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= 2) // sequence(0, -1) would DESCEND for 1-token docs
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))")).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(k)

  def textTopgrams(spark: SparkSession, dir: String): DataFrame =
    topBigrams(TableIO.documents(spark, dir), 20)

  val textTopgramsSql: String =
    """SELECT bigram, count(*) AS cnt
      |FROM (
      |  SELECT unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS bigram
      |  FROM (SELECT string_split_regex(trim(text), '\s+') AS t FROM documents)
      |  WHERE len(t) >= 2)
      |GROUP BY bigram
      |ORDER BY cnt DESC, bigram
      |LIMIT 20""".stripMargin

  // ---- vocabulary induction ------------------------------------------------------------

  /**
   * Top-K vocabulary with cumulative corpus coverage — the report a tokenizer-vocab
   * decision runs on: tokens by frequency plus what fraction of all corpus tokens the
   * vocabulary prefix up to each rank covers (the Zipf curve a BPE/unigram trainer
   * truncates). Scale shape: ONE map-side-combined token count (vocabulary-sized
   * shuffle), top-K via TakeOrdered (never a global sort), and the cumulative window
   * runs over the K survivors only — the single-partition window touches K rows, not
   * the vocabulary.
   */
  def vocabCoverage(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs.filter(col("text").isNotNull)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).cast("double").as("n_total"))
    val top = counts.orderBy(col("cnt").desc, col("tok")).limit(k)
    // Partition the K-row windows by n_total — a constant-valued ATTRIBUTE (every row
    // carries the same total, and being non-foldable it survives the optimizer's
    // constant-partition elimination), so WindowExec sees a real partition spec instead
    // of logging its global-window "No Partition Defined" warning on every bench run
    // (which nearly crowded the driver's bounded JSON tail capture). Same plan cost:
    // the empty spec also funneled the K survivors through one partition.
    val w = Window.partitionBy(col("n_total")).orderBy(col("cnt").desc, col("tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("n_total")).orderBy(col("cnt").desc, col("tok"))))
      .withColumn("cum_cov", round(sum(col("cnt")).over(w) / col("n_total"), 6))
      .select(col("rank"), col("tok"), col("cnt"), col("cum_cov"))
      .orderBy(col("rank"))
  }

  /** `text_vocab`: top-30 corpus vocabulary with cumulative coverage. */
  def textVocab(spark: SparkSession, dir: String): DataFrame =
    vocabCoverage(TableIO.documents(spark, dir), 30)

  val textVocabSql: String =
    """WITH toks AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
      |              FROM documents WHERE text IS NOT NULL),
      |counts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
      |total AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total FROM counts),
      |top AS (SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok LIMIT 30)
      |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS INT) AS rank, tok, cnt,
      |  round(sum(cnt) OVER (ORDER BY cnt DESC, tok ROWS UNBOUNDED PRECEDING)
      |        / total.n_total, 6) AS cum_cov
      |FROM top CROSS JOIN total
      |ORDER BY rank""".stripMargin

  // ---- corpus-LM cross-entropy scoring -------------------------------------------------

  /**
   * CCNet-style language-model quality scoring with the heavy ML stripped to its
   * data-engine core: train a unigram LM on the corpus itself (token relative
   * frequencies) and score every document by its mean negative log-likelihood
   * xent = ln(N) − mean(ln c(tok)) — low = stereotypical text, high = rare-token soup;
   * CCNet buckets documents by exactly this kind of score (head/middle/tail) to gate
   * training data.
   *
   * Scale shape: the LM "training" is one map-side-combined groupBy (shuffle rows =
   * vocabulary, Heaps-law sublinear in corpus size); scoring joins tokens to the
   * vocabulary counts — a dimension-sized join Spark broadcasts when it fits, and the
   * corpus total rides a 1-row broadcast. Every doc stays in the report (left join):
   * token-less docs score null, never silently vanish.
   */
  def perplexityScores(docs: DataFrame): DataFrame = {
    val toks = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).cast("double").as("n_total"))
    val scored = toks.join(counts, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_tokens"), avg(log(col("c"))).as("mean_ln_c"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), coalesce(col("n_tokens"), lit(0)).as("n_tokens"),
        round(log(col("n_total")) - col("mean_ln_c"), 4).as("xent"))
  }

  /** `text_perplexity`: corpus-unigram-LM cross-entropy of every document. */
  def textPerplexity(spark: SparkSession, dir: String): DataFrame =
    perplexityScores(TableIO.documents(spark, dir)).orderBy(col("doc_id"))

  val textPerplexitySql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      |              FROM documents WHERE text IS NOT NULL),
      |counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
      |total AS (SELECT CAST(sum(c) AS DOUBLE) AS n_total FROM counts),
      |scored AS (SELECT t.doc_id, CAST(count(*) AS INT) AS n_tokens,
      |             avg(ln(c.c)) AS mean_ln_c
      |           FROM toks t JOIN counts c USING (tok) GROUP BY t.doc_id)
      |SELECT d.doc_id, coalesce(s.n_tokens, 0) AS n_tokens,
      |  round(ln(total.n_total) - s.mean_ln_c, 4) AS xent
      |FROM documents d
      |LEFT JOIN scored s ON d.doc_id = s.doc_id
      |CROSS JOIN total
      |ORDER BY d.doc_id""".stripMargin

  // ---- DSIR importance scoring ---------------------------------------------------------

  /**
   * DSIR-style importance scoring (Xie et al. '23, "Data Selection via Importance
   * Resampling") with the estimator reduced to its data-engine core: score every
   * document by its mean per-token log importance ratio ln(p_target/p_corpus) under two
   * add-one-smoothed unigram LMs — one trained on the rows matching `isTarget`
   * (the distribution you WANT, e.g. a trusted reference corpus), one on the whole
   * corpus. High score = looks like the target; the selection step is a rank cut the
   * caller composes (the paper's Gumbel-noise sampling is a seeded tie-break away and
   * deliberately left out so the result is exactly replayable).
   *
   * Scale shape: BOTH LMs train in ONE map-side-combined groupBy (the target count is a
   * conditional aggregate of the same pass, not a second scan); totals ride a 1-row
   * broadcast; scoring joins tokens to the vocabulary — dimension-sized, auto-broadcast.
   * Same plan skeleton as perplexityScores, so everything said there about 100 TB holds.
   */
  def dsirScores(docs: DataFrame, isTarget: Column): DataFrame = {
    val toks = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), isTarget.as("is_tgt"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(
      count(lit(1)).as("c_all"),
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("c_tgt"))
    val totals = counts.agg(
      sum(col("c_all")).cast("double").as("n_all"),
      sum(col("c_tgt")).cast("double").as("n_tgt"),
      count(lit(1)).cast("double").as("v"))
    toks.join(counts, "tok")
      .crossJoin(broadcast(totals))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        avg(log((col("c_tgt") + 1) / (col("n_tgt") + col("v")))
          - log((col("c_all") + 1) / (col("n_all") + col("v")))).as("s"))
      .select(col("doc_id"), col("n_tokens"), round(col("s"), 4).as("dsir4"))
  }

  /** `text_dsir`: top-50 documents most resembling the English slice of the corpus. */
  def textDsir(spark: SparkSession, dir: String): DataFrame =
    dsirScores(TableIO.documents(spark, dir), col("lang") === "en")
      .orderBy(col("dsir4").desc, col("doc_id"))
      .limit(50)

  val textDsirSql: String =
    """WITH toks AS (SELECT doc_id, lang = 'en' AS is_tgt,
      |                     unnest(string_split_regex(trim(text), '\s+')) AS tok
      |              FROM documents WHERE text IS NOT NULL),
      |counts AS (SELECT tok, count(*) AS c_all,
      |                  sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS c_tgt
      |           FROM toks GROUP BY tok),
      |totals AS (SELECT CAST(sum(c_all) AS DOUBLE) AS n_all,
      |                  CAST(sum(c_tgt) AS DOUBLE) AS n_tgt,
      |                  CAST(count(*) AS DOUBLE) AS v
      |           FROM counts),
      |scored AS (SELECT t.doc_id, CAST(count(*) AS INT) AS n_tokens,
      |                  avg(ln((c.c_tgt + 1) / (tt.n_tgt + tt.v))
      |                      - ln((c.c_all + 1) / (tt.n_all + tt.v))) AS s
      |           FROM toks t JOIN counts c USING (tok) CROSS JOIN totals tt
      |           GROUP BY t.doc_id)
      |SELECT doc_id, n_tokens, round(s, 4) AS dsir4
      |FROM scored
      |ORDER BY dsir4 DESC, doc_id
      |LIMIT 50""".stripMargin

  // ---- naive-Bayes text classification -------------------------------------------------

  /**
   * Multinomial naive-Bayes classifier trained and applied IN the engine — the
   * fastText-style quality/language gate of a curation pipeline reduced to its
   * data-engine core: add-one-smoothed per-class token log-likelihoods plus a
   * document-frequency prior, argmax over classes. Training labels come from `labelCol`;
   * scoring replays every document against every class and keeps the best. Scores are
   * rounded to 6 decimals BEFORE the argmax with a class-name tie-break, so the
   * prediction is a total deterministic function of the corpus in any engine — the
   * DuckDB oracle replays training AND inference and must hash-match.
   *
   * Scale shape: training is one map-side-combined groupBy (shuffle rows = classes x
   * vocabulary, Heaps-law sublinear); class totals/priors/vocab ride 1-row or
   * class-cardinality broadcasts; inference joins doc term frequencies to the
   * vocabulary — the same dimension-sized join as perplexityScores — and the argmax is
   * a per-doc window (partitioned, never global). Nothing driver-side, no iteration.
   */
  def nbScores(docs: DataFrame, labelCol: String): DataFrame = {
    val base = docs.filter(col("text").isNotNull && col(labelCol).isNotNull)
    val toks = base.select(col("doc_id"), col(labelCol).as("cls"),
      explode(split(trim(col("text")), "\\s+")).as("tok"))
    val counts = toks.groupBy(col("cls"), col("tok")).agg(count(lit(1)).as("c"))
    val clsTot = counts.groupBy(col("cls")).agg(sum(col("c")).cast("double").as("n_cls"))
    val vocab = counts.agg(countDistinct(col("tok")).cast("double").as("v"))
    val priors = base.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val nDocs = base.agg(count(lit(1)).cast("double").as("n"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val ll = tf.crossJoin(broadcast(clsTot)).crossJoin(broadcast(vocab))
      .join(counts, Seq("cls", "tok"), "left")
      .groupBy(col("doc_id"), col("cls"))
      .agg(sum(col("tf") *
        log((coalesce(col("c"), lit(0L)) + 1) / (col("n_cls") + col("v")))).as("ll"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score6").desc, col("cls"))
    ll.join(broadcast(priors), Seq("cls"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score6", round(col("ll") + log(col("n_docs") / col("n")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cls").as("pred"), col("score6"))
  }

  /** `text_nb_lang`: language prediction for every document from the self-trained NB model. */
  def textNbLang(spark: SparkSession, dir: String): DataFrame =
    nbScores(TableIO.documents(spark, dir), "lang").orderBy(col("doc_id"))

  val textNbLangSql: String =
    """WITH toks AS (SELECT doc_id, lang AS cls,
      |                     unnest(string_split_regex(trim(text), '\s+')) AS tok
      |              FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
      |counts AS (SELECT cls, tok, count(*) AS c FROM toks GROUP BY 1, 2),
      |cls_tot AS (SELECT cls, CAST(sum(c) AS DOUBLE) AS n_cls FROM counts GROUP BY cls),
      |vocab AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM counts),
      |priors AS (SELECT lang AS cls, CAST(count(*) AS DOUBLE) AS n_docs
      |           FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL GROUP BY 1),
      |ndocs AS (SELECT CAST(count(*) AS DOUBLE) AS n
      |          FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      |ll AS (
      |  SELECT f.doc_id, ct.cls,
      |    sum(f.tf * ln((coalesce(c.c, 0) + 1) / (ct.n_cls + vocab.v))) AS ll
      |  FROM tf f
      |  CROSS JOIN cls_tot ct
      |  CROSS JOIN vocab
      |  LEFT JOIN counts c ON c.cls = ct.cls AND c.tok = f.tok
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT s.doc_id, s.cls,
      |    round(s.ll + ln(p.n_docs / nd.n), 6) AS score6,
      |    row_number() OVER (PARTITION BY s.doc_id
      |                       ORDER BY round(s.ll + ln(p.n_docs / nd.n), 6) DESC, s.cls) AS rn
      |  FROM ll s JOIN priors p USING (cls) CROSS JOIN ndocs nd)
      |SELECT doc_id, cls AS pred, score6 FROM ranked WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  // ---- context-window chunking ---------------------------------------------------------

  /**
   * Overlapping token-window chunking — the context-window prep step between cleaning and
   * tokenizer packing in a training pipeline: each document becomes one chunk per `stride`
   * tokens, each chunk up to `chunkSize` tokens, consecutive chunks overlapping by
   * `chunkSize - stride`. Map-only (sequence + posexplode + slice fused with the scan): a
   * document's chunks never leave its partition, so this is embarrassingly parallel at
   * any corpus size and adds zero shuffle.
   */
  def chunk(docs: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"),
        posexplode(sequence(lit(0), size(col("t")) - 1, lit(stride))))
      .select(col("doc_id"),
        col("pos").as("chunk_id"),
        least(lit(chunkSize), size(col("t")) - col("col")).as("n_chunk_tokens"),
        array_join(slice(col("t"), col("col") + 1, lit(chunkSize)), " ").as("chunk_text"))
  }

  /** `text_chunk`: 64-token windows every 48 tokens (25% overlap) over the corpus. */
  def textChunk(spark: SparkSession, dir: String): DataFrame =
    chunk(TableIO.documents(spark, dir), chunkSize = 64, stride = 48)
      .orderBy(col("doc_id"), col("chunk_id"))

  val textChunkSql: String =
    """SELECT doc_id, CAST(start // 48 AS INT) AS chunk_id,
      |  CAST(least(64, len(t) - start) AS INT) AS n_chunk_tokens,
      |  array_to_string(t[start + 1 : start + 64], ' ') AS chunk_text
      |FROM (SELECT doc_id, t, unnest(range(0, len(t), 48)) AS start
      |      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
      |ORDER BY doc_id, chunk_id""".stripMargin

  // ---- distributional diagnostics ------------------------------------------------------

  /**
   * Per-source token-distribution diagnostics: Shannon entropy (nats) of the source's
   * unigram distribution, type count and type-token ratio — the corpus-health report
   * that flags template/spam sources (low entropy at high volume) before they dominate
   * a training mix. Complements `text_repetition` (per-document) at the source grain.
   *
   * Plan: ONE map-side-combined (source, token) count, then ONE (source) aggregation
   * using the Σ c·ln c identity — H = ln N − (Σ c ln c)/N — so the per-token pass needs
   * no join back to the source totals. Entropy rounded to 6 (cross-engine double-sum
   * noise ~1e-12 on vocabulary-sized sums, far below the grain).
   */
  def sourceEntropy(docs: DataFrame): DataFrame = {
    val toks = docs.filter(col("text").isNotNull)
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("tok"))
    toks.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("c") * log(col("c"))).as("clogc"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(log(col("n_tokens")) - col("clogc") / col("n_tokens"), 6).as("entropy6"),
        round(col("n_types") / col("n_tokens").cast("double"), 6).as("ttr6"))
  }

  /** `text_entropy`: per-source unigram entropy/type-token report over `documents`. */
  def textEntropy(spark: SparkSession, dir: String): DataFrame =
    sourceEntropy(TableIO.documents(spark, dir)).orderBy(col("source"))

  val textEntropySql: String =
    """WITH toks AS (
      |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents WHERE text IS NOT NULL
      |), tc AS (
      |  SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2
      |)
      |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
      |       CAST(count(*) AS BIGINT) AS n_types,
      |       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy6,
      |       round(count(*) / CAST(sum(c) AS DOUBLE), 6) AS ttr6
      |FROM tc
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /**
   * PMI collocation mining: the corpus's most-associated adjacent word pairs
   * (pointwise mutual information, the classic collocation statistic) — surfaces the
   * multi-word expressions ("new york", "machine learning") a tokenizer/vocab decision
   * or a phrase-aware dedup wants to know about. A raw-frequency top list (72f
   * `text_topgrams`) ranks "of the" first; PMI normalizes away unigram popularity.
   *
   * PMI = ln( (c_xy/M) / ((c_x/N)·(c_y/N)) ), with M = total bigrams, N = total
   * unigrams; a min-support floor (c_xy >= minCount) drops the unstable singleton tail
   * (PMI's known pathology). Plan: ONE unigram count + ONE bigram count (both map-side
   * combined), two vocabulary-sized joins to attach c_x/c_y (shuffle joins — the vocab
   * is not assumed broadcastable), broadcast totals, TakeOrdered top-k — never a global
   * sort.
   */
  def pmiCollocations(docs: DataFrame, k: Int, minCount: Long): DataFrame = {
    val toks = docs.filter(col("text").isNotNull)
      .select(split(trim(col("text")), "\\s+").as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val biAll = toks.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS x, t[i + 1] AS y))")).as("b"))
      .select(col("b.x"), col("b.y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
    val bi = biAll.filter(col("cxy") >= minCount)
    // totals over the UNFILTERED mass: p(x,y) must be a probability over all bigrams,
    // not over the supported subset (which would inflate every PMI by the same ln factor)
    val totals = uni.agg(sum(col("c")).cast("double").as("n_uni"))
      .crossJoin(biAll.agg(sum(col("cxy")).cast("double").as("n_bi")))
    bi.join(uni.select(col("w").as("x"), col("c").as("cx")), "x")
      .join(uni.select(col("w").as("y"), col("c").as("cy")), "y")
      .crossJoin(broadcast(totals))
      .withColumn("pmi6", round(
        log((col("cxy") / col("n_bi")) /
          ((col("cx") / col("n_uni")) * (col("cy") / col("n_uni")))), 6))
      .select(col("x"), col("y"), col("cxy"), col("pmi6"))
      .orderBy(col("pmi6").desc, col("x"), col("y"))
      .limit(k)
  }

  /** `text_pmi`: top-20 PMI collocations with support >= 5 over `documents`. */
  def textPmi(spark: SparkSession, dir: String): DataFrame =
    pmiCollocations(TableIO.documents(spark, dir), 20, 5)

  val textPmiSql: String =
    """WITH toks AS (
      |  SELECT string_split_regex(trim(text), '\s+') AS t
      |  FROM documents WHERE text IS NOT NULL
      |), uni AS (
      |  SELECT w, count(*) AS c FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1
      |), bi_all AS (
      |  SELECT split_part(bg, ' ', 1) AS x, split_part(bg, ' ', 2) AS y,
      |         count(*) AS cxy
      |  FROM (SELECT unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS bg
      |        FROM toks WHERE len(t) >= 2)
      |  GROUP BY 1, 2
      |), bi AS (
      |  SELECT * FROM bi_all WHERE cxy >= 5
      |), totals AS (
      |  SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM uni) AS n_uni,
      |         (SELECT CAST(sum(cxy) AS DOUBLE) FROM bi_all) AS n_bi
      |)
      |SELECT b.x, b.y, CAST(b.cxy AS BIGINT) AS cxy,
      |       round(ln((b.cxy / t.n_bi) / ((ux.c / t.n_uni) * (uy.c / t.n_uni))), 6) AS pmi6
      |FROM bi b
      |JOIN uni ux ON ux.w = b.x
      |JOIN uni uy ON uy.w = b.y
      |CROSS JOIN totals t
      |ORDER BY pmi6 DESC, b.x, b.y
      |LIMIT 20""".stripMargin

  // ------------------------------------------------------------- text_audit

  /**
   * Per-source corpus audit report — the one-stop admission screen a mix designer
   * reads before weighting sources: for every source, the fraction of documents
   * passing each curation gate (length >= 20 tokens; top-token repetition mass
   * <= 0.25, the Gopher screen; chars-per-token in the 3..12 natural-language band)
   * and the fraction passing ALL of them.
   *
   * Corpus-proportional work is ONE map-side-combined (doc, token) count; gate
   * evaluation is a per-doc join on doc_id; the report is a |sources|-row aggregate.
   * All gate boundaries are exact-integer divisions, so pass/fail is
   * engine-deterministic and the report hash-matches DuckDB.
   */
  def curationReport(docs: DataFrame): DataFrame = {
    val toks = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), length(trim(col("text"))).as("tl"),
        split(trim(col("text")), "\\s+", -1).as("t"))
    val topmass = toks.select(col("doc_id"), explode(col("t")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).cast("double").as("topc"))
    val perDoc = toks.join(topmass, Seq("doc_id"))
      .withColumn("n_tokens", size(col("t")))
      .select(col("source"),
        when(col("n_tokens") >= 20, 1).otherwise(0).as("len_ok"),
        when(col("topc") / col("n_tokens") <= 0.25, 1).otherwise(0).as("rep_ok"),
        when((col("tl") * lit(1.0) / col("n_tokens")).between(3, 12), 1)
          .otherwise(0).as("shape_ok"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("len_ok")), 4).as("pct_len"),
        round(avg(col("rep_ok")), 4).as("pct_rep"),
        round(avg(col("shape_ok")), 4).as("pct_shape"),
        round(avg(col("len_ok") * col("rep_ok") * col("shape_ok")), 4).as("pct_all"))
      .orderBy(col("source"))
  }

  def textAudit(spark: SparkSession, dir: String): DataFrame =
    curationReport(TableIO.documents(spark, dir))

  val textAuditSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, length(trim(text)) AS tl,
      |         string_split_regex(trim(text), '\s+') AS t
      |  FROM documents WHERE text IS NOT NULL),
      |topmass AS (
      |  SELECT doc_id, max(c) * 1.0 AS topc FROM (
      |    SELECT doc_id, w, count(*) AS c
      |    FROM (SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY 1, 2)
      |  GROUP BY 1),
      |per_doc AS (
      |  SELECT k.source,
      |    CASE WHEN len(k.t) >= 20 THEN 1 ELSE 0 END AS len_ok,
      |    CASE WHEN m.topc / len(k.t) <= 0.25 THEN 1 ELSE 0 END AS rep_ok,
      |    CASE WHEN k.tl * 1.0 / len(k.t) BETWEEN 3 AND 12 THEN 1 ELSE 0 END AS shape_ok
      |  FROM toks k JOIN topmass m USING (doc_id))
      |SELECT source, count(*) AS n_docs,
      |  round(avg(len_ok), 4) AS pct_len, round(avg(rep_ok), 4) AS pct_rep,
      |  round(avg(shape_ok), 4) AS pct_shape,
      |  round(avg(len_ok * rep_ok * shape_ok), 4) AS pct_all
      |FROM per_doc GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------- text_compress_ratio

  /**
   * Deflate compression ratio per document — the information-density quality signal
   * used by CCNet/Gopher-style curation: near-random text compresses poorly (ratio
   * ~1), boilerplate and repeated spans compress extremely well (ratio << 1), and
   * both tails are candidates for removal.
   *
   * One typed mapPartitions kernel with a REUSED per-partition Deflater (allocation-
   * free steady state) — map-only, no shuffle, embarrassingly parallel at 100 TB.
   * Declared rows-only for the driver gate (DuckDB has no zlib surface);
   * CurationSignalsSpec pins the signal's ordering properties and determinism.
   */
  def compressionSignal(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    TableIO.fanOut(docs)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](8192)
        it.map { case (id, raw) =>
          val bytes = (if (raw == null) "" else raw).getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var out = 0
          while (!deflater.finished()) out += deflater.deflate(buf)
          val ratio = if (bytes.isEmpty) 1.0 else out.toDouble / bytes.length
          (id, bytes.length.toLong, math.rint(ratio * 10000) / 10000)
        }
      }
      .toDF("doc_id", "n_bytes", "deflate_ratio")
      .orderBy(col("doc_id"))
  }

  def textCompressRatio(spark: SparkSession, dir: String): DataFrame =
    compressionSignal(TableIO.documents(spark, dir))

  // ------------------------------------------------------------ text_readability

  /**
   * Flesch reading-ease per document — the classic readability heuristic
   * (206.835 - 1.015*words/sentences - 84.6*syllables/words), with syllables
   * approximated by vowel-group count (the standard proxy when no dictionary is
   * available) and sentences by terminal-punctuation runs, floored at 1 so
   * punctuation-free corpora (like this driver's synthetic docs) degrade to a
   * whole-doc "sentence" instead of dividing by zero.
   *
   * Entirely codegen'd builtin expressions (split/regexp_count) — map-only, no
   * shuffle, scan-width = (doc_id, text). A 100 TB corpus scores in one pass.
   */
  def readability(docs: DataFrame): DataFrame = {
    val words = size(split(trim(col("text")), "\\s+", -1))
    val syll = regexp_count(lower(col("text")), lit("[aeiouy]+"))
    val sent = greatest(lit(1), regexp_count(col("text"), lit("[.!?]+")))
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), words.as("n_words"), syll.as("n_syll"), sent.as("n_sent"),
        round(lit(206.835)
          - lit(1.015) * (words * lit(1.0) / sent)
          - lit(84.6) * (syll * lit(1.0) / words), 4).as("flesch"))
      .orderBy(col("doc_id"))
  }

  def textReadability(spark: SparkSession, dir: String): DataFrame =
    readability(TableIO.documents(spark, dir))

  val textReadabilitySql: String =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_words,
      |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS INT) AS n_syll,
      |  CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS INT) AS n_sent,
      |  round(206.835
      |    - 1.015 * (len(string_split_regex(trim(text), '\s+')) * 1.0
      |               / greatest(1, len(regexp_extract_all(text, '[.!?]+'))))
      |    - 84.6 * (len(regexp_extract_all(lower(text), '[aeiouy]+')) * 1.0
      |              / len(string_split_regex(trim(text), '\s+'))), 4) AS flesch
      |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- text_llr

  /**
   * Dunning log-likelihood-ratio collocations — the robust-at-low-counts complement
   * to [[pmiCollocations]] (PMI's known pathology is over-ranking rare pairs; LLR's
   * G² statistic is the field's standard fix, Dunning 1993). Contingency table per
   * adjacent pair over BIGRAM POSITIONS: k11 = c(x,y), row marginal = bigrams whose
   * first token is x, column marginal = bigrams whose second token is y, N = total
   * bigrams — all derived from the ONE bigram count (two bounded re-aggregations),
   * so the corpus is scanned once. G² = 2·Σ k·ln(N·k/(row·col)) over non-empty
   * cells; every count is an exact integer and the per-pair double formula is a
   * single identical expression tree on both engines.
   */
  def llrCollocations(docs: DataFrame, k: Int, minCount: Long): DataFrame = {
    val toks = docs.filter(col("text").isNotNull)
      .select(split(trim(col("text")), "\\s+").as("t"))
    val biAll = toks.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS x, t[i + 1] AS y))")).as("b"))
      .select(col("b.x"), col("b.y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
    val rowM = biAll.groupBy(col("x")).agg(sum(col("cxy")).as("cx1"))
    val colM = biAll.groupBy(col("y")).agg(sum(col("cxy")).as("cy2"))
    val tot = biAll.agg(sum(col("cxy")).as("nbi"))
    val dn = col("nbi").cast("double")
    def cell(kc: Column, r: Column, c: Column): Column =
      when(kc > 0, kc * log(dn * kc / (r.cast("double") * c))).otherwise(lit(0.0))
    biAll.filter(col("cxy") >= minCount)
      .join(rowM, "x").join(colM, "y").crossJoin(broadcast(tot))
      .withColumn("llr6", round(lit(2.0) * (
        cell(col("cxy"), col("cx1"), col("cy2")) +
          cell(col("cx1") - col("cxy"), col("cx1"), col("nbi") - col("cy2")) +
          cell(col("cy2") - col("cxy"), col("nbi") - col("cx1"), col("cy2")) +
          cell(col("nbi") - col("cx1") - col("cy2") + col("cxy"),
            col("nbi") - col("cx1"), col("nbi") - col("cy2"))), 6))
      .select(col("x"), col("y"), col("cxy"), col("llr6"))
      .orderBy(col("llr6").desc, col("x"), col("y"))
      .limit(k)
  }

  /** `text_llr`: top-20 G² collocations with support >= 5 over `documents`. */
  def textLlr(spark: SparkSession, dir: String): DataFrame =
    llrCollocations(TableIO.documents(spark, dir), 20, 5)

  val textLlrSql: String =
    """WITH toks AS (
      |  SELECT string_split_regex(trim(text), '\s+') AS t
      |  FROM documents WHERE text IS NOT NULL
      |), bi_all AS (
      |  SELECT split_part(bg, ' ', 1) AS x, split_part(bg, ' ', 2) AS y,
      |         count(*) AS cxy
      |  FROM (SELECT unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS bg
      |        FROM toks WHERE len(t) >= 2)
      |  GROUP BY 1, 2
      |), row_m AS (
      |  SELECT x, sum(cxy) AS cx1 FROM bi_all GROUP BY 1
      |), col_m AS (
      |  SELECT y, sum(cxy) AS cy2 FROM bi_all GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(cxy) AS BIGINT) AS nbi FROM bi_all
      |)
      |SELECT b.x, b.y, CAST(b.cxy AS BIGINT) AS cxy,
      |  round(2.0 * (
      |    (CASE WHEN b.cxy > 0 THEN b.cxy * ln(CAST(t.nbi AS DOUBLE) * b.cxy
      |        / (CAST(r.cx1 AS DOUBLE) * c.cy2)) ELSE 0.0 END) +
      |    (CASE WHEN r.cx1 - b.cxy > 0 THEN (r.cx1 - b.cxy) * ln(CAST(t.nbi AS DOUBLE) * (r.cx1 - b.cxy)
      |        / (CAST(r.cx1 AS DOUBLE) * (t.nbi - c.cy2))) ELSE 0.0 END) +
      |    (CASE WHEN c.cy2 - b.cxy > 0 THEN (c.cy2 - b.cxy) * ln(CAST(t.nbi AS DOUBLE) * (c.cy2 - b.cxy)
      |        / (CAST(t.nbi - r.cx1 AS DOUBLE) * c.cy2)) ELSE 0.0 END) +
      |    (CASE WHEN t.nbi - r.cx1 - c.cy2 + b.cxy > 0
      |        THEN (t.nbi - r.cx1 - c.cy2 + b.cxy) * ln(CAST(t.nbi AS DOUBLE) * (t.nbi - r.cx1 - c.cy2 + b.cxy)
      |        / (CAST(t.nbi - r.cx1 AS DOUBLE) * (t.nbi - c.cy2))) ELSE 0.0 END)), 6) AS llr6
      |FROM bi_all b
      |JOIN row_m r ON r.x = b.x
      |JOIN col_m c ON c.y = b.y
      |CROSS JOIN tot t
      |WHERE b.cxy >= 5
      |ORDER BY llr6 DESC, b.x, b.y
      |LIMIT 20""".stripMargin

  // ---- Zipf rank-frequency fit ---------------------------------------------------------

  /**
   * Power-law (Zipf) fit of the corpus rank-frequency curve: regress ln(freq) on
   * ln(rank) over the top `k` vocabulary items (ties broken by token — deterministic)
   * and report slope / intercept / R². A healthy natural-language corpus sits near
   * slope ≈ −1; templated or boilerplate-heavy crawl shows up immediately as a flat
   * head (slope ≫ −1) or a collapsed R² — the standard one-number distribution
   * fingerprint next to `text_entropy`'s per-source view.
   *
   * Scale shape: one map-side-combined token-count aggregate, a TakeOrdered top-k
   * (never a global vocabulary sort), and a closed-form regr_* fit over k rows —
   * constant-size output regardless of corpus size, everything inside codegen.
   */
  def zipfFit(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = docs.filter(col("text").isNotNull)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(col("cnt").desc, col("tok"))))
    val lx = log(col("rank").cast("double"))
    val ly = log(col("cnt").cast("double"))
    top.agg(
      count(lit(1)).as("n_ranks"),
      round(regr_slope(ly, lx), 6).as("zipf_slope"),
      round(regr_intercept(ly, lx), 6).as("zipf_intercept"),
      round(regr_r2(ly, lx), 6).as("zipf_r2"))
  }

  /** `text_zipf`: Zipf fit over the top-500 corpus vocabulary. */
  def textZipf(spark: SparkSession, dir: String): DataFrame =
    zipfFit(TableIO.documents(spark, dir), 500)

  val textZipfSql: String =
    """WITH toks AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
      |              FROM documents WHERE text IS NOT NULL),
      |counts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
      |top AS (SELECT tok, cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rank
      |        FROM counts ORDER BY cnt DESC, tok LIMIT 500)
      |SELECT CAST(count(*) AS BIGINT) AS n_ranks,
      |  round(regr_slope(ln(CAST(cnt AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6) AS zipf_slope,
      |  round(regr_intercept(ln(CAST(cnt AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6) AS zipf_intercept,
      |  round(regr_r2(ln(CAST(cnt AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6) AS zipf_r2
      |FROM top""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_zipf" -> (textZipf(_, _)),
    "text_llr" -> (textLlr(_, _)),
    "text_readability" -> (textReadability(_, _)),
    "text_audit" -> (textAudit(_, _)),
    "text_compress_ratio" -> (textCompressRatio(_, _)),
    "text_entropy" -> (textEntropy(_, _)),
    "text_pmi" -> (textPmi(_, _)),
    "text_chunk" -> (textChunk(_, _)),
    "text_tokens" -> (textTokens(_, _)),
    "text_quality" -> (textQuality(_, _)),
    "text_repetition" -> (textRepetition(_, _)),
    "text_langid" -> (textLangid(_, _)),
    "text_fingerprint" -> (textFingerprint(_, _)),
    "text_quality_filter" -> (textQualityFilter(_, _)),
    "text_pii" -> (textPii(_, _)),
    "text_normalize" -> (textNormalize(_, _)),
    "text_topgrams" -> (textTopgrams(_, _)),
    "text_perplexity" -> (textPerplexity(_, _)),
    "text_vocab" -> (textVocab(_, _)),
    "text_dsir" -> (textDsir(_, _)),
    "text_nb_lang" -> (textNbLang(_, _)))

  val oracles: Map[String, String] = Map(
    "text_zipf" -> textZipfSql,
    "text_llr" -> textLlrSql,
    "text_readability" -> textReadabilitySql,
    "text_audit" -> textAuditSql,
    "text_entropy" -> textEntropySql,
    "text_pmi" -> textPmiSql,
    "text_chunk" -> textChunkSql,
    "text_tokens" -> textTokensSql,
    "text_quality" -> textQualitySql,
    "text_repetition" -> textRepetitionSql,
    "text_langid" -> textLangidSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_quality_filter" -> textQualityFilterSql(0.5),
    "text_pii" -> textPiiSql,
    "text_normalize" -> textNormalizeSql,
    "text_topgrams" -> textTopgramsSql,
    "text_perplexity" -> textPerplexitySql,
    "text_vocab" -> textVocabSql,
    "text_dsir" -> textDsirSql,
    "text_nb_lang" -> textNbLangSql)
}
