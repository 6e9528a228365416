package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * BPE merge-rule training — the tokenizer-vocabulary induction step of a training-data
 * pipeline (Sennrich et al. ACL'16; what sentencepiece/HF-tokenizers train): iteratively
 * merge the most frequent adjacent symbol pair over a word-frequency table until
 * `numMerges` rules exist.
 *
 * Scale shape (the same split sentencepiece uses): the CORPUS-proportional work — one
 * tokenize + map-side-combined word count — is fully distributed; the merge loop then
 * runs over the BOUNDED top-`vocabCap` word-frequency table in a single task
 * (coalesce(1) + mapPartitions). The loop's input is bounded by the cap parameter, not
 * the corpus (50k rows x avg word length regardless of whether the corpus is 5 GB or
 * 100 TB), the same boundedness argument as the IVF trainer's 0.5 MB driver sample
 * (Similarity.scala). A distributed-iterative variant (one pair-count shuffle per merge)
 * would put 2*numMerges job barriers on a table that fits one L2 cache — strictly worse.
 *
 * Determinism: ties on pair count break lexicographically (left, then right symbol), so
 * the rule sequence is reproducible across runs and engines; the spec replays an
 * in-memory reference implementation against it.
 *
 * Driver check is rows-only (iterative argmax state is not SQL-expressible);
 * TextAnalysisSpec carries correctness: parity with the reference fold on constructed
 * corpora, dense ranks, and the textbook "er"-style merge on a planted distribution.
 */
object BpeTrainer {

  /** In-memory classic BPE over (word, count) pairs — shared by the kernel and the
    * spec's reference replay. Symbols start as single characters; each step merges the
    * (count-max, then lexicographic-min) adjacent pair everywhere it occurs.
    * Returns (rank, left, right, merged, support). */
  private[graft] def mergeLoop(words: Seq[(String, Long)], numMerges: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var seqs: Array[(Array[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val rules = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var continue = true
    while (continue && rank <= numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (s, c) =>
        var i = 0
        while (i + 1 < s.length) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), support) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        val merged = l + r
        rules += ((rank, l, r, merged, support))
        seqs = seqs.map { case (s, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { out += merged; i += 2 }
            else { out += s(i); i += 1 }
          }
          (out.toArray, c)
        }
        rank += 1
      }
    }
    rules.result()
  }

  /**
   * (rank, left, right, merged, support): the first `numMerges` BPE rules trained on
   * `docs`. `vocabCap` bounds the word table the merge loop sees (top words by
   * frequency, deterministic tie-break) — the knob that keeps the single-task loop
   * bounded at any corpus size.
   */
  def bpeTrain(docs: DataFrame, numMerges: Int, vocabCap: Int = 10000): DataFrame = {
    require(numMerges > 0 && vocabCap > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.filter(col("text").isNotNull)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(vocabCap) // TakeOrdered, not a global sort
    words.as[(String, Long)]
      .coalesce(1)
      .mapPartitions { it => mergeLoop(it.toSeq.sortBy { case (w, c) => (-c, w) }, numMerges).iterator }
      .toDF("rank", "left", "right", "merged", "support")
      .orderBy(col("rank"))
  }

  /** `text_bpe`: first 40 merge rules over the documents corpus. */
  def textBpe(spark: SparkSession, dir: String): DataFrame =
    bpeTrain(TableIO.documents(spark, dir), numMerges = 40)

  /** Classic BPE application to one word: repeatedly merge the LOWEST-rank rule present
    * (all its occurrences at once) until no rule applies — the exact inverse traversal
    * of [[mergeLoop]]'s construction order, and what HF-tokenizers/sentencepiece do at
    * encode time. Shared by the distributed kernel and the spec's reference replay. */
  private[graft] def encodeWord(w: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = w.map(_.toString).toArray
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length &&
              ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue) == bestRank) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
        continue = syms.length > 1
      }
    }
    syms
  }

  /**
   * Tokenize `docs` with a trained merge-rule table: (doc_id, n_tokens, n_unique) per
   * document. The rule table is BOUNDED (numMerges rows) so it collects and broadcasts
   * like the IVF centroids; encoding is then a map-only typed kernel with a per-partition
   * word -> tokens memo (natural-language word frequency is Zipfian, so the memo turns
   * per-word work amortized-O(1) across a partition). No shuffle at all — the 100 TB
   * plan is scan + project.
   */
  def bpeEncode(docs: DataFrame, rules: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = rules.select(col("rank"), col("left"), col("right"))
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap
    val bc = spark.sparkContext.broadcast(ranks)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          if (text == null) (id, 0L, 0L)
          else {
            val words = text.trim.split("\\s+").filter(_.nonEmpty)
            var n = 0L
            val uniq = scala.collection.mutable.HashSet.empty[String]
            words.foreach { w =>
              val toks = memo.getOrElseUpdate(w, encodeWord(w, bc.value))
              n += toks.length
              uniq ++= toks
            }
            (id, n, uniq.size.toLong)
          }
        }
      }.toDF("doc_id", "n_tokens", "n_unique")
  }

  /** `text_bpe_encode`: train 40 merges on the corpus, then tokenize every document
    * with them. */
  def textBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = TableIO.documents(spark, dir)
    bpeEncode(docs, bpeTrain(docs, numMerges = 40)).orderBy(col("doc_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe" -> (textBpe(_, _)),
    "text_bpe_encode" -> (textBpeEncode(_, _)))

  // rows-only by declared design: iterative argmax state (training) and rank-priority
  // rewriting (encoding) are not SQL-expressible; TextAnalysisSpec replays an in-memory
  // reference implementation against both Spark paths
  val oracles: Map[String, String] = Map.empty
}
