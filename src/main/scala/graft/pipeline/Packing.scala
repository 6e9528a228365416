package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Sequence packing — the step between chunking and tokenization in a training pipeline:
 * concatenate documents into fixed token-budget bins (context windows) so padding waste
 * is bounded, without splitting documents across bins.
 *
 * Packing is INHERENTLY sequential per stream (each bin decision depends on the previous
 * fill), so the scale shape is: parallel ACROSS streams, sequential WITHIN a stream —
 * each stream's rows are routed to one partition (repartition on the stream key) and a
 * single partition-local fold assigns bins in deterministic doc_id order. Streams are
 * the natural unit (a source/shard of the corpus); one stream's data must fit a
 * partition, which is what stream sharding is for. Greedy next-fit policy: a doc that
 * does not fit opens a new bin; docs longer than the budget get a bin of their own
 * (truncation is the tokenizer's decision, not the packer's).
 *
 * Driver check is rows-only (greedy state is not SQL-expressible without recursion);
 * PackingSpec proves the invariants: bins respect the budget (oversized singletons
 * exempt), docs stay whole, bin ids are dense per stream, determinism across runs, and
 * equality with a naive reference fold.
 */
object Packing {

  /**
   * (stream, doc_id, n_tokens, bin_id, bin_fill): greedy next-fit packing of each
   * stream's docs (ascending doc_id) into bins of `budget` tokens. `bin_fill` is the
   * bin's total AFTER adding the doc — the last row of a bin carries its final fill.
   */
  def packGreedy(docs: DataFrame, streamCol: String, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(streamCol).cast("string").as("stream"), col("doc_id"),
        // the pipeline's established whitespace token count (TextAnalysis n_ws_tokens):
        // trim + \s+ split, so irregular whitespace never charges phantom tokens against
        // the budget. Null text packs as 0 tokens — a doc must never silently vanish
        // from the packed corpus.
        coalesce(size(split(trim(col("text")), "\\s+")), lit(0)).as("n_tokens"))
      .repartition(col("stream"))
      .sortWithinPartitions(col("stream"), col("doc_id"))
      .as[(String, Long, Int)]
      .mapPartitions { it =>
        // partition holds whole streams, rows sorted (stream, doc_id): one linear fold
        var curStream: String = null
        var bin = -1L
        var fill = 0
        it.map { case (stream, docId, n) =>
          if (stream != curStream) { curStream = stream; bin = -1L; fill = 0 }
          if (bin < 0 || fill + n > budget) { bin += 1; fill = 0 }
          fill += n
          (stream, docId, n, bin, fill)
        }
      }
      .toDF("stream", "doc_id", "n_tokens", "bin_id", "bin_fill")
  }

  /** `pack_greedy`: documents packed into 256-token bins per source. */
  def packGreedyQuery(spark: SparkSession, dir: String): DataFrame =
    packGreedy(TableIO.documents(spark, dir), "source", budget = 256)
      .orderBy(col("stream"), col("doc_id"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pack_greedy" -> (packGreedyQuery(_, _)))

  // rows-only by declared design: greedy packing state is sequential (recursive in SQL);
  // PackingSpec carries the correctness burden against a naive reference fold
  val oracles: Map[String, String] = Map.empty
}
