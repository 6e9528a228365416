package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Sequence packing — the step between chunking and tokenization in a training pipeline:
 * concatenate documents into fixed token-budget bins (context windows) so padding waste
 * is bounded, without splitting documents across bins.
 *
 * Packing is INHERENTLY sequential (each bin decision depends on the previous fill), so
 * the scale shape bounds the sequential span: streams are cut into deterministic
 * doc_id-range SHARDS (`floor(doc_id / shardDocs)`), each (stream, shard) packs
 * independently in one partition-local fold, and a metadata-sized offset pass stitches
 * shard-local bin ids into stream-dense global ids. Bins never span shards — the cost is
 * at most one partially-filled bin per shard boundary (bounded extra padding), the gain
 * is that NO whole stream must ever fit one partition: a 33 TB source shards into
 * `shardDocs`-row units regardless of how skewed the stream sizes are.
 *
 * Greedy next-fit policy: a doc that does not fit opens a new bin; docs longer than the
 * budget get a bin of their own (truncation is the tokenizer's decision, not the
 * packer's).
 *
 * Driver check is rows-only (greedy state is not SQL-expressible without recursion);
 * PackingSpec proves the invariants: bins respect the budget (oversized singletons
 * exempt), docs stay whole, bin ids are dense per stream, bins never span shards,
 * determinism across runs, and equality with a naive per-(stream, shard) reference fold.
 */
object Packing {

  /**
   * (stream, doc_id, n_tokens, bin_id, bin_fill): greedy next-fit packing of each
   * stream's docs (ascending doc_id) into bins of `budget` tokens. `bin_fill` is the
   * bin's total AFTER adding the doc — the last row of a bin carries its final fill.
   * `shardDocs` bounds the sequential span: docs `[k*shardDocs, (k+1)*shardDocs)` of a
   * stream pack as an independent unit (bins never cross the boundary).
   */
  def packGreedy(docs: DataFrame, streamCol: String, budget: Int,
      shardDocs: Long = 1L << 20): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shardDocs > 0, s"shardDocs must be positive, got $shardDocs")
    val spark = docs.sparkSession
    import spark.implicits._
    val local = docs
      .select(col(streamCol).cast("string").as("stream"), col("doc_id"),
        // the pipeline's established whitespace token count (TextAnalysis n_ws_tokens):
        // trim + \s+ split, so irregular whitespace never charges phantom tokens against
        // the budget. Null text packs as 0 tokens — a doc must never silently vanish
        // from the packed corpus.
        coalesce(size(split(trim(col("text")), "\\s+")), lit(0)).as("n_tokens"))
      .withColumn("shard", floor(col("doc_id") / shardDocs))
      .repartition(col("stream"), col("shard"))
      .sortWithinPartitions(col("stream"), col("shard"), col("doc_id"))
      .as[(String, Long, Int, Long)]
      .mapPartitions { it =>
        // partition holds whole (stream, shard) units, rows sorted: one linear fold
        var curStream: String = null
        var curShard = Long.MinValue
        var bin = -1L
        var fill = 0
        it.map { case (stream, docId, n, shard) =>
          if (stream != curStream || shard != curShard) {
            curStream = stream; curShard = shard; bin = -1L; fill = 0
          }
          if (bin < 0 || fill + n > budget) { bin += 1; fill = 0 }
          fill += n
          (stream, shard, docId, n, bin, fill)
        }
      }
      .toDF("stream", "shard", "doc_id", "n_tokens", "bin_local", "bin_fill")
    // Stitch: exclusive running sum of per-shard bin counts gives each shard's id offset.
    // The offsets frame is ONE ROW PER (stream, shard) — metadata-sized by construction
    // (corpus_rows / shardDocs), so the per-stream window and the broadcast are cheap at
    // any corpus size. `local` is recomputed for the join (two passes of a narrow
    // map-only kernel) rather than cached — caching a corpus-sized frame is the wrong
    // trade at scale.
    val w = Window.partitionBy(col("stream")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("stream"), col("shard"))
      .agg((max(col("bin_local")) + 1).as("n_bins"))
      .withColumn("bin_offset", coalesce(sum(col("n_bins")).over(w), lit(0L)))
      .select(col("stream").as("o_stream"), col("shard").as("o_shard"), col("bin_offset"))
    local
      .join(broadcast(offsets),
        col("stream") === col("o_stream") && col("shard") === col("o_shard"))
      .select(col("stream"), col("doc_id"), col("n_tokens"),
        (col("bin_local") + col("bin_offset")).as("bin_id"), col("bin_fill"))
  }

  /** `pack_greedy`: documents packed into 256-token bins per source; shardDocs=512 so
    * the sf corpora exercise the multi-shard stitch path, not just the single-shard
    * degenerate case. */
  def packGreedyQuery(spark: SparkSession, dir: String): DataFrame =
    packGreedy(TableIO.documents(spark, dir), "source", budget = 256, shardDocs = 512L)
      .orderBy(col("stream"), col("doc_id"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pack_greedy" -> (packGreedyQuery(_, _)))

  // rows-only by declared design: greedy packing state is sequential (recursive in SQL);
  // PackingSpec carries the correctness burden against a naive reference fold
  val oracles: Map[String, String] = Map.empty
}
