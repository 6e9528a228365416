package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.pipeline.HeavyHitters.SpaceSavingSketch

/**
 * Streaming approximate top-k (SpaceSaving over micro-batches) — the continuous twin
 * of the batch `text_topgrams_sketch`: trending items over an unbounded stream with
 * BOUNDED state, where an exact streaming groupBy-count would grow state with item
 * cardinality forever.
 *
 * Items hash-partition into `nShards` keyed states; each shard folds its micro-batch
 * into a SpaceSavingSketch restored from (and re-saved to) group state, so per-shard
 * state is exactly `capacity` counters REGARDLESS of stream length or cardinality.
 * Because every occurrence of an item lands in one shard, the per-shard SpaceSaving
 * guarantees survive unchanged: any item with true count > N_shard/capacity is
 * present, and est - err <= true <= est. Update-mode output re-emits the shard's
 * current summary each trigger; the reader merges shards with one tiny batch
 * aggregation (<= capacity x nShards rows).
 */
object StreamingTopK {

  /** shard(item) — deterministic, stable across JVMs. */
  private[graft] def shardOf(item: String, nShards: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(item), nShards)

  /**
   * items (streaming Dataset[String]) -> Update-mode (shard, item, est, err) rows:
   * each trigger re-emits the updated shards' full summaries.
   */
  def topKStream(items: Dataset[String], capacity: Int, nShards: Int = 8): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items
      .groupByKey(shardOf(_, nShards))
      .flatMapGroupsWithState[Map[String, (Long, Long)], (Int, String, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (shard, rows, state: GroupState[Map[String, (Long, Long)]]) =>
          val sk = new SpaceSavingSketch(capacity, state.getOption.getOrElse(Map.empty))
          rows.foreach(sk.add)
          val sum = sk.summary
          state.update(sum)
          sum.iterator.map { case (item, (est, err)) => (shard, item, est, err) }
      }
      .toDF("shard", "item", "est", "err")
  }
}
