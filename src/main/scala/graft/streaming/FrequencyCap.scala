package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graft.CountMin

/**
 * Streaming per-item frequency cap — admit at most `cap` occurrences of every item
 * over an UNBOUNDED stream with BOUNDED state, the curation gate a training-data
 * pipeline puts in front of near-duplicate URLs / boilerplate domains / repeated
 * templates: an exact streaming groupBy-count grows state with item cardinality
 * forever; here each shard's whole memory is ONE count-min table (the 29bk sketch,
 * restored from and re-saved to group state as bytes), fixed at depth x width longs
 * regardless of how many distinct items flow through.
 *
 * Items hash-partition into `nShards` keyed states (same sharding as StreamingTopK),
 * so every occurrence of an item lands in one shard and the CMS one-sided guarantee
 * survives: the estimate only ever OVER-counts, so the gate can only UNDER-admit —
 * `admitted <= min(true, cap)` holds unconditionally, with equality whenever the
 * item's CMS rows are collision-free (the spec pins both). Admission is decided per
 * occurrence (estimate read before each add), so a hot item's first ~cap occurrences
 * pass and the tail is refused, regardless of micro-batch boundaries. Each input row
 * is emitted exactly once (Append mode) with its running estimate and verdict, so
 * the refusal tail stays observable downstream.
 */
object FrequencyCap {

  /** shard(item) — deterministic, stable across JVMs (StreamingTopK's function). */
  private[graft] def shardOf(item: String, nShards: Int): Int =
    StreamingTopK.shardOf(item, nShards)

  /**
   * items (streaming Dataset[String]) -> Append-mode (item, est, admitted) rows: one
   * row per input occurrence; `est` is the post-decision CMS estimate, `admitted`
   * whether this occurrence passed the cap.
   */
  def capStream(items: Dataset[String], cap: Long, nShards: Int = 8,
      depth: Int = CountMin.DefaultDepth, width: Int = CountMin.DefaultWidth): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items
      .groupByKey(shardOf(_, nShards))
      .flatMapGroupsWithState[Array[Byte], (String, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[Array[Byte]]) =>
          val sk = state.getOption.map(CountMin.fromBytes)
            .getOrElse(new CountMin.Buffer(depth, width))
          // Deterministic via the sorted fold: Spark hands the group iterator in shuffle
          // arrival order, so sorting pins the (item, est, admitted) output bit-for-bit
          // across reruns. Per-item admitted COUNTS are additionally order-insensitive
          // whenever the item's CMS rows are collision-free; under collisions the
          // interleaving of OTHER items' adds can shift the estimate read at a decision,
          // so determinism (not order-insensitivity) is the property the sort buys.
          // Memory contract: `rows.toSeq` materializes ONE shard's slice of ONE trigger
          // (~batchRows/nShards), the only per-batch state beyond the fixed CMS table —
          // bounded by trigger sizing, not by stream length or item cardinality.
          val out = rows.toSeq.sorted.map { item =>
            val u = UTF8String.fromString(item)
            val before = sk.estimate(u)
            if (before < cap) {
              sk.add(u)
              (item, before + 1, true)
            } else (item, before, false)
          }
          state.update(sk.toBytes)
          out.iterator
      }
      .toDF("item", "est", "admitted")
  }
}
