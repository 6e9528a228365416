package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming layer over the `events` schema. The reference ran inside Spark's
 * streaming runtime untouched (its columnar operators slotted under the streaming plan);
 * graft proves the same workloads natively: watermarked window aggregation, streaming
 * dedup, and stateful sessionization.
 *
 * Every transform takes an unbounded DataFrame (from readStream or MemoryStream) and is
 * identical to its batch twin in graft.operators.EventsQueries — one logical plan, two
 * runtimes, which is exactly Spark's contract.
 *
 * Scale: state is keyed by (window, type) / user_id — watermarks bound state size; at
 * 100 TB/day the state store shards by the shuffle partition count.
 */
object EventsStreaming {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  case class SessionSummary(user_id: Long, n_sessions: Int, n_events: Long)

  /** Tumbling 1-hour windowed aggregation with a 2-hour watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("value_sum"))

  /** Streaming exact dedup on event_id within the watermark horizon. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates("event_id", "ts")

  /**
   * Dedup on event_id ALONE within the watermark: duplicates whose timestamps differ
   * (retries, at-least-once replays) still collapse, and — unlike plain
   * `dropDuplicates("event_id")`, whose state grows forever because the key carries no
   * event-time column — state is evicted once the watermark passes, so memory is bounded
   * by the delay horizon. This is the at-scale exactly-once ingest gate.
   */
  def dedupWithinWatermark(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")

  /**
   * Streaming windowed DISTINCT users — the streaming twin of the batch reach curve
   * (TimeSeriesOps 29an/29av): per tumbling window, how many distinct users were
   * active. COUNT(DISTINCT) is not a streaming aggregate, so this CHAINS two stateful
   * operators (Spark 4 multi-stateful pipeline): an event-time dedup on
   * (user_id, window) collapses each user to one row per window, then a windowed
   * count aggregates the survivors; both states evict at the shared watermark, output
   * is append-mode final (a window emits once, when the watermark passes its end).
   */
  def windowedDistinctUsers(events: DataFrame, windowLen: String = "1 hour",
      delay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), window(col("ts"), windowLen).as("w"))
      .dropDuplicates("user_id", "w")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("distinct_users"))
      .select(col("w.start").as("window_start"), col("distinct_users"))

  /**
   * Stream-stream interval join: purchases attributed to a same-user click in the
   * preceding 30 minutes. Both sides carry watermarks and the join condition bounds event
   * time in both directions, so Spark can expire join state — without the time bounds the
   * state store would grow forever. Batch twin: EventsQueries.qFunnelJoin.
   */
  def funnelJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", "1 hour")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") > col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("c_user").as("user_id"), col("c_ts"), col("p_ts"), col("p_id"))
  }

  /**
   * LEFT OUTER stream-stream interval join: every click emits — attributed purchases
   * ride the match, clicks with no purchase inside the attribution window emit with
   * null purchase columns once BOTH watermarks have passed the window end (Spark holds
   * the unmatched left row in state exactly that long; the interval bound on BOTH join
   * keys is what makes the state evictable — an unbounded outer stream-stream join
   * would accumulate state forever and is rejected by the engine).
   */
  def funnelJoinOuter(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") > col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
      "left_outer")
      .select(col("c_user").as("user_id"), col("c_ts"), col("p_ts"), col("p_id"))
  }

  private val SessionGapUs = 30L * 60 * 1000 * 1000

  /**
   * Stateful sessionization with flatMapGroupsWithState: counts sessions per user with a
   * 30-minute silence break — the streaming twin of EventsQueries.qSessionize. Emits one
   * summary per user per trigger (Update mode).
   */
  def sessionize(spark: SparkSession, events: Dataset[Event]): Dataset[SessionSummary] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Int, Long), SessionSummary](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[(Long, Int, Long)]) =>
          // state = (last event micros, session count, event count)
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var (lastUs, sessions, count) = state.getOption.getOrElse((Long.MinValue, 0, 0L))
          sorted.foreach { e =>
            val us = e.ts.getTime * 1000
            if (lastUs == Long.MinValue || us - lastUs > SessionGapUs) sessions += 1
            lastUs = us
            count += 1
          }
          state.update((lastUs, sessions, count))
          Iterator(SessionSummary(userId, sessions, count))
      }
  }
}
