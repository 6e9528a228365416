package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming anomaly detection on metric streams: a per-key exponential-smoothing
 * (alpha = 1/2) level + smoothed absolute deviation, flagging observations whose
 * error exceeds `k` deviations — the streaming twin of the batch `q_ses_forecast`
 * operator, and the standard ops-metrics alerting shape (EWMA control chart,
 * Roberts '59).
 *
 * State is TWO doubles + a counter per key (fixed-size regardless of stream length)
 * held in `flatMapGroupsWithState` — Spark owns checkpointing/recovery, so the
 * monitor resumes mid-stream with its learned levels intact (the same
 * kill-and-reattach contract StreamingSpec proves for sessionization). Within a
 * micro-batch each key's observations fold in `seq` order (sorted in the group
 * function — Spark does not order group iterators), so replays are deterministic.
 *
 * Scale: state per key is O(1); keys shard across executors by the groupBy hash. At
 * 100 TB/day the input would first collapse to the (key, window) aggregate grain
 * upstream — the detector's cost is per GROUP row, not per raw event.
 */
object AnomalyMonitor {

  case class Obs(key: String, seq: Long, value: Double)
  case class SesState(level: Double, dev: Double, n: Long)
  case class Alert(key: String, seq: Long, value: Double,
      expected: Double, dev: Double, anomaly: Boolean)

  /** Fold one key's batch (sorted by seq) through the state; emits one row per obs. */
  private def step(k: Double, warmup: Int)(
      key: String, it: Iterator[Obs], state: GroupState[SesState]): Iterator[Alert] = {
    var s = state.getOption.getOrElse(SesState(0.0, 0.0, 0L))
    val out = it.toSeq.sortBy(_.seq).map { o =>
      val isAnom = s.n >= warmup && math.abs(o.value - s.level) > k * math.max(s.dev, 1e-9)
      val alert = Alert(key, o.seq, o.value, s.level, s.dev, isAnom)
      s =
        if (s.n == 0L) SesState(o.value, 0.0, 1L)
        else SesState((o.value + s.level) / 2.0,
          (math.abs(o.value - s.level) + s.dev) / 2.0, s.n + 1)
      alert
    }
    state.update(s)
    out.iterator
  }

  /** Attach the detector to a streaming (or batch-test) Dataset[Obs]. */
  def detect(obs: Dataset[Obs], k: Double = 4.0, warmup: Int = 5): Dataset[Alert] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        step(k, warmup))
  }
}
