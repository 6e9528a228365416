package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Batch equivalents of the streaming layer (graft.streaming.EventsStreaming runs the same
 * logical plans under Structured Streaming; these versions are DuckDB-oracle-checked).
 * The reference ran under Spark's streaming runtime untouched — graft proves the operators
 * natively: tumbling-window aggregation, sessionization, as-of enrichment.
 */
object EventsQueries {

  /** Tumbling 1-hour window aggregation per event type (streaming windowed-agg shape). */
  def qEventsWindow(spark: SparkSession, dir: String): DataFrame =
    TableIO.events(spark, dir)
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))
      .select(unix_timestamp(col("hour_start")).as("hour_epoch"),
        col("event_type"), col("n"), col("value_sum"))
      .orderBy(col("hour_epoch"), col("event_type"))

  val qEventsWindowSql: String =
    """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
      |  event_type, count(*) AS n, round(sum(value), 2) AS value_sum
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour_epoch, event_type""".stripMargin

  /**
   * Sliding 1-hour windows every 30 minutes: each event lands in exactly two windows.
   * The oracle reproduces Spark's window assignment from first principles (the two
   * half-hour-aligned starts covering each timestamp).
   */
  def qSlidingWindow(spark: SparkSession, dir: String): DataFrame =
    TableIO.events(spark, dir)
      .groupBy(
        window(col("ts"), "1 hour", "30 minutes").getField("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("win_start")).as("win_epoch"), col("event_type"), col("n"))
      .orderBy(col("win_epoch"), col("event_type"))

  val qSlidingWindowSql: String =
    """SELECT CAST(floor(epoch(win_start)) AS BIGINT) AS win_epoch, event_type, count(*) AS n
      |FROM (
      |  SELECT event_type,
      |    unnest([ts_30, CAST(ts_30 - INTERVAL 30 MINUTE AS TIMESTAMP)]) AS win_start
      |  FROM (SELECT event_type,
      |          CAST(date_trunc('hour', ts)
      |            + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END
      |            AS TIMESTAMP) AS ts_30
      |        FROM events))
      |GROUP BY 1, 2 ORDER BY win_epoch, event_type""".stripMargin

  /**
   * Native session windows (Spark's `session_window`, gap = 30 min, per user): session
   * count, span, and event count per user. The oracle rebuilds identical sessions with
   * the lag + running-sum construction.
   */
  def qSessionWindow(spark: SparkSession, dir: String): DataFrame =
    TableIO.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_total"),
        max(col("n_events")).as("busiest_session"))
      .orderBy(col("user_id"))

  val qSessionWindowSql: String =
    """WITH tagged AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, us,
      |    CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS brk
      |  FROM tagged),
      |sessions AS (
      |  SELECT user_id,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY us
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged),
      |per_session AS (
      |  SELECT user_id, sid, count(*) AS n_events FROM sessions GROUP BY user_id, sid)
      |SELECT user_id, count(*) AS n_sessions,
      |  CAST(sum(n_events) AS BIGINT) AS n_total,
      |  max(n_events) AS busiest_session
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  /**
   * Sessionization: a session breaks after a 30-minute silence per user. lag + running sum
   * assigns session ids in one shuffle; the same logic runs streaming via
   * flatMapGroupsWithState (EventsStreaming.sessionize).
   */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000 * 1000
    TableIO.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"))
      .agg(max(col("session_seq")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  val qSessionizeSql: String =
    """WITH tagged AS (
      |  SELECT user_id, event_id, ts,
      |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events),
      |flagged AS (
      |  SELECT user_id,
      |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
      |  FROM tagged)
      |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
      |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin

  /** As-of enrichment: each click joined to the user's latest purchase at or before it. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = TableIO.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    AsOfJoin.backward(clicks, purchases, key = "user_id",
      leftTs = "ts", rightTs = "p_ts", payload = Seq("purchase_id", "purchase_value"))
      .select(col("event_id"), col("user_id"),
        coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
        coalesce(col("purchase_value"), lit(0.0)).as("purchase_value"))
      .orderBy(col("event_id"))
  }

  val qAsofJoinSql: String =
    """SELECT c.event_id, c.user_id,
      |  coalesce(p.event_id, -1) AS purchase_id,
      |  coalesce(p.value, 0.0) AS purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin

  /**
   * Funnel attribution: purchases with a same-user click in the preceding 30 minutes —
   * the batch twin of the stream-stream interval join (EventsStreaming.funnelJoin). One
   * shuffle on user_id; the time-range predicate evaluates join-local.
   */
  def qFunnelJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = TableIO.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_ts") > col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("c_user").as("user_id"))
      .agg(countDistinct(col("p_id")).as("attributed"))
      .orderBy(col("user_id"))
  }

  val qFunnelJoinSql: String =
    """SELECT c.user_id AS user_id, count(DISTINCT p.event_id) AS attributed
      |FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      |JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /**
   * Cohort retention: users grouped by first-activity week, counted as active in each
   * subsequent week — the standard product-analytics matrix. Two aggregations, one join:
   * the per-user first-week frame joins back on user_id (AQE broadcasts it when small,
   * shuffles on the key when not), then a distinct-count per (cohort, week offset). Week
   * offsets are exact integer arithmetic (both endpoints week-truncated, so the day diff
   * is an exact multiple of 7).
   */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = TableIO.events(spark, dir)
    val firstWeek = e.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    e.join(firstWeek, Seq("user_id"))
      .groupBy(
        date_trunc("week", col("cohort_week")).cast("date").as("cohort"),
        (datediff(date_trunc("week", col("ts")), col("cohort_week")) / 7).cast("int").as("week_n"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy(col("cohort"), col("week_n"))
  }

  val qRetentionSql: String =
    """WITH fw AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      |  FROM events GROUP BY 1)
      |SELECT CAST(fw.cohort_week AS DATE) AS cohort,
      |  CAST(date_diff('day', fw.cohort_week, date_trunc('week', e.ts)) / 7 AS INT) AS week_n,
      |  count(DISTINCT e.user_id) AS active_users
      |FROM events e JOIN fw ON e.user_id = fw.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /**
   * `q_rolling_zscore`: per-user rolling-window anomaly detection — each event's value
   * scored against the mean/stddev of that user's PRECEDING 20 events (rows between 20
   * preceding and 1 preceding: strictly past-only, so the statistic is leakage-free the
   * same way the point-in-time join is). Events with |z| > 3 over a warmed-up window
   * (>= 10 prior points) are flagged.
   *
   * Scale shape: one window partitioned by user_id (the natural shuffle key; millions of
   * users → full parallelism, no global window), ordered by (ts, event_id) for a total
   * order under timestamp ties. z is rounded to 4 decimals BEFORE the threshold filter
   * so both engines threshold identical numbers.
   */
  def qRollingZscore(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, -1)
    TableIO.events(spark, dir)
      .withColumn("mu", avg(col("value")).over(w))
      .withColumn("sd", stddev_samp(col("value")).over(w))
      .withColumn("npts", count(col("value")).over(w))
      .filter(col("npts") >= 10 && col("sd") > 0)
      .withColumn("z4", round((col("value") - col("mu")) / col("sd"), 4))
      .filter(abs(col("z4")) > 3.0)
      .select(col("event_id"), col("user_id"), round(col("value"), 2).as("value2"), col("z4"))
      .orderBy(col("event_id"))
  }

  val qRollingZscoreSql: String =
    """WITH scored AS (
      |  SELECT event_id, user_id, value,
      |         avg(value) OVER w AS mu,
      |         stddev_samp(value) OVER w AS sd,
      |         count(value) OVER w AS npts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
      |)
      |SELECT event_id, user_id, round(value, 2) AS value2,
      |       round((value - mu) / sd, 4) AS z4
      |FROM scored
      |WHERE npts >= 10 AND sd > 0 AND abs(round((value - mu) / sd, 4)) > 3.0
      |ORDER BY event_id""".stripMargin

  /**
   * `q_mad_outliers`: robust (median/MAD) outlier flags per event type — the
   * contamination-immune twin of `q_rolling_zscore` (an outlier inflates a stddev but
   * not a MAD, so it cannot mask itself). Built on the buffer-free exact-median path
   * (`Percentiles.madOutliers`); robust z rounded to 4 BEFORE the 3.5 cutoff so both
   * engines threshold identical numbers. DuckDB's interpolated `median` is the twin of
   * exactBySort at q=0.5 (parity proven by q_percentile_sort).
   */
  def qMadOutliers(spark: SparkSession, dir: String): DataFrame =
    Percentiles.madOutliers(
        TableIO.events(spark, dir).select(col("event_id"), col("event_type"), col("value")),
        Seq("event_type"), "value")
      .withColumn("rz4", round(col("robust_z"), 4))
      .filter(col("rz4") > 3.5)
      .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value2"),
        col("rz4"))
      .orderBy(col("event_id"))

  val qMadOutliersSql: String =
    """WITH med AS (
      |  SELECT event_type, median(value) AS med FROM events GROUP BY 1
      |), dev AS (
      |  SELECT e.event_id, e.event_type, e.value, abs(e.value - m.med) AS absdev
      |  FROM events e JOIN med m USING (event_type)
      |), mad AS (
      |  SELECT event_type, median(absdev) AS mad FROM dev GROUP BY 1
      |)
      |SELECT d.event_id, d.event_type, round(d.value, 2) AS value2,
      |       round(d.absdev / (1.4826 * m.mad), 4) AS rz4
      |FROM dev d JOIN mad m USING (event_type)
      |WHERE m.mad > 0 AND round(d.absdev / (1.4826 * m.mad), 4) > 3.5
      |ORDER BY d.event_id""".stripMargin

  /**
   * `q_winsorize`: per-event-type tail clipping at the exact [p05, p95] band
   * (`Percentiles.winsorize`) with a per-group before/after audit — rows kept, tails
   * bounded; the mean shift is the statistic a feature pipeline monitors. Sum-order
   * double noise on the means is ~1e-9 abs vs the round(4) grain. A boundary can only
   * coincide with a data value at an integral target rank, where both engines
   * reproduce it exactly (the equidepth-bins determinism argument), so clip counts are
   * cross-engine stable.
   */
  def qWinsorize(spark: SparkSession, dir: String): DataFrame =
    Percentiles.winsorize(
        TableIO.events(spark, dir).select(col("event_type"), col("value")),
        Seq("event_type"), "value", 0.05, 0.95)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
        round(avg(col("value")), 4).as("mean_raw"),
        round(avg(col("clipped")), 4).as("mean_wins"),
        round(min(col("lo")), 4).as("lo4"), round(min(col("hi")), 4).as("hi4"))
      .orderBy(col("event_type"))

  val qWinsorizeSql: String =
    """WITH bounds AS (
      |  SELECT event_type,
      |         quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
      |  FROM events GROUP BY 1
      |), c AS (
      |  SELECT e.event_type, e.value, b.lo, b.hi,
      |         least(greatest(e.value, b.lo), b.hi) AS clipped
      |  FROM events e JOIN bounds b USING (event_type)
      |)
      |SELECT event_type, count(*) AS n,
      |       CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
      |       CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
      |       round(avg(value), 4) AS mean_raw,
      |       round(avg(clipped), 4) AS mean_wins,
      |       round(min(lo), 4) AS lo4, round(min(hi), 4) AS hi4
      |FROM c
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /**
   * `q_funnel3`: strict-ordering three-step funnel (view → click → purchase) — the
   * product-analytics staple generalizing the two-step `q_funnel_join`. Step k's
   * timestamp is the user's FIRST step-k event strictly after their step-(k−1)
   * timestamp, so each stage is one conditional aggregation: three groupBy(user)
   * shuffles total (each stage's frame shrinks to converting users), never an
   * events×events self-join. Output: one row per funnel stage with user counts and
   * the conversion rate from the previous stage.
   */
  def qFunnel3(spark: SparkSession, dir: String): DataFrame = {
    val ev = TableIO.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val nv = v.agg(count(lit(1)).as("users")).select(lit(1).as("step"), lit("view").as("stage"), col("users"))
    val nc = c.agg(count(lit(1)).as("users")).select(lit(2).as("step"), lit("click").as("stage"), col("users"))
    val np = p.agg(count(lit(1)).as("users")).select(lit(3).as("step"), lit("purchase").as("stage"), col("users"))
    val steps = nv.unionByName(nc).unionByName(np)
    // step-over-step conversion via a 3-row self-join (no unpartitioned window — keeps
    // the bench log free of WindowExec single-partition warnings)
    val prev = steps.select((col("step") + 1).as("step"), col("users").as("prev_users"))
    steps.join(prev, Seq("step"), "left")
      .withColumn("conv4", round(col("users") / col("prev_users"), 4))
      .select(col("step"), col("stage"), col("users"), col("conv4"))
      .orderBy(col("step"))
  }

  val qFunnel3Sql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
      |), c AS (
      |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
      |), p AS (
      |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
      |), steps AS (
      |  SELECT 1 AS step, 'view' AS stage, count(*) AS users FROM v
      |  UNION ALL SELECT 2, 'click', count(*) FROM c
      |  UNION ALL SELECT 3, 'purchase', count(*) FROM p
      |)
      |SELECT step, stage, users,
      |       round(users / CAST(lag(users) OVER (ORDER BY step) AS DOUBLE), 4) AS conv4
      |FROM steps
      |ORDER BY step""".stripMargin

  /**
   * `q_event_transitions`: first-order Markov transition matrix of user behavior —
   * consecutive event-type pairs per user (ordered by ts with event_id tie-break),
   * with per-source-state transition probabilities. One lag window partitioned by
   * user_id (the natural shuffle key), one map-side-combined count, marginals joined
   * back from the grouped frame itself (state-cardinality², trivially broadcast).
   */
  def qEventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = TableIO.events(spark, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    pairs.join(broadcast(fromTotals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("n_from"), 6).as("p6"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val qEventTransitionsSql: String =
    """WITH pairs AS (
      |  SELECT event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events
      |), counts AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
      |), totals AS (
      |  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM counts GROUP BY 1
      |)
      |SELECT c.from_type, c.to_type, c.n,
      |       round(c.n / CAST(t.n_from AS DOUBLE), 6) AS p6
      |FROM counts c JOIN totals t USING (from_type)
      |ORDER BY c.from_type, c.to_type""".stripMargin

  /**
   * `q_event_paths`: frequent session paths — the top-10 event-type trigrams over
   * per-session ordered event sequences (PrefixSpan's bread-and-butter shape reduced
   * to contiguous n-grams). Sessions are the same 30-minute-gap rule as q_sessionize;
   * each session's sequence materializes via sort_array(collect_list(struct)) — state
   * bounded by session length, partitioned by (user, session), no global ordering
   * anywhere until the final 10-row TakeOrdered.
   */
  def qEventPaths(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000 * 1000
    TableIO.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("sid", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(transform(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))), x => x("event_type")).as("types"))
      .filter(size(col("types")) >= 3)
      .select(explode(expr(
        "transform(sequence(0, size(types) - 3), i -> concat_ws(' > ', types[i], types[i+1], types[i+2]))"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(k)
  }

  val qEventPathsSql: String =
    """WITH numbered AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    sum(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
      |        THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM (SELECT user_id, event_id, ts, event_type,
      |          lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |        FROM events)),
      |seqs AS (
      |  SELECT user_id, sid, list(event_type ORDER BY ts, event_id) AS types
      |  FROM numbered GROUP BY 1, 2),
      |paths AS (
      |  SELECT unnest(list_transform(generate_series(1, len(types) - 2),
      |    i -> types[i] || ' > ' || types[i+1] || ' > ' || types[i+2])) AS path
      |  FROM seqs WHERE len(types) >= 3)
      |SELECT path, count(*) AS n FROM paths GROUP BY 1
      |ORDER BY n DESC, path LIMIT 10""".stripMargin

  /**
   * `q_cusum`: CUSUM changepoint detection per event type — the mean-shift detector
   * (Page '54) over each type's daily value series: S_t = sum_{i<=t}(x_i − mean), the
   * changepoint estimate is argmax |S_t| (tie to the earliest day). Series are daily
   * aggregates, so every window partitions BY TYPE over day-count-sized frames — the
   * corpus-sized work is one map-side-combined (type, day) groupBy. Daily sums round
   * to 6 before the mean/CUSUM arithmetic so both engines fold identical numbers in
   * identical window order.
   */
  def qCusum(spark: SparkSession, dir: String): DataFrame = {
    val daily = TableIO.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")), 6).as("x"))
    val mu = daily.groupBy(col("event_type"))
      .agg(avg(col("x")).as("mu"), count(lit(1)).as("n_days"))
    val byType = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rank = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("s")).desc, col("day"))
    daily.join(mu, "event_type")
      .withColumn("s", sum(col("x") - col("mu")).over(byType))
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        round(abs(col("s")), 4).as("max_dev"), col("n_days"))
      .orderBy(col("event_type"))
  }

  val qCusumSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         round(sum(value), 6) AS x
      |  FROM events GROUP BY 1, 2),
      |mu AS (SELECT event_type, avg(x) AS mu, count(*) AS n_days FROM daily GROUP BY 1),
      |cusum AS (
      |  SELECT d.event_type, d.day, mu.mu, mu.n_days,
      |    sum(d.x - mu.mu) OVER (PARTITION BY d.event_type ORDER BY d.day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      |  FROM daily d JOIN mu USING (event_type)),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY abs(s) DESC, day) AS rn FROM cusum)
      |SELECT event_type, day AS cp_day, round(abs(s), 4) AS max_dev,
      |       CAST(n_days AS BIGINT) AS n_days
      |FROM ranked WHERE rn = 1 ORDER BY event_type""".stripMargin

  /**
   * `q_attribution`: first/last-touch marketing attribution — for every purchase,
   * the user's most recent preceding click (last touch) and earliest click (first
   * touch), with a 7-day attribution window on the last touch; reported as a daily
   * rate frame. The workload behind every marketing-spend dashboard.
   *
   * The carry is ONE past-only window per user (max/min over CASE click-ts —
   * max of a monotone key IS the most recent, no IGNORE NULLS portability needed),
   * ordered totally by (ts, event_id) so timestamp ties resolve identically on both
   * engines. Window lookback/diff in integer epoch MICROseconds (unix_micros /
   * epoch_us — both exact BIGINTs, no fractional-second dialect drift); counts are
   * exact integers, rate is one rounded division per day row. Scale: partitioned by
   * user_id (full parallelism), then a calendar-bounded daily aggregate.
   */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val clickTs = when(col("event_type") === "click", unix_micros(col("ts")))
    TableIO.events(spark, dir)
      .withColumn("last_click", max(clickTs).over(w))
      .withColumn("first_click", min(clickTs).over(w))
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("day"),
        when(col("last_click").isNotNull &&
          unix_micros(col("ts")) - col("last_click") <= 604800000000L, 1).otherwise(0)
          .as("attributed"),
        when(col("first_click").isNotNull, 1).otherwise(0).as("ever_clicked"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("attributed")).as("n_attributed"),
        sum(col("ever_clicked")).as("n_ever_clicked"))
      .withColumn("attr_rate4",
        round(col("n_attributed").cast("double") / col("n_purchases"), 4))
      .orderBy(col("day"))
  }

  val qAttributionSql: String =
    """WITH carried AS (
      |  SELECT ts, event_type,
      |    max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) OVER w AS last_click,
      |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) OVER w AS first_click
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |purchases AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CASE WHEN last_click IS NOT NULL AND epoch_us(ts) - last_click <= 604800000000
      |         THEN 1 ELSE 0 END AS attributed,
      |    CASE WHEN first_click IS NOT NULL THEN 1 ELSE 0 END AS ever_clicked
      |  FROM carried WHERE event_type = 'purchase')
      |SELECT day, count(*) AS n_purchases,
      |  CAST(sum(attributed) AS BIGINT) AS n_attributed,
      |  CAST(sum(ever_clicked) AS BIGINT) AS n_ever_clicked,
      |  round(CAST(sum(attributed) AS DOUBLE) / count(*), 4) AS attr_rate4
      |FROM purchases GROUP BY day ORDER BY day""".stripMargin

  /**
   * `q_ohlc`: daily OHLC bars per event type — open/high/low/close of `value` plus
   * tick count, the time-series summarization every market/metrics store materializes.
   * Open/close are picked by row_number over the TOTAL (ts, event_id) order (both
   * engines pick the identical single row — no first_value/arg_min dialect or tie
   * ambiguity), high/low/count are order-independent aggregates; no cross-row double
   * accumulation anywhere, so the frame is hash-stable. One window + one groupBy on
   * the (type, day) partitioning — the natural shuffle key.
   */
  def qOhlc(spark: SparkSession, dir: String): DataFrame = {
    val byDay = TableIO.events(spark, dir)
      .withColumn("day", to_date(col("ts")))
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val wd = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts").desc, col("event_id").desc)
    byDay
      .withColumn("rn_a", row_number().over(w))
      .withColumn("rn_d", row_number().over(wd))
      .groupBy(col("event_type"), col("day"))
      .agg(
        max(when(col("rn_a") === 1, col("value"))).as("open"),
        round(max(col("value")), 4).as("high"),
        round(min(col("value")), 4).as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        count(lit(1)).as("n_ticks"))
      .select(col("event_type"), col("day"), round(col("open"), 4).as("open"),
        col("high"), col("low"), round(col("close"), 4).as("close"), col("n_ticks"))
      .orderBy(col("event_type"), col("day"))
  }

  val qOhlcSql: String =
    """WITH seq AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, value,
      |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
      |                       ORDER BY ts, event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
      |                       ORDER BY ts DESC, event_id DESC) AS rn_d
      |  FROM events)
      |SELECT event_type, day,
      |  round(max(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
      |  round(max(value), 4) AS high,
      |  round(min(value), 4) AS low,
      |  round(max(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
      |  count(*) AS n_ticks
      |FROM seq GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ohlc" -> qOhlc _,
    "q_attribution" -> qAttribution _,
    "q_cusum" -> (qCusum(_, _)),
    "q_event_paths" -> (qEventPaths(_, _, 10)),
    "q_events_window" -> qEventsWindow _,
    "q_rolling_zscore" -> qRollingZscore _,
    "q_mad_outliers" -> qMadOutliers _,
    "q_winsorize" -> qWinsorize _,
    "q_funnel3" -> qFunnel3 _,
    "q_event_transitions" -> qEventTransitions _,
    "q_sessionize" -> qSessionize _,
    "q_asof_join" -> qAsofJoin _,
    "q_funnel_join" -> qFunnelJoin _,
    "q_sliding_window" -> qSlidingWindow _,
    "q_session_window" -> qSessionWindow _,
    "q_retention" -> qRetention _)

  val oracles: Map[String, String] = Map(
    "q_ohlc" -> qOhlcSql,
    "q_attribution" -> qAttributionSql,
    "q_cusum" -> qCusumSql,
    "q_event_paths" -> qEventPathsSql,
    "q_events_window" -> qEventsWindowSql,
    "q_rolling_zscore" -> qRollingZscoreSql,
    "q_mad_outliers" -> qMadOutliersSql,
    "q_winsorize" -> qWinsorizeSql,
    "q_funnel3" -> qFunnel3Sql,
    "q_event_transitions" -> qEventTransitionsSql,
    "q_sessionize" -> qSessionizeSql,
    "q_asof_join" -> qAsofJoinSql,
    "q_funnel_join" -> qFunnelJoinSql,
    "q_sliding_window" -> qSlidingWindowSql,
    "q_session_window" -> qSessionWindowSql,
    "q_retention" -> qRetentionSql)
}
