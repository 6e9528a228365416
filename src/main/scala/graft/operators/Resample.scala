package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Time-series regularization: resample an irregular per-key event series onto a fixed
 * calendar grid, filling gaps with zeros (counts) and last-observation-carried-forward
 * (levels) — the feature-engineering step between raw events and any windowed model
 * input, and a capability class (gap fill / LOCF / calendar grids) Spark has no
 * built-in operator for.
 *
 * Plan shape (and why it survives 100 TB):
 *   - the observed aggregate is ONE map-side-combined groupBy (key, bucket);
 *   - the calendar grid derives from each key's own (min, max) span — `sequence` +
 *     `explode` is map-only ON THE AGGREGATED frame (keys x buckets rows, not events),
 *     so grid generation never touches the fact table;
 *   - gap fill is a left join of grid to observations on (key, bucket) — both sides
 *     already hash-partitioned on the key from their groupBys, and AQE handles the
 *     rest;
 *   - LOCF is a running `last(value, ignoreNulls)` window partitioned BY KEY — state
 *     is one value per partition stream, no global window, no driver involvement.
 */
object Resample {

  /**
   * Monthly resample of (key, ts, value): one row per key per calendar month between
   * that key's first and last event, with `n_events` (0 on gaps), and `value_locf`
   * (the most recent observed monthly aggregate at or before this month).
   */
  def monthlyLocf(events: DataFrame, key: String, tsCol: String, valCol: String): DataFrame = {
    val per = events
      .select(col(key), date_trunc("month", col(tsCol)).as("m"), col(valCol))
      .groupBy(col(key), col("m"))
      .agg(count(lit(1)).as("n_events"), round(sum(col(valCol)), 2).as("v"))
    val grid = per.groupBy(col(key)).agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
      .select(col(key), explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 MONTH"))).as("m"))
    val w = Window.partitionBy(col(key)).orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(per, Seq(key, "m"), "left")
      .select(col(key), col("m").cast("date").as("month"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true).over(w).as("v_locf"))
  }

  /**
   * `q_resample_locf`: low-key customers' monthly order series on a gap-free monthly
   * grid — order count per month (0 on gaps) and spend carried forward over gaps.
   * Exact integer counts + a 2-decimal pre-rounded carried value, fully replayed by
   * the DuckDB oracle (generate_series + IGNORE NULLS window).
   */
  def qResampleLocf(spark: SparkSession, dir: String): DataFrame =
    monthlyLocf(
      TableIO.orders(spark, dir).filter(col("o_custkey") < 100),
      "o_custkey", "o_orderdate", "o_totalprice")
      .orderBy(col("o_custkey"), col("month"))

  val qResampleLocfSql: String =
    """WITH per AS (
      |  SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
      |         count(*) AS n_events, round(sum(o_totalprice), 2) AS v
      |  FROM orders WHERE o_custkey < 100 GROUP BY 1, 2
      |), grid AS (
      |  SELECT o_custkey, unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS m
      |  FROM (SELECT o_custkey, min(m) AS lo, max(m) AS hi FROM per GROUP BY 1) s
      |)
      |SELECT g.o_custkey, CAST(g.m AS DATE) AS month,
      |       CAST(coalesce(p.n_events, 0) AS BIGINT) AS n_events,
      |       last_value(p.v IGNORE NULLS) OVER (PARTITION BY g.o_custkey ORDER BY g.m
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf
      |FROM grid g LEFT JOIN per p ON g.o_custkey = p.o_custkey AND g.m = p.m
      |ORDER BY g.o_custkey, month""".stripMargin

  // ---------------------------------------------------------- q_ses_forecast

  /**
   * Exponential smoothing (SES, alpha = 1/2 "half-life" form) over each event type's
   * daily count series, with the one-step-ahead backtest error — the standard
   * baseline forecaster/anomaly reference for operational time series.
   *
   * The recurrence s_t = y_t/2 + s_{t-1}/2 is sequential, which normally forces a
   * per-key fold. The alpha=1/2 closed form makes it RELATIONAL AND EXACT:
   * with v_i = y_i * 2^(i-1) and running sum V_t, s_t = (V_t + y_1) / 2^t. Every
   * quantity is an exact integer (counts times powers of two, spans of ~hundreds of
   * days stay far under 2^53), and division by 2^t is mantissa-exact — so the result
   * is bit-identical across engines and partitionings, i.e. hash-oracle-able, which
   * no general-alpha floating SES can promise.
   *
   * Scale: the windows run on the AGGREGATED (type, day) frame — one
   * map-side-combined groupBy of the fact table, then |types| x |days| rows; the
   * per-type window never sees raw events. For year+ spans, rebase t within
   * fixed-width epochs (2^t grows with the series length) — at this schema's spans
   * the exact form holds as-is.
   */
  def qSesForecast(spark: SparkSession, dir: String): DataFrame =
    sesOverDaily(TableIO.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")))

  /** Core SES plan over a (event_type, day, cnt) frame — see [[qSesForecast]]. */
  private[graft] def sesOverDaily(daily: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("t", row_number().over(wOrd))
      .withColumn("v", col("cnt") * pow(lit(2.0), col("t") - 1))
      .withColumn("vt", sum(col("v")).over(wOrd))
      .withColumn("y1", first(col("cnt")).over(wOrd))
      .withColumn("s", (col("vt") + col("y1")) / pow(lit(2.0), col("t")))
      .select(col("event_type"), col("day"), col("cnt"),
        round(col("s"), 6).as("ses"),
        round(abs(col("cnt") - lag(col("s"), 1).over(wOrd)), 6).as("abs_err"))
      .orderBy(col("event_type"), col("day"))
  }

  val qSesForecastSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |seq AS (
      |  SELECT event_type, day, cnt, row_number() OVER w AS t,
      |    cnt * pow(2.0, row_number() OVER w - 1) AS v
      |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |run AS (
      |  SELECT event_type, day, cnt, t,
      |    sum(v) OVER (PARTITION BY event_type ORDER BY day) AS vt,
      |    first_value(cnt) OVER (PARTITION BY event_type ORDER BY day) AS y1
      |  FROM seq),
      |ses AS (
      |  SELECT event_type, day, cnt, (vt + y1) / pow(2.0, t) AS s FROM run)
      |SELECT event_type, day, cnt, round(s, 6) AS ses,
      |  round(abs(cnt - lag(s) OVER (PARTITION BY event_type ORDER BY day)), 6) AS abs_err
      |FROM ses ORDER BY event_type, day""".stripMargin

  // ----------------------------------------------------------- q_rolling_corr

  /**
   * Rolling 7-day Pearson correlation between two event streams' daily volumes
   * (click vs purchase) — the co-movement signal behind demand forecasting and
   * leading-indicator dashboards. Computed from the five windowed power sums
   * (n, Σx, Σy, Σx², Σy², Σxy) over a ROWS frame, so one window pass yields the
   * exact textbook r; no corr() aggregate over self-joined frames.
   *
   * Every frame sum is an exact integer (daily counts), so the final double
   * expression is engine-deterministic. The window runs on the day-grain AGGREGATE
   * (bounded by calendar length, not data size); it is partitioned by the
   * constant-valued n_days attribute — same single-partition cost, but WindowExec
   * gets a real partition spec instead of logging its global-window warning
   * (the vocabCoverage idiom).
   */
  def qRollingCorr(spark: SparkSession, dir: String): DataFrame =
    rollingCorrDaily(TableIO.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(when(col("event_type") === "click", 1)).as("x"),
        count(when(col("event_type") === "purchase", 1)).as("y")))

  /** Core rolling-correlation plan over a (day, x, y) integer frame. */
  private[graft] def rollingCorrDaily(daily: DataFrame): DataFrame = {
    val tot = daily.agg(count(lit(1)).as("nd"))
    val f = Window.partitionBy(col("nd")).orderBy(col("day")).rowsBetween(-6, 0)
    val varTerm = (col("n") * col("sxx") - col("sx") * col("sx")) *
      (col("n") * col("syy") - col("sy") * col("sy"))
    daily.crossJoin(broadcast(tot))
      .withColumn("n", count(lit(1)).over(f))
      .withColumn("sx", sum(col("x")).over(f))
      .withColumn("sy", sum(col("y")).over(f))
      .withColumn("sxx", sum(col("x") * col("x")).over(f))
      .withColumn("syy", sum(col("y") * col("y")).over(f))
      .withColumn("sxy", sum(col("x") * col("y")).over(f))
      .withColumn("corr7", when(col("n") >= 7 && varTerm > 0,
        round((col("n") * col("sxy") - col("sx") * col("sy"))
          / sqrt((col("n") * col("sxx") - col("sx") * col("sx")) * lit(1.0)
            * (col("n") * col("syy") - col("sy") * col("sy"))), 6)))
      .select(col("day"), col("x"), col("y"), col("corr7"))
      .orderBy(col("day"))
  }

  val qRollingCorrSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    count(*) FILTER (WHERE event_type = 'click') AS x,
      |    count(*) FILTER (WHERE event_type = 'purchase') AS y
      |  FROM events GROUP BY 1),
      |w AS (
      |  SELECT day, x, y,
      |    count(*) OVER f AS n,
      |    sum(x) OVER f AS sx, sum(y) OVER f AS sy,
      |    sum(x*x) OVER f AS sxx, sum(y*y) OVER f AS syy, sum(x*y) OVER f AS sxy
      |  FROM daily
      |  WINDOW f AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT day, x, y,
      |  CASE WHEN n >= 7 AND (n*sxx - sx*sx) * (n*syy - sy*sy) > 0 THEN round(
      |    (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * 1.0 * (n*syy - sy*sy)), 6)
      |  END AS corr7
      |FROM w ORDER BY day""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_resample_locf" -> (qResampleLocf(_, _)),
    "q_ses_forecast" -> (qSesForecast(_, _)),
    "q_rolling_corr" -> (qRollingCorr(_, _)))

  val oracles: Map[String, String] = Map(
    "q_resample_locf" -> qResampleLocfSql,
    "q_ses_forecast" -> qSesForecastSql,
    "q_rolling_corr" -> qRollingCorrSql)
}
