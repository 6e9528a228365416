package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Time-series diagnostics over the `events` stream table — the autocorrelation /
 * seasonality / audience-accumulation reports a forecasting or capacity pipeline reads
 * before choosing a model. Complements [[Resample]] (SES forecast, rolling correlation)
 * and AnalyticsOps' CUSUM/KS drift: those score CHANGE, these characterize STRUCTURE.
 *
 * Reference scope: the reference engine (columnar TPC-H/DS operators,
 * native-sql-engine/core) has no time-series layer; this widens graft's pipeline
 * surface the way its window/agg kernels widen the relational one.
 *
 * Determinism discipline (hash-oracle-able vs DuckDB): every statistic is computed
 * from EXACT integer sums (daily counts, their products, day ordinals) aggregated
 * first, with the floating-point formula applied once per output row on identical
 * expression trees in both engines. No double is ever accumulated across rows.
 *
 * Scale: everything runs on the (event_type, day) AGGREGATE — one map-side-combined
 * groupBy of the fact table; windows are partitioned per event_type over
 * calendar-bounded frames (|days| rows per key, never raw events).
 */
object TimeSeriesOps {

  // ------------------------------------------------------------------- q_acf

  /**
   * Sample autocorrelation function at lags 1..`maxLag` of each event type's daily
   * count series: r_k = Σ_{t>k}(y_t − ȳ)(y_{t−k} − ȳ) / Σ_t(y_t − ȳ)², the textbook
   * estimator identifying AR structure / weekly cycles before any forecast model.
   *
   * Expanded into exact integer sums so no double crosses an aggregation:
   * numerator = Sxy − ȳ·Sx − ȳ·Sy + m·ȳ², denominator = Syy − n·ȳ², with
   * Sxy = Σ y_t·y_{t−k} (t>k), Sx/Sy the lagged/leading partial sums, m = n−k,
   * Syy = Σ y², ȳ = S/n — every S an exact BIGINT aggregate.
   */
  def acfDaily(daily: DataFrame, maxLag: Int): DataFrame = {
    // Densify each key's series over its min..max day range with cnt=0 first: lag(k)
    // is ROW-based, so a missing calendar day (zero-count days are absent from the
    // daily aggregate) would silently misalign the lag-k pairs and the statistic would
    // no longer be the lag-k autocorrelation IN TIME. The calendar frame is
    // |keys|x|days| rows — aggregate-grain, never event-grain.
    val spans = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val calendar = spans.select(col("event_type"),
      explode(expr("sequence(d0, d1)")).as("day"))
    val dense = calendar.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val lagged = dense.select(
      col("event_type") +: col("cnt") +:
        (1 to maxLag).map(k => lag(col("cnt"), k).over(w).as(s"l$k")): _*)
    val lagAggs = (1 to maxLag).flatMap { k =>
      Seq(
        sum(col("cnt") * col(s"l$k")).as(s"sxy$k"),
        sum(when(col(s"l$k").isNotNull, col("cnt"))).as(s"sx$k"),
        sum(col(s"l$k")).as(s"sy$k"),
        count(col(s"l$k")).as(s"m$k"))
    }
    val aggList = Seq(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
      sum(col("cnt") * col("cnt")).as("syy")) ++ lagAggs
    val moments = lagged.groupBy(col("event_type")).agg(aggList.head, aggList.tail: _*)
    val ybar = col("s").cast("double") / col("n")
    val denom = col("syy") - col("n") * ybar * ybar
    val perLag = (1 to maxLag).map { k =>
      struct(lit(k).as("lag"), round(
        (col(s"sxy$k") - ybar * col(s"sx$k") - ybar * col(s"sy$k")
          + col(s"m$k") * ybar * ybar) / denom, 6).as("acf6"))
    }
    moments
      .select(col("event_type"), col("n"), explode(array(perLag: _*)).as("a"))
      .select(col("event_type"), col("n"), col("a.lag"), col("a.acf6"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** `q_acf`: ACF lags 1..7 of each event type's daily event count. */
  def qAcf(spark: SparkSession, dir: String): DataFrame =
    acfDaily(TableIO.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")), 7)

  val qAcfSql: String = {
    val lagSel = (1 to 7).map(k =>
      s"""    lag(cnt, $k) OVER (PARTITION BY event_type ORDER BY day) AS l$k""")
      .mkString(",\n")
    val lagAgg = (1 to 7).map(k =>
      s"""    sum(cnt * l$k) AS sxy$k, sum(CASE WHEN l$k IS NOT NULL THEN cnt END) AS sx$k,
         |    sum(l$k) AS sy$k, count(l$k) AS m$k""".stripMargin).mkString(",\n")
    val rows = (1 to 7).map(k =>
      s"""  SELECT event_type, CAST(n AS BIGINT) AS n, $k AS lag,
         |    round((sxy$k - (CAST(s AS DOUBLE)/n) * sx$k - (CAST(s AS DOUBLE)/n) * sy$k
         |           + m$k * (CAST(s AS DOUBLE)/n) * (CAST(s AS DOUBLE)/n))
         |          / (syy - n * (CAST(s AS DOUBLE)/n) * (CAST(s AS DOUBLE)/n)), 6) AS acf6
         |  FROM moments""".stripMargin).mkString("\n  UNION ALL\n")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |spans AS (
       |  SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
       |bounds AS (SELECT min(day) AS g0, max(day) AS g1 FROM daily),
       |all_days AS (
       |  SELECT CAST(unnest(generate_series(CAST(g0 AS TIMESTAMP),
       |    CAST(g1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
       |calendar AS (
       |  SELECT s.event_type, a.day
       |  FROM spans s JOIN all_days a ON a.day BETWEEN s.d0 AND s.d1),
       |dense AS (
       |  SELECT c.event_type, c.day, coalesce(cnt, 0) AS cnt
       |  FROM calendar c LEFT JOIN daily USING (event_type, day)),
       |lagged AS (
       |  SELECT event_type, cnt,
       |$lagSel
       |  FROM dense),
       |moments AS (
       |  SELECT event_type, count(*) AS n, sum(cnt) AS s, sum(cnt*cnt) AS syy,
       |$lagAgg
       |  FROM lagged GROUP BY event_type)
       |SELECT * FROM (
       |$rows
       |) ORDER BY event_type, lag""".stripMargin
  }

  // ----------------------------------------------------------- q_seasonality

  /**
   * Day-of-week seasonal index per event type: mean daily volume on each weekday
   * relative to the overall mean daily volume — the multiplicative seasonal profile
   * a staffing/capacity forecast multiplies into its trend. idx = (sum_dow/n_dow) /
   * (sum_all/n_all), evaluated as one double expression over four exact integers.
   *
   * Weekday is computed portably as ((epoch_days % 7) + 4) % 7 (0=Sunday) from
   * datediff against 1970-01-01 — identical arithmetic in both engines, immune to
   * locale/week-start conventions.
   */
  def qSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val daily = TableIO.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow",
        ((datediff(col("day"), lit("1970-01-01")) % 7) + 4) % 7)
    val byDow = daily.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("cnt")).as("s_dow"), count(lit(1)).as("n_dow"))
    val overall = daily.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("s_all"), count(lit(1)).as("n_all"))
    byDow.join(overall, "event_type")
      .select(col("event_type"), col("dow").cast("int").as("dow"), col("n_dow"),
        round((col("s_dow") * col("n_all")).cast("double")
          / (col("n_dow") * col("s_all")), 6).as("idx6"))
      .orderBy(col("event_type"), col("dow"))
  }

  val qSeasonalitySql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt,
      |    ((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7) + 4) % 7 AS dow
      |  FROM events GROUP BY 1, 2, 4),
      |by_dow AS (
      |  SELECT event_type, dow, sum(cnt) AS s_dow, count(*) AS n_dow
      |  FROM daily GROUP BY 1, 2),
      |overall AS (
      |  SELECT event_type, sum(cnt) AS s_all, count(*) AS n_all
      |  FROM daily GROUP BY 1)
      |SELECT b.event_type, CAST(b.dow AS INT) AS dow, CAST(b.n_dow AS BIGINT) AS n_dow,
      |  round(CAST(b.s_dow * o.n_all AS DOUBLE) / (b.n_dow * o.s_all), 6) AS idx6
      |FROM by_dow b JOIN overall o ON b.event_type = o.event_type
      |ORDER BY b.event_type, dow""".stripMargin

  // ------------------------------------------------------ q_running_distinct

  /**
   * Cumulative distinct users per event type by day — the audience-accumulation
   * curve behind "reach" dashboards. SQL window functions cannot express
   * COUNT(DISTINCT) OVER, so this uses the standard first-occurrence decomposition:
   * flag each user's FIRST active day per type (row_number() = 1 over the per-user
   * day order), aggregate flags into daily first-timer counts, then a running sum —
   * three exact integer passes, each map-side combinable or calendar-bounded.
   */
  def qRunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val firstDay = TableIO.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(min(to_date(col("ts"))).as("day"))
    val daily = firstDay.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("new_users"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy(col("event_type"), col("day"))
  }

  val qRunningDistinctSql: String =
    """WITH first_day AS (
      |  SELECT event_type, user_id, min(CAST(ts AS DATE)) AS day
      |  FROM events GROUP BY 1, 2),
      |daily AS (
      |  SELECT event_type, day, count(*) AS new_users FROM first_day GROUP BY 1, 2)
      |SELECT event_type, day, new_users,
      |  CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day
      |                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      |FROM daily ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------- q_gap_islands

  /**
   * Gaps-and-islands: maximal runs of CONSECUTIVE active days per user, via the
   * classic ordinal-difference grouping key (epoch_day − row_number is constant
   * within a run). Output is the corpus-level streak-length histogram plus each
   * length's user reach — bounded by max streak length, not user count.
   *
   * Scale: distinct (user, day) is one map-side-combined aggregate; the run key is
   * a per-user window over that day-grain frame; the histogram is a second bounded
   * aggregate. All integers end-to-end — exact on any engine.
   */
  def qGapIslands(spark: SparkSession, dir: String): DataFrame = {
    val days = TableIO.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("dd", datediff(col("day"), lit("1970-01-01")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("dd"))
    val islands = days.withColumn("grp", col("dd") - row_number().over(w))
      .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("len"))
    islands.groupBy(col("len"))
      .agg(count(lit(1)).as("n_islands"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("len"))
  }

  val qGapIslandsSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |seq AS (
      |  SELECT user_id,
      |    date_diff('day', DATE '1970-01-01', day)
      |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM days),
      |islands AS (
      |  SELECT user_id, grp, count(*) AS len FROM seq GROUP BY 1, 2)
      |SELECT len, count(*) AS n_islands, count(DISTINCT user_id) AS n_users
      |FROM islands GROUP BY len ORDER BY len""".stripMargin

  // ---------------------------------------------------------------- q_wau

  /**
   * 7-day rolling active users (WAU) per day — the sliding-window DISTINCT that
   * neither SQL windows (no COUNT(DISTINCT) OVER) nor the cumulative first-occurrence
   * trick (29an) can express. Exact form: each active (user, day) CONTRIBUTES to the
   * 7 report days it keeps the user active for — a bounded 7× explode of the
   * day-grain distinct frame (calendar-bounded, never raw events), then one distinct
   * count per report day. At sketch scale the same frame feeds the HLL rollup
   * instead; this is the exact path.
   */
  def qWau(spark: SparkSession, dir: String): DataFrame = {
    val days = TableIO.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("dd", datediff(col("day"), lit("1970-01-01")))
    val maxDd = days.agg(max(col("dd")).as("max_dd"))
    days.select(col("user_id"), explode(sequence(col("dd"), col("dd") + 6)).as("rdd"))
      .crossJoin(broadcast(maxDd))
      .filter(col("rdd") <= col("max_dd"))
      .groupBy(col("rdd"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .select(date_add(lit("1970-01-01").cast("date"), col("rdd").cast("int")).as("day"),
        col("wau"))
      .orderBy(col("day"))
  }

  val qWauSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dd
      |  FROM events),
      |mx AS (SELECT max(dd) AS max_dd FROM days),
      |contrib AS (
      |  SELECT user_id, UNNEST(generate_series(dd, dd + 6)) AS rdd FROM days)
      |SELECT DATE '1970-01-01' + CAST(rdd AS INT) AS day,
      |  count(DISTINCT user_id) AS wau
      |FROM contrib, mx WHERE rdd <= mx.max_dd
      |GROUP BY rdd ORDER BY day""".stripMargin

  // ------------------------------------------------------ q_seasonal_anomaly

  /**
   * Seasonality-adjusted volume anomalies: each (event_type, day) scored against its
   * own WEEKDAY's mean volume — the deseasonalized residual that keeps a quiet Sunday
   * from masquerading as an outage and a busy Monday as a spike (a raw global
   * threshold does both). ratio = cnt·n_dow/s_dow evaluated over exact integers and
   * ROUNDED BEFORE thresholding (both engines threshold identical numbers); days
   * outside [0.82, 1.18]× their weekday norm are flagged (the band is a tuning
   * knob; this default flags the ~10% tails on the driver corpus).
   */
  def qSeasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = TableIO.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow",
        ((datediff(col("day"), lit("1970-01-01")) % 7) + 4) % 7)
    val norm = daily.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("cnt")).as("s_dow"), count(lit(1)).as("n_dow"))
    daily.join(norm, Seq("event_type", "dow"))
      .withColumn("ratio4",
        round((col("cnt") * col("n_dow")).cast("double") / col("s_dow"), 4))
      .filter(col("ratio4") >= 1.18 || col("ratio4") <= 0.82)
      .select(col("event_type"), col("day"), col("cnt"), col("ratio4"),
        when(col("ratio4") >= 1.18, "spike").otherwise("drop").as("direction"))
      .orderBy(col("event_type"), col("day"))
  }

  val qSeasonalAnomalySql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt,
      |    ((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7) + 4) % 7 AS dow
      |  FROM events GROUP BY 1, 2, 4),
      |norm AS (
      |  SELECT event_type, dow, sum(cnt) AS s_dow, count(*) AS n_dow
      |  FROM daily GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.event_type, d.day, d.cnt,
      |    round(CAST(d.cnt * n.n_dow AS DOUBLE) / n.s_dow, 4) AS ratio4
      |  FROM daily d JOIN norm n ON d.event_type = n.event_type AND d.dow = n.dow)
      |SELECT event_type, day, cnt, ratio4,
      |  CASE WHEN ratio4 >= 1.18 THEN 'spike' ELSE 'drop' END AS direction
      |FROM scored WHERE ratio4 >= 1.18 OR ratio4 <= 0.82
      |ORDER BY event_type, day""".stripMargin

  // ------------------------------------------------------ q_audience_overlap

  /**
   * Pairwise audience overlap across event types: |users(a) ∩ users(b)|, containment
   * of the smaller side, and Jaccard — the channel-overlap matrix a mix/attribution
   * analysis starts from (the exact form of what Theta sketches estimate at sketch
   * scale). Work is one distinct (type, user) aggregate, then a self-equi-join on
   * user_id — shuffle on user, never a cross join; per-type totals broadcast in.
   */
  def qAudienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val tu = TableIO.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
    val totals = tu.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = tu.select(col("event_type").as("a"), col("user_id"))
      .join(tu.select(col("event_type").as("b"), col("user_id")), "user_id")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(totals.select(col("event_type").as("a"), col("n").as("n_a"))), "a")
      .join(broadcast(totals.select(col("event_type").as("b"), col("n").as("n_b"))), "b")
      .select(col("a"), col("b"), col("n_a"), col("n_b"), col("n_both"),
        round(col("n_both").cast("double") / least(col("n_a"), col("n_b")), 6)
          .as("containment6"),
        round(col("n_both").cast("double")
          / (col("n_a") + col("n_b") - col("n_both")), 6).as("jaccard6"))
      .orderBy(col("a"), col("b"))
  }

  val qAudienceOverlapSql: String =
    """WITH tu AS (
      |  SELECT DISTINCT event_type, user_id FROM events),
      |totals AS (
      |  SELECT event_type, count(*) AS n FROM tu GROUP BY 1),
      |pairs AS (
      |  SELECT x.event_type AS a, y.event_type AS b, count(*) AS n_both
      |  FROM tu x JOIN tu y ON x.user_id = y.user_id AND x.event_type < y.event_type
      |  GROUP BY 1, 2)
      |SELECT p.a, p.b, ta.n AS n_a, tb.n AS n_b, p.n_both,
      |  round(CAST(p.n_both AS DOUBLE) / least(ta.n, tb.n), 6) AS containment6,
      |  round(CAST(p.n_both AS DOUBLE) / (ta.n + tb.n - p.n_both), 6) AS jaccard6
      |FROM pairs p
      |JOIN totals ta ON ta.event_type = p.a
      |JOIN totals tb ON tb.event_type = p.b
      |ORDER BY a, b""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_wau" -> (qWau(_, _)),
    "q_seasonal_anomaly" -> (qSeasonalAnomaly(_, _)),
    "q_acf" -> (qAcf(_, _)),
    "q_seasonality" -> (qSeasonality(_, _)),
    "q_running_distinct" -> (qRunningDistinct(_, _)),
    "q_gap_islands" -> (qGapIslands(_, _)),
    "q_audience_overlap" -> (qAudienceOverlap(_, _)))

  val oracles: Map[String, String] = Map(
    "q_wau" -> qWauSql,
    "q_seasonal_anomaly" -> qSeasonalAnomalySql,
    "q_acf" -> qAcfSql,
    "q_seasonality" -> qSeasonalitySql,
    "q_running_distinct" -> qRunningDistinctSql,
    "q_gap_islands" -> qGapIslandsSql,
    "q_audience_overlap" -> qAudienceOverlapSql)
}
