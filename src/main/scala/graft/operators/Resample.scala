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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_resample_locf" -> (qResampleLocf(_, _)))

  val oracles: Map[String, String] = Map(
    "q_resample_locf" -> qResampleLocfSql)
}
