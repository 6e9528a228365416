package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.sources.TableIO

/**
 * MERGE-style change application with SCD2 (slowly-changing-dimension type 2)
 * versioning — the lakehouse upsert shape (Delta/Iceberg `MERGE INTO ... WHEN MATCHED`)
 * expressed as a pure Spark plan: a dimension snapshot absorbs a change batch; matched
 * keys emit a CLOSED historical row (valid_to = effective date) plus a fresh current
 * row, unmatched keys pass through still-current.
 *
 * Scale shape: ONE left join on the merge key (AQE picks broadcast vs SMJ by batch
 * size) and the matched branch fans out via a map-side `explode` of a 2-element struct
 * array — no second scan of either input, no union of three join branches (which would
 * read the snapshot three times at 100 TB). The change batch's latest-per-key pick is a
 * rank<=1 window, which graft's RankLimitRule rewrites onto the native TopKPerKey
 * partial/final operator — no full per-key sort materializes.
 */
object MergeOps {

  /**
   * Apply `changes` (key, effDate, newVal) to `snapshot` (key, curVal) as SCD2:
   * (key, bal, valid_from, valid_to, is_current). `openingDate` is the synthetic
   * valid_from of pre-existing snapshot rows.
   */
  def scd2Apply(snapshot: DataFrame, changes: DataFrame, key: String,
      effCol: String, valCol: String, curCol: String, openingDate: String): DataFrame = {
    val nullDate = lit(null).cast(DateType)
    val opening = to_date(lit(openingDate))
    val matched: Column = col(effCol).isNotNull
    snapshot.join(changes, snapshot(key) === changes(key), "left")
      .drop(changes(key))
      .select(col(key), explode(
        when(matched, array(
          struct(col(curCol).as("bal"), opening.as("valid_from"),
            col(effCol).as("valid_to"), lit(0).as("is_current")),
          struct(col(valCol).as("bal"), col(effCol).as("valid_from"),
            nullDate.as("valid_to"), lit(1).as("is_current"))))
          .otherwise(array(
            struct(col(curCol).as("bal"), opening.as("valid_from"),
              nullDate.as("valid_to"), lit(1).as("is_current"))))).as("v"))
      .select(col(key), col("v.bal"), col("v.valid_from"), col("v.valid_to"),
        col("v.is_current"))
  }

  /**
   * `q_merge_scd2`: each customer's latest order (by date, then orderkey) updates the
   * account-balance dimension; history rows close at the order date. The latest-pick
   * row_number()=1 filter is rewritten to native TopKPerKey by RankLimitRule
   * (MergeOpsSpec asserts the executed plan).
   */
  def qMergeScd2(spark: SparkSession, dir: String): DataFrame = {
    val o = TableIO.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val changes = o.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey").as("k"), col("o_orderdate").as("eff_date"),
        col("o_totalprice").as("new_bal"))
    val snapshot = TableIO.customer(spark, dir)
      .select(col("c_custkey").as("k"), col("c_acctbal"))
    scd2Apply(snapshot, changes, "k", "eff_date", "new_bal", "c_acctbal", "1992-01-01")
      .withColumnRenamed("k", "c_custkey")
      .orderBy(col("c_custkey"), col("is_current"))
  }

  val qMergeScd2Sql: String =
    """WITH changes AS (
      |  SELECT o_custkey, o_orderdate AS eff_date, o_totalprice AS new_bal
      |  FROM (SELECT o_custkey, o_orderdate, o_totalprice, o_orderkey,
      |               row_number() OVER (PARTITION BY o_custkey
      |                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |        FROM orders) t
      |  WHERE rn = 1
      |)
      |SELECT c_custkey, bal, valid_from, valid_to, is_current FROM (
      |  SELECT c.c_custkey, c.c_acctbal AS bal, DATE '1992-01-01' AS valid_from,
      |         ch.eff_date AS valid_to, 0 AS is_current
      |  FROM customer c JOIN changes ch ON c.c_custkey = ch.o_custkey
      |  UNION ALL
      |  SELECT c.c_custkey, ch.new_bal, ch.eff_date, NULL, 1
      |  FROM customer c JOIN changes ch ON c.c_custkey = ch.o_custkey
      |  UNION ALL
      |  SELECT c.c_custkey, c.c_acctbal, DATE '1992-01-01', NULL, 1
      |  FROM customer c LEFT JOIN changes ch ON c.c_custkey = ch.o_custkey
      |  WHERE ch.o_custkey IS NULL
      |) u
      |ORDER BY c_custkey, is_current""".stripMargin

  /**
   * Incremental aggregate maintenance (delta-refresh of a materialized `groupBy` view —
   * the Delta/Iceberg/Materialize "incremental MV" shape): a maintained state
   * (key, cnt, total) absorbs a CDC batch (key, op ∈ {+1,-1}, value) WITHOUT rescanning
   * the base table. At 100 TB this is the difference between touching the delta
   * (megabytes) and recomputing the view (the full corpus).
   *
   * Plan shape: union state with the op-signed delta, ONE map-side-combined groupBy on
   * the key; groups whose count reaches zero drop out of the view. Totals must be exact
   * types (decimal/long) so that incremental and recomputed states are bit-identical —
   * that equivalence is exactly what the q_incremental_agg oracle checks (the oracle is
   * the full recompute).
   *
   * Retractions must correspond to previously-applied inserts (standard CDC contract;
   * same as Flink's retract streams).
   */
  def incrementalAgg(state: DataFrame, delta: DataFrame, key: String,
      cntCol: String, totalCol: String, opCol: String, valCol: String): DataFrame = {
    val signed = delta.select(col(key),
      col(opCol).cast("long").as(cntCol),
      (col(opCol) * col(valCol)).as(totalCol))
    state.select(col(key), col(cntCol), col(totalCol))
      .unionByName(signed)
      .groupBy(col(key))
      .agg(sum(col(cntCol)).as(cntCol), sum(col(totalCol)).as(totalCol))
      .filter(col(cntCol) > 0)
  }

  /**
   * `q_incremental_agg`: sliding-window view maintenance over orders. The maintained
   * view is per-customer (order count, total spend) for orders before 2000; one delta
   * batch retracts everything before 1996 (TTL expiry) and inserts everything from 2000
   * on. The DuckDB oracle recomputes the surviving window [1996, ∞) from scratch —
   * hash-equality proves the incremental path IS the recompute (decimal-exact, so no
   * fp-order slack is needed).
   */
  def qIncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = TableIO.orders(spark, dir).select(col("o_custkey"),
      col("o_orderdate"), col("o_totalprice").cast("decimal(18,2)").as("v"))
    val state = o.filter(col("o_orderdate") < to_timestamp(lit("2000-01-01")))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"))
    val retract = o.filter(col("o_orderdate") < to_timestamp(lit("1996-01-01")))
      .select(col("o_custkey"), lit(-1).as("op"), col("v"))
    val insert = o.filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
      .select(col("o_custkey"), lit(1).as("op"), col("v"))
    incrementalAgg(state, retract.unionByName(insert),
        "o_custkey", "cnt", "total", "op", "v")
      .select(col("o_custkey"), col("cnt"),
        col("total").cast("decimal(18,2)").cast("string").as("total"))
      .orderBy(col("o_custkey"))
  }

  val qIncrementalAggSql: String =
    """SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS total
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_merge_scd2" -> (qMergeScd2(_, _)),
    "q_incremental_agg" -> (qIncrementalAgg(_, _)))

  val oracles: Map[String, String] = Map(
    "q_merge_scd2" -> qMergeScd2Sql,
    "q_incremental_agg" -> qIncrementalAggSql)
}
