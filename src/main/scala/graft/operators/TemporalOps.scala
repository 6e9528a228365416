package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Temporal / lakehouse-maintenance operators: point-in-time-correct dimension lookup
 * over an SCD2 history, and CDC snapshot differencing. Together with MergeOps (SCD2
 * apply + incremental aggregate maintenance) these cover the time-travel half of the
 * lakehouse surface the reference exercises through Spark's DataSource layer
 * (gazelle_plugin reads versioned parquet snapshots; the temporal semantics live in the
 * query layer, which is what these re-express Spark-first).
 *
 * Scale shapes:
 *   - point-in-time join = ONE equi-join on the dimension key followed by an interval
 *     filter; the SCD2 dimension carries a bounded number of versions per key, so
 *     fan-out is bounded and AQE is free to broadcast the dimension or skew-split the
 *     key — never a non-equi BNL over the fact table.
 *   - snapshot diff = ONE full-outer sort-merge join on the primary key; added/removed/
 *     changed classification is a map-side projection of the joined row. This is the
 *     CDC-extract plan Delta's CHANGE DATA FEED materializes; at 100 TB both sides
 *     shuffle once on the key and nothing else moves.
 */
object TemporalOps {

  /**
   * Point-in-time (temporal) join: enrich each fact row with the dimension version in
   * effect at the fact's timestamp — THE leakage-free feature-join for training-data
   * pipelines (a model trained on orders must see the balance the customer had at order
   * time, not today's).
   *
   * `dim` carries (key, payload..., validFrom, validTo) half-open intervals
   * [validFrom, validTo) with NULL validTo = still current. Equi-join on the key plus
   * the interval predicate; versions per key are bounded, so the join's output is at
   * most one row per fact row.
   */
  def pointInTime(facts: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      tsCol: String, validFrom: String, validTo: String): DataFrame =
    facts.join(dim,
      facts(factKey) === dim(dimKey) &&
        col(validFrom) <= col(tsCol) &&
        (col(validTo).isNull || col(tsCol) < col(validTo)),
      "inner")

  /**
   * `q_temporal_join`: rebuild the SCD2 balance dimension of `q_merge_scd2` (each
   * customer's latest order closes the opening balance) and look up every order
   * point-in-time: orders strictly before the customer's latest order see the opening
   * balance (is_current=0 interval), the latest order itself falls on its own
   * [eff_date, NULL) interval. Exercises both interval boundaries.
   */
  def qTemporalJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = TableIO.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val changes = o.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey").as("k"), col("o_orderdate").as("eff_date"),
        col("o_totalprice").as("new_bal"))
    val snapshot = TableIO.customer(spark, dir)
      .select(col("c_custkey").as("k"), col("c_acctbal"))
    val dim = MergeOps.scd2Apply(snapshot, changes, "k", "eff_date", "new_bal",
      "c_acctbal", "1992-01-01")
    val facts = o.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    pointInTime(facts, dim, "o_custkey", "k", "o_orderdate", "valid_from", "valid_to")
      .select(col("o_orderkey"), col("o_custkey"), col("bal"), col("is_current"))
      .orderBy(col("o_orderkey"))
  }

  val qTemporalJoinSql: String =
    """WITH changes AS (
      |  SELECT o_custkey AS k, o_orderdate AS eff_date, o_totalprice AS new_bal
      |  FROM (SELECT o_custkey, o_orderdate, o_totalprice,
      |               row_number() OVER (PARTITION BY o_custkey
      |                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |        FROM orders) t
      |  WHERE rn = 1
      |), dim AS (
      |  SELECT c.c_custkey AS k, c.c_acctbal AS bal,
      |         TIMESTAMP '1992-01-01' AS valid_from, ch.eff_date AS valid_to,
      |         0 AS is_current
      |  FROM customer c JOIN changes ch ON c.c_custkey = ch.k
      |  UNION ALL
      |  SELECT c.c_custkey, ch.new_bal, ch.eff_date, NULL, 1
      |  FROM customer c JOIN changes ch ON c.c_custkey = ch.k
      |)
      |SELECT o.o_orderkey, o.o_custkey, d.bal, d.is_current
      |FROM orders o JOIN dim d
      |  ON o.o_custkey = d.k
      | AND d.valid_from <= o.o_orderdate
      | AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
      |ORDER BY o.o_orderkey""".stripMargin

  /**
   * CDC snapshot diff: classify every primary key across two table snapshots as
   * added / removed / changed (unchanged rows are not emitted — this IS the change
   * feed). One full-outer equi-join on the key; comparison columns ride the join row.
   */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    val b = before.select((key +: compareCols).map(c => col(c).as("b_" + c)): _*)
    val a = after.select((key +: compareCols).map(c => col(c).as("a_" + c)): _*)
    val joined = b.join(a, col("b_" + key) === col("a_" + key), "full_outer")
    val changed = compareCols.map(c => col("b_" + c) =!= col("a_" + c))
      .reduce(_ || _)
    joined
      .withColumn("change", when(col("b_" + key).isNull, lit("added"))
        .when(col("a_" + key).isNull, lit("removed"))
        .when(changed, lit("changed")))
      .filter(col("change").isNotNull)
      .withColumn(key, coalesce(col("a_" + key), col("b_" + key)))
  }

  /**
   * `q_table_diff`: snapshot A = orders before 1998; snapshot B = orders in
   * [1996, 1999) with open-status ('O') prices uplifted 10%. Diff emits:
   * removed = [1995,1996) keys, added = [1998,1999) keys, changed = open orders in the
   * overlap. Raw double arithmetic (no rounding) — both engines multiply the identical
   * parquet doubles, so the products are bit-equal.
   */
  def qTableDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = TableIO.orders(spark, dir)
    val before = o.filter(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
    val after = o.filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1999-01-01")))
      .withColumn("o_totalprice",
        when(col("o_orderstatus") === "O", col("o_totalprice") * 1.1)
          .otherwise(col("o_totalprice")))
    snapshotDiff(before, after, "o_orderkey", Seq("o_totalprice", "o_orderstatus"))
      .select(col("o_orderkey"), col("change"),
        col("b_o_totalprice").as("old_price"), col("a_o_totalprice").as("new_price"))
      .orderBy(col("o_orderkey"))
  }

  val qTableDiffSql: String =
    """WITH before_s AS (
      |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      |  WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |), after_s AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.1
      |              ELSE o_totalprice END AS o_totalprice,
      |         o_orderstatus
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1999-01-01'
      |)
      |SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      |       CASE WHEN b.o_orderkey IS NULL THEN 'added'
      |            WHEN a.o_orderkey IS NULL THEN 'removed'
      |            WHEN b.o_totalprice <> a.o_totalprice
      |              OR b.o_orderstatus <> a.o_orderstatus THEN 'changed' END AS change,
      |       b.o_totalprice AS old_price, a.o_totalprice AS new_price
      |FROM before_s b FULL OUTER JOIN after_s a ON b.o_orderkey = a.o_orderkey
      |WHERE CASE WHEN b.o_orderkey IS NULL THEN 'added'
      |           WHEN a.o_orderkey IS NULL THEN 'removed'
      |           WHEN b.o_totalprice <> a.o_totalprice
      |             OR b.o_orderstatus <> a.o_orderstatus THEN 'changed' END IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin

  /**
   * `q_dq_report`: Deequ-style declarative data-quality audit — the admission gate a
   * training corpus runs before a snapshot is blessed. Three rule classes, each in its
   * minimal plan shape:
   *   - scalar predicate rules (null / range / accepted-set) fuse into ONE conditional
   *     aggregation pass over the fact table — adding a rule adds a column, not a scan;
   *   - key-uniqueness is one map-side-combined groupBy (count minus distinct count);
   *   - referential integrity is one left-anti join against the parent key set.
   * Output: (rule, violations, total) per rule, so downstream gates can threshold on
   * absolute counts or ratios.
   */
  def qDqReport(spark: SparkSession, dir: String): DataFrame = {
    val l = TableIO.lineitem(spark, dir)
    val o = TableIO.orders(spark, dir).select(col("o_orderkey"))
    val viol = (c: org.apache.spark.sql.Column) => sum(when(c, 1L).otherwise(0L))
    val total = count(lit(1))
    val scalarRules = l.agg(
      total.as("total"),
      viol(col("l_quantity").isNull).as("null_quantity"),
      viol(!(col("l_quantity") >= 1 && col("l_quantity") <= 50)).as("range_quantity"),
      viol(!(col("l_discount") >= 0.0 && col("l_discount") <= 0.2)).as("range_discount"),
      viol(!col("l_returnflag").isin("R", "A", "N")).as("set_returnflag"),
      viol(col("l_shipdate").isNull).as("null_shipdate"))
    val scalarLong = scalarRules.select(col("total"),
      expr("stack(5, 'null_quantity', null_quantity, 'range_quantity', range_quantity," +
        " 'range_discount', range_discount, 'set_returnflag', set_returnflag," +
        " 'null_shipdate', null_shipdate) as (rule, violations)"))
      .select(col("rule"), col("violations"), col("total"))
    val dupKeys = l.groupBy(col("l_orderkey"), col("l_linenumber")).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") - 1), lit(0L)).as("violations"),
        coalesce(sum(col("n")), lit(0L)).as("total"))
      .select(lit("unique_key").as("rule"), col("violations"), col("total"))
    val orphans = l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val riTotal = l.agg(count(lit(1)).as("total"))
    val ri = orphans.crossJoin(riTotal)
      .select(lit("fk_orderkey").as("rule"), col("violations"), col("total"))
    scalarLong.unionByName(dupKeys).unionByName(ri).orderBy(col("rule"))
  }

  val qDqReportSql: String =
    """WITH scalar AS (
      |  SELECT count(*) AS total,
      |         sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS null_quantity,
      |         sum(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 50) THEN 1 ELSE 0 END) AS range_quantity,
      |         sum(CASE WHEN NOT (l_discount >= 0.0 AND l_discount <= 0.2) THEN 1 ELSE 0 END) AS range_discount,
      |         sum(CASE WHEN l_returnflag NOT IN ('R','A','N') THEN 1 ELSE 0 END) AS set_returnflag,
      |         sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS null_shipdate
      |  FROM lineitem
      |), scalar_long AS (
      |  SELECT 'null_quantity' AS rule, null_quantity AS violations, total FROM scalar
      |  UNION ALL SELECT 'range_quantity', range_quantity, total FROM scalar
      |  UNION ALL SELECT 'range_discount', range_discount, total FROM scalar
      |  UNION ALL SELECT 'set_returnflag', set_returnflag, total FROM scalar
      |  UNION ALL SELECT 'null_shipdate', null_shipdate, total FROM scalar
      |), uniq AS (
      |  SELECT 'unique_key' AS rule,
      |         coalesce(sum(n - 1), 0) AS violations, coalesce(sum(n), 0) AS total
      |  FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber) g
      |), ri AS (
      |  SELECT 'fk_orderkey' AS rule,
      |         (SELECT count(*) FROM lineitem l
      |          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS violations,
      |         (SELECT count(*) FROM lineitem) AS total
      |)
      |SELECT CAST(rule AS VARCHAR) AS rule, CAST(violations AS BIGINT) AS violations,
      |       CAST(total AS BIGINT) AS total
      |FROM (SELECT * FROM scalar_long UNION ALL SELECT * FROM uniq UNION ALL SELECT * FROM ri) u
      |ORDER BY rule""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_temporal_join" -> (qTemporalJoin(_, _)),
    "q_table_diff" -> (qTableDiff(_, _)),
    "q_dq_report" -> (qDqReport(_, _)))

  val oracles: Map[String, String] = Map(
    "q_temporal_join" -> qTemporalJoinSql,
    "q_table_diff" -> qTableDiffSql,
    "q_dq_report" -> qDqReportSql)
}
