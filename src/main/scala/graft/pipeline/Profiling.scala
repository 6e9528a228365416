package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.sources.TableIO

/**
 * Table profiling (the ANALYZE/data-quality pass every ingestion pipeline runs first):
 * per-column row/null counts, exact distinct counts, numeric and lexicographic extrema —
 * computed in ONE scan as a single wide aggregate row, then unpivoted to one row per
 * column with `stack`. No per-column re-scan: profiling a 400-column table costs one
 * pass either way, which is the difference between minutes and days at 100 TB.
 *
 * Exact `count(DISTINCT)` across many columns expands via Catalyst's Expand operator
 * (one duplicate of the input per distinct aggregate). That is the exact-answer shape;
 * the at-scale default swaps in `approx_count_distinct` (HLL++, single pass, no Expand) —
 * `profile(df, cols, exact = false)` — which the driver can't hash-match, so the
 * registered query uses the exact form and ProfilingSpec bounds the approx error.
 */
object Profiling {

  /** One row per column: (column, n_rows, n_nonnull, ndv, min_num, max_num, min_str, max_str). */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "cols must not be empty")
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      val ndv = if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        ndv.as(s"${c}__ndv"),
        (if (isNum) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"${c}__min_num"),
        (if (isNum) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"${c}__max_num"),
        (if (isNum) lit(null).cast("string") else min(col(c)).cast("string"))
          .as(s"${c}__min_str"),
        (if (isNum) lit(null).cast("string") else max(col(c)).cast("string"))
          .as(s"${c}__max_str"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // column names are spliced into SQL text: escape string-literal quotes and backticks
    // (profile is public API over arbitrary frames — "it's" or `a`b` must not break parse)
    def sqlLit(c: String): String = "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
    def id(c: String): String = "`" + c.replace("`", "``") + "`"
    val stacked = cols.map { c =>
      s"${sqlLit(c)}, ${id(c + "__nonnull")}, ${id(c + "__ndv")}, ${id(c + "__min_num")}, " +
        s"${id(c + "__max_num")}, ${id(c + "__min_str")}, ${id(c + "__max_str")}"
    }.mkString(", ")
    wide.selectExpr("n_rows",
        s"stack(${cols.size}, $stacked) AS (column, n_nonnull, ndv, min_num, max_num, min_str, max_str)")
      .select(col("column"), col("n_rows"), col("n_nonnull"), col("ndv"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }

  /** Driver-contract query: profile lineitem's key/measure/flag columns, including a
    * manufactured nullable column so null accounting is exercised. */
  def profileQuery(spark: SparkSession, dir: String): DataFrame =
    profile(
      TableIO.lineitem(spark, dir)
        .withColumn("flag_nullable", nullif(col("l_returnflag"), lit("N"))),
      Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "flag_nullable"))
      .orderBy(col("column"))

  val profileSql: String =
    """WITH src AS (
      |  SELECT *, nullif(l_returnflag, 'N') AS flag_nullable FROM lineitem
      |)
      |SELECT 'l_orderkey' AS "column", count(*) AS n_rows, count(l_orderkey) AS n_nonnull,
      |  count(DISTINCT l_orderkey) AS ndv, CAST(min(l_orderkey) AS DOUBLE) AS min_num,
      |  CAST(max(l_orderkey) AS DOUBLE) AS max_num,
      |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM src
      |UNION ALL
      |SELECT 'l_quantity', count(*), count(l_quantity), count(DISTINCT l_quantity),
      |  CAST(min(l_quantity) AS DOUBLE), CAST(max(l_quantity) AS DOUBLE), NULL, NULL FROM src
      |UNION ALL
      |SELECT 'l_extendedprice', count(*), count(l_extendedprice), count(DISTINCT l_extendedprice),
      |  CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE), NULL, NULL FROM src
      |UNION ALL
      |SELECT 'l_returnflag', count(*), count(l_returnflag), count(DISTINCT l_returnflag),
      |  NULL, NULL, min(l_returnflag), max(l_returnflag) FROM src
      |UNION ALL
      |SELECT 'flag_nullable', count(*), count(flag_nullable), count(DISTINCT flag_nullable),
      |  NULL, NULL, min(flag_nullable), max(flag_nullable) FROM src
      |ORDER BY "column"""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile" -> profileQuery _)

  val oracles: Map[String, String] = Map(
    "q_profile" -> profileSql)
}
