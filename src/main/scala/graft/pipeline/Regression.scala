package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Closed-form multiple linear regression (OLS via normal equations) as ONE
 * aggregation pass — the distributed-friendly way to fit y = a0 + a1*x1 + a2*x2:
 * accumulate the nine cross-moments with a single map-side-combined global agg, then
 * solve the 3x3 system by Cramer's rule in the final one-row projection. No gradient
 * loop, no driver-side matrix library, no second pass for R^2 (computed from the
 * same moments via SSE = Syy - a0*Sy - a1*Sx1y - a2*Sx2y).
 *
 * Spark's own `regr_slope`/`regr_intercept` stop at ONE regressor; the reference has
 * no regression at all. This is the standard scale-out form (one reduce of 9 numbers
 * regardless of data size — the same shape MADlib/BigQuery ML use for linear models).
 *
 * Determinism: inputs are quantized to their natural exact-integer units (quantity,
 * discount in percent, price in cents), so every moment is an EXACT, order-independent
 * integer sum (Syy in decimal(38) to dodge bigint overflow at 100 TB row counts). The
 * double-precision Cramer solve then evaluates an identical expression tree on
 * identical inputs in any engine — bit-stable, hash-oracle-able.
 */
object Regression {

  /** OLS of price_cents on (quantity, discount_pct) over lineitem, plus R^2. */
  def qLinreg(spark: SparkSession, dir: String): DataFrame =
    ols2(TableIO.lineitem(spark, dir).select(
      round(col("l_quantity"), 0).cast("long").as("x1"),
      round(col("l_discount") * 100, 0).cast("long").as("x2"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("y")))

  /** General entry: fit y = a0 + a1*x1 + a2*x2 on any integer-quantized
    * (x1, x2, y) frame; returns one row (n, a0, a1, a2, r2). */
  def ols2(pts: DataFrame): DataFrame = {
    val yd = col("y").cast("decimal(20,0)")
    val m = pts.agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"), sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("sx11"), sum(col("x1") * col("x2")).as("sx12"),
      sum(col("x2") * col("x2")).as("sx22"),
      sum(col("x1") * col("y")).as("sx1y"), sum(col("x2") * col("y")).as("sx2y"),
      sum(yd * yd).as("syy"))
    // exact integer moments -> double; identical expression tree as the oracle SQL
    val d = m.select(col("n"),
      col("n").cast("double").as("dn"), col("sx1").cast("double").as("a12"),
      col("sx2").cast("double").as("a13"), col("sx11").cast("double").as("a22"),
      col("sx12").cast("double").as("a23"), col("sx22").cast("double").as("a33"),
      col("sy").cast("double").as("b1"), col("sx1y").cast("double").as("b2"),
      col("sx2y").cast("double").as("b3"), col("syy").cast("double").as("syy"))
    def det(r1: (Column, Column, Column), r2: (Column, Column, Column),
        r3: (Column, Column, Column)): Column =
      r1._1 * (r2._2 * r3._3 - r2._3 * r3._2) -
        r1._2 * (r2._1 * r3._3 - r2._3 * r3._1) +
        r1._3 * (r2._1 * r3._2 - r2._2 * r3._1)
    val (dn, a12, a13) = (col("dn"), col("a12"), col("a13"))
    val (a22, a23, a33) = (col("a22"), col("a23"), col("a33"))
    val (b1, b2, b3) = (col("b1"), col("b2"), col("b3"))
    // Cramer on the symmetric normal matrix [[n,sx1,sx2],[sx1,sx11,sx12],[sx2,sx12,sx22]]
    val c = d.select(col("n"), col("syy"), b1.as("sy"), b2.as("sx1y"), b3.as("sx2y"), dn,
      det((dn, a12, a13), (a12, a22, a23), (a13, a23, a33)).as("det"),
      det((b1, a12, a13), (b2, a22, a23), (b3, a23, a33)).as("det0"),
      det((dn, b1, a13), (a12, b2, a23), (a13, b3, a33)).as("det1"),
      det((dn, a12, b1), (a12, a22, b2), (a13, a23, b3)).as("det2"))
    c.select(col("n"),
      round(col("det0") / col("det"), 6).as("a0"),
      round(col("det1") / col("det"), 6).as("a1"),
      round(col("det2") / col("det"), 6).as("a2"),
      round(lit(1.0) - (col("syy") - (col("det0") / col("det")) * col("sy")
          - (col("det1") / col("det")) * col("sx1y")
          - (col("det2") / col("det")) * col("sx2y"))
        / (col("syy") - col("sy") * col("sy") / col("dn")), 6).as("r2"))
  }

  val qLinregSql: String =
    """WITH m AS (
      |  SELECT count(*) AS n,
      |    sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
      |    sum(x1*x1) AS sx11, sum(x1*x2) AS sx12, sum(x2*x2) AS sx22,
      |    sum(x1*y) AS sx1y, sum(x2*y) AS sx2y,
      |    sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS syy
      |  FROM (SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
      |               CAST(round(l_discount*100) AS BIGINT) AS x2,
      |               CAST(round(l_extendedprice*100) AS BIGINT) AS y FROM lineitem)),
      |d AS (
      |  SELECT n,
      |    CAST(n AS DOUBLE) AS dn, CAST(sx1 AS DOUBLE) AS a12, CAST(sx2 AS DOUBLE) AS a13,
      |    CAST(sx11 AS DOUBLE) AS a22, CAST(sx12 AS DOUBLE) AS a23,
      |    CAST(sx22 AS DOUBLE) AS a33, CAST(sy AS DOUBLE) AS b1,
      |    CAST(sx1y AS DOUBLE) AS b2, CAST(sx2y AS DOUBLE) AS b3,
      |    CAST(syy AS DOUBLE) AS syy FROM m),
      |c AS (
      |  SELECT n, syy, b1 AS sy, b2 AS sx1y, b3 AS sx2y, dn,
      |    dn*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13) + a13*(a12*a23 - a22*a13) AS det,
      |    b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3) + a13*(b2*a23 - a22*b3) AS det0,
      |    dn*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13) + a13*(a12*b3 - b2*a13) AS det1,
      |    dn*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13) + b1*(a12*a23 - a22*a13) AS det2
      |  FROM d)
      |SELECT n, round(det0/det, 6) AS a0, round(det1/det, 6) AS a1,
      |  round(det2/det, 6) AS a2,
      |  round(1 - (syy - (det0/det)*sy - (det1/det)*sx1y - (det2/det)*sx2y)
      |          / (syy - sy*sy/dn), 6) AS r2
      |FROM c""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_linreg" -> qLinreg _)

  val oracles: Map[String, String] = Map(
    "q_linreg" -> qLinregSql)
}
