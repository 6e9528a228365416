package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableIO

/**
 * Decimal aggregation semantics. The driver oracle for q_decimal_avg compares an exact
 * integer micro-unit quotient (engine-neutral); this spec pins Spark's NATIVE decimal
 * average — exact decimal arithmetic, result DECIMAL(p+4, s+4) — to that same quotient,
 * so the restored decimal-avg line is proven on the Spark side too, not just sidestepped.
 */
class DecimalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("native avg over DECIMAL(18,2) equals the exact micro-unit quotient (within 1 ulp)") {
    val rows = TableIO.orders(spark, sf)
      .withColumn("price_dec", col("o_totalprice").cast("decimal(18,2)"))
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .groupBy(col("o_orderstatus"))
      .agg(
        avg(col("price_dec")).as("avg_dec"), // DECIMAL(22,6), exact decimal arithmetic
        expr("(sum(cents) * 10000) div count(*)").as("avg_micro"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val asMicro = r.getDecimal(1).movePointRight(6).longValueExact()
      val exact = r.getLong(2)
      // avg_dec is HALF_UP-rounded at scale 6; the quotient truncates — at most 1 apart
      assert(math.abs(asMicro - exact) <= 1L,
        s"status ${r.getString(0)}: native $asMicro vs exact $exact")
    }
  }

  test("decimal sum/min/max over DECIMAL(18,2) are exact (no double drift)") {
    val df = TableIO.orders(spark, sf)
      .withColumn("price_dec", col("o_totalprice").cast("decimal(18,2)"))
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    val rows = df.groupBy(col("o_orderstatus"))
      .agg(sum(col("price_dec")).as("sum_dec"), sum(col("cents")).as("sum_cents"))
      .collect()
    rows.foreach { r =>
      assert(r.getDecimal(1).movePointRight(2).longValueExact() == r.getLong(2))
    }
  }
}
