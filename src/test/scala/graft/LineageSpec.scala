package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Lineage
import graft.sources.TableIO

class LineageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def rows(df: org.apache.spark.sql.DataFrame) =
    Lineage.lineage(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("aggregate over a join traces each output to its true source columns") {
    val q = TableIO.lineitem(spark, sf)
      .join(TableIO.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity") * (lit(1.0) - col("l_discount"))).as("net_qty"))
    val got = rows(q)
    assert(got.contains(("o_orderstatus", "orders.parquet", "o_orderstatus")))
    assert(got.contains(("net_qty", "lineitem.parquet", "l_quantity")))
    assert(got.contains(("net_qty", "lineitem.parquet", "l_discount")))
    // the join key must NOT leak into the aggregate's lineage
    assert(!got.exists { case (o, _, c) => o == "net_qty" && c == "l_orderkey" })
  }

  test("renames and derived columns chain through multiple projections") {
    val q = TableIO.customer(spark, sf)
      .select(col("c_acctbal").as("bal"), col("c_nationkey"))
      .select((col("bal") * 2).as("bal2"), col("c_nationkey").as("nk"))
      .filter(col("bal2") > 0)
    val got = rows(q)
    assert(got.contains(("bal2", "customer.parquet", "c_acctbal")))
    assert(got.contains(("nk", "customer.parquet", "c_nationkey")))
    assert(!got.exists(_._1 == "bal"))
  }

  test("window functions and multi-source expressions fan in all contributors") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_orderkey"))
    val q = TableIO.lineitem(spark, sf)
      .withColumn("rnk", row_number().over(w))
      .select(col("rnk"), (col("l_quantity") + col("l_tax")).as("qt"))
    val got = rows(q)
    assert(got.contains(("qt", "lineitem.parquet", "l_quantity")))
    assert(got.contains(("qt", "lineitem.parquet", "l_tax")))
    assert(got.contains(("rnk", "lineitem.parquet", "l_suppkey")))
    assert(got.contains(("rnk", "lineitem.parquet", "l_orderkey")))
  }

  test("pure literals produce no source rows") {
    val q = TableIO.nation(spark, sf).select(lit(42).as("answer"), col("n_name"))
    val got = rows(q)
    assert(!got.exists(_._1 == "answer"))
    assert(got.contains(("n_name", "nation.parquet", "n_name")))
  }
}
