package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Percentiles
import graft.sources.TableIO

/** Sort-based exact percentiles must equal Spark's buffering `percentile` aggregate —
  * same interpolation, computed without per-group value arrays. */
class PercentilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("known interpolation on a constructed frame, including nulls and integral ranks") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)), ("a", Some(4.0)),
      ("a", None), // nulls ignored, like percentile()
      ("b", Some(10.0))
    ).toDF("k", "v")
    val got = Percentiles.exactBySort(df, Seq("k"), "v", Seq(0.5, 0.25, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // group a: n=4, q=0.5 -> rank 1.5 -> 2.0 + 0.5*(3.0-2.0) = 2.5
    assert(got(("a", 0.5)) == 2.5)
    // q=0.25 -> rank 0.75 -> 1.0 + 0.75*1.0 = 1.75
    assert(got(("a", 0.25)) == 1.75)
    // q=1.0 -> integral rank 3 -> exactly 4.0 (lo == hi path)
    assert(got(("a", 1.0)) == 4.0)
    // single-element group: every quantile is that element
    assert(got(("b", 0.5)) == 10.0 && got(("b", 1.0)) == 10.0)
  }

  test("null-keyed groups are kept, like percentile() under groupBy") {
    import spark.implicits._
    val df = Seq((Some("a"), 1.0), (None, 2.0), (None, 6.0), (Some("a"), 3.0))
      .toDF("k", "v")
    val got = Percentiles.exactBySort(df, Seq("k"), "v", Seq(0.5))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(2)).toMap
    assert(got == Map(Some("a") -> 2.0, None -> 4.0), s"got $got")
  }

  test("equals the buffering percentile() aggregate on real data to 1e-9") {
    val li = TableIO.lineitem(spark, sf)
    val viaAgg = li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        expr("percentile(l_extendedprice, 0.99)").as("p99"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val qty = Percentiles.exactBySort(li, Seq("l_returnflag"), "l_quantity", Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val price = Percentiles.exactBySort(li, Seq("l_returnflag"), "l_extendedprice", Seq(0.99))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    viaAgg.foreach { case (flag, (p50, p90, p99)) =>
      assert(math.abs(qty((flag, 0.5)) - p50) < 1e-9, s"$flag p50")
      assert(math.abs(qty((flag, 0.9)) - p90) < 1e-9, s"$flag p90")
      assert(math.abs(price((flag, 0.99)) - p99) < 1e-9, s"$flag p99")
    }
  }

  test("plan has no per-group buffering aggregate: the sort does the work") {
    val li = TableIO.lineitem(spark, sf)
    val plan = Percentiles.exactBySort(li, Seq("l_returnflag"), "l_quantity", Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"), s"must not fall back to the buffering aggregate:\n$plan")
  }
}
