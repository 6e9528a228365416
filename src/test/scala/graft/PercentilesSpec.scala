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

  test("equidepthBins balances counts, orders buckets by value, keeps every row") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 1..1000 shuffled deterministically across two groups; distinct values make the
    // equi-depth property exact
    val rows = (1 to 1000).map(i => (if (i % 2 == 0) "a" else "b", (i * 37 % 1000).toDouble))
    val df = rows.toDF("g", "v")
    val binned = Percentiles.equidepthBins(df, Seq("g"), "v", nBins = 4)
    val out = binned.collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    assert(out.length == 1000, "every row keeps exactly one bucket")
    val byBucket = out.groupBy(b => (b._1, b._3)).view.mapValues(_.length).toMap
    assert(byBucket.keySet == (for (g <- Set("a", "b"); b <- 1 to 4) yield (g, b)))
    byBucket.values.foreach(n => assert(math.abs(n - 125) <= 1, s"unbalanced bucket: $n"))
    // monotone: the max of bucket k never exceeds the min of bucket k+1 within a group
    for (g <- Seq("a", "b"); k <- 1 to 3) {
      val mx = out.filter(r => r._1 == g && r._3 == k).map(_._2).max
      val mn = out.filter(r => r._1 == g && r._3 == k + 1).map(_._2).min
      assert(mx <= mn, s"$g bucket $k max $mx > bucket ${k + 1} min $mn")
    }
    // boundary ties go to the LOWER bucket (strict > rule)
    val ties = Seq(("t", 1.0), ("t", 2.0), ("t", 2.0), ("t", 3.0)).toDF("g", "v")
    val tb = Percentiles.equidepthBins(ties, Seq("g"), "v", nBins = 2)
      .where(col("v") === 2.0).collect().map(_.getInt(2)).toSet
    assert(tb == Set(1), s"median-tied values must share the lower bucket, got $tb")
  }
}
