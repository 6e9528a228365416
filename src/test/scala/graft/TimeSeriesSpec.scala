package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesOps
import graft.pipeline.{Regression, TextAnalysis}

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf
  private def seqDf(rows: Seq[(String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("event_type", "d", "cnt").select(
      col("event_type"), to_date(col("d")).as("day"), col("cnt"))
  }

  // ------------------------------------------------------------------- q_acf

  test("acf lag-1 of a constructed series matches the hand-computed estimator") {
    // y = 1..6 daily: ȳ=3.5, denom=17.5; lag1 num=8.75, lag2 num=1.0 (hand-expanded)
    val daily = seqDf((1 to 6).map(i => ("a", f"2024-01-$i%02d", i.toLong)))
    val got = TimeSeriesOps.acfDaily(daily, 2).collect()
      .map(r => (r.getInt(2), r.getDouble(3))).toMap
    assert(math.abs(got(1) - 0.5) < 1e-9)      // 8.75 / 17.5
    assert(math.abs(got(2) - (1.0 / 17.5)) < 1e-6)
  }

  test("acf of a period-2 alternating series is negative at odd lags, positive at even") {
    val daily = seqDf((1 to 10).map(i => ("a", f"2024-01-$i%02d", if (i % 2 == 0) 10L else 2L)))
    val got = TimeSeriesOps.acfDaily(daily, 2).collect()
      .map(r => (r.getInt(2), r.getDouble(3))).toMap
    assert(got(1) < -0.5 && got(2) > 0.5)
  }

  // ----------------------------------------------------------- q_seasonality

  test("seasonality indices are volume-weighted around 1 and cover observed dows") {
    val rows = TimeSeriesOps.qSeasonality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).values.foreach { g =>
      // Σ n_dow·idx = n_all·(Σ s_dow)/s_all · ... exact identity: Σ s_dow*n_all/s_all = n_all
      val nAll = g.map(_.getLong(2)).sum.toDouble
      val weighted = g.map(r => r.getLong(2) * r.getDouble(3)).sum
      assert(math.abs(weighted - nAll) < 1e-3)
      assert(g.map(_.getInt(1)).forall(d => d >= 0 && d <= 6))
    }
  }

  // ------------------------------------------------------ q_running_distinct

  test("running distinct is monotone and ends at the true per-type distinct count") {
    val rows = TimeSeriesOps.qRunningDistinct(spark, sf).collect()
    val truth = graft.sources.TableIO.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (et, g) =>
      val cums = g.sortBy(_.getDate(1).toString).map(_.getLong(3))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
      assert(cums.last == truth(et))
    }
  }

  // ---------------------------------------------------------- q_gap_islands

  test("gap islands: total island-days equals the distinct (user, day) count") {
    val hist = TimeSeriesOps.qGapIslands(spark, sf).collect()
    val dayCount = graft.sources.TableIO.events(spark, sf)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(hist.map(r => r.getLong(0) * r.getLong(1)).sum == dayCount)
    assert(hist.map(_.getLong(0)).forall(_ >= 1))
  }

  // ------------------------------------------------------ q_audience_overlap

  test("audience overlap bounds: n_both <= min(n_a, n_b), jaccard <= containment <= 1") {
    val rows = TimeSeriesOps.qAudienceOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, both) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (cont, jac) = (r.getDouble(5), r.getDouble(6))
      assert(both <= math.min(na, nb))
      assert(jac <= cont + 1e-9 && cont <= 1.0 + 1e-9 && jac >= 0.0)
    }
  }

  // ------------------------------------------------------------ q_ridge

  test("ridge shrinks slope magnitudes vs OLS and r2 does not exceed OLS r2") {
    val ols = Regression.qLinreg(spark, sf).head()
    val ridge = Regression.qRidge(spark, sf).head()
    assert(math.abs(ridge.getDouble(2)) <= math.abs(ols.getDouble(2)) + 1e-6 ||
      math.abs(ridge.getDouble(3)) <= math.abs(ols.getDouble(3)) + 1e-6)
    assert(ridge.getDouble(4) <= ols.getDouble(4) + 1e-9)
  }

  test("ridge with lambda=0 equals OLS exactly") {
    import spark.implicits._
    val pts = Seq((1L, 2L, 10L), (2L, 1L, 14L), (3L, 5L, 30L), (4L, 2L, 33L),
      (5L, 7L, 52L), (6L, 1L, 49L)).toDF("x1", "x2", "y")
    val a = Regression.ols2(pts).head().toSeq
    val b = Regression.ridge2(pts, 0L).head().toSeq
    assert(a == b)
  }

  // ------------------------------------------------------------ q_pca_power

  test("pca power iteration returns a unit vector aligned with the dominant axis") {
    val r = Regression.qPcaPower(spark, sf).head()
    val (v1, v2, v3) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(math.abs(v1 * v1 + v2 * v2 + v3 * v3 - 1.0) < 1e-6)
    // price_cents has variance orders of magnitude above qty/discount → PC1 ≈ e3
    assert(v3 > 0.999)
    assert(r.getDouble(4) > 0) // eigenvalue positive
  }

  test("pca eigenpair satisfies C·v ≈ λ·v on a constructed anisotropic cloud") {
    import spark.implicits._
    // points stretched along (1,1,0): covariance eigvec should align with it
    val pts = (1 to 400).map { i =>
      val t = i - 200L
      (t + (i % 7) - 3L, t + (i % 5) - 2L, (i % 11).toLong)
    }.toDF("x1", "x2", "x3")
    val r = Regression.pcaPower3(pts).head()
    val (v1, v2, v3) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(math.abs(math.abs(v1) - math.abs(v2)) < 0.01) // symmetric in x1,x2
    assert(math.abs(v3) < 0.05)
    assert(math.abs(v1 * v1 + v2 * v2 + v3 * v3 - 1.0) < 1e-6)
  }

  // ------------------------------------------------------------- text_llr

  test("llr ranks a frequent exclusive pair above an equally frequent promiscuous one") {
    import spark.implicits._
    // "aa bb" always together (8x); "cc" pairs with many different partners (8x total)
    val docs = (Seq.fill(8)("aa bb") ++
      (1 to 8).map(i => s"cc w$i") ++ Seq.fill(30)("xx yy zz"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextAnalysis.llrCollocations(docs, 10, 2).collect()
    val order = out.map(r => (r.getString(0), r.getString(1))).toSeq
    val aabb = order.indexOf(("aa", "bb"))
    assert(aabb >= 0)
    order.zipWithIndex.filter(_._1._1 == "cc").foreach { case (_, i) =>
      assert(aabb < i) // exclusive pair outranks every promiscuous cc-pair
    }
  }

  test("llr is non-negative and zero-ish for independent pairs") {
    import spark.implicits._
    val docs = (1 to 50).map(i => (i.toLong, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.llrCollocations(docs, 5, 2).collect()
    assert(out.forall(_.getDouble(3) >= -1e-9))
  }

  // ----------------------------------------------------------------- q_wau

  test("wau: every day's 7-day active count >= that day's daily active count") {
    val wau = TimeSeriesOps.qWau(spark, sf).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val dau = graft.sources.TableIO.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(dau.nonEmpty)
    dau.foreach { case (d, n) => assert(wau(d) >= n, s"day $d wau ${wau(d)} < dau $n") }
    // and wau can never exceed the global distinct population
    val pop = graft.sources.TableIO.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(wau.values.forall(_ <= pop))
  }

  // ------------------------------------------------------------ q_skew_report

  test("skew report: totals match table sizes and the hot key share is consistent") {
    val rows = graft.pipeline.Profiling.qSkewReport(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("l_orderkey", "l_partkey", "l_suppkey", "o_custkey"))
    val nLi = graft.sources.TableIO.lineitem(spark, sf).count()
    rows.filter(_.getString(0).startsWith("l_")).foreach { r =>
      assert(r.getLong(1) == nLi)
      assert(r.getLong(3) >= r.getLong(1) / r.getLong(2)) // max >= avg group size
      assert(math.abs(r.getDouble(4) - r.getLong(3).toDouble / r.getLong(1)) < 1e-6)
    }
  }

  // ----------------------------------------------------- q_seasonal_anomaly

  test("seasonal anomaly flags exactly the rounded-ratio tails, labeled by direction") {
    val daily = graft.sources.TableIO.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val flagged = TimeSeriesOps.qSeasonalAnomaly(spark, sf).collect()
    flagged.foreach { r =>
      val ratio = r.getDouble(3)
      assert(ratio >= 1.18 || ratio <= 0.82)
      assert(r.getString(4) == (if (ratio >= 1.18) "spike" else "drop"))
    }
    assert(flagged.length < daily.count(), "band must not flag everything")
  }

  // ---------------------------------------------------------- q_attribution

  test("attribution: attributed <= ever_clicked <= purchases, rate consistent") {
    val rows = graft.operators.EventsQueries.qAttribution(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, attr, ever) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(attr <= ever && ever <= n)
      assert(math.abs(r.getDouble(4) - math.round(attr.toDouble / n * 1e4) / 1e4) < 1e-9)
    }
  }

  // ----------------------------------------------------------------- q_ohlc

  test("ohlc invariants: low <= open/close <= high, ticks sum to event count") {
    val rows = graft.operators.EventsQueries.qOhlc(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(l <= h && o >= l - 1e-9 && o <= h + 1e-9 && c >= l - 1e-9 && c <= h + 1e-9)
    }
    assert(rows.map(_.getLong(6)).sum ==
      graft.sources.TableIO.events(spark, sf).count())
  }

  // --------------------------------------------------------- q_recursive_cte

  test("recursive cte covers all 25 nations with binary-tree depths and paths") {
    val rows = graft.operators.RelationalOps.qRecursiveCte(spark, sf).collect()
    assert(rows.length == 25)
    val depth = rows.map(r => r.getAs[Number](0).longValue -> r.getInt(2)).toMap
    (1L until 25L).foreach { k =>
      assert(depth(k) == depth((k - 1) / 2) + 1) // child is one deeper than parent
    }
    assert(depth(0L) == 0)
    rows.foreach(r => assert(r.getString(3).split(" > ").length == r.getInt(2) + 1))
  }
}
