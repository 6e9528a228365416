package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.AnalyticsOps
import graft.pipeline.FeatureStats

class DriftBasketSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("q_ks_drift matches an in-memory two-sample KS computation") {
    val got = FeatureStats.qKsDrift(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val lens = graft.sources.TableIO.documents(spark, sf)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySource = lens.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val values = lens.map(_._2).distinct.sorted
    bySource.foreach { case (src, own) =>
      val rest = lens.filter(_._1 != src).map(_._2)
      val d = values.map { v =>
        val fs = own.count(_ <= v).toDouble / own.length
        val fr = rest.count(_ <= v).toDouble / rest.length
        math.abs(fs - fr)
      }.max
      val (nDocs, ks) = got(src)
      assert(nDocs == own.length.toLong, s"$src n_docs")
      assert(math.abs(ks - d) < 1e-6, s"$src ks=$ks want=$d")
    }
    // KS is a distance: all in [0, 1]
    assert(got.values.forall { case (_, ks) => ks >= 0.0 && ks <= 1.0 })
  }

  test("q_basket_lift reports mutually-supported pairs with exact lift arithmetic") {
    val rows = AnalyticsOps.qBasketLift(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val baskets = graft.sources.TableIO.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nBaskets = baskets.map(_._1).distinct.length.toLong
    val supp = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val (x, y, cxy, lift) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(x < y, "canonical pair order")
      assert(cxy >= 3, "min support respected")
      val want = math.rint(cxy.toDouble * nBaskets / (supp(x) * supp(y)) * 1e6) / 1e6
      assert(math.abs(lift - want) < 1e-9, s"pair ($x,$y): $lift vs $want")
    }
    // ranking is by lift desc with key tie-breaks
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) > b.getDouble(3) ||
        (a.getDouble(3) == b.getDouble(3) &&
          (a.getLong(0) < b.getLong(0) ||
            (a.getLong(0) == b.getLong(0) && a.getLong(1) < b.getLong(1)))))
      case _ => ()
    }
  }
}
