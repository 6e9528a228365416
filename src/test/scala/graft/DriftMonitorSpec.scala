package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.FeatureStats
import graft.streaming.DriftMonitor

class DriftMonitorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("twoSampleKs: identical samples score 0, disjoint samples score 1") {
    import spark.implicits._
    val a = (1L to 100L).toDF("v")
    val same = FeatureStats.twoSampleKs(a, (1L to 100L).toDF("v")).collect()(0)
    assert(same.getLong(0) == 100L && same.getLong(1) == 100L)
    assert(same.getDouble(2) == 0.0)
    val disjoint = FeatureStats.twoSampleKs(a, (201L to 300L).toDF("v")).collect()(0)
    assert(disjoint.getDouble(2) == 1.0)
  }

  test("twoSampleKs matches an in-memory reference on skewed samples") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val xs = Seq.fill(500)(rnd.nextInt(50).toLong)
    val ys = Seq.fill(400)((rnd.nextInt(50) + 10).toLong)
    val got = FeatureStats.twoSampleKs(xs.toDF("v"), ys.toDF("v")).collect()(0).getDouble(2)
    val values = (xs ++ ys).distinct.sorted
    val want = values.map { v =>
      math.abs(xs.count(_ <= v).toDouble / xs.size - ys.count(_ <= v).toDouble / ys.size)
    }.max
    assert(math.abs(got - math.rint(want * 1e6) / 1e6) < 1e-9, s"$got vs $want")
  }

  test("streaming monitor stays quiet in-distribution and alarms on shift") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(17)
    val reference = Seq.fill(800)(rnd.nextInt(100).toLong).toDF("v")

    val results = scala.collection.mutable.Buffer.empty[(Long, Double, Boolean)]
    val stream = MemoryStream[Long]
    val q = DriftMonitor.monitor(stream.toDF(), reference, threshold = 0.3) {
      (batchId, _, _, ks, alarm) => results.synchronized { results += ((batchId, ks, alarm)) }
    }
    try {
      // batch 0: same distribution -> no alarm
      stream.addData(Seq.fill(300)(rnd.nextInt(100).toLong): _*)
      q.processAllAvailable()
      // batch 1: hard shift (values way outside the reference support) -> alarm
      stream.addData(Seq.fill(300)(500L + rnd.nextInt(50)): _*)
      q.processAllAvailable()
    } finally q.stop()

    val byBatch = results.sortBy(_._1)
    assert(byBatch.size == 2, s"got $byBatch")
    assert(!byBatch(0)._3, s"in-distribution batch must not alarm: ${byBatch(0)}")
    assert(byBatch(0)._2 < 0.3)
    assert(byBatch(1)._3 && byBatch(1)._2 == 1.0, s"shifted batch must alarm: ${byBatch(1)}")
  }
}
