package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AnomalyMonitor
import graft.streaming.AnomalyMonitor.{Alert, Obs}

class AnomalyMonitorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Sequential reference of the detector's SES/deviation recurrence. */
  private def reference(vals: Seq[(Long, Double)], k: Double, warmup: Int): Seq[Alert] = {
    var (level, dev, n) = (0.0, 0.0, 0L)
    vals.sortBy(_._1).map { case (seq, v) =>
      val a = Alert("m", seq, v, level, dev,
        n >= warmup && math.abs(v - level) > k * math.max(dev, 1e-9))
      if (n == 0L) { level = v; dev = 0.0; n = 1L }
      else { dev = (math.abs(v - level) + dev) / 2.0; level = (v + level) / 2.0; n += 1 }
      a
    }
  }

  test("streaming SES anomaly gate: spike flagged, state survives across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Obs]
    val steady = (1 to 8).map(i => (i.toLong, 100.0 + (i % 3))) // ~flat series
    val q = AnomalyMonitor.detect(stream.toDS(), k = 4.0, warmup = 5)
      .writeStream.format("memory").queryName("anom_out").outputMode("append").start()
    try {
      stream.addData(steady.map { case (s, v) => Obs("m", s, v) })
      q.processAllAvailable()
      // second batch arrives later: state (learned level) must carry over
      stream.addData(Obs("m", 9, 101.0), Obs("m", 10, 500.0), Obs("m", 11, 101.0))
      q.processAllAvailable()
      val got = spark.table("anom_out").as[Alert].collect().sortBy(_.seq)
      val want = reference(steady ++ Seq((9L, 101.0), (10L, 500.0), (11L, 101.0)),
        k = 4.0, warmup = 5)
      assert(got.toSeq == want) // exact parity incl. cross-batch state
      assert(got.filter(_.anomaly).map(_.seq).toSeq == Seq(10L)) // only the spike
      assert(got.find(_.seq == 9).get.expected > 99.0) // batch-2 expectation is learned
    } finally q.stop()
  }

  test("independent keys keep independent state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Obs]
    stream.addData((1 to 6).flatMap(i =>
      Seq(Obs("a", i.toLong, 10.0), Obs("b", i.toLong, 1000.0))))
    stream.addData(Obs("a", 7, 1000.0), Obs("b", 7, 1000.0)) // huge for a, normal for b
    val q = AnomalyMonitor.detect(stream.toDS(), k = 4.0, warmup = 5)
      .writeStream.format("memory").queryName("anom_keys").outputMode("append").start()
    try {
      q.processAllAvailable()
      val flagged = spark.table("anom_keys").as[Alert].collect()
        .filter(_.anomaly).map(a => (a.key, a.seq)).toSet
      assert(flagged == Set(("a", 7L)))
    } finally q.stop()
  }
}
