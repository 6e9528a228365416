package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FrequencyCap

/** Streaming CMS frequency cap: admitted <= min(true, cap) unconditionally; equality
  * on an uncollided sketch; caps hold ACROSS micro-batches; bounded emission. */
class FrequencyCapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("per-item admissions never exceed the cap and hit it exactly when uncollided") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cap = 3L
    // batch 1 exhausts 'hot' (5 > cap), leaves 'cold' under it (1 < cap);
    // batch 2 proves the refusal persists across triggers and 'cold' finishes its budget
    val batch1 = Seq.fill(5)("hot") ++ Seq("cold") ++ (1 to 20).map(i => s"u$i")
    val batch2 = Seq.fill(4)("hot") ++ Seq.fill(4)("cold") ++ (21 to 40).map(i => s"u$i")

    val stream = MemoryStream[String]
    val q = FrequencyCap.capStream(stream.toDS(), cap, nShards = 4)
      .writeStream.format("memory").queryName("cap_out").outputMode("append").start()
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()

      val rows = spark.table("cap_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      // exactly one output row per input occurrence (Append mode, no dedup/loss)
      assert(rows.length == batch1.length + batch2.length)

      val admitted = rows.filter(_._3).groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val exact = (batch1 ++ batch2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      exact.foreach { case (item, n) =>
        val a = admitted.getOrElse(item, 0L)
        assert(a <= math.min(n, cap), s"$item: admitted $a > min($n, $cap)")
      }
      // default 5x2048 table over ~50 distinct items: collision-free in practice,
      // so the gate admits the full budget — hot/cold saturate, singletons all pass
      assert(admitted("hot") == cap, s"hot admitted ${admitted("hot")} != $cap")
      assert(admitted("cold") == cap)
      (1 to 40).foreach(i => assert(admitted(s"u$i") == 1L, s"u$i refused"))
      // refusals carry est >= cap so the tail is observable downstream
      rows.filter(!_._3).foreach { case (item, est, _) =>
        assert(est >= cap, s"refused $item with est $est < cap")
      }
    } finally q.stop()
  }

  test("state stays one fixed CMS table per shard (restart-safe bytes round-trip)") {
    // the state IS the sketch bytes: re-hydrating and re-saving must be lossless
    val buf = new org.apache.spark.sql.graft.CountMin.Buffer(5, 64)
    (1 to 100).foreach(i => buf.add(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"k${i % 7}")))
    val rt = org.apache.spark.sql.graft.CountMin.fromBytes(buf.toBytes)
    assert(java.util.Arrays.equals(rt.toBytes, buf.toBytes))
    assert(rt.total == buf.total)
  }
}
