package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingTopK

class StreamingTopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("streaming SpaceSaving keeps guarantees across micro-batches with bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val capacity = 8
    val nShards = 4
    // skewed stream: 'hot' items far above N_shard/capacity, plus uniform noise
    val batch1 = Seq.fill(60)("alpha") ++ Seq.fill(40)("beta") ++
      (1 to 30).map(i => s"noise$i")
    val batch2 = Seq.fill(50)("alpha") ++ Seq.fill(45)("gamma") ++
      (31 to 60).map(i => s"noise$i")

    val stream = MemoryStream[String]
    val q = StreamingTopK.topKStream(stream.toDS(), capacity, nShards)
      .writeStream.format("memory").queryName("topk_out").outputMode("update").start()
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      // bounded EMISSION per trigger: at most capacity rows per updated shard
      val afterB1 = spark.table("topk_out").count()
      assert(afterB1 <= capacity.toLong * nShards, s"batch-1 emission $afterB1")
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val afterB2 = spark.table("topk_out").count()
      assert(afterB2 - afterB1 <= capacity.toLong * nShards, "batch-2 emission")

      // latest summary per (shard, item): the most recent Update-mode emission wins,
      // which in the memory sink is the row with the highest est for that pair
      val rows = spark.table("topk_out").groupBy("shard", "item")
        .agg(org.apache.spark.sql.functions.max("est").as("est"),
          org.apache.spark.sql.functions.min("err").as("err"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))

      val exact = (batch1 ++ batch2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val shardTotals = (batch1 ++ batch2).groupBy(StreamingTopK.shardOf(_, nShards))
        .view.mapValues(_.size.toLong).toMap

      // (per-trigger emission bounds asserted above prove the state stays capped;
      // the sink's UNION across triggers legitimately exceeds capacity as items churn)
      // presence: every item with true count > N_shard/capacity must be reported
      exact.foreach { case (item, c) =>
        val shard = StreamingTopK.shardOf(item, nShards)
        if (c > shardTotals(shard).toDouble / capacity) {
          assert(rows.exists(r => r._2 == item), s"guaranteed item '$item' missing")
        }
      }
      // error bounds on every reported item: est - err <= true <= est
      rows.foreach { case (_, item, est, err) =>
        val truth = exact.getOrElse(item, 0L)
        assert(truth <= est && truth >= est - err, s"'$item' est=$est err=$err true=$truth")
      }
      // the heavy items are exact (they were never evicted)
      Seq("alpha" -> 110L, "beta" -> 40L, "gamma" -> 45L).foreach { case (item, c) =>
        val r = rows.filter(_._2 == item)
        assert(r.nonEmpty && r.head._3 >= c, s"$item underestimated: ${r.toSeq}")
      }
    } finally q.stop()
  }
}
