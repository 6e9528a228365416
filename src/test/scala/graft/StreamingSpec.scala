package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.Event

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed aggregation over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(20), 2, "view", 5.0))
    val q = EventsStreaming.windowedCounts(stream.toDF())
      .writeStream.format("memory").queryName("win_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("win_out").collect()
      val clicks = rows.find(_.getString(1) == "click").get
      assert(clicks.getLong(2) == 2 && clicks.getDouble(3) == 3.0)
      assert(rows.find(_.getString(1) == "view").get.getLong(2) == 1)
    } finally q.stop()
  }

  test("streaming upsert maintains a partitioned table across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream-upsert").toString
    val tbl = s"$root/tbl"
    val ckpt = s"$root/ckpt"
    // (id, value, yr partition, seq = the last-write-wins ordering column)
    val stream = MemoryStream[(Long, String, Int, Long)]
    val q = graft.streaming.TableMaintenance.upsertStream(
      stream.toDF().toDF("id", "v", "yr", "seq"), tbl, "id", "yr", "seq", ckpt)
    try {
      // batch 1 creates the table; duplicate key 1 resolves to the higher seq
      stream.addData((1L, "a", 2020, 1L), (1L, "a2", 2020, 2L), (2L, "b", 2021, 1L))
      q.processAllAvailable()
      def state() = spark.read.parquet(tbl).collect()
        .map(r => r.getAs[Long]("id") -> (r.getAs[String]("v"), r.getAs[Int]("yr"))).toMap
      assert(state() == Map(1L -> ("a2", 2020), 2L -> ("b", 2021)), s"got ${state()}")

      def files2021 = new java.io.File(s"$tbl/yr=2021").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified()).toMap
      val before = files2021
      // batch 2: update key 1 in place, insert key 3, MOVE key 2 from 2021 to 2022
      stream.addData((1L, "A", 2020, 3L), (3L, "c", 2020, 1L), (2L, "B", 2022, 2L))
      q.processAllAvailable()
      assert(state() == Map(1L -> ("A", 2020), 2L -> ("B", 2022), 3L -> ("c", 2020)),
        s"got ${state()}")
      assert(!new java.io.File(s"$tbl/yr=2021").exists(),
        "emptied partition must be deleted after the key moved out")
      val _ = before // moved-out partition is gone; nothing else to compare there
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("streaming incremental aggregate view: CDC batches fold in, replays are no-ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream-incagg").toString
    val view = s"$root/view"
    val ckpt = s"$root/ckpt"
    val stream = MemoryStream[(Long, Int, Long)]
    val q = graft.streaming.TableMaintenance.incrementalAggStream(
      stream.toDF().toDF("k", "op", "v"), view, "k", "cnt", "total", "op", "v", ckpt)
    try {
      def state() = graft.streaming.TableMaintenance.readAggView(spark, view).get
        .collect().map(r => r.getAs[Long]("k") ->
          ((r.getAs[Long]("cnt"), r.getAs[Long]("total")))).toMap
      // batch 0: inserts only
      stream.addData((1L, 1, 10L), (1L, 1, 20L), (2L, 1, 5L))
      q.processAllAvailable()
      assert(state() == Map(1L -> ((2L, 30L)), 2L -> ((1L, 5L))), s"got ${state()}")
      // batch 1: retract one of key 1's rows, retract key 2 entirely, new key 3
      stream.addData((1L, -1, 10L), (2L, -1, 5L), (3L, 1, 7L))
      q.processAllAvailable()
      assert(state() == Map(1L -> ((1L, 20L)), 3L -> ((1L, 7L))), s"got ${state()}")
      // replay protection: re-applying an already-committed batch id is a no-op
      val replay = Seq((1L, 1, 999L)).toDF("k", "op", "v")
      graft.streaming.TableMaintenance.applyAggDelta(
        replay, view, "k", "cnt", "total", "op", "v", batchId = 1L)
      assert(state() == Map(1L -> ((1L, 20L)), 3L -> ((1L, 7L))),
        "replayed batch must not double-apply")
      // only the latest version directory survives
      val vs = new java.io.File(view).listFiles().map(_.getName).filter(_.startsWith("v="))
      assert(vs.toSeq == Seq("v=1"), s"got ${vs.toSeq}")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("chained stateful ops: windowed distinct users (dedup then count), append-final") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventsStreaming.windowedDistinctUsers(stream.toDF())
      .writeStream.format("memory").queryName("wdu_out").outputMode("append").start()
    try {
      // hour 10: users 1,1,2 (dup user 1 must collapse); hour 11: user 3
      stream.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(10), 1, "view", 1.0),
        Event(3, ts(20), 2, "click", 1.0),
        Event(4, Timestamp.valueOf("2024-01-01 11:10:00"), 3, "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far past both windows so they finalize
      stream.addData(Event(5, Timestamp.valueOf("2024-01-01 15:00:00"), 9, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("wdu_out").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      assert(got("2024-01-01 10:00:00.0") == 2, s"got $got")
      assert(got("2024-01-01 11:00:00.0") == 1, s"got $got")
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(
      Event(1, ts(1), 1, "click", 1.0),
      Event(1, ts(1), 1, "click", 1.0),
      Event(2, ts(2), 1, "view", 2.0))
    val q = EventsStreaming.dedupStream(stream.toDF())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark collapses replays with differing timestamps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    // same event_id replayed 1 minute apart (an at-least-once source retry):
    // plain dropDuplicates(event_id, ts) would keep BOTH — within-watermark dedup must not
    stream.addData(
      Event(1, ts(1), 1, "click", 1.0),
      Event(1, ts(2), 1, "click", 1.0),
      Event(2, ts(3), 1, "view", 2.0))
    val q = EventsStreaming.dedupWithinWatermark(stream.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("wm_dedup_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("wm_dedup_out").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L), s"expected one row per id, got ${ids.toSeq}")
    } finally q.stop()
  }

  test("Trigger.AvailableNow backfill: processes everything, stops, resumes incrementally") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-avnow").toString
    val (src, sink, ckpt) = (s"$root/src", s"$root/sink", s"$root/ckpt")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(src)
    val schema = spark.read.parquet(src).schema

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("append").start()
      // AvailableNow terminates by itself once the backlog is drained
      assert(q.awaitTermination(120000), "AvailableNow query should self-terminate")
    }

    try {
      runOnce()
      assert(spark.read.parquet(sink).count() == 2)
      runOnce() // no new data: exactly-once means nothing is re-emitted
      assert(spark.read.parquet(sink).count() == 2)
      Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(src)
      runOnce() // only the new file is processed
      val out = spark.read.parquet(sink)
      assert(out.count() == 3 && out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("stream-static join enriches events with a broadcast dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val stream = MemoryStream[Event]
    stream.addData(
      Event(1, ts(1), 1, "click", 1.0),
      Event(2, ts(2), 2, "click", 1.0),
      Event(3, ts(3), 7, "click", 1.0)) // no dim row -> null tier
    val joined = stream.toDF().join(
      org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")
    val q = joined.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val tiers = spark.table("enrich_out")
        .collect().map(r => r.getLong(0) -> Option(r.getString(5))).toMap
      assert(tiers(1L).contains("gold") && tiers(2L).contains("basic") && tiers(7L).isEmpty)
    } finally q.stop()
  }

  test("append-mode window emits only after the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventsStreaming.windowedCounts(stream.toDF())
      .writeStream.format("memory").queryName("append_win_out")
      .outputMode("append").start()
    try {
      stream.addData(Event(1, ts(5), 1, "click", 1.0))
      q.processAllAvailable()
      // watermark (2h) has not passed the 10:00 window's end -> nothing final yet
      assert(spark.table("append_win_out").count() == 0)
      // event at 13:30 advances the watermark to 11:30, past the 10:00-11:00 window end
      stream.addData(Event(2, Timestamp.valueOf("2024-01-01 13:30:00"), 1, "view", 2.0))
      q.processAllAvailable()
      stream.addData(Event(3, Timestamp.valueOf("2024-01-01 16:30:00"), 1, "view", 1.0))
      q.processAllAvailable()
      val finalized = spark.table("append_win_out").collect()
      assert(finalized.exists(r => r.getString(1) == "click" && r.getLong(2) == 1),
        s"the 10:00 click window must be finalized, got ${finalized.toSeq}")
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to preceding clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(20), 1, "purchase", 9.0), // within 30 min of click -> attributed
      Event(3, ts(1), 2, "click", 1.0),
      Event(4, ts(45), 2, "purchase", 5.0), // 44 min after click -> NOT attributed
      Event(5, ts(30), 3, "purchase", 2.0)) // no click at all
    val q = EventsStreaming.funnelJoin(stream.toDF())
      .writeStream.format("memory").queryName("funnel_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("funnel_out").collect()
      assert(rows.length == 1, s"exactly one attributed purchase, got ${rows.toSeq}")
      assert(rows.head.getLong(0) == 1 && rows.head.getLong(3) == 2)
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched clicks after both watermarks pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "purchase", 9.0), // within the 30-min window -> attributed
      Event(3, ts(1), 2, "click", 1.0))     // never purchases -> null row, but only
                                            // after the watermark clears its window
    val q = EventsStreaming.funnelJoinOuter(stream.toDF())
      .writeStream.format("memory").queryName("funnel_outer").outputMode("append").start()
    try {
      q.processAllAvailable()
      val matched = spark.table("funnel_outer").collect()
      assert(matched.count(r => !r.isNullAt(3)) == 1, s"inner match first: ${matched.toSeq}")
      assert(matched.forall(r => !r.isNullAt(3)),
        "the unmatched click must NOT emit while its window can still match")
      // advance BOTH watermarks past click@ts(1)'s window end (ts(31) + 10 min delay):
      // late traffic at ts(55)/ts(56) moves the global watermark to ts(45)
      stream.addData(Event(4, ts(55), 3, "click", 1.0), Event(5, ts(56), 3, "purchase", 2.0))
      q.processAllAvailable()
      stream.addData(Event(6, ts(59), 4, "click", 1.0)) // extra trigger to flush eviction
      q.processAllAvailable()
      val rows = spark.table("funnel_outer").collect()
      val nullRows = rows.filter(_.isNullAt(3)).map(_.getLong(0))
      assert(nullRows.toSeq == Seq(2L),
        s"exactly the never-purchasing user emits a null row: ${rows.toSeq}")
      assert(rows.count(r => !r.isNullAt(3)) == 2, s"both real attributions kept: ${rows.toSeq}")
    } finally q.stop()
  }

  test("stateful sessionization counts sessions across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventsStreaming.sessionize(spark, stream.toDS())
      .writeStream.format("memory").queryName("sess_out").outputMode("update").start()
    try {
      stream.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(10), 7, "click", 1.0))
      q.processAllAvailable()
      // second batch: 50 minutes later -> new session (gap > 30 min)
      stream.addData(Event(3, Timestamp.valueOf("2024-01-01 11:00:00"), 7, "click", 1.0))
      q.processAllAvailable()
      val last = spark.table("sess_out").collect()
        .filter(_.getLong(0) == 7L).maxBy(_.getLong(2))
      assert(last.getInt(1) == 2, s"expected 2 sessions, got $last")
      assert(last.getLong(2) == 3)
    } finally q.stop()
  }

  test("windowed aggregation runs on the RocksDB state store provider") {
    // At 100 TB streaming state outgrows the default in-heap HDFSBackedStateStore
    // (GC pressure + executor OOM); RocksDB keeps state off-heap/on-disk with
    // incremental checkpointing. Prove the same query produces identical results
    // under the RocksDB provider.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[Event]
    stream.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(20), 2, "view", 5.0))
    val q = EventsStreaming.windowedCounts(stream.toDF())
      .writeStream.format("memory").queryName("rocksdb_win_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.head.customMetrics
        .containsKey("rocksdbFilesCopied"), "query must actually run on RocksDB state")
      val rows = spark.table("rocksdb_win_out").collect()
      val clicks = rows.find(_.getString(1) == "click").get
      assert(clicks.getLong(2) == 2 && clicks.getDouble(3) == 3.0)
      assert(rows.find(_.getString(1) == "view").get.getLong(2) == 1)
    } finally {
      q.stop()
      prev.fold(spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    }
  }

  test("streaming query restarts from checkpoint and keeps aggregation state") {
    // The recovery contract a long-running 100 TB pipeline depends on: stop a stateful
    // query, restart it against the SAME checkpoint, and the restored state must carry
    // the pre-restart contributions (no reprocessing, no loss).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val stream = MemoryStream[Event]
    stream.addData(Event(1, ts(5), 1, "click", 1.0))
    val q1 = EventsStreaming.windowedCounts(stream.toDF())
      .writeStream.format("memory").queryName("ckpt_out1").outputMode("complete")
      .option("checkpointLocation", ckpt).start()
    try { q1.processAllAvailable() } finally q1.stop()

    stream.addData(Event(2, ts(10), 1, "click", 2.0))
    val q2 = EventsStreaming.windowedCounts(stream.toDF())
      .writeStream.format("memory").queryName("ckpt_out2").outputMode("complete")
      .option("checkpointLocation", ckpt).start()
    try {
      q2.processAllAvailable()
      val clicks = spark.table("ckpt_out2").collect().find(_.getString(1) == "click").get
      // n=2 / sum=3.0 requires the restarted query to have RESTORED event 1's state
      assert(clicks.getLong(2) == 2 && clicks.getDouble(3) == 3.0,
        s"state lost across restart: $clicks")
    } finally q2.stop()
  }

  test("kill-and-reattach: a NEW session resumes the checkpoint exactly-once") {
    // The full recovery round-trip: a query consuming a file source is stopped, MORE
    // data lands, and a DIFFERENT session (fresh SQL conf/catalog/listener state —
    // the in-process analog of a new driver; a literal JVM kill isn't testable in one
    // test process) reattaches to the same checkpoint + file sink. The offset log and
    // sink commit log must hand over: every input row lands in the sink EXACTLY once.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_reattach")
    val (src, out, ckpt) = (s"$dir/src", s"$dir/out", s"$dir/ckpt")
    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"

    Seq((1L, ts(5), 1L, "click", 1.0), (2L, ts(6), 2L, "view", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(src)
    def run(s: org.apache.spark.sql.SparkSession) = s.readStream.schema(schema).parquet(src)
      .withColumn("flagged", col("value") >= 2.0)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = run(spark)
    try q1.processAllAvailable() finally q1.stop()

    Seq((3L, ts(7), 1L, "click", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(src)
    val reattached = spark.newSession()
    val q2 = run(reattached)
    try {
      q2.processAllAvailable()
      val got = reattached.read.parquet(out).select("event_id").as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 2L, 3L),
        s"reattached run must emit each input exactly once, got ${got.toSeq}")
    } finally q2.stop()
  }

  test("streaming windowed counts agree with the batch twin on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = sources.TableIO.events(spark, SparkTestBase.sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value").as[Event].collect()
    val stream = MemoryStream[Event]
    stream.addData(events.toIndexedSeq)
    val q = EventsStreaming.windowedCounts(stream.toDF())
      .writeStream.format("memory").queryName("win_batch_cmp").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streaming = spark.table("win_batch_cmp")
        .selectExpr("unix_timestamp(hour_start)", "event_type", "n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = operators.EventsQueries.qEventsWindow(spark, SparkTestBase.sf)
        .selectExpr("hour_epoch", "event_type", "n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streaming == batch)
    } finally q.stop()
  }
}
