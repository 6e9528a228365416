package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableIO
import graft.streaming.EventsStreaming

/** Production-shape robustness: file-based streaming, foreachBatch sinks, empty inputs. */
class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("readStream over a parquet directory drives the same windowed aggregation") {
    val srcDir = Files.createTempDirectory("graft-stream-src").toString
    TableIO.events(spark, sf).limit(500).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema(TableIO.events(spark, sf).schema)
      .parquet(srcDir)
    val q = EventsStreaming.windowedCounts(stream)
      .writeStream.format("memory").queryName("file_win_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      val streamed = spark.table("file_win_out")
        .agg(sum(col("n"))).head().getLong(0)
      assert(streamed == 500, s"all 500 file rows must flow through the stream, got $streamed")
    } finally q.stop()
  }

  test("foreachBatch sink lands streaming output as parquet") {
    val srcDir = Files.createTempDirectory("graft-stream-src2").toString
    val outDir = Files.createTempDirectory("graft-stream-out").toString
    TableIO.events(spark, sf).limit(200).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema(TableIO.events(spark, sf).schema)
      .parquet(srcDir)
    val q = stream.filter(col("event_type") === "click")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      val expected = TableIO.events(spark, sf).limit(200)
        .filter(col("event_type") === "click").count()
      assert(spark.read.parquet(outDir).count() == expected)
    } finally q.stop()
  }

  test("operators survive empty inputs (filters matching nothing)") {
    // a selection of shapes: agg, join, window, dedup kernel — all on empty frames
    val emptyLi = TableIO.lineitem(spark, sf).filter(col("l_quantity") < -1)
    assert(emptyLi.groupBy("l_returnflag").agg(sum("l_quantity")).count() == 0)
    val emptyOrders = TableIO.orders(spark, sf).filter(col("o_totalprice") < 0)
    assert(emptyLi.join(emptyOrders, col("l_orderkey") === col("o_orderkey")).count() == 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_returnflag").orderBy("l_orderkey")
    assert(emptyLi.withColumn("rn", row_number().over(w)).count() == 0)
    val emptyDocs = TableIO.documents(spark, sf).filter(col("doc_id") < 0)
    assert(graft.pipeline.Dedup.gramHashSets(emptyDocs).count() == 0)
    assert(graft.pipeline.Dedup.simhashes(emptyDocs).count() == 0)
    // round-4 curation operators on empty corpora
    assert(graft.pipeline.Dedup.segmentDedup(emptyDocs).count() == 0)
    assert(graft.pipeline.Dedup.duplicateSpans(emptyDocs).count() == 0)
    assert(graft.pipeline.TextAnalysis.perplexityScores(emptyDocs).count() == 0)
    assert(graft.pipeline.TextAnalysis.vocabCoverage(emptyDocs, 10).count() == 0)
    assert(graft.pipeline.Sampling.shuffleAssigned(emptyDocs).count() == 0)
    val emptyVecs = TableIO.embeddings(spark, sf).filter(col("vec_id") < 0)
    assert(graft.pipeline.Similarity.dequantizeInt8(
      graft.pipeline.Similarity.quantizeInt8(emptyVecs)).count() == 0)
    // null embeddings round-trip as null rows (library inputs may carry nulls)
    import spark.implicits._
    val withNull = Seq((1L, Array(1f, -2f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val back = graft.pipeline.Similarity.dequantizeInt8(
        graft.pipeline.Similarity.quantizeInt8(withNull))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(back(1L).nonEmpty && back(2L).isEmpty, s"got $back")
  }

  test("typed text kernels are null-safe (library inputs may carry null text)") {
    import spark.implicits._
    val docs = Seq((1L, "some real text with enough tokens here"), (2L, null))
      .toDF("doc_id", "text")
    // gram-based ops: null text has no grams -> doc 2 simply absent from pair space
    assert(graft.pipeline.Dedup.gramHashSets(docs).count() == 1)
    assert(graft.pipeline.Dedup.simhashPairs(docs).count() == 0)
    // feature kernels: null text scores like empty text, no NPE
    val q = graft.pipeline.TextAnalysis.qualityFeatures(docs).collect()
    assert(q.length == 2)
    val rep = graft.pipeline.TextAnalysis.repetitionSignals(docs).collect()
    assert(rep.length == 2)
  }

  test("TopKPerKey on empty input and k larger than group size") {
    import org.apache.spark.sql.graft.TopKPerKey
    val empty = TableIO.orders(spark, sf).filter(col("o_orderkey") < 0)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    assert(TopKPerKey(empty, Seq("o_orderpriority"), Seq(("o_totalprice", true)), 3).count() == 0)
    val tiny = TableIO.orders(spark, sf).limit(2)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    // k=100 >> group sizes: every row survives, none duplicated
    assert(TopKPerKey(tiny, Seq("o_orderpriority"), Seq(("o_totalprice", true)), 100).count() == 2)
  }
}
