package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CorpusStreaming

class CorpusStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  case class Doc(doc_id: Long, text: String)

  test("streaming ingest admits only documents novel across and within batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_ingest").toString
    val (indexDir, outDir, ckpt) = (s"$dir/index", s"$dir/out", s"$dir/ckpt")
    val stream = MemoryStream[Doc]
    val q = CorpusStreaming.dedupIngest(stream.toDF(), indexDir, outDir, ckpt)
    try {
      stream.addData(
        Doc(1L, "the quick brown fox jumps over the lazy dog near the river bank"),
        Doc(2L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 1 (same batch)
        Doc(3L, "completely different content about spark query engines and planning"))
      q.processAllAvailable()
      val afterBatch1 = spark.read.parquet(outDir).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(afterBatch1 == Set(1L, 3L), s"got $afterBatch1")

      stream.addData(
        Doc(11L, "the quick brown fox jumps over the lazy dog near the river bed"), // near-dup of admitted 1
        Doc(12L, "yet another unrelated document mentioning distributed joins only"),
        Doc(13L, "completely different content about spark query engines and planning")) // exact dup of admitted 3
      q.processAllAvailable()
      val afterBatch2 = spark.read.parquet(outDir).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(afterBatch2 == Set(1L, 3L, 12L), s"got $afterBatch2")
    } finally q.stop()
  }

  test("gram-less short documents dedup via the content-hash lane") {
    import spark.implicits._
    val indexDir = Files.createTempDirectory("graft_ingest_s").toString + "/index"
    // 2 tokens -> no 3-gram shingles -> no LSH bands; only the content lane can catch it
    val b1 = Seq((1L, "hello world")).toDF("doc_id", "text")
    assert(CorpusStreaming.admitBatch(b1, indexDir).count() == 1)
    val b2 = Seq(
      (2L, "hello world"), // cross-batch exact dup of admitted 1
      (3L, "hi"), // novel short doc
      (4L, "hi")  // within-batch exact dup of 3 -> keep-min keeps 3
    ).toDF("doc_id", "text")
    val admitted = CorpusStreaming.admitBatch(b2, indexDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(3L), s"got $admitted")
  }

  test("compactIndex rewrites the band index without changing gate decisions") {
    import spark.implicits._
    val indexDir = Files.createTempDirectory("graft_ingest_c").toString + "/index"
    val b1 = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    CorpusStreaming.admitBatch(b1, indexDir).count()
    val before = spark.read.parquet(indexDir).collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    CorpusStreaming.compactIndex(spark, indexDir, targetFiles = 2)
    val after = spark.read.parquet(indexDir).collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(after == before, "compaction must preserve the index content")
    // a near-dup of doc 1 must still be rejected against the compacted index
    val b2 = Seq((2L, "alpha beta gamma delta epsilon zeta eta theta iota mu"))
      .toDF("doc_id", "text")
    assert(CorpusStreaming.admitBatch(b2, indexDir).count() == 0)
  }

  test("admitBatch is usable standalone for incremental batch ingestion") {
    import spark.implicits._
    val indexDir = Files.createTempDirectory("graft_ingest_b").toString + "/index"
    val b1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    assert(CorpusStreaming.admitBatch(b1, indexDir).count() == 2)
    val b2 = Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // near-dup of 1
      (4L, "fresh words entirely unlike anything admitted before today")).toDF("doc_id", "text")
    val admitted = CorpusStreaming.admitBatch(b2, indexDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(4L), s"got $admitted")
  }

  test("segment gate dedups across batches, within batches, and over a live stream") {
    import spark.implicits._
    val indexDir = Files.createTempDirectory("graft_seg_b").toString + "/index"
    // k=2 segments. batch 1: doc 1 = [a b][c d], doc 2 = [c d][e f] (within-batch
    // repeat of [c d] -> doc 1 pos 2 wins)
    val b1 = Seq((1L, "a b c d"), (2L, "c d e f")).toDF("doc_id", "text")
    val got1 = CorpusStreaming.admitSegmentsBatch(b1, indexDir, k = 2).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got1(1L) == ((2, 2, "a b c d")) && got1(2L) == ((2, 1, "e f")), s"got $got1")
    assert(spark.read.parquet(indexDir).count() == 3, "index = 3 distinct segments")

    // batch 2: doc 3 reuses [a b] and [e f] across batches, brings fresh [x y];
    // doc 4 is entirely admitted segments -> visible with n_kept 0
    val b2 = Seq((3L, "a b x y e f"), (4L, "c d a b")).toDF("doc_id", "text")
    val got2 = CorpusStreaming.admitSegmentsBatch(b2, indexDir, k = 2).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got2(3L) == ((3, 1, "x y")) && got2(4L) == ((2, 0, null)), s"got $got2")
    assert(spark.read.parquet(indexDir).count() == 4, "index grew by [x y] only")

    // replay safety: re-running a batch with ITS OWN batchId (a foreachBatch retry after
    // the index append) must re-derive the identical decision, not drop everything
    val rDir = Files.createTempDirectory("graft_seg_r").toString + "/index"
    val rb = Seq((7L, "p q r s")).toDF("doc_id", "text")
    val first = CorpusStreaming.admitSegmentsBatch(rb, rDir, k = 2, batchId = 5L)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3))).toSeq
    val retry = CorpusStreaming.admitSegmentsBatch(rb, rDir, k = 2, batchId = 5L)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3))).toSeq
    assert(retry == first && first == Seq((7L, 2, "p q r s")),
      s"retry must reproduce the decision: $first vs $retry")
    // but the NEXT batch still dedups against batch 5's segments
    val next = CorpusStreaming.admitSegmentsBatch(
        Seq((8L, "p q z z")).toDF("doc_id", "text"), rDir, k = 2, batchId = 6L)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3))).head
    assert(next == ((8L, 1, "z z")), s"got $next")

    // same contract through the streaming wiring
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_seg_s").toString
    val stream = MemoryStream[Doc]
    val q = CorpusStreaming.segmentIngest(stream.toDF(), s"$dir/index", s"$dir/out",
      s"$dir/ckpt", k = 2)
    try {
      stream.addData(Doc(1L, "a b c d"))
      q.processAllAvailable()
      stream.addData(Doc(2L, "c d n o")) // [c d] admitted in batch 1 -> dropped
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out").collect()
        .map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(out == Map(1L -> "a b c d", 2L -> "n o"), s"got $out")
    } finally q.stop()
  }
}
