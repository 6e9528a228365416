package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Packing

/** Greedy sequence packing: invariants + equality with a naive reference fold. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def doc(tokens: Int): String = Seq.fill(tokens)("t").mkString(" ")

  test("bins respect the budget, docs stay whole, oversized docs get their own bin") {
    import spark.implicits._
    val docs = Seq(
      (1L, doc(100), "s1"), (2L, doc(100), "s1"), (3L, doc(60), "s1"), // bin0: 100+100+60=260>256 -> 3 spills
      (4L, doc(300), "s1"),                                            // oversized: own bin
      (5L, doc(10), "s1"),
      (6L, doc(256), "s2"),                                            // exact fit
      (7L, null.asInstanceOf[String], "s2"),                           // null text: 0 tokens, never dropped
      (8L, "  a   b \t c  ", "s2")                                     // irregular whitespace: 3 tokens
    ).toDF("doc_id", "text", "source")
    val got = Packing.packGreedy(docs, "source", budget = 256)
      .collect().map(r => r.getLong(1) -> (r.getString(0), r.getLong(3), r.getInt(4))).toMap
    assert(got(1L)._2 == 0 && got(2L)._2 == 0, "first two fit one bin (200 <= 256)")
    assert(got(3L)._2 == 1, "doc 3 would overflow bin 0 -> opens bin 1")
    assert(got(4L)._2 == 2 && got(4L)._3 == 300, "oversized doc gets a singleton bin")
    assert(got(5L)._2 == 3, "next doc does not join an overflowed bin")
    assert(got(6L) == (("s2", 0L, 256)), "streams pack independently; exact fit allowed")
    assert(got(7L) == (("s2", 0L, 256)),
      s"null text packs as 0 tokens (fits even a full bin), not dropped: ${got.get(7L)}")
    assert(got(8L) == (("s2", 1L, 3)), s"whitespace runs count as separators: ${got.get(8L)}")
  }

  test("equals a naive per-stream reference fold on random corpora; deterministic") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 94261L)
      val budget = 50 + rnd.nextInt(200)
      val rows = Seq.tabulate(300)(i =>
        (i.toLong, doc(1 + rnd.nextInt(80)), s"s${rnd.nextInt(5)}"))
      val df = rows.toDF("doc_id", "text", "source")
      val got = Packing.packGreedy(df, "source", budget)
        .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getInt(4))).toMap
      // reference: sequential fold per stream in doc_id order
      rows.groupBy(_._3).foreach { case (_, streamRows) =>
        var bin = -1L; var fill = 0
        streamRows.sortBy(_._1).foreach { case (id, text, _) =>
          val n = text.trim.split("\\s+").length // mirror the kernel's tokenizer exactly
          if (bin < 0 || fill + n > budget) { bin += 1; fill = 0 }
          fill += n
          assert(got(id) == ((bin, fill)), s"seed $seed doc $id")
        }
      }
      val again = Packing.packGreedy(df, "source", budget)
        .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getInt(4))).toMap
      assert(again == got, s"seed $seed: packing must be deterministic")
    }
  }

  test("sharded streams: per-shard parity, bins never span shards, ids dense per stream") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val budget = 100
    val shardDocs = 64L
    // one dominant stream (larger than several shards) + two small ones, ids interleaved
    val rows = Seq.tabulate(500) { i =>
      val stream = if (i % 10 < 8) "big" else s"small${i % 2}"
      (i.toLong, doc(1 + rnd.nextInt(40)), stream)
    }
    val df = rows.toDF("doc_id", "text", "source")
    val got = Packing.packGreedy(df, "source", budget, shardDocs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getInt(4)))
    val byId = got.map(r => r._2 -> r).toMap
    // (a) parity with a naive fold run independently per (stream, shard), stitched by
    //     cumulative bin counts — the declared semantics
    rows.groupBy(_._3).foreach { case (stream, streamRows) =>
      var offset = 0L
      streamRows.groupBy(t => t._1 / shardDocs).toSeq.sortBy(_._1).foreach { case (_, shardRows) =>
        var bin = -1L; var fill = 0
        shardRows.sortBy(_._1).foreach { case (id, text, _) =>
          val n = text.trim.split("\\s+").length
          if (bin < 0 || fill + n > budget) { bin += 1; fill = 0 }
          fill += n
          assert(byId(id) == ((stream, id, n, offset + bin, fill)), s"doc $id")
        }
        offset += bin + 1
      }
    }
    // (b) bins never span shards; (c) bin ids dense per stream starting at 0
    got.groupBy(r => (r._1, r._4)).foreach { case ((s, b), binRows) =>
      val shards = binRows.map(_._2 / shardDocs).distinct
      assert(shards.size == 1, s"bin ($s,$b) spans shards $shards")
      assert(binRows.map(_._3).sum <= budget || binRows.size == 1, s"bin ($s,$b) over budget")
    }
    got.groupBy(_._1).foreach { case (s, streamRows) =>
      val bins = streamRows.map(_._4).distinct.sorted.toSeq
      assert(bins == (0L until bins.size).toSeq,
        s"stream $s bins not dense: ${bins.mkString(",")}")
    }
    // (d) the dominant stream really was cut across multiple independent units
    assert(got.filter(_._1 == "big").map(_._2 / shardDocs).distinct.size > 3)
    // (e) determinism
    val again = Packing.packGreedy(df, "source", budget, shardDocs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getInt(4)))
    assert(again.sortBy(_._2).sameElements(got.sortBy(_._2)))
  }

  test("bin utilization is high on a realistic corpus slice") {
    val packed = Packing.packGreedyQuery(spark, SparkTestBase.sf)
    val perBin = packed.groupBy("stream", "bin_id")
      .agg(org.apache.spark.sql.functions.max("bin_fill").as("fill"))
    val stats = perBin.agg(
      org.apache.spark.sql.functions.avg("fill"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).head()
    // next-fit on ~54-token docs against a 256 budget: average fill should be well over
    // half the budget (padding waste bounded), and there must be multiple bins
    assert(stats.getDouble(0) > 128.0, s"avg fill ${stats.getDouble(0)}")
    assert(stats.getLong(1) > 1)
  }
}
