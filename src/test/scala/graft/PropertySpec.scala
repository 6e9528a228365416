package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FastHash
import graft.operators.{AsOfJoin, SkewJoin}

/**
 * Randomized-equivalence checks for the custom operators: each runs several seeded random
 * trials against a naive reference implementation (deterministic seeds — reproducible).
 */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("FastHash is deterministic and collision-free over realistic token sets") {
    val tokens = (for {
      a <- 'a' to 'z'; b <- 'a' to 'z'; c <- 'a' to 'z'
    } yield s"$a$b$c tok $c$b$a").toVector
    val hashes = tokens.map(FastHash.hash64)
    assert(hashes.distinct.size == tokens.size, "no collisions on 17k realistic grams")
    assert(tokens.map(FastHash.hash64) == hashes, "deterministic across invocations")
  }

  test("TopKPerKey withTies equals stock window rank on random data (seeded trials)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 104729L)
      val k = 1 + rnd.nextInt(4)
      // small value domain forces heavy ties, including at the k boundary
      val rows = Seq.tabulate(300)(i => (rnd.nextInt(6).toString, rnd.nextInt(8), i))
        .toDF("key", "v", "row_id")
      val w = Window.partitionBy($"key").orderBy($"v".desc)
      val viaRule = rows.withColumn("rnk", rank().over(w)).filter($"rnk" <= k)
      viaRule.collect()
      assert(viaRule.queryExecution.executedPlan.toString.contains("TopKPerKey"),
        s"seed $seed: rewrite must fire")
      // stock reference: second window expr KEPT through the collect (dropping it would
      // let pruning reduce the Window to one expr and the rewrite would fire here too)
      val stock = rows.withColumn("rnk", rank().over(w))
        .withColumn("rn2", row_number().over(w)).filter($"rnk" <= k)
      assert(!stock.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val got = viaRule.select("key", "v", "rnk", "row_id").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))).sorted.toSeq
      val want = stock.select($"key", $"v", $"rnk", $"row_id", $"rn2").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))).sorted.toSeq
      assert(got == want, s"seed $seed k=$k: ${got.size} vs ${want.size} rows")
    }
  }

  test("salted join equals plain join on random key distributions") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 7919L)
      val probe = Seq.tabulate(200)(i => (rnd.nextLong(21), i.toLong)).toDF("k", "row_id")
      val build = Seq.fill(30)(rnd.nextLong(26)).distinct
        .map(k => (k, s"payload_$k")).toDF("k", "payload")
      val salts = 2 + rnd.nextInt(5)
      val plain = probe.join(build, Seq("k")).select("row_id", "payload")
      val salted = SkewJoin.saltedInner(probe, build, "k", col("row_id"), salts)
        .select("row_id", "payload")
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"seed $seed salts $salts")
    }
  }

  test("as-of join matches a naive per-row scan on random event times") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 104729L)
      val left = Seq.tabulate(60)(i =>
        (i.toLong, rnd.nextLong(5) + 1, new java.sql.Timestamp(rnd.nextLong(1000) * 1000)))
      // distinct right timestamps (shuffled 0..999 prefix): equal-ts right rows would
      // make the carried payload order-dependent, which as-of semantics leave undefined
      val rightTs = rnd.shuffle((0L until 1000L).toVector).take(40)
      val right = rightTs.zipWithIndex.map { case (ts, i) =>
        (rnd.nextLong(5) + 1, new java.sql.Timestamp(ts * 1000), 1000L + i)
      }
      val leftDf = left.toDF("event_id", "user_id", "ts")
      val rightDf = right.toDF("user_id", "p_ts", "payload_id")
      val got = AsOfJoin.backward(leftDf, rightDf, key = "user_id",
        leftTs = "ts", rightTs = "p_ts", payload = Seq("payload_id"))
        .select("event_id", "payload_id")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      // naive reference: latest right row with same key and p_ts <= ts; ties on p_ts
      // broken by larger payload_id (matches AsOfJoin's last-wins ordering)
      left.foreach { case (id, k, ts) =>
        val cands = right.filter(r => r._1 == k && !r._2.after(ts))
        val want = if (cands.isEmpty) -1L else cands.maxBy(r => (r._2.getTime, r._3))._3
        assert(got(id) == want, s"seed $seed event $id: got ${got(id)}, want $want")
      }
    }
  }

  test("binned range join equals the naive non-equi join and avoids nested-loop plans") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    import spark.implicits._
    val helper = new AdaptiveSparkPlanHelper {}
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 31337L)
      val points = Seq.tabulate(300)(i => (i.toLong, rnd.nextDouble() * 1000)).toDF("pid", "p")
      val intervals = Seq.tabulate(50) { i =>
        val lo = rnd.nextDouble() * 900
        (100L + i, lo, lo + rnd.nextDouble() * 150)
      }.toDF("iid", "lo", "hi")
      val naive = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iid")
      val binned = graft.operators.RangeJoin
        .pointInInterval(points, intervals, "p", "lo", "hi", binWidth = 100.0)
        .select("pid", "iid")
      assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty, s"seed $seed")
      binned.collect()
      val nlj = helper.collectWithSubqueries(binned.queryExecution.executedPlan) {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }
      assert(nlj.isEmpty, "binned range join must plan as an equi-join, not nested-loop")
    }
  }

  test("sort-based percentiles equal percentile() on random duplicate-heavy data") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 48611L)
      // small value domain -> many duplicates; sizes chosen to hit integral ranks too
      val rows = Seq.tabulate(50 + rnd.nextInt(200))(i =>
        (rnd.nextInt(4).toString, rnd.nextInt(9).toDouble))
        .toDF("k", "v")
      val qs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
      val want = rows.groupBy($"k")
        .agg(expr(s"percentile(v, array(${qs.mkString(",")}))").as("ps"))
        .collect().flatMap(r => qs.zip(r.getSeq[Double](1)).map { case (q, p) =>
          (r.getString(0), q) -> p }).toMap
      val got = graft.operators.Percentiles.exactBySort(rows, Seq("k"), "v", qs)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      assert(got.keySet == want.keySet, s"seed $seed: ${got.keySet} vs ${want.keySet}")
      got.foreach { case (kq, v) =>
        assert(math.abs(v - want(kq)) < 1e-9, s"seed $seed $kq: $v vs ${want(kq)}")
      }
    }
  }

  test("chunking covers every token with the declared overlap on random docs") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 15091L)
      val chunkSize = 2 + rnd.nextInt(8)
      val stride = 1 + rnd.nextInt(chunkSize)
      val docs = Seq.tabulate(20) { i =>
        (i.toLong, Seq.tabulate(1 + rnd.nextInt(30))(j => s"d${i}t$j").mkString(" "))
      }
      val chunks = graft.pipeline.TextAnalysis.chunk(docs.toDF("doc_id", "text"), chunkSize, stride)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
      docs.foreach { case (id, text) =>
        val toks = text.split(' ')
        val mine = chunks.filter(_._1 == id).sortBy(_._2)
        // every chunk is the exact token slice at its stride offset
        mine.foreach { case (_, cid, ctext) =>
          val want = toks.slice(cid * stride, cid * stride + chunkSize).mkString(" ")
          assert(ctext == want, s"seed $seed doc $id chunk $cid")
        }
        // coverage: concatenating each chunk's non-overlapping prefix rebuilds the doc
        val rebuilt = mine.flatMap { case (_, cid, ctext) =>
          ctext.split(' ').take(stride)
        }
        assert(rebuilt.toSeq == toks.toSeq, s"seed $seed doc $id: coverage broken")
      }
    }
  }

  test("winnowing equals a naive reference on random repetitive docs (tie cases)") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 27644437L)
      // tiny alphabet -> repeated grams INSIDE windows -> the rightmost-tie rule matters
      val docs = Seq.tabulate(15) { i =>
        (i.toLong, Seq.fill(3 + rnd.nextInt(40))(s"w${rnd.nextInt(4)}").mkString(" "))
      }
      val w = 4
      val got = graft.pipeline.Dedup.winnowFingerprints(docs.toDF("doc_id", "text"), w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(t => (t._2, t._3)).toSet }
      docs.foreach { case (id, text) =>
        val toks = text.split(" ", -1) // mirror the kernel's string_split-exact tokenizer
        val n = toks.length - 2
        val hs = Array.tabulate(n) { i =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val d = md.digest((toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          (0 until 6).foldLeft(0L)((h, b) => (h << 8) | (d(b) & 0xffL))
        }
        val want = scala.collection.mutable.Set.empty[(Int, Long)]
        for (e <- math.min(w - 1, n - 1) until n) {
          var best = e
          for (j <- (e - 1) to math.max(0, e - w + 1) by -1)
            if (hs(j) < hs(best)) best = j
          want += ((best + 1, hs(best)))
        }
        assert(got.getOrElse(id, Set.empty) == want.toSet, s"seed $seed doc $id")
      }
    }
  }

  test("segment dedup equals a sequential first-occurrence reference on random corpora") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 48611L)
      val k = 2 + rnd.nextInt(4)
      // tiny alphabet -> guaranteed cross-doc and intra-doc duplicate segments
      val words = Vector("aa", "bb", "cc", "dd")
      val docs = Seq.tabulate(15) { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(25))(words(rnd.nextInt(words.size))).mkString(" "))
      }
      // reference: walk docs in (doc_id, pos) order, keep first occurrence of each segment
      val seen = scala.collection.mutable.Set.empty[String]
      val want = docs.map { case (id, text) =>
        val segs = text.split(" ", -1).grouped(k).map(_.mkString(" ")).toSeq
        val kept = segs.filter(seen.add)
        id -> ((segs.size, kept.size, if (kept.isEmpty) null else kept.mkString(" ")))
      }.toMap
      val got = graft.pipeline.Dedup.segmentDedup(docs.toDF("doc_id", "text"), k)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
      assert(got == want, s"seed $seed k=$k")
      // invariant: total kept segments == distinct segments in the corpus
      assert(got.values.map(_._2).sum == seen.size, s"seed $seed: kept != distinct")
    }
  }

  test("duplicate spans equal a naive occurrence-count + island-merge reference") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 104729L)
      val L = 3 + rnd.nextInt(3)
      val words = Vector("p", "q", "r", "s", "t")
      val docs = Seq.tabulate(12) { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(30))(words(rnd.nextInt(words.size))).mkString(" "))
      }
      // naive: count every L-gram string corpus-wide, hits are grams with count >= 2,
      // islands merge hits whose positions are within L of the previous hit
      val gramsAll = docs.flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        (0 to toks.length - L).map(i => (id, i + 1, toks.slice(i, i + L).mkString(" ")))
      }
      val counts = gramsAll.groupBy(_._3).view.mapValues(_.size).toMap
      val want = gramsAll.filter(g => counts(g._3) >= 2)
        .groupBy(_._1).view.mapValues { hs =>
          val ps = hs.map(_._2).sorted
          val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
          for (p <- ps) spans.lastOption match {
            case Some((st, en, n)) if p - (en - L + 1) <= L =>
              spans(spans.length - 1) = (st, p + L - 1, n + 1)
            case _ => spans += ((p, p + L - 1, 1))
          }
          spans.toSeq
        }.toMap
      val got = graft.pipeline.Dedup.duplicateSpans(docs.toDF("doc_id", "text"), L)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).sortBy(_._1).toSeq).toMap
      assert(got == want.filter(_._2.nonEmpty), s"seed $seed L=$L")
    }
  }

  test("minhash band-signature agreement tracks jaccard similarity") {
    import spark.implicits._
    // two doc families: near-identical pairs (high jaccard) and unrelated docs
    val base = Seq.tabulate(200)(i => s"w$i").mkString(" ")
    val nearDup = base.split(" ").dropRight(5).mkString(" ") + " extra token here"
    val unrelated = Seq.tabulate(200)(i => s"z$i").mkString(" ")
    val docs = Seq((0L, base), (1L, nearDup), (2L, unrelated)).toDF("doc_id", "text")
    val sigs = graft.pipeline.Dedup.minhashSignatures(graft.pipeline.Dedup.gramHashSets(docs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def agreement(a: Long, b: Long): Double =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / sigs(a).size
    assert(agreement(0L, 1L) > 0.8, "near-dups agree on most minhash coords")
    assert(agreement(0L, 2L) < 0.2, "unrelated docs agree on few coords")
  }
}
