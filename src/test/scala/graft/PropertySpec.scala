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
