package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

/** Scale mechanics: salted skew joins and bucketed (shuffle-free) co-located joins. */
class ScaleSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = SparkTestBase.spark

  test("salted join equals the plain join on pathologically skewed data") {
    import spark.implicits._
    // 50k rows of one hot key + a uniform tail, joined to a small dim
    val probe = spark.range(50000).select(
      when(col("id") < 45000, 1L).otherwise(col("id") % 100).as("k"),
      col("id").as("row_id"))
    val build = spark.range(100).select(col("id").as("k"), concat(lit("v"), col("id")).as("payload"))

    val plain = probe.join(build, Seq("k")).select(col("row_id"), col("payload"))
    val salted = SkewJoin.saltedInner(probe, build, "k", col("row_id"), salts = 8)
      .select(col("row_id"), col("payload"))

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt column spreads the hot key across partitions and is dropped from output") {
    import spark.implicits._
    val probe = spark.range(1000).select(lit(1L).as("k"), col("id").as("row_id"))
    val build = Seq((1L, "x")).toDF("k", "payload")
    val out = SkewJoin.saltedInner(probe, build, "k", col("row_id"), salts = 4)
    assert(!out.columns.contains("_salt"))
    // the deterministic salt must actually use >1 value for a 1000-row hot key
    val distinctSalts = probe
      .withColumn("_salt", pmod(xxhash64(col("row_id")), lit(4)).cast("int"))
      .select("_salt").distinct().count()
    assert(distinctSalts == 4)
  }

  test("native TopKPerKey equals the window formulation and plans partial->final") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graft.{TopKPerKey, TopKPerKeyExec}
    val o = graft.sources.TableIO.orders(spark, SparkTestBase.sf)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val native = TopKPerKey(o,
      Seq("o_orderpriority"), Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")

    assert(native.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(native).isEmpty)

    native.collect()
    val execs = collectWithSubqueries(native.queryExecution.executedPlan) {
      case t: TopKPerKeyExec => t.partial
    }
    assert(execs.sorted == Seq(false, true), s"expected partial+final TopKPerKeyExec, got $execs")
  }

  test("rank<=k filter rewrites onto TopKPerKey and keeps boundary ties (rank semantics)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // key a: ranks over v desc are 1,1,1,4 -> rank<=2 keeps THREE tied rows; key b: 1,1,3
    val df = Seq(("a", 10), ("a", 10), ("a", 10), ("a", 5), ("b", 7), ("b", 7), ("b", 3))
      .toDF("k", "v")
    val w = Window.partitionBy($"k").orderBy($"v".desc)
    val rewritten = df.withColumn("rnk", rank().over(w)).filter($"rnk" <= 2)
    rewritten.collect()
    assert(rewritten.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      s"rank rewrite did not fire:\n${rewritten.queryExecution.executedPlan}")
    // reference computed WITHOUT the rewrite: a second window expr (kept in the output,
    // so pruning can't remove it) defeats the single-ranking-expr guard
    val stock = df.withColumn("rnk", rank().over(w))
      .withColumn("rn2", row_number().over(w)).filter($"rnk" <= 2)
    assert(!stock.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val got = rewritten.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted
    val want = stock.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted
    assert(got.sameElements(want), s"got ${got.toSeq} want ${want.toSeq}")
    assert(got.count(_._1 == "a") == 3, "boundary ties must all survive under rank")
  }

  test("row_number<=k filter rewrites onto TopKPerKey with exact-k retention") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val df = Seq(("a", 10), ("a", 10), ("a", 10), ("a", 5), ("b", 7), ("b", 7), ("b", 3))
      .toDF("k", "v")
    val w = Window.partitionBy($"k").orderBy($"v".desc)
    val rewritten = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    rewritten.collect()
    assert(rewritten.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // row_number keeps exactly k rows per key regardless of ties
    val got = rewritten.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(got.count(_._1 == "a") == 2 && got.count(_._1 == "b") == 2)
    assert(got.filter(_._1 == "a").forall(_._2 == 10))
    assert(got.forall(_._3 <= 2))
  }

  test("rank rewrite does NOT fire on disjunctions or multi-function windows (soundness)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val df = Seq(("a", 10), ("a", 9), ("a", 8), ("a", 7), ("b", 7), ("b", 3))
      .toDF("k", "v")
    val w = Window.partitionBy($"k").orderBy($"v".desc)
    // a disjunction admits rows beyond any top-k: rewriting would drop them
    val disj = df.withColumn("rnk", rank().over(w)).filter($"rnk" <= 2 || $"v" === 7)
    disj.collect()
    assert(!disj.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "disjunctive rank filters must not be rewritten")
    // kept: a:10(r1), a:9(r2), a:7(v=7, r4 — beyond any top-2!), b:7(r1), b:3(r2)
    assert(disj.count() == 5)
  }

  test("rank BETWEEN bounds rewrite to the upper limit and keep lower-bound filtering") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val df = Seq(("a", 10), ("a", 9), ("a", 8), ("a", 7), ("b", 7), ("b", 3)).toDF("k", "v")
    val w = Window.partitionBy($"k").orderBy($"v".desc)
    val band = df.withColumn("rnk", rank().over(w)).filter($"rnk" >= 2 && $"rnk" <= 3)
    band.collect()
    assert(band.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "conjunctive upper bound must still trigger the pre-limit")
    val got = band.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == Set(("a", 9, 2), ("a", 8, 3), ("b", 3, 2)), s"got $got")
  }

  test("TopKPerKey partial phase bounds what the exchange carries") {
    import org.apache.spark.sql.graft.TopKPerKey
    import spark.implicits._
    // 100k rows, 4 keys, k=2 -> the final phase sees at most k * keys * input-partitions rows
    val big = spark.range(100000).repartition(8)
      .select((col("id") % 4).as("k"), col("id").as("v"))
    val top = TopKPerKey(big, Seq("k"), Seq(("v", true)), k = 2)
    val rows = top.collect()
    assert(rows.length == 8) // 4 keys x k=2, exact
    val expected = (0 until 4).flatMap { g =>
      val tail = (0 until 100000).filter(_ % 4 == g).sorted.reverse.take(2)
      tail.map(v => (g.toLong, v.toLong))
    }.toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
  }

  test("preferSortMergeJoin=false picks ShuffledHashJoin (reference forceShuffledHashJoin analog)") {
    // gazelle_plugin forces SHJ over SMJ via a custom strategy (StrategyOverrides.scala:39
    // JoinSelectionOverrides + forceShuffledHashJoin). Spark 4 exposes the same preference
    // natively; this proves the conf route yields the same physical operator — one hash
    // build instead of sorting both fact sides.
    // threshold sized so the narrow build side is NOT broadcastable (> 4 KB) but IS
    // local-hash-map buildable (< 4 KB x 32 shuffle partitions) — the SHJ window
    val confs = Seq(
      "spark.sql.join.preferSortMergeJoin" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "4096",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // wide probe side vs narrow build side: Spark's JoinSelection picks SHJ (BuildRight)
      // when the build is 3x smaller and preferSortMergeJoin is off — no sort of either side
      val li = graft.sources.TableIO.lineitem(spark, SparkTestBase.sf)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_returnflag"))
      val o = graft.sources.TableIO.orders(spark, SparkTestBase.sf)
        .select(col("o_orderkey"))
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_extendedprice") * (org.apache.spark.sql.functions.lit(1) - col("l_discount"))), 2).as("rev"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin"),
        s"expected SHJ with preferSortMergeJoin=false:\n$plan")
    } finally prev.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("runtime bloom filter prunes the probe side of a selective shuffled join") {
    // At 100 TB a selective dimension-side filter should reach the FACT scan as a bloom
    // filter (Spark's InjectRuntimeFilter), pruning probe rows before the shuffle. The
    // size thresholds default to cluster scale (10 GB probe side), so the test lowers
    // them to fire on test data; the PLAN SHAPE is what production inherits.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.sources.TableIO.lineitem(spark, SparkTestBase.sf)
      val o = graft.sources.TableIO.orders(spark, SparkTestBase.sf)
        .filter(col("o_totalprice") > 400000.0) // selective creation side
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(org.apache.spark.sql.functions.lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the probe side:\n$plan")
    } finally prev.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("bucketed tables join without any shuffle exchange") {
    val db = "graft_bucketing_test"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db LOCATION '/tmp/graft-bucketing-test'")
    try {
      val li = graft.sources.TableIO.lineitem(spark, SparkTestBase.sf)
        .select("l_orderkey", "l_quantity")
      val ord = graft.sources.TableIO.orders(spark, SparkTestBase.sf)
        .select("o_orderkey", "o_totalprice")
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.li_bucketed")
      ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.ord_bucketed")

      val joined = spark.table(s"$db.li_bucketed")
        .join(spark.table(s"$db.ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("qty"))
      // disable broadcast so the co-located sort-merge path is what gets planned
      withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        joined.collect()
        val plan = joined.queryExecution.executedPlan
        val shuffles = collect(plan) {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
        // bucketing co-locates the join; the only shuffle allowed is the groupBy's —
        // and since grouping is on the bucket key, even that one is avoided
        assert(shuffles.isEmpty, s"expected shuffle-free bucketed join, got:\n$plan")
      }
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    // one key holds ~90% of rows; thresholds lowered so local-scale data trips the
    // same OptimizeSkewedJoin rule that guards production joins
    withSQLConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // skew lives on ONE side: a fact with a 90%-hot key against a unique-key dim
      val left = spark.range(200000)
        .select(when(col("id") < 180000, 7L).otherwise(col("id") % 1000).as("k"),
          concat(lit("padpadpadpadpadpad"), col("id")).as("pad"))
      val right = spark.range(1000).select(col("id").as("k"), col("id").as("rv"))
      // note: no key-preserving operator after the join — AQE refuses to split skewed
      // partitions when downstream requires the join's hash partitioning
      val joined = left.join(right, Seq("k")).agg(sum(length(col("pad"))).as("s"))
      joined.collect()
      val skewed = collectWithSubqueries(joined.queryExecution.executedPlan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec if j.isSkewJoin => j
      }
      assert(skewed.nonEmpty, s"expected an AQE skew-split SMJ, got:\n${joined.queryExecution.executedPlan}")
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
