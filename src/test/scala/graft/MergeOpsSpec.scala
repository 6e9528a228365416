package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

import graft.operators.MergeOps

class MergeOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("scd2Apply closes matched rows, versions the change, passes unmatched through") {
    import spark.implicits._
    val snapshot = Seq((1L, 100.0), (2L, 200.0), (3L, 300.0)).toDF("k", "cur")
    val changes = Seq((1L, Date.valueOf("2024-03-01"), 150.0),
      (3L, Date.valueOf("2024-05-01"), 50.0)).toDF("k", "eff", "nv")
    val out = MergeOps.scd2Apply(snapshot, changes, "k", "eff", "nv", "cur", "2020-01-01")
      .orderBy("k", "is_current")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString).orNull, r.getInt(4)))
    assert(out.toSeq == Seq(
      (1L, 100.0, "2020-01-01", "2024-03-01", 0),
      (1L, 150.0, "2024-03-01", null, 1),
      (2L, 200.0, "2020-01-01", null, 1),
      (3L, 300.0, "2020-01-01", "2024-05-01", 0),
      (3L, 50.0, "2024-05-01", null, 1)))
  }

  test("q_merge_scd2 emits exactly snapshot + matched rows, one current row per key") {
    val out = MergeOps.qMergeScd2(spark, sf).cache()
    try {
      val nCust = graft.sources.TableIO.customer(spark, sf).count()
      val nWithOrders = graft.sources.TableIO.orders(spark, sf)
        .select("o_custkey").distinct().count()
      assert(out.count() == nCust + nWithOrders)
      val perKey = out.groupBy("c_custkey")
        .agg(org.apache.spark.sql.functions.sum("is_current").as("cur"))
        .filter(org.apache.spark.sql.functions.col("cur") =!= 1).count()
      assert(perKey == 0, "every key must have exactly one current row")
    } finally out.unpersist()
  }

  test("the latest-change pick rides the native TopKPerKey pre-limit") {
    val plan = MergeOps.qMergeScd2(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"expected RankLimitRule to rewrite the rn=1 window:\n$plan")
  }

  test("incrementalAgg: absorbs inserts/retracts; empty groups vanish; new keys appear") {
    import spark.implicits._
    val state = Seq((1L, 2L, 30L), (2L, 1L, 5L)).toDF("k", "cnt", "total")
    val delta = Seq(
      (1L, 1, 12L),   // insert into existing group
      (2L, -1, 5L),   // retract group 2's only row -> group drops
      (3L, 1, 7L),    // brand-new key
      (3L, 1, 9L)).toDF("k", "op", "v")
    val got = MergeOps.incrementalAgg(state, delta, "k", "cnt", "total", "op", "v")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 3L, 42L), (3L, 2L, 16L)))
  }

  test("incrementalAgg equals full recompute on a randomized CDC history") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // base rows, then a delta that retracts a subset of base and inserts fresh rows
    val base = Seq.tabulate(300)(i => (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong))
    val retracted = base.filter(_._1 % 3 == 0)
    val inserted = Seq.tabulate(80)(i => (1000L + i, rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong))
    val baseDf = base.toDF("id", "k", "v")
    val state = baseDf.groupBy("k")
      .agg(org.apache.spark.sql.functions.count("*").as("cnt"),
        org.apache.spark.sql.functions.sum("v").as("total"))
    val delta = (retracted.map(r => (r._2, -1, r._3)) ++ inserted.map(r => (r._2, 1, r._3)))
      .toDF("k", "op", "v")
    val got = MergeOps.incrementalAgg(state, delta, "k", "cnt", "total", "op", "v")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val surviving = base.filterNot(_._1 % 3 == 0) ++ inserted
    val want = surviving.groupBy(_._2).map { case (k, rows) =>
      (k, rows.size.toLong, rows.map(_._3).sum) }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
  }
}
