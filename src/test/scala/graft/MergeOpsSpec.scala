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
}
