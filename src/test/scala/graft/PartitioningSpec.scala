package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableIO

/** Partitioned layout + SQL-text surface: the two remaining "engine front door" proofs. */
class PartitioningSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("partitionBy write prunes partitions at read time") {
    val dir = Files.createTempDirectory("graft-part").toString
    TableIO.lineitem(spark, sf)
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .write.partitionBy("ship_month").mode("overwrite").parquet(dir)

    val months = spark.read.parquet(dir).select("ship_month").distinct().count()
    assert(months > 10, s"expect many month partitions, got $months")

    val pruned = spark.read.parquet(dir).filter(col("ship_month") === "1997-03")
    pruned.collect()
    val scans = collectWithSubqueries(pruned.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // partition pruning: the scan's selected partitions collapse to exactly one
    assert(scans.head.relation.location.listFiles(
      scans.head.partitionFilters, scans.head.dataFilters).length == 1,
      "month filter must prune the scan to a single partition directory")
  }

  test("every driver table is queryable through plain SQL text") {
    TableIO.registerAll(spark, sf)
    val df = spark.sql(
      """SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_cust DESC, n_name LIMIT 5""".stripMargin)
    assert(df.count() == 5)
    val viaApi = TableIO.customer(spark, sf)
      .join(TableIO.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy(col("n_cust").desc, col("n_name")).limit(5)
    assert(df.collect().toSeq == viaApi.collect().toSeq,
      "SQL text and DataFrame API must produce identical plans/results")
  }

  test("scalar subquery plans as a Subquery node; EXISTS lowers to a semi join") {
    val df = graft.operators.RelationalOps.qScalarSubquery(spark, sf)
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("Subquery"), s"expected a Subquery in:\n$physical")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftSemi"), s"EXISTS should lower to LeftSemi in:\n$optimized")
  }

  test("native expressions are callable from SQL text (GraftExtensions registration)") {
    TableIO.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT a.vec_id, cosine_similarity(a.embedding, b.embedding) AS cos,
        |       dot_product(a.embedding, b.embedding) AS dot
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 5 ORDER BY a.vec_id""".stripMargin).collect()
    assert(r.length == 5)
    assert(r.forall(row => math.abs(row.getDouble(1)) <= 1.0001))
  }
}
