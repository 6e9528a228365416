package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MaterializedViews

class MaterializedViewsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def tmp(tag: String) =
    Files.createTempDirectory(tag).toFile.getAbsolutePath

  private def mkBase(path: String, n: Int): Unit = {
    import spark.implicits._
    (1 to n).map(i => (s"g${i % 7}", s"h${i % 3}", i.toLong, i * 1.5))
      .toDF("g", "h", "v_long", "v_dbl")
      .write.mode("overwrite").parquet(path)
  }

  test("derivable aggregates rewrite onto the view; results identical; base unscanned") {
    val root = tmp("mv1"); val base = s"$root/base"; val mv = s"$root/mv"
    mkBase(base, 5000)
    def q() = spark.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v_long")).as("s"),
        min(col("v_long")).as("mn"), max(col("v_dbl")).as("mx"),
        avg(col("v_dbl")).as("a"))
    val before = q().collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    MaterializedViews.create(spark, base, mv, Seq("g", "h"), Seq("v_long", "v_dbl"))
    try {
      val rewritten = q()
      assert(rewritten.inputFiles.forall(_.contains("/mv")),
        s"rewrite must scan the view: ${rewritten.inputFiles.take(2).mkString(",")}")
      val after = rewritten.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
      assert(after == before, "rewritten answer must be value-identical")
      assert(rewritten.schema == q().schema)
    } finally MaterializedViews.deregister(base)
  }

  test("group-subset rollup rewrites; non-derivable aggregates bail to the base") {
    val root = tmp("mv2"); val base = s"$root/base"; val mv = s"$root/mv"
    mkBase(base, 3000)
    MaterializedViews.create(spark, base, mv, Seq("g", "h"), Seq("v_long"))
    try {
      // grouping by a SUBSET of the view's group cols re-aggregates partials
      val roll = spark.read.parquet(base).groupBy(col("h"))
        .agg(sum(col("v_long")).as("s"), count(lit(1)).as("n"))
      assert(roll.inputFiles.forall(_.contains("/mv")), "subset rollup must rewrite")
      val expect = (1 to 3000).groupBy(i => s"h${i % 3}")
        .map { case (k, v) => k -> (v.map(_.toLong).sum, v.size.toLong) }
      assert(roll.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap == expect)
      // count(DISTINCT) is not derivable from partials -> base scan
      val cd = spark.read.parquet(base).groupBy(col("g"))
        .agg(countDistinct(col("v_long")).as("d"))
      assert(cd.inputFiles.forall(_.contains("/base")), "distinct agg must NOT rewrite")
      // a filter on a NON-group column -> base scan (not derivable from group rows)
      val filt = spark.read.parquet(base).filter(col("v_long") > 100)
        .groupBy(col("g")).agg(sum(col("v_long")).as("s"))
      assert(filt.inputFiles.forall(_.contains("/base")), "value-col filter must NOT rewrite")
      // a filter on GROUP columns IS derivable: it rewrites and matches the base
      val gFilt = spark.read.parquet(base)
        .filter(col("h") =!= "h0" && col("g").isin("g1", "g2", "g3"))
        .groupBy(col("g")).agg(sum(col("v_long")).as("s"), count(lit(1)).as("n"))
      assert(gFilt.inputFiles.forall(_.contains("/mv")), "group-col filter must rewrite")
      val expectF = (1 to 3000).filter(i => i % 3 != 0 && Seq(1, 2, 3).contains(i % 7))
        .groupBy(i => s"g${i % 7}")
        .map { case (k, v) => k -> (v.map(_.toLong).sum, v.size.toLong) }
      assert(gFilt.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap == expectF, "filtered rewrite must be value-identical to the base")
    } finally MaterializedViews.deregister(base)
  }

  test("stale view never answers: base change disables the rewrite until refresh") {
    import spark.implicits._
    val root = tmp("mv3"); val base = s"$root/base"; val mv = s"$root/mv"
    mkBase(base, 1000)
    MaterializedViews.create(spark, base, mv, Seq("g"), Seq("v_long"))
    try {
      def q() = spark.read.parquet(base).groupBy(col("g")).agg(sum(col("v_long")).as("s"))
      assert(q().inputFiles.forall(_.contains("/mv")))
      Thread.sleep(1100) // distinct mtimes on coarse filesystems
      (1 to 500).map(i => (s"g${i % 7}", "hX", 1000000L + i, 0.0))
        .toDF("g", "h", "v_long", "v_dbl").write.mode("append").parquet(base)
      assert(q().inputFiles.forall(_.contains("/base")),
        "stale view must fall back to the base scan")
      val fromBase = q().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      MaterializedViews.refresh(spark, base)
      assert(q().inputFiles.forall(_.contains("/mv")), "refresh re-enables the rewrite")
      assert(q().collect().map(r => r.getString(0) -> r.getLong(1)).toMap == fromBase)
    } finally MaterializedViews.deregister(base)
  }
}
