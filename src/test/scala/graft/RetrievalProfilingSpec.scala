package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Profiling, TextRetrieval}

/** Behavior + plan-shape checks for BM25 retrieval and the one-scan profiler
  * (their values are oracle-checked by the driver; these pin semantics and scale shape). */
class RetrievalProfilingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  import spark.implicits._

  test("bm25: higher tf ranks higher, idf favors rarer terms, non-matches absent") {
    val docs = Seq(
      (1L, "spark spark spark runs fast"),
      (2L, "spark runs on a cluster today"),
      (3L, "nothing relevant here at all"),
      (4L, "rare rare unique spark")
    ).toDF("doc_id", "text")

    val scored = TextRetrieval.bm25(docs, Seq("spark", "unique"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    assert(!scored.contains(3L), "doc without query terms must not appear")
    assert(scored(1L)._2 > scored(2L)._2, "tf=3 must outrank tf=1 for same term")
    // 'unique' appears in 1 of 4 docs, 'spark' in 3 of 4 -> idf(unique) > idf(spark):
    // doc4 (spark + unique) must outrank doc2 (spark only)
    assert(scored(4L)._2 > scored(2L)._2, "rarer matched term must add more score")
    assert(scored(4L)._1 == 2L && scored(2L)._1 == 1L)
  }

  test("bm25 plan: corpus stats and term dfs broadcast; no cartesian blow-up") {
    val df = TextRetrieval.bm25Query(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"one-row corpus stats must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no shuffled cartesian:\n$plan")
  }

  test("profiler: one scan, correct null/ndv accounting, numeric vs string extrema") {
    val df = Seq(
      (1L, Some(2.0), "a"), (2L, None, "b"), (3L, Some(4.5), "b"), (4L, Some(2.0), "c")
    ).toDF("id", "v", "s")
    val p = Profiling.profile(df, Seq("id", "v", "s"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(p("id").getLong(1) == 4 && p("id").getLong(2) == 4 && p("id").getLong(3) == 4)
    assert(p("v").getLong(2) == 3, "one null -> 3 non-null")
    assert(p("v").getLong(3) == 2, "ndv counts distinct non-null values")
    assert(p("v").getDouble(4) == 2.0 && p("v").getDouble(5) == 4.5)
    assert(p("s").getString(6) == "a" && p("s").getString(7) == "c")
    assert(p("s").isNullAt(4) && p("s").isNullAt(5), "string column has no numeric extrema")

    // exact mode: one base scan + one column-pruned scan per ndv subtree (each reads a
    // single column, so total bytes ~ one full-width pass) — and never more
    val scans = Profiling.profile(df, Seq("id", "v", "s"))
      .queryExecution.executedPlan.toString
      .linesIterator.count(l => l.contains("LocalTableScan") || l.contains("Scan parquet"))
    assert(scans == 4, s"expected base + 3 per-column scans, saw $scans")
  }

  test("profiler approx mode tracks exact ndv within HLL++ tolerance and avoids Expand") {
    val li = graft.sources.TableIO.lineitem(spark, sf)
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey")
    val exact = Profiling.profile(li, cols).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approxDf = Profiling.profile(li, cols, exact = false)
    val approx = approxDf.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    cols.foreach { c =>
      val (e, a) = (exact(c).toDouble, approx(c).toDouble)
      assert(math.abs(a - e) / e < 0.1, s"$c: approx $a vs exact $e")
    }
    assert(!approxDf.queryExecution.executedPlan.toString.contains("Expand"),
      "approx profile must not pay the multi-distinct Expand duplication")
    // the at-scale default stays a strictly ONE-scan single pass (count the FINAL plan
    // only — AQE's treeString appends the initial plan, which would double-count)
    val scans = approxDf.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
      .linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"approx mode must profile in one scan, saw $scans")
  }

  test("sketch rollup: merged cell sketches == whole-slice sketch; estimate tracks exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, hll_sketch_agg, hll_sketch_estimate, lit}
    val rnd = new scala.util.Random(3)
    // two groups x three sub-cells, overlapping values ACROSS cells (the case where
    // summing per-cell ndv would be wrong and only sketch union serves correctly)
    val rows = Seq.tabulate(6000) { i =>
      val g = if (i % 2 == 0) "a" else "b"
      (g, i % 3, rnd.nextInt(800).toLong)
    }
    val df = rows.toDF("g", "cell", "v")
    val cells = graft.pipeline.Profiling.buildSketches(df, Seq("g", "cell"), "v")
    assert(cells.count() == 6, "one sketch row per dimension cell")
    val served = graft.pipeline.Profiling.mergeSketches(cells, Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // merge identity: serving from cells equals sketching the slice directly
    val direct = df.groupBy("g")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(served == direct, s"merged $served vs direct $direct")
    // accuracy: within HLL tolerance of the exact distinct count
    val exact = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._3).distinct.size }
    served.foreach { case (g, est) =>
      assert(math.abs(est.toDouble - exact(g)) / exact(g) < 0.05,
        s"$g: est $est vs exact ${exact(g)}")
    }
  }

  test("histogram rollup: merging cells == building at the coarse grain; p50 within a bucket") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(9000) { i =>
      val g = "g" + (i % 2)
      (g, i % 3, rnd.nextDouble() * 900.0)
    }
    val df = rows.toDF("g", "cell", "v")
    val width = 10.0
    val cells = graft.pipeline.Profiling.buildHistograms(df, Seq("g", "cell"), "v", width, 100)
    val served = graft.pipeline.Profiling.mergeHistograms(cells, Seq("g"), width)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // merge identity: serving from fine cells equals building directly at the coarse grain
    val direct = graft.pipeline.Profiling.mergeHistograms(
        graft.pipeline.Profiling.buildHistograms(df, Seq("g"), "v", width, 100), Seq("g"), width)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(served == direct, s"merged $served vs direct $direct")
    // the midpoint estimate is within one bucket width of the exact median
    val exactMedian = rows.groupBy(_._1).map { case (g, rs) =>
      val vs = rs.map(_._3).sorted; g -> vs(vs.length / 2)
    }
    served.foreach { case (g, (n, p50)) =>
      assert(n == 4500L, s"$g count $n")
      assert(math.abs(p50 - exactMedian(g)) <= width, s"$g: p50 $p50 vs ${exactMedian(g)}")
    }
  }
}
