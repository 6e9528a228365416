package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StringFunctions.jaroWinkler
import graft.pipeline.Linkage

class LinkageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def jw(a: String, b: String): Double = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b"))).collect().head.getDouble(0)
  }

  test("jaro_winkler known-answer vectors (pinned to DuckDB jaro_winkler_similarity)") {
    // classic literature pairs, values observed from duckdb 1.0.0 on 2026-08-13
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(jw("abc", "abc") == 1.0)
    // boost threshold: jaro <= 0.7 gets NO prefix bonus even with a common prefix
    assert(jw("abcdefgh", "abzzzzzz") == 0.5)
    assert(math.abs(jw("ab", "ac") - 0.6666666666666666) < 1e-15)
    // odd raw-mismatch count: transpositions floor-halved (0.944..., not 0.9166...)
    assert(math.abs(jw("abcdef", "bcadef") - 0.9444444444444445) < 1e-15)
    // window 0 on length-3: only positional matches
    assert(math.abs(jw("abc", "acb") - 0.5555555555555555) < 1e-15)
    // empty-side conventions
    assert(jw("", "abc") == 0.0)
    assert(jw("ab", "") == 0.0)
    assert(jw("", "") == 0.0)
  }

  test("null input yields null; SQL registration works") {
    import spark.implicits._
    val df = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
    assert(df.select(jaroWinkler(col("a"), col("b"))).collect().head.isNullAt(0))
    val viaSql = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS s")
      .collect().head.getDouble(0)
    assert(math.abs(viaSql - 0.9611111111111111) < 1e-15)
  }

  test("linkRecords picks the best block-mate above threshold, ties to smallest id") {
    import spark.implicits._
    val clean = Seq(
      (1L, "small ring", "ring"),
      (2L, "large ring", "ring"),
      (3L, "small gear", "gear")).toDF("id", "name", "block")
    val dirty = Seq(
      (10L, "smal ring", "ring"),   // best: small ring
      (11L, "larg ring", "ring"),   // best: large ring
      (12L, "zzzz ring", "ring"),   // nothing above threshold in-block
      (13L, "small gea", "gear")).toDF("id", "name", "block")
    val got = Linkage.linkRecords(clean, dirty, 0.8)
      .orderBy("dirty_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      Seq((10L, 1L), (11L, 2L), (13L, 3L)))
    // cross-block candidates are never considered: "small gea" matched only in gear block
    assert(got.forall(_.getDouble(4) >= 0.8))
  }

  test("equal-score tie breaks to the smallest clean id") {
    import spark.implicits._
    // two clean names equidistant from the observation
    val clean = Seq((7L, "ax", "b"), (5L, "xa", "b")).toDF("id", "name", "block")
    val dirty = Seq((1L, "aa", "b")).toDF("id", "name", "block")
    val got = Linkage.linkRecords(clean, dirty, 0.0).collect()
    assert(got.length == 1 && got.head.getLong(2) == 5L)
  }

  test("best-match rank rides the native TopKPerKey pre-limit") {
    import spark.implicits._
    val clean = Seq((1L, "small ring", "ring")).toDF("id", "name", "block")
    val dirty = Seq((10L, "smal ring", "ring")).toDF("id", "name", "block")
    val plan = Linkage.linkRecords(clean, dirty, 0.8).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKey in plan:\n$plan")
  }
}
