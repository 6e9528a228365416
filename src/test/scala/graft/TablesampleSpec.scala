package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Property spec behind the declared rows-only `q_tablesample` key (reference
 * sql-tests/inputs/tablesample-negative.sql): sampling randomness is engine-local so
 * no DuckDB oracle exists, and these pins carry the correctness claim instead —
 * same-seed reproducibility, binomial concentration of the PERCENT and BUCKET forms,
 * exactness of the ROWS form, and the parser rejecting fractions outside [0, 100].
 */
class TablesampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def registered(): Unit = graft.sources.TableIO.registerAll(spark, sf)

  test("same REPEATABLE seed reproduces the identical sample; q_tablesample is stable") {
    registered()
    val pick = "SELECT o_orderkey FROM orders TABLESAMPLE (10 PERCENT) REPEATABLE (42)"
    val a = spark.sql(pick).collect().map(_.getLong(0)).toSet
    val b = spark.sql(pick).collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty, "REPEATABLE must make the Bernoulli sample a pure function of the seed")
    // the registered key: deterministic across invocations for the seeded kinds
    def kinds() = SparkEntry.queries("q_tablesample")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (k1, k2) = (kinds(), kinds())
    assert(k1("pct") == k2("pct") && k1("bucket") == k2("bucket"))
    assert(k1("rows")._1 == 50)
  }

  test("PERCENT and BUCKET sampling concentrate around their fractions") {
    registered()
    val n = spark.sql("SELECT count(*) FROM orders").head().getLong(0).toDouble
    val pct = spark.sql(
      "SELECT count(*) FROM orders TABLESAMPLE (10 PERCENT) REPEATABLE (42)").head().getLong(0)
    // ±5 sigma binomial band around 0.10 n — fails only on a broken sampler
    val sd = math.sqrt(n * 0.1 * 0.9)
    assert(math.abs(pct - 0.1 * n) < 5 * sd, s"pct sample $pct of $n outside 0.10n ± 5sd")
    val bucket = spark.sql(
      "SELECT count(*) FROM orders TABLESAMPLE (BUCKET 2 OUT OF 10) REPEATABLE (7)").head().getLong(0)
    val sdB = math.sqrt(n * 0.2 * 0.8)
    assert(math.abs(bucket - 0.2 * n) < 5 * sdB, s"bucket sample $bucket of $n outside 0.20n ± 5sd")
  }

  test("ROWS form returns exactly min(n, k) rows") {
    registered()
    assert(spark.sql("SELECT count(*) FROM orders TABLESAMPLE (50 ROWS)").head().getLong(0) == 50L)
    spark.range(10).createOrReplaceTempView("ts_tiny")
    assert(spark.sql("SELECT count(*) FROM ts_tiny TABLESAMPLE (50 ROWS)").head().getLong(0) == 10L,
      "asking for more rows than exist returns the whole relation, not an error")
  }

  test("fractions outside [0, 100] are rejected at parse time") {
    registered()
    for (frac <- Seq("-5", "150")) {
      val e = intercept[Throwable](spark.sql(s"SELECT count(*) FROM orders TABLESAMPLE ($frac PERCENT)"))
      assert(e.getMessage.contains("must be on interval [0, 1]"),
        s"fraction $frac must be a parse-time rejection, got: ${e.getMessage.take(120)}")
    }
  }
}
