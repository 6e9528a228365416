package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TpcdsRealQueries
import graft.sources.{StarCache, TableIO}

/**
 * StarCache — the one-time parquet materialization of the derived TPC-DS star
 * (TpcdsRealQueries runs its verbatim bodies against these views as data at rest).
 */
class StarCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("viewNames stays in sync with every CTE the prefix defines") {
    // viewSql embeds the full prefix; harvest the `name AS (`-at-margin definitions.
    val prefixText = TpcdsRealQueries.viewSql("date_dim")
    val defined = "(?m)^([a-z_]+) AS \\($".r
      .findAllMatchIn(prefixText).map(_.group(1)).toSet + "date_dim" // WITH date_dim AS (
    assert(defined == TpcdsRealQueries.viewNames.toSet,
      s"prefix defines ${defined.diff(TpcdsRealQueries.viewNames.toSet)} not in viewNames; " +
        s"viewNames has ${TpcdsRealQueries.viewNames.toSet.diff(defined)} not in prefix")
  }

  test("materialized views serve the same rows as the inline CTEs") {
    TableIO.registerAll(spark, sf)
    assert(StarCache.tryEnsure(spark, sf, "tpcds", TpcdsRealQueries.viewNames,
      TpcdsRealQueries.viewSql), "materialization failed on good input")
    // date-banded inventory aggregate: exercises the sorted fact AND a generated dim
    val viaParquet = spark.sql(
      """SELECT CAST(sum(inv_quantity_on_hand) AS BIGINT) AS s, count(*) AS c
        |FROM inventory WHERE inv_date_sk BETWEEN 10500 AND 10600""".stripMargin).head()
    val viaCte = spark.sql(TpcdsRealQueries.viewSql("inventory")
        .replace("SELECT * FROM inventory",
          """SELECT CAST(sum(inv_quantity_on_hand) AS BIGINT) AS s, count(*) AS c
            |FROM inventory WHERE inv_date_sk BETWEEN 10500 AND 10600""".stripMargin)).head()
    assert(viaParquet == viaCte)
    assert(viaParquet.getLong(1) > 0, "probe band must be non-empty to prove anything")
    // second call is the registered fast path and must still succeed
    assert(StarCache.tryEnsure(spark, sf, "tpcds", TpcdsRealQueries.viewNames,
      TpcdsRealQueries.viewSql))
  }

  test("tryEnsure is fail-soft: bad input reports false instead of throwing") {
    assert(!StarCache.tryEnsure(spark, "/nonexistent/dir", "tpcds",
      TpcdsRealQueries.viewNames, TpcdsRealQueries.viewSql))
    assert(!StarCache.tryEnsure(spark, sf, "tpcds_badsql", Seq("nope"),
      _ => "SELECT * FROM table_that_does_not_exist"))
  }
}
