package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Semantic pins for the verbatim TPC-H q4/q12/q21 bodies (operators.TpchVerbatim) —
 * the oracle run proves Spark == DuckDB on the official texts; these prove the
 * synthesized l_commitdate/l_receiptdate/l_shipmode columns have the two-sided
 * domains the spec's predicates assume (an always-true or always-false synthesized
 * predicate would pass the oracle while gutting the query).
 */
class TpchVerbatimSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("synthesized columns: both orders of commit/receipt occur, all 7 ship modes") {
    graft.sources.TableIO.registerAll(spark, sf)
    graft.sources.TableIO.lineitem(spark, sf).createOrReplaceTempView("tpch_lineitem")
    val r = spark.sql(
      """WITH lineitem AS (
        |  SELECT l.*,
        |    CAST(l_shipdate AS DATE) + CAST((l_orderkey * 13 + l_linenumber * 7) % 91 - 45 AS INT) AS l_commitdate,
        |    CAST(l_shipdate AS DATE) + CAST(1 + (l_orderkey * 5 + l_linenumber * 11) % 30 AS INT) AS l_receiptdate,
        |    CASE CAST((l_orderkey * 3 + l_linenumber) % 7 AS INT)
        |      WHEN 0 THEN 'REG AIR' WHEN 1 THEN 'AIR' WHEN 2 THEN 'RAIL' WHEN 3 THEN 'SHIP'
        |      WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'MAIL' ELSE 'FOB' END AS l_shipmode
        |  FROM tpch_lineitem l)
        |SELECT
        |  CAST(sum(CASE WHEN l_commitdate < l_receiptdate THEN 1 ELSE 0 END) AS BIGINT) AS late,
        |  CAST(sum(CASE WHEN l_commitdate >= l_receiptdate THEN 1 ELSE 0 END) AS BIGINT) AS ontime,
        |  CAST(sum(CASE WHEN l_shipdate < l_commitdate THEN 1 ELSE 0 END) AS BIGINT) AS ship_early,
        |  CAST(count(DISTINCT l_shipmode) AS BIGINT) AS modes,
        |  CAST(sum(CASE WHEN l_receiptdate <= l_shipdate THEN 1 ELSE 0 END) AS BIGINT) AS bad_receipt
        |FROM lineitem""".stripMargin).head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0,
      "commit<receipt must be non-trivial: both branches populated (q4/q21's predicate)")
    assert(r.getLong(2) > 0, "ship<commit must occur (q12's predicate)")
    assert(r.getLong(3) == 7, "the spec's full 7-value shipmode domain")
    assert(r.getLong(4) == 0, "receipt is strictly after ship (dbgen: ship + [1,30])")
  }

  test("verbatim q4 groups all five order priorities with positive counts") {
    val rows = q("tpch_q4_verbatim").collect()
    assert(rows.length == 5, "all five priorities have a late order in the window")
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    rows.foreach(r => assert(r.getLong(1) > 0))
  }

  test("verbatim q12 returns exactly the MAIL and SHIP groups, both columns populated") {
    val rows = q("tpch_q12_verbatim").collect()
    assert(rows.map(_.getString(0)).toSet == Set("MAIL", "SHIP"))
    rows.foreach(r => assert(r.getLong(1) > 0 && r.getLong(2) > 0))
  }

  test("verbatim q21 finds sole-blame suppliers, sorted by numwait desc") {
    // sf0.01: the sole-blame pattern (exactly one late supplier on a multi-supplier
    // 'F' order from one nation) needs more orders than sf0.001's ~100 to occur
    val rows = SparkEntry.queries("tpch_q21_verbatim")(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty, "some NATION_7 supplier is the only late one on a multi-supplier F order")
    val waits = rows.map(_.getLong(1)).toSeq
    assert(waits == waits.sortBy(-_), "numwait must be descending")
  }
}
