package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableIO

/**
 * SQL-text front door: the reference is used as a SQL engine (its TPC suites run `.sql`
 * resources), so graft must accept SQL TEXT, not just the DataFrame API. Each test runs a
 * Spark-SQL twin of a checklist query over registered temp views and proves it equals the
 * DataFrame-API result — and that injected components (RankLimitRule, native TopKPerKey,
 * SQL-registered vector functions) fire identically for SQL-authored plans.
 */
class SqlFrontDoorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def sameResult(sql: DataFrame, api: DataFrame): Unit = {
    assert(sql.columns.toSeq == api.columns.toSeq, "column names must match")
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty,
      "SQL text and DataFrame API must produce identical multisets")
  }

  test("tpch_q1 as SQL text equals the DataFrame plan") {
    TableIO.registerAll(spark, sf)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= CAST('2000-12-01' AS TIMESTAMP)
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    sameResult(sql, operators.TpchQueries.q1(spark, sf))
  }

  test("snowflake join as SQL text equals the DataFrame plan") {
    TableIO.registerAll(spark, sf)
    val sql = spark.sql(
      """SELECT r_name, year(o_orderdate) AS yr,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE p_size <= 25
        |GROUP BY r_name, year(o_orderdate)
        |ORDER BY r_name, yr""".stripMargin)
    sameResult(sql, operators.TpcdsShapedQueries.qDsSnowflake(spark, sf))
  }

  test("SQL-authored rank<=k filter goes through the native TopKPerKey rewrite") {
    TableIO.registerAll(spark, sf)
    val sql = spark.sql(
      """SELECT l_returnflag, rnk, l_orderkey, l_extendedprice FROM (
        |  SELECT l_returnflag, l_orderkey, l_extendedprice,
        |    rank() OVER (PARTITION BY l_returnflag
        |                 ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rnk
        |  FROM lineitem) t
        |WHERE rnk <= 3 ORDER BY l_returnflag, rnk""".stripMargin)
    sql.collect()
    assert(sql.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "the injected rule must fire for SQL-text plans too")
    sameResult(sql, operators.RelationalOps.qWindowRank(spark, sf))
  }

  test("grouping sets, semi/anti joins, and scalar subqueries work as SQL text") {
    TableIO.registerAll(spark, sf)
    val gs = spark.sql(
      """SELECT coalesce(l_returnflag, '(all)') AS rf, coalesce(l_linestatus, '(all)') AS ls,
        |  count(*) AS n, round(sum(l_extendedprice), 2) AS rev
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY rf, ls""".stripMargin)
    sameResult(gs, operators.RelationalOps.qGroupingSets(spark, sf))
    val semi = spark.sql(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin)
    assert(semi.count() > 0)
    val scalar = spark.sql(
      "SELECT count(*) AS n FROM part WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)")
    assert(scalar.head().getLong(0) > 0)
  }

  test("set operators, null semantics, and rollup as SQL text equal the DataFrame plans") {
    TableIO.registerAll(spark, sf)
    // the oracle SQL is ANSI enough that Spark parses it verbatim
    sameResult(spark.sql(operators.RelationalOps.qSetOpsSql),
      operators.RelationalOps.qSetOps(spark, sf))
    val rollup = spark.sql(
      """SELECT coalesce(l_returnflag, '(all)') AS rf, coalesce(l_linestatus, '(all)') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin)
    sameResult(rollup, operators.RelationalOps.qRollup(spark, sf))
    val nulls = spark.sql(
      """SELECT l_orderkey, l_linenumber,
        |  nullif(l_returnflag, 'N') <=> nullif(l_linestatus, 'O') AS nullsafe_eq,
        |  (nullif(l_returnflag, 'N') = nullif(l_linestatus, 'O')) IS NULL AS plain_eq_is_null,
        |  nullif(l_returnflag, 'N') <=> NULL AS is_null_via_nullsafe,
        |  CASE WHEN nullif(l_returnflag, 'N') IS NULL THEN 'was_null'
        |       ELSE nullif(l_returnflag, 'N') END AS filled
        |FROM lineitem""".stripMargin)
    sameResult(nulls, operators.RelationalOps.qNullSemantics(spark, sf))
  }

  test("explode, date extraction, and conditional aggregation as SQL text") {
    TableIO.registerAll(spark, sf)
    val explodeSql = spark.sql(
      """SELECT token, count(*) AS n FROM (
        |  SELECT explode(split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin)
    sameResult(explodeSql, operators.RelationalOps.qExplode(spark, sf)
      .select("token", "n"))
    val channels = spark.sql(
      """SELECT channel, yr, count(*) AS n, round(sum(o_totalprice), 2) AS rev
        |FROM (
        |  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'web'
        |              WHEN o_orderpriority = '3-MEDIUM' THEN 'catalog'
        |              ELSE 'store' END AS channel,
        |         year(o_orderdate) AS yr, o_totalprice
        |  FROM orders)
        |GROUP BY channel, yr ORDER BY channel, yr""".stripMargin)
    sameResult(channels, operators.TpcdsShapedQueries.qDsChannels(spark, sf))
  }

  test("PII scrub, normalization, and multi-band aggregation as SQL text") {
    TableIO.registerAll(spark, sf)
    val pii = spark.sql(
      """SELECT doc_id,
        |  size(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', 0)) AS n_emails,
        |  size(regexp_extract_all(text, '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', 0)) AS n_phones,
        |  size(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', 0)) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]'),
        |    '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', '[PHONE]'),
        |    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]') AS clean_text
        |FROM documents""".stripMargin)
    sameResult(pii, pipeline.TextAnalysis.textPii(spark, sf))
    val norm = spark.sql(
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' '),
        |       '\\s+', ' ')) AS norm_text
        |FROM documents""".stripMargin)
    sameResult(norm, pipeline.TextAnalysis.textNormalize(spark, sf))
    val bands = spark.sql(operators.TpcdsShapedQueries.qDsMultiBandSql)
    sameResult(bands, operators.TpcdsShapedQueries.qDsMultiBand(spark, sf))
  }

  test("native vector expressions are callable from SQL over a real table") {
    TableIO.registerAll(spark, sf)
    val sql = spark.sql(
      """SELECT a.vec_id, round(cosine_similarity(a.embedding, b.embedding), 4) AS cos4,
        |       round(dot_product(a.embedding, b.embedding), 4) AS dot4,
        |       round(l2_distance(a.embedding, b.embedding), 4) AS l24
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 20 ORDER BY a.vec_id""".stripMargin)
    assert(sql.count() > 0)
    sql.collect().foreach { r =>
      assert(!r.isNullAt(1) && math.abs(r.getDouble(1)) <= 1.0001)
    }
  }
}
