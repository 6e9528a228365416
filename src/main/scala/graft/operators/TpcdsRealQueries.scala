package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.TableIO

/**
 * REAL TPC-DS query texts, run verbatim through the SQL front door — the reference
 * tests actual TPC-DS SQL (gazelle_plugin: native-sql-engine/core/src/test/scala/com/
 * intel/oap/tpc/ds/TPCDSSuite.scala:1, query texts under .../test/resources/tpcds),
 * which round 5's 13 "DS-shaped" analogs proved plan-by-plan but nobody could paste a
 * DS query at. This object closes that: a deterministic DS star schema is derived from
 * the driver tables as views (store_sales/web_sales from lineitem x orders, date_dim a
 * generated calendar, item/customer/customer_address/demographics/store from the dims),
 * and 18 genuine TPC-DS query bodies (q3, q6, q7, q12, q19, q27, q34, q36, q42, q51,
 * q52, q55, q67, q68, q73, q74, q79, q98) run UNMODIFIED except for documented
 * parameter fits to this data's domains plus the repo's standard round-at-the-edge
 * hash discipline.
 *
 * Money columns in the synthetic fact views are QUANTIZED to whole currency units
 * (floor(x+0.5), engine-identical including at .5): every money sum is then an exact
 * integer-valued double, bit-identical across engines regardless of addition order,
 * and no rounded aggregate can land within one ULP of a .xx5 boundary with DIFFERENT
 * values on the two engines — the cross-engine rounding-tie class that bit q7/q12/q98
 * on first verification is structurally closed, not luck-patched.
 *
 * The SAME query body is prepended with a Spark-dialect prefix (run via spark.sql) and
 * a DuckDB-dialect prefix (the oracle): the only dialect splits are the calendar
 * generator (explode(sequence()) vs generate_series), date subtraction (datediff vs
 * DATE minus DATE) and STRING vs VARCHAR in casts. All view arithmetic is integer or
 * single-op double math, identical on both engines; every fractional division is
 * wrapped in floor() so neither engine's int-division/rounding rules leak in.
 *
 * Scale: the views are map-only over the scans (the one join, lineitem x orders, is
 * the natural fact-build shuffle on l_orderkey and is shared by every query). Catalyst
 * inlines the CTEs, so filter pushdown reaches parquet (d_year/d_moy predicates prune
 * the generated calendar before the fact join; AQE broadcast-joins every dim).
 */
object TpcdsRealQueries {

  private def prefix(spark: Boolean): String = {
    def days(e: String): String =
      if (spark) s"datediff(CAST($e AS DATE), DATE '1970-01-01')"
      else s"(CAST($e AS DATE) - DATE '1970-01-01')"
    val str = if (spark) "STRING" else "VARCHAR"
    val series =
      if (spark) "(SELECT explode(sequence(DATE '1995-01-01', DATE '2002-12-31')) AS d) t"
      else "generate_series(DATE '1995-01-01', DATE '2002-12-31', INTERVAL 1 DAY) t(d)"
    s"""WITH date_dim AS (
       |  SELECT ${days("d")} AS d_date_sk, CAST(d AS DATE) AS d_date,
       |    CAST(extract(year FROM d) AS INT) AS d_year, CAST(extract(month FROM d) AS INT) AS d_moy,
       |    CAST(extract(day FROM d) AS INT) AS d_dom,
       |    CAST((${days("d")} + 4) % 7 AS INT) AS d_dow,
       |    CASE CAST((${days("d")} + 4) % 7 AS INT) WHEN 0 THEN 'Sunday' WHEN 1 THEN 'Monday'
       |      WHEN 2 THEN 'Tuesday' WHEN 3 THEN 'Wednesday' WHEN 4 THEN 'Thursday'
       |      WHEN 5 THEN 'Friday' ELSE 'Saturday' END AS d_day_name,
       |    CAST(floor((${days("d")} + 4) / 7.0) AS INT) AS d_week_seq,
       |    CAST((extract(year FROM d) - 1970) * 12 + extract(month FROM d) - 1 AS INT) AS d_month_seq,
       |    CAST(floor((extract(month FROM d) - 1) / 3) + 1 AS INT) AS d_qoy
       |  FROM $series),
       |item AS (
       |  SELECT p_partkey AS i_item_sk, 'ITEM' || CAST(p_partkey AS $str) AS i_item_id,
       |    CAST(p_partkey % 50 AS INT) AS i_brand_id, p_brand AS i_brand,
       |    p_name AS i_class, p_type AS i_category, p_name AS i_item_desc,
       |    CAST(p_partkey % 100 AS INT) AS i_manufact_id,
       |    CAST(p_partkey % 100 AS INT) AS i_manager_id,
       |    CAST(floor(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) * (100 + p_partkey % 200) / 100) AS BIGINT) / CAST(100 AS DOUBLE) AS i_current_price,
       |    CAST(floor(p_retailprice * 0.7 + 0.5) AS DOUBLE) AS i_wholesale_cost
       |  FROM part),
       |customer_ds AS (
       |  SELECT c_custkey AS c_customer_sk, c_name AS c_customer_id,
       |    c_name AS c_first_name, 'LN' || CAST(c_custkey % 997 AS $str) AS c_last_name,
       |    c_custkey AS c_current_addr_sk, c_custkey AS c_current_cdemo_sk
       |  FROM customer),
       |customer_address AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    'ST' || CAST(c_custkey % 10 AS $str) AS ca_state,
       |    'CTY' || CAST(c_custkey % 30 AS $str) AS ca_county,
       |    'CITY' || CAST(c_custkey % 100 AS $str) AS ca_city,
       |    lpad(CAST(10000 + (c_custkey * 7) % 90000 AS $str), 5, '0') AS ca_zip,
       |    CAST(-5 - (c_custkey % 3) AS INT) AS ca_gmt_offset
       |  FROM customer),
       |household_demographics AS (
       |  SELECT c_custkey AS hd_demo_sk, CAST(c_custkey % 10 AS INT) AS hd_dep_count,
       |    CAST(CAST(floor(c_custkey / 10) AS BIGINT) % 5 AS INT) AS hd_vehicle_count,
       |    CASE WHEN c_custkey % 5 = 0 THEN '>10000' ELSE 'unknown' END AS hd_buy_potential
       |  FROM customer),
       |customer_demographics AS (
       |  SELECT c_custkey AS cd_demo_sk,
       |    CASE WHEN c_custkey % 2 = 0 THEN 'M' ELSE 'F' END AS cd_gender,
       |    CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 'M' WHEN 1 THEN 'S' ELSE 'D' END AS cd_marital_status,
       |    CASE CAST(c_custkey % 4 AS INT) WHEN 0 THEN 'Primary' WHEN 1 THEN 'Secondary'
       |         WHEN 2 THEN 'College' ELSE '4 yr Degree' END AS cd_education_status,
       |    CAST(500 * (c_custkey % 20 + 1) AS INT) AS cd_purchase_estimate,
       |    CASE CAST(c_custkey % 4 AS INT) WHEN 0 THEN 'Low Risk' WHEN 1 THEN 'Good'
       |         WHEN 2 THEN 'High Risk' ELSE 'Unknown' END AS cd_credit_rating,
       |    CAST(c_custkey % 7 AS INT) AS cd_dep_count,
       |    CAST(c_custkey % 5 AS INT) AS cd_dep_employed_count,
       |    CAST(c_custkey % 3 AS INT) AS cd_dep_college_count
       |  FROM customer),
       |store AS (
       |  SELECT n_nationkey AS s_store_sk, 'STORE' || CAST(n_nationkey AS $str) AS s_store_name,
       |    'SID' || CAST(n_nationkey AS $str) AS s_store_id,
       |    'ST' || CAST(n_nationkey % 10 AS $str) AS s_state,
       |    'CTY' || CAST(n_nationkey % 30 AS $str) AS s_county,
       |    'CITY' || CAST(n_nationkey % 100 AS $str) AS s_city,
       |    'COMPANY' || CAST(n_nationkey % 3 AS $str) AS s_company_name,
       |    CAST(-5 - (n_nationkey % 3) AS INT) AS s_gmt_offset,
       |    CAST(50 + n_nationkey * 7 AS INT) AS s_number_employees,
       |    lpad(CAST(20000 + n_nationkey * 137 AS $str), 5, '0') AS s_zip
       |  FROM nation WHERE n_nationkey < 10),
       |promotion AS (
       |  SELECT p_partkey AS p_promo_sk,
       |    CASE WHEN p_partkey % 3 = 0 THEN 'Y' ELSE 'N' END AS p_channel_email,
       |    CASE WHEN p_partkey % 5 = 0 THEN 'Y' ELSE 'N' END AS p_channel_event,
       |    CASE WHEN p_partkey % 7 = 0 THEN 'Y' ELSE 'N' END AS p_channel_tv
       |  FROM part WHERE p_partkey < 100),
       |store_sales AS (
       |  SELECT ${days("o_orderdate")} AS ss_sold_date_sk,
       |    (o_orderkey * 7 + l_partkey) % 86400 AS ss_sold_time_sk, l_partkey AS ss_item_sk,
       |    o_custkey AS ss_customer_sk, o_custkey AS ss_cdemo_sk, o_custkey AS ss_hdemo_sk,
       |    (o_custkey + o_orderkey * 13) % (SELECT count(*) FROM customer) AS ss_addr_sk,
       |    o_orderkey % 10 AS ss_store_sk, l_partkey % 100 AS ss_promo_sk,
       |    o_orderkey AS ss_ticket_number, CAST(l_quantity AS INT) AS ss_quantity,
       |    CAST(floor(l_extendedprice * 0.7 + 0.5) AS DOUBLE) AS ss_wholesale_cost, CAST(floor(l_extendedprice + 0.5) AS DOUBLE) AS ss_list_price,
       |    CAST(floor(l_extendedprice * (1 - l_discount) + 0.5) AS DOUBLE) AS ss_sales_price,
       |    CAST(floor(l_extendedprice * l_discount + 0.5) AS DOUBLE) AS ss_ext_discount_amt,
       |    CAST(floor(l_extendedprice * (1 - l_discount) + 0.5) AS DOUBLE) AS ss_ext_sales_price,
       |    CAST(floor(l_extendedprice + 0.5) AS DOUBLE) AS ss_ext_list_price,
       |    CAST(floor(l_extendedprice * 0.7 + 0.5) AS DOUBLE) AS ss_ext_wholesale_cost,
       |    CAST(floor(l_extendedprice * (1 - l_discount) * l_tax + 0.5) AS DOUBLE) AS ss_ext_tax,
       |    CAST(floor(l_extendedprice * l_discount + 0.5) AS DOUBLE) AS ss_coupon_amt,
       |    CAST(floor(l_extendedprice * (1 - l_discount) + 0.5) AS DOUBLE) AS ss_net_paid,
       |    CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) + 0.5) AS DOUBLE) AS ss_net_paid_inc_tax,
       |    CAST(floor(l_extendedprice * (1 - l_discount) - l_extendedprice * 0.7 + 0.5) AS DOUBLE) AS ss_net_profit
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderkey % 4 <> 1),
       |web_sales AS (
       |  SELECT ${days("o_orderdate")} AS ws_sold_date_sk, l_partkey AS ws_item_sk,
       |    o_custkey AS ws_bill_customer_sk,
       |    o_orderkey AS ws_order_number, CAST(l_quantity AS INT) AS ws_quantity,
       |    l_suppkey % 5 AS ws_warehouse_sk,
       |    CAST(floor(l_extendedprice + 0.5) AS DOUBLE) AS ws_ext_list_price,
       |    CAST(floor(l_extendedprice * (1 - l_discount) + 0.5) AS DOUBLE) AS ws_ext_sales_price,
       |    CAST(floor(l_extendedprice * (1 - l_discount) + 0.5) AS DOUBLE) AS ws_net_paid,
       |    CAST(floor(l_extendedprice * (1 - l_discount) - l_extendedprice * 0.7 + 0.5) AS DOUBLE) AS ws_net_profit
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderkey % 4 = 1),
       |catalog_sales AS (
       |  SELECT ${days("o_orderdate")} AS cs_sold_date_sk, l_partkey AS cs_item_sk,
       |    o_custkey AS cs_bill_customer_sk, o_custkey AS cs_ship_customer_sk,
       |    o_orderkey AS cs_order_number, CAST(l_quantity AS INT) AS cs_quantity,
       |    CAST(floor(l_extendedprice * 0.7 + 0.5) AS DOUBLE) AS cs_wholesale_cost,
       |    CAST(floor(l_extendedprice + 0.5) AS DOUBLE) AS cs_ext_list_price,
       |    CAST(floor(l_extendedprice * (1 - l_discount) + 0.5) AS DOUBLE) AS cs_ext_sales_price,
       |    CAST(floor(l_extendedprice * l_discount + 0.5) AS DOUBLE) AS cs_ext_discount_amt,
       |    CAST(floor(l_extendedprice * (1 - l_discount) + 0.5) AS DOUBLE) AS cs_net_paid,
       |    CAST(floor(l_extendedprice * (1 - l_discount) - l_extendedprice * 0.7 + 0.5) AS DOUBLE) AS cs_net_profit
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderkey % 4 = 3)
       |""".stripMargin
  }

  /** Splice a query body onto the schema prefix (merging the body's own WITH). */
  private def splice(pfx: String, body: String): String = {
    val b = body.trim
    if (b.toUpperCase.startsWith("WITH ")) pfx + "," + b.substring(5) else pfx + b
  }

  // ---- the 12 verbatim bodies (TPC-DS v2 texts; parameters fitted to this data) ----

  private val q3 = """
SELECT d_year, i_brand_id AS brand_id, i_brand AS brand,
  round(sum(ss_ext_sales_price), 2) AS sum_agg
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manufact_id = 50
  AND dt.d_moy = 11
GROUP BY d_year, i_brand, i_brand_id
ORDER BY d_year, sum_agg DESC, brand_id, brand"""

  private val q6 = """
SELECT a.ca_state AS state, CAST(count(*) AS BIGINT) AS cnt
FROM customer_address a, customer_ds c, store_sales s, date_dim d, item i
WHERE a.ca_address_sk = c.c_current_addr_sk
  AND c.c_customer_sk = s.ss_customer_sk
  AND s.ss_sold_date_sk = d.d_date_sk
  AND s.ss_item_sk = i.i_item_sk
  AND d.d_month_seq =
      (SELECT DISTINCT d_month_seq FROM date_dim WHERE d_year = 1998 AND d_moy = 3)
  AND i.i_current_price > 1.2 *
      (SELECT avg(j.i_current_price) FROM item j WHERE j.i_category = i.i_category)
GROUP BY a.ca_state
HAVING count(*) >= 1
ORDER BY cnt, state"""

  private val q27 = """
SELECT i_item_id, s_state, CAST(grouping(s_state) AS INT) AS g_state,
  round(avg(ss_quantity), 4) AS agg1,
  round(avg(ss_list_price), 4) AS agg2,
  round(avg(ss_coupon_amt), 4) AS agg3,
  round(avg(ss_sales_price), 4) AS agg4
FROM store_sales, customer_demographics, date_dim, store, item
WHERE ss_sold_date_sk = d_date_sk
  AND ss_item_sk = i_item_sk
  AND ss_store_sk = s_store_sk
  AND ss_cdemo_sk = cd_demo_sk
  AND cd_gender = 'M' AND cd_marital_status = 'S' AND cd_education_status = 'College'
  AND d_year = 1998 AND s_state IN ('ST1', 'ST2', 'ST3')
GROUP BY ROLLUP (i_item_id, s_state)
ORDER BY i_item_id, s_state"""

  private val q34 = """
SELECT c_last_name, c_first_name, c_customer_id, ss_ticket_number, cnt
FROM (
  SELECT ss_ticket_number, ss_customer_sk, count(*) AS cnt
  FROM store_sales, date_dim, store, household_demographics
  WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
    AND store_sales.ss_store_sk = store.s_store_sk
    AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    AND (date_dim.d_dom BETWEEN 1 AND 3 OR date_dim.d_dom BETWEEN 25 AND 28)
    AND household_demographics.hd_buy_potential = '>10000'
    AND household_demographics.hd_vehicle_count > 0
    AND date_dim.d_year IN (1998, 1999, 2000)
    AND store.s_county IN ('CTY1', 'CTY2', 'CTY3', 'CTY4')
  GROUP BY ss_ticket_number, ss_customer_sk) dn, customer_ds
WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 4 AND 13
ORDER BY c_last_name, c_first_name, c_customer_id, ss_ticket_number, cnt DESC"""

  private val q42 = """
SELECT d_year, i_category, round(sum(ss_ext_sales_price), 2) AS total_sales
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND dt.d_moy = 11 AND dt.d_year = 1998
GROUP BY d_year, i_category
ORDER BY total_sales DESC, d_year, i_category"""

  private val q51 = """
WITH web_v1 AS (
  SELECT ws_item_sk item_sk, d_date,
    sum(sum(ws_ext_sales_price)) OVER (PARTITION BY ws_item_sk ORDER BY d_date
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cume_sales
  FROM web_sales, date_dim
  WHERE ws_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 346 AND 349
    AND ws_item_sk IS NOT NULL
  GROUP BY ws_item_sk, d_date),
store_v1 AS (
  SELECT ss_item_sk item_sk, d_date,
    sum(sum(ss_ext_sales_price)) OVER (PARTITION BY ss_item_sk ORDER BY d_date
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cume_sales
  FROM store_sales, date_dim
  WHERE ss_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 346 AND 349
    AND ss_item_sk IS NOT NULL
  GROUP BY ss_item_sk, d_date)
SELECT item_sk, d_date, web_sales, store_sales_c, web_cumulative, store_cumulative
FROM (
  SELECT CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk ELSE store.item_sk END item_sk,
    CASE WHEN web.d_date IS NOT NULL THEN web.d_date ELSE store.d_date END d_date,
    round(web.cume_sales, 2) web_sales,
    round(store.cume_sales, 2) store_sales_c,
    round(max(web.cume_sales) OVER (PARTITION BY CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk ELSE store.item_sk END
      ORDER BY CASE WHEN web.d_date IS NOT NULL THEN web.d_date ELSE store.d_date END
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) web_cumulative,
    round(max(store.cume_sales) OVER (PARTITION BY CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk ELSE store.item_sk END
      ORDER BY CASE WHEN web.d_date IS NOT NULL THEN web.d_date ELSE store.d_date END
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) store_cumulative
  FROM web_v1 web FULL OUTER JOIN store_v1 store
    ON web.item_sk = store.item_sk AND web.d_date = store.d_date) x
WHERE web_cumulative > store_cumulative
ORDER BY item_sk, d_date"""

  private val q52 = """
SELECT d_year, i_brand_id AS brand_id, i_brand AS brand,
  round(sum(ss_ext_sales_price), 2) AS ext_price
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND dt.d_moy = 12 AND dt.d_year = 1997
GROUP BY d_year, i_brand, i_brand_id
ORDER BY d_year, ext_price DESC, brand_id, brand"""

  private val q55 = """
SELECT i_brand_id AS brand_id, i_brand AS brand,
  round(sum(ss_ext_sales_price), 2) AS ext_price
FROM date_dim, store_sales, item
WHERE d_date_sk = ss_sold_date_sk
  AND ss_item_sk = i_item_sk
  AND i_manager_id = 28
  AND d_moy = 11 AND d_year = 1999
GROUP BY i_brand, i_brand_id
ORDER BY ext_price DESC, brand_id, brand"""

  private val q67 = """
SELECT i_category, i_class, i_brand, i_item_id, d_year, d_qoy, d_moy, s_store_sk,
  sumsales, rk
FROM (
  SELECT i_category, i_class, i_brand, i_item_id, d_year, d_qoy, d_moy, s_store_sk,
    sumsales,
    rank() OVER (PARTITION BY i_category ORDER BY sumsales DESC NULLS LAST,
                 i_class NULLS FIRST, i_brand NULLS FIRST, i_item_id NULLS FIRST,
                 d_year NULLS FIRST, d_qoy NULLS FIRST, d_moy NULLS FIRST,
                 s_store_sk NULLS FIRST) rk
  FROM (
    SELECT i_category, i_class, i_brand, i_item_id, d_year, d_qoy, d_moy, s_store_sk,
      round(sum(coalesce(ss_sales_price * ss_quantity, 0)), 2) sumsales
    FROM store_sales, date_dim, store, item
    WHERE ss_sold_date_sk = d_date_sk
      AND ss_item_sk = i_item_sk
      AND ss_store_sk = s_store_sk
      AND d_month_seq BETWEEN 340 AND 351
    GROUP BY ROLLUP (i_category, i_class, i_brand, i_item_id, d_year, d_qoy, d_moy,
                     s_store_sk)) dw1) dw2
WHERE rk <= 10
ORDER BY i_category, i_class, i_brand, i_item_id, d_year, d_qoy, d_moy, s_store_sk,
  sumsales, rk"""

  private val q68 = """
SELECT c_last_name, c_first_name, dn.ca_city AS bought_city, ss_ticket_number,
  extended_price, extended_tax, list_price
FROM (
  SELECT ss_ticket_number, ss_customer_sk, ca_city,
    round(sum(ss_ext_sales_price), 2) AS extended_price,
    round(sum(ss_ext_list_price), 2) AS list_price,
    round(sum(ss_ext_tax), 2) AS extended_tax
  FROM store_sales, date_dim, store, household_demographics, customer_address
  WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
    AND store_sales.ss_store_sk = store.s_store_sk
    AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    AND store_sales.ss_addr_sk = customer_address.ca_address_sk
    AND date_dim.d_dom BETWEEN 1 AND 2
    AND (household_demographics.hd_dep_count = 4
         OR household_demographics.hd_vehicle_count = 3)
    AND date_dim.d_year IN (1998, 1999, 2000)
    AND store.s_city IN ('CITY1', 'CITY2')
  GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
  customer_ds, customer_address current_addr
WHERE ss_customer_sk = c_customer_sk
  AND customer_ds.c_current_addr_sk = current_addr.ca_address_sk
  AND current_addr.ca_city <> dn.ca_city
ORDER BY c_last_name, c_first_name, dn.ca_city, ss_ticket_number"""

  private val q73 = """
SELECT c_last_name, c_first_name, c_customer_id, ss_ticket_number, cnt
FROM (
  SELECT ss_ticket_number, ss_customer_sk, count(*) AS cnt
  FROM store_sales, date_dim, store, household_demographics
  WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
    AND store_sales.ss_store_sk = store.s_store_sk
    AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    AND date_dim.d_dom BETWEEN 1 AND 2
    AND (household_demographics.hd_buy_potential = '>10000'
         OR household_demographics.hd_buy_potential = 'unknown')
    AND household_demographics.hd_vehicle_count > 0
    AND date_dim.d_year IN (1998, 1999, 2000)
    AND store.s_county IN ('CTY0', 'CTY5', 'CTY7', 'CTY9')
  GROUP BY ss_ticket_number, ss_customer_sk) dj, customer_ds
WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 1 AND 5
ORDER BY cnt DESC, c_last_name ASC, c_first_name, c_customer_id, ss_ticket_number"""

  private val q74 = """
WITH year_total AS (
  SELECT c_customer_id customer_id, c_first_name customer_first_name,
    c_last_name customer_last_name, d_year AS year_,
    sum(ss_net_paid) year_total, 's' sale_type
  FROM customer_ds, store_sales, date_dim
  WHERE c_customer_sk = ss_customer_sk
    AND ss_sold_date_sk = d_date_sk
    AND d_year IN (1999, 2000)
  GROUP BY c_customer_id, c_first_name, c_last_name, d_year
  UNION ALL
  SELECT c_customer_id customer_id, c_first_name customer_first_name,
    c_last_name customer_last_name, d_year AS year_,
    sum(ws_net_paid) year_total, 'w' sale_type
  FROM customer_ds, web_sales, date_dim
  WHERE c_customer_sk = ws_bill_customer_sk
    AND ws_sold_date_sk = d_date_sk
    AND d_year IN (1999, 2000)
  GROUP BY c_customer_id, c_first_name, c_last_name, d_year)
SELECT t_s_secyear.customer_id, t_s_secyear.customer_first_name,
  t_s_secyear.customer_last_name
FROM year_total t_s_firstyear, year_total t_s_secyear,
     year_total t_w_firstyear, year_total t_w_secyear
WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
  AND t_s_firstyear.sale_type = 's' AND t_w_firstyear.sale_type = 'w'
  AND t_s_secyear.sale_type = 's' AND t_w_secyear.sale_type = 'w'
  AND t_s_firstyear.year_ = 1999 AND t_s_secyear.year_ = 2000
  AND t_w_firstyear.year_ = 1999 AND t_w_secyear.year_ = 2000
  AND t_s_firstyear.year_total > 0 AND t_w_firstyear.year_total > 0
  AND round(CASE WHEN t_w_firstyear.year_total > 0
           THEN t_w_secyear.year_total / t_w_firstyear.year_total ELSE NULL END, 6)
    > round(CASE WHEN t_s_firstyear.year_total > 0
           THEN t_s_secyear.year_total / t_s_firstyear.year_total ELSE NULL END, 6)
ORDER BY t_s_secyear.customer_id, t_s_secyear.customer_first_name,
  t_s_secyear.customer_last_name"""


  private val q7 = """
SELECT i_item_id,
  round(avg(ss_quantity), 4) AS agg1,
  round(avg(ss_list_price), 4) AS agg2,
  round(avg(ss_coupon_amt), 4) AS agg3,
  round(avg(ss_sales_price), 4) AS agg4
FROM store_sales, customer_demographics, date_dim, item, promotion
WHERE ss_sold_date_sk = d_date_sk
  AND ss_item_sk = i_item_sk
  AND ss_cdemo_sk = cd_demo_sk
  AND ss_promo_sk = p_promo_sk
  AND cd_gender = 'F' AND cd_marital_status = 'S' AND cd_education_status = 'Secondary'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND d_year = 1999
GROUP BY i_item_id
ORDER BY i_item_id"""

  private val q12 = """
SELECT i_item_id, i_item_desc, i_category, i_class,
  round(i_current_price, 2) AS i_current_price,
  round(sum(ws_ext_sales_price), 2) AS itemrevenue,
  round(sum(ws_ext_sales_price) * 100.0 / sum(sum(ws_ext_sales_price))
        OVER (PARTITION BY i_class), 4) AS revenueratio
FROM web_sales, item, date_dim
WHERE ws_item_sk = i_item_sk
  AND i_category IN ('LARGE', 'MEDIUM', 'SMALL')
  AND ws_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '1999-02-22' AND DATE '1999-03-24'
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio"""

  private val q19 = """
SELECT i_brand_id AS brand_id, i_brand AS brand, i_manufact_id,
  round(sum(ss_ext_sales_price), 2) AS ext_price
FROM date_dim, store_sales, item, customer_ds, customer_address, store
WHERE d_date_sk = ss_sold_date_sk
  AND ss_item_sk = i_item_sk
  AND i_manager_id = 8
  AND d_moy = 11 AND d_year = 1998
  AND ss_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
  AND ss_store_sk = s_store_sk
GROUP BY i_brand, i_brand_id, i_manufact_id
ORDER BY ext_price DESC, brand_id, brand, i_manufact_id"""

  private val q36 = """
SELECT gross_margin, i_category, i_class, lochierarchy, rank_within_parent
FROM (
  SELECT round(sum(ss_net_profit) / sum(ss_ext_sales_price), 6) AS gross_margin,
    i_category, i_class,
    CAST(grouping(i_category) + grouping(i_class) AS INT) AS lochierarchy,
    rank() OVER (
      PARTITION BY grouping(i_category) + grouping(i_class),
        CASE WHEN grouping(i_class) = 1 THEN NULL ELSE i_category END
      ORDER BY round(sum(ss_net_profit) / sum(ss_ext_sales_price), 6) ASC,
        i_category, i_class) AS rank_within_parent
  FROM store_sales, date_dim, item, store
  WHERE d_year = 1999
    AND d_date_sk = ss_sold_date_sk
    AND i_item_sk = ss_item_sk
    AND s_store_sk = ss_store_sk
    AND s_state IN ('ST1', 'ST2', 'ST3', 'ST4')
  GROUP BY ROLLUP (i_category, i_class)) t
ORDER BY lochierarchy DESC, CASE WHEN lochierarchy = 0 THEN i_category END,
  rank_within_parent, i_category, i_class"""

  private val q79 = """
SELECT c_last_name, c_first_name, substr(s_city, 1, 30) AS city30, ss_ticket_number,
  amt, profit
FROM (
  SELECT ss_ticket_number, ss_customer_sk, store.s_city,
    round(sum(ss_coupon_amt), 2) AS amt,
    round(sum(ss_net_profit), 2) AS profit
  FROM store_sales, date_dim, store, household_demographics
  WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
    AND store_sales.ss_store_sk = store.s_store_sk
    AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    AND (household_demographics.hd_dep_count = 4
         OR household_demographics.hd_vehicle_count > 3)
    AND date_dim.d_dow = 1
    AND date_dim.d_year IN (1998, 1999, 2000)
    AND store.s_number_employees BETWEEN 50 AND 120
  GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, store.s_city) ms, customer_ds
WHERE ss_customer_sk = c_customer_sk
ORDER BY c_last_name, c_first_name, city30, profit, ss_ticket_number"""

  private val q98 = """
SELECT i_item_id, i_item_desc, i_category, i_class,
  round(i_current_price, 2) AS i_current_price,
  round(sum(ss_ext_sales_price), 2) AS itemrevenue,
  round(sum(ss_ext_sales_price) * 100.0 / sum(sum(ss_ext_sales_price))
        OVER (PARTITION BY i_class), 4) AS revenueratio
FROM store_sales, item, date_dim
WHERE ss_item_sk = i_item_sk
  AND i_category IN ('PROMO', 'STANDARD', 'ECONOMY')
  AND ss_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '1999-02-22' AND DATE '1999-03-24'
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio"""

  // ---- the 9 store-channel "modifiedQueries" (reference: native-sql-engine/core/src/
  // test/resources/tpcds-modifiedQueries/*.sql — the Impala-style variants the
  // reference's TPCDSSuite actually runs). Parameter fits documented per query:
  // years/month-seqs/date-sk partition filters moved into this data's 1995-2002
  // domain, category/class/brand/county/city IN-lists drawn from the derived
  // dimensions' actual value sets, `customer` -> `customer_ds` (TPC-H's own customer
  // table owns the bare name), and `left semi join` spelled `semi join` (the one
  // spelling both SQL dialects parse).

  private val q10m = """
WITH v1 AS (
  SELECT ws_bill_customer_sk AS customer_sk
  FROM web_sales, date_dim
  WHERE ws_sold_date_sk = d_date_sk AND d_year = 2000 AND d_moy BETWEEN 4 AND 4+3
  UNION ALL
  SELECT cs_ship_customer_sk AS customer_sk
  FROM catalog_sales, date_dim
  WHERE cs_sold_date_sk = d_date_sk AND d_year = 2000 AND d_moy BETWEEN 4 AND 4+3),
v2 AS (
  SELECT ss_customer_sk AS customer_sk
  FROM store_sales, date_dim
  WHERE ss_sold_date_sk = d_date_sk AND d_year = 2000 AND d_moy BETWEEN 4 AND 4+3)
SELECT cd_gender, cd_marital_status, cd_education_status, count(*) cnt1,
  cd_purchase_estimate, count(*) cnt2, cd_credit_rating, count(*) cnt3,
  cd_dep_count, count(*) cnt4, cd_dep_employed_count, count(*) cnt5,
  cd_dep_college_count, count(*) cnt6
FROM customer_ds c
JOIN customer_address ca ON (c.c_current_addr_sk = ca.ca_address_sk)
JOIN customer_demographics ON (cd_demo_sk = c.c_current_cdemo_sk)
SEMI JOIN v1 ON (v1.customer_sk = c.c_customer_sk)
SEMI JOIN v2 ON (v2.customer_sk = c.c_customer_sk)
WHERE ca_county IN ('CTY1', 'CTY2', 'CTY3', 'CTY4', 'CTY5')
GROUP BY cd_gender, cd_marital_status, cd_education_status, cd_purchase_estimate,
  cd_credit_rating, cd_dep_count, cd_dep_employed_count, cd_dep_college_count
ORDER BY cd_gender, cd_marital_status, cd_education_status, cd_purchase_estimate,
  cd_credit_rating, cd_dep_count, cd_dep_employed_count, cd_dep_college_count
LIMIT 100"""

  private val q43 = """
SELECT s_store_name, s_store_id,
  sum(CASE WHEN (d_day_name = 'Sunday') THEN ss_sales_price ELSE null END) sun_sales,
  sum(CASE WHEN (d_day_name = 'Monday') THEN ss_sales_price ELSE null END) mon_sales,
  sum(CASE WHEN (d_day_name = 'Tuesday') THEN ss_sales_price ELSE null END) tue_sales,
  sum(CASE WHEN (d_day_name = 'Wednesday') THEN ss_sales_price ELSE null END) wed_sales,
  sum(CASE WHEN (d_day_name = 'Thursday') THEN ss_sales_price ELSE null END) thu_sales,
  sum(CASE WHEN (d_day_name = 'Friday') THEN ss_sales_price ELSE null END) fri_sales,
  sum(CASE WHEN (d_day_name = 'Saturday') THEN ss_sales_price ELSE null END) sat_sales
FROM date_dim, store_sales, store
WHERE d_date_sk = ss_sold_date_sk
  AND s_store_sk = ss_store_sk
  AND s_gmt_offset = -5
  AND d_year = 1998
  AND ss_sold_date_sk BETWEEN 10227 AND 10591  -- partition key filter
GROUP BY s_store_name, s_store_id
ORDER BY s_store_name, s_store_id, sun_sales, mon_sales, tue_sales, wed_sales,
  thu_sales, fri_sales, sat_sales
LIMIT 100"""

  private val q46 = """
SELECT c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number, amt, profit
FROM (
  SELECT ss_ticket_number, ss_customer_sk, ca_city bought_city,
    sum(ss_coupon_amt) amt, sum(ss_net_profit) profit
  FROM store_sales, date_dim, store, household_demographics, customer_address
  WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
    AND store_sales.ss_store_sk = store.s_store_sk
    AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    AND store_sales.ss_addr_sk = customer_address.ca_address_sk
    AND (household_demographics.hd_dep_count = 5
      OR household_demographics.hd_vehicle_count = 3)
    AND date_dim.d_dow IN (6, 0)
    AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
    AND store.s_city IN ('CITY1', 'CITY2', 'CITY3', 'CITY4', 'CITY5')
    AND ss_sold_date_sk BETWEEN 10592 AND 11687  -- partition key filter
  GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
  customer_ds, customer_address current_addr
WHERE ss_customer_sk = c_customer_sk
  AND customer_ds.c_current_addr_sk = current_addr.ca_address_sk
  AND current_addr.ca_city <> bought_city
ORDER BY c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number
LIMIT 100"""

  private val q53 = """
SELECT *
FROM (
  SELECT i_manufact_id, sum(ss_sales_price) sum_sales,
    avg(sum(ss_sales_price)) OVER (PARTITION BY i_manufact_id) avg_quarterly_sales
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND d_month_seq IN (336, 336 + 1, 336 + 2, 336 + 3, 336 + 4, 336 + 5, 336 + 6,
                        336 + 7, 336 + 8, 336 + 9, 336 + 10, 336 + 11)
    AND ((i_category IN ('ECONOMY', 'STANDARD', 'LARGE')
      AND i_class IN ('blue bolt', 'red widget', 'small ring', 'hot gear')
      AND i_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#4'))
    OR (i_category IN ('MEDIUM', 'SMALL', 'PROMO')
      AND i_class IN ('cold anvil', 'new plate', 'old rod', 'large gizmo')
      AND i_brand IN ('Brand#5', 'Brand#6', 'Brand#7', 'Brand#8')))
    AND ss_sold_date_sk BETWEEN 10227 AND 10591 -- partition key filter
  GROUP BY i_manufact_id, d_qoy) tmp1
WHERE CASE WHEN avg_quarterly_sales > 0
      THEN abs(sum_sales - avg_quarterly_sales) / avg_quarterly_sales ELSE null END > 0.1
ORDER BY avg_quarterly_sales, sum_sales, i_manufact_id
LIMIT 100"""

  private val q59 = """
WITH wss AS (
  SELECT d_week_seq, ss_store_sk,
    sum(CASE WHEN (d_day_name = 'Sunday') THEN ss_sales_price ELSE null END) sun_sales,
    sum(CASE WHEN (d_day_name = 'Monday') THEN ss_sales_price ELSE null END) mon_sales,
    sum(CASE WHEN (d_day_name = 'Tuesday') THEN ss_sales_price ELSE null END) tue_sales,
    sum(CASE WHEN (d_day_name = 'Wednesday') THEN ss_sales_price ELSE null END) wed_sales,
    sum(CASE WHEN (d_day_name = 'Thursday') THEN ss_sales_price ELSE null END) thu_sales,
    sum(CASE WHEN (d_day_name = 'Friday') THEN ss_sales_price ELSE null END) fri_sales,
    sum(CASE WHEN (d_day_name = 'Saturday') THEN ss_sales_price ELSE null END) sat_sales
  FROM store_sales, date_dim
  WHERE d_date_sk = ss_sold_date_sk
  GROUP BY d_week_seq, ss_store_sk)
SELECT s_store_name1, s_store_id1, d_week_seq1,
  round(sun_sales1 / sun_sales2, 6) sun_ratio,
  round(mon_sales1 / mon_sales2, 6) mon_ratio,
  round(tue_sales1 / tue_sales1, 6) tue_ratio,
  round(wed_sales1 / wed_sales2, 6) wed_ratio,
  round(thu_sales1 / thu_sales2, 6) thu_ratio,
  round(fri_sales1 / fri_sales2, 6) fri_ratio,
  round(sat_sales1 / sat_sales2, 6) sat_ratio
FROM (
  SELECT s_store_name s_store_name1, wss.d_week_seq d_week_seq1,
    s_store_id s_store_id1, sun_sales sun_sales1, mon_sales mon_sales1,
    tue_sales tue_sales1, wed_sales wed_sales1, thu_sales thu_sales1,
    fri_sales fri_sales1, sat_sales sat_sales1
  FROM wss, store, date_dim d
  WHERE d.d_week_seq = wss.d_week_seq
    AND ss_store_sk = s_store_sk
    AND d_month_seq BETWEEN 336 AND 336 + 11) y,
  (SELECT s_store_name s_store_name2, wss.d_week_seq d_week_seq2,
    s_store_id s_store_id2, sun_sales sun_sales2, mon_sales mon_sales2,
    tue_sales tue_sales2, wed_sales wed_sales2, thu_sales thu_sales2,
    fri_sales fri_sales2, sat_sales sat_sales2
  FROM wss, store, date_dim d
  WHERE d.d_week_seq = wss.d_week_seq
    AND ss_store_sk = s_store_sk
    AND d_month_seq BETWEEN 336 + 12 AND 336 + 23) x
WHERE s_store_id1 = s_store_id2
  AND d_week_seq1 = d_week_seq2 - 52
ORDER BY s_store_name1, s_store_id1, d_week_seq1
LIMIT 100"""

  private val q63 = """
SELECT *
FROM (
  SELECT i_manager_id, sum(ss_sales_price) sum_sales,
    avg(sum(ss_sales_price)) OVER (PARTITION BY i_manager_id) avg_monthly_sales
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND ss_sold_date_sk BETWEEN 10592 AND 10956
    AND ss_store_sk = s_store_sk
    AND d_month_seq IN (348, 348+1, 348+2, 348+3, 348+4, 348+5, 348+6, 348+7,
                        348+8, 348+9, 348+10, 348+11)
    AND ((i_category IN ('ECONOMY', 'STANDARD', 'LARGE')
      AND i_class IN ('blue bolt', 'red widget', 'small ring', 'hot gear')
      AND i_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#4'))
    OR (i_category IN ('MEDIUM', 'SMALL', 'PROMO')
      AND i_class IN ('cold anvil', 'new plate', 'old rod', 'large gizmo')
      AND i_brand IN ('Brand#5', 'Brand#6', 'Brand#7', 'Brand#8')))
  GROUP BY i_manager_id, d_moy) tmp1
WHERE CASE WHEN avg_monthly_sales > 0
      THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales ELSE null END > 0.1
ORDER BY i_manager_id, avg_monthly_sales, sum_sales
LIMIT 100"""

  private val q65 = """
SELECT s_store_name, i_item_desc, sc.revenue, i_current_price, i_wholesale_cost, i_brand
FROM store, item,
  (SELECT ss_store_sk, avg(revenue) AS ave
  FROM (
    SELECT ss_store_sk, ss_item_sk, sum(ss_sales_price) AS revenue
    FROM store_sales, date_dim
    WHERE ss_sold_date_sk = d_date_sk
      AND d_month_seq BETWEEN 336 AND 336 + 11
      AND ss_sold_date_sk BETWEEN 10227 AND 10591  -- partition key filter
    GROUP BY ss_store_sk, ss_item_sk) sa
  GROUP BY ss_store_sk) sb,
  (SELECT ss_store_sk, ss_item_sk, sum(ss_sales_price) AS revenue
  FROM store_sales, date_dim
  WHERE ss_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 336 AND 336 + 11
    AND ss_sold_date_sk BETWEEN 10227 AND 10591  -- partition key filter
  GROUP BY ss_store_sk, ss_item_sk) sc
WHERE sb.ss_store_sk = sc.ss_store_sk
  AND sc.revenue <= 0.1 * sb.ave
  AND s_store_sk = sc.ss_store_sk
  AND i_item_sk = sc.ss_item_sk
ORDER BY s_store_name, i_item_desc, sc.revenue, i_current_price, i_wholesale_cost, i_brand
LIMIT 100"""

  private val q89 = """
SELECT *
FROM (
  SELECT i_category, i_class, i_brand, s_store_name, s_company_name, d_moy,
    sum(ss_sales_price) sum_sales,
    avg(sum(ss_sales_price)) OVER (PARTITION BY i_category, i_brand, s_store_name,
                                   s_company_name) avg_monthly_sales
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND d_year IN (2000)
    AND ((i_category IN ('ECONOMY', 'STANDARD', 'LARGE')
        AND i_class IN ('blue bolt', 'red widget', 'small ring'))
      OR (i_category IN ('MEDIUM', 'SMALL', 'PROMO')
        AND i_class IN ('cold anvil', 'new plate', 'old rod')))
    AND ss_sold_date_sk BETWEEN 10957 AND 11322  -- partition key filter
  GROUP BY i_category, i_class, i_brand, s_store_name, s_company_name, d_moy) tmp1
WHERE CASE WHEN (avg_monthly_sales <> 0)
      THEN (abs(sum_sales - avg_monthly_sales) / avg_monthly_sales) ELSE null END > 0.1
ORDER BY sum_sales - avg_monthly_sales, s_store_name, i_category, i_class, i_brand,
  s_company_name, d_moy
LIMIT 100"""

  private val ssMax = """
SELECT
  count(*) AS total,
  count(ss_sold_date_sk) AS not_null_total,
  count(DISTINCT ss_sold_date_sk) AS unique_days,
  max(ss_sold_date_sk) AS max_ss_sold_date_sk,
  max(ss_sold_time_sk) AS max_ss_sold_time_sk,
  max(ss_item_sk) AS max_ss_item_sk,
  max(ss_customer_sk) AS max_ss_customer_sk,
  max(ss_cdemo_sk) AS max_ss_cdemo_sk,
  max(ss_hdemo_sk) AS max_ss_hdemo_sk,
  max(ss_addr_sk) AS max_ss_addr_sk,
  max(ss_store_sk) AS max_ss_store_sk,
  max(ss_promo_sk) AS max_ss_promo_sk
FROM store_sales"""

  private val bodies: Map[String, String] = Map(
    "tpcds_q3" -> q3, "tpcds_q6" -> q6, "tpcds_q27" -> q27, "tpcds_q34" -> q34,
    "tpcds_q42" -> q42, "tpcds_q51" -> q51, "tpcds_q52" -> q52, "tpcds_q55" -> q55,
    "tpcds_q67" -> q67, "tpcds_q68" -> q68, "tpcds_q73" -> q73, "tpcds_q74" -> q74,
    "tpcds_q7" -> q7, "tpcds_q12" -> q12, "tpcds_q19" -> q19, "tpcds_q36" -> q36,
    "tpcds_q79" -> q79, "tpcds_q98" -> q98,
    "tpcds_q10" -> q10m, "tpcds_q43" -> q43, "tpcds_q46" -> q46, "tpcds_q53" -> q53,
    "tpcds_q59" -> q59, "tpcds_q63" -> q63, "tpcds_q65" -> q65, "tpcds_q89" -> q89,
    "tpcds_ss_max" -> ssMax)

  val all: Map[String, (SparkSession, String) => DataFrame] =
    bodies.map { case (name, body) =>
      name -> { (s: SparkSession, dir: String) =>
        TableIO.registerAll(s, dir)
        s.sql(splice(prefix(spark = true), body))
      }
    }

  val oracles: Map[String, String] =
    bodies.map { case (name, body) => name -> splice(prefix(spark = false), body) }
}
