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
 * and 119 genuine TPC-DS query bodies run UNMODIFIED except for documented parameter
 * fits to this data's domains plus the repo's standard round-at-the-edge hash
 * discipline: the full 21-query store-channel "modifiedQueries" subset the reference
 * actually drives (q3, q7, q10, q19, q27, q34, q42, q43, q46, q52, q53, q55, q59,
 * q63, q65, q68, q73, q79, q89, q98, ss_max), plus q6, q12, q36, q51, q67, q74 from
 * the full set, plus the returns/inventory/time_dim tranche (q1, q2, q9, q21, q25,
 * q29, q31, q37, q50, q82, q88, q93, q97) over store_returns (the lineitem
 * l_returnflag='R' slice of the store channel), a generated weekly
 * part x warehouse inventory grid, and a generated 86400-second time_dim, plus a
 * twelve-query breadth tranche over the existing views (q13, q15, q20, q22, q32,
 * q45, q48, q58, q69, q86, q87, q96), plus a seventeen-query catalog/web returns
 * tranche (q5, q26, q30, q33, q40, q56, q60, q61, q71, q77, q78, q80, q81, q83,
 * q85, q91, q92) over catalog_returns/web_returns (the catalog/web slices'
 * l_returnflag='R' rows) and small generated web_page/call_center/catalog_page/
 * web_site dims, plus a twenty-six-query final tranche (q4, q8, q11, q16, q17,
 * q18, q28, q35, q38, q39a, q41, q44, q47, q49, q54, q57, q62, q66, q70, q72,
 * q75, q84, q90, q94, q95, q99) over ship-lag/ship-mode/income-band/quarter-name
 * extensions of the same views, plus the closing tranche that finished the full
 * 103-file set: the multi-intersect monoliths (q14a/b, q23a/b, q24a/b, q64),
 * null-key q76 (seeded with genuinely-null ss_customer_sk rows), q39b, and the
 * complete v2.7.0 variant family — the 13 distinct rewrite bodies (q5a...q86a)
 * and the two combined-body variant files q14.sql/q24.sql (keys tpcds_q14_v27/
 * tpcds_q24_v27) — so the reference's tpcds/, tpcds-v2.7.0/, and
 * tpcds-modifiedQueries/ resources are all covered with nothing left out.
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
 * Since round 8 the views are materialized ONCE per data dir through StarCache (data
 * at rest, like the reference's dbgen tables): the bodies then scan range-partitioned,
 * date-sorted parquet with real size stats, and the 83 M-row (sf0.1) inventory grid is
 * generated once instead of inside every inventory query (tpcds_q72 13.9->2.2 s,
 * tpcds_q22 6.4->2.7 s). Any materialization failure falls back to the inline-CTE plan.
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
    val timeSeries =
      if (spark) "(SELECT explode(sequence(0, 86399)) AS t) tt"
      else "generate_series(0, 86399) tt(t)"
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
       |    CAST(floor((extract(month FROM d) - 1) / 3) + 1 AS INT) AS d_qoy,
       |    CAST(extract(year FROM d) AS INT) || 'Q'
       |      || CAST(CAST(floor((extract(month FROM d) - 1) / 3) + 1 AS INT) AS $str)
       |      AS d_quarter_name
       |  FROM $series),
       |item AS (
       |  SELECT p_partkey AS i_item_sk, 'ITEM' || CAST(p_partkey AS $str) AS i_item_id,
       |    CAST(p_partkey % 50 AS INT) AS i_brand_id, p_brand AS i_brand,
       |    CAST(p_partkey % 25 AS INT) AS i_class_id,
       |    CAST(p_partkey % 10 AS INT) AS i_category_id,
       |    p_name AS i_class, p_type AS i_category, p_name AS i_item_desc,
       |    CAST(p_partkey % 100 AS INT) AS i_manufact_id,
       |    'PROD' || CAST(p_partkey AS $str) AS i_product_name,
       |    substr(p_name, 1, instr(p_name, ' ') - 1) AS i_color,
       |    'MFG' || CAST(p_partkey % 100 AS $str) AS i_manufact,
       |    CASE CAST(p_partkey % 6 AS INT) WHEN 0 THEN 'Ounce' WHEN 1 THEN 'Oz'
       |         WHEN 2 THEN 'Bunch' WHEN 3 THEN 'Ton' WHEN 4 THEN 'Each'
       |         ELSE 'Dozen' END AS i_units,
       |    CASE CAST(p_partkey % 6 AS INT) WHEN 0 THEN 'medium' WHEN 1 THEN 'extra large'
       |         WHEN 2 THEN 'N/A' WHEN 3 THEN 'small' WHEN 4 THEN 'petite'
       |         ELSE 'large' END AS i_size,
       |    CAST(p_partkey % 100 AS INT) AS i_manager_id,
       |    CAST(floor(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) * (100 + p_partkey % 200) / 100) AS BIGINT) / CAST(100 AS DOUBLE) AS i_current_price,
       |    CAST(floor(p_retailprice * 0.7 + 0.5) AS DOUBLE) AS i_wholesale_cost
       |  FROM part),
       |customer_ds AS (
       |  SELECT c_custkey AS c_customer_sk, c_name AS c_customer_id,
       |    c_name AS c_first_name, 'LN' || CAST(c_custkey % 997 AS $str) AS c_last_name,
       |    c_custkey AS c_current_addr_sk, c_custkey AS c_current_cdemo_sk,
       |    c_custkey AS c_current_hdemo_sk,
       |    CASE CAST(c_custkey % 4 AS INT) WHEN 0 THEN 'Mr.' WHEN 1 THEN 'Ms.'
       |         WHEN 2 THEN 'Dr.' ELSE 'Miss' END AS c_salutation,
       |    CASE WHEN c_custkey % 2 = 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag,
       |    CAST(c_custkey % 28 + 1 AS INT) AS c_birth_day,
       |    CAST(c_custkey % 12 + 1 AS INT) AS c_birth_month,
       |    CAST(1930 + c_custkey % 60 AS INT) AS c_birth_year,
       |    CASE WHEN c_custkey % 4 = 0 THEN 'UNITED STATES'
       |         ELSE 'COUNTRY' || CAST(c_custkey % 20 AS $str) END AS c_birth_country,
       |    CAST(9131 + c_custkey % 2800 AS INT) AS c_first_sales_date_sk,
       |    CAST(9161 + c_custkey % 2800 AS INT) AS c_first_shipto_date_sk,
       |    'login' || CAST(c_custkey AS $str) AS c_login,
       |    'c' || CAST(c_custkey AS $str) || '@example.com' AS c_email_address,
       |    CAST(2450000 + c_custkey % 1000 AS INT) AS c_last_review_date
       |  FROM customer),
       |customer_address AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    'ST' || CAST(c_custkey % 10 AS $str) AS ca_state,
       |    'CTY' || CAST(c_custkey % 30 AS $str) AS ca_county,
       |    'CITY' || CAST(c_custkey % 100 AS $str) AS ca_city,
       |    lpad(CAST(10000 + (c_custkey * 7) % 90000 AS $str), 5, '0') AS ca_zip,
       |    'United States' AS ca_country,
       |    CAST(100 + c_custkey % 900 AS $str) AS ca_street_number,
       |    'Street' || CAST(c_custkey % 7 AS $str) AS ca_street_name,
       |    CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 'Ave' WHEN 1 THEN 'Blvd'
       |         ELSE 'Way' END AS ca_street_type,
       |    'Suite ' || CAST(c_custkey % 50 AS $str) AS ca_suite_number,
       |    CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 'apartment' WHEN 1 THEN 'condo'
       |         ELSE 'single family' END AS ca_location_type,
       |    CAST(-5 - (c_custkey % 3) AS INT) AS ca_gmt_offset
       |  FROM customer),
       |household_demographics AS (
       |  SELECT c_custkey AS hd_demo_sk, CAST(c_custkey % 10 AS INT) AS hd_dep_count,
       |    c_custkey % 20 AS hd_income_band_sk,
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
       |    CAST(n_nationkey % 3 AS INT) AS s_company_id,
       |    CAST(n_nationkey % 10 + 1 AS INT) AS s_market_id,
       |    CAST(100 + n_nationkey AS $str) AS s_street_number,
       |    'Street' || CAST(n_nationkey % 7 AS $str) AS s_street_name,
       |    CASE CAST(n_nationkey % 3 AS INT) WHEN 0 THEN 'Ave' WHEN 1 THEN 'Blvd'
       |         ELSE 'Way' END AS s_street_type,
       |    'Suite ' || CAST(n_nationkey * 10 AS $str) AS s_suite_number,
       |    CAST(-5 - (n_nationkey % 3) AS INT) AS s_gmt_offset,
       |    CAST(50 + n_nationkey * 7 AS INT) AS s_number_employees,
       |    lpad(CAST(10000 + n_nationkey * 7 AS $str), 5, '0') AS s_zip
       |  FROM nation WHERE n_nationkey < 10),
       |warehouse AS (
       |  SELECT n_nationkey AS w_warehouse_sk,
       |    'WH' || CAST(n_nationkey AS $str) AS w_warehouse_name,
       |    CAST(1000 * (n_nationkey + 1) AS INT) AS w_warehouse_sq_ft,
       |    'CITY' || CAST(n_nationkey % 100 AS $str) AS w_city,
       |    'CTY' || CAST(n_nationkey % 30 AS $str) AS w_county,
       |    'United States' AS w_country,
       |    'ST' || CAST(n_nationkey % 10 AS $str) AS w_state
       |  FROM nation WHERE n_nationkey < 5),
       |reason AS (
       |  SELECT p_partkey AS r_reason_sk,
       |    'reason ' || CAST(p_partkey AS $str) AS r_reason_desc
       |  FROM part WHERE p_partkey BETWEEN 1 AND 35),
       |web_page AS (
       |  SELECT n_nationkey AS wp_web_page_sk,
       |    'WP' || CAST(n_nationkey AS $str) AS wp_web_page_id,
       |    CAST(1000 + n_nationkey * 500 AS INT) AS wp_char_count
       |  FROM nation WHERE n_nationkey < 10),
       |call_center AS (
       |  SELECT n_nationkey AS cc_call_center_sk,
       |    'CC' || CAST(n_nationkey AS $str) AS cc_call_center_id,
       |    'Call Center ' || CAST(n_nationkey AS $str) AS cc_name,
       |    'MGR' || CAST(n_nationkey AS $str) AS cc_manager,
       |    'CTY' || CAST(n_nationkey % 30 AS $str) AS cc_county
       |  FROM nation WHERE n_nationkey < 3),
       |catalog_page AS (
       |  SELECT n_nationkey AS cp_catalog_page_sk,
       |    'CP' || CAST(n_nationkey AS $str) AS cp_catalog_page_id
       |  FROM nation WHERE n_nationkey < 20),
       |web_site AS (
       |  SELECT n_nationkey AS web_site_sk,
       |    'SITE' || CAST(n_nationkey AS $str) AS web_site_id,
       |    'WEB' || CAST(n_nationkey AS $str) AS web_name,
       |    CASE CAST(n_nationkey AS INT) WHEN 0 THEN 'pri' WHEN 1 THEN 'ely'
       |         WHEN 2 THEN 'able' WHEN 3 THEN 'anti' ELSE 'allison' END
       |      AS web_company_name
       |  FROM nation WHERE n_nationkey < 5),
       |income_band AS (
       |  SELECT n_nationkey AS ib_income_band_sk,
       |    CAST(n_nationkey * 10000 AS INT) AS ib_lower_bound,
       |    CAST(n_nationkey * 10000 + 9999 AS INT) AS ib_upper_bound
       |  FROM nation WHERE n_nationkey < 20),
       |ship_mode AS (
       |  SELECT n_nationkey AS sm_ship_mode_sk,
       |    CASE CAST(n_nationkey AS INT) WHEN 0 THEN 'EXPRESS' WHEN 1 THEN 'GROUND'
       |         WHEN 2 THEN 'OVERNIGHT' ELSE 'MAIL' END AS sm_type,
       |    CASE CAST(n_nationkey AS INT) WHEN 0 THEN 'DHL' WHEN 1 THEN 'BARIAN'
       |         WHEN 2 THEN 'UPS' ELSE 'FEDEX' END AS sm_carrier
       |  FROM nation WHERE n_nationkey < 4),
       |time_dim AS (
       |  SELECT t AS t_time_sk, t AS t_time, CAST(floor(t / 3600.0) AS INT) AS t_hour,
       |    CAST(floor(t / 60.0) AS INT) % 60 AS t_minute,
       |    CASE WHEN CAST(floor(t / 3600.0) AS INT) BETWEEN 6 AND 8 THEN 'breakfast'
       |         WHEN CAST(floor(t / 3600.0) AS INT) BETWEEN 17 AND 19 THEN 'dinner'
       |         END AS t_meal_time
       |  FROM $timeSeries),
       |inventory AS (
       |  SELECT d_date_sk AS inv_date_sk, p_partkey AS inv_item_sk,
       |    w_warehouse_sk AS inv_warehouse_sk,
       |    CAST((p_partkey * 7 + w_warehouse_sk * 13
       |        + ((p_partkey + d_date_sk) * (p_partkey + d_date_sk + 1)) % 1000003) % 1000
       |      AS INT) AS inv_quantity_on_hand
       |  FROM date_dim, part, warehouse WHERE d_date_sk % 7 = 0),
       |promotion AS (
       |  SELECT p_partkey AS p_promo_sk,
       |    CASE WHEN p_partkey % 2 = 0 THEN 'Y' ELSE 'N' END AS p_channel_dmail,
       |    CASE WHEN p_partkey % 3 = 0 THEN 'Y' ELSE 'N' END AS p_channel_email,
       |    CASE WHEN p_partkey % 5 = 0 THEN 'Y' ELSE 'N' END AS p_channel_event,
       |    CASE WHEN p_partkey % 7 = 0 THEN 'Y' ELSE 'N' END AS p_channel_tv
       |  FROM part WHERE p_partkey < 100),
       |store_sales AS (
       |  SELECT ${days("o_orderdate")} AS ss_sold_date_sk,
       |    (o_orderkey * 7 + l_partkey) % 86400 AS ss_sold_time_sk, l_partkey AS ss_item_sk,
       |    o_custkey AS ss_customer_sk,
       |    (o_custkey + o_orderkey * 7) % (SELECT count(*) FROM customer) + 1 AS ss_cdemo_sk,
       |    o_custkey AS ss_hdemo_sk,
       |    (o_custkey + o_orderkey * 13) % (SELECT count(*) FROM customer) AS ss_addr_sk,
       |    CASE WHEN o_orderkey % 53 = 0 THEN NULL ELSE o_orderkey % 10 END AS ss_store_sk,
       |    l_partkey % 100 AS ss_promo_sk,
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
       |    (o_custkey + o_orderkey * 13) % (SELECT count(*) FROM customer) AS ws_bill_addr_sk,
       |    CAST(floor(l_extendedprice * (1 - l_discount) + 0.5) AS DOUBLE) AS ws_sales_price,
       |    (o_orderkey * 7 + l_partkey) % 86400 AS ws_sold_time_sk,
       |    CAST(floor(l_extendedprice * l_discount + 0.5) AS DOUBLE) AS ws_ext_discount_amt,
       |    l_partkey % 100 AS ws_promo_sk, o_orderkey % 10 AS ws_web_page_sk,
       |    o_orderkey % 5 AS ws_web_site_sk,
       |    ${days("o_orderdate")} + CAST(1 + (o_orderkey * 3 + l_partkey) % 120 AS INT)
       |      AS ws_ship_date_sk,
       |    l_suppkey % 4 AS ws_ship_mode_sk, o_custkey AS ws_ship_hdemo_sk,
       |    (o_custkey + o_orderkey * 13) % (SELECT count(*) FROM customer) AS ws_ship_addr_sk,
       |    CAST(floor(l_extendedprice + 0.5) AS DOUBLE) AS ws_list_price,
       |    CASE WHEN o_orderkey % 53 = 0 THEN NULL ELSE o_custkey END
       |      AS ws_ship_customer_sk,
       |    CAST(floor(l_extendedprice * 0.1 + 0.5) AS DOUBLE) AS ws_ext_ship_cost,
       |    CAST(floor(l_extendedprice * 0.7 + 0.5) AS DOUBLE) AS ws_ext_wholesale_cost,
       |    CAST(floor(l_extendedprice * 0.7 + 0.5) AS DOUBLE) AS ws_wholesale_cost,
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
       |    o_custkey AS cs_bill_cdemo_sk, o_custkey AS cs_bill_hdemo_sk,
       |    l_partkey % 100 AS cs_promo_sk,
       |    CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) + 0.5) AS DOUBLE)
       |      AS cs_net_paid_inc_tax,
       |    (o_custkey + o_orderkey * 13) % (SELECT count(*) FROM customer) AS cs_bill_addr_sk,
       |    (o_orderkey * 7 + l_partkey) % 86400 AS cs_sold_time_sk,
       |    l_suppkey % 5 AS cs_warehouse_sk, o_orderkey % 3 AS cs_call_center_sk,
       |    ${days("o_orderdate")} + CAST(1 + (o_orderkey * 3 + l_partkey) % 120 AS INT)
       |      AS cs_ship_date_sk,
       |    l_suppkey % 4 AS cs_ship_mode_sk,
       |    CASE WHEN o_orderkey % 53 = 0 THEN NULL
       |      ELSE (o_custkey + o_orderkey * 13) % (SELECT count(*) FROM customer) END
       |      AS cs_ship_addr_sk,
       |    CAST(floor(l_extendedprice * 0.1 + 0.5) AS DOUBLE) AS cs_ext_ship_cost,
       |    CAST(floor(l_extendedprice * 0.7 + 0.5) AS DOUBLE) AS cs_ext_wholesale_cost,
       |    l_partkey % 20 AS cs_catalog_page_sk,
       |    CAST(floor(l_extendedprice + 0.5) AS DOUBLE) AS cs_list_price,
       |    CAST(floor(l_extendedprice * l_discount + 0.5) AS DOUBLE) AS cs_coupon_amt,
       |    CAST(floor(l_extendedprice * (1 - l_discount) + 0.5) AS DOUBLE) AS cs_sales_price,
       |    o_orderkey AS cs_order_number, CAST(l_quantity AS INT) AS cs_quantity,
       |    CAST(floor(l_extendedprice * 0.7 + 0.5) AS DOUBLE) AS cs_wholesale_cost,
       |    CAST(floor(l_extendedprice + 0.5) AS DOUBLE) AS cs_ext_list_price,
       |    CAST(floor(l_extendedprice * (1 - l_discount) + 0.5) AS DOUBLE) AS cs_ext_sales_price,
       |    CAST(floor(l_extendedprice * l_discount + 0.5) AS DOUBLE) AS cs_ext_discount_amt,
       |    CAST(floor(l_extendedprice * (1 - l_discount) + 0.5) AS DOUBLE) AS cs_net_paid,
       |    CAST(floor(l_extendedprice * (1 - l_discount) - l_extendedprice * 0.7 + 0.5) AS DOUBLE) AS cs_net_profit
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderkey % 4 = 3),
       |store_returns AS (
       |  SELECT ${days("o_orderdate")} + CAST(1 + (o_orderkey * 3 + l_partkey) % 150 AS INT)
       |      AS sr_returned_date_sk,
       |    l_partkey AS sr_item_sk, o_custkey AS sr_customer_sk,
       |    CASE WHEN o_orderkey % 53 = 0 THEN NULL ELSE o_orderkey % 10 END AS sr_store_sk,
       |    o_orderkey AS sr_ticket_number,
       |    o_custkey AS sr_cdemo_sk,
       |    (o_orderkey + l_partkey) % 35 + 1 AS sr_reason_sk,
       |    CAST(1 + l_partkey % CAST(l_quantity AS INT) AS INT) AS sr_return_quantity,
       |    CAST(floor(l_extendedprice * (1 - l_discount) + 0.5) AS DOUBLE) AS sr_return_amt,
       |    CAST(floor(l_extendedprice * 0.3 + 0.5) AS DOUBLE) AS sr_net_loss
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderkey % 4 <> 1 AND l_returnflag = 'R'),
       |catalog_returns AS (
       |  SELECT ${days("o_orderdate")} + CAST(1 + (o_orderkey * 3 + l_partkey) % 150 AS INT)
       |      AS cr_returned_date_sk,
       |    l_partkey AS cr_item_sk, o_orderkey AS cr_order_number,
       |    o_custkey AS cr_returning_customer_sk,
       |    (o_custkey + o_orderkey * 13) % (SELECT count(*) FROM customer) AS cr_returning_addr_sk,
       |    o_orderkey % 3 AS cr_call_center_sk, l_partkey % 20 AS cr_catalog_page_sk,
       |    (o_orderkey + l_partkey) % 35 + 1 AS cr_reason_sk,
       |    CAST(1 + l_partkey % CAST(l_quantity AS INT) AS INT) AS cr_return_quantity,
       |    CAST(floor(l_extendedprice * (1 - l_discount) + 0.5) AS DOUBLE) AS cr_return_amount,
       |    CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) + 0.5) AS DOUBLE)
       |      AS cr_return_amt_inc_tax,
       |    CAST(floor(l_extendedprice * 0.2 + 0.5) AS DOUBLE) AS cr_refunded_cash,
       |    CAST(floor(l_extendedprice * 0.05 + 0.5) AS DOUBLE) AS cr_reversed_charge,
       |    CAST(floor(l_extendedprice * 0.03 + 0.5) AS DOUBLE) AS cr_store_credit,
       |    CAST(floor(l_extendedprice * 0.3 + 0.5) AS DOUBLE) AS cr_net_loss
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderkey % 4 = 3 AND l_returnflag = 'R'),
       |web_returns AS (
       |  SELECT ${days("o_orderdate")} + CAST(1 + (o_orderkey * 3 + l_partkey) % 150 AS INT)
       |      AS wr_returned_date_sk,
       |    l_partkey AS wr_item_sk, o_orderkey AS wr_order_number,
       |    o_custkey AS wr_returning_customer_sk, o_custkey AS wr_refunded_cdemo_sk,
       |    o_custkey AS wr_returning_cdemo_sk,
       |    (o_custkey + o_orderkey * 13) % (SELECT count(*) FROM customer) AS wr_refunded_addr_sk,
       |    (o_custkey + o_orderkey * 13) % (SELECT count(*) FROM customer) AS wr_returning_addr_sk,
       |    (o_orderkey + l_partkey) % 35 + 1 AS wr_reason_sk,
       |    o_orderkey % 10 AS wr_web_page_sk,
       |    CAST(1 + l_partkey % CAST(l_quantity AS INT) AS INT) AS wr_return_quantity,
       |    CAST(floor(l_extendedprice * (1 - l_discount) + 0.5) AS DOUBLE) AS wr_return_amt,
       |    CAST(floor(l_extendedprice * (1 - l_discount) * 0.5 + 0.5) AS DOUBLE) AS wr_refunded_cash,
       |    CAST(floor(l_extendedprice * 0.02 + 0.5) AS DOUBLE) AS wr_fee,
       |    CAST(floor(l_extendedprice * 0.3 + 0.5) AS DOUBLE) AS wr_net_loss
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderkey % 4 = 1 AND l_returnflag = 'R')
       |""".stripMargin
  }

  /** Splice a query body onto the schema prefix (merging the body's own WITH). */
  private def splice(pfx: String, body: String): String = {
    val b = body.trim
    if (b.toUpperCase.startsWith("WITH ")) pfx + "," + b.substring(5) else pfx + b
  }

  /** Every view the prefix defines, in dependency-safe build order (each view's SQL is
    * self-contained — built through the full prefix — so order only matters for
    * readability). Kept in sync with `prefix` by StarCacheSpec's name sweep. */
  private[graft] val viewNames: Seq[String] = Seq(
    "date_dim", "item", "customer_ds", "customer_address", "household_demographics",
    "customer_demographics", "store", "warehouse", "reason", "web_page", "call_center",
    "catalog_page", "web_site", "income_band", "ship_mode", "time_dim", "promotion",
    "inventory", "store_sales", "web_sales", "catalog_sales", "store_returns",
    "catalog_returns", "web_returns")

  private[graft] def viewSql(v: String): String = prefix(spark = true) + s"SELECT * FROM $v"

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

  // q74's year_total CTE is referenced FOUR times with different (sale_type, year)
  // filters; Spark inlines every deterministic multi-ref CTE and the pushed filters
  // make the four copies non-identical, so exchange reuse can't fire — four full
  // fact-agg passes at customer grain (10.4x at sf1 two rounds running; at the
  // 100 TB design point that is four 100 TB scans where one would do). The CTE body
  // and the final SELECT are held separately: [[all]] materializes year_total ONCE
  // per (source stamp, Version) through the same StarCache discipline as the star
  // itself — bucketed on customer_id, so the three self-joins arrive co-partitioned
  // — and runs the final SELECT against it; any materialization failure falls back
  // to the intact verbatim body (q74YearTotalCte + q74Select concatenated below is
  // byte-identical to the official text). The oracle always runs the full verbatim
  // body.
  private val q74YearTotalCte = """
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
  GROUP BY c_customer_id, c_first_name, c_last_name, d_year"""

  private[graft] val q74Select = """
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

  /** The intact official q74 body — CTE + SELECT, exactly the reference's text. */
  private val q74 = s"\nWITH year_total AS ($q74YearTotalCte)$q74Select"


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

  // ---- round 8: the returns/inventory/time_dim tranche (verbatim official texts;
  // parameter fits documented inline per query) ----

  // q1: s_state 'TN' -> 'ST1' (derived store states are ST0..ST9)
  private val q1 = """
WITH customer_total_return AS
( SELECT
    sr_customer_sk AS ctr_customer_sk,
    sr_store_sk AS ctr_store_sk,
    sum(sr_return_amt) AS ctr_total_return
  FROM store_returns, date_dim
  WHERE sr_returned_date_sk = d_date_sk AND d_year = 2000
  GROUP BY sr_customer_sk, sr_store_sk)
SELECT c_customer_id
FROM customer_total_return ctr1, store, customer_ds
WHERE ctr1.ctr_total_return >
  (SELECT avg(ctr_total_return) * 1.2
  FROM customer_total_return ctr2
  WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
  AND s_store_sk = ctr1.ctr_store_sk
  AND s_state = 'ST1'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id
LIMIT 100"""

  // q2: year 2001 -> 2000 (this data's orders end 2001-08, so the official 2001/2002
  // pair would leave z empty); the seven bare round() output columns gain aliases
  // (driver compare matches columns by name) and the int-sums are cast BIGINT at the
  // edge (DuckDB sum(int) widens to HUGEINT, the driver hash is type-sensitive)
  private val q2 = """
WITH wscs AS
( SELECT
    sold_date_sk,
    sales_price
  FROM (SELECT
    ws_sold_date_sk sold_date_sk,
    ws_ext_sales_price sales_price
  FROM web_sales) x
  UNION ALL
  (SELECT
    cs_sold_date_sk sold_date_sk,
    cs_ext_sales_price sales_price
  FROM catalog_sales)),
    wswscs AS
  ( SELECT
    d_week_seq,
    sum(CASE WHEN (d_day_name = 'Sunday') THEN sales_price ELSE NULL END) sun_sales,
    sum(CASE WHEN (d_day_name = 'Monday') THEN sales_price ELSE NULL END) mon_sales,
    sum(CASE WHEN (d_day_name = 'Tuesday') THEN sales_price ELSE NULL END) tue_sales,
    sum(CASE WHEN (d_day_name = 'Wednesday') THEN sales_price ELSE NULL END) wed_sales,
    sum(CASE WHEN (d_day_name = 'Thursday') THEN sales_price ELSE NULL END) thu_sales,
    sum(CASE WHEN (d_day_name = 'Friday') THEN sales_price ELSE NULL END) fri_sales,
    sum(CASE WHEN (d_day_name = 'Saturday') THEN sales_price ELSE NULL END) sat_sales
  FROM wscs, date_dim
  WHERE d_date_sk = sold_date_sk
  GROUP BY d_week_seq)
SELECT
  d_week_seq1,
  round(sun_sales1 / sun_sales2, 2) AS sun_ratio,
  round(mon_sales1 / mon_sales2, 2) AS mon_ratio,
  round(tue_sales1 / tue_sales2, 2) AS tue_ratio,
  round(wed_sales1 / wed_sales2, 2) AS wed_ratio,
  round(thu_sales1 / thu_sales2, 2) AS thu_ratio,
  round(fri_sales1 / fri_sales2, 2) AS fri_ratio,
  round(sat_sales1 / sat_sales2, 2) AS sat_ratio
FROM
  (SELECT
    wswscs.d_week_seq d_week_seq1,
    sun_sales sun_sales1, mon_sales mon_sales1, tue_sales tue_sales1,
    wed_sales wed_sales1, thu_sales thu_sales1, fri_sales fri_sales1,
    sat_sales sat_sales1
  FROM wswscs, date_dim
  WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 2000) y,
  (SELECT
    wswscs.d_week_seq d_week_seq2,
    sun_sales sun_sales2, mon_sales mon_sales2, tue_sales tue_sales2,
    wed_sales wed_sales2, thu_sales thu_sales2, fri_sales fri_sales2,
    sat_sales sat_sales2
  FROM wswscs, date_dim
  WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 2000 + 1) z
WHERE d_week_seq1 = d_week_seq2 - 53
ORDER BY d_week_seq1"""

  // q9: thresholds verbatim (all exceed this scale's counts, so every bucket takes the
  // ELSE branch); quantity buckets beyond this data's 1..50 domain yield NULL averages,
  // exactly as the official query does on an undersized bucket
  private val q9 = """
SELECT
  CASE WHEN (SELECT count(*) FROM store_sales
  WHERE ss_quantity BETWEEN 1 AND 20) > 62316685
    THEN (SELECT avg(ss_ext_discount_amt) FROM store_sales
    WHERE ss_quantity BETWEEN 1 AND 20)
  ELSE (SELECT avg(ss_net_paid) FROM store_sales
  WHERE ss_quantity BETWEEN 1 AND 20) END bucket1,
  CASE WHEN (SELECT count(*) FROM store_sales
  WHERE ss_quantity BETWEEN 21 AND 40) > 19045798
    THEN (SELECT avg(ss_ext_discount_amt) FROM store_sales
    WHERE ss_quantity BETWEEN 21 AND 40)
  ELSE (SELECT avg(ss_net_paid) FROM store_sales
  WHERE ss_quantity BETWEEN 21 AND 40) END bucket2,
  CASE WHEN (SELECT count(*) FROM store_sales
  WHERE ss_quantity BETWEEN 41 AND 60) > 365541424
    THEN (SELECT avg(ss_ext_discount_amt) FROM store_sales
    WHERE ss_quantity BETWEEN 41 AND 60)
  ELSE (SELECT avg(ss_net_paid) FROM store_sales
  WHERE ss_quantity BETWEEN 41 AND 60) END bucket3,
  CASE WHEN (SELECT count(*) FROM store_sales
  WHERE ss_quantity BETWEEN 61 AND 80) > 216357808
    THEN (SELECT avg(ss_ext_discount_amt) FROM store_sales
    WHERE ss_quantity BETWEEN 61 AND 80)
  ELSE (SELECT avg(ss_net_paid) FROM store_sales
  WHERE ss_quantity BETWEEN 61 AND 80) END bucket4,
  CASE WHEN (SELECT count(*) FROM store_sales
  WHERE ss_quantity BETWEEN 81 AND 100) > 184483884
    THEN (SELECT avg(ss_ext_discount_amt) FROM store_sales
    WHERE ss_quantity BETWEEN 81 AND 100)
  ELSE (SELECT avg(ss_net_paid) FROM store_sales
  WHERE ss_quantity BETWEEN 81 AND 100) END bucket5
FROM reason
WHERE r_reason_sk = 1"""

  // q21: i_current_price band 0.99..1.49 -> 990..1049 (derived price domain is
  // 900..2990); the +/-30 day INTERVAL arithmetic is pre-resolved to date literals,
  // the same fit tpcds_q12/q98 use
  private val q21 = """
SELECT *
FROM (
       SELECT
         w_warehouse_name,
         i_item_id,
         CAST(sum(CASE WHEN (cast(d_date AS DATE) < cast('2000-03-11' AS DATE))
           THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT) AS inv_before,
         CAST(sum(CASE WHEN (cast(d_date AS DATE) >= cast('2000-03-11' AS DATE))
           THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT) AS inv_after
       FROM inventory, warehouse, item, date_dim
       WHERE i_current_price BETWEEN 990 AND 1049
         AND i_item_sk = inv_item_sk
         AND inv_warehouse_sk = w_warehouse_sk
         AND inv_date_sk = d_date_sk
         AND d_date BETWEEN DATE '2000-02-10' AND DATE '2000-04-10'
       GROUP BY w_warehouse_name, i_item_id) x
WHERE (CASE WHEN inv_before > 0
  THEN inv_after / inv_before
       ELSE NULL
       END) BETWEEN 2.0 / 3.0 AND 3.0 / 2.0
ORDER BY w_warehouse_name, i_item_id
LIMIT 100"""

  // q25: verbatim (April 2001 exists in the derived calendar and fact data)
  private val q25 = """
SELECT
  i_item_id,
  i_item_desc,
  s_store_id,
  s_store_name,
  sum(ss_net_profit) AS store_sales_profit,
  sum(sr_net_loss) AS store_returns_loss,
  sum(cs_net_profit) AS catalog_sales_profit
FROM
  store_sales, store_returns, catalog_sales, date_dim d1, date_dim d2, date_dim d3,
  store, item
WHERE
  d1.d_moy = 4
    AND d1.d_year = 2001
    AND d1.d_date_sk = ss_sold_date_sk
    AND i_item_sk = ss_item_sk
    AND s_store_sk = ss_store_sk
    AND ss_customer_sk = sr_customer_sk
    AND ss_item_sk = sr_item_sk
    AND ss_ticket_number = sr_ticket_number
    AND sr_returned_date_sk = d2.d_date_sk
    AND d2.d_moy BETWEEN 4 AND 10
    AND d2.d_year = 2001
    AND sr_customer_sk = cs_bill_customer_sk
    AND sr_item_sk = cs_item_sk
    AND cs_sold_date_sk = d3.d_date_sk
    AND d3.d_moy BETWEEN 4 AND 10
    AND d3.d_year = 2001
GROUP BY
  i_item_id, i_item_desc, s_store_id, s_store_name
ORDER BY
  i_item_id, i_item_desc, s_store_id, s_store_name
LIMIT 100"""

  // q29: verbatim (September 1999)
  private val q29 = """
SELECT
  i_item_id,
  i_item_desc,
  s_store_id,
  s_store_name,
  CAST(sum(ss_quantity) AS BIGINT) AS store_sales_quantity,
  CAST(sum(sr_return_quantity) AS BIGINT) AS store_returns_quantity,
  CAST(sum(cs_quantity) AS BIGINT) AS catalog_sales_quantity
FROM
  store_sales, store_returns, catalog_sales, date_dim d1, date_dim d2,
  date_dim d3, store, item
WHERE
  d1.d_moy = 9
    AND d1.d_year = 1999
    AND d1.d_date_sk = ss_sold_date_sk
    AND i_item_sk = ss_item_sk
    AND s_store_sk = ss_store_sk
    AND ss_customer_sk = sr_customer_sk
    AND ss_item_sk = sr_item_sk
    AND ss_ticket_number = sr_ticket_number
    AND sr_returned_date_sk = d2.d_date_sk
    AND d2.d_moy BETWEEN 9 AND 9 + 3
    AND d2.d_year = 1999
    AND sr_customer_sk = cs_bill_customer_sk
    AND sr_item_sk = cs_item_sk
    AND cs_sold_date_sk = d3.d_date_sk
    AND d3.d_year IN (1999, 1999 + 1, 1999 + 2)
GROUP BY
  i_item_id, i_item_desc, s_store_id, s_store_name
ORDER BY
  i_item_id, i_item_desc, s_store_id, s_store_name
LIMIT 100"""

  // q31: verbatim (year 2000; ws_bill_addr_sk added to the web_sales view)
  private val q31 = """
WITH ss AS
(SELECT
    ca_county,
    d_qoy,
    d_year,
    sum(ss_ext_sales_price) AS store_sales
  FROM store_sales, date_dim, customer_address
  WHERE ss_sold_date_sk = d_date_sk
    AND ss_addr_sk = ca_address_sk
  GROUP BY ca_county, d_qoy, d_year),
    ws AS
  (SELECT
    ca_county,
    d_qoy,
    d_year,
    sum(ws_ext_sales_price) AS web_sales
  FROM web_sales, date_dim, customer_address
  WHERE ws_sold_date_sk = d_date_sk
    AND ws_bill_addr_sk = ca_address_sk
  GROUP BY ca_county, d_qoy, d_year)
SELECT
  ss1.ca_county,
  ss1.d_year,
  ws2.web_sales / ws1.web_sales web_q1_q2_increase,
  ss2.store_sales / ss1.store_sales store_q1_q2_increase,
  ws3.web_sales / ws2.web_sales web_q2_q3_increase,
  ss3.store_sales / ss2.store_sales store_q2_q3_increase
FROM
  ss ss1, ss ss2, ss ss3, ws ws1, ws ws2, ws ws3
WHERE
  ss1.d_qoy = 1
    AND ss1.d_year = 2000
    AND ss1.ca_county = ss2.ca_county
    AND ss2.d_qoy = 2
    AND ss2.d_year = 2000
    AND ss2.ca_county = ss3.ca_county
    AND ss3.d_qoy = 3
    AND ss3.d_year = 2000
    AND ss1.ca_county = ws1.ca_county
    AND ws1.d_qoy = 1
    AND ws1.d_year = 2000
    AND ws1.ca_county = ws2.ca_county
    AND ws2.d_qoy = 2
    AND ws2.d_year = 2000
    AND ws1.ca_county = ws3.ca_county
    AND ws3.d_qoy = 3
    AND ws3.d_year = 2000
    AND CASE WHEN ws1.web_sales > 0
    THEN ws2.web_sales / ws1.web_sales
        ELSE NULL END
    > CASE WHEN ss1.store_sales > 0
    THEN ss2.store_sales / ss1.store_sales
      ELSE NULL END
    AND CASE WHEN ws2.web_sales > 0
    THEN ws3.web_sales / ws2.web_sales
        ELSE NULL END
    > CASE WHEN ss2.store_sales > 0
    THEN ss3.store_sales / ss2.store_sales
      ELSE NULL END
ORDER BY ss1.ca_county"""

  // q37: price band 68..98 -> 1680..1710; manufact ids folded into this schema's
  // 0..99 domain (677,940,694,808 -> 67,94,69,80); interval arithmetic pre-resolved
  private val q37 = """
SELECT
  i_item_id,
  i_item_desc,
  i_current_price
FROM item, inventory, date_dim, catalog_sales
WHERE i_current_price BETWEEN 1680 AND 1710
  AND inv_item_sk = i_item_sk
  AND d_date_sk = inv_date_sk
  AND d_date BETWEEN DATE '2000-02-01' AND DATE '2000-04-01'
  AND i_manufact_id IN (67, 94, 69, 80)
  AND inv_quantity_on_hand BETWEEN 100 AND 500
  AND cs_item_sk = i_item_sk
GROUP BY i_item_id, i_item_desc, i_current_price
ORDER BY i_item_id
LIMIT 100"""

  // q50: the five bucket aliases lose their trailing-space backtick names (parquet
  // field names can't carry spaces) -> days_30/days_31_60/...; otherwise verbatim
  private val q50 = """
SELECT
  s_store_name,
  s_company_id,
  s_street_number,
  s_street_name,
  s_street_type,
  s_suite_number,
  s_city,
  s_county,
  s_state,
  s_zip,
  CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk <= 30)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_30,
  CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 30) AND
    (sr_returned_date_sk - ss_sold_date_sk <= 60)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_31_60,
  CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 60) AND
    (sr_returned_date_sk - ss_sold_date_sk <= 90)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_61_90,
  CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 90) AND
    (sr_returned_date_sk - ss_sold_date_sk <= 120)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_91_120,
  CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 120)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_over_120
FROM
  store_sales, store_returns, store, date_dim d1, date_dim d2
WHERE
  d2.d_year = 2001
    AND d2.d_moy = 8
    AND ss_ticket_number = sr_ticket_number
    AND ss_item_sk = sr_item_sk
    AND ss_sold_date_sk = d1.d_date_sk
    AND sr_returned_date_sk = d2.d_date_sk
    AND ss_customer_sk = sr_customer_sk
    AND ss_store_sk = s_store_sk
GROUP BY
  s_store_name, s_company_id, s_street_number, s_street_name, s_street_type,
  s_suite_number, s_city, s_county, s_state, s_zip
ORDER BY
  s_store_name, s_company_id, s_street_number, s_street_name, s_street_type,
  s_suite_number, s_city, s_county, s_state, s_zip
LIMIT 100"""

  // q82: price band fitted to 1150..1350 (i_current_price is p_retailprice scaled by
  // a partkey-correlated multiplier, so the band must intersect the chosen manufact
  // ids' price lattice); manufact ids folded to 0..99 (129,270,821,423 -> 29,70,21,23);
  // interval arithmetic pre-resolved
  private val q82 = """
SELECT
  i_item_id,
  i_item_desc,
  i_current_price
FROM item, inventory, date_dim, store_sales
WHERE i_current_price BETWEEN 1150 AND 1350
  AND inv_item_sk = i_item_sk
  AND d_date_sk = inv_date_sk
  AND d_date BETWEEN DATE '2000-05-25' AND DATE '2000-07-24'
  AND i_manufact_id IN (29, 70, 21, 23)
  AND inv_quantity_on_hand BETWEEN 100 AND 500
  AND ss_item_sk = i_item_sk
GROUP BY i_item_id, i_item_desc, i_current_price
ORDER BY i_item_id
LIMIT 100"""

  // q88: s_store_name 'ese' -> 'STORE1' (derived store names); the eight half-hour
  // count subqueries and their cartesian combine run verbatim
  private def q88Slot(alias: String, hour: Int, minuteCond: String): String = s"""
  (SELECT count(*) $alias
  FROM store_sales, household_demographics, time_dim, store
  WHERE ss_sold_time_sk = time_dim.t_time_sk
    AND ss_hdemo_sk = household_demographics.hd_demo_sk
    AND ss_store_sk = s_store_sk
    AND time_dim.t_hour = $hour
    AND time_dim.t_minute $minuteCond
    AND (
    (household_demographics.hd_dep_count = 4 AND household_demographics.hd_vehicle_count <= 4 + 2)
      OR
      (household_demographics.hd_dep_count = 2 AND household_demographics.hd_vehicle_count <= 2 + 2)
      OR
      (household_demographics.hd_dep_count = 0 AND
        household_demographics.hd_vehicle_count <= 0 + 2))
    AND store.s_store_name = 'STORE1')"""

  private val q88 = "SELECT *\nFROM\n" + Seq(
    q88Slot("h8_30_to_9", 8, ">= 30") + " s1",
    q88Slot("h9_to_9_30", 9, "< 30") + " s2",
    q88Slot("h9_30_to_10", 9, ">= 30") + " s3",
    q88Slot("h10_to_10_30", 10, "< 30") + " s4",
    q88Slot("h10_30_to_11", 10, ">= 30") + " s5",
    q88Slot("h11_to_11_30", 11, "< 30") + " s6",
    q88Slot("h11_30_to_12", 11, ">= 30") + " s7",
    q88Slot("h12_to_12_30", 12, "< 30") + " s8").mkString(",")

  // q93: verbatim ('reason 28' exists in the derived reason dimension by construction)
  private val q93 = """
SELECT
  ss_customer_sk,
  sum(act_sales) sumsales
FROM (SELECT
  ss_item_sk,
  ss_ticket_number,
  ss_customer_sk,
  CASE WHEN sr_return_quantity IS NOT NULL
    THEN (ss_quantity - sr_return_quantity) * ss_sales_price
  ELSE (ss_quantity * ss_sales_price) END act_sales
FROM store_sales
  LEFT OUTER JOIN store_returns
    ON (sr_item_sk = ss_item_sk AND sr_ticket_number = ss_ticket_number)
  ,
  reason
WHERE sr_reason_sk = r_reason_sk AND r_reason_desc = 'reason 28') t
GROUP BY ss_customer_sk
ORDER BY sumsales, ss_customer_sk
LIMIT 100"""

  // q97: month_seq window 1200..1211 -> 360..371 (this calendar's year 2000)
  private val q97 = """
WITH ssci AS (
  SELECT
    ss_customer_sk customer_sk,
    ss_item_sk item_sk
  FROM store_sales, date_dim
  WHERE ss_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 360 AND 360 + 11
  GROUP BY ss_customer_sk, ss_item_sk),
    csci AS (
    SELECT
      cs_bill_customer_sk customer_sk,
      cs_item_sk item_sk
    FROM catalog_sales, date_dim
    WHERE cs_sold_date_sk = d_date_sk
      AND d_month_seq BETWEEN 360 AND 360 + 11
    GROUP BY cs_bill_customer_sk, cs_item_sk)
SELECT
  CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL AND csci.customer_sk IS NULL
    THEN 1 ELSE 0 END) AS BIGINT) store_only,
  CAST(sum(CASE WHEN ssci.customer_sk IS NULL AND csci.customer_sk IS NOT NULL
    THEN 1 ELSE 0 END) AS BIGINT) catalog_only,
  CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL AND csci.customer_sk IS NOT NULL
    THEN 1 ELSE 0 END) AS BIGINT) store_and_catalog
FROM ssci
  FULL OUTER JOIN csci ON (ssci.customer_sk = csci.customer_sk
    AND ssci.item_sk = csci.item_sk)
LIMIT 100"""

  // ---- round 8 batch B: twelve more verbatim bodies over the existing views ----

  // q13: education values fitted to the derived demographics domain ('Advanced
  // Degree'/'2 yr Degree' -> '4 yr Degree'/'Secondary'), price/profit bands scaled
  // into this data's quantized domains, states 'TX/OH/...' -> 'ST<k>'; the four bare
  // aggregates gain aliases
  private val q13 = """
SELECT
  avg(ss_quantity) AS avg_quantity,
  avg(ss_ext_sales_price) AS avg_sales_price,
  avg(ss_ext_wholesale_cost) AS avg_wholesale_cost,
  sum(ss_ext_wholesale_cost) AS sum_wholesale_cost
FROM store_sales
  , store
  , customer_demographics
  , household_demographics
  , customer_address
  , date_dim
WHERE s_store_sk = ss_store_sk
  AND ss_sold_date_sk = d_date_sk AND d_year = 2001
  AND ((ss_hdemo_sk = hd_demo_sk
  AND cd_demo_sk = ss_cdemo_sk
  AND cd_marital_status = 'M'
  AND cd_education_status = '4 yr Degree'
  AND ss_sales_price BETWEEN 10000.00 AND 15000.00
  AND hd_dep_count = 3
) OR
  (ss_hdemo_sk = hd_demo_sk
    AND cd_demo_sk = ss_cdemo_sk
    AND cd_marital_status = 'S'
    AND cd_education_status = 'College'
    AND ss_sales_price BETWEEN 5000.00 AND 10000.00
    AND hd_dep_count = 1
  ) OR
  (ss_hdemo_sk = hd_demo_sk
    AND cd_demo_sk = ss_cdemo_sk
    AND cd_marital_status = 'D'
    AND cd_education_status = 'Secondary'
    AND ss_sales_price BETWEEN 15000.00 AND 20000.00
    AND hd_dep_count = 1
  ))
  AND ((ss_addr_sk = ca_address_sk
  AND ca_country = 'United States'
  AND ca_state IN ('ST1', 'ST2', 'ST1')
  AND ss_net_profit BETWEEN 1000 AND 2000
) OR
  (ss_addr_sk = ca_address_sk
    AND ca_country = 'United States'
    AND ca_state IN ('ST3', 'ST4', 'ST5')
    AND ss_net_profit BETWEEN 1500 AND 3000
  ) OR
  (ss_addr_sk = ca_address_sk
    AND ca_country = 'United States'
    AND ca_state IN ('ST6', 'ST7', 'ST8')
    AND ss_net_profit BETWEEN 500 AND 2500
  ))"""

  // q15: zip list fitted to the derived lpad(10000+7k) lattice, states -> 'ST<k>',
  // the bare sum aliased
  private val q15 = """
SELECT
  ca_zip,
  sum(cs_sales_price) AS total_sales
FROM catalog_sales, customer_ds, customer_address, date_dim
WHERE cs_bill_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND (substr(ca_zip, 1, 5) IN ('10000', '10007', '10014', '10021', '10028',
                                '10035', '10042', '10049', '10056')
  OR ca_state IN ('ST2', 'ST3', 'ST4')
  OR cs_sales_price > 500)
  AND cs_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 2001
GROUP BY ca_zip
ORDER BY ca_zip
LIMIT 100"""

  // q20: category list fitted to the derived p_type domain; interval pre-resolved
  private val q20 = """
SELECT
  i_item_desc,
  i_category,
  i_class,
  i_current_price,
  sum(cs_ext_sales_price) AS itemrevenue,
  sum(cs_ext_sales_price) * 100 / sum(sum(cs_ext_sales_price))
  OVER
  (PARTITION BY i_class) AS revenueratio
FROM catalog_sales, item, date_dim
WHERE cs_item_sk = i_item_sk
  AND i_category IN ('LARGE', 'MEDIUM', 'SMALL')
  AND cs_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '1999-02-22' AND DATE '1999-03-24'
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
LIMIT 100"""

  // q22: month_seq window -> this calendar's year 2000; explicit NULLS FIRST on the
  // rollup name columns (Spark's ASC default; DuckDB defaults NULLS LAST, and the
  // LIMIT makes the tie order part of the answer)
  private val q22 = """
SELECT
  i_product_name,
  i_brand,
  i_class,
  i_category,
  avg(inv_quantity_on_hand) qoh
FROM inventory, date_dim, item, warehouse
WHERE inv_date_sk = d_date_sk
  AND inv_item_sk = i_item_sk
  AND inv_warehouse_sk = w_warehouse_sk
  AND d_month_seq BETWEEN 360 AND 360 + 11
GROUP BY ROLLUP (i_product_name, i_brand, i_class, i_category)
ORDER BY qoh, i_product_name NULLS FIRST, i_brand NULLS FIRST, i_class NULLS FIRST,
  i_category NULLS FIRST
LIMIT 100"""

  // q32: manufact id folded to the 0..99 domain (977 -> 77); interval pre-resolved;
  // the backtick alias becomes a plain identifier (parquet field names)
  private val q32 = """
SELECT 1 AS excess_discount_amount
FROM
  catalog_sales, item, date_dim
WHERE
  i_manufact_id = 77
    AND i_item_sk = cs_item_sk
    AND d_date BETWEEN DATE '2000-01-27' AND DATE '2000-04-26'
    AND d_date_sk = cs_sold_date_sk
    AND cs_ext_discount_amt > (
    SELECT 1.3 * avg(cs_ext_discount_amt)
    FROM catalog_sales, date_dim
    WHERE cs_item_sk = i_item_sk
      AND d_date BETWEEN DATE '2000-01-27' AND DATE '2000-04-26'
      AND d_date_sk = cs_sold_date_sk)
LIMIT 100"""

  // q45: zip list fitted to the derived lattice; the bare sum aliased
  private val q45 = """
SELECT
  ca_zip,
  ca_city,
  sum(ws_sales_price) AS total_sales
FROM web_sales, customer_ds, customer_address, date_dim, item
WHERE ws_bill_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND ws_item_sk = i_item_sk
  AND (substr(ca_zip, 1, 5) IN
  ('10000', '10007', '10014', '10021', '10028', '10035', '10042', '10049', '10056')
  OR
  i_item_id IN (SELECT i_item_id
  FROM item
  WHERE i_item_sk IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)
  )
)
  AND ws_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 2001
GROUP BY ca_zip, ca_city
ORDER BY ca_zip, ca_city
LIMIT 100"""

  // q48: education/state/price/profit fits as in q13; sum cast BIGINT and aliased
  private val q48 = """
SELECT CAST(sum(ss_quantity) AS BIGINT) AS total_quantity
FROM store_sales, store, customer_demographics, customer_address, date_dim
WHERE s_store_sk = ss_store_sk
  AND ss_sold_date_sk = d_date_sk AND d_year = 2001
  AND
  (
    (
      cd_demo_sk = ss_cdemo_sk
        AND
        cd_marital_status = 'M'
        AND
        cd_education_status = '4 yr Degree'
        AND
        ss_sales_price BETWEEN 10000.00 AND 15000.00
    )
      OR
      (
        cd_demo_sk = ss_cdemo_sk
          AND
          cd_marital_status = 'D'
          AND
          cd_education_status = 'Secondary'
          AND
          ss_sales_price BETWEEN 5000.00 AND 10000.00
      )
      OR
      (
        cd_demo_sk = ss_cdemo_sk
          AND
          cd_marital_status = 'S'
          AND
          cd_education_status = 'College'
          AND
          ss_sales_price BETWEEN 15000.00 AND 20000.00
      )
  )
  AND
  (
    (
      ss_addr_sk = ca_address_sk
        AND
        ca_country = 'United States'
        AND
        ca_state IN ('ST1', 'ST2', 'ST3')
        AND ss_net_profit BETWEEN 0 AND 20000
    )
      OR
      (ss_addr_sk = ca_address_sk
        AND
        ca_country = 'United States'
        AND
        ca_state IN ('ST4', 'ST5', 'ST6')
        AND ss_net_profit BETWEEN 1500 AND 30000
      )
      OR
      (ss_addr_sk = ca_address_sk
        AND
        ca_country = 'United States'
        AND
        ca_state IN ('ST7', 'ST8', 'ST9')
        AND ss_net_profit BETWEEN 500 AND 25000
      )
  )"""

  // q58: date fitted to '1996-07-15' (densest cross-channel week probed). The query is
  // inherently ultra-selective — per-item ONE-WEEK revenue within +/-10% across all
  // three channels — so at sf0.01's ~175 fact rows/week it returns 0 rows by
  // construction; at sf0.1 it returns rows (3 probed), which is what the bench runs.
  private val q58 = """
WITH ss_items AS
(SELECT
    i_item_id item_id,
    sum(ss_ext_sales_price) ss_item_rev
  FROM store_sales, item, date_dim
  WHERE ss_item_sk = i_item_sk
    AND d_date IN (SELECT d_date
  FROM date_dim
  WHERE d_week_seq = (SELECT d_week_seq
  FROM date_dim
  WHERE d_date = '1996-07-15'))
    AND ss_sold_date_sk = d_date_sk
  GROUP BY i_item_id),
    cs_items AS
  (SELECT
    i_item_id item_id,
    sum(cs_ext_sales_price) cs_item_rev
  FROM catalog_sales, item, date_dim
  WHERE cs_item_sk = i_item_sk
    AND d_date IN (SELECT d_date
  FROM date_dim
  WHERE d_week_seq = (SELECT d_week_seq
  FROM date_dim
  WHERE d_date = '1996-07-15'))
    AND cs_sold_date_sk = d_date_sk
  GROUP BY i_item_id),
    ws_items AS
  (SELECT
    i_item_id item_id,
    sum(ws_ext_sales_price) ws_item_rev
  FROM web_sales, item, date_dim
  WHERE ws_item_sk = i_item_sk
    AND d_date IN (SELECT d_date
  FROM date_dim
  WHERE d_week_seq = (SELECT d_week_seq
  FROM date_dim
  WHERE d_date = '1996-07-15'))
    AND ws_sold_date_sk = d_date_sk
  GROUP BY i_item_id)
SELECT
  ss_items.item_id,
  ss_item_rev,
  ss_item_rev / (ss_item_rev + cs_item_rev + ws_item_rev) / 3 * 100 ss_dev,
  cs_item_rev,
  cs_item_rev / (ss_item_rev + cs_item_rev + ws_item_rev) / 3 * 100 cs_dev,
  ws_item_rev,
  ws_item_rev / (ss_item_rev + cs_item_rev + ws_item_rev) / 3 * 100 ws_dev,
  (ss_item_rev + cs_item_rev + ws_item_rev) / 3 average
FROM ss_items, cs_items, ws_items
WHERE ss_items.item_id = cs_items.item_id
  AND ss_items.item_id = ws_items.item_id
  AND ss_item_rev BETWEEN 0.9 * cs_item_rev AND 1.1 * cs_item_rev
  AND ss_item_rev BETWEEN 0.9 * ws_item_rev AND 1.1 * ws_item_rev
  AND cs_item_rev BETWEEN 0.9 * ss_item_rev AND 1.1 * ss_item_rev
  AND cs_item_rev BETWEEN 0.9 * ws_item_rev AND 1.1 * ws_item_rev
  AND ws_item_rev BETWEEN 0.9 * ss_item_rev AND 1.1 * ss_item_rev
  AND ws_item_rev BETWEEN 0.9 * cs_item_rev AND 1.1 * cs_item_rev
ORDER BY ss_items.item_id, ss_item_rev
LIMIT 100"""

  // q69: states -> 'ST<k>'
  private val q69 = """
SELECT
  cd_gender,
  cd_marital_status,
  cd_education_status,
  count(*) cnt1,
  cd_purchase_estimate,
  count(*) cnt2,
  cd_credit_rating,
  count(*) cnt3
FROM
  customer_ds c, customer_address ca, customer_demographics
WHERE
  c.c_current_addr_sk = ca.ca_address_sk AND
    ca_state IN ('ST1', 'ST2', 'ST3') AND
    cd_demo_sk = c.c_current_cdemo_sk AND
    exists(SELECT *
           FROM store_sales, date_dim
           WHERE c.c_customer_sk = ss_customer_sk AND
             ss_sold_date_sk = d_date_sk AND
             d_year = 2001 AND
             d_moy BETWEEN 4 AND 4 + 2) AND
    (NOT exists(SELECT *
                FROM web_sales, date_dim
                WHERE c.c_customer_sk = ws_bill_customer_sk AND
                  ws_sold_date_sk = d_date_sk AND
                  d_year = 2001 AND
                  d_moy BETWEEN 4 AND 4 + 2) AND
      NOT exists(SELECT *
                 FROM catalog_sales, date_dim
                 WHERE c.c_customer_sk = cs_ship_customer_sk AND
                   cs_sold_date_sk = d_date_sk AND
                   d_year = 2001 AND
                   d_moy BETWEEN 4 AND 4 + 2))
GROUP BY cd_gender, cd_marital_status, cd_education_status,
  cd_purchase_estimate, cd_credit_rating
ORDER BY cd_gender, cd_marital_status, cd_education_status,
  cd_purchase_estimate, cd_credit_rating
LIMIT 100"""

  // q86: month_seq window -> this calendar's year 2000
  private val q86 = """
SELECT
  sum(ws_net_paid) AS total_sum,
  i_category,
  i_class,
  grouping(i_category) + grouping(i_class) AS lochierarchy,
  rank()
  OVER (
    PARTITION BY grouping(i_category) + grouping(i_class),
      CASE WHEN grouping(i_class) = 0
        THEN i_category END
    ORDER BY sum(ws_net_paid) DESC) AS rank_within_parent
FROM
  web_sales, date_dim d1, item
WHERE
  d1.d_month_seq BETWEEN 360 AND 360 + 11
    AND d1.d_date_sk = ws_sold_date_sk
    AND i_item_sk = ws_item_sk
GROUP BY ROLLUP (i_category, i_class)
ORDER BY
  lochierarchy DESC,
  CASE WHEN lochierarchy = 0
    THEN i_category END,
  rank_within_parent
LIMIT 100"""

  // q87: month_seq window -> year 2000; the bare count(*) aliased
  private val q87 = """
SELECT count(*) AS num_cool_cust
FROM ((SELECT DISTINCT
  c_last_name,
  c_first_name,
  d_date
FROM store_sales, date_dim, customer_ds
WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
  AND store_sales.ss_customer_sk = customer_ds.c_customer_sk
  AND d_month_seq BETWEEN 360 AND 360 + 11)
      EXCEPT
      (SELECT DISTINCT
        c_last_name,
        c_first_name,
        d_date
      FROM catalog_sales, date_dim, customer_ds
      WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
        AND catalog_sales.cs_bill_customer_sk = customer_ds.c_customer_sk
        AND d_month_seq BETWEEN 360 AND 360 + 11)
      EXCEPT
      (SELECT DISTINCT
        c_last_name,
        c_first_name,
        d_date
      FROM web_sales, date_dim, customer_ds
      WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
        AND web_sales.ws_bill_customer_sk = customer_ds.c_customer_sk
        AND d_month_seq BETWEEN 360 AND 360 + 11)
     ) cool_cust"""

  // q96: s_store_name 'ese' -> 'STORE1'; the bare count aliased
  private val q96 = """
SELECT count(*) AS cnt
FROM store_sales, household_demographics, time_dim, store
WHERE ss_sold_time_sk = time_dim.t_time_sk
  AND ss_hdemo_sk = household_demographics.hd_demo_sk
  AND ss_store_sk = s_store_sk
  AND time_dim.t_hour = 20
  AND time_dim.t_minute >= 30
  AND household_demographics.hd_dep_count = 7
  AND store.s_store_name = 'STORE1'
ORDER BY count(*)
LIMIT 100"""

  // ---- round 8 batch C: the catalog/web returns tranche (17 more verbatim bodies) ----

  // q5: 3-channel sales-and-returns rollup; intervals pre-resolved; rollup NULLs get
  // explicit NULLS FIRST in the final ORDER BY (Spark's ASC default, under a LIMIT)
  private val q5 = """
WITH ssr AS
( SELECT
    s_store_id,
    sum(sales_price) AS sales,
    sum(profit) AS profit,
    sum(return_amt) AS returns,
    sum(net_loss) AS profit_loss
  FROM
    (SELECT
       ss_store_sk AS store_sk,
       ss_sold_date_sk AS date_sk,
       ss_ext_sales_price AS sales_price,
       ss_net_profit AS profit,
       cast(0 AS DECIMAL(7, 2)) AS return_amt,
       cast(0 AS DECIMAL(7, 2)) AS net_loss
     FROM store_sales
     UNION ALL
     SELECT
       sr_store_sk AS store_sk,
       sr_returned_date_sk AS date_sk,
       cast(0 AS DECIMAL(7, 2)) AS sales_price,
       cast(0 AS DECIMAL(7, 2)) AS profit,
       sr_return_amt AS return_amt,
       sr_net_loss AS net_loss
     FROM store_returns)
    salesreturns, date_dim, store
  WHERE date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-06'
    AND store_sk = s_store_sk
  GROUP BY s_store_id),
    csr AS
  ( SELECT
    cp_catalog_page_id,
    sum(sales_price) AS sales,
    sum(profit) AS profit,
    sum(return_amt) AS returns,
    sum(net_loss) AS profit_loss
  FROM
    (SELECT
       cs_catalog_page_sk AS page_sk,
       cs_sold_date_sk AS date_sk,
       cs_ext_sales_price AS sales_price,
       cs_net_profit AS profit,
       cast(0 AS DECIMAL(7, 2)) AS return_amt,
       cast(0 AS DECIMAL(7, 2)) AS net_loss
     FROM catalog_sales
     UNION ALL
     SELECT
       cr_catalog_page_sk AS page_sk,
       cr_returned_date_sk AS date_sk,
       cast(0 AS DECIMAL(7, 2)) AS sales_price,
       cast(0 AS DECIMAL(7, 2)) AS profit,
       cr_return_amount AS return_amt,
       cr_net_loss AS net_loss
     FROM catalog_returns
    ) salesreturns, date_dim, catalog_page
  WHERE date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-06'
    AND page_sk = cp_catalog_page_sk
  GROUP BY cp_catalog_page_id),
    wsr AS
  ( SELECT
    web_site_id,
    sum(sales_price) AS sales,
    sum(profit) AS profit,
    sum(return_amt) AS returns,
    sum(net_loss) AS profit_loss
  FROM
    (SELECT
       ws_web_site_sk AS wsr_web_site_sk,
       ws_sold_date_sk AS date_sk,
       ws_ext_sales_price AS sales_price,
       ws_net_profit AS profit,
       cast(0 AS DECIMAL(7, 2)) AS return_amt,
       cast(0 AS DECIMAL(7, 2)) AS net_loss
     FROM web_sales
     UNION ALL
     SELECT
       ws_web_site_sk AS wsr_web_site_sk,
       wr_returned_date_sk AS date_sk,
       cast(0 AS DECIMAL(7, 2)) AS sales_price,
       cast(0 AS DECIMAL(7, 2)) AS profit,
       wr_return_amt AS return_amt,
       wr_net_loss AS net_loss
     FROM web_returns
       LEFT OUTER JOIN web_sales ON
                                   (wr_item_sk = ws_item_sk
                                     AND wr_order_number = ws_order_number)
    ) salesreturns, date_dim, web_site
  WHERE date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-06'
    AND wsr_web_site_sk = web_site_sk
  GROUP BY web_site_id)
SELECT
  channel,
  id,
  sum(sales) AS sales,
  sum(returns) AS returns,
  sum(profit) AS profit
FROM
  (SELECT
     'store channel' AS channel,
     concat('store', s_store_id) AS id,
     sales,
     returns,
     (profit - profit_loss) AS profit
   FROM ssr
   UNION ALL
   SELECT
     'catalog channel' AS channel,
     concat('catalog_page', cp_catalog_page_id) AS id,
     sales,
     returns,
     (profit - profit_loss) AS profit
   FROM csr
   UNION ALL
   SELECT
     'web channel' AS channel,
     concat('web_site', web_site_id) AS id,
     sales,
     returns,
     (profit - profit_loss) AS profit
   FROM wsr
  ) x
GROUP BY ROLLUP (channel, id)
ORDER BY channel NULLS FIRST, id NULLS FIRST
LIMIT 100"""

  // q26: verbatim (the derived demographics carry 'College'; year 2000 in domain)
  private val q26 = """
SELECT
  i_item_id,
  avg(cs_quantity) agg1,
  avg(cs_list_price) agg2,
  avg(cs_coupon_amt) agg3,
  avg(cs_sales_price) agg4
FROM catalog_sales, customer_demographics, date_dim, item, promotion
WHERE cs_sold_date_sk = d_date_sk AND
  cs_item_sk = i_item_sk AND
  cs_bill_cdemo_sk = cd_demo_sk AND
  cs_promo_sk = p_promo_sk AND
  cd_gender = 'M' AND
  cd_marital_status = 'S' AND
  cd_education_status = 'College' AND
  (p_channel_email = 'N' OR p_channel_event = 'N') AND
  d_year = 2000
GROUP BY i_item_id
ORDER BY i_item_id
LIMIT 100"""

  // q30: d_year 2002 -> 2001 (returns reach at most sold+150 days, and sales end
  // 2001-08); state 'GA' -> 'ST1'
  private val q30 = """
WITH customer_total_return AS
(SELECT
    wr_returning_customer_sk AS ctr_customer_sk,
    ca_state AS ctr_state,
    sum(wr_return_amt) AS ctr_total_return
  FROM web_returns, date_dim, customer_address
  WHERE wr_returned_date_sk = d_date_sk
    AND d_year = 2001
    AND wr_returning_addr_sk = ca_address_sk
  GROUP BY wr_returning_customer_sk, ca_state)
SELECT
  c_customer_id,
  c_salutation,
  c_first_name,
  c_last_name,
  c_preferred_cust_flag,
  c_birth_day,
  c_birth_month,
  c_birth_year,
  c_birth_country,
  c_login,
  c_email_address,
  c_last_review_date,
  ctr_total_return
FROM customer_total_return ctr1, customer_address, customer_ds
WHERE ctr1.ctr_total_return > (SELECT avg(ctr_total_return) * 1.2
FROM customer_total_return ctr2
WHERE ctr1.ctr_state = ctr2.ctr_state)
  AND ca_address_sk = c_current_addr_sk
  AND ca_state = 'ST1'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id, c_salutation, c_first_name, c_last_name, c_preferred_cust_flag
  , c_birth_day, c_birth_month, c_birth_year, c_birth_country, c_login, c_email_address
  , c_last_review_date, ctr_total_return
LIMIT 100"""

  // q33: category 'Electronics' -> 'LARGE' (derived p_type domain); -5 gmt exists
  private val q33 = """
WITH ss AS (
  SELECT
    i_manufact_id,
    sum(ss_ext_sales_price) total_sales
  FROM
    store_sales, date_dim, customer_address, item
  WHERE
    i_manufact_id IN (SELECT i_manufact_id
    FROM item
    WHERE i_category IN ('LARGE'))
      AND ss_item_sk = i_item_sk
      AND ss_sold_date_sk = d_date_sk
      AND d_year = 1998
      AND d_moy = 5
      AND ss_addr_sk = ca_address_sk
      AND ca_gmt_offset = -5
  GROUP BY i_manufact_id), cs AS
(SELECT
    i_manufact_id,
    sum(cs_ext_sales_price) total_sales
  FROM catalog_sales, date_dim, customer_address, item
  WHERE
    i_manufact_id IN (
      SELECT i_manufact_id
      FROM item
      WHERE
        i_category IN ('LARGE'))
      AND cs_item_sk = i_item_sk
      AND cs_sold_date_sk = d_date_sk
      AND d_year = 1998
      AND d_moy = 5
      AND cs_bill_addr_sk = ca_address_sk
      AND ca_gmt_offset = -5
  GROUP BY i_manufact_id),
    ws AS (
    SELECT
      i_manufact_id,
      sum(ws_ext_sales_price) total_sales
    FROM
      web_sales, date_dim, customer_address, item
    WHERE
      i_manufact_id IN (SELECT i_manufact_id
      FROM item
      WHERE i_category IN ('LARGE'))
        AND ws_item_sk = i_item_sk
        AND ws_sold_date_sk = d_date_sk
        AND d_year = 1998
        AND d_moy = 5
        AND ws_bill_addr_sk = ca_address_sk
        AND ca_gmt_offset = -5
    GROUP BY i_manufact_id)
SELECT
  i_manufact_id,
  sum(total_sales) total_sales
FROM (SELECT *
      FROM ss
      UNION ALL
      SELECT *
      FROM cs
      UNION ALL
      SELECT *
      FROM ws) tmp1
GROUP BY i_manufact_id
ORDER BY total_sales
LIMIT 100"""

  // q40: price band 0.99..1.49 -> 990..1049; intervals pre-resolved
  private val q40 = """
SELECT
  w_state,
  i_item_id,
  sum(CASE WHEN (cast(d_date AS DATE) < cast('2000-03-11' AS DATE))
    THEN cs_sales_price - coalesce(cr_refunded_cash, 0)
      ELSE 0 END) AS sales_before,
  sum(CASE WHEN (cast(d_date AS DATE) >= cast('2000-03-11' AS DATE))
    THEN cs_sales_price - coalesce(cr_refunded_cash, 0)
      ELSE 0 END) AS sales_after
FROM
  catalog_sales
  LEFT OUTER JOIN catalog_returns ON
                                    (cs_order_number = cr_order_number
                                      AND cs_item_sk = cr_item_sk)
  , warehouse, item, date_dim
WHERE
  i_current_price BETWEEN 990 AND 1049
    AND i_item_sk = cs_item_sk
    AND cs_warehouse_sk = w_warehouse_sk
    AND cs_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-02-10' AND DATE '2000-04-10'
GROUP BY w_state, i_item_id
ORDER BY w_state, i_item_id
LIMIT 100"""

  // q56: colors fitted to the derived p_name first tokens
  private val q56 = """
WITH ss AS (
  SELECT
    i_item_id,
    sum(ss_ext_sales_price) total_sales
  FROM
    store_sales, date_dim, customer_address, item
  WHERE
    i_item_id IN (SELECT i_item_id
    FROM item
    WHERE i_color IN ('blue', 'cold', 'hot'))
      AND ss_item_sk = i_item_sk
      AND ss_sold_date_sk = d_date_sk
      AND d_year = 2001
      AND d_moy = 2
      AND ss_addr_sk = ca_address_sk
      AND ca_gmt_offset = -5
  GROUP BY i_item_id),
    cs AS (
    SELECT
      i_item_id,
      sum(cs_ext_sales_price) total_sales
    FROM
      catalog_sales, date_dim, customer_address, item
    WHERE
      i_item_id IN (SELECT i_item_id
      FROM item
      WHERE i_color IN ('blue', 'cold', 'hot'))
        AND cs_item_sk = i_item_sk
        AND cs_sold_date_sk = d_date_sk
        AND d_year = 2001
        AND d_moy = 2
        AND cs_bill_addr_sk = ca_address_sk
        AND ca_gmt_offset = -5
    GROUP BY i_item_id),
    ws AS (
    SELECT
      i_item_id,
      sum(ws_ext_sales_price) total_sales
    FROM
      web_sales, date_dim, customer_address, item
    WHERE
      i_item_id IN (SELECT i_item_id
      FROM item
      WHERE i_color IN ('blue', 'cold', 'hot'))
        AND ws_item_sk = i_item_sk
        AND ws_sold_date_sk = d_date_sk
        AND d_year = 2001
        AND d_moy = 2
        AND ws_bill_addr_sk = ca_address_sk
        AND ca_gmt_offset = -5
    GROUP BY i_item_id)
SELECT
  i_item_id,
  sum(total_sales) total_sales
FROM (SELECT *
      FROM ss
      UNION ALL
      SELECT *
      FROM cs
      UNION ALL
      SELECT *
      FROM ws) tmp1
GROUP BY i_item_id
ORDER BY total_sales
LIMIT 100"""

  // q60: category 'Music' -> 'MEDIUM'
  private val q60 = """
WITH ss AS (
  SELECT
    i_item_id,
    sum(ss_ext_sales_price) total_sales
  FROM store_sales, date_dim, customer_address, item
  WHERE
    i_item_id IN (SELECT i_item_id
    FROM item
    WHERE i_category IN ('MEDIUM'))
      AND ss_item_sk = i_item_sk
      AND ss_sold_date_sk = d_date_sk
      AND d_year = 1998
      AND d_moy = 9
      AND ss_addr_sk = ca_address_sk
      AND ca_gmt_offset = -5
  GROUP BY i_item_id),
    cs AS (
    SELECT
      i_item_id,
      sum(cs_ext_sales_price) total_sales
    FROM catalog_sales, date_dim, customer_address, item
    WHERE
      i_item_id IN (SELECT i_item_id
      FROM item
      WHERE i_category IN ('MEDIUM'))
        AND cs_item_sk = i_item_sk
        AND cs_sold_date_sk = d_date_sk
        AND d_year = 1998
        AND d_moy = 9
        AND cs_bill_addr_sk = ca_address_sk
        AND ca_gmt_offset = -5
    GROUP BY i_item_id),
    ws AS (
    SELECT
      i_item_id,
      sum(ws_ext_sales_price) total_sales
    FROM web_sales, date_dim, customer_address, item
    WHERE
      i_item_id IN (SELECT i_item_id
      FROM item
      WHERE i_category IN ('MEDIUM'))
        AND ws_item_sk = i_item_sk
        AND ws_sold_date_sk = d_date_sk
        AND d_year = 1998
        AND d_moy = 9
        AND ws_bill_addr_sk = ca_address_sk
        AND ca_gmt_offset = -5
    GROUP BY i_item_id)
SELECT
  i_item_id,
  sum(total_sales) total_sales
FROM (SELECT *
      FROM ss
      UNION ALL
      SELECT *
      FROM cs
      UNION ALL
      SELECT *
      FROM ws) tmp1
GROUP BY i_item_id
ORDER BY i_item_id, total_sales
LIMIT 100"""

  // q61: category 'Jewelry' -> 'PROMO'; the unaliased ratio column gains an alias
  // and an edge DOUBLE cast (Spark and DuckDB disagree on decimal-division scale
  // rules, and both sums are exact integers so the double division is deterministic)
  private val q61 = """
SELECT
  promotions,
  total,
  CAST(cast(promotions AS DECIMAL(15, 4)) / cast(total AS DECIMAL(15, 4)) * 100
    AS DOUBLE) AS promo_pct
FROM
  (SELECT sum(ss_ext_sales_price) promotions
  FROM store_sales, store, promotion, date_dim, customer_ds, customer_address, item
  WHERE ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND ss_promo_sk = p_promo_sk
    AND ss_customer_sk = c_customer_sk
    AND ca_address_sk = c_current_addr_sk
    AND ss_item_sk = i_item_sk
    AND ca_gmt_offset = -5
    AND i_category = 'PROMO'
    AND (p_channel_dmail = 'Y' OR p_channel_email = 'Y' OR p_channel_tv = 'Y')
    AND s_gmt_offset = -5
    AND d_year = 1998
    AND d_moy = 11) promotional_sales,
  (SELECT sum(ss_ext_sales_price) total
  FROM store_sales, store, date_dim, customer_ds, customer_address, item
  WHERE ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND ss_customer_sk = c_customer_sk
    AND ca_address_sk = c_current_addr_sk
    AND ss_item_sk = i_item_sk
    AND ca_gmt_offset = -5
    AND i_category = 'PROMO'
    AND s_gmt_offset = -5
    AND d_year = 1998
    AND d_moy = 11) all_sales
ORDER BY promotions, total
LIMIT 100"""

  // q71: verbatim (time_dim carries breakfast/dinner meal bands)
  private val q71 = """
SELECT
  i_brand_id brand_id,
  i_brand brand,
  t_hour,
  t_minute,
  sum(ext_price) ext_price
FROM item,
  (SELECT
     ws_ext_sales_price AS ext_price,
     ws_sold_date_sk AS sold_date_sk,
     ws_item_sk AS sold_item_sk,
     ws_sold_time_sk AS time_sk
   FROM web_sales, date_dim
   WHERE d_date_sk = ws_sold_date_sk
     AND d_moy = 11
     AND d_year = 1999
   UNION ALL
   SELECT
     cs_ext_sales_price AS ext_price,
     cs_sold_date_sk AS sold_date_sk,
     cs_item_sk AS sold_item_sk,
     cs_sold_time_sk AS time_sk
   FROM catalog_sales, date_dim
   WHERE d_date_sk = cs_sold_date_sk
     AND d_moy = 11
     AND d_year = 1999
   UNION ALL
   SELECT
     ss_ext_sales_price AS ext_price,
     ss_sold_date_sk AS sold_date_sk,
     ss_item_sk AS sold_item_sk,
     ss_sold_time_sk AS time_sk
   FROM store_sales, date_dim
   WHERE d_date_sk = ss_sold_date_sk
     AND d_moy = 11
     AND d_year = 1999
  ) AS tmp, time_dim
WHERE
  sold_item_sk = i_item_sk
    AND i_manager_id = 1
    AND time_sk = t_time_sk
    AND (t_meal_time = 'breakfast' OR t_meal_time = 'dinner')
GROUP BY i_brand, i_brand_id, t_hour, t_minute
ORDER BY ext_price DESC, brand_id"""

  // q77: intervals pre-resolved; rollup NULLs get explicit NULLS FIRST under the LIMIT
  private val q77 = """
WITH ss AS
(SELECT
    s_store_sk,
    sum(ss_ext_sales_price) AS sales,
    sum(ss_net_profit) AS profit
  FROM store_sales, date_dim, store
  WHERE ss_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
    AND ss_store_sk = s_store_sk
  GROUP BY s_store_sk),
    sr AS
  (SELECT
    s_store_sk,
    sum(sr_return_amt) AS returns_amt,
    sum(sr_net_loss) AS profit_loss
  FROM store_returns, date_dim, store
  WHERE sr_returned_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
    AND sr_store_sk = s_store_sk
  GROUP BY s_store_sk),
    cs AS
  (SELECT
    cs_call_center_sk,
    sum(cs_ext_sales_price) AS sales,
    sum(cs_net_profit) AS profit
  FROM catalog_sales, date_dim
  WHERE cs_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
  GROUP BY cs_call_center_sk),
    cr AS
  (SELECT
    sum(cr_return_amount) AS returns_amt,
    sum(cr_net_loss) AS profit_loss
  FROM catalog_returns, date_dim
  WHERE cr_returned_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'),
    ws AS
  (SELECT
    wp_web_page_sk,
    sum(ws_ext_sales_price) AS sales,
    sum(ws_net_profit) AS profit
  FROM web_sales, date_dim, web_page
  WHERE ws_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
    AND ws_web_page_sk = wp_web_page_sk
  GROUP BY wp_web_page_sk),
    wr AS
  (SELECT
    wp_web_page_sk,
    sum(wr_return_amt) AS returns_amt,
    sum(wr_net_loss) AS profit_loss
  FROM web_returns, date_dim, web_page
  WHERE wr_returned_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
    AND wr_web_page_sk = wp_web_page_sk
  GROUP BY wp_web_page_sk)
SELECT
  channel,
  id,
  sum(sales) AS sales,
  sum(returns) AS returns,
  sum(profit) AS profit
FROM
  (SELECT
     'store channel' AS channel,
     ss.s_store_sk AS id,
     sales,
     coalesce(returns_amt, 0) AS returns,
     (profit - coalesce(profit_loss, 0)) AS profit
   FROM ss
     LEFT JOIN sr
       ON ss.s_store_sk = sr.s_store_sk
   UNION ALL
   SELECT
     'catalog channel' AS channel,
     cs_call_center_sk AS id,
     sales,
     returns_amt AS returns,
     (profit - profit_loss) AS profit
   FROM cs, cr
   UNION ALL
   SELECT
     'web channel' AS channel,
     ws.wp_web_page_sk AS id,
     sales,
     coalesce(returns_amt, 0) AS returns,
     (profit - coalesce(profit_loss, 0)) AS profit
   FROM ws
     LEFT JOIN wr
       ON ws.wp_web_page_sk = wr.wp_web_page_sk
  ) x
GROUP BY ROLLUP (channel, id)
ORDER BY channel NULLS FIRST, id NULLS FIRST
LIMIT 100"""

  // q78: verbatim (year 2000); int qty sums cast BIGINT at the edge. Inherently
  // ultra-selective — the same (customer, item, year) must appear un-returned in all
  // THREE channels — so sf0.01 yields 0 rows by construction; sf0.1 (the bench scale)
  // yields rows (2 probed).
  private val q78 = """
WITH ws AS
(SELECT
    d_year AS ws_sold_year,
    ws_item_sk,
    ws_bill_customer_sk ws_customer_sk,
    CAST(sum(ws_quantity) AS BIGINT) ws_qty,
    sum(ws_wholesale_cost) ws_wc,
    sum(ws_sales_price) ws_sp
  FROM web_sales
    LEFT JOIN web_returns ON wr_order_number = ws_order_number AND ws_item_sk = wr_item_sk
    JOIN date_dim ON ws_sold_date_sk = d_date_sk
  WHERE wr_order_number IS NULL
  GROUP BY d_year, ws_item_sk, ws_bill_customer_sk
),
    cs AS
  (SELECT
    d_year AS cs_sold_year,
    cs_item_sk,
    cs_bill_customer_sk cs_customer_sk,
    CAST(sum(cs_quantity) AS BIGINT) cs_qty,
    sum(cs_wholesale_cost) cs_wc,
    sum(cs_sales_price) cs_sp
  FROM catalog_sales
    LEFT JOIN catalog_returns ON cr_order_number = cs_order_number AND cs_item_sk = cr_item_sk
    JOIN date_dim ON cs_sold_date_sk = d_date_sk
  WHERE cr_order_number IS NULL
  GROUP BY d_year, cs_item_sk, cs_bill_customer_sk
  ),
    ss AS
  (SELECT
    d_year AS ss_sold_year,
    ss_item_sk,
    ss_customer_sk,
    CAST(sum(ss_quantity) AS BIGINT) ss_qty,
    sum(ss_wholesale_cost) ss_wc,
    sum(ss_sales_price) ss_sp
  FROM store_sales
    LEFT JOIN store_returns ON sr_ticket_number = ss_ticket_number AND ss_item_sk = sr_item_sk
    JOIN date_dim ON ss_sold_date_sk = d_date_sk
  WHERE sr_ticket_number IS NULL
  GROUP BY d_year, ss_item_sk, ss_customer_sk
  )
SELECT
  round(ss_qty / (coalesce(ws_qty + cs_qty, 1)), 2) ratio,
  ss_qty store_qty,
  ss_wc store_wholesale_cost,
  ss_sp store_sales_price,
  coalesce(ws_qty, 0) + coalesce(cs_qty, 0) other_chan_qty,
  coalesce(ws_wc, 0) + coalesce(cs_wc, 0) other_chan_wholesale_cost,
  coalesce(ws_sp, 0) + coalesce(cs_sp, 0) other_chan_sales_price
FROM ss
  LEFT JOIN ws
    ON (ws_sold_year = ss_sold_year AND ws_item_sk = ss_item_sk AND ws_customer_sk = ss_customer_sk)
  LEFT JOIN cs
    ON (cs_sold_year = ss_sold_year AND cs_item_sk = ss_item_sk AND cs_customer_sk = ss_customer_sk)
WHERE coalesce(ws_qty, 0) > 0 AND coalesce(cs_qty, 0) > 0 AND ss_sold_year = 2000
ORDER BY
  ratio,
  ss_qty DESC, ss_wc DESC, ss_sp DESC,
  other_chan_qty,
  other_chan_wholesale_cost,
  other_chan_sales_price,
  round(ss_qty / (coalesce(ws_qty + cs_qty, 1)), 2)
LIMIT 100"""

  // q80: price filter fitted (> 1800, the derived price domain's upper half);
  // intervals pre-resolved; rollup NULLs get explicit NULLS FIRST
  private val q80 = """
WITH ssr AS
(SELECT
    s_store_id AS store_id,
    sum(ss_ext_sales_price) AS sales,
    sum(coalesce(sr_return_amt, 0)) AS returns,
    sum(ss_net_profit - coalesce(sr_net_loss, 0)) AS profit
  FROM store_sales
    LEFT OUTER JOIN store_returns ON
                                    (ss_item_sk = sr_item_sk AND
                                      ss_ticket_number = sr_ticket_number)
    ,
    date_dim, store, item, promotion
  WHERE ss_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND ss_store_sk = s_store_sk
    AND ss_item_sk = i_item_sk
    AND i_current_price > 1800
    AND ss_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY s_store_id),
    csr AS
  (SELECT
    cp_catalog_page_id AS catalog_page_id,
    sum(cs_ext_sales_price) AS sales,
    sum(coalesce(cr_return_amount, 0)) AS returns,
    sum(cs_net_profit - coalesce(cr_net_loss, 0)) AS profit
  FROM catalog_sales
    LEFT OUTER JOIN catalog_returns ON
                                      (cs_item_sk = cr_item_sk AND
                                        cs_order_number = cr_order_number)
    ,
    date_dim, catalog_page, item, promotion
  WHERE cs_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND cs_catalog_page_sk = cp_catalog_page_sk
    AND cs_item_sk = i_item_sk
    AND i_current_price > 1800
    AND cs_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY cp_catalog_page_id),
    wsr AS
  (SELECT
    web_site_id,
    sum(ws_ext_sales_price) AS sales,
    sum(coalesce(wr_return_amt, 0)) AS returns,
    sum(ws_net_profit - coalesce(wr_net_loss, 0)) AS profit
  FROM web_sales
    LEFT OUTER JOIN web_returns ON
                                  (ws_item_sk = wr_item_sk AND ws_order_number = wr_order_number)
    ,
    date_dim, web_site, item, promotion
  WHERE ws_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND ws_web_site_sk = web_site_sk
    AND ws_item_sk = i_item_sk
    AND i_current_price > 1800
    AND ws_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY web_site_id)
SELECT
  channel,
  id,
  sum(sales) AS sales,
  sum(returns) AS returns,
  sum(profit) AS profit
FROM (SELECT
        'store channel' AS channel,
        concat('store', store_id) AS id,
        sales,
        returns,
        profit
      FROM ssr
      UNION ALL
      SELECT
        'catalog channel' AS channel,
        concat('catalog_page', catalog_page_id) AS id,
        sales,
        returns,
        profit
      FROM csr
      UNION ALL
      SELECT
        'web channel' AS channel,
        concat('web_site', web_site_id) AS id,
        sales,
        returns,
        profit
      FROM wsr) x
GROUP BY ROLLUP (channel, id)
ORDER BY channel NULLS FIRST, id NULLS FIRST
LIMIT 100"""

  // q81: state 'GA' -> 'ST1'
  private val q81 = """
WITH customer_total_return AS
(SELECT
    cr_returning_customer_sk AS ctr_customer_sk,
    ca_state AS ctr_state,
    sum(cr_return_amt_inc_tax) AS ctr_total_return
  FROM catalog_returns, date_dim, customer_address
  WHERE cr_returned_date_sk = d_date_sk
    AND d_year = 2000
    AND cr_returning_addr_sk = ca_address_sk
  GROUP BY cr_returning_customer_sk, ca_state )
SELECT
  c_customer_id,
  c_salutation,
  c_first_name,
  c_last_name,
  ca_street_number,
  ca_street_name,
  ca_street_type,
  ca_suite_number,
  ca_city,
  ca_county,
  ca_state,
  ca_zip,
  ca_country,
  ca_gmt_offset,
  ca_location_type,
  ctr_total_return
FROM customer_total_return ctr1, customer_address, customer_ds
WHERE ctr1.ctr_total_return > (SELECT avg(ctr_total_return) * 1.2
FROM customer_total_return ctr2
WHERE ctr1.ctr_state = ctr2.ctr_state)
  AND ca_address_sk = c_current_addr_sk
  AND ca_state = 'ST1'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id, c_salutation, c_first_name, c_last_name, ca_street_number, ca_street_name
  , ca_street_type, ca_suite_number, ca_city, ca_county, ca_state, ca_zip, ca_country, ca_gmt_offset
  , ca_location_type, ctr_total_return
LIMIT 100"""

  // q83: verbatim dates (return dates extend ~150 days past each sale); the three
  // int quantity sums cast BIGINT at the edge. Tri-channel intersection is sparse:
  // 0 rows at sf0.01 by construction, 10 rows probed at sf0.1 (the bench scale).
  private val q83 = """
WITH sr_items AS
(SELECT
    i_item_id item_id,
    CAST(sum(sr_return_quantity) AS BIGINT) sr_item_qty
  FROM store_returns, item, date_dim
  WHERE sr_item_sk = i_item_sk
    AND d_date IN (SELECT d_date
  FROM date_dim
  WHERE d_week_seq IN
    (SELECT d_week_seq
    FROM date_dim
    WHERE d_date IN ('2000-06-30', '2000-09-27', '2000-11-17')))
    AND sr_returned_date_sk = d_date_sk
  GROUP BY i_item_id),
    cr_items AS
  (SELECT
    i_item_id item_id,
    CAST(sum(cr_return_quantity) AS BIGINT) cr_item_qty
  FROM catalog_returns, item, date_dim
  WHERE cr_item_sk = i_item_sk
    AND d_date IN (SELECT d_date
  FROM date_dim
  WHERE d_week_seq IN
    (SELECT d_week_seq
    FROM date_dim
    WHERE d_date IN ('2000-06-30', '2000-09-27', '2000-11-17')))
    AND cr_returned_date_sk = d_date_sk
  GROUP BY i_item_id),
    wr_items AS
  (SELECT
    i_item_id item_id,
    CAST(sum(wr_return_quantity) AS BIGINT) wr_item_qty
  FROM web_returns, item, date_dim
  WHERE wr_item_sk = i_item_sk AND d_date IN
    (SELECT d_date
    FROM date_dim
    WHERE d_week_seq IN
      (SELECT d_week_seq
      FROM date_dim
      WHERE d_date IN ('2000-06-30', '2000-09-27', '2000-11-17')))
    AND wr_returned_date_sk = d_date_sk
  GROUP BY i_item_id)
SELECT
  sr_items.item_id,
  sr_item_qty,
  sr_item_qty / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 * 100 sr_dev,
  cr_item_qty,
  cr_item_qty / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 * 100 cr_dev,
  wr_item_qty,
  wr_item_qty / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 * 100 wr_dev,
  CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE) / 3.0 average
FROM sr_items, cr_items, wr_items
WHERE sr_items.item_id = cr_items.item_id
  AND sr_items.item_id = wr_items.item_id
ORDER BY sr_items.item_id, sr_item_qty
LIMIT 100"""

  // q85: demographics/states/price/profit fits as in q13 ('W' -> 'D', the derived
  // marital domain); the four bare outputs gain aliases
  private val q85 = """
SELECT
  substr(r_reason_desc, 1, 20) AS reason_prefix,
  avg(ws_quantity) AS avg_quantity,
  avg(wr_refunded_cash) AS avg_refunded_cash,
  avg(wr_fee) AS avg_fee
FROM web_sales, web_returns, web_page, customer_demographics cd1,
  customer_demographics cd2, customer_address, date_dim, reason
WHERE ws_web_page_sk = wp_web_page_sk
  AND ws_item_sk = wr_item_sk
  AND ws_order_number = wr_order_number
  AND ws_sold_date_sk = d_date_sk AND d_year = 2000
  AND cd1.cd_demo_sk = wr_refunded_cdemo_sk
  AND cd2.cd_demo_sk = wr_returning_cdemo_sk
  AND ca_address_sk = wr_refunded_addr_sk
  AND r_reason_sk = wr_reason_sk
  AND
  (
    (
      cd1.cd_marital_status = 'M'
        AND
        cd1.cd_marital_status = cd2.cd_marital_status
        AND
        cd1.cd_education_status = '4 yr Degree'
        AND
        cd1.cd_education_status = cd2.cd_education_status
        AND
        ws_sales_price BETWEEN 10000.00 AND 15000.00
    )
      OR
      (
        cd1.cd_marital_status = 'S'
          AND
          cd1.cd_marital_status = cd2.cd_marital_status
          AND
          cd1.cd_education_status = 'College'
          AND
          cd1.cd_education_status = cd2.cd_education_status
          AND
          ws_sales_price BETWEEN 5000.00 AND 10000.00
      )
      OR
      (
        cd1.cd_marital_status = 'D'
          AND
          cd1.cd_marital_status = cd2.cd_marital_status
          AND
          cd1.cd_education_status = 'Secondary'
          AND
          cd1.cd_education_status = cd2.cd_education_status
          AND
          ws_sales_price BETWEEN 15000.00 AND 20000.00
      )
  )
  AND
  (
    (
      ca_country = 'United States'
        AND
        ca_state IN ('ST1', 'ST2', 'ST3')
        AND ws_net_profit BETWEEN 1000 AND 2000
    )
      OR
      (
        ca_country = 'United States'
          AND
          ca_state IN ('ST4', 'ST5', 'ST6')
          AND ws_net_profit BETWEEN 1500 AND 3000
      )
      OR
      (
        ca_country = 'United States'
          AND
          ca_state IN ('ST7', 'ST8', 'ST9')
          AND ws_net_profit BETWEEN 500 AND 2500
      )
  )
GROUP BY r_reason_desc
ORDER BY substr(r_reason_desc, 1, 20)
  , avg(ws_quantity)
  , avg(wr_refunded_cash)
  , avg(wr_fee)
LIMIT 100"""

  // q91: demographics pairs fitted to the derived domains ('Unknown' education does
  // not exist -> 'Primary'; 'W' -> 'D'); hd_buy_potential LIKE fitted to 'unknown%'
  private val q91 = """
SELECT
  cc_call_center_id Call_Center,
  cc_name Call_Center_Name,
  cc_manager Manager,
  sum(cr_net_loss) Returns_Loss
FROM
  call_center, catalog_returns, date_dim, customer_ds, customer_address,
  customer_demographics, household_demographics
WHERE
  cr_call_center_sk = cc_call_center_sk
    AND cr_returned_date_sk = d_date_sk
    AND cr_returning_customer_sk = c_customer_sk
    AND cd_demo_sk = c_current_cdemo_sk
    AND hd_demo_sk = c_current_hdemo_sk
    AND ca_address_sk = c_current_addr_sk
    AND d_year = 1998
    AND d_moy = 11
    AND ((cd_marital_status = 'M' AND cd_education_status = 'Primary')
    OR (cd_marital_status = 'D' AND cd_education_status = '4 yr Degree'))
    AND hd_buy_potential LIKE 'unknown%'
    AND ca_gmt_offset = -7
GROUP BY cc_call_center_id, cc_name, cc_manager, cd_marital_status, cd_education_status
ORDER BY sum(cr_net_loss) DESC"""

  // q92: manufact id folded to 0..99 (350 -> 50); interval pre-resolved; the
  // backtick alias becomes a plain identifier
  private val q92 = """
SELECT sum(ws_ext_discount_amt) AS excess_discount_amount
FROM web_sales, item, date_dim
WHERE i_manufact_id = 50
  AND i_item_sk = ws_item_sk
  AND d_date BETWEEN DATE '2000-01-27' AND DATE '2000-04-26'
  AND d_date_sk = ws_sold_date_sk
  AND ws_ext_discount_amt >
  (
    SELECT 1.3 * avg(ws_ext_discount_amt)
    FROM web_sales, date_dim
    WHERE ws_item_sk = i_item_sk
      AND d_date BETWEEN DATE '2000-01-27' AND DATE '2000-04-26'
      AND d_date_sk = ws_sold_date_sk
  )
ORDER BY sum(ws_ext_discount_amt)
LIMIT 100"""

  // ---- round 8 batch D: nineteen more verbatim bodies (yoy, ship-lag, stddev,
  // rank, and cross-channel shapes) ----

  // q4: customer -> customer_ds (the TPC-H base shadows the name); years 2001/2002 ->
  // 2000/2001 (sales end 2001-08). Same year_total disease as q74 but worse — THREE
  // channel arms, SIX references (4.9x / 6.8 s at sf1 in r9): held split so the CTE
  // materializes once through StarCache (see materializedCtes); the fallback body
  // below is the intact official text by construction.
  private val q4YearTotalCte = """
  SELECT
    c_customer_id customer_id,
    c_first_name customer_first_name,
    c_last_name customer_last_name,
    c_preferred_cust_flag customer_preferred_cust_flag,
    c_birth_country customer_birth_country,
    c_login customer_login,
    c_email_address customer_email_address,
    d_year dyear,
    sum(((ss_ext_list_price - ss_ext_wholesale_cost - ss_ext_discount_amt) +
      ss_ext_sales_price) / 2) year_total,
    's' sale_type
  FROM customer_ds, store_sales, date_dim
  WHERE c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
  GROUP BY c_customer_id,
    c_first_name,
    c_last_name,
    c_preferred_cust_flag,
    c_birth_country,
    c_login,
    c_email_address,
    d_year
  UNION ALL
  SELECT
    c_customer_id customer_id,
    c_first_name customer_first_name,
    c_last_name customer_last_name,
    c_preferred_cust_flag customer_preferred_cust_flag,
    c_birth_country customer_birth_country,
    c_login customer_login,
    c_email_address customer_email_address,
    d_year dyear,
    sum((((cs_ext_list_price - cs_ext_wholesale_cost - cs_ext_discount_amt) +
      cs_ext_sales_price) / 2)) year_total,
    'c' sale_type
  FROM customer_ds, catalog_sales, date_dim
  WHERE c_customer_sk = cs_bill_customer_sk AND cs_sold_date_sk = d_date_sk
  GROUP BY c_customer_id,
    c_first_name,
    c_last_name,
    c_preferred_cust_flag,
    c_birth_country,
    c_login,
    c_email_address,
    d_year
  UNION ALL
  SELECT
    c_customer_id customer_id,
    c_first_name customer_first_name,
    c_last_name customer_last_name,
    c_preferred_cust_flag customer_preferred_cust_flag,
    c_birth_country customer_birth_country,
    c_login customer_login,
    c_email_address customer_email_address,
    d_year dyear,
    sum((((ws_ext_list_price - ws_ext_wholesale_cost - ws_ext_discount_amt) + ws_ext_sales_price) /
      2)) year_total,
    'w' sale_type
  FROM customer_ds, web_sales, date_dim
  WHERE c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
  GROUP BY c_customer_id,
    c_first_name,
    c_last_name,
    c_preferred_cust_flag,
    c_birth_country,
    c_login,
    c_email_address,
    d_year"""

  private[graft] val q4Select = """
SELECT
  t_s_secyear.customer_id,
  t_s_secyear.customer_first_name,
  t_s_secyear.customer_last_name,
  t_s_secyear.customer_preferred_cust_flag,
  t_s_secyear.customer_birth_country,
  t_s_secyear.customer_login,
  t_s_secyear.customer_email_address
FROM year_total t_s_firstyear, year_total t_s_secyear, year_total t_c_firstyear,
  year_total t_c_secyear, year_total t_w_firstyear, year_total t_w_secyear
WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_c_secyear.customer_id
  AND t_s_firstyear.customer_id = t_c_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
  AND t_s_firstyear.sale_type = 's'
  AND t_c_firstyear.sale_type = 'c'
  AND t_w_firstyear.sale_type = 'w'
  AND t_s_secyear.sale_type = 's'
  AND t_c_secyear.sale_type = 'c'
  AND t_w_secyear.sale_type = 'w'
  AND t_s_firstyear.dyear = 2000
  AND t_s_secyear.dyear = 2000 + 1
  AND t_c_firstyear.dyear = 2000
  AND t_c_secyear.dyear = 2000 + 1
  AND t_w_firstyear.dyear = 2000
  AND t_w_secyear.dyear = 2000 + 1
  AND t_s_firstyear.year_total > 0
  AND t_c_firstyear.year_total > 0
  AND t_w_firstyear.year_total > 0
  AND CASE WHEN t_c_firstyear.year_total > 0
  THEN t_c_secyear.year_total / t_c_firstyear.year_total
      ELSE NULL END
  > CASE WHEN t_s_firstyear.year_total > 0
  THEN t_s_secyear.year_total / t_s_firstyear.year_total
    ELSE NULL END
  AND CASE WHEN t_c_firstyear.year_total > 0
  THEN t_c_secyear.year_total / t_c_firstyear.year_total
      ELSE NULL END
  > CASE WHEN t_w_firstyear.year_total > 0
  THEN t_w_secyear.year_total / t_w_firstyear.year_total
    ELSE NULL END
ORDER BY
  t_s_secyear.customer_id,
  t_s_secyear.customer_first_name,
  t_s_secyear.customer_last_name,
  t_s_secyear.customer_preferred_cust_flag,
  t_s_secyear.customer_birth_country,
  t_s_secyear.customer_login,
  t_s_secyear.customer_email_address
LIMIT 100"""

  /** The intact official q4 body — CTE + SELECT, exactly the reference's text. */
  private val q4 = s"\nWITH year_total AS ($q4YearTotalCte)$q4Select"

  // q11: customer -> customer_ds; years -> 2000/2001
  private val q11 = """
WITH year_total AS (
  SELECT
    c_customer_id customer_id,
    c_first_name customer_first_name,
    c_last_name customer_last_name,
    c_preferred_cust_flag customer_preferred_cust_flag,
    c_birth_country customer_birth_country,
    c_login customer_login,
    c_email_address customer_email_address,
    d_year dyear,
    sum(ss_ext_list_price - ss_ext_discount_amt) year_total,
    's' sale_type
  FROM customer_ds, store_sales, date_dim
  WHERE c_customer_sk = ss_customer_sk
    AND ss_sold_date_sk = d_date_sk
  GROUP BY c_customer_id
    , c_first_name
    , c_last_name
    , d_year
    , c_preferred_cust_flag
    , c_birth_country
    , c_login
    , c_email_address
    , d_year
  UNION ALL
  SELECT
    c_customer_id customer_id,
    c_first_name customer_first_name,
    c_last_name customer_last_name,
    c_preferred_cust_flag customer_preferred_cust_flag,
    c_birth_country customer_birth_country,
    c_login customer_login,
    c_email_address customer_email_address,
    d_year dyear,
    sum(ws_ext_list_price - ws_ext_discount_amt) year_total,
    'w' sale_type
  FROM customer_ds, web_sales, date_dim
  WHERE c_customer_sk = ws_bill_customer_sk
    AND ws_sold_date_sk = d_date_sk
  GROUP BY
    c_customer_id, c_first_name, c_last_name, c_preferred_cust_flag, c_birth_country,
    c_login, c_email_address, d_year)
SELECT t_s_secyear.customer_preferred_cust_flag
FROM year_total t_s_firstyear
  , year_total t_s_secyear
  , year_total t_w_firstyear
  , year_total t_w_secyear
WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
  AND t_s_firstyear.sale_type = 's'
  AND t_w_firstyear.sale_type = 'w'
  AND t_s_secyear.sale_type = 's'
  AND t_w_secyear.sale_type = 'w'
  AND t_s_firstyear.dyear = 2000
  AND t_s_secyear.dyear = 2000 + 1
  AND t_w_firstyear.dyear = 2000
  AND t_w_secyear.dyear = 2000 + 1
  AND t_s_firstyear.year_total > 0
  AND t_w_firstyear.year_total > 0
  AND CASE WHEN t_w_firstyear.year_total > 0
  THEN t_w_secyear.year_total / t_w_firstyear.year_total
      ELSE NULL END
  > CASE WHEN t_s_firstyear.year_total > 0
  THEN t_s_secyear.year_total / t_s_firstyear.year_total
    ELSE NULL END
ORDER BY t_s_secyear.customer_preferred_cust_flag
LIMIT 100"""

  // q16: state/county fitted to the derived domains; interval pre-resolved into the
  // data's coverage (2002 has no sales -> 2000); backtick aliases become identifiers
  private val q16 = """
SELECT
  count(DISTINCT cs_order_number) AS order_count,
  sum(cs_ext_ship_cost) AS total_shipping_cost,
  sum(cs_net_profit) AS total_net_profit
FROM
  catalog_sales cs1, date_dim, customer_address, call_center
WHERE
  d_date BETWEEN '2000-02-01' AND DATE '2000-04-01'
    AND cs1.cs_ship_date_sk = d_date_sk
    AND cs1.cs_ship_addr_sk = ca_address_sk
    AND ca_state = 'ST1'
    AND cs1.cs_call_center_sk = cc_call_center_sk
    AND cc_county IN
    ('CTY0', 'CTY1', 'CTY2', 'CTY0', 'CTY1')
    AND EXISTS(SELECT *
               FROM catalog_sales cs2
               WHERE cs1.cs_order_number = cs2.cs_order_number
                 AND cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
    AND NOT EXISTS(SELECT *
                   FROM catalog_returns cr1
                   WHERE cs1.cs_order_number = cr1.cr_order_number)
ORDER BY count(DISTINCT cs_order_number)
LIMIT 100"""

  // q17: verbatim (d_quarter_name derives '2001Q1' exactly)
  private val q17 = """
SELECT
  i_item_id,
  i_item_desc,
  s_state,
  count(ss_quantity) AS store_sales_quantitycount,
  avg(ss_quantity) AS store_sales_quantityave,
  stddev_samp(ss_quantity) AS store_sales_quantitystdev,
  stddev_samp(ss_quantity) / avg(ss_quantity) AS store_sales_quantitycov,
  count(sr_return_quantity) as_store_returns_quantitycount,
  avg(sr_return_quantity) as_store_returns_quantityave,
  stddev_samp(sr_return_quantity) as_store_returns_quantitystdev,
  stddev_samp(sr_return_quantity) / avg(sr_return_quantity) AS store_returns_quantitycov,
  count(cs_quantity) AS catalog_sales_quantitycount,
  avg(cs_quantity) AS catalog_sales_quantityave,
  stddev_samp(cs_quantity) / avg(cs_quantity) AS catalog_sales_quantitystdev,
  stddev_samp(cs_quantity) / avg(cs_quantity) AS catalog_sales_quantitycov
FROM store_sales, store_returns, catalog_sales, date_dim d1, date_dim d2, date_dim d3, store, item
WHERE d1.d_quarter_name = '2001Q1'
  AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk
  AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk
  AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_quarter_name IN ('2001Q1', '2001Q2', '2001Q3')
  AND sr_customer_sk = cs_bill_customer_sk
  AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk
  AND d3.d_quarter_name IN ('2001Q1', '2001Q2', '2001Q3')
GROUP BY i_item_id, i_item_desc, s_state
ORDER BY i_item_id, i_item_desc, s_state
LIMIT 100"""

  // q18: education 'Unknown' -> 'Secondary' (the only education class the F-gender
  // parity can carry), states -> 'ST<k>'; the DECIMAL(12,2) avg
  // casts become DOUBLE casts at the edge (Spark avg(decimal) widens the scale,
  // DuckDB returns double — the inputs are exact integers either way); rollup NULL
  // ordering made explicit under the LIMIT
  private val q18 = """
SELECT
  i_item_id,
  ca_country,
  ca_state,
  ca_county,
  avg(cast(cs_quantity AS DOUBLE)) agg1,
  avg(cast(cs_list_price AS DOUBLE)) agg2,
  avg(cast(cs_coupon_amt AS DOUBLE)) agg3,
  avg(cast(cs_sales_price AS DOUBLE)) agg4,
  avg(cast(cs_net_profit AS DOUBLE)) agg5,
  avg(cast(c_birth_year AS DOUBLE)) agg6,
  avg(cast(cd1.cd_dep_count AS DOUBLE)) agg7
FROM catalog_sales, customer_demographics cd1,
  customer_demographics cd2, customer_ds, customer_address, date_dim, item
WHERE cs_sold_date_sk = d_date_sk AND
  cs_item_sk = i_item_sk AND
  cs_bill_cdemo_sk = cd1.cd_demo_sk AND
  cs_bill_customer_sk = c_customer_sk AND
  cd1.cd_gender = 'F' AND
  cd1.cd_education_status = 'Secondary' AND
  c_current_cdemo_sk = cd2.cd_demo_sk AND
  c_current_addr_sk = ca_address_sk AND
  c_birth_month IN (1, 6, 8, 9, 12, 2) AND
  d_year = 1998 AND
  ca_state IN ('ST1', 'ST2', 'ST3', 'ST4', 'ST5', 'ST6', 'ST7')
GROUP BY ROLLUP (i_item_id, ca_country, ca_state, ca_county)
ORDER BY ca_country NULLS FIRST, ca_state NULLS FIRST, ca_county NULLS FIRST,
  i_item_id NULLS FIRST
LIMIT 100"""

  // q28: the six price/coupon/wholesale bands scaled into this data's quantized
  // domains (list ~900..105000, coupon ~0..10500, wholesale ~600..73500)
  private def q28Bucket(n: Int, qLo: Int, qHi: Int, lp: Int, ca: Int, wc: Int): String = s"""
  (SELECT
    avg(ss_list_price) B${n}_LP,
    count(ss_list_price) B${n}_CNT,
    count(DISTINCT ss_list_price) B${n}_CNTD
  FROM store_sales
  WHERE ss_quantity BETWEEN $qLo AND $qHi
    AND (ss_list_price BETWEEN $lp AND $lp + 7000
    OR ss_coupon_amt BETWEEN $ca AND $ca + 1000
    OR ss_wholesale_cost BETWEEN $wc AND $wc + 14000)) B$n"""

  private val q28 = "SELECT *\nFROM" +
    Seq(q28Bucket(1, 0, 5, 5600, 459, 39900), q28Bucket(2, 6, 10, 63000, 2323, 21700),
      q28Bucket(3, 11, 15, 99400, 9214, 55300), q28Bucket(4, 16, 20, 94500, 6071, 26600),
      q28Bucket(5, 21, 25, 85400, 836, 11900), q28Bucket(6, 26, 30, 107800, 7326, 4900)
    ).mkString(",") + "\nLIMIT 100"

  // q35: d_year 2002 -> 2001; the bare min/max/avg outputs gain aliases
  private val q35 = """
SELECT
  ca_state,
  cd_gender,
  cd_marital_status,
  count(*) cnt1,
  min(cd_dep_count) min_dep,
  max(cd_dep_count) max_dep,
  avg(cd_dep_count) avg_dep,
  cd_dep_employed_count,
  count(*) cnt2,
  min(cd_dep_employed_count) min_emp,
  max(cd_dep_employed_count) max_emp,
  avg(cd_dep_employed_count) avg_emp,
  cd_dep_college_count,
  count(*) cnt3,
  min(cd_dep_college_count) min_col,
  max(cd_dep_college_count) max_col,
  avg(cd_dep_college_count) avg_col
FROM
  customer_ds c, customer_address ca, customer_demographics
WHERE
  c.c_current_addr_sk = ca.ca_address_sk AND
    cd_demo_sk = c.c_current_cdemo_sk AND
    exists(SELECT *
           FROM store_sales, date_dim
           WHERE c.c_customer_sk = ss_customer_sk AND
             ss_sold_date_sk = d_date_sk AND
             d_year = 2001 AND
             d_qoy < 4) AND
    (exists(SELECT *
            FROM web_sales, date_dim
            WHERE c.c_customer_sk = ws_bill_customer_sk AND
              ws_sold_date_sk = d_date_sk AND
              d_year = 2001 AND
              d_qoy < 4) OR
      exists(SELECT *
             FROM catalog_sales, date_dim
             WHERE c.c_customer_sk = cs_ship_customer_sk AND
               cs_sold_date_sk = d_date_sk AND
               d_year = 2001 AND
               d_qoy < 4))
GROUP BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
  cd_dep_employed_count, cd_dep_college_count
ORDER BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
  cd_dep_employed_count, cd_dep_college_count
LIMIT 100"""

  // q38: month_seq window -> year 2000; the bare count aliased
  private val q38 = """
SELECT count(*) AS num_hot_cust
FROM (
       SELECT DISTINCT
         c_last_name,
         c_first_name,
         d_date
       FROM store_sales, date_dim, customer_ds
       WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
         AND store_sales.ss_customer_sk = customer_ds.c_customer_sk
         AND d_month_seq BETWEEN 360 AND 360 + 11
       INTERSECT
       SELECT DISTINCT
         c_last_name,
         c_first_name,
         d_date
       FROM catalog_sales, date_dim, customer_ds
       WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
         AND catalog_sales.cs_bill_customer_sk = customer_ds.c_customer_sk
         AND d_month_seq BETWEEN 360 AND 360 + 11
       INTERSECT
       SELECT DISTINCT
         c_last_name,
         c_first_name,
         d_date
       FROM web_sales, date_dim, customer_ds
       WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
         AND web_sales.ws_bill_customer_sk = customer_ds.c_customer_sk
         AND d_month_seq BETWEEN 360 AND 360 + 11
     ) hot_cust
LIMIT 100"""

  // q39a: verbatim (year 2001; the generated inventory grid covers it)
  private val q39a = """
WITH inv AS
(SELECT
    w_warehouse_name,
    w_warehouse_sk,
    i_item_sk,
    d_moy,
    stdev,
    mean,
    CASE mean
    WHEN 0
      THEN NULL
    ELSE stdev / mean END cov
  FROM (SELECT
    w_warehouse_name,
    w_warehouse_sk,
    i_item_sk,
    d_moy,
    stddev_samp(inv_quantity_on_hand) stdev,
    avg(inv_quantity_on_hand) mean
  FROM inventory, item, warehouse, date_dim
  WHERE inv_item_sk = i_item_sk
    AND inv_warehouse_sk = w_warehouse_sk
    AND inv_date_sk = d_date_sk
    AND d_year = 2001
  GROUP BY w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy) foo
  WHERE CASE mean
        WHEN 0
          THEN 0
        ELSE stdev / mean END > 1)
SELECT
  inv1.w_warehouse_sk,
  inv1.i_item_sk,
  inv1.d_moy,
  inv1.mean,
  inv1.cov,
  inv2.w_warehouse_sk w_warehouse_sk2,
  inv2.i_item_sk i_item_sk2,
  inv2.d_moy d_moy2,
  inv2.mean mean2,
  inv2.cov cov2
FROM inv inv1, inv inv2
WHERE inv1.i_item_sk = inv2.i_item_sk
  AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
  AND inv1.d_moy = 1
  AND inv2.d_moy = 1 + 1
ORDER BY inv1.w_warehouse_sk, inv1.i_item_sk, inv1.d_moy, inv1.mean, inv1.cov
  , inv2.d_moy, inv2.mean, inv2.cov"""

  // q39b: q39a plus the January high-variance gate — verbatim body; the official
  // 1.5 cov cut is fitted to 1.2 (this grid's cov max is 1.60 but the moy1>1.5 x
  // moy2>1 join is empty at sf0.01; 1.2 keeps the gate selective AND non-empty)
  private val q39b = """
WITH inv AS
(SELECT
    w_warehouse_name,
    w_warehouse_sk,
    i_item_sk,
    d_moy,
    stdev,
    mean,
    CASE mean
    WHEN 0
      THEN NULL
    ELSE stdev / mean END cov
  FROM (SELECT
    w_warehouse_name,
    w_warehouse_sk,
    i_item_sk,
    d_moy,
    stddev_samp(inv_quantity_on_hand) stdev,
    avg(inv_quantity_on_hand) mean
  FROM inventory, item, warehouse, date_dim
  WHERE inv_item_sk = i_item_sk
    AND inv_warehouse_sk = w_warehouse_sk
    AND inv_date_sk = d_date_sk
    AND d_year = 2001
  GROUP BY w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy) foo
  WHERE CASE mean
        WHEN 0
          THEN 0
        ELSE stdev / mean END > 1)
SELECT
  inv1.w_warehouse_sk,
  inv1.i_item_sk,
  inv1.d_moy,
  inv1.mean,
  inv1.cov,
  inv2.w_warehouse_sk w_warehouse_sk2,
  inv2.i_item_sk i_item_sk2,
  inv2.d_moy d_moy2,
  inv2.mean mean2,
  inv2.cov cov2
FROM inv inv1, inv inv2
WHERE inv1.i_item_sk = inv2.i_item_sk
  AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
  AND inv1.d_moy = 1
  AND inv2.d_moy = 1 + 1
  AND inv1.cov > 1.2
ORDER BY inv1.w_warehouse_sk, inv1.i_item_sk, inv1.d_moy, inv1.mean, inv1.cov
  , inv2.d_moy, inv2.mean, inv2.cov"""

  // q44: the official anchor averages the null-address slice; this schema has no
  // NULL ss_addr_sk, so the anchor flips to IS NOT NULL (= the whole store) — the
  // same "0.9x the store average" semantics
  private val q44 = """
SELECT
  asceding.rnk,
  i1.i_product_name best_performing,
  i2.i_product_name worst_performing
FROM (SELECT *
FROM (SELECT
  item_sk,
  rank()
  OVER (
    ORDER BY rank_col ASC) rnk
FROM (SELECT
  ss_item_sk item_sk,
  avg(ss_net_profit) rank_col
FROM store_sales ss1
WHERE ss_store_sk = 4
GROUP BY ss_item_sk
HAVING avg(ss_net_profit) > 0.9 * (SELECT avg(ss_net_profit) rank_col
FROM store_sales
WHERE ss_store_sk = 4
  AND ss_addr_sk IS NOT NULL
GROUP BY ss_store_sk)) V1) V11
WHERE rnk < 11) asceding,
  (SELECT *
  FROM (SELECT
    item_sk,
    rank()
    OVER (
      ORDER BY rank_col DESC) rnk
  FROM (SELECT
    ss_item_sk item_sk,
    avg(ss_net_profit) rank_col
  FROM store_sales ss1
  WHERE ss_store_sk = 4
  GROUP BY ss_item_sk
  HAVING avg(ss_net_profit) > 0.9 * (SELECT avg(ss_net_profit) rank_col
  FROM store_sales
  WHERE ss_store_sk = 4
    AND ss_addr_sk IS NOT NULL
  GROUP BY ss_store_sk)) V2) V21
  WHERE rnk < 11) descending,
  item i1, item i2
WHERE asceding.rnk = descending.rnk
  AND i1.i_item_sk = asceding.item_sk
  AND i2.i_item_sk = descending.item_sk
ORDER BY asceding.rnk
LIMIT 100"""

  // q47: verbatim (1999 +/- the edge months)
  private val q47 = """
WITH v1 AS (
  SELECT
    i_category,
    i_brand,
    s_store_name,
    s_company_name,
    d_year,
    d_moy,
    sum(ss_sales_price) sum_sales,
    avg(sum(ss_sales_price))
    OVER
    (PARTITION BY i_category, i_brand,
      s_store_name, s_company_name, d_year)
    avg_monthly_sales,
    rank()
    OVER
    (PARTITION BY i_category, i_brand,
      s_store_name, s_company_name
      ORDER BY d_year, d_moy) rn
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk AND
    ss_sold_date_sk = d_date_sk AND
    ss_store_sk = s_store_sk AND
    (
      d_year = 1999 OR
        (d_year = 1999 - 1 AND d_moy = 12) OR
        (d_year = 1999 + 1 AND d_moy = 1)
    )
  GROUP BY i_category, i_brand,
    s_store_name, s_company_name,
    d_year, d_moy),
    v2 AS (
    SELECT
      v1.i_category,
      v1.i_brand,
      v1.s_store_name,
      v1.s_company_name,
      v1.d_year,
      v1.d_moy,
      v1.avg_monthly_sales,
      v1.sum_sales,
      v1_lag.sum_sales psum,
      v1_lead.sum_sales nsum
    FROM v1, v1 v1_lag, v1 v1_lead
    WHERE v1.i_category = v1_lag.i_category AND
      v1.i_category = v1_lead.i_category AND
      v1.i_brand = v1_lag.i_brand AND
      v1.i_brand = v1_lead.i_brand AND
      v1.s_store_name = v1_lag.s_store_name AND
      v1.s_store_name = v1_lead.s_store_name AND
      v1.s_company_name = v1_lag.s_company_name AND
      v1.s_company_name = v1_lead.s_company_name AND
      v1.rn = v1_lag.rn + 1 AND
      v1.rn = v1_lead.rn - 1)
SELECT *
FROM v2
WHERE d_year = 1999 AND
  avg_monthly_sales > 0 AND
  CASE WHEN avg_monthly_sales > 0
    THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
  ELSE NULL END > 0.1
ORDER BY sum_sales - avg_monthly_sales, 3
LIMIT 100"""

  // q49: year 2001 -> 2000 (the official December window has no sold dates in this
  // data); the DECIMAL(15,4) ratio casts become DOUBLE casts at the edge (the
  // engines' decimal-division scale rules differ; the summed operands are exact
  // integers)
  private val q49 = """
SELECT
  'web' AS channel,
  web.item,
  web.return_ratio,
  web.return_rank,
  web.currency_rank
FROM (
       SELECT
         item,
         return_ratio,
         currency_ratio,
         rank()
         OVER (
           ORDER BY return_ratio) AS return_rank,
         rank()
         OVER (
           ORDER BY currency_ratio) AS currency_rank
       FROM
         (SELECT
           ws.ws_item_sk AS item,
           (cast(sum(coalesce(wr.wr_return_quantity, 0)) AS DOUBLE) /
             cast(sum(coalesce(ws.ws_quantity, 0)) AS DOUBLE)) AS return_ratio,
           (cast(sum(coalesce(wr.wr_return_amt, 0)) AS DOUBLE) /
             cast(sum(coalesce(ws.ws_net_paid, 0)) AS DOUBLE)) AS currency_ratio
         FROM
           web_sales ws LEFT OUTER JOIN web_returns wr
             ON (ws.ws_order_number = wr.wr_order_number AND
             ws.ws_item_sk = wr.wr_item_sk)
           , date_dim
         WHERE
           wr.wr_return_amt > 10000
             AND ws.ws_net_profit > 1
             AND ws.ws_net_paid > 0
             AND ws.ws_quantity > 0
             AND ws_sold_date_sk = d_date_sk
             AND d_year = 2000
             AND d_moy = 12
         GROUP BY ws.ws_item_sk
         ) in_web
     ) web
WHERE (web.return_rank <= 10 OR web.currency_rank <= 10)
UNION
SELECT
  'catalog' AS channel,
  catalog.item,
  catalog.return_ratio,
  catalog.return_rank,
  catalog.currency_rank
FROM (
       SELECT
         item,
         return_ratio,
         currency_ratio,
         rank()
         OVER (
           ORDER BY return_ratio) AS return_rank,
         rank()
         OVER (
           ORDER BY currency_ratio) AS currency_rank
       FROM
         (SELECT
           cs.cs_item_sk AS item,
           (cast(sum(coalesce(cr.cr_return_quantity, 0)) AS DOUBLE) /
             cast(sum(coalesce(cs.cs_quantity, 0)) AS DOUBLE)) AS return_ratio,
           (cast(sum(coalesce(cr.cr_return_amount, 0)) AS DOUBLE) /
             cast(sum(coalesce(cs.cs_net_paid, 0)) AS DOUBLE)) AS currency_ratio
         FROM
           catalog_sales cs LEFT OUTER JOIN catalog_returns cr
             ON (cs.cs_order_number = cr.cr_order_number AND
             cs.cs_item_sk = cr.cr_item_sk)
           , date_dim
         WHERE
           cr.cr_return_amount > 10000
             AND cs.cs_net_profit > 1
             AND cs.cs_net_paid > 0
             AND cs.cs_quantity > 0
             AND cs_sold_date_sk = d_date_sk
             AND d_year = 2000
             AND d_moy = 12
         GROUP BY cs.cs_item_sk
         ) in_cat
     ) catalog
WHERE (catalog.return_rank <= 10 OR catalog.currency_rank <= 10)
UNION
SELECT
  'store' AS channel,
  store.item,
  store.return_ratio,
  store.return_rank,
  store.currency_rank
FROM (
       SELECT
         item,
         return_ratio,
         currency_ratio,
         rank()
         OVER (
           ORDER BY return_ratio) AS return_rank,
         rank()
         OVER (
           ORDER BY currency_ratio) AS currency_rank
       FROM
         (SELECT
           sts.ss_item_sk AS item,
           (cast(sum(coalesce(sr.sr_return_quantity, 0)) AS DOUBLE) /
             cast(sum(coalesce(sts.ss_quantity, 0)) AS DOUBLE)) AS return_ratio,
           (cast(sum(coalesce(sr.sr_return_amt, 0)) AS DOUBLE) /
             cast(sum(coalesce(sts.ss_net_paid, 0)) AS DOUBLE)) AS currency_ratio
         FROM
           store_sales sts LEFT OUTER JOIN store_returns sr
             ON (sts.ss_ticket_number = sr.sr_ticket_number AND sts.ss_item_sk = sr.sr_item_sk)
           , date_dim
         WHERE
           sr.sr_return_amt > 10000
             AND sts.ss_net_profit > 1
             AND sts.ss_net_paid > 0
             AND sts.ss_quantity > 0
             AND ss_sold_date_sk = d_date_sk
             AND d_year = 2000
             AND d_moy = 12
         GROUP BY sts.ss_item_sk
         ) in_store
     ) store
WHERE (store.return_rank <= 10 OR store.currency_rank <= 10)
ORDER BY 1, 4, 5
LIMIT 100"""

  // q57: verbatim (catalog analog of q47)
  private val q57 = """
WITH v1 AS (
  SELECT
    i_category,
    i_brand,
    cc_name,
    d_year,
    d_moy,
    sum(cs_sales_price) sum_sales,
    avg(sum(cs_sales_price))
    OVER
    (PARTITION BY i_category, i_brand, cc_name, d_year)
    avg_monthly_sales,
    rank()
    OVER
    (PARTITION BY i_category, i_brand, cc_name
      ORDER BY d_year, d_moy) rn
  FROM item, catalog_sales, date_dim, call_center
  WHERE cs_item_sk = i_item_sk AND
    cs_sold_date_sk = d_date_sk AND
    cc_call_center_sk = cs_call_center_sk AND
    (
      d_year = 1999 OR
        (d_year = 1999 - 1 AND d_moy = 12) OR
        (d_year = 1999 + 1 AND d_moy = 1)
    )
  GROUP BY i_category, i_brand,
    cc_name, d_year, d_moy),
    v2 AS (
    SELECT
      v1.i_category,
      v1.i_brand,
      v1.cc_name,
      v1.d_year,
      v1.d_moy,
      v1.avg_monthly_sales,
      v1.sum_sales,
      v1_lag.sum_sales psum,
      v1_lead.sum_sales nsum
    FROM v1, v1 v1_lag, v1 v1_lead
    WHERE v1.i_category = v1_lag.i_category AND
      v1.i_category = v1_lead.i_category AND
      v1.i_brand = v1_lag.i_brand AND
      v1.i_brand = v1_lead.i_brand AND
      v1.cc_name = v1_lag.cc_name AND
      v1.cc_name = v1_lead.cc_name AND
      v1.rn = v1_lag.rn + 1 AND
      v1.rn = v1_lead.rn - 1)
SELECT *
FROM v2
WHERE d_year = 1999 AND
  avg_monthly_sales > 0 AND
  CASE WHEN avg_monthly_sales > 0
    THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
  ELSE NULL END > 0.1
ORDER BY sum_sales - avg_monthly_sales, 3
LIMIT 100"""

  // q62: month_seq -> year 2000; backtick/bare aliases become identifiers
  private val q62 = """
SELECT
  substr(w_warehouse_name, 1, 20) AS wh_name,
  sm_type,
  web_name,
  CAST(sum(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk <= 30)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_30,
  CAST(sum(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 30) AND
    (ws_ship_date_sk - ws_sold_date_sk <= 60)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_31_60,
  CAST(sum(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 60) AND
    (ws_ship_date_sk - ws_sold_date_sk <= 90)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_61_90,
  CAST(sum(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 90) AND
    (ws_ship_date_sk - ws_sold_date_sk <= 120)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_91_120,
  CAST(sum(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 120)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_over_120
FROM
  web_sales, warehouse, ship_mode, web_site, date_dim
WHERE
  d_month_seq BETWEEN 360 AND 360 + 11
    AND ws_ship_date_sk = d_date_sk
    AND ws_warehouse_sk = w_warehouse_sk
    AND ws_ship_mode_sk = sm_ship_mode_sk
    AND ws_web_site_sk = web_site_sk
GROUP BY
  substr(w_warehouse_name, 1, 20), sm_type, web_name
ORDER BY
  substr(w_warehouse_name, 1, 20), sm_type, web_name
LIMIT 100"""

  // q70: month_seq -> year 2000; rollup NULL ordering made explicit under the LIMIT
  private val q70 = """
SELECT
  sum(ss_net_profit) AS total_sum,
  s_state,
  s_county,
  grouping(s_state) + grouping(s_county) AS lochierarchy,
  rank()
  OVER (
    PARTITION BY grouping(s_state) + grouping(s_county),
      CASE WHEN grouping(s_county) = 0
        THEN s_state END
    ORDER BY sum(ss_net_profit) DESC) AS rank_within_parent
FROM
  store_sales, date_dim d1, store
WHERE
  d1.d_month_seq BETWEEN 360 AND 360 + 11
    AND d1.d_date_sk = ss_sold_date_sk
    AND s_store_sk = ss_store_sk
    AND s_state IN
    (SELECT s_state
    FROM
      (SELECT
        s_state AS s_state,
        rank()
        OVER (PARTITION BY s_state
          ORDER BY sum(ss_net_profit) DESC) AS ranking
      FROM store_sales, store, date_dim
      WHERE d_month_seq BETWEEN 360 AND 360 + 11
        AND d_date_sk = ss_sold_date_sk
        AND s_store_sk = ss_store_sk
      GROUP BY s_state) tmp1
    WHERE ranking <= 5)
GROUP BY ROLLUP (s_state, s_county)
ORDER BY
  lochierarchy DESC
  , CASE WHEN lochierarchy = 0
  THEN s_state END NULLS FIRST
  , rank_within_parent
LIMIT 100"""

  // q75: category 'Books' -> 'SMALL'; years 2002/2001 -> 2001/2000 (sales end
  // 2001-08); the int sales-count sums cast BIGINT at the edge
  private val q75 = """
WITH all_sales AS (
  SELECT
    d_year,
    i_brand_id,
    i_class_id,
    i_category_id,
    i_manufact_id,
    CAST(SUM(sales_cnt) AS BIGINT) AS sales_cnt,
    SUM(sales_amt) AS sales_amt
  FROM (
         SELECT
           d_year,
           i_brand_id,
           i_class_id,
           i_category_id,
           i_manufact_id,
           cs_quantity - COALESCE(cr_return_quantity, 0) AS sales_cnt,
           cs_ext_sales_price - COALESCE(cr_return_amount, 0.0) AS sales_amt
         FROM catalog_sales
           JOIN item ON i_item_sk = cs_item_sk
           JOIN date_dim ON d_date_sk = cs_sold_date_sk
           LEFT JOIN catalog_returns ON (cs_order_number = cr_order_number
             AND cs_item_sk = cr_item_sk)
         WHERE i_category = 'SMALL'
         UNION
         SELECT
           d_year,
           i_brand_id,
           i_class_id,
           i_category_id,
           i_manufact_id,
           ss_quantity - COALESCE(sr_return_quantity, 0) AS sales_cnt,
           ss_ext_sales_price - COALESCE(sr_return_amt, 0.0) AS sales_amt
         FROM store_sales
           JOIN item ON i_item_sk = ss_item_sk
           JOIN date_dim ON d_date_sk = ss_sold_date_sk
           LEFT JOIN store_returns ON (ss_ticket_number = sr_ticket_number
             AND ss_item_sk = sr_item_sk)
         WHERE i_category = 'SMALL'
         UNION
         SELECT
           d_year,
           i_brand_id,
           i_class_id,
           i_category_id,
           i_manufact_id,
           ws_quantity - COALESCE(wr_return_quantity, 0) AS sales_cnt,
           ws_ext_sales_price - COALESCE(wr_return_amt, 0.0) AS sales_amt
         FROM web_sales
           JOIN item ON i_item_sk = ws_item_sk
           JOIN date_dim ON d_date_sk = ws_sold_date_sk
           LEFT JOIN web_returns ON (ws_order_number = wr_order_number
             AND ws_item_sk = wr_item_sk)
         WHERE i_category = 'SMALL') sales_detail
  GROUP BY d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id)
SELECT
  prev_yr.d_year AS prev_year,
  curr_yr.d_year AS year,
  curr_yr.i_brand_id,
  curr_yr.i_class_id,
  curr_yr.i_category_id,
  curr_yr.i_manufact_id,
  prev_yr.sales_cnt AS prev_yr_cnt,
  curr_yr.sales_cnt AS curr_yr_cnt,
  curr_yr.sales_cnt - prev_yr.sales_cnt AS sales_cnt_diff,
  curr_yr.sales_amt - prev_yr.sales_amt AS sales_amt_diff
FROM all_sales curr_yr, all_sales prev_yr
WHERE curr_yr.i_brand_id = prev_yr.i_brand_id
  AND curr_yr.i_class_id = prev_yr.i_class_id
  AND curr_yr.i_category_id = prev_yr.i_category_id
  AND curr_yr.i_manufact_id = prev_yr.i_manufact_id
  AND curr_yr.d_year = 2001
  AND prev_yr.d_year = 2001 - 1
  AND CAST(curr_yr.sales_cnt AS DECIMAL(17, 2)) / CAST(prev_yr.sales_cnt AS DECIMAL(17, 2)) < 0.9
ORDER BY sales_cnt_diff
LIMIT 100"""

  // q90: wp_char_count band fitted to the derived 1000..5500 lattice; the decimal
  // ratio cast becomes a DOUBLE cast at the edge
  private val q90 = """
SELECT cast(amc AS DOUBLE) / cast(pmc AS DOUBLE) am_pm_ratio
FROM (SELECT count(*) amc
FROM web_sales, household_demographics, time_dim, web_page
WHERE ws_sold_time_sk = time_dim.t_time_sk
  AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
  AND ws_web_page_sk = web_page.wp_web_page_sk
  AND time_dim.t_hour BETWEEN 8 AND 8 + 1
  AND household_demographics.hd_dep_count = 6
  AND web_page.wp_char_count BETWEEN 3000 AND 5200) at,
  (SELECT count(*) pmc
  FROM web_sales, household_demographics, time_dim, web_page
  WHERE ws_sold_time_sk = time_dim.t_time_sk
    AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
    AND ws_web_page_sk = web_page.wp_web_page_sk
    AND time_dim.t_hour BETWEEN 19 AND 19 + 1
    AND household_demographics.hd_dep_count = 6
    AND web_page.wp_char_count BETWEEN 3000 AND 5200) pt
ORDER BY am_pm_ratio
LIMIT 100"""

  // q94: state -> 'ST2', web company 'pri' maps to the derived site 0; interval
  // pre-resolved into the data's coverage; backtick aliases become identifiers
  private val q94 = """
SELECT
  count(DISTINCT ws_order_number) AS order_count,
  sum(ws_ext_ship_cost) AS total_shipping_cost,
  sum(ws_net_profit) AS total_net_profit
FROM
  web_sales ws1, date_dim, customer_address, web_site
WHERE
  d_date BETWEEN '2000-02-01' AND DATE '2000-04-01'
    AND ws1.ws_ship_date_sk = d_date_sk
    AND ws1.ws_ship_addr_sk = ca_address_sk
    AND ca_state = 'ST2'
    AND ws1.ws_web_site_sk = web_site_sk
    AND web_company_name = 'pri'
    AND EXISTS(SELECT *
               FROM web_sales ws2
               WHERE ws1.ws_order_number = ws2.ws_order_number
                 AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
    AND NOT EXISTS(SELECT *
                   FROM web_returns wr1
                   WHERE ws1.ws_order_number = wr1.wr_order_number)
ORDER BY count(DISTINCT ws_order_number)
LIMIT 100"""

  // q99: month_seq -> year 2000; backtick/bare aliases become identifiers
  private val q99 = """
SELECT
  substr(w_warehouse_name, 1, 20) AS wh_name,
  sm_type,
  cc_name,
  CAST(sum(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk <= 30)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_30,
  CAST(sum(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 30) AND
    (cs_ship_date_sk - cs_sold_date_sk <= 60)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_31_60,
  CAST(sum(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 60) AND
    (cs_ship_date_sk - cs_sold_date_sk <= 90)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_61_90,
  CAST(sum(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 90) AND
    (cs_ship_date_sk - cs_sold_date_sk <= 120)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_91_120,
  CAST(sum(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 120)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_over_120
FROM
  catalog_sales, warehouse, ship_mode, call_center, date_dim
WHERE
  d_month_seq BETWEEN 360 AND 360 + 11
    AND cs_ship_date_sk = d_date_sk
    AND cs_warehouse_sk = w_warehouse_sk
    AND cs_ship_mode_sk = sm_ship_mode_sk
    AND cs_call_center_sk = cc_call_center_sk
GROUP BY
  substr(w_warehouse_name, 1, 20), sm_type, cc_name
ORDER BY substr(w_warehouse_name, 1, 20), sm_type, cc_name"""

  // ---- round 8 batch E: seven more verbatim bodies ----

  // q8: zip list fitted to the derived lpad(10000+7k) lattice ('20'/'21' prefixes,
  // matching the derived store zips); HAVING count(*) > 10 -> > 0 (the derived zip
  // lattice is near-injective at test scales — the official threshold presumes
  // TPC-DS's many-customers-per-zip distribution); the bare sum aliased
  private val q8 = """
SELECT
  s_store_name,
  sum(ss_net_profit) AS total_profit
FROM store_sales, date_dim, store,
  (SELECT ca_zip
  FROM (
         (SELECT substr(ca_zip, 1, 5) ca_zip
         FROM customer_address
         WHERE substr(ca_zip, 1, 5) IN (
               '10014','10028','10042','10056','10070','10084','10098',
               '10112','10126','10140','10154','10168','10182','10196',
               '10210','10224','10238','10252','10266','10280','10294',
               '10308','10322','10336'))
         INTERSECT
         (SELECT ca_zip
         FROM
           (SELECT
             substr(ca_zip, 1, 5) ca_zip,
             count(*) cnt
           FROM customer_address, customer_ds
           WHERE ca_address_sk = c_current_addr_sk AND
             c_preferred_cust_flag = 'Y'
           GROUP BY ca_zip
           HAVING count(*) > 0) A1)
       ) A2
  ) V1
WHERE ss_store_sk = s_store_sk
  AND ss_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 1998
  AND (substr(s_zip, 1, 2) = substr(V1.ca_zip, 1, 2))
GROUP BY s_store_name
ORDER BY s_store_name
LIMIT 100"""

  // q41: manufact band folded to the 0..99 domain (738..778 -> 38..78); the
  // category/color/units/size literal sets mapped onto the derived attribute
  // domains, preserving the official 8-way OR structure
  private val q41 = """
SELECT DISTINCT (i_product_name)
FROM item i1
WHERE i_manufact_id BETWEEN 38 AND 38 + 40
  AND (SELECT count(*) AS item_cnt
FROM item
WHERE (i_manufact = i1.i_manufact AND
  ((i_category = 'LARGE' AND
    (i_color = 'blue' OR i_color = 'cold') AND
    (i_units = 'Ounce' OR i_units = 'Oz') AND
    (i_size = 'medium' OR i_size = 'extra large')
  ) OR
    (i_category = 'LARGE' AND
      (i_color = 'hot' OR i_color = 'red') AND
      (i_units = 'Bunch' OR i_units = 'Ton') AND
      (i_size = 'N/A' OR i_size = 'small')
    ) OR
    (i_category = 'MEDIUM' AND
      (i_color = 'new' OR i_color = 'old') AND
      (i_units = 'Each' OR i_units = 'Dozen') AND
      (i_size = 'petite' OR i_size = 'large')
    ) OR
    (i_category = 'MEDIUM' AND
      (i_color = 'small' OR i_color = 'large') AND
      (i_units = 'Ounce' OR i_units = 'Oz') AND
      (i_size = 'medium' OR i_size = 'extra large')
    ))) OR
  (i_manufact = i1.i_manufact AND
    ((i_category = 'LARGE' AND
      (i_color = 'new' OR i_color = 'red') AND
      (i_units = 'Each' OR i_units = 'Bunch') AND
      (i_size = 'medium' OR i_size = 'extra large')
    ) OR
      (i_category = 'LARGE' AND
        (i_color = 'blue' OR i_color = 'old') AND
        (i_units = 'Ton' OR i_units = 'Dozen') AND
        (i_size = 'N/A' OR i_size = 'small')
      ) OR
      (i_category = 'MEDIUM' AND
        (i_color = 'cold' OR i_color = 'hot') AND
        (i_units = 'Each' OR i_units = 'Oz') AND
        (i_size = 'petite' OR i_size = 'large')
      ) OR
      (i_category = 'MEDIUM' AND
        (i_color = 'blue' OR i_color = 'red') AND
        (i_units = 'Ounce' OR i_units = 'Bunch') AND
        (i_size = 'medium' OR i_size = 'extra large')
      )))) > 0
ORDER BY i_product_name
LIMIT 100"""

  // q54: the segment bucket is spelled floor(revenue/50) (DuckDB ROUNDS double->INT
  // casts where Spark truncates; floor makes the bucketing explicit and identical);
  // category/class fitted to the derived domains ('Women'/'maternity' ->
  // 'LARGE'/'blue bolt', a combination the (p_type, p_name) lattice populates with
  // December-1998 cross-channel buyers); December 1998 is inside the data's coverage
  private val q54 = """
WITH my_customers AS (
  SELECT DISTINCT
    c_customer_sk,
    c_current_addr_sk
  FROM
    (SELECT
       cs_sold_date_sk sold_date_sk,
       cs_bill_customer_sk customer_sk,
       cs_item_sk item_sk
     FROM catalog_sales
     UNION ALL
     SELECT
       ws_sold_date_sk sold_date_sk,
       ws_bill_customer_sk customer_sk,
       ws_item_sk item_sk
     FROM web_sales
    ) cs_or_ws_sales,
    item,
    date_dim,
    customer_ds
  WHERE sold_date_sk = d_date_sk
    AND item_sk = i_item_sk
    AND i_category = 'LARGE'
    AND i_class = 'blue bolt'
    AND c_customer_sk = cs_or_ws_sales.customer_sk
    AND d_moy = 12
    AND d_year = 1998
)
  , my_revenue AS (
  SELECT
    c_customer_sk,
    sum(ss_ext_sales_price) AS revenue
  FROM my_customers,
    store_sales,
    customer_address,
    store,
    date_dim
  WHERE c_current_addr_sk = ca_address_sk
    AND ca_county = s_county
    AND ca_state = s_state
    AND ss_sold_date_sk = d_date_sk
    AND c_customer_sk = ss_customer_sk
    AND d_month_seq BETWEEN (SELECT DISTINCT d_month_seq + 1
  FROM date_dim
  WHERE d_year = 1998 AND d_moy = 12)
  AND (SELECT DISTINCT d_month_seq + 3
  FROM date_dim
  WHERE d_year = 1998 AND d_moy = 12)
  GROUP BY c_customer_sk
)
  , segments AS
(SELECT cast(floor(revenue / 50) AS INT) AS segment
  FROM my_revenue)
SELECT
  segment,
  count(*) AS num_customers,
  segment * 50 AS segment_base
FROM segments
GROUP BY segment
ORDER BY segment, num_customers
LIMIT 100"""

  // q66: carriers DHL/BARIAN map to the derived ship modes 0/1; the official
  // 30838..59638-second window runs verbatim over the generated time_dim
  private val q66 = """
SELECT
  w_warehouse_name,
  w_warehouse_sq_ft,
  w_city,
  w_county,
  w_state,
  w_country,
  ship_carriers,
  year,
  sum(jan_sales) AS jan_sales,
  sum(feb_sales) AS feb_sales,
  sum(mar_sales) AS mar_sales,
  sum(apr_sales) AS apr_sales,
  sum(may_sales) AS may_sales,
  sum(jun_sales) AS jun_sales,
  sum(jul_sales) AS jul_sales,
  sum(aug_sales) AS aug_sales,
  sum(sep_sales) AS sep_sales,
  sum(oct_sales) AS oct_sales,
  sum(nov_sales) AS nov_sales,
  sum(dec_sales) AS dec_sales,
  sum(jan_sales / w_warehouse_sq_ft) AS jan_sales_per_sq_foot,
  sum(feb_sales / w_warehouse_sq_ft) AS feb_sales_per_sq_foot,
  sum(mar_sales / w_warehouse_sq_ft) AS mar_sales_per_sq_foot,
  sum(apr_sales / w_warehouse_sq_ft) AS apr_sales_per_sq_foot,
  sum(may_sales / w_warehouse_sq_ft) AS may_sales_per_sq_foot,
  sum(jun_sales / w_warehouse_sq_ft) AS jun_sales_per_sq_foot,
  sum(jul_sales / w_warehouse_sq_ft) AS jul_sales_per_sq_foot,
  sum(aug_sales / w_warehouse_sq_ft) AS aug_sales_per_sq_foot,
  sum(sep_sales / w_warehouse_sq_ft) AS sep_sales_per_sq_foot,
  sum(oct_sales / w_warehouse_sq_ft) AS oct_sales_per_sq_foot,
  sum(nov_sales / w_warehouse_sq_ft) AS nov_sales_per_sq_foot,
  sum(dec_sales / w_warehouse_sq_ft) AS dec_sales_per_sq_foot,
  sum(jan_net) AS jan_net,
  sum(feb_net) AS feb_net,
  sum(mar_net) AS mar_net,
  sum(apr_net) AS apr_net,
  sum(may_net) AS may_net,
  sum(jun_net) AS jun_net,
  sum(jul_net) AS jul_net,
  sum(aug_net) AS aug_net,
  sum(sep_net) AS sep_net,
  sum(oct_net) AS oct_net,
  sum(nov_net) AS nov_net,
  sum(dec_net) AS dec_net
FROM (
       (SELECT
         w_warehouse_name,
         w_warehouse_sq_ft,
         w_city,
         w_county,
         w_state,
         w_country,
         concat('DHL', ',', 'BARIAN') AS ship_carriers,
         d_year AS year,
         sum(CASE WHEN d_moy = 1 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS jan_sales,
         sum(CASE WHEN d_moy = 2 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS feb_sales,
         sum(CASE WHEN d_moy = 3 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS mar_sales,
         sum(CASE WHEN d_moy = 4 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS apr_sales,
         sum(CASE WHEN d_moy = 5 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS may_sales,
         sum(CASE WHEN d_moy = 6 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS jun_sales,
         sum(CASE WHEN d_moy = 7 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS jul_sales,
         sum(CASE WHEN d_moy = 8 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS aug_sales,
         sum(CASE WHEN d_moy = 9 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS sep_sales,
         sum(CASE WHEN d_moy = 10 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS oct_sales,
         sum(CASE WHEN d_moy = 11 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS nov_sales,
         sum(CASE WHEN d_moy = 12 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS dec_sales,
         sum(CASE WHEN d_moy = 1 THEN ws_net_paid * ws_quantity ELSE 0 END) AS jan_net,
         sum(CASE WHEN d_moy = 2 THEN ws_net_paid * ws_quantity ELSE 0 END) AS feb_net,
         sum(CASE WHEN d_moy = 3 THEN ws_net_paid * ws_quantity ELSE 0 END) AS mar_net,
         sum(CASE WHEN d_moy = 4 THEN ws_net_paid * ws_quantity ELSE 0 END) AS apr_net,
         sum(CASE WHEN d_moy = 5 THEN ws_net_paid * ws_quantity ELSE 0 END) AS may_net,
         sum(CASE WHEN d_moy = 6 THEN ws_net_paid * ws_quantity ELSE 0 END) AS jun_net,
         sum(CASE WHEN d_moy = 7 THEN ws_net_paid * ws_quantity ELSE 0 END) AS jul_net,
         sum(CASE WHEN d_moy = 8 THEN ws_net_paid * ws_quantity ELSE 0 END) AS aug_net,
         sum(CASE WHEN d_moy = 9 THEN ws_net_paid * ws_quantity ELSE 0 END) AS sep_net,
         sum(CASE WHEN d_moy = 10 THEN ws_net_paid * ws_quantity ELSE 0 END) AS oct_net,
         sum(CASE WHEN d_moy = 11 THEN ws_net_paid * ws_quantity ELSE 0 END) AS nov_net,
         sum(CASE WHEN d_moy = 12 THEN ws_net_paid * ws_quantity ELSE 0 END) AS dec_net
       FROM
         web_sales, warehouse, date_dim, time_dim, ship_mode
       WHERE
         ws_warehouse_sk = w_warehouse_sk
           AND ws_sold_date_sk = d_date_sk
           AND ws_sold_time_sk = t_time_sk
           AND ws_ship_mode_sk = sm_ship_mode_sk
           AND d_year = 2001
           AND t_time BETWEEN 30838 AND 30838 + 28800
           AND sm_carrier IN ('DHL', 'BARIAN')
       GROUP BY
         w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state, w_country, d_year)
       UNION ALL
       (SELECT
         w_warehouse_name,
         w_warehouse_sq_ft,
         w_city,
         w_county,
         w_state,
         w_country,
         concat('DHL', ',', 'BARIAN') AS ship_carriers,
         d_year AS year,
         sum(CASE WHEN d_moy = 1 THEN cs_sales_price * cs_quantity ELSE 0 END) AS jan_sales,
         sum(CASE WHEN d_moy = 2 THEN cs_sales_price * cs_quantity ELSE 0 END) AS feb_sales,
         sum(CASE WHEN d_moy = 3 THEN cs_sales_price * cs_quantity ELSE 0 END) AS mar_sales,
         sum(CASE WHEN d_moy = 4 THEN cs_sales_price * cs_quantity ELSE 0 END) AS apr_sales,
         sum(CASE WHEN d_moy = 5 THEN cs_sales_price * cs_quantity ELSE 0 END) AS may_sales,
         sum(CASE WHEN d_moy = 6 THEN cs_sales_price * cs_quantity ELSE 0 END) AS jun_sales,
         sum(CASE WHEN d_moy = 7 THEN cs_sales_price * cs_quantity ELSE 0 END) AS jul_sales,
         sum(CASE WHEN d_moy = 8 THEN cs_sales_price * cs_quantity ELSE 0 END) AS aug_sales,
         sum(CASE WHEN d_moy = 9 THEN cs_sales_price * cs_quantity ELSE 0 END) AS sep_sales,
         sum(CASE WHEN d_moy = 10 THEN cs_sales_price * cs_quantity ELSE 0 END) AS oct_sales,
         sum(CASE WHEN d_moy = 11 THEN cs_sales_price * cs_quantity ELSE 0 END) AS nov_sales,
         sum(CASE WHEN d_moy = 12 THEN cs_sales_price * cs_quantity ELSE 0 END) AS dec_sales,
         sum(CASE WHEN d_moy = 1 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS jan_net,
         sum(CASE WHEN d_moy = 2 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS feb_net,
         sum(CASE WHEN d_moy = 3 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS mar_net,
         sum(CASE WHEN d_moy = 4 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS apr_net,
         sum(CASE WHEN d_moy = 5 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS may_net,
         sum(CASE WHEN d_moy = 6 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS jun_net,
         sum(CASE WHEN d_moy = 7 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS jul_net,
         sum(CASE WHEN d_moy = 8 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS aug_net,
         sum(CASE WHEN d_moy = 9 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS sep_net,
         sum(CASE WHEN d_moy = 10 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS oct_net,
         sum(CASE WHEN d_moy = 11 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS nov_net,
         sum(CASE WHEN d_moy = 12 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS dec_net
       FROM
         catalog_sales, warehouse, date_dim, time_dim, ship_mode
       WHERE
         cs_warehouse_sk = w_warehouse_sk
           AND cs_sold_date_sk = d_date_sk
           AND cs_sold_time_sk = t_time_sk
           AND cs_ship_mode_sk = sm_ship_mode_sk
           AND d_year = 2001
           AND t_time BETWEEN 30838 AND 30838 + 28800
           AND sm_carrier IN ('DHL', 'BARIAN')
       GROUP BY
         w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state, w_country, d_year
       )
     ) x
GROUP BY
  w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state, w_country,
  ship_carriers, year
ORDER BY w_warehouse_name
LIMIT 100"""

  // q72: the date-lag predicate is spelled on d_date_sk (= days since epoch), the
  // dialect-neutral arithmetic form of `d_date + interval 5 days`; demographics
  // literals exist in the derived domains verbatim
  private val q72 = """
SELECT
  i_item_desc,
  w_warehouse_name,
  d1.d_week_seq,
  count(CASE WHEN p_promo_sk IS NULL
    THEN 1 ELSE 0 END) no_promo,
  count(CASE WHEN p_promo_sk IS NOT NULL
    THEN 1 ELSE 0 END) promo,
  count(*) total_cnt
FROM catalog_sales
  JOIN inventory ON (cs_item_sk = inv_item_sk)
  JOIN warehouse ON (w_warehouse_sk = inv_warehouse_sk)
  JOIN item ON (i_item_sk = cs_item_sk)
  JOIN customer_demographics ON (cs_bill_cdemo_sk = cd_demo_sk)
  JOIN household_demographics ON (cs_bill_hdemo_sk = hd_demo_sk)
  JOIN date_dim d1 ON (cs_sold_date_sk = d1.d_date_sk)
  JOIN date_dim d2 ON (inv_date_sk = d2.d_date_sk)
  JOIN date_dim d3 ON (cs_ship_date_sk = d3.d_date_sk)
  LEFT OUTER JOIN promotion ON (cs_promo_sk = p_promo_sk)
  LEFT OUTER JOIN catalog_returns ON (cr_item_sk = cs_item_sk AND cr_order_number = cs_order_number)
WHERE d1.d_week_seq = d2.d_week_seq
  AND inv_quantity_on_hand < cs_quantity
  AND d3.d_date_sk > d1.d_date_sk + 5
  AND hd_buy_potential = '>10000'
  AND d1.d_year = 1999
  AND hd_buy_potential = '>10000'
  AND cd_marital_status = 'D'
  AND d1.d_year = 1999
GROUP BY i_item_desc, w_warehouse_name, d1.d_week_seq
ORDER BY total_cnt DESC, i_item_desc, w_warehouse_name, d1.d_week_seq
LIMIT 100"""

  // q84: city 'Edgewood' -> 'CITY1'; income band fitted to the derived 10000-wide
  // bands and to the band the CITY1 residue class actually carries (city and income
  // band both derive from c_custkey, so the window must include band 1)
  private val q84 = """
SELECT
  c_customer_id AS customer_id,
  concat(c_last_name, ', ', c_first_name) AS customername
FROM customer_ds
  , customer_address
  , customer_demographics
  , household_demographics
  , income_band
  , store_returns
WHERE ca_city = 'CITY1'
  AND c_current_addr_sk = ca_address_sk
  AND ib_lower_bound >= 10000
  AND ib_upper_bound <= 10000 + 50000
  AND ib_income_band_sk = hd_income_band_sk
  AND cd_demo_sk = c_current_cdemo_sk
  AND hd_demo_sk = c_current_hdemo_sk
  AND sr_cdemo_sk = cd_demo_sk
ORDER BY c_customer_id
LIMIT 100"""

  // q95: fits as in q94 (state/site/dates); backtick aliases become identifiers
  private val q95 = """
WITH ws_wh AS
(SELECT
    ws1.ws_order_number,
    ws1.ws_warehouse_sk wh1,
    ws2.ws_warehouse_sk wh2
  FROM web_sales ws1, web_sales ws2
  WHERE ws1.ws_order_number = ws2.ws_order_number
    AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
SELECT
  count(DISTINCT ws_order_number) AS order_count,
  sum(ws_ext_ship_cost) AS total_shipping_cost,
  sum(ws_net_profit) AS total_net_profit
FROM
  web_sales ws1, date_dim, customer_address, web_site
WHERE
  d_date BETWEEN '2000-02-01' AND DATE '2000-04-01'
    AND ws1.ws_ship_date_sk = d_date_sk
    AND ws1.ws_ship_addr_sk = ca_address_sk
    AND ca_state = 'ST2'
    AND ws1.ws_web_site_sk = web_site_sk
    AND web_company_name = 'pri'
    AND ws1.ws_order_number IN (SELECT ws_order_number
  FROM ws_wh)
    AND ws1.ws_order_number IN (SELECT wr_order_number
  FROM web_returns, ws_wh
  WHERE wr_order_number = ws_wh.ws_order_number)
ORDER BY count(DISTINCT ws_order_number)
LIMIT 100"""

  // ---- round 8 batch F: the six heaviest monoliths + q76 — full 103/103 coverage ----

  // q14's two front CTEs held as bare bodies so they can ALSO be materialized as
  // StarCache views (see materializedCtes): cross_items is referenced once per channel
  // (3x in q14a, 2x in q14b) and each reference re-inlines the whole 3-channel
  // INTERSECT; avg_sales is the 3-fact-scan scalar gate referenced per channel too.
  private val q14CrossItemsCte = """SELECT i_item_sk ss_item_sk
  FROM item,
    (SELECT
      iss.i_brand_id brand_id,
      iss.i_class_id class_id,
      iss.i_category_id category_id
    FROM store_sales, item iss, date_dim d1
    WHERE ss_item_sk = iss.i_item_sk
      AND ss_sold_date_sk = d1.d_date_sk
      AND d1.d_year BETWEEN 1999 AND 1999 + 2
    INTERSECT
    SELECT
      ics.i_brand_id,
      ics.i_class_id,
      ics.i_category_id
    FROM catalog_sales, item ics, date_dim d2
    WHERE cs_item_sk = ics.i_item_sk
      AND cs_sold_date_sk = d2.d_date_sk
      AND d2.d_year BETWEEN 1999 AND 1999 + 2
    INTERSECT
    SELECT
      iws.i_brand_id,
      iws.i_class_id,
      iws.i_category_id
    FROM web_sales, item iws, date_dim d3
    WHERE ws_item_sk = iws.i_item_sk
      AND ws_sold_date_sk = d3.d_date_sk
      AND d3.d_year BETWEEN 1999 AND 1999 + 2) x
  WHERE i_brand_id = brand_id
    AND i_class_id = class_id
    AND i_category_id = category_id
"""

  private val q14AvgSalesCte = """SELECT avg(quantity * list_price) average_sales
  FROM (
         SELECT
           ss_quantity quantity,
           ss_list_price list_price
         FROM store_sales, date_dim
         WHERE ss_sold_date_sk = d_date_sk
           AND d_year BETWEEN 1999 AND 2001
         UNION ALL
         SELECT
           cs_quantity quantity,
           cs_list_price list_price
         FROM catalog_sales, date_dim
         WHERE cs_sold_date_sk = d_date_sk
           AND d_year BETWEEN 1999 AND 1999 + 2
         UNION ALL
         SELECT
           ws_quantity quantity,
           ws_list_price list_price
         FROM web_sales, date_dim
         WHERE ws_sold_date_sk = d_date_sk
           AND d_year BETWEEN 1999 AND 1999 + 2) x"""

  private val q14aCrossItems = s"""
WITH cross_items AS
($q14CrossItemsCte),
    avg_sales AS
  ($q14AvgSalesCte)"""

  // q14a: channel-month filters moved to November 2000 (the official 1999+2
  // November has no sold dates in this data); the 3-channel brand/class/category
  // INTERSECT + avg_sales gate runs verbatim; bare final sums gain aliases and
  // BIGINT/rollup-NULL edge treatment
  private val q14aSelect = """
SELECT
  channel,
  i_brand_id,
  i_class_id,
  i_category_id,
  sum(sales) AS sum_sales,
  CAST(sum(number_sales) AS BIGINT) AS sum_number_sales
FROM (
       SELECT
         'store' channel,
         i_brand_id,
         i_class_id,
         i_category_id,
         sum(ss_quantity * ss_list_price) sales,
         count(*) number_sales
       FROM store_sales, item, date_dim
       WHERE ss_item_sk IN (SELECT ss_item_sk
       FROM cross_items)
         AND ss_item_sk = i_item_sk
         AND ss_sold_date_sk = d_date_sk
         AND d_year = 1999 + 1
         AND d_moy = 11
       GROUP BY i_brand_id, i_class_id, i_category_id
       HAVING sum(ss_quantity * ss_list_price) > (SELECT average_sales
       FROM avg_sales)
       UNION ALL
       SELECT
         'catalog' channel,
         i_brand_id,
         i_class_id,
         i_category_id,
         sum(cs_quantity * cs_list_price) sales,
         count(*) number_sales
       FROM catalog_sales, item, date_dim
       WHERE cs_item_sk IN (SELECT ss_item_sk
       FROM cross_items)
         AND cs_item_sk = i_item_sk
         AND cs_sold_date_sk = d_date_sk
         AND d_year = 1999 + 1
         AND d_moy = 11
       GROUP BY i_brand_id, i_class_id, i_category_id
       HAVING sum(cs_quantity * cs_list_price) > (SELECT average_sales FROM avg_sales)
       UNION ALL
       SELECT
         'web' channel,
         i_brand_id,
         i_class_id,
         i_category_id,
         sum(ws_quantity * ws_list_price) sales,
         count(*) number_sales
       FROM web_sales, item, date_dim
       WHERE ws_item_sk IN (SELECT ss_item_sk
       FROM cross_items)
         AND ws_item_sk = i_item_sk
         AND ws_sold_date_sk = d_date_sk
         AND d_year = 1999 + 1
         AND d_moy = 11
       GROUP BY i_brand_id, i_class_id, i_category_id
       HAVING sum(ws_quantity * ws_list_price) > (SELECT average_sales
       FROM avg_sales)
     ) y
GROUP BY ROLLUP (channel, i_brand_id, i_class_id, i_category_id)
ORDER BY channel NULLS FIRST, i_brand_id NULLS FIRST, i_class_id NULLS FIRST,
  i_category_id NULLS FIRST
LIMIT 100"""

  private val q14a = q14aCrossItems + q14aSelect

  // q14b: verbatim (this-year vs last-year week compare over the same cross_items)
  private val q14bSelect = """
SELECT *
FROM
  (SELECT
    'store' channel,
    i_brand_id,
    i_class_id,
    i_category_id,
    sum(ss_quantity * ss_list_price) sales,
    count(*) number_sales
  FROM store_sales, item, date_dim
  WHERE ss_item_sk IN (SELECT ss_item_sk
  FROM cross_items)
    AND ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND d_week_seq = (SELECT d_week_seq
  FROM date_dim
  WHERE d_year = 1999 + 1 AND d_moy = 12 AND d_dom = 11)
  GROUP BY i_brand_id, i_class_id, i_category_id
  HAVING sum(ss_quantity * ss_list_price) > (SELECT average_sales
  FROM avg_sales)) this_year,
  (SELECT
    'store' channel2,
    i_brand_id i_brand_id2,
    i_class_id i_class_id2,
    i_category_id i_category_id2,
    sum(ss_quantity * ss_list_price) sales2,
    count(*) number_sales2
  FROM store_sales, item, date_dim
  WHERE ss_item_sk IN (SELECT ss_item_sk
  FROM cross_items)
    AND ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND d_week_seq = (SELECT d_week_seq
  FROM date_dim
  WHERE d_year = 1999 AND d_moy = 12 AND d_dom = 11)
  GROUP BY i_brand_id, i_class_id, i_category_id
  HAVING sum(ss_quantity * ss_list_price) > (SELECT average_sales
  FROM avg_sales)) last_year
WHERE this_year.i_brand_id = last_year.i_brand_id2
  AND this_year.i_class_id = last_year.i_class_id2
  AND this_year.i_category_id = last_year.i_category_id2
ORDER BY this_year.channel, this_year.i_brand_id, this_year.i_class_id, this_year.i_category_id
LIMIT 100"""

  private val q14b = q14aCrossItems + q14bSelect

  // q14 v2.7.0 variant (reference tpcds-v2.7.0/q14.sql:1, "the alternative form of
  // q14a" — structurally the store-channel this-week/last-week compare with its own
  // parameter set): runs with the text's OWN constants (base year 1998, week of
  // Dec 16 — both weeks carry sales in this data, so no year/dom fit was needed,
  // unlike q14a/b). The only deviation is the repo-standard one: last_year's output
  // columns gain 2-suffixes because SELECT * over two same-named subqueries cannot
  // land in parquet with duplicate column names.
  private val q14V27CrossItemsCte = """SELECT i_item_sk ss_item_sk
  FROM item,
    (SELECT
      iss.i_brand_id brand_id,
      iss.i_class_id class_id,
      iss.i_category_id category_id
    FROM store_sales, item iss, date_dim d1
    WHERE ss_item_sk = iss.i_item_sk
      AND ss_sold_date_sk = d1.d_date_sk
      AND d1.d_year BETWEEN 1998 AND 1998 + 2
    INTERSECT
    SELECT
      ics.i_brand_id,
      ics.i_class_id,
      ics.i_category_id
    FROM catalog_sales, item ics, date_dim d2
    WHERE cs_item_sk = ics.i_item_sk
      AND cs_sold_date_sk = d2.d_date_sk
      AND d2.d_year BETWEEN 1998 AND 1998 + 2
    INTERSECT
    SELECT
      iws.i_brand_id,
      iws.i_class_id,
      iws.i_category_id
    FROM web_sales, item iws, date_dim d3
    WHERE ws_item_sk = iws.i_item_sk
      AND ws_sold_date_sk = d3.d_date_sk
      AND d3.d_year BETWEEN 1998 AND 1998 + 2) x
  WHERE i_brand_id = brand_id
    AND i_class_id = class_id
    AND i_category_id = category_id
"""

  private val q14V27AvgSalesCte = """SELECT avg(quantity * list_price) average_sales
  FROM (
         SELECT
           ss_quantity quantity,
           ss_list_price list_price
         FROM store_sales, date_dim
         WHERE ss_sold_date_sk = d_date_sk
           AND d_year BETWEEN 1998 AND 1998 + 2
         UNION ALL
         SELECT
           cs_quantity quantity,
           cs_list_price list_price
         FROM catalog_sales, date_dim
         WHERE cs_sold_date_sk = d_date_sk
           AND d_year BETWEEN 1998 AND 1998 + 2
         UNION ALL
         SELECT
           ws_quantity quantity,
           ws_list_price list_price
         FROM web_sales, date_dim
         WHERE ws_sold_date_sk = d_date_sk
           AND d_year BETWEEN 1998 AND 1998 + 2) x"""

  private val q14V27CrossItems = s"""
WITH cross_items AS
($q14V27CrossItemsCte),
    avg_sales AS
  ($q14V27AvgSalesCte)"""

  private val q14V27Select = """
SELECT *
FROM
  (SELECT
    'store' channel,
    i_brand_id,
    i_class_id,
    i_category_id,
    sum(ss_quantity * ss_list_price) sales,
    count(*) number_sales
  FROM store_sales, item, date_dim
  WHERE ss_item_sk IN (SELECT ss_item_sk
  FROM cross_items)
    AND ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND d_week_seq = (SELECT d_week_seq
  FROM date_dim
  WHERE d_year = 1998 + 1 AND d_moy = 12 AND d_dom = 16)
  GROUP BY i_brand_id, i_class_id, i_category_id
  HAVING sum(ss_quantity * ss_list_price) > (SELECT average_sales
  FROM avg_sales)) this_year,
  (SELECT
    'store' channel2,
    i_brand_id i_brand_id2,
    i_class_id i_class_id2,
    i_category_id i_category_id2,
    sum(ss_quantity * ss_list_price) sales2,
    count(*) number_sales2
  FROM store_sales, item, date_dim
  WHERE ss_item_sk IN (SELECT ss_item_sk
  FROM cross_items)
    AND ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND d_week_seq = (SELECT d_week_seq
  FROM date_dim
  WHERE d_year = 1998 AND d_moy = 12 AND d_dom = 16)
  GROUP BY i_brand_id, i_class_id, i_category_id
  HAVING sum(ss_quantity * ss_list_price) > (SELECT average_sales
  FROM avg_sales)) last_year
WHERE this_year.i_brand_id = last_year.i_brand_id2
  AND this_year.i_class_id = last_year.i_class_id2
  AND this_year.i_category_id = last_year.i_category_id2
ORDER BY this_year.channel, this_year.i_brand_id, this_year.i_class_id, this_year.i_category_id
LIMIT 100"""

  private val q14V27 = q14V27CrossItems + q14V27Select

  // q23's three front CTEs held as bare bodies for the same reason as q14's (see
  // materializedCtes): frequent_ss_items and best_ss_customer are each referenced
  // once per channel block (2x in q23a AND q23b); max_store_sales only feeds
  // best_ss_customer's HAVING, so it is inlined into that view's defining SQL
  // rather than materialized on its own.
  private val q23FrequentCte = """SELECT
    substr(i_item_desc, 1, 30) itemdesc,
    i_item_sk item_sk,
    d_date solddate,
    count(*) cnt
  FROM store_sales, date_dim, item
  WHERE ss_sold_date_sk = d_date_sk
    AND ss_item_sk = i_item_sk
    AND d_year IN (2000, 2000 + 1, 2000 + 2, 2000 + 3)
  GROUP BY substr(i_item_desc, 1, 30), i_item_sk, d_date
  HAVING count(*) > 1"""

  private val q23MaxSalesCte = """SELECT max(csales) tpcds_cmax
  FROM (SELECT
    c_customer_sk,
    sum(ss_quantity * ss_sales_price) csales
  FROM store_sales, customer_ds, date_dim
  WHERE ss_customer_sk = c_customer_sk
    AND ss_sold_date_sk = d_date_sk
    AND d_year IN (2000, 2000 + 1, 2000 + 2, 2000 + 3)
  GROUP BY c_customer_sk) x"""

  private val q23BestCustomerCte = """SELECT
    c_customer_sk,
    sum(ss_quantity * ss_sales_price) ssales
  FROM store_sales, customer_ds
  WHERE ss_customer_sk = c_customer_sk
  GROUP BY c_customer_sk
  HAVING sum(ss_quantity * ss_sales_price) > (50 / 100.0) *
    (SELECT *
    FROM max_store_sales)"""

  private val q23Prefix = s"""
WITH frequent_ss_items AS
($q23FrequentCte),
    max_store_sales AS
  ($q23MaxSalesCte),
    best_ss_customer AS
  ($q23BestCustomerCte)"""

  // q23a: frequency threshold >4 -> >1 (this data's fact density peaks at 2 sales
  // per item-day; the official threshold presumes TPC-DS's much denser item-days);
  // the bare sum aliased
  private val q23aSelect = """
SELECT sum(sales) AS total_sales
FROM ((SELECT cs_quantity * cs_list_price sales
FROM catalog_sales, date_dim
WHERE d_year = 2000
  AND d_moy = 2
  AND cs_sold_date_sk = d_date_sk
  AND cs_item_sk IN (SELECT item_sk
FROM frequent_ss_items)
  AND cs_bill_customer_sk IN (SELECT c_customer_sk
FROM best_ss_customer))
      UNION ALL
      (SELECT ws_quantity * ws_list_price sales
      FROM web_sales, date_dim
      WHERE d_year = 2000
        AND d_moy = 2
        AND ws_sold_date_sk = d_date_sk
        AND ws_item_sk IN (SELECT item_sk
      FROM frequent_ss_items)
        AND ws_bill_customer_sk IN (SELECT c_customer_sk
      FROM best_ss_customer))) y
LIMIT 100"""

  private val q23a = q23Prefix + q23aSelect

  // q23b: same fits as q23a
  private val q23bSelect = """
SELECT
  c_last_name,
  c_first_name,
  sales
FROM ((SELECT
  c_last_name,
  c_first_name,
  sum(cs_quantity * cs_list_price) sales
FROM catalog_sales, customer_ds, date_dim
WHERE d_year = 2000
  AND d_moy = 2
  AND cs_sold_date_sk = d_date_sk
  AND cs_item_sk IN (SELECT item_sk
FROM frequent_ss_items)
  AND cs_bill_customer_sk IN (SELECT c_customer_sk
FROM best_ss_customer)
  AND cs_bill_customer_sk = c_customer_sk
GROUP BY c_last_name, c_first_name)
      UNION ALL
      (SELECT
        c_last_name,
        c_first_name,
        sum(ws_quantity * ws_list_price) sales
      FROM web_sales, customer_ds, date_dim
      WHERE d_year = 2000
        AND d_moy = 2
        AND ws_sold_date_sk = d_date_sk
        AND ws_item_sk IN (SELECT item_sk
      FROM frequent_ss_items)
        AND ws_bill_customer_sk IN (SELECT c_customer_sk
      FROM best_ss_customer)
        AND ws_bill_customer_sk = c_customer_sk
      GROUP BY c_last_name, c_first_name)) y
ORDER BY c_last_name, c_first_name, sales
LIMIT 100"""

  private val q23b = q23Prefix + q23bSelect

  private def q24Body(color: String) = s"""
WITH ssales AS
(SELECT
    c_last_name,
    c_first_name,
    s_store_name,
    ca_state,
    s_state,
    i_color,
    i_current_price,
    i_manager_id,
    i_units,
    i_size,
    sum(ss_net_paid) netpaid
  FROM store_sales, store_returns, store, item, customer_ds, customer_address
  WHERE ss_ticket_number = sr_ticket_number
    AND ss_item_sk = sr_item_sk
    AND ss_customer_sk = c_customer_sk
    AND ss_item_sk = i_item_sk
    AND ss_store_sk = s_store_sk
    AND c_birth_country = upper(ca_country)
    AND s_zip = ca_zip
    AND s_market_id = 8
  GROUP BY c_last_name, c_first_name, s_store_name, ca_state, s_state, i_color,
    i_current_price, i_manager_id, i_units, i_size)
SELECT
  c_last_name,
  c_first_name,
  s_store_name,
  sum(netpaid) paid
FROM ssales
WHERE i_color = '$color'
GROUP BY c_last_name, c_first_name, s_store_name
HAVING sum(netpaid) > (SELECT 0.05 * avg(netpaid)
FROM ssales)"""

  // q24a/b: colors 'pale'/'chiffon' -> 'red'/'blue' (derived color tokens); the
  // derived customer birth country carries 'UNITED STATES' for one residue class so
  // the c_birth_country = upper(ca_country) correlation is populated; s_market_id=8
  // selects the one derived store in market 8
  private val q24a = q24Body("red")
  private val q24b = q24Body("blue")

  // q24 v2.7.0 variant (reference native-sql-engine/core/src/test/resources/
  // tpcds-v2.7.0/q24.sql:1): adds the c_current_addr_sk = ca_address_sk condition
  // ("did not exist in TPCDS v1.4") and a final ORDER BY. The addr equality pins the
  // ca row to the customer's OWN address, so zip+country+addr reduce to a single
  // customer residue class per store at tiny SF (all three derive from c_custkey) —
  // dense at production SF, sparse here. Fits: s_market_id 8 -> 1 (the one market
  // whose zip residue class carries sales-with-returns in this data) and color
  // 'pale' -> 'hot' (that market's basket at the sf0.01 verification scale).
  private val q24V27 = """
WITH ssales AS
(SELECT
    c_last_name,
    c_first_name,
    s_store_name,
    ca_state,
    s_state,
    i_color,
    i_current_price,
    i_manager_id,
    i_units,
    i_size,
    sum(ss_net_paid) netpaid
  FROM store_sales, store_returns, store, item, customer_ds, customer_address
  WHERE ss_ticket_number = sr_ticket_number
    AND ss_item_sk = sr_item_sk
    AND ss_customer_sk = c_customer_sk
    AND ss_item_sk = i_item_sk
    AND ss_store_sk = s_store_sk
    AND c_current_addr_sk = ca_address_sk
    AND c_birth_country = upper(ca_country)
    AND s_zip = ca_zip
    AND s_market_id = 1
  GROUP BY c_last_name, c_first_name, s_store_name, ca_state, s_state, i_color,
    i_current_price, i_manager_id, i_units, i_size)
SELECT
  c_last_name,
  c_first_name,
  s_store_name,
  sum(netpaid) paid
FROM ssales
WHERE i_color = 'hot'
GROUP BY c_last_name, c_first_name, s_store_name
HAVING sum(netpaid) > (SELECT 0.05 * avg(netpaid)
FROM ssales)
ORDER BY
  c_last_name,
  c_first_name,
  s_store_name"""

  // q64: color set and price bands fitted to the derived lattices; the duplicate
  // cs2.* output names gain _2 suffixes (parquet cannot carry duplicate column
  // names); purchase-time demographics (ss_cdemo_sk) are decorrelated from the
  // customer's current demographics so cd1 <> cd2 is satisfiable
  // q64's front CTEs held as bare bodies (see materializedCtes): cross_sales — the
  // 12-table purchase/first-sale join — is self-joined as cs1/cs2 with DIFFERENT
  // syear filters pushed into each copy (the q74 disease exactly), so inlining
  // computes the whole join twice; cs_ui only feeds cross_sales and is inlined
  // into its defining SQL.
  private val q64CsUiCte = """SELECT
    cs_item_sk,
    sum(cs_ext_list_price) AS sale,
    sum(cr_refunded_cash + cr_reversed_charge + cr_store_credit) AS refund
  FROM catalog_sales
    , catalog_returns
  WHERE cs_item_sk = cr_item_sk
    AND cs_order_number = cr_order_number
  GROUP BY cs_item_sk
  HAVING sum(cs_ext_list_price) > 2 * sum(cr_refunded_cash + cr_reversed_charge + cr_store_credit)"""

  private val q64CrossSalesCte = """SELECT
    i_product_name product_name,
    i_item_sk item_sk,
    s_store_name store_name,
    s_zip store_zip,
    ad1.ca_street_number b_street_number,
    ad1.ca_street_name b_streen_name,
    ad1.ca_city b_city,
    ad1.ca_zip b_zip,
    ad2.ca_street_number c_street_number,
    ad2.ca_street_name c_street_name,
    ad2.ca_city c_city,
    ad2.ca_zip c_zip,
    d1.d_year AS syear,
    d2.d_year AS fsyear,
    d3.d_year s2year,
    count(*) cnt,
    sum(ss_wholesale_cost) s1,
    sum(ss_list_price) s2,
    sum(ss_coupon_amt) s3
  FROM store_sales, store_returns, cs_ui, date_dim d1, date_dim d2, date_dim d3,
    store, customer_ds, customer_demographics cd1, customer_demographics cd2,
    promotion, household_demographics hd1, household_demographics hd2,
    customer_address ad1, customer_address ad2, income_band ib1, income_band ib2, item
  WHERE ss_store_sk = s_store_sk AND
    ss_sold_date_sk = d1.d_date_sk AND
    ss_customer_sk = c_customer_sk AND
    ss_cdemo_sk = cd1.cd_demo_sk AND
    ss_hdemo_sk = hd1.hd_demo_sk AND
    ss_addr_sk = ad1.ca_address_sk AND
    ss_item_sk = i_item_sk AND
    ss_item_sk = sr_item_sk AND
    ss_ticket_number = sr_ticket_number AND
    ss_item_sk = cs_ui.cs_item_sk AND
    c_current_cdemo_sk = cd2.cd_demo_sk AND
    c_current_hdemo_sk = hd2.hd_demo_sk AND
    c_current_addr_sk = ad2.ca_address_sk AND
    c_first_sales_date_sk = d2.d_date_sk AND
    c_first_shipto_date_sk = d3.d_date_sk AND
    ss_promo_sk = p_promo_sk AND
    hd1.hd_income_band_sk = ib1.ib_income_band_sk AND
    hd2.hd_income_band_sk = ib2.ib_income_band_sk AND
    cd1.cd_marital_status <> cd2.cd_marital_status AND
    i_color IN ('blue', 'cold', 'hot', 'new', 'old', 'red') AND
    i_current_price BETWEEN 1000 AND 1000 + 100 AND
    i_current_price BETWEEN 1000 + 10 AND 1000 + 150
  GROUP BY i_product_name, i_item_sk, s_store_name, s_zip, ad1.ca_street_number,
    ad1.ca_street_name, ad1.ca_city, ad1.ca_zip, ad2.ca_street_number,
    ad2.ca_street_name, ad2.ca_city, ad2.ca_zip, d1.d_year, d2.d_year, d3.d_year"""

  private val q64Select = """
SELECT
  cs1.product_name,
  cs1.store_name,
  cs1.store_zip,
  cs1.b_street_number,
  cs1.b_streen_name,
  cs1.b_city,
  cs1.b_zip,
  cs1.c_street_number,
  cs1.c_street_name,
  cs1.c_city,
  cs1.c_zip,
  cs1.syear,
  cs1.cnt,
  cs1.s1,
  cs1.s2,
  cs1.s3,
  cs2.s1 AS s1_2,
  cs2.s2 AS s2_2,
  cs2.s3 AS s3_2,
  cs2.syear AS syear_2,
  cs2.cnt AS cnt_2
FROM cross_sales cs1, cross_sales cs2
WHERE cs1.item_sk = cs2.item_sk AND
  cs1.syear = 1999 AND
  cs2.syear = 1999 + 1 AND
  cs2.cnt <= cs1.cnt AND
  cs1.store_name = cs2.store_name AND
  cs1.store_zip = cs2.store_zip
ORDER BY cs1.product_name, cs1.store_name, cs2.cnt"""

  private val q64 = s"""
WITH cs_ui AS
($q64CsUiCte),
    cross_sales AS
  ($q64CrossSalesCte
  )""" + q64Select

  // q76: verbatim — the derived facts now carry deterministic NULL slices on
  // exactly the columns this query probes (ss_store_sk, ws_ship_customer_sk,
  // cs_ship_addr_sk); the bare count/sum gain BIGINT/alias edges
  private val q76 = """
SELECT
  channel,
  col_name,
  d_year,
  d_qoy,
  i_category,
  COUNT(*) sales_cnt,
  SUM(ext_sales_price) sales_amt
FROM (
       SELECT
         'store' AS channel,
         ss_store_sk col_name,
         d_year,
         d_qoy,
         i_category,
         ss_ext_sales_price ext_sales_price
       FROM store_sales, item, date_dim
       WHERE ss_store_sk IS NULL
         AND ss_sold_date_sk = d_date_sk
         AND ss_item_sk = i_item_sk
       UNION ALL
       SELECT
         'web' AS channel,
         ws_ship_customer_sk col_name,
         d_year,
         d_qoy,
         i_category,
         ws_ext_sales_price ext_sales_price
       FROM web_sales, item, date_dim
       WHERE ws_ship_customer_sk IS NULL
         AND ws_sold_date_sk = d_date_sk
         AND ws_item_sk = i_item_sk
       UNION ALL
       SELECT
         'catalog' AS channel,
         cs_ship_addr_sk col_name,
         d_year,
         d_qoy,
         i_category,
         cs_ext_sales_price ext_sales_price
       FROM catalog_sales, item, date_dim
       WHERE cs_ship_addr_sk IS NULL
         AND cs_sold_date_sk = d_date_sk
         AND cs_item_sk = i_item_sk) foo
GROUP BY channel, col_name, d_year, d_qoy, i_category
ORDER BY channel, col_name, d_year, d_qoy, i_category
LIMIT 100"""

  // ---------------------------------------------------------------------------
  // TPC-DS v2.7.0 "a"-variant rewrites (reference: native-sql-engine/core/src/
  // test/resources/tpcds-v2.7.0/, the 13 files marked "new query in TPCDS v2.7").
  // Each re-expresses a v1.4 query's ROLLUP / grouping-sets / OR-exists as
  // explicit UNION arms or AND-of-union-exists — a different plan shape Spark
  // must get right (no grouping() shortcuts available). Parameters mirror the
  // fitted v1.4 twins above; ORDER BY keys gain explicit NULLS FIRST (Spark's
  // ASC default) so LIMIT truncation picks identical rows in DuckDB.

  // q5a: q5's ssr/csr/wsr, rollup expanded as results + 3-arm UNION
  private val q5a = """
WITH ssr AS
( SELECT
    s_store_id,
    sum(sales_price) AS sales,
    sum(profit) AS profit,
    sum(return_amt) AS returns,
    sum(net_loss) AS profit_loss
  FROM
    (SELECT
       ss_store_sk AS store_sk,
       ss_sold_date_sk AS date_sk,
       ss_ext_sales_price AS sales_price,
       ss_net_profit AS profit,
       cast(0 AS DECIMAL(7, 2)) AS return_amt,
       cast(0 AS DECIMAL(7, 2)) AS net_loss
     FROM store_sales
     UNION ALL
     SELECT
       sr_store_sk AS store_sk,
       sr_returned_date_sk AS date_sk,
       cast(0 AS DECIMAL(7, 2)) AS sales_price,
       cast(0 AS DECIMAL(7, 2)) AS profit,
       sr_return_amt AS return_amt,
       sr_net_loss AS net_loss
     FROM store_returns)
    salesreturns, date_dim, store
  WHERE date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-06'
    AND store_sk = s_store_sk
  GROUP BY s_store_id),
csr AS
( SELECT
    cp_catalog_page_id,
    sum(sales_price) AS sales,
    sum(profit) AS profit,
    sum(return_amt) AS returns,
    sum(net_loss) AS profit_loss
  FROM
    (SELECT
       cs_catalog_page_sk AS page_sk,
       cs_sold_date_sk AS date_sk,
       cs_ext_sales_price AS sales_price,
       cs_net_profit AS profit,
       cast(0 AS DECIMAL(7, 2)) AS return_amt,
       cast(0 AS DECIMAL(7, 2)) AS net_loss
     FROM catalog_sales
     UNION ALL
     SELECT
       cr_catalog_page_sk AS page_sk,
       cr_returned_date_sk AS date_sk,
       cast(0 AS DECIMAL(7, 2)) AS sales_price,
       cast(0 AS DECIMAL(7, 2)) AS profit,
       cr_return_amount AS return_amt,
       cr_net_loss AS net_loss
     FROM catalog_returns
    ) salesreturns, date_dim, catalog_page
  WHERE date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-06'
    AND page_sk = cp_catalog_page_sk
  GROUP BY cp_catalog_page_id),
wsr AS
( SELECT
    web_site_id,
    sum(sales_price) AS sales,
    sum(profit) AS profit,
    sum(return_amt) AS returns,
    sum(net_loss) AS profit_loss
  FROM
    (SELECT
       ws_web_site_sk AS wsr_web_site_sk,
       ws_sold_date_sk AS date_sk,
       ws_ext_sales_price AS sales_price,
       ws_net_profit AS profit,
       cast(0 AS DECIMAL(7, 2)) AS return_amt,
       cast(0 AS DECIMAL(7, 2)) AS net_loss
     FROM web_sales
     UNION ALL
     SELECT
       ws_web_site_sk AS wsr_web_site_sk,
       wr_returned_date_sk AS date_sk,
       cast(0 AS DECIMAL(7, 2)) AS sales_price,
       cast(0 AS DECIMAL(7, 2)) AS profit,
       wr_return_amt AS return_amt,
       wr_net_loss AS net_loss
     FROM web_returns
       LEFT OUTER JOIN web_sales ON
                                   (wr_item_sk = ws_item_sk
                                     AND wr_order_number = ws_order_number)
    ) salesreturns, date_dim, web_site
  WHERE date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-06'
    AND wsr_web_site_sk = web_site_sk
  GROUP BY web_site_id),
results AS (
  SELECT
    channel,
    id,
    sum(sales) AS sales,
    sum(returns) AS returns,
    sum(profit) AS profit
  FROM
    (SELECT
       'store channel' AS channel,
       concat('store', s_store_id) AS id,
       sales,
       returns,
       (profit - profit_loss) AS profit
     FROM ssr
     UNION ALL
     SELECT
       'catalog channel' AS channel,
       concat('catalog_page', cp_catalog_page_id) AS id,
       sales,
       returns,
       (profit - profit_loss) AS profit
     FROM csr
     UNION ALL
     SELECT
       'web channel' AS channel,
       concat('web_site', web_site_id) AS id,
       sales,
       returns,
       (profit - profit_loss) AS profit
     FROM wsr
    ) x
  GROUP BY channel, id)
SELECT
  channel, id, sales, returns, profit
FROM (
  SELECT channel, id, sales, returns, profit
  FROM results
  UNION
  SELECT channel, NULL AS id, sum(sales) AS sales, sum(returns) AS returns,
    sum(profit) AS profit
  FROM results
  GROUP BY channel
  UNION
  SELECT NULL AS channel, NULL AS id, sum(sales) AS sales, sum(returns) AS returns,
    sum(profit) AS profit
  FROM results) foo
ORDER BY channel NULLS FIRST, id NULLS FIRST
LIMIT 100"""

  // q10a: q10's OR-of-exists becomes one exists over a UNION ALL
  private val q10a = """
SELECT
  cd_gender, cd_marital_status, cd_education_status, count(*) cnt1,
  cd_purchase_estimate, count(*) cnt2, cd_credit_rating, count(*) cnt3,
  cd_dep_count, count(*) cnt4, cd_dep_employed_count, count(*) cnt5,
  cd_dep_college_count, count(*) cnt6
FROM customer_ds c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND ca_county IN ('CTY1', 'CTY2', 'CTY3', 'CTY4', 'CTY5')
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND exists(SELECT *
             FROM store_sales, date_dim
             WHERE c.c_customer_sk = ss_customer_sk
               AND ss_sold_date_sk = d_date_sk
               AND d_year = 2000
               AND d_moy BETWEEN 4 AND 4 + 3)
  AND exists(SELECT *
             FROM (
               SELECT ws_bill_customer_sk AS customer_sk, d_year, d_moy
               FROM web_sales, date_dim
               WHERE ws_sold_date_sk = d_date_sk
                 AND d_year = 2000
                 AND d_moy BETWEEN 4 AND 4 + 3
               UNION ALL
               SELECT cs_ship_customer_sk AS customer_sk, d_year, d_moy
               FROM catalog_sales, date_dim
               WHERE cs_sold_date_sk = d_date_sk
                 AND d_year = 2000
                 AND d_moy BETWEEN 4 AND 4 + 3) x
             WHERE c.c_customer_sk = customer_sk)
GROUP BY cd_gender, cd_marital_status, cd_education_status, cd_purchase_estimate,
  cd_credit_rating, cd_dep_count, cd_dep_employed_count, cd_dep_college_count
ORDER BY cd_gender, cd_marital_status, cd_education_status, cd_purchase_estimate,
  cd_credit_rating, cd_dep_count, cd_dep_employed_count, cd_dep_college_count
LIMIT 100"""

  // q18a: q18's 4-level ROLLUP expanded as 5 UNION ALL re-aggregations; the
  // decimal(12,2) casts become DOUBLE (this star's money discipline)
  private val q18a = """
WITH results AS (
  SELECT
    i_item_id, ca_country, ca_state, ca_county,
    CAST(cs_quantity AS DOUBLE) agg1,
    CAST(cs_list_price AS DOUBLE) agg2,
    CAST(cs_coupon_amt AS DOUBLE) agg3,
    CAST(cs_sales_price AS DOUBLE) agg4,
    CAST(cs_net_profit AS DOUBLE) agg5,
    CAST(c_birth_year AS DOUBLE) agg6,
    CAST(cd1.cd_dep_count AS DOUBLE) agg7
  FROM catalog_sales, customer_demographics cd1, customer_demographics cd2,
    customer_ds, customer_address, date_dim, item
  WHERE cs_sold_date_sk = d_date_sk
    AND cs_item_sk = i_item_sk
    AND cs_bill_cdemo_sk = cd1.cd_demo_sk
    AND cs_bill_customer_sk = c_customer_sk
    AND cd1.cd_gender = 'F'
    AND cd1.cd_education_status = 'Secondary'
    AND c_current_cdemo_sk = cd2.cd_demo_sk
    AND c_current_addr_sk = ca_address_sk
    AND c_birth_month IN (1, 6, 8, 9, 12, 2)
    AND d_year = 1998
    AND ca_state IN ('ST1', 'ST2', 'ST3', 'ST4', 'ST5', 'ST6', 'ST7'))
SELECT
  i_item_id, ca_country, ca_state, ca_county,
  agg1, agg2, agg3, agg4, agg5, agg6, agg7
FROM (
  SELECT
    i_item_id, ca_country, ca_state, ca_county,
    avg(agg1) agg1, avg(agg2) agg2, avg(agg3) agg3, avg(agg4) agg4,
    avg(agg5) agg5, avg(agg6) agg6, avg(agg7) agg7
  FROM results
  GROUP BY i_item_id, ca_country, ca_state, ca_county
  UNION ALL
  SELECT
    i_item_id, ca_country, ca_state, NULL AS county,
    avg(agg1) agg1, avg(agg2) agg2, avg(agg3) agg3, avg(agg4) agg4,
    avg(agg5) agg5, avg(agg6) agg6, avg(agg7) agg7
  FROM results
  GROUP BY i_item_id, ca_country, ca_state
  UNION ALL
  SELECT
    i_item_id, ca_country, NULL AS ca_state, NULL AS county,
    avg(agg1) agg1, avg(agg2) agg2, avg(agg3) agg3, avg(agg4) agg4,
    avg(agg5) agg5, avg(agg6) agg6, avg(agg7) agg7
  FROM results
  GROUP BY i_item_id, ca_country
  UNION ALL
  SELECT
    i_item_id, NULL AS ca_country, NULL AS ca_state, NULL AS county,
    avg(agg1) agg1, avg(agg2) agg2, avg(agg3) agg3, avg(agg4) agg4,
    avg(agg5) agg5, avg(agg6) agg6, avg(agg7) agg7
  FROM results
  GROUP BY i_item_id
  UNION ALL
  SELECT
    NULL AS i_item_id, NULL AS ca_country, NULL AS ca_state, NULL AS county,
    avg(agg1) agg1, avg(agg2) agg2, avg(agg3) agg3, avg(agg4) agg4,
    avg(agg5) agg5, avg(agg6) agg6, avg(agg7) agg7
  FROM results) foo
ORDER BY ca_country NULLS FIRST, ca_state NULLS FIRST, ca_county NULLS FIRST,
  i_item_id NULLS FIRST
LIMIT 100"""

  // q22a: q22's ROLLUP as results + 5 UNION ALL arms; the avg-of-avg arms are
  // rounded at the edge (5 dp) — second-level double sums are order-sensitive
  private val q22a = """
WITH results AS (
  SELECT
    i_product_name, i_brand, i_class, i_category,
    avg(inv_quantity_on_hand) qoh
  FROM inventory, date_dim, item, warehouse
  WHERE inv_date_sk = d_date_sk
    AND inv_item_sk = i_item_sk
    AND inv_warehouse_sk = w_warehouse_sk
    AND d_month_seq BETWEEN 360 AND 360 + 11
  GROUP BY i_product_name, i_brand, i_class, i_category),
results_rollup AS (
  SELECT i_product_name, i_brand, i_class, i_category, round(avg(qoh), 5) qoh
  FROM results
  GROUP BY i_product_name, i_brand, i_class, i_category
  UNION ALL
  SELECT i_product_name, i_brand, i_class, NULL AS i_category, round(avg(qoh), 5) qoh
  FROM results
  GROUP BY i_product_name, i_brand, i_class
  UNION ALL
  SELECT i_product_name, i_brand, NULL AS i_class, NULL AS i_category, round(avg(qoh), 5) qoh
  FROM results
  GROUP BY i_product_name, i_brand
  UNION ALL
  SELECT i_product_name, NULL AS i_brand, NULL AS i_class, NULL AS i_category,
    round(avg(qoh), 5) qoh
  FROM results
  GROUP BY i_product_name
  UNION ALL
  SELECT NULL AS i_product_name, NULL AS i_brand, NULL AS i_class, NULL AS i_category,
    round(avg(qoh), 5) qoh
  FROM results)
SELECT i_product_name, i_brand, i_class, i_category, qoh
FROM results_rollup
ORDER BY qoh, i_product_name NULLS FIRST, i_brand NULLS FIRST, i_class NULLS FIRST,
  i_category NULLS FIRST
LIMIT 100"""

  // q27a: q27's ROLLUP as 3 UNION ALL arms over a row-level results CTE
  private val q27a = """
WITH results AS (
  SELECT
    i_item_id, s_state, 0 AS g_state,
    ss_quantity agg1, ss_list_price agg2, ss_coupon_amt agg3, ss_sales_price agg4
  FROM store_sales, customer_demographics, date_dim, store, item
  WHERE ss_sold_date_sk = d_date_sk
    AND ss_item_sk = i_item_sk
    AND ss_store_sk = s_store_sk
    AND ss_cdemo_sk = cd_demo_sk
    AND cd_gender = 'M' AND cd_marital_status = 'S' AND cd_education_status = 'College'
    AND d_year = 1998
    AND s_state IN ('ST1', 'ST2', 'ST3'))
SELECT i_item_id, s_state, g_state, agg1, agg2, agg3, agg4
FROM (
  SELECT
    i_item_id, s_state, 0 AS g_state,
    avg(agg1) agg1, avg(agg2) agg2, avg(agg3) agg3, avg(agg4) agg4
  FROM results
  GROUP BY i_item_id, s_state
  UNION ALL
  SELECT
    i_item_id, NULL AS s_state, 1 AS g_state,
    avg(agg1) agg1, avg(agg2) agg2, avg(agg3) agg3, avg(agg4) agg4
  FROM results
  GROUP BY i_item_id
  UNION ALL
  SELECT
    NULL AS i_item_id, NULL AS s_state, 1 AS g_state,
    avg(agg1) agg1, avg(agg2) agg2, avg(agg3) agg3, avg(agg4) agg4
  FROM results) foo
ORDER BY i_item_id NULLS FIRST, s_state NULLS FIRST
LIMIT 100"""

  // q35a: q35's OR-of-exists becomes AND of one union-exists; adds sum() columns
  // (cast BIGINT at the edge — DuckDB sum(int) widens to HUGEINT)
  private val q35a = """
SELECT
  ca_state,
  cd_gender,
  cd_marital_status,
  cd_dep_count,
  count(*) cnt1,
  avg(cd_dep_count) avg_dep,
  max(cd_dep_count) max_dep,
  CAST(sum(cd_dep_count) AS BIGINT) sum_dep,
  cd_dep_employed_count,
  count(*) cnt2,
  avg(cd_dep_employed_count) avg_emp,
  max(cd_dep_employed_count) max_emp,
  CAST(sum(cd_dep_employed_count) AS BIGINT) sum_emp,
  cd_dep_college_count,
  count(*) cnt3,
  avg(cd_dep_college_count) avg_col,
  max(cd_dep_college_count) max_col,
  CAST(sum(cd_dep_college_count) AS BIGINT) sum_col
FROM customer_ds c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND exists(SELECT *
             FROM store_sales, date_dim
             WHERE c.c_customer_sk = ss_customer_sk
               AND ss_sold_date_sk = d_date_sk
               AND d_year = 2001
               AND d_qoy < 4)
  AND exists(SELECT *
             FROM (
               SELECT ws_bill_customer_sk customsk
               FROM web_sales, date_dim
               WHERE ws_sold_date_sk = d_date_sk
                 AND d_year = 2001
                 AND d_qoy < 4
               UNION ALL
               SELECT cs_ship_customer_sk customsk
               FROM catalog_sales, date_dim
               WHERE cs_sold_date_sk = d_date_sk
                 AND d_year = 2001
                 AND d_qoy < 4) x
             WHERE x.customsk = c.c_customer_sk)
GROUP BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
  cd_dep_employed_count, cd_dep_college_count
ORDER BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
  cd_dep_employed_count, cd_dep_college_count
LIMIT 100"""

  // q36a: q36's grouping()-ROLLUP as results + UNION arms with literal g_ flags
  private val q36a = """
WITH results AS (
  SELECT
    sum(ss_net_profit) AS ss_net_profit,
    sum(ss_ext_sales_price) AS ss_ext_sales_price,
    sum(ss_net_profit) / sum(ss_ext_sales_price) AS gross_margin,
    i_category, i_class,
    0 AS g_category, 0 AS g_class
  FROM store_sales, date_dim d1, item, store
  WHERE d1.d_year = 1999
    AND d1.d_date_sk = ss_sold_date_sk
    AND i_item_sk = ss_item_sk
    AND s_store_sk = ss_store_sk
    AND s_state IN ('ST1', 'ST2', 'ST3', 'ST4')
  GROUP BY i_category, i_class),
results_rollup AS (
  SELECT gross_margin, i_category, i_class, 0 AS t_category, 0 AS t_class,
    0 AS lochierarchy
  FROM results
  UNION
  SELECT sum(ss_net_profit) / sum(ss_ext_sales_price) AS gross_margin,
    i_category, NULL AS i_class, 0 AS t_category, 1 AS t_class, 1 AS lochierarchy
  FROM results
  GROUP BY i_category
  UNION
  SELECT sum(ss_net_profit) / sum(ss_ext_sales_price) AS gross_margin,
    NULL AS i_category, NULL AS i_class, 1 AS t_category, 1 AS t_class,
    2 AS lochierarchy
  FROM results)
SELECT
  gross_margin, i_category, i_class, lochierarchy,
  rank() OVER (
    PARTITION BY lochierarchy, CASE WHEN t_class = 0 THEN i_category END
    ORDER BY gross_margin ASC) AS rank_within_parent
FROM results_rollup
ORDER BY lochierarchy DESC,
  CASE WHEN lochierarchy = 0 THEN i_category END NULLS FIRST,
  rank_within_parent, i_category NULLS FIRST, i_class NULLS FIRST
LIMIT 100"""

  // q51a: q51's window cumulative re-expressed as rk-triangle self-joins
  // (row_number + v1.rk >= v2.rk GROUP BY); store_sales output column renamed
  // store_sales_c as in q51 (name would shadow the table in DuckDB's scope)
  private val q51a = """
WITH web_tv AS (
  SELECT ws_item_sk item_sk, d_date,
    sum(ws_sales_price) sumws,
    row_number() OVER (PARTITION BY ws_item_sk ORDER BY d_date) rk
  FROM web_sales, date_dim
  WHERE ws_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 346 AND 349
    AND ws_item_sk IS NOT NULL
  GROUP BY ws_item_sk, d_date),
web_v1 AS (
  SELECT v1.item_sk, v1.d_date, v1.sumws, sum(v2.sumws) cume_sales
  FROM web_tv v1, web_tv v2
  WHERE v1.item_sk = v2.item_sk AND v1.rk >= v2.rk
  GROUP BY v1.item_sk, v1.d_date, v1.sumws),
store_tv AS (
  SELECT ss_item_sk item_sk, d_date,
    sum(ss_sales_price) sumss,
    row_number() OVER (PARTITION BY ss_item_sk ORDER BY d_date) rk
  FROM store_sales, date_dim
  WHERE ss_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 346 AND 349
    AND ss_item_sk IS NOT NULL
  GROUP BY ss_item_sk, d_date),
store_v1 AS (
  SELECT v1.item_sk, v1.d_date, v1.sumss, sum(v2.sumss) cume_sales
  FROM store_tv v1, store_tv v2
  WHERE v1.item_sk = v2.item_sk AND v1.rk >= v2.rk
  GROUP BY v1.item_sk, v1.d_date, v1.sumss),
v AS (
  SELECT item_sk, d_date, web_sales, store_sales_c,
    row_number() OVER (PARTITION BY item_sk ORDER BY d_date) rk
  FROM (
    SELECT
      CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk ELSE store.item_sk END item_sk,
      CASE WHEN web.d_date IS NOT NULL THEN web.d_date ELSE store.d_date END d_date,
      web.cume_sales web_sales,
      store.cume_sales store_sales_c
    FROM web_v1 web FULL OUTER JOIN store_v1 store
      ON (web.item_sk = store.item_sk AND web.d_date = store.d_date)) sub)
SELECT *
FROM (
  SELECT
    v1.item_sk, v1.d_date, v1.web_sales, v1.store_sales_c,
    max(v2.web_sales) web_cumulative,
    max(v2.store_sales_c) store_cumulative
  FROM v v1, v v2
  WHERE v1.item_sk = v2.item_sk AND v1.rk >= v2.rk
  GROUP BY v1.item_sk, v1.d_date, v1.web_sales, v1.store_sales_c) x
WHERE web_cumulative > store_cumulative
ORDER BY item_sk, d_date
LIMIT 100"""

  // q67a: q67's 8-level ROLLUP as results + 9 UNION ALL arms; keeps the
  // verbatim i_product_name/s_store_id axes and per-category rank
  private val q67a = """
WITH results AS (
  SELECT
    i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy, s_store_id,
    round(sum(coalesce(ss_sales_price * ss_quantity, 0)), 2) sumsales
  FROM store_sales, date_dim, store, item
  WHERE ss_sold_date_sk = d_date_sk
    AND ss_item_sk = i_item_sk
    AND ss_store_sk = s_store_sk
    AND d_month_seq BETWEEN 340 AND 351
  GROUP BY i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy,
    s_store_id),
results_rollup AS (
  SELECT i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy,
    s_store_id, sumsales
  FROM results
  UNION ALL
  SELECT i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy,
    NULL AS s_store_id, sum(sumsales) sumsales
  FROM results
  GROUP BY i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy
  UNION ALL
  SELECT i_category, i_class, i_brand, i_product_name, d_year, d_qoy,
    NULL AS d_moy, NULL AS s_store_id, sum(sumsales) sumsales
  FROM results
  GROUP BY i_category, i_class, i_brand, i_product_name, d_year, d_qoy
  UNION ALL
  SELECT i_category, i_class, i_brand, i_product_name, d_year,
    NULL AS d_qoy, NULL AS d_moy, NULL AS s_store_id, sum(sumsales) sumsales
  FROM results
  GROUP BY i_category, i_class, i_brand, i_product_name, d_year
  UNION ALL
  SELECT i_category, i_class, i_brand, i_product_name,
    NULL AS d_year, NULL AS d_qoy, NULL AS d_moy, NULL AS s_store_id,
    sum(sumsales) sumsales
  FROM results
  GROUP BY i_category, i_class, i_brand, i_product_name
  UNION ALL
  SELECT i_category, i_class, i_brand,
    NULL AS i_product_name, NULL AS d_year, NULL AS d_qoy, NULL AS d_moy,
    NULL AS s_store_id, sum(sumsales) sumsales
  FROM results
  GROUP BY i_category, i_class, i_brand
  UNION ALL
  SELECT i_category, i_class,
    NULL AS i_brand, NULL AS i_product_name, NULL AS d_year, NULL AS d_qoy,
    NULL AS d_moy, NULL AS s_store_id, sum(sumsales) sumsales
  FROM results
  GROUP BY i_category, i_class
  UNION ALL
  SELECT i_category,
    NULL AS i_class, NULL AS i_brand, NULL AS i_product_name, NULL AS d_year,
    NULL AS d_qoy, NULL AS d_moy, NULL AS s_store_id, sum(sumsales) sumsales
  FROM results
  GROUP BY i_category
  UNION ALL
  SELECT NULL AS i_category,
    NULL AS i_class, NULL AS i_brand, NULL AS i_product_name, NULL AS d_year,
    NULL AS d_qoy, NULL AS d_moy, NULL AS s_store_id, sum(sumsales) sumsales
  FROM results)
SELECT *
FROM (
  SELECT
    i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy,
    s_store_id, sumsales,
    rank() OVER (PARTITION BY i_category ORDER BY sumsales DESC) rk
  FROM results_rollup) dw2
WHERE rk <= 100
ORDER BY i_category NULLS FIRST, i_class NULLS FIRST, i_brand NULLS FIRST,
  i_product_name NULLS FIRST, d_year NULLS FIRST, d_qoy NULLS FIRST,
  d_moy NULLS FIRST, s_store_id NULLS FIRST, sumsales, rk
LIMIT 100"""

  // q70a: q70's grouping()-ROLLUP as UNION arms, same top-5-state rank gate
  private val q70a = """
WITH results AS (
  SELECT
    sum(ss_net_profit) AS total_sum,
    s_state, s_county,
    0 AS gstate, 0 AS g_county
  FROM store_sales, date_dim d1, store
  WHERE d1.d_month_seq BETWEEN 360 AND 360 + 11
    AND d1.d_date_sk = ss_sold_date_sk
    AND s_store_sk = ss_store_sk
    AND s_state IN (
      SELECT s_state
      FROM (
        SELECT
          s_state AS s_state,
          rank() OVER (PARTITION BY s_state ORDER BY sum(ss_net_profit) DESC) AS ranking
        FROM store_sales, store, date_dim
        WHERE d_month_seq BETWEEN 360 AND 360 + 11
          AND d_date_sk = ss_sold_date_sk
          AND s_store_sk = ss_store_sk
        GROUP BY s_state) tmp1
      WHERE ranking <= 5)
  GROUP BY s_state, s_county),
results_rollup AS (
  SELECT total_sum, s_state, s_county, 0 AS g_state, 0 AS g_county,
    0 AS lochierarchy
  FROM results
  UNION
  SELECT sum(total_sum) AS total_sum, s_state, NULL AS s_county, 0 AS g_state,
    1 AS g_county, 1 AS lochierarchy
  FROM results
  GROUP BY s_state
  UNION
  SELECT sum(total_sum) AS total_sum, NULL AS s_state, NULL AS s_county,
    1 AS g_state, 1 AS g_county, 2 AS lochierarchy
  FROM results)
SELECT
  total_sum, s_state, s_county, lochierarchy,
  rank() OVER (
    PARTITION BY lochierarchy, CASE WHEN g_county = 0 THEN s_state END
    ORDER BY total_sum DESC) AS rank_within_parent
FROM results_rollup
ORDER BY lochierarchy DESC,
  CASE WHEN lochierarchy = 0 THEN s_state END NULLS FIRST,
  rank_within_parent, s_state NULLS FIRST, s_county NULLS FIRST
LIMIT 100"""

  // q77a: q77's ROLLUP as results + 3-arm UNION; returns_amt rename as in q77
  private val q77a = """
WITH ss AS
(SELECT
    s_store_sk,
    sum(ss_ext_sales_price) AS sales,
    sum(ss_net_profit) AS profit
  FROM store_sales, date_dim, store
  WHERE ss_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
    AND ss_store_sk = s_store_sk
  GROUP BY s_store_sk),
sr AS
(SELECT
    s_store_sk,
    sum(sr_return_amt) AS returns_amt,
    sum(sr_net_loss) AS profit_loss
  FROM store_returns, date_dim, store
  WHERE sr_returned_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
    AND sr_store_sk = s_store_sk
  GROUP BY s_store_sk),
cs AS
(SELECT
    cs_call_center_sk,
    sum(cs_ext_sales_price) AS sales,
    sum(cs_net_profit) AS profit
  FROM catalog_sales, date_dim
  WHERE cs_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
  GROUP BY cs_call_center_sk),
cr AS
(SELECT
    sum(cr_return_amount) AS returns_amt,
    sum(cr_net_loss) AS profit_loss
  FROM catalog_returns, date_dim
  WHERE cr_returned_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'),
ws AS
(SELECT
    wp_web_page_sk,
    sum(ws_ext_sales_price) AS sales,
    sum(ws_net_profit) AS profit
  FROM web_sales, date_dim, web_page
  WHERE ws_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
    AND ws_web_page_sk = wp_web_page_sk
  GROUP BY wp_web_page_sk),
wr AS
(SELECT
    wp_web_page_sk,
    sum(wr_return_amt) AS returns_amt,
    sum(wr_net_loss) AS profit_loss
  FROM web_returns, date_dim, web_page
  WHERE wr_returned_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
    AND wr_web_page_sk = wp_web_page_sk
  GROUP BY wp_web_page_sk),
results AS (
  SELECT
    channel, id,
    sum(sales) AS sales,
    sum(returns) AS returns,
    sum(profit) AS profit
  FROM
    (SELECT
       'store channel' AS channel,
       ss.s_store_sk AS id,
       sales,
       coalesce(returns_amt, 0) AS returns,
       (profit - coalesce(profit_loss, 0)) AS profit
     FROM ss
       LEFT JOIN sr
         ON ss.s_store_sk = sr.s_store_sk
     UNION ALL
     SELECT
       'catalog channel' AS channel,
       cs_call_center_sk AS id,
       sales,
       returns_amt AS returns,
       (profit - profit_loss) AS profit
     FROM cs, cr
     UNION ALL
     SELECT
       'web channel' AS channel,
       ws.wp_web_page_sk AS id,
       sales,
       coalesce(returns_amt, 0) AS returns,
       (profit - coalesce(profit_loss, 0)) AS profit
     FROM ws
       LEFT JOIN wr
         ON ws.wp_web_page_sk = wr.wp_web_page_sk
    ) x
  GROUP BY channel, id)
SELECT *
FROM (
  SELECT channel, id, sales, returns, profit
  FROM results
  UNION
  SELECT channel, NULL AS id, sum(sales) AS sales, sum(returns) AS returns,
    sum(profit) AS profit
  FROM results
  GROUP BY channel
  UNION
  SELECT NULL AS channel, NULL AS id, sum(sales) AS sales, sum(returns) AS returns,
    sum(profit) AS profit
  FROM results) foo
ORDER BY channel NULLS FIRST, id NULLS FIRST
LIMIT 100"""

  // q80a: q80's ROLLUP as results + 3-arm UNION, same promo/price gates
  private val q80a = """
WITH ssr AS
(SELECT
    s_store_id AS store_id,
    sum(ss_ext_sales_price) AS sales,
    sum(coalesce(sr_return_amt, 0)) AS returns,
    sum(ss_net_profit - coalesce(sr_net_loss, 0)) AS profit
  FROM store_sales
    LEFT OUTER JOIN store_returns ON
                                    (ss_item_sk = sr_item_sk AND
                                      ss_ticket_number = sr_ticket_number)
    ,
    date_dim, store, item, promotion
  WHERE ss_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND ss_store_sk = s_store_sk
    AND ss_item_sk = i_item_sk
    AND i_current_price > 1800
    AND ss_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY s_store_id),
csr AS
(SELECT
    cp_catalog_page_id AS catalog_page_id,
    sum(cs_ext_sales_price) AS sales,
    sum(coalesce(cr_return_amount, 0)) AS returns,
    sum(cs_net_profit - coalesce(cr_net_loss, 0)) AS profit
  FROM catalog_sales
    LEFT OUTER JOIN catalog_returns ON
                                      (cs_item_sk = cr_item_sk AND
                                        cs_order_number = cr_order_number)
    ,
    date_dim, catalog_page, item, promotion
  WHERE cs_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND cs_catalog_page_sk = cp_catalog_page_sk
    AND cs_item_sk = i_item_sk
    AND i_current_price > 1800
    AND cs_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY cp_catalog_page_id),
wsr AS
(SELECT
    web_site_id,
    sum(ws_ext_sales_price) AS sales,
    sum(coalesce(wr_return_amt, 0)) AS returns,
    sum(ws_net_profit - coalesce(wr_net_loss, 0)) AS profit
  FROM web_sales
    LEFT OUTER JOIN web_returns ON
                                  (ws_item_sk = wr_item_sk AND
                                    ws_order_number = wr_order_number)
    ,
    date_dim, web_site, item, promotion
  WHERE ws_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND ws_web_site_sk = web_site_sk
    AND ws_item_sk = i_item_sk
    AND i_current_price > 1800
    AND ws_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY web_site_id),
results AS (
  SELECT
    channel, id,
    sum(sales) AS sales,
    sum(returns) AS returns,
    sum(profit) AS profit
  FROM
    (SELECT
       'store channel' AS channel,
       concat('store', store_id) AS id,
       sales, returns, profit
     FROM ssr
     UNION ALL
     SELECT
       'catalog channel' AS channel,
       concat('catalog_page', catalog_page_id) AS id,
       sales, returns, profit
     FROM csr
     UNION ALL
     SELECT
       'web channel' AS channel,
       concat('web_site', web_site_id) AS id,
       sales, returns, profit
     FROM wsr) x
  GROUP BY channel, id)
SELECT channel, id, sales, returns, profit
FROM (
  SELECT channel, id, sales, returns, profit
  FROM results
  UNION
  SELECT channel, NULL AS id, sum(sales) AS sales, sum(returns) AS returns,
    sum(profit) AS profit
  FROM results
  GROUP BY channel
  UNION
  SELECT NULL AS channel, NULL AS id, sum(sales) AS sales, sum(returns) AS returns,
    sum(profit) AS profit
  FROM results) foo
ORDER BY channel NULLS FIRST, id NULLS FIRST
LIMIT 100"""

  // q86a: q86's grouping()-ROLLUP as UNION arms with literal g_ flags
  private val q86a = """
WITH results AS (
  SELECT
    sum(ws_net_paid) AS total_sum,
    i_category, i_class,
    0 AS g_category, 0 AS g_class
  FROM web_sales, date_dim d1, item
  WHERE d1.d_month_seq BETWEEN 360 AND 360 + 11
    AND d1.d_date_sk = ws_sold_date_sk
    AND i_item_sk = ws_item_sk
  GROUP BY i_category, i_class),
results_rollup AS (
  SELECT total_sum, i_category, i_class, g_category, g_class, 0 AS lochierarchy
  FROM results
  UNION
  SELECT sum(total_sum) AS total_sum, i_category, NULL AS i_class, 0 AS g_category,
    1 AS g_class, 1 AS lochierarchy
  FROM results
  GROUP BY i_category
  UNION
  SELECT sum(total_sum) AS total_sum, NULL AS i_category, NULL AS i_class,
    1 AS g_category, 1 AS g_class, 2 AS lochierarchy
  FROM results)
SELECT
  total_sum, i_category, i_class, lochierarchy,
  rank() OVER (
    PARTITION BY lochierarchy, CASE WHEN g_class = 0 THEN i_category END
    ORDER BY total_sum DESC) AS rank_within_parent
FROM results_rollup
ORDER BY lochierarchy DESC,
  CASE WHEN lochierarchy = 0 THEN i_category END NULLS FIRST,
  rank_within_parent, i_category NULLS FIRST, i_class NULLS FIRST
LIMIT 100"""

  private val bodies: Map[String, String] = Map(
    "tpcds_q3" -> q3, "tpcds_q6" -> q6, "tpcds_q27" -> q27, "tpcds_q34" -> q34,
    "tpcds_q42" -> q42, "tpcds_q51" -> q51, "tpcds_q52" -> q52, "tpcds_q55" -> q55,
    "tpcds_q67" -> q67, "tpcds_q68" -> q68, "tpcds_q73" -> q73, "tpcds_q74" -> q74,
    "tpcds_q7" -> q7, "tpcds_q12" -> q12, "tpcds_q19" -> q19, "tpcds_q36" -> q36,
    "tpcds_q79" -> q79, "tpcds_q98" -> q98,
    "tpcds_q10" -> q10m, "tpcds_q43" -> q43, "tpcds_q46" -> q46, "tpcds_q53" -> q53,
    "tpcds_q59" -> q59, "tpcds_q63" -> q63, "tpcds_q65" -> q65, "tpcds_q89" -> q89,
    "tpcds_ss_max" -> ssMax,
    "tpcds_q1" -> q1, "tpcds_q2" -> q2, "tpcds_q9" -> q9, "tpcds_q21" -> q21,
    "tpcds_q25" -> q25, "tpcds_q29" -> q29, "tpcds_q31" -> q31, "tpcds_q37" -> q37,
    "tpcds_q50" -> q50, "tpcds_q82" -> q82, "tpcds_q88" -> q88, "tpcds_q93" -> q93,
    "tpcds_q97" -> q97,
    "tpcds_q13" -> q13, "tpcds_q15" -> q15, "tpcds_q20" -> q20, "tpcds_q22" -> q22,
    "tpcds_q32" -> q32, "tpcds_q45" -> q45, "tpcds_q48" -> q48, "tpcds_q58" -> q58,
    "tpcds_q69" -> q69, "tpcds_q86" -> q86, "tpcds_q87" -> q87, "tpcds_q96" -> q96,
    "tpcds_q5" -> q5, "tpcds_q26" -> q26, "tpcds_q30" -> q30, "tpcds_q33" -> q33,
    "tpcds_q40" -> q40, "tpcds_q56" -> q56, "tpcds_q60" -> q60, "tpcds_q61" -> q61,
    "tpcds_q71" -> q71, "tpcds_q77" -> q77, "tpcds_q78" -> q78, "tpcds_q80" -> q80,
    "tpcds_q81" -> q81, "tpcds_q83" -> q83, "tpcds_q85" -> q85, "tpcds_q91" -> q91,
    "tpcds_q92" -> q92,
    "tpcds_q4" -> q4, "tpcds_q11" -> q11, "tpcds_q16" -> q16, "tpcds_q17" -> q17,
    "tpcds_q18" -> q18, "tpcds_q28" -> q28, "tpcds_q35" -> q35, "tpcds_q38" -> q38,
    "tpcds_q39a" -> q39a, "tpcds_q39b" -> q39b, "tpcds_q44" -> q44, "tpcds_q47" -> q47, "tpcds_q49" -> q49,
    "tpcds_q57" -> q57, "tpcds_q62" -> q62, "tpcds_q70" -> q70, "tpcds_q75" -> q75,
    "tpcds_q90" -> q90, "tpcds_q94" -> q94, "tpcds_q99" -> q99,
    "tpcds_q8" -> q8, "tpcds_q41" -> q41, "tpcds_q54" -> q54, "tpcds_q66" -> q66,
    "tpcds_q72" -> q72, "tpcds_q84" -> q84, "tpcds_q95" -> q95,
    "tpcds_q14a" -> q14a, "tpcds_q14b" -> q14b, "tpcds_q23a" -> q23a,
    "tpcds_q23b" -> q23b, "tpcds_q24a" -> q24a, "tpcds_q24b" -> q24b,
    "tpcds_q64" -> q64, "tpcds_q76" -> q76,
    "tpcds_q5a" -> q5a, "tpcds_q10a" -> q10a, "tpcds_q18a" -> q18a,
    "tpcds_q22a" -> q22a, "tpcds_q27a" -> q27a, "tpcds_q35a" -> q35a,
    "tpcds_q36a" -> q36a, "tpcds_q51a" -> q51a, "tpcds_q67a" -> q67a,
    "tpcds_q70a" -> q70a, "tpcds_q77a" -> q77a, "tpcds_q80a" -> q80a,
    "tpcds_q86a" -> q86a,
    "tpcds_q14_v27" -> q14V27, "tpcds_q24_v27" -> q24V27)

  /** Multi-referenced CTEs worth materializing: query key -> (the query's front CTEs
    * as (cte alias, materialized view name) pairs, official final SELECT). Each view
    * is DISTINCTLY named — two queries' year_totals have different schemas, and a
    * shared temp-view name would let one query's registration serve the other
    * wrong columns — but queries sharing IDENTICAL CTE text (q14a/q14b) share one
    * view. Grouped into one auxiliary star PER FAMILY (see [[mvStars]]) so a family's
    * first touch builds only its own views. */
  private val materializedCtes: Map[String, (Seq[(String, String)], String)] = Map(
    "tpcds_q74"     -> ((Seq("year_total" -> "year_total_q74"), q74Select)),
    "tpcds_q4"      -> ((Seq("year_total" -> "year_total_q4"), q4Select)),
    "tpcds_q14a"    -> ((Seq("cross_items" -> "cross_items_q14",
                             "avg_sales" -> "avg_sales_q14"), q14aSelect)),
    "tpcds_q14b"    -> ((Seq("cross_items" -> "cross_items_q14",
                             "avg_sales" -> "avg_sales_q14"), q14bSelect)),
    "tpcds_q14_v27" -> ((Seq("cross_items" -> "cross_items_q14v27",
                             "avg_sales" -> "avg_sales_q14v27"), q14V27Select)),
    "tpcds_q23a"    -> ((Seq("frequent_ss_items" -> "frequent_ss_items_q23",
                             "best_ss_customer" -> "best_ss_customer_q23"), q23aSelect)),
    "tpcds_q23b"    -> ((Seq("frequent_ss_items" -> "frequent_ss_items_q23",
                             "best_ss_customer" -> "best_ss_customer_q23"), q23bSelect)),
    "tpcds_q64"     -> ((Seq("cross_sales" -> "cross_sales_q64"), q64Select)))

  /** Complete defining query per materialized view. Most are a single wrapped CTE
    * body; a view whose CTE references a SIBLING CTE inlines that dependency here
    * (best_ss_customer_q23 carries max_store_sales — the scalar gate feeds only its
    * HAVING, so it is never materialized on its own). */
  private val mvDefiningSql: Map[String, String] = {
    def wrap(v: String, cte: String) = s"WITH $v AS ($cte)\nSELECT * FROM $v"
    Map(
      "year_total_q74"        -> wrap("year_total_q74", q74YearTotalCte),
      "year_total_q4"         -> wrap("year_total_q4", q4YearTotalCte),
      "cross_items_q14"       -> wrap("cross_items_q14", q14CrossItemsCte),
      "avg_sales_q14"         -> wrap("avg_sales_q14", q14AvgSalesCte),
      "cross_items_q14v27"    -> wrap("cross_items_q14v27", q14V27CrossItemsCte),
      "avg_sales_q14v27"      -> wrap("avg_sales_q14v27", q14V27AvgSalesCte),
      "frequent_ss_items_q23" -> wrap("frequent_ss_items_q23", q23FrequentCte),
      "best_ss_customer_q23"  ->
        s"""WITH max_store_sales AS ($q23MaxSalesCte),
           |best_ss_customer_q23 AS ($q23BestCustomerCte)
           |SELECT * FROM best_ss_customer_q23""".stripMargin,
      "cross_sales_q64"       ->
        s"""WITH cs_ui AS ($q64CsUiCte),
           |cross_sales_q64 AS ($q64CrossSalesCte)
           |SELECT * FROM cross_sales_q64""".stripMargin)
  }

  /** One StarCache star per query FAMILY — a family's first touch builds only its
    * own views (q74 must not pay the q14/q23 fact scans it will never read). */
  private val mvStars: Map[String, Seq[String]] = Map(
    "tpcds_yt"      -> Seq("year_total_q4", "year_total_q74"),
    "tpcds_q14mv"   -> Seq("avg_sales_q14", "cross_items_q14"),
    "tpcds_q14v2mv" -> Seq("avg_sales_q14v27", "cross_items_q14v27"),
    "tpcds_q23mv"   -> Seq("best_ss_customer_q23", "frequent_ss_items_q23"),
    "tpcds_q64mv"   -> Seq("cross_sales_q64"))

  private val starOfView: Map[String, String] =
    mvStars.flatMap { case (s, vs) => vs.map(_ -> s) }

  /** Self-contained defining SQL per materialized CTE view (built through the full
    * star prefix, like every other star view). */
  private[graft] def ytViewSql(v: String): String =
    splice(prefix(spark = true), mvDefiningSql(v))

  val all: Map[String, (SparkSession, String) => DataFrame] =
    bodies.map { case (name, body) =>
      name -> { (s: SparkSession, dir: String) =>
        TableIO.registerAll(s, dir)
        // Star-as-data-at-rest: materialize the derived views once per data dir (see
        // StarCache) and run the verbatim body against the parquet-backed temp views;
        // any materialization failure falls back to inlining the CTE prefix — the
        // result is identical either way, only the physical access path differs.
        if (graft.sources.StarCache.tryEnsure(s, dir, "tpcds", viewNames, viewSql)) {
          // q4/q74 (year_total, 6x/4x-referenced) and the q14 family (cross_items +
          // avg_sales, re-inlined once per channel block): a multi-referenced CTE
          // inlines into one full computation PER REFERENCE — q14a's AQE-final plan
          // carried 68 parquet scans / 60 exchanges with only 15 reused. Serve them
          // from StarCache materializations instead (one pass per source stamp;
          // year_total additionally customer_id-bucketed so the self-joins arrive
          // co-partitioned — see the q74YearTotalCte note). The executed text is the
          // official SELECT under pure aliasing CTEs; fail-soft to the intact
          // verbatim body.
          materializedCtes.get(name) match {
            case Some((aliases, select))
              if {
                val star = starOfView(aliases.head._2)
                graft.sources.StarCache.tryEnsure(s, dir, star, mvStars(star), ytViewSql)
              } =>
              val withClause = aliases
                .map { case (a, v) => s"$a AS (SELECT * FROM $v)" }
                .mkString("WITH ", ", ", "")
              s.sql(withClause + select)
            case _ => s.sql(body)
          }
        } else s.sql(splice(prefix(spark = true), body))
      }
    }

  val oracles: Map[String, String] =
    bodies.map { case (name, body) => name -> splice(prefix(spark = false), body) }
}
