package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * One query per expression family in the reference's kernel inventory
 * (gazelle_plugin: native-sql-engine/core/src/main/scala/com/intel/oap/expression/ —
 * ColumnarArithmetic, ColumnarCaseWhenOperator, ColumnarInOperator,
 * ColumnarString2TrimOperator, ColumnarRegexp, ColumnarDateTimeExpressions,
 * ColumnarHashExpression, ColumnarRoundOperator, ColumnarHashAggregation).
 *
 * Gazelle implemented each as a Gandiva/C++ kernel; graft uses Spark's codegen'd builtins
 * (org.apache.spark.sql.functions._) which compile into the same whole-stage-codegen loop.
 * Each query is oracle-checked against DuckDB, with dialect differences (dayofweek origin,
 * double->int cast rounding) normalized in the oracle SQL, not in the Spark plan.
 */
object ExpressionQueries {

  /**
   * #30 arithmetic + math kernels. Aggregated to one row: per-row transcendental output
   * (exp/ln) can differ from DuckDB by 1 ulp and per-row round() differs on decimal-half
   * ties, but a rounded SUM absorbs both (relative error ~1e-12 against a 1e-2 round grain).
   * Integer arithmetic stays exact either way.
   */
  def qMath(spark: SparkSession, dir: String): DataFrame =
    TableIO.part(spark, dir)
      .agg(
        sum(col("p_size") + 3).as("sum_add"),
        sum(col("p_size") - 1).as("sum_sub"),
        sum(col("p_size") * 2).as("sum_mul"),
        round(sum(col("p_retailprice") / 3.0), 2).as("sum_div"),
        sum(col("p_size") % 5).as("sum_mod"),
        sum(abs(col("p_size") - 25)).as("sum_abs"),
        round(sum(sqrt(col("p_retailprice"))), 2).as("sum_sqrt"),
        round(sum(pow(col("p_size"), 2)), 2).as("sum_pow2"),
        round(sum(exp(col("p_size") / 50.0)), 2).as("sum_exp"),
        round(sum(log(col("p_retailprice") + 1.0)), 2).as("sum_ln"),
        sum(ceil(col("p_retailprice"))).as("sum_ceil"),
        sum(floor(col("p_retailprice"))).as("sum_floor"))

  val qMathSql: String =
    """SELECT
      |  CAST(sum(p_size + 3) AS BIGINT) AS sum_add,
      |  CAST(sum(p_size - 1) AS BIGINT) AS sum_sub,
      |  CAST(sum(p_size * 2) AS BIGINT) AS sum_mul,
      |  round(sum(p_retailprice / 3.0), 2) AS sum_div,
      |  CAST(sum(p_size % 5) AS BIGINT) AS sum_mod,
      |  CAST(sum(abs(p_size - 25)) AS BIGINT) AS sum_abs,
      |  round(sum(sqrt(p_retailprice)), 2) AS sum_sqrt,
      |  round(sum(pow(p_size, 2)), 2) AS sum_pow2,
      |  round(sum(exp(p_size / 50.0)), 2) AS sum_exp,
      |  round(sum(ln(p_retailprice + 1.0)), 2) AS sum_ln,
      |  CAST(sum(ceil(p_retailprice)) AS BIGINT) AS sum_ceil,
      |  CAST(sum(floor(p_retailprice)) AS BIGINT) AS sum_floor
      |FROM part""".stripMargin

  /** #32a case/when + if. */
  def qCaseWhen(spark: SparkSession, dir: String): DataFrame =
    TableIO.orders(spark, dir).select(
      col("o_orderkey"),
      when(col("o_totalprice") > 300000.0, "large")
        .when(col("o_totalprice") > 100000.0, "medium")
        .otherwise("small").as("size_class"),
      when(col("o_orderstatus") === "F", 1).otherwise(0).as("is_final"))

  val qCaseWhenSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 300000.0 THEN 'large'
      |       WHEN o_totalprice > 100000.0 THEN 'medium'
      |       ELSE 'small' END AS size_class,
      |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_final
      |FROM orders""".stripMargin

  /** #32b coalesce / nullif / isnull (nulls manufactured — the base tables are non-null). */
  def qCoalesceExpr(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_or_none"),
      isnull(nullif(col("l_linestatus"), lit("O"))).as("was_o"))

  val qCoalesceExprSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
      |  nullif(l_linestatus, 'O') IS NULL AS was_o
      |FROM lineitem""".stripMargin

  /** #33 IN / InSet (long list → InSet optimization in Catalyst). */
  def qInFilter(spark: SparkSession, dir: String): DataFrame =
    TableIO.part(spark, dir)
      .filter(col("p_brand").isin("Brand#1", "Brand#5", "Brand#9", "Brand#13", "Brand#17") &&
        col("p_size").isin(1, 2, 3, 5, 8, 13, 21, 34))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))

  val qInFilterSql: String =
    """SELECT p_partkey, p_brand, p_size FROM part
      |WHERE p_brand IN ('Brand#1','Brand#5','Brand#9','Brand#13','Brand#17')
      |  AND p_size IN (1,2,3,5,8,13,21,34)""".stripMargin

  /** #34/#40 string kernels. */
  def qStringFuncs(spark: SparkSession, dir: String): DataFrame =
    TableIO.customer(spark, dir).select(
      col("c_custkey"),
      upper(col("c_mktsegment")).as("seg_up"),
      lower(col("c_name")).as("name_lo"),
      length(col("c_name")).as("name_len"),
      substring(col("c_name"), 10, 9).as("digits"),
      concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
      trim(lit("  pad  ")).as("trimmed"),
      ltrim(lit("  pad")).as("l_trimmed"),
      rtrim(lit("pad  ")).as("r_trimmed"),
      lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
      rpad(col("c_mktsegment"), 12, ".").as("rpadded"),
      reverse(col("c_mktsegment")).as("rev_seg"),
      regexp_replace(col("c_name"), "0", "_").as("subbed"),
      translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"))

  val qStringFuncsSql: String =
    """SELECT c_custkey,
      |  upper(c_mktsegment) AS seg_up,
      |  lower(c_name) AS name_lo,
      |  length(c_name) AS name_len,
      |  substr(c_name, 10, 9) AS digits,
      |  concat_ws('|', c_mktsegment, c_name) AS joined,
      |  trim('  pad  ') AS trimmed,
      |  ltrim('  pad') AS l_trimmed,
      |  rtrim('pad  ') AS r_trimmed,
      |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
      |  rpad(c_mktsegment, 12, '.') AS rpadded,
      |  reverse(c_mktsegment) AS rev_seg,
      |  replace(c_name, '0', '_') AS subbed,
      |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated
      |FROM customer""".stripMargin

  /** #35 LIKE / RLIKE / regexp_extract / split + instr. */
  def qLikeRegex(spark: SparkSession, dir: String): DataFrame =
    TableIO.part(spark, dir)
      .filter(col("p_name").like("%re%") || col("p_name").rlike("^s.*l"))
      .select(
        col("p_partkey"), col("p_name"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        size(split(col("p_name"), " ")).as("n_words"),
        instr(col("p_name"), "e").as("first_e"))

  val qLikeRegexSql: String =
    """SELECT p_partkey, p_name,
      |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
      |  len(string_split(p_name, ' ')) AS n_words,
      |  instr(p_name, 'e') AS first_e
      |FROM part
      |WHERE p_name LIKE '%re%' OR regexp_matches(p_name, '^s.*l')""".stripMargin

  /** #36a date part extraction. DuckDB dayofweek is 0-based Sunday; Spark is 1-based — normalized in oracle. */
  def qDateFuncs(spark: SparkSession, dir: String): DataFrame =
    TableIO.orders(spark, dir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("d"),
      quarter(col("o_orderdate")).as("q"),
      dayofweek(col("o_orderdate")).as("dow"),
      date_add(col("o_orderdate"), 30).as("plus30"),
      datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("days_to_2002"),
      last_day(col("o_orderdate")).as("month_end"))

  val qDateFuncsSql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS d,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
      |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
      |  CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_2002,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end
      |FROM orders""".stripMargin

  /** #34b second string family: search/slice/case/char ops (reference ColumnarTernaryOperator,
    * StringLocate/SubstringIndex/StartsWith/Contains kernels). */
  def qStringFuncs2(spark: SparkSession, dir: String): DataFrame =
    TableIO.customer(spark, dir).select(
      col("c_custkey"),
      locate("0", col("c_name")).as("pos0"),
      instr(col("c_name"), "1").as("pos1"),
      substring_index(col("c_name"), "0", 1).as("before_first_0"),
      col("c_name").startsWith("Customer").cast("int").as("is_cust"),
      col("c_name").endsWith("7").cast("int").as("ends7"),
      col("c_name").contains("42").cast("int").as("has42"),
      initcap(lower(col("c_mktsegment"))).as("seg_title"),
      ascii(col("c_mktsegment")).as("first_code"),
      chr(lit(65) + (col("c_custkey") % 26)).as("bucket_chr"),
      repeat(lit("ab"), 3).as("rep"),
      levenshtein(col("c_name"), col("c_mktsegment")).as("edit_dist"),
      expr("left(c_name, 8)").as("l8"),
      expr("right(c_name, 4)").as("r4"))

  val qStringFuncs2Sql: String =
    """SELECT c_custkey,
      |  CAST(strpos(c_name, '0') AS INT) AS pos0,
      |  CAST(strpos(c_name, '1') AS INT) AS pos1,
      |  split_part(c_name, '0', 1) AS before_first_0,
      |  CAST(starts_with(c_name, 'Customer') AS INT) AS is_cust,
      |  CAST(ends_with(c_name, '7') AS INT) AS ends7,
      |  CAST(contains(c_name, '42') AS INT) AS has42,
      |  concat(upper(substr(lower(c_mktsegment), 1, 1)), substr(lower(c_mktsegment), 2)) AS seg_title,
      |  CAST(ascii(c_mktsegment) AS INT) AS first_code,
      |  chr(CAST(65 + c_custkey % 26 AS INT)) AS bucket_chr,
      |  repeat('ab', 3) AS rep,
      |  CAST(levenshtein(c_name, c_mktsegment) AS INT) AS edit_dist,
      |  left(c_name, 8) AS l8,
      |  right(c_name, 4) AS r4
      |FROM customer""".stripMargin

  /** #34c URL parsing (reference ParseUrl/ColumnarURLDecoder): parse_url fields checked
    * against the ground truth of a URL constructed from table columns. */
  def qUrlFuncs(spark: SparkSession, dir: String): DataFrame = {
    val url = concat(lit("https://ex.com/seg/"), col("c_mktsegment"),
      lit("?k="), col("c_custkey").cast("string"))
    TableIO.customer(spark, dir).select(
      col("c_custkey"),
      parse_url(url, lit("HOST")).as("host"),
      parse_url(url, lit("PATH")).as("path"),
      parse_url(url, lit("QUERY")).as("query"),
      parse_url(url, lit("QUERY"), lit("k")).as("k_val"),
      url_decode(url_encode(col("c_name"))).as("rt_name"))
  }

  val qUrlFuncsSql: String =
    """SELECT c_custkey,
      |  'ex.com' AS host,
      |  '/seg/' || c_mktsegment AS path,
      |  'k=' || CAST(c_custkey AS VARCHAR) AS query,
      |  CAST(c_custkey AS VARCHAR) AS k_val,
      |  c_name AS rt_name
      |FROM customer""".stripMargin

  /** #30b bitwise kernels (reference ShiftLeft/ShiftRight + bitwise binary ops). */
  def qBitwise(spark: SparkSession, dir: String): DataFrame =
    TableIO.customer(spark, dir).select(
      col("c_custkey"),
      shiftleft(col("c_custkey"), 3).as("shl3"),
      shiftright(col("c_custkey"), 2).as("shr2"),
      (col("c_custkey").bitwiseAND(lit(255L))).as("and255"),
      (col("c_custkey").bitwiseOR(lit(4096L))).as("or4096"),
      (col("c_custkey").bitwiseXOR(lit(1023L))).as("xor1023"),
      expr("~c_custkey").as("flipped"),
      expr("bit_count(c_custkey)").as("popcnt"))

  val qBitwiseSql: String =
    """SELECT c_custkey,
      |  c_custkey << 3 AS shl3,
      |  c_custkey >> 2 AS shr2,
      |  c_custkey & 255 AS and255,
      |  c_custkey | 4096 AS or4096,
      |  xor(c_custkey, 1023) AS xor1023,
      |  ~c_custkey AS flipped,
      |  CAST(bit_count(c_custkey) AS INT) AS popcnt
      |FROM customer""".stripMargin

  /** #36c time-of-day parts on microsecond timestamps (reference Hour/Minute/Second kernels). */
  def qTimeParts(spark: SparkSession, dir: String): DataFrame =
    TableIO.events(spark, dir).select(
      col("event_id"),
      hour(col("ts")).as("h"),
      minute(col("ts")).as("mi"),
      second(col("ts")).as("s"),
      dayofyear(col("ts")).as("doy"),
      weekofyear(col("ts")).as("woy"))

  val qTimePartsSql: String =
    """SELECT event_id,
      |  CAST(hour(ts) AS INT) AS h,
      |  CAST(minute(ts) AS INT) AS mi,
      |  CAST(second(ts) AS INT) AS s,
      |  CAST(dayofyear(ts) AS INT) AS doy,
      |  CAST(weekofyear(ts) AS INT) AS woy
      |FROM events""".stripMargin

  /** #36b date_trunc to month/week buckets + aggregation. */
  def qDateTrunc(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir)
      .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("ship_month"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .orderBy(col("ship_month"))

  val qDateTruncSql: String =
    """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
      |  count(*) AS n, round(sum(l_quantity), 2) AS qty
      |FROM lineitem GROUP BY 1 ORDER BY ship_month""".stripMargin

  /** #36c unix epoch round-trip (events table carries sub-second timestamps). */
  def qUnixTime(spark: SparkSession, dir: String): DataFrame =
    TableIO.events(spark, dir)
      .filter(col("event_id") < 100)
      .select(
        col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        from_unixtime(unix_timestamp(col("ts")), "yyyy-MM-dd HH:mm:ss").as("ts_str"))

  val qUnixTimeSql: String =
    """SELECT event_id,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
      |  strftime(CAST(to_timestamp(floor(epoch(ts))) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str
      |FROM events WHERE event_id < 100""".stripMargin

  /**
   * #35c MapType kernels: construction, key lookup, keys/values extraction, size,
   * map_from_entries — the MAP column type from the reference's support matrix
   * (docs/operators.md type columns). Oracle checks against ground truth reconstructed
   * from the source columns (the q_json_funcs trick), so Spark's map round-trip is what
   * is proven.
   */
  def qMapFuncs(spark: SparkSession, dir: String): DataFrame = {
    val m = map(col("o_orderstatus"), col("o_totalprice"),
      lit("priority_len"), length(col("o_orderpriority")).cast("double"))
    TableIO.orders(spark, dir).select(
      col("o_orderkey"),
      element_at(m, col("o_orderstatus")).as("price_via_map"),
      element_at(m, "priority_len").as("prio_len_via_map"),
      size(m).as("map_size"),
      array_join(map_keys(m), ",").as("keys_joined"),
      element_at(map_from_entries(array(
        struct(lit("k").as("key"), col("o_custkey").as("value")))), "k").as("cust_via_entries"))
  }

  val qMapFuncsSql: String =
    """SELECT o_orderkey,
      |  o_totalprice AS price_via_map,
      |  CAST(length(o_orderpriority) AS DOUBLE) AS prio_len_via_map,
      |  2 AS map_size,
      |  o_orderstatus || ',priority_len' AS keys_joined,
      |  o_custkey AS cust_via_entries
      |FROM orders""".stripMargin

  /** #30b base-conversion + sub-second epoch kernels (the reference's Hex/Conv and
    * MicrosToTimestamp/UnixMicros unary operators — ColumnarUnaryOperator.scala). */
  def qConvFuncs(spark: SparkSession, dir: String): DataFrame =
    TableIO.events(spark, dir).filter(col("event_id") < 2000).select(
      col("event_id"),
      hex(col("event_id")).as("hex_id"),
      conv(col("event_id").cast("string"), 10, 2).as("bin_id"),
      unix_micros(col("ts")).as("epoch_us"),
      unix_millis(col("ts")).as("epoch_ms"))

  val qConvFuncsSql: String =
    """SELECT event_id, to_hex(event_id) AS hex_id, bin(event_id) AS bin_id,
      |  epoch_us(ts) AS epoch_us, epoch_ms(ts) AS epoch_ms
      |FROM events WHERE event_id < 2000""".stripMargin

  /** #37 hash kernels (md5/sha2-256 — DuckDB 1.0 lacks sha1/crc32; murmur3/xxhash are spec-tested). */
  def qHashFuncs(spark: SparkSession, dir: String): DataFrame =
    TableIO.documents(spark, dir).select(
      col("doc_id"),
      md5(col("text")).as("md5_hex"),
      sha2(col("text"), 256).as("sha256_hex"))

  val qHashFuncsSql: String =
    "SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex FROM documents"

  /**
   * #37b the hash kernels DuckDB 1.0 CANNOT oracle (sha1, crc32, murmur3 `hash`,
   * xxhash64): rows-only for the driver; HashKatSpec pins each function to published
   * known-answer test vectors (RFC 3174 sha1, CRC-32/ISO-HDLC, Spark's own murmur3 seed),
   * so the coverage claim rests on standards, not just "it ran".
   */
  def qHashFuncs2(spark: SparkSession, dir: String): DataFrame =
    TableIO.documents(spark, dir).select(
      col("doc_id"),
      sha1(col("text")).as("sha1_hex"),
      crc32(col("text")).as("crc32_val"),
      hash(col("text")).as("murmur3_val"),
      xxhash64(col("text")).as("xxhash64_val"))

  /** #38 cast kernels (double->int via explicit trunc: Spark truncates, DuckDB rounds).
    * The decimal cast is stringified at the edge: the driver's hash is sensitive to the
    * decimal's physical width (Spark DECIMAL(12,2) vs DuckDB's storage class), so both
    * engines render the identical decimal value to text — the cast itself is still what
    * is being proven. */
  def qCasts(spark: SparkSession, dir: String): DataFrame =
    TableIO.customer(spark, dir).select(
      col("c_custkey"),
      col("c_acctbal").cast("int").as("bal_int"),
      col("c_custkey").cast("string").as("key_str"),
      col("c_custkey").cast("double").as("key_dbl"),
      substring(col("c_name"), 10, 9).cast("long").as("name_num"),
      col("c_acctbal").cast("decimal(12,2)").cast("string").as("bal_dec"))

  val qCastsSql: String =
    """SELECT c_custkey,
      |  CAST(trunc(c_acctbal) AS INT) AS bal_int,
      |  CAST(c_custkey AS VARCHAR) AS key_str,
      |  CAST(c_custkey AS DOUBLE) AS key_dbl,
      |  CAST(substr(c_name, 10, 9) AS BIGINT) AS name_num,
      |  CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS bal_dec
      |FROM customer""".stripMargin

  /** #39a aggregate kernels incl. stddev/variance/first-deterministic. */
  def qAggStats(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_q"),
        round(avg(col("l_quantity")), 6).as("avg_q"),
        round(min(col("l_extendedprice")), 2).as("min_p"),
        round(max(col("l_extendedprice")), 2).as("max_p"),
        round(stddev_samp(col("l_quantity")), 6).as("sd_q"),
        round(var_samp(col("l_quantity")), 6).as("var_q"))
      .orderBy(col("l_returnflag"))

  val qAggStatsSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  round(sum(l_quantity), 2) AS sum_q,
      |  round(avg(l_quantity), 6) AS avg_q,
      |  round(min(l_extendedprice), 2) AS min_p,
      |  round(max(l_extendedprice), 2) AS max_p,
      |  round(stddev_samp(l_quantity), 6) AS sd_q,
      |  round(var_samp(l_quantity), 6) AS var_q
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** #39b distinct aggregates (two-phase distinct agg at scale). */
  def qCountDistinct(spark: SparkSession, dir: String): DataFrame =
    // fanOut: the multi-distinct Expand (x3 row duplication) must not run on the single
    // split a small parquet arrives as; no-op at production split counts
    TableIO.fanOut(TableIO.lineitem(spark, dir))
      .groupBy(col("l_linestatus"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_linestatus"))

  val qCountDistinctSql: String =
    """SELECT l_linestatus,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /**
   * #34d JSON kernels: to_json serialization, get_json_object path extraction, from_json
   * schema-ful parsing. Oracle checks against ground truth reconstructed from the source
   * columns (same trick as q_url_funcs), so Spark's JSON round-trip is what's proven.
   */
  def qJsonFuncs(spark: SparkSession, dir: String): DataFrame = {
    val js = to_json(struct(col("o_orderkey").as("k"), col("o_orderstatus").as("s")))
    TableIO.orders(spark, dir).select(
      col("o_orderkey"),
      js.as("json"),
      get_json_object(js, "$.s").as("status_from_json"),
      get_json_object(js, "$.k").cast("bigint").as("key_from_json"),
      from_json(js, org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, s STRING"))
        .getField("s").as("parsed_s"))
  }

  val qJsonFuncsSql: String =
    """SELECT o_orderkey,
      |  '{"k":' || o_orderkey || ',"s":"' || o_orderstatus || '"}' AS json,
      |  o_orderstatus AS status_from_json,
      |  o_orderkey AS key_from_json,
      |  o_orderstatus AS parsed_s
      |FROM orders""".stripMargin

  /**
   * #34e array/struct kernels: construction, element access, membership, sorting,
   * aggregation over in-row arrays (the reference's ArrayType support surface).
   */
  def qArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val arr = array(col("o_orderkey"), col("o_custkey"), col("o_orderkey") + col("o_custkey"))
    TableIO.orders(spark, dir).select(
      col("o_orderkey"),
      size(arr).as("n"),
      element_at(arr, 2).as("second"),
      array_contains(arr, col("o_custkey")).as("has_cust"),
      sort_array(arr, asc = false).getItem(0).as("largest"),
      array_max(arr).as("amax"),
      array_min(arr).as("amin"),
      struct(col("o_orderstatus").as("st"), col("o_orderpriority").as("pri"))
        .getField("pri").as("pri_field"))
  }

  val qArrayFuncsSql: String =
    """SELECT o_orderkey,
      |  CAST(len([o_orderkey, o_custkey, o_orderkey + o_custkey]) AS INT) AS n,
      |  o_custkey AS second,
      |  list_contains([o_orderkey, o_custkey, o_orderkey + o_custkey], o_custkey) AS has_cust,
      |  list_sort([o_orderkey, o_custkey, o_orderkey + o_custkey], 'DESC')[1] AS largest,
      |  list_max([o_orderkey, o_custkey, o_orderkey + o_custkey]) AS amax,
      |  list_min([o_orderkey, o_custkey, o_orderkey + o_custkey]) AS amin,
      |  o_orderpriority AS pri_field
      |FROM orders""".stripMargin

  /**
   * #39f collection aggregates (collect_list/collect_set — the ObjectHashAggregate/
   * SortAggregate path, since their buffers aren't mutable-fixed-width). Lists sorted and
   * stringified at the edge so the oracle compare is order-stable.
   */
  def qCollectList(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 100)
      .groupBy(col("l_orderkey"))
      .agg(
        concat_ws(",", transform(sort_array(collect_list(col("l_linenumber"))),
          x => x.cast("string"))).as("lines"),
        concat_ws(",", sort_array(collect_set(col("l_returnflag")))).as("flags"))
      .orderBy(col("l_orderkey"))

  val qCollectListSql: String =
    """SELECT l_orderkey,
      |  array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
      |  array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
      |FROM lineitem WHERE l_orderkey <= 100
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /**
   * #38b decimal-exact money arithmetic: cast to DECIMAL(18,2) BEFORE aggregating, so
   * sum/min/max are exact (no double rounding drift) — the way a money pipeline should
   * aggregate. Aggregates are computed IN decimal and rendered to text only at the
   * comparison edge: Spark's sum(DECIMAL(18,2)) is DECIMAL(28,2) while DuckDB's is
   * DECIMAL(38,2) — identical values, different physical widths, so the driver's
   * representation-level hash needs both sides stringified.
   */
  def qDecimalAgg(spark: SparkSession, dir: String): DataFrame =
    TableIO.orders(spark, dir)
      .withColumn("price_dec", col("o_totalprice").cast("decimal(18,2)"))
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(col("price_dec")).cast("string").as("total_dec"),
        min(col("price_dec")).cast("string").as("min_dec"),
        max(col("price_dec")).cast("string").as("max_dec"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  val qDecimalAggSql: String =
    """SELECT o_orderstatus,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS total_dec,
      |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS min_dec,
      |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS max_dec,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /**
   * #38c decimal average, restored with an exactly-comparable oracle. Spark's
   * avg(DECIMAL(18,2)) is exact decimal arithmetic (result DECIMAL(22,6), HALF_UP at
   * scale 6); DuckDB's avg over decimal routes through DOUBLE, so the two are not
   * directly hash-comparable. Both sides therefore compute the average as an EXACT
   * integer quotient in micro-units — sum(cents) * 10000 div n — which is pure 64-bit
   * integer math in both engines (orders cents sum ≈ 2.6e10 at sf1, ×10⁴ well under
   * 2⁶³). Spark's native decimal avg is additionally proven against the same quotient
   * in DecimalSpec (exact within 1 micro-unit rounding).
   */
  def qDecimalAvg(spark: SparkSession, dir: String): DataFrame =
    TableIO.orders(spark, dir)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("(sum(cents) * 10000) div count(*)").as("avg_micro"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  val qDecimalAvgSql: String =
    """SELECT o_orderstatus,
      |  CAST((sum(CAST(round(o_totalprice * 100) AS BIGINT)) * 10000) // count(*) AS BIGINT) AS avg_micro,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** #8d pivot (conditional cross-tab — lowers to the same hash-agg + CASE shape the
    * oracle spells out; explicit value list keeps output columns deterministic). */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(col("l_extendedprice")), 2))
      .withColumnRenamed("F", "rev_f").withColumnRenamed("O", "rev_o")
      .select(col("l_returnflag"),
        coalesce(col("rev_f"), lit(0.0)).as("rev_f"),
        coalesce(col("rev_o"), lit(0.0)).as("rev_o"))
      .orderBy(col("l_returnflag"))

  val qPivotSql: String =
    """SELECT l_returnflag,
      |  coalesce(round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END), 2), 0.0) AS rev_f,
      |  coalesce(round(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END), 2), 0.0) AS rev_o
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** #39e correlated/argmax aggregate kernels (corr, covar, min_by/max_by == arg_min/arg_max). */
  def qAggStats2(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"),
        // the ordering key is the (price, orderkey) PAIR: argmin/argmax over a value with
        // ties is engine-arbitrary (the sf1 rehearsal's replicated corpus hit exactly
        // that — identical extreme prices in every replica), and min_by over a struct
        // makes the winner total-ordered on both engines
        min_by(col("l_orderkey"),
          struct(col("l_extendedprice"), col("l_orderkey"))).as("cheapest_order"),
        max_by(col("l_orderkey"),
          struct(col("l_extendedprice"), col("l_orderkey"))).as("priciest_order"))
      .orderBy(col("l_returnflag"))

  // DuckDB 1.0's arg_min rejects struct ordering keys; lexicographic struct MIN/MAX with
  // field extraction is the same total order
  val qAggStats2Sql: String =
    """SELECT l_returnflag,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
      |  round(covar_samp(l_quantity, l_discount), 6) AS cov_qd,
      |  min(struct_pack(p := l_extendedprice, k := l_orderkey)).k AS cheapest_order,
      |  max(struct_pack(p := l_extendedprice, k := l_orderkey)).k AS priciest_order
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /**
   * #39c exact interpolated percentiles (Spark `percentile` == DuckDB `quantile_cont`).
   * At 100 TB prefer `approx_percentile` (t-digest, one pass, mergeable) — proven within
   * tolerance of this exact form in a spec since approx sketches can't hash-match an
   * oracle.
   */
  def qPercentile(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_q"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_q"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99_price"))
      .orderBy(col("l_returnflag"))

  val qPercentileSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_q,
      |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_q,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** #72d-scale: the SAME exact percentiles via distributed sort + rank selection
    * (operators.Percentiles.exactBySort) — no per-group value buffering, the form that
    * survives 100 TB. One sort pass: all three quantiles ride one ranked frame. */
  def qPercentileSort(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Percentiles.exactBySort(
        TableIO.lineitem(spark, dir), Seq("l_returnflag"), "l_quantity", Seq(0.5, 0.9, 0.99))
      .groupBy(col("l_returnflag"))
      .agg(
        round(min(when(col("q") === 0.5, col("value"))), 4).as("p50_q"),
        round(min(when(col("q") === 0.9, col("value"))), 4).as("p90_q"),
        round(min(when(col("q") === 0.99, col("value"))), 4).as("p99_q"))
      .orderBy(col("l_returnflag"))

  val qPercentileSortSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_q,
      |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_q,
      |  round(quantile_cont(l_quantity, 0.99), 4) AS p99_q
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /**
   * `q_equidepth_bins`: equi-depth feature discretization (operators.Percentiles
   * .equidepthBins) — orders bucketed into per-status quartiles of o_totalprice by the
   * exact interpolated boundaries, summarized as per-bucket count + extrema. The
   * balanced counts ARE the property under test; the oracle replays boundary
   * computation (quantile_cont) and the strict-> assignment rule.
   */
  def qEquidepthBins(spark: SparkSession, dir: String): DataFrame = {
    val o = TableIO.orders(spark, dir)
      .select(col("o_orderstatus").as("status"), col("o_totalprice"))
    graft.operators.Percentiles.equidepthBins(o, Seq("status"), "o_totalprice", nBins = 4)
      .select(col("status"), col("bucket"), col("o_totalprice").cast("double").as("v"))
      .groupBy(col("status"), col("bucket"))
      .agg(count(lit(1)).as("n"), round(min(col("v")), 2).as("lo"), round(max(col("v")), 2).as("hi"))
      .orderBy(col("status"), col("bucket"))
  }

  val qEquidepthBinsSql: String =
    """WITH b AS (
      |  SELECT o_orderstatus AS status,
      |    quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25) AS b1,
      |    quantile_cont(CAST(o_totalprice AS DOUBLE), 0.50) AS b2,
      |    quantile_cont(CAST(o_totalprice AS DOUBLE), 0.75) AS b3
      |  FROM orders GROUP BY 1),
      |a AS (
      |  SELECT o.o_orderstatus AS status,
      |    1 + CASE WHEN CAST(o.o_totalprice AS DOUBLE) > b.b1 THEN 1 ELSE 0 END
      |      + CASE WHEN CAST(o.o_totalprice AS DOUBLE) > b.b2 THEN 1 ELSE 0 END
      |      + CASE WHEN CAST(o.o_totalprice AS DOUBLE) > b.b3 THEN 1 ELSE 0 END AS bucket,
      |    CAST(o.o_totalprice AS DOUBLE) AS v
      |  FROM orders o JOIN b ON o.o_orderstatus = b.status)
      |SELECT status, bucket, count(*) AS n,
      |  round(min(v), 2) AS lo, round(max(v), 2) AS hi
      |FROM a GROUP BY 1, 2 ORDER BY status, bucket""".stripMargin

  /**
   * #39d sketch aggregates — the 100 TB shapes for distinct-count and quantiles: HLL++ and
   * t-digest are single-pass and mergeable (no two-phase distinct expansion). Approximate
   * by design -> rows-only for the driver; ExpressionSpec bounds the error vs exact.
   */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        expr("approx_percentile(l_quantity, 0.5)").as("approx_p50"))
      .orderBy(col("l_linestatus"))

  /**
   * #35c higher-order array functions — the lambda surface (transform/filter/aggregate/
   * exists/forall/zip_with/sequence/flatten/slice/array_distinct). These run as codegen'd
   * per-row loops with NO shuffle and no UDF serialization — the shape embedding math and
   * token-pipeline steps take at 100 TB. Arrays are stringified at the edge (element-wise
   * `cast` under `concat_ws`) so the oracle compare is representation-stable; the DuckDB
   * twin uses its own lambda builtins (`list_transform`/`list_filter`) or reconstructs the
   * ground truth directly from the scalar source columns — independent derivations, same
   * values.
   */
  def qHofFuncs(spark: SparkSession, dir: String): DataFrame = {
    val a1 = array(col("o_orderkey"), col("o_custkey"), col("o_orderkey") + col("o_custkey"))
    val a2 = array(col("o_custkey"), col("o_orderkey"), col("o_orderkey") * 2)
    def s(c: org.apache.spark.sql.Column) = concat_ws(",", transform(c, _.cast("string")))
    TableIO.orders(spark, dir).select(
      col("o_orderkey"),
      s(transform(a1, x => x * 2)).as("doubled"),
      s(filter(a1, x => x % 2 === 0)).as("evens"),
      aggregate(a1, lit(0L), (acc, x) => acc + x).as("total"),
      exists(a1, x => x % 7 === 0).as("any_div7"),
      forall(a1, x => x > 0).as("all_pos"),
      s(zip_with(a1, a2, (x, y) => x + y)).as("zipped"),
      s(flatten(array(a2, a2))).as("flat"),
      s(slice(a1, 1, 2)).as("first_two"),
      s(sequence(lit(1L), col("o_orderkey") % 5 + 1)).as("seq"),
      s(array_distinct(concat(a2, a2))).as("dedup"))
  }

  val qHofFuncsSql: String =
    """SELECT o_orderkey,
      |  array_to_string(list_transform([o_orderkey, o_custkey, o_orderkey + o_custkey],
      |    x -> CAST(x * 2 AS VARCHAR)), ',') AS doubled,
      |  array_to_string(list_transform(list_filter(
      |    [o_orderkey, o_custkey, o_orderkey + o_custkey], x -> x % 2 = 0),
      |    x -> CAST(x AS VARCHAR)), ',') AS evens,
      |  CAST(2 * (o_orderkey + o_custkey) AS BIGINT) AS total,
      |  (o_orderkey % 7 = 0 OR o_custkey % 7 = 0 OR (o_orderkey + o_custkey) % 7 = 0) AS any_div7,
      |  (o_orderkey > 0 AND o_custkey > 0 AND o_orderkey + o_custkey > 0) AS all_pos,
      |  CAST(o_orderkey + o_custkey AS VARCHAR) || ',' || CAST(o_custkey + o_orderkey AS VARCHAR)
      |    || ',' || CAST(3 * o_orderkey + o_custkey AS VARCHAR) AS zipped,
      |  array_to_string(list_transform(
      |    [o_custkey, o_orderkey, o_orderkey * 2, o_custkey, o_orderkey, o_orderkey * 2],
      |    x -> CAST(x AS VARCHAR)), ',') AS flat,
      |  CAST(o_orderkey AS VARCHAR) || ',' || CAST(o_custkey AS VARCHAR) AS first_two,
      |  array_to_string(list_transform(generate_series(1, o_orderkey % 5 + 1),
      |    x -> CAST(x AS VARCHAR)), ',') AS seq,
      |  CAST(o_custkey AS VARCHAR)
      |    || CASE WHEN o_orderkey <> o_custkey
      |            THEN ',' || CAST(o_orderkey AS VARCHAR) ELSE '' END
      |    || CASE WHEN o_orderkey * 2 <> o_custkey AND o_orderkey * 2 <> o_orderkey
      |            THEN ',' || CAST(o_orderkey * 2 AS VARCHAR) ELSE '' END AS dedup
      |FROM orders""".stripMargin

  /**
   * #35d VariantType — the open semi-structured column type (Spark 4): parse once into a
   * binary variant, extract typed paths without re-parsing text per access. At 100 TB the
   * variant binary encoding + shredded parquet storage is the difference between "JSON
   * strings re-parsed by every query" and "typed columnar access"; here the JSON is
   * reconstructed from source columns (q_json_funcs trick) so DuckDB can oracle the
   * extracted VALUES while Spark is what proves the variant round-trip.
   */
  def qVariant(spark: SparkSession, dir: String): DataFrame =
    TableIO.orders(spark, dir)
      .withColumn("js", concat(lit("{\"k\":"), col("o_orderkey"),
        lit(",\"s\":\""), col("o_orderstatus"), lit("\"}")))
      .selectExpr(
        "o_orderkey",
        "variant_get(parse_json(js), '$.k', 'bigint') AS k_typed",
        "variant_get(parse_json(js), '$.s', 'string') AS s_typed",
        "variant_get(parse_json(js), '$.k', 'double') AS k_dbl",
        "variant_get(parse_json(js), '$.missing', 'string') AS missing_null",
        "schema_of_variant(parse_json(js)) AS sch")

  val qVariantSql: String =
    """SELECT o_orderkey,
      |  o_orderkey AS k_typed,
      |  o_orderstatus AS s_typed,
      |  CAST(o_orderkey AS DOUBLE) AS k_dbl,
      |  CAST(NULL AS VARCHAR) AS missing_null,
      |  'OBJECT<k: BIGINT, s: STRING>' AS sch
      |FROM orders""".stripMargin

  /** #39g regression/ordered-set aggregates: regr_slope/intercept/r2/count (the reference's
    * ColumnarHashAggregation stat surface extended), median, bool_and/bool_or, and the
    * bit_and/bit_or/bit_xor integer aggregates. */
  def qAggStats3(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 6).as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 6).as("icept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
        expr("regr_count(l_extendedprice, l_quantity)").as("n_pairs"),
        round(expr("median(l_quantity)"), 4).as("med_q"),
        expr("bool_and(l_quantity > 0)").as("all_qty_pos"),
        expr("bool_or(l_discount > 0.05)").as("any_disc"),
        expr("bit_and(l_partkey)").as("band"),
        expr("bit_or(l_partkey)").as("bor"),
        expr("bit_xor(l_partkey)").as("bxor"))
      .orderBy(col("l_returnflag"))

  val qAggStats3Sql: String =
    """SELECT l_returnflag,
      |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 6) AS icept,
      |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
      |  round(median(l_quantity), 4) AS med_q,
      |  bool_and(l_quantity > 0) AS all_qty_pos,
      |  bool_or(l_discount > 0.05) AS any_disc,
      |  bit_and(l_partkey) AS band,
      |  bit_or(l_partkey) AS bor,
      |  bit_xor(l_partkey) AS bxor
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** #39h SQL-standard ordered string aggregation: listagg WITHIN GROUP (Spark 4) ==
    * DuckDB string_agg(... ORDER BY) — deterministic because the order is explicit. */
  def qListagg(spark: SparkSession, dir: String): DataFrame = {
    TableIO.lineitem(spark, dir).filter(col("l_orderkey") <= 100)
      .createOrReplaceTempView("lineitem_head")
    spark.sql(
      """SELECT l_orderkey,
        |  listagg(l_returnflag, ',') WITHIN GROUP (ORDER BY l_linenumber, l_returnflag) AS flags_seq,
        |  listagg(DISTINCT l_linestatus, '|') WITHIN GROUP (ORDER BY l_linestatus) AS statuses
        |FROM lineitem_head GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)
  }

  val qListaggSql: String =
    """SELECT l_orderkey,
      |  string_agg(l_returnflag, ',' ORDER BY l_linenumber, l_returnflag) AS flags_seq,
      |  string_agg(DISTINCT l_linestatus, '|' ORDER BY l_linestatus) AS statuses
      |FROM lineitem WHERE l_orderkey <= 100
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /**
   * #38d ANSI-safe error-handling kernels (Spark 4 runs ANSI mode by default, so silent
   * wraparound/garbage is gone and the try_* family is the explicit opt-out): division by
   * zero, 64-bit overflow, bad casts, out-of-bounds array access — each yields NULL, not
   * a crashed 100 TB job five hours in. Oracle reconstructs each NULL case explicitly.
   */
  def qTryFuncs(spark: SparkSession, dir: String): DataFrame =
    TableIO.orders(spark, dir).selectExpr(
      "o_orderkey",
      "try_divide(o_totalprice, o_custkey % 3) AS div_or_null",
      "try_add(9223372036854775807L, o_orderkey + 1L) AS overflow_null",
      "try_cast(o_orderstatus AS INT) AS bad_cast_null",
      "try_cast(cast(o_orderkey AS STRING) AS BIGINT) AS good_cast",
      "try_element_at(array(o_orderkey, o_custkey), 5) AS oob_null")

  val qTryFuncsSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_custkey % 3 = 0 THEN NULL
      |       ELSE o_totalprice / (o_custkey % 3) END AS div_or_null,
      |  CAST(NULL AS BIGINT) AS overflow_null,
      |  CAST(NULL AS INT) AS bad_cast_null,
      |  o_orderkey AS good_cast,
      |  CAST(NULL AS BIGINT) AS oob_null
      |FROM orders""".stripMargin

  /** #36b date constructors and calendar parts: make_date round-trip, add_months (both
    * engines clamp to month end), quarter/ISO week, date_sub, quarter truncation. */
  def qDateFuncs2(spark: SparkSession, dir: String): DataFrame =
    TableIO.orders(spark, dir).select(
      col("o_orderkey"),
      make_date(year(col("o_orderdate")), month(col("o_orderdate")),
        dayofmonth(col("o_orderdate"))).as("remade"),
      add_months(col("o_orderdate"), 3).as("plus3m"),
      quarter(col("o_orderdate")).as("qtr"),
      weekofyear(col("o_orderdate")).as("wk"),
      date_sub(col("o_orderdate"), 7).as("minus7"),
      trunc(col("o_orderdate"), "quarter").as("qstart"))

  val qDateFuncs2Sql: String =
    """SELECT o_orderkey,
      |  make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT),
      |            CAST(day(o_orderdate) AS INT)) AS remade,
      |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |  CAST(quarter(o_orderdate) AS INT) AS qtr,
      |  CAST(weekofyear(o_orderdate) AS INT) AS wk,
      |  CAST(o_orderdate - INTERVAL 7 DAY AS DATE) AS minus7,
      |  CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qstart
      |FROM orders""".stripMargin

  /**
   * `q_corr_matrix`: pairwise Pearson correlations of the lineitem measures in ONE
   * aggregation pass — the feature-redundancy screen run before 100 TB feature
   * materialization (the continuous twin of `q_feature_mi`'s categorical MI). Six
   * `corr` aggregates share a single scan/shuffle (each is a bounded set of running
   * moments, map-side combined); `stack` pivots the one result row to long form.
   * Rounded to 6 — corr is a quotient of co-moments both engines accumulate in
   * doubles; 1e-13 association noise vs the 1e-6 grain.
   */
  def qCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Seq(("l_quantity", "l_extendedprice"), ("l_quantity", "l_discount"),
      ("l_quantity", "l_tax"), ("l_extendedprice", "l_discount"),
      ("l_extendedprice", "l_tax"), ("l_discount", "l_tax"))
    val aggs = pairs.map { case (a, b) => round(corr(col(a), col(b)), 6).as(s"${a}__$b") }
    val wide = TableIO.lineitem(spark, dir).agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs.map { case (a, b) => s"'$a|$b', ${a}__$b" }.mkString(", ")
    wide.select(expr(s"stack(${pairs.size}, $stackArgs) as (pair, corr6)"))
      .orderBy(col("pair"))
  }

  val qCorrMatrixSql: String =
    """WITH wide AS (
      |  SELECT round(corr(l_quantity, l_extendedprice), 6) AS a,
      |         round(corr(l_quantity, l_discount), 6) AS b,
      |         round(corr(l_quantity, l_tax), 6) AS c,
      |         round(corr(l_extendedprice, l_discount), 6) AS d,
      |         round(corr(l_extendedprice, l_tax), 6) AS e,
      |         round(corr(l_discount, l_tax), 6) AS f
      |  FROM lineitem
      |)
      |SELECT pair, corr6 FROM (
      |  SELECT 'l_quantity|l_extendedprice' AS pair, a AS corr6 FROM wide
      |  UNION ALL SELECT 'l_quantity|l_discount', b FROM wide
      |  UNION ALL SELECT 'l_quantity|l_tax', c FROM wide
      |  UNION ALL SELECT 'l_extendedprice|l_discount', d FROM wide
      |  UNION ALL SELECT 'l_extendedprice|l_tax', e FROM wide
      |  UNION ALL SELECT 'l_discount|l_tax', f FROM wide
      |) u ORDER BY pair""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corr_matrix" -> qCorrMatrix _,
    "q_math" -> qMath _, "q_case_when" -> qCaseWhen _, "q_coalesce_expr" -> qCoalesceExpr _,
    "q_in_filter" -> qInFilter _, "q_string_funcs" -> qStringFuncs _,
    "q_like_regex" -> qLikeRegex _, "q_date_funcs" -> qDateFuncs _,
    "q_date_trunc" -> qDateTrunc _, "q_unix_time" -> qUnixTime _,
    "q_conv_funcs" -> qConvFuncs _, "q_map_funcs" -> qMapFuncs _, "q_hash_funcs" -> qHashFuncs _, "q_hash_funcs2" -> qHashFuncs2 _, "q_casts" -> qCasts _,
    "q_agg_stats" -> qAggStats _, "q_count_distinct" -> qCountDistinct _,
    "q_agg_stats2" -> qAggStats2 _, "q_json_funcs" -> qJsonFuncs _, "q_decimal_agg" -> qDecimalAgg _, "q_decimal_avg" -> qDecimalAvg _, "q_collect_list" -> qCollectList _, "q_pivot" -> qPivot _, "q_array_funcs" -> qArrayFuncs _, "q_percentile" -> qPercentile _, "q_percentile_sort" -> qPercentileSort _, "q_equidepth_bins" -> qEquidepthBins _, "q_approx_distinct" -> qApproxDistinct _,
    "q_string_funcs2" -> qStringFuncs2 _, "q_url_funcs" -> qUrlFuncs _,
    "q_bitwise" -> qBitwise _, "q_time_parts" -> qTimeParts _,
    "q_hof_funcs" -> qHofFuncs _, "q_agg_stats3" -> qAggStats3 _,
    "q_date_funcs2" -> qDateFuncs2 _, "q_variant" -> qVariant _,
    "q_listagg" -> qListagg _, "q_try_funcs" -> qTryFuncs _)

  val oracles: Map[String, String] = Map(
    "q_math" -> qMathSql, "q_case_when" -> qCaseWhenSql, "q_coalesce_expr" -> qCoalesceExprSql,
    "q_in_filter" -> qInFilterSql, "q_string_funcs" -> qStringFuncsSql,
    "q_like_regex" -> qLikeRegexSql, "q_date_funcs" -> qDateFuncsSql,
    "q_date_trunc" -> qDateTruncSql, "q_unix_time" -> qUnixTimeSql,
    "q_conv_funcs" -> qConvFuncsSql, "q_map_funcs" -> qMapFuncsSql, "q_hash_funcs" -> qHashFuncsSql, "q_casts" -> qCastsSql,
    "q_agg_stats" -> qAggStatsSql, "q_count_distinct" -> qCountDistinctSql,
    "q_agg_stats2" -> qAggStats2Sql, "q_json_funcs" -> qJsonFuncsSql, "q_decimal_agg" -> qDecimalAggSql, "q_decimal_avg" -> qDecimalAvgSql, "q_collect_list" -> qCollectListSql, "q_pivot" -> qPivotSql, "q_array_funcs" -> qArrayFuncsSql, "q_percentile" -> qPercentileSql, "q_percentile_sort" -> qPercentileSortSql, "q_equidepth_bins" -> qEquidepthBinsSql,
    "q_string_funcs2" -> qStringFuncs2Sql, "q_url_funcs" -> qUrlFuncsSql,
    "q_bitwise" -> qBitwiseSql, "q_time_parts" -> qTimePartsSql,
    "q_hof_funcs" -> qHofFuncsSql, "q_agg_stats3" -> qAggStats3Sql,
    "q_date_funcs2" -> qDateFuncs2Sql, "q_variant" -> qVariantSql,
    "q_listagg" -> qListaggSql, "q_try_funcs" -> qTryFuncsSql,
    "q_corr_matrix" -> qCorrMatrixSql)
    // q_approx_distinct: sketch-based -> rows-only + error-bound spec
}
