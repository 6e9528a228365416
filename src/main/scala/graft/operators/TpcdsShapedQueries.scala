package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * TPC-DS-SHAPED query pack. The reference tests TPC-DS alongside TPC-H
 * (gazelle_plugin: native-sql-engine/core/src/test/scala/com/intel/oap/tpc/ds/
 * TPCDSSuite.scala:1); the driver schema has no DS tables, but the plan shapes that make
 * DS hard — deep snowflake joins, CTE reuse, wide grouping sets, channel unions, rank
 * over aggregates, correlated-average filters — are all expressible on the TPC-H-ish
 * schema, and that is what this pack covers (one query per DS-signature shape, each
 * oracle-checked against DuckDB).
 *
 * Same scale discipline as TpchQueries: broadcast hints only on fixed-cardinality dims
 * (region/nation/supplier); customer/part joins are AQE-decided; doubles rounded at the
 * output edge only.
 */
object TpcdsShapedQueries {

  /**
   * DS shape 1 (q25/q29 family): 7-table snowflake — fact lineitem joins orders, then
   * customer -> nation -> region (two-level dimension chain) plus part and supplier
   * branches, aggregated by region x year. One fact-fact shuffle (lineitem⋈orders);
   * everything else is a dim join.
   */
  def qDsSnowflake(spark: SparkSession, dir: String): DataFrame = {
    val li = TableIO.lineitem(spark, dir)
    val o = TableIO.orders(spark, dir)
    val c = TableIO.customer(spark, dir)
    val n = TableIO.nation(spark, dir)
    val r = TableIO.region(spark, dir)
    val p = TableIO.part(spark, dir).filter(col("p_size") <= 25)
    val s = TableIO.supplier(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("yr"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"),
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("r_name"), col("yr"))
  }

  val qDsSnowflakeSql: String =
    """SELECT r_name, CAST(year(o_orderdate) AS INT) AS yr,
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
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /**
   * DS shape 2 (q74/q4 family): CTE computed once, self-joined across consecutive years —
   * customers whose order revenue grew >50% year-over-year. The per-(customer, year)
   * aggregate subplan appears twice; Catalyst's exchange reuse materializes it once
   * (same property q_shuffle_reuse asserts).
   *
   * The growth PREDICATE runs on exact integer cent sums (`2*t1 > 3*t0`), never on
   * floating sums: a double sum is accumulation-order-dependent, and a row near the 1.5x
   * boundary could be included by one engine and excluded by the other — a flipped
   * filter row can't be absorbed by output rounding.
   */
  def qDsYoy(spark: SparkSession, dir: String): DataFrame = {
    val yearly = TableIO.orders(spark, dir)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .agg(sum(col("cents")).as("total_cents"))
    val a = yearly.select(col("o_custkey").as("custkey"), col("yr").as("yr0"), col("total_cents").as("t0"))
    val b = yearly.select(col("o_custkey").as("custkey_b"), col("yr").as("yr1"), col("total_cents").as("t1"))
    a.join(b, col("custkey") === col("custkey_b") && col("yr1") === col("yr0") + 1)
      .filter(col("t1") * 2 > col("t0") * 3) // exact: t1 > 1.5 * t0 in integer math
      .select(col("custkey"), col("yr0"),
        round(col("t0") / 100.0, 2).as("rev0"), round(col("t1") / 100.0, 2).as("rev1"))
      .orderBy(col("custkey"), col("yr0"))
  }

  val qDsYoySql: String =
    """WITH yearly AS (
      |  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |  FROM orders GROUP BY 1, 2)
      |SELECT a.o_custkey AS custkey, a.yr AS yr0,
      |  round(a.total_cents / 100.0, 2) AS rev0, round(b.total_cents / 100.0, 2) AS rev1
      |FROM yearly a JOIN yearly b
      |  ON a.o_custkey = b.o_custkey AND b.yr = a.yr + 1
      |WHERE b.total_cents * 2 > a.total_cents * 3
      |ORDER BY custkey, yr0""".stripMargin

  /**
   * DS shape 3 (q27/q36 family): wide GROUPING SETS over a 3-level dimension hierarchy
   * (region -> nation -> year) with per-level subtotals and a grand total — the heavy
   * ExpandExec form. NULL group markers labeled at the edge, as in qRollup.
   */
  def qDsGrouping(spark: SparkSession, dir: String): DataFrame = {
    val o = TableIO.orders(spark, dir)
    val c = TableIO.customer(spark, dir)
    val n = TableIO.nation(spark, dir)
    val r = TableIO.region(spark, dir)
    val joined = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .withColumn("yr", year(col("o_orderdate")))
    joined.groupingSets(
        Seq(
          Seq(col("r_name"), col("n_name"), col("yr")),
          Seq(col("r_name"), col("n_name")),
          Seq(col("r_name")),
          Seq()),
        col("r_name"), col("n_name"), col("yr"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("rev"))
      .select(
        coalesce(col("r_name"), lit("(all)")).as("region"),
        coalesce(col("n_name"), lit("(all)")).as("nation"),
        coalesce(col("yr").cast("string"), lit("(all)")).as("yr"),
        col("n"), col("rev"))
      .orderBy(col("region"), col("nation"), col("yr"))
  }

  val qDsGroupingSql: String =
    """SELECT coalesce(r_name, '(all)') AS region,
      |  coalesce(n_name, '(all)') AS nation,
      |  coalesce(CAST(yr AS VARCHAR), '(all)') AS yr,
      |  count(*) AS n, round(sum(o_totalprice), 2) AS rev
      |FROM (
      |  SELECT r_name, n_name, CAST(year(o_orderdate) AS INT) AS yr, o_totalprice
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey)
      |GROUP BY GROUPING SETS ((r_name, n_name, yr), (r_name, n_name), (r_name), ())
      |ORDER BY region, nation, yr""".stripMargin

  /**
   * DS shape 4 (q71 family): three "channels" sliced from one fact by priority band,
   * unioned, then re-aggregated by channel x year. Union-then-aggregate pushes partial
   * aggregation below the union on each branch.
   */
  def qDsChannels(spark: SparkSession, dir: String): DataFrame = {
    val o = TableIO.orders(spark, dir)
    def channel(name: String, prios: Seq[String]): DataFrame =
      o.filter(col("o_orderpriority").isin(prios: _*))
        .select(lit(name).as("channel"), year(col("o_orderdate")).as("yr"), col("o_totalprice"))
    channel("web", Seq("1-URGENT", "2-HIGH"))
      .unionByName(channel("catalog", Seq("3-MEDIUM")))
      .unionByName(channel("store", Seq("4-NOT SPECIFIED", "5-LOW")))
      .groupBy(col("channel"), col("yr"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("rev"))
      .orderBy(col("channel"), col("yr"))
  }

  val qDsChannelsSql: String =
    """SELECT channel, yr, count(*) AS n, round(sum(o_totalprice), 2) AS rev
      |FROM (
      |  SELECT 'web' AS channel, CAST(year(o_orderdate) AS INT) AS yr, o_totalprice
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |  UNION ALL
      |  SELECT 'catalog', CAST(year(o_orderdate) AS INT), o_totalprice
      |  FROM orders WHERE o_orderpriority = '3-MEDIUM'
      |  UNION ALL
      |  SELECT 'store', CAST(year(o_orderdate) AS INT), o_totalprice
      |  FROM orders WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW'))
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /**
   * DS shape 5 (q67 family): rank over an AGGREGATE — top-3 revenue years within each
   * nation. The rank<=k filter over the aggregated frame is exactly the pattern
   * RankLimitRule rewrites onto the native TopKPerKey pre-limit.
   */
  def qDsTopnWindow(spark: SparkSession, dir: String): DataFrame = {
    val o = TableIO.orders(spark, dir)
    val c = TableIO.customer(spark, dir)
    val n = TableIO.nation(spark, dir)
    val rev = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
      .agg(sum(col("o_totalprice")).as("rev"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("rev").desc, col("yr"))
    rev.withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .select(col("n_name"), col("rnk"), col("yr"), round(col("rev"), 2).as("rev2"))
      .orderBy(col("n_name"), col("rnk"))
  }

  val qDsTopnWindowSql: String =
    """SELECT n_name, rnk, yr, round(rev, 2) AS rev2 FROM (
      |  SELECT n_name, yr, rev,
      |    rank() OVER (PARTITION BY n_name ORDER BY rev DESC, yr) AS rnk
      |  FROM (
      |    SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr, sum(o_totalprice) AS rev
      |    FROM orders
      |    JOIN customer ON o_custkey = c_custkey
      |    JOIN nation ON c_nationkey = n_nationkey
      |    GROUP BY 1, 2))
      |WHERE rnk <= 3 ORDER BY n_name, rnk""".stripMargin

  /**
   * DS shape 6 (q6/q65 family): rows above a correlated group average — parts priced
   * >30% over their brand's average, counted by type. The per-brand average joins back
   * against the same table (broadcastable once aggregated: one row per brand).
   *
   * The above-average PREDICATE is exact rational arithmetic on integer cents
   * (price * n * 10 > sum * 13 ⟺ price > 1.3 * sum/n), so boundary rows can't flip
   * between engines on floating-point accumulation order.
   */
  def qDsAboveAvg(spark: SparkSession, dir: String): DataFrame = {
    val p = TableIO.part(spark, dir)
      .withColumn("price_cents", round(col("p_retailprice") * 100).cast("long"))
    val brandAvg = p.groupBy(col("p_brand"))
      .agg(sum(col("price_cents")).as("sum_cents"), count(lit(1)).as("n_brand"))
    p.join(brandAvg, Seq("p_brand"))
      .filter(col("price_cents") * col("n_brand") * 10 > col("sum_cents") * 13)
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("p_retailprice")), 4).as("avg_price"))
      .orderBy(col("p_type"))
  }

  val qDsAboveAvgSql: String =
    """SELECT p_type, count(*) AS n, round(avg(p_retailprice), 4) AS avg_price
      |FROM (SELECT *, CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents FROM part) p
      |JOIN (SELECT p_brand, CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |             count(*) AS n_brand
      |      FROM part GROUP BY 1) b USING (p_brand)
      |WHERE price_cents * n_brand * 10 > sum_cents * 13
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /**
   * DS shape 7 (q14 "cross-channel" family): an INTERSECT of two fact slices drives the
   * main aggregation — parts that sold in BOTH the high-priority and low-priority order
   * channels, then revenue by part brand for just those parts. Spark plans INTERSECT as
   * a left-semi after distinct (shuffle on the intersect key only: a long), and the
   * resulting key set joins the fact as an AQE-decided join — no materialized temp table.
   */
  def qDsCrossChannel(spark: SparkSession, dir: String): DataFrame = {
    val li = TableIO.lineitem(spark, dir)
    val o = TableIO.orders(spark, dir)
    val p = TableIO.part(spark, dir)
    def channelParts(priorities: Seq[String]) =
      li.join(o.filter(col("o_orderpriority").isin(priorities: _*)),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey"))
    val both = channelParts(Seq("1-URGENT", "2-HIGH"))
      .intersect(channelParts(Seq("5-LOW")))
    li.join(both, Seq("l_partkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(round(sum(col("l_extendedprice")), 2).as("rev"), count(lit(1)).as("n"))
      .orderBy(col("p_brand"))
  }

  val qDsCrossChannelSql: String =
    """WITH both_channels AS (
      |  SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |  INTERSECT
      |  SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderpriority = '5-LOW')
      |SELECT p_brand, round(sum(l_extendedprice), 2) AS rev, count(*) AS n
      |FROM lineitem
      |JOIN both_channels USING (l_partkey)
      |JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /**
   * DS shape 8 (q10/q35 family): an EXISTS-chain — customers with at least one urgent
   * order AND at least one open (status 'O') order, profiled by nation. Both predicates
   * plan as left-semi joins on the customer key; the dimension join is a broadcast.
   */
  def qDsExistsChain(spark: SparkSession, dir: String): DataFrame = {
    val c = TableIO.customer(spark, dir)
    val o = TableIO.orders(spark, dir)
    val n = TableIO.nation(spark, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    val open = o.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    c.join(urgent, Seq("c_custkey"), "left_semi")
      .join(open, Seq("c_custkey"), "left_semi")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(avg(col("c_acctbal")), 4).as("avg_bal"))
      .orderBy(col("n_name"))
  }

  val qDsExistsChainSql: String =
    """SELECT n_name, count(*) AS n_cust, round(avg(c_acctbal), 4) AS avg_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |              AND o_orderpriority = '1-URGENT')
      |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |              AND o_orderstatus = 'O')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /**
   * DS shape 9 (q88 family): many conditional aggregates over ONE fact scan — order
   * counts and revenue for six quantity bands computed as sum(CASE...) columns, a single
   * pass with zero joins. The DS-hard property is that naive engines scan once per band;
   * here all bands fuse into one codegen stage over one scan.
   */
  def qDsMultiBand(spark: SparkSession, dir: String): DataFrame = {
    val li = TableIO.lineitem(spark, dir)
    def band(lo: Int, hi: Int) =
      sum(when(col("l_quantity") >= lo && col("l_quantity") < hi, 1).otherwise(0))
    li.agg(
      band(1, 10).as("b1_9"),
      band(10, 20).as("b10_19"),
      band(20, 30).as("b20_29"),
      band(30, 40).as("b30_39"),
      band(40, 50).as("b40_49"),
      sum(when(col("l_quantity") >= 50, 1).otherwise(0)).as("b50_up"),
      round(sum(when(col("l_quantity") < 25, col("l_extendedprice")).otherwise(lit(0.0))), 2)
        .as("rev_low_half"))
  }

  val qDsMultiBandSql: String =
    """SELECT
      |  CAST(sum(CASE WHEN l_quantity >= 1 AND l_quantity < 10 THEN 1 ELSE 0 END) AS BIGINT) AS b1_9,
      |  CAST(sum(CASE WHEN l_quantity >= 10 AND l_quantity < 20 THEN 1 ELSE 0 END) AS BIGINT) AS b10_19,
      |  CAST(sum(CASE WHEN l_quantity >= 20 AND l_quantity < 30 THEN 1 ELSE 0 END) AS BIGINT) AS b20_29,
      |  CAST(sum(CASE WHEN l_quantity >= 30 AND l_quantity < 40 THEN 1 ELSE 0 END) AS BIGINT) AS b30_39,
      |  CAST(sum(CASE WHEN l_quantity >= 40 AND l_quantity < 50 THEN 1 ELSE 0 END) AS BIGINT) AS b40_49,
      |  CAST(sum(CASE WHEN l_quantity >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS b50_up,
      |  round(sum(CASE WHEN l_quantity < 25 THEN l_extendedprice ELSE 0 END), 2) AS rev_low_half
      |FROM lineitem""".stripMargin

  /**
   * DS shape 10 (q67 family): rank-within-category over a ROLLUP lattice — revenue by
   * (n_name, yr) WITH ROLLUP, every lattice row ranked within its n_name partition
   * (the yr-subtotal outranks its details by construction; grouping-id is the
   * deterministic tie-break), top 3 kept. Expand feeds the window and the rank<=k
   * filter rides RankLimitRule's native pre-limit — q67's plan shape end-to-end.
   */
  def qDsRollupTopn(spark: SparkSession, dir: String): DataFrame = {
    val o = TableIO.orders(spark, dir)
    val c = TableIO.customer(spark, dir)
    val n = TableIO.nation(spark, dir)
    val lattice = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .withColumn("yr", year(col("o_orderdate")))
      .rollup(col("n_name"), col("yr"))
      .agg(sum(col("o_totalprice")).as("rev"), grouping_id().as("gid"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("rev").desc, col("gid"), col("yr"))
    lattice.withColumn("rnk", rank().over(w)).filter(col("rnk") <= 3)
      .select(coalesce(col("n_name"), lit("(all)")).as("nation"),
        col("rnk").cast("int").as("rnk"),
        coalesce(col("yr"), lit(-1)).cast("int").as("yr"),
        col("gid").cast("int").as("gid"),
        round(col("rev"), 2).as("rev2"))
      // yr completes the total order: equal-revenue detail years within a nation tie on
      // (rnk, gid) and would otherwise hash-compare in engine-dependent order.
      .orderBy(col("nation"), col("rnk"), col("gid"), col("yr"))
  }

  val qDsRollupTopnSql: String =
    """WITH lattice AS (
      |  SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr, sum(o_totalprice) AS rev,
      |    CAST(GROUPING(n_name, yr) AS INT) AS gid
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY ROLLUP (n_name, yr))
      |SELECT nation, rnk, yr, gid, rev2 FROM (
      |  SELECT coalesce(n_name, '(all)') AS nation,
      |    CAST(rank() OVER (PARTITION BY n_name ORDER BY rev DESC, gid, yr) AS INT) AS rnk,
      |    coalesce(yr, -1) AS yr, gid, round(rev, 2) AS rev2
      |  FROM lattice) t
      |WHERE rnk <= 3 ORDER BY nation, rnk, gid, yr""".stripMargin

  /**
   * DS shape 11 (q51 family): two per-channel cumulative series FULL-OUTER joined on
   * their common axis, keeping the rows where one channel's running total overtakes the
   * other. Cumulative windows partition by YEAR (per-partition local sort — the
   * scale-safe form of q51's per-item partitioning, never one global window partition);
   * the USING full outer join coalesces the axis on both engines; months missing a
   * channel surface a null cumulative that three-valued logic drops from the overtake
   * filter on both engines identically.
   */
  def qDsCumulative(spark: SparkSession, dir: String): DataFrame = {
    val li = TableIO.lineitem(spark, dir)
    def series(flag: String, out: String): DataFrame = {
      val monthly = li.filter(col("l_returnflag") === flag)
        .groupBy(trunc(col("l_shipdate"), "month").as("mon"))
        .agg(sum(col("l_extendedprice")).as("rev"))
      val w = Window.partitionBy(year(col("mon"))).orderBy(col("mon"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly.select(col("mon"), round(sum(col("rev")).over(w), 2).as(out))
    }
    series("A", "cum_a").join(series("R", "cum_r"), Seq("mon"), "full_outer")
      .filter(col("cum_r") > col("cum_a"))
      .select(col("mon").cast("date").as("mon"), col("cum_a"), col("cum_r"))
      .orderBy(col("mon"))
  }

  val qDsCumulativeSql: String =
    """WITH am AS (SELECT date_trunc('month', l_shipdate) AS mon, sum(l_extendedprice) AS rev
      |            FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1),
      |ac AS (SELECT mon, round(sum(rev) OVER (PARTITION BY date_trunc('year', mon)
      |                 ORDER BY mon ROWS UNBOUNDED PRECEDING), 2) AS cum_a FROM am),
      |rm AS (SELECT date_trunc('month', l_shipdate) AS mon, sum(l_extendedprice) AS rev
      |            FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
      |rc AS (SELECT mon, round(sum(rev) OVER (PARTITION BY date_trunc('year', mon)
      |                 ORDER BY mon ROWS UNBOUNDED PRECEDING), 2) AS cum_r FROM rm)
      |SELECT CAST(mon AS DATE) AS mon, cum_a, cum_r
      |FROM ac FULL OUTER JOIN rc USING (mon)
      |WHERE cum_r > cum_a
      |ORDER BY mon""".stripMargin

  /**
   * DS shape 12 (q95 family): reachability over a SELF-JOINED fact — orders whose
   * lineitems "reach" at least two distinct suppliers (lineitem⋈lineitem on orderkey
   * with supplier inequality, consumed as a LEFT SEMI — the probe stops at the first
   * witness, never materializing the quadratic pair set), intersected with the
   * returned-order set restricted to those same multi-supplier orders, then a
   * distinct-count aggregate over a date-windowed orders scan. All joins are equi-joins
   * on orderkey (the inequality rides the join condition, not a BNL) — the plan spec
   * asserts no nested-loop/cartesian appears.
   */
  def qDsReachability(spark: SparkSession, dir: String): DataFrame = {
    val l = TableIO.lineitem(spark, dir)
    val o = TableIO.orders(spark, dir)
    val l2 = l.select(col("l_orderkey").as("r_orderkey"), col("l_suppkey").as("r_suppkey"))
    val multiSupp = l.select(col("l_orderkey"), col("l_suppkey"))
      .join(l2, col("l_orderkey") === col("r_orderkey") &&
        col("l_suppkey") =!= col("r_suppkey"), "leftsemi")
      .select(col("l_orderkey")).distinct()
    val returned = l.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("ret_orderkey")).distinct()
      .join(multiSupp, col("ret_orderkey") === col("l_orderkey"), "leftsemi")
    o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .join(multiSupp, col("o_orderkey") === col("l_orderkey"), "leftsemi")
      .join(returned, col("o_orderkey") === col("ret_orderkey"), "leftsemi")
      .agg(count_distinct(col("o_orderkey")).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"))
  }

  val qDsReachabilitySql: String =
    """WITH multi AS (
      |  SELECT DISTINCT l1.l_orderkey FROM lineitem l1
      |  WHERE EXISTS (SELECT 1 FROM lineitem l2
      |                WHERE l2.l_orderkey = l1.l_orderkey
      |                  AND l2.l_suppkey <> l1.l_suppkey)),
      |ret AS (
      |  SELECT DISTINCT l.l_orderkey FROM lineitem l
      |  WHERE l.l_returnflag = 'R'
      |    AND l.l_orderkey IN (SELECT l_orderkey FROM multi))
      |SELECT count(DISTINCT o_orderkey) AS n_orders, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND o_orderkey IN (SELECT l_orderkey FROM multi)
      |  AND o_orderkey IN (SELECT l_orderkey FROM ret)""".stripMargin

  /**
   * DS shape 13 (q34/q73 "frequent shopper" family): per-customer-per-month order
   * counts restricted to a HAVING band, joined back to the customer dimension and
   * profiled by market segment — the aggregate→band-filter→dimension-join signature.
   * The band filter runs on the AGGREGATE (map-side combined count per (custkey,
   * month)), so the join back to customer moves only band survivors.
   */
  def qDsHavingBand(spark: SparkSession, dir: String): DataFrame = {
    val o = TableIO.orders(spark, dir)
    val c = TableIO.customer(spark, dir)
    val band = o.groupBy(col("o_custkey"), month(col("o_orderdate")).as("mon"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2 && col("cnt") <= 5)
    band.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("mon"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), sum(col("cnt")).as("n_orders"))
      .orderBy(col("mon"), col("c_mktsegment"))
  }

  val qDsHavingBandSql: String =
    """WITH band AS (
      |  SELECT o_custkey, month(o_orderdate) AS mon, count(*) AS cnt
      |  FROM orders GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 5)
      |SELECT CAST(mon AS INT) AS mon, c_mktsegment,
      |  count(*) AS n_customers, CAST(sum(cnt) AS BIGINT) AS n_orders
      |FROM band JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ds_having_band" -> (qDsHavingBand(_, _)),
    "q_ds_snowflake" -> (qDsSnowflake(_, _)),
    "q_ds_yoy" -> (qDsYoy(_, _)),
    "q_ds_grouping" -> (qDsGrouping(_, _)),
    "q_ds_channels" -> (qDsChannels(_, _)),
    "q_ds_topn_window" -> (qDsTopnWindow(_, _)),
    "q_ds_above_avg" -> (qDsAboveAvg(_, _)),
    "q_ds_cross_channel" -> (qDsCrossChannel(_, _)),
    "q_ds_exists_chain" -> (qDsExistsChain(_, _)),
    "q_ds_multi_band" -> (qDsMultiBand(_, _)),
    "q_ds_rollup_topn" -> (qDsRollupTopn(_, _)),
    "q_ds_cumulative" -> (qDsCumulative(_, _)),
    "q_ds_reachability" -> (qDsReachability(_, _)))

  val oracles: Map[String, String] = Map(
    "q_ds_having_band" -> qDsHavingBandSql,
    "q_ds_snowflake" -> qDsSnowflakeSql,
    "q_ds_yoy" -> qDsYoySql,
    "q_ds_grouping" -> qDsGroupingSql,
    "q_ds_channels" -> qDsChannelsSql,
    "q_ds_topn_window" -> qDsTopnWindowSql,
    "q_ds_above_avg" -> qDsAboveAvgSql,
    "q_ds_cross_channel" -> qDsCrossChannelSql,
    "q_ds_exists_chain" -> qDsExistsChainSql,
    "q_ds_multi_band" -> qDsMultiBandSql,
    "q_ds_rollup_topn" -> qDsRollupTopnSql,
    "q_ds_cumulative" -> qDsCumulativeSql,
    "q_ds_reachability" -> qDsReachabilitySql)
}
