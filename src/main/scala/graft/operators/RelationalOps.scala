package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * One query per relational operator in the reference's executor inventory
 * (gazelle_plugin: docs/operators.md:1 lists the 28 executors; the columnar
 * implementations live in native-sql-engine/core/src/main/scala/com/intel/oap/execution/).
 *
 * Each proves the operator end-to-end against the DuckDB oracle. Queries are shaped so the
 * physical plan actually contains the operator under test (specs assert the plan), and so
 * the shape scales: dimension joins broadcast, fact joins shuffle once, no empty-partition
 * windows, no driver-side loops.
 */
object RelationalOps {

  /** #1 scan + pushdown: narrow projection + selective filter reach the parquet reader. */
  def qScanPushdown(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir)
      .filter(col("l_quantity") > 45 && col("l_discount") >= 0.08)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_partkey"), col("l_quantity"))

  val qScanPushdownSql: String =
    """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
      |WHERE l_quantity > 45 AND l_discount >= 0.08
      |ORDER BY l_orderkey, l_partkey, l_quantity""".stripMargin

  /** #2 filter: compound boolean predicate (ColumnarConditionProjector analog). */
  def qFilter(spark: SparkSession, dir: String): DataFrame =
    TableIO.orders(spark, dir)
      .filter((col("o_orderstatus") === "F" && col("o_totalprice") > 100000.0) ||
        (col("o_orderpriority") === "1-URGENT" && col("o_totalprice") <= 50000.0))
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  val qFilterSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |WHERE (o_orderstatus = 'F' AND o_totalprice > 100000.0)
      |   OR (o_orderpriority = '1-URGENT' AND o_totalprice <= 50000.0)""".stripMargin

  /**
   * #3 project: arithmetic expression projection (ColumnarProjection analog). The computed
   * double is emitted RAW: both engines evaluate the identical left-associated IEEE
   * expression on the same inputs, so the bits match exactly — whereas per-row round()
   * differs between engines on decimal-half ties.
   */
  def qProject(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge"),
        (col("l_quantity") * 2 + 1).as("qty2"))

  val qProjectSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
      |  l_quantity * 2 + 1 AS qty2
      |FROM lineitem""".stripMargin

  /** #5 global sort over a computed key. */
  def qSort(spark: SparkSession, dir: String): DataFrame =
    TableIO.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      .orderBy(col("c_mktsegment"), col("c_acctbal").desc, col("c_custkey"))

  val qSortSql: String =
    """SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
      |ORDER BY c_mktsegment, c_acctbal DESC, c_custkey""".stripMargin

  /** #6 TakeOrderedAndProject: top-N without a global sort (per-partition top-N + merge). */
  def qTopN(spark: SparkSession, dir: String): DataFrame =
    TableIO.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(25)

  val qTopNSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin

  /** #7 limit with deterministic prefix (ordered input). */
  def qLimit(spark: SparkSession, dir: String): DataFrame =
    TableIO.nation(spark, dir).orderBy(col("n_nationkey")).limit(7)

  val qLimitSql: String =
    "SELECT * FROM nation ORDER BY n_nationkey LIMIT 7"

  /** #8a rollup (ColumnarExpandExec analog: grouping-set expansion). Grand-total NULLs
    * are labeled '(all)' at the edge so the output carries no semantic NULLs. */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"), col("n"), col("qty"))
      .orderBy(col("rf"), col("ls"))

  val qRollupSql: String =
    """SELECT coalesce(l_returnflag, '(all)') AS rf, coalesce(l_linestatus, '(all)') AS ls,
      |  count(*) AS n, round(sum(l_quantity), 2) AS qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  /** #8c explicit grouping sets (the general ExpandExec form rollup/cube lower to). */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("rev"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"), col("n"), col("rev"))
      .orderBy(col("rf"), col("ls"))

  val qGroupingSetsSql: String =
    """SELECT coalesce(l_returnflag, '(all)') AS rf, coalesce(l_linestatus, '(all)') AS ls,
      |  count(*) AS n, round(sum(l_extendedprice), 2) AS rev
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY rf, ls""".stripMargin

  /** #8b cube. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    TableIO.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 4).as("avg_price"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("st"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("pri"), col("n"), col("avg_price"))
      .orderBy(col("st"), col("pri"))

  val qCubeSql: String =
    """SELECT coalesce(o_orderstatus, '(all)') AS st, coalesce(o_orderpriority, '(all)') AS pri,
      |  count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY st, pri""".stripMargin

  /** #9 union (all) of two differently-filtered scans, then re-aggregated. */
  def qUnion(spark: SparkSession, dir: String): DataFrame = {
    val hi = TableIO.orders(spark, dir).filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey").as("key"), lit("hi").as("bucket"))
    val lo = TableIO.orders(spark, dir).filter(col("o_totalprice") < 2000.0)
      .select(col("o_orderkey").as("key"), lit("lo").as("bucket"))
    hi.unionByName(lo).groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  val qUnionSql: String =
    """SELECT bucket, count(*) AS n FROM (
      |  SELECT o_orderkey AS key, 'hi' AS bucket FROM orders WHERE o_totalprice > 400000.0
      |  UNION ALL
      |  SELECT o_orderkey AS key, 'lo' AS bucket FROM orders WHERE o_totalprice < 2000.0)
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** #9b set operators: INTERSECT lowers to left-semi + distinct, EXCEPT to left-anti +
    * distinct — the remaining relational-algebra surface beyond UNION. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val bigSpenders = TableIO.orders(spark, dir)
      .filter(col("o_totalprice") > 200000.0).select(col("o_custkey"))
    val urgentBuyers = TableIO.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val both = bigSpenders.intersect(urgentBuyers)
      .select(col("o_custkey"), lit("both").as("kind"))
    val onlyBig = bigSpenders.except(urgentBuyers)
      .select(col("o_custkey"), lit("only_big").as("kind"))
    both.unionByName(onlyBig)
      .groupBy(col("kind")).agg(count(lit(1)).as("n"))
      .orderBy(col("kind"))
  }

  val qSetOpsSql: String =
    """WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0),
      |urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT kind, count(*) AS n FROM (
      |  SELECT o_custkey, 'both' AS kind FROM (SELECT * FROM big INTERSECT SELECT * FROM urgent)
      |  UNION ALL
      |  SELECT o_custkey, 'only_big' AS kind FROM (SELECT * FROM big EXCEPT SELECT * FROM urgent))
      |GROUP BY kind ORDER BY kind""".stripMargin

  /** #9c multiset set operators: INTERSECT ALL / EXCEPT ALL. Unlike the distinct
    * variants (#9b), these preserve duplicate MULTIPLICITY — per key, INTERSECT ALL
    * keeps min(countA, countB) copies and EXCEPT ALL keeps max(countA - countB, 0).
    * Spark lowers both to a per-key count-compare + replicate (no distinct), so the
    * key proves the multiset arithmetic end-to-end: the result carries row counts AND
    * distinct-key counts per branch — multiplicity shows exactly where rows > keys,
    * which the #9b distinct lowering would collapse. */
  def qSetOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val li = TableIO.lineitem(spark, dir)
    val a = li.filter(col("l_quantity") >= 45.0).select(col("l_partkey"))
    val b = li.filter(col("l_returnflag") === "R").select(col("l_partkey"))
    val inter = a.intersectAll(b).select(col("l_partkey"), lit("intersect_all").as("kind"))
    val diff = a.exceptAll(b).select(col("l_partkey"), lit("except_all").as("kind"))
    inter.unionByName(diff)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("l_partkey")).as("n_keys"))
      .orderBy(col("kind"))
  }

  val qSetOpsAllSql: String =
    """WITH a AS (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45.0),
      |b AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
      |SELECT kind, CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_keys
      |FROM (
      |  SELECT l_partkey, 'intersect_all' AS kind FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
      |  UNION ALL
      |  SELECT l_partkey, 'except_all' AS kind FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b))
      |GROUP BY kind ORDER BY kind""".stripMargin

  /** #7b LIMIT ... OFFSET pagination: a TOTAL order (unique (l_orderkey, l_linenumber))
    * then skip 100 rows, take 20. Spark plans the offset into CollectLimit/
    * GlobalLimitAndOffset — a bounded top-(offset+limit) per partition, never a full
    * global sort materialization, so deep-but-bounded pagination stays cheap at scale. */
  def qLimitOffset(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .offset(100).limit(20)

  val qLimitOffsetSql: String =
    """SELECT l_orderkey, l_linenumber FROM lineitem
      |ORDER BY l_orderkey, l_linenumber LIMIT 20 OFFSET 100""".stripMargin

  /** #7c TABLESAMPLE (reference sql-tests/inputs/tablesample-negative.sql): the three
    * sampler forms the SQL front door accepts — Bernoulli percent with a REPEATABLE
    * seed, exact-row, and hash-bucket. Sampling randomness is engine-local, so there
    * is NO DuckDB oracle (declared rows-only, like the repo's other hash-seeded
    * surfaces); TablesampleSpec pins the semantics instead: same-seed
    * reproducibility, binomial concentration of the percent form, exactness of the
    * ROWS form, and the parser rejecting fractions outside [0, 100]. At scale the
    * percent form is a per-partition Bernoulli filter fused into the scan (no
    * shuffle, no global pass) and the ROWS form is a bounded limit — both scale-free. */
  def qTablesample(spark: SparkSession, dir: String): DataFrame = {
    TableIO.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql("""
      |SELECT kind, n_rows, n_cust FROM (
      |  SELECT 'pct' AS kind, CAST(count(*) AS BIGINT) AS n_rows,
      |         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
      |  FROM orders TABLESAMPLE (10 PERCENT) REPEATABLE (42)
      |  UNION ALL
      |  SELECT 'rows', CAST(count(*) AS BIGINT), CAST(count(DISTINCT o_custkey) AS BIGINT)
      |  FROM orders TABLESAMPLE (50 ROWS)
      |  UNION ALL
      |  SELECT 'bucket', CAST(count(*) AS BIGINT), CAST(count(DISTINCT o_custkey) AS BIGINT)
      |  FROM orders TABLESAMPLE (BUCKET 2 OUT OF 10) REPEATABLE (7)
      |) u ORDER BY kind""".stripMargin)
  }

  /** #32c null semantics: null-safe equality (`<=>` / IS NOT DISTINCT FROM), null
    * propagation through comparisons, and null-aware conditionals — the three-valued
    * logic surface every engine must get right. Nulls manufactured via nullif (the base
    * tables are non-null). */
  def qNullSemantics(spark: SparkSession, dir: String): DataFrame = {
    val flagOrNull = nullif(col("l_returnflag"), lit("N"))
    val statusOrNull = nullif(col("l_linestatus"), lit("O"))
    TableIO.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      (flagOrNull <=> statusOrNull).as("nullsafe_eq"),
      (flagOrNull === statusOrNull).isNull.as("plain_eq_is_null"),
      (flagOrNull <=> lit(null)).as("is_null_via_nullsafe"),
      when(flagOrNull.isNull, "was_null").otherwise(flagOrNull).as("filled"))
  }

  val qNullSemanticsSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  nullif(l_returnflag, 'N') IS NOT DISTINCT FROM nullif(l_linestatus, 'O') AS nullsafe_eq,
      |  (nullif(l_returnflag, 'N') = nullif(l_linestatus, 'O')) IS NULL AS plain_eq_is_null,
      |  nullif(l_returnflag, 'N') IS NOT DISTINCT FROM NULL AS is_null_via_nullsafe,
      |  CASE WHEN nullif(l_returnflag, 'N') IS NULL THEN 'was_null'
      |       ELSE nullif(l_returnflag, 'N') END AS filled
      |FROM lineitem""".stripMargin

  /** #10 broadcast hash join: fact ⋈ broadcast dim. */
  def qJoinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val nation = TableIO.nation(spark, dir)
    TableIO.customer(spark, dir)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("bal"))
      .orderBy(col("n_name"))
  }

  val qJoinBroadcastSql: String =
    """SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** #11 fact-fact join (sort-merge / shuffled-hash territory): lineitem ⋈ orders. */
  def qJoinLarge(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir)
      .join(TableIO.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice")), 2).as("price_sum"))
      .orderBy(col("o_orderstatus"))

  val qJoinLargeSql: String =
    """SELECT o_orderstatus, count(*) AS n_lines, round(sum(l_extendedprice), 2) AS price_sum
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** #12a left outer join, null side aggregated. */
  def qJoinOuter(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = TableIO.orders(spark, dir).filter(col("o_totalprice") > 300000.0)
    TableIO.customer(spark, dir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_big_orders"), count(lit(1)).as("n_rows"))
      .orderBy(col("c_mktsegment"))
  }

  val qJoinOuterSql: String =
    """SELECT c_mktsegment, count(o_orderkey) AS n_big_orders, count(*) AS n_rows
      |FROM customer LEFT OUTER JOIN orders
      |  ON c_custkey = o_custkey AND o_totalprice > 300000.0
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** #12b full outer join over two key sets with partial overlap. */
  def qJoinFull(spark: SparkSession, dir: String): DataFrame = {
    val s = TableIO.supplier(spark, dir).select(col("s_nationkey").as("k")).distinct()
    val c = TableIO.customer(spark, dir).filter(col("c_custkey") <= 50)
      .select(col("c_nationkey").as("k2")).distinct()
    s.join(c, col("k") === col("k2"), "full_outer")
      .select(coalesce(col("k"), lit(-1)).as("supp_nk"), coalesce(col("k2"), lit(-1)).as("cust_nk"))
      .orderBy(col("supp_nk"), col("cust_nk"))
  }

  val qJoinFullSql: String =
    """SELECT coalesce(k, -1) AS supp_nk, coalesce(k2, -1) AS cust_nk
      |FROM (SELECT DISTINCT s_nationkey AS k FROM supplier) s
      |FULL OUTER JOIN (SELECT DISTINCT c_nationkey AS k2 FROM customer WHERE c_custkey <= 50) c
      |  ON k = k2
      |ORDER BY supp_nk, cust_nk""".stripMargin

  /** #13 left-semi join (EXISTS). */
  def qJoinSemi(spark: SparkSession, dir: String): DataFrame = {
    val returned = TableIO.lineitem(spark, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    TableIO.orders(spark, dir)
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  val qJoinSemiSql: String =
    """SELECT o_orderpriority, count(*) AS n FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** #14 left-anti join (NOT EXISTS). */
  def qJoinAnti(spark: SparkSession, dir: String): DataFrame = {
    val li = TableIO.lineitem(spark, dir).select(col("l_orderkey"))
    TableIO.orders(spark, dir)
      .join(li, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  val qJoinAntiSql: String =
    """SELECT o_orderstatus, count(*) AS n FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** #15 non-equi join (BroadcastNestedLoopJoin analog) — kept to dims so NLJ is the right plan. */
  def qJoinNonEqui(spark: SparkSession, dir: String): DataFrame = {
    val n = TableIO.nation(spark, dir)
    val r = TableIO.region(spark, dir)
    n.join(broadcast(r), col("n_regionkey") < col("r_regionkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n_higher_regions"))
      .orderBy(col("n_name"))
  }

  val qJoinNonEquiSql: String =
    """SELECT n_name, count(*) AS n_higher_regions
      |FROM nation JOIN region ON n_regionkey < r_regionkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** #16 cartesian product (dims only — a cross join of facts would be a plan bug). */
  def qCross(spark: SparkSession, dir: String): DataFrame =
    TableIO.region(spark, dir).crossJoin(TableIO.nation(spark, dir))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))

  val qCrossSql: String =
    "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name"

  /** #17a window rank: top-3 lineitems by price within each return flag. */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    TableIO.lineitem(spark, dir)
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .select(col("l_returnflag"), col("rnk"), col("l_orderkey"), col("l_extendedprice"))
      .orderBy(col("l_returnflag"), col("rnk"))
  }

  val qWindowRankSql: String =
    """SELECT l_returnflag, rnk, l_orderkey, l_extendedprice FROM (
      |  SELECT l_returnflag, l_orderkey, l_extendedprice,
      |    rank() OVER (PARTITION BY l_returnflag
      |                 ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rnk
      |  FROM lineitem) t
      |WHERE rnk <= 3 ORDER BY l_returnflag, rnk""".stripMargin

  /** #17d full ranking-function family over one window (dense_rank/percent_rank/ntile/
    * cume_dist/first/last/nth) — the rest of the reference's ColumnarWindowExec surface. */
  def qWindowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val framed = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    TableIO.orders(spark, dir)
      .filter(col("o_custkey") <= 100)
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("prnk", round(percent_rank().over(w), 6))
      .withColumn("tile4", ntile(4).over(w))
      .withColumn("cdist", round(cume_dist().over(w), 6))
      .withColumn("top_key", first_value(col("o_orderkey")).over(framed))
      .withColumn("bottom_key", last_value(col("o_orderkey")).over(framed))
      .withColumn("second_key", nth_value(col("o_orderkey"), 2).over(framed))
      .select(col("o_orderpriority"), col("o_orderkey"), col("drnk"), col("prnk"),
        col("tile4"), col("cdist"), col("top_key"), col("bottom_key"), col("second_key"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  val qWindowFuncsSql: String =
    """SELECT o_orderpriority, o_orderkey,
      |  CAST(dense_rank() OVER w AS INT) AS drnk,
      |  round(percent_rank() OVER w, 6) AS prnk,
      |  CAST(ntile(4) OVER w AS INT) AS tile4,
      |  round(cume_dist() OVER w, 6) AS cdist,
      |  first_value(o_orderkey) OVER wf AS top_key,
      |  last_value(o_orderkey) OVER wf AS bottom_key,
      |  nth_value(o_orderkey, 2) OVER wf AS second_key
      |FROM orders WHERE o_custkey <= 100
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey),
      |  wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** #17b running aggregate per key (rows frame). */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    TableIO.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 3)
      .withColumn("running_qty", round(sum(col("l_quantity")).over(w), 2))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
  }

  val qWindowRunningSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  round(sum(l_quantity) OVER (PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
      |FROM lineitem WHERE l_suppkey <= 3""".stripMargin

  /** #17e RANGE window frame: value-based trailing window (peers by ORDER-BY value, not
    * row position) — a 10-minute trailing sum per user over event time. */
  def qWindowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_timestamp(col("ts")))
      .rangeBetween(-600, Window.currentRow)
    TableIO.events(spark, dir)
      .filter(col("user_id") <= 50)
      .withColumn("trailing_10m", round(sum(col("value")).over(w), 2))
      .select(col("event_id"), col("user_id"), col("trailing_10m"))
  }

  val qWindowRangeFrameSql: String =
    """SELECT event_id, user_id,
      |  round(sum(value) OVER (PARTITION BY user_id
      |    ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW), 2) AS trailing_10m
      |FROM events WHERE user_id <= 50""".stripMargin

  /** #12b right-outer join (the reference's ColumnarSortMergeJoin covers RightOuter;
    * unmatched customers keep a zero order count via count(o_orderkey) null-skipping). */
  def qJoinRightOuter(spark: SparkSession, dir: String): DataFrame =
    TableIO.orders(spark, dir).filter(col("o_totalprice") > 150000)
      .join(TableIO.customer(spark, dir),
        col("o_custkey") === col("c_custkey"), "right_outer")
      .groupBy(col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_big_orders"), count(lit(1)).as("n_rows"))
      .orderBy(col("c_mktsegment"))

  val qJoinRightOuterSql: String =
    """SELECT c_mktsegment, count(o_orderkey) AS n_big_orders, count(*) AS n_rows
      |FROM (SELECT * FROM orders WHERE o_totalprice > 150000) o
      |RIGHT JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** #17c lag/lead over an event stream per user. */
  def qWindowLagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    TableIO.events(spark, dir)
      .withColumn("prev_event", coalesce(lag(col("event_id"), 1).over(w), lit(-1L)))
      .withColumn("next_type", coalesce(lead(col("event_type"), 1).over(w), lit("none")))
      .filter(col("user_id") <= 20)
      .select(col("user_id"), col("event_id"), col("prev_event"), col("next_type"))
  }

  val qWindowLagLeadSql: String =
    """SELECT user_id, event_id,
      |  coalesce(lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), -1) AS prev_event,
      |  coalesce(lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 'none') AS next_type
      |FROM events WHERE user_id <= 20""".stripMargin

  /** #18 distinct. */
  def qDistinct(spark: SparkSession, dir: String): DataFrame =
    TableIO.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus")).distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val qDistinctSql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** #20 range source with computed columns. */
  def qRange(spark: SparkSession, dir: String): DataFrame = {
    val _ = dir
    spark.range(0, 1000)
      .select(col("id"), (col("id") * 3 % 7).as("m"), (col("id") * col("id")).as("sq"))
  }

  val qRangeSql: String =
    "SELECT range AS id, range * 3 % 7 AS m, range * range AS sq FROM range(0, 1000)"

  /** #21 generate/explode: tokenize documents and count tokens (GenerateExec analog). */
  def qExplode(spark: SparkSession, dir: String): DataFrame =
    TableIO.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  val qExplodeSql: String =
    """SELECT token, count(*) AS n FROM (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  /** #21b posexplode: ordinal-preserving generate (position is part of the output). */
  def qPosexplode(spark: SparkSession, dir: String): DataFrame =
    TableIO.documents(spark, dir)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "tok")
      .orderBy(col("doc_id"), col("pos"))

  val qPosexplodeSql: String =
    """SELECT doc_id, CAST(i - 1 AS INT) AS pos, t[i] AS tok FROM (
      |  SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 20))
      |ORDER BY doc_id, pos""".stripMargin

  /**
   * #17e native per-key top-k via graft's custom operator (TopKPerKeyNode -> partial/final
   * bounded-heap execs). Equivalent to the row_number window form the oracle uses, but the
   * shuffle carries <= k rows per key per map partition instead of every row.
   */
  def qTopkPerKey(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.TopKPerKey
    val o = TableIO.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    TopKPerKey(o, Seq("o_orderpriority"), Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
  }

  val qTopkPerKeySql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin

  /**
   * #13b scalar + correlated subqueries through the SQL front door (SubqueryExec /
   * ScalarSubquery expressions — shapes the DataFrame API lowers to joins, proven here in
   * their native SQL form). Uncorrelated scalar: global avg; correlated EXISTS per row.
   */
  // the SAME SQL text runs on both engines — defined once so they cannot drift
  val qScalarSubquerySql: String =
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
      |ORDER BY o_orderkey""".stripMargin

  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    TableIO.orders(spark, dir).createOrReplaceTempView("orders")
    TableIO.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(qScalarSubquerySql)
  }

  /**
   * #15b binned range join: customers falling in each supplier's +/-500 balance band,
   * via RangeJoin (equi-join on bin ids — the scale path). The oracle is the plain
   * non-equi BETWEEN join; results must be identical.
   */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val points = TableIO.customer(spark, dir).select(col("c_custkey"), col("c_acctbal"))
    val intervals = TableIO.supplier(spark, dir).select(col("s_suppkey"),
      (col("s_acctbal") - 500.0).as("lo"), (col("s_acctbal") + 500.0).as("hi"))
    RangeJoin.pointInInterval(points, intervals, "c_acctbal", "lo", "hi", binWidth = 1000.0)
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_in_band"))
      .orderBy(col("s_suppkey"))
  }

  val qRangeJoinSql: String =
    """SELECT s_suppkey, count(*) AS n_in_band
      |FROM supplier JOIN customer
      |  ON c_acctbal BETWEEN s_acctbal - 500.0 AND s_acctbal + 500.0
      |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin

  /**
   * #29a salted skew join on the driver tables: orders' hottest customer joined via
   * SkewJoin.saltedInner; the oracle is the PLAIN join (salting must be invisible in the
   * result). Aggregated per status for a stable, small output.
   */
  def qSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val probe = TableIO.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"))
    val build = TableIO.customer(spark, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    SkewJoin.saltedInner(probe, build, "o_custkey", col("o_orderkey"), salts = 8)
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"), col("o_orderstatus"))
  }

  val qSkewJoinSql: String =
    """SELECT c_mktsegment, o_orderstatus, count(*) AS n
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /**
   * #29 exchange reuse: a self-join on the same shuffle key — both sides of the join are
   * the identical scan+shuffle subplan, so Spark plans one Exchange and a ReusedExchange
   * (spec asserts it). Semantically: distribution of same-customer order-status pairs.
   */
  def qShuffleReuse(spark: SparkSession, dir: String): DataFrame = {
    val o = TableIO.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"))
    val a = o.select(col("o_custkey"), col("o_orderkey").as("ka"), col("o_orderstatus").as("sa"))
    val b = o.select(col("o_custkey"), col("o_orderkey").as("kb"), col("o_orderstatus").as("sb"))
    a.join(b, Seq("o_custkey"))
      .filter(col("ka") < col("kb"))
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("sa"), col("sb"))
  }

  val qShuffleReuseSql: String =
    """SELECT a.o_orderstatus AS sa, b.o_orderstatus AS sb, count(*) AS n_pairs
      |FROM orders a JOIN orders b
      |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
      |GROUP BY sa, sb
      |ORDER BY sa, sb""".stripMargin

  /**
   * #14b null-aware anti join — the NOT IN three-valued-logic trap. `x NOT IN (subquery)`
   * is NOT a plain anti join: one NULL in the subquery domain makes the predicate UNKNOWN
   * for every non-matching row, so the whole result is empty. Spark plans this as a
   * null-aware anti join (single-column NAAJ lowers to a broadcast hash join with
   * isNullAwareAntiJoin=true); getting it wrong silently returns rows a correct engine
   * must drop. Same SQL text runs on both engines; the null-free twin proves the query
   * is otherwise non-trivial.
   */
  val qNotInNullsSql: String =
    """SELECT
      |  (SELECT count(*) FROM orders
      |   WHERE o_custkey NOT IN (SELECT nullif(c_custkey, 7) FROM customer
      |                           WHERE c_custkey <= 50)) AS n_with_null_domain,
      |  (SELECT count(*) FROM orders
      |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
      |                           WHERE c_custkey <= 50)) AS n_null_free""".stripMargin

  def qNotInNulls(spark: SparkSession, dir: String): DataFrame = {
    TableIO.orders(spark, dir).createOrReplaceTempView("orders")
    TableIO.customer(spark, dir).createOrReplaceTempView("customer")
    spark.sql(qNotInNullsSql)
  }

  /** #8e unpivot/melt (the inverse of pivot — Spark's native `unpivot`, which lowers to
    * Expand): wide measures to (key, metric, value) long form. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    TableIO.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_custkey").cast("double").as("custkey_d"),
        (col("o_totalprice") / 2).as("half_price"))
      .unpivot(Array(col("o_orderkey")),
        Array(col("o_totalprice"), col("custkey_d"), col("half_price")),
        "metric", "value")

  val qUnpivotSql: String =
    """SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS value FROM orders
      |UNION ALL
      |SELECT o_orderkey, 'custkey_d', CAST(o_custkey AS DOUBLE) FROM orders
      |UNION ALL
      |SELECT o_orderkey, 'half_price', o_totalprice / 2 FROM orders""".stripMargin

  /** #13c LATERAL join (correlated subquery in FROM, with ORDER BY + LIMIT — the
    * per-group top-k idiom in pure SQL). Spark decorrelates it; same text both engines. */
  val qLateralSql: String =
    """SELECT n_name, t.top_cust, t.bal FROM nation,
      |LATERAL (SELECT c_name AS top_cust, c_acctbal AS bal FROM customer
      |         WHERE c_nationkey = n_nationkey
      |         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      |ORDER BY n_name, bal DESC, top_cust""".stripMargin

  def qLateral(spark: SparkSession, dir: String): DataFrame = {
    TableIO.nation(spark, dir).createOrReplaceTempView("nation")
    TableIO.customer(spark, dir).createOrReplaceTempView("customer")
    spark.sql(qLateralSql)
  }

  /** Recursive CTE (WITH RECURSIVE → native UnionLoop, new in Spark 4.x): ancestry
    * walk over the binary-tree hierarchy parent(k) = (k−1) div 2 imposed on nation —
    * depth and root-to-node path per row. Bounded-depth recursion (⌈log₂ 25⌉ rounds);
    * each round is one equi-join of the frontier against the dimension, so the shape
    * scales exactly like the unrolled-round graph operators but is AUTHORED as the
    * standard SQL every warehouse user writes. Same text runs on both engines. */
  val qRecursiveCteSql: String =
    """WITH RECURSIVE org AS (
      |  SELECT n_nationkey AS key, n_name AS name, 0 AS depth,
      |         CAST(n_name AS STRING) AS path
      |  FROM nation WHERE n_nationkey = 0
      |  UNION ALL
      |  SELECT n.n_nationkey, n.n_name, o.depth + 1,
      |         o.path || ' > ' || n.n_name
      |  FROM nation n JOIN org o
      |    ON o.key = CAST(floor((n.n_nationkey - 1) / 2.0) AS INTEGER)
      |  WHERE n.n_nationkey > 0)
      |SELECT key, name, depth, path FROM org ORDER BY key""".stripMargin

  def qRecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    TableIO.nation(spark, dir).createOrReplaceTempView("nation")
    spark.sql(qRecursiveCteSql)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_recursive_cte" -> qRecursiveCte _,
    "q_not_in_nulls" -> qNotInNulls _, "q_unpivot" -> qUnpivot _, "q_lateral" -> qLateral _,
    "q_scan_pushdown" -> qScanPushdown _, "q_filter" -> qFilter _, "q_project" -> qProject _,
    "q_sort" -> qSort _, "q_topn" -> qTopN _, "q_limit" -> qLimit _,
    "q_rollup" -> qRollup _, "q_grouping_sets" -> qGroupingSets _, "q_cube" -> qCube _, "q_union" -> qUnion _, "q_setops" -> qSetOps _, "q_setops_all" -> qSetOpsAll _, "q_limit_offset" -> qLimitOffset _, "q_tablesample" -> qTablesample _, "q_null_semantics" -> qNullSemantics _,
    "q_join_broadcast" -> qJoinBroadcast _, "q_join_large" -> qJoinLarge _,
    "q_join_outer" -> qJoinOuter _, "q_join_full" -> qJoinFull _,
    "q_join_semi" -> qJoinSemi _, "q_join_anti" -> qJoinAnti _,
    "q_join_nonequi" -> qJoinNonEqui _, "q_cross" -> qCross _,
    "q_window_rank" -> qWindowRank _, "q_window_funcs" -> qWindowFuncs _, "q_window_running" -> qWindowRunning _, "q_window_range_frame" -> qWindowRangeFrame _, "q_join_right" -> qJoinRightOuter _,
    "q_window_laglead" -> qWindowLagLead _, "q_distinct" -> qDistinct _,
    "q_range" -> qRange _, "q_explode" -> qExplode _, "q_posexplode" -> qPosexplode _, "q_shuffle_reuse" -> qShuffleReuse _, "q_skew_join" -> qSkewJoin _, "q_topk_per_key" -> qTopkPerKey _, "q_range_join" -> qRangeJoin _, "q_scalar_subquery" -> qScalarSubquery _)

  val oracles: Map[String, String] = Map(
    "q_recursive_cte" -> qRecursiveCteSql,
    "q_not_in_nulls" -> qNotInNullsSql, "q_unpivot" -> qUnpivotSql, "q_lateral" -> qLateralSql,
    "q_scan_pushdown" -> qScanPushdownSql, "q_filter" -> qFilterSql, "q_project" -> qProjectSql,
    "q_sort" -> qSortSql, "q_topn" -> qTopNSql, "q_limit" -> qLimitSql,
    "q_rollup" -> qRollupSql, "q_grouping_sets" -> qGroupingSetsSql, "q_cube" -> qCubeSql, "q_union" -> qUnionSql, "q_setops" -> qSetOpsSql, "q_setops_all" -> qSetOpsAllSql, "q_limit_offset" -> qLimitOffsetSql, "q_null_semantics" -> qNullSemanticsSql,
    "q_join_broadcast" -> qJoinBroadcastSql, "q_join_large" -> qJoinLargeSql,
    "q_join_outer" -> qJoinOuterSql, "q_join_full" -> qJoinFullSql,
    "q_join_semi" -> qJoinSemiSql, "q_join_anti" -> qJoinAntiSql,
    "q_join_nonequi" -> qJoinNonEquiSql, "q_cross" -> qCrossSql,
    "q_window_rank" -> qWindowRankSql, "q_window_funcs" -> qWindowFuncsSql, "q_window_running" -> qWindowRunningSql, "q_window_range_frame" -> qWindowRangeFrameSql, "q_join_right" -> qJoinRightOuterSql,
    "q_window_laglead" -> qWindowLagLeadSql, "q_distinct" -> qDistinctSql,
    "q_range" -> qRangeSql, "q_explode" -> qExplodeSql, "q_posexplode" -> qPosexplodeSql, "q_shuffle_reuse" -> qShuffleReuseSql, "q_skew_join" -> qSkewJoinSql, "q_topk_per_key" -> qTopkPerKeySql, "q_range_join" -> qRangeJoinSql, "q_scalar_subquery" -> qScalarSubquerySql)
}
