package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * TPC-H q2 / q11 / q16 / q20 — the partsupp family, closing the reference's last
 * uncovered TPC-H surface (gazelle_plugin: native-sql-engine/core/src/test/scala/com/
 * intel/oap/tpc/h/TPCHSuite.scala runs all 22; TPCHTableGen.scala:153 generates
 * partsupp as part x 4 suppliers).
 *
 * The driver schema ships no partsupp file, so the table is SYNTHESIZED deterministically
 * from `part` x 4 suppliers with the dbgen supplier-spread formula (TPC-H spec 4.2.3 /
 * dbgen build.c PS_SUPPKEY: supplier i of part p is
 * `(p + i*(S/4 + p div S)) mod S`, adapted to this schema's 0-based keys) — identical
 * arithmetic in the Spark generator below and in each oracle's `partsupp` CTE, so DuckDB
 * and Spark see the SAME table without materializing anything. Supply costs are generated
 * in integer CENTS and only divided by 100.0 at the output edge: every aggregate and
 * comparison is exact int64 arithmetic, immune to FP association order on either engine.
 *
 * Scale: partsupp is 4x part (a linear-in-SF fact table, ~800M rows at TPC-H SF100K's
 * scale target). The generator is a map-only expand over the part scan (one broadcast of
 * the 1-row supplier-count frame); every query below joins it on its natural keys and
 * lets AQE pick broadcast vs shuffle exactly as the hand-written TPC-H pack does.
 */
object PartsuppQueries {

  /** Deterministic partsupp: (ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_cents).
    * Map-only: part scan x broadcast 1-row count x broadcast 4-row range. */
  def partsupp(spark: SparkSession, dir: String): DataFrame = {
    val sCnt = TableIO.supplier(spark, dir).agg(count(lit(1)).as("s"))
    val quad = spark.range(4).toDF("i")
    TableIO.part(spark, dir).select(col("p_partkey"))
      .crossJoin(broadcast(sCnt))
      .crossJoin(broadcast(quad))
      .select(
        col("p_partkey").as("ps_partkey"),
        ((col("p_partkey") + col("i") *
          (floor(col("s") / 4).cast("long") + floor(col("p_partkey") / col("s")).cast("long")))
          % col("s")).cast("long").as("ps_suppkey"),
        ((col("p_partkey") * 7 + col("i") * 3001 + 17) % 9999 + 1).cast("long").as("ps_availqty"),
        ((col("p_partkey") * 2097 + col("i") * 21001 + 5) % 90000 + 10000).cast("long")
          .as("ps_supplycost_cents"))
  }

  /** The oracle-side mirror of [[partsupp]] — prefixed to every partsupp oracle. */
  private val psCte: String =
    """WITH s_cnt AS (SELECT count(*) AS s FROM supplier),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |    CAST((p_partkey + i.i * (CAST(floor(s / 4) AS BIGINT) + CAST(floor(p_partkey / s) AS BIGINT))) % s AS BIGINT) AS ps_suppkey,
      |    CAST((p_partkey * 7 + i.i * 3001 + 17) % 9999 + 1 AS BIGINT) AS ps_availqty,
      |    CAST((p_partkey * 2097 + i.i * 21001 + 5) % 90000 + 10000 AS BIGINT) AS ps_supplycost_cents
      |  FROM part CROSS JOIN s_cnt CROSS JOIN (VALUES (0),(1),(2),(3)) AS i(i))
      |""".stripMargin

  /**
   * q2: minimum-cost supplier — for each STANDARD part of size <= 15, the European
   * supplier(s) offering it at the region-wide minimum cost. The correlated scalar
   * subquery of the spec text becomes a window min over the region-restricted cost
   * frame: ONE shuffle on ps_partkey instead of a per-part subquery re-scan.
   */
  def q2(spark: SparkSession, dir: String): DataFrame = {
    val eu = TableIO.supplier(spark, dir)
      .join(broadcast(TableIO.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(TableIO.region(spark, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val parts = TableIO.part(spark, dir)
      .filter(col("p_size") <= 15 && col("p_type") === "STANDARD")
      .select(col("p_partkey"))
    // part filter first (selectivity ~6%), THEN the supplier-region join; the window
    // min runs over the already-small (part x 4-supplier x region) frame.
    val costs = partsupp(spark, dir)
      .join(parts, col("ps_partkey") === col("p_partkey"))
      .join(eu, col("ps_suppkey") === col("s_suppkey"))
    val w = Window.partitionBy(col("ps_partkey"))
    costs.withColumn("minc", min(col("ps_supplycost_cents")).over(w))
      .filter(col("ps_supplycost_cents") === col("minc"))
      .select(round(col("s_acctbal"), 2).as("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), round(col("ps_supplycost_cents") / 100.0, 2).as("ps_supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  def q2Sql: String = psCte +
    """SELECT round(s.s_acctbal, 2) AS s_acctbal, s.s_name, n.n_name, p.p_partkey,
      |  round(ps.ps_supplycost_cents / 100.0, 2) AS ps_supplycost
      |FROM part p JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
      |JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |JOIN region r ON r.r_regionkey = n.n_regionkey
      |WHERE p.p_size <= 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
      |  AND ps.ps_supplycost_cents = (
      |    SELECT min(ps2.ps_supplycost_cents)
      |    FROM partsupp ps2 JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
      |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
      |    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
      |    WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /**
   * q11: important stock — parts whose total supply value held by NATION_7 suppliers
   * exceeds a 1/n-scaled fraction of that nation's total (the spec's 0.0001/SF knob,
   * made data-adaptive as 25/|partsupp| so the query returns rows at every SF).
   * All value arithmetic is exact int64 cents; only the emitted column divides by 100.
   */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    val ps = partsupp(spark, dir)
    val nat = ps
      .join(TableIO.supplier(spark, dir), col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(TableIO.nation(spark, dir).filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("ps_partkey"), (col("ps_supplycost_cents") * col("ps_availqty")).as("v"))
    val total = nat.agg(sum(col("v")).as("tot"))
      .crossJoin(ps.agg(count(lit(1)).as("nps")))
      .select((col("tot") * lit(25.0) / col("nps")).as("threshold"))
    nat.groupBy(col("ps_partkey")).agg(sum(col("v")).as("val_cents"))
      .crossJoin(broadcast(total))
      .filter(col("val_cents") > col("threshold"))
      .select(col("ps_partkey"),
        round(col("val_cents").cast("double") / 100.0, 2).as("value_"))
      .orderBy(col("value_").desc, col("ps_partkey"))
  }

  def q11Sql: String = psCte +
    """SELECT ps_partkey,
      |  round(CAST(sum(ps_supplycost_cents * ps_availqty) AS DOUBLE) / 100.0, 2) AS value_
      |FROM partsupp JOIN supplier ON s_suppkey = ps_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |WHERE n_name = 'NATION_7'
      |GROUP BY ps_partkey
      |HAVING sum(ps_supplycost_cents * ps_availqty) > (
      |  SELECT sum(ps_supplycost_cents * ps_availqty) * 25.0 / (SELECT count(*) FROM partsupp)
      |  FROM partsupp JOIN supplier ON s_suppkey = ps_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  WHERE n_name = 'NATION_7')
      |ORDER BY value_ DESC, ps_partkey""".stripMargin

  /**
   * q16: parts/supplier relationship — distinct supplier count per (brand, type, size)
   * bucket, excluding one brand, one type class and suppliers in deficit (the spec's
   * complaints-comment filter, adapted to this schema's columns as s_acctbal < 0).
   * NOT IN is a left-anti join (the subquery's key is non-null by construction).
   */
  def q16(spark: SparkSession, dir: String): DataFrame = {
    val excluded = TableIO.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    partsupp(spark, dir)
      .join(TableIO.part(spark, dir), col("ps_partkey") === col("p_partkey"))
      .filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .join(broadcast(excluded), col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  def q16Sql: String = psCte +
    """SELECT p_brand, p_type, p_size,
      |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
      |FROM partsupp JOIN part ON p_partkey = ps_partkey
      |WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
      |  AND p_size IN (1,4,9,14,19,23,36,45)
      |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1,2,3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /**
   * q20: potential part promotion — NATION_3 suppliers holding excess stock (availqty
   * more than half the 1997 shipped quantity) of any 'small%' part. The spec's
   * correlated scalar sum becomes a pre-aggregated (l_partkey, l_suppkey) frame joined
   * on both keys — one map-side-combined shuffle of lineitem instead of a per-row
   * subquery; parts with no 1997 shipments drop out via the inner join, matching the
   * NULL-comparison semantics of the correlated form.
   */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    val lq = TableIO.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val smallParts = TableIO.part(spark, dir)
      .filter(col("p_name").like("small%")).select(col("p_partkey"))
    val excess = partsupp(spark, dir)
      .join(smallParts, col("ps_partkey") === col("p_partkey"), "left_semi")
      .join(lq, col("ps_partkey") === col("l_partkey") && col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty") > lit(0.5) * col("qty"))
      .select(col("ps_suppkey")).distinct()
    TableIO.supplier(spark, dir)
      .join(broadcast(TableIO.nation(spark, dir).filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select(col("s_name"), round(col("s_acctbal"), 2).as("s_acctbal"))
      .orderBy(col("s_name"))
  }

  def q20Sql: String = psCte +
    """SELECT s_name, round(s_acctbal, 2) AS s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_3' AND s_suppkey IN (
      |  SELECT ps_suppkey FROM partsupp
      |  JOIN (SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      |        FROM lineitem
      |        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |          AND l_shipdate < TIMESTAMP '1998-01-01'
      |        GROUP BY 1,2) lq
      |    ON lq.l_partkey = ps_partkey AND lq.l_suppkey = ps_suppkey
      |  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      |    AND ps_availqty > 0.5 * qty)
      |ORDER BY s_name""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q2" -> q2 _, "tpch_q11" -> q11 _, "tpch_q16" -> q16 _, "tpch_q20" -> q20 _)

  val oracles: Map[String, String] = Map(
    "tpch_q2" -> q2Sql, "tpch_q11" -> q11Sql, "tpch_q16" -> q16Sql, "tpch_q20" -> q20Sql)
}
