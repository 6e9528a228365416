package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bloom-filter semi-join reduction: filter the huge probe side with a broadcast Bloom
 * filter of the build side's keys BEFORE the real join's shuffle — the classic 100 TB
 * shuffle-byte saver when the join is selective (most probe rows have no partner).
 * Spark's AQE injects this pattern itself in some shapes (runtime bloom pruning,
 * plan-spec'd in ScaleSpec); this operator is the EXPLICIT form the user controls:
 * always on, sized by the caller, applied at the earliest point of the plan so the
 * filter rides directly above the probe scan.
 *
 * Semantics: `bloomSemiJoin` returns exactly the inner equi-join (the Bloom filter
 * admits false positives — expected fraction `fpp` — which the real join then drops;
 * nothing true is ever filtered). The win is the shuffle writing only
 * |matching| + fpp·|probe| rows instead of |probe|.
 *
 * Scale shape: ONE aggregation over the build side produces a fixed-size filter
 * (`bloom_filter_agg`, sized numItems·fpp), broadcast to every probe task as a 1-row
 * frame; `might_contain` is a codegen expression evaluated inside the probe's scan
 * stage. The build side is read twice (filter build + join) — at a selective join
 * that is far cheaper than shuffling the unfiltered probe.
 */
object BloomJoin {

  /**
   * Inner equi-join of huge `probe` with `build` on `key`, with the probe pre-filtered
   * by a broadcast Bloom filter of build keys. `expectedItems` sizes the filter
   * (overestimate freely — size grows linearly, lookup stays O(k)); `fpp` is the
   * false-positive rate the later join absorbs.
   */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.graft.BloomFunctions.{bloomFilterAgg, mightContain}
    val numBits = math.max(64L,
      (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // `might_contain` requires a CONSTANT (or scalar-subquery) filter, so the built
    // filter lands on the driver as one fixed-size binary (numBits/8 bytes — a size the
    // CALLER chose, independent of either table's row count; ~0.9 MB at 1M items /
    // 3% fpp) and ships to every probe task as a literal, the plain-code twin of the
    // optimizer's own ScalarSubquery wrapping in InjectRuntimeFilter.
    val bytes = build
      .agg(bloomFilterAgg(xxhash64(col(key)), expectedItems, numBits).as("_bf"))
      .head().getAs[Array[Byte]]("_bf")
    probe
      .filter(mightContain(lit(bytes), xxhash64(col(key))))
      .join(build, key)
  }

  /**
   * `q_bloom_join`: lineitem probed against a selective order subset (urgent 1995
   * orders, ~3% of the table) through the explicit Bloom reduction; the result is
   * EXACTLY the plain inner join (false positives die in the real join), so the DuckDB
   * oracle is the plain join — hash-equality proves the reduction is lossless.
   */
  def qBloomJoin(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val li = graft.sources.TableIO.lineitem(spark, dir)
    val o = graft.sources.TableIO.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        year(col("o_orderdate")) === 1995)
      .select(col("o_orderkey"), col("o_orderpriority"))
    bloomSemiJoin(li.withColumnRenamed("l_orderkey", "o_orderkey"), o, "o_orderkey",
        expectedItems = 100000L)
      .groupBy(month(to_date(col("l_shipdate"))).as("mon"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .orderBy(col("mon"))
  }

  val qBloomJoinSql: String =
    """SELECT CAST(month(CAST(l.l_shipdate AS DATE)) AS INT) AS mon,
      |       count(*) AS n, round(sum(l.l_quantity), 2) AS qty
      |FROM lineitem l
      |JOIN (SELECT o_orderkey FROM orders
      |      WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1995) o
      |  ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  val all: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    "q_bloom_join" -> (qBloomJoin(_, _)))

  val oracles: Map[String, String] = Map(
    "q_bloom_join" -> qBloomJoinSql)
}
