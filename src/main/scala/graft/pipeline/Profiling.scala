package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.sources.TableIO

/**
 * Table profiling (the ANALYZE/data-quality pass every ingestion pipeline runs first):
 * per-column row/null counts, distinct counts, numeric and lexicographic extrema —
 * computed as a wide aggregate row, then unpivoted to one row per column with `stack`.
 * The approx default (HLL++) is strictly ONE scan; exact ndv adds one COLUMN-PRUNED scan
 * per profiled column, whose combined bytes ~ the same single full-width pass — never a
 * per-column re-read of the whole table, which at 100 TB is the difference between
 * minutes and days.
 *
 * Exact ndv mode computes one single-distinct aggregate subtree per column instead of a
 * combined multi-distinct aggregate: the combined form expands the input via Catalyst's
 * Expand operator (one full duplicate per distinct column), the per-column form plans
 * Expand-free and the subtrees share the scan. The at-scale default is still
 * `approx_count_distinct` (HLL++, ONE pass, no per-column subtrees) — the facade
 * (Graft.profile) defaults to it; the registered query uses the exact form for the
 * DuckDB hash-match and ProfilingSpec bounds the approx error.
 */
object Profiling {

  /** One row per column: (column, n_rows, n_nonnull, ndv, min_num, max_num, min_str, max_str). */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "cols must not be empty")
    // fanOut: a small table arrives as ONE parquet split, which would run the whole
    // partial aggregate on a single core; at production scale the scan has >=
    // parallelism splits and this is a no-op.
    val fan = TableIO.fanOut(df)
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: (cols.flatMap { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        (if (isNum) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"${c}__min_num"),
        (if (isNum) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"${c}__max_num"),
        (if (isNum) lit(null).cast("string") else min(col(c)).cast("string"))
          .as(s"${c}__min_str"),
        (if (isNum) lit(null).cast("string") else max(col(c)).cast("string"))
          .as(s"${c}__max_str"))
    } ++ (if (!exact) cols.map(c => approx_count_distinct(col(c)).as(s"${c}__ndv")) else Nil))
    val base = fan.agg(aggs.head, aggs.tail: _*)
    // Exact ndv: ONE single-distinct aggregate subtree per column, cross-joined onto the
    // base row (all single-row frames). A combined multi-distinct aggregate would expand
    // the input via Catalyst Expand — one full duplicate per distinct column — and key
    // the partial aggregate on the null-padded width of ALL columns at once. Single-
    // distinct aggregates plan Expand-free (partial dedup on just their own column), the
    // subtrees share one scan (column pruning; locally they reuse the fanOut exchange via
    // ReusedExchange), and their stages run concurrently. Measured at sf0.1 (5-column
    // lineitem profile): 7.5 s -> ~1 s. The approx mode stays a single pass with HLL++.
    // ndv subtrees read `df` unfanned: column pruning gives each a scan of ONE column and
    // its partial dedup shrinks rows before any shuffle — a round-robin fanOut here would
    // shuffle the full column once more per subtree for no reduction. The independent
    // subtree stages execute concurrently.
    val wide =
      if (exact)
        cols.map(c => df.agg(countDistinct(col(c)).as(s"${c}__ndv")))
          .foldLeft(base)(_.crossJoin(_))
      else base
    // column names are spliced into SQL text: escape string-literal quotes and backticks
    // (profile is public API over arbitrary frames — "it's" or `a`b` must not break parse)
    def sqlLit(c: String): String = "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
    def id(c: String): String = "`" + c.replace("`", "``") + "`"
    val stacked = cols.map { c =>
      s"${sqlLit(c)}, ${id(c + "__nonnull")}, ${id(c + "__ndv")}, ${id(c + "__min_num")}, " +
        s"${id(c + "__max_num")}, ${id(c + "__min_str")}, ${id(c + "__max_str")}"
    }.mkString(", ")
    wide.selectExpr("n_rows",
        s"stack(${cols.size}, $stacked) AS (column, n_nonnull, ndv, min_num, max_num, min_str, max_str)")
      .select(col("column"), col("n_rows"), col("n_nonnull"), col("ndv"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }

  /** Driver-contract query: profile lineitem's key/measure/flag columns, including a
    * manufactured nullable column so null accounting is exercised. */
  def profileQuery(spark: SparkSession, dir: String): DataFrame =
    profile(
      TableIO.lineitem(spark, dir)
        .withColumn("flag_nullable", nullif(col("l_returnflag"), lit("N"))),
      Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "flag_nullable"))
      .orderBy(col("column"))

  val profileSql: String =
    """WITH src AS (
      |  SELECT *, nullif(l_returnflag, 'N') AS flag_nullable FROM lineitem
      |)
      |SELECT 'l_orderkey' AS "column", count(*) AS n_rows, count(l_orderkey) AS n_nonnull,
      |  count(DISTINCT l_orderkey) AS ndv, CAST(min(l_orderkey) AS DOUBLE) AS min_num,
      |  CAST(max(l_orderkey) AS DOUBLE) AS max_num,
      |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM src
      |UNION ALL
      |SELECT 'l_quantity', count(*), count(l_quantity), count(DISTINCT l_quantity),
      |  CAST(min(l_quantity) AS DOUBLE), CAST(max(l_quantity) AS DOUBLE), NULL, NULL FROM src
      |UNION ALL
      |SELECT 'l_extendedprice', count(*), count(l_extendedprice), count(DISTINCT l_extendedprice),
      |  CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE), NULL, NULL FROM src
      |UNION ALL
      |SELECT 'l_returnflag', count(*), count(l_returnflag), count(DISTINCT l_returnflag),
      |  NULL, NULL, min(l_returnflag), max(l_returnflag) FROM src
      |UNION ALL
      |SELECT 'flag_nullable', count(*), count(flag_nullable), count(DISTINCT flag_nullable),
      |  NULL, NULL, min(flag_nullable), max(flag_nullable) FROM src
      |ORDER BY "column"""".stripMargin

  // ---- mergeable distinct-count sketch rollup ------------------------------------------

  /**
   * Pre-aggregated HLL sketch table (Apache DataSketches, via Spark's native
   * `hll_sketch_agg`): one binary sketch per fine-grained dimension cell. This is the
   * lakehouse "sketch rollup" serving pattern — at 100 TB you count distincts ONCE at
   * the finest grain, persist the view-sized sketch table, and answer every coarser
   * rollup by merging sketches (`mergeSketches`) without ever rescanning the base.
   * Sketch union is associative/commutative and insensitive to row order, so serving
   * results are deterministic for a fixed input SET.
   */
  def buildSketches(df: DataFrame, dims: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Serve a coarser rollup from a sketch table: merge cells, estimate distinct count. */
  def mergeSketches(sketches: DataFrame, keepDims: Seq[String]): DataFrame =
    sketches.groupBy(keepDims.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false))).as("ndv_est"))

  /**
   * `q_hll_rollup`: distinct customers per order-status, served by merging per-(status,
   * year) sketches — never recounting the base. Rows-only (the DataSketches HLL binary
   * layout has no DuckDB twin); ProfilingSpec proves the estimate against the exact
   * count and the merge identity (union of cell sketches == whole-slice sketch).
   */
  def qHllRollup(spark: SparkSession, dir: String): DataFrame = {
    val o = TableIO.orders(spark, dir)
      .select(col("o_orderstatus"), year(col("o_orderdate")).as("yr"), col("o_custkey"))
    val cells = buildSketches(o, Seq("o_orderstatus", "yr"), "o_custkey")
    mergeSketches(cells, Seq("o_orderstatus"))
      .orderBy(col("o_orderstatus"))
  }

  // ---- mergeable histogram rollup with quantile serving --------------------------------

  /**
   * Equi-width histogram sketch table: exact bucket counts per fine-grained dimension
   * cell — the quantile twin of the HLL rollup above. Unlike KLL/t-digest, fixed-bucket
   * counts are EXACT integers, so merging (summing counts across cells) is lossless and
   * every serving answer is deterministic and SQL-checkable; the approximation lives
   * only in the final quantile read-out (bucket midpoint), with error bounded by the
   * bucket width. At 100 TB: one scan builds the cell histograms (map-side-combined
   * groupBy), the persisted sketch table is O(cells x buckets), and any coarser
   * quantile query is answered from it without rescanning the base.
   */
  def buildHistograms(df: DataFrame, dims: Seq[String], valueCol: String,
      width: Double, nBuckets: Int): DataFrame =
    df.groupBy(dims.map(col) :+
        least(lit(nBuckets - 1), floor(col(valueCol).cast("double") / width)).cast("int").as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))

  /**
   * Serve a coarser rollup: merge bucket counts, then read the approximate median as
   * the midpoint of the first bucket whose cumulative count crosses half the total.
   */
  def mergeHistograms(hist: DataFrame, keepDims: Seq[String], width: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val merged = hist.groupBy((keepDims.map(col) :+ col("bucket")): _*)
      .agg(sum(col("cnt")).as("cnt"))
    val byDim = Window.partitionBy(keepDims.map(col): _*)
    val cum = merged
      .withColumn("cum", sum(col("cnt")).over(byDim.orderBy(col("bucket"))))
      .withColumn("total", sum(col("cnt")).over(byDim))
    cum.filter(col("cum") >= col("total") * 0.5)
      .groupBy(keepDims.map(col): _*)
      .agg(max(col("total")).as("n"),
        round((min(col("bucket")) + 0.5) * width, 2).as("p50_est"))
  }

  /**
   * `q_hist_rollup`: median order total per status, served by merging per-(status, year)
   * histogram cells — never rescanning orders. Fully oracled: the bucket math is exact
   * integer counting, so DuckDB reproduces it bit-for-bit.
   */
  def qHistRollup(spark: SparkSession, dir: String): DataFrame = {
    val o = TableIO.orders(spark, dir)
      .select(col("o_orderstatus").as("status"), year(col("o_orderdate")).as("yr"),
        col("o_totalprice"))
    val cells = buildHistograms(o, Seq("status", "yr"), "o_totalprice",
      width = 5000.0, nBuckets = 200)
    mergeHistograms(cells, Seq("status"), width = 5000.0)
      .orderBy(col("status"))
  }

  val qHistRollupSql: String =
    """WITH cells AS (
      |  SELECT o_orderstatus AS status, EXTRACT(year FROM o_orderdate) AS yr,
      |    CAST(least(199, floor(CAST(o_totalprice AS DOUBLE) / 5000.0)) AS INT) AS bucket,
      |    count(*) AS cnt
      |  FROM orders GROUP BY 1, 2, 3),
      |merged AS (SELECT status, bucket, sum(cnt) AS cnt FROM cells GROUP BY 1, 2),
      |cum AS (
      |  SELECT status, bucket, cnt,
      |    sum(cnt) OVER (PARTITION BY status ORDER BY bucket) AS cum,
      |    sum(cnt) OVER (PARTITION BY status) AS total
      |  FROM merged)
      |SELECT status, CAST(max(total) AS BIGINT) AS n,
      |  round(CAST(min(bucket) + 0.5 AS DOUBLE) * 5000.0, 2) AS p50_est
      |FROM cum WHERE cum >= total * 0.5
      |GROUP BY status ORDER BY status""".stripMargin

  /**
   * `q_tdigest`: the NATIVE t-digest quantile-sketch serving path (the third 29j/29l
   * sibling, this one a graft-authored `TypedImperativeAggregate` rather than a stock
   * function): per-source sketches of document length answer p50/p95/p99 directly, and
   * the GLOBAL row is served by MERGING the per-source sketches — the base is never
   * rescanned. Rows-only (sketch centroids depend on partial-merge order, so estimates
   * carry run-to-run wobble inside the rank-error bound; TDigestSpec pins the bound
   * against exact percentiles and the merge-vs-direct consistency).
   */
  def qTdigest(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.{tdigestMerge, tdigestQuantile, tdigestSketch}
    val perSource = TableIO.documents(spark, dir)
      .groupBy(col("source"))
      .agg(tdigestSketch(col("n_chars")).as("sk"))
    val global = perSource.agg(tdigestMerge(col("sk")).as("sk"))
      .select(lit("__all__").as("source"), col("sk"))
    perSource.unionByName(global)
      .select(col("source"),
        round(tdigestQuantile(col("sk"), lit(0.5)), 1).as("p50"),
        round(tdigestQuantile(col("sk"), lit(0.95)), 1).as("p95"),
        round(tdigestQuantile(col("sk"), lit(0.99)), 1).as("p99"))
      .orderBy(col("source"))
  }

  /**
   * `q_cms_rollup`: the NATIVE count-min point-frequency serving path (the fourth
   * mergeable-sketch sibling next to HLL / histogram / t-digest): per-source token
   * sketches answer corpus-level point frequencies by MERGING — the corpus is never
   * rescanned at the coarser grain. The probe set is the exact top-20 vocabulary
   * (deterministic tie-break), reported next to the exact counts so the one-sided
   * sketch error is visible in the output itself. Unlike the t-digest, CMS output is
   * fully deterministic (elementwise-add merge commutes), but no oracle engine can
   * compute it -> rows-only; CmsSpec pins the guarantees (est >= exact always,
   * est <= exact + εN on this corpus, split-merge == whole-build bit-for-bit).
   */
  def qCmsRollup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.{cmsEstimate, cmsMerge, cmsSketch}
    val toks = TableIO.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("tok"))
    val perSource = toks.groupBy(col("source")).agg(cmsSketch(col("tok")).as("sk"))
    val corpus = perSource.agg(cmsMerge(col("sk")).as("sk"))
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok")).limit(20)
    top.crossJoin(broadcast(corpus))
      .select(col("tok"), col("exact_cnt"),
        cmsEstimate(col("sk"), col("tok")).as("cms_est"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  /**
   * Join-key skew diagnosis — the report read BEFORE picking a join/partition
   * strategy at 100 TB: per candidate key column, row count, exact NDV, the heaviest
   * key's frequency and share, and the max/avg group-size ratio (the direct predictor
   * of straggler tasks; >> 1 means salt it or rely on AQE skew split). Per column ONE
   * map-side-combined groupBy(key).count, then a bounded second aggregate over the
   * group-size frame; columns scan independently and the report is |columns| rows.
   */
  def skewReport(df: DataFrame, keys: Seq[String]): DataFrame =
    keys.map { k =>
      df.groupBy(col(k)).agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n"), count(lit(1)).as("ndv"), max(col("cnt")).as("max_sz"))
        .select(lit(k).as("key"), col("n"), col("ndv"), col("max_sz"),
          round(col("max_sz").cast("double") / col("n"), 6).as("top_share6"),
          round(col("max_sz") * col("ndv").cast("double") / col("n"), 4).as("skew_ratio4"))
    }.reduce(_.unionAll(_))

  /** `q_skew_report`: skew diagnosis of lineitem's three join keys + orders' customer key. */
  def qSkewReport(spark: SparkSession, dir: String): DataFrame =
    skewReport(TableIO.lineitem(spark, dir), Seq("l_orderkey", "l_partkey", "l_suppkey"))
      .unionAll(skewReport(TableIO.orders(spark, dir), Seq("o_custkey")))
      .orderBy(col("key"))

  val qSkewReportSql: String = {
    def one(table: String, k: String): String =
      s"""SELECT '$k' AS key, CAST(sum(cnt) AS BIGINT) AS n,
         |  CAST(count(*) AS BIGINT) AS ndv, CAST(max(cnt) AS BIGINT) AS max_sz,
         |  round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top_share6,
         |  round(max(cnt) * CAST(count(*) AS DOUBLE) / sum(cnt), 4) AS skew_ratio4
         |FROM (SELECT $k, count(*) AS cnt FROM $table GROUP BY $k)""".stripMargin
    Seq(one("lineitem", "l_orderkey"), one("lineitem", "l_partkey"),
      one("lineitem", "l_suppkey"), one("orders", "o_custkey"))
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY key")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skew_report" -> (qSkewReport(_, _)),
    "q_profile" -> profileQuery _,
    "q_hll_rollup" -> (qHllRollup(_, _)),
    "q_hist_rollup" -> (qHistRollup(_, _)),
    "q_cms_rollup" -> (qCmsRollup(_, _)),
    "q_tdigest" -> (qTdigest(_, _)))

  val oracles: Map[String, String] = Map(
    "q_skew_report" -> qSkewReportSql,
    "q_profile" -> profileSql,
    "q_hist_rollup" -> qHistRollupSql)
    // q_hll_rollup: sketch-based -> rows-only + merge-identity/error-bound spec
    // q_tdigest: sketch-based -> rows-only + rank-error/merge-consistency spec
    // q_cms_rollup: sketch-based -> rows-only + one-sided-bound/merge-identity spec (CmsSpec)
}
