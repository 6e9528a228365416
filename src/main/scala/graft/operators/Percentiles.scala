package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact percentiles by DISTRIBUTED SORT + rank selection — the form that survives 100 TB.
 *
 * Spark's `percentile` aggregate buffers every group's full value array in executor
 * memory (OpenHashMap per group): exact, but memory-proportional to the largest group —
 * the thing that OOMs at scale. This operator computes the SAME interpolated quantiles
 * (rank q·(n-1), linear interpolation between the straddling ranks — `percentile` /
 * DuckDB `quantile_cont` semantics) with no per-group buffering:
 *
 *   1. rank every row within its group (window row_number over the value sort — Spark's
 *      external sort, spills instead of OOM),
 *   2. per group, compute each quantile's straddling ranks lo/hi from the group count,
 *   3. equi-join (group, rank) to fetch just those rows and interpolate.
 *
 * Cost: two shuffles of the (keys, value) projection + one broadcast fetch join —
 * bytes-linear, memory-constant. Caveat: the window sort parallelizes across GROUPS, so
 * very-low-cardinality keys (e.g. 3 flags) leave cores idle — a TIME cost, while the
 * buffering aggregate's cost is MEMORY (OOM). Exact percentile at scale pays one or the
 * other; `approx_percentile` (t-digest, q_approx_distinct row) remains the at-scale
 * default when 1e-3 relative error is acceptable. PercentileSpec proves equality with
 * `percentile` to 1e-9 and the driver oracle (`q_percentile_sort`) hash-matches DuckDB's
 * quantile_cont.
 */
object Percentiles {

  /**
   * Long-form result: one row per (group, q) — (keys..., q, value). Groups with zero
   * non-null values are absent (where `percentile` would return null). `qs` must lie in
   * [0, 1].
   */
  def exactBySort(df: DataFrame, keys: Seq[String], valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), s"quantiles must be in [0,1]: $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val keyCols: Seq[Column] = keys.map(col)
    val proj = df.select(keyCols :+ col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull)
    val ranked = proj.withColumn("__rn", row_number().over(
      Window.partitionBy(keyCols: _*).orderBy(col("__v"))) - 1)
    // counts come from the RAW projection, not the windowed frame: deriving them from
    // `ranked` would make the plan evaluate the window sort twice (once per branch)
    val counts = proj.groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
    // per (group, q): the target rank and its straddling integer ranks, exploded to one
    // row per needed rank so the fetch is a plain equi-join on (keys, rank)
    val needed = counts
      .crossJoin(broadcast(qs.toDF("q")))
      .withColumn("__t", col("q") * (col("__n") - 1))
      .withColumn("__lo", floor(col("__t")).cast("long"))
      .withColumn("__hi", ceil(col("__t")).cast("long"))
      .select(keyCols ++ Seq(col("q"), col("__t"), col("__lo"),
        explode(array(col("__lo"), col("__hi"))).as("__rn")): _*)
      .distinct() // lo == hi when the target rank is integral
    // needed is groups x |qs| x <=2 rows — broadcast it so the ranked rows are never
    // re-shuffled for the fetch (drop the hint if the group count itself is huge)
    ranked.join(broadcast(needed), keys :+ "__rn")
      .groupBy(keyCols :+ col("q"): _*)
      .agg(
        min(when(col("__rn") === col("__lo"), col("__v"))).as("__vlo"),
        max(when(col("__rn") =!= col("__lo"), col("__v"))).as("__vhiOpt"),
        first(col("__t")).as("__t"),
        first(col("__lo")).as("__flo"))
      .select(keyCols ++ Seq(col("q"),
        (col("__vlo") + (col("__t") - col("__flo")) *
          (coalesce(col("__vhiOpt"), col("__vlo")) - col("__vlo"))).as("value")): _*)
  }
}
