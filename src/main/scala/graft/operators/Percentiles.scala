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
 * DuckDB `quantile_cont` semantics) with no per-group buffering, via per-VALUE counting:
 *
 *   1. count rows per (group, value) — a map-side-combinable groupBy, the ONLY pass over
 *      the full data, fully parallel regardless of group count;
 *   2. cumulative-sum those counts over the value order per group (window over DISTINCT
 *      values, not rows — |distinct values| rows, external sort spills instead of OOM),
 *      giving each value its rank interval [start, end);
 *   3. per group, compute each quantile's straddling ranks from the group total and
 *      join them against the intervals to fetch + interpolate (AQE broadcasts the
 *      small side at runtime — no forced hint, so huge group counts stay safe).
 *
 * Cost: one full-data shuffle (the combine) + a distinct-values window + a fetch
 * join — bytes-linear, memory-constant. Caveat: with very few groups AND near-unique
 * values the distinct-value window degenerates to a few-partition sort — a TIME cost,
 * while the buffering aggregate's cost is MEMORY (OOM); exact percentile at scale pays
 * one or the other, and `approx_percentile` (t-digest, q_approx_distinct row) remains
 * the at-scale default when 1e-3 relative error is acceptable. PercentileSpec proves
 * equality with `percentile` to 1e-9 and the driver oracle (`q_percentile_sort`)
 * hash-matches DuckDB's quantile_cont.
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
    // the ONLY pass over the full data: map-side-combinable per-(group, value) counts
    val vc = proj.groupBy(keyCols :+ col("__v"): _*).agg(count(lit(1)).as("__c"))
    // rank interval of each distinct value: [start, end) over the per-group value order
    val cum = vc.withColumn("__end", sum(col("__c")).over(
        Window.partitionBy(keyCols: _*).orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__start", col("__end") - col("__c"))
    val counts = vc.groupBy(keyCols: _*).agg(sum(col("__c")).as("__n"))
    // per (group, q): the target rank and its straddling integer ranks, exploded to one
    // row per needed rank
    val needed = counts
      .crossJoin(broadcast(qs.toDF("q")))
      .withColumn("__t", col("q") * (col("__n") - 1))
      .withColumn("__lo", floor(col("__t")).cast("long"))
      .withColumn("__hi", ceil(col("__t")).cast("long"))
      .select(keyCols ++ Seq(col("q"), col("__t"), col("__lo"),
        explode(array(col("__lo"), col("__hi"))).as("__rn")): _*)
      .distinct() // lo == hi when the target rank is integral
    // needed is groups x |qs| x <=2 rows; each interval row matches the needed ranks it
    // contains ([start, end) residual on the key-equi join). NO broadcast hint: for
    // high-cardinality keys the needed frame scales with the group count and a forced
    // broadcast would collect it to the driver — AQE picks the broadcast at runtime when
    // the measured size is actually small. Keys are renamed on the needed side: both
    // frames descend from vc, so qualified references would be self-join-ambiguous.
    val neededR = needed.select(
      keys.map(k => col(k).as(s"__k_$k")) ++
        Seq(col("q"), col("__t"), col("__lo"), col("__rn")): _*)
    // null-SAFE key equality: groupBy keeps null-keyed groups, and percentile() returns
    // a row for them — plain === would drop them here and break the documented parity
    cum.join(neededR,
        keys.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _) &&
          col("__rn") >= col("__start") && col("__rn") < col("__end"))
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

  /**
   * Equi-depth discretization: every row gets a bucket 1..nBins within its key group,
   * with boundaries at the exact interpolated i/nBins quantiles — the feature-binning
   * step of an ML pipeline, built on the same buffer-free sort path as exactBySort
   * (never a per-group value array). Values EQUAL to a boundary fall in the lower
   * bucket (strict `>` comparison — the same rule in the SQL twin). The boundary frame
   * is group-cardinality-sized; AQE broadcasts the assignment join when it fits.
   * Cross-engine determinism: a data value can only tie a boundary when the target
   * rank is integral, and then both engines reproduce the boundary exactly (the
   * interpolation term vanishes), so bucket assignment is stable.
   */
  def equidepthBins(df: DataFrame, keys: Seq[String], valueCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    val qs = (1 until nBins).map(_.toDouble / nBins)
    val bounds = exactBySort(df, keys, valueCol, qs)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(col("value"))).as("__bs"))
    df.join(bounds, keys)
      .withColumn("bucket", bucketFromBounds(col(valueCol), nBins))
      .drop("__bs")
  }

  /** r14 (guide §4, expressions in the hot path): `1 + size(filter(__bs, b => v > b))`
    * evaluated a HigherOrderFunction LAMBDA per data row — interpreted, outside
    * whole-stage codegen. nBins is a plan-time constant, so the boundary comparisons
    * unroll statically into nBins-1 codegen'd when/element_at terms. Identical
    * semantics including nulls: a null value compares null against every boundary, so
    * every indicator is 0 and the bucket is 1 — exactly what the lambda form produced
    * (null predicate drops the element). Order-insensitive: the sum counts boundaries
    * strictly below v wherever they sit in the array. */
  private def bucketFromBounds(value: Column, nBins: Int): Column =
    (lit(1) + (1 until nBins)
      .map(i => when(value.cast("double") > element_at(col("__bs"), i), 1).otherwise(0))
      .reduce(_ + _)).cast("int")

  /**
   * Sketch twin of [[equidepthBins]]: boundaries from the native mergeable t-digest
   * aggregate instead of the exact sort path — ONE map-side-combined sketch pass
   * (fixed ~3 KB partial state per partition regardless of cardinality) where the
   * exact path pays a per-value count + rank-selection shuffle. Buckets are
   * approximately equi-depth (t-digest rank error concentrates at the tails, exactly
   * where equi-depth boundaries don't sit); PercentilesSpec bounds the per-bucket
   * occupancy skew vs the exact path. Use this form when the value cardinality is
   * corpus-like; the exact form when boundaries must be reproducible to the digit.
   */
  def equidepthBinsApprox(df: DataFrame, keys: Seq[String], valueCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    import graft.functions.VectorFunctions.{tdigestQuantile, tdigestSketch}
    val qsCol = array((1 until nBins).map(i => lit(i.toDouble / nBins)): _*)
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(tdigestSketch(col(valueCol).cast("double")).as("__sk"))
      .select(keys.map(col) :+
        transform(qsCol, q => tdigestQuantile(col("__sk"), q)).as("__bs"): _*)
    df.join(bounds, keys)
      .withColumn("bucket", bucketFromBounds(col(valueCol), nBins)) // r14: see bucketFromBounds
      .drop("__bs")
  }

  /**
   * Robust per-group outlier scoring: median / MAD instead of mean / stddev, so a
   * contaminated group cannot mask its own outliers (the failure mode of z-scores —
   * the outliers inflate the stddev that is supposed to catch them). Each row gains
   * (med, mad, robust_z) with robust_z = |v − median| / (1.4826·MAD); 1.4826 is the
   * standard consistency constant making MAD estimate σ under normality, so the usual
   * |z| > 3.5 cutoff applies. Degenerate groups (MAD = 0, i.e. >= half the group sits
   * ON the median) are dropped — no finite score exists for them.
   *
   * Scale shape: two exactBySort median passes (each = one map-side-combined per-value
   * count + rank selection, never a per-group buffer) and two key-equi joins against
   * group-cardinality frames (AQE broadcasts them when small). Everything shuffles on
   * the group key only.
   */
  /**
   * Winsorization: clip each row's value to its group's [qLo, qHi] exact interpolated
   * quantile band — the feature-engineering tail-tamer (keeps the row, unlike outlier
   * DELETION, so downstream counts/joins are undisturbed). Boundaries come from the
   * buffer-free exactBySort path; one key-equi join (AQE broadcasts the
   * group-cardinality boundary frame) and a map-side least/greatest clip. Adds
   * `clipped` (the bounded value) plus the `lo`/`hi` bounds.
   */
  def winsorize(df: DataFrame, keys: Seq[String], valueCol: String,
      qLo: Double, qHi: Double): DataFrame = {
    require(qLo < qHi, s"need qLo < qHi, got $qLo >= $qHi")
    val bounds = exactBySort(df, keys, valueCol, Seq(qLo, qHi))
      .groupBy(keys.map(col): _*)
      .agg(min(when(col("q") === qLo, col("value"))).as("lo"),
        max(when(col("q") === qHi, col("value"))).as("hi"))
    df.join(bounds, keys)
      .withColumn("clipped", least(greatest(col(valueCol), col("lo")), col("hi")))
  }

  def madOutliers(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    def keyed(m: DataFrame, pfx: String, as: String): DataFrame =
      m.select(keys.map(c => col(c).as(s"$pfx$c")) :+ col("value").as(as): _*)
    def joinOn(l: DataFrame, r: DataFrame, pfx: String): DataFrame =
      l.join(r, keys.map(c => col(c) <=> col(s"$pfx$c")).reduce(_ && _))
        .drop(keys.map(c => s"$pfx$c"): _*)
    val med = keyed(exactBySort(df, keys, valueCol, Seq(0.5)), "__m_", "med")
    val dev = joinOn(df, med, "__m_")
      .withColumn("absdev", abs(col(valueCol) - col("med")))
    val mad = keyed(exactBySort(dev, keys, "absdev", Seq(0.5)), "__d_", "mad")
    joinOn(dev, mad, "__d_")
      .filter(col("mad") > 0)
      .withColumn("robust_z", col("absdev") / (lit(1.4826) * col("mad")))
  }
}
