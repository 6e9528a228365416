package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Binned range join: `points.p BETWEEN intervals.lo AND intervals.hi` as an EQUI-join.
 *
 * Spark plans raw non-equi joins as BroadcastNestedLoopJoin / cartesian — O(|P| x |I|)
 * comparisons, which dies at scale. Binning converts it to a shuffle-able equi-join:
 * each interval explodes into the bins it overlaps, each point maps to its single bin,
 * the join key is the bin id, and the residual BETWEEN filter runs join-local.
 *
 *  - No duplicates by construction: a point lives in exactly one bin, so a matching
 *    (point, interval) pair meets exactly once — no post-join distinct needed.
 *  - Cost: |I| x (avg interval span / binWidth + 1) replicated interval rows, then one
 *    hash shuffle each side. Pick binWidth ~ the typical interval length so intervals
 *    replicate into O(1) bins; skewed hot bins split via AQE like any equi-join.
 *  - The same construction handles interval-interval overlap joins (explode both sides,
 *    dedup on pair) — point-in-interval is the training-pipeline common case (event
 *    lookup into validity windows, price bands, IP ranges).
 */
object RangeJoin {

  /**
   * Inner join of `points` with `intervals` where `points.pointCol` lies in
   * `[intervals.loCol, intervals.hiCol]` (inclusive). Columns must be numeric;
   * `binWidth > 0` in the same units.
   */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "inputs must not already carry a __bin column")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
    val i = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
