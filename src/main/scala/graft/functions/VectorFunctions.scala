package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.VectorExpressions

/**
 * Vector math over `array<float>` embedding columns — public API.
 *
 * Backed by native codegen Catalyst expressions (org.apache.spark.sql.graft.
 * VectorExpressions), graft's replacement for the reference's C++ kernel route
 * (gazelle_plugin: com/intel/oap/expression/ColumnarUDF.scala:1).
 */
object VectorFunctions {
  /** `cosine_similarity(a, b)` as a Column, usable in any DataFrame expression. */
  def cosineSimilarity(a: Column, b: Column): Column = VectorExpressions.cosineSimilarity(a, b)

  def dotProduct(a: Column, b: Column): Column = VectorExpressions.dotProduct(a, b)

  def l2Distance(a: Column, b: Column): Column = VectorExpressions.l2Distance(a, b)

  // ---- mergeable quantile sketches (native TypedImperativeAggregate) ----------------

  /** Aggregate: numeric column -> t-digest sketch bytes (tail-accurate, mergeable). */
  def tdigestSketch(v: Column, compression: Double = 100.0): Column =
    org.apache.spark.sql.graft.TDigest.sketch(v, compression)

  /** Aggregate: union a column of t-digest sketches into one (rollup serving). */
  def tdigestMerge(s: Column): Column =
    org.apache.spark.sql.graft.TDigest.mergeSketches(s)

  /** Scalar: read quantile q out of a sketch column. */
  def tdigestQuantile(s: Column, q: Column): Column =
    org.apache.spark.sql.graft.TDigest.quantileOf(s, q)

  /** Aggregate: string column -> count-min sketch bytes (point frequencies, mergeable). */
  def cmsSketch(v: Column, depth: Int = 5, width: Int = 2048): Column =
    org.apache.spark.sql.graft.CountMin.sketch(v, depth, width)

  /** Aggregate: union a column of count-min sketches into one (rollup serving). */
  def cmsMerge(s: Column): Column =
    org.apache.spark.sql.graft.CountMin.mergeSketches(s)

  /** Scalar: one-sided point-frequency estimate (>= true count) from sketch bytes. */
  def cmsEstimate(s: Column, item: Column): Column =
    org.apache.spark.sql.graft.CountMin.estimateOf(s, item)
}
