package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.StringSimilarityExpressions

/**
 * String-similarity kernels — public API.
 *
 * Backed by native codegen Catalyst expressions (org.apache.spark.sql.graft.
 * StringSimilarityExpressions), same native-kernel route as VectorFunctions.
 */
object StringFunctions {
  /** `jaro_winkler(a, b)` ∈ [0,1] as a Column; 1.0 = identical. */
  def jaroWinkler(a: Column, b: Column): Column = StringSimilarityExpressions.jaroWinkler(a, b)
}
