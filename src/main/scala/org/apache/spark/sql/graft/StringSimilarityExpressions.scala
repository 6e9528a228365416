/*
 * Lives under org.apache.spark.sql for the same private[sql] bridge reasons as
 * VectorExpressions.scala (see that file's header).
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Static Jaro-Winkler kernel shared by interpreted eval and generated code (the same
 * one-static-call codegen shape Spark's own `levenshtein` uses, so the expression stays
 * inside whole-stage codegen with zero boxing).
 *
 * Classic Winkler variant, pinned to DuckDB's `jaro_winkler_similarity` semantics (the
 * oracle engine): prefix bonus only when jaro > 0.7, prefix capped at 4, scale 0.1;
 * either side empty → 0.0 (including both empty). Operates on UTF-16 code units, which
 * is byte-identical to DuckDB on ASCII input (the driver corpus); parity outside ASCII
 * is not claimed.
 */
object StringSimilarity {
  def jaroWinkler(l: UTF8String, r: UTF8String): Double = {
    val s1 = l.toString
    val s2 = r.toString
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(0, math.max(n1, n2) / 2 - 1)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk the matched chars of both strings in order; each position
    // where they differ is half a transposition
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / n1 + m / n2 + (m - t / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val cap = math.min(4, math.min(n1, n2))
    while (prefix < cap && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/**
 * Native Catalyst expression: Jaro-Winkler similarity of two string columns, the
 * standard record-linkage/entity-resolution comparator (Winkler '90) that Spark lacks
 * (it ships only levenshtein). Used by graft.pipeline.Linkage's blocked fuzzy join.
 *
 * Same native-kernel stance as VectorExpressions (the reference routes custom scalar
 * kernels through gazelle_plugin: com/intel/oap/expression/ColumnarUDF.scala:1); here
 * the kernel is one static JVM call inside whole-stage codegen, fully distributed.
 */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(l: Any, r: Any): Any =
    StringSimilarity.jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.StringSimilarity.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry point (public face: graft.functions.StringFunctions). */
object StringSimilarityExpressions {
  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinkler(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
