/*
 * Lives under org.apache.spark.sql for the same private[sql] bridge reasons as
 * VectorExpressions.scala (see that file's header).
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/**
 * Static Hilbert-curve kernel shared by interpreted eval and generated code.
 *
 * Standard iterative xy→d mapping (Hilbert 1891; algorithm as published in
 * Wikipedia/Warren's "Hacker's Delight" form): walk square sizes from the top bit
 * down, accumulate the quadrant offset, rotate/reflect the remaining coordinates.
 * 16 bits per axis — same coordinate width as LayoutWriter's Morton path, so the two
 * curves are drop-in alternatives over identical bucket ids.
 */
object HilbertCurve {
  final val Bits = 16

  /** Hilbert distance of (x, y) on the 2^16 x 2^16 grid; inputs masked to 16 bits. */
  def index(xIn: Long, yIn: Long): Long = {
    var x = xIn & 0xFFFFL
    var y = yIn & 0xFFFFL
    var d = 0L
    var s = 1L << (Bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve orientation is preserved
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/**
 * Native Catalyst expression: Hilbert-curve index of two 16-bit bucket ids — the
 * space-filling curve with strictly better locality than Morton/Z-order (every unit
 * step on the curve is a unit step on the grid, no Z-shaped jumps), which is why
 * Delta Lake moved OPTIMIZE clustering from Z-order to Hilbert. Pure bit arithmetic
 * as one static JVM call inside whole-stage codegen; used by
 * [[graft.sources.LayoutWriter.writeHilbert]].
 */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(l: Any, r: Any): Any =
    HilbertCurve.index(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.HilbertCurve.index($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertExpressions {
  def hilbertIndex(a: Column, b: Column): Column =
    ExpressionUtils.column(
      HilbertIndex(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
