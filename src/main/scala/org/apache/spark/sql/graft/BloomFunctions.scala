/*
 * Lives under org.apache.spark.sql for the private[sql] Column<->Expression bridge.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column bridges for Spark's INTERNAL Bloom-filter expressions (the pair the optimizer's
 * InjectRuntimeFilter plants; they are deliberately absent from the SQL function
 * registry). graft's explicit BloomJoin operator reuses them rather than shipping a
 * second Bloom implementation: same serialized format, same codegen `might_contain`.
 */
object BloomFunctions {

  /** Aggregate: build a Bloom filter (binary) over a LONG column (xxhash64 the key). */
  def bloomFilterAgg(c: Column, estimatedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(c),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Scalar: membership probe against a built Bloom filter. */
  def mightContain(bloom: Column, value: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloom), ExpressionUtils.expression(value)))
}
