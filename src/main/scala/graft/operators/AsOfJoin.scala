package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of (backward) join: each left row picks the latest right row with the same key and
 * right.ts <= left.ts — the canonical event-enrichment operator Spark lacks natively.
 *
 * Implementation is the composition route (SURVEY §2 preference (a)): union both sides
 * tagged, one shuffle on the key, a single sort within partitions, and a running
 * `last(_, ignoreNulls)` window carries the most recent right payload forward onto left
 * rows. No per-key collect, no range cross-join blowup:
 *   cost = shuffle O(|L|+|R|) + partition-local sort — the same shape DuckDB/kdb use for
 * ASOF, so it holds at 100 TB (skewed keys are split by AQE since the window key is the
 * shuffle key).
 *
 * Ties (right.ts == left.ts) are inclusive, matching DuckDB's ASOF semantics: the right
 * side sorts before the left at equal timestamps.
 */
object AsOfJoin {

  /**
   * @param left      left frame
   * @param right     right frame
   * @param key       equi-key column present in both
   * @param leftTs    timestamp column on left
   * @param rightTs   timestamp column on right
   * @param payload   right columns to carry (must not clash with left column names)
   */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lStruct = struct(leftCols.map(col): _*)
    val rStruct = struct(payload.map(col): _*)
    val lSchema = StructType(left.schema.fields)
    val rSchema = StructType(right.select(payload.map(col): _*).schema.fields)

    val l2 = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      lStruct.as("__l"), lit(null).cast(rSchema).as("__r"))
    val r2 = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      lit(null).cast(lSchema).as("__l"), rStruct.as("__r"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l2.unionByName(r2)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        payload.map(p => col(s"__carried.$p").as(p)): _*)
  }
}
