package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Expectation-guarded writes — the Delta CHECK-constraint / dlt-expectations analog
 * for plain parquet: a batch only lands if every declared expectation holds on every
 * row, and the violation report comes back either way. One extra aggregation pass
 * (all expectations evaluated in a single map-side-combined agg — no per-expectation
 * scans) decides the write; a dirty batch writes NOTHING, so downstream readers never
 * see a half-trusted table state.
 */
object GuardedWrite {

  final case class Violation(name: String, nViolations: Long, nRows: Long)

  /** Evaluate all expectations in ONE pass: (name, violations, rows) per rule.
    * A null predicate result counts as a violation (unknown is not a pass). */
  def check(df: DataFrame, expectations: Map[String, Column]): Seq[Violation] = {
    require(expectations.nonEmpty, "at least one expectation required")
    val names = expectations.keys.toSeq.sorted
    val aggs = count(lit(1)).as("__n") +: names.map(n =>
      sum(when(coalesce(expectations(n), lit(false)), 0).otherwise(1)).as(s"__v_$n"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    names.map(nm => Violation(nm, row.getAs[Long](s"__v_$nm"), n))
  }

  /**
   * Write `df` to `path` (overwrite) ONLY if every expectation passes; returns the
   * per-rule report. Throws `IllegalStateException` on any violation, leaving the
   * target untouched.
   */
  def writeWithExpectations(df: DataFrame, path: String,
      expectations: Map[String, Column]): Seq[Violation] = {
    val report = check(df, expectations)
    val dirty = report.filter(_.nViolations > 0)
    if (dirty.nonEmpty) {
      throw new IllegalStateException(
        "expectations failed, write aborted: " +
          dirty.map(v => s"${v.name}=${v.nViolations}/${v.nRows}").mkString(", "))
    }
    df.write.mode("overwrite").parquet(path)
    report
  }
}
