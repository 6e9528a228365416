package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Resample

class ResampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("monthlyLocf: gap-free grid per key, zero-filled counts, carried values") {
    import spark.implicits._
    val events = Seq(
      // key 1: events in Jan and Apr -> Feb/Mar are gaps carrying Jan's total
      (1L, Timestamp.valueOf("2024-01-05 00:00:00"), 10.0),
      (1L, Timestamp.valueOf("2024-01-20 00:00:00"), 5.0),
      (1L, Timestamp.valueOf("2024-04-02 00:00:00"), 7.0),
      // key 2: a single month -> a single-row series, no gaps
      (2L, Timestamp.valueOf("2024-06-15 00:00:00"), 3.0)
    ).toDF("k", "ts", "v")
    val got = Resample.monthlyLocf(events, "k", "ts", "v")
      .orderBy("k", "month")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01", 2L, 15.0),
      (1L, "2024-02-01", 0L, 15.0),
      (1L, "2024-03-01", 0L, 15.0),
      (1L, "2024-04-01", 1L, 7.0),
      (2L, "2024-06-01", 1L, 3.0)), s"got ${got.toSeq}")
  }

  test("monthlyLocf never emits a null carried value (first grid month is observed)") {
    import spark.implicits._
    val events = Seq((9L, Timestamp.valueOf("2023-11-30 23:59:59"), 1.5),
      (9L, Timestamp.valueOf("2024-02-01 00:00:00"), 2.5)).toDF("k", "ts", "v")
    val rows = Resample.monthlyLocf(events, "k", "ts", "v").collect()
    assert(rows.length == 4) // Nov, Dec, Jan, Feb
    assert(rows.forall(!_.isNullAt(3)))
  }
}
