package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GuardedWrite

class GuardedWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def tmp() = Files.createTempDirectory("guarded").toFile.getAbsolutePath + "/t"

  test("clean batch writes and reports zero violations per rule") {
    import spark.implicits._
    val out = tmp()
    val df = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    val report = GuardedWrite.writeWithExpectations(df, out, Map(
      "id_positive" -> (col("id") > 0),
      "v_in_range" -> col("v").between(0.0, 100.0)))
    assert(report.forall(r => r.nViolations == 0 && r.nRows == 2))
    assert(spark.read.parquet(out).count() == 2)
  }

  test("dirty batch aborts, names the failing rules, and writes nothing") {
    import spark.implicits._
    val out = tmp()
    val df = Seq((1L, 10.0), (-2L, 500.0), (3L, -1.0)).toDF("id", "v")
    val e = intercept[IllegalStateException] {
      GuardedWrite.writeWithExpectations(df, out, Map(
        "id_positive" -> (col("id") > 0),
        "v_in_range" -> col("v").between(0.0, 100.0)))
    }
    assert(e.getMessage.contains("id_positive=1/3"))
    assert(e.getMessage.contains("v_in_range=2/3"))
    assert(!new java.io.File(out).exists(), "aborted write must leave no output")
  }

  test("null predicate results count as violations, not passes") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b")).toDF("id", "s")
    val report = GuardedWrite.check(df, Map("id_positive" -> (col("id") > 0)))
    assert(report.head.nViolations == 1)
  }
}
