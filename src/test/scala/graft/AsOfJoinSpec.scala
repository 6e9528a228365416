package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("backward as-of join picks latest right row at or before left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, 5L, "l-early"),
      (1L, 10L, "l-tie"),
      (1L, 20L, "l-late"),
      (2L, 10L, "l-nokey")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, "a"),
      (1L, 15L, "b"),
      (2L, 50L, "c")
    ).toDF("k", "rt", "v")

    val got = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("v"))
      .orderBy("k", "t")
      .select("k", "t", "tag", "v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), Option(r.getString(3))))

    assert(got.toSeq == Seq(
      (1L, 5L, "l-early", None),       // no right row yet
      (1L, 10L, "l-tie", Some("a")),   // equal ts is inclusive
      (1L, 20L, "l-late", Some("b")),  // latest <= 20
      (2L, 10L, "l-nokey", None)))     // right row is in the future
  }

  test("multiple payload columns carry together") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 90L, "x", 1.5), (1L, 95L, "y", 2.5)).toDF("k", "rt", "name", "score")
    val got = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("name", "score")).collect().head
    assert(got.getAs[String]("name") == "y" && got.getAs[Double]("score") == 2.5)
  }
}
