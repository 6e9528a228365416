package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("brute-force top-k is k rows per query, ranked by cosine") {
    val rows = Similarity.annBruteforce(spark, sf, nQueries = 5, k = 3).collect()
    assert(rows.length == 15)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
      val cosines = byRank.map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH candidates are a subset that still recalls true neighbors") {
    val brute = Similarity.annBruteforce(spark, sf, nQueries = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.annLsh(spark, sf, nQueries = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"multi-table LSH recall $recall too low")
    info(f"LSH recall vs brute force: $recall%.2f")
  }
}
