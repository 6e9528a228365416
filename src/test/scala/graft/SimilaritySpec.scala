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
    assert(recall >= 0.8, s"multi-table LSH recall $recall too low")
    info(f"LSH recall vs brute force: $recall%.2f")
  }

  test("IVF probes recall true neighbors and never exceed the probed lists") {
    val brute = Similarity.annBruteforce(spark, sf, nQueries = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.annIvf(spark, sf, nQueries = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall $recall too low for 8/16 probes")
    info(f"IVF recall vs brute force: $recall%.2f")
  }

  test("IVF corpus assignment puts every vector in exactly one list") {
    val e = graft.sources.TableIO.embeddings(spark, sf)
    val assigned = Similarity.ivfAssign(e, 1, Similarity.trainQuantizer(e))
    assert(assigned.count() == e.count())
    assert(assigned.select("vec_id").distinct().count() == e.count())
  }

  test("k-means quantizer is deterministic and produces unit-norm centroids") {
    val e = graft.sources.TableIO.embeddings(spark, sf)
    val c1 = Similarity.trainQuantizer(e)
    val c2 = Similarity.trainQuantizer(e)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq, "quantizer must be reproducible")
    c1.foreach { v =>
      val n = math.sqrt(v.map(x => x * x.toDouble).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"centroid norm $n")
    }
  }
}
