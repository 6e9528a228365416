package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity

class MmrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  /** Reference greedy MMR, independent implementation (naive quadratic). */
  private def refMmr(cands: Seq[(Long, Double, Array[Float])], k: Int,
      lam: Double): Seq[Long] = {
    var chosen = Vector.empty[(Long, Double, Array[Float])]
    var rest = cands
    while (chosen.size < k && rest.nonEmpty) {
      val best = rest.minBy { case (id, rel, v) =>
        val pen = if (chosen.isEmpty) 0.0 else chosen.map(c => cos(v, c._3)).max
        (-(lam * rel - (1 - lam) * pen), id)
      }
      chosen = chosen :+ best
      rest = rest.filterNot(_._1 == best._1)
    }
    chosen.map(_._1)
  }

  test("mmrSelect picks the relevance argmax first, then trades off diversity") {
    // three near-identical high-rel vectors + one orthogonal mid-rel vector:
    // pure top-3 takes the clones; MMR(0.5) must bring in the orthogonal one
    val clone = Array(1f, 0f)
    val ortho = Array(0f, 1f)
    val cands = Seq(
      (1L, 0.99, clone), (2L, 0.98, clone), (3L, 0.97, clone), (9L, 0.60, ortho))
    val got = Similarity.mmrSelect(cands, 3, 0.5).map(_._1)
    assert(got.head == 1L, "first pick is the relevance argmax")
    assert(got.contains(9L), "diversity must pull in the orthogonal candidate")
    assert(got == refMmr(cands, 3, 0.5))
  }

  test("ann_mmr matches the independent reference end-to-end at sf0.001") {
    import org.apache.spark.sql.functions.col
    val got = Similarity.annMmr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val vecs = graft.sources.TableIO.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val want = (0L until 10L).flatMap { q =>
      val cands = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vecs(q), v), v) }
        .sortBy { case (id, rel, _) => (-rel, id) }.take(20)
      refMmr(cands, 5, 0.7).zipWithIndex.map { case (id, i) => (q, i + 1, id) }
    }
    assert(got.sameElements(want))
  }

  test("ann_mmr is deterministic and k-complete per query") {
    val a = Similarity.annMmr(spark, sf).collect().map(_.toSeq)
    val b = Similarity.annMmr(spark, sf).collect().map(_.toSeq)
    assert(a.sameElements(b))
    val perQuery = a.groupBy(_.head)
    assert(perQuery.size == 10 && perQuery.values.forall(_.length == 5))
  }
}
