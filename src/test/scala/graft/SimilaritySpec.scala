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

  test("rrf fusion: multi-list candidates float up, scores are exact, ties deterministic") {
    import spark.implicits._
    val listA = Seq((1L, 101L, 1), (1L, 102L, 2)).toDF("query_id", "neighbor_id", "rank")
    val listB = Seq((1L, 102L, 1), (1L, 103L, 2)).toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.rrfFuse(Seq(listA, listB), k = 60, topK = 5).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4)))

    // 102 is in both lists (ranks 2+1) and must fuse above either single-list candidate
    assert(got.map(_._2).toSeq == Seq(102L, 101L, 103L), s"fused order: ${got.toSeq}")
    assert(got.map(_._4).toSeq == Seq(2, 1, 1), "n_lists must count contributing rankings")
    val exp102 = BigDecimal(1.0 / 62 + 1.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(BigDecimal(got.head._3) == exp102, s"rrf(102) = ${got.head._3}")
    // equal-rrf singles (rank 1/61 vs 1/62): 101 (rank 2 in A -> 1/62) vs 103 (rank 2 in B
    // -> 1/62) tie exactly; neighbor_id breaks it -> 101 before 103
    assert(got(1)._2 == 101L && got(2)._2 == 103L)
  }

  test("int8 quantization: bounded reconstruction error, high top-k agreement, zero vec") {
    import spark.implicits._
    val vecs = graft.sources.TableIO.embeddings(spark, sf)
    val orig = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = Similarity.quantizeInt8(vecs)
    val back = Similarity.dequantizeInt8(q)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

    // per-element error <= scale/2 (round-to-nearest), i.e. max|x| / 254
    val scales = q.collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    orig.foreach { case (id, v) =>
      val r = back(id)
      assert(r.length == v.length)
      val bound = scales(id) / 2 + 1e-6
      v.indices.foreach { i =>
        assert(math.abs(v(i) - r(i)) <= bound, s"vec $id[$i]: ${v(i)} vs ${r(i)}")
      }
    }
    // the all-zero vector round-trips exactly (scale 0 guard)
    val zero = Seq((999L, Array.fill(8)(0f))).toDF("vec_id", "embedding")
    val zback = Similarity.dequantizeInt8(Similarity.quantizeInt8(zero)).collect().head
    assert(zback.getSeq[Float](1).forall(_ == 0f))

    // serving-path agreement: int8 top-5 overlaps float top-5 heavily
    val floatTop = Similarity.annBruteforce(spark, sf)
      .collect().groupBy(_.getLong(0)).map { case (qid, rs) =>
        qid -> rs.map(_.getLong(2)).toSet }
    val int8Top = Similarity.annQuantized(spark, sf)
      .collect().groupBy(_.getLong(0)).map { case (qid, rs) =>
        qid -> rs.map(_.getLong(2)).toSet }
    val overlaps = floatTop.map { case (qid, f) =>
      (f & int8Top.getOrElse(qid, Set.empty)).size.toDouble / f.size }
    val mean = overlaps.sum / overlaps.size
    assert(mean >= 0.9, s"int8 top-k agreement with float path too low: $mean")
  }
}
