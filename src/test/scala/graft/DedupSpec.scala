package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("exact dedup counts duplicates correctly on a constructed frame") {
    import spark.implicits._
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"), (4L, "same text"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("constructed_docs")
    val groups = docs.groupBy(org.apache.spark.sql.functions.md5($"text"))
      .count().collect().map(_.getLong(1)).sorted
    assert(groups.toSeq == Seq(1L, 3L))
  }

  test("minhash-LSH finds exactly the exhaustive jaccard >= 0.8 pairs") {
    val viaLsh = Dedup.dedupMinhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exhaustive = Dedup.dedupNgramJaccard(spark, sf, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLsh == exhaustive,
      s"LSH missed ${exhaustive -- viaLsh}, extra ${viaLsh -- exhaustive}")
    assert(viaLsh.nonEmpty, "test data should contain planted near-duplicates")
  }

  test("connected components merge transitive near-dup chains") {
    import spark.implicits._
    // components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {10,11}; pair graph only (no 99)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("simhash recall on strong near-duplicates (jaccard >= 0.9)") {
    val strong = Dedup.dedupNgramJaccard(spark, sf, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaSimhash = Dedup.dedupSimhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong.nonEmpty)
    val recall = (strong & viaSimhash).size.toDouble / strong.size
    assert(recall >= 0.8, s"simhash recall $recall over ${strong.size} strong pairs")
  }

  test("LSH-bucketed embedding near-dup recalls the exact cross-join pairs") {
    val exact = Dedup.dedupEmbeddingExact(spark, sf, tau = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaLsh = Dedup.dedupEmbeddingLsh(spark, sf, tau = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLsh.subsetOf(exact), "bucketed pairs are a subset of exact pairs")
    if (exact.nonEmpty) {
      val recall = (exact & viaLsh).size.toDouble / exact.size
      assert(recall >= 0.5, s"multi-table bucket recall $recall too low")
    }
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val rows = Dedup.dedupEmbeddingExact(spark, sf, tau = 0.4).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4 - 1e-4)
    }
  }

  test("df-capped ngram candidates still cover every exhaustive jaccard pair") {
    val g = Dedup.gramHashSets(graft.sources.TableIO.documents(spark, sf)).cache()
    try {
      val capped = Dedup.ngramCandidates(g, 256)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // uncapped candidates + exact verify = the exhaustive truth at threshold 0.5
      val truePairs = Dedup.dedupNgramJaccard(spark, sf, threshold = 0.5, maxDf = Long.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(truePairs.nonEmpty)
      assert(truePairs.subsetOf(capped),
        s"df cap dropped true pairs: ${truePairs -- capped}")
    } finally g.unpersist()
  }

  test("df cap bounds candidate fan-out under a planted stop-gram") {
    import spark.implicits._
    // n docs all share ONE stop-gram (identical leading 3 tokens); every other gram unique.
    val n = 200
    val docs = (1 to n)
      .map(i => (i.toLong, s"the common gram u$i v$i w$i x$i"))
      .toDF("doc_id", "text")
    val g = Dedup.gramHashSets(docs).cache()
    try {
      // uncapped index: the stop-gram alone fans out to all n·(n-1)/2 pairs
      assert(Dedup.ngramCandidates(g, Long.MaxValue).count() == n.toLong * (n - 1) / 2)
      // capped index drops the df=200 gram; no sub-cap gram co-occurs -> zero pairs
      assert(Dedup.ngramCandidates(g, 50).count() == 0L)
    } finally g.unpersist()
  }
}
