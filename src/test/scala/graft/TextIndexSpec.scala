package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextIndex

class TextIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("text_phrase counts match direct substring counting") {
    val rows = TextIndex.textPhrase(spark, sf).collect()
    assert(rows.length == 3)
    val docs = graft.sources.TableIO.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq).toMap
    rows.foreach { r =>
      val phrase = r.getString(0).split(" ").toSeq
      val perDoc = docs.view.mapValues(toks =>
        toks.sliding(3).count(_ == phrase)).filter(_._2 > 0)
      assert(r.getLong(1) == perDoc.size.toLong, s"n_docs for '${r.getString(0)}'")
      assert(r.getLong(2) == perDoc.values.sum.toLong, s"n_occ for '${r.getString(0)}'")
    }
  }

  test("corpus_overlap jaccard is symmetric-complete over source pairs and in [0,1]") {
    val rows = TextIndex.corpusOverlap(spark, sf).collect()
    val nSrc = graft.sources.TableIO.documents(spark, sf)
      .select("source").distinct().count().toInt
    assert(rows.length == nSrc * (nSrc - 1) / 2, "one row per unordered pair")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val j = r.getDouble(3)
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("minhash estimate tracks exact jaccard within sketch error") {
    val exact = TextIndex.corpusOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val est = TextIndex.corpusOverlapMinhash(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est.keySet == exact.keySet)
    val errs = exact.map { case (k, j) => math.abs(est(k) - j) }
    // K=128 components: sd <= 0.5/sqrt(128) ~ 0.044; allow generous tails
    assert(errs.sum / errs.size < 0.06, s"mean |err| ${errs.sum / errs.size}")
    assert(errs.max < 0.2, s"max |err| ${errs.max}")
  }

  test("minhash signatures and estimates are deterministic across runs") {
    val a = TextIndex.corpusOverlapMinhash(spark, sf).collect().map(_.toSeq)
    val b = TextIndex.corpusOverlapMinhash(spark, sf).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("permHash permutations are distinct and stable") {
    assert(TextIndex.permHash("spark", 0) != TextIndex.permHash("spark", 1))
    assert(TextIndex.permHash("spark", 3) == TextIndex.permHash("spark", 3))
    assert(TextIndex.permHash("spark", 0) != TextIndex.permHash("scan", 0))
  }
}
