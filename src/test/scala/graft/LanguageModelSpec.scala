package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.pipeline.LanguageModel

class LanguageModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  /** Tiny corpus with a known bigram structure. */
  private def tinyPairs = {
    val spark0 = spark
    import spark0.implicits._
    val text = Seq(
      "the cat sat", "the cat ran", "the dog sat", "a cat sat on the mat")
    text.flatMap { s =>
      val w = s.split(" ")
      w.dropRight(1).zip(w.drop(1))
    }.toDF("w1", "w2")
  }

  test("KN identities: discounted mass + redistributed mass is exactly 1 per context") {
    // sum over OBSERVED continuations of max(c-D,0)/c1 must equal 1 - D*n1f/c1,
    // and pcont sums to 1 over the continuation vocabulary — together these make
    // the full-vocabulary conditional sum to 1 (Chen & Goodman '98 eq. 4.25).
    val model = LanguageModel.knModel(tinyPairs)
    val c12 = tinyPairs.groupBy("w1", "w2").count()
    val byCtx = c12.groupBy("w1")
      .agg(sum(col("count")).as("c1"), count(lit(1)).as("n1f"),
        sum(greatest(col("count") - lit(0.75), lit(0.0))).as("disc"))
      .collect()
    byCtx.foreach { r =>
      val c1 = r.getLong(1).toDouble
      val n1f = r.getLong(2).toDouble
      val disc = r.getDouble(3)
      assert(math.abs(disc / c1 - (1 - 0.75 * n1f / c1)) < 1e-12, s"ctx ${r.getString(0)}")
    }
    val bb = c12.count().toDouble
    val pcontSum = c12.groupBy("w2").count()
      .agg(sum(col("count") / lit(bb))).collect()(0).getDouble(0)
    // sum over w2 of n1b/bb where n1b = rows per w2: total rows / bb == 1
    assert(math.abs(pcontSum - 1.0) < 1e-12)
    assert(model.count() == c12.count(), "model scores every observed bigram")
  }

  test("knModel matches a hand computation on a known bigram") {
    // context 'the': c1=4 ('the cat' x2, 'the dog', 'the mat'), n1f=3
    // bigram 'the cat': c=2 -> (2-.75)/4 + .75*3/4 * pcont(cat)
    // pcont(cat) = distinct predecessors of 'cat' {the, a} / distinct bigrams (9)
    val p = LanguageModel.knModel(tinyPairs)
      .filter(col("w1") === "the" && col("w2") === "cat")
      .collect()(0).getDouble(2)
    val want = (2 - 0.75) / 4.0 + 0.75 * 3 / 4.0 * (2.0 / 9.0)
    assert(math.abs(p - want) < 1e-12)
  }

  test("text_kn_lm yields one finite positive xent row per language") {
    val rows = LanguageModel.textKnLm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      val x = r.getDouble(2)
      assert(!x.isNaN && !x.isInfinite && x > 0, s"xent for ${r.getString(0)}: $x")
    }
    val langs = rows.map(_.getString(0))
    assert(langs.sameElements(langs.sorted))
  }

  test("text_kn_top returns k descending-probability continuations of one context") {
    val rows = LanguageModel.textKnTop(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getString(0)).distinct.length == 1, "single context")
    val ps = rows.map(_.getDouble(2))
    ps.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
    assert(ps.forall(p => p > 0 && p <= 1))
  }
}
