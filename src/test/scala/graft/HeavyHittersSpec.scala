package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("unsaturated sketch is exact: equals the groupBy counts with zero error") {
    import spark.implicits._
    val items = (Seq.fill(7)("a") ++ Seq.fill(5)("b") ++ Seq.fill(2)("c") ++ Seq("d"))
    val df = spark.sparkContext.parallelize(items, 3).toDF("item")
    val out = HeavyHitters.approxTopK(df, k = 4, capacity = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 7L, 0L), ("b", 5L, 0L), ("c", 2L, 0L), ("d", 1L, 0L)))
  }

  test("saturated sketch keeps the heavy item with a sound error bound") {
    import spark.implicits._
    // 100 copies of the heavy item + 300 singletons; capacity 20 per partition.
    // N = 400, N/capacity = 20 < 100 -> presence guaranteed by the union bound.
    val items = Seq.fill(100)("HEAVY") ++ (0 until 300).map(i => s"noise_$i")
    val rnd = new scala.util.Random(11)
    val df = spark.sparkContext.parallelize(rnd.shuffle(items), 4).toDF("item")
    val out = HeavyHitters.approxTopK(df, k = 10, capacity = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val heavy = out.find(_._1 == "HEAVY")
    assert(heavy.isDefined, s"heavy item evicted: ${out.toSeq}")
    val (_, est, err) = heavy.get
    assert(est >= 100 && est - err <= 100, s"bound violated: est=$est err=$err true=100")
    // every reported item's interval [est - err, est] must contain its true count
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { case (item, e, er) =>
      val t = truth(item)
      assert(e >= t && e - er <= t, s"$item: est=$e err=$er true=$t")
    }
  }

  test("corpus sketch agrees with the exact top bigrams on the separated head") {
    val exact = graft.pipeline.TextAnalysis.textTopgrams(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val sketch = HeavyHitters.textTopgramsSketch(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sketchMap = sketch.map(t => t._1 -> t).toMap
    // the exact top-5 are unambiguous heads; each must be present with a sound interval
    exact.take(5).foreach { case (bigram, cnt) =>
      val hit = sketchMap.get(bigram)
      assert(hit.isDefined, s"head bigram '$bigram' missing from sketch")
      val (_, est, err) = hit.get
      assert(est >= cnt && est - err <= cnt, s"'$bigram': est=$est err=$err true=$cnt")
    }
  }
}
