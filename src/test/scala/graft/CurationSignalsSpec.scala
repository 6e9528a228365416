package graft

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Resample
import graft.pipeline.TextAnalysis

class CurationSignalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // ------------------------------------------------------------- SES forecast

  test("SES closed form equals the naive sequential recurrence, per key") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = for {
      k <- Seq("a", "b")
      d <- 1 to 28 if rnd.nextDouble() > 0.15 // leave gaps: SES runs on observed days
    } yield (k, Date.valueOf(f"2024-03-$d%02d"), rnd.nextInt(500).toLong)
    val daily = rows.toDF("event_type", "day", "cnt").repartition(5)
    val got = Resample.sesOverDaily(daily).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getLong(2), r.getDouble(3)))

    val naive = rows.groupBy(_._1).flatMap { case (k, g) =>
      var s = -1.0
      g.sortBy(_._2.toString).map { case (_, d, y) =>
        s = if (s < 0) y.toDouble else 0.5 * y + 0.5 * s
        // HALF_UP to match Spark's round(): dyadic rationals DO tie at the 7th digit
        (k, d, y, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toSet
    assert(got.nonEmpty && got.toSet == naive)
  }

  // -------------------------------------------------------------- readability

  test("Flesch readability on hand-scored sentences") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat."), // 3 words, 1 sentence, 3 vowel groups
      (2L, "no punctuation here at all")) // sentences floored at 1
      .toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs).collect()
    assert(r(0).getInt(1) == 3 && r(0).getInt(2) == 3 && r(0).getInt(3) == 1)
    // 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(math.abs(r(0).getDouble(4) - 119.19) < 1e-9)
    assert(r(1).getInt(1) == 5 && r(1).getInt(3) == 1)
  }

  // --------------------------------------------------------- compress signal

  test("deflate ratio separates repetitive from high-entropy text, deterministically") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val noisy = (1 to 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, "spark " * 80), (2L, noisy)).toDF("doc_id", "text")
    val once = TextAnalysis.compressionSignal(docs).collect()
    val twice = TextAnalysis.compressionSignal(docs).collect()
    val ratio = once.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ratio(1L) < 0.2) // boilerplate collapses
    assert(ratio(2L) > 0.5) // random text resists
    assert(once.map(_.toSeq).toSeq == twice.map(_.toSeq).toSeq)
  }
}
