package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def vecDf(rows: (Seq[Float], Seq[Float])*) = {
    import spark.implicits._
    rows.toSeq.toDF("a", "b")
  }

  test("cosine similarity on known vectors") {
    val df = vecDf(
      (Seq(1f, 0f), Seq(0f, 1f)),   // orthogonal -> 0
      (Seq(1f, 1f), Seq(1f, 1f)),   // identical -> 1
      (Seq(1f, 0f), Seq(-1f, 0f)),  // opposite -> -1
      (Seq(0f, 0f), Seq(1f, 1f)))   // zero vector -> 0 by convention
    val got = df.select(VectorFunctions.cosineSimilarity(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
    assert(got(3) == 0.0)
  }

  test("dot product matches manual computation") {
    val df = vecDf((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)))
    val got = df.select(VectorFunctions.dotProduct(col("a"), col("b")).as("d"))
      .collect().head.getDouble(0)
    assert(got == 32.0)
  }

  test("null input yields null (nullIntolerant)") {
    import spark.implicits._
    val df = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]])).toDF("a", "b")
    val got = df.select(VectorFunctions.cosineSimilarity(col("a"), col("b")).as("c")).collect()
    assert(got.head.isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(50)((Seq.fill(16)(rnd.nextFloat()), Seq.fill(16)(rnd.nextFloat())))
    val df = data.toDF("a", "b")
    val viaExpr = df.select(VectorFunctions.cosineSimilarity(col("a"), col("b"))).collect().map(_.getDouble(0))
    val manual = data.map { case (a, b) =>
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    // manual Seq.sum associates differently than the generated loop; allow float-level slack
    viaExpr.zip(manual).foreach { case (g, m) => assert(math.abs(g - m) < 1e-6) }
  }

  test("SQL registration through GraftExtensions") {
    val r = spark.sql(
      "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").collect()
    assert(r.head.getDouble(0) == 1.0)
    val d = spark.sql(
      "SELECT dot_product(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS d").collect()
    assert(d.head.getDouble(0) == 6.0)
  }
}
