package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.pipeline.SemanticDedup

class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val Dim = 64 // 3 cluster axes + one dedicated axis per point
  private val PlantedDups = Seq(0L, 7L, 25L, 41L) // originals; 100+i is the near-copy

  private def normalize(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x * x.toDouble).sum)
    v.map(x => (x / n).toFloat)
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { d += a(i).toDouble * b(i); i += 1 }
    d / (math.sqrt(a.map(x => x * x.toDouble).sum) * math.sqrt(b.map(x => x * x.toDouble).sum))
  }

  /** Deterministic separable geometry: point (b, j) = cluster axis e_b + its own
    * dedicated axis, equally weighted — so intra-cluster non-dup cosine is exactly 0.5,
    * cross-cluster exactly 0, and the 4 planted near-copies (one coordinate nudged)
    * ~0.9999. tau = 0.9 splits the planted pairs from everything else with a wide
    * deterministic margin — no random draw can make the test flaky. */
  private def planted(): (DataFrame, Map[Long, Array[Float]]) = {
    import spark.implicits._
    val w = math.sqrt(0.5).toFloat
    val pts = (for { b <- 0 until 3; j <- 0 until 20 } yield {
      val v = new Array[Float](Dim)
      v(b) = w
      v(3 + b * 20 + j) = w
      ((b * 20 + j).toLong, v)
    }).toMap
    val dups = PlantedDups.map { i =>
      val v = pts(i).clone()
      v(Dim - 1) += 0.01f
      (100L + i, normalize(v))
    }.toMap
    val all = pts ++ dups
    (all.toSeq.sortBy(_._1).toDF("vec_id", "embedding"), all)
  }

  test("planted geometry is valid: dups above tau, every other pair below it") {
    val (_, vecs) = planted()
    val tau = 0.9
    val ids = vecs.keys.toSeq.sorted
    val nonDupMax = (for {
      a <- ids; b <- ids if a < b
      if !PlantedDups.contains(a) || b != a + 100
    } yield cos(vecs(a), vecs(b))).max
    val dupMin = PlantedDups.map(i => cos(vecs(i), vecs(100L + i))).min
    assert(nonDupMax < tau - 0.02, s"non-dup pair too close to tau: $nonDupMax")
    assert(dupMin > 0.99, s"planted dup not near-identical: $dupMin")
  }

  test("k-means semantic dedup drops exactly the planted near-copies") {
    val (df, _) = planted()
    val out = SemanticDedup.semanticDedup(df, k = 3, tau = 0.9).collect()
    val dropped = out.filter(_.getInt(2) == 0).map(_.getLong(0)).toSet
    assert(dropped == PlantedDups.map(_ + 100L).toSet,
      s"expected the 4 planted copies dropped, got $dropped")
    // the copy must share its original's cluster, and clusters must partition the space
    val clusterOf = out.map(r => r.getLong(0) -> r.get(1)).toMap
    PlantedDups.foreach(i => assert(clusterOf(i) == clusterOf(100L + i)))
    assert(out.map(_.get(1)).distinct.length == 3)
  }

  test("fixed-centroid twin matches an in-memory replay of its declared rule") {
    val (df, vecs) = planted()
    val k = 5
    val tau = 0.9
    val out = SemanticDedup.semanticDedupFixed(df, k = k, tau = tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val cents = vecs.keys.toSeq.sorted.take(k)
    def assignOf(id: Long): Long =
      cents.map(c => (c, cos(vecs(id), vecs(c)))).minBy { case (c, s) => (-s, c) }._1
    val assign = vecs.keys.map(id => id -> assignOf(id)).toMap
    val expected = vecs.keys.toSeq.sorted.map { id =>
      val dup = vecs.keys.exists(o =>
        o < id && assign(o) == assign(id) && cos(vecs(o), vecs(id)) >= tau)
      (id, assign(id), if (dup) 0 else 1)
    }
    assert(out.toSeq == expected)
  }

  test("every dropped vector has a kept lower-id cluster-mate above tau (sf corpus)") {
    val sf = SparkTestBase.sf
    val tau = 0.45
    val out = SemanticDedup.dedupSemantic(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val emb = graft.sources.TableIO.embeddings(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val byCluster = out.groupBy(_._2)
    assert(out.length == emb.size, "output must cover every vector exactly once")
    out.filter(_._3 == 0).foreach { case (id, cl, _) =>
      val witness = byCluster(cl).exists { case (o, _, _) =>
        o < id && cos(emb(o), emb(id)) >= tau
      }
      assert(witness, s"dropped $id has no qualifying lower-id cluster-mate")
    }
  }
}
