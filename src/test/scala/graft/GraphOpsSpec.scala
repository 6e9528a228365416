package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  /** In-memory power-iteration reference: same fixed-iteration, symmetric-graph rule. */
  private def referencePr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = out.size.toDouble
    var pr = out.keys.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val contribs = edges.groupBy(_._2).view.mapValues { in =>
        in.map { case (s, _) => pr(s) / out(s).size }.sum
      }.toMap
      pr = out.keys.map(id => id -> (0.15 / n + 0.85 * contribs.getOrElse(id, 0.0))).toMap
    }
    pr
  }

  test("pageRank matches the in-memory power iteration on a hand graph") {
    import spark.implicits._
    // path 1-2-3 plus pendant 4 on 2 (symmetric): 2 is the hub
    val undirected = Seq((1L, 2L), (2L, 3L), (2L, 4L))
    val sym = undirected ++ undirected.map(_.swap)
    val got = GraphOps.pageRank(sym.toDF("src", "dst"), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = referencePr(sym, 3)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, pr) =>
      assert(math.abs(pr - want(id)) < 1e-12, s"node $id: $pr vs ${want(id)}")
    }
    assert(got(2L) > got(1L) && got(2L) > got(3L) && got(2L) > got(4L), "hub must rank highest")
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "rank mass is conserved on a symmetric graph")
  }

  test("q_pagerank returns a full top-50 with a total deterministic order") {
    val rows = GraphOps.qPagerank(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length == 50)
    // non-increasing by score; ties strictly increasing by partkey
    rows.sliding(2).foreach { case Array((k1, p1), (k2, p2)) =>
      assert(p1 > p2 || (p1 == p2 && k1 < k2), s"order violated at ($k1,$p1) ($k2,$p2)")
    }
    val again = GraphOps.qPagerank(spark, sf).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.sameElements(again), "fixed-iteration pagerank must be deterministic")
  }

  test("bfs assigns minimum hop distances and respects the hop bound") {
    import spark.implicits._
    // chain 1->2->3->4->5 with a shortcut 1->4; seed at 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = GraphOps.bfs(edges, seeds, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 4 is reached in 1 hop via the shortcut, 5 in 2; the plain chain would say 3 and 4
    assert(got == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
  }

  test("bfs drains early on a short graph and dedups multi-edges and seed ids") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L, 1L).toDF("id")
    val got = GraphOps.bfs(edges, seeds, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1))
  }

  test("disconnected nodes never appear; multi-seed takes the nearest seed") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val seeds = Seq(1L, 10L).toDF("id")
    val got = GraphOps.bfs(edges, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 10L -> 0, 2L -> 1, 11L -> 1, 3L -> 2))
  }

  /** All triangles of a vertex set by brute force (reference for triangleCount). */
  private def referenceTriangles(edges: Seq[(Long, Long)]): Long = {
    val und = edges.flatMap { case (a, b) => Seq((a min b, a max b)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    nodes.combinations(3).count { case Seq(x, y, z) =>
      und((x, y)) && und((y, z)) && und((x, z))
    }
  }

  test("triangleCount matches brute force on hand graphs; multi-edges and direction ignored") {
    import spark.implicits._
    // K4 (4 triangles) + pendant + disconnected edge, given as noisy directed multi-edges
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 4L), (10L, 11L), (1L, 2L), (2L, 1L))).toDF("src", "dst")
    val got = GraphOps.triangleCount(edges).head().getLong(0)
    assert(got == 4L)
    assert(got == referenceTriangles(k4 ++ Seq((4L, 5L), (10L, 11L))))
    // triangle-free bipartite square: zero
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    assert(GraphOps.triangleCount(square).head().getLong(0) == 0L)
  }

  test("q_triangles is deterministic and positive on the co-purchase graph") {
    val a = GraphOps.qTriangles(spark, sf).head().getLong(0)
    val b = GraphOps.qTriangles(spark, sf).head().getLong(0)
    assert(a == b && a > 0, s"got $a then $b")
  }
}
