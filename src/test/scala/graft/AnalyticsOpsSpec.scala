package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AnalyticsOps

class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  // ---------------------------------------------------------------- skyline

  /** O(n^2) reference skyline: p survives iff nothing dominates it. */
  private def bruteSkyline(pts: Seq[(Long, Double, Int)]): Set[(Long, Double, Int)] =
    pts.filter { case (_, price, size) =>
      !pts.exists { case (_, qp, qs) =>
        qp <= price && qs >= size && (qp < price || qs > size)
      }
    }.toSet

  test("skyline matches the brute-force frontier on seeded random points") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (1L to 500L).map(i =>
      (i, math.floor(rnd.nextDouble() * 100) / 10.0, rnd.nextInt(40)))
    val df = pts.toDF("p_partkey", "p_retailprice", "p_size").repartition(7)
    val got = AnalyticsOps.skyline(df)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(got == bruteSkyline(pts))
  }

  test("skyline keeps duplicate points (no strict dominance between equals)") {
    import spark.implicits._
    val pts = Seq((1L, 5.0, 10), (2L, 5.0, 10), (3L, 6.0, 9))
    val got = AnalyticsOps.skyline(pts.toDF("p_partkey", "p_retailprice", "p_size"))
      .collect().map(_.getLong(0)).toSet
    // (3) is dominated by both copies of (5.0, 10); the equal twins survive
    assert(got == Set(1L, 2L))
  }

  test("paretoSweep is a sound local prune: survivors superset the true frontier") {
    val rnd = new scala.util.Random(11)
    val pts = (1L to 300L).map(i => (i, rnd.nextDouble() * 9, rnd.nextInt(30)))
    val sorted = pts.sortBy { case (id, p, s) => (p, -s, id) }
    val surv = AnalyticsOps.paretoSweep(sorted.iterator).toSet
    val frontier = bruteSkyline(pts)
    assert(frontier.subsetOf(surv), "local sweep must never drop a frontier point")
    // and on fully-sorted input the sweep IS the frontier
    assert(surv == frontier)
  }

  test("q_skyline output is the frontier of part and totally ordered") {
    val rows = AnalyticsOps.qSkyline(spark, sf).collect()
    assert(rows.nonEmpty)
    val pts = rows.map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    // frontier is mutually non-dominating
    pts.foreach { case (_, p, s) =>
      assert(!pts.exists { case (_, qp, qs) =>
        qp <= p && qs >= s && (qp < p || qs > s)
      })
    }
    pts.sliding(2).foreach { case Array((k1, p1, s1), (k2, p2, s2)) =>
      assert(p1 < p2 || (p1 == p2 && (s1 < s2 || (s1 == s2 && k1 < k2))))
    }
  }

  // ------------------------------------------------------------------ mode

  test("q_mode is deterministic on count ties (lexicographically smallest wins)") {
    import spark.implicits._
    // two priorities tied at 2, one behind: '1-URGENT' must win over '3-LOW'
    val df = Seq(
      ("O", "2024-02-01", "3-LOW"), ("O", "2024-03-01", "3-LOW"),
      ("O", "2024-04-01", "1-URGENT"), ("O", "2024-05-01", "1-URGENT"),
      ("O", "2024-06-01", "5-NONE"))
      .toDF("o_orderstatus", "d", "o_orderpriority")
      .withColumn("o_orderdate", col("d").cast("timestamp"))
    val counted = df.groupBy(col("o_orderstatus"), year(col("o_orderdate")).as("yr"),
      col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("o_orderstatus"), col("yr"))
      .orderBy(col("cnt").desc, col("o_orderpriority"))
    val got = counted.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_orderpriority"), col("cnt")).collect()
    assert(got.length == 1 && got(0).getString(0) == "1-URGENT" && got(0).getLong(1) == 2L)
  }

  test("q_mode reports a real mode per group at sf0.001") {
    val rows = AnalyticsOps.qMode(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) >= 1L))
    val groups = rows.map(r => (r.getString(0), r.getInt(1)))
    assert(groups.distinct.length == groups.length, "one mode row per group")
  }

  // ----------------------------------------------------------- concurrency

  test("distributed two-level prefix sum equals the naive global sweep") {
    // naive reference: global running sum over net deltas, computed in memory
    import spark.implicits._
    // stringify the date inside the plan so the JVM default TZ can't skew collect()
    val got = AnalyticsOps.qConcurrency(spark, sf)
      .selectExpr("CAST(day AS STRING) AS day", "day_peak")
      .collect().map(r => (r.getString(0), r.getLong(1)))

    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000 * 1000
    val sessions = graft.sources.TableIO.events(spark, sf)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session", when(col("prev_us").isNull ||
        unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("sid", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(unix_micros(min(col("ts"))).as("lo"), unix_micros(max(col("ts"))).as("hi"))
      .select(col("lo"), col("hi")).as[(Long, Long)].collect()

    val deltas = sessions.flatMap { case (lo, hi) => Seq((lo, 1L), ((hi + 1), -1L)) }
    val net = deltas.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var run = 0L
    val peaks = scala.collection.mutable.Map.empty[String, Long]
    net.foreach { case (us, d) =>
      run += d
      // session timezone is UTC (GraftSession), so day bucketing must match it
      val day = java.time.Instant.ofEpochSecond(us / 1000000)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      peaks(day) = math.max(peaks.getOrElse(day, Long.MinValue), run)
    }
    assert(got.toMap == peaks.toMap)
    assert(got.map(_._1).sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
  }

  test("distributedCumSum equals a sequential scan on shuffled input") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1L to 5000L).map(i => (i, rnd.nextInt(1000).toLong))
    val df = rnd.shuffle(rows).toDF("id", "v").repartition(13)
    val got = AnalyticsOps.distributedCumSum(df, Seq(col("v").desc, col("id")), col("v"))
      .select(col("id"), col("cum")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var run = 0L
    val want = rows.sortBy { case (id, v) => (-v, id) }.map { case (id, v) =>
      run += v; id -> run
    }.toMap
    assert(got == want)
  }

  test("q_abc covers all three classes with shares summing to 1") {
    val rows = AnalyticsOps.qAbc(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
    val shareSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 1e-3, s"shares sum to $shareSum")
    // Pareto shape: the A head holds 70% of revenue with a minority of parts
    val total = rows.map(_.getLong(1)).sum
    assert(rows(0).getLong(1) < total, "class A must not be the whole catalog")
  }

  test("q_rfm scores span 1..5 and cells partition the customer base") {
    val rows = AnalyticsOps.qRfm(spark, sf).collect()
    val nCustomers = graft.sources.TableIO.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(3)).sum == nCustomers, "cells partition all customers")
    rows.foreach { r =>
      (0 to 2).foreach(i => assert(r.getInt(i) >= 1 && r.getInt(i) <= 5))
    }
    val rScores = rows.map(_.getInt(0)).toSet
    assert(rScores.max == 5 && rScores.min == 1, "full quintile range used")
  }

  test("concurrency peaks are positive and bounded by distinct users") {
    val rows = AnalyticsOps.qConcurrency(spark, sf).collect()
    assert(rows.nonEmpty)
    val nUsers = graft.sources.TableIO.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.forall(r => r.getLong(1) >= 1L && r.getLong(1) <= nUsers))
  }
}
