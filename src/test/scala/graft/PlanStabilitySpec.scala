package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanStability

/**
 * Golden plan-shape snapshot over the verbatim benchmark surfaces (TPC-H, TPC-DS,
 * SSB) — the graft analog of the reference's tpcds-plan-stability approved plans.
 * A drifted fingerprint means a join changed class/build side or the exchange count
 * moved: either an intentional change (regenerate the snapshot with
 * `sbt "runMain graft.tools.PlanStability"` and commit the reviewable diff) or a
 * regression this spec just caught before it became bench drift.
 */
class PlanStabilitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private lazy val snapshot: Map[String, String] = {
    val src = Source.fromFile(PlanStability.snapshotPath, "UTF-8")
    try src.getLines().map { l =>
      val Array(k, v) = l.split("\t", 2); k -> v
    }.toMap
    finally src.close()
  }

  test("every covered benchmark query matches its committed plan fingerprint") {
    val keys = PlanStability.coveredKeys
    assert(snapshot.keySet == keys.toSet,
      s"snapshot out of date: missing=${keys.toSet.diff(snapshot.keySet)} " +
        s"stale=${snapshot.keySet.diff(keys.toSet)} — regenerate it")
    val drifted = keys.flatMap { name =>
      val now = PlanStability.fingerprint(SparkEntry.queries(name)(spark, sf))
      if (now == snapshot(name)) None else Some(s"$name:\n  was ${snapshot(name)}\n  now $now")
    }
    assert(drifted.isEmpty,
      s"${drifted.size} plan fingerprint(s) drifted:\n${drifted.mkString("\n")}")
  }

  test("the fingerprint is sensitive to a dim falling out of broadcast (canary)") {
    // Deliberately break broadcast planning; the fingerprint MUST move, or this
    // harness could never catch the regression class it exists for.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val broken = PlanStability.fingerprint(SparkEntry.queries("ssb_q2_1")(spark, sf))
      assert(broken != snapshot("ssb_q2_1"),
        "disabling broadcast did not change ssb_q2_1's fingerprint — harness is blind")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
