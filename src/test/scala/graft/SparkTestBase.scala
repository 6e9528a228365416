package graft

import org.apache.spark.sql.SparkSession

/** Shared session for all suites (one JVM, one session — sbt forks tests once). */
object SparkTestBase {
  lazy val spark: SparkSession = GraftSession.get("local[4]", 4)
  val sf: String = "/root/testdata/sf0.001"
}
