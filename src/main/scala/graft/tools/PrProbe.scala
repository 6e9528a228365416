package graft.tools

import graft.GraftSession
import graft.operators.GraphOps

/** r12 A/B probe: array-adjacency vs varint-packed PageRank (judge ask #4).
  * `graft_run.sh graft.tools.PrProbe <sfDir> [reps]` — cold rep + (reps-1) warm per
  * variant, then a result-equality check. */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = GraftSession.get("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()
    def time(tag: String, f: () => org.apache.spark.sql.DataFrame): Unit =
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        val rows = f().collect()
        println(f"[prprobe] $tag rep$r ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=${rows.length}")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    time("array ", () => GraphOps.qPagerank(spark, dir))
    time("packed", () => GraphOps.qPagerankPacked(spark, dir))
    val a = GraphOps.qPagerank(spark, dir).collect().map(_.toString).toSeq
    val b = GraphOps.qPagerankPacked(spark, dir).collect().map(_.toString).toSeq
    println(s"[prprobe] equal=${a == b}")
    spark.stop()
  }
}
