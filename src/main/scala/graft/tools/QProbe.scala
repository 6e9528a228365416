package graft.tools
import graft.GraftSession

object QProbe {
  def main(args: Array[String]): Unit = {
    // first arg is the sf dir when it starts with '/' (default sf0.1)
    val (dir, rest) = args.toSeq match {
      case d +: r if d.startsWith("/") => (d, r)
      case r                           => ("/root/testdata/sf0.1", r)
    }
    val spark = GraftSession.get("local[32]", 32)
    spark.range(1000).selectExpr("sum(id)").count()
    // intentionally runs the SAME query twice: first pass is the cold (plan-compile)
    // time, second is steady-state — mirrors Bench's warm-up+timed structure
    val names = if (rest.nonEmpty) rest
      else Seq("q_json_funcs", "q_json_funcs", "q_math", "q_math",
        "q_null_semantics", "q_null_semantics", "q_label_prop", "q_label_prop")
    for (n <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).count()
      println(f"[qprobe] $n%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
