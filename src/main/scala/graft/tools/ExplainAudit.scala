package graft.tools
import graft.GraftSession

/** Print the AQE-final formatted plan for the named queries (args), or a default
  * representative set. `sbt "runMain graft.tools.ExplainAudit [sfDir] name..."` —
  * first arg is the sf dir when it starts with '/'. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val (dir, names) = args.toSeq match {
      case d +: rest if d.startsWith("/") => (d, rest)
      case rest if rest.nonEmpty          => ("/root/testdata/sf0.001", rest)
      case _ => ("/root/testdata/sf0.1",
        Seq("tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q18", "q_scan_pushdown",
          "dedup_minhash", "ann_bruteforce", "text_tokens", "q_events_window"))
    }
    val spark = GraftSession.get("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, dir)
      // run the df's own QE so the printed plan is the AQE-final one
      df.queryExecution.toRdd.foreachPartition(_ => ())
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
