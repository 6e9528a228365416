package graft.tools
import graft.GraftSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.get("local[8]", 8)
    val names = Seq("tpch_q1","tpch_q3","tpch_q5","tpch_q6","tpch_q18","q_scan_pushdown",
      "dedup_minhash","ann_bruteforce","text_tokens","q_events_window")
    for (n <- names) {
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, dir)
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
