package graft.tools
import graft.GraftSession

/** Dev scratch probe (contents vary per investigation). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01");
         q <- Seq("tpcds_q14_v27", "tpcds_q24_v27")) {
      println(s"==== $q @ $dir")
      graft.SparkEntry.queries(q)(spark, dir).show(10, false)
    }
    spark.stop()
  }
}
