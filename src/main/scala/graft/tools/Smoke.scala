package graft.tools
import graft.GraftSession

/** Dev tool: dump a few named SparkEntry queries to /tmp for quick DuckDB comparison. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("local[8]", 8)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args(0).split(",").toSeq else Seq.empty
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.write.mode("overwrite").parquet(s"/tmp/smoke_out/$n")
      println(s"[smoke] $n rows=" + spark.read.parquet(s"/tmp/smoke_out/$n").count())
    }
    spark.stop()
  }
}
