package graft.tools
import graft.GraftSession
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("local[2]", 2)
    try println("date CTE: " + spark.sql("WITH date AS (SELECT 1 AS x) SELECT x FROM date").collect().toSeq)
    catch { case e: Exception => println("date CTE fail: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
