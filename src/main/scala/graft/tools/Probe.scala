package graft.tools
import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev scratch probe (contents vary per investigation). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("local[4]", 4)
    import spark.implicits._
    val daily = (1 to 6).map(i => ("a", f"2024-01-$i%02d", i.toLong))
      .toDF("event_type", "d", "cnt")
      .select(col("event_type"), to_date(col("d")).as("day"), col("cnt"))
    graft.operators.TimeSeriesOps.acfDaily(daily, 2).show(false)
    // moments debug
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    daily.select(col("event_type"), col("cnt"), lag(col("cnt"), 1).over(w).as("l1"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("syy"),
        sum(col("cnt") * col("l1")).as("sxy1"),
        sum(when(col("l1").isNotNull, col("cnt"))).as("sx1"),
        sum(col("l1")).as("sy1"), count(col("l1")).as("m1")).show(false)
    spark.stop()
  }
}
