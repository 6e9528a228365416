package graft.tools
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.TableIO
import graft.pipeline.TextAnalysis
object QProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.get("local[32]", 32)
    spark.range(1000).selectExpr("sum(id)").count()
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[qprobe] $n%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$r")
    }
    time("quality.count")(TextAnalysis.textQuality(spark, dir).count())
    time("quality full eval")(TextAnalysis.textQuality(spark, dir)
      .agg(sum(col("quality_score"))).count())
    time("quality filter join")(TextAnalysis.textQualityFilter(spark, dir).count())
    time("quality filter join 2nd")(TextAnalysis.textQualityFilter(spark, dir).count())
    spark.stop()
  }
}
