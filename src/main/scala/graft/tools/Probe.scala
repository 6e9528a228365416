package graft.tools
import graft.GraftSession

/** Dev scratch probe (contents vary per investigation). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("local[32]", 32)
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").count()
    val r1 = t("q_triangles cold") { graft.operators.GraphOps.qTriangles(spark, dir).head().getLong(0) }
    spark.catalog.clearCache()
    val r2 = t("q_triangles warm") { graft.operators.GraphOps.qTriangles(spark, dir).head().getLong(0) }
    println(s"[probe] triangles=$r1 / $r2 (expect 1884488)")
    spark.stop()
  }
}
