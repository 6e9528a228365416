package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.TableIO

/** r14 phase decomposition for the exactBySort family (q_equidepth_bins scaled
  * NEGATIVELY with cores at sf1: 3.09 s c8 vs 4.27 s c32 — bench_scaling_sf1_r14.json):
  * times the per-(group,value) count, the cumulative window, the rank-fetch join, and
  * the assignment join separately, so the regression is attributed to a stage before
  * anything changes (guide §1.1). Phases are inlined from Percentiles.exactBySort —
  * same plan. `sbt "runMain graft.tools.PctProbe <sfDir> [reps]"` */
object PctProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.get("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()

    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pctprobe]   $tag ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    val qs = Seq(0.25, 0.5, 0.75)
    for (rep <- 1 to reps) {
      println(s"[pctprobe] === rep $rep ===")
      val o = TableIO.orders(spark, dir)
        .select(col("o_orderstatus").as("status"), col("o_totalprice"))
      val keys = Seq("status")
      val keyCols = keys.map(col)
      val proj = o.select(keyCols :+ col("o_totalprice").cast("double").as("__v"): _*)
        .filter(col("__v").isNotNull)
      val vc = proj.groupBy(keyCols :+ col("__v"): _*).agg(count(lit(1)).as("__c"))
      t("p1 value-count agg")(noop(vc))
      val cum = vc.withColumn("__end", sum(col("__c")).over(
          Window.partitionBy(keyCols: _*).orderBy(col("__v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__start", col("__end") - col("__c"))
      t("p2 cum window")(noop(cum))
      val counts = vc.groupBy(keyCols: _*).agg(sum(col("__c")).as("__n"))
      import spark.implicits._
      val needed = counts
        .crossJoin(broadcast(qs.toDF("q")))
        .withColumn("__t", col("q") * (col("__n") - 1))
        .withColumn("__lo", floor(col("__t")).cast("long"))
        .withColumn("__hi", ceil(col("__t")).cast("long"))
        .select(keyCols ++ Seq(col("q"), col("__t"), col("__lo"),
          explode(array(col("__lo"), col("__hi"))).as("__rn")): _*)
        .distinct()
      val neededR = needed.select(
        keys.map(k => col(k).as(s"__k_$k")) ++
          Seq(col("q"), col("__t"), col("__lo"), col("__rn")): _*)
      val fetched = cum.join(neededR,
          keys.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _) &&
            col("__rn") >= col("__start") && col("__rn") < col("__end"))
        .groupBy(keyCols :+ col("q"): _*)
        .agg(
          min(when(col("__rn") === col("__lo"), col("__v"))).as("__vlo"),
          max(when(col("__rn") =!= col("__lo"), col("__v"))).as("__vhiOpt"),
          first(col("__t")).as("__t"),
          first(col("__lo")).as("__flo"))
        .select(keyCols ++ Seq(col("q"),
          (col("__vlo") + (col("__t") - col("__flo")) *
            (coalesce(col("__vhiOpt"), col("__vlo")) - col("__vlo"))).as("value")): _*)
      t("p3 rank-fetch join")(noop(fetched))
      val bounds = fetched
        .groupBy(keys.map(col): _*)
        .agg(sort_array(collect_list(col("value"))).as("__bs"))
      val assigned = o.join(bounds, keys)
        .withColumn("bucket",
          (lit(1) + size(filter(col("__bs"), b => col("o_totalprice").cast("double") > b))).cast("int"))
        .drop("__bs")
        .select(col("status"), col("bucket"), col("o_totalprice").cast("double").as("v"))
        .groupBy(col("status"), col("bucket"))
        .agg(count(lit(1)).as("n"), round(min(col("v")), 2).as("lo"), round(max(col("v")), 2).as("hi"))
        .orderBy(col("status"), col("bucket"))
      t("p4 assign+summarize")(noop(assigned))
      clear()
      t("end-to-end q_equidepth_bins")(noop(
        graft.functions.ExpressionQueries.qEquidepthBins(spark, dir)))
      clear()
      t("end-to-end q_mad_outliers")(noop(
        graft.operators.EventsQueries.qMadOutliers(spark, dir)))
      clear()
    }
    spark.stop()
  }
}
