package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.GraphOps

/** r14 phase decomposition for the k-core peel variants: times the adjacency build,
  * each peel round, and the result materialization separately so the adoption decision
  * rests on where the seconds actually go (guide §1.1), not on end-to-end noise.
  * `sbt "runMain graft.tools.KcProbe <sfDir> [reps]"` */
object KcProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.get("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()
    import org.apache.spark.sql.graft.VectorExpressions.{packSortedVarint, unpackSortedVarint}

    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[kcprobe]   $tag ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    for (rep <- 1 to reps) {
      for (hinted <- Seq(true, false)) {
        println(s"[kcprobe] === rep $rep: packed decrement peel, hinted=$hinted ===")
        val total0 = System.nanoTime()
        val adj = GraphOps.coPurchaseEdges(spark, dir).select(col("src"), col("dst"))
          .groupBy(col("src")).agg(sort_array(collect_set(col("dst"))).as("ds"))
          .select(col("src"), packSortedVarint(col("ds")).as("nbrs"),
            size(col("ds")).cast("long").as("deg"))
          .cache()
        val n = t("adj build+count")(adj.count())
        val small = hinted && n <= 2000000L
        def gate(df: DataFrame): DataFrame = if (small) broadcast(df) else df
        var cur = adj.select(col("src"), col("deg"))
        for (r <- 0 until 2) {
          val dropped = cur.filter(col("deg") < 100).select(col("src"))
          val dec = adj.join(gate(dropped), Seq("src"), "left_semi")
            .select(explode(unpackSortedVarint(col("nbrs"))).as("src"))
            .groupBy(col("src")).agg(count(lit(1)).as("dcnt"))
          val next = cur.filter(col("deg") >= 100)
            .join(gate(dec), Seq("src"), "left")
            .select(col("src"), (col("deg") - coalesce(col("dcnt"), lit(0L))).as("deg"))
          cur = t(s"round $r checkpoint")(next.localCheckpoint())
        }
        val res = t("res checkpoint")(cur.filter(col("deg") > 0).localCheckpoint())
        t("orderBy+collect")(res.orderBy("src").collect())
        adj.unpersist()
        println(f"[kcprobe]   TOTAL ${(System.nanoTime() - total0) / 1e9}%6.2f s")
        clear()
      }
      // same decomposition for the edge-rewrite twin, coarser (its phases are rounds)
      println(s"[kcprobe] === rep $rep: edge-rewrite peel ===")
      val t1 = System.nanoTime()
      var e = t("distinct checkpoint")(GraphOps.coPurchaseEdges(spark, dir)
        .select(col("src"), col("dst")).distinct().localCheckpoint())
      for (r <- 0 until 2) {
        val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 100).select(col("src").as("id"))
        e = t(s"round $r rewrite")(e
          .join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
          .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
          .select(col("src"), col("dst")).localCheckpoint())
      }
      t("final degree+collect")(e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .orderBy("src").collect())
      println(f"[kcprobe]   TOTAL ${(System.nanoTime() - t1) / 1e9}%6.2f s")
      clear()
    }
    spark.stop()
  }
}
