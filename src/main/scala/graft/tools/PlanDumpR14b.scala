package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.pipeline.{Clustering, Dedup}
import graft.sources.TableIO

/**
 * Plan-evidence dump for the r14 batch-2 adoptions (dedup gated verification, k-means
 * native distance kernel, basket-lift fused items, equidepth codegen buckets): dumps
 * the AQE-final formatted plan of each adopted form and, where the change is an
 * expression swap, the before-form too, so the claimed plan difference (lambda
 * HigherOrderFunction nodes vs codegen'd native expressions; re-derived lineage vs
 * LogicalRDD) is committed as reviewable text.
 * `sbt "runMain graft.tools.PlanDumpR14b <sfDir> <outDir>"`
 */
object PlanDumpR14b {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "plans/r14"
    new java.io.File(out).mkdirs()
    val spark = GraftSession.get("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def dump(name: String, df: DataFrame): Unit = {
      df.queryExecution.toRdd.foreachPartition(_ => ())
      val s = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      val pw = new java.io.PrintWriter(s"$out/$name.txt", "UTF-8")
      try pw.println(s) finally pw.close()
      println(s"[plandump] wrote $out/$name.txt")
      clear()
    }

    // dedup_ngram_jaccard: ungated vs gated verification (sorted_intersect_size vs
    // sorted_intersect_size_gated in the project above the b-side join)
    {
      val g = Dedup.gramHashSets(TableIO.documents(spark, dir)).cache()
      dump("dedup_ngram_jaccard_before",
        Dedup.verifiedJaccardForProbe(Dedup.ngramCandidates(g, 0.5), g)
          .filter(col("jacc") >= 0.5).orderBy(col("a_id"), col("b_id")))
      dump("dedup_ngram_jaccard_after",
        Dedup.ngramJaccardPairs(g, 0.5).orderBy(col("a_id"), col("b_id")))
      g.unpersist(); clear()
    }

    // q_kmeans: one assignment pass, HOF distance vs native kernel (frames rebuilt per
    // dump — dump()'s clear() unpersists checkpoints, so they cannot be shared)
    {
      def assignWith(dist: org.apache.spark.sql.Column): DataFrame = {
        val vectors = TableIO.embeddings(spark, dir)
          .select(col("vec_id"),
            transform(col("embedding"),
              x => floor(x.cast("double") * 1000.0).cast("long")).as("qe"))
          .localCheckpoint()
        val cents = vectors.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("qe").as("ce")).localCheckpoint()
        vectors.crossJoin(broadcast(cents))
          .withColumn("dist", dist)
          .groupBy(col("vec_id"))
          .agg(min(struct(col("dist"), col("cid"))).as("m"))
          .select(col("vec_id"), col("m.cid").as("cid"), col("m.dist").as("dist"))
      }
      dump("q_kmeans_assign_before", assignWith(Clustering.sqDistHof(col("qe"), col("ce"))))
      dump("q_kmeans_assign_after", assignWith(
        org.apache.spark.sql.graft.VectorExpressions.sqDistLong(col("qe"), col("ce"))))
    }

    // q_basket_lift: un-fused vs fused items frame
    dump("q_basket_lift_before",
      graft.operators.AnalyticsOps.qBasketLiftImpl(spark, dir, 20, 3, fusedItems = false))
    dump("q_basket_lift_after",
      graft.operators.AnalyticsOps.qBasketLiftImpl(spark, dir, 20, 3, fusedItems = true))

    // q_equidepth_bins: the adopted form (codegen'd when/element_at bucket terms —
    // the before-form's ArrayFilter lambda appears in PctProbe's inline p4 phase)
    dump("q_equidepth_bins_after",
      graft.functions.ExpressionQueries.qEquidepthBins(spark, dir));
    // q_triangles: unspread (pre-r14) vs spread oriented-edge checkpoint
    {
      def canonical: DataFrame = {
        val li = TableIO.lineitem(spark, dir)
          .select(col("l_orderkey").as("k"), col("l_partkey")).distinct()
        li.select(col("k"), col("l_partkey").as("src"))
          .join(li.select(col("k"), col("l_partkey").as("dst")), Seq("k"))
          .filter(col("src") < col("dst"))
          .select(col("src"), col("dst"))
      }
      dump("q_triangles_before",
        graft.operators.GraphOps.triangleCount(canonical, spreadIntersect = false))
      dump("q_triangles_after",
        graft.operators.GraphOps.triangleCount(canonical, spreadIntersect = true))
    }

    spark.stop()
  }
}
