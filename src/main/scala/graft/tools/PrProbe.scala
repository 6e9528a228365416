package graft.tools

import graft.GraftSession
import graft.operators.GraphOps

/** r12 A/B probe: array-adjacency vs varint-packed PageRank (judge ask #4).
  * `graft_run.sh graft.tools.PrProbe <sfDir> [reps]` — cold rep + (reps-1) warm per
  * variant, then a result-equality check. */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = GraftSession.get("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()
    def time1(tag: String, r: Int, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = f().collect()
      println(f"[prprobe] $tag rep$r ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=${rows.length}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def time(tag: String, f: () => org.apache.spark.sql.DataFrame): Unit =
      for (r <- 1 to reps) time1(tag, r, f)
    // arg(2) mode: "pa" = packed first; "mix" = interleaved a/p pairs (fairest under
    // drifting host load — each pair sees the same conditions); "lpmix"/"bfsmix" =
    // interleaved pairs for the label-propagation / BFS twins (r12 graph-pack rollout)
    val mode = if (args.length > 2) args(2) else "ap"
    def edgesOf(s: org.apache.spark.sql.SparkSession) = GraphOps.coPurchaseEdges(s, dir)
    mode match {
      case "lpmix" =>
        for (r <- 1 to reps) {
          time1("lp-arr", r, () => GraphOps.labelPropagationArray(edgesOf(spark), rounds = 2))
          time1("lp-pck", r, () => GraphOps.labelPropagation(edgesOf(spark), rounds = 2))
        }
        val a = GraphOps.labelPropagationArray(edgesOf(spark), 2)
          .orderBy("id").collect().map(_.toString).toSeq
        val b = GraphOps.labelPropagation(edgesOf(spark), 2)
          .orderBy("id").collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "bfsmix" =>
        def seeds(e: org.apache.spark.sql.DataFrame) =
          e.select(org.apache.spark.sql.functions.col("src").as("id"))
            .filter(org.apache.spark.sql.functions.col("id") % 97 === 0).distinct()
        for (r <- 1 to reps) {
          time1("bf-arr", r, () => { val e = edgesOf(spark); GraphOps.bfsArray(e, seeds(e), 2) })
          time1("bf-pck", r, () => { val e = edgesOf(spark); GraphOps.bfs(e, seeds(e), 2) })
        }
        val ea = edgesOf(spark)
        val a = GraphOps.bfsArray(ea, seeds(ea), 2).orderBy("id").collect().map(_.toString).toSeq
        val eb = edgesOf(spark)
        val b = GraphOps.bfs(eb, seeds(eb), 2).orderBy("id").collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "ssspmix" =>
        // r12 follow-on: weighted adjacency row-per-vertex (struct array) vs row-per-edge
        import org.apache.spark.sql.functions.{col, count, greatest, lit}
        def weighted(s: org.apache.spark.sql.SparkSession) =
          GraphOps.coPurchaseEdges(s, dir)
            .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
            .select(col("src"), col("dst"), greatest(lit(1L), lit(6L) - col("cnt")).as("w"))
        def seeds(e: org.apache.spark.sql.DataFrame) =
          e.select(col("src").as("id")).filter(col("id") % 101 === 0).distinct()
        for (r <- 1 to reps) {
          time1("ss-arr", r, () => { val e = weighted(spark); GraphOps.ssspArray(e, seeds(e), 3) })
          time1("ss-pck", r, () => { val e = weighted(spark); GraphOps.sssp(e, seeds(e), 3) })
        }
        val ea = weighted(spark)
        val a = GraphOps.ssspArray(ea, seeds(ea), 3).orderBy("id").collect().map(_.toString).toSeq
        val eb = weighted(spark)
        val b = GraphOps.sssp(eb, seeds(eb), 3).orderBy("id").collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "bfsgate" =>
        // r13: frontier-broadcast gate on/off, interleaved (VERDICT r12 Next #3)
        import org.apache.spark.sql.functions.col
        def seeds(e: org.apache.spark.sql.DataFrame) =
          e.select(col("src").as("id")).filter(col("id") % 97 === 0).distinct()
        for (r <- 1 to reps) {
          time1("bf-nog", r, () => { val e = edgesOf(spark); GraphOps.bfsImpl(e, seeds(e), 2, gateFrontier = false) })
          time1("bf-gat", r, () => { val e = edgesOf(spark); GraphOps.bfsImpl(e, seeds(e), 2, gateFrontier = true) })
        }
        val ea = edgesOf(spark)
        val a = GraphOps.bfsImpl(ea, seeds(ea), 2, gateFrontier = false).orderBy("id").collect().map(_.toString).toSeq
        val eb = edgesOf(spark)
        val b = GraphOps.bfsImpl(eb, seeds(eb), 2, gateFrontier = true).orderBy("id").collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "ssspgate" =>
        import org.apache.spark.sql.functions.{col, count, greatest, lit}
        def weighted(s: org.apache.spark.sql.SparkSession) =
          GraphOps.coPurchaseEdges(s, dir)
            .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
            .select(col("src"), col("dst"), greatest(lit(1L), lit(6L) - col("cnt")).as("w"))
        def seeds(e: org.apache.spark.sql.DataFrame) =
          e.select(col("src").as("id")).filter(col("id") % 101 === 0).distinct()
        for (r <- 1 to reps) {
          time1("ss-nog", r, () => { val e = weighted(spark); GraphOps.ssspImpl(e, seeds(e), 3, gateFrontier = false) })
          time1("ss-gat", r, () => { val e = weighted(spark); GraphOps.ssspImpl(e, seeds(e), 3, gateFrontier = true) })
        }
        val ea = weighted(spark)
        val a = GraphOps.ssspImpl(ea, seeds(ea), 3, gateFrontier = false).orderBy("id").collect().map(_.toString).toSeq
        val eb = weighted(spark)
        val b = GraphOps.ssspImpl(eb, seeds(eb), 3, gateFrontier = true).orderBy("id").collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "ssspfuse" =>
        // r13: qSssp prologue — double-lineage + 3 m-row exchanges vs single
        // checkpointed lineage with repartition(src) feeding both aggregates
        for (r <- 1 to reps) {
          time1("sf-old", r, () => GraphOps.qSsspImpl(spark, dir, fusedPrologue = false))
          time1("sf-new", r, () => GraphOps.qSsspImpl(spark, dir, fusedPrologue = true))
        }
        val a = GraphOps.qSsspImpl(spark, dir, fusedPrologue = false).collect().map(_.toString).toSeq
        val b = GraphOps.qSsspImpl(spark, dir, fusedPrologue = true).collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "bfsfuse" =>
        for (r <- 1 to reps) {
          time1("bf-old", r, () => GraphOps.qBfsImpl(spark, dir, fusedPrologue = false))
          time1("bf-new", r, () => GraphOps.qBfsImpl(spark, dir, fusedPrologue = true))
        }
        val a = GraphOps.qBfsImpl(spark, dir, fusedPrologue = false).collect().map(_.toString).toSeq
        val b = GraphOps.qBfsImpl(spark, dir, fusedPrologue = true).collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "mifuse" =>
        // r13: q_feature_mi — three per-feature scans vs one exploded-unpivot scan
        import graft.pipeline.FeatureStats
        for (r <- 1 to reps) {
          time1("mi-old", r, () => FeatureStats.qFeatureMiImpl(spark, dir, fused = false))
          time1("mi-new", r, () => FeatureStats.qFeatureMiImpl(spark, dir, fused = true))
        }
        val a = FeatureStats.qFeatureMiImpl(spark, dir, fused = false).collect().map(_.toString).toSeq
        val b = FeatureStats.qFeatureMiImpl(spark, dir, fused = true).collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "trispread" =>
        // r14: intersect-stage parallelism — AQE-coalesced checkpoint (r11-r13 form)
        // vs explicit (a,b) repartition to 2x defaultParallelism before the checkpoint
        for (r <- 1 to reps) {
          time1("tri-nsp", r, () => GraphOps.triangleCount(edgesOf(spark), spreadIntersect = false))
          time1("tri-spr", r, () => GraphOps.triangleCount(edgesOf(spark), spreadIntersect = true))
        }
        val a = GraphOps.triangleCount(edgesOf(spark), spreadIntersect = false).collect().map(_.toString).toSeq
        val b = GraphOps.triangleCount(edgesOf(spark), spreadIntersect = true).collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "kcorepack" =>
        // r14: edge-rewrite peel (r13 default) vs packed incremental-decrement peel
        for (r <- 1 to reps) {
          time1("kc-edg", r, () => GraphOps.kcorePeelEdgeRewrite(edgesOf(spark), k = 100, rounds = 2))
          time1("kc-pck", r, () => GraphOps.kcorePeelPacked(edgesOf(spark), k = 100, rounds = 2))
        }
        val a = GraphOps.kcorePeelEdgeRewrite(edgesOf(spark), 100, 2).orderBy("src").collect().map(_.toString).toSeq
        val b = GraphOps.kcorePeelPacked(edgesOf(spark), 100, 2).orderBy("src").collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "prpull" =>
        // r14: push iteration (one m-row exchange each) vs pull (zero-exchange) pagerank
        for (r <- 1 to reps) {
          time1("pr-psh", r, () => GraphOps.pageRankImpl(edgesOf(spark), 3, 0.85, pull = false))
          time1("pr-pll", r, () => GraphOps.pageRankImpl(edgesOf(spark), 3, 0.85, pull = true))
        }
        val a = GraphOps.pageRankImpl(edgesOf(spark), 3, 0.85, pull = false)
          .selectExpr("id", "round(pr, 6) as pr6").orderBy("id").collect().map(_.toString).toSeq
        val b = GraphOps.pageRankImpl(edgesOf(spark), 3, 0.85, pull = true)
          .selectExpr("id", "round(pr, 6) as pr6").orderBy("id").collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "lppull" =>
        // r14: push rounds (two exchanges each) vs pull (zero-exchange) label propagation
        for (r <- 1 to reps) {
          time1("lp-psh", r, () => GraphOps.labelPropagationImpl(edgesOf(spark), 2, pull = false))
          time1("lp-pll", r, () => GraphOps.labelPropagationImpl(edgesOf(spark), 2, pull = true))
        }
        val a = GraphOps.labelPropagationImpl(edgesOf(spark), 2, pull = false)
          .orderBy("id").collect().map(_.toString).toSeq
        val b = GraphOps.labelPropagationImpl(edgesOf(spark), 2, pull = true)
          .orderBy("id").collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "bfspull" =>
        // r14: frontier-expand rounds (distinct exchange) vs symmetric pull rounds
        for (r <- 1 to reps) {
          time1("bf-psh", r, () => GraphOps.qBfsImpl(spark, dir, fusedPrologue = true, pullFrontier = false))
          time1("bf-pll", r, () => GraphOps.qBfsImpl(spark, dir, fusedPrologue = true, pullFrontier = true))
        }
        val a = GraphOps.qBfsImpl(spark, dir, true, pullFrontier = false).collect().map(_.toString).toSeq
        val b = GraphOps.qBfsImpl(spark, dir, true, pullFrontier = true).collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "ssspcache" =>
        // r14: fused prologue materialized via localCheckpoint (r13) vs cache() —
        // cache keeps HashPartitioning(src), so the adjacency groupBy rides it
        for (r <- 1 to reps) {
          time1("ss-ckp", r, () => GraphOps.qSsspImpl(spark, dir, fusedPrologue = true, prologueCache = false))
          time1("ss-cch", r, () => GraphOps.qSsspImpl(spark, dir, fusedPrologue = true, prologueCache = true))
        }
        val a = GraphOps.qSsspImpl(spark, dir, true, prologueCache = false).collect().map(_.toString).toSeq
        val b = GraphOps.qSsspImpl(spark, dir, true, prologueCache = true).collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "kcoremix" =>
        // r13: edge-rewrite peeling vs vertex-carry twin (VERDICT r12 Next #4)
        for (r <- 1 to reps) {
          time1("kc-edg", r, () => GraphOps.kcorePeel(edgesOf(spark), k = 100, rounds = 2))
          time1("kc-vtx", r, () => GraphOps.kcorePeelVertex(edgesOf(spark), k = 100, rounds = 2))
        }
        val a = GraphOps.kcorePeel(edgesOf(spark), 100, 2).orderBy("src").collect().map(_.toString).toSeq
        val b = GraphOps.kcorePeelVertex(edgesOf(spark), 100, 2).orderBy("src").collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "mix" =>
        for (r <- 1 to reps) {
          time1("array ", r, () => GraphOps.qPagerankArray(spark, dir))
          time1("packed", r, () => GraphOps.qPagerank(spark, dir))
        }
        val a = GraphOps.qPagerankArray(spark, dir).collect().map(_.toString).toSeq
        val b = GraphOps.qPagerank(spark, dir).collect().map(_.toString).toSeq
        println(s"[prprobe] equal=${a == b}")
      case "pa" =>
        time("packed", () => GraphOps.qPagerank(spark, dir))
        time("array ", () => GraphOps.qPagerankArray(spark, dir))
      case _ =>
        time("array ", () => GraphOps.qPagerankArray(spark, dir))
        time("packed", () => GraphOps.qPagerank(spark, dir))
    }
    spark.stop()
  }
}
