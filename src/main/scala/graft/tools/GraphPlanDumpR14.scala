package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.GraphOps

/**
 * Plan-evidence dump for the r14 graph-pack A/Bs (same approach as r13's
 * GraphPlanDump): the iterative operators return localCheckpoint-rooted frames whose
 * final plan shows only the LAST round, so for the per-round pull-vs-push claims this
 * reconstructs ONE representative round per variant off the cached packed adjacency
 * and dumps its AQE-final formatted plan. What each pair should show:
 *
 *  - pagerank push round: BroadcastHashJoin + Exchange hashpartitioning(id) for the
 *    contributions groupBy(id); pull round: BroadcastHashJoin and NO exchange — the
 *    groupBy(src, deg) rides the cached adjacency's partitioning.
 *  - label-prop push round: TWO exchanges (votes groupBy(dst,label), argmax
 *    groupBy(dst)); pull round: ZERO — both aggregates keyed by the row's own src.
 *  - kcore edge-rewrite round 1: degree exchange over the O(m) edge set (plus the
 *    initial full-m distinct() exchange, dumped separately); packed decrement round:
 *    vertex-sized semi-join + explode + groupBy(src) decrement, no m-row rewrite.
 *  - sssp prologue: localCheckpoint surfaces as LogicalRDD/UnknownPartitioning and
 *    the adjacency groupBy(src) pays an exchange; cache() keeps
 *    HashPartitioning(src) from the explicit repartition and the groupBy rides it.
 *
 * `sbt "runMain graft.tools.GraphPlanDumpR14 <sfDir> <outDir>"`
 */
object GraphPlanDumpR14 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "plans/r14"
    new java.io.File(out).mkdirs()
    val spark = GraftSession.get("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.graft.VectorExpressions.{packSortedVarint, unpackSortedVarint}

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
    }

    def edges = GraphOps.coPurchaseEdges(spark, dir)

    // --- pagerank: one push round vs one pull round off the same cached adjacency ---
    {
      val adj = edges.select(col("src"), col("dst"))
        .groupBy(col("src")).agg(sort_array(collect_set(col("dst"))).as("ds"))
        .select(col("src"), packSortedVarint(col("ds")).as("nbrs"),
          size(col("ds")).cast("long").as("deg"))
        .cache()
      val n = adj.count()
      val ranks = adj.select(col("src").as("id"), lit(1.0 / n).as("pr"),
        (lit(1.0 / n) / col("deg")).as("c")).localCheckpoint()
      val rankSide = ranks.select(col("id").as("src"), col("pr")).drop("c")
      val pushRound = adj
        .join(broadcast(ranks.withColumnRenamed("id", "src").select(col("src"), col("pr"))), Seq("src"))
        .select(explode(unpackSortedVarint(col("nbrs"))).as("id"),
          (col("pr") / col("deg")).as("c"))
        .groupBy(col("id"))
        .agg((lit(0.15 / n) + lit(0.85) * sum(col("c"))).as("pr"))
      dump("q_pagerank_iteration_before", pushRound)
      val pullRound = adj
        .select(col("src"), col("deg"), explode(unpackSortedVarint(col("nbrs"))).as("nbr"))
        .join(broadcast(ranks.select(col("id").as("nbr"), col("c"))), Seq("nbr"))
        .groupBy(col("src"), col("deg"))
        .agg((lit(0.15 / n) + lit(0.85) * sum(col("c"))).as("pr"))
        .select(col("src").as("id"), col("pr"), (col("pr") / col("deg")).as("c"))
      dump("q_pagerank_iteration_after", pullRound)
      adj.unpersist(); clear()
    }

    // --- label propagation: one push round vs one pull round ---
    {
      val adj = edges.select(col("src"), col("dst"))
        .groupBy(col("src"))
        .agg(packSortedVarint(sort_array(collect_set(col("dst")))).as("nbrs"))
        .cache()
      adj.count()
      val labels = adj.select(col("src").as("id"))
        .select(col("id"), col("id").as("label")).localCheckpoint()
      val labelSide = labels.withColumnRenamed("id", "src")
      val pushRound = adj.join(broadcast(labelSide), Seq("src"))
        .select(explode(unpackSortedVarint(col("nbrs"))).as("dst"), col("label"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("dst").as("id"), (-col("m.nl")).as("label"))
      dump("q_label_prop_round_before", pushRound)
      val pullRound = adj
        .select(col("src"), explode(unpackSortedVarint(col("nbrs"))).as("nbr"))
        .join(broadcast(labels.select(col("id").as("nbr"), col("label"))), Seq("nbr"))
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("src"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("src").as("id"), (-col("m.nl")).as("label"))
      dump("q_label_prop_round_after", pullRound)
      adj.unpersist(); clear()
    }

    // --- kcore: edge-rewrite round 1 (plus its initial distinct) vs packed round 1 ---
    {
      val e0 = edges.select(col("src"), col("dst")).distinct()
      dump("q_kcore_initial_distinct_before", e0)
      val e = e0.localCheckpoint()
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 100).select(col("src").as("id"))
      val rewriteRound = e
        .join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
      dump("q_kcore_round_before", rewriteRound)
      clear()
    }
    {
      val adj = edges.select(col("src"), col("dst"))
        .groupBy(col("src")).agg(sort_array(collect_set(col("dst"))).as("ds"))
        .select(col("src"), packSortedVarint(col("ds")).as("nbrs"),
          size(col("ds")).cast("long").as("deg"))
        .cache()
      adj.count()
      dump("q_kcore_adjacency_build_after", adj.select(col("src"), col("deg")))
      val cur = adj.select(col("src"), col("deg"))
      val dropped = cur.filter(col("deg") < 100).select(col("src"))
      val dec = adj.join(broadcast(dropped), Seq("src"), "left_semi")
        .select(explode(unpackSortedVarint(col("nbrs"))).as("src"))
        .groupBy(col("src")).agg(count(lit(1)).as("dcnt"))
      val decRound = cur.filter(col("deg") >= 100)
        .join(broadcast(dec), Seq("src"), "left")
        .select(col("src"), (col("deg") - coalesce(col("dcnt"), lit(0L))).as("deg"))
      dump("q_kcore_round_after", decRound)
      adj.unpersist(); clear()
    }

    // --- sssp prologue: checkpointed weighted frame vs cached (adjacency build) ---
    {
      def weightedPlan = edges
        .repartition(col("src"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
        .select(col("src"), col("dst"), greatest(lit(1L), lit(6L) - col("cnt")).as("w"))
      val wCkpt = weightedPlan.localCheckpoint()
      dump("q_sssp_adjacency_before",
        wCkpt.groupBy(col("src")).agg(collect_list(struct(col("dst"), col("w"))).as("nbrs")))
      clear()
      val wCache = weightedPlan.cache()
      wCache.count()
      dump("q_sssp_adjacency_after",
        wCache.groupBy(col("src")).agg(collect_list(struct(col("dst"), col("w"))).as("nbrs")))
      wCache.unpersist(); clear()
    }

    // --- bfs: frontier-expand round vs symmetric pull round ---
    {
      val adj = edges.select(col("src"), col("dst"))
        .groupBy(col("src"))
        .agg(packSortedVarint(sort_array(collect_set(col("dst")))).as("nbrs"))
        .cache()
      adj.count()
      val seeds = edges.select(col("src").as("id"))
        .filter(col("id") % 97 === 0).distinct()
      val visited = seeds.select(col("id"), lit(0).as("hop")).localCheckpoint()
      val frontier = visited.select(col("id"))
      val pushRound = frontier.withColumnRenamed("id", "src")
        .join(adj, Seq("src"))
        .select(explode(unpackSortedVarint(col("nbrs"))).as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .select(col("id"), lit(1).as("hop"))
      dump("q_bfs_round_before", pushRound)
      val pullRound = adj
        .select(col("src").as("id"), explode(unpackSortedVarint(col("nbrs"))).as("nbr"))
        .join(broadcast(frontier.withColumnRenamed("id", "nbr")), Seq("nbr"))
        .select(col("id")).dropDuplicates("id")
        .join(broadcast(visited.select(col("id"))), Seq("id"), "left_anti")
        .select(col("id"), lit(1).as("hop"))
      dump("q_bfs_round_after", pullRound)
      adj.unpersist(); clear()
    }

    spark.stop()
  }
}
