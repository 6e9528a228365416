package graft.tools

import org.apache.spark.sql.functions.{col, count, greatest, lit}

import graft.GraftSession
import graft.operators.GraphOps

/**
 * Plan-evidence dump for the r13 graph-pack A/Bs: prints the AQE-final formatted plan
 * of each variant under comparison (bfs/sssp frontier gate off/on, k-core edge-rewrite
 * vs vertex-carry) so the adopted default's join strategy is committed as reviewable
 * text (plans/r13/) rather than claimed. The iterative operators drive their own
 * actions internally, so each variant's LAST round's plan is what the returned frame
 * carries — exactly the per-round shape the gate changes.
 *
 * `sbt "runMain graft.tools.GraphPlanDump <sfDir> <outDir>"`
 */
object GraphPlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "plans/r13"
    new java.io.File(out).mkdirs()
    val spark = GraftSession.get("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.foreachPartition(_ => ())
      val s = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      val pw = new java.io.PrintWriter(s"$out/$name.txt", "UTF-8")
      try pw.println(s) finally pw.close()
      println(s"[plandump] wrote $out/$name.txt")
      clear()
    }

    def edges = GraphOps.coPurchaseEdges(spark, dir)
    def bfsSeeds(e: org.apache.spark.sql.DataFrame) =
      e.select(col("src").as("id")).filter(col("id") % 97 === 0).distinct()
    def weighted = edges
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
      .select(col("src"), col("dst"), greatest(lit(1L), lit(6L) - col("cnt")).as("w"))
    def ssspSeeds(e: org.apache.spark.sql.DataFrame) =
      e.select(col("src").as("id")).filter(col("id") % 101 === 0).distinct()

    { val e = edges; dump("q_bfs_before", GraphOps.bfsImpl(e, bfsSeeds(e), 2, gateFrontier = false)) }
    { val e = edges; dump("q_bfs_after", GraphOps.bfsImpl(e, bfsSeeds(e), 2, gateFrontier = true)) }
    { val e = weighted; dump("q_sssp_before", GraphOps.ssspImpl(e, ssspSeeds(e), 3, gateFrontier = false)) }
    { val e = weighted; dump("q_sssp_after", GraphOps.ssspImpl(e, ssspSeeds(e), 3, gateFrontier = true)) }
    dump("q_kcore_before", GraphOps.kcorePeel(edges, k = 100, rounds = 2))
    dump("q_kcore_after", GraphOps.kcorePeelVertex(edges, k = 100, rounds = 2))

    // r13 prologue fusion evidence: the iterative operators return
    // localCheckpoint-rooted frames, so the final plans above cannot show the
    // prologue — dump the weighted-edge build + adjacency build directly.
    // BEFORE: one lineage with THREE m-row exchanges (groupBy l_orderkey,
    // groupBy (src,dst), groupBy src) — and qSssp ran it twice (seeds + adj).
    // AFTER: okey exchange + repartition(src), then both aggregates reuse
    // HashPartitioning(src); the adjacency build off the checkpoint is
    // exchange-free.
    val unfusedWeighted = weighted
    dump("q_sssp_prologue_before",
      unfusedWeighted.groupBy(col("src"))
        .agg(org.apache.spark.sql.functions.collect_list(
          org.apache.spark.sql.functions.struct(col("dst"), col("w"))).as("nbrs")))
    // The fused weighted build PRE-checkpoint: okey exchange + repartition(src),
    // then groupBy(src,dst) reuses HashPartitioning(src) — no third exchange.
    def fusedWeightedPlan = edges
      .repartition(col("src"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
      .select(col("src"), col("dst"), greatest(lit(1L), lit(6L) - col("cnt")).as("w"))
    dump("q_sssp_prologue_fusedbuild", fusedWeightedPlan)
    val fusedWeighted = fusedWeightedPlan.localCheckpoint()
    dump("q_sssp_prologue_after",
      fusedWeighted.groupBy(col("src"))
        .agg(org.apache.spark.sql.functions.collect_list(
          org.apache.spark.sql.functions.struct(col("dst"), col("w"))).as("nbrs")))
    spark.stop()
  }
}
