package graft.tools

import graft.GraftSession

/**
 * Plan lint: sweep EVERY SparkEntry query's executed plan for shapes that are fine at
 * test SF but wrong at 100 TB — unexpected cartesian products, nested-loop joins outside
 * the queries that intentionally demonstrate them, and scans that read every column.
 * Run ad hoc after plan-affecting changes: `sbt "runMain graft.tools.PlanLint [sfDir]"`.
 */
object PlanLint {

  // queries whose plan is INTENTIONALLY the flagged shape (documented in their Scaladoc)
  private val allowCartesian = Set(
    "q_cross", // the CartesianProduct demonstration itself (dims only)
    "dedup_embedding_exact", // the O(n²) oracle twin, deliberately demoted
    "tpch_q15", "q_scalar_subquery", "tpch_q22", // 1-row scalar frame cross joins
    "q_math" // single-row aggregate
  )
  private val allowNestedLoop = Set(
    "q_join_nonequi", // the BNLJ demonstration
    "tpch_q19", // disjunctive-predicate join (BNLJ over broadcast part is the right plan)
    "tpch_q15", "q_scalar_subquery", "tpch_q22", "q_math", // scalar-frame variants
    "q_cross", // crossJoin of two broadcastable dims plans as broadcast-NLJ
    "ann_bruteforce", // broadcast query set x corpus scan IS the brute-force design
    "dedup_embedding_exact", // the O(n²) oracle twin (crossJoin + filter lowers to BNLJ)
    "text_bm25", // 1-row corpus-stats frame (N, avgdl) crossJoined by broadcast
    // bounded-broadcast crossJoins: the non-stream side is a 1-row totals frame or a
    // class/centroid/query-cardinality frame that broadcasts at ANY corpus size — the
    // BNLJ label is Spark's lowering of crossJoin(broadcast(tiny)), not a scale risk
    "text_perplexity", "text_vocab", "text_dsir", // 1-row corpus totals
    "text_nb_lang", // class-cardinality totals + 1-row vocab size
    "q_percentile_sort", "q_profile", // 1-row count/stats frames
    "ann_quantized", "ann_rrf", // bounded query-set frames re-ranked per corpus row
    "dedup_semantic_fixed" // broadcast fixed-centroid frame
  )

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("local[8]", 8)
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        // execute the df's OWN QueryExecution so AQE finalizes THIS plan (a noop write
        // would run a separate QE and leave df's executedPlan at isFinalPlan=false)
        df.queryExecution.toRdd.foreachPartition(_ => ())
        val plan = df.queryExecution.executedPlan.toString
        val issues = Seq(
          (plan.contains("CartesianProduct") && !allowCartesian(name)) ->
            "unexpected CartesianProduct",
          (plan.contains("BroadcastNestedLoopJoin") && !allowNestedLoop(name)) ->
            "unexpected BroadcastNestedLoopJoin"
        ).collect { case (true, msg) => msg }
        if (issues.nonEmpty) {
          flagged += 1
          println(s"[planlint] FLAG $name: ${issues.mkString("; ")}")
        }
      } catch {
        case e: Throwable =>
          flagged += 1
          val msg = Option(e.getMessage).flatMap(_.linesIterator.nextOption())
            .getOrElse(e.getClass.getName)
          println(s"[planlint] ERROR $name: $msg")
      }
    }
    println(s"[planlint] done: $flagged flagged of ${graft.SparkEntry.queries.size}")
    spark.stop()
  }
}
