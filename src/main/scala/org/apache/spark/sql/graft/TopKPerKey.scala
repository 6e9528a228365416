/*
 * Lives under org.apache.spark.sql for the private[sql] Dataset.ofRows bridge and
 * private[spark] execution internals — the same placement the reference uses for its
 * operators (gazelle_plugin: native-sql-engine/core/src/main/scala/org/apache/spark/sql/
 * execution/ColumnarShuffleExchangeExec.scala:1).
 */
package org.apache.spark.sql.graft

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending,
  Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution,
  Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.util.CompletionIterator

/**
 * Native per-key top-k operator — graft's demonstration of the full custom-operator route
 * (logical node -> planner strategy -> physical operator), the Spark-4 analog of how the
 * reference injects whole operators (gazelle_plugin: com/intel/oap/execution/
 * ColumnarWindowExec.scala:1 replaces WindowExec wholesale).
 *
 * Why not window rank + filter? `row_number() OVER (PARTITION BY k ORDER BY s)` must SORT
 * every partition's full row set before the rank filter drops all but k rows. This
 * operator keeps a bounded heap of k rows per key instead: O(n log k) with k-row memory
 * per key, and the partial phase shrinks each map-side partition to <= k rows per key
 * BEFORE the shuffle — the exchange moves at most k * n_keys * n_partitions rows, not n.
 * At 100 TB that is the difference between shuffling terabytes and shuffling megabytes.
 *
 * Physical shape: TopKPerKeyExec(partial) -> Exchange(hash by keys, inserted by
 * EnsureRequirements from the final's ClusteredDistribution requirement) ->
 * TopKPerKeyExec(final). Result rows per key are exact, matching the window formulation
 * (oracle-checked by `q_topk_per_key`).
 */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    withTies: Boolean = false) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/**
 * Bounded per-key top-k retention. `withTies = false` keeps exactly k rows per key
 * (row_number semantics — ties at the boundary broken arbitrarily, like row_number
 * itself). `withTies = true` keeps every row whose RANK is <= k: the k strictly-best
 * rows PLUS all rows tied with the k-th boundary row (rank semantics — the tie buffer
 * holds only boundary-equal rows, which for real orderings is O(1) extra).
 */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    withTies: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  // the pruning ratio is the whole point of the operator — surface it in the UI/metrics
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numPrunedRows" -> SQLMetrics.createMetric(sparkContext, "rows pruned by the k-heap"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val ties = withTies
    val outAttrs = output
    val outRows = longMetric("numOutputRows")
    val prunedRows = longMetric("numPrunedRows")
    child.execute().mapPartitionsInternal { iter =>
      val keyGen = UnsafeProjection.create(keyExprs, outAttrs)
      val ord = RowOrdering.create(sortOrder, outAttrs)
      // heap head = worst retained row (reversed ordering), so replacement is O(log k);
      // tieBufs (rank mode only) holds rows equal to the current boundary (heap head).
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val tieBufs = if (ties) new java.util.HashMap[UnsafeRow, java.util.ArrayDeque[InternalRow]]() else null
      var inputCount = 0L
      while (iter.hasNext) {
        val row = iter.next()
        inputCount += 1
        val key = keyGen(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // initial capacity is NOT k: the queue grows as rows arrive, so a large k
          // never preallocates a k-sized array per key
          heap = new java.util.PriorityQueue[InternalRow](math.min(limit, 16), ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.offer(row.copy())
        else {
          val cmp = ord.compare(row, heap.peek())
          if (cmp < 0) {
            val evicted = heap.poll()
            heap.offer(row.copy())
            if (ties) {
              var buf = tieBufs.get(key)
              // Rank invariant: a row belongs iff fewer than k rows are strictly better.
              // After eviction the boundary either kept its value (a duplicate of the old
              // head remains at the head) — the evicted row is still rank-tied, keep it —
              // or strictly improved, which proves >= k rows are strictly better than the
              // old boundary value: every buffered tie is now out.
              if (ord.compare(heap.peek(), evicted) == 0) {
                if (buf == null) { buf = new java.util.ArrayDeque[InternalRow](); tieBufs.put(key.copy(), buf) }
                buf.add(evicted)
              } else if (buf != null) buf.clear()
            }
          } else if (cmp == 0 && ties) {
            var buf = tieBufs.get(key)
            if (buf == null) { buf = new java.util.ArrayDeque[InternalRow](); tieBufs.put(key.copy(), buf) }
            buf.add(row.copy())
          }
        }
      }
      var kept = 0L
      val heapRows = heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      val all =
        if (ties) heapRows ++ tieBufs.values().iterator().asScala.flatMap(_.iterator().asScala)
        else heapRows
      // completion body runs once the output iterator drains, when `kept` is final
      CompletionIterator[InternalRow, Iterator[InternalRow]](
        all.map { r => kept += 1; outRows += 1; r },
        prunedRows += inputCount - kept)
    }
  }
}

/** Plans TopKPerKeyNode as partial -> (exchange) -> final. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child, ties) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child), ties)
      TopKPerKeyExec(keys, order, k, partial = false, partial, ties) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API: exact top-k rows per key under a multi-column ordering. */
object TopKPerKey {
  /** orderCols: (column, descending). Ties under the full ordering are nondeterministic —
    * include a unique tiebreaker column for deterministic output. */
  def apply(df: DataFrame, keyCols: Seq[String], orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val lp = df.queryExecution.analyzed
    def attr(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${lp.output.map(_.name)}"))
    val order = orderCols.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    Dataset.ofRows(
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      TopKPerKeyNode(keyCols.map(attr), order, k, lp))
  }
}
