package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression,
  GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual,
  PredicateHelper, Rank, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window,
  WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Rewrites `Filter(rank/row_number <= k, Window[single ranking expr])` to run on top of
 * the native [[TopKPerKeyNode]] pre-limit. This is the direct analog of the reference's
 * OWN rank-filter optimizer rule (gazelle_plugin: native-sql-engine/core/src/main/scala/
 * com/intel/oap/extension/OptimizerOverrides.scala:39 `LocalRankWindow`, which splits the
 * window into a map-side LocalWindowExec + filter before the exchange, LocalWindowExec
 * being a full sort-based window per map partition). graft's version keeps bounded k-row
 * HEAPS per key instead of sorting each partition — O(n log k) and no buffered row array
 * — and injects via the same `injectOptimizerRule` route (OptimizerOverrides.scala:222).
 *
 * Why: the stock plan sorts EVERY partition's full row set before the rank filter drops
 * all but k rows (Spark's own WindowGroupLimit mitigation still sorts each map partition).
 * TopKPerKeyNode keeps a bounded k-row heap per key, shrinks each map-side partition to
 * <= k rows per key BEFORE the shuffle, and the Window then re-ranks the <= k*n_keys
 * survivors exactly — O(n log k) with no full sort, and the exchange moves megabytes,
 * not the fact table.
 *
 * Soundness: the Window is KEPT on top (ranks are recomputed on the reduced set, so
 * emitted rank values are identical), and the row set is preserved because
 *  - row_number keeps exactly k rows per key; which of the boundary-tied rows survive is
 *    nondeterministic in row_number itself, so any k-row retention is a valid evaluation;
 *  - rank keeps all rows tied with the k-th boundary row (TopKPerKeyExec withTies), which
 *    is exactly the `rank <= k` set;
 *  - dense_rank is NOT rewritten (its boundary is the k-th distinct value — different
 *    retention semantics).
 * The rewrite only fires when the Window computes nothing but the ranking expression
 * (any other window function would see the reduced row set and change value) and the
 * partition spec is non-empty (global top-k is TakeOrderedAndProject's job).
 */
object RankLimitRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Above this the pre-limit stops paying (heaps hold k rows per key per partition and
    * the stock window path is no longer clearly worse) — same idea as Spark's
    * windowGroupLimitThreshold guard. */
  private val MaxRewriteLimit = 1 << 20

  /** Smallest upper bound k implied by the conjuncts for `rankAttr` (rank <= k forms).
    * Bounds are computed in Long: `rnk < Int.MinValue` must yield a degenerate bound, not
    * wrap around to Int.MaxValue. */
  private def impliedLimit(conjuncts: Seq[Expression], rankAttr: Attribute): Option[Long] = {
    val bounds: Seq[Long] = conjuncts.flatMap {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rankAttr) => Some(k.toLong)
      case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rankAttr) => Some(k.toLong - 1)
      case EqualTo(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rankAttr) => Some(k.toLong)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rankAttr) => Some(k.toLong)
      case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rankAttr) => Some(k.toLong - 1)
      case _ => None
    }
    bounds.reduceOption(_ min _)
  }

  /** Defensive strip of Spark's own WindowGroupLimit pre-limit if one is already below
    * the Window. Batch-order note: injected operator-optimization rules run BEFORE the
    * "Infer window group limit" batch, so in the normal flow this rule fires first and
    * Infer may then add a FINAL-mode WindowGroupLimit above our TopKPerKeyNode — that pass
    * rides the sort the Window needs anyway and streams over only the <= k*keys
    * survivors, so it is harmless (and the map-side partial WindowGroupLimit, the one
    * that would re-sort every input partition, is never inserted because the rows are
    * already limited). The strip below matters only if batch ordering ever flips. */
  private def stripGroupLimit(p: LogicalPlan): LogicalPlan = p match {
    case wgl: WindowGroupLimit => wgl.child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window)
        if w.windowExpressions.size == 1 && w.partitionSpec.nonEmpty &&
          w.orderSpec.nonEmpty && !stripGroupLimit(w.child).isInstanceOf[TopKPerKeyNode] =>
      w.windowExpressions.head match {
        case a @ Alias(WindowExpression(fn, _), _) =>
          val withTies = fn match {
            case _: RowNumber => Some(false)
            case _: Rank => Some(true)
            case _ => None // dense_rank/ntile/...: retention semantics differ, leave alone
          }
          (withTies, impliedLimit(splitConjunctivePredicates(cond), a.toAttribute)) match {
            case (Some(ties), Some(k)) if k > 0 && k <= MaxRewriteLimit =>
              f.copy(child = w.copy(child =
                TopKPerKeyNode(w.partitionSpec, w.orderSpec, k.toInt, stripGroupLimit(w.child), ties)))
            case _ => f // k <= 0 (always-false filter) or huge: leave the stock plan alone
          }
        case _ => f
      }
  }
}
