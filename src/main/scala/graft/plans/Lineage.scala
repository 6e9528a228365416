package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.col

/**
 * Column-level lineage: for every output column of a DataFrame, the set of SOURCE
 * (table, column) pairs that feed it — the governance/impact-analysis primitive
 * (which raw columns reach this report? what breaks if we drop l_discount?) that
 * warehouses surface as INFORMATION_SCHEMA lineage views.
 *
 * Implementation is a bottom-up fixed-point over the ANALYZED logical plan: leaf
 * relations root every output attribute at themselves (named by the scan's file path
 * or relation class); every operator above maps each named expression's references
 * through the child lineage (an Alias contributes the union of its children's roots;
 * a pass-through attribute copies). Window/aggregate/generate expressions resolve the
 * same way because lineage only follows `Expression.references`.
 *
 * Driver-side metadata work proportional to PLAN size, never data — usable on a
 * 100 TB table's query for free.
 */
object Lineage {

  /** (output column, source table, source column) rows, ordered for stable display. */
  def lineage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val roots = resolve(df.queryExecution.analyzed)
    val out = df.queryExecution.analyzed.output
    out.flatMap { a =>
      roots.getOrElse(a.exprId, Set.empty).toSeq.sorted.map { case (t, c) =>
        (a.name, t, c)
      }
    }.toDF("out_col", "src_table", "src_col")
      .orderBy(col("out_col"), col("src_table"), col("src_col"))
  }

  /** exprId → set of (sourceTable, sourceColumn) roots, over the whole plan. */
  private def resolve(plan: LogicalPlan): Map[ExprId, Set[(String, String)]] = {
    plan match {
      case leaf: LeafNode =>
        val name = sourceName(leaf)
        leaf.output.map(a => a.exprId -> Set(name -> a.name)).toMap
      case other =>
        val below = other.children.map(resolve).foldLeft(
          Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
        val named = other.expressions.flatMap(collectNamed).map {
          case (id, refs) => id -> refs.flatMap(r => below.getOrElse(r.exprId, Set.empty))
        }.toMap
        // pass-throughs keep their child roots; locally-defined names override
        below ++ named.filter(_._2.nonEmpty) ++
          // names with no resolvable refs (literals) map to no sources explicitly
          named.filter(_._2.isEmpty)
    }
  }

  /** (exprId, attribute references) for every name this operator defines. */
  private def collectNamed(e: Expression): Seq[(ExprId, Set[Attribute])] = e match {
    case a: Alias => Seq(a.exprId -> a.child.references.toSet) ++
      a.child.children.flatMap(collectNamed)
    case other => other.children.flatMap(collectNamed)
  }

  private def sourceName(leaf: LeafNode): String = leaf match {
    case lr: LogicalRelation =>
      // file-based scans: identify by the root path's last segment (the table dir)
      val paths = lr.relation match {
        case hfs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          hfs.location.rootPaths.map(_.getName)
        case _ => Seq.empty
      }
      if (paths.nonEmpty) paths.distinct.sorted.mkString(",")
      else lr.relation.getClass.getSimpleName
    case other => other.getClass.getSimpleName.stripSuffix("$")
  }
}
