package graft.plans

import java.nio.charset.StandardCharsets

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, Coalesce,
  Divide, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average,
  Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/**
 * Materialized aggregate views with AUTOMATIC query rewrite — the Calcite/BigQuery/
 * Snowflake MV behavior self-hosted on parquet and a Catalyst optimizer rule: a
 * registered view pre-aggregates (cnt, sum/min/max per value column) by its group
 * columns; any later `base.groupBy(G).agg(...)` whose G is a SUBSET of the view's
 * group columns and whose aggregates are derivable (sum = sum of partial sums,
 * count(*) = sum of partial counts, min/max = min/max of partials, avg = Σsum/Σcnt)
 * is rewritten to scan the KB-to-MB-scale view instead of the full base table —
 * transparently, preserving output names, exprIds and types exactly.
 *
 * STALENESS IS A CORRECTNESS GATE, not advisory: the view records the base's max
 * (mtime, file count) at materialization; the rule re-checks that inventory before
 * every rewrite and silently falls back to the base scan when the base has changed.
 * A stale view can therefore never serve a wrong answer — the same contract as
 * [[ResultCache]], enforced the same way (file-inventory comparison, driver-side,
 * metadata-class cost).
 *
 * Scope guards (bail -> no rewrite, never a wrong plan): a filter between the
 * aggregate and the scan rewrites ONLY when it references group columns exclusively
 * (value-uniform within a fine group, so filtering view rows filters exactly the
 * same base rows); no distinct aggregates, no count(col), no decimal inputs
 * (partial-sum precision widening would change the result type), and the rewritten
 * plan's schema must equal the original's exactly — checked, not assumed.
 *
 * Scale: this is the 100 TB pattern where it matters most — a dashboard aggregate
 * over an append-mostly fact table runs against gigabytes of view instead of the
 * full scan, and the rewrite decision costs one driver file listing.
 */
object MaterializedViews {

  /** Registered view: base path -> (view path, group cols, value cols). */
  private case class MvDef(mvPath: String, groupCols: Seq[String], valueCols: Seq[String])

  private val registry = TrieMap.empty[String, MvDef]

  private def norm(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  /** Base-table inventory stamp: (n files, max mtime, total bytes) — any append,
    * overwrite or delete changes it. */
  private def stamp(spark: SparkSession, basePath: String): String = {
    val p = new Path(basePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(_.isFile).filter(_.getPath.getName.endsWith(".parquet"))
    s"${files.length}:${files.map(_.getModificationTime).maxOption.getOrElse(0L)}:${files.map(_.getLen).sum}"
  }

  private def metaPath(mvPath: String) = new Path(s"$mvPath/_mv_meta")

  /**
   * Materialize (or re-materialize) the view: one partial-aggregate pass over the base
   * producing `cnt` + `sum_/min_/max_<col>` per group, then register it for rewrite.
   */
  def create(spark: SparkSession, basePath: String, mvPath: String,
      groupCols: Seq[String], valueCols: Seq[String]): Unit = {
    // deregister during the build: the build's own aggregate must scan the BASE, never
    // the view it is about to overwrite (read-your-own-overwrite would race the job)
    registry.remove(norm(basePath))
    val base = spark.read.parquet(basePath)
    val aggs = count(lit(1)).as("cnt") +: valueCols.flatMap(c => Seq(
      sum(col(c)).as(s"sum_$c"), min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(mvPath)
    val fs = metaPath(mvPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath(mvPath), true)
    try out.write(stamp(spark, basePath).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    registry.put(norm(basePath), MvDef(mvPath, groupCols, valueCols))
  }

  /** Alias of [[create]] — re-materializes after base changes. */
  def refresh(spark: SparkSession, basePath: String): Unit = {
    val d = registry.getOrElse(norm(basePath),
      throw new IllegalArgumentException(s"no MV registered for $basePath"))
    create(spark, norm(basePath), d.mvPath, d.groupCols, d.valueCols)
  }

  /** Drop a registration (the files stay; only the rewrite stops). */
  def deregister(basePath: String): Unit = registry.remove(norm(basePath)): Unit

  private def fresh(spark: SparkSession, basePath: String, d: MvDef): Boolean =
    try {
      val fs = metaPath(d.mvPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(metaPath(d.mvPath))
      val recorded =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
      recorded == stamp(spark, basePath)
    } catch { case scala.util.control.NonFatal(_) => false }

  // ------------------------------------------------------------------ the rule

  /** Optimizer rule: rewrite derivable aggregates over registered bases onto their
    * fresh materialized views. Injected via [[GraftExtensions]]. */
  object MvRewriteRule extends Rule[LogicalPlan] {

    private def pathOf(plan: LogicalPlan): Option[String] = plan match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(p => norm(p.toString)).distinct match {
          case Seq(single) if registry.contains(single) => Some(single)
          case _ => None
        }
      case _ => None
    }

    private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
      case Project(ps, c) if ps.forall(_.isInstanceOf[Attribute]) => stripProjects(c)
      case o => o
    }

    /** Match `[Project?] [Filter?] [Project?] scan-of-registered-base`, returning the
      * base path and the (optional) filter condition. A filter is rewritable only if
      * it references GROUP columns exclusively — every row of a fine group shares
      * those values, so filtering the view's group rows filters exactly the same base
      * rows — and is deterministic. */
    private def basePathOf(plan: LogicalPlan): Option[(String, Option[Expression])] =
      stripProjects(plan) match {
        case Filter(cond, c) => pathOf(stripProjects(c)).map(p => (p, Some(cond)))
        case other => pathOf(other).map(p => (p, None))
      }

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty) plan
      else plan.transformUp {
        case agg @ Aggregate(_, _, child, _) =>
          basePathOf(child).flatMap { case (base, cond) =>
            tryRewrite(agg, base, cond, registry(base))
          }.getOrElse(agg)
      }

    private def tryRewrite(agg: Aggregate, basePath: String, cond: Option[Expression],
        d: MvDef): Option[Aggregate] = {
      val spark = SparkSession.active
      // grouping must be plain columns forming a subset of the view's group columns
      val groupAttrs = agg.groupingExpressions.map {
        case a: Attribute => a
        case _ => return None
      }
      if (!groupAttrs.forall(a => d.groupCols.contains(a.name))) return None
      // a filter must touch only group columns (value-uniform within a fine group)
      cond.foreach { c =>
        if (!c.deterministic) return None
        if (!c.references.forall(a => d.groupCols.contains(a.name))) return None
      }
      if (!fresh(spark, basePath, d)) return None // stale view must never answer

      val mvPlan = spark.read.parquet(d.mvPath).queryExecution.analyzed
      val mvAttr: Map[String, Attribute] = mvPlan.output.map(a => a.name -> a).toMap
      def mv(name: String): Attribute = mvAttr(name)
      def reAgg(f: Expression): Expression = AggregateExpression(
        f.asInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction],
        Complete, isDistinct = false)

      def rewriteNamed(ne: NamedExpression): Option[NamedExpression] = ne match {
        case a: Attribute if d.groupCols.contains(a.name) =>
          Some(Alias(mv(a.name), a.name)(exprId = a.exprId))
        case al @ Alias(AggregateExpression(fn, _, false, _, _), name) =>
          val rewritten: Option[Expression] = fn match {
            case Sum(x: Attribute, _) if d.valueCols.contains(x.name) &&
                !x.dataType.isInstanceOf[DecimalType] =>
              Some(reAgg(Sum(mv(s"sum_${x.name}"))))
            case Min(x: Attribute) if d.valueCols.contains(x.name) =>
              Some(reAgg(Min(mv(s"min_${x.name}"))))
            case Max(x: Attribute) if d.valueCols.contains(x.name) =>
              Some(reAgg(Max(mv(s"max_${x.name}"))))
            case Count(Seq(Literal(1, _))) =>
              // count(*): sum of partial counts; Coalesce keeps the non-null type
              Some(Coalesce(Seq(reAgg(Sum(mv("cnt"))), Literal(0L))))
            case Average(x: Attribute, _) if d.valueCols.contains(x.name) &&
                al.dataType == DoubleType =>
              Some(Divide(
                Cast(reAgg(Sum(mv(s"sum_${x.name}"))), DoubleType),
                Cast(reAgg(Sum(mv("cnt"))), DoubleType)))
            case _ => None
          }
          rewritten.map(e => Alias(e, name)(exprId = al.exprId))
        case _ => None
      }

      val newAggExprs = agg.aggregateExpressions.map(ne => rewriteNamed(ne) match {
        case Some(r) => r
        case None => return None // any non-derivable output bails the whole rewrite
      })
      val newGrouping = groupAttrs.map(a => mv(a.name))
      val newChild = cond match {
        case Some(c) =>
          Filter(c.transform { case a: Attribute => mv(a.name) }, mvPlan)
        case None => mvPlan
      }
      val newAgg = Aggregate(newGrouping, newAggExprs, newChild, None)
      // hard guard: the rewritten plan must expose the IDENTICAL schema
      val same = newAgg.schema.fields.map(f => (f.name, f.dataType))
        .sameElements(agg.schema.fields.map(f => (f.name, f.dataType)))
      if (same) Some(newAgg) else None
    }
  }

  /** Convenience: run `df`'s aggregate with the rewrite visible in this session
    * (the rule is always injected; this just documents the entry point). */
  def explainRewrite(df: DataFrame): String = df.queryExecution.optimizedPlan.toString
}
