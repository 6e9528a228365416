package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Feature–label dependence scoring: mutual information and chi-squared statistics of
 * candidate (binned) features against a label column — the feature-selection pass a
 * training pipeline runs before committing 100 TB to feature materialization (and the
 * classifier-free twin of the naive-Bayes scorer in Sampling: same contingency-table
 * plan, different statistic).
 *
 * Plan shape: per feature, ONE map-side-combined groupBy(feature, label) produces the
 * contingency table; everything after (marginals, N, the MI/chi² sums) is arithmetic
 * over that |X|x|Y|-row frame — bounded by bin design, never by corpus size. Marginals
 * join back via broadcast, so no windows over unpartitioned frames and no second scan
 * of the fact table. K features = K independent scans that Spark schedules
 * concurrently; at 100 TB you would cache the projected (features, label) frame once
 * and fan the K groupBys off it — same plan shape.
 *
 * MI  = Σ_xy (n_xy/N) · ln(N·n_xy / (n_x·n_y))       (natural log, > 0 terms only by
 *                                                     construction since n_xy >= 1)
 * chi² = Σ_xy (n_xy − e_xy)² / e_xy with e_xy = n_x·n_y/N over observed cells, plus
 *        e_xy for unobserved cells — equivalently Σ over observed of n²/e − N, which
 *        needs no dense cell enumeration (absent cells contribute exactly e_xy).
 */
object FeatureStats {

  /** (mi6, chi2r) one-row frame for a single feature expression vs a label. */
  def dependence(df: DataFrame, feature: Column, label: Column): DataFrame = {
    val cont = df.select(feature.as("x"), label.as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("nxy"))
    val nx = cont.groupBy(col("x")).agg(sum(col("nxy")).as("nx"))
    val ny = cont.groupBy(col("y")).agg(sum(col("nxy")).as("ny"))
    val n = cont.agg(sum(col("nxy")).as("n"))
    val joined = cont.join(broadcast(nx), "x").join(broadcast(ny), "y")
      .crossJoin(broadcast(n))
    val p = col("nxy").cast("double") / col("n")
    val mi = sum(p * log(col("n").cast("double") * col("nxy") / (col("nx") * col("ny"))))
    val e = col("nx").cast("double") * col("ny") / col("n")
    val chi2 = sum(col("nxy") * col("nxy") / e) - first(col("n")).cast("double")
    joined.agg(round(mi, 6).as("mi6"), round(chi2, 4).as("chi2r"))
  }

  /**
   * `q_feature_mi`: score three candidate lineitem features against the return flag —
   * equal-width quantity bins, 5%-wide discount bins, and the categorical line status.
   */
  def qFeatureMi(spark: SparkSession, dir: String): DataFrame = {
    val l = TableIO.lineitem(spark, dir)
    val feats: Seq[(String, DataFrame => Column)] = Seq(
      "qty_bin" -> (d => floor((col("l_quantity") - 1) / 10).cast("int")),
      "disc_bin" -> (d => floor(col("l_discount") * 20).cast("int")),
      "linestatus" -> (d => col("l_linestatus")))
    feats.map { case (name, f) =>
      dependence(l, f(l).cast("string"), col("l_returnflag"))
        .select(lit(name).as("feature"), col("mi6"), col("chi2r"))
    }.reduce(_ unionByName _).orderBy(col("feature"))
  }

  val qFeatureMiSql: String =
    """WITH src AS (
      |  SELECT CAST(CAST(floor((l_quantity - 1) / 10) AS INT) AS VARCHAR) AS qty_bin,
      |         CAST(CAST(floor(l_discount * 20) AS INT) AS VARCHAR) AS disc_bin,
      |         l_linestatus AS linestatus, l_returnflag AS y
      |  FROM lineitem
      |), feats AS (
      |  SELECT 'qty_bin' AS feature, qty_bin AS x, y FROM src
      |  UNION ALL SELECT 'disc_bin', disc_bin, y FROM src
      |  UNION ALL SELECT 'linestatus', linestatus, y FROM src
      |), cont AS (
      |  SELECT feature, x, y, count(*) AS nxy FROM feats GROUP BY 1, 2, 3
      |), nx AS (
      |  SELECT feature, x, sum(nxy) AS nx FROM cont GROUP BY 1, 2
      |), ny AS (
      |  SELECT feature, y, sum(nxy) AS ny FROM cont GROUP BY 1, 2
      |), n AS (
      |  SELECT feature, sum(nxy) AS n FROM cont GROUP BY 1
      |)
      |SELECT c.feature,
      |       round(sum((CAST(c.nxy AS DOUBLE) / n.n)
      |             * ln(CAST(n.n AS DOUBLE) * c.nxy / (nx.nx * ny.ny))), 6) AS mi6,
      |       round(sum(CAST(c.nxy AS DOUBLE) * c.nxy
      |             / (CAST(nx.nx AS DOUBLE) * ny.ny / n.n)) - any_value(n.n), 4) AS chi2r
      |FROM cont c
      |JOIN nx ON nx.feature = c.feature AND nx.x = c.x
      |JOIN ny ON ny.feature = c.feature AND ny.y = c.y
      |JOIN n ON n.feature = c.feature
      |GROUP BY c.feature
      |ORDER BY c.feature""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_feature_mi" -> (qFeatureMi(_, _)))

  val oracles: Map[String, String] = Map(
    "q_feature_mi" -> qFeatureMiSql)
}
