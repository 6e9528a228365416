package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Closed-form multiple linear regression (OLS via normal equations) as ONE
 * aggregation pass — the distributed-friendly way to fit y = a0 + a1*x1 + a2*x2:
 * accumulate the nine cross-moments with a single map-side-combined global agg, then
 * solve the 3x3 system by Cramer's rule in the final one-row projection. No gradient
 * loop, no driver-side matrix library, no second pass for R^2 (computed from the
 * same moments via SSE = Syy - a0*Sy - a1*Sx1y - a2*Sx2y).
 *
 * Spark's own `regr_slope`/`regr_intercept` stop at ONE regressor; the reference has
 * no regression at all. This is the standard scale-out form (one reduce of 9 numbers
 * regardless of data size — the same shape MADlib/BigQuery ML use for linear models).
 *
 * Determinism: inputs are quantized to their natural exact-integer units (quantity,
 * discount in percent, price in cents), so every moment is an EXACT, order-independent
 * integer sum (Syy in decimal(38) to dodge bigint overflow at 100 TB row counts). The
 * double-precision Cramer solve then evaluates an identical expression tree on
 * identical inputs in any engine — bit-stable, hash-oracle-able.
 */
object Regression {

  /** OLS of price_cents on (quantity, discount_pct) over lineitem, plus R^2. */
  def qLinreg(spark: SparkSession, dir: String): DataFrame =
    ols2(TableIO.lineitem(spark, dir).select(
      round(col("l_quantity"), 0).cast("long").as("x1"),
      round(col("l_discount") * 100, 0).cast("long").as("x2"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("y")))

  /** General entry: fit y = a0 + a1*x1 + a2*x2 on any integer-quantized
    * (x1, x2, y) frame; returns one row (n, a0, a1, a2, r2). */
  def ols2(pts: DataFrame): DataFrame = normalSolve(pts, 0L)

  /**
   * Ridge regression (L2 penalty λ on the two slope coefficients, intercept exempt —
   * the standard convention): identical one-pass moment plan as [[ols2]], with λ added
   * to the slope diagonal of the normal matrix BEFORE the double cast, so the
   * regularized system stays exact-integer and the solve stays bit-deterministic.
   * The reported r2 is the TRAINING R² of the penalized fit (≤ the OLS R² by
   * construction — shrinkage trades fit for stability).
   */
  def ridge2(pts: DataFrame, lambda: Long): DataFrame = normalSolve(pts, lambda)

  /** `q_ridge`: λ=100000 ridge fit of price_cents on (quantity, discount_pct). */
  def qRidge(spark: SparkSession, dir: String): DataFrame =
    ridge2(TableIO.lineitem(spark, dir).select(
      round(col("l_quantity"), 0).cast("long").as("x1"),
      round(col("l_discount") * 100, 0).cast("long").as("x2"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("y")), RidgeLambda)

  val RidgeLambda = 100000L

  private def normalSolve(pts: DataFrame, lambda: Long): DataFrame = {
    val yd = col("y").cast("decimal(20,0)")
    val m = pts.agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"), sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("sx11"), sum(col("x1") * col("x2")).as("sx12"),
      sum(col("x2") * col("x2")).as("sx22"),
      sum(col("x1") * col("y")).as("sx1y"), sum(col("x2") * col("y")).as("sx2y"),
      sum(yd * yd).as("syy"))
    // exact integer moments -> double; identical expression tree as the oracle SQL
    // (λ joins the slope diagonal while still integer, so ridge stays exact too)
    val d = m.select(col("n"),
      col("n").cast("double").as("dn"), col("sx1").cast("double").as("a12"),
      col("sx2").cast("double").as("a13"),
      (col("sx11") + lit(lambda)).cast("double").as("a22"),
      col("sx12").cast("double").as("a23"),
      (col("sx22") + lit(lambda)).cast("double").as("a33"),
      col("sy").cast("double").as("b1"), col("sx1y").cast("double").as("b2"),
      col("sx2y").cast("double").as("b3"), col("syy").cast("double").as("syy"))
    def det(r1: (Column, Column, Column), r2: (Column, Column, Column),
        r3: (Column, Column, Column)): Column =
      r1._1 * (r2._2 * r3._3 - r2._3 * r3._2) -
        r1._2 * (r2._1 * r3._3 - r2._3 * r3._1) +
        r1._3 * (r2._1 * r3._2 - r2._2 * r3._1)
    val (dn, a12, a13) = (col("dn"), col("a12"), col("a13"))
    val (a22, a23, a33) = (col("a22"), col("a23"), col("a33"))
    val (b1, b2, b3) = (col("b1"), col("b2"), col("b3"))
    // Cramer on the symmetric normal matrix [[n,sx1,sx2],[sx1,sx11,sx12],[sx2,sx12,sx22]]
    val c = d.select(col("n"), col("syy"), b1.as("sy"), b2.as("sx1y"), b3.as("sx2y"), dn,
      det((dn, a12, a13), (a12, a22, a23), (a13, a23, a33)).as("det"),
      det((b1, a12, a13), (b2, a22, a23), (b3, a23, a33)).as("det0"),
      det((dn, b1, a13), (a12, b2, a23), (a13, b3, a33)).as("det1"),
      det((dn, a12, b1), (a12, a22, b2), (a13, a23, b3)).as("det2"))
    c.select(col("n"),
      round(col("det0") / col("det"), 6).as("a0"),
      round(col("det1") / col("det"), 6).as("a1"),
      round(col("det2") / col("det"), 6).as("a2"),
      round(lit(1.0) - (col("syy") - (col("det0") / col("det")) * col("sy")
          - (col("det1") / col("det")) * col("sx1y")
          - (col("det2") / col("det")) * col("sx2y"))
        / (col("syy") - col("sy") * col("sy") / col("dn")), 6).as("r2"))
  }

  val qLinregSql: String =
    """WITH m AS (
      |  SELECT count(*) AS n,
      |    sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
      |    sum(x1*x1) AS sx11, sum(x1*x2) AS sx12, sum(x2*x2) AS sx22,
      |    sum(x1*y) AS sx1y, sum(x2*y) AS sx2y,
      |    sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS syy
      |  FROM (SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
      |               CAST(round(l_discount*100) AS BIGINT) AS x2,
      |               CAST(round(l_extendedprice*100) AS BIGINT) AS y FROM lineitem)),
      |d AS (
      |  SELECT n,
      |    CAST(n AS DOUBLE) AS dn, CAST(sx1 AS DOUBLE) AS a12, CAST(sx2 AS DOUBLE) AS a13,
      |    CAST(sx11 AS DOUBLE) AS a22, CAST(sx12 AS DOUBLE) AS a23,
      |    CAST(sx22 AS DOUBLE) AS a33, CAST(sy AS DOUBLE) AS b1,
      |    CAST(sx1y AS DOUBLE) AS b2, CAST(sx2y AS DOUBLE) AS b3,
      |    CAST(syy AS DOUBLE) AS syy FROM m),
      |c AS (
      |  SELECT n, syy, b1 AS sy, b2 AS sx1y, b3 AS sx2y, dn,
      |    dn*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13) + a13*(a12*a23 - a22*a13) AS det,
      |    b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3) + a13*(b2*a23 - a22*b3) AS det0,
      |    dn*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13) + a13*(a12*b3 - b2*a13) AS det1,
      |    dn*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13) + b1*(a12*a23 - a22*a13) AS det2
      |  FROM d)
      |SELECT n, round(det0/det, 6) AS a0, round(det1/det, 6) AS a1,
      |  round(det2/det, 6) AS a2,
      |  round(1 - (syy - (det0/det)*sy - (det1/det)*sx1y - (det2/det)*sx2y)
      |          / (syy - sy*sy/dn), 6) AS r2
      |FROM c""".stripMargin

  val qRidgeSql: String =
    """WITH m AS (
      |  SELECT count(*) AS n,
      |    sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
      |    sum(x1*x1) AS sx11, sum(x1*x2) AS sx12, sum(x2*x2) AS sx22,
      |    sum(x1*y) AS sx1y, sum(x2*y) AS sx2y,
      |    sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS syy
      |  FROM (SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
      |               CAST(round(l_discount*100) AS BIGINT) AS x2,
      |               CAST(round(l_extendedprice*100) AS BIGINT) AS y FROM lineitem)),
      |d AS (
      |  SELECT n,
      |    CAST(n AS DOUBLE) AS dn, CAST(sx1 AS DOUBLE) AS a12, CAST(sx2 AS DOUBLE) AS a13,
      |    CAST(sx11 + 100000 AS DOUBLE) AS a22, CAST(sx12 AS DOUBLE) AS a23,
      |    CAST(sx22 + 100000 AS DOUBLE) AS a33, CAST(sy AS DOUBLE) AS b1,
      |    CAST(sx1y AS DOUBLE) AS b2, CAST(sx2y AS DOUBLE) AS b3,
      |    CAST(syy AS DOUBLE) AS syy FROM m),
      |c AS (
      |  SELECT n, syy, b1 AS sy, b2 AS sx1y, b3 AS sx2y, dn,
      |    dn*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13) + a13*(a12*a23 - a22*a13) AS det,
      |    b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3) + a13*(b2*a23 - a22*b3) AS det0,
      |    dn*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13) + a13*(a12*b3 - b2*a13) AS det1,
      |    dn*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13) + b1*(a12*a23 - a22*a13) AS det2
      |  FROM d)
      |SELECT n, round(det0/det, 6) AS a0, round(det1/det, 6) AS a1,
      |  round(det2/det, 6) AS a2,
      |  round(1 - (syy - (det0/det)*sy - (det1/det)*sx1y - (det2/det)*sx2y)
      |          / (syy - sy*sy/dn), 6) AS r2
      |FROM c""".stripMargin

  // -------------------------------------------------------------- q_pca_power

  /** Power-iteration rounds for [[pcaPower3]] — enough for machine-precision
    * convergence at any realistic eigen-gap; both engines unroll the same count. */
  val PcaIters = 12

  /**
   * First principal component of three features by ONE distributed moment pass plus a
   * driver-free unrolled power iteration: the 3×3 covariance matrix comes from exact
   * wide-decimal sums (Σxᵢ, Σxᵢxⱼ — HUGEINT-exact in the oracle, DECIMAL(38)-exact
   * here, so no double ever crosses an aggregation), and the eigenvector solve is
   * [[PcaIters]] unrolled multiply-normalize steps evaluated in the final one-row
   * projection — identical expression trees on both engines, so the result is
   * bit-stable and hash-oracle-able. This is the scale shape of PCA everywhere:
   * moments reduce (9 numbers regardless of row count), the eigensolve is O(1).
   * Sign is canonicalized to component 3 ≥ 0. `eigval` is the Rayleigh-style |C·v|
   * of the converged unit vector.
   */
  def pcaPower3(pts: DataFrame): DataFrame = {
    def wide(c: Column): Column = c.cast("decimal(38,0)")
    val m = pts.agg(
      count(lit(1)).as("n"),
      sum(wide(col("x1"))).as("s1"), sum(wide(col("x2"))).as("s2"),
      sum(wide(col("x3"))).as("s3"),
      sum(wide(col("x1")) * col("x1")).as("s11"),
      sum(wide(col("x1")) * col("x2")).as("s12"),
      sum(wide(col("x1")) * col("x3")).as("s13"),
      sum(wide(col("x2")) * col("x2")).as("s22"),
      sum(wide(col("x2")) * col("x3")).as("s23"),
      sum(wide(col("x3")) * col("x3")).as("s33"))
    val dn = col("n").cast("double")
    def cov(sij: String, si: String, sj: String): Column =
      col(sij).cast("double") / dn -
        (col(si).cast("double") / dn) * (col(sj).cast("double") / dn)
    var it = m.select(col("n"),
      cov("s11", "s1", "s1").as("c11"), cov("s12", "s1", "s2").as("c12"),
      cov("s13", "s1", "s3").as("c13"), cov("s22", "s2", "s2").as("c22"),
      cov("s23", "s2", "s3").as("c23"), cov("s33", "s3", "s3").as("c33"),
      lit(1.0).as("v1"), lit(1.0).as("v2"), lit(1.0).as("v3"))
    val covCols = Seq("c11", "c12", "c13", "c22", "c23", "c33").map(col)
    def mul(df: DataFrame): DataFrame = df.select(col("n") +: covCols :+
      (col("c11") * col("v1") + col("c12") * col("v2") + col("c13") * col("v3")).as("u1") :+
      (col("c12") * col("v1") + col("c22") * col("v2") + col("c23") * col("v3")).as("u2") :+
      (col("c13") * col("v1") + col("c23") * col("v2") + col("c33") * col("v3")).as("u3"): _*)
    val nrm = sqrt(col("u1") * col("u1") + col("u2") * col("u2") + col("u3") * col("u3"))
    for (_ <- 1 to PcaIters) {
      it = mul(it).select(col("n") +: covCols :+
        (col("u1") / nrm).as("v1") :+ (col("u2") / nrm).as("v2") :+
        (col("u3") / nrm).as("v3"): _*)
    }
    val fin = mul(it)  // one more multiply: |C·v| of the converged unit v = eigenvalue
    val sgn = when(col("v3") < 0, lit(-1.0)).otherwise(lit(1.0))
    fin.select(col("n") +: covCols :+ nrm.as("eigval") :+
        (col("u1") / nrm).as("v1") :+ (col("u2") / nrm).as("v2") :+
        (col("u3") / nrm).as("v3"): _*)
      .select(col("n"),
        round(sgn * col("v1"), 6).as("pc1_qty"),
        round(sgn * col("v2"), 6).as("pc1_disc"),
        round(sgn * col("v3"), 6).as("pc1_price"),
        round(col("eigval"), 2).as("eigval2"))
  }

  /** `q_pca_power`: PC1 of (quantity, discount_pct, price_cents) over lineitem. */
  def qPcaPower(spark: SparkSession, dir: String): DataFrame =
    pcaPower3(TableIO.lineitem(spark, dir).select(
      round(col("l_quantity"), 0).cast("long").as("x1"),
      round(col("l_discount") * 100, 0).cast("long").as("x2"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("x3")))

  /** The oracle twin is GENERATED from the same iteration count so the two engines
    * can never drift out of sync on the unroll depth. */
  val qPcaPowerSql: String = {
    val iterCtes = (1 to PcaIters).map { i =>
      s"""u$i AS (SELECT n, c11, c12, c13, c22, c23, c33,
         |  c11*v1 + c12*v2 + c13*v3 AS u1,
         |  c12*v1 + c22*v2 + c23*v3 AS u2,
         |  c13*v1 + c23*v2 + c33*v3 AS u3 FROM v${i - 1}),
         |v$i AS (SELECT n, c11, c12, c13, c22, c23, c33,
         |  u1/sqrt(u1*u1 + u2*u2 + u3*u3) AS v1,
         |  u2/sqrt(u1*u1 + u2*u2 + u3*u3) AS v2,
         |  u3/sqrt(u1*u1 + u2*u2 + u3*u3) AS v3 FROM u$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH m AS (
       |  SELECT count(*) AS n,
       |    sum(CAST(x1 AS HUGEINT)) AS s1, sum(CAST(x2 AS HUGEINT)) AS s2,
       |    sum(CAST(x3 AS HUGEINT)) AS s3,
       |    sum(CAST(x1 AS HUGEINT)*x1) AS s11, sum(CAST(x1 AS HUGEINT)*x2) AS s12,
       |    sum(CAST(x1 AS HUGEINT)*x3) AS s13, sum(CAST(x2 AS HUGEINT)*x2) AS s22,
       |    sum(CAST(x2 AS HUGEINT)*x3) AS s23, sum(CAST(x3 AS HUGEINT)*x3) AS s33
       |  FROM (SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
       |               CAST(round(l_discount*100) AS BIGINT) AS x2,
       |               CAST(round(l_extendedprice*100) AS BIGINT) AS x3 FROM lineitem)),
       |v0 AS (
       |  SELECT n,
       |    CAST(s11 AS DOUBLE)/CAST(n AS DOUBLE)
       |      - (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE)) AS c11,
       |    CAST(s12 AS DOUBLE)/CAST(n AS DOUBLE)
       |      - (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE)) AS c12,
       |    CAST(s13 AS DOUBLE)/CAST(n AS DOUBLE)
       |      - (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE)) AS c13,
       |    CAST(s22 AS DOUBLE)/CAST(n AS DOUBLE)
       |      - (CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE)) AS c22,
       |    CAST(s23 AS DOUBLE)/CAST(n AS DOUBLE)
       |      - (CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE)) AS c23,
       |    CAST(s33 AS DOUBLE)/CAST(n AS DOUBLE)
       |      - (CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE)) AS c33,
       |    CAST(1.0 AS DOUBLE) AS v1, CAST(1.0 AS DOUBLE) AS v2, CAST(1.0 AS DOUBLE) AS v3
       |  FROM m),
       |$iterCtes,
       |uf AS (SELECT n, v1 AS pv1, v2 AS pv2, v3 AS pv3,
       |  c11*v1 + c12*v2 + c13*v3 AS u1,
       |  c12*v1 + c22*v2 + c23*v3 AS u2,
       |  c13*v1 + c23*v2 + c33*v3 AS u3 FROM v$PcaIters)
       |SELECT n,
       |  round((CASE WHEN u3/sqrt(u1*u1 + u2*u2 + u3*u3) < 0 THEN -1.0 ELSE 1.0 END)
       |        * (u1/sqrt(u1*u1 + u2*u2 + u3*u3)), 6) AS pc1_qty,
       |  round((CASE WHEN u3/sqrt(u1*u1 + u2*u2 + u3*u3) < 0 THEN -1.0 ELSE 1.0 END)
       |        * (u2/sqrt(u1*u1 + u2*u2 + u3*u3)), 6) AS pc1_disc,
       |  round((CASE WHEN u3/sqrt(u1*u1 + u2*u2 + u3*u3) < 0 THEN -1.0 ELSE 1.0 END)
       |        * (u3/sqrt(u1*u1 + u2*u2 + u3*u3)), 6) AS pc1_price,
       |  round(sqrt(u1*u1 + u2*u2 + u3*u3), 2) AS eigval2
       |FROM uf""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_linreg" -> qLinreg _,
    "q_ridge" -> qRidge _,
    "q_pca_power" -> qPcaPower _)

  val oracles: Map[String, String] = Map(
    "q_linreg" -> qLinregSql,
    "q_ridge" -> qRidgeSql,
    "q_pca_power" -> qPcaPowerSql)
}
