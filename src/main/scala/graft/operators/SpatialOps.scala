package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TableIO

/**
 * Geo-spatial joins as relational plans: an epsilon-grid radius join and a
 * bounded-radius kNN join, both over great-circle (haversine) distance.
 *
 * The reference has no spatial operators; this closes a gap every real corpus
 * pipeline hits (geo-tagged crawl data, supplier/customer proximity). The design is
 * the classic epsilon-grid equi-join (Zhang et al., "Spatial join" literature; same
 * shape Sedona/Magellan use): bin one side into radius-sized cells, replicate the
 * other side to its 3x3 cell neighborhood, equi-join on the cell id, then apply the
 * exact haversine predicate. The O(n*m) cross product never materializes — only
 * same-neighborhood pairs do.
 *
 * Scale notes (100 TB): the join is a plain equi-join on (cx, cy) — shuffle-hash /
 * SMJ with AQE skew splitting. Cell population follows data density, not data size:
 * for dense corpora shrink the cell edge (and widen the neighbor window to ceil(r/edge))
 * or salt hot cells; the predicate stays exact either way. The replicated side is the
 * smaller one (suppliers, 9x), so replication cost is bounded by the dimension table.
 *
 * Coordinates are derived deterministically from integer keys (the TPC-H-ish driver
 * schema has no native lat/lon): lat in [-60, 60) on a 0.01-degree lattice. Integer
 * modular arithmetic keeps the derivation bit-identical in Spark and the DuckDB
 * oracle; distances are "generic" (no near-500.000 km boundary coincidences on the
 * lattice), so the float predicate is engine-stable.
 */
object SpatialOps {

  private val RadiusKm = 500.0
  private val EarthRadiusKm = 6371.0

  /** Deterministic synthetic coordinates from an integer key (same formula in SQL). */
  private def latOf(key: Column): Column = (key * 7919L % 12000L) / 100.0 - 60.0
  private def lonOf(key: Column): Column = (key * 104729L % 36000L) / 100.0 - 180.0

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2), degrees in. */
  private[graft] def haversineKm(
      lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = pow(sin(dLat), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }

  /**
   * General epsilon-grid radius join: `left` (id, lat, lon) x `right` (sid, slat,
   * slon) → (id, sid, …, dist) pairs with great-circle distance <= radiusKm. Cell
   * sizes derive from the radius: latitude cells of radiusKm/111.0 degrees (>= the
   * worst-case meridian span of a radius circle on the R=6371 sphere, 111.19 km/deg)
   * and longitude cells sized by the band's worst-case cos(maxAbsLat) — so a 3x3
   * neighborhood provably covers every radius circle and the grid NEVER drops a pair
   * (SpatialMlSpec proves it against the exhaustive cross join).
   */
  def radiusJoin(left: DataFrame, right: DataFrame, radiusKm: Double,
      maxAbsLat: Double = 85.0): DataFrame = {
    val latCell = radiusKm / 111.0
    val nLon = math.max(1, math.floor(
      360.0 / (radiusKm / (111.0 * math.cos(math.toRadians(maxAbsLat))))).toInt)
    val lonCell = 360.0 / nLon
    val l = left
      .withColumn("cx", floor((col("lon") + 180.0) / lonCell).cast("int"))
      .withColumn("cy", floor((col("lat") + 90.0) / latCell).cast("int"))
    val r = right
      .withColumn("dx", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("dy", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("cx",
        pmod(floor((col("slon") + 180.0) / lonCell).cast("int") + col("dx"),
          lit(nLon)).cast("int"))
      .withColumn("cy", floor((col("slat") + 90.0) / latCell).cast("int") + col("dy"))
      .drop("dx", "dy")
    l.join(r, Seq("cx", "cy"))
      .withColumn("dist",
        haversineKm(col("lat"), col("lon"), col("slat"), col("slon")))
      .filter(col("dist") <= radiusKm)
      .drop("cx", "cy")
  }

  private def customersGeo(spark: SparkSession, dir: String): DataFrame =
    TableIO.customer(spark, dir)
      .select(col("c_custkey").as("id"),
        latOf(col("c_custkey")).as("lat"), lonOf(col("c_custkey")).as("lon"))

  private def suppliersGeo(spark: SparkSession, dir: String): DataFrame =
    TableIO.supplier(spark, dir)
      .select(col("s_suppkey").as("sid"),
        latOf(col("s_suppkey")).as("slat"), lonOf(col("s_suppkey")).as("slon"))

  private def pairsWithin(spark: SparkSession, dir: String): DataFrame =
    radiusJoin(customersGeo(spark, dir), suppliersGeo(spark, dir), RadiusKm,
      maxAbsLat = 60.0)

  // ------------------------------------------------------ q_geo_radius_join

  /** Per-customer proximity summary: suppliers within 500 km (count + nearest). */
  def qGeoRadiusJoin(spark: SparkSession, dir: String): DataFrame =
    pairsWithin(spark, dir)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_near"), round(min(col("dist")), 3).as("min_km"))
      .orderBy(col("id"))

  /** Oracle states the SEMANTICS (exhaustive distance filter); the engine's grid form
    * is proven equivalent — the grid never drops a pair because one cell edge covers
    * the radius everywhere in the band. */
  val qGeoRadiusJoinSql: String =
    """WITH c AS (SELECT c_custkey AS id, (c_custkey*7919)%12000/100.0-60.0 AS lat,
      |                  (c_custkey*104729)%36000/100.0-180.0 AS lon FROM customer),
      |s AS (SELECT s_suppkey AS sid, (s_suppkey*7919)%12000/100.0-60.0 AS slat,
      |             (s_suppkey*104729)%36000/100.0-180.0 AS slon FROM supplier),
      |p AS (SELECT id, sid, 2*6371.0*asin(sqrt(pow(sin(radians(slat-lat)/2),2)
      |        + cos(radians(lat))*cos(radians(slat))*pow(sin(radians(slon-lon)/2),2))) AS dist
      |      FROM c CROSS JOIN s)
      |SELECT id, count(*) AS n_near, round(min(dist),3) AS min_km
      |FROM p WHERE dist <= 500.0 GROUP BY id ORDER BY id""".stripMargin

  // -------------------------------------------------------------- q_geo_knn

  /** Bounded-radius kNN join: the 3 nearest suppliers within 500 km per customer,
    * rank ties broken by supplier id on a microdegree-lattice distance (round 6). */
  def qGeoKnn(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(round(col("dist"), 6), col("sid"))
    pairsWithin(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("id"), col("rn").cast("int").as("rn"), col("sid"),
        round(col("dist"), 3).as("km"))
      .orderBy(col("id"), col("rn"))
  }

  val qGeoKnnSql: String =
    """WITH c AS (SELECT c_custkey AS id, (c_custkey*7919)%12000/100.0-60.0 AS lat,
      |                  (c_custkey*104729)%36000/100.0-180.0 AS lon FROM customer),
      |s AS (SELECT s_suppkey AS sid, (s_suppkey*7919)%12000/100.0-60.0 AS slat,
      |             (s_suppkey*104729)%36000/100.0-180.0 AS slon FROM supplier),
      |p AS (SELECT id, sid, 2*6371.0*asin(sqrt(pow(sin(radians(slat-lat)/2),2)
      |        + cos(radians(lat))*cos(radians(slat))*pow(sin(radians(slon-lon)/2),2))) AS dist
      |      FROM c CROSS JOIN s),
      |r AS (SELECT id, sid, dist, row_number() OVER (PARTITION BY id
      |        ORDER BY round(dist,6), sid) AS rn
      |      FROM p WHERE dist <= 500.0)
      |SELECT id, CAST(rn AS INT) AS rn, sid, round(dist,3) AS km
      |FROM r WHERE rn <= 3 ORDER BY id, rn""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_geo_radius_join" -> qGeoRadiusJoin _,
    "q_geo_knn" -> qGeoKnn _)

  val oracles: Map[String, String] = Map(
    "q_geo_radius_join" -> qGeoRadiusJoinSql,
    "q_geo_knn" -> qGeoKnnSql)
}
