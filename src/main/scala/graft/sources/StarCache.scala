package graft.sources

import java.util.UUID

import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * One-time materialization of a derived star schema to parquet — the views become
 * data at rest, the way a real deployment (and the reference's TPC-DS suite, which
 * reads dbgen output: gazelle_plugin native-sql-engine/core/src/test/scala/com/intel/
 * oap/tpc/ds/TPCDSSuite.scala:1) stores a star schema.
 *
 * Why not recompute the CTE views per query: the derived DS star includes a generated
 * weekly part x warehouse `inventory` grid that is deliberately large (83 M rows at
 * sf0.1, 100x that at the 100 TB design point). Re-deriving it inside every query
 * charges every inventory query a full grid regeneration through a row-by-row
 * nested-loop generator; materialized once, the same rows come back through the
 * vectorized parquet reader with column pruning, predicate pushdown, and row-group
 * min/max skipping (facts are range-partitioned and sorted on their date key), and
 * the scan carries real file-size statistics for AQE's broadcast/skew decisions.
 *
 * Cache layout: `<java.io.tmpdir>/graft_star/v<Version>_<star>_<stamp>/<view>/`,
 * where `stamp` hashes the source directory listing (name, length, mtime of every
 * file) — regenerated test data or a changed view definition (bump [[Version]])
 * lands in a fresh directory rather than silently serving stale rows. Builds are
 * atomic: views are written under a nonce-named sibling that is renamed into place
 * only after a `_STAR_COMPLETE` marker is written inside it; a lost rename race
 * discards the duplicate build and reuses the winner's.
 *
 * Fail-soft by contract: [[tryEnsure]] returns false on ANY failure and the caller
 * keeps its inline-CTE plan — materialization is an optimization, never a
 * correctness dependency.
 */
object StarCache {
  /** Bump when any materialized view's defining SQL changes. */
  private val Version = 1

  // (session identity, cache base) pairs already registered as temp views — the
  // per-query fast path must not pay 24 parquet footer reads per call.
  private val registered = TrieMap.empty[(Int, String), Boolean]

  /** Fact views get range-partitioned + sorted on their date surrogate key so
    * date-band predicates (q21/q37/q82-style) skip whole files and row groups;
    * everything else is a dim written as a single file. */
  private val sortKey = Map(
    "inventory"       -> "inv_date_sk",
    "store_sales"     -> "ss_sold_date_sk",
    "web_sales"       -> "ws_sold_date_sk",
    "catalog_sales"   -> "cs_sold_date_sk",
    "store_returns"   -> "sr_returned_date_sk",
    "catalog_returns" -> "cr_returned_date_sk",
    "web_returns"     -> "wr_returned_date_sk",
    "lineorder"       -> "lo_orderdate")

  private def stamp(spark: SparkSession, sfDir: String): String = {
    val p = new Path(sfDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing: a source table that is a directory of part-files must rotate
    // the stamp when any file inside changes, even if the directory entry itself keeps
    // its mtime — the same staleness class the MV freshness gate was bitten by (r6).
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      files += s"${st.getPath.toUri.getPath}:${st.getLen}:${st.getModificationTime}"
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest((sfDir + "|" + files.sorted.mkString(",")).getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
  }

  /**
   * Materialize `views` (defining SQL supplied by `sql`, which may reference the base
   * temp views — the caller must have registered them) once per (source-data stamp,
   * star name), then register each as a temp view over its parquet. Returns false —
   * leaving the caller on its inline-CTE fallback — if anything goes wrong.
   */
  def tryEnsure(spark: SparkSession, sfDir: String, star: String, views: Seq[String],
                sql: String => String): Boolean =
    try {
      if (sys.env.contains("SPARK_GRAFT_NO_STAR")) return false // A/B: force the CTE path
      val base =
        s"${System.getProperty("java.io.tmpdir")}/graft_star/v${Version}_${star}_${stamp(spark, sfDir)}"
      val key = (System.identityHashCode(spark), base)
      if (registered.contains(key)) true
      else {
        val basePath = new Path(base)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val done = new Path(basePath, "_STAR_COMPLETE")
        if (!fs.exists(done)) {
          val tmp = new Path(s"$base.build-${UUID.randomUUID().toString.take(8)}")
          views.foreach { v =>
            val df = spark.sql(sql(v))
            val out = sortKey.get(v) match {
              case Some(k) => df.repartitionByRange(df.col(k)).sortWithinPartitions(k)
              case None    => df.coalesce(1)
            }
            out.write.mode("overwrite").parquet(new Path(tmp, v).toString)
          }
          fs.create(new Path(tmp, "_STAR_COMPLETE"), true).close()
          // Atomic publish; losing the rename race means another build won — use theirs.
          if (!fs.rename(tmp, basePath)) fs.delete(tmp, true)
        }
        if (fs.exists(done)) {
          // Plain temp views over the parquet. Measured dead end, for the record: CBO
          // (catalog tables + ANALYZE FOR ALL COLUMNS + cbo.joinReorder) was tried here
          // and REGRESSED the pack — tpcds_q72 2.1->4.9 s, tpcds_q22 2.7->3.6 s at
          // sf0.1, plus ~25 s/session of stats collection — so the file-stats +
          // AQE-runtime planning Spark does by default stays.
          views.foreach { v =>
            spark.read.parquet(new Path(basePath, v).toString).createOrReplaceTempView(v)
          }
          registered.put(key, true)
          true
        } else false
      }
    } catch { case NonFatal(_) => false }
}
