package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * File-level data skipping via a min/max manifest — the Delta/Iceberg-style stats
 * index, self-hosted on plain parquet: a sidecar `_manifest` table records per-file
 * (row count, min, max) for chosen columns; point/range scans consult the manifest
 * first and hand Spark ONLY the overlapping files. Parquet row-group stats already
 * prune within a file — this prunes at the file-listing level, which is what matters
 * at 100 TB where a table is tens of thousands of files and the scheduler shouldn't
 * even enumerate the misses.
 *
 * The manifest is computed with one aggregation over the `_metadata.file_path` column
 * (no footer parsing, engine-portable) and is files-count-sized — KB-scale metadata.
 * The file-list materialization in `readPruned` is the same driver-side metadata step
 * Spark's own FileIndex performs; it is proportional to file count, never to rows.
 */
object FileSkipIndex {

  private def manifestPath(path: String) = s"$path/_manifest"

  /** One (file, n_rows, <col>_min, <col>_max ...) row per data file under `path`. */
  def computeManifest(spark: SparkSession, path: String, statsCols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(count(lit(1)).as("n_rows"),
        statsCols.flatMap(c =>
          Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)

  /**
   * Write `df` range-clustered on `statsCols.head` (tight per-file ranges are what make
   * min/max skipping bite) and persist the sidecar manifest.
   */
  def writeWithManifest(df: DataFrame, path: String, statsCols: Seq[String],
      numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, statsCols.map(col): _*)
      .sortWithinPartitions(statsCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
    computeManifest(df.sparkSession, path, statsCols)
      .coalesce(1).write.mode("overwrite").parquet(manifestPath(path))
  }

  /**
   * Range scan `lo <= c <= hi` reading only files whose [min, max] interval overlaps —
   * files with null stats (all-null columns) are conservatively kept. Returns rows
   * exactly equal to a full scan + filter.
   */
  def readPruned(spark: SparkSession, path: String, c: String, lo: Column, hi: Column)
      : DataFrame = {
    val m = spark.read.parquet(manifestPath(path))
    val keep = m.filter(
        col(s"${c}_max").isNull || col(s"${c}_min").isNull ||
        (col(s"${c}_max") >= lo && col(s"${c}_min") <= hi))
      .select(col("file")).collect().map(_.getString(0))
    val base =
      if (keep.isEmpty)
        spark.read.parquet(path).limit(0) // schema-preserving empty frame
      else spark.read.parquet(keep.toIndexedSeq: _*)
    base.filter(col(c) >= lo && col(c) <= hi)
  }

  /** Manifest-reported file count that a range scan would touch (for plan audits). */
  def filesTouched(spark: SparkSession, path: String, c: String, lo: Column, hi: Column): Long =
    spark.read.parquet(manifestPath(path))
      .filter(col(s"${c}_max").isNull || col(s"${c}_min").isNull ||
        (col(s"${c}_max") >= lo && col(s"${c}_min") <= hi))
      .count()
}
