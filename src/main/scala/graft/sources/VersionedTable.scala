package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Versioned snapshots with time travel, self-hosted on plain parquet — the
 * transaction-log core of Delta/Iceberg (`_delta_log` / snapshot metadata) reduced to
 * its essence: data files are APPEND-ONLY under `path/data/commit-<v>/`, and each
 * version's manifest (`path/_versions/v<v>.parquet`) lists exactly the data files
 * visible at that version. A reader pins a version by reading its KB-scale manifest
 * and scanning only those files; history is never rewritten, so `readVersion(n)`
 * returns byte-identical results forever (until an explicit vacuum, not provided —
 * retention policy is an operational choice, not engine semantics).
 *
 * Commits supported:
 *  - `commitAppend(df)`   — new version = previous files + the new commit's files.
 *  - `commitOverwrite(df)` — new version = ONLY the new commit's files (logical
 *    replace; old files stay on disk so older versions keep working).
 *
 * Scale: a commit writes its own data files (distributed) plus one file-list
 * manifest (file-count-sized metadata, same class as Spark's FileIndex listing);
 * version resolution is one driver read of one manifest. Single-writer assumed —
 * the same discipline as the compaction tool; a real multi-writer deployment puts
 * a lock/CAS in front of the version counter exactly as Delta's log store does.
 */
object VersionedTable {

  private def versionsDir(path: String) = s"$path/_versions"
  private def manifestPath(path: String, v: Long) = s"${versionsDir(path)}/v$v.parquet"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed version numbers under `path`, ascending; empty for a fresh path. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val dir = new Path(versionsDir(path))
    val f = fs(spark, path)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".parquet") =>
        n.stripPrefix("v").stripSuffix(".parquet").toLong }
      .sorted
  }

  /** Latest committed version, or -1 for a fresh path. */
  def latestVersion(spark: SparkSession, path: String): Long =
    versions(spark, path).lastOption.getOrElse(-1L)

  private def dataFiles(spark: SparkSession, commitDir: String): Seq[String] = {
    val f = fs(spark, commitDir)
    f.listStatus(new Path(commitDir)).toSeq
      .collect { case st if st.isFile && st.getPath.getName.endsWith(".parquet") =>
        st.getPath.toString }
      .sorted
  }

  private def writeCommit(df: DataFrame, path: String, carry: Seq[String]): Long = {
    val spark = df.sparkSession
    val v = latestVersion(spark, path) + 1
    val commitDir = s"$path/data/commit-$v"
    df.write.mode("errorifexists").parquet(commitDir)
    val files = carry ++ dataFiles(spark, commitDir)
    import spark.implicits._
    // data first, manifest last: a crash before the manifest write leaves the table
    // at the previous version (the new files are unreferenced, not half-visible)
    files.toDF("file").coalesce(1).write.mode("errorifexists")
      .parquet(manifestPath(path, v))
    v
  }

  /** Append `df` as a new version; returns the new version number. */
  def commitAppend(df: DataFrame, path: String): Long = {
    val prev = latestVersion(df.sparkSession, path)
    val carry = if (prev < 0) Seq.empty[String]
      else manifestFiles(df.sparkSession, path, prev)
    writeCommit(df, path, carry)
  }

  /** Logically replace the table contents with `df` as a new version. */
  def commitOverwrite(df: DataFrame, path: String): Long =
    writeCommit(df, path, Seq.empty)

  private def manifestFiles(spark: SparkSession, path: String, v: Long): Seq[String] =
    spark.read.parquet(manifestPath(path, v)).collect().map(_.getString(0)).toSeq.sorted

  /** Read the table as of version `v` (time travel). */
  def readVersion(spark: SparkSession, path: String, v: Long): DataFrame = {
    require(versions(spark, path).contains(v), s"version $v does not exist at $path")
    val files = manifestFiles(spark, path, v)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  /** Read the latest version. */
  def readLatest(spark: SparkSession, path: String): DataFrame =
    readVersion(spark, path, latestVersion(spark, path))

  /**
   * Exactly-once streaming commit: append `batch` as a new version keyed by the
   * micro-batch id. foreachBatch re-delivers a batch after a crash BETWEEN the sink
   * write and the checkpoint commit; a blind commitAppend would then version the same
   * data twice. The batch-id marker (written AFTER the manifest, checked first) makes
   * the retry a no-op — the foreachBatch analog of Delta's txn/appId dedup. Returns
   * the committed (or already-committed) version.
   */
  def commitBatch(batch: DataFrame, path: String, batchId: Long): Long = {
    val spark = batch.sparkSession
    val marker = new Path(s"$path/_versions/batch-$batchId.committed")
    val f = fs(spark, path)
    if (f.exists(marker)) {
      val in = f.open(marker)
      val v = try scala.io.Source.fromInputStream(in).mkString.trim.toLong finally in.close()
      return v
    }
    val v = commitAppend(batch, path)
    val out = f.create(marker, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    v
  }

  /** (version, n_files, n_rows) per version — the DESCRIBE HISTORY analog. */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    versions(spark, path).map { v =>
      val files = manifestFiles(spark, path, v)
      val rows = if (files.isEmpty) 0L else spark.read.parquet(files: _*).count()
      (v, files.length.toLong, rows)
    }.toDF("version", "n_files", "n_rows").orderBy(col("version"))
  }
}
