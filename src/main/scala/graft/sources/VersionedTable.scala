package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Versioned snapshots with time travel, self-hosted on plain parquet — the
 * transaction-log core of Delta/Iceberg (`_delta_log` / snapshot metadata) reduced to
 * its essence: data files are APPEND-ONLY under `path/data/`, and each version's
 * manifest (`path/_versions/v<v>.txt`) lists exactly the data files visible at that
 * version. A reader pins a version by reading its KB-scale manifest and scanning only
 * those files; history is never rewritten, so `readVersion(n)` returns byte-identical
 * results forever (until an explicit vacuum, not provided — retention policy is an
 * operational choice, not engine semantics).
 *
 * The MANIFEST CLAIM IS THE COMMIT POINT, and it is a compare-and-swap: the manifest
 * is staged as a temp file and atomically claimed as `v<v>.txt` — a hard link on the
 * local scheme (`link(2)` is atomic no-overwrite; POSIX rename REPLACES and cannot be
 * a CAS), `FileContext.rename(…, Options.Rename.NONE)` elsewhere (the primitive
 * Delta's HDFS log store builds on) — and then VERIFIED symmetrically: every writer
 * re-reads the claimed manifest and trusts the nonce found there over the rename's
 * return value (a retried rename RPC can report failure after committing; a racer's
 * report of success can be stale). SAFETY RESTS ON THE CLAIM PRIMITIVE BEING ATOMIC
 * NO-OVERWRITE — `link(2)` on `file:`, `Rename.NONE` on HDFS; those two schemes are
 * the supported ones. On a scheme whose rename can overwrite (e.g. raw object-store
 * renames), verification narrows but does not close the race window (an overwriting
 * rename can land after the verification read), as with Delta's non-S3 log stores.
 * Two racing writers both stage; exactly one claim survives verification; the loser
 * re-reads the new latest version, recomputes its carried file list, and retries at
 * v+1. Crash at ANY point leaves either the previous
 * version (staged data/temp manifest are unreferenced debris, never a wedge — data
 * dirs are nonce-named so no future commit collides with them) or the complete new
 * version. No locks, no wedged states.
 *
 * Commits supported:
 *  - `commitAppend(df)`    — new version = previous files + the new commit's files.
 *  - `commitOverwrite(df)` — new version = ONLY the new commit's files (logical
 *    replace; old files stay on disk so older versions keep working).
 *  - `commitBatch(df, batchId)` — exactly-once streaming commit: the batch id is
 *    recorded IN the manifest, so the commit and its dedup marker are one atomic
 *    rename; a foreachBatch retry after any partial state is a no-op.
 *
 * Scale: a commit writes its own data files (distributed) plus one file-list
 * manifest (file-count-sized metadata, same class as Spark's FileIndex listing);
 * version resolution is one driver read of one manifest.
 */
object VersionedTable {

  private def versionsDir(path: String) = s"$path/_versions"
  private def manifestPath(path: String, v: Long) = s"${versionsDir(path)}/v$v.txt"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed version numbers under `path`, ascending; empty for a fresh path. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val dir = new Path(versionsDir(path))
    val f = fs(spark, path)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toLong }
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

  private case class Manifest(batchId: Option[Long], writer: Option[String],
      files: Seq[String])

  private def readManifest(spark: SparkSession, path: String, v: Long): Manifest = {
    val p = new Path(manifestPath(path, v))
    val in = fs(spark, path).open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val batchId = lines.find(_.startsWith("#batch="))
      .map(_.stripPrefix("#batch=").trim.toLong)
    val writer = lines.find(_.startsWith("#writer=")).map(_.stripPrefix("#writer=").trim)
    Manifest(batchId, writer, lines.filterNot(_.startsWith("#")).filter(_.nonEmpty).sorted)
  }

  /**
   * Atomically claim `dst` with the staged manifest at `tmp` — rename-NO-OVERWRITE.
   * Hadoop's `FileSystem.rename` is NOT that primitive on every implementation:
   * LocalFileSystem delegates to POSIX rename(2), which silently REPLACES an existing
   * destination — two racing writers could then both "win" the same version, the
   * second overwriting (losing) the first's committed manifest. So:
   *  - local scheme: claim via a HARD LINK (`link(2)` — atomic, fails EEXIST if dst
   *    exists; the same trick mail spools have used for decades), then unlink tmp;
   *  - other schemes: `FileContext.rename(src, dst, Options.Rename.NONE)` (what
   *    Delta's HDFSLogStore builds on — atomic no-overwrite on HDFS), and the CALLER
   *    verifies the winning manifest's writer nonce after the claim, closing the
   *    residual check-then-rename window of any non-atomic implementation.
   * Returns true iff the claim apparently succeeded (caller still nonce-verifies).
   */
  private def claim(spark: SparkSession, tmp: Path, dst: Path): Boolean = {
    val f = fs(spark, dst.toString)
    if (f.getUri.getScheme == "file") {
      val src = java.nio.file.Paths.get(tmp.toUri.getPath)
      val d = java.nio.file.Paths.get(dst.toUri.getPath)
      try { java.nio.file.Files.createLink(d, src); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    } else {
      try {
        org.apache.hadoop.fs.FileContext.getFileContext(f.getUri,
          spark.sparkContext.hadoopConfiguration)
          .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.NONE)
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  /**
   * Stage data, then CAS-claim the next version by atomic manifest rename.
   * `carry` = true appends to the (retry-current) previous version's file list.
   */
  private def writeCommit(df: DataFrame, path: String, carry: Boolean,
      batchId: Option[Long]): Long = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    // Nonce-named data dir: unreferenced until a manifest wins, never a collision
    // target for any other writer or any future commit (debris cannot wedge).
    val nonce = java.util.UUID.randomUUID.toString.take(12)
    val commitDir = s"$path/data/c-$nonce"
    df.write.mode("overwrite").parquet(commitDir)
    val newFiles = dataFiles(spark, commitDir)
    var attempt = 0
    while (true) {
      val prev = latestVersion(spark, path)
      val v = prev + 1
      val carried = if (carry && prev >= 0) readManifest(spark, path, prev).files
        else Seq.empty[String]
      val content = (batchId.map(b => s"#batch=$b").toSeq ++ Seq(s"#writer=$nonce") ++
        carried ++ newFiles).mkString("", "\n", "\n")
      val tmp = new Path(s"${versionsDir(path)}/.tmp-$nonce")
      val out = f.create(tmp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
      // Atomic CAS: the claim fails iff another writer took v<v>.txt first; the
      // loser loops, re-reading the NEW latest so its carried list stays correct.
      // Nonce verification is SYMMETRIC (the Delta HDFSLogStore FileAlreadyExists
      // recovery): whatever `claim` returned, the truth is whose nonce sits in the
      // claimed manifest. An apparent WIN with a foreign nonce means a non-atomic
      // rename overwrote us → retry. An apparent LOSS with OUR nonce means a retried
      // rename RPC threw after the first attempt actually committed (HDFS can do
      // this) → treat as won; retrying at v+1 would list our own newFiles twice via
      // the carried list (duplicate rows).
      claim(spark, tmp, new Path(manifestPath(path, v)))
      val won = f.exists(new Path(manifestPath(path, v))) &&
        readManifest(spark, path, v).writer.contains(nonce)
      f.delete(tmp, false)
      if (won) return v
      attempt += 1
      require(attempt < 1000, s"commit CAS did not converge after $attempt attempts at $path")
    }
    -1L // unreachable
  }

  /** Append `df` as a new version; returns the new version number. */
  def commitAppend(df: DataFrame, path: String): Long =
    writeCommit(df, path, carry = true, batchId = None)

  /** Logically replace the table contents with `df` as a new version. */
  def commitOverwrite(df: DataFrame, path: String): Long =
    writeCommit(df, path, carry = false, batchId = None)

  /** Read the table as of version `v` (time travel). */
  def readVersion(spark: SparkSession, path: String, v: Long): DataFrame = {
    require(versions(spark, path).contains(v), s"version $v does not exist at $path")
    val files = readManifest(spark, path, v).files
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
   * data twice. The batch id is recorded IN the manifest, so commit + dedup marker
   * are one atomic rename — a retry after ANY partial state finds the id and no-ops
   * (the foreachBatch analog of Delta's txn/appId dedup). Batch ids are monotonic
   * under foreachBatch, so the already-committed check walks versions newest-first
   * and stops at the first batch-tagged manifest. Returns the committed (or
   * already-committed) version.
   */
  def commitBatch(batch: DataFrame, path: String, batchId: Long): Long = {
    val spark = batch.sparkSession
    val vs = versions(spark, path).reverse
    val it = vs.iterator
    var found = -1L
    var done = false
    while (it.hasNext && !done) {
      val v = it.next()
      readManifest(spark, path, v).batchId match {
        case Some(b) if b == batchId => found = v; done = true
        case Some(b) if b < batchId  => done = true // ids monotonic: not committed
        case _                       => () // non-batch commit interleaved; keep looking
      }
    }
    if (found >= 0) found
    else writeCommit(batch, path, carry = true, batchId = Some(batchId))
  }

  /** (version, n_files, n_rows) per version — the DESCRIBE HISTORY analog. */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    versions(spark, path).map { v =>
      val files = readManifest(spark, path, v).files
      val rows = if (files.isEmpty) 0L else spark.read.parquet(files: _*).count()
      (v, files.length.toLong, rows)
    }.toDF("version", "n_files", "n_rows").orderBy(col("version"))
  }
}
