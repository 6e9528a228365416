package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.LayoutWriter

/**
 * Streaming materialized-table maintenance: fold a stream of keyed updates into a
 * hive-partitioned parquet table, rewriting ONLY the partitions each micro-batch touches
 * (LayoutWriter.upsertPartitioned inside foreachBatch) — the continuous-ingestion upsert
 * pattern (CDC apply, feature-store refresh) without a table format.
 *
 * Semantics:
 *  - Within a batch, LAST WRITE WINS under an explicit ordering column (`orderCol`,
 *    e.g. an event timestamp): upsertPartitioned requires one row per key, and "last"
 *    must be defined by data, not arrival order, for retries to be deterministic.
 *  - Across retries the sink is effectively idempotent: re-applying the same batch's
 *    upsert leaves the table in the same state (unlike a blind append, which duplicates).
 *    The non-atomic window inside a single upsert (a reader racing the partition
 *    overwrite) is inherited from upsertPartitioned and documented there.
 *  - A key's partition-value change moves the row: the old partition is rewritten
 *    without it (and deleted if emptied), the new one gains it.
 */
object TableMaintenance {

  /** One batch of the maintenance loop (also usable for incremental batch pipelines). */
  def applyUpserts(batch: DataFrame, path: String, key: String, partitionCol: String,
      orderCol: String): Unit = {
    val spark = batch.sparkSession
    // tie-break by content hash, not monotonically_increasing_id: the id depends on task
    // layout and would make a retried batch pick a different winner. After the hash, ties
    // are only between bit-identical rows, where any pick is the same row.
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol).desc, xxhash64(struct(col("*"))))
    val latest = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    if (!latest.isEmpty) {
      // "table exists" = the directory holds at least one committed entry (partition dir
      // or data file), not merely exists(): a first-batch write that crashed after
      // creating the directory (leaving only _temporary/_SUCCESS debris) must route the
      // retry back to table creation — upsertPartitioned would throw on a file-less path
      // and wedge the stream. The fresh-write mode is overwrite to clear that debris.
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val p = new Path(path)
      val tableExists = fs.exists(p) && fs.listStatus(p).exists { st =>
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
      if (tableExists) LayoutWriter.upsertPartitioned(spark, path, latest, key, partitionCol)
      else latest.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    }
  }

  /** Wire the maintenance loop onto a stream of updates. */
  def upsertStream(updates: DataFrame, path: String, key: String, partitionCol: String,
      orderCol: String, checkpointDir: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyUpserts(batch, path, key, partitionCol, orderCol)
      }
      .start()

  // ---- streaming incremental aggregate view --------------------------------------------

  private def committedVersions(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Long] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.drop(2).toLong)
      .filter(v => fs.exists(new Path(s"$path/v=$v/_SUCCESS")))
      .sorted
  }

  /**
   * One CDC batch of the incremental-view loop. Exactly-once across foreachBatch
   * retries WITHOUT a table format: read-modify-overwrite is not idempotent (a replayed
   * batch would double-apply its delta), so each batch commits the ENTIRE next state to
   * a fresh versioned directory `v=<batchId>` — the directory's `_SUCCESS` marker is the
   * atomic commit. A retry of batch N sees a committed `v=N` and does nothing; a crash
   * mid-write leaves an uncommitted directory that the retry simply overwrites. Older
   * versions are deleted only after the new commit. The state is view-sized (one row
   * per key), so rewriting it per trigger is the cheap side of the asymmetry — the
   * 100 TB base table is what never gets rescanned.
   */
  def applyAggDelta(batch: DataFrame, path: String, key: String, cntCol: String,
      totalCol: String, opCol: String, valCol: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val versions = committedVersions(spark, path)
    if (versions.contains(batchId)) return // replayed batch: already applied
    val prev = versions.filter(_ < batchId)
    val state = prev.lastOption match {
      case Some(v) => spark.read.parquet(s"$path/v=$v")
      case None => // typed empty state derived from the delta's own column types
        batch.select(col(key), col(opCol).cast("long").as(cntCol),
          (col(opCol) * col(valCol)).as(totalCol)).filter(lit(false))
    }
    graft.operators.MergeOps.incrementalAgg(state, batch, key, cntCol, totalCol, opCol, valCol)
      .write.mode("overwrite").parquet(s"$path/v=$batchId")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    prev.foreach(v => fs.delete(new Path(s"$path/v=$v"), true))
  }

  /** The committed view state (one row per surviving key), or None before first commit. */
  def readAggView(spark: org.apache.spark.sql.SparkSession, path: String): Option[DataFrame] =
    committedVersions(spark, path).lastOption.map(v => spark.read.parquet(s"$path/v=$v"))

  /** Maintain an aggregate view over a CDC stream of (key, op ∈ {+1,-1}, value) rows. */
  def incrementalAggStream(cdc: DataFrame, path: String, key: String, cntCol: String,
      totalCol: String, opCol: String, valCol: String, checkpointDir: String): StreamingQuery =
    cdc.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        applyAggDelta(batch, path, key, cntCol, totalCol, opCol, valCol, bid)
      }
      .start()
}
