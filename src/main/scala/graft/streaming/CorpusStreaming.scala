package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/**
 * Streaming corpus ingestion with an INCREMENTAL near-duplicate gate: documents arrive in
 * micro-batches; each batch admits only documents that are not duplicates (exact or near)
 * of anything already admitted across previous batches, nor of each other.
 *
 * Mechanics (the production pattern for continuous training-data pipelines):
 *  - The admitted corpus is represented by its LSH BAND INDEX plus a CONTENT-HASH lane —
 *    (band, bh) rows with band = -1 carrying xxhash64 of the text. ~33 longs per admitted
 *    doc, persisted as parquet and appended per batch, never rewritten. The content lane
 *    exactly catches re-arrivals of docs too short to shingle (< 3 tokens), which have no
 *    bands; null text is treated as empty text in the lane.
 *  - Per batch, inside `foreachBatch`: signatures + bands for the incoming docs (map-only
 *    typed kernels, computed ONCE and shared with pair generation), one semi-join against
 *    the index drops cross-batch collisions, then an exact keep-min window plus the
 *    verified pair + connected-components pass dedups WITHIN the batch (same policy as
 *    the batch engine's `Dedup.dedupedCorpus`). Admitted docs' index rows append last.
 *  - The cross-batch near-dup drop is CANDIDATE-level (band collision, not verified
 *    jaccard): verifying would require storing gram sets for every admitted doc. With 32
 *    bands of 4 rows, a band collision implies high estimated similarity (the s-curve at
 *    j=0.8 fires with p > 0.999998), so false drops are rare and the trade is documented
 *    — the bounded-state stance every streaming dedup takes.
 *
 * Failure semantics: admitted rows are written to the OUTPUT before the index append
 * (see [[dedupIngest]]), so a foreachBatch retry can duplicate output rows
 * (at-least-once, the normal file-sink contract) but can never lose documents — the
 * reverse order would let a retry see the batch's own index rows and drop everything.
 */
object CorpusStreaming {

  private val ContentLaneBand = -1

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Index rows for a batch: LSH bands + the content-hash lane (works on any Hadoop FS). */
  private def indexRows(batch: DataFrame, bands: DataFrame): DataFrame =
    bands.unionByName(batch.select(
      col("doc_id"),
      lit(ContentLaneBand).as("band"),
      xxhash64(coalesce(col("text"), lit(""))).as("bh")))

  /**
   * One gate pass; also usable standalone for incremental BATCH ingestion. Returns the
   * admitted rows of `batch` (all columns preserved, already materialized). `persist`
   * runs on the admitted frame BETWEEN the decision and the index append — sinks MUST go
   * through it (not after the call): output-first ordering is what makes a retry
   * duplicate rows instead of losing them.
   */
  def admitBatch(batch: DataFrame, indexDir: String, threshold: Double = 0.8,
      updateIndex: Boolean = true, persist: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    val g = Dedup.gramHashSets(batch).cache()
    val bands = Dedup.lshBands(Dedup.minhashSignatures(g)).cache()
    val allRows = indexRows(batch, bands)
    val existing: Option[DataFrame] =
      if (fs(spark, indexDir).exists(new Path(indexDir))) Some(spark.read.parquet(indexDir))
      else None
    val collided = existing match {
      case Some(idx) => allRows.join(idx, Seq("band", "bh"), "left_semi")
        .select(col("doc_id")).distinct()
      case None => spark.emptyDataFrame.withColumn("doc_id", lit(0L)).limit(0)
    }
    val fresh = batch.join(collided, Seq("doc_id"), "left_anti")
    // within-batch, same policy as Dedup.dedupedCorpus: exact keep-min first (catches
    // gram-less short/empty docs), then verified near-dup components keep-min
    val exactKeep = fresh
      .withColumn("ch", xxhash64(coalesce(col("text"), lit(""))))
      .withColumn("keeper", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("ch"))))
      .filter(col("doc_id") === col("keeper"))
      .drop("ch", "keeper")
    val freshIds = exactKeep.select(col("doc_id"))
    val gFresh = g.join(freshIds, Seq("doc_id"), "left_semi")
    val bandsFresh = bands.join(freshIds, Seq("doc_id"), "left_semi")
    val intraDrop = Dedup.connectedComponents(
        Dedup.minhashPairsFrom(gFresh, bandsFresh, threshold).select(col("a_id"), col("b_id")))
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id"))
    // MATERIALIZE the decision before the index grows: the admitted plan reads the index
    // lazily, so without pinning, a caller evaluating the returned frame AFTER the append
    // would see the batch's own bands and drop every doc as a collision with itself.
    val admitted = exactKeep.join(intraDrop, Seq("doc_id"), "left_anti").localCheckpoint()
    persist(admitted)
    if (updateIndex) appendIndex(batch, bands, admitted, indexDir)
    g.unpersist()
    bands.unpersist()
    admitted
  }

  private def appendIndex(batch: DataFrame, bands: DataFrame, admitted: DataFrame,
      indexDir: String): Unit =
    indexRows(batch, bands)
      .join(admitted.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .write.mode("append").parquet(indexDir)

  /**
   * Compact the append-only index: per-batch appends accumulate one small file per batch
   * per partition (the classic streaming small-files problem — at one batch/minute a day
   * leaves ~1.4k file groups and listing cost starts to dominate the semi-join's scan).
   * Rewrites into `targetFiles` files sorted by (band, bh) so row-group min/max stats
   * line up with probe keys. Uses the Hadoop FileSystem API (works on hdfs/s3a/local);
   * stale `.compact`/`.old` leftovers from a crashed prior run are cleared first, and the
   * promotion is rename-based — NOT atomic with concurrent writers, so run it from the
   * maintenance path while the ingest query is stopped (the discipline any file-format
   * compaction without a table format requires). If a crash lands between the two
   * renames, the index survives intact at `<indexDir>.old` — restore by renaming back.
   */
  def compactIndex(spark: SparkSession, indexDir: String, targetFiles: Int = 8): Unit = {
    val hfs = fs(spark, indexDir)
    val dir = new Path(indexDir)
    val tmp = new Path(indexDir + ".compact")
    val bak = new Path(indexDir + ".old")
    if (hfs.exists(tmp)) hfs.delete(tmp, true)
    if (hfs.exists(bak)) hfs.delete(bak, true)
    spark.read.parquet(indexDir)
      .repartition(targetFiles, col("band"))
      .sortWithinPartitions(col("band"), col("bh"))
      .write.mode("overwrite").parquet(tmp.toString)
    require(hfs.rename(dir, bak), s"could not move $indexDir aside")
    require(hfs.rename(tmp, dir), s"could not promote $tmp; index preserved at $bak")
    hfs.delete(bak, true)
  }

  /** Wire the gate onto a stream: admitted rows land in `outDir` BEFORE the band index
    * grows in `indexDir` (retries duplicate output, never lose it), one gate pass per
    * micro-batch. */
  def dedupIngest(docsStream: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String, threshold: Double = 0.8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admitBatch(batch, indexDir, threshold,
          persist = _.write.mode("append").parquet(outDir))
        ()
      }
      .start()

  /**
   * Incremental SEGMENT-level gate — the streaming counterpart of
   * [[graft.pipeline.Dedup.segmentDedup]]: per micro-batch, drop every k-token segment
   * already admitted by ANY earlier batch (or earlier in this batch, by (doc_id, pos)
   * order) and reassemble each document from its surviving segments. This is how a
   * continuous pipeline keeps C4-style line dedup exact across arrivals without
   * reprocessing the corpus.
   *
   * State is one (xxhash64, batch_id) row per distinct admitted segment, append-only
   * parquet. REPLAY SAFETY: index rows are tagged with the writing batch id and the
   * anti-join EXCLUDES rows the current batch id wrote, so a foreachBatch retry after a
   * crash between the index append and the checkpoint commit re-derives the IDENTICAL
   * decision and re-emits the same output rows — at-least-once duplicates, never the
   * contradictory all-dropped rows an untagged index would produce. The decision frame
   * is still pinned (localCheckpoint) before the append so the returned plan cannot
   * lazily re-read the index it just grew, and output persists before the index grows.
   *
   * Returns (doc_id, n_segs, n_kept, dedup_text) for every batch doc — fully-duplicate
   * docs stay visible with n_kept 0. `batchId` < 0 (the standalone default) disables the
   * self-exclusion: sequential batch callers have no replay to guard against.
   */
  def admitSegmentsBatch(batch: DataFrame, indexDir: String, k: Int = 8,
      batchId: Long = -1L, updateIndex: Boolean = true,
      persist: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    val segs = Dedup.segmentedDocs(batch, k).withColumn("h", xxhash64(col("seg")))
    val fresh = (
      if (fs(spark, indexDir).exists(new Path(indexDir))) {
        val idx0 = spark.read.parquet(indexDir)
        val idx = if (batchId >= 0) idx0.filter(col("batch_id") =!= batchId) else idx0
        segs.join(idx.select(col("h")), Seq("h"), "left_anti")
      } else segs).cache()
    val out = Dedup.reassembleSegments(batch, fresh, k).localCheckpoint()
    persist(out)
    if (updateIndex)
      fresh.select(col("h")).distinct()
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(indexDir)
    fresh.unpersist()
    out
  }

  /** Wire the segment gate onto a stream (output-before-index, batch-id replay guard). */
  def segmentIngest(docsStream: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String, k: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitSegmentsBatch(batch, indexDir, k, batchId,
          persist = _.write.mode("append").parquet(outDir))
        ()
      }
      .start()
}
