package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/**
 * Streaming corpus ingestion with an INCREMENTAL near-duplicate gate: documents arrive in
 * micro-batches; each batch admits only documents that are not near-dups of anything
 * already admitted (across ALL previous batches) nor of each other.
 *
 * Mechanics (the production pattern for continuous training-data pipelines):
 *  - The admitted corpus is represented by its LSH BAND INDEX — (band, bh) rows, ~32
 *    longs per admitted doc — persisted as parquet and appended per batch, never
 *    rewritten. At 100 TB of admitted text the index is a few hundred GB of longs,
 *    partition-pruned by band on read.
 *  - Per batch, inside `foreachBatch`: signature + bands for the incoming docs (map-only
 *    typed kernels), one semi-join against the index drops cross-batch collisions, then
 *    the ordinary verified pair + connected-components pass dedups WITHIN the batch
 *    (exact jaccard, same policy as the batch engine). Admitted docs' bands append to
 *    the index.
 *  - The cross-batch drop is CANDIDATE-level (band collision, not verified jaccard):
 *    verifying would require storing gram sets for every admitted doc. With 32 bands of
 *    4 rows, a band collision implies high estimated similarity (the s-curve at j=0.8
 *    fires with p > 0.999998), so false drops are rare and the trade is documented —
 *    the same precision/recall stance every streaming dedup takes (state must stay
 *    bounded per admitted doc).
 */
object CorpusStreaming {

  /** One micro-batch of the gate; also usable standalone for incremental BATCH ingestion.
    * Returns the admitted rows of `batch` (all columns preserved). Appends their bands to
    * `indexDir` when `updateIndex` (foreachBatch retries make appends at-least-once;
    * re-appending the same doc's bands only adds duplicate index rows, which are
    * harmless for a semi-join). */
  def admitBatch(batch: DataFrame, indexDir: String, threshold: Double = 0.8,
      updateIndex: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    val g = Dedup.gramHashSets(batch).cache()
    val bands = Dedup.lshBands(Dedup.minhashSignatures(g)).cache()
    val existing: Option[DataFrame] =
      if (new java.io.File(indexDir).exists()) Some(spark.read.parquet(indexDir)) else None
    val collided = existing match {
      case Some(idx) => bands.join(idx, Seq("band", "bh"), "left_semi")
        .select(col("doc_id")).distinct()
      case None => spark.emptyDataFrame.withColumn("doc_id", lit(0L)).limit(0)
    }
    val fresh = batch.join(collided, Seq("doc_id"), "left_anti")
    // within-batch: verified pairs + component keep-min, same policy as the batch engine
    val intraDrop = Dedup.connectedComponents(
        Dedup.minhashPairs(fresh, threshold).select(col("a_id"), col("b_id")))
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id"))
    // MATERIALIZE the decision before the index grows: the admitted plan reads the index
    // lazily, so without pinning, a caller evaluating the returned frame AFTER the append
    // would see the batch's own bands and drop every doc as a collision with itself.
    val admitted = fresh.join(intraDrop, Seq("doc_id"), "left_anti").localCheckpoint()
    if (updateIndex) {
      bands.join(admitted.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .write.mode("append").parquet(indexDir)
    }
    g.unpersist()
    bands.unpersist()
    admitted
  }

  /**
   * Compact the append-only band index: per-batch appends accumulate one small file per
   * batch per partition (the classic streaming small-files problem — at one batch/minute
   * a day leaves ~1.4k file groups, and file-listing cost starts to dominate the
   * semi-join's scan). Rewrites the index into `targetFiles` files sorted by (band, bh)
   * so row-group min/max stats line up with the probe keys. Not atomic with concurrent
   * writers — run it from the maintenance path while the ingest query is stopped (the
   * same discipline every file-format compaction without a table format requires).
   */
  def compactIndex(spark: SparkSession, indexDir: String, targetFiles: Int = 8): Unit = {
    val tmp = indexDir + ".compact"
    spark.read.parquet(indexDir)
      .repartition(targetFiles, col("band"))
      .sortWithinPartitions(col("band"), col("bh"))
      .write.mode("overwrite").parquet(tmp)
    val dir = new java.io.File(indexDir)
    val bak = new java.io.File(indexDir + ".old")
    require(dir.renameTo(bak), s"could not move $indexDir aside")
    require(new java.io.File(tmp).renameTo(dir), s"could not promote $tmp")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(bak)
  }

  /** Wire the gate onto a stream: admitted rows land in `outDir`, the band index grows in
    * `indexDir`, exactly one gate pass per micro-batch. */
  def dedupIngest(docsStream: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String, threshold: Double = 0.8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admitBatch(batch, indexDir, threshold)
          .write.mode("append").parquet(outDir)
      }
      .start()
}
