package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/**
 * Data-layout management: cluster a table on its dominant filter/join columns before
 * writing, so parquet row-group min/max statistics become selective.
 *
 * At 100 TB this is the difference between "every query scans everything" and "a date- or
 * key-bounded query reads only the row groups that can match": `repartitionByRange` puts
 * disjoint value ranges in disjoint files, `sortWithinPartitions` orders rows inside each
 * file, and the parquet writer then emits row groups whose min/max spans are narrow.
 * Spark's scan applies pushed predicates against those spans and skips whole row groups
 * (and, via the parquet column index, whole pages). Sorted runs also compress better
 * (RLE/dictionary/delta), shrinking bytes scanned even for full reads.
 *
 * The reference reaches the same goal by partition-pruning its Arrow file scans
 * (gazelle_plugin: arrow-data-source/.../ArrowFileSourceScanExec); graft additionally
 * manages the physical order INSIDE files, which is what makes min/max skipping work on
 * non-partition columns. LayoutSpec proves the skip with scan metrics: the same predicate
 * reads ~1/N of the rows from a clustered layout vs ALL rows from a random layout.
 */
object LayoutWriter {

  /**
   * Write `df` as parquet clustered on `clusterCols`: range-partitioned across files,
   * sorted within each file. `targetFiles` <= 0 means the session's default parallelism.
   * Hive-style `partitionBy` directories suit low-cardinality columns (they prune at the
   * planner); range-clustering suits high-cardinality columns (dates, keys) where a
   * directory per value would explode the namespace.
   *
   * Measured caveat (Spark 4.1 + parquet-mr): predicates on TIMESTAMP_NTZ columns are
   * pushed to the scan but do NOT prune row groups — cluster on a DATE cast or an epoch
   * numeric instead (LayoutSpec pins both the working DATE path and this caveat).
   */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String],
                     targetFiles: Int = 0): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must not be empty")
    val n = if (targetFiles > 0) targetFiles
            else df.sparkSession.sparkContext.defaultParallelism
    val cols: Seq[Column] = clusterCols.map(col)
    df.repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Hive-partitioned + in-file clustered: directories prune on `partitionCol` at plan
    * time, row groups skip on `clusterCols` at read time — the two layers compose. */
  def writePartitionedClustered(df: DataFrame, path: String, partitionCol: String,
                                clusterCols: Seq[String], targetFiles: Int = 0): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must not be empty")
    val n = if (targetFiles > 0) targetFiles
            else df.sparkSession.sparkContext.defaultParallelism
    val cols: Seq[Column] = (partitionCol +: clusterCols).map(col)
    df.repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").partitionBy(partitionCol).parquet(path)
  }
}
