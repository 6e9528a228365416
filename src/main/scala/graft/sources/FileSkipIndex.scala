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

  // ------------------------------------------------------------- bloom index

  /**
   * Per-file Bloom-filter manifest for POINT lookups on a high-cardinality column —
   * the Delta bloom-index analog, and the complement of min/max skipping: when the
   * table is NOT clustered on the lookup key, every file's [min, max] spans the whole
   * domain and range pruning keeps everything; a per-file bloom still answers
   * "this key cannot be in this file" for all but ~fpp of the misses.
   *
   * Construction is fully relational: each row explodes into its `BloomK` bit
   * positions (xxhash64 seeded per probe), positions pack into 64-bit words, and ONE
   * map-side-combined groupBy(file, word) + bit_or builds the per-file masks — no
   * driver work proportional to rows, manifest size = files x set-words (bounded by
   * `BloomBits`/64 longs/file). Lookups read the KB-scale manifest, evaluate the k
   * probes driver-side, and hand Spark only the candidate files.
   */
  val BloomBits = 8192 // m: bits per file filter (128 longs dense worst-case)
  val BloomK = 5       // probes per key; fpp ~ (1 - e^{-kn/m})^k

  private def bloomManifestPath(path: String) = s"$path/_bloom_manifest"

  private def bitPositions(c: Column): Seq[Column] =
    (1 to BloomK).map(i => pmod(xxhash64(lit(i), c), lit(BloomBits)).cast("int"))

  /** One (file, words: map<int,bigint>) row per data file: the file's bloom mask. */
  def computeBloomManifest(spark: SparkSession, path: String, keyCol: String): DataFrame =
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file"),
        explode(array(bitPositions(col(keyCol)): _*)).as("pos"))
      .select(col("file"), (col("pos") / 64).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), pos % 64)").as("bit"))
      .groupBy(col("file"), col("word"))
      .agg(bit_or(col("bit")).as("mask"))
      .groupBy(col("file"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("mask")))).as("words"))

  /** Write `df` (layout-agnostic — bloom pruning needs no clustering) plus the
    * per-file bloom manifest on `keyCol`. */
  def writeWithBloomManifest(df: DataFrame, path: String, keyCol: String,
      numFiles: Int): Unit = {
    df.repartition(numFiles).write.mode("overwrite").parquet(path)
    computeBloomManifest(df.sparkSession, path, keyCol)
      .coalesce(1).write.mode("overwrite").parquet(bloomManifestPath(path))
  }

  /** Files whose bloom mask contains every probe bit of `value` (driver-side over the
    * KB-scale manifest; the same metadata step as any FileIndex). The probe is CAST to
    * the stored key column's type before hashing: xxhash64 is type-sensitive
    * (IntegerType and LongType hash differently), so an uncast lit(42) probed against a
    * BIGINT key would miss every file and silently return zero rows — the same implicit
    * coercion the final `col(keyCol) === value` filter performs must happen here. */
  private def bloomCandidates(spark: SparkSession, path: String, keyCol: String,
      value: Column): Array[String] = {
    import spark.implicits._
    val keyType = spark.read.parquet(path).schema(keyCol).dataType
    // evaluate the k probe positions once, via the engine's own hash expression
    val pos = spark.range(1).select(bitPositions(value.cast(keyType)): _*).head()
    val probes = (0 until BloomK).map(i => pos.getInt(i))
    spark.read.parquet(bloomManifestPath(path))
      .as[(String, Map[Int, Long])]
      .collect()
      .collect { case (f, words) if probes.forall(p =>
        (words.getOrElse(p / 64, 0L) & (1L << (p % 64))) != 0L) => f }
  }

  /**
   * Point lookup `keyCol = value` reading only bloom-candidate files. Result is
   * exactly a full scan + filter (bloom has no false negatives); files touched is
   * ~1 + fpp x files for keys present in one file, ~fpp x files for absent keys.
   */
  def readPointLookup(spark: SparkSession, path: String, keyCol: String, value: Column)
      : DataFrame = {
    val keep = bloomCandidates(spark, path, keyCol, value)
    val base =
      if (keep.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(keep.toIndexedSeq: _*)
    base.filter(col(keyCol) === value)
  }

  /** Bloom-candidate file count for a probe value (for plan audits/specs). */
  def bloomFilesTouched(spark: SparkSession, path: String, keyCol: String,
      value: Column): Long =
    bloomCandidates(spark, path, keyCol, value).length.toLong
}
