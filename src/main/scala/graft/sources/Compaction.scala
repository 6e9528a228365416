package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Small-file compaction for plain-parquet tables — the table-maintenance chore every
 * long-lived ingest (streaming sinks, per-batch upserts, many-task writes) eventually
 * needs: thousands of KB-scale files turn scan planning and shuffle-read into
 * per-file-overhead benchmarks. Delta/Iceberg ship OPTIMIZE; this is the same
 * operation self-hosted.
 *
 * Planning is METADATA-only (one driver file listing — the same scale class as
 * Spark's own FileIndex): greedy first-fit-decreasing bin packing of files below
 * `smallBytes` into bins of at most `targetBytes`. Execution rewrites each bin with
 * one task (`coalesce(1)` over just that bin's files) into a staging directory, then
 * commits by move + delete — files at or above `smallBytes` are never touched, and a
 * second run over compacted output is a no-op. Rewrite work is proportional to the
 * BYTES IN SMALL FILES, never to table size.
 */
object Compaction {

  /** One planned rewrite: the files that fold into a single output file. */
  final case class Bin(id: Int, files: Seq[String], bytes: Long)

  /** Greedy first-fit-decreasing packing of (file, size) into bins <= targetBytes;
    * only bins that actually merge (>= 2 files) are returned. */
  private[graft] def packBins(files: Seq[(String, Long)], targetBytes: Long): Seq[Bin] = {
    val bins = scala.collection.mutable.Buffer.empty[(scala.collection.mutable.Buffer[(String, Long)], Long)]
    files.sortBy { case (f, sz) => (-sz, f) }.foreach { case (f, sz) =>
      bins.indexWhere(_._2 + sz <= targetBytes) match {
        case -1 => bins += ((scala.collection.mutable.Buffer((f, sz)), sz))
        case i  => val (b, tot) = bins(i); b += ((f, sz)); bins(i) = (b, tot + sz)
      }
    }
    bins.toSeq.zipWithIndex.collect {
      case ((fs, tot), i) if fs.size >= 2 => Bin(i, fs.map(_._1).toSeq.sorted, tot)
    }
  }

  /** The compaction plan for `path`: bins of small (< smallBytes) parquet files that
    * would merge into <= targetBytes outputs. Pure metadata — nothing is rewritten. */
  def plan(spark: SparkSession, path: String, targetBytes: Long,
      smallBytes: Long = Long.MaxValue): Seq[Bin] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val files = fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath.toString, st.getLen))
      .filter(_._2 < smallBytes)
    packBins(files, targetBytes)
  }

  /**
   * Execute the plan: each bin rewrites to one file under `path`. Returns
   * (bins_compacted, files_removed, files_written, bytes_rewritten).
   */
  def compact(spark: SparkSession, path: String, targetBytes: Long,
      smallBytes: Long = Long.MaxValue): (Int, Int, Int, Long) = {
    val bins = plan(spark, path, targetBytes, smallBytes)
    if (bins.isEmpty) return (0, 0, 0, 0L)
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(root, s"_compact_tmp")
    fs.delete(staging, true)
    var written = 0
    bins.foreach { bin =>
      val out = new Path(staging, s"bin-${bin.id}")
      spark.read.parquet(bin.files: _*).coalesce(1)
        .write.mode("overwrite").parquet(out.toString)
      fs.listStatus(out).filter(_.getPath.getName.endsWith(".parquet")).foreach { st =>
        fs.rename(st.getPath, new Path(root, s"compacted-${bin.id}-${st.getPath.getName}"))
        written += 1
      }
    }
    // originals removed only after every bin's rewrite landed
    val removed = bins.flatMap(_.files)
    removed.foreach(f => fs.delete(new Path(f), false))
    fs.delete(staging, true)
    (bins.size, removed.size, written, bins.map(_.bytes).sum)
  }
}
