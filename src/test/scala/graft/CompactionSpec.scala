package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compaction

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("packBins first-fit-decreasing respects the target and only merges") {
    val files = Seq(("a", 60L), ("b", 30L), ("c", 30L), ("d", 25L), ("e", 10L), ("f", 100L))
    val bins = Compaction.packBins(files, targetBytes = 100L)
    // every bin fits the budget and holds >= 2 files
    bins.foreach { b =>
      assert(b.bytes <= 100L && b.files.size >= 2, s"bad bin $b")
    }
    // the 100-byte file cannot merge with anything -> not in any bin
    assert(!bins.exists(_.files.contains("f")))
    // all small files are covered exactly once
    val covered = bins.flatMap(_.files)
    assert(covered.distinct.length == covered.length)
    assert(covered.toSet.subsetOf(Set("a", "b", "c", "d", "e")))
    // deterministic on repeat
    assert(bins == Compaction.packBins(files, 100L))
  }

  test("compact merges small files, preserves data exactly, and is idempotent") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact").toFile.getAbsolutePath + "/t"
    (1L to 2000L).map(i => (i, s"row$i")).toDF("id", "s")
      .repartition(20).write.parquet(dir)
    val before = spark.read.parquet(dir)
    val beforeRows = before.collect().map(_.toSeq).toSet
    val beforeFiles = before.inputFiles.length
    assert(beforeFiles == 20)

    val (bins, removed, written, _) =
      Compaction.compact(spark, dir, targetBytes = 512L * 1024)
    assert(bins >= 1 && removed > written, s"bins=$bins removed=$removed written=$written")

    val after = spark.read.parquet(dir)
    assert(after.inputFiles.length == beforeFiles - removed + written)
    assert(after.inputFiles.length < beforeFiles, "file count must shrink")
    assert(after.collect().map(_.toSeq).toSet == beforeRows, "data preserved exactly")

    // second run: everything already compacted into >= target-ish files, or single
    // leftovers — must be a no-op on the files it cannot improve
    val plan2 = Compaction.plan(spark, dir, targetBytes = 512L * 1024)
    val (bins2, _, _, _) = Compaction.compact(spark, dir, targetBytes = 512L * 1024)
    assert(plan2.isEmpty == (bins2 == 0))
    val finalRows = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    assert(finalRows == beforeRows)
  }

  test("smallBytes threshold leaves large files untouched") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact2").toFile.getAbsolutePath + "/t"
    (1L to 1000L).map(i => (i, i * 2)).toDF("id", "v")
      .repartition(8).write.parquet(dir)
    val sizes = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen)
    }
    // set smallBytes below every file size: nothing qualifies, compact is a no-op
    val (bins, removed, written, bytes) =
      Compaction.compact(spark, dir, targetBytes = 10L * 1024 * 1024,
        smallBytes = sizes.min)
    assert((bins, removed, written, bytes) == ((0, 0, 0, 0L)))
    assert(spark.read.parquet(dir).inputFiles.length == 8)
  }
}
