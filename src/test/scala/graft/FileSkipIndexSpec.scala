package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{FileSkipIndex, TableIO}

class FileSkipIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("manifest skip: narrow range touches few files yet returns exact results") {
    val dir = Files.createTempDirectory("fileskip").toFile.getAbsolutePath + "/lineitem"
    val li = TableIO.lineitem(spark, sf)
    FileSkipIndex.writeWithManifest(li, dir, Seq("l_orderkey"), numFiles = 10)

    val m = spark.read.parquet(s"$dir/_manifest")
    assert(m.count() == 10, "one manifest row per data file")
    assert(m.columns.toSet ==
      Set("file", "n_rows", "l_orderkey_min", "l_orderkey_max"))
    val totalRows = m.agg(sum("n_rows")).collect()(0).getLong(0)
    assert(totalRows == li.count(), "manifest row counts cover the table")

    val (lo, hi) = (lit(100L), lit(200L))
    val touched = FileSkipIndex.filesTouched(spark, dir, "l_orderkey", lo, hi)
    assert(touched < 10, s"narrow range must skip files, touched=$touched")
    assert(touched >= 1)

    val got = FileSkipIndex.readPruned(spark, dir, "l_orderkey", lo, hi)
    // pruned scan's actual input files match the manifest's claim
    assert(got.inputFiles.length.toLong == touched)
    val want = li.filter(col("l_orderkey").between(100L, 200L))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("out-of-range scan touches zero files and returns an empty, schema-correct frame") {
    val dir = Files.createTempDirectory("fileskip0").toFile.getAbsolutePath + "/t"
    val li = TableIO.lineitem(spark, sf).limit(1000)
    FileSkipIndex.writeWithManifest(li, dir, Seq("l_orderkey"), numFiles = 4)
    val got = FileSkipIndex.readPruned(spark, dir, "l_orderkey",
      lit(-5000L), lit(-4000L))
    assert(got.count() == 0)
    assert(got.schema == spark.read.parquet(dir).schema)
    assert(FileSkipIndex.filesTouched(spark, dir, "l_orderkey",
      lit(-5000L), lit(-4000L)) == 0)
  }
}
