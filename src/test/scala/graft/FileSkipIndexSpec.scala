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

  test("bloom index: point lookup on an unclustered key prunes files, exact results") {
    val dir = Files.createTempDirectory("bloomskip").toFile.getAbsolutePath + "/docs"
    val docs = TableIO.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("h"), col("source"))
    FileSkipIndex.writeWithBloomManifest(docs, dir, "h", numFiles = 8)

    // a present key: its rows live in few files; bloom must find all of them
    val probe = docs.select(col("h")).head().getString(0)
    val got = FileSkipIndex.readPointLookup(spark, dir, "h", lit(probe))
    val want = spark.read.parquet(dir).filter(col("h") === probe)
    assert(got.count() == want.count() && got.count() >= 1)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    val touched = FileSkipIndex.bloomFilesTouched(spark, dir, "h", lit(probe))
    assert(touched >= 1 && touched < 8,
      s"bloom should prune most of 8 files for a single key, touched=$touched")
    assert(got.inputFiles.length.toLong == touched)
  }

  test("bloom index: absent keys have no false negatives and high prune rates") {
    val dir = Files.createTempDirectory("bloomskip2").toFile.getAbsolutePath + "/t"
    import spark.implicits._
    val df = (1 to 4000).map(i => (i.toLong, s"key_$i")).toDF("id", "k")
    FileSkipIndex.writeWithBloomManifest(df, dir, "k", numFiles = 8)
    // 50 absent probes: every lookup returns empty (no false negatives on presence
    // side by construction) and the mean candidate count stays near fpp x files
    val touched = (1 to 50).map { i =>
      val v = lit(s"missing_$i")
      assert(FileSkipIndex.readPointLookup(spark, dir, "k", v).count() == 0)
      FileSkipIndex.bloomFilesTouched(spark, dir, "k", v)
    }
    // n/file = 500, m = 8192, k = 5 -> fpp ~ 2e-3; allow generous slack
    assert(touched.sum.toDouble / touched.length < 1.0,
      s"mean bloom candidates for absent keys too high: ${touched.sum.toDouble / 50}")
    // and present keys are always found
    (1 to 20).foreach { i =>
      assert(FileSkipIndex.readPointLookup(spark, dir, "k", lit(s"key_${i * 97}"))
        .count() == 1)
    }
  }

  test("bloom index: probe literal narrower than the stored key type still matches") {
    // regression: xxhash64 is type-sensitive — an IntegerType lit(42) probed against
    // a BIGINT key hashed differently than the manifest and silently returned 0 rows
    val dir = Files.createTempDirectory("bloomskip3").toFile.getAbsolutePath + "/t"
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toLong, s"v$i")).toDF("id", "v") // id: BIGINT
    FileSkipIndex.writeWithBloomManifest(df, dir, "id", numFiles = 8)
    val got = FileSkipIndex.readPointLookup(spark, dir, "id", lit(42)) // INT literal
    assert(got.count() == 1, "int probe against bigint key must still find the row")
    assert(got.head().getString(1) == "v42")
  }
}
