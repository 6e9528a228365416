package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedTable

class VersionedTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def tmp(tag: String) =
    Files.createTempDirectory(tag).toFile.getAbsolutePath + "/t"

  test("append commits accumulate; every historical version stays readable") {
    import spark.implicits._
    val dir = tmp("vt1")
    val v0 = VersionedTable.commitAppend((1 to 10).toDF("id"), dir)
    val v1 = VersionedTable.commitAppend((11 to 15).toDF("id"), dir)
    assert(v0 == 0 && v1 == 1)
    assert(VersionedTable.readVersion(spark, dir, 0)
      .collect().map(_.getInt(0)).sorted.toSeq == (1 to 10))
    assert(VersionedTable.readVersion(spark, dir, 1)
      .collect().map(_.getInt(0)).sorted.toSeq == (1 to 15))
    assert(VersionedTable.readLatest(spark, dir).count() == 15)
  }

  test("overwrite replaces logically but time travel still sees the old data") {
    import spark.implicits._
    val dir = tmp("vt2")
    VersionedTable.commitAppend((1 to 100).toDF("id"), dir)
    val v1 = VersionedTable.commitOverwrite(Seq(999).toDF("id"), dir)
    assert(v1 == 1)
    assert(VersionedTable.readLatest(spark, dir).collect().map(_.getInt(0)).toSeq == Seq(999))
    // time travel to pre-overwrite state is byte-complete
    assert(VersionedTable.readVersion(spark, dir, 0).count() == 100)
    // and history reports both
    val h = VersionedTable.history(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(h.toSeq == Seq((0L, 100L), (1L, 1L)))
  }

  test("reading a missing version fails fast; fresh path has no versions") {
    import spark.implicits._
    val dir = tmp("vt3")
    assert(VersionedTable.versions(spark, dir).isEmpty)
    assert(VersionedTable.latestVersion(spark, dir) == -1L)
    VersionedTable.commitAppend(Seq(1).toDF("id"), dir)
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, dir, 7)
    }
  }

  test("commitBatch is exactly-once under foreachBatch-style retry") {
    import spark.implicits._
    val dir = tmp("vt5")
    val v0 = VersionedTable.commitBatch((1 to 5).toDF("id"), dir, batchId = 0L)
    val v0again = VersionedTable.commitBatch((1 to 5).toDF("id"), dir, batchId = 0L)
    assert(v0 == 0L && v0again == 0L, "retried batch must not re-commit")
    assert(VersionedTable.readLatest(spark, dir).count() == 5)
    val v1 = VersionedTable.commitBatch((6 to 8).toDF("id"), dir, batchId = 1L)
    assert(v1 == 1L && VersionedTable.readLatest(spark, dir).count() == 8)
  }

  test("foreachBatch stream commits one version per micro-batch, exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("vt-stream").toString
    val dir = s"$root/tbl"
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val q = stream.toDF().toDF("id").writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        VersionedTable.commitBatch(batch, dir, batchId): Unit
      }
      .start()
    try {
      stream.addData(1, 2, 3); q.processAllAvailable()
      stream.addData(4, 5); q.processAllAvailable()
      assert(VersionedTable.versions(spark, dir) == Seq(0L, 1L))
      assert(VersionedTable.readLatest(spark, dir).count() == 5)
      assert(VersionedTable.readVersion(spark, dir, 0).count() == 3)
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("interrupted commit (data written, manifest missing) leaves prior version intact") {
    import spark.implicits._
    val dir = tmp("vt4")
    VersionedTable.commitAppend((1 to 10).toDF("id"), dir)
    // simulate a crash between data write and manifest rename: orphan nonce data dir
    // AND a stranded temp manifest — exactly the state a kill -9 mid-commit leaves
    (11 to 20).toDF("id").write.parquet(s"$dir/data/c-deadbeef")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/_versions"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_versions/.tmp-deadbeef"), "half-written")
    assert(VersionedTable.latestVersion(spark, dir) == 0L)
    assert(VersionedTable.readLatest(spark, dir).count() == 10) // orphans invisible
    // and the next real commit proceeds normally — debris can never wedge the table
    val v = VersionedTable.commitAppend((21 to 25).toDF("id"), dir)
    assert(v == 1 && VersionedTable.readLatest(spark, dir).count() == 15)
    // a follow-up commit after the recovery commit also works (regression: the old
    // layout wedged every commit after a crash at commit-(latest+1))
    val v2 = VersionedTable.commitAppend((26 to 30).toDF("id"), dir)
    assert(v2 == 2 && VersionedTable.readLatest(spark, dir).count() == 20)
  }

  test("concurrent writers: every commit wins a distinct version, no rows lost") {
    import spark.implicits._
    val dir = tmp("vt6")
    val ranges = Seq(1 to 10, 11 to 20, 21 to 30, 31 to 40)
    val threads = ranges.map { r =>
      new Thread(() => { VersionedTable.commitAppend(r.toDF("id"), dir): Unit })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // four racers, four distinct versions, each a superset of the one before
    assert(VersionedTable.versions(spark, dir) == Seq(0L, 1L, 2L, 3L))
    assert(VersionedTable.readLatest(spark, dir)
      .collect().map(_.getInt(0)).sorted.toSeq == (1 to 40))
    val h = VersionedTable.history(spark, dir).collect().map(_.getLong(2)).toSeq
    assert(h == Seq(10L, 20L, 30L, 40L), "each version carries all prior rows")
  }

  test("CAS stress: 12 racers all aiming at the SAME version number, none lost") {
    import spark.implicits._
    val dir = tmp("vt7")
    VersionedTable.commitAppend(Seq(0).toDF("id"), dir) // v0 exists for all racers
    // Pre-stage nothing; release all racers at once so most of them compute the same
    // target version and collide on the claim — the local-FS overwrite-rename hazard.
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 12).map { i =>
      new Thread(() => {
        gate.await()
        VersionedTable.commitAppend(Seq(i * 100).toDF("id"), dir): Unit
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(VersionedTable.versions(spark, dir) == (0L to 12L),
      "12 racers => exactly versions 1..12, no gaps, no lost commits")
    assert(VersionedTable.readLatest(spark, dir).collect().map(_.getInt(0)).sorted.toSeq
      == (0 +: (1 to 12).map(_ * 100)).sorted, "every racer's rows survive")
  }
}
