package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ResultCache
import graft.sources.TableIO

class ResultCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def tmp(tag: String) =
    Files.createTempDirectory(tag).toFile.getAbsolutePath

  test("second run is a cache hit with identical rows, served from the cache dir") {
    val cache = tmp("rc1")
    val q = TableIO.lineitem(spark, sf)
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
    assert(!ResultCache.isCached(q, cache))
    val first = ResultCache.run(q, cache).collect().map(_.toSeq).toSet
    assert(ResultCache.isCached(q, cache))
    val again = ResultCache.run(q, cache)
    assert(again.collect().map(_.toSeq).toSet == first)
    assert(again.inputFiles.forall(_.contains(cache)), "hit must read the cache, not the table")
  }

  test("semantically identical plans built twice share one cache entry") {
    val cache = tmp("rc2")
    def build() = TableIO.orders(spark, sf)
      .filter(col("o_totalprice") > 1000.0)
      .groupBy(col("o_orderstatus")).count()
    assert(ResultCache.fingerprint(build()) == ResultCache.fingerprint(build()))
    ResultCache.run(build(), cache)
    assert(ResultCache.isCached(build(), cache))
    // a DIFFERENT query must not collide
    val other = TableIO.orders(spark, sf)
      .filter(col("o_totalprice") > 2000.0)
      .groupBy(col("o_orderstatus")).count()
    assert(ResultCache.fingerprint(other) != ResultCache.fingerprint(build()))
    assert(!ResultCache.isCached(other, cache))
  }

  test("input data change rotates the key; the stale answer is unreachable") {
    import spark.implicits._
    val cache = tmp("rc3")
    val data = tmp("rc3d") + "/t"
    (1 to 100).toDF("id").write.parquet(data)
    def q() = spark.read.parquet(data).agg(sum(col("id")).as("s"))
    val v1 = ResultCache.run(q(), cache).head().getLong(0)
    assert(v1 == 5050L)
    Thread.sleep(1100) // ensure a distinct modification time on coarse filesystems
    (1 to 200).toDF("id").write.mode("overwrite").parquet(data)
    assert(!ResultCache.isCached(q(), cache), "changed input must miss")
    val v2 = ResultCache.run(q(), cache).head().getLong(0)
    assert(v2 == 20100L)
  }
}
