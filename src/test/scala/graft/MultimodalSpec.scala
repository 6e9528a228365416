package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("media table exposes binary payload + typed metadata") {
    val df = Multimodal.mediaTable(spark, sf)
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    assert(df.count() == 500)
  }

  test("partition-local decode is deterministic and complete") {
    val a = Multimodal.decodeFeatures(spark, sf).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(spark, sf).collect().sortBy(_.doc_id)
    assert(a.length == 500)
    assert(a.toSeq == b.toSeq, "decode must be deterministic")
    a.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.brightness >= 0.0 && f.brightness <= 1.0)
      assert(f.width >= 16 && f.height >= 16 && f.n_frames >= 1)
    }
  }

  test("decode pipeline adds no shuffle (stays in the scan stage)") {
    val ds = Multimodal.decodeFeatures(spark, sf)
    val plan = ds.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode should be shuffle-free:\n$plan")
  }
}
