package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableIO

/**
 * Source/sink round-trips — graft's analog of the reference's arrow-data-source
 * (parquet/orc/csv/json read path) and DataWritingCommand coverage.
 */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def roundtrip(format: String): Unit = {
    val dir = Files.createTempDirectory(s"graft_$format").toString
    val src = TableIO.nation(spark, sf)
    src.write.mode("overwrite").format(format).option("header", "true").save(dir)
    val back = format match {
      case "csv" => spark.read.format(format).option("header", "true")
        .option("inferSchema", "true").load(dir)
      case _ => spark.read.format(format).load(dir)
    }
    assert(back.count() == src.count(), s"$format row count")
    // text formats infer wider integer types; compare through a normalizing cast
    val a = src.selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val b = back.selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(a.toSeq == b.toSeq, s"$format content")
  }

  test("parquet round-trips under each supported compression codec") {
    for (codec <- Seq("snappy", "zstd", "gzip", "lz4", "none")) {
      val dir = Files.createTempDirectory(s"graft_codec_$codec").toString
      val src = TableIO.supplier(spark, sf)
      src.write.mode("overwrite").option("compression", codec).parquet(dir)
      val back = spark.read.parquet(dir)
      assert(back.count() == src.count(), s"codec $codec row count")
      assert(back.exceptAll(src).isEmpty, s"codec $codec content")
    }
  }

  test("parquet write/read round-trip")(roundtrip("parquet"))
  test("orc write/read round-trip")(roundtrip("orc"))
  test("json write/read round-trip")(roundtrip("json"))
  test("csv write/read round-trip")(roundtrip("csv"))

  test("all ten driver tables load with expected columns") {
    val expected = Map(
      "region" -> 2, "nation" -> 3, "customer" -> 5, "supplier" -> 4, "part" -> 6,
      "orders" -> 6, "lineitem" -> 11, "events" -> 6, "documents" -> 5, "embeddings" -> 3)
    expected.foreach { case (name, nCols) =>
      val df = TableIO.table(spark, sf, name)
      assert(df.columns.length == nCols, s"$name should have $nCols columns")
      assert(df.count() > 0, s"$name should be non-empty")
    }
  }

  test("arrow-ipc write/read round-trip vs the parquet twin (the namesake source)") {
    val dir = Files.createTempDirectory("graft_arrow").toString
    // embeddings exercises array<float>; documents exercises strings + ints; multiple
    // partitions exercise the one-file-per-task layout
    val src = TableIO.embeddings(spark, sf).repartition(3)
    org.apache.spark.sql.graft.ArrowIpc.write(src, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrow"))
    assert(files.length == 3, s"one .arrow file per partition: ${files.length}")
    val back = TableIO.readArrow(spark, dir)
    assert(back.schema == src.schema,
      s"footer schema must map back losslessly: ${back.schema} vs ${src.schema}")
    assert(back.count() == src.count())
    // content equality via the established vec_id -> rounded-embedding digest
    def digest(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("vec_id", "round(aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + x), 4) AS s")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(digest(back) == digest(src), "arrow round-trip must preserve values")

    // read parallelizes per file, not per byte-range: 3 files -> 3 partitions
    assert(back.rdd.getNumPartitions == 3)

    // string/int table twin: exact row equality against the parquet original
    val docDir = Files.createTempDirectory("graft_arrow_docs").toString
    val docs = TableIO.documents(spark, sf).select("doc_id", "text", "source", "n_chars")
    org.apache.spark.sql.graft.ArrowIpc.write(docs.repartition(2), docDir)
    val docsBack = TableIO.readArrow(spark, docDir)
    assert(docsBack.exceptAll(docs).isEmpty && docs.exceptAll(docsBack).isEmpty,
      "documents arrow round-trip must be exact")
  }

  test("arrow DSv2 scan: column pruning reaches the source and batches deliver columnar") {
    val dir = Files.createTempDirectory("graft_arrow_v2").toString
    val docs = TableIO.documents(spark, sf).select("doc_id", "text", "source", "n_chars")
    org.apache.spark.sql.graft.ArrowIpc.write(docs.repartition(2), dir)
    val scan = TableIO.readArrow(spark, dir)

    // pruning: a 1-of-4-column projection must reach the scan (SupportsPushDownRequiredColumns)
    val pruned = scan.select("n_chars")
    pruned.collect()
    val leaves = pruned.queryExecution.executedPlan.collectLeaves()
    val scanOutput = leaves.head.output.map(_.name)
    assert(scanOutput == Seq("n_chars"),
      s"scan must read only the projected column, got $scanOutput")

    // columnar delivery: Spark inserts ColumnarToRow above a columnar-capable scan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), s"scan must deliver ColumnarBatches:\n$plan")

    // zero-column scan (count(*)) still carries batch row counts
    assert(scan.count() === docs.count())

    // values survive the columnar path
    val sums = scan.agg(org.apache.spark.sql.functions.sum("n_chars")).head().getLong(0)
    val expect = docs.agg(org.apache.spark.sql.functions.sum("n_chars")).head().getLong(0)
    assert(sums === expect)
  }

  test("arrow DSv2 filter pushdown: predicate reaches the scan and row-free batches never deliver") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_arrow_pd").toString
    // Per-query, race-free counters: the scan's DSv2 custom metrics on the executed
    // plan's BatchScanExec (accumulators settle with task completion, before collect
    // returns) — a JVM-global counter would race any concurrently-running suite.
    def scanMetric(df: org.apache.spark.sql.DataFrame, name: String): Long =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.flatMap(_.metrics.get(name)).map(_.value).sum
    // One file, many small batches, CLUSTERED on doc_id — the layout where batch-granular
    // skipping pays (the same reason parquet writers sort within row groups).
    val docs = TableIO.documents(spark, sf).select("doc_id", "text", "source", "n_chars")
    org.apache.spark.sql.graft.ArrowIpc.write(
      docs.coalesce(1).sortWithinPartitions("doc_id"), dir, batchRows = 64)
    val totalBatches = (docs.count() + 63) / 64

    val scan = TableIO.readArrow(spark, dir)
    val hi = docs.agg(org.apache.spark.sql.functions.max("doc_id")).head().getLong(0)

    val q = scan.filter(col("doc_id") >= hi - 3).select("doc_id", "n_chars")
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

    // 1. the executed plan's scan reports the predicate as pushed (SupportsPushDownFilters)
    val leaf = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(leaf.contains("PushedFilters: [") && leaf.contains("doc_id"),
      s"pushed filter must reach the scan:\n$leaf")

    // 2. row parity with the parquet twin — skipping is an optimization, never semantics
    val want = docs.filter(col("doc_id") >= hi - 3).select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == want.toSeq, "filtered scan must match the parquet twin")
    assert(got.nonEmpty, "the probe predicate must select something")

    // 3. measured batch reduction: the selective predicate over the clustered file
    //    must deliver a small suffix of the batches and skip the rest
    val read = scanMetric(q, "arrowBatchesRead"); val skipped = scanMetric(q, "arrowBatchesSkipped")
    assert(read + skipped == totalBatches, s"every batch is decided: $read+$skipped != $totalBatches")
    assert(skipped > 0 && read < totalBatches,
      s"selective predicate must skip batches: read=$read skipped=$skipped of $totalBatches")
    assert(read <= 2, s"doc_id-clustered file: only the tail batch(es) can match, read=$read")

    // 4. a non-translatable predicate pushes nothing and still answers exactly
    val fallbackQ = scan.filter("length(text) > 0 AND doc_id % 97 = 0")
    // collect() (not count()) so the metrics are read off the SAME QueryExecution
    val fallback = fallbackQ.collect().length.toLong
    val fallbackWant = docs.filter("length(text) > 0 AND doc_id % 97 = 0").count()
    assert(fallback == fallbackWant, "residual-only evaluation stays exact")
    assert(scanMetric(fallbackQ, "arrowBatchesSkipped") == 0,
      "nothing pushed => nothing skipped (Spark's Filter does all the work)")
  }

  test("schema evolution: mergeSchema unifies widened parquet batches, pruning intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString
    // batch 1: (id, a); batch 2 adds column b — the additive evolution a long-lived
    // corpus table accumulates (the reference's arrow-data-source reads such tables)
    Seq((1L, "x"), (2L, "y")).toDF("id", "a").write.parquet(s"$dir/p=1")
    Seq((3L, "z", 30L), (4L, "w", 40L)).toDF("id", "a", "b").write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("a", "b", "id", "p"))
    val rows = merged.select("id", "b").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, -1L), (2L, -1L), (3L, 30L), (4L, 40L)),
      "pre-evolution rows surface NULL for the new column")
    // column pruning still reaches the scan on the evolved schema
    val plan = merged.select("b").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<b:bigint>"),
      s"projection must prune to the evolved column only:\n$plan")
  }

  test("events timestamps normalize to usable timestamp type") {
    val df = TableIO.events(spark, sf)
    assert(df.schema("ts").dataType.typeName == "timestamp")
    val minYear = df.selectExpr("min(year(ts))").collect().head.getInt(0)
    assert(minYear == 2024)
  }
}
