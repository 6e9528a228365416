package graft

import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

/**
 * End-to-end Arrow/Python UDF bridge demonstration — the analog of the reference's
 * columnar Python runner (gazelle_plugin: native-sql-engine/core/src/main/scala/com/intel/
 * oap/execution/python/ColumnarArrowPythonRunner.scala:1). A real pandas_udf runs over the
 * documents table in a pyspark session (same Spark 4.1.2), the script asserts
 * ArrowEvalPython is the executed operator (i.e. data crossed the JVM<->Python boundary as
 * Arrow batches, multiple batches forced via maxRecordsPerBatch), and this spec then
 * compares the Python-computed token counts row-for-row against the JVM expression path
 * (TextAnalysis.textTokens) — proving the bridge round-trips both schema and values.
 *
 * graft's production operators deliberately do NOT depend on Python (typed JVM kernels
 * beat the serialization boundary when the logic is expressible on the JVM); this spec
 * exists to prove the bridge WORKS for workloads that genuinely need Python libraries
 * (the multimodal decode path). Cancels, not fails, where pyspark is unavailable.
 */
class PythonBridgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private val script = """
import sys, re
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import col, pandas_udf
from pyspark.sql.types import IntegerType

inp, out = sys.argv[1], sys.argv[2]
spark = (SparkSession.builder.master("local[2]").appName("graft-arrow-bridge")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
         .getOrCreate())

ws = re.compile(r"\s+")
bpe = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")

@pandas_udf(IntegerType())
def n_ws_tokens(s: pd.Series) -> pd.Series:
    # mirror Spark size(split(trim(text), '\s+')): trim strips ASCII spaces only
    return s.map(lambda t: len(ws.split(t.strip(' '))))

@pandas_udf(IntegerType())
def n_bpe_tokens(s: pd.Series) -> pd.Series:
    return s.map(lambda t: len(bpe.findall(t)))

docs = spark.read.parquet(inp)
res = docs.select(col("doc_id"),
                  n_ws_tokens(col("text")).alias("n_ws_tokens"),
                  n_bpe_tokens(col("text")).alias("n_bpe_tokens"))
plan = res._jdf.queryExecution().executedPlan().toString()
assert "ArrowEvalPython" in plan, "expected the Arrow batch bridge operator, got:\n" + plan
res.coalesce(1).write.mode("overwrite").parquet(out)

# MapInPandas: iterator-of-Arrow-batches transform (the Multimodal batch-UDF shape)
def batch_chars(batches):
    for pdf in batches:
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "n_chars": pdf["text"].str.len()})
mp = docs.mapInPandas(batch_chars, "doc_id long, n_chars int")
mplan = mp._jdf.queryExecution().executedPlan().toString()
assert "MapInPandas" in mplan, mplan
mp.coalesce(1).write.mode("overwrite").parquet(out + "_map")

# applyInPandas: grouped pandas aggregation (FlatMapGroupsInPandasExec)
def per_source(pdf):
    return pd.DataFrame({"source": [pdf["source"].iloc[0]],
                         "total_ws": [int(pdf["n"].sum())]})
ap = (docs.select(col("source"), n_ws_tokens(col("text")).alias("n"))
      .groupBy("source").applyInPandas(per_source, "source string, total_ws long"))
aplan = ap._jdf.queryExecution().executedPlan().toString()
assert "FlatMapGroupsInPandas" in aplan, aplan
ap.coalesce(1).write.mode("overwrite").parquet(out + "_grouped")

# pandas UDF over a Window (WindowInPandasExec) — the reference support matrix's
# pandas-window row: a grouped-agg pandas_udf evaluated over a bounded running frame
from pyspark.sql.window import Window

@pandas_udf("double")
def pd_mean(v: pd.Series) -> float:
    return float(v.mean())

w = (Window.partitionBy("source").orderBy("doc_id")
     .rowsBetween(Window.unboundedPreceding, Window.currentRow))
win = (docs.select(col("source"), col("doc_id"), n_ws_tokens(col("text")).alias("n"))
       .withColumn("running_avg", pd_mean("n").over(w))
       .select("source", "doc_id", "running_avg"))
wplan = win._jdf.queryExecution().executedPlan().toString()
# Spark 4.x names the operator ArrowWindowPython (3.x called it WindowInPandas)
assert ("ArrowWindowPython" in wplan) or ("WindowInPandas" in wplan), \
    "expected the pandas window operator, got:\n" + wplan
win.coalesce(1).write.mode("overwrite").parquet(out + "_win")

spark.stop()
print("BRIDGE_OK")
"""

  test("pandas_udf over Arrow batches matches the JVM expression path row-for-row") {
    val probe = Process(Seq("python3", "-c", "import pyspark, pandas, pyarrow")).!(ProcessLogger(_ => ()))
    assume(probe == 0, "pyspark/pandas/pyarrow not importable in this container — bridge demo skipped")

    val scriptPath = Files.createTempFile("graft_bridge", ".py")
    Files.writeString(scriptPath, script)
    val outDir = Files.createTempDirectory("graft_bridge_out").toString
    val log = new StringBuilder
    val rc = Process(
      Seq("python3", scriptPath.toString, s"$sf/documents.parquet", outDir),
      None, "PYSPARK_PYTHON" -> "python3").!(ProcessLogger(l => log.append(l).append('\n')))
    assert(rc == 0, s"bridge script failed:\n$log")
    assert(log.toString.contains("BRIDGE_OK"))

    val fromPython = spark.read.parquet(outDir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val fromJvm = TextAnalysis.textTokens(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(fromPython.size == fromJvm.size && fromPython.nonEmpty)
    assert(fromPython == fromJvm,
      s"bridge/JVM mismatch on ${fromJvm.count(kv => fromPython.get(kv._1) != Some(kv._2))} docs")

    // MapInPandas output vs the JVM length() expression
    val mapChars = spark.read.parquet(outDir + "_map")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val jvmChars = graft.sources.TableIO.documents(spark, sf)
      .selectExpr("doc_id", "length(text) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(mapChars == jvmChars, "MapInPandas char counts must match length(text)")

    // grouped applyInPandas vs the JVM groupBy-sum over the same token counts
    val grouped = spark.read.parquet(outDir + "_grouped")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val jvmGrouped = TextAnalysis.textTokens(spark, sf)
      .join(graft.sources.TableIO.documents(spark, sf).select("doc_id", "source"), "doc_id")
      .groupBy("source").agg(org.apache.spark.sql.functions.sum("n_ws_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grouped == jvmGrouped, s"grouped bridge mismatch: $grouped vs $jvmGrouped")

    // pandas window UDF (WindowInPandasExec, asserted in-script) vs the JVM avg().over()
    // on the identical running frame — FP tolerance, the two engines sum in different order
    val winPy = spark.read.parquet(outDir + "_win")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val wSpec = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val winJvm = TextAnalysis.textTokens(spark, sf)
      .join(graft.sources.TableIO.documents(spark, sf).select("doc_id", "source"), "doc_id")
      .withColumn("running_avg",
        org.apache.spark.sql.functions.avg("n_ws_tokens").over(wSpec))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("running_avg")).toMap
    assert(winPy.size == winJvm.size && winPy.nonEmpty)
    winJvm.foreach { case (id, v) =>
      assert(math.abs(winPy(id) - v) < 1e-9, s"window bridge mismatch at doc $id: ${winPy(id)} vs $v")
    }
    Files.deleteIfExists(scriptPath)
  }
}
