package org.apache.spark.sql.graft

import java.util.{Map => JMap}

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.spark.sql.catalyst.StructFilters
import org.apache.spark.sql.catalyst.expressions.{And, BasePredicate, BoundReference, Expression, Predicate => CatalystPredicate}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnVector, ColumnarBatch}

/**
 * Arrow-IPC as a full DataSourceV2 with COLUMN PRUNING, FILTER PUSHDOWN, and VECTORIZED
 * (columnar-batch) delivery — the faithful analog of the reference's namesake source
 * (gazelle_plugin: arrow-data-source/standard/src/main/scala/com/intel/oap/spark/sql/
 * execution/datasources/v2/arrow/ArrowDataSourceV2.scala:1, whose ArrowScanBuilder
 * implements SupportsPushDownFilters and feeds the pushed predicates into the native
 * dataset scan — ArrowScanBuilder.scala:34-41).
 *
 * Where the ArrowIpc.read RDD path copies every column of every row into InternalRows,
 * this scan:
 *   - implements `SupportsPushDownRequiredColumns`, so Catalyst's column pruning reaches
 *     the source: only the REQUIRED Arrow field vectors are wrapped and shipped (a
 *     projection of 2 of 40 columns wraps 2 vectors; the batch row-count survives even a
 *     zero-column COUNT(*) scan);
 *   - implements `SupportsPushDownFilters`: the subset of the predicate Spark's own
 *     CSV/JSON readers can evaluate (StructFilters.pushedFilters — comparisons, IN,
 *     null tests, string prefix/suffix/contains, AND/OR/NOT over the file's columns)
 *     is accepted, reported as pushed, and evaluated INSIDE the reader at BATCH
 *     granularity: a record batch in which no row satisfies the predicate is skipped
 *     wholesale — its vectors are never wrapped, never delivered, never row-
 *     materialized by ColumnarToRow. Evaluation short-circuits on the first matching
 *     row, so a surviving batch pays only a prefix scan of the filter columns.
 *     Batches with ≥1 match are delivered intact and Spark's residual Filter trims
 *     rows exactly — the same batch-granular contract Spark's parquet source has with
 *     row-group statistics (every pushed filter is also returned as a residual, so
 *     correctness never depends on the reader's skip decision). Arrow-IPC footers
 *     carry no column statistics, so exact first-match evaluation IS the min/max
 *     analog — same O(filter-column prefix) cost class, strictly better precision;
 *   - reports `supportColumnarReads = true` and hands Spark whole `ColumnarBatch`es of
 *     `ArrowColumnVector` — zero row-copying in the scan; Spark's own ColumnarToRow
 *     (whole-stage codegen) materializes rows only where the plan needs them, exactly
 *     how Spark's vectorized parquet reader integrates.
 *
 * One file = one partition (Arrow-IPC is not block-splittable; the file is the
 * parallelism unit, as in the reference). Off-heap buffers release on reader close; a
 * batch is copied NOWHERE — vectors stay Arrow-owned until the next loadNextBatch, which
 * is safe because Spark consumes a delivered batch fully before calling next().
 *
 * Observability: the scan publishes `arrowBatchesRead` / `arrowBatchesSkipped` as DSv2
 * custom metrics — per-query, race-free (visible in the SQL UI and on the executed
 * plan's BatchScanExec, which is what the spec asserts against).
 */
class ArrowSourceV2 extends TableProvider with DataSourceRegister {

  override def shortName(): String = "arrow-graft"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("arrow-graft: .load(path) is required"))
    ArrowSourceV2.readFooterSchema(ArrowSourceV2.listFiles(path).headOption.getOrElse(
      throw new IllegalArgumentException(s"arrow-graft: no .arrow files under $path")))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ArrowTable(properties.get("path"), schema)
}

object ArrowSourceV2 {
  def listFiles(path: String): Seq[String] = {
    val p = new java.io.File(path)
    if (p.isDirectory)
      p.listFiles().filter(f => f.isFile && f.getName.endsWith(".arrow"))
        .map(_.getAbsolutePath).sorted.toSeq
    else if (p.isFile) Seq(p.getAbsolutePath)
    else Seq.empty
  }

  def readFooterSchema(file: String): StructType = {
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(file), java.nio.file.StandardOpenOption.READ)
      val reader = new ArrowFileReader(ch, alloc)
      try org.apache.spark.sql.util.ArrowUtils.fromArrowSchema(
        reader.getVectorSchemaRoot.getSchema)
      finally reader.close()
    } finally alloc.close()
  }
}

private[graft] class ArrowTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"arrow-graft:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowScanBuilder(path, tableSchema)
}

private[graft] class ArrowScanBuilder(path: String, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Accept the StructFilters-evaluable subset; return EVERY filter as residual.
    * The reader's evaluation is batch-granular (skip a batch iff NO row matches), so
    * Spark must keep its row-exact Filter — identical to the parquet row-group-stats
    * contract, and to the reference, whose native scan also leaves the Spark-side
    * FilterExec in place above the pushed scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = StructFilters.pushedFilters(filters, fullSchema)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ArrowScan(path, required, fullSchema, pushed)
}

private[graft] case class ArrowFilePartition(file: String) extends InputPartition

private[graft] class ArrowBatchesReadMetric extends CustomSumMetric {
  override def name(): String = "arrowBatchesRead"
  override def description(): String = "arrow record batches delivered"
}
private[graft] class ArrowBatchesSkippedMetric extends CustomSumMetric {
  override def name(): String = "arrowBatchesSkipped"
  override def description(): String = "arrow record batches skipped by pushed filters"
}

private[graft] class ArrowScan(path: String, required: StructType, fullSchema: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"arrow-graft $path ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def supportedCustomMetrics(): Array[CustomMetric] =
    Array(new ArrowBatchesReadMetric, new ArrowBatchesSkippedMetric)
  override def planInputPartitions(): Array[InputPartition] =
    ArrowSourceV2.listFiles(path).map(ArrowFilePartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowReaderFactory(required.fieldNames, fullSchema, pushed)
}

private[graft] class ArrowReaderFactory(requiredCols: Array[String],
    fullSchema: StructType, pushed: Array[Filter]) extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    throw new UnsupportedOperationException("arrow-graft scan is columnar-only")

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val file = partition.asInstanceOf[ArrowFilePartition].file
    new PartitionReader[ColumnarBatch] {
      private val alloc = new RootAllocator(Long.MaxValue)
      private val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(file), java.nio.file.StandardOpenOption.READ)
      private val reader = new ArrowFileReader(ch, alloc)
      private val root = reader.getVectorSchemaRoot
      private var current: ColumnarBatch = _
      private var nRead = 0L
      private var nSkipped = 0L

      // Compile the pushed predicate ONCE per reader against a compact schema of just
      // the filter-referenced columns (bound by ordinal). StructFilters.filterToExpression
      // is the same translation Spark's CSV/JSON readers run for their pushed filters.
      private val filterCols: Array[String] = {
        val refs = pushed.flatMap(_.references).distinct
        fullSchema.fieldNames.filter(refs.contains) // file-schema order, deduped
      }
      private val predicate: Option[BasePredicate] = {
        val exprs = pushed.flatMap { f =>
          StructFilters.filterToExpression(f, name => {
            val i = filterCols.indexOf(name)
            if (i < 0) None
            else {
              val fld = fullSchema(name)
              Some(BoundReference(i, fld.dataType, fld.nullable))
            }
          })
        }
        if (exprs.isEmpty) None
        else Some(CatalystPredicate.create(exprs.reduceLeft[Expression](And(_, _))))
      }

      // Wrap the filter columns ONCE: ArrowFileReader reloads each batch's buffers
      // into the SAME VectorSchemaRoot vector instances, so the wrappers (and the
      // probe batch around them) stay valid across loadNextBatch — only the row
      // count changes per batch.
      private val evalBatch: ColumnarBatch = new ColumnarBatch(
        filterCols.map(n => new ArrowColumnVector(root.getVector(n)): ColumnVector))

      /** True iff at least one row of the CURRENT loaded batch satisfies every pushed
        * filter — short-circuits on the first hit. The ColumnarBatchRow handed to the
        * compiled predicate is a cursor over the Arrow buffers, not a copy. */
      private def batchCanMatch(p: BasePredicate): Boolean = {
        evalBatch.setNumRows(root.getRowCount)
        val it = evalBatch.rowIterator()
        while (it.hasNext) if (p.eval(it.next())) return true
        false
      }

      override def next(): Boolean = {
        while (reader.loadNextBatch()) {
          if (predicate.forall(batchCanMatch)) {
            // wrap ONLY the pruned columns; a zero-column scan (count(*)) still carries
            // the batch row count
            val cols: Array[ColumnVector] = requiredCols.map { name =>
              new ArrowColumnVector(root.getVector(name)): ColumnVector
            }
            current = new ColumnarBatch(cols, root.getRowCount)
            nRead += 1
            return true
          }
          nSkipped += 1
        }
        false
      }

      override def get(): ColumnarBatch = current

      override def currentMetricsValues(): Array[CustomTaskMetric] = Array(
        new CustomTaskMetric { def name() = "arrowBatchesRead"; def value() = nRead },
        new CustomTaskMetric { def name() = "arrowBatchesSkipped"; def value() = nSkipped })

      override def close(): Unit =
        try reader.close() finally alloc.close()
    }
  }
}
