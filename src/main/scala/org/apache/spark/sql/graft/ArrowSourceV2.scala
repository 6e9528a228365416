package org.apache.spark.sql.graft

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnVector, ColumnarBatch}

/**
 * Arrow-IPC as a full DataSourceV2 with COLUMN PRUNING and VECTORIZED (columnar-batch)
 * delivery — the faithful analog of the reference's namesake source (gazelle_plugin:
 * arrow-data-source/standard/src/main/scala/com/intel/oap/spark/sql/execution/
 * datasources/v2/arrow/ArrowDataSourceV2.scala:1, whose scans feed columnar batches to
 * the downstream columnar operators and prune/push down at the scan).
 *
 * Where the ArrowIpc.read RDD path copies every column of every row into InternalRows,
 * this scan:
 *   - implements `SupportsPushDownRequiredColumns`, so Catalyst's column pruning reaches
 *     the source: only the REQUIRED Arrow field vectors are wrapped and shipped (a
 *     projection of 2 of 40 columns wraps 2 vectors; the batch row-count survives even a
 *     zero-column COUNT(*) scan);
 *   - reports `supportColumnarReads = true` and hands Spark whole `ColumnarBatch`es of
 *     `ArrowColumnVector` — zero row-copying in the scan; Spark's own ColumnarToRow
 *     (whole-stage codegen) materializes rows only where the plan needs them, exactly
 *     how Spark's vectorized parquet reader integrates.
 *
 * One file = one partition (Arrow-IPC is not block-splittable; the file is the
 * parallelism unit, as in the reference). Off-heap buffers release on reader close; a
 * batch is copied NOWHERE — vectors stay Arrow-owned until the next loadNextBatch, which
 * is safe because Spark consumes a delivered batch fully before calling next().
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
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new ArrowScan(path, required)
}

private[graft] case class ArrowFilePartition(file: String) extends InputPartition

private[graft] class ArrowScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"arrow-graft $path ReadSchema: ${required.simpleString}"
  override def planInputPartitions(): Array[InputPartition] =
    ArrowSourceV2.listFiles(path).map(ArrowFilePartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowReaderFactory(required.fieldNames)
}

private[graft] class ArrowReaderFactory(requiredCols: Array[String])
    extends PartitionReaderFactory {

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

      override def next(): Boolean = {
        if (reader.loadNextBatch()) {
          // wrap ONLY the pruned columns; a zero-column scan (count(*)) still carries
          // the batch row count
          val cols: Array[ColumnVector] = requiredCols.map { name =>
            new ArrowColumnVector(root.getVector(name)): ColumnVector
          }
          current = new ColumnarBatch(cols, root.getRowCount)
          true
        } else false
      }

      override def get(): ColumnarBatch = current

      override def close(): Unit =
        try reader.close() finally alloc.close()
    }
  }
}
