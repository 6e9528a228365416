/*
 * Lives under org.apache.spark.sql for the private[sql] Column<->Expression bridge —
 * same placement as VectorExpressions/TopKPerKey/TDigest.
 */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/**
 * Mergeable count-min sketch (Cormode & Muthukrishnan, "An Improved Data Stream
 * Summary: The Count-Min Sketch and its Applications", J. Algorithms 2005) as a native
 * `TypedImperativeAggregate` — the point-frequency companion to the repo's other
 * mergeable sketches (HLL distinct counts, t-digest quantiles, SpaceSaving top-k):
 * build one fixed-size sketch per fine dimension cell, persist the bytes, and answer
 * "how often did THIS item occur" at any coarser rollup grain by MERGING sketches —
 * no rescan, no per-distinct-item state. SpaceSaving answers "what are the top items";
 * CMS answers point lookups for ANY item, including ones outside the top-k, which is
 * what rate-limiting / per-key frequency-capping passes over a 100 TB corpus need.
 *
 * Scale shape: the aggregation state is a FIXED depth x width long table (default
 * 5 x 2048 = 80 KB) regardless of input cardinality, merge is elementwise addition
 * (associative + commutative — partial aggregation safe), and estimates carry the
 * standard one-sided guarantee: est >= true, and est <= true + εN with probability
 * >= 1−δ where ε = e/width, δ = e^−depth. All hashing is fixed-seed Murmur3 over the
 * UTF-8 bytes, so sketches are bit-deterministic across runs and partitionings.
 */
object CountMin {

  val DefaultDepth = 5
  val DefaultWidth = 2048

  /** Fixed-size depth x width counter table; row i hashes with seed i. NOTE: 0x0 is
    * legal HERE — it is CmsMergeAgg's adopt-shape-from-first-sketch zero sentinel;
    * user-facing shape validation lives in [[CmsSketchAgg]]. */
  final class Buffer(val depth: Int, val width: Int) {
    val table: Array[Long] = new Array[Long](depth * width)
    var total: Long = 0L

    private def rowIndex(s: UTF8String, row: Int): Int = {
      val h = Murmur3_x86_32.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), row)
      // floorMod keeps the index non-negative for negative hashes
      java.lang.Math.floorMod(h, width)
    }

    def add(s: UTF8String): Unit = {
      var i = 0
      while (i < depth) { table(i * width + rowIndex(s, i)) += 1; i += 1 }
      total += 1
    }

    def absorb(other: Buffer): Unit = {
      require(other.depth == depth && other.width == width,
        s"cms_merge: sketch shape mismatch (${other.depth}x${other.width} vs ${depth}x$width)")
      var i = 0
      while (i < table.length) { table(i) += other.table(i); i += 1 }
      total += other.total
    }

    def estimate(s: UTF8String): Long = {
      var min = Long.MaxValue
      var i = 0
      while (i < depth) {
        val v = table(i * width + rowIndex(s, i))
        if (v < min) min = v
        i += 1
      }
      min
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(16 + 8 * table.length)
      bb.putInt(depth); bb.putInt(width); bb.putLong(total)
      var i = 0
      while (i < table.length) { bb.putLong(table(i)); i += 1 }
      bb.array()
    }
  }

  def fromBytes(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt(), bb.getInt())
    buf.total = bb.getLong()
    var i = 0
    while (i < buf.table.length) { buf.table(i) = bb.getLong(); i += 1 }
    buf
  }

  // ---- Column API ------------------------------------------------------------------

  /** Aggregate a string column into a count-min sketch (binary). */
  def sketch(v: Column, depth: Int = DefaultDepth, width: Int = DefaultWidth): Column =
    ExpressionUtils.column(
      CmsSketchAgg(ExpressionUtils.expression(v), depth, width).toAggregateExpression())

  /** Merge a column of count-min sketches into one sketch (binary). */
  def mergeSketches(s: Column): Column =
    ExpressionUtils.column(
      CmsMergeAgg(ExpressionUtils.expression(s)).toAggregateExpression())

  /** Point-frequency estimate for `item` out of a sketch column (one-sided: >= true). */
  def estimateOf(s: Column, item: Column): Column =
    ExpressionUtils.column(
      CmsEstimate(ExpressionUtils.expression(s), ExpressionUtils.expression(item)))
}

/** `cms_sketch(v[, depth, width])`: string column -> count-min sketch bytes. */
case class CmsSketchAgg(
    child: Expression,
    depth: Int = CountMin.DefaultDepth,
    width: Int = CountMin.DefaultWidth,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMin.Buffer] with ExpectsInputTypes {

  // fail degenerate shapes at PLAN time with a clear message: width=0 would otherwise
  // ArithmeticException (floorMod by zero) on the first add, and a depth-0 sketch
  // would silently estimate Long.MaxValue
  require(depth > 0 && width > 0,
    s"cms_sketch needs depth > 0 and width > 0, got ${depth}x$width")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): CountMin.Buffer = new CountMin.Buffer(depth, width)

  override def update(buffer: CountMin.Buffer, input: InternalRow): CountMin.Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: CountMin.Buffer, other: CountMin.Buffer): CountMin.Buffer = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: CountMin.Buffer): Any = buffer.toBytes
  override def serialize(buffer: CountMin.Buffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): CountMin.Buffer = CountMin.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `cms_merge(sketch)`: union a column of count-min sketch bytes into one sketch — the
  * rollup-serving half (answer coarser grains without rescanning the base). */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMin.Buffer] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "cms_merge"

  // Shape adopted lazily from the first merged sketch: an empty buffer is the
  // zero-width sentinel that absorbs the first real sketch's dimensions.
  override def createAggregationBuffer(): CountMin.Buffer = new CountMin.Buffer(0, 0)

  private def absorbInto(buffer: CountMin.Buffer, other: CountMin.Buffer): CountMin.Buffer =
    if (other.depth == 0) buffer
    else if (buffer.depth == 0) other
    else { buffer.absorb(other); buffer }

  override def update(buffer: CountMin.Buffer, input: InternalRow): CountMin.Buffer = {
    val v = child.eval(input)
    if (v == null) buffer
    else absorbInto(buffer, CountMin.fromBytes(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: CountMin.Buffer, other: CountMin.Buffer): CountMin.Buffer =
    absorbInto(buffer, other)

  override def eval(buffer: CountMin.Buffer): Any =
    if (buffer.depth == 0) null else buffer.toBytes
  override def serialize(buffer: CountMin.Buffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): CountMin.Buffer = CountMin.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `cms_estimate(sketch, item)`: scalar point-frequency read-out from sketch bytes.
  * Interpreted eval (CodegenFallback) — it runs once per (group, probe item) at read
  * time, never in a per-row hot path. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(s: Any, item: Any): Any =
    CountMin.fromBytes(s.asInstanceOf[Array[Byte]]).estimate(item.asInstanceOf[UTF8String])

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
