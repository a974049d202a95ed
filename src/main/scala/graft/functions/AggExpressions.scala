package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftglue.Bridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Exact distinct count over a BOUNDED integer bucket domain via a
  * fixed-size bitmap aggregation buffer — the custom mergeable-aggregate
  * capability class (Spark's `TypedImperativeAggregate`, the
  * `collect_set`/percentile machinery) applied to the count-distinct
  * shape.
  *
  * Why not `count(DISTINCT x)`: Spark plans a distinct aggregate as TWO
  * shuffles — first de-duplicate all (group, x) pairs across the cluster,
  * then count — so the intermediate state is O(distinct pairs) rows on
  * the wire. When the counted domain is bounded (here: 16-bit bucket
  * ids), a bitmap of the domain is exact with O(domain/8) bytes of state
  * per group: updates are in-scan bit sets with map-side partial
  * aggregation, merges are word-wise OR, and ONE shuffle moves only
  * #groups × 8 KB buffers regardless of corpus size. At 100 TB the
  * distinct-pair shuffle is the bottleneck; the bitmap's wire cost does
  * not grow with the data at all. (Same state shape as the roaring/
  * HLL sketch aggregates; exact because the domain is enumerable.)
  *
  * Buckets outside [0, nBits) are masked into range (callers hash into
  * the domain anyway); null inputs are ignored, matching count(DISTINCT).
  */
case class BitmapDistinct(
    child: Expression,
    nBits: Int = 1 << 16,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(nBits > 0 && (nBits & (nBits - 1)) == 0, "nBits must be a power of two")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_distinct needs an INT bucket column, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val b = v.asInstanceOf[Int] & (nBits - 1)
      buf(b >>> 6) |= 1L << (b & 63)
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < buf.length) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinct =
    copy(child = newChild)
  override def prettyName: String = "bitmap_distinct"
}

object AggExpressions {
  /** Exact distinct count of integer buckets in [0, nBits) with a fixed
    * 8-KB-per-group mergeable bitmap (one shuffle, map-side combined) —
    * use instead of countDistinct when the domain is bounded.
    */
  def bitmapDistinct(bucket: Column, nBits: Int = 1 << 16): Column =
    column(BitmapDistinct(expression(bucket), nBits).toAggregateExpression())
}
