package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftglue.Bridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

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

/** Mergeable quantile-summary buffer (KLL-family compaction tree, Karnin/
  * Lang/Liberty 2016 "Optimal quantile approximation in streams" shape,
  * with DETERMINISTIC compaction and a SELF-REPORTED worst-case rank-error
  * bound instead of the randomized unbiased variant):
  *
  * - `levels(h)` holds items of weight 2^h; inserts land in level 0.
  * - When a level reaches `k` items it is sorted and every second item
  *   (0-based even indices) is promoted with doubled weight. Dropping
  *   alternate items of weight w shifts any rank estimate by at most w
  *   (rank j becomes 2·ceil(j/2) ⇒ error ∈ {0, w}), so `err += 2^h` per
  *   compaction is a CORRECT worst-case accumulator — the sketch carries
  *   its own certified bound, which is what lets a query assert its
  *   approximation error as a hash-gated boolean.
  * - Merge = concatenate levels pairwise, compact any overfull level,
  *   add the two error accumulators. Associative and mergeable: partial
  *   state is O(k·log(n/k)) doubles per group regardless of input size —
  *   the property that replaces an exact percentile's full sort at 100 TB
  *   (exact percentile_disc shuffles every row; the sketch ships
  *   fixed-size buffers through one map-side-combined aggregation).
  *
  * The VALUE returned for percentile p is the classic weighted
  * percentile-disc over the summary (smallest retained value whose
  * cumulative weight reaches ceil(p·n)); its true rank differs from p·n
  * by at most `err` + the largest retained weight (discretization slack),
  * which [[QuantileSketch.eval]] reports as `err_bound`. Retained values
  * are always actual input values.
  *
  * Determinism note: the per-run summary depends on how the input was
  * partitioned (compaction order), but the REPORTED BOUND is valid for
  * every run — so downstream booleans of the form |approx − exact| ≤
  * bound are deterministic even though the approx value itself is not,
  * which is exactly the contract b12's oracle gate needs.
  */
final class QuantileBuffer(val k: Int) {
  var n: Long = 0L
  var err: Long = 0L
  val levels = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.ArrayBuffer.empty[Double])

  private def ensure(h: Int): Unit =
    while (levels.size <= h) levels += scala.collection.mutable.ArrayBuffer.empty[Double]

  def insert(v: Double): Unit = {
    levels(0) += v; n += 1
    if (levels(0).size >= k) compact(0)
  }

  private def compact(h: Int): Unit = {
    val buf = levels(h)
    buf.sortInPlace()
    val m = buf.size & ~1 // compact an even count; an odd straggler stays
    ensure(h + 1)
    val up = levels(h + 1)
    var i = 0
    while (i < m) { up += buf(i); i += 2 }
    val rem = if ((buf.size & 1) == 1) Some(buf.last) else None
    buf.clear()
    rem.foreach(buf += _)
    err += 1L << h
    if (up.size >= k) compact(h + 1)
  }

  def mergeWith(o: QuantileBuffer): Unit = {
    n += o.n; err += o.err
    var h = 0
    while (h < o.levels.size) {
      if (o.levels(h).nonEmpty) { ensure(h); levels(h) ++= o.levels(h) }
      h += 1
    }
    h = 0
    while (h < levels.size) { if (levels(h).size >= k) compact(h); h += 1 }
  }

  /** (percentile-disc values for `ps`, certified worst-case rank-error
    * bound including discretization slack).
    */
  def query(ps: Seq[Double]): (Array[Double], Long) = {
    val items = levels.iterator.zipWithIndex.flatMap { case (lst, h) =>
      lst.iterator.map(v => (v, 1L << h))
    }.toArray.sortBy(_._1)
    val maxW = levels.indices.collect { case h if levels(h).nonEmpty => 1L << h }
      .foldLeft(1L)(math.max)
    val vals = ps.map { p =>
      val target = math.max(1L, math.ceil(p * n).toLong)
      var cum = 0L; var i = 0
      var out = if (items.nonEmpty) items(items.length - 1)._1 else Double.NaN
      var done = false
      while (i < items.length && !done) {
        cum += items(i)._2
        if (cum >= target) { out = items(i)._1; done = true }
        i += 1
      }
      out
    }.toArray
    (vals, err + maxW)
  }
}

/** `quantile_sketch(x, percentages, k)` — mergeable approximate
  * percentiles with a certified rank-error bound (see [[QuantileBuffer]]).
  * Returns `struct(values: array<double>, err_bound: long, n: long)`;
  * `err_bound` is a worst-case RANK error in rows: the true rank of
  * `values[i]` is within `percentages(i)·n ± err_bound`. Null inputs are
  * ignored (matching percentile_approx); an all-null group yields NaN
  * values with n = 0.
  */
case class QuantileSketch(
    child: Expression,
    percentages: Seq[Double],
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileBuffer] with UnaryLike[Expression] {
  require(k >= 8 && (k & 1) == 0, "quantile_sketch: k must be even and >= 8")
  require(percentages.nonEmpty && percentages.forall(p => p >= 0.0 && p <= 1.0),
    "quantile_sketch: percentages must lie in [0, 1]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch needs a DOUBLE value column, got ${child.dataType.sql}")
  override def dataType: DataType = StructType(Seq(
    StructField("values", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("err_bound", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): QuantileBuffer = new QuantileBuffer(k)

  override def update(buf: QuantileBuffer, input: InternalRow): QuantileBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: QuantileBuffer, b2: QuantileBuffer): QuantileBuffer = {
    b1.mergeWith(b2); b1
  }

  override def eval(buf: QuantileBuffer): Any = {
    val (vals, bound) = buf.query(percentages)
    InternalRow(new org.apache.spark.sql.catalyst.util.GenericArrayData(vals),
      bound, buf.n)
  }

  override def serialize(buf: QuantileBuffer): Array[Byte] = {
    val sizes = buf.levels.map(_.size)
    val bb = java.nio.ByteBuffer.allocate(8 + 8 + 4 + sizes.size * 4 + sizes.sum * 8)
    bb.putLong(buf.n).putLong(buf.err).putInt(buf.levels.size)
    buf.levels.foreach { lst =>
      bb.putInt(lst.size)
      lst.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QuantileBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new QuantileBuffer(k)
    out.n = bb.getLong()
    out.err = bb.getLong()
    val nLevels = bb.getInt()
    (0 until nLevels).foreach { h =>
      val sz = bb.getInt()
      if (sz > 0) {
        while (out.levels.size <= h)
          out.levels += scala.collection.mutable.ArrayBuffer.empty[Double]
        (0 until sz).foreach(_ => out.levels(h) += bb.getDouble())
      }
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketch =
    copy(child = newChild)
  override def prettyName: String = "quantile_sketch"
}

object AggExpressions {
  /** Exact distinct count of integer buckets in [0, nBits) with a fixed
    * 8-KB-per-group mergeable bitmap (one shuffle, map-side combined) —
    * use instead of countDistinct when the domain is bounded.
    */
  def bitmapDistinct(bucket: Column, nBits: Int = 1 << 16): Column =
    column(BitmapDistinct(expression(bucket), nBits).toAggregateExpression())

  /** Approximate percentiles with a certified worst-case rank-error bound:
    * `struct(values array<double>, err_bound long, n long)` — fixed-size
    * mergeable state per group (see [[QuantileBuffer]]). The input column
    * is cast to double.
    */
  def quantileSketch(value: Column, percentages: Seq[Double], k: Int = 1024): Column =
    column(QuantileSketch(
      expression(value.cast(org.apache.spark.sql.types.DoubleType)),
      percentages, k).toAggregateExpression())
}
