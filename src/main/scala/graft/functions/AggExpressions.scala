package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftglue.Bridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

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

/** Bit math shared by [[BloomAgg]] (build) and [[BloomContains]] (probe).
  *
  * Positions come from Kirsch–Mitzenmacher double hashing over the
  * 64-bit Murmur3 finalizer (fmix64 — public-domain mixing constants):
  * pos_i = (h1 + i·h2) mod m with h2 forced odd, so k probes cost two
  * mixes + k masked adds. Addressing is BYTE-wise (bit b lives at
  * bytes(b >>> 3), bit b & 7), making the aggregation buffer, the
  * serialized form, and the probe side the same byte layout — no
  * endianness to agree on.
  */
object BloomHelper {
  def mix(z0: Long): Long = {
    var z = (z0 ^ (z0 >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  def set(filter: Array[Byte], v: Long, k: Int): Unit = {
    val mask = filter.length * 8 - 1
    val h1 = mix(v)
    val h2 = mix(v ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val b = ((h1 + i * h2) & mask).toInt
      filter(b >>> 3) = (filter(b >>> 3) | (1 << (b & 7))).toByte
      i += 1
    }
  }

  /** The probe surface is SQL-registered, so an arbitrary BINARY can
    * arrive: a zero-length or non-power-of-two filter would turn the
    * mask arithmetic into negative/aliased indexing — fail loudly.
    */
  def checkFilter(filter: Array[Byte]): Unit =
    if (filter.length < 8 || (filter.length & (filter.length - 1)) != 0)
      throw new IllegalArgumentException(
        s"bloom filter must be a power-of-two byte array >= 8 bytes " +
          s"(a bloom_agg result), got ${filter.length} bytes")

  def contains(filter: Array[Byte], v: Long, k: Int): Boolean = {
    checkFilter(filter)
    containsUnchecked(filter, v, k)
  }

  private def containsUnchecked(filter: Array[Byte], v: Long, k: Int): Boolean = {
    val mask = filter.length * 8 - 1
    val h1 = mix(v)
    val h2 = mix(v ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val b = ((h1 + i * h2) & mask).toInt
      if ((filter(b >>> 3) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Count of array elements whose xxhash64 (seed 42 — the same hash
    * `functions.xxhash64` computes over a string column, so build and
    * probe sides agree by construction) hits the filter. One native loop
    * per row — the no-HOF probe for [[BloomHits]].
    */
  def hits(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      filter: Array[Byte], k: Int): Int = {
    checkFilter(filter)
    var n = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        if (containsUnchecked(filter, h, k)) n += 1
      }
      i += 1
    }
    n
  }
}

/** `bloom_agg(hash64, mBits, k)` — build a Bloom filter over a LONG hash
  * column as a fixed-size mergeable aggregate (merge = byte-wise OR, so
  * the final bitset is partition-order-INDEPENDENT — unlike the quantile
  * sketch, every run yields the identical filter).
  *
  * The 100 TB shape this exists for: membership pre-filtering where the
  * probe side is huge and the member set merely large. A broadcast hash
  * relation of the member set costs tens of bytes per element (string +
  * table overhead) on EVERY executor; the Bloom filter is m bits TOTAL
  * for any member count, with a CERTIFIED one-sided error — never a
  * false negative, false positives bounded by (1 − e^(−kn/m))^k. Spark's
  * own runtime-filter join pushdown is this same trick applied by the
  * optimizer; exposing it as an aggregate lets a pipeline build the
  * filter once, persist it beside the corpus, and assert the
  * no-false-negative contract in-query (e76).
  *
  * Null inputs are ignored. Output is the m/8-byte filter (BinaryType).
  */
case class BloomAgg(
    child: Expression,
    mBits: Int = 1 << 20,
    k: Int = 5,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
  require(mBits >= 64 && (mBits & (mBits - 1)) == 0, "bloom_agg: mBits must be a power of two >= 64")
  require(k >= 1 && k <= 16, "bloom_agg: k must be in [1, 16]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg needs a BIGINT hash column (use xxhash64), got ${child.dataType.sql}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](mBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomHelper.set(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
  override def prettyName: String = "bloom_agg"
}

/** `bloom_contains(filter, hash64, k)` — probe a [[BloomAgg]] filter.
  * Codegen'd (k bit-tests via the static [[BloomHelper]]), so the probe
  * stays inside WholeStageCodegen in the corpus scan — the broadcast
  * filter rides a 1-row cross join exactly like the library's query
  * vectors. `k` must match the build side; the filter operand must be a
  * power-of-two byte array ([[BloomHelper.checkFilter]] fails loudly on
  * anything else — the probe is SQL-registered, so arbitrary binaries
  * can arrive).
  */
case class BloomContains(left: Expression, right: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  // probe k must mirror the build side's [1,16] validation: k <= 0 would
  // skip the probe loop entirely and silently return true for every input
  require(k >= 1 && k <= 16, "bloom_contains: k must be in [1, 16]")
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains needs (BINARY filter, BIGINT hash), got (${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(f: Any, v: Any): Any =
    BloomHelper.contains(f.asInstanceOf[Array[Byte]], v.asInstanceOf[Long], k)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (f, v) =>
      s"${ev.value} = graft.functions.BloomHelper.contains($f, $v, $k);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomContains =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_contains"
}

/** `bloom_hits(grams, filter, k)` — how many elements of an
  * `array<string>` column hit a [[BloomAgg]] filter (hashing each
  * element with xxhash64/seed-42, the build side's hash). One codegen'd
  * native loop per row — the streaming-ingest probe shape: the filter
  * rides the plan as a literal/broadcast constant and the whole
  * shingle-and-test runs scan-local with no explode, no join, and no
  * per-element lambda interpretation (a `functions.exists` HOF probe
  * interprets its lambda per element — measured ~50× slower on the text
  * kernels, see TextExpressions).
  */
case class BloomHits(left: Expression, right: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  // probe k must mirror the build side's [1,16] validation: k <= 0 would
  // skip the bit-tests and count every element as a hit
  require(k >= 1 && k <= 16, "bloom_hits: k must be in [1, 16]")
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(org.apache.spark.sql.types.StringType, _), BinaryType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_hits needs (ARRAY<STRING> items, BINARY filter), got (${l.sql}, ${r.sql})")
  }

  override def nullSafeEval(a: Any, f: Any): Any =
    BloomHelper.hits(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      f.asInstanceOf[Array[Byte]], k)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, f) =>
      s"${ev.value} = graft.functions.BloomHelper.hits($a, $f, $k);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomHits =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_hits"
}

/** Mergeable Misra–Gries heavy-hitter buffer (Agarwal et al. 2012
  * "Mergeable summaries" merge rule). Capacity-c frequency map with the
  * classic stream step — a new item arriving at a full map decrements
  * every counter (and is itself dropped), removing c+1 weight per round —
  * and the mergeable step: add the two maps, then subtract the (c+1)-th
  * largest count from everything and drop non-positives. Both steps
  * remove ≥ (c+1)·t total weight per t added to the error accumulator,
  * so the CERTIFIED guarantees hold for every run regardless of
  * partitioning:
  *  - est(x) ≤ true(x) ≤ est(x) + err (absent ⇒ est 0),
  *  - err ≤ n / (c+1),
  *  - every item with true(x) > err is present in the summary.
  */
final class TopKBuffer(val c: Int) {
  var n: Long = 0L
  var err: Long = 0L
  val counts = scala.collection.mutable.HashMap.empty[String, Long]

  def insert(item: String): Unit = {
    n += 1
    counts.get(item) match {
      case Some(v) => counts.update(item, v + 1)
      case None if counts.size < c => counts.update(item, 1L)
      case None =>
        // decrement-all round: c stored counters + the dropped arrival
        err += 1
        counts.mapValuesInPlace((_, v) => v - 1)
        counts.filterInPlace((_, v) => v > 0)
    }
  }

  def mergeWith(o: TopKBuffer): Unit = {
    n += o.n; err += o.err
    o.counts.foreach { case (k, v) => counts.update(k, counts.getOrElse(k, 0L) + v) }
    if (counts.size > c) {
      val t = counts.values.toArray.sortInPlace()(Ordering[Long].reverse).apply(c)
      err += t
      counts.mapValuesInPlace((_, v) => v - t)
      counts.filterInPlace((_, v) => v > 0)
    }
  }
}

/** `topk_sketch(item, c)` — mergeable heavy hitters with certified
  * bounds (see [[TopKBuffer]]). Returns `struct(items array<string>,
  * counts array<long>, err long, n long)`, items ordered by (estimate
  * desc, item). The retained SET is partition-order-dependent but the
  * reported bounds are valid for every run, so downstream booleans of
  * the form `present OR true_count <= err` / `est <= true <= est + err`
  * are deterministic — the same contract as [[QuantileSketch]].
  *
  * The 100 TB shape: exact token top-K is a full groupBy over the token
  * domain — O(vocab) rows through the shuffle and a skewed reduce on
  * Zipfian text. The sketch ships ONE c-entry buffer per map task
  * through a map-side-combined aggregation; wire cost is independent of
  * both corpus and vocabulary size. Null inputs are ignored.
  */
case class TopKSketch(
    child: Expression,
    c: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with UnaryLike[Expression] {
  require(c >= 1, "topk_sketch: capacity must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_sketch needs a STRING item column, got ${child.dataType.sql}")
  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(org.apache.spark.sql.types.StringType, containsNull = false), nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(c)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.toString)
    buf
  }

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    b1.mergeWith(b2); b1
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.counts.toArray.sortBy { case (k, v) => (-v, k) }
    InternalRow(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        sorted.map(e => org.apache.spark.unsafe.types.UTF8String.fromString(e._1))),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sorted.map(_._2)),
      buf.err, buf.n)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val entries = buf.counts.toArray
    val bytes = entries.map { case (k, _) => k.getBytes(java.nio.charset.StandardCharsets.UTF_8) }
    val bb = java.nio.ByteBuffer.allocate(
      8 + 8 + 4 + entries.length * 12 + bytes.map(_.length).sum)
    bb.putLong(buf.n).putLong(buf.err).putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(b: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val out = new TopKBuffer(c)
    out.n = bb.getLong()
    out.err = bb.getLong()
    val sz = bb.getInt()
    (0 until sz).foreach { _ =>
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      out.counts.update(new String(arr, java.nio.charset.StandardCharsets.UTF_8), bb.getLong())
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKSketch =
    copy(child = newChild)
  override def prettyName: String = "topk_sketch"
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

  /** Bloom filter over a BIGINT hash column (pair with
    * `org.apache.spark.sql.functions.xxhash64`): m/8 bytes of mergeable,
    * partition-order-independent state; never a false negative.
    */
  def bloomAgg(hash: Column, mBits: Int = 1 << 20, k: Int = 5): Column =
    column(BloomAgg(expression(hash), mBits, k).toAggregateExpression())

  /** Probe a [[bloomAgg]] filter; `k` must match the build side. */
  def bloomContains(filter: Column, hash: Column, k: Int = 5): Column =
    column(BloomContains(expression(filter), expression(hash), k))

  /** Count how many elements of an `array<string>` column hit a
    * [[bloomAgg]] filter (xxhash64/seed-42 per element, matching
    * `bloomAgg(xxhash64(col))` build sides) — scan-local, codegen'd.
    */
  def bloomHits(items: Column, filter: Column, k: Int = 5): Column =
    column(BloomHits(expression(items), expression(filter), k))

  /** Mergeable Misra–Gries heavy hitters with certified bounds:
    * `struct(items array<string>, counts array<long>, err long, n long)`.
    */
  def topkSketch(item: Column, c: Int = 64): Column =
    column(TopKSketch(expression(item), c).toAggregateExpression())
}
