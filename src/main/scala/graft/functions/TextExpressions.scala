package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-sketch kernels.
  *
  * The composable minhash formulation (`array_min(transform(shingles, x =>
  * md5(j || "|" || x)))` per permutation j — [[graft.llm.Dedup.minhashSig]],
  * kept as the executable spec) interprets one lambda per shingle per
  * permutation and re-materializes the shingle array for every permutation
  * column — measured ~14 s for k=8 over 5k docs at sf0.1, which made the
  * banded-LSH candidate query the slowest in the bench. This expression
  * computes all k minima in ONE pass over the tokens with a reused MD5
  * instance: identical values (same md5 hex, same ASCII string ordering —
  * lowercase hex compares identically as UTF-16, UTF-8 bytes, or DuckDB
  * varchar), ~50× less per-row overhead.
  *
  * Scale: per-row scalar with no shuffle; codegen calls the static kernel,
  * so the surrounding stage stays in WholeStageCodegen.
  */
case class MinhashSig(child: Expression, n: Int, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // null for null text AND for docs shorter than n tokens (no shingles ⇒ no
  // similarity evidence), mirroring array_min-of-empty in the HOF spec
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.sigArrayData(input.asInstanceOf[UTF8String].toString, n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinhashKernel.sigArrayData($c.toString(), $n, $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinhashKernel {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val Hex = "0123456789abcdef".toCharArray

  private def md5Hex(d: MessageDigest, s: String): String = {
    d.reset()
    val bytes = d.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** The i-th word n-gram shingle (space-joined tokens [i, i+n)) — the one
    * shingle construction shared by [[sig]] and [[distinctShingles]], and
    * the exact string the HOF spec's `concat_ws(" ", slice(...))` builds.
    */
  private def shingleAt(tokens: Array[String], i: Int, n: Int,
      sb: java.lang.StringBuilder): String = {
    sb.setLength(0)
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(tokens(i + j))
      j += 1
    }
    sb.toString
  }

  /** Permutation prefixes `"0|"`, `"1|"`, … as UTF-8 bytes (ASCII), cached
    * for the k values in use — lets [[sig]] hash `update(prefix);
    * update(shingle)` instead of allocating the concatenated string per
    * (permutation, shingle). UTF-8 of a concatenation is the concatenation
    * of the UTF-8 encodings, so the digested bytes are identical.
    */
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Byte]]]()
  private def prefixes(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(k,
      _ => Array.tabulate(k)(p => (p.toString + "|").getBytes(StandardCharsets.UTF_8)))

  /** Unsigned lexicographic byte compare — the same order as comparing the
    * lowercase-hex renderings (each hex digit pair preserves the unsigned
    * byte order), so the min digest can be chosen on raw bytes and
    * hex-rendered once at the end.
    */
  private def cmpUnsigned(a: Array[Byte], b: Array[Byte]): Int =
    java.util.Arrays.compareUnsigned(a, b)

  /** k minhash values over word n-gram shingles of `text`, or null when the
    * doc has no shingles. Exactly `min_x md5(j + "|" + x)` per permutation
    * j — the same tokenization (`split(" ", -1)`, trailing empties kept) and
    * the same bytes hashed as the Spark HOF spec and the DuckDB oracle.
    * Hot path (every banding/near-dup operator runs it per doc): digests
    * are compared as raw bytes into a reused scratch buffer — the only
    * per-hash allocation is the defensive copy when a new min is found.
    */
  def sig(text: String, n: Int, k: Int): Array[String] = {
    val tokens = text.split(" ", -1)
    if (tokens.length < n) return null
    val d = md5.get()
    val pfx = prefixes(k)
    val mins = new Array[Array[Byte]](k)
    val scratch = new Array[Byte](16)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= tokens.length - n) {
      val shingle = shingleAt(tokens, i, n, sb)
      val sBytes = shingle.getBytes(StandardCharsets.UTF_8)
      var p = 0
      while (p < k) {
        d.reset()
        d.update(pfx(p))
        d.update(sBytes)
        d.digest(scratch, 0, 16): Unit
        if (mins(p) == null || cmpUnsigned(scratch, mins(p)) < 0)
          mins(p) = scratch.clone()
        p += 1
      }
      i += 1
    }
    mins.map(hexOf)
  }

  /** Lowercase-hex rendering of a 16-byte digest. */
  private def hexOf(bytes: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** [[sig]] boxed as Catalyst ArrayData (codegen entry point). */
  def sigArrayData(text: String, n: Int, k: Int): ArrayData = {
    val s = sig(text, n, k)
    if (s == null) null
    else new GenericArrayData(s.map(UTF8String.fromString(_).asInstanceOf[Any]))
  }

  private val Empty = new GenericArrayData(Array.empty[Any])
  def emptyArray(): ArrayData = Empty

  private val ZeroStats =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](0L, 0L, 0L, 0L))
  def zeroStats(): org.apache.spark.sql.catalyst.InternalRow = ZeroStats

  /** Per-doc repetition counters in ONE pass — (mode-bigram count, bigram
    * total, trigram total, distinct-trigram count), exact integers. The
    * quality fractions derived from them (Gopher/C4 repetition signals)
    * become pure in-scan arithmetic: no per-gram explode, no (doc, gram)
    * shuffle — the counters never leave the row. Same tokenization and
    * shingle strings as [[sig]]/[[distinctShingles]].
    */
  def repetitionStats(text: String): org.apache.spark.sql.catalyst.InternalRow = {
    val tokens = text.split(" ", -1)
    val sb = new java.lang.StringBuilder
    var top2 = 0L
    val n2 = math.max(tokens.length - 1, 0)
    if (n2 > 0) {
      val m = new java.util.HashMap[String, Integer]()
      var i = 0
      while (i <= tokens.length - 2) {
        val c = m.merge(shingleAt(tokens, i, 2, sb), 1, (a, b) => a + b)
        if (c.longValue() > top2) top2 = c.longValue()
        i += 1
      }
    }
    val n3 = math.max(tokens.length - 2, 0)
    var d3 = 0
    if (n3 > 0) {
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i <= tokens.length - 3) {
        seen.add(shingleAt(tokens, i, 3, sb)): Unit
        i += 1
      }
      d3 = seen.size
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](top2, n2.toLong, n3.toLong, d3.toLong))
  }

  /** Adjacent character pairs within each word of `text` (split on single
    * spaces, empties kept; pairs NOT deduplicated — BPE training counts
    * occurrences). Word "abc" → ["ab", "bc"]; words shorter than 2 chars
    * contribute nothing. One pass, no lambda interpretation (codegen entry
    * point for [[CharPairs]]).
    */
  def charPairs(text: String): ArrayData = {
    val tokens = text.split(" ", -1)
    val out = new java.util.ArrayList[Any]()
    var w = 0
    while (w < tokens.length) {
      val t = tokens(w)
      var i = 0
      while (i + 2 <= t.length) {
        out.add(UTF8String.fromString(t.substring(i, i + 2)))
        i += 1
      }
      w += 1
    }
    if (out.isEmpty) Empty else new GenericArrayData(out.toArray)
  }

  /** Hashed char-bigram bucket ids in ONE codepoint pass: element i is
    * (cp_i·31 + cp_{i+1}) mod b — e91's feature extractor. Code-point
    * (not UTF-16-unit) stepping matches DuckDB's unicode()-arithmetic
    * oracle exactly; no per-gram string allocation, no md5. Empty array
    * for null text or fewer than 2 codepoints.
    */
  def charBigramBuckets(text: String, b: Int): ArrayData = {
    val out = new java.util.ArrayList[Any]()
    var i = 0
    var prev = -1
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (prev >= 0) out.add(java.lang.Integer.valueOf((prev * 31 + cp) % b))
      prev = cp
      i += Character.charCount(cp)
    }
    if (out.isEmpty) Empty else new GenericArrayData(out.toArray)
  }

  /** Winnowed substring fingerprints (Schleimer et al. 2003): distinct
    * sliding-window minima (window `winnowW`, first-occurrence order) of
    * the exact base-31 polynomial hash of every `w`-codepoint window of
    * `text` — value-identical to [[graft.llm.Dedup.winnowFingerprints]]'s
    * HOF spec (pinned by LlmSpec), computed in ONE O(len) pass: rolling
    * polynomial update + monotonic-deque sliding min. The HOF form is
    * O(len²·w) interpreted in practice because CollapseProject inlines the
    * hash-array's defining `transform` into the winnow lambda, so every
    * winnow position re-materializes the whole hash array (measured: 18
    * MINUTES for 500 docs at sf0.01 vs sub-second here). Null for null
    * text and for docs shorter than `w + winnowW − 1` codepoints (too
    * short to fill one winnow window — no fingerprint evidence).
    *
    * Exactness: code points < 0x110000 and 31⁷ ≈ 2.8e10 keep every term
    * < 2⁶³/8, so the Long arithmetic never wraps and the rolling update
    * equals the direct sum bit-for-bit (engine-portable, matches DuckDB's
    * integer evaluation of the same polynomial).
    */
  def winnowFps(text: String, w: Int, winnowW: Int): ArrayData = {
    val cps = text.codePoints().toArray
    val n = cps.length
    if (n < w + winnowW - 1) return null
    val nh = n - w + 1 // number of w-windows
    var top = 1L // 31^(w-1), the outgoing codepoint's weight
    var j = 1
    while (j < w) { top *= 31L; j += 1 }
    val hs = new Array[Long](nh)
    var h = 0L
    j = 0
    while (j < w) { h = h * 31L + cps(j); j += 1 }
    hs(0) = h
    var i = 1
    while (i < nh) {
      h = (h - cps(i - 1) * top) * 31L + cps(i + w - 1)
      hs(i) = h
      i += 1
    }
    // sliding min over winnowW consecutive hashes: monotonic index deque
    // (front = current window's min), minima deduped in first-occurrence
    // order to mirror array_distinct over the spec's minima sequence
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val dq = new Array[Int](nh)
    var head = 0
    var tail = 0
    i = 0
    while (i < nh) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - winnowW) head += 1
      if (i >= winnowW - 1) out.add(hs(dq(head))): Unit
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(arr)
  }

  /** Distinct word n-gram shingles, first-occurrence order — the same
    * tokenization and joining as [[sig]]; value-identical to
    * `array_distinct(transform(...))` over the HOF spec (codegen entry
    * point for [[DistinctShingles]]).
    */
  def distinctShingles(text: String, n: Int): ArrayData = {
    val tokens = text.split(" ", -1)
    if (tokens.length < n) return Empty
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= tokens.length - n) {
      seen.add(shingleAt(tokens, i, n, sb)): Unit
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** ALL word n-gram shingles in position order (element i = the shingle
    * starting at word i; duplicates kept) — the positional sibling of
    * [[distinctShingles]] for span-level work: `posexplode` over the
    * result yields (position, shingle) directly. Empty for short/null.
    */
  def posShingles(text: String, n: Int): ArrayData = {
    val tokens = text.split(" ", -1)
    if (tokens.length < n) return Empty
    val sb = new java.lang.StringBuilder
    val out = new Array[Any](tokens.length - n + 1)
    var i = 0
    while (i <= tokens.length - n) {
      out(i) = UTF8String.fromString(shingleAt(tokens, i, n, sb))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Distinct word n-gram shingles in one pass (first-occurrence order) —
  * value-identical to `array_distinct(Dedup.shingles(text, n))` (the HOF
  * executable spec, pinned by LlmSpec) without the per-element interpreted
  * lambdas and the O(tokens²) re-evaluation of the token array inside the
  * lambda. Empty array for docs shorter than n tokens AND for null text
  * (mirroring the spec's `when(size < n, …).otherwise(empty)` null fold).
  */
case class DistinctShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinhashKernel.emptyArray()
    else MinhashKernel.distinctShingles(v.asInstanceOf[UTF8String].toString, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  ${c.isNull} ? graft.functions.MinhashKernel.emptyArray()
         |    : graft.functions.MinhashKernel.distinctShingles(${c.value}.toString(), $n);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)
  override def prettyName: String = "distinct_shingles"
}

/** ALL word n-gram shingles in position order (duplicates kept; element i
  * starts at word i) — see [[MinhashKernel.posShingles]]. Empty array for
  * docs shorter than n tokens and for null text.
  */
case class PosShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinhashKernel.emptyArray()
    else MinhashKernel.posShingles(v.asInstanceOf[UTF8String].toString, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  ${c.isNull} ? graft.functions.MinhashKernel.emptyArray()
         |    : graft.functions.MinhashKernel.posShingles(${c.value}.toString(), $n);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PosShingles =
    copy(child = newChild)
  override def prettyName: String = "pos_shingles"
}

/** Per-doc repetition counters (struct<top2,n2,n3,d3> of exact longs) in
  * one pass — see [[MinhashKernel.repetitionStats]]. Zero struct for null
  * text (a null doc has no grams), so every document keeps a row.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("top2", LongType, nullable = false),
    StructField("n2", LongType, nullable = false),
    StructField("n3", LongType, nullable = false),
    StructField("d3", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinhashKernel.zeroStats()
    else MinhashKernel.repetitionStats(v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
         |  ${c.isNull} ? graft.functions.MinhashKernel.zeroStats()
         |    : graft.functions.MinhashKernel.repetitionStats(${c.value}.toString());
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
  override def prettyName: String = "repetition_stats"
}

/** Adjacent character pairs within each word, occurrences kept — the
  * corpus-wide pair-counting primitive inside one BPE tokenizer-training
  * merge step. Same kernel shape as [[DistinctShingles]]: per-row scalar,
  * stays inside WholeStageCodegen, empty array for null text.
  */
case class CharPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinhashKernel.emptyArray()
    else MinhashKernel.charPairs(v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  ${c.isNull} ? graft.functions.MinhashKernel.emptyArray()
         |    : graft.functions.MinhashKernel.charPairs(${c.value}.toString());
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CharPairs =
    copy(child = newChild)
  override def prettyName: String = "char_pairs"
}

/** Hashed char-bigram bucket ids — e91's feature extractor as a per-row
  * kernel inside WholeStageCodegen (the interpreted HOF + md5-hex
  * formulation it replaces measured 5 s on the sf0.1 bench — at the
  * per-query bar — for what is one arithmetic pass over the text).
  */
case class CharBigramBuckets(child: Expression, b: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinhashKernel.emptyArray()
    else MinhashKernel.charBigramBuckets(v.asInstanceOf[UTF8String].toString, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  ${c.isNull} ? graft.functions.MinhashKernel.emptyArray()
         |    : graft.functions.MinhashKernel.charBigramBuckets(${c.value}.toString(), $b);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CharBigramBuckets =
    copy(child = newChild)
  override def prettyName: String = "char_bigram_buckets"
}

/** Winnowed substring fingerprints in one O(len) pass — see
  * [[MinhashKernel.winnowFps]] for the algorithm and why the composable
  * HOF spec ([[graft.llm.Dedup.winnowFingerprints]]) is quadratic in
  * practice. Null for null text and docs shorter than `w + winnowW − 1`
  * codepoints, mirroring the spec's `when(length ≥ …)` guard.
  */
case class WinnowFp(child: Expression, w: Int, winnowW: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.winnowFps(input.asInstanceOf[UTF8String].toString, w, winnowW)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinhashKernel.winnowFps($c.toString(), $w, $winnowW);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
  override def prettyName: String = "winnow_fps"
}

object TextExpressions {
  /** Single-pass k-permutation minhash signature of a text column
    * (array<string> of lowercase md5 hex minima; null when no shingles).
    */
  def minhashSig(text: Column, n: Int, k: Int): Column =
    column(MinhashSig(expression(text), n, k))

  /** Distinct word n-gram shingles (one pass, first-occurrence order). */
  def distinctShingles(text: Column, n: Int): Column =
    column(DistinctShingles(expression(text), n))

  /** Adjacent within-word character pairs, occurrences kept (BPE step). */
  def charPairs(text: Column): Column =
    column(CharPairs(expression(text)))

  /** Hashed char-bigram bucket ids (e91): (cp·31 + cp′) mod b per position. */
  def charBigramBuckets(text: Column, b: Int): Column =
    column(CharBigramBuckets(expression(text), b))

  /** All word n-gram shingles in position order (duplicates kept). */
  def posShingles(text: Column, n: Int): Column =
    column(PosShingles(expression(text), n))

  /** One-pass per-doc repetition counters: struct(top2, n2, n3, d3). */
  def repetitionStats(text: Column): Column =
    column(RepetitionStats(expression(text)))

  /** Winnowed substring fingerprints: distinct sliding-window minima of
    * the w-codepoint rolling polynomial hashes (null when too short).
    */
  def winnowFps(text: Column, w: Int = 8, winnowW: Int = 4): Column =
    column(WinnowFp(expression(text), w, winnowW))
}
