package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE (byte-pair-encoding) tokenizer kernels — the per-document
  * half of distributed tokenizer TRAINING (Sennrich et al. 2016,
  * arXiv:1508.07909; Gage 1994). A training iteration is: segment every
  * word under the merges learned so far, count adjacent token pairs
  * corpus-wide, pick the argmax — the counting side is a plain map-side-
  * combined groupBy, and THESE kernels supply the per-row segmentation,
  * so the only corpus-scale work per iteration is one aggregation. The
  * learned merge list is rank-ordered, tiny, and rides into the next
  * iteration's kernel as a broadcast-style literal (an
  * `addReferenceObj`), never a join.
  *
  * Merge application is the canonical greedy pass: merges apply in rank
  * order, each as one left-to-right non-overlapping sweep over the word's
  * token list ("aaaa" under (a,a) → [aa, aa]; "aaa" → [aa, a]) — exactly
  * the segmentation the training loop itself produces, which is what
  * makes the cross-engine oracle (a `list_reduce` fold in DuckDB)
  * bit-reproducible. Tokens are code-point strings joined by merges; the
  * pair key is `x|y` ('|' never occurs in corpus text — declared, and
  * tokens are concatenations of corpus characters, so the key is
  * unambiguous).
  */
object BpeKernel {
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Segment one word: code-point tokens, then each merge in rank order
    * as one greedy left-to-right pass. `merges` entries are `x|y` keys.
    */
  def tokens(word: String, merges: Array[String]): Array[String] = {
    var toks: Array[String] =
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var m = 0
    while (m < merges.length && toks.length > 1) {
      val key = merges(m)
      val bar = key.indexOf('|')
      val x = key.substring(0, bar)
      val y = key.substring(bar + 1)
      val out = new Array[String](toks.length)
      var i = 0
      var k = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
          out(k) = x + y; i += 2
        } else {
          out(k) = toks(i); i += 1
        }
        k += 1
      }
      toks = java.util.Arrays.copyOf(out, k)
      m += 1
    }
    toks
  }

  /** All adjacent token-pair keys (`x|y`, occurrences kept) across the
    * words of `text` segmented under `merges` — one training iteration's
    * per-row contribution. Empty array for null text.
    */
  def pairs(text: String, merges: Array[String]): ArrayData = {
    val words = text.split(" ", -1)
    val out = new java.util.ArrayList[Any]()
    var w = 0
    while (w < words.length) {
      if (words(w).nonEmpty) {
        val toks = tokens(words(w), merges)
        var i = 0
        while (i + 1 < toks.length) {
          out.add(UTF8String.fromString(toks(i) + "|" + toks(i + 1)))
          i += 1
        }
      }
      w += 1
    }
    if (out.isEmpty) Empty else new GenericArrayData(out.toArray)
  }

  /** Total token count of `text` segmented under `merges` (0 for null). */
  def tokenCount(text: String, merges: Array[String]): Long = {
    val words = text.split(" ", -1)
    var n = 0L
    var w = 0
    while (w < words.length) {
      if (words(w).nonEmpty) n += tokens(words(w), merges).length
      w += 1
    }
    n
  }
}

/** Adjacent token pairs of `text` under the rank-ordered `merges` (array
  * of `x|y` keys, occurrences kept; empty for null text — a null doc
  * contributes no counts but keeps its row).
  */
case class BpePairs(child: Expression, merges: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val mergesArr: Array[String] = merges.toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) BpeKernel.pairs("", mergesArr)
    else BpeKernel.pairs(v.asInstanceOf[UTF8String].toString, mergesArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("bpeMerges", mergesArr, "java.lang.String[]")
    ev.copy(code =
      code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  graft.functions.BpeKernel.pairs(${c.isNull} ? "" : ${c.value}.toString(), $ref);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BpePairs =
    copy(child = newChild)
  override def prettyName: String = "bpe_pairs"
}

/** Token count of `text` segmented under the rank-ordered `merges` (0 for
  * null text).
  */
case class BpeTokenCount(child: Expression, merges: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  @transient private lazy val mergesArr: Array[String] = merges.toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else BpeKernel.tokenCount(v.asInstanceOf[UTF8String].toString, mergesArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("bpeMerges", mergesArr, "java.lang.String[]")
    ev.copy(code =
      code"""
         |${c.code}
         |long ${ev.value} =
         |  ${c.isNull} ? 0L : graft.functions.BpeKernel.tokenCount(${c.value}.toString(), $ref);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
  override def prettyName: String = "bpe_token_count"
}

object BpeExpressions {
  /** Adjacent token-pair keys (`x|y`) under rank-ordered merges. */
  def bpePairs(text: Column, merges: Seq[String]): Column =
    column(BpePairs(expression(text), merges))

  /** Token count under rank-ordered merges. */
  def bpeTokenCount(text: Column, merges: Seq[String]): Column =
    column(BpeTokenCount(expression(text), merges))
}
