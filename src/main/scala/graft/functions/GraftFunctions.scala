package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.spatial.StFunctions._

/** SQL-surface registration for the custom Catalyst expressions, so
  * `db.execute`/`spark.sql` users get the spatial + vector functions by
  * name (the reference's users wrote backend SQL with ST_* functions in
  * it — this restores that spelling on Spark):
  *
  *   SELECT st_normalize_wkt(wkt), st_transform(wkt, 2272, 4326), ...
  *   SELECT vec_dot(a, b) ...
  *
  * Two registration paths:
  *  - [[GraftExtensions]] for session construction
  *    (`SparkSession.builder.withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.functions.GraftExtensions`);
  *  - [[GraftFunctions.register]] for an already-running session.
  */
object GraftFunctions {
  private type Builder = Seq[Expression] => Expression

  /** Literal int argument (e.g. the n/k of minhash_sig) — must be foldable. */
  private def intArg(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: n/k arguments must be literals")
    e.eval(null) match {
      case i: Int => i; case l: Long => l.toInt; case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(s"$fn: integer literal expected, got $other")
    }
  }

  /** Literal numeric argument as double (e.g. a linearization tolerance). */
  private def dblArg(e: Expression, fn: String): Double = {
    require(e.foldable, s"$fn: tolerance argument must be a literal")
    e.eval(null) match {
      case d: Double => d; case f: Float => f.toDouble
      case i: Int => i.toDouble; case l: Long => l.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(s"$fn: numeric literal expected, got $other")
    }
  }

  /** Literal array-of-numeric argument (e.g. quantile percentages). */
  private def dblSeqArg(e: Expression, fn: String): Seq[Double] = {
    require(e.foldable, s"$fn: percentages argument must be a literal array")
    e.eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map { i =>
          if (a.isNullAt(i)) throw new IllegalArgumentException(
            s"$fn: array<numeric> literal expected, got a null element at index $i")
          a.get(i, e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType) match {
            case d: Double => d; case f: Float => f.toDouble
            case n: Int => n.toDouble; case l: Long => l.toDouble
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case other => throw new IllegalArgumentException(
              s"$fn: numeric array element expected, got $other")
          }
        }
      case other => throw new IllegalArgumentException(
        s"$fn: array<numeric> literal expected, got $other")
    }
  }

  /** Literal array-of-string argument (e.g. trained BPE merges). */
  private def stringSeqArg(e: Expression, fn: String): Seq[String] = {
    require(e.foldable, s"$fn: merges argument must be a literal array")
    e.eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map { i =>
          if (a.isNullAt(i)) throw new IllegalArgumentException(
            s"$fn: array<string> literal expected, got a null element at index $i")
          a.getUTF8String(i).toString
        }
      case other => throw new IllegalArgumentException(
        s"$fn: array<string> literal expected, got $other")
    }
  }

  val all: Seq[(String, Builder)] = Seq(
    "st_normalize_wkt" -> (es => StNormalizeWkt(es.head)),
    "st_astext"        -> (es => StNormalizeWkt(es.head)),
    "st_geomfromtext"  -> (es => StNormalizeWkt(es.head)),
    "st_force2d"       -> (es => StForce2D(es.head)),
    // optional 2nd arg = max chord-to-arc deviation (PostGIS toltype 1
    // ONLY — a 3rd toltype argument is rejected, not silently dropped:
    // PostGIS's toltype-0/2 calls would otherwise get wrong-semantics
    // output with no error)
    "st_curvetoline"   -> { es =>
      require(es.length <= 2, "st_curvetoline: supports (wkt) or " +
        "(wkt, tolerance) with toltype-1 (max deviation) semantics only; " +
        s"got ${es.length} arguments")
      StCurveToLine(es.head,
        if (es.length > 1) Some(dblArg(es(1), "st_curvetoline")) else None)
    },
    "st_transform"     -> (es => StTransform(es(0), es(1), es(2))),
    // coordinate args cast like the Column API does — without this the
    // SQL surface would reject integer literals/columns the Column
    // surface silently accepts (same function, two behaviors)
    "st_covers_point"  -> (es => StCoversPoint(es(0),
      org.apache.spark.sql.catalyst.expressions.Cast(es(1), org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.catalyst.expressions.Cast(es(2), org.apache.spark.sql.types.DoubleType))),
    "st_area"          -> (es => StArea(es.head)),
    "st_length"        -> (es => StLength(es.head)),
    "vec_dot"          -> (es => graft.functions.VecDot(es(0), es(1))),
    // text-sketch kernels for SQL users: minhash_sig(text, n, k),
    // distinct_shingles(text, n)
    "minhash_sig"      -> (es => MinhashSig(es(0),
      intArg(es(1), "minhash_sig"), intArg(es(2), "minhash_sig"))),
    "distinct_shingles" -> (es => DistinctShingles(es(0),
      intArg(es(1), "distinct_shingles"))),
    "pos_shingles"     -> (es => PosShingles(es(0),
      intArg(es(1), "pos_shingles"))),
    "winnow_fps"       -> (es => WinnowFp(es(0),
      intArg(es(1), "winnow_fps"), intArg(es(2), "winnow_fps"))),
    // one-pass repetition counters (top-bigram / dup-trigram fractions
    // ride this struct) and the char-bigram stream for LM scoring
    "repetition_stats" -> (es => RepetitionStats(es.head)),
    "char_pairs"       -> (es => CharPairs(es.head)),
    // tokenize under TRAINED merges: bpe_token_count(text, array('a|b',…))
    // — the merge list is a literal (train batch-side via llm.Bpe, embed
    // the result), so the kernel compiles it once per plan
    "bpe_token_count"  -> (es => BpeTokenCount(es(0),
      stringSeqArg(es(1), "bpe_token_count"))),
    // aggregate: the analyzer wraps a bare AggregateFunction from the
    // registry into an AggregateExpression exactly as for built-ins
    "bitmap_distinct"  -> (es => BitmapDistinct(es(0),
      if (es.length > 1) intArg(es(1), "bitmap_distinct") else 1 << 16)),
    // bloom_agg(hash64 [, mBits, k]) builds; bloom_contains(filter,
    // hash64 [, k]) probes — k must match between the two
    "bloom_agg"        -> (es => BloomAgg(es(0),
      if (es.length > 1) intArg(es(1), "bloom_agg") else 1 << 20,
      if (es.length > 2) intArg(es(2), "bloom_agg") else 5)),
    "bloom_contains"   -> (es => BloomContains(es(0), es(1),
      if (es.length > 2) intArg(es(2), "bloom_contains") else 5)),
    "bloom_hits"       -> (es => BloomHits(es(0), es(1),
      if (es.length > 2) intArg(es(2), "bloom_hits") else 5)),
    // topk_sketch(item [, capacity]) — mergeable Misra–Gries heavy hitters
    "topk_sketch"      -> (es => TopKSketch(es(0),
      if (es.length > 1) intArg(es(1), "topk_sketch") else 64)),
    // quantile_sketch(x, array(0.5, 0.9) [, k]) — certified-bound
    // mergeable percentiles (returns struct(values, err_bound, n))
    "quantile_sketch"  -> (es => QuantileSketch(
      org.apache.spark.sql.catalyst.expressions.Cast(es(0),
        org.apache.spark.sql.types.DoubleType),
      dblSeqArg(es(1), "quantile_sketch"),
      if (es.length > 2) intArg(es(2), "quantile_sketch") else 1024)))

  /** Register on a live session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit = all.foreach { case (name, b) =>
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, b, "built-in")
  }
}

/** Injectable extensions: spatial/vector functions available at session
  * build time on every executor-submitted plan.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), b))
    }
}
