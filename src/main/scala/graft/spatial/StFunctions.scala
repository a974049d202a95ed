package graft.spatial

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftglue.Bridge.{column, expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Spatial scalar function surface (SURVEY.md §2.5, reference functions
  * #27-#35). Two tiers:
  *
  *  - **String-level ops** (m-scrub, NaN scrub, MULTI wrap, type sniff) are
  *    pure built-in `regexp_replace`/`concat` compositions — fully inside
  *    whole-stage codegen, byte-identical to what a SQL engine computes on
  *    the same strings (the reference literally regexes WKT text,
  *    datum/oracle_stgeom/table.py:33-34,210-223).
  *  - **Geometry ops** (parse/normalize, force-2D, curve linearization,
  *    reprojection) are custom Catalyst `Expression`s over the JTS kernel
  *    ([[Wkt]]) — null-safe, evaluated per-row on executors with no
  *    serialization overhead beyond the string itself. They use
  *    `CodegenFallback` (the JTS call dominates; codegen of the wrapper
  *    would not measurably help, same tradeoff Spark itself makes for
  *    its `st_*` WKB expressions' non-arithmetic paths).
  */
object StFunctions {

  // ---- custom expressions -------------------------------------------------

  abstract class WktUnary extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    def op(s: String): String
    // analysis-time type check (ExpectsInputTypes is private[sql])
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${child.dataType.sql}")
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(op(v.asInstanceOf[UTF8String].toString))
  }

  /** WKT → canonical WKT via JTS parse∘write (ST_GeomFromText + ST_AsText,
    * ref datum/postgis/table.py:179-181, 54-59).
    */
  case class StNormalizeWkt(child: Expression) extends WktUnary {
    override def op(s: String): String = Wkt.normalize(s)
    override protected def withNewChildInternal(c: Expression): StNormalizeWkt = copy(c)
    override def prettyName: String = "st_normalize_wkt"
  }

  /** Drop Z/M dimensions after NaN→0 scrub (ST_Force2D,
    * ref datum/postgis/table.py:183-187).
    */
  case class StForce2D(child: Expression) extends WktUnary {
    override def op(s: String): String = Wkt.force2D(s)
    override protected def withNewChildInternal(c: Expression): StForce2D = copy(c)
    override def prettyName: String = "st_force2d"
  }

  /** Circular-arc linearization (ST_CurveToLine,
    * ref datum/postgis/table.py:189-191). With no tolerance: the fixed
    * 32-chords-per-arc surface. With `tolerance` (PostGIS
    * `ST_CurveToLine(geom, tol, toltype => 1)`): per-arc chord counts
    * from the sagitta bound — maximum chord-to-arc deviation ≤ tol.
    */
  case class StCurveToLine(child: Expression, tolerance: Option[Double] = None)
      extends WktUnary {
    tolerance.foreach(t => require(t > 0,
      s"st_curvetoline: tolerance must be positive, got $t"))
    override def op(s: String): String = tolerance match {
      case Some(t) => Wkt.curveToLineTol(s, t)
      case None => Wkt.curveToLine(s)
    }
    override protected def withNewChildInternal(c: Expression): StCurveToLine =
      copy(child = c)
    override def prettyName: String = "st_curve_to_line"
  }

  /** Reprojection wkt × fromSrid × toSrid → wkt (ST_Transform / pyproj,
    * ref datum/oracle_stgeom/table.py:307-313, util.py:5-19).
    */
  case class StTransform(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val intLike: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
      val ok = first.dataType == StringType &&
        Seq(second, third).forall(e => intLike.contains(e.dataType))
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, INT, INT), got " +
          s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")
    }
    private def asInt(v: Any): Int = v match {
      case i: Int => i; case l: Long => l.toInt; case s: Short => s.toInt; case b: Byte => b.toInt
    }
    /** CRS pair resolved at PLAN time (construction runs on the driver)
      * when both SRIDs are literals — the whole API surface passes
      * literals. The captured [[Projection.Crs]] instances serialize into
      * the task, so zones added via `Projection.registerCrs` (driver-side
      * registry) resolve correctly on remote executors, and the per-row
      * eval skips the registry lookup entirely. Non-literal SRID columns
      * fall back to executor-side resolution (built-in registry only).
      */
    private val planTimeCrs: Option[(Projection.Crs, Projection.Crs)] =
      (second, third) match {
        case (org.apache.spark.sql.catalyst.expressions.Literal(f, _),
              org.apache.spark.sql.catalyst.expressions.Literal(t, _))
            if f != null && t != null && asInt(f) != asInt(t) =>
          for { a <- Projection.crsFor(asInt(f)); b <- Projection.crsFor(asInt(t)) }
            yield (a, b)
        case _ => None
      }
    override def nullSafeEval(wkt: Any, from: Any, to: Any): Any = {
      val s = wkt.asInstanceOf[UTF8String].toString
      val (fi, ti) = (asInt(from), asInt(to))
      UTF8String.fromString(planTimeCrs match {
        case Some((a, b)) => Wkt.transformWith(s, a, b)
        case None => Wkt.transform(s, fi, ti)
      })
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): StTransform = copy(f, s, t)
    override def prettyName: String = "st_transform"
  }

  /** WKT → double measure (area / length). Exactness contract: on integer
    * (or low-bit) coordinates the shoelace products and perfect-square
    * segment lengths stay inside double precision, so a plain-SQL oracle
    * reproduces the value bit-for-bit — same discipline as the projection
    * kernels (golden values) but cheap enough to hash-check per row.
    */
  abstract class WktUnaryMeasure extends UnaryExpression with CodegenFallback {
    import org.apache.spark.sql.types.DoubleType
    override def dataType: DataType = DoubleType
    def op(s: String): Double
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${child.dataType.sql}")
    override def nullSafeEval(v: Any): Any =
      op(v.asInstanceOf[UTF8String].toString)
  }

  /** Planar area (ST_Area): JTS shoelace over the ring coordinates. */
  case class StArea(child: Expression) extends WktUnaryMeasure {
    override def op(s: String): Double = Wkt.parse(s).getArea
    override protected def withNewChildInternal(c: Expression): StArea = copy(c)
    override def prettyName: String = "st_area"
  }

  /** Planar length/perimeter (ST_Length): sum of segment hypotenuses. */
  case class StLength(child: Expression) extends WktUnaryMeasure {
    override def op(s: String): Double = Wkt.parse(s).getLength
    override protected def withNewChildInternal(c: Expression): StLength = copy(c)
    override def prettyName: String = "st_length"
  }

  /** Point-in-polygon predicate (ST_Covers(poly, point) — boundary
    * INCLUSIVE, so the answer is orientation-exact for integer/low-bit
    * coordinates on both JTS's robust predicates and a plain cross-product
    * SQL oracle). The polygon parses ONCE per distinct WKT per expression
    * instance (memoized PreparedGeometry) — with a literal polygon the
    * per-row cost is the prepared covers() test only, in-scan, no join.
    * A many-polygon containment JOIN is d9's grid-join recipe instead;
    * this is the scalar kernel.
    */
  case class StCoversPoint(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    import org.apache.spark.sql.types.{BooleanType, DoubleType}
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (first.dataType == StringType &&
          second.dataType == DoubleType && third.dataType == DoubleType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, DOUBLE, DOUBLE), got " +
          s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")
    // single-reference memo: the (wkt, geom) pair swaps atomically, so a
    // shared instance under concurrent eval can never pair one polygon's
    // text with another's prepared geometry (worst case: a redundant parse)
    @transient private var memo: (String, org.locationtech.jts.geom.prep.PreparedGeometry) = null
    private def prepared(wkt: String): org.locationtech.jts.geom.prep.PreparedGeometry = {
      val m = memo
      if (m != null && m._1 == wkt) m._2
      else {
        val p = org.locationtech.jts.geom.prep.PreparedGeometryFactory
          .prepare(Wkt.parse(wkt))
        memo = (wkt, p)
        p
      }
    }
    override def nullSafeEval(poly: Any, x: Any, y: Any): Any =
      prepared(poly.asInstanceOf[UTF8String].toString)
        .covers(Wkt.point(x.asInstanceOf[Double], y.asInstanceOf[Double])): java.lang.Boolean
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): StCoversPoint = copy(f, s, t)
    override def prettyName: String = "st_covers_point"
  }

  // ---- Column API ---------------------------------------------------------

  def stNormalizeWkt(c: Column): Column = column(StNormalizeWkt(expression(c)))
  def stAsText(c: Column): Column = stNormalizeWkt(c) // canonical storage is WKT
  def stGeomFromText(c: Column): Column = stNormalizeWkt(c)
  def stForce2DJts(c: Column): Column = column(StForce2D(expression(c)))
  def stCurveToLine(c: Column): Column = column(StCurveToLine(expression(c)))
  def stCurveToLine(c: Column, tolerance: Double): Column =
    column(StCurveToLine(expression(c), Some(tolerance)))
  def stTransform(c: Column, from: Column, to: Column): Column =
    column(StTransform(expression(c), expression(from), expression(to)))
  def stCoversPoint(poly: Column, x: Column, y: Column): Column =
    column(StCoversPoint(expression(poly),
      expression(x.cast("double")), expression(y.cast("double"))))
  def stArea(c: Column): Column = column(StArea(expression(c)))
  def stLength(c: Column): Column = column(StLength(expression(c)))

  /** String-level force-2D for the POINT Z fixture shape: 'NaN'→'0' then
    * drop the third ordinate. Kept regex-only (no JTS) so a SQL oracle can
    * reproduce it byte-for-byte (SURVEY.md §7.3 #4). Built-ins → codegen'd.
    */
  def stForce2DPoint(c: Column): Column = {
    val scrubbed = regexp_replace(c, "NaN", "0")
    regexp_replace(scrubbed,
      "^POINT Z ?\\(\\s*(\\S+)\\s+(\\S+)\\s+\\S+\\s*\\)$", "POINT ($1 $2)")
  }

  /** M-value scrub: drop ' M' type modifier and ' 1.#QNAN000' ordinates
    * (ref MSUFFIX/MVALUE regexes, datum/oracle_stgeom/table.py:33-34,
    * 210-223, 289-297). No lookahead (RE2-safe ⇒ oracle-reproducible).
    */
  def mScrub(c: Column): Column =
    regexp_replace(regexp_replace(c, " M \\(", " ("), " 1\\.#QNAN000", "")

  /** Wrap single geometry as MULTI when the target column is MULTI
    * (ref datum/postgis/table.py:198-199,247-254). String-level.
    */
  def stMulti(c: Column): Column = {
    val p = instr(c, "(")
    val alreadyMulti = c.startsWith("MULTI") || c.startsWith("GEOMETRYCOLLECTION")
    when(alreadyMulti || p === 0, c).otherwise(
      concat(lit("MULTI"), trim(substring(c, lit(1), p - 1)), lit(" ("),
        substr(c, p, length(c)), lit(")")))
  }

  /** Geometry type token from WKT (ref datum/postgis/table.py:241-242). */
  def wktGeomType(c: Column): Column = regexp_extract(c, "^[A-Z]+", 0)

  /** Null → '<TYPE> EMPTY' (ref datum/oracle_stgeom/table.py:320-322). */
  def emptyWkt(c: Column, geomType: String): Column =
    coalesce(c, lit(s"$geomType EMPTY"))
}
