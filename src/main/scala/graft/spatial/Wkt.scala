package graft.spatial

import org.locationtech.jts.geom._
import org.locationtech.jts.io.{WKTReader, WKTWriter}

/** JTS-backed WKT geometry kernel (jts-core ships on the Spark classpath).
  *
  * The reference treats geometry as WKT *text* end-to-end — serialized by the
  * backend (`ST_AsText`, datum/postgis/table.py:54-59;
  * `SDO_UTIL.TO_WKTGEOMETRY`, datum/oracle_stgeom/database.py:93-95), munged
  * with regexes client-side, parsed by the backend on write
  * (`ST_GeomFromText`, datum/postgis/table.py:179-181). We keep WKT strings
  * as the canonical interchange (DuckDB-comparable) and use JTS only where
  * real geometry math is needed.
  *
  * All methods are pure and thread-safe (fresh reader/writer per call —
  * JTS readers are not thread-safe; cost is negligible vs parse itself).
  */
object Wkt {
  private val gf = new GeometryFactory()

  def parse(wkt: String): Geometry = new WKTReader(gf).read(wkt)

  def point(x: Double, y: Double): Geometry = gf.createPoint(new Coordinate(x, y))

  /** Boundary-inclusive point containment (the [[StFunctions.StCoversPoint]]
    * semantics as a pure function — the expression adds PreparedGeometry
    * memoization on top, same JTS predicate underneath).
    */
  def covers(polyWkt: String, x: Double, y: Double): Boolean =
    parse(polyWkt).covers(point(x, y))

  def write(g: Geometry): String = new WKTWriter().write(g)

  /** parse ∘ write normalization (d1 roundtrip). */
  def normalize(wkt: String): String = write(parse(wkt))

  /** Force 2D: drop Z ordinates (ref ST_Force2D after 'NaN'→'0' scrub,
    * datum/postgis/table.py:183-187, datum/oracle_stgeom/table.py:324-328).
    */
  def force2D(wkt: String): String = {
    val g = parse(wkt.replace("NaN", "0"))
    g.apply(new CoordinateSequenceFilter {
      private var changed = false
      override def filter(seq: CoordinateSequence, i: Int): Unit = {
        if (seq.getDimension > 2) { seq.setOrdinate(i, 2, Double.NaN); changed = true }
      }
      override def isDone: Boolean = false
      override def isGeometryChanged: Boolean = changed
    })
    new WKTWriter(2).write(g)
  }

  /** Wrap a single geometry as its MULTI counterpart when the target column
    * type is MULTI (ref ST_Multi decision, datum/postgis/table.py:247-254,
    * datum/oracle_stgeom/table.py:390-410). String-level (no JTS roundtrip)
    * so the output stays byte-comparable with SQL-engine string ops.
    */
  def multi(wkt: String): String = {
    val t = wkt.trim
    if (t.startsWith("MULTI") || t.startsWith("GEOMETRYCOLLECTION")) t
    else {
      val p = t.indexOf('(')
      if (p < 0) t // e.g. 'POINT EMPTY'
      else {
        val typ = t.substring(0, p).trim
        s"MULTI$typ (${t.substring(p)})"
      }
    }
  }

  /** OGC type token from WKT (ref re.match('[A-Z]+', wkt),
    * datum/postgis/table.py:241-242).
    */
  def geomTypeOf(wkt: String): String = wkt.trim.takeWhile(c => c.isLetter).toUpperCase

  /** Linearize curve geometries (ref delegates to backend ST_CurveToLine /
    * SDO_GEOM, datum/postgis/table.py:189-191 — JTS has no curve types, so
    * each 3-point arc is approximated with `segmentsPerArc` chords;
    * documented approximation, curves never occur in the driver data).
    *
    *  - CIRCULARSTRING(p0 p1 p2, …)           → LINESTRING
    *  - COMPOUNDCURVE(seg, seg, …)            → LINESTRING (segments are
    *    CIRCULARSTRINGs or bare point lists; shared endpoints fused)
    *  - CURVEPOLYGON(ring, ring, …)           → POLYGON (rings may be any
    *    curve segment type; first ring is the shell, rest are holes)
    *  - anything else                          → normalized unchanged
    */
  def curveToLine(wkt: String, segmentsPerArc: Int = 32): String =
    curveToLineWith(wkt, (_, _) => segmentsPerArc)

  /** Tolerance-driven linearization (PostGIS `ST_CurveToLine(geom, tol,
    * toltype => 1)` semantics): per arc, the chord count is the smallest
    * n whose maximum chord-to-arc deviation (the sagitta r·(1−cos(Δ/2))
    * of one chord subtending Δ = sweep/n) stays ≤ `tolerance`, capped to
    * [1, 8192]. Unlike the fixed count, a tight arc gets more chords and
    * a near-straight one fewer — the deviation CONTRACT is uniform, which
    * is what a consumer meshing mixed-radius curves actually needs.
    */
  def curveToLineTol(wkt: String, tolerance: Double): String = {
    require(tolerance > 0, s"curveToLineTol: tolerance must be positive, got $tolerance")
    curveToLineWith(wkt, (r, sweep) => segmentsFor(r, sweep, tolerance))
  }

  /** Chords for one arc of radius `r`, absolute sweep `sweep`, under
    * sagitta bound `tol`: one chord subtending Δ deviates r·(1−cos(Δ/2)),
    * so Δmax = 2·acos(max(−1, 1 − tol/r)) and n = ceil(sweep/Δmax).
    */
  private[spatial] def segmentsFor(r: Double, sweep: Double, tol: Double): Int = {
    val dMax = 2.0 * math.acos(math.max(-1.0, 1.0 - tol / r))
    if (dMax <= 0) 8192
    else math.min(8192, math.max(1, math.ceil(math.abs(sweep) / dMax).toInt))
  }

  private def curveToLineWith(wkt: String, nOf: (Double, Double) => Int): String = {
    val t = wkt.trim
    val up = t.toUpperCase
    if (up.startsWith("CIRCULARSTRING"))
      write(gf.createLineString(circularCoords(innerOf(t), nOf)))
    else if (up.startsWith("COMPOUNDCURVE"))
      write(gf.createLineString(compoundCoords(innerOf(t), nOf)))
    else if (up.startsWith("CURVEPOLYGON")) {
      val rings = splitTopLevel(innerOf(t)).map(r => closeRing(segmentCoords(r, nOf)))
      val shell = gf.createLinearRing(rings.head)
      val holes = rings.tail.map(gf.createLinearRing)
      write(gf.createPolygon(shell, holes.toArray))
    } else normalize(t)
  }

  /** Content between the first '(' and the matching final ')'. */
  private def innerOf(s: String): String =
    s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))

  /** Split on commas at parenthesis depth 0. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.map(_.trim).toSeq
  }

  /** One curve segment (CIRCULARSTRING, nested COMPOUNDCURVE, or a bare
    * parenthesized point list) → linearized coordinates.
    */
  private def segmentCoords(seg: String, nOf: (Double, Double) => Int): Array[Coordinate] = {
    val up = seg.toUpperCase
    if (up.startsWith("CIRCULARSTRING")) circularCoords(innerOf(seg), nOf)
    else if (up.startsWith("COMPOUNDCURVE")) compoundCoords(innerOf(seg), nOf)
    else plainCoords(if (seg.startsWith("(")) innerOf(seg) else seg)
  }

  private def plainCoords(inner: String): Array[Coordinate] =
    inner.split(",").map { s =>
      val Array(x, y) = s.trim.split("\\s+").map(_.toDouble)
      new Coordinate(x, y)
    }

  private def circularCoords(inner: String, nOf: (Double, Double) => Int): Array[Coordinate] = {
    val pts = plainCoords(inner)
    require(pts.length >= 3 && pts.length % 2 == 1, s"bad CIRCULARSTRING arity ${pts.length}")
    val out = scala.collection.mutable.ArrayBuffer[Coordinate](pts.head)
    var i = 0
    while (i + 2 < pts.length) {
      out ++= sampleArc(pts(i), pts(i + 1), pts(i + 2), nOf).tail
      i += 2
    }
    out.toArray
  }

  /** Concatenate component segments, fusing the shared endpoints. */
  private def compoundCoords(inner: String, nOf: (Double, Double) => Int): Array[Coordinate] = {
    val segs = splitTopLevel(inner).map(segmentCoords(_, nOf))
    val out = scala.collection.mutable.ArrayBuffer[Coordinate](segs.head.toIndexedSeq: _*)
    segs.tail.foreach(out ++= _.tail)
    out.toArray
  }

  /** Arc endpoints are re-derived from center+angle, so a closed curve ring
    * can land ~1e-10 off its start — JTS requires EXACT closure.
    */
  private def closeRing(c: Array[Coordinate]): Array[Coordinate] =
    if (c.head.equals2D(c.last)) c
    else { c(c.length - 1) = c.head.copy(); c }

  /** Sample the circular arc through (p0, p1, p2); the chord count comes
    * from `nOf(radius, |sweep|)` — a constant for the fixed-count surface,
    * the sagitta bound for the tolerance surface.
    */
  private def sampleArc(p0: Coordinate, p1: Coordinate, p2: Coordinate,
      nOf: (Double, Double) => Int): Seq[Coordinate] = {
    // circumcenter of the three points
    val ax = p0.x; val ay = p0.y; val bx = p1.x; val by = p1.y; val cx = p2.x; val cy = p2.y
    val d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if (math.abs(d) < 1e-12) return Seq(p0, p1, p2) // collinear → straight
    val ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay) +
      (cx * cx + cy * cy) * (ay - by)) / d
    val uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx) +
      (cx * cx + cy * cy) * (bx - ax)) / d
    val r = math.hypot(ax - ux, ay - uy)
    val a0 = math.atan2(ay - uy, ax - ux)
    val a1 = math.atan2(by - uy, bx - ux)
    val a2 = math.atan2(cy - uy, cx - ux)
    // sweep from a0 through a1 to a2
    def norm(a: Double) = { var x = a; while (x < 0) x += 2 * math.Pi; while (x >= 2 * math.Pi) x -= 2 * math.Pi; x }
    val ccwTo1 = norm(a1 - a0); val ccwTo2 = norm(a2 - a0)
    val ccw = ccwTo1 <= ccwTo2 // p1 lies on the ccw path to p2
    val sweep = if (ccw) ccwTo2 else ccwTo2 - 2 * math.Pi
    val n = nOf(r, math.abs(sweep))
    (0 to n).map { k =>
      val a = a0 + sweep * k / n
      new Coordinate(ux + r * math.cos(a), uy + r * math.sin(a))
    }
  }

  /** Reproject every coordinate of a WKT geometry (ref client-side per-row
    * pyproj transform, datum/oracle_stgeom/table.py:307-313).
    */
  def transform(wkt: String, fromSrid: Int, toSrid: Int): String = {
    if (fromSrid == toSrid) return wkt
    (Projection.crsFor(fromSrid), Projection.crsFor(toSrid)) match {
      case (Some(from), Some(to)) => transformWith(wkt, from, to)
      case _ => // resolve through the int path for its descriptive error
        Projection.transform(0.0, 0.0, fromSrid, toSrid); wkt
    }
  }

  /** Reproject every coordinate between two RESOLVED CRSs — the
    * executor-side path (plan-time-captured [[Projection.Crs]] instances,
    * one registry resolution per QUERY instead of per coordinate).
    */
  def transformWith(wkt: String, from: Projection.Crs, to: Projection.Crs): String = {
    val g = parse(wkt)
    g.apply(new CoordinateFilter {
      override def filter(c: Coordinate): Unit = {
        val (x, y) = Projection.transformWith(c.x, c.y, from, to)
        c.x = x; c.y = y
      }
    })
    g.geometryChanged()
    write(g)
  }
}
