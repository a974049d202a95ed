package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spatial.{Projection, SpatialJoin, Wkt}

/** WKT kernel + projection math (SURVEY.md §2.5, reference edge cases from
  * FIXTURES.md §3: NaN coords, ' M' values, '1.#QNAN000', curves, EMPTY,
  * MULTI/single mismatch).
  */
class SpatialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("normalize: parse∘write canonicalizes formatting") {
    assert(Wkt.normalize("POINT(1 2)") == "POINT (1 2)")
    assert(Wkt.normalize("POLYGON((0 0,1 0,1 1,0 0))") == "POLYGON ((0 0, 1 0, 1 1, 0 0))")
    assert(Wkt.normalize("POINT EMPTY") == "POINT EMPTY")
  }

  test("force2D: NaN→0 then Z dropped (ref datum/postgis/table.py:183-187)") {
    assert(Wkt.force2D("POINT Z (1 2 NaN)") == "POINT (1 2)")
    assert(Wkt.force2D("POINT Z (1 2 3)") == "POINT (1 2)")
  }

  test("multi: wraps single, passes MULTI/EMPTY through (ref :247-254)") {
    assert(Wkt.multi("POLYGON ((0 0, 1 0, 1 1, 0 0))") ==
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")
    assert(Wkt.multi("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))") ==
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")
    assert(Wkt.multi("POINT EMPTY") == "POINT EMPTY")
    // JTS accepts the wrapped output — textual wrap is geometrically valid
    assert(Wkt.parse(Wkt.multi("POLYGON ((0 0, 1 0, 1 1, 0 0))")).isValid)
  }

  test("geomTypeOf sniffs the leading type token (ref :241-242)") {
    assert(Wkt.geomTypeOf("MULTIPOLYGON (((0 0)))") == "MULTIPOLYGON")
    assert(Wkt.geomTypeOf(" POINT (1 2)") == "POINT")
  }

  test("curveToLine: half-circle arc points stay on the circle") {
    // arc through (0,0) (1,1) (2,0): circle center (1,0) radius 1
    val out = Wkt.curveToLine("CIRCULARSTRING(0 0, 1 1, 2 0)")
    val g = Wkt.parse(out)
    assert(g.getGeometryType == "LineString")
    assert(g.getNumPoints == 33) // 32 chords
    g.getCoordinates.foreach { c =>
      assert(math.abs(math.hypot(c.x - 1, c.y) - 1.0) < 1e-9, s"off-circle: $c")
    }
    // endpoints preserved
    assert(g.getCoordinates.head.x == 0 && g.getCoordinates.last.x == 2)
    // non-curves normalize unchanged
    assert(Wkt.curveToLine("POINT (1 2)") == "POINT (1 2)")
  }

  test("curveToLineTol: chord count follows the sagitta bound per arc") {
    // unit half-circle, tol 0.1: dMax = 2*acos(0.9) ~ 0.9027 rad,
    // n = ceil(pi/0.9027) = 4 chords
    val out = Wkt.curveToLineTol("CIRCULARSTRING(0 0, 1 1, 2 0)", 0.1)
    val g = Wkt.parse(out)
    assert(g.getNumPoints == 5, s"expected 4 chords, got ${g.getNumPoints - 1}")
    g.getCoordinates.foreach { c =>
      assert(math.abs(math.hypot(c.x - 1, c.y) - 1.0) < 1e-9, s"off-circle: $c")
    }
    assert(g.getCoordinates.head.x == 0 && g.getCoordinates.last.x == 2)
    // every chord's sagitta within tol: subtended angle pi/4 around (1,0)
    g.getCoordinates.sliding(2).foreach { w =>
      val mid = new org.locationtech.jts.geom.Coordinate(
        (w(0).x + w(1).x) / 2, (w(0).y + w(1).y) / 2)
      val sag = 1.0 - math.hypot(mid.x - 1, mid.y) // arc at r=1 minus chord mid
      assert(sag <= 0.1 + 1e-9, s"sagitta $sag over tol")
    }
    // a loose tolerance collapses to a single chord; the d6 fixed surface
    // is unchanged at 32; the d18 golden family uses 6 chords (r=50, tol 2)
    assert(Wkt.parse(Wkt.curveToLineTol("CIRCULARSTRING(0 0, 1 1, 2 0)", 2.0))
      .getNumPoints == 2)
    val d18 = Wkt.parse(Wkt.curveToLineTol(
      "CIRCULARSTRING(2661000 220500, 2661050 220550, 2661100 220500)", 2.0))
    assert(d18.getNumPoints == 7, s"d18 family: ${d18.getNumPoints}")
    // tighter tolerance => more chords, monotone
    assert(Wkt.parse(Wkt.curveToLineTol("CIRCULARSTRING(0 0, 1 1, 2 0)", 0.001))
      .getNumPoints > 33)
    intercept[IllegalArgumentException](Wkt.curveToLineTol("POINT (0 0)", -1.0))
  }

  test("curveToLine: COMPOUNDCURVE fuses arc and straight segments") {
    val out = Wkt.curveToLine("COMPOUNDCURVE(CIRCULARSTRING(0 0, 1 1, 2 0), (2 0, 4 0))")
    val g = Wkt.parse(out)
    assert(g.getGeometryType == "LineString")
    val cs = g.getCoordinates
    assert(cs.head.equals2D(new org.locationtech.jts.geom.Coordinate(0, 0)))
    assert(cs.last.equals2D(new org.locationtech.jts.geom.Coordinate(4, 0)))
    // arc points lie on the circle through (0 0),(1 1),(2 0): center (1,0), r 1
    cs.filter(c => c.x <= 2.0).foreach { c =>
      assert(math.abs(math.hypot(c.x - 1, c.y) - 1.0) < 1e-9, s"off circle: $c")
    }
    // the straight tail is present and straight
    assert(cs.count(c => c.x > 2.0 + 1e-9) >= 1)
  }

  test("curveToLine: CURVEPOLYGON linearizes shell and holes (area check)") {
    // full circular ring: two arcs around center (2,0), r=2
    val shellOnly = Wkt.curveToLine(
      "CURVEPOLYGON(CIRCULARSTRING(0 0, 2 2, 4 0, 2 -2, 0 0))", segmentsPerArc = 256)
    val g = Wkt.parse(shellOnly)
    assert(g.getGeometryType == "Polygon" && g.isValid)
    assert(math.abs(g.getArea - math.Pi * 4) / (math.Pi * 4) < 1e-3,
      s"area ${g.getArea} vs ${math.Pi * 4}")
    // straight shell + circular hole
    val holed = Wkt.parse(Wkt.curveToLine(
      "CURVEPOLYGON((0 0, 10 0, 10 10, 0 10, 0 0), " +
        "CIRCULARSTRING(4 5, 5 6, 6 5, 5 4, 4 5))", segmentsPerArc = 256))
    assert(holed.isValid)
    assert(math.abs(holed.getArea - (100 - math.Pi)) < 0.01, s"area ${holed.getArea}")
  }

  test("projection: Philadelphia City Hall lands where SPCS PA-South says") {
    // public approximate coordinate: (-75.1635°, 39.9524°) ≈ E 2,694,000 ft,
    // N 236,000 ft (NAD83 ftUS)
    val (e, n) = Projection.forward(-75.1635, 39.9524)
    assert(math.abs(e - 2694000) < 3000, s"easting $e")
    assert(math.abs(n - 236000) < 3000, s"northing $n")
  }

  test("projection: forward∘inverse is identity within 1e-9 deg (100 seeded samples)") {
    val rnd = new scala.util.Random(42)
    (1 to 100).foreach { _ =>
      val lo = -76.5 + rnd.nextDouble() * 2.0
      val la = 39.5 + rnd.nextDouble() * 1.0
      val (e, n) = Projection.forward(lo, la)
      val (lo2, la2) = Projection.inverse(e, n)
      assert(math.abs(lo2 - lo) < 1e-9 && math.abs(la2 - la) < 1e-9, s"($lo,$la)")
    }
  }

  test("projection: standard parallels are distortion-free (defining LCC property)") {
    // On a Lambert Conformal Conic the scale factor is exactly 1 along the
    // two standard parallels (40°58' and 39°56' for EPSG:2272). Compare a
    // small east-west ground distance on the ellipsoid with its projected
    // length — independent of the implementation's internal constants.
    val a = 6378137.0; val e2 = 2 * (1 / 298.257222101) - math.pow(1 / 298.257222101, 2)
    for (latDeg <- Seq(40.0 + 58.0 / 60.0, 39.0 + 56.0 / 60.0)) {
      val lat = math.toRadians(latDeg)
      val nu = a / math.sqrt(1 - e2 * math.sin(lat) * math.sin(lat)) // prime vertical radius
      val dLon = 1e-4 // radians, ~8.5 m of arc
      val groundM = nu * math.cos(lat) * dLon
      val (x1, y1) = Projection.forward(-77.0, latDeg)
      val (x2, y2) = Projection.forward(-77.0 + math.toDegrees(dLon), latDeg)
      val projM = math.hypot(x2 - x1, y2 - y1) * Projection.FtUs
      assert(math.abs(projM / groundM - 1.0) < 1e-7,
        s"scale at standard parallel $latDeg: ${projM / groundM}")
    }
    // and strictly > 1 away from the parallels (outside the secant band)
    val lat = 41.5; val latR = math.toRadians(lat)
    val nu = a / math.sqrt(1 - e2 * math.sin(latR) * math.sin(latR))
    val groundM = nu * math.cos(latR) * 1e-4
    val (x1, y1) = Projection.forward(-77.0, lat)
    val (x2, y2) = Projection.forward(-77.0 + math.toDegrees(1e-4), lat)
    assert(math.hypot(x2 - x1, y2 - y1) * Projection.FtUs / groundM > 1.0)
  }

  test("projection: meridians project to straight lines (conic property)") {
    // three points on one meridian must be collinear in the projected plane
    val pts = Seq(39.0, 40.0, 41.0).map(la => Projection.forward(-76.0, la))
    val Seq((x1, y1), (x2, y2), (x3, y3)) = pts
    val cross = (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)
    val span = math.hypot(x3 - x1, y3 - y1)
    assert(math.abs(cross) / (span * span) < 1e-9, s"meridian bends: $cross")
  }

  test("projection: unsupported SRID pair raises, identity passes through") {
    assert(Projection.transform(1.0, 2.0, 4326, 4326) == ((1.0, 2.0)))
    // 27700 (British National Grid) is deliberately outside the registry
    assertThrows[IllegalArgumentException](Projection.transform(0, 0, 4326, 27700))
  }

  // ---- Web Mercator (EPSG:3857) ---------------------------------------------

  test("3857: the public world-bound constant and the origin") {
    // x(180°) = y(85.05112878°) = 20037508.342789244 — the tile-scheme
    // bound every web-mapping stack publishes (= π·6378137)
    val bound = 20037508.342789244
    val (x180, _) = Projection.transform(180.0, 0.0, 4326, 3857)
    assert(math.abs(x180 - bound) < 1e-6, s"x(180) = $x180")
    val (_, yTop) = Projection.transform(0.0, 85.05112877980659, 4326, 3857)
    assert(math.abs(yTop - bound) < 1e-6, s"y(85.051…) = $yTop")
    // y(0) = a·ln(tan(π/4)) — exactly 0 up to tan's last-bit rounding
    val (ox, oy) = Projection.transform(0.0, 0.0, 4326, 3857)
    assert(ox == 0.0 && math.abs(oy) < 1e-8, s"origin -> ($ox,$oy)")
  }

  test("3857: forward∘inverse identity and square-pixel (conformal) property") {
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val lo = -179.0 + rnd.nextDouble() * 358.0
      val la = -84.0 + rnd.nextDouble() * 168.0
      val (x, y) = Projection.transform(lo, la, 4326, 3857)
      val (lo2, la2) = Projection.transform(x, y, 3857, 4326)
      assert(math.abs(lo2 - lo) < 1e-9 && math.abs(la2 - la) < 1e-9, s"($lo,$la)")
    }
    // spherical-Mercator defining property: ∂y/∂φ' = ∂x/∂λ at every point
    // when latitude is measured in the projection's own (spherical) metric:
    // a 1e-6 rad step in λ and the CONFORMAL latitude step project to equal
    // lengths (this is what makes web tiles square)
    for (lat <- Seq(-60.0, 0.0, 40.0, 75.0)) {
      val d = 1e-6
      val (x0, y0) = Projection.transform(10.0, lat, 4326, 3857)
      val (x1, _) = Projection.transform(10.0 + math.toDegrees(d), lat, 4326, 3857)
      val dx = x1 - x0
      // invert: move dy = dx up and check the latitude step round-trips
      val (_, la2) = Projection.transform(x0, y0 + dx, 3857, 4326)
      val latR = math.toRadians(lat)
      // dφ = dy·cosφ/a for spherical Mercator
      val expected = lat + math.toDegrees(d * math.cos(latR))
      assert(math.abs(la2 - expected) < 1e-9, s"lat $lat: $la2 vs $expected")
    }
  }

  // ---- Conus Albers (EPSG:5070) ---------------------------------------------

  test("5070: projection origin maps to (0, 0) and round-trips") {
    // EPSG:5070 has FE = FN = 0 at (96°W, 23°N)
    val (x0, y0) = Projection.transform(-96.0, 23.0, 4326, 5070)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6, s"origin -> ($x0,$y0)")
    val rnd = new scala.util.Random(11)
    (1 to 100).foreach { _ =>
      val lo = -124.0 + rnd.nextDouble() * 58.0 // CONUS window
      val la = 24.0 + rnd.nextDouble() * 25.0
      val (x, y) = Projection.transform(lo, la, 4326, 5070)
      val (lo2, la2) = Projection.transform(x, y, 5070, 4326)
      assert(math.abs(lo2 - lo) < 1e-9 && math.abs(la2 - la) < 1e-9, s"($lo,$la)")
    }
  }

  test("5070: equal-area — the Jacobian equals the ellipsoidal area element") {
    // THE defining Albers property (and what distinguishes it from the
    // conformal conic): the projected area of an infinitesimal cell equals
    // its ellipsoid area ν·ρ_m·cosφ·dλ·dφ everywhere, not just on the
    // standard parallels.
    val a = 6378137.0; val f = 1 / 298.257222101; val e2 = 2 * f - f * f
    for ((lon, lat) <- Seq((-120.0, 34.0), (-96.0, 29.5), (-80.0, 45.5), (-70.0, 41.0))) {
      val latR = math.toRadians(lat)
      val w = math.sqrt(1 - e2 * math.sin(latR) * math.sin(latR))
      val nu = a / w
      val rhoM = a * (1 - e2) / (w * w * w)
      val d = 1e-6
      val (x0, y0) = Projection.transform(lon, lat, 4326, 5070)
      val (xe, ye) = Projection.transform(lon + math.toDegrees(d), lat, 4326, 5070)
      val (xn, yn) = Projection.transform(lon, lat + math.toDegrees(d), 4326, 5070)
      val jac = math.abs((xe - x0) * (yn - y0) - (ye - y0) * (xn - x0))
      val ground = nu * math.cos(latR) * d * rhoM * d
      assert(math.abs(jac / ground - 1.0) < 1e-5,
        s"area distortion at ($lon,$lat): ${jac / ground}")
    }
  }

  test("5070: parallels project to circular arcs centered on the cone axis") {
    // conic property: all points of one parallel are equidistant from the
    // cone apex (0, ρ0 + y-offset …) — check three points of the 40°N
    // parallel share one radius from the apex implied by two of them
    val pts = Seq(-110.0, -95.0, -80.0)
      .map(lo => Projection.transform(lo, 40.0, 4326, 5070))
    val Seq((x1, y1), (x2, y2), (x3, y3)) = pts
    // apex lies on x = 0 (central meridian); solve for its y from p1/p2
    val apexY = ((x1 * x1 + y1 * y1) - (x2 * x2 + y2 * y2)) / (2 * (y1 - y2))
    def r(x: Double, y: Double) = math.hypot(x, y - apexY)
    assert(math.abs(r(x1, y1) - r(x3, y3)) < 1e-4,
      s"parallel not circular: ${r(x1, y1)} vs ${r(x3, y3)}")
  }

  // ---- State-plane LCC zones (parameterized LambertConformalConic) ----------

  test("LCC zones: the false origin maps to (FE, FN) by construction") {
    // definitional, memory-free check of (lat0, lon0, FE, FN): the grid
    // origin IS the false origin in LCC 2SP
    val cases = Seq(
      (2272, -(77.0 + 45.0 / 60.0), 39.0 + 20.0 / 60.0, 600000.0 * 3937 / 1200, 0.0),
      (2263, -74.0, 40.0 + 10.0 / 60.0, 300000.0 * 3937 / 1200, 0.0),
      (2229, -118.0, 33.5, 2000000.0 * 3937 / 1200, 500000.0 * 3937 / 1200),
      // r6 registry rows: PA North, South Carolina (INTERNATIONAL feet:
      // FE 609600 m = 2 000 000 ft intl exactly), Maryland, Texas North
      // (non-zero FN)
      (2271, -(77.0 + 45.0 / 60.0), 40.0 + 10.0 / 60.0, 600000.0 * 3937 / 1200, 0.0),
      (2273, -81.0, 31.0 + 50.0 / 60.0, 2000000.0, 0.0),
      (2248, -77.0, 37.0 + 40.0 / 60.0, 400000.0 * 3937 / 1200, 0.0),
      (2275, -101.5, 34.0, 200000.0 * 3937 / 1200, 1000000.0 * 3937 / 1200))
    for ((srid, lon0, lat0, fe, fn) <- cases) {
      val (e, n) = Projection.transform(lon0, lat0, 4326, srid)
      assert(math.abs(e - fe) < 1e-5 && math.abs(n - fn) < 1e-5,
        s"$srid false origin: ($e,$n) vs ($fe,$fn)")
    }
  }

  test("LCC zones: standard parallels are distortion-free; round-trips hold") {
    val a = 6378137.0; val e2 = 2 * (1 / 298.257222101) - math.pow(1 / 298.257222101, 2)
    val zones = Seq(
      (2263, -74.0, Seq(41.0 + 2.0 / 60.0, 40.0 + 40.0 / 60.0),
        (-74.3, -72.7, 40.4, 41.3), Projection.FtUs),
      (2229, -118.0, Seq(35.0 + 28.0 / 60.0, 34.0 + 2.0 / 60.0),
        (-121.0, -114.0, 32.7, 35.8), Projection.FtUs),
      (2271, -(77.0 + 45.0 / 60.0), Seq(41.0 + 57.0 / 60.0, 40.0 + 53.0 / 60.0),
        (-80.5, -75.0, 40.6, 42.3), Projection.FtUs),
      (2273, -81.0, Seq(34.0 + 50.0 / 60.0, 32.5),
        (-83.3, -78.6, 32.1, 35.2), Projection.FtIntl),
      (2248, -77.0, Seq(39.0 + 27.0 / 60.0, 38.3),
        (-79.5, -75.0, 38.0, 39.7), Projection.FtUs),
      (2275, -101.5, Seq(36.0 + 11.0 / 60.0, 34.0 + 39.0 / 60.0),
        (-103.0, -100.0, 34.3, 36.5), Projection.FtUs))
    for ((srid, lon0, parallels, window, unitToM) <- zones) {
      for (latDeg <- parallels) {
        val lat = math.toRadians(latDeg)
        val nu = a / math.sqrt(1 - e2 * math.sin(lat) * math.sin(lat))
        val dLon = 1e-4
        val groundM = nu * math.cos(lat) * dLon
        val (x1, y1) = Projection.transform(lon0, latDeg, 4326, srid)
        val (x2, y2) = Projection.transform(lon0 + math.toDegrees(dLon), latDeg, 4326, srid)
        val projM = math.hypot(x2 - x1, y2 - y1) * unitToM
        assert(math.abs(projM / groundM - 1.0) < 1e-7,
          s"$srid scale at parallel $latDeg: ${projM / groundM}")
      }
      val (lo1, lo2, la1, la2) = window
      val rnd = new scala.util.Random(srid)
      (1 to 50).foreach { _ =>
        val lo = lo1 + rnd.nextDouble() * (lo2 - lo1)
        val la = la1 + rnd.nextDouble() * (la2 - la1)
        val (x, y) = Projection.transform(lo, la, 4326, srid)
        val (lo2b, la2b) = Projection.transform(x, y, srid, 4326)
        assert(math.abs(lo2b - lo) < 1e-9 && math.abs(la2b - la) < 1e-9,
          s"$srid ($lo,$la)")
      }
    }
  }

  test("LCC zones: NYC lands in the public Long Island zone window") {
    // public approximate coordinate: lower Manhattan ≈ (981,000 ftUS E,
    // 199,000 ftUS N) in EPSG:2263
    val (e, n) = Projection.transform(-74.006, 40.7128, 4326, 2263)
    assert(math.abs(e - 981000) < 6000, s"easting $e")
    assert(math.abs(n - 199000) < 6000, s"northing $n")
  }

  // ---- Transverse Mercator family (Snyder pp. 60-64) ------------------------

  test("TM: forward∘inverse is identity within 1e-8 deg (~1 mm) across zones/hemispheres") {
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      (32618, -78.0, -72.0, 35.0, 45.0),  // UTM 18N WGS84 (± zone edges)
      (26918, -78.0, -72.0, 35.0, 45.0),  // UTM 18N NAD83
      (32734, 18.0, 24.0, -36.0, -30.0))  // UTM 34S WGS84
    for ((srid, lo1, lo2, la1, la2) <- cases; _ <- 1 to 50) {
      val lo = lo1 + rnd.nextDouble() * (lo2 - lo1)
      val la = la1 + rnd.nextDouble() * (la2 - la1)
      val (x, y) = Projection.transform(lo, la, 4326, srid)
      val (lo2b, la2b) = Projection.transform(x, y, srid, 4326)
      // the series inverse (footpoint latitude, Snyder 8-18..8-25) truncates
      // at ~1e-9 deg; 1e-8 deg ≈ 1 mm on the ground
      assert(math.abs(lo2b - lo) < 1e-8 && math.abs(la2b - la) < 1e-8,
        s"srid $srid ($lo,$la) -> ($lo2b,$la2b)")
    }
  }

  test("TM state-plane zones (2260 NY East / 3424 NJ, ftUS): origin, scale, round-trip") {
    // definitional: the grid origin (lat0 38°50'N on CM 74°30'W) maps to
    // (FE, FN) = (150 000 m, 0) expressed in ftUS
    val feFt = 150000.0 * 3937 / 1200
    for (srid <- Seq(2260, 3424)) {
      val (e0, n0) = Projection.transform(-74.5, 38.0 + 50.0 / 60.0, 4326, srid)
      assert(math.abs(e0 - feFt) < 1e-5 && math.abs(n0) < 1e-5,
        s"$srid origin: ($e0,$n0) vs ($feFt,0)")
      // scale along the CM is k0 = 0.9999 (definitional for TM):
      // ground meters from the meridian radius ρ vs projected ftUS→m
      val a = 6378137.0; val f = 1 / 298.257222101; val e2 = 2 * f - f * f
      val lat = math.toRadians(40.5)
      val w = math.sqrt(1 - e2 * math.sin(lat) * math.sin(lat))
      val rho = a * (1 - e2) / (w * w * w)
      val d = 1e-6
      val (x1, y1) = Projection.transform(-74.5, 40.5, 4326, srid)
      val (x2, y2) = Projection.transform(-74.5, 40.5 + math.toDegrees(d), 4326, srid)
      val k = math.hypot(x2 - x1, y2 - y1) * Projection.FtUs / (rho * d)
      assert(math.abs(k - 0.9999) < 1e-7, s"$srid CM scale: $k")
      // round-trips over the NJ/NY-East window
      val rnd = new scala.util.Random(srid)
      (1 to 50).foreach { _ =>
        val lo = -75.6 + rnd.nextDouble() * 2.0
        val la = 38.9 + rnd.nextDouble() * 2.3
        val (x, y) = Projection.transform(lo, la, 4326, srid)
        val (lo2, la2) = Projection.transform(x, y, srid, 4326)
        assert(math.abs(lo2 - lo) < 1e-8 && math.abs(la2 - la) < 1e-8,
          s"$srid ($lo,$la)")
      }
    }
    // NY East and NJ share EPSG parameters — identical grids by definition
    val p1 = Projection.transform(-74.2, 40.7, 4326, 2260)
    val p2 = Projection.transform(-74.2, 40.7, 4326, 3424)
    assert(p1 == p2)
  }

  test("unknown EPSG fails loudly, listing the registry") {
    val e = intercept[IllegalArgumentException] {
      Projection.transform(0.0, 0.0, 2299, 4326)
    }
    assert(e.getMessage.contains("2299") && e.getMessage.contains("2271") &&
      e.getMessage.contains("3424") && e.getMessage.contains("32701-32760"),
      e.getMessage)
    // the error teaches the escape hatch: any zone is constructible from
    // its EPSG parameters and registered at runtime
    assert(e.getMessage.contains("registerCrs"), e.getMessage)
  }

  // ---- registerCrs: the arbitrary-EPSG escape hatch -------------------------

  test("registerCrs: a runtime-declared zone transforms like a built-in") {
    // EPSG:2235 — NAD83 / Delaware ftUS (TM zone 0700): lat0 38°N,
    // CM 75°25'W, k0 0.999995, FE 200 000 m, FN 0 (EPSG registry values)
    val de = Projection.TransverseMercator(Projection.Grs80InvF,
      -(75.0 + 25.0 / 60.0), 0.999995, 200000.0, 0.0,
      lat0Deg = 38.0, unitToM = Projection.FtUs)
    Projection.registerCrs(2235, de)
    // re-registering the identical definition is idempotent
    Projection.registerCrs(2235, de)
    // definitional false-origin check (no memorized values: the grid
    // origin IS (FE, FN) at (lat0, lon0))
    val (e0, n0) = Projection.transform(-(75.0 + 25.0 / 60.0), 38.0, 4326, 2235)
    assert(math.abs(e0 - 200000.0 * 3937 / 1200) < 1e-5 && math.abs(n0) < 1e-5,
      s"2235 false origin: ($e0, $n0)")
    // round-trip through the home zone (projected -> projected composes
    // through the geographic hub)
    val (x, y) = (2670000.0, 225000.0) // Philadelphia-area 2272 ftUS
    val (dx, dy) = Projection.transform(x, y, 2272, 2235)
    val (bx, by) = Projection.transform(dx, dy, 2235, 2272)
    assert(math.abs(bx - x) < 1e-3 && math.abs(by - y) < 1e-3,
      s"2272->2235->2272: ($bx, $by)")
    // the registered zone appears in the supported description
    assert(Projection.supportedDescription.contains("2235"))
  }

  test("registerCrs: redefining a built-in or registered zone is rejected") {
    val bogus = Projection.TransverseMercator(Projection.Grs80InvF,
      0.0, 1.0, 0.0, 0.0)
    val e1 = intercept[IllegalArgumentException] {
      Projection.registerCrs(2272, bogus) // built-in home zone
    }
    assert(e1.getMessage.contains("2272"), e1.getMessage)
    Projection.registerCrs(915151, bogus) // fresh code: fine
    val e2 = intercept[IllegalArgumentException] {
      Projection.registerCrs(915151, // same code, DIFFERENT definition
        Projection.TransverseMercator(Projection.Grs80InvF, 1.0, 1.0, 0.0, 0.0))
    }
    assert(e2.getMessage.contains("915151"), e2.getMessage)
  }

  test("TM: central meridian -> FE exactly; northing = k0 * meridian arc (Simpson)") {
    // On the central meridian A = 0, so easting must be exactly the false
    // easting and northing k0·M(φ). M is checked against a NUMERICAL
    // integral of the meridian radius (independent of the series form):
    // M(φ) = ∫ a(1−e²)/(1−e²sin²t)^(3/2) dt
    val a = 6378137.0; val f = 1 / 298.257223563; val e2 = 2 * f - f * f
    def integrand(t: Double) = a * (1 - e2) / math.pow(1 - e2 * math.sin(t) * math.sin(t), 1.5)
    def simpson(hi: Double, n: Int): Double = {
      val h = hi / n
      val s = integrand(0) + integrand(hi) +
        (1 until n).map(i => (if (i % 2 == 1) 4.0 else 2.0) * integrand(i * h)).sum
      s * h / 3
    }
    for (latDeg <- Seq(10.0, 40.0, 70.0)) {
      val (x, y) = Projection.transform(-75.0, latDeg, 4326, 32618) // CM of zone 18
      assert(math.abs(x - 500000.0) < 1e-6, s"easting on CM: $x")
      val arc = simpson(math.toRadians(latDeg), 20000)
      assert(math.abs(y - 0.9996 * arc) < 0.005,
        s"northing at $latDeg: $y vs ${0.9996 * arc}")
    }
  }

  test("TM: conformal — east and north scale factors agree off the CM") {
    // conformality (the defining property): local scale is isotropic.
    // ground distances from the ellipsoid radii (ν for E-W, ρ for N-S).
    val a = 6378137.0; val f = 1 / 298.257223563; val e2 = 2 * f - f * f
    for ((lon, lat) <- Seq((-74.0, 40.0), (-76.5, 42.0), (-72.5, 37.0))) {
      val latR = math.toRadians(lat)
      val w = math.sqrt(1 - e2 * math.sin(latR) * math.sin(latR))
      val nu = a / w
      val rho = a * (1 - e2) / (w * w * w)
      val d = 1e-6 // radians
      val (x0, y0) = Projection.transform(lon, lat, 4326, 32618)
      val (xe, ye) = Projection.transform(lon + math.toDegrees(d), lat, 4326, 32618)
      val (xn, yn) = Projection.transform(lon, lat + math.toDegrees(d), 4326, 32618)
      val scaleE = math.hypot(xe - x0, ye - y0) / (nu * math.cos(latR) * d)
      val scaleN = math.hypot(xn - x0, yn - y0) / (rho * d)
      assert(math.abs(scaleE / scaleN - 1.0) < 1e-6,
        s"anisotropy at ($lon,$lat): E=$scaleE N=$scaleN")
      assert(scaleE > 0.9995 && scaleE < 1.001, s"scale magnitude $scaleE")
    }
  }

  test("TM: Philadelphia lands in the public UTM 18N window") {
    // public approximate coordinate: City Hall ≈ (486.0 km E, 4422.8 km N)
    val (e, n) = Projection.transform(-75.1635, 39.9524, 4326, 32618)
    assert(math.abs(e - 486000) < 3000, s"easting $e")
    assert(math.abs(n - 4423000) < 6000, s"northing $n")
    // NAD83 variant differs only by the ellipsoid's 1/f in the 9th digit
    val (e83, n83) = Projection.transform(-75.1635, 39.9524, 4326, 26918)
    assert(math.abs(e83 - e) < 0.01 && math.abs(n83 - n) < 0.01)
  }

  test("TM: southern hemisphere applies the 10,000 km false northing") {
    val (e, n) = Projection.transform(18.4, -33.9, 4326, 32734) // Cape Town, 34S
    assert(n > 6200000 && n < 6300000, s"northing $n") // 10⁷ − k0·|arc(−33.9°)|
    assert(e > 200000 && e < 300000, s"easting $e")
  }

  test("projected→projected routes through the geographic hub (2272 → UTM)") {
    val (lccE, lccN) = Projection.forward(-75.1635, 39.9524)
    val direct = Projection.transform(-75.1635, 39.9524, 4326, 26918)
    val routed = Projection.transform(lccE, lccN, 2272, 26918)
    assert(math.abs(routed._1 - direct._1) < 1e-4 &&
      math.abs(routed._2 - direct._2) < 1e-4,
      s"routed $routed vs direct $direct")
  }

  test("wkt transform reprojects every coordinate") {
    val out = Wkt.transform("LINESTRING (2660000 220000, 2700000 250000)", 2272, 4326)
    val g = Wkt.parse(out)
    g.getCoordinates.foreach { c =>
      assert(c.x > -76 && c.x < -74.5 && c.y > 39.5 && c.y < 40.5, s"out of extent: $c")
    }
  }

  test("wkt roundtrip property: normalize is idempotent on generated points") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val x = rnd.nextInt(2000001) - 1000000; val y = rnd.nextInt(2000001) - 1000000
      val w = s"POINT ($x $y)"
      assert(Wkt.normalize(w) == w)
    }
  }

  test("bboxJoin matches the brute-force containment join for any cell size") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(10000).toLong, rnd.nextInt(8000).toLong))
      .toDF("pid", "px", "py")
    val boxes = (1 to 20).map { g =>
      val x0 = rnd.nextInt(9000).toLong; val y0 = rnd.nextInt(7000).toLong
      (g.toLong, x0, x0 + rnd.nextInt(1500) + 1, y0, y0 + rnd.nextInt(1200) + 1)
    }.toDF("gid", "xmin", "xmax", "ymin", "ymax")
    val brute = pts.join(boxes,
        col("px") >= col("xmin") && col("px") <= col("xmax") &&
        col("py") >= col("ymin") && col("py") <= col("ymax"))
      .select("pid", "gid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // correctness must not depend on the cell size (including cells much
    // smaller than a box)
    for (cell <- Seq(250, 1000, 4000)) {
      val got = SpatialJoin.bboxJoin(pts, boxes, cell)
        .select("pid", "gid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute, s"cell=$cell: ${got.size} vs ${brute.size} pairs")
    }
  }

  test("nnJoin matches the brute-force bounded argmin, including tie-breaks") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val pts = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(10000).toLong, rnd.nextInt(8000).toLong))
      .toDF("pid", "px", "py")
    // include two sites at the SAME location so distance ties exercise the
    // lower-sid tie-break
    val base = (1 to 15).map(g =>
      (g.toLong, rnd.nextInt(10000).toLong, rnd.nextInt(8000).toLong))
    val sites = (base :+ ((16L, base.head._2, base.head._3)))
      .toDF("sid", "sx", "sy")
    val r = 1500
    val d2 = (col("px") - col("sx")) * (col("px") - col("sx")) +
      (col("py") - col("sy")) * (col("py") - col("sy"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(col("d2"), col("sid"))
    val brute = pts.crossJoin(sites).withColumn("d2", d2)
      .filter(col("d2") <= r.toLong * r)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("pid", "sid", "d2")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val got = SpatialJoin.nnJoin(pts, sites, r)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(got == brute, s"${got.size} vs brute ${brute.size}")
    assert(got.forall(_._3 <= r.toLong * r), "radius gate")
    assert(got.map(_._1).size == got.size, "one nearest site per point")
  }

  test("stCoversPoint: boundary-inclusive containment on a unit square") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val sq = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    val pts = Seq(
      (1L, 5.0, 5.0),   // interior
      (2L, 0.0, 0.0),   // vertex — covers() includes it
      (3L, 5.0, 0.0),   // edge midpoint — included
      (4L, 11.0, 5.0),  // outside
      (5L, 10.0, 10.1)) // just outside a vertex
      .toDF("id", "x", "y")
    val in = pts.filter(graft.spatial.StFunctions
        .stCoversPoint(lit(sq), col("x"), col("y")))
      .collect().map(_.getLong(0)).toSet
    assert(in == Set(1L, 2L, 3L), s"boundary-inclusive covers: $in")
  }

  test("st_covers_point is callable from SQL, integer args cast implicitly") {
    graft.functions.GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT st_covers_point('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', 2, 2) AS hit")
      .collect()(0).getBoolean(0)
    assert(n, "interior point covered via the SQL surface with INT coords")
  }

  test("NormalizeIdempotence collapses layered normalize/force2D calls in the plan") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.spatial.StFunctions._
    // parquet-backed input so constant folding cannot evaluate the
    // expressions away; views layering cleaning steps produce this shape
    val p = "/root/repo/target/fixtures/test/rule_wkt"
    Seq("POINT (1 2)").toDF("wkt").write.mode("overwrite").parquet(p)
    val df = spark.read.parquet(p)
      .select(stNormalizeWkt(stNormalizeWkt(col("wkt"))).as("a"),
        stNormalizeWkt(stForce2DJts(col("wkt"))).as("b"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("st_normalize_wkt".r.findAllIn(optimized).size == 1,
      s"nested + post-force2d normalize both fold away:\n$optimized")
    // the session picked the rule up via spark.sql.extensions, and the
    // injected SQL functions resolve without a register() call
    val viaSql = spark.sql("SELECT st_normalize_wkt('POINT(3 4)') AS w")
      .collect()(0).getString(0)
    assert(viaSql == "POINT (3 4)", s"extension-injected function works: $viaSql")
    // semantics unchanged by the fold
    val r = df.collect()(0)
    assert(r.getString(0) == "POINT (1 2)" && r.getString(1) == "POINT (1 2)")
  }

  test("stArea/stLength: exact on integer rectangles and Pythagorean lines") {
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val row = Seq(1).toDF("x").select(
      graft.spatial.StFunctions.stArea(
        lit("POLYGON ((0 0, 7 0, 7 3, 0 3, 0 0))")).as("a"),
      graft.spatial.StFunctions.stLength(
        lit("LINESTRING (0 0, 3 4, 9 12)")).as("l")).collect()(0)
    assert(row.getDouble(0) == 21.0, "7x3 rectangle area is exactly 21")
    assert(row.getDouble(1) == 15.0, "3-4-5 segments sum exactly (5 + 10)")
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT st_area('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS a").collect()(0).getDouble(0)
    assert(viaSql == 4.0, "st_area callable from SQL")
  }

  test("bboxJoin candidate generation is an equi-join (no nested loop)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val pts = Seq((1L, 5L, 5L)).toDF("pid", "px", "py")
    val boxes = Seq((1L, 0L, 10L, 0L, 10L)).toDF("gid", "xmin", "xmax", "ymin", "ymax")
    val plan = SpatialJoin.bboxJoin(pts, boxes, 100).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bboxJoin must join on grid cells:\n$plan")
  }
}
