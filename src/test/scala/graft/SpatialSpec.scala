package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spatial.{Projection, Wkt}

/** WKT kernel + projection math (SURVEY.md §2.5, reference edge cases from
  * FIXTURES.md §3: NaN coords, ' M' values, '1.#QNAN000', curves, EMPTY,
  * MULTI/single mismatch).
  */
class SpatialSpec extends AnyFunSuite {

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
    assertThrows[IllegalArgumentException](Projection.transform(0, 0, 4326, 3857))
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
}
