package graft.spatial

/** Hand-rolled coordinate reprojection.
  *
  * The reference reprojects client-side with pyproj between ARBITRARY CRS
  * pairs (ref datum/oracle_stgeom/table.py:307-313) because
  * `SDE.ST_Transform` "can't transform between coordinate systems based on
  * different datums" (comment at datum/oracle_stgeom/table.py:205-207); its
  * shipped `WktTransformer` is actually broken (`partial` used but never
  * imported, datum/oracle_stgeom/util.py:10). No proj library exists in this
  * offline environment, so the projection math is implemented directly from
  * the published EPSG parameters and Snyder's "Map Projections — A Working
  * Manual" (USGS PP 1395) formulas, which are public:
  *
  *  - EPSG:2272 (NAD83 / Pennsylvania South, ftUS) — Lambert Conformal
  *    Conic 2SP, Snyder pp. 107-109: the reference's home CRS.
  *  - Transverse Mercator family, Snyder pp. 60-64 (series forms): all
  *    WGS84 UTM zones (EPSG:326xx north / 327xx south) and NAD83 UTM
  *    (EPSG:269xx) — the projection underlying most real-world SRIDs
  *    (UTM + the TM-based US state-plane zones).
  *
  * Any supported pair transforms by routing through geographic coordinates
  * (EPSG:4326): `from.toGeo` then `to.fromGeo`. NAD83 vs WGS84 datum shift
  * is treated as identity (≤ ~1 m, standard practice absent a grid shift
  * file) — documented approximation.
  *
  * Pure double math, thread-safe, allocation-free: safe to call from
  * expressions on executors at any scale.
  */
object Projection {

  /** A projected (or geographic) CRS: projected units ↔ (lonDeg, latDeg).
    * Serializable: expressions capture resolved `Crs` instances at PLAN
    * time (see StFunctions.StTransform), so they ship inside the
    * serialized task to executors — which never see the driver-side
    * registry.
    */
  sealed trait Crs extends Serializable {
    def toGeo(x: Double, y: Double): (Double, Double)
    def fromGeo(lonDeg: Double, latDeg: Double): (Double, Double)
  }

  /** EPSG:4326 — identity endpoints for the geographic hub. */
  case object Geographic extends Crs {
    def toGeo(x: Double, y: Double): (Double, Double) = (x, y)
    def fromGeo(lonDeg: Double, latDeg: Double): (Double, Double) = (lonDeg, latDeg)
  }

  // GRS80 ellipsoid (NAD83); WGS84 differs only in 1/f's 9th significant digit
  private val A = 6378137.0

  /** GRS80 inverse flattening (NAD83 zones) — public so callers can
    * construct their own [[LambertConformalConic]]/[[TransverseMercator]]
    * instances from EPSG registry parameters and [[registerCrs]] them.
    */
  val Grs80InvF: Double = 298.257222101

  /** WGS84 inverse flattening. */
  val Wgs84InvF: Double = 298.257223563

  /** US survey foot (exact: 1200/3937 m). */
  val FtUs: Double = 1200.0 / 3937.0

  /** International foot (exact: 0.3048 m) — South Carolina's SPCS unit. */
  val FtIntl: Double = 0.3048

  // ---- Lambert Conformal Conic (2SP), Snyder pp. 107-109 ------------------

  /** Parameterized ellipsoidal LCC 2SP — the projection under most US
    * state-plane zones. Projected units are `unitToM` metres each (1200/
    * 3937 for ftUS zones, 1.0 for metric zones). The 2272 instance is the
    * original hand-rolled implementation verbatim (its arithmetic order is
    * pinned by the frozen d5/d8/d13/d14 golden oracles); the class only
    * lifts the EPSG parameters out of the body.
    */
  final case class LambertConformalConic(invF: Double,
      lat0Deg: Double, lon0Deg: Double, lat1Deg: Double, lat2Deg: Double,
      feM: Double, fnM: Double, unitToM: Double) extends Crs {
    private val F_ = 1.0 / invF
    private val E2 = 2 * F_ - F_ * F_
    private val E = math.sqrt(E2)

    private val Lat0 = math.toRadians(lat0Deg) // false-origin latitude
    private val Lon0 = math.toRadians(lon0Deg) // central meridian
    private val Lat1 = math.toRadians(lat1Deg) // std parallel 1
    private val Lat2 = math.toRadians(lat2Deg) // std parallel 2

    private def m(lat: Double) =
      math.cos(lat) / math.sqrt(1 - E2 * math.sin(lat) * math.sin(lat))
    private def t(lat: Double) = {
      val es = E * math.sin(lat)
      math.tan(math.Pi / 4 - lat / 2) / math.pow((1 - es) / (1 + es), E / 2)
    }

    private val N_ =
      (math.log(m(Lat1)) - math.log(m(Lat2))) / (math.log(t(Lat1)) - math.log(t(Lat2)))
    private val Fc = m(Lat1) / (N_ * math.pow(t(Lat1), N_))
    private val Rho0 = A * Fc * math.pow(t(Lat0), N_)

    /** (lonDeg, latDeg) → (easting, northing) in zone units. */
    def fromGeo(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = math.toRadians(latDeg); val lon = math.toRadians(lonDeg)
      val rho = A * Fc * math.pow(t(lat), N_)
      val th = N_ * (lon - Lon0)
      val e_m = feM + rho * math.sin(th)
      val n_m = fnM + Rho0 - rho * math.cos(th)
      (e_m / unitToM, n_m / unitToM)
    }

    /** (easting, northing) in zone units → (lonDeg, latDeg). */
    def toGeo(eU: Double, nU: Double): (Double, Double) = {
      val x = eU * unitToM - feM
      val y = Rho0 - (nU * unitToM - fnM)
      val rho = math.signum(N_) * math.sqrt(x * x + y * y)
      val tp = math.pow(rho / (A * Fc), 1 / N_)
      val th = math.atan2(x, y)
      val lon = th / N_ + Lon0
      // iterate φ = π/2 − 2·atan(t′·((1−e·sinφ)/(1+e·sinφ))^(e/2))
      var lat = math.Pi / 2 - 2 * math.atan(tp)
      var i = 0
      while (i < 15) {
        val es = E * math.sin(lat)
        val next = math.Pi / 2 - 2 * math.atan(tp * math.pow((1 - es) / (1 + es), E / 2))
        if (math.abs(next - lat) < 1e-14) { lat = next; i = 15 } else { lat = next; i += 1 }
      }
      (math.toDegrees(lon), math.toDegrees(lat))
    }
  }

  /** EPSG:2272 — SPCS83 PA South (zone 3702), ftUS (the reference's home
    * CRS; parameters identical to the original object, so the frozen
    * golden oracles are unchanged).
    */
  private val Lcc2272 = LambertConformalConic(Grs80InvF,
    39.0 + 20.0 / 60.0, -(77.0 + 45.0 / 60.0),
    40.0 + 58.0 / 60.0, 39.0 + 56.0 / 60.0, 600000.0, 0.0, FtUs)

  /** EPSG:2271 — SPCS83 PA North (zone 3701), ftUS: the reference's home
    * zone's literal northern neighbor (same FE/unit as 2272, its own
    * parallels/origin — EPSG registry values).
    */
  private val Lcc2271 = LambertConformalConic(Grs80InvF,
    40.0 + 10.0 / 60.0, -(77.0 + 45.0 / 60.0),
    41.0 + 57.0 / 60.0, 40.0 + 53.0 / 60.0, 600000.0, 0.0, FtUs)

  /** EPSG:2263 — SPCS83 NY Long Island (zone 3104), ftUS. */
  private val Lcc2263 = LambertConformalConic(Grs80InvF,
    40.0 + 10.0 / 60.0, -74.0,
    41.0 + 2.0 / 60.0, 40.0 + 40.0 / 60.0, 300000.0, 0.0, FtUs)

  /** EPSG:2229 — SPCS83 California zone 5, ftUS. */
  private val Lcc2229 = LambertConformalConic(Grs80InvF,
    33.5, -118.0, 35.0 + 28.0 / 60.0, 34.0 + 2.0 / 60.0,
    2000000.0, 500000.0, FtUs)

  /** EPSG:2273 — SPCS83 South Carolina (zone 3900), INTERNATIONAL feet
    * (SC is the one SPCS83 state legislated on the international foot;
    * FE 609600 m = 2 000 000 ft intl).
    */
  private val Lcc2273 = LambertConformalConic(Grs80InvF,
    31.0 + 50.0 / 60.0, -81.0,
    34.0 + 50.0 / 60.0, 32.5, 609600.0, 0.0, FtIntl)

  /** EPSG:2248 — SPCS83 Maryland (zone 1900), ftUS. */
  private val Lcc2248 = LambertConformalConic(Grs80InvF,
    37.0 + 40.0 / 60.0, -77.0,
    39.0 + 27.0 / 60.0, 38.3, 400000.0, 0.0, FtUs)

  /** EPSG:2275 — SPCS83 Texas North (zone 4201), ftUS (non-zero false
    * northing: FN 1 000 000 m).
    */
  private val Lcc2275 = LambertConformalConic(Grs80InvF,
    34.0, -101.5, 36.0 + 11.0 / 60.0, 34.0 + 39.0 / 60.0,
    200000.0, 1000000.0, FtUs)

  // ---- Transverse Mercator (series form), Snyder pp. 60-64 ----------------

  /** Ellipsoidal TM via Snyder eq. 8-9..8-25 (the USGS/EPSG series form,
    * sub-mm accurate within ±4° of the central meridian — every UTM zone).
    * `fe`/`fn` are metres; projected units are `unitToM` metres each
    * (1.0 for UTM, 1200/3937 for the ftUS TM state-plane zones).
    */
  final case class TransverseMercator(invF: Double, lon0Deg: Double,
      k0: Double, fe: Double, fn: Double, lat0Deg: Double = 0.0,
      unitToM: Double = 1.0) extends Crs {
    private val f = 1.0 / invF
    private val e2 = 2 * f - f * f
    private val ep2 = e2 / (1 - e2)
    private val lon0 = math.toRadians(lon0Deg)

    // meridian arc M(φ), Snyder eq. 3-21
    private val m0c = 1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256
    private val m2c = 3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024
    private val m4c = 15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024
    private val m6c = 35 * e2 * e2 * e2 / 3072
    private def meridianArc(lat: Double): Double =
      A * (m0c * lat - m2c * math.sin(2 * lat) +
        m4c * math.sin(4 * lat) - m6c * math.sin(6 * lat))
    private val m0 = meridianArc(math.toRadians(lat0Deg))

    /** Snyder eq. 8-9..8-15. */
    def fromGeo(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = math.toRadians(latDeg); val lon = math.toRadians(lonDeg)
      val sinLat = math.sin(lat); val cosLat = math.cos(lat); val tanLat = math.tan(lat)
      val nu = A / math.sqrt(1 - e2 * sinLat * sinLat)
      val t = tanLat * tanLat
      val c = ep2 * cosLat * cosLat
      val aa = (lon - lon0) * cosLat
      val aa2 = aa * aa; val aa3 = aa2 * aa; val aa4 = aa2 * aa2
      val aa5 = aa4 * aa; val aa6 = aa4 * aa2
      val x = fe + k0 * nu * (aa + (1 - t + c) * aa3 / 6 +
        (5 - 18 * t + t * t + 72 * c - 58 * ep2) * aa5 / 120)
      val y = fn + k0 * (meridianArc(lat) - m0 + nu * tanLat * (aa2 / 2 +
        (5 - t + 9 * c + 4 * c * c) * aa4 / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * ep2) * aa6 / 720))
      (x / unitToM, y / unitToM)
    }

    /** Snyder eq. 8-18..8-25 (footpoint-latitude series). */
    def toGeo(xU: Double, yU: Double): (Double, Double) = {
      val x = xU * unitToM; val y = yU * unitToM
      val m = m0 + (y - fn) / k0
      val mu = m / (A * m0c)
      val se = math.sqrt(1 - e2)
      val e1 = (1 - se) / (1 + se)
      val e1_2 = e1 * e1; val e1_3 = e1_2 * e1; val e1_4 = e1_2 * e1_2
      val phi1 = mu + (3 * e1 / 2 - 27 * e1_3 / 32) * math.sin(2 * mu) +
        (21 * e1_2 / 16 - 55 * e1_4 / 32) * math.sin(4 * mu) +
        (151 * e1_3 / 96) * math.sin(6 * mu) +
        (1097 * e1_4 / 512) * math.sin(8 * mu)
      val sin1 = math.sin(phi1); val cos1 = math.cos(phi1); val tan1 = math.tan(phi1)
      val c1 = ep2 * cos1 * cos1
      val t1 = tan1 * tan1
      val oneMinus = 1 - e2 * sin1 * sin1
      val n1 = A / math.sqrt(oneMinus)
      val r1 = A * (1 - e2) / (oneMinus * math.sqrt(oneMinus))
      val d = (x - fe) / (n1 * k0)
      val d2 = d * d; val d3 = d2 * d; val d4 = d2 * d2; val d5 = d4 * d; val d6 = d4 * d2
      val lat = phi1 - (n1 * tan1 / r1) * (d2 / 2 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * d4 / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) * d6 / 720)
      val lon = lon0 + (d - (1 + 2 * t1 + c1) * d3 / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) * d5 / 120) / cos1
      (math.toDegrees(lon), math.toDegrees(lat))
    }
  }

  /** UTM zone: central meridian 6·zone − 183, k0 = 0.9996, FE = 500 km,
    * FN = 0 (north) / 10 000 km (south).
    */
  private def utm(zone: Int, north: Boolean, invF: Double): TransverseMercator =
    TransverseMercator(invF, 6.0 * zone - 183.0, 0.9996, 500000.0,
      if (north) 0.0 else 10000000.0)

  /** EPSG:2260 — SPCS83 New York East (zone 3101), ftUS: the TM half of
    * the state-plane family (CM 74°30′W, k0 0.9999, FE 150 000 m).
    */
  private val Tm2260 = TransverseMercator(Grs80InvF, -74.5, 0.9999,
    150000.0, 0.0, lat0Deg = 38.0 + 50.0 / 60.0, unitToM = FtUs)

  /** EPSG:3424 — SPCS83 New Jersey (zone 2900), ftUS. NJ's single zone is
    * defined with the SAME projection parameters as NY East (EPSG registry:
    * both are TM, 38°50′N / 74°30′W, k0 0.9999, FE 150 000 m, ftUS).
    */
  private val Tm3424 = Tm2260

  // ---- EPSG:3857 Web Mercator (Pseudo-Mercator), EPSG method 1024 ---------

  /** Web map tiles' CRS: SPHERICAL Mercator formulas on the WGS84
    * semi-major axis (that is the EPSG definition — the deliberate
    * ellipsoid-as-sphere approximation is what makes 3857 "pseudo"):
    * x = a·λ, y = a·ln(tan(π/4 + φ/2)). The classic bounds follow:
    * x(±180°) = y(±85.05112878°) = ±20037508.342789244 m.
    */
  private object WebMercator3857 extends Crs {
    def fromGeo(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = math.toRadians(latDeg)
      (A * math.toRadians(lonDeg), A * math.log(math.tan(math.Pi / 4 + lat / 2)))
    }
    def toGeo(x: Double, y: Double): (Double, Double) =
      (math.toDegrees(x / A),
        math.toDegrees(math.Pi / 2 - 2 * math.atan(math.exp(-y / A))))
  }

  // ---- EPSG:5070 NAD83 / Conus Albers, Snyder pp. 98-102 ------------------

  /** Albers Equal-Area Conic 2SP on GRS80 — the CRS national-statistics
    * work projects CONUS into (EPSG:5070: φ0 = 23°N, λ0 = 96°W, standard
    * parallels 29°30′ / 45°30′, FE = FN = 0, metres). Ellipsoidal form via
    * the authalic-latitude function q(φ) (Snyder eq. 3-12, 14-3..14-11);
    * the inverse iterates Snyder eq. 3-16 from φ = asin(q/2).
    */
  private object Albers5070 extends Crs {
    private val F_ = 1.0 / Grs80InvF
    private val E2 = 2 * F_ - F_ * F_
    private val E = math.sqrt(E2)

    private val Lat0 = math.toRadians(23.0)
    private val Lon0 = math.toRadians(-96.0)
    private val Lat1 = math.toRadians(29.5)
    private val Lat2 = math.toRadians(45.5)

    private def q(lat: Double): Double = {
      val s = math.sin(lat)
      (1 - E2) * (s / (1 - E2 * s * s) -
        (1 / (2 * E)) * math.log((1 - E * s) / (1 + E * s)))
    }
    private def m(lat: Double): Double =
      math.cos(lat) / math.sqrt(1 - E2 * math.sin(lat) * math.sin(lat))

    private val M1 = m(Lat1)
    private val M2 = m(Lat2)
    private val N_ = (M1 * M1 - M2 * M2) / (q(Lat2) - q(Lat1))
    private val C = M1 * M1 + N_ * q(Lat1)
    private def rho(lat: Double): Double = A * math.sqrt(C - N_ * q(lat)) / N_
    private val Rho0 = rho(Lat0)

    def fromGeo(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = math.toRadians(latDeg); val lon = math.toRadians(lonDeg)
      val r = rho(lat)
      val th = N_ * (lon - Lon0)
      (r * math.sin(th), Rho0 - r * math.cos(th))
    }

    def toGeo(x: Double, y: Double): (Double, Double) = {
      val r = math.sqrt(x * x + (Rho0 - y) * (Rho0 - y))
      val th = math.atan2(x, Rho0 - y) // N_ > 0 for 5070
      val qv = (C - r * r * N_ * N_ / (A * A)) / N_
      // iterate Snyder eq. 3-16 from the spherical seed φ = asin(q/2)
      var lat = math.asin(qv / 2)
      var i = 0
      while (i < 15) {
        val s = math.sin(lat)
        val oneM = 1 - E2 * s * s
        val next = lat + (oneM * oneM / (2 * math.cos(lat))) *
          (qv / (1 - E2) - s / oneM +
            (1 / (2 * E)) * math.log((1 - E * s) / (1 + E * s)))
        if (math.abs(next - lat) < 1e-14) { lat = next; i = 15 }
        else { lat = next; i += 1 }
      }
      (math.toDegrees(Lon0 + th / N_), math.toDegrees(lat))
    }
  }

  /** Registered fixed-parameter CRSs (EPSG registry values — public).
    * UTM zones are handled by range below.
    */
  private val Registry: Map[Int, Crs] = Map(
    4326 -> Geographic,
    2248 -> Lcc2248, 2229 -> Lcc2229, 2263 -> Lcc2263,
    2271 -> Lcc2271, 2272 -> Lcc2272, 2273 -> Lcc2273, 2275 -> Lcc2275,
    2260 -> Tm2260, 3424 -> Tm3424,
    3857 -> WebMercator3857, 5070 -> Albers5070)

  /** User-registered zones: the escape hatch for the long tail of EPSG
    * codes the built-in registry can't enumerate offline. The reference
    * delegates `to_srid` to pyproj, which carries the full EPSG database
    * (ref datum/oracle_stgeom/util.py:5-19); here any LCC-2SP or TM zone —
    * which together cover every SPCS83 zone and all of UTM — is
    * constructible from its published EPSG parameters and registered at
    * runtime:
    *
    * {{{
    * // EPSG:2235 — NAD83 / Delaware, ftUS (TM zone 0700)
    * Projection.registerCrs(2235, Projection.TransverseMercator(
    *   Projection.Grs80InvF, -(75.0 + 25.0 / 60.0), 0.999995,
    *   200000.0, 0.0, lat0Deg = 38.0, unitToM = Projection.FtUs))
    * }}}
    *
    * Registrations are DRIVER-side state: expressions resolve them at plan
    * time and serialize the captured [[Crs]] into the task (executors
    * never consult this map) — registering on the driver is sufficient on
    * a 1000-executor cluster.
    */
  private val UserRegistry = scala.collection.concurrent.TrieMap.empty[Int, Crs]

  /** Register a CRS for `srid`. Idempotent for an identical definition;
    * rejects redefining a built-in or a previously registered different
    * definition (silent redefinition would un-pin the frozen golden
    * oracles that gate the built-in zones).
    */
  def registerCrs(srid: Int, crs: Crs): Unit = {
    val existing = crsFor(srid)
    require(existing.forall(_ == crs),
      s"SRID $srid is already defined (${existing.get}); " +
        "registerCrs cannot redefine a built-in or registered zone")
    UserRegistry.put(srid, crs): Unit
  }

  /** Human-readable supported-SRID list (for error messages / docs). */
  def supportedDescription: String =
    Registry.keys.toSeq.sorted.mkString(", ") +
      ", UTM 26901-26923 / 32601-32660 / 32701-32760" +
      (if (UserRegistry.isEmpty) ""
       else UserRegistry.keys.toSeq.sorted.mkString(", registered: ", ", ", "")) +
      "; other zones: construct from EPSG parameters and " +
      "Projection.registerCrs(srid, crs)"

  /** SRID → CRS (EPSG parameter registry — public). */
  def crsFor(srid: Int): Option[Crs] = Registry.get(srid).orElse(srid match {
    case z if z >= 32601 && z <= 32660 => Some(utm(z - 32600, north = true, Wgs84InvF))
    case z if z >= 32701 && z <= 32760 => Some(utm(z - 32700, north = false, Wgs84InvF))
    case z if z >= 26901 && z <= 26923 => Some(utm(z - 26900, north = true, Grs80InvF))
    case _                             => UserRegistry.get(srid)
  })

  /** Supported-SRID probe (for callers that want to validate up front). */
  def supported(srid: Int): Boolean = crsFor(srid).isDefined

  /** (lonDeg, latDeg) → (eastingFtUS, northingFtUS) in EPSG:2272. */
  def forward(lonDeg: Double, latDeg: Double): (Double, Double) =
    Lcc2272.fromGeo(lonDeg, latDeg)

  /** (eastingFtUS, northingFtUS) in EPSG:2272 → (lonDeg, latDeg). */
  def inverse(eFt: Double, nFt: Double): (Double, Double) =
    Lcc2272.toGeo(eFt, nFt)

  /** Transform a coordinate between two RESOLVED CRSs (route through the
    * geographic hub; projected→projected composes inverse∘forward). The
    * executor-side path: callers resolve [[crsFor]] once at plan time.
    */
  def transformWith(x: Double, y: Double, from: Crs, to: Crs): (Double, Double) = {
    val (lon, lat) = from.toGeo(x, y)
    to.fromGeo(lon, lat)
  }

  /** Transform a coordinate between any two supported SRIDs. */
  def transform(x: Double, y: Double, fromSrid: Int, toSrid: Int): (Double, Double) =
    if (fromSrid == toSrid) (x, y)
    else (crsFor(fromSrid), crsFor(toSrid)) match {
      case (Some(from), Some(to)) => transformWith(x, y, from, to)
      case _ =>
        val bad = Seq(fromSrid -> crsFor(fromSrid), toSrid -> crsFor(toSrid))
          .collect { case (s, None) => s }.mkString(", ")
        throw new IllegalArgumentException(
          s"Unsupported SRID(s) $bad (supported: $supportedDescription)")
    }
}
