package graft.spatial

/** Hand-rolled coordinate reprojection for the reference's home CRS pair:
  * EPSG:2272 (NAD83 / Pennsylvania South, US survey foot) ↔ EPSG:4326.
  *
  * The reference reprojects client-side with pyproj (ref
  * datum/oracle_stgeom/table.py:307-313) because `SDE.ST_Transform` "can't
  * transform between coordinate systems based on different datums" (comment
  * at datum/oracle_stgeom/table.py:205-207); its shipped `WktTransformer`
  * is actually broken (`partial` used but never imported,
  * datum/oracle_stgeom/util.py:10). No proj library exists in this offline
  * environment, so the Lambert Conformal Conic (2SP) math is implemented
  * directly from the published EPSG parameters (EPSG:2272 / SPCS83 PA South
  * zone 3702) and Snyder's "Map Projections — A Working Manual" formulas
  * (USGS PP 1395, pp. 107-109), which are public.
  *
  * NAD83 vs WGS84 datum shift is treated as identity (≤ ~1 m, standard
  * practice absent a grid shift file) — documented approximation.
  *
  * Pure double math, thread-safe, allocation-free: safe to call from
  * codegen'd expressions on executors at any scale.
  */
object Projection {
  // GRS80 ellipsoid
  private val A  = 6378137.0
  private val F  = 1.0 / 298.257222101
  private val E2 = 2 * F - F * F
  private val E  = math.sqrt(E2)

  // EPSG:2272 Lambert Conformal Conic (2SP) parameters
  private val Lat0 = math.toRadians(39.0 + 20.0 / 60.0)   // latitude of false origin 39°20'N
  private val Lon0 = math.toRadians(-(77.0 + 45.0 / 60.0)) // central meridian 77°45'W
  private val Lat1 = math.toRadians(40.0 + 58.0 / 60.0)   // std parallel 1 40°58'N
  private val Lat2 = math.toRadians(39.0 + 56.0 / 60.0)   // std parallel 2 39°56'N
  private val FEm  = 600000.0                              // false easting (metres)
  private val FNm  = 0.0
  /** US survey foot (exact: 1200/3937 m). */
  val FtUs: Double = 1200.0 / 3937.0

  private def m(lat: Double) = math.cos(lat) / math.sqrt(1 - E2 * math.sin(lat) * math.sin(lat))
  private def t(lat: Double) = {
    val es = E * math.sin(lat)
    math.tan(math.Pi / 4 - lat / 2) / math.pow((1 - es) / (1 + es), E / 2)
  }

  private val N_ = (math.log(m(Lat1)) - math.log(m(Lat2))) / (math.log(t(Lat1)) - math.log(t(Lat2)))
  private val Fc = m(Lat1) / (N_ * math.pow(t(Lat1), N_))
  private val Rho0 = A * Fc * math.pow(t(Lat0), N_)

  /** (lonDeg, latDeg) → (eastingFtUS, northingFtUS) in EPSG:2272. */
  def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val lat = math.toRadians(latDeg); val lon = math.toRadians(lonDeg)
    val rho = A * Fc * math.pow(t(lat), N_)
    val th  = N_ * (lon - Lon0)
    val e_m = FEm + rho * math.sin(th)
    val n_m = FNm + Rho0 - rho * math.cos(th)
    (e_m / FtUs, n_m / FtUs)
  }

  /** (eastingFtUS, northingFtUS) in EPSG:2272 → (lonDeg, latDeg). */
  def inverse(eFt: Double, nFt: Double): (Double, Double) = {
    val x = eFt * FtUs - FEm
    val y = Rho0 - (nFt * FtUs - FNm)
    val rho = math.signum(N_) * math.sqrt(x * x + y * y)
    val tp  = math.pow(rho / (A * Fc), 1 / N_)
    val th  = math.atan2(x, y)
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

  /** Transform a coordinate between the supported SRIDs. */
  def transform(x: Double, y: Double, fromSrid: Int, toSrid: Int): (Double, Double) =
    (fromSrid, toSrid) match {
      case (a, b) if a == b => (x, y)
      case (2272, 4326)     => inverse(x, y)
      case (4326, 2272)     => forward(x, y)
      case _ =>
        throw new IllegalArgumentException(
          s"Unsupported transform $fromSrid→$toSrid (supported: 2272↔4326)")
    }
}
