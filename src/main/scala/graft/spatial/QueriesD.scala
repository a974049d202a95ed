package graft.spatial

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.Datum
import graft.rel.Q._

/** Group D — the reference's spatial WKT surface (SURVEY.md §2.4.D, §2.5).
  *
  * The driver tables carry no geometry, so WKT inputs are synthesized as a
  * pure function of `nation.n_nationkey` (FIXTURES.md §3): 25 points inside
  * the EPSG:2272 (PA State Plane South, ftUS) extent of Philadelphia — the
  * reference's home CRS (ref datum/oracle_stgeom/table.py:205-207).
  *
  * d2/d3/d4 are deliberately **string-level** (regex/concat, no JTS
  * roundtrip): the reference literally regexes WKT text (m-scrub regexes,
  * datum/oracle_stgeom/table.py:33-34,210-223), and staying textual keeps
  * the results byte-comparable with a SQL oracle (SURVEY.md §7.3 #4).
  * d1 exercises the JTS parse∘write kernel; d5/d6 the geometry-math paths
  * (reprojection, curve linearization) that no SQL engine reproduces —
  * they are validated by golden fixtures in SpatialSpec instead.
  *
  * Scale: every spatial function here is a scalar per-row expression —
  * embarrassingly parallel, no shuffle, stays inside the scan stage.
  */
object QueriesD {

  /** Deterministic WKT fixture columns derived from nation (25 rows). */
  def geo(s: SparkSession, dir: String): DataFrame = {
    val gid = (col("n_nationkey") + 1).cast("int")
    val x = (lit(2660000) + gid * 1000).cast("int")
    val y = (lit(220000) + gid * 500).cast("int")
    val x2 = (x + 100).cast("int"); val y2 = (y + 100).cast("int")
    t(s, dir, "nation").select(
      gid.as("gid"), x.as("x"), y.as("y"),
      concat(lit("POINT("), x, lit(" "), y, lit(")")).as("wkt_raw"),
      concat(lit("POINT Z ("), x, lit(" "), y, lit(" NaN)")).as("wkt_z"),
      concat(lit("POINT M ("), x, lit(" "), y, lit(" 1.#QNAN000)")).as("wkt_m"),
      when((gid % 6) === 3,
        concat(lit("POLYGON (("), x, lit(" "), y, lit(", "), x2, lit(" "), y,
          lit(", "), x2, lit(" "), y2, lit(", "), x, lit(" "), y, lit("))")))
        .otherwise(concat(lit("POINT ("), x, lit(" "), y, lit(")"))).as("wkt_mixed"),
      when((gid % 6) === 3, lit("MULTIPOLYGON")).otherwise(lit("POINT")).as("geom_type"))
  }

  /** d11's convex CCW pentagon (integer vertices, single-sourced between
    * the Spark query and the oracle's half-plane test).
    */
  private val PentagonVerts = Seq(
    (2660000L, 215000L), (2676000L, 213000L), (2684000L, 225000L),
    (2672000L, 234000L), (2656000L, 228000L))

  private[spatial] val PentagonWkt =
    (PentagonVerts :+ PentagonVerts.head)
      .map { case (x, y) => s"$x $y" }
      .mkString("POLYGON ((", ", ", "))")

  /** Boundary-inclusive point-in-convex-CCW-polygon as SQL: every edge's
    * cross product is ≥ 0 (exact BIGINT arithmetic).
    */
  private def sqlCoversPentagon(px: String, py: String): String =
    (PentagonVerts :+ PentagonVerts.head).sliding(2).map { pair =>
      val (x1, y1) = pair(0); val (x2, y2) = pair(1)
      s"(${x2 - x1}) * ($py - $y1) - (${y2 - y1}) * ($px - $x1) >= 0"
    }.mkString(" AND ")

  val all: Map[String, Fn] = Map(
    // d1: ST_GeomFromText → ST_AsText identity through the JTS kernel
    // (ref datum/postgis/table.py:179-181, :54-59). Input has no space
    // after POINT; canonical output does — proves a real parse∘write.
    "d1_wkt_roundtrip" -> ((s, dir) =>
      geo(s, dir).select(col("gid"),
        StFunctions.stAsText(col("wkt_raw")).as("wkt")).orderBy("gid")),

    // d2: NaN→0 scrub + force-2D (ref datum/postgis/table.py:183-187),
    // string-level for oracle parity.
    "d2_force_2d" -> ((s, dir) =>
      geo(s, dir).select(col("gid"),
        StFunctions.stForce2DPoint(col("wkt_z")).as("wkt")).orderBy("gid")),

    // d3: M-value scrub (ref datum/oracle_stgeom/table.py:33-34,210-223).
    "d3_m_scrub" -> ((s, dir) =>
      geo(s, dir).select(col("gid"),
        StFunctions.mScrub(col("wkt_m")).as("wkt")).orderBy("gid")),

    // d4: POLYGON→MULTIPOLYGON iff the target column type is MULTI
    // (ref decision logic datum/postgis/table.py:247-254).
    "d4_multi_cast" -> ((s, dir) =>
      geo(s, dir).select(col("gid"), col("geom_type"),
        when(col("geom_type").startsWith("MULTI"), StFunctions.stMulti(col("wkt_mixed")))
          .otherwise(col("wkt_mixed")).as("wkt")).orderBy("gid")),

    // d5 (no-oracle): EPSG:2272 → 4326 reprojection through the full
    // façade path — scratch table + sidecar SRID + table.read(toSrid=...)
    // (ref datum/oracle_stgeom/table.py:307-313). Hand-rolled LCC math,
    // golden-point validated in SpatialSpec.
    "d5_transform_2272_4326" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val root = "/root/repo/target/fixtures/out"
      new java.io.File(root).mkdirs()
      val db = Datum.connect(s"parquet://$root")
      geo(s, dir).select(col("gid"),
        concat(lit("POINT ("), col("x"), lit(" "), col("y"), lit(")")).as("wkt"))
        .write.mode("overwrite").parquet(db.pathOf("d5_geo"))
      val props = new java.io.File(root, "d5_geo.parquet.properties")
      java.nio.file.Files.writeString(props.toPath, "srid=2272\ngeom_type=POINT\n")
      db.table("d5_geo").read(toSrid = Some(4326), sort = Seq("gid"))
    }),

    // d7: the same normalization as d1, but through the raw-SQL surface —
    // db.execute with the registered st_* functions (the way reference
    // users actually spelled spatial ops).
    "d7_sql_spatial" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val db = Datum.connect(s"parquet://$dir")
      geo(s, dir).createOrReplaceTempView("d7_geo")
      db.execute(
        "SELECT gid, st_normalize_wkt(wkt_raw) AS wkt FROM d7_geo ORDER BY gid")
    }),

    // d6 (no-oracle): CIRCULARSTRING linearization (ref ST_CurveToLine,
    // datum/postgis/table.py:189-191) — JTS has no curves; 32-chord
    // approximation, geometric properties asserted in SpatialSpec.
    "d6_curve_to_line" -> ((s, dir) =>
      geo(s, dir).select(col("gid"),
        StFunctions.stCurveToLine(
          concat(lit("CIRCULARSTRING("), col("x"), lit(" "), col("y"), lit(", "),
            col("x") + 50, lit(" "), col("y") + 50, lit(", "),
            col("x") + 100, lit(" "), col("y"), lit(")"))).as("wkt"))
        .orderBy("gid")),

    // d18: TOLERANCE-driven curve linearization — the PostGIS
    // ST_CurveToLine(geom, tol, toltype => 1) surface the reference's
    // backends expose (d6 covers the fixed-count surface): per arc the
    // chord count comes from the sagitta bound, so the deviation contract
    // is uniform across mixed radii. Scan-local string kernel like every
    // WKT op; golden rows frozen after the definitional checks
    // (SpatialSpec sagitta/endpoint/chord-count + the curveToLineTol
    // property pin over random arcs).
    "d18_curve_tolerance" -> ((s, dir) =>
      geo(s, dir).select(col("gid"),
        StFunctions.stCurveToLine(
          concat(lit("CIRCULARSTRING("), col("x"), lit(" "), col("y"), lit(", "),
            col("x") + 50, lit(" "), col("y") + 50, lit(", "),
            col("x") + 100, lit(" "), col("y"), lit(")")), 2.0).as("wkt"))
        .orderBy("gid")),

    // d9: grid-partitioned bbox spatial join — points (derived from
    // customer) aggregated per containing rectangle (derived from nation).
    // Candidates come from an equi-join on grid cell (SpatialJoin.bboxJoin)
    // so the plan is shuffle-bounded at any scale — the distributed-spatial
    // standard — and the exact containment filter keeps it precise. The
    // oracle is the plain BETWEEN join: same result, any plan.
    "d9_bbox_join" -> ((s, dir) => {
      val pts = t(s, dir, "customer").select(
        col("c_custkey"),
        (lit(2650000) + (col("c_custkey") * 7919) % 40000).as("px"),
        (lit(210000) + (col("c_custkey") * 5081) % 30000).as("py"))
      val gid = (col("n_nationkey") + 1).cast("int")
      val boxes = t(s, dir, "nation").select(
        gid.as("gid"),
        (lit(2650000) + gid * 1500).as("xmin"),
        (lit(2650000) + gid * 1500 + 2000).as("xmax"),
        (lit(210000) + gid * 1100).as("ymin"),
        (lit(210000) + gid * 1100 + 1600).as("ymax"))
      SpatialJoin.bboxJoin(pts, boxes, cell = 2000)
        .groupBy("gid")
        .agg(count(lit(1)).as("n_pts"), sum(col("c_custkey")).as("sum_keys"))
        .orderBy("gid")
    }),

    // d11: point-in-polygon containment (ST_Covers) — the scalar JTS
    // kernel behind spatial filtering: a literal convex pentagon (parsed
    // ONCE via the expression's memoized PreparedGeometry), customers'
    // derived points tested in-scan — no join, no shuffle, the filter
    // rides the table scan at any scale (a MANY-polygon containment join
    // is d9's grid recipe instead). Boundary-inclusive covers() on
    // integer coordinates is orientation-exact, so the DuckDB oracle's
    // cross-product half-plane test agrees bit-for-bit.
    "d11_point_in_polygon" -> ((s, dir) => {
      val pts = t(s, dir, "customer").select(
        col("c_custkey"),
        (lit(2650000) + (col("c_custkey") * 7919) % 40000).as("px"),
        (lit(210000) + (col("c_custkey") * 5081) % 30000).as("py"))
      pts.filter(StFunctions.stCoversPoint(lit(PentagonWkt), col("px"), col("py")))
        .select("c_custkey", "px", "py").orderBy("c_custkey")
    }),

    // d12: geometry measures (ST_Area / ST_Length) — JTS kernels whose
    // values a plain-SQL oracle reproduces BIT-exactly by construction:
    // axis-aligned integer rectangles make the shoelace exact (area =
    // w·h), and 3-4-5 Pythagorean polylines make every segment length a
    // perfect square's root (len = 5a + 10a). In-scan scalar expressions,
    // no shuffle.
    "d12_geom_measures" -> ((s, dir) => {
      val gid = (col("n_nationkey") + 1).cast("long")
      val x = lit(2660000L); val y = lit(220000L)
      val w = lit(100L) + gid * 10L; val h = lit(50L) + gid * 5L
      val sp = lit(" "); val cm = lit(", ")
      val quad = concat(lit("POLYGON (("),
        x, sp, y, cm,
        x + w, sp, y, cm,
        x + w, sp, y + h, cm,
        x, sp, y + h, cm,
        x, sp, y, lit("))"))
      val line = concat(lit("LINESTRING ("),
        x, sp, y, cm,
        x + gid * 3L, sp, y + gid * 4L, cm,
        x + gid * 9L, sp, y + gid * 12L, lit(")"))
      t(s, dir, "nation").select(gid.as("gid"),
        StFunctions.stArea(quad).as("area"),
        StFunctions.stLength(line).as("length"))
        .orderBy("gid")
    }),

    // d10: bounded nearest-neighbor spatial join — each point's closest
    // site within 3000 units (the kNN analogue of d9's containment join:
    // same one-cell-per-point grid, sites explode to 3×3 neighborhoods, so
    // candidates stay an equi-join at any scale). Exact integer squared
    // distances; argmin is a map-side-combined struct min; the oracle is
    // the brute-force QUALIFY row_number() argmin.
    "d10_nn_join" -> ((s, dir) => {
      val pts = t(s, dir, "customer").select(
        col("c_custkey").as("pid"),
        (lit(2650000) + (col("c_custkey") * 7919) % 40000).as("px"),
        (lit(210000) + (col("c_custkey") * 5081) % 30000).as("py"))
      val gid = (col("n_nationkey") + 1).cast("long")
      val sites = t(s, dir, "nation").select(
        gid.as("sid"),
        (lit(2650000) + (gid * 9973) % 40000).as("sx"),
        (lit(210000) + (gid * 6397) % 30000).as("sy"))
      SpatialJoin.nnJoin(pts, sites, radius = 3000).orderBy("pid")
    }),

    // d8 (no-oracle): projected→projected reprojection through the façade —
    // EPSG:2272 (ftUS State Plane) to EPSG:26918 (NAD83 UTM 18N, metres),
    // routed via the geographic hub (the any-CRS capability the reference
    // delegated to pyproj, datum/oracle_stgeom/table.py:307-313).
    // Transverse Mercator math validated by defining-property tests in
    // SpatialSpec (Simpson meridian arc, conformality, round-trip).
    "d8_transform_utm" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val root = "/root/repo/target/fixtures/out"
      new java.io.File(root).mkdirs()
      val db = Datum.connect(s"parquet://$root")
      geo(s, dir).select(col("gid"),
        concat(lit("POINT ("), col("x"), lit(" "), col("y"), lit(")")).as("wkt"))
        .write.mode("overwrite").parquet(db.pathOf("d8_geo"))
      val props = new java.io.File(root, "d8_geo.parquet.properties")
      java.nio.file.Files.writeString(props.toPath, "srid=2272\ngeom_type=POINT\n")
      db.table("d8_geo").read(toSrid = Some(26918), sort = Seq("gid"))
    }),

    // d13: State Plane → Web Mercator (EPSG:3857) through the façade — the
    // web-tile target a municipal datum user asks for first (spherical
    // pseudo-Mercator, EPSG method 1024; world-bound constant and
    // conformality pinned in SpatialSpec). VALUES oracle from the frozen
    // golden outputs (GoldenD).
    "d13_transform_web" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val root = "/root/repo/target/fixtures/out"
      new java.io.File(root).mkdirs()
      val db = Datum.connect(s"parquet://$root")
      geo(s, dir).select(col("gid"),
        concat(lit("POINT ("), col("x"), lit(" "), col("y"), lit(")")).as("wkt"))
        .write.mode("overwrite").parquet(db.pathOf("d13_geo"))
      val props = new java.io.File(root, "d13_geo.parquet.properties")
      java.nio.file.Files.writeString(props.toPath, "srid=2272\ngeom_type=POINT\n")
      db.table("d13_geo").read(toSrid = Some(3857), sort = Seq("gid"))
    }),

    // d14: State Plane → Conus Albers (EPSG:5070) — the equal-area CRS of
    // national statistics (Snyder pp. 98-102 ellipsoidal Albers 2SP;
    // equal-area Jacobian + origin golden pinned in SpatialSpec). VALUES
    // oracle from the frozen golden outputs (GoldenD).
    "d14_transform_albers" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val root = "/root/repo/target/fixtures/out"
      new java.io.File(root).mkdirs()
      val db = Datum.connect(s"parquet://$root")
      geo(s, dir).select(col("gid"),
        concat(lit("POINT ("), col("x"), lit(" "), col("y"), lit(")")).as("wkt"))
        .write.mode("overwrite").parquet(db.pathOf("d14_geo"))
      val props = new java.io.File(root, "d14_geo.parquet.properties")
      java.nio.file.Files.writeString(props.toPath, "srid=2272\ngeom_type=POINT\n")
      db.table("d14_geo").read(toSrid = Some(5070), sort = Seq("gid"))
    }),

    // d15: cross-STATE-PLANE conversion (EPSG:2272 PA South → 2263 NY Long
    // Island, both ftUS LCC zones) — the datum-to-datum neighbor-agency
    // exchange; exercises the parameterized LambertConformalConic on both
    // legs of the geographic hub. VALUES oracle from frozen goldens
    // (GoldenD); zone params pinned by definitional false-origin +
    // distortion-free-parallel + NYC-window tests in SpatialSpec.
    "d15_transform_stateplane" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val root = "/root/repo/target/fixtures/out"
      new java.io.File(root).mkdirs()
      val db = Datum.connect(s"parquet://$root")
      geo(s, dir).select(col("gid"),
        concat(lit("POINT ("), col("x"), lit(" "), col("y"), lit(")")).as("wkt"))
        .write.mode("overwrite").parquet(db.pathOf("d15_geo"))
      val props = new java.io.File(root, "d15_geo.parquet.properties")
      java.nio.file.Files.writeString(props.toPath, "srid=2272\ngeom_type=POINT\n")
      db.table("d15_geo").read(toSrid = Some(2263), sort = Seq("gid"))
    }),

    // d16: NEIGHBOR-zone conversion (EPSG:2272 PA South → 2271 PA North,
    // the reference's home zone to its literal northern neighbor) — the
    // r5 verdict's missing-registry case: the reference delegates to
    // pyproj, which accepts any EPSG (ref datum/oracle_stgeom/util.py:5-19);
    // the repo's registry now carries the common NAD83 state-plane LCC/TM
    // zones as pure parameter rows on the existing projection classes.
    // VALUES oracle from frozen goldens (GoldenD); zone params pinned by
    // definitional false-origin + distortion-free-parallel tests in
    // SpatialSpec.
    "d16_transform_neighbor" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val root = "/root/repo/target/fixtures/out"
      new java.io.File(root).mkdirs()
      val db = Datum.connect(s"parquet://$root")
      geo(s, dir).select(col("gid"),
        concat(lit("POINT ("), col("x"), lit(" "), col("y"), lit(")")).as("wkt"))
        .write.mode("overwrite").parquet(db.pathOf("d16_geo"))
      val props = new java.io.File(root, "d16_geo.parquet.properties")
      java.nio.file.Files.writeString(props.toPath, "srid=2272\ngeom_type=POINT\n")
      db.table("d16_geo").read(toSrid = Some(2271), sort = Seq("gid"))
    }),

    // d17: USER-REGISTERED zone conversion — EPSG:2235 (NAD83 / Delaware
    // ftUS, TM zone 0700) is NOT in the built-in registry; the query
    // declares it at runtime from its published EPSG parameters via
    // Projection.registerCrs, the arbitrary-EPSG escape hatch (the
    // reference's pyproj accepts any code from its bundled EPSG database,
    // ref datum/oracle_stgeom/util.py:5-19 — offline, the long tail is
    // constructible instead: every SPCS83 zone is LCC-2SP or TM).
    // Registration is driver-side; the st_transform expression captures
    // the resolved Crs pair at plan time and serializes it into the task,
    // so the registry never needs to exist on executors. VALUES oracle
    // from frozen goldens (GoldenD.D17: definitional false-origin +
    // round-trip + cross-zone agreement checks at freeze time).
    "d17_transform_registered" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Projection.registerCrs(2235, Projection.TransverseMercator(
        Projection.Grs80InvF, -(75.0 + 25.0 / 60.0), 0.999995,
        200000.0, 0.0, lat0Deg = 38.0, unitToM = Projection.FtUs))
      val root = "/root/repo/target/fixtures/out"
      new java.io.File(root).mkdirs()
      val db = Datum.connect(s"parquet://$root")
      geo(s, dir).select(col("gid"),
        concat(lit("POINT ("), col("x"), lit(" "), col("y"), lit(")")).as("wkt"))
        .write.mode("overwrite").parquet(db.pathOf("d17_geo"))
      val props = new java.io.File(root, "d17_geo.parquet.properties")
      java.nio.file.Files.writeString(props.toPath, "srid=2272\ngeom_type=POINT\n")
      db.table("d17_geo").read(toSrid = Some(2235), sort = Seq("gid"))
    })
  )

  val oracle: Map[String, String] = Map(
    // geometry-math queries: literal-VALUES oracles over the frozen golden
    // outputs (see GoldenD) — promotes reprojection/linearization into the
    // driver's hash gate
    "d5_transform_2272_4326" -> GoldenD.valuesOracle(GoldenD.D5),
    "d6_curve_to_line" -> GoldenD.valuesOracle(GoldenD.D6),
    "d18_curve_tolerance" -> GoldenD.valuesOracle(GoldenD.D18),
    "d8_transform_utm" -> GoldenD.valuesOracle(GoldenD.D8),
    "d13_transform_web" -> GoldenD.valuesOracle(GoldenD.D13),
    "d14_transform_albers" -> GoldenD.valuesOracle(GoldenD.D14),
    "d15_transform_stateplane" -> GoldenD.valuesOracle(GoldenD.D15),
    "d16_transform_neighbor" -> GoldenD.valuesOracle(GoldenD.D16),
    "d17_transform_registered" -> GoldenD.valuesOracle(GoldenD.D17),
    "d12_geom_measures" ->
      ("SELECT n_nationkey + 1 AS gid, " +
        "CAST((100 + (n_nationkey + 1) * 10) * (50 + (n_nationkey + 1) * 5) AS DOUBLE) AS area, " +
        "CAST(15 * (n_nationkey + 1) AS DOUBLE) AS length " +
        "FROM nation ORDER BY gid"),
    "d11_point_in_polygon" ->
      ("WITH pts AS (SELECT c_custkey, 2650000 + (c_custkey * 7919) % 40000 AS px, " +
        "210000 + (c_custkey * 5081) % 30000 AS py FROM customer) " +
        "SELECT c_custkey, px, py FROM pts WHERE " +
        sqlCoversPentagon("px", "py") + " ORDER BY c_custkey"),
    "d1_wkt_roundtrip" ->
      ("SELECT n_nationkey + 1 AS gid, 'POINT (' || (2660000 + (n_nationkey+1)*1000) || ' ' || " +
        "(220000 + (n_nationkey+1)*500) || ')' AS wkt FROM nation ORDER BY gid"),
    "d7_sql_spatial" ->
      ("SELECT n_nationkey + 1 AS gid, 'POINT (' || (2660000 + (n_nationkey+1)*1000) || ' ' || " +
        "(220000 + (n_nationkey+1)*500) || ')' AS wkt FROM nation ORDER BY gid"),
    "d2_force_2d" ->
      ("SELECT n_nationkey + 1 AS gid, 'POINT (' || (2660000 + (n_nationkey+1)*1000) || ' ' || " +
        "(220000 + (n_nationkey+1)*500) || ')' AS wkt FROM nation ORDER BY gid"),
    "d3_m_scrub" ->
      ("SELECT n_nationkey + 1 AS gid, 'POINT (' || (2660000 + (n_nationkey+1)*1000) || ' ' || " +
        "(220000 + (n_nationkey+1)*500) || ')' AS wkt FROM nation ORDER BY gid"),
    "d9_bbox_join" ->
      ("WITH pts AS (SELECT c_custkey, 2650000 + (c_custkey * 7919) % 40000 AS px, " +
        "210000 + (c_custkey * 5081) % 30000 AS py FROM customer), " +
        "boxes AS (SELECT n_nationkey + 1 AS gid, " +
        "2650000 + (n_nationkey + 1) * 1500 AS xmin, " +
        "2650000 + (n_nationkey + 1) * 1500 + 2000 AS xmax, " +
        "210000 + (n_nationkey + 1) * 1100 AS ymin, " +
        "210000 + (n_nationkey + 1) * 1100 + 1600 AS ymax FROM nation) " +
        "SELECT gid, count(*) AS n_pts, CAST(sum(c_custkey) AS BIGINT) AS sum_keys " +
        "FROM pts JOIN boxes ON px BETWEEN xmin AND xmax AND py BETWEEN ymin AND ymax " +
        "GROUP BY gid ORDER BY gid"),
    "d10_nn_join" ->
      ("WITH pts AS (SELECT c_custkey AS pid, 2650000 + (c_custkey * 7919) % 40000 AS px, " +
        "210000 + (c_custkey * 5081) % 30000 AS py FROM customer), " +
        "sites AS (SELECT CAST(n_nationkey + 1 AS BIGINT) AS sid, " +
        "2650000 + ((n_nationkey + 1) * 9973) % 40000 AS sx, " +
        "210000 + ((n_nationkey + 1) * 6397) % 30000 AS sy FROM nation), " +
        "cand AS (SELECT pid, sid, (px-sx)*(px-sx) + (py-sy)*(py-sy) AS d2 " +
        "FROM pts CROSS JOIN sites " +
        "WHERE (px-sx)*(px-sx) + (py-sy)*(py-sy) <= 9000000) " +
        "SELECT pid, sid AS nn_sid, d2 FROM cand " +
        "QUALIFY row_number() OVER (PARTITION BY pid ORDER BY d2, sid) = 1 " +
        "ORDER BY pid"),
    "d4_multi_cast" ->
      ("WITH g AS (SELECT n_nationkey + 1 AS gid, " +
        "2660000 + (n_nationkey+1)*1000 AS x, 220000 + (n_nationkey+1)*500 AS y " +
        "FROM nation) " +
        "SELECT gid, CASE WHEN gid % 6 = 3 THEN 'MULTIPOLYGON' ELSE 'POINT' END AS geom_type, " +
        "CASE WHEN gid % 6 = 3 THEN 'MULTIPOLYGON (((' || x || ' ' || y || ', ' || (x+100) || ' ' || y || ', ' || " +
        "(x+100) || ' ' || (y+100) || ', ' || x || ' ' || y || ')))' ELSE 'POINT (' || x || ' ' || y || ')' END AS wkt " +
        "FROM g ORDER BY gid")
  )
}
