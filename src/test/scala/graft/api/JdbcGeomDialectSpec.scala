package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** Geometry-dialect hook over a Derby-simulated backend: Derby has no
  * geometry type, so a stub dialect stands in for PostGIS — its
  * "serializer" and "constructor" are visible string functions, which lets
  * the test assert exactly where each rewrite fired (read wraps inside the
  * pushed-down subquery; write binds through the constructor with the
  * registered SRID inside the staged transaction). The PostGIS instance is
  * the same hook with `ST_AsText`/`ST_GeomFromText` (ref
  * datum/postgis/table.py:54-59, 179-181).
  */
class JdbcGeomDialectSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  implicit lazy val sp: org.apache.spark.sql.SparkSession = spark

  /** Derby-expressible stand-in: read = UPPER(geom) with an R: marker,
    * write = W<srid>: prefix — both observable in the stored/loaded text.
    */
  private object StubDialect extends GeomDialect {
    def readExpr(col: String): String = s"'R:' || UPPER($col)"
    def writeExpr(wkt: String, srid: Int): String = s"'W$srid:' || $wkt"
  }

  test("geometry reads wrap the column; writes bind through the constructor with the SRID") {
    val url = "jdbc:derby:memory:graftjdbcgeom;create=true"
    val base = Datum.connect(url).asInstanceOf[JdbcDatabase]
    val jdb = base.withGeometry(StubDialect, Map("GEOT" -> ("GEOM", 2272)))
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE GEOT (id BIGINT, geom VARCHAR(64))")
      st.close()
      import spark.implicits._
      val rows = Seq((1L, "point (1 2)"), (2L, "point (3 4)")).toDF("ID", "GEOM")
      jdb.store(rows, "GEOT", "append")
      // backend holds constructor-bound values (the write rewrite + srid)
      val st2 = conn.createStatement()
      val rs = st2.executeQuery("SELECT geom FROM GEOT ORDER BY id")
      val stored = Iterator.continually(rs).takeWhile(_.next()).map(_.getString(1)).toList
      st2.close()
      assert(stored == List("W2272:point (1 2)", "W2272:point (3 4)"),
        s"write must bind through writeExpr with the registered srid: $stored")
      // loads serialize through readExpr INSIDE the pushed-down subquery
      val got = jdb.table("GEOT").df.orderBy("ID").collect()
        .map(r => (r.getAs[Long]("ID"), r.getAs[String]("GEOM"))).toSeq
      assert(got == Seq((1L, "R:W2272:POINT (1 2)"), (2L, "R:W2272:POINT (3 4)")),
        s"read must wrap the geometry column in readExpr: $got")
      // overwrite replaces inside one backend transaction, same rewrite
      val repl = Seq((9L, "point (9 9)")).toDF("ID", "GEOM")
      jdb.store(repl, "GEOT", "overwrite")
      val again = jdb.table("GEOT").df.collect()
        .map(r => (r.getAs[Long]("ID"), r.getAs[String]("GEOM"))).toSeq
      assert(again == Seq((9L, "R:W2272:POINT (9 9)")), s"overwrite: $again")
      // non-geometry tables on the same connection are untouched
      val plain = Seq((1L, "x")).toDF("ID", "V")
      jdb.store(plain, "PLAINT", "overwrite")
      val p = jdb.table("PLAINT").df.collect().map(_.getAs[String]("V")).toSeq
      assert(p == Seq("x"))
    } finally conn.close()
  }
}
