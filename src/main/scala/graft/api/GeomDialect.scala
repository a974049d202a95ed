package graft.api

/** Per-backend geometry column rewrite — the hook that lets [[JdbcDatabase]]
  * talk to geometry-typed backends the way the reference does: its PostGIS
  * adapter SELECTs geometry through `ST_AsText(geom)` on read (ref
  * datum/postgis/table.py:54-59) and binds WKT back through
  * `ST_GeomFromText(%s, srid)` on write (ref datum/postgis/table.py:179-181);
  * the SDE adapter does the same with `SDE.ST_AsText`/`ST_Geometry` (ref
  * datum/oracle_stgeom/table.py:423-449).
  *
  * Spark-side, geometry is always WKT text (the repo's canonical geometry
  * interchange); the dialect only decides what SQL wraps the column at the
  * backend boundary. Reads stay a single pushed-down projection (the
  * wrapping happens inside the JDBC subquery, so the backend computes WKT
  * and Spark scans text); writes ride the existing staged-transaction
  * recipe (bulk-load WKT to a stage table task-parallel, then one
  * `INSERT .. SELECT writeExpr(geom) FROM stage` inside a backend
  * transaction) — the cluster-native version of the reference's chunked
  * executemany with per-value `ST_GeomFromText`.
  */
trait GeomDialect {
  /** Backend SQL that reads geometry column `col` (already quoted) as WKT. */
  def readExpr(col: String): String

  /** Backend SQL that converts WKT expression `wkt` (already quoted) into
    * the backend geometry type at `srid`.
    */
  def writeExpr(wkt: String, srid: Int): String
}

object GeomDialect {
  /** PostGIS flavor (ref datum/postgis/table.py:54-59, 179-181). */
  object Postgis extends GeomDialect {
    def readExpr(col: String): String = s"ST_AsText($col)"
    def writeExpr(wkt: String, srid: Int): String = s"ST_GeomFromText($wkt, $srid)"
  }
}
