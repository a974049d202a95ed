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

  val all: Seq[(String, Builder)] = Seq(
    "st_normalize_wkt" -> (es => StNormalizeWkt(es.head)),
    "st_astext"        -> (es => StNormalizeWkt(es.head)),
    "st_geomfromtext"  -> (es => StNormalizeWkt(es.head)),
    "st_force2d"       -> (es => StForce2D(es.head)),
    "st_curvetoline"   -> (es => StCurveToLine(es.head)),
    "st_transform"     -> (es => StTransform(es(0), es(1), es(2))),
    "vec_dot"          -> (es => graft.functions.VecDot(es(0), es(1))))

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
