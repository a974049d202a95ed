package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.spatial.StFunctions.{StForce2D, StNormalizeWkt}

/** The one custom optimizer rule the engine ships (SURVEY §4.2 keeps the
  * anti-scope: Catalyst already does everything else we need — this rule
  * exists because only WE know the algebra of our own expressions):
  * `Wkt.normalize` and `Wkt.force2D` are idempotent (parse∘write∘parse∘
  * write = parse∘write — pinned by the PropertySpec roundtrip property),
  * and force2D's output is already normalized (both write through a 2D
  * `WKTWriter`). Each collapsed call saves a full JTS parse+write per row
  * — the kind of duplicate work that appears naturally when views layer
  * cleaning steps (`st_normalize_wkt` over a column a lower view already
  * normalized).
  *
  * Plan-level rewrites only an expression's OWNER can justify are exactly
  * what `injectOptimizerRule` is for; everything else stays Catalyst's
  * job.
  */
object NormalizeIdempotence extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case StNormalizeWkt(inner @ StNormalizeWkt(_)) => inner
      case StNormalizeWkt(inner @ StForce2D(_))      => inner
      case StForce2D(inner @ StForce2D(_))           => inner
    }
}

/** Session-extension entry point: enable with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` (cluster) —
  * injects [[NormalizeIdempotence]] and registers the engine's SQL
  * functions on every new session, so `st_*`/`vec_dot`/`minhash_sig` work
  * without a driver-side [[graft.functions.GraftFunctions.register]] call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => NormalizeIdempotence)
    graft.functions.GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction(
        (new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            builder.getClass.getCanonicalName, name),
          (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => builder(es)))
    }
  }
}
