package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made `new Column(expr)` private —
  * the supported conversion lives in `classic.ExpressionUtils`, which is
  * `private[sql]`; this shim (in an org.apache.spark.sql subpackage, the
  * standard extension-library pattern) re-exports just the two conversions
  * our custom Catalyst expressions need.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Run an (unresolved) logical plan through the session's analyzer —
    * exactly what `spark.sql` does after parsing. Lets the raw-SQL route
    * execute a parsed statement whose relation leaves were rewritten
    * (per-occurrence sidecar-pruned views, c30) without regenerating SQL
    * text. `Dataset.ofRows` is `private[sql]` in Spark 4.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
