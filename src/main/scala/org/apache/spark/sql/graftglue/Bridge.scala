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
}
