package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Bridge.{column, expression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native vector kernels for the similarity operators.
  *
  * The composable formulation (`aggregate(zip_with(a, b, *), 0.0, +)`)
  * is semantically right but interprets two lambdas per element and
  * allocates an intermediate array per row — measured 79 s for the 12.5M
  * pair-wise dots of e8 at sf0.1. This expression evaluates the same
  * left-to-right IEEE-754 fold (bit-identical results, still `0.0 + t1 +
  * t2 + …`) as one primitive loop with full codegen support.
  *
  * Scale: per-row scalar, no state, no allocation beyond the codegen'd
  * loop — stays inside WholeStageCodegen in the scan/join stage.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toDoubleArray()
    val b = r.asInstanceOf[ArrayData].toDoubleArray()
    // fail loudly: a silent partial dot product would mask a data bug
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"vec_dot: dimension mismatch (${a.length} vs ${b.length})")
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      s"""
         |int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: dimension mismatch (" + $n + " vs " + $r.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $l.getDouble($i) * $r.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(l, r)
  override def prettyName: String = "vec_dot"
}

object VecExpressions {
  /** Dot product of two array<double> columns (codegen'd primitive loop,
    * identical fold order to the HOF formulation).
    */
  def vecDot(a: Column, b: Column): Column = column(VecDot(expression(a), expression(b)))
}
