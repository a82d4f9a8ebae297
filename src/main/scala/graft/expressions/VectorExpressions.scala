package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Vector kernels as native expressions.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate
  * their lambda per element OUTSIDE whole-stage codegen — a 64-dim dot
  * product becomes ~128 boxed lambda invocations per row. At ANN scale
  * (millions of candidate pairs) that interpretation cost dominates the
  * plan, so the dot product gets a real codegen'd kernel: one static
  * call, one tight loop over the unsafe array data. Accumulation is
  * left-to-right, matching both the HOF formulation and DuckDB's
  * `list_dot_product`, so oracle parity is preserved bit-for-bit.
  */
object VectorOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** dot(a, b) over array<double> columns — codegen'd kernel. */
  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
}
