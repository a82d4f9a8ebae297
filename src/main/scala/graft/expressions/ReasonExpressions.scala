package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** R1 reason selection as a native kernel (reference
  * api/rules/eval_event.py:521-548 `_select_top_reasons`): sort hit
  * entries by (priority desc, |score| desc, declaration order) —
  * encoded ascending as (np, ns, seq) — dedup by reason keeping the
  * first, return (top-3, all unique).
  *
  * The composable formulation (`sort_array` over structs + `transform`
  * + a positional-dedup `filter` whose `array_position` re-scans the
  * array per element, interpreted) ran ~9.4 s over 100 k rows at
  * sf0.1; this is one static call per row.
  */
object ReasonOps {

  /** entries: array<struct<np:int, ns:double, seq:int, reason:string>>
    * → struct<top3: array<string>, all: array<string>>.
    */
  def select(entries: ArrayData, topK: Int): InternalRow = {
    val n = entries.numElements()
    val idx = new Array[Int](n)
    val np = new Array[Int](n)
    val ns = new Array[Double](n)
    val seq = new Array[Int](n)
    val reasons = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val row = entries.getStruct(i, 4)
      idx(i) = i
      np(i) = row.getInt(0)
      ns(i) = row.getDouble(1)
      seq(i) = row.getInt(2)
      reasons(i) = row.getUTF8String(3)
      i += 1
    }
    val order = idx.sortWith { (a, b) =>
      if (np(a) != np(b)) np(a) < np(b)
      else if (ns(a) != ns(b)) ns(a) < ns(b)
      else seq(a) < seq(b)
    }
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var j = 0
    while (j < order.length) {
      val r = reasons(order(j))
      if (r.numBytes() > 0) seen.add(r)
      j += 1
    }
    val all = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { all(k) = it.next(); k += 1 }
    val top: Array[Any] = all.take(math.min(topK, all.length))
    new GenericInternalRow(Array[Any](
      new GenericArrayData(top), new GenericArrayData(all)))
  }
}

case class TopReasons(child: Expression, topK: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("top", ArrayType(StringType, containsNull = false)),
    StructField("all", ArrayType(StringType, containsNull = false))))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "top_reasons"

  override protected def nullSafeEval(input: Any): Any =
    ReasonOps.select(input.asInstanceOf[ArrayData], topK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ReasonOps$$.MODULE$$.select($c, $topK)")

  override protected def withNewChildInternal(newChild: Expression): TopReasons =
    copy(child = newChild)
}

object ReasonFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def topReasons(entries: Column, topK: Int): Column =
    column(TopReasons(expression(entries), topK))
}
