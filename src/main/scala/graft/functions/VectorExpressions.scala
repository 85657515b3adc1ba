package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the embedding-similarity hot path:
  * dot product of two FLOAT array columns accumulated in double, in
  * index order (deterministic — matches a sequential SQL fold).
  *
  * This is the (b) tier of the custom-operator ladder: a codegen'd
  * `Expression` stays inside whole-stage codegen, so the O(n·k·d)
  * similarity scan runs as a tight primitive loop with no boxing, no
  * UDF serialization, and no Scala closure dispatch per element.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecF {
  /** dot(a, b) over array<float> columns, as a Column. */
  def dotF(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatVectorDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** L2 norm of an array<float> column. */
  def normF(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotF(a, a))
}
