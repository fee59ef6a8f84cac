// Lives under org.apache.spark.sql because ExpectsInputTypes/ExpressionUtils
// are private[sql] — the standard packaging for third-party Catalyst
// expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two `array<float>` columns, accumulating in
  * double with a strict left fold from 0.0 — the same IEEE op sequence as
  * the oracle's explicit `a[1]*b[1] + a[2]*b[2] + …` chain, so results are
  * bit-identical across engines (SURVEY.md §6).
  *
  * Why a custom Catalyst expression: a 64-term `element_at` chain blows the
  * JIT method budget and falls back to interpreted evaluation — measured
  * 90 s for the 2M-pair cosine join at sf0.1 vs ~2 s with this tight
  * generated loop. Preference order per the design brief: built-ins can't
  * express this efficiently, so a `doGenCode` expression is the next step
  * (and beats any UDF, which would break codegen entirely).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
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
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatDotProduct {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatDotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
