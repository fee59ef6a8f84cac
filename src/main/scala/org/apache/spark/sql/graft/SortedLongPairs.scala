// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StructField, StructType}

/** All ordered pairs (a[i], a[j]), i < j, of an ascending-sorted
  * `array<long>` — the per-order co-purchase pair expansion as ONE
  * primitive allocation.
  *
  * Why a custom Catalyst expression: the built-in spelling
  * `flatten(transform(ps, (x, i) -> transform(slice(ps, i+2, size(ps)),
  * y -> struct(x, y))))` is interpreted (higher-order functions never
  * reach codegen) and each `slice` re-copies an O(size) subarray — the
  * expansion is O(m³) element copies per order plus a boxed struct per
  * pair. This emits the same pairs from two cursors into one
  * exactly-sized array. Input sorted ascending ⇒ part_a < part_b, the
  * caller's invariant, is preserved unchanged. */
case class SortedLongPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("part_a", LongType, nullable = false),
    StructField("part_b", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "sorted_long_pairs"

  override protected def nullSafeEval(input: Any): Any =
    SortedLongPairs.expand(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.SortedLongPairs.expand($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortedLongPairs {
  def expand(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val out = new Array[Any](m * (m - 1) / 2)
    var k = 0
    var i = 0
    while (i < m) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < m) {
        out(k) = new GenericInternalRow(Array[Any](a, arr.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(ps: Column): Column =
    ExpressionUtils.column(SortedLongPairs(ExpressionUtils.expression(ps)))
}
