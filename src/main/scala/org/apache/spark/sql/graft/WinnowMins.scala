// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03) window minima of a
  * k-gram hash array in ONE pass: the sorted distinct minima of every
  * w-length sliding window — the document fingerprint.
  *
  * The relational formulation exploded every document into its char-gram
  * positions and pushed the whole corpus-of-grams through a per-doc
  * window sort plus an aggregation exchange; the fingerprint is a pure
  * function of the document, so with this expression (fed by
  * ShinglePolyHash's in-row gram hashes) it is a map-only projection at
  * any scale. Sliding minima via the standard monotonic-deque O(n) scan;
  * output sorted ascending (== the oracle's list_sort of DISTINCT minima).
  */
case class WinnowMins(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(w >= 1)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_mins"

  override protected def nullSafeEval(input: Any): Any =
    WinnowMins.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.WinnowMins.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowMins {
  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    val windows = n - w + 1
    if (windows <= 0) return new GenericArrayData(Array.empty[Long])
    val mins = new java.util.TreeSet[java.lang.Long]()
    // monotonic deque of indices; head is the current window's minimum
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // [head, tail)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      while (tail > head && arr.getLong(deque(tail - 1)) >= h) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) mins.add(arr.getLong(deque(head)))
      i += 1
    }
    val out = new Array[Long](mins.size)
    val it = mins.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def apply(hashes: Column, w: Int): Column =
    ExpressionUtils.column(WinnowMins(ExpressionUtils.expression(hashes), w))
}
