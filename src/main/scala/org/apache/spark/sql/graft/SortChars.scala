// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted-character string — the anagram signature (`mapphase/map.go:66-71`)
  * as ONE primitive sort instead of `array_join(array_sort(split(s, '')))`,
  * which allocates an array of single-char UTF8Strings, sorts them with
  * per-element byte comparisons, and re-concatenates. The letter sort is the
  * measured hot op of the whole anagram family (two-stage probe: the
  * signature accounted for ~half the pipeline), so this is the same
  * built-ins-can't-express-it-efficiently case as FloatDotProduct.
  *
  * Semantics: sorts CODE POINTS ascending, which equals the built-in chain's
  * UTF8String binary (UTF-8 byte) ordering for all of Unicode, and equals
  * the DuckDB oracle's `list_sort(string_split(s, ''))` binary collation —
  * results are engine-identical with no oracle change.
  */
case class SortChars(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "sort_chars"

  override protected def nullSafeEval(input: Any): Any =
    SortChars.sortUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.SortChars.sortUtf8($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortChars {
  /** ASCII fast path sorts bytes in place; general path sorts code points
    * (== UTF-8 byte order for all Unicode). */
  def sortUtf8(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      val copy = java.util.Arrays.copyOf(bytes, bytes.length)
      java.util.Arrays.sort(copy)
      UTF8String.fromBytes(copy)
    } else {
      val cps = s.toString.codePoints().toArray
      java.util.Arrays.sort(cps)
      UTF8String.fromString(new String(cps, 0, cps.length))
    }
  }

  def apply(c: Column): Column =
    ExpressionUtils.column(SortChars(ExpressionUtils.expression(c)))
}
