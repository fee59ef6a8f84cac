// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The string as an INT CODEPOINT array — the character-resolution corpus
  * representation the suffix-index build explodes (SuffixRepeats.charFrame).
  *
  * `posexplode(split(text, ''))` materializes one 1-char *String object* per
  * corpus character (~40x the memory of the character itself) and every
  * downstream comparison is a UTF8String compare. One codepoint int is 4
  * bytes, packs into an UnsafeArrayData primitive region with zero per-item
  * objects, and compares as a long once widened — the representation fix
  * VERDICT r8 asked for on the hottest loop in the engine.
  *
  * Codepoint iteration (not UTF-16 units) matches the element count and
  * boundaries of `split(text, '')`, Spark's `length()`/`substring()` and
  * DuckDB's `length()`/`substr()`, so `doc_len` stays consistent across the
  * Spark plan and the oracle. UTF-8 byte order equals codepoint order, so
  * rank ordering is unchanged too.
  */
case class StringCodepoints(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "codepoints"

  override protected def nullSafeEval(input: Any): Any =
    StringCodepoints.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.StringCodepoints.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringCodepoints {
  /** One pass: decode codepoints into a primitive int array (one String
    * materialization per DOCUMENT, none per character). */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val len = str.length
    val out = new Array[Int](str.codePointCount(0, len))
    var i = 0
    var j = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      out(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def apply(text: Column): Column =
    ExpressionUtils.column(StringCodepoints(ExpressionUtils.expression(text)))
}
