// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token-frequency stats in ONE pass: total count, distinct
  * count, and the highest single-token count — the inputs of the
  * Gopher-style repetition signals (dup_frac, top_token_frac).
  *
  * These are pure functions of the document, but the relational
  * formulation pushed the tokenized corpus through a (doc, token)
  * aggregation exchange plus a per-doc aggregation exchange to compute
  * them. One open-addressed pass per row makes the query map-only at any
  * scale. Null elements are skipped (callers pass filtered token arrays).
  */
case class TokenStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))
  override def prettyName: String = "token_stats"

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStats {
  def compute(arr: ArrayData): GenericInternalRow = {
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    val n = arr.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        total += 1
        val c = counts.get(tok)
        if (c == null) counts.put(tok, Array(1L)) else c(0) += 1
      }
      i += 1
    }
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next()(0); if (c > top) top = c }
    new GenericInternalRow(Array[Any](total, counts.size.toLong, top))
  }

  def apply(tokens: Column): Column =
    ExpressionUtils.column(TokenStats(ExpressionUtils.expression(tokens)))
}
