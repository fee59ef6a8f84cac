// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash of a token set in ONE pass, entirely inside the row.
  *
  * Per token: the shared engine hash (first 60 bits of md5 — identical to
  * `conv(substring(md5(tok),1,15),16,10)` and to the DuckDB oracle's
  * `CAST(concat('0x', substr(md5(tok),1,15)) AS BIGINT)`), then the classic
  * Charikar bit-vote: each of the 60 bits contributes +1/-1 to its counter,
  * and the final simhash sets bit i iff counter i > 0.
  *
  * Replaces a 3-stage distributed plan (token explode → (doc,token) distinct
  * shuffle → 60-conditional-sum aggregation shuffle) with a single
  * projection: per-doc SimHash is embarrassingly parallel, so at 100 TB this
  * runs as a map-only stage with ZERO shuffles — the shuffled variant moved
  * the whole tokenized corpus through two exchanges first. Token dedup
  * happens in the caller via `array_distinct` (order-insensitive: the vote
  * sums commute).
  *
  * Reference for the operator family: near-dup detection the reference repo
  * does not have; SimHash per Charikar (STOC'02) as used by web-scale dedup.
  */
case class Simhash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    Simhash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.Simhash60.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash60 {
  val Bits = 60

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One linear pass over the token array: md5 per token, 60 bit-votes. */
  def compute(arr: ArrayData): Long = {
    val sums = new Array[Int](Bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val md = mdLocal.get()
        md.reset()
        val dig = md.digest(arr.getUTF8String(i).getBytes)
        // first 15 hex digits of the md5 = top 60 bits of the digest:
        // bytes 0..7 big-endian, dropping the low nibble of byte 7
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (dig(j) & 0xffL); j += 1 }
        h = h >>> 4
        var b = 0
        while (b < Bits) {
          sums(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var v = 0L
    var b = 0
    while (b < Bits) { if (sums(b) > 0) v |= (1L << b); b += 1 }
    v
  }

  def apply(tokens: Column): Column =
    ExpressionUtils.column(Simhash60(ExpressionUtils.expression(tokens)))
}
