// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** DSIR importance score of a token array in ONE pass, entirely inside the
  * row: Σ over tokens of lrE4[h(token) mod buckets], where h is the shared
  * engine hash (first 60 bits of md5, identical to Simhash60's and the
  * DuckDB oracle's) and lrE4 is the fitted per-bucket log-likelihood-ratio
  * model in exact ×10⁴ integer units. Bucket count = the model array's
  * length, so the expression carries no separate size parameter.
  *
  * The integer-e4 sum is bit-identical to summing the model's exact 4-dp
  * DECIMAL values in any order (they are the same rationals ×10⁴), which is
  * what both the previous higher-order-function formulation and the DuckDB
  * oracle's join+SUM compute — this expression exists because that fold ran
  * interpreted (per-element closure dispatch + Decimal boxing on the hot
  * scoring path) while this is a single codegen'd static call. Scoring at
  * 100 TB is the map-only pass DSIR (Xie et al. 2023) ships to every
  * worker; the model rides along as a ≤buckets-row literal.
  */
case class DsirLlrE4(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dsir_llr_e4"

  override protected def nullSafeEval(toks: Any, lr: Any): Any =
    DsirLlrE4.compute(toks.asInstanceOf[ArrayData], lr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, l) =>
      s"${ev.value} = org.apache.spark.sql.graft.DsirLlrE4.compute($t, $l);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DsirLlrE4 {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One linear pass: 60-bit md5 per token, bucket lookup, long sum. */
  def compute(arr: ArrayData, lr: ArrayData): Long = {
    val buckets = lr.numElements()
    // registered as a user-callable SQL function: an empty model array must
    // yield a clean 0 score, not an ArithmeticException in `h % buckets`
    // crashing the task (ADVICE r9)
    if (buckets == 0) return 0L
    var sum = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val md = mdLocal.get()
        md.reset()
        val dig = md.digest(arr.getUTF8String(i).getBytes)
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (dig(j) & 0xffL); j += 1 }
        h = h >>> 4 // top 60 bits: non-negative, % is a true modulus
        sum += lr.getLong((h % buckets).toInt)
      }
      i += 1
    }
    sum
  }

  def apply(tokens: Column, lrE4: Column): Column =
    ExpressionUtils.column(DsirLlrE4(
      ExpressionUtils.expression(tokens), ExpressionUtils.expression(lrE4)))
}
