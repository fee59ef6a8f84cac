// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits/char) of a string's character distribution in one
  * pass inside the row: H = (n·log2(n) − Σ c·log2(c)) / n over per-char
  * counts c. A standard corpus-quality signal (low-entropy docs are
  * repetitive boilerplate / padding; see Gopher-style quality filtering).
  *
  * Computing this relationally needs a per-(doc, char) count — a
  * corpus-of-characters explode through two exchanges. Per-doc entropy
  * never needs to leave its row, so this is a map-only projection at any
  * scale. The DuckDB oracle computes the identical formula from an
  * unnest+GROUP BY; both engines round to 4 decimals, absorbing
  * last-ulp log/summation-order differences.
  *
  * Chars are UTF-16 units (identical to code points for the BMP text the
  * corpus contains; surrogate pairs would count as two units).
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.CharEntropy.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {
  private val Ln2 = math.log(2.0)

  /** Sort a copy, run-length the equal runs: counts in deterministic
    * (sorted-char) order, O(n log n), no per-char hash map. */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0.0
    val arr = str.toCharArray
    java.util.Arrays.sort(arr)
    var acc = 0.0
    var i = 0
    while (i < n) {
      var j = i
      val ch = arr(i)
      while (j < n && arr(j) == ch) j += 1
      val c = (j - i).toDouble
      acc += c * (math.log(c) / Ln2)
      i = j
    }
    (n * (math.log(n.toDouble) / Ln2) - acc) / n
  }

  def apply(text: Column): Column =
    ExpressionUtils.column(CharEntropy(ExpressionUtils.expression(text)))
}
