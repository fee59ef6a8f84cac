// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k-gram rolling polynomial hashes of a string in ONE pass:
  * h(pos) = fold over the k chars of ((acc * B + codepoint) mod P).
  *
  * Replaces per-position `md5(substr(text,pos,k))` in the MinHash shingle
  * stage — 2.2M md5+hex+conv calls at sf0.1 became one linear scan per
  * document. The DuckDB oracle mirrors the exact fold with
  * `ord(substr(text,pos+j,1))` chains (see Dedup.sqlShingleHash), so hashes
  * are identical across engines. Chars are compared as UTF-16 units here vs
  * code points in DuckDB — identical for BMP text (the corpus is ASCII).
  *
  * Bounds: acc < P ≤ 2^31, B = 131 → acc*B + c < 2^39, no overflow.
  */
case class ShinglePolyHash(child: Expression, k: Int, b: Long, p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_poly_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length - k + 1
    if (n <= 0) new GenericArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](n)
      var pos = 0
      while (pos < n) {
        var acc = 0L
        var j = 0
        while (j < k) {
          acc = (acc * b + s.charAt(pos + j)) % p
          j += 1
        }
        out(pos) = acc
        pos += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val pos = ctx.freshName("pos")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $c.toString();
         |int $n = $s.length() - $k + 1;
         |long[] $out = new long[$n > 0 ? $n : 0];
         |for (int $pos = 0; $pos < $n; $pos++) {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < $k; $j++) {
         |    $acc = ($acc * ${b}L + $s.charAt($pos + $j)) % ${p}L;
         |  }
         |  $out[$pos] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShinglePolyHash {
  def apply(text: Column, k: Int, b: Long, p: Long): Column =
    ExpressionUtils.column(ShinglePolyHash(ExpressionUtils.expression(text), k, b, p))
}
