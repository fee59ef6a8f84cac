// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** All K MinHash components of a shingle-hash set in ONE pass:
  * s_i = min over shingle hashes h of ((h·a_i + b_i) mod p).
  *
  * Fuses the K=32 per-row minimizations that the aggregation formulation
  * (`groupBy(doc_id).agg(min((h*a_i+b_i)%p)...)`) computed by first
  * EXPLODING the corpus into its shingles and shuffling them — per-doc
  * minhashes are row-local, so with this expression the whole signature
  * table is a map-only projection: at 100 TB the only shuffle left in the
  * LSH family is the band-bucket join itself. The DuckDB oracle keeps the
  * unnest+GROUP BY formulation — min is order-insensitive, so the values
  * are identical.
  *
  * Bounds: h < p ≤ 2^31, a_i < p → h·a_i < 2^62, no overflow (the same
  * argument as the SQL mirror in Dedup.signaturesCte).
  */
case class MinhashSig(child: Expression, coefA: Seq[Long], coefB: Seq[Long], p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(coefA.length == coefB.length)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private lazy val aArr = coefA.toArray
  private lazy val bArr = coefB.toArray

  override protected def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashCoefA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashCoefB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.MinhashSig.compute($c, $aRef, $bRef, ${p}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig {
  /** One linear pass: K running minima over the hash array. Empty input
    * (doc shorter than a shingle) yields an empty signature — the caller
    * filters those docs, mirroring the oracle's `length >= k` guard. */
  def compute(arr: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val k = a.length
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        val v = (h * a(i) + b(i)) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  def apply(hashes: Column, coefA: Seq[Long], coefB: Seq[Long], p: Long): Column =
    ExpressionUtils.column(MinhashSig(ExpressionUtils.expression(hashes), coefA, coefB, p))
}
