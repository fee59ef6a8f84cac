// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}

/** The Gopher A1 per-grain repetition fold as ONE primitive pass — for
  * each grain n (the doc long enough), the per-doc n-gram run-length
  * aggregation: n_grams, the top gram family's character mass, and the
  * duplicated-gram character mass.
  *
  * Semantics are pinned to the previous SQL higher-order-function fold
  * (Curation.gopherFoldExprSql) position for position: the gram key is
  * the repo-wide 60-bit md5 (`conv(substring(md5(concat_ws(' ', gram)),
  * 1, 15), 16, 10)` — here the first 60 bits of the binary digest), the
  * (gh, glen) pairs are sorted lexicographically exactly like
  * `array_sort` over `struct(gh, glen)`, and the run fold keeps the run
  * HEAD's glen — so outputs are identical, collisions and all, and the
  * DuckDB oracle is untouched.
  *
  * Why a custom Catalyst expression: higher-order functions
  * (transform/aggregate/array_sort over lambda functions) are always
  * interpreted — per gram the old fold paid an interpreted md5-hex →
  * conv(16,10) chain, TWO O(n) `slice` copies and a struct allocation,
  * which put a single 6-grain pass over a modest corpus at ~7 s of one
  * task's CPU (the scan is map-only by design, so nothing parallelizes
  * it away). This pass hashes token bytes directly (no gram string is
  * materialized), takes window character masses from one prefix-sum
  * array, and sorts primitive pairs.
  */
case class GopherRepStats(child: Expression, ns: Seq[Int])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("agg", StructType(Seq(
      StructField("top", LongType, nullable = false),
      StructField("dup", LongType, nullable = false))), nullable = false))),
    containsNull = false)
  override def prettyName: String = "gopher_rep_stats"

  override protected def nullSafeEval(input: Any): Any =
    GopherRepStats.compute(input.asInstanceOf[ArrayData], ns.toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("ns", ns.toArray, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.GopherRepStats.compute($c, $nsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherRepStats {
  private val SP = ' '.toByte

  def compute(arr: ArrayData, ns: Array[Int]): ArrayData = {
    val m0 = arr.numElements()
    val tokBytes = new Array[Array[Byte]](m0)
    val charPfx = new Array[Long](m0 + 1)
    var i = 0
    while (i < m0) {
      val t = arr.getUTF8String(i)
      tokBytes(i) = t.getBytes
      charPfx(i + 1) = charPfx(i) + t.numChars()
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new java.util.ArrayList[InternalRow](ns.length)
    var k = 0
    while (k < ns.length) {
      val n = ns(k)
      if (m0 >= n) {
        val m = m0 - n + 1
        val gh = new Array[Long](m)
        val glen = new Array[Long](m)
        var p = 0
        while (p < m) {
          md.reset()
          var j = p
          while (j < p + n) {
            if (j > p) md.update(SP)
            md.update(tokBytes(j))
            j += 1
          }
          val d = md.digest()
          // first 15 hex digits of the md5 == the top 60 bits of the
          // big-endian digest — the repo-wide 60-bit key
          gh(p) = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
            ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
            ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
          glen(p) = charPfx(p + n) - charPfx(p)
          p += 1
        }
        // sort (gh, glen) lexicographically — identical order to
        // array_sort over struct(gh, glen)
        val idx = new Array[Integer](m)
        var q = 0
        while (q < m) { idx(q) = q; q += 1 }
        java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
          override def compare(a: Integer, b: Integer): Int = {
            val c1 = java.lang.Long.compare(gh(a), gh(b))
            if (c1 != 0) c1 else java.lang.Long.compare(glen(a), glen(b))
          }
        })
        // run-length fold: run head's glen is the family mass unit
        var prev = -1L
        var run = 0L
        var rglen = 0L
        var top = 0L
        var dup = 0L
        var r = 0
        while (r < m) {
          val x = idx(r).intValue()
          if (gh(x) == prev) run += 1L
          else {
            if (run * rglen > top) top = run * rglen
            if (run >= 2L) dup += run * rglen
            prev = gh(x); run = 1L; rglen = glen(x)
          }
          r += 1
        }
        if (run * rglen > top) top = run * rglen
        if (run >= 2L) dup += run * rglen
        out.add(new GenericInternalRow(Array[Any](n.toLong, m.toLong,
          new GenericInternalRow(Array[Any](top, dup)))))
      }
      k += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(tokens: Column, ns: Seq[Int]): Column =
    ExpressionUtils.column(GopherRepStats(
      ExpressionUtils.expression(tokens), ns))
}
