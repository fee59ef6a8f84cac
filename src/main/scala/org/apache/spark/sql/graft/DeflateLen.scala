// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact zlib deflate length of a string's UTF-8 bytes at a pinned level —
  * the compression-ratio repetition signal ([[graft.operators.Curation]]
  * `compression_*` family) as a native codegen'd expression, so it
  * composes into ANY projection or filter (including the stateless
  * streaming gates) instead of forcing a typed mapPartitions detour.
  *
  * The level is part of the expression (a different level is a different
  * signal); java.util.zip wraps canonical zlib, and CurationSpec pins the
  * output lengths against CPython-zlib-derived literals. The Deflater
  * (native zlib workspace, ~270 KB) and the scratch buffer are
  * THREAD-LOCAL and reset() between rows — a per-row allocate/free would
  * dominate the short-doc hot path this signal exists for. Deflate at
  * level 6 runs ~100 MB/s/core, far above the regex gates on the same
  * scan, so this stays a map-only projection at 100 TB.
  */
case class DeflateLen(child: Expression, level: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.compute(input.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.DeflateLen.compute($c, $level);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {
  // one Deflater per (executor thread, level) plus one scratch buffer per
  // thread, reset() between rows; lives as long as the task thread (a few
  // per core — bounded), never per row
  private val deflaters =
    new ThreadLocal[java.util.HashMap[Int, java.util.zip.Deflater]] {
      override def initialValue() =
        new java.util.HashMap[Int, java.util.zip.Deflater]()
    }
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue() = new Array[Byte](8192)
  }

  def compute(s: UTF8String, level: Int): Long = {
    val d = deflaters.get.computeIfAbsent(level,
      l => new java.util.zip.Deflater(l))
    d.reset()
    d.setInput(s.getBytes) // UTF8String stores UTF-8 bytes directly
    d.finish()
    val buf = scratch.get
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    n
  }

  def apply(text: Column, level: Int): Column =
    ExpressionUtils.column(DeflateLen(ExpressionUtils.expression(text), level))
}
