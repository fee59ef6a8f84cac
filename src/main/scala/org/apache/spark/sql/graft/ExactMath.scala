// Lives under org.apache.spark.sql because ExpressionUtils is private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.classic.ExpressionUtils

/** Exact integer arithmetic helpers for the §6 float policy: output columns
  * the oracle hash-compares must never be produced by `round(DOUBLE)` — two
  * engines' round() can break a representability boundary differently. Ratios
  * of integers are instead emitted as fixed-point BIGINT via integral
  * division, which is bit-identical in every engine.
  */
object ExactMath {

  /** `num div den` (SQL `div` semantics, LongType result). Truncates toward
    * zero; DuckDB's `//` floors — identical for non-negative operands, which
    * is the only way the callers use it. */
  def intDiv(num: Column, den: Column): Column =
    ExpressionUtils.column(IntegralDivide(
      ExpressionUtils.expression(num.cast("long")),
      ExpressionUtils.expression(den.cast("long"))))
}
