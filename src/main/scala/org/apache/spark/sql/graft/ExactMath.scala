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

  /** `intDiv` over DECIMAL(38,0) operands, still a LongType result — for
    * ratios whose numerator/denominator PRODUCTS exceed Long range before
    * the division brings the quotient back into range (ADVICE r11: two
    * ~1e10-mass wordpiece symbols overflow the 2^63 `l_count*r_count`
    * product at 100 TB corpus scale; the quotient itself is tiny).
    * Callers pass the factor columns; the products are formed HERE, after
    * the decimal widen, so no Long intermediate ever exists. */
  def intDivWide(numA: Column, numB: Column, denA: Column, denB: Column)
      : Column =
    ExpressionUtils.column(IntegralDivide(
      ExpressionUtils.expression(
        numA.cast("decimal(38,0)") * numB.cast("decimal(19,0)")),
      ExpressionUtils.expression(
        denA.cast("decimal(38,0)") * denB.cast("decimal(19,0)"))))
}
