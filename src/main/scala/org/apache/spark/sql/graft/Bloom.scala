// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column plumbing for Spark's built-in Bloom-filter expressions — the same
  * `BloomFilterAggregate` / `BloomFilterMightContain` pair Catalyst injects
  * as runtime join filters, exposed so an operator can build the filter
  * over one frame and probe it from another (incremental-dedup membership,
  * where the injected-filter machinery doesn't reach because the two scans
  * live in different queries at production scale).
  *
  * Both expressions work on xxhash64-hashed longs, matching the planner's
  * own usage; `bloomAgg` over an empty frame yields NULL and
  * `mightContain(NULL, x)` is NULL, so empty-corpus probes drop every row
  * instead of erroring.
  */
object Bloom {
  /** Aggregate a column of xxhash64 longs into a Bloom filter (binary). */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(hashed),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe: true iff `hashed` may be in the filter (no false negatives).
    * `might_contain` requires its filter side to be a constant or scalar
    * subquery (the planner must be able to evaluate it once per query, not
    * per row), so the one-row aggregate frame is wrapped as a
    * ScalarSubquery — the same shape InjectRuntimeFilter builds. */
  def mightContain(bloomDf: DataFrame, hashed: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      ExpressionUtils.expression(hashed)))

  /** Probe against a pre-trained filter blob shipped as a constant — the
    * streaming-gate shape, where the filter is a bounded trained artifact
    * like a vocabulary list (a literal satisfies might_contain's
    * constant-filter-side requirement). */
  def mightContain(bloomBlob: Column, hashed: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloomBlob),
      ExpressionUtils.expression(hashed)))
}
