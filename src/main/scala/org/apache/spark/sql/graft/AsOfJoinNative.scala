// Lives under org.apache.spark.sql because Dataset.ofRows / ExpressionUtils /
// SparkStrategy are private[sql] — the standard packaging for third-party
// Catalyst operators.
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeRowJoiner
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils, SparkSession}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — tier (c) of the custom-operator ladder (SURVEY.md §2):
  * a whole-operator semantic Spark's built-ins only express by composition
  * (the union+window pattern in `Relational.asofJoin`, or DuckDB's ASOF
  * JOIN), implemented as a first-class logical node + planner strategy +
  * physical operator and registered via `SparkSessionExtensions`
  * (`graft.GraftExtensions`).
  *
  * Semantics (left as-of join): each left row is joined to the right row
  * with the GREATEST `rightTs <= leftTs` among rows sharing its key;
  * unmatched left rows keep nulls on the right (reference behavior of the
  * composed form, and of `ASOF LEFT JOIN`). Ties on (key, ts) pick an
  * unspecified row — callers wanting determinism pre-aggregate the right
  * side to one row per (key, ts), as `Relational.asofJoinNative` does.
  *
  * Scale shape: both children hash-cluster on their keys
  * (`requiredChildDistribution` → one shuffle each, co-partitioned by
  * `EnsureRequirements` exactly as for a shuffled join), then each
  * partition builds a hash map keyed by join key whose values are
  * ts-sorted arrays and binary-searches one probe per left row —
  * O(|R_p| log |R_p| + |L_p| log k). The build side is the per-partition
  * right side, the same memory contract as a shuffled-hash-join build; at
  * 100 TB the shuffle-partition count is sized so each build fits, and
  * AQE's skew split handles hot keys. No sort of the left side, no
  * window, no row replication.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Predicate pushdown through the custom node: Catalyst's own
  * PushDownPredicates cannot see through an unknown logical operator, so a
  * `WHERE` above an as-of join would otherwise stall there instead of
  * reaching the probe-side scan. Probe-side(left) predicates are
  * semantics-preserving to push — each left row's match depends only on
  * the right side — and then the datasource strategy carries them into the
  * parquet scan's PushedFilters. Right-side predicates must NOT move:
  * filtering the right side pre-join changes which "latest prior" row
  * wins. Injected via `SparkSessionExtensions.injectOptimizerRule`. */
object AsOfJoinPushDown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans the logical `AsOfJoin` into `AsOfJoinExec` (injected via
  * `SparkSessionExtensions.injectPlannerStrategy`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(lk, rk, lts, rts, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  require(leftTs.dataType == org.apache.spark.sql.types.LongType &&
    rightTs.dataType == org.apache.spark.sql.types.LongType,
    "as-of ordering columns must be LONG (cast timestamps to epoch units)")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Same contract as a shuffled equi-join: cluster both children on their
    * keys; EnsureRequirements inserts compatible co-partitioned exchanges. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Probe-side rows pass through unmoved, so the left child's partitioning
    * survives — downstream per-key operators reuse the exchange. */
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lSchema = DataTypeUtils.fromAttributes(lOut)
    val rSchema = DataTypeUtils.fromAttributes(rOut)
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTs = leftTs
    val rTs = rightTs

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTs), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rOut)
      val toUnsafeL = UnsafeProjection.create(lOut, lOut)
      val toUnsafeR = UnsafeProjection.create(rOut, rOut)
      val joiner = GenerateUnsafeRowJoiner.create(lSchema, rSchema)
      val nullRight = UnsafeProjection.create(
        rOut.map(a => Literal.create(null, a.dataType)))(InternalRow.empty).copy()

      // Build: key -> rows with ts, then sort each bucket by ts once.
      val built = new java.util.HashMap[UnsafeRow, Array[(Long, UnsafeRow)]]()
      val buf = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.ArrayBuffer[(Long, UnsafeRow)]]()
      rIter.foreach { row =>
        val tsRow = rTsProj(row)
        if (!tsRow.isNullAt(0)) {
          val ts = tsRow.getLong(0)
          val u = toUnsafeR(row).copy()
          val k = rKeyProj(u).copy()
          var b = buf.get(k)
          if (b == null) {
            b = scala.collection.mutable.ArrayBuffer.empty[(Long, UnsafeRow)]
            buf.put(k, b)
          }
          b += ((ts, u))
        }
      }
      buf.forEach { (k, b) => built.put(k, b.sortBy(_._1).toArray) }
      buf.clear()

      lIter.map { row =>
        val u = toUnsafeL(row)
        val tsRow = lTsProj(u)
        var matched: UnsafeRow = null
        if (!tsRow.isNullAt(0)) {
          val t = tsRow.getLong(0)
          val arr = built.get(lKeyProj(u))
          if (arr != null && arr(0)._1 <= t) {
            // greatest index with arr(i).ts <= t
            var lo = 0
            var hi = arr.length - 1
            while (lo < hi) {
              val mid = (lo + hi + 1) >>> 1
              if (arr(mid)._1 <= t) lo = mid else hi = mid - 1
            }
            matched = arr(lo)._2
          }
        }
        joiner.join(u, if (matched == null) nullRight else matched)
          .asInstanceOf[InternalRow]
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public entry: build the logical node from DataFrames and resolved
  * columns. Key/ts columns must come from the respective frames (rename
  * right-side columns first if the two sides share a lineage, as a
  * self-joined table does — duplicate attribute ids across sides are
  * rejected by the analyzer). */
object AsOfJoinNative {
  def join(left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTs: Column, rightTs: Column): DataFrame =
    Dataset.ofRows(
      left.sparkSession.asInstanceOf[SparkSession],
      AsOfJoin(
        left.queryExecution.analyzed,
        right.queryExecution.analyzed,
        leftKeys.map(ExpressionUtils.expression),
        rightKeys.map(ExpressionUtils.expression),
        ExpressionUtils.expression(leftTs),
        ExpressionUtils.expression(rightTs)))
}
