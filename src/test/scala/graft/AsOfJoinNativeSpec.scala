package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfJoinNative

/** The native as-of join operator (logical node + strategy + physical plan,
  * SURVEY.md §2 #32): semantics pinned against a brute-force model and the
  * union+window composition; plan shape pinned to the custom operator. */
class AsOfJoinNativeSpec extends SparkTestBase {

  import spark.implicits._

  // (key, ts, id) fixtures exercising: latest-prior pick, exact-ts tie
  // (inclusive), left row before any right row, key absent on the right
  private lazy val lefts = Seq(
    (1L, 10L, 100L), // matches right ts 7 (latest of 3,7)
    (1L, 3L, 101L),  // matches right ts 3 exactly (inclusive bound)
    (1L, 2L, 102L),  // before every right row -> null
    (2L, 50L, 103L), // key 2 matches its only row
    (3L, 9L, 104L))  // key 3 has no right rows -> null
    .toDF("k", "ts", "lid")
  private lazy val rights = Seq(
    (1L, 3L, 200L), (1L, 7L, 201L), (1L, 12L, 202L),
    (2L, 49L, 203L), (4L, 1L, 204L))
    .toDF("k", "ts", "rid")
    .select(col("k").as("rk"), col("ts").as("rts"), col("rid"))

  private lazy val joined = AsOfJoinNative.join(
    lefts, rights, Seq(lefts("k")), Seq(rights("rk")),
    lefts("ts"), rights("rts"))

  test("native as-of join picks the latest right row at or before each left ts") {
    val got = joined.collect()
      .map(r => r.getLong(2) -> (if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toMap
    assert(got == Map(
      100L -> Some(201L), 101L -> Some(200L), 102L -> None,
      103L -> Some(203L), 104L -> None))
  }

  test("physical plan is the custom operator with co-partitioned exchanges") {
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    // both sides cluster on their keys; no sort, no window, no cartesian
    assert(!plan.contains("WindowExec") && !plan.contains("Cartesian"))
  }

  test("native and composed as-of joins agree on the events table") {
    val dir = "/root/testdata/sf0.001"
    val composed = graft.operators.Relational.asofJoin(spark, dir)
    val native = graft.operators.Relational.asofJoinNative(spark, dir)
    assert(native.count() > 0)
    assert(composed.exceptAll(native).isEmpty && native.exceptAll(composed).isEmpty)
  }

  test("probe-side predicates push through the custom node to the scan") {
    val dir = "/root/testdata/sf0.001"
    val filtered = graft.operators.Relational.asofJoinNative(spark, dir)
      .where(col("user_id") < 100L)
    // the optimizer rule moves the probe filter below AsOfJoin, and the
    // datasource strategy carries it into the purchases parquet scan
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(user_id,100)"),
      s"probe predicate did not reach the scan:\n$plan")
    // semantics unchanged: filter-after equals filter-before
    val expect = graft.operators.Relational.asofJoin(spark, dir)
      .where(col("user_id") < 100L)
    assert(filtered.exceptAll(expect).isEmpty && expect.exceptAll(filtered).isEmpty)
    // right-side-referencing predicates must not be pushed (pre-join
    // filtering would change which "latest prior" row wins) — semantics
    // pinned against the composed implementation
    val keep = graft.operators.Relational.asofJoinNative(spark, dir)
      .where(col("matched_view_id").isNotNull)
    val keepExpect = graft.operators.Relational.asofJoin(spark, dir)
      .where(col("matched_view_id").isNotNull)
    assert(keep.exceptAll(keepExpect).isEmpty && keepExpect.exceptAll(keep).isEmpty)
  }

  test("agrees with a brute-force model on random data") {
    val rnd = new scala.util.Random(7)
    val ls = Seq.fill(300)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
    val rs = Seq.fill(300)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, ts), i) => (k, ts, (1000 + i).toLong) }
    // model: per left row, the max-ts right row at or before it (ties on ts
    // broken by max id, mirroring the dedup the production query does)
    val byKey = rs.groupBy(_._1)
    val expect = ls.map { case (k, ts, lid) =>
      val c = byKey.getOrElse(k, Nil).filter(_._2 <= ts)
      lid -> (if (c.isEmpty) None
              else Some(c.maxBy(r => (r._2, r._3))._3))
    }.toMap
    val rDeduped = rs.toDF("k", "ts", "rid")
      .groupBy("k", "ts").agg(max("rid").as("rid"))
      .select(col("k").as("rk"), col("ts").as("rts"), col("rid"))
    val lDf = ls.toDF("k", "ts", "lid")
    val got = AsOfJoinNative.join(lDf, rDeduped,
        Seq(lDf("k")), Seq(rDeduped("rk")), lDf("ts"), rDeduped("rts"))
      .collect()
      .map(r => r.getLong(2) -> (if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toMap
    assert(got == expect)
  }
}
