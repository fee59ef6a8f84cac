package graft

import org.apache.spark.sql.graft.RangeRank
import org.apache.spark.sql.functions.col

/** Unit coverage for the Tungsten prefix-doubling rank pass in isolation —
  * SuffixRepeatsSpec brute-forces it end-to-end, but the O(partitions)
  * driver chaining (rank offsets, boundary-run dup decisions, active-set
  * emission across partition edges) deserves adversarial layouts of its
  * own: hot keys spanning several range partitions, classes whose valid
  * members sit in different partitions, singleton-valid classes that must
  * freeze, and empty inputs. */
class RangeRankSpec extends SparkTestBase {
  import spark.implicits._

  /** Expected active set + ranks from a sequential model: rank = 1-based
    * dense index of the key in sorted order over ALL input rows; emitted =
    * valid rows (pos+block <= doc_len) whose key class has >= 2 valid. */
  private def model(rows: Seq[(Long, Long, Long, Long, Long, Long)],
      block: Long): (Set[(Long, Long, Long, Long, Long)], Boolean) = {
    val keys = rows.map(r => (r._5, r._6)).distinct.sorted
    val rank = keys.zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
    val validCnt = rows.filter(r => r._3 + block <= r._4)
      .groupBy(r => (r._5, r._6)).view.mapValues(_.size.toLong).toMap
    val active = rows
      .filter(r => r._3 + block <= r._4)
      .filter(r => validCnt.getOrElse((r._5, r._6), 0L) >= 2)
      .map(r => (r._1, r._2, r._3, r._4, rank((r._5, r._6))))
      .toSet
    (active, active.nonEmpty)
  }

  private def run(rows: Seq[(Long, Long, Long, Long, Long, Long)],
      block: Long, numKeys: Int = 2): Unit = {
    val df =
      if (numKeys == 2)
        rows.toDF("gpos", "doc_id", "pos", "doc_len", "k1", "k2")
      else rows.map(r => (r._1, r._2, r._3, r._4, r._5))
        .toDF("gpos", "doc_id", "pos", "doc_len", "k1")
    val ranked = RangeRank.rankLevel(df, numKeys, block)
    try {
      val got = ranked.frame.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      val (expected, expDup) =
        if (numKeys == 2) model(rows, block)
        else model(rows.map(r => r.copy(_6 = 0L)), block)
      // rank VALUES are opaque (consumers use equality only) but this
      // implementation promises dense 1-based ranks over all key classes
      // in key order — assert the full contract
      assert(got == expected,
        s"active set\n got: ${got.toSeq.sorted}\n exp: ${expected.toSeq.sorted}")
      assert(ranked.hasValidDup == expDup,
        s"hasValidDup ${ranked.hasValidDup} != $expDup")
    } finally ranked.storage.unpersist(blocking = true)
  }

  test("hot key dominating the distribution stays one class with right rank") {
    // 200 rows of ONE key + singleton keys on each side. Note Spark's
    // RangePartitioner picks strictly-increasing bounds, so an equal-key
    // run is co-located in ONE partition — the driver-side boundary
    // chaining in RangeRank is defensive against a partitioner that ever
    // splits ties, not a path this layout can force. What the layout DOES
    // stress: a partition whose single run is also its first AND last run
    // (the streaming path with firstOk == lastOk), next to tiny partitions.
    val hot = (0 until 200).map(i =>
      (i.toLong, 1L, i.toLong, 300L, 50L, 50L))
    val singles = Seq(
      (900L, 2L, 0L, 300L, 10L, 10L), // below the hot key
      (901L, 2L, 1L, 300L, 99L, 99L)) // above the hot key
    run(scala.util.Random.shuffle(hot ++ singles), block = 4L)
  }

  test("a class of mostly-invalid rows with exactly two valid ones is a dup") {
    // key 50 has two valid rows buried in 100 invalid rows of the same key
    // (pos + block > doc_len): the run's valid COUNT — not its length —
    // must drive both the dup flag and the emission (exactly 2 rows out)
    val invalid = (0 until 100).map(i =>
      (i.toLong, 1L, 290L + i % 8, 290L, 50L, 50L)) // pos+8 > doc_len
    val valid = Seq(
      (500L, 1L, 0L, 290L, 50L, 50L),
      (501L, 2L, 1L, 290L, 50L, 50L))
    run(scala.util.Random.shuffle(invalid ++ valid), block = 8L)
  }

  test("singleton-valid classes freeze; multi-valid classes emit") {
    val rows = Seq(
      (1L, 1L, 0L, 100L, 7L, 7L),   // class A: 2 valid -> emits
      (2L, 1L, 5L, 100L, 7L, 7L),
      (3L, 2L, 0L, 100L, 8L, 8L),   // class B: 1 valid -> frozen
      (4L, 2L, 99L, 100L, 8L, 8L),  // class B invalid member
      (5L, 3L, 0L, 100L, 9L, 9L))   // class C singleton -> frozen
    run(rows, block = 4L)
  }

  test("randomized layouts equal the sequential model (both key arities)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 8) {
      val n = 50 + rnd.nextInt(300)
      val nKeys = 1 + rnd.nextInt(12) // heavy duplication
      val rows = (0 until n).map { i =>
        val dl = 20L + rnd.nextInt(30)
        (i.toLong, (i % 5).toLong, rnd.nextInt(dl.toInt + 4).toLong, dl,
          rnd.nextInt(nKeys).toLong, rnd.nextInt(3).toLong)
      }
      run(rows, block = 1L + rnd.nextInt(16), numKeys = if (trial % 2 == 0) 2 else 1)
    }
  }

  test("empty input: empty frame, no dup") {
    run(Seq.empty, block = 4L)
  }

  test("all-unique keys: nothing emits, no dup") {
    val rows = (0 until 40).map(i =>
      (i.toLong, 1L, i.toLong, 100L, i.toLong, 0L))
    run(rows, block = 4L)
  }
}
