package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Int128Sum

/** The 128-bit-accumulator exact sum behind the r14 TPC-H money rollups
  * (Int128Sum.scala): the carry path, merge across partitions, SUM null
  * semantics, and bit-equality of the fixed-point fast path against the
  * decimal formulation it replaces. */
class Int128SumSpec extends SparkTestBase {
  import spark.implicits._

  private def sumOf(xs: Seq[Long], parts: Int, scale: Int): java.math.BigDecimal =
    xs.toDF("x").repartition(parts)
      .agg(Int128Sum.sumLongs(col("x"), scale).as("s"))
      .collect()(0).getDecimal(0)

  test("sums that overflow a signed long are exact (carry into the hi word)") {
    val xs = Seq.fill(5)(Long.MaxValue) ++ Seq(17L, Long.MaxValue - 3L)
    val expect = xs.map(BigInt(_)).sum
    assert(expect > BigInt(Long.MaxValue)) // the plain long sum would wrap
    for (parts <- Seq(1, 3, 4)) {
      val got = sumOf(xs, parts, 0)
      assert(BigInt(got.unscaledValue) == expect && got.scale == 0,
        s"parts=$parts got $got")
    }
  }

  test("negative values and cancellation cross the hi/lo boundary exactly") {
    val xs = Seq(Long.MaxValue, Long.MaxValue, -1L, Long.MinValue,
      -12345L, 7L, Long.MinValue / 2)
    val expect = xs.map(BigInt(_)).sum
    for (parts <- Seq(1, 4)) {
      assert(BigInt(sumOf(xs, parts, 0).unscaledValue) == expect)
    }
  }

  test("SUM null semantics: null iff every input is null; nulls skipped") {
    val df = Seq[(java.lang.Long, String)]((5L, "a"), (null, "a"),
      (null, "b")).toDF("x", "g")
    val got = df.groupBy("g")
      .agg(Int128Sum.sumLongs(col("x"), 4).as("s"))
      .collect().map(r => r.getString(0) -> Option(r.getDecimal(1))).toMap
    assert(got("a").map(_.toPlainString).contains("0.0005"))
    assert(got("b").isEmpty)
    // global aggregation over zero rows is also NULL, like built-in SUM
    val empty = spark.emptyDataset[Long].toDF("x")
      .agg(Int128Sum.sumLongs(col("x"), 0).as("s")).collect()(0)
    assert(empty.isNullAt(0))
  }

  test("fixedPoint equals the decimal-cast formulation on 2-decimal money") {
    val money = Seq(0.01, 123.45, 901.10, 88888.88, 0.07, 54321.99, 1000.00,
      -2.50, -0.03, 949.56, 71234.25)
    val df = money.toDF("m").repartition(3)
    val got = df.agg(
      Int128Sum.fixedPoint(col("m"), 4).cast("decimal(18,4)")
        .cast("double").as("fast"),
      sum(col("m").cast("decimal(18,4)")).cast("decimal(18,4)")
        .cast("double").as("dec")).collect()(0)
    assert(got.getDouble(0) == got.getDouble(1))
    // per-row unscaled longs equal the decimal cast per row too
    val rows = df.select(Int128Sum.unscaled(col("m"), 4).as("u"),
      (col("m").cast("decimal(18,4)") * lit(10000)).cast("long").as("d"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }
}
