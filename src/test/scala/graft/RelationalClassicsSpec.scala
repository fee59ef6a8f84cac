package graft

import graft.operators.Relational

/** Hand-computed oracles for the TPC-H classic shapes added in round 13
  * (§2 #34z family): Q5 cycle, Q7 trade matrix, Q10 returned top-N, Q15
  * scalar-max, Q17 correlated average, Q18 HAVING-semi, Q22 anti-join.
  * One shared star fixture, every expectation derived on paper in the
  * comments below. */
class RelationalClassicsSpec extends SparkTestBase {
  import spark.implicits._

  /** Tiny star:
    *  - regions: ASIA(0), EUROPE(1); nations N0,N1→ASIA, N2→EUROPE
    *  - suppliers: S1→N0, S2→N2
    *  - customers: C1→N0 bal 100 (active), C2→N2 bal 9000 (old orders only),
    *    C3→N0 bal 8000 (no orders); Σbal=17100, n=3, avg=5700
    *  - orders: 10(C1,1996-02-01), 11(C2,1996-02-10), 12(C1,2001-01-01),
    *    13(C2,1999-05-01, totalprice 400)
    *  - lineitems (orderkey, partkey, suppkey, qty, price, disc, flag, ship):
    *    a (10,1,1,  1,100,0.1,R,1996-03-01)  rev 90
    *    b (10,1,2, 10,200,0.0,N,1996-03-05)
    *    c (11,1,2, 10,400,0.0,R,1996-06-01)
    *    d (12,1,1, 10,500,0.0,N,2001-02-01)
    *    e (12,2,2, 10,600,0.0,N,2001-02-01)
    *    f (13,1,1,301,700,0.0,N,1999-06-01)
    */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-tpch").toString
    Seq((0, "ASIA"), (1, "EUROPE"))
      .toDF("r_regionkey", "r_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/region.parquet")
    Seq((0, "N0", 0), (1, "N1", 0), (2, "N2", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/nation.parquet")
    Seq((1L, "S1", 0, 100.0), (2L, "S2", 2, 200.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/supplier.parquet")
    Seq(
      (1L, "C1", 0, 100.0, "BUILDING"),
      (2L, "C2", 2, 9000.0, "AUTO"),
      (3L, "C3", 0, 8000.0, "AUTO"),
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/customer.parquet")
    Seq(
      (10L, 1L, "O", 100.0, "1996-02-01", "P"),
      (11L, 2L, "O", 200.0, "1996-02-10", "P"),
      (12L, 1L, "O", 300.0, "2001-01-01", "P"),
      (13L, 2L, "O", 400.0, "1999-05-01", "P"),
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq(
      (1L, "P1", "Brand#1", "T", 1, 10.0),
      (2L, "P2", "Brand#2", "T", 1, 20.0),
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/part.parquet")
    Seq(
      (10L, 1L, 1L, 1, 1.0, 100.0, 0.1, 0.0, "R", "O", "1996-03-01"),
      (10L, 1L, 2L, 2, 10.0, 200.0, 0.0, 0.0, "N", "O", "1996-03-05"),
      (11L, 1L, 2L, 1, 10.0, 400.0, 0.0, 0.0, "R", "O", "1996-06-01"),
      (12L, 1L, 1L, 1, 10.0, 500.0, 0.0, 0.0, "N", "O", "2001-02-01"),
      (12L, 2L, 2L, 2, 10.0, 600.0, 0.0, 0.0, "N", "O", "2001-02-01"),
      (13L, 1L, 1L, 1, 301.0, 700.0, 0.0, 0.0, "N", "O", "1999-06-01"),
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("local_supplier_volume keeps only the nation-cycle lines in-region") {
    // Only line a closes the cycle inside ASIA within the 1996 order window:
    // order 10 (C1→N0) × supp S1→N0; b fails c_nation=s_nation (N0 vs N2);
    // c's shared nation N2 sits in EUROPE; d/f fall outside the window.
    val got = Relational.localSupplierVolume(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq(("N0", 90.0, 1L)))
  }

  test("nation_trade_flows crosses nations both directions, same-nation dropped") {
    val got = Relational.nationTradeFlows(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    // b: S2(N2)→C1(N0) 1996 rev 200; e: same pair 2001 rev 600;
    // f: S1(N0)→C2(N2) 1999 rev 700; a/d (N0→N0) and c (N2→N2) excluded.
    assert(got == Set(
      ("N2", "N0", 1996L, 200.0, 1L),
      ("N2", "N0", 2001L, 600.0, 1L),
      ("N0", "N2", 1999L, 700.0, 1L)))
  }

  test("returned_item_ranking ranks quarter returns by exact revenue") {
    // R-flag lines on quarter orders: c (order 11→C2) rev 400,
    // a (order 10→C1) rev 100×0.9=90. f is N-flag, d/e out of quarter.
    val got = Relational.returnedItemRanking(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(got == Set(
      (2L, "C2", "N2", 400.0, 1L),
      (1L, "C1", "N0", 90.0, 2L)))
  }

  test("top_supplier surfaces the scalar-max quarter supplier") {
    // Quarter ships: a (S1, 90), b (S2, 200) → max 200 → S2 alone.
    val got = Relational.topSupplier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((2L, "S2", 200.0)))
  }

  test("top_supplier surfaces ALL suppliers on a revenue tie") {
    val d2 = java.nio.file.Files.createTempDirectory("graft-q15t").toString
    Seq((1L, "S1", 0, 0.0), (2L, "S2", 0, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/supplier.parquet")
    Seq(
      (1L, 1L, 1L, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", "1996-02-01"),
      (2L, 1L, 2L, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", "1996-02-02"),
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/lineitem.parquet")
    val got = Relational.topSupplier(spark, d2).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(got == Set((1L, 100.0), (2L, 100.0)))
  }

  test("small_qty_parts applies the exact 20%-of-average cross-multiplication") {
    // Part 1 quantities: 1,10,10,10,301 → Σ=332, n=5; qty×25 < 332 ⇔
    // qty < 13.28 → lines a,b,c,d survive (rev 100+200+400+500); part 2's
    // single line fails (10×5 ≥ 10). Brand#2 therefore absent.
    val got = Relational.smallQtyParts(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq(("Brand#1", 1200.0, 4L)))
  }

  test("large_volume_customers keeps only orders past the quantity threshold") {
    // Per-order Σqty: 10→11, 11→10, 12→20, 13→301 → only order 13 (>300).
    val got = Relational.largeVolumeCustomers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq((2L, "C2", 13L, "1999-05-01", 400.0, 301.0)))
  }

  test("skew_report: exact skew math and the salt recommendation") {
    val d = java.nio.file.Files.createTempDirectory("graft-skew").toString
    // user 1: 30 events (hot); users 2..11: 1 each → n=40, k=11, max=30
    val rows = (1 to 30).map(i => (i.toLong, i.toLong, 1L, "a", 1.0, "{}")) ++
      (2 to 11).map(u => (100L + u, 200L + u, u.toLong, "b", 1.0, "{}"))
    rows.toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.col("sec")
        .cast("timestamp")).drop("sec")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Relational.skewReport(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // user_id: mean_x_bp = 40·10⁴/11 = 36363; skew = 30·11·10⁴/40 = 82500;
    // hot keys: 30·11 > 2·40 only for user 1; salt = ⌈82500/10⁴⌉ = 9
    assert(got("user_id") == ((40L, 11L, 30L, 36363L, 82500L, 1L, 9L)))
    // event_type: a=30, b=10 → mean 20 → skew 30·2·10⁴/40 = 15000 ≤ alert
    // threshold → salt 1; no key above 2× mean
    assert(got("event_type") == ((40L, 2L, 30L, 200000L, 15000L, 0L, 1L)))
  }

  test("hot_keys ranks the heavy keys with exact shares") {
    val d = java.nio.file.Files.createTempDirectory("graft-hotk").toString
    val rows = (1 to 6).map(i => (i.toLong, i.toLong, 7L, "x", 1.0, "{}")) ++
      (1 to 3).map(i => (10L + i, 20L + i, 8L, "y", 1.0, "{}")) :+
      (20L, 30L, 9L, "y", 1.0, "{}")
    rows.toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.col("sec")
        .cast("timestamp")).drop("sec")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Relational.hotKeys(spark, d)
      .where($"key_col" === "user_id").orderBy($"rk").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // 10 events total: user 7 ×6 (6000 bp), user 8 ×3 (3000), user 9 ×1
    assert(got.toSeq == Seq(("7", 6L, 6000L, 1L), ("8", 3L, 3000L, 2L),
      ("9", 1L, 1000L, 3L)))
  }

  test("state_intervals collapses consecutive equal states per user") {
    val d = java.nio.file.Files.createTempDirectory("graft-scd").toString
    // user 1: view,view,buy,view → 3 runs; user 2: buy → 1 run
    val rows = Seq(
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "view"), (3L, 30L, 1L, "buy"),
      (4L, 40L, 1L, "view"), (5L, 15L, 2L, "buy"))
      .map { case (e, s, u, t) => (e, s, u, t, 1.0, "{}") }
    rows.toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.col("sec")
        .cast("timestamp")).drop("sec")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Relational.stateIntervals(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      (1L, 1L, "view", 10L, 20L, 2L),
      (1L, 2L, "buy", 30L, 30L, 1L),
      (1L, 3L, "view", 40L, 40L, 1L),
      (2L, 1L, "buy", 15L, 15L, 1L)))
  }

  test("disjunctive_revenue evaluates the OR arms post-join, per brand") {
    // Brand#1 band is qty 1..11: line a (qty 1, rev 90) and b/c/d (qty 10,
    // rev 200+400+500) qualify; f (qty 301) falls outside every band;
    // e is Brand#2 at qty 10 → inside Brand#2's 10..20 band (rev 600).
    val got = Relational.disjunctiveRevenue(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == Set(("Brand#1", 1190.0, 4L), ("Brand#2", 600.0, 1L)))
  }

  test("part_supplier_diversity excludes denylisted suppliers") {
    // No fixture supplier matches '%7%', so nothing is excluded: type T
    // sees suppliers {1,2} over parts {1,2} and all 6 lines.
    val got = Relational.partSupplierDiversity(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("T", 2L, 2L, 6L)))
    // and WITH a matching denylist: a supplier named like '%7%'
    val d2 = java.nio.file.Files.createTempDirectory("graft-q16").toString
    Seq((1L, "S7", 0, 0.0), (2L, "S2", 0, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/supplier.parquet")
    Seq((1L, "P1", "B", "T1", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/part.parquet")
    Seq(
      (1L, 1L, 1L, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", "1996-01-01"),
      (2L, 1L, 2L, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", "1996-01-02"),
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/lineitem.parquet")
    val got2 = Relational.partSupplierDiversity(spark, d2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got2.toSeq == Seq(("T1", 1L, 1L))) // S7's line excluded
  }

  test("dormant_customers anti-joins recent activity under the global mean") {
    // avg bal 5700: C2 (9000, last order 1999) and C3 (8000, never ordered)
    // qualify; C1 is both below average and active in 2001.
    val got = Relational.dormantCustomers(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("N2", 1L, 9000.0), ("N0", 1L, 8000.0)))
  }
}
