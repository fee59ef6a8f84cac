package graft

import graft.operators.Relational

/** Hand-computed oracles for the second TPC-H classics batch (§2 #34z-j..p,
  * #34x-a): Q6 filtered sum, Q2 correlated min-cost supplier, Q8 market
  * share, Q9 profit, Q11 global-scalar HAVING, Q20 correlated-threshold
  * domination, Q21 dual-correlation sole blame, and the co-purchase
  * triangle census. One shared star fixture; every expectation derived on
  * paper in the comments. */
class RelationalClassics2Spec extends SparkTestBase {
  import spark.implicits._

  /** Tiny star tuned so every pinned constant fires:
    *  - regions ASIA(0), EUROPE(1); nations NATION_7(7→ASIA), N8(8→ASIA),
    *    N9(9→EUROPE)
    *  - suppliers S1→7, S2→9, S3→8, S4→8
    *  - customers C1→7 (ASIA), C2→9
    *  - parts P1 "red bolt" STANDARD size 5 retail 10, P2 "blue gear"
    *    PROMO size 20 retail 20, P3 "red gizmo" STANDARD size 15 retail 30
    *  - orders O10(C1,F,1996-02-01), O11(C2,O,1996-06-01),
    *    O12(C1,F,1997-03-01)
    *  - lines (order,part,supp,qty,price,disc,flag,ship):
    *    a(10,1,1,10,100,.05,R,1996-03-01) b(10,2,1,20,400,0,N,1996-03-05)
    *    c(10,3,3, 5,250,0,  N,1996-03-07) d(11,1,2,20,150,.06,N,1996-07-01)
    *    g(11,3,1, 1, 10,0,  N,1996-07-02) h(11,3,2, 1, 20,0,N,1996-07-03)
    *    e(12,1,1,30,330,.10,R,1997-04-01) f(12,2,3,10,2000,0,R,1997-04-02)
    *    i(12,3,4,25, 40,0,  N,1997-04-03)
    */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-tpch3").toString
    Seq((0, "ASIA"), (1, "EUROPE"))
      .toDF("r_regionkey", "r_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/region.parquet")
    Seq((7, "NATION_7", 0), (8, "N8", 0), (9, "N9", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/nation.parquet")
    Seq((1L, "S1", 7, 100.0), (2L, "S2", 9, 200.0), (3L, "S3", 8, 300.0),
      (4L, "S4", 8, 400.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/supplier.parquet")
    Seq((1L, "C1", 7, 100.0, "AUTO"), (2L, "C2", 9, 200.0, "AUTO"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/customer.parquet")
    Seq(
      (10L, 1L, "F", 100.0, "1996-02-01", "P"),
      (11L, 2L, "O", 200.0, "1996-06-01", "P"),
      (12L, 1L, "F", 300.0, "1997-03-01", "P"),
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq(
      (1L, "red bolt", "Brand#1", "STANDARD", 5, 10.0),
      (2L, "blue gear", "Brand#2", "PROMO", 20, 20.0),
      (3L, "red gizmo", "Brand#1", "STANDARD", 15, 30.0),
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/part.parquet")
    Seq(
      (10L, 1L, 1L, 1, 10.0, 100.0, 0.05, 0.0, "R", "O", "1996-03-01"),
      (10L, 2L, 1L, 2, 20.0, 400.0, 0.00, 0.0, "N", "O", "1996-03-05"),
      (10L, 3L, 3L, 3, 5.0, 250.0, 0.00, 0.0, "N", "O", "1996-03-07"),
      (11L, 1L, 2L, 1, 20.0, 150.0, 0.06, 0.0, "N", "O", "1996-07-01"),
      (11L, 3L, 1L, 2, 1.0, 10.0, 0.00, 0.0, "N", "O", "1996-07-02"),
      (11L, 3L, 2L, 3, 1.0, 20.0, 0.00, 0.0, "N", "O", "1996-07-03"),
      (12L, 1L, 1L, 1, 30.0, 330.0, 0.10, 0.0, "R", "O", "1997-04-01"),
      (12L, 2L, 3L, 2, 10.0, 2000.0, 0.00, 0.0, "R", "O", "1997-04-02"),
      (12L, 3L, 4L, 3, 25.0, 40.0, 0.00, 0.0, "N", "O", "1997-04-03"),
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("forecast_revenue sums only the mid-band 1996 discounts") {
    // a: 100×0.05 = 5; d: 150×0.06 = 9. b/c/g/h disc 0; e disc 0.10 is
    // outside the band (and 1997); f/i ship 1997. → 14.00 over 2 lines.
    val got = Relational.forecastRevenue(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(got.toSeq == Seq((14.0, 2L)))
  }

  test("min_cost_supplier picks the cheapest in-region offer per part") {
    // Slice: P1 only (P3's size 15 > 10). EUROPE roster: S2 (N9). P1
    // offers from S2: line d → unit_e4 = 15000¢×100 // 20 = 75000 (7.50).
    val got = Relational.minCostSupplier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getString(5), r.getLong(6)))
    assert(got.toSeq == Seq((1L, "red bolt", 2L, "S2", 200.0, "N9", 75000L)))
  }

  test("market_share computes the nation's exact-bp slice per year") {
    // PROMO ⇒ P2; ASIA customers ⇒ C1 (orders 10, 12). 1996: line b,
    // supplier S1→NATION_7, rev 400 of 400 → 10000 bp. 1997: line f,
    // S3→N8, rev 2000, NATION_7 share 0.
    val got = Relational.marketShare(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1996L, 10000L, 400.0, 400.0, 1L),
      (1997L, 0L, 0.0, 2000.0, 1L)))
  }

  test("product_profit charges half-retail cost against discounted revenue") {
    // %bolt% ⇒ P1 (retail 10 → unit cost 5). a: 95−50=45 (NATION_7,1996);
    // d: 141−100=41 (N9,1996); e: 297−150=147 (NATION_7,1997).
    val got = Relational.productProfit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      ("N9", 1996L, 41.0, 1L),
      ("NATION_7", 1996L, 45.0, 1L),
      ("NATION_7", 1997L, 147.0, 1L)))
  }

  test("important_stock keeps positions above 3x the mean position") {
    // Positions (nation,part→value): N7P1 430, N7P2 400, N7P3 10, N8P3
    // 290, N8P2 2000, N9P1 150, N9P3 20. np=7, total=3300; keep v×7 >
    // 3×3300=9900 ⇒ v>1414.29: only (N8, P2)=2000 (1 line, line f).
    val got = Relational.importantStock(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq(("N8", 2L, 2000.0, 1L)))
  }

  test("promotion_suppliers flags >3x-mean-share dominators of red parts") {
    // red% ⇒ P1, P3. P1: S1 40, S2 20 (n_supp 2 — nobody can exceed 3×
    // mean with 2 suppliers: share >1.5 impossible). P3: S3 5, S1 1, S2 1,
    // S4 25; total 32, n_supp 4; S4: 25×4=100 > 3×32=96 ✓, S3: 20 < 96.
    val got = Relational.promotionSuppliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq((4L, "S4", "N8", 1L, 25L)))
  }

  test("sole_blame_suppliers needs company in the order but solo R flags") {
    // F orders: 10, 12. O10: suppliers {S1,S3}, returning {S1} → S1 sole
    // blame. O11 not F (and no R). O12: returning {S1,S3} — two failers,
    // n_ret_supp=2, disqualified. → S1 waits once.
    val got = Relational.soleBlameSuppliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "S1", 1L)))
  }

  test("copurchase_clustering credits all three corners of a triangle") {
    // Edges {(1,2),(1,3),(2,3)}: every vertex has degree 2 and sits in
    // the single triangle → coeff = 2·1/(2·1) = 1 → 10000 bp for all.
    val got = Relational.copurchaseClustering(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 10000L), (2L, 2L, 1L, 10000L), (3L, 2L, 1L, 10000L)))
  }

  test("benford_audit measures exact-bp first-digit shares vs the law") {
    // orders: 100/200/300 → digits 1,2,3, share 3333 bp each.
    // lineitem cents: 10000,40000,25000,15000,1000,2000,33000,200000,4000
    // → digit counts 1:3, 2:3, 3:1, 4:2 of 9.
    val got = Relational.benfordAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      ("l_extendedprice", "1", 3L, 3333L, 3010L, 323L),
      ("l_extendedprice", "2", 3L, 3333L, 1761L, 1572L),
      ("l_extendedprice", "3", 1L, 1111L, 1249L, -138L),
      ("l_extendedprice", "4", 2L, 2222L, 969L, 1253L),
      ("o_totalprice", "1", 1L, 3333L, 3010L, 323L),
      ("o_totalprice", "2", 1L, 3333L, 1761L, 1572L),
      ("o_totalprice", "3", 1L, 3333L, 1249L, 2084L)))
  }

  test("degree-guarded triangle closure (chunked adjacency) emits the " +
      "identical triple multiset") {
    // Skewed fixture: hub 1 → {2..30} plus a ring 2-3, 3-4, …, 29-30 —
    // triangles are exactly (1, k, k+1) for k = 2..29. The chunked
    // closure (r14 degree guard) must reproduce the unchunked multiset
    // for every chunk count, including ones that split the hub's list.
    import spark.implicits._
    val edges = ((2L to 30L).map(b => (1L, b)) ++
      (2L to 29L).map(k => (k, k + 1L))).toDF("part_a", "part_b")
    def triples(nChunks: Long) =
      graft.operators.Relational.copurchaseTriClosure(edges, nChunks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted
    val base = triples(1L)
    assert(base.toSeq == (2L to 29L).map(k => (1L, k, k + 1L)))
    Seq(2L, 3L, 7L, 64L).foreach { nc =>
      assert(triples(nc).toSeq == base.toSeq,
        s"chunked closure diverged at nChunks=$nc")
    }
  }

  test("copurchase_triangles counts each closed a<b<c exactly once") {
    // Baskets: O10 {1,2,3}, O11 {1,3}, O12 {1,2,3} → distinct edges
    // (1,2),(1,3),(2,3). Wedges (low→mid→high): (1,2)+(2,3) → (1,2,3)
    // only. Closure: (1,3) ∈ E → 1 triangle.
    val got = Relational.copurchaseTriangles(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((3L, 1L, 1L)))
  }
}
