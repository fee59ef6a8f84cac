package graft

import graft.operators.{Multimodal, Relational, TextAnalysis}
import org.apache.spark.sql.functions.{col, explode}

class OperatorsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docsDir = writeDocsFixture(Seq(
    1L -> "the quick brown fox and the lazy dog!",
    2L -> "word",
  ))

  test("token_count: whitespace vs BPE-ish tokens") {
    val rows = TextAnalysis.tokenCount(spark, docsDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L)._1 == 8) // whitespace tokens
    assert(rows(1L)._2 == 9) // 8 words + '!' (the '!' splits off)
    assert(rows(2L) == ((1L, 1L)))
  }

  test("quality_score ratios") {
    val r = TextAnalysis.qualityScore(spark, docsDir).where($"doc_id" === 1).collect().head
    assert(r.getAs[Long]("n_tokens") == 8)
    assert(r.getAs[Long]("n_stopwords") == 3) // the, and, the
    assert(r.getAs[Long]("n_punct") == 1)
    assert(r.getAs[Long]("stopword_bp") == 3750L) // 3/8 in basis points
  }

  test("lang_id predicts en for English stopword-heavy text") {
    val r = TextAnalysis.langId(spark, docsDir).where($"doc_id" === 1).collect().head
    assert(r.getAs[String]("pred_lang") == "en")
  }

  test("fingerprint produces window-min selections per doc") {
    val rows = TextAnalysis.fingerprint(spark, docsDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) > 0)
    // doc 2: len 4 < k=5 → filtered out entirely
    assert(!rows.contains(2L))
  }

  test("multimodal stub is deterministic and hash-derived") {
    val r = Multimodal.multimodalMeta(spark, docsDir).where($"doc_id" === 2).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("word".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.take(15), 16)
    assert(r.getAs[Long]("byte_len") == 4)
    assert(r.getAs[String]("blob_md5") == hex)
    assert(r.getAs[Long]("fake_width") == 1 + h % 1024)
    assert(r.getAs[Long]("fake_height") == 1 + (h >> 10) % 1024)
  }

  test("tfidf ranks doc-distinctive terms above common ones") {
    val d = writeDocsFixture(Seq(
      1L -> "spark spark spark common",
      2L -> "duck duck common",
      3L -> "common common words here",
    ))
    val top1 = TextAnalysis.tfidfTopTerms(spark, d)
      .where($"rk" === 1).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top1(1L) == "spark") // unique to doc 1 and frequent there
    assert(top1(2L) == "duck")
  }

  test("deterministic sampling is stable across runs") {
    val a = TextAnalysis.sampleDeterministic(spark, docsDir).collect().map(_.getLong(0)).toSet
    val b = TextAnalysis.sampleDeterministic(spark, docsDir).collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("pii redaction counts and scrubs emails and long digit runs") {
    val d = writeDocsFixture(Seq(
      1L -> "contact me at alice@example.com or call 12345678 thanks",
      2L -> "no pii here at all",
    ))
    val rows = TextAnalysis.redactPii(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == 2)
    assert(rows(2L) == 0)
  }

  test("phrase_search finds consecutive positions of the top corpus bigram") {
    // bigram counts: "big data" 3 (docs 1×2 + 2×1), "data big" 2 → the
    // phrase is "big data"; matches at doc1 pos {0,2}, doc2 pos {0}
    val d = writeDocsFixture(Seq(
      1L -> "big data big data big",
      2L -> "Big data rules",   // lowercases into a match at pos 0
      3L -> "data big nothing", // reversed order: no match
    ))
    val got = collectSet(TextAnalysis.phraseSearch(spark, d))
    assert(got == Set(Seq[Any](1L, 2L, 0L), Seq[Any](2L, 1L, 0L)))
  }

  test("word bigrams count consecutive lowercase pairs") {
    val d = writeDocsFixture(Seq(1L -> "big data big data big", 2L -> "single"))
    val rows = TextAnalysis.wordBigrams(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("big data") == 2)
    assert(rows("data big") == 2)
    assert(!rows.keys.exists(_.contains("single")))
  }

  test("sessionize splits on >30min gaps per user") {
    val d = java.nio.file.Files.createTempDirectory("graft-ev").toString
    val ns = 1000000000L
    val events = Seq(
      // user 1: events at t=0s, 100s (same session), 3000s (new session)
      (10L, 0L * ns, 1L, "click", 1.0, "{}"),
      (11L, 100L * ns, 1L, "view", 1.0, "{}"),
      (12L, 3000L * ns, 1L, "click", 1.0, "{}"),
      // user 2: single event
      (13L, 50L * ns, 2L, "view", 1.0, "{}"),
    )
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = Relational.sessionize(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 3)
    val u1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(u1(0)._3 == 2 && u1(0)._4 == 0 && u1(0)._5 == 100)
    assert(u1(1)._3 == 1 && u1(1)._4 == 3000)
  }

  test("asof join matches each purchase to the latest prior view") {
    val d = java.nio.file.Files.createTempDirectory("graft-ev3").toString
    val ns = 1000000000L
    Seq(
      (1L, 10L * ns, 1L, "view", 1.0, "{}"),
      (2L, 20L * ns, 1L, "purchase", 9.0, "{}"), // → view 1
      (3L, 30L * ns, 1L, "view", 1.0, "{}"),
      (4L, 40L * ns, 1L, "purchase", 9.0, "{}"), // → view 3
      (5L, 5L * ns, 2L, "purchase", 9.0, "{}"),  // no prior view → null
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = Relational.asofJoin(spark, d).collect()
      .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(rows(2L).contains(1L))
    assert(rows(4L).contains(3L))
    assert(rows(5L).isEmpty)
  }

  test("range join counts views in the 60s window before each purchase") {
    val d = java.nio.file.Files.createTempDirectory("graft-ev4").toString
    val ns = 1000000000L
    Seq(
      (1L, 100L * ns, 1L, "view", 1.0, "{}"),     // 100: in window of p@130
      (2L, 130L * ns, 1L, "purchase", 9.0, "{}"), // views in (70,130] → {100,130}
      (3L, 130L * ns, 2L, "view", 1.0, "{}"),     // same second as purchase
      (4L, 70L * ns, 2L, "view", 1.0, "{}"),      // exactly 60s before → excluded
      (5L, 300L * ns, 2L, "purchase", 9.0, "{}"), // no views in (240,300] → 0
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = Relational.rangeJoinCounts(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows(2L) == 2L) // views at 100 and 130 (window is platform-wide)
    assert(rows(5L) == 0L) // zero-match purchases still appear
    assert(rows.size == 2)
  }

  test("event pivot produces one count column per type") {
    val df = Relational.eventPivot(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq == Seq("user_id") ++ Relational.PivotTypes)
    val total = Relational.PivotTypes
      .map(c => df.agg(org.apache.spark.sql.functions.sum(c)).collect().head.getLong(0)).sum
    assert(total == 1000) // all sf0.001 events accounted for
  }

  test("events_window_agg buckets by hour") {
    val d = java.nio.file.Files.createTempDirectory("graft-ev2").toString
    val ns = 1000000000L
    Seq(
      (1L, 10L * ns, 1L, "click", 2.0, "{}"),
      (2L, 20L * ns, 1L, "click", 3.0, "{}"),
      (3L, 3700L * ns, 1L, "click", 5.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = Relational.eventsWindowAgg(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(rows.toSeq == Seq((0L, 2L, 5.0), (3600L, 1L, 5.0)))
  }

  test("retention cohorts count users by first-week cohort and offset") {
    val d = java.nio.file.Files.createTempDirectory("graft-ret").toString
    val wk = 7L * 24 * 3600 * 1000000000L
    Seq(
      // user 1: active week 0 and week 1; user 2: week 0 only;
      // user 3: first seen week 1
      (1L, 1L * wk / 7, 1L, "click", 1.0, "{}"),      // week 0
      (2L, wk + 1000L, 1L, "click", 1.0, "{}"),        // week 1
      (3L, 2L * wk / 7, 2L, "view", 1.0, "{}"),        // week 0
      (4L, wk + 5000L, 3L, "click", 1.0, "{}"),        // week 1
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = Relational.retentionCohorts(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (1L, 0L) -> 1L))
  }

  test("funnel counts conversions only when first purchase follows first view") {
    val d = java.nio.file.Files.createTempDirectory("graft-fun").toString
    val ns = 1000000000L
    Seq(
      // user 1: view then purchase → converted
      (1L, 10L * ns, 1L, "view", 1.0, "{}"),
      (2L, 20L * ns, 1L, "purchase", 9.0, "{}"),
      // user 2: purchase BEFORE first view → not converted
      (3L, 10L * ns, 2L, "purchase", 9.0, "{}"),
      (4L, 20L * ns, 2L, "view", 1.0, "{}"),
      // user 3: view only; user 4: clicks only
      (5L, 10L * ns, 3L, "view", 1.0, "{}"),
      (6L, 10L * ns, 4L, "click", 1.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = Relational.funnelConversion(spark, d).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L) // users, viewers
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L) // purchasers, converted
    assert(r.getLong(4) == 10000L / 3L) // 1/3 in exact floor basis points
  }

  test("event_daily_active counts exact distinct users per (day, type)") {
    // TIMESTAMP fixture: exercises the post-r6 events schema branch
    // (the long-nanos fixtures above keep the legacy branch covered)
    val d = java.nio.file.Files.createTempDirectory("graft-daily").toString
    // explicit UTC instants: Timestamp.valueOf would parse in the JVM
    // default zone while to_date uses the pinned-UTC session zone, so the
    // day-boundary rows would shift on a non-UTC box
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    Seq(
      (1L, ts("2024-01-01T10:00:00Z"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01T11:30:00Z"), 1L, "click", 2.0, "{}"), // same user+day
      (3L, ts("2024-01-01T23:59:59Z"), 2L, "click", 3.0, "{}"),
      (4L, ts("2024-01-02T00:00:01Z"), 1L, "view", 4.0, "{}"),  // next day
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = Relational.eventDailyActive(spark, d).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows(("2024-01-01", "click")) == ((3L, 2L, 6.0)))
    assert(rows(("2024-01-02", "view")) == ((1L, 1L, 4.0)))
    assert(rows.size == 2)
  }

  test("event_props_agg extracts the JSON key; malformed rows group as null") {
    val d = java.nio.file.Files.createTempDirectory("graft-props").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, """{"k": 7}"""),
      (2L, ts("2024-01-01 11:00:00"), 2L, "click", 2.0, """{"k": 7}"""),
      (3L, ts("2024-01-01 12:00:00"), 3L, "click", 5.0, """{"k": 9}"""),
      (4L, ts("2024-01-01 13:00:00"), 4L, "click", 8.0, "not json"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = Relational.eventPropsAgg(spark, d).collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows(Some(7L)) == ((2L, 3.0)))
    assert(rows(Some(9L)) == ((1L, 5.0)))
    assert(rows(None) == ((1L, 8.0))) // PERMISSIVE parse: malformed → null key
  }

  test("order_priority_semi counts each qualifying order once (semi-join)") {
    val d = java.nio.file.Files.createTempDirectory("graft-semi").toString
    Seq(
      (1L, 1L, "O", 10.0, "1995-01-01", "1-URGENT"),
      (2L, 1L, "O", 10.0, "1995-01-02", "1-URGENT"),
      (3L, 2L, "O", 10.0, "1995-01-03", "2-HIGH"),
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq(
      // order 1: TWO deep-discount lines — must still count once
      (1L, 1L, 1L, 1, 1.0, 100.0, 0.10, 0.0, "N", "O", "1995-01-01"),
      (1L, 2L, 1L, 2, 1.0, 100.0, 0.08, 0.0, "N", "O", "1995-01-01"),
      // order 2: only a shallow discount — excluded
      (2L, 1L, 1L, 1, 1.0, 100.0, 0.01, 0.0, "N", "O", "1995-01-01"),
      // order 3: one qualifying line
      (3L, 1L, 1L, 1, 1.0, 100.0, 0.06, 0.0, "N", "O", "1995-01-01"),
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val rows = Relational.orderPrioritySemi(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("1-URGENT" -> 1L, "2-HIGH" -> 1L))
  }

  test("customer_distribution keeps 0-order customers via the outer join") {
    val d = java.nio.file.Files.createTempDirectory("graft-q13").toString
    Seq(
      (1L, "a", 0L, 0.0, "BUILDING"),
      (2L, "b", 0L, 0.0, "BUILDING"),
      (3L, "c", 0L, 0.0, "BUILDING"), // no orders at all
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/customer.parquet")
    Seq(
      (1L, 1L, "O", 10.0, "1995-01-01", "1-URGENT"),
      (2L, 1L, "O", 10.0, "1995-01-02", "1-URGENT"),
      (3L, 2L, "O", 10.0, "1995-01-03", "2-HIGH"),
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val rows = Relational.customerDistribution(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(2L -> 1L, 1L -> 1L, 0L -> 1L))
  }

  test("heavy_hitters equals the brute-force per-source top-N") {
    val d = java.nio.file.Files.createTempDirectory("graft-hh").toString
    val docs = Seq(
      (1L, "aa aa aa bb bb cc dd ee ff gg", "src0"),
      (2L, "aa bb bb cc cc cc hh ii", "src0"),
      (3L, "zz zz yy xx", "src1"),
      (4L, "zz yy yy yy ww", "src1"),
    )
    docs.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = TextAnalysis.heavyHitters(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // brute force: count every token per source, rank (n DESC, term ASC)
    val brute = docs
      .flatMap { case (_, t, s) => t.split("\\s+").map(w => (s, w.toLowerCase)) }
      .groupBy(identity).map { case ((s, w), xs) => (s, w, xs.size.toLong) }
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.toSeq.sortBy { case (_, w, n) => (-n, w) }.zipWithIndex
          .take(TextAnalysis.HhTopN)
          .map { case ((s, w, n), i) => (s, w, n, i + 1L) }
      }.toSet
    assert(got == brute)
  }

  test("inverted_index: df/tf and a bounded sorted posting sample per term") {
    val d = java.nio.file.Files.createTempDirectory("graft-idx").toString
    Seq(
      (10L, "apple banana apple"),
      (2L, "banana cherry"),
      (7L, "apple"),
    ).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src0' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = TextAnalysis.invertedIndex(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got == Map(
      "apple" -> ((2L, 3L, "7 10")),   // postings sorted numerically
      "banana" -> ((2L, 2L, "2 10")),
      "cherry" -> ((1L, 1L, "2"))))
  }

  test("revenue_cube emits all four granularities with coalesced subtotals") {
    val d = java.nio.file.Files.createTempDirectory("graft-cube").toString
    Seq(
      (1L, 1L, "O", 10.0, "1995-01-01", "1-URGENT"),
      (2L, 1L, "O", 20.0, "1995-01-02", "2-HIGH"),
      (3L, 2L, "F", 5.0, "1995-01-03", "1-URGENT"),
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = Relational.revenueCube(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      ("ALL", "ALL", 3L, 35.0),
      ("O", "ALL", 2L, 30.0), ("F", "ALL", 1L, 5.0),
      ("ALL", "1-URGENT", 2L, 15.0), ("ALL", "2-HIGH", 1L, 20.0),
      ("O", "1-URGENT", 1L, 10.0), ("O", "2-HIGH", 1L, 20.0),
      ("F", "1-URGENT", 1L, 5.0)))
  }

  test("data_profile counts nulls/distincts and types min/max per column kind") {
    val d = java.nio.file.Files.createTempDirectory("graft-prof").toString
    Seq(
      (1L, 1L, 1L, 1, Some(1.0), 100.0, 0.01, 0.0, Some("N"), "O", "1995-01-01"),
      (2L, 2L, 1L, 1, Some(3.0), 200.0, 0.02, 0.0, None, "O", "1995-01-02"),
      (3L, 3L, 1L, 1, None, 300.0, 0.01, 0.0, Some("R"), "F", "1995-01-03"),
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = Relational.dataProfile(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)),
          Option(r.get(6)), Option(r.get(7))))).toMap
    assert(got("l_quantity") ==
      ((3L, 1L, 2L, Some(1.0), Some(3.0), None, None)))
    assert(got("l_returnflag") ==
      ((3L, 1L, 2L, None, None, Some("N"), Some("R"))))
    assert(got("l_discount") ==
      ((3L, 0L, 2L, Some(0.01), Some(0.02), None, None)))
    assert(got.keySet ==
      (Relational.ProfileNumCols ++ Relational.ProfileStrCols).toSet)
  }

  test("lang_confusion cross-tabulates labeled vs predicted language") {
    val d = java.nio.file.Files.createTempDirectory("graft-conf").toString
    Seq(
      (1L, "the and of to it is", "en"),  // labeled en, predicted en
      (2L, "the and of to it is", "fr"),  // labeled fr, predicted en
      (3L, "le la les de et une", "fr"),  // labeled fr, predicted fr
    ).toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'src0' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = TextAnalysis.langConfusion(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("en", "en", 1L), ("fr", "en", 1L), ("fr", "fr", 1L)))
  }

  test("quality_trend recovers the exact OLS slope per source") {
    // stopword-free docs with n<50 tokens score exactly 200·n bp, so
    // (x, y) = (1,200),(2,400),(3,600) → slope 200.0 exactly
    val d = java.nio.file.Files.createTempDirectory("graft-trend").toString
    Seq(
      (1L, "qqq"),
      (2L, "qqq www"),
      (3L, "qqq www eee"),
    ).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src0' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = graft.operators.TextAnalysis.qualityTrend(spark, d).collect()
    assert(r.length == 1)
    assert(r.head.getString(0) == "src0" && r.head.getLong(1) == 3L
      && r.head.getDouble(2) == 200.0)
  }

  test("revenue_moving_avg: trailing-7-day mean counts only present days") {
    val d = java.nio.file.Files.createTempDirectory("graft-ma").toString
    Seq(
      (1L, 1L, "O", 10.0, "1995-01-01", "1-URGENT"),
      (2L, 1L, "O", 20.0, "1995-01-05", "1-URGENT"),
      (3L, 2L, "O", 15.0, "1995-01-10", "2-HIGH"),
      (4L, 2L, "O", 25.0, "1995-01-10", "2-HIGH"),
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val d0 = java.time.LocalDate.of(1995, 1, 1).toEpochDay
    val got = Relational.revenueMovingAvg(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (d0, 1L, 1000L, 1000L),          // only itself in window
      (d0 + 4, 1L, 2000L, 1500L),      // (1000+2000)/2
      (d0 + 9, 2L, 4000L, 3000L)))     // day 5 still in range, day 0 out
  }

  test("order_reconcile classifies matched and one-sided order keys") {
    val d = java.nio.file.Files.createTempDirectory("graft-rec").toString
    Seq(
      (1L, 1L, "O", 10.0, "1995-01-01", "1-URGENT"),
      (2L, 1L, "O", 20.0, "1995-01-02", "1-URGENT"),
      (3L, 2L, "O", 30.0, "1995-01-03", "2-HIGH"),
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq(
      (2L, 1L, 1L, 1, 1.0, 100.0, 0.01, 0.0, "N", "O", "1995-01-02"),
      (3L, 2L, 1L, 1, 2.0, 200.0, 0.02, 0.0, "N", "O", "1995-01-03"),
      (3L, 3L, 1L, 2, 3.0, 300.0, 0.03, 0.0, "N", "O", "1995-01-03"),
      (4L, 4L, 1L, 1, 4.0, 400.0, 0.04, 0.0, "N", "O", "1995-01-04"),
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val r = Relational.orderReconcile(spark, d).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 1L)))
  }

  test("shipping_priority keeps pre-cutoff BUILDING orders with post-cutoff lines") {
    val d = java.nio.file.Files.createTempDirectory("graft-q3").toString
    Seq(
      (1L, "a", 0L, 0.0, "BUILDING"),
      (2L, "b", 0L, 0.0, "MACHINERY"),
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/customer.parquet")
    Seq(
      (10L, 1L, "O", 10.0, "1995-06-01", "1-URGENT"), // qualifies
      (11L, 1L, "O", 10.0, "1997-01-01", "1-URGENT"), // after cutoff
      (12L, 2L, "O", 10.0, "1995-06-01", "1-URGENT"), // wrong segment
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq(
      (10L, 1L, 1L, 1, 1.0, 100.0, 0.1, 0.0, "N", "O", "1996-02-01"), // 90
      (10L, 2L, 1L, 2, 1.0, 50.0, 0.0, 0.0, "N", "O", "1996-03-01"),  // 50
      (10L, 3L, 1L, 3, 1.0, 999.0, 0.0, 0.0, "N", "O", "1995-07-01"), // shipped
      (11L, 4L, 1L, 1, 1.0, 77.0, 0.0, 0.0, "N", "O", "1997-02-01"),
      (12L, 5L, 1L, 1, 1.0, 88.0, 0.0, 0.0, "N", "O", "1996-02-01"),
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val rows = Relational.shippingPriority(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    assert(rows.toSeq == Seq((10L, 140.0, "1995-06-01", "1-URGENT", 1L)))
  }

  test("mix_divergence: chi-square of per-source language mix vs corpus mix") {
    val d = java.nio.file.Files.createTempDirectory("graft-chi").toString
    Seq(
      (1L, "t", "en", "src0"), (2L, "t", "en", "src0"),
      (3L, "t", "en", "src1"), (4L, "t", "fr", "src1"),
    ).toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = graft.operators.TextAnalysis.mixDivergence(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // corpus q = (en .75, fr .25); both sources sit at chi2 = 1/12 + 1/4
    assert(got.keySet == Set("src0", "src1"))
    got.values.foreach { case (n, chi2) =>
      assert(n == 2L && math.abs(chi2 - 1.0 / 3.0) < 1e-6)
    }
  }

  test("event_anomalies flags only days beyond 2 sigma of their type's mean") {
    val d = java.nio.file.Files.createTempDirectory("graft-anom").toString
    // type "a": 9 days with 10 events, 1 day with 30 -> the 30-day is >2σ
    // type "b": constant series -> σ=0 -> nothing flagged
    val day = 86400L
    val rows = (0 until 9).flatMap(dd =>
      (1 to 10).map(i => (dd * 1000L + i, dd * day + i, 1L, "a", 1.0, "{}"))) ++
      (1 to 30).map(i => (9000L + i, 9 * day + i, 1L, "a", 1.0, "{}")) ++
      (0 until 5).flatMap(dd =>
        (1 to 7).map(i => (50000L + dd * 100 + i, dd * day + i, 2L, "b", 1.0, "{}")))
    import org.apache.spark.sql.functions._
    rows.toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Relational.eventAnomalies(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 1)
    val (tpe, dayNum, n, z) = got.head
    assert(tpe == "a" && dayNum == 9L && n == 30L)
    // series: mean 12, var = (9*4 + 324)/10 = 36, σ=6, z=(30-12)/6=3
    assert(z == 3.0)
  }

  test("winnow_pairs shares bucket-capped fingerprints like the oracled frame") {
    val dir = "/root/testdata/sf0.001"
    // ground truth composed from the oracled fingerprint query
    val fp = TextAnalysis.fingerprint(spark, dir).collect()
      .map(r => r.getLong(0) ->
        r.getString(2).split(" ").filter(_.nonEmpty).map(_.toLong).toSet).toMap
    val bucketN = fp.toSeq.flatMap { case (id, hs) => hs.map(h => h -> id) }
      .groupBy(_._1).map { case (h, xs) => h -> xs.size }
    val keep = (h: Long) => bucketN(h) <= TextAnalysis.WinnowBucketCap
    val ids = fp.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      shared = (fp(a) & fp(b)).count(keep)
      if shared >= TextAnalysis.WinnowMinShared
      minFp = math.min(fp(a).size, fp(b).size).toLong
    } yield Seq[Any](a, b, shared.toLong, minFp,
      shared.toLong * 10000L / minFp)).toSet
    val got = collectSet(TextAnalysis.winnowPairs(spark, dir))
    assert(got == expected)
    assert(got.nonEmpty && got.size < ids.length * (ids.length - 1) / 2)
  }

  test("length_quality_curve buckets the oracled quality scores exactly") {
    val dir = "/root/testdata/sf0.001"
    val q = TextAnalysis.qualityScore(spark, dir)
      .select("doc_id", "quality_bp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lens = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val expected = lens.groupBy { case (_, n) =>
      java.lang.Long.toBinaryString(n).length.toLong
    }.map { case (b, xs) =>
      val qs = xs.map(x => q(x._1))
      Seq[Any](b, xs.length.toLong, qs.sum / qs.length, qs.min, qs.max)
    }.toSet
    val got = collectSet(TextAnalysis.lengthQualityCurve(spark, dir))
    assert(got == expected)
    assert(got.size > 1)
  }

  test("scorer_agreement cross-tabulates the two oracled scorers exactly") {
    val dir = "/root/testdata/sf0.001"
    // ground truth composed from the two independently-oracled operators
    val q = TextAnalysis.qualityScore(spark, dir)
      .select("doc_id", "quality_bp").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1) >= graft.operators.Curation.CuratedQualityMinBp)).toMap
    val c = TextAnalysis.classifierScore(spark, dir)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(q.keySet == c.keySet)
    val a = q.count { case (id, qk) => qk && c(id) }.toLong
    val b = q.count { case (id, qk) => qk && !c(id) }.toLong
    val x = q.count { case (id, qk) => !qk && c(id) }.toLong
    val d = q.count { case (id, qk) => !qk && !c(id) }.toLong
    val n = q.size.toLong
    val po = (a + d) * 10000L / n
    val pq = (a + b) * 10000L / n
    val pc = (a + x) * 10000L / n
    val pe = (pq * pc + (10000L - pq) * (10000L - pc)) / 10000L
    val kappa = BigDecimal((po - pe).toDouble / math.max(10000L - pe, 1L).toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = collectSet(TextAnalysis.scorerAgreement(spark, dir))
    assert(got == Set(Seq[Any](n, a, b, x, d, po, kappa)))
    // the contingency is non-degenerate: both scorers disagree somewhere
    assert(b > 0L && x > 0L)
  }

  test("tokenizer_fertility charges punctuation-heavy languages more tokens") {
    val d = java.nio.file.Files.createTempDirectory("graft-fert").toString
    Seq((1L, "Hello, world! 123", "en"), (2L, "Hi there.", "en"),
        (3L, "abc def", "de"))
      .toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'src0' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = TextAnalysis.tokenizerFertility(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // en: "Hello, world! 123" → ws 3 / bpe 5; "Hi there." → ws 2 / bpe 3
    assert(got == Map(
      "en" -> ((2L, 5L, 8L, 16000L)),
      "de" -> ((1L, 2L, 2L, 10000L))))
  }

  test("rfm_segments scores corpus tertiles exactly (brute force at sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(datediff(to_date(o_orderdate), DATE '1970-01-01') AS BIGINT) AS day_num",
        "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val base = rows.groupBy(_._1).map { case (ck, xs) =>
      val rev = xs.map(x => BigDecimal(x._3)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      (ck, xs.length.toLong, xs.map(_._2).max,
        (rev * 10000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }.toSeq
    val maxDay = base.map(_._3).max
    val scored = base.map { case (ck, f, last, m) => (ck, maxDay - last, f, m) }
    // Spark `percentile`: linear interpolation at p*(n-1), then the
    // operator's DECIMAL(18,4) pin
    def pctl(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted
      val r = p * (s.length - 1)
      val lo = math.floor(r).toInt; val hi = math.ceil(r).toInt
      val v = s(lo) + (r - lo) * (s(hi) - s(lo)).toDouble
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def thr(sel: ((Long, Long, Long, Long)) => Long) =
      (pctl(scored.map(sel), Relational.RfmLoPct),
        pctl(scored.map(sel), Relational.RfmHiPct))
    val (r1, r2) = thr(_._2); val (f1, f2) = thr(_._3); val (m1, m2) = thr(_._4)
    def asc3(v: Long, t1: Double, t2: Double) =
      if (v <= t1) 3L else if (v <= t2) 2L else 1L
    def desc3(v: Long, t1: Double, t2: Double) =
      if (v <= t1) 1L else if (v <= t2) 2L else 3L
    val expected = scored.map { case (ck, rec, f, m) =>
      val (rs, fs, ms) = (asc3(rec, r1, r2), desc3(f, f1, f2), desc3(m, m1, m2))
      Seq[Any](ck, rec, f, m, rs, fs, ms, rs * 100 + fs * 10 + ms)
    }.toSet
    val got = collectSet(Relational.rfmSegments(spark, dir))
    assert(got == expected)
    // non-vacuous: more than one segment occupied
    assert(got.map(_(7)).size > 1)
  }

  test("customer_lifetime rolls up first/last day, count and exact revenue") {
    val d = java.nio.file.Files.createTempDirectory("graft-clv").toString
    Seq(
      (1L, 7L, "O", 10.5, "1995-01-01", "1-URGENT"),
      (2L, 7L, "O", 20.0, "1996-06-01", "2-HIGH"),
      (3L, 8L, "F", 5.25, "1995-03-01", "2-HIGH"),
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = Relational.customerLifetime(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val d0 = java.time.LocalDate.of(1995, 1, 1).toEpochDay
    val d1 = java.time.LocalDate.of(1996, 6, 1).toEpochDay
    val d2 = java.time.LocalDate.of(1995, 3, 1).toEpochDay
    assert(got == Map(
      7L -> ((2L, d0, d1, 30.5)),
      8L -> ((1L, d2, d2, 5.25))))
  }

  test("pmi_top_pairs ranks exclusive collocations above chance pairs") {
    val d = java.nio.file.Files.createTempDirectory("graft-pmi").toString
    // "new york" always co-occurs (lift high); "the cat"/"the dog" split
    // "the"'s mass (lift low); pairs under MinPairN support are dropped
    val phrase = Seq.fill(6)("new york").mkString(" ")
    val noise = Seq.fill(6)("the cat the dog").mkString(" ")
    Seq(1L -> phrase, 2L -> noise, 3L -> "rare pair")
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src0' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    graft.operators.Materialized.clearAll()
    val got = TextAnalysis.pmiTopPairs(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byName = got.map(r => r._1 -> r).toMap
    assert(byName.contains("new york") && !byName.contains("rare pair"))
    // lift("new york") = 6*N/(6*6); lift("the cat") = 6*N/(12*6) — half
    assert(byName("new york")._3 > byName("the cat")._3)
    assert(got.head._1 == "new york" || got.head._3 >= byName("new york")._3)
  }

  test("session_stats buckets sessions by log2 duration, zeros to bucket 0") {
    val d = java.nio.file.Files.createTempDirectory("graft-sess").toString
    // user 1: one 2-event session lasting 100 s (bin(100) = 7 digits);
    // user 2: one single-event session (duration 0 -> bucket 0)
    Seq(
      (1L, 1000L, 1L, "view", 1.0, "{}"),
      (2L, 1100L, 1L, "click", 1.0, "{}"),
      (3L, 5000L, 2L, "view", 1.0, "{}"),
    ).toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Relational.sessionStats(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((7L, 1L, 2L, 100L), (0L, 1L, 1L, 0L)))
  }

  test("hourly_seasonality shares sum to ~10000bp per type") {
    val d = java.nio.file.Files.createTempDirectory("graft-hod").toString
    // type a: 3 events at hour 1, 1 at hour 5; type b: 2 at hour 1
    Seq(
      (1L, 3600L + 10, 1L, "a", 1.0, "{}"),
      (2L, 3600L + 20, 1L, "a", 1.0, "{}"),
      (3L, 86400L + 3600L + 30, 2L, "a", 1.0, "{}"), // next day, same hour 1
      (4L, 5 * 3600L + 1, 2L, "a", 1.0, "{}"),
      (5L, 3600L + 40, 3L, "b", 1.0, "{}"),
      (6L, 3600L + 50, 3L, "b", 1.0, "{}"),
    ).toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Relational.hourlySeasonality(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      ("a", 1L, 3L, 7500L), ("a", 5L, 1L, 2500L),
      ("b", 1L, 2L, 10000L)))
  }

  test("event_transitions counts consecutive per-user pairs with row shares") {
    val d = java.nio.file.Files.createTempDirectory("graft-trans").toString
    // user 1: view->click->view->purchase; user 2: view->click
    Seq(
      (1L, 100L, 1L, "view", 1.0, "{}"),
      (2L, 200L, 1L, "click", 1.0, "{}"),
      (3L, 300L, 1L, "view", 1.0, "{}"),
      (4L, 400L, 1L, "purchase", 1.0, "{}"),
      (5L, 150L, 2L, "view", 1.0, "{}"),
      (6L, 250L, 2L, "click", 1.0, "{}"),
    ).toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Relational.eventTransitions(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      ("view", "click", 2L, 6666L),     // 2 of view's 3 transitions
      ("view", "purchase", 1L, 3333L),
      ("click", "view", 1L, 10000L)))
  }

  test("vocab_overlap computes pairwise source vocabulary jaccard") {
    val d = java.nio.file.Files.createTempDirectory("graft-vocab").toString
    Seq(
      (1L, "aa bb cc", "s1"),
      (2L, "bb cc dd", "s2"),   // |s1∩s2|=2, |s1∪s2|=4 → 5000bp
      (3L, "xx yy", "s3"),      // disjoint from both → no pair row? inter=0 dropped
    ).toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val norm = graft.operators.TextAnalysis.vocabOverlap(spark, d).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"),
        r.getAs[Long]("inter"), r.getAs[Long]("jaccard_bp"))).toSet
    assert(norm == Set(("s1", "s2", 2L, 5000L)))
  }

  test("parts_copurchase counts distinct within-order pairs, ranked by support") {
    val d = java.nio.file.Files.createTempDirectory("graft-basket").toString
    // order 1: parts {10,20,30}; order 2: {10,20}; order 3: {10,20} dup line;
    // order 4: single part (no pairs)
    Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 20L),
      (4L, 99L),
    ).zipWithIndex.map { case ((o, p), i) =>
      (o, p, 1L, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O", "1995-01-01")
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = Relational.partsCopurchase(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (10L, 20L, 3L, 1L),   // duplicate line in order 3 counts once
      (10L, 30L, 1L, 2L),
      (20L, 30L, 1L, 3L)))
  }

  test("daily_revenue_filled zero-fills calendar gaps between first and last day") {
    val d = java.nio.file.Files.createTempDirectory("graft-fill").toString
    Seq(
      (1L, 1L, "O", 10.0, "1995-01-01", "1-URGENT"),
      (2L, 1L, "O", 20.0, "1995-01-04", "1-URGENT"),
      (3L, 2L, "O", 5.0, "1995-01-04", "2-HIGH"),
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val d0 = java.time.LocalDate.of(1995, 1, 1).toEpochDay
    val got = Relational.dailyRevenueFilled(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (d0, 1L, 1000L),
      (d0 + 1, 0L, 0L),      // gap days materialize with zeros
      (d0 + 2, 0L, 0L),
      (d0 + 3, 2L, 2500L)))
  }

  test("freq_sketch keeps every key above N/(capacity+1) under forced decrements") {
    val cap = 8
    val hot = Seq.fill(1000)("hot")
    val cold = ('a' to 'z').map(_.toString) // 26 singletons > capacity
    val df = spark.createDataFrame(
      scala.util.Random.shuffle(hot ++ cold).map(Tuple1(_)))
      .toDF("k").repartition(7) // force genuine partial-state merges
    val entries = df
      .agg(org.apache.spark.sql.graft.FreqSketch.column(col("k"), cap).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.key"), col("e.lb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(entries.size <= cap)
    // N = 1026, bound = N/(cap+1) = 114: "hot" (1000) must survive, and its
    // retained count may undercount by at most the bound
    assert(entries.contains("hot"))
    assert(entries("hot") >= 1000L - 1026L / (cap + 1) - 1)
    // SQL registration (aggregate tier reachable from plain SQL)
    df.createOrReplaceTempView("hh_input")
    val viaSql = spark.sql(
      s"SELECT freq_sketch(k, $cap) AS sk FROM hh_input")
      .select(explode(col("sk.key")).as("k"))
      .collect().map(_.getString(0)).toSet
    assert(viaSql.contains("hot") && viaSql.size <= cap)
  }

  test("bm25_topk matches a brute-force Okapi ranking on the real corpus") {
    import graft.operators.TextAnalysis._
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split("\\s+").filter(_.nonEmpty).map(_.toLowerCase)))
    val n = docs.length
    val sumLen = docs.map(_._2.length.toLong).sum
    val avgdl = sumLen.toDouble / n
    val df = Bm25Query.map(t => t -> docs.count(_._2.contains(t))).toMap
    val idf = Bm25Query.map(t =>
      t -> r6(math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)).toDouble).toMap
    val expected = docs.flatMap { case (id, toks) =>
      val lenD = toks.length.toLong
      val score = Bm25Query.map { t =>
        val tf = toks.count(_ == t).toDouble
        r6(idf(t) * ((tf * (Bm25K1 + 1.0))
          / (tf + Bm25K1 * (1.0 - Bm25B + Bm25B * (lenD.toDouble / avgdl)))))
      }.sum.toDouble
      if (score > 0.0) Some((id, lenD, score)) else None
    }.sortBy { case (id, _, s) => (-s, id) }.take(Bm25TopN).zipWithIndex
      .map { case ((id, l, s), i) => Seq[Any](id, l, s, (i + 1).toLong) }.toSet
    val got = collectSet(TextAnalysis.bm25Topk(spark, "/root/testdata/sf0.001"))
    assert(got == expected)
    // the saturation must matter: ranking differs from raw tf ordering
    assert(got.size == Bm25TopN)
  }

  test("readability: hand-computed Flesch-Kincaid, floor semantics, " +
      "sentence floor") {
    val d = writeDocsFixture(Seq(
      1L -> "The cat sat. The dog ran fast!",
      2L -> "no punctuation here",
      3L -> ""))
    val got = TextAnalysis.readability(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(!got.contains(3L)) // wordless docs emit no row
    // doc1: 7 words, 2 sentences, 7 vowel groups →
    // grade = 0.39*3.5 + 11.8*1 - 15.59 = -2.425 → e2 FLOOR = -243
    // (the negative-numerator offset must floor, not truncate toward 0)
    assert(got(1L) == ((7L, 2L, 7L, 350L, 100L, -243L)))
    // doc2: no terminal punctuation → sentence count floored at 1;
    // 3 words, 6 vowel groups ('o' | 'u','ua','io' | 'e','e')
    assert(got(2L) == ((3L, 0L, 6L, 300L, 200L, 918L)))
  }

  test("pii_stats: per-class counts, digit runs disjoint from emails") {
    val d = writeDocsFixture(Seq(
      1L -> "contact user1234567@example.com now",
      2L -> "server at 192.168.100.200 up today",
      3L -> "ssn 123-45-6789 leaked once",
      4L -> "card 12345678901234 on file",
      5L -> "clean text with no numbers."))
    val r = TextAnalysis.piiStats(spark, d).collect()(0)
    assert(r.getString(0) == "src0")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((5L, 4L, 8000L)))
    // the email's embedded 7-digit run must NOT also count as a digit run,
    // and ipv4/ssn punctuation breaks runs by construction
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((1L, 1L, 1L, 1L)))
  }

  test("license_detect: marker families, precedence, multi-family count") {
    val d = writeDocsFixture(Seq(
      1L -> ("Permission is hereby granted, free of charge, to any person " +
        "... it also quotes the GNU General Public License by name."),
      2L -> "This work is licensed under the Apache License, Version 2.0.",
      3L -> "Distributed under the GNU General Public License v3.",
      4L -> "Released under a Creative Commons Attribution 4.0 licence.",
      5L -> "See the Project Gutenberg License online for details.",
      6L -> "No license text at all here."))
    val got = TextAnalysis.licenseDetect(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("mit", 2L))) // the grant phrase wins over quoted GPL
    assert(got(2L) == (("apache", 1L)))
    assert(got(3L) == (("gpl", 1L)))
    assert(got(4L) == (("cc_by", 1L)))
    assert(got(5L) == (("gutenberg", 1L)))
    assert(got(6L) == (("", 0L)))
  }

  test("promo_revenue: monthly promo share as exact bp of decimal sums") {
    val d = java.nio.file.Files.createTempDirectory("graft-q14").toString
    Seq((1L, "p1", "PROMO", 1, 1.0), (2L, "p2", "STANDARD", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/part.parquet")
    Seq(
      (10L, 1L, 1L, 1, 1.0, 100.0, 0.1, 0.0, "N", "O", "1995-06-03"),
      (10L, 2L, 1L, 2, 1.0, 50.0, 0.0, 0.0, "N", "O", "1995-06-20"),
      (11L, 1L, 1L, 1, 1.0, 200.0, 0.25, 0.0, "N", "O", "1995-07-01"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = Relational.promoRevenue(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))).toMap
    // 1995-06: promo 90 of 140 → round4(900000/140) = 6428.5714 (the
    // DECIMAL(14,4)-pinned IEEE share — §6's overflow-safe ratio policy)
    assert(got("1995-06") == ((90.0, 140.0, 6428.5714, 2L)))
    assert(got("1995-07") == ((150.0, 150.0, 10000.0, 1L)))
  }

  test("script_stats counts the 8 pinned script classes on a mixed-script " +
      "corpus and flags non-Latin docs") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-scripts").toString
    Seq(
      // hand-counted: 5 Latin, 3 Cyrillic, 2 Han, 5 Arabic, 6 Devanagari
      // (4 letters + 2 combining marks carry the script property), 4 Greek,
      // 2 Hangul, 9 kana (5 hiragana + 4 katakana); digits/punct no script
      (1L, "Hello мир 你好 مرحبا नमस्ते Γειά 안녕 こんにちは カタカナ 123 !", "multi"),
      (2L, "pure ascii prose only", "multi"),
      (3L, "latin with 一二三 han", "cjk"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'xx' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = TextAnalysis.scriptStats(spark, d).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    // multi: doc1 (5,2,3,5,6,4,2,9 across the classes) + doc2 (18 latin)
    assert(got("multi") == Seq(2L, 23L, 2L, 3L, 5L, 6L, 4L, 2L, 9L, 1L))
    assert(got("cjk") == Seq(1L, 12L, 3L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
    // per-doc router: the mixed doc is latin-dominant by count (5 < 9
    // kana? no: ties and priority — hand-derive: counts are latin 5,
    // kana 9 → kana wins); the cjk doc is latin-dominant (12 > 3); an
    // all-digit doc routes to 'none'
    val d2 = java.nio.file.Files.createTempDirectory("graft-scripts2").toString
    Seq((1L, "12345 67890 ?!", "s"), (2L, "один два три", "s"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'xx' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val routed = TextAnalysis.docScripts(spark, d2).collect()
      .map(r => r.getLong(0) -> r.getString(9)).toMap
    assert(routed == Map(1L -> "none", 2L -> "cyrillic"))
    val routed1 = TextAnalysis.docScripts(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(9)).toMap
    assert(routed1 == Map(1L -> "kana", 2L -> "latin", 3L -> "latin"))
  }
}
