package graft

import graft.sources.WarcSource

class WarcSourceSpec extends SparkTestBase {

  private def record(wtype: String, url: String, block: Array[Byte]): Array[Byte] = {
    val head = (s"WARC/1.0\r\n" +
      s"WARC-Type: $wtype\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      s"Content-Length: ${block.length}\r\n" +
      "\r\n").getBytes("ISO-8859-1")
    head ++ block ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }
  private def http(body: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body).getBytes("UTF-8")

  // the adversarial case: a body that CONTAINS the record marker — only
  // Content-Length framing parses this correctly
  private val trapBody = "before WARC/1.0\r\nWARC-Type: fake\r\n after"

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-warc")
    val warc = record("request", "http://a.example/x", "GET /x HTTP/1.1\r\n".getBytes("UTF-8")) ++
      record("response", "http://a.example/x", http("hello <b>world</b>")) ++
      record("response", "http://a.example/trap", http(trapBody)) ++
      // re-crawl: SAME url captured twice (routine in real WARCs)
      record("response", "http://a.example/x", http("hello again")) ++
      // LF-only HTTP headers (server bytes stored verbatim)
      record("response", "http://a.example/lf",
        "HTTP/1.1 200 OK\nContent-Type: text/plain\n\nbare lf body".getBytes("UTF-8")) ++
      // malformed UTF-8 in the body must not kill the query
      record("response", "http://a.example/bad",
        "HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8") ++
          Array[Byte](0x68, 0xFF.toByte, 0xFE.toByte, 0x69))
    java.nio.file.Files.write(d.resolve("part1.warc"), warc)
    // a gzipped file (streamed through GZIPInputStream, never one array)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record("response", "http://b.example/y", http("gzipped page")))
    gz.close()
    java.nio.file.Files.write(d.resolve("part2.warc.gz"), bos.toByteArray)
    d.toString
  }

  test("warc records are Content-Length framed, not marker split") {
    val rows = WarcSource.readWarc(spark, dir).collect()
      .map(r => (r.getString(2), r.getString(4), new String(r.getAs[Array[Byte]](5), "ISO-8859-1")))
    assert(rows.length == 7) // 1 request + 6 responses; no phantom "fake" record
    assert(!rows.exists(_._2 == "fake"))
    val trap = rows.find(_._1 == "http://a.example/trap").get
    assert(trap._3.contains("WARC/1.0")) // the marker stayed INSIDE the body
    assert(rows.count(_._2 == "response") == 6)
    assert(rows.exists(_._1 == "http://b.example/y")) // the gzipped file parsed
  }

  test("documentsFromWarc keeps responses, strips headers, survives bad UTF-8") {
    val docs = WarcSource.documentsFromWarc(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    assert(docs.length == 6)
    // duplicate-URL captures get DISTINCT doc_ids (rec_ix in the hash)
    assert(docs.map(_._1).distinct.length == 6)
    val byText = docs.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    assert(byText("http://a.example/x") == Set("hello <b>world</b>", "hello again"))
    assert(byText("http://b.example/y") == Set("gzipped page"))
    // LF-only header block is stripped too
    assert(byText("http://a.example/lf") == Set("bare lf body"))
    // malformed UTF-8 flows through as data instead of failing the job
    val bad = byText("http://a.example/bad").head
    assert(bad.startsWith("h") && bad.endsWith("i"))
    docs.foreach { case (_, _, text) => assert(!text.contains("HTTP/1.1")) }
  }

  test("a record with a bad Content-Length resyncs; later records survive") {
    // ADVICE r5: a missing/unparseable Content-Length used to end the whole
    // file's walk, silently dropping every intact record after it. The
    // parser now scans forward to the next version line instead.
    val d = java.nio.file.Files.createTempDirectory("graft-warc-resync")
    val bad = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: http://c.example/broken\r\n" +
      "Content-Length: not-a-number\r\n" +
      "\r\n").getBytes("ISO-8859-1")
    val missing = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: http://c.example/headerless\r\n" +
      "\r\n").getBytes("ISO-8859-1")
    val warc = record("response", "http://c.example/first", http("first ok")) ++
      bad ++
      record("response", "http://c.example/mid", http("mid ok")) ++
      missing ++
      record("response", "http://c.example/last", http("last ok"))
    java.nio.file.Files.write(d.resolve("resync.warc"), warc)
    val urls = WarcSource.documentsFromWarc(spark, d.toString)
      .collect().map(_.getString(1)).toSet
    assert(urls == Set("http://c.example/first", "http://c.example/mid",
      "http://c.example/last"))
  }

  test("utf-8 header values decode (IDN target URIs are not mojibake'd)") {
    val d = java.nio.file.Files.createTempDirectory("graft-warc-utf8")
    val url = "http://пример.example/ü"
    val body = http("utf8 header page")
    val head = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"Content-Length: ${body.length}\r\n" +
      "\r\n").getBytes("UTF-8")
    java.nio.file.Files.write(d.resolve("utf8.warc"),
      head ++ body ++ "\r\n\r\n".getBytes("ISO-8859-1"))
    val urls = WarcSource.documentsFromWarc(spark, d.toString)
      .collect().map(_.getString(1)).toSet
    assert(urls == Set(url))
  }

  test("warc_host_stats matches the fixture's hand-counted oracle") {
    // same integers as WarcSource.warcHostStatsSql / make_warc_fixture.py
    val rows = WarcSource.warcHostStats(spark, "ignored")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("", 1L, 13L), ("alpha.example", 3L, 44L),
      ("beta.example", 2L, 26L), ("gamma.example", 1L, 0L)))
  }

  test("streaming warc ingestion replays equal to batch (docs and host rollup)") {
    // The landing-directory shape: documentsFromWarcStream over the same
    // files must yield byte-identical rows to the batch path (shared
    // projection makes this true by construction; this asserts it E2E
    // through the binaryFile STREAMING source + checkpointed file index),
    // and the continuous per-host rollup must match the batch rollup.
    val ckpt = java.nio.file.Files.createTempDirectory("graft-warc-ckpt")
    val q = WarcSource.documentsFromWarcStream(spark, dir)
      .writeStream.format("memory").queryName("warc_docs_stream")
      .option("checkpointLocation", ckpt.resolve("docs").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "docs stream did not drain in time")
    finally q.stop()
    val streamed = spark.table("warc_docs_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3))).sortBy(_._1)
    val batch = WarcSource.documentsFromWarc(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3))).sortBy(_._1)
    assert(streamed.nonEmpty && streamed.sameElements(batch))

    val q2 = WarcSource.hostStats(WarcSource.documentsFromWarcStream(spark, dir))
      .writeStream.format("memory").queryName("warc_hosts_stream")
      .option("checkpointLocation", ckpt.resolve("hosts").toString)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q2.awaitTermination(120000), "host stream did not drain in time")
    finally q2.stop()
    val streamedHosts = spark.table("warc_hosts_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batchHosts = WarcSource.hostStats(WarcSource.documentsFromWarc(spark, dir))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamedHosts == batchHosts)
  }

  test("warc ingest stream gates quality and drops duplicate content") {
    // the full crawl→curation feed: landing dir → parse → quality gate →
    // watermarked content dedup. One record is under the token floor, two
    // share identical body text — exactly one of those survives.
    val d = java.nio.file.Files.createTempDirectory("graft-warc-ingest")
    val longBody = "the quick brown fox jumps over the lazy dog again and again"
    val other = "a different long body with enough plain words to pass the gate"
    val warc = record("response", "http://h1.example/a", http(longBody)) ++
      record("response", "http://h1.example/b", http(longBody)) ++
      record("response", "http://h2.example/c", http(other)) ++
      record("response", "http://h2.example/tiny", http("too short"))
    java.nio.file.Files.write(d.resolve("feed.warc"), warc)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-warc-ingest-ckpt")
    val q = WarcSource.warcIngestStream(spark, d.toString)
      .writeStream.format("memory").queryName("warc_ingest")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "ingest stream did not drain in time")
    finally q.stop()
    val urls = spark.table("warc_ingest").collect()
      .map(_.getAs[String]("url"))
    assert(urls.length == 2)
    assert(urls.count(u => u == "http://h1.example/a" || u == "http://h1.example/b") == 1)
    assert(urls.contains("http://h2.example/c"))
  }

  test("hostStats rolls documents up by crawl host") {
    val rows = WarcSource.hostStats(WarcSource.documentsFromWarc(spark, dir))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("a.example")._1 == 5L)
    assert(rows("b.example") == ((1L, "gzipped page".length.toLong)))
  }

  private def rowKeys(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
      r.getString(3), r.getString(4),
      new String(r.getAs[Array[Byte]](5), "ISO-8859-1"))).toSet

  test("v2 connector matches the binaryFile composition row-for-row") {
    val v2 = WarcSource.readWarc(spark, dir)
    val composed = WarcSource.readWarcBinaryFile(spark, dir)
    assert(v2.schema == composed.schema)
    val (a, b) = (rowKeys(v2), rowKeys(composed))
    assert(a == b && a.size == 7) // two independent parsers, one answer
  }

  test("v2 pruning drops the payload from the read schema; values survive") {
    val df = WarcSource.readWarc(spark, dir).select("url", "warc_type")
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.nonEmpty)
    val read = scans.head.scan.readSchema().fieldNames.toSeq
    assert(!read.contains("block"), s"payload not pruned: $read")
    val urls = df.where(org.apache.spark.sql.functions.col("warc_type") === "response")
      .collect().map(_.getString(0))
    assert(urls.length == 6 && urls.contains("http://b.example/y"))
  }

  test("v2 plans one partition per file; globs and dirs both resolve") {
    assert(WarcSource.readWarc(spark, dir).rdd.getNumPartitions == 2)
    val globbed = WarcSource.readWarc(spark, s"$dir/*.warc.gz")
    assert(globbed.rdd.getNumPartitions == 1)
    assert(globbed.count() == 1)
  }

  test("v2 pushes warc_type equality; rec_ix (and doc_ids) stay stable") {
    import org.apache.spark.sql.functions.col
    val filtered = WarcSource.readWarc(spark, dir)
      .where(col("warc_type") === "response")
    val scan = filtered.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.head
    assert(scan.scan.description().contains("pushed warc_type = response"))
    // indices must match the UNfiltered walk: the request record at ix 0
    // is skipped but still counted, so responses keep their original ix
    val ixs = filtered.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expect = WarcSource.readWarcBinaryFile(spark, dir)
      .where(col("warc_type") === "response")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ixs == expect && ixs.map(_._2).nonEmpty)
    // and the derived doc_ids agree between the two read paths
    import org.apache.spark.sql.functions.concat_ws
    val v2Ids = WarcSource.documentsFromWarc(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val composedIds = WarcSource.readWarcBinaryFile(spark, dir)
      .where(col("warc_type") === "response")
      .select(graft.functions.TextFns.md5Long(concat_ws("\u0001",
        col("path"), col("rec_ix"), col("url"))).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(v2Ids == composedIds && v2Ids.size == 6)
  }

  test("v2 micro-batch stream picks up arriving files exactly once; offsets survive restart") {
    def rec(u: String, body: String) = record("response", u, http(body))
    val land = java.nio.file.Files.createTempDirectory("graft-warc-land")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-warc-land-ckpt")
    val out = java.nio.file.Files.createTempDirectory("graft-warc-land-out")
    java.nio.file.Files.write(land.resolve("a.warc"), rec("http://s.example/a", "file a"))
    // parquet sink: the memory sink forbids checkpoint recovery, and the
    // restart leg is exactly what this test is about
    def start() = WarcSource.readWarcStream(spark, land.toString)
      .selectExpr("path", "rec_ix", "url") // parquet-friendly projection
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    def urls() = spark.read.parquet(out.toString).collect().map(_.getString(2)).toSeq
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(urls().toSet == Set("http://s.example/a"))
      // a file arriving between triggers is a new offset range
      java.nio.file.Files.write(land.resolve("b.warc"), rec("http://s.example/b", "file b"))
      q1.processAllAvailable()
      assert(urls().sorted == Seq("http://s.example/a", "http://s.example/b"))
    } finally q1.stop()
    // restart from the checkpoint: committed files must NOT reprocess —
    // only the file dropped while stopped is new work
    java.nio.file.Files.write(land.resolve("c.warc"), rec("http://s.example/c", "file c"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(urls().sorted == Seq("http://s.example/a", "http://s.example/b",
        "http://s.example/c")) // exactly once each, across the restart
    } finally q2.stop()
  }

  test("v2 stream tolerates an empty landing dir and honors maxFilesPerTrigger") {
    val land = java.nio.file.Files.createTempDirectory("graft-warc-empty")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-warc-empty-ckpt")
    val q = spark.readStream.format("warc")
      .option("maxFilesPerTrigger", "1").load(land.toString)
      .writeStream.format("memory").queryName("warc_v2_empty")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable() // empty dir = "no data yet", never a crash
      assert(spark.table("warc_v2_empty").count() == 0)
      (1 to 3).foreach { i =>
        java.nio.file.Files.write(land.resolve(s"f$i.warc"),
          record("response", s"http://m.example/$i", http(s"file $i")))
      }
      q.processAllAvailable()
      assert(spark.table("warc_v2_empty").count() == 3)
      // one file per micro-batch: the backlog committed incrementally
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
    } finally q.stop()
  }

  test("v2 micro-batch stream matches the binaryFile streaming composition") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-warc-conf-ckpt")
    def drain(df: org.apache.spark.sql.DataFrame, name: String) = {
      val q = df.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt.resolve(name).toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try assert(q.awaitTermination(120000), s"$name did not drain")
      finally q.stop()
      rowKeys(spark.table(name))
    }
    val v2 = drain(WarcSource.readWarcStream(spark, dir), "warc_conf_v2")
    val composed = drain(WarcSource.readWarcStreamBinaryFile(spark, dir), "warc_conf_bf")
    assert(v2 == composed && v2.size == 7)
  }

  test("the connector is SQL-usable via CREATE TABLE ... USING warc") {
    spark.sql("DROP TABLE IF EXISTS warc_sql_smoke")
    spark.sql(
      s"CREATE TABLE warc_sql_smoke USING warc OPTIONS (path '$dir')")
    try {
      val rows = spark.sql(
        """SELECT warc_type, count(*) AS n FROM warc_sql_smoke
          |GROUP BY 1 ORDER BY 1""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == Map("request" -> 1L, "response" -> 6L))
    } finally spark.sql("DROP TABLE IF EXISTS warc_sql_smoke")
  }

  // records for the sink round-trips: a marker-bearing payload (only
  // Content-Length framing survives it), an empty block, and a null url
  // (header omitted on write, parsed back as "")
  private def sinkRows = Seq(
    ("http://w.example/a", "2024-02-01T00:00:00Z", "response",
      http("written body one")),
    ("http://w.example/trap", "2024-02-01T00:00:01Z", "response",
      http(trapBody)),
    (null.asInstanceOf[String], "2024-02-01T00:00:02Z", "metadata",
      Array.emptyByteArray),
  )
  private def readBack(d: String) =
    WarcSource.readWarc(spark, d).collect()
      .map(r => (r.getString(2), r.getString(3), r.getString(4),
        new String(r.getAs[Array[Byte]](5), "UTF-8"))).toSet
  private def sinkExpected = sinkRows.map { case (u, d, t, b) =>
    (Option(u).getOrElse(""), d, t, new String(b, "UTF-8"))
  }.toSet

  test("warc sink round-trips through the reader (plain and gzip)") {
    import spark.implicits._
    for (gz <- Seq(false, true)) {
      val d = java.nio.file.Files.createTempDirectory("graft-warc-sink").toString
      WarcSource.writeWarc(
        sinkRows.toDF("url", "warc_date", "warc_type", "block"), d, gzip = gz)
      assert(readBack(d) == sinkExpected)
      // only visible committed members — no temps survive commit (hidden
      // `.`-files are Hadoop's local-FS .crc sidecars, which every lister
      // skips by the same dot-prefix rule)
      val names = new java.io.File(d).listFiles().map(_.getName)
        .filterNot(_.startsWith("."))
      val ext = if (gz) ".warc.gz" else ".warc"
      assert(names.nonEmpty && names.forall(n =>
        n.startsWith("part-") && n.endsWith(ext)))
      assert(names.forall(!_.endsWith(".tmp")))
    }
  }

  test("warc streaming sink archives each micro-batch exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val d = java.nio.file.Files.createTempDirectory("graft-warc-ssink").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-warc-ssink-cp").toString
    val input = MemoryStream[(String, String, String, Array[Byte])](spark)
    val q = WarcSource.writeWarcStream(
      input.toDF.toDF("url", "warc_date", "warc_type", "block"), d, cp)
    try {
      input.addData(("http://s.example/1", "2024-03-01T00:00:00Z", "response",
        http("stream one")))
      q.processAllAvailable()
      input.addData(("http://s.example/2", "2024-03-01T00:00:01Z", "response",
        http("stream two")))
      q.processAllAvailable()
    } finally q.stop()
    // two epochs → members named by (epoch, partition); both batches
    // visible exactly once through the batch reader
    val got = readBack(d)
    assert(got == Set(
      ("http://s.example/1", "2024-03-01T00:00:00Z", "response",
        new String(http("stream one"), "UTF-8")),
      ("http://s.example/2", "2024-03-01T00:00:01Z", "response",
        new String(http("stream two"), "UTF-8"))))
    val names = new java.io.File(d).listFiles().map(_.getName)
      .filterNot(_.startsWith("."))
    assert(names.forall(n => n.startsWith("part-e") && n.endsWith(".warc")))
  }

  test("warc sink appends immutable members; second write adds, never rewrites") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-warc-app").toString
    WarcSource.writeWarc(
      sinkRows.toDF("url", "warc_date", "warc_type", "block"), d)
    val firstFiles = new java.io.File(d).listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    WarcSource.writeWarc(
      Seq(("http://w.example/b", "2024-02-02T00:00:00Z", "response",
        http("second batch")))
        .toDF("url", "warc_date", "warc_type", "block"), d)
    // first batch's members untouched (same names still present), both
    // batches visible to the reader
    val after = new java.io.File(d).listFiles().map(_.getName).toSet
    assert(firstFiles.keySet.subsetOf(after))
    val got = readBack(d)
    assert(got == sinkExpected +
      (("http://w.example/b", "2024-02-02T00:00:00Z", "response",
        new String(http("second batch"), "UTF-8"))))
    // and the written corpus composes into the documents pipeline
    val docs = WarcSource.documentsFromWarc(spark, d).collect()
    assert(docs.map(_.getAs[String]("text")).toSet
      .contains("second batch"))
  }

  test("url dedup collapses canonical spellings and keeps a deterministic " +
      "representative") {
    import spark.implicits._
    val urls = Seq(
      "http://alpha.example/a",
      "https://ALPHA.example/a/",            // scheme/case/trailing slash
      "http://www.alpha.example/a?utm=x#f",  // www + tracking + fragment
      "http://alpha.example/b",
      "http://beta.example/a")               // same path, different host
    val got = WarcSource.urlDedup(urls.toDF("url")).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.size == 3)
    val a = got("alpha.example/a")
    assert(a._2 == 3L && a._3 == 3L)
    // min raw spelling is the deterministic keeper
    assert(a._1 == "http://alpha.example/a")
    assert(got("alpha.example/b")._2 == 1L)
    assert(got("beta.example/a")._2 == 1L)
  }

  test("url_filter: dot-boundary blocklist verdicts on the committed fixture; " +
      "the gate keeps exactly the audit's clean set") {
    val docs = WarcSource.documentsFromWarc(spark, WarcSource.FixtureBlockDir)
    val audit = WarcSource.urlFilterAudit(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2), r.getString(3)))
    val byUrl = audit.map(a => a._1 -> a).toMap
    // the lookalike host must survive the registered-domain rule (the
    // classic endsWith-without-the-dot bug)
    assert(byUrl("http://nottracker.example/ok")._3 == false)
    // a deep subdomain with mixed case is blocked by the domain rule
    assert(byUrl("https://Deep.Sub.TRACKER.example/x") ==
      (("https://Deep.Sub.TRACKER.example/x", "deep.sub.tracker.example",
        true, "tracker.example")))
    // the MOST SPECIFIC matching entry is the one reported
    assert(byUrl("http://shop.spam.good.example/buy2")._4 == "spam.good.example")
    // single-label host and the no-URL record stay clean
    assert(byUrl("http://localhost/x")._3 == false)
    assert(byUrl("")._3 == false && byUrl("")._2 == "")
    // gate ≡ audit: urlFilter keeps exactly the clean URLs
    val kept = WarcSource.urlFilter(docs)
      .select("url").collect().map(_.getString(0)).toSet
    // 4 clean of 9: good.example, the lookalike, localhost, the no-URL row
    assert(kept == audit.filter(!_._3).map(_._1).toSet && kept.size == 4)
  }

  test("urlBlockGate streaming twin replays equal to the batch url filter") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = Seq(
      (1L, "http://good.example/a", "keep me"),
      (2L, "http://ads.tracker.example/p", "drop me"),
      (3L, "http://nottracker.example/b", "keep me too"),
      (4L, "http://spam.good.example/c", "drop me too"))
    val input = MemoryStream[(Long, String, String)](spark)
    val q = graft.streaming.DocsStream.urlBlockGate(
      input.toDF().toDF("doc_id", "url", "text"))
      .writeStream.format("memory").queryName("urlgate")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("urlgate")
      .collect().map(_.getLong(0)).toSet
    val batch = WarcSource.urlFilter(rows.toDF("doc_id", "url", "text"))
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batch && batch == Set(1L, 3L))
  }

  private def extractOne(html: String): (String, String) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val r = Seq(html).toDF("text")
      .select(graft.functions.TextFns.htmlTitle(col("text")).as("t"),
        graft.functions.TextFns.htmlToText(col("text")).as("x"))
      .head()
    (r.getString(0), r.getString(1))
  }

  test("htmlToText: scripts/styles/comments/head drop wholesale, entities " +
      "decode after tag stripping, &amp; decodes last") {
    val (t1, x1) = extractOne(
      "<html><head><title>T &amp; U</title><style>p{x:1}</style></head>" +
        "<body><script>var s=\"<p>fake</p>\";</script>" +
        "<!-- <b>also fake</b> -->" +
        "<p>real &amp;lt; text &lt;b&gt;</p></body></html>")
    assert(t1 == "T & U")
    // &amp;lt; -> literal "&lt;"; decoded &lt;b&gt; stays TEXT (tags were
    // already stripped), so "<b>" survives as characters
    assert(x1 == "real &lt; text <b>")
    // a SCRIPT-SAFE page: fake markup inside JS strings never surfaces
    assert(!x1.contains("fake"))
  }

  test("htmlToText: br variants and block closers become line breaks; " +
      "inline closers become spaces") {
    val (_, x) = extractOne(
      "<div>one<br>two<BR/>three</div><ul><li>a</li><li>b</li></ul>" +
        "<p>c <i>it</i>.</p>")
    assert(x == "one\ntwo\nthree\na\nb\nc it .")
  }

  test("htmlToText: plain text passes through with whitespace collapse; " +
      "a lone '<' with no '>' is text") {
    val (t, x) = extractOne("no markup: 1 < 2, just   text &  spaces")
    assert(t == "")
    assert(x == "no markup: 1 < 2, just text & spaces")
    // idempotence on already-extracted text
    assert(extractOne(x)._2 == x)
  }

  test("htmlTitle: multiline/attributed titles normalize; absent title " +
      "is ''") {
    val (t, _) = extractOne(
      "<title lang=\"en\">\n  Two\n  Lines\t</title><p>body</p>")
    assert(t == "Two Lines")
    assert(extractOne("<p>no title</p>")._1 == "")
  }

  test("registeredDomain: 2-label suffix, degenerate hosts, one definition " +
      "with the blocklist chain") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq("a.b.example.com", "example.com", "localhost", "",
      "deep.sub.tracker.example").toDF("h")
      .select(WarcSource.registeredDomain(col("h"))).as[String].collect()
    assert(got.toSeq == Seq("example.com", "example.com", "localhost", "",
      "tracker.example"))
  }

  test("urlFilterLarge (PSL-scale suffix join) keeps exactly the " +
      "literal-array rule's survivors") {
    import spark.implicits._
    val docs = WarcSource.documentsFromWarc(spark, WarcSource.FixtureBlockDir)
    val expected = WarcSource.urlFilter(docs).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val bl = WarcSource.UrlBlocklist.toDF("entry")
    val got = WarcSource.urlFilterLarge(docs, bl).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got == expected && got.nonEmpty)
    assert(docs.count() > got.size) // the fixture really blocks something
    // an empty blocklist table blocks nothing
    assert(WarcSource.urlFilterLarge(docs,
      Seq.empty[String].toDF("entry")).count() == docs.count())
  }

  test("domain_stats rolls the block fixture up to registered domains " +
      "with exact mean quality") {
    val got = WarcSource.domainStatsQ(spark, "")
      .collect().map(r => r.getAs[String]("domain") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_hosts"),
          r.getAs[Long]("n_chars"), r.getAs[Long]("avg_quality_bp")))).toMap
    assert(got == Map(
      "" -> ((1L, 1L, 6L, 200L)),
      "good.example" -> ((3L, 3L, 26L, 400L)),
      "localhost" -> ((1L, 1L, 5L, 200L)),
      "nottracker.example" -> ((1L, 1L, 9L, 200L)),
      "tracker.example" -> ((3L, 3L, 19L, 266L))))
  }

  test("html_links extracts exactly the double-quoted-href anchors with " +
      "cleaned anchor text") {
    val got = WarcSource.htmlLinksQ(spark, "").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("http://hub.example/start", "http://alpha.example/a", "Alpha & Co"),
      ("http://hub.example/start", "http://alpha.example/a2", "Alpha & Co"),
      ("http://hub.example/start", "/local/page", "the local page"),
      ("http://hub.example/start", "http://beta.example/b?q=1", "beta list"),
      ("http://upper.example/g", "HTTP://Gamma.example/G", "Gamma Page")))
    // the single-quoted page and the link-free page yield nothing, and the
    // href-less <a name=...> anchor on the hub page was not a link
    assert(!got.exists(_._1.contains("squote")))
    assert(!got.exists(_._1.contains("nolinks")))
  }

  test("warc_html_extract fixture rows match the hand-derived expectations") {
    val got = WarcSource.warcHtmlExtract(spark, "")
      .collect().map(r => r.getAs[String]("url") ->
        (r.getAs[String]("title"), r.getAs[String]("text"),
          r.getAs[Long]("n_chars"))).toMap
    assert(got.size == 5)
    assert(got("http://site-a.example/index") == (("Site A & Friends",
      "Welcome\nFirst paragraph with bold and a link .\n" +
        "Maths: 3 < 4 > 2, \"quoted\", it's fine.\nalpha\nbeta", 96L)))
    assert(got("http://site-b.example/post") ==
      (("", "Line one\nLine two\nand & three.", 30L)))
    assert(got("http://plain.example/readme") ==
      (("", "no markup: 1 < 2, just text & spaces", 36L)))
    assert(got("http://site-b.example/empty") == (("", "", 0L)))
    assert(got("http://site-c.example/nested") ==
      (("C <3 page", "k v\nDone here.", 14L)))
  }

  test("domain_pagerank matches an independent in-memory PageRank over " +
      "the fixture's domain graph, sinks included") {
    val docs = graft.sources.WarcSource.documentsFromWarc(
      spark, graft.sources.WarcSource.FixtureLinksDir)
    // edge universe from the separately-oracled link_graph row
    val edges = graft.sources.WarcSource.linkGraph(docs).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter { case (a, b) => a != b }.distinct
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
    val n = nodes.length
    val outDeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to graft.operators.Dedup.PrRounds) {
      val inflow = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        pr(s) / outDeg(s) }.sum).toMap
      pr = nodes.map(d => d ->
        ((1.0 - graft.operators.Dedup.PrDamp) / n +
          graft.operators.Dedup.PrDamp * inflow.getOrElse(d, 0.0))).toMap
    }
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = nodes.map(d =>
      Seq[Any](d, outDeg.getOrElse(d, 0L), r6(pr(d)))).toSet
    val got = collectSet(
      graft.sources.WarcSource.domainPagerankQ(spark, ""))
    assert(got == expected)
    // a pure sink (no outlinks) still ranks, and endorsement discriminates:
    // the doubly-endorsed domain out-ranks the singly-endorsed ones (mass
    // SHRINKS each round here — dangling mass is dropped by design, so no
    // rank need exceed the uniform prior)
    assert(expected.exists(_(1) == 0L))
    val inbound = edges.groupBy(_._2).view.mapValues(_.length).toMap
    val topByPr = pr.maxBy(_._2)._1
    assert(inbound(topByPr) == inbound.values.max)
    assert(pr.values.toSet.size > 1)
  }

  test("domain_hits matches an independent in-memory HITS over the " +
      "fixture's domain graph, L1-normalized each half-step") {
    val docs = graft.sources.WarcSource.documentsFromWarc(
      spark, graft.sources.WarcSource.FixtureLinksDir)
    val edges = graft.sources.WarcSource.linkGraph(docs).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter { case (a, b) => a != b }.distinct
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
    val n = nodes.length
    val outDeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val inDeg = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    var hub = nodes.map(_ -> 1.0 / n).toMap
    var auth = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to graft.operators.Dedup.HitsRounds) {
      val rawA = edges.groupBy(_._2).view
        .mapValues(_.map { case (s, _) => hub(s) }.sum).toMap
      val aSum = rawA.values.sum
      auth = nodes.map(d => d -> rawA.getOrElse(d, 0.0) / aSum).toMap
      val rawH = edges.groupBy(_._1).view
        .mapValues(_.map { case (_, t) => auth(t) }.sum).toMap
      val hSum = rawH.values.sum
      hub = nodes.map(d => d -> rawH.getOrElse(d, 0.0) / hSum).toMap
    }
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = nodes.map(d => Seq[Any](d, outDeg.getOrElse(d, 0L),
      inDeg.getOrElse(d, 0L), r6(hub(d)), r6(auth(d)))).toSet
    val got = collectSet(graft.sources.WarcSource.domainHitsQ(spark, ""))
    assert(got == expected)
    // the roles separate: the hub page concentrates ALL hub mass (it is
    // the only multi-outlink source) and carries zero authority, while a
    // pure sink carries authority but zero hub mass
    val topHub = hub.maxBy(_._2)._1
    assert(outDeg(topHub) == outDeg.values.max)
    assert(auth(topHub) == 0.0 || inDeg.getOrElse(topHub, 0L) > 0L)
    assert(expected.exists(r => r(1) == 0L && r(4).asInstanceOf[Double] > 0))
  }

  // ---- robots.txt (RFC 9309) -----------------------------------------------

  test("parseRobots: orphan rules, consecutive UA runs, group restarts, " +
      "non-interfering records, comments, empty values, presence rows") {
    // rules BEFORE any User-agent line have no group and are dropped
    assert(WarcSource.parseRobots("Disallow: /early\n").isEmpty)
    // consecutive UA lines share the rules; a later UA (after rules)
    // starts a NEW group; every named agent gets a presence row
    val multi = WarcSource.parseRobots(
      """User-agent: A
        |User-agent: B
        |Disallow: /x
        |User-agent: C
        |Disallow: /y""".stripMargin)
    assert(multi == Seq(("a", "group", ""), ("b", "group", ""),
      ("c", "group", ""),
      ("a", "disallow", "/x"), ("b", "disallow", "/x"),
      ("c", "disallow", "/y")))
    // RFC 9309 §2.2.4: OTHER records (Crawl-delay, Sitemap) MUST NOT
    // interfere with group formation — A and D SHARE the rule here
    val nonInterfering = WarcSource.parseRobots(
      """User-agent: A
        |Crawl-delay: 5
        |User-agent: D
        |Allow: /z""".stripMargin)
    assert(nonInterfering == Seq(("a", "group", ""), ("d", "group", ""),
      ("a", "allow", "/z"), ("d", "allow", "/z")))
    // comments (whole-line and trailing) and empty values drop — but the
    // group presence row survives an all-empty group
    assert(WarcSource.parseRobots(
      "# all of it\nUser-agent: *\nDisallow: /a # tail\nAllow:\n") ==
      Seq(("*", "group", ""), ("*", "disallow", "/a")))
  }

  test("robotsVerdicts: an EMPTY agent-specific group wins group " +
      "selection (allow-all), never falling back to '*'") {
    import spark.implicits._
    // host forbids everything for '*' but has an empty graftbot group
    val rules = Seq(
      ("g.example", "graftbot", "group", ""),
      ("g.example", "*", "group", ""),
      ("g.example", "*", "disallow", "/"))
      .toDF("host", "agent", "rule", "prefix")
    val pages = Seq("http://g.example/anything").toDF("url")
    val got = WarcSource.robotsVerdicts(pages, rules, "graftbot").collect()
    assert(got.length == 1 && got(0).getBoolean(3),
      "empty specific group must allow everything, not fall back to '*'")
  }

  test("robotsVerdicts: RFC 9309 wildcard '*' and trailing '$' match, " +
      "and regex metachars in rules stay literal") {
    import spark.implicits._
    val rules = Seq(
      ("w.example", "*", "disallow", "/*.pdf$"),
      ("w.example", "*", "disallow", "/a+b/"),   // '+' must stay literal
      ("w.example", "*", "disallow", "/mid*end"))
      .toDF("host", "agent", "rule", "prefix")
    val pages = Seq(
      "http://w.example/docs/report.pdf",   // wildcard+anchor -> disallowed
      "http://w.example/docs/report.pdfx",  // anchor: NOT at end -> allowed
      "http://w.example/a+b/file",          // literal '+' -> disallowed
      "http://w.example/ab/file",           // '+' not a regex op -> allowed
      "http://w.example/middle-to-end",     // inner wildcard -> disallowed
      "http://w.example/midway")            // no 'end' suffix -> allowed
      .toDF("url")
    val got = WarcSource.robotsVerdicts(pages, rules, "graftbot").collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(!got("http://w.example/docs/report.pdf"))
    assert(got("http://w.example/docs/report.pdfx"))
    assert(!got("http://w.example/a+b/file"))
    assert(got("http://w.example/ab/file"))
    assert(!got("http://w.example/middle-to-end"))
    assert(got("http://w.example/midway"))
  }

  test("robotsVerdicts: a fragment never participates in matching — " +
      "including the path-less hash-routing URL (r13 review)") {
    import spark.implicits._
    val rules = Seq(
      ("h.example", "*", "group", ""),
      ("h.example", "*", "disallow", "/admin"))
      .toDF("host", "agent", "rule", "prefix")
    val pages = Seq(
      "http://h.example#/admin/x",   // path-less: path must be '/', allowed
      "http://h.example/p#/admin/x", // fragment on a real path: allowed
      "http://h.example/admin/x"     // the genuine disallow
    ).toDF("url")
    val got = WarcSource.robotsVerdicts(pages, rules, "graftbot")
      .collect().map(r => r.getString(0) -> ((r.getString(2), r.getBoolean(3))))
      .toMap
    assert(got("http://h.example#/admin/x") == (("/", true)))
    assert(got("http://h.example/p#/admin/x") == (("/p", true)))
    assert(got("http://h.example/admin/x") == (("/admin/x", false)))
  }

  test("robotsVerdicts: longest prefix wins and Allow wins a length tie") {
    import spark.implicits._
    val rules = Seq(
      ("e.example", "*", "disallow", "/p/"),
      ("e.example", "*", "allow", "/p/ok/"),      // longer: overrides
      ("e.example", "*", "disallow", "/t/ok"),    // equal length as next
      ("e.example", "*", "allow", "/t/ok"))       // tie -> allow wins
      .toDF("host", "agent", "rule", "prefix")
    val pages = Seq(
      "http://e.example/p/ok/page",  // allow /p/ok/ (len 6) beats /p/ (3)
      "http://e.example/p/other",    // disallow /p/
      "http://e.example/t/okay",     // tie at /t/ok -> allowed
      "http://e.example/",           // no match -> allowed
      "http://f.example/anything")   // host without rules -> allowed
      .toDF("url")
    val got = WarcSource.robotsVerdicts(pages, rules, "graftbot")
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(3), r.getString(4)))).toMap
    assert(got("http://e.example/p/ok/page") == ((true, "/p/ok/")))
    assert(got("http://e.example/p/other") == ((false, "/p/")))
    assert(got("http://e.example/t/okay") == ((true, "/t/ok")))
    assert(got("http://e.example/") == ((true, "")))
    assert(got("http://f.example/anything") == ((true, "")))
  }

  test("robotsGateStage (streaming) keeps exactly the batch robots_gate " +
      "allow set over the fixture") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val fixtureDocs = WarcSource.robotsGate(spark, "ignored")
    val batchAllow = fixtureDocs.collect()
      .filter(_.getBoolean(3)).map(_.getString(0)).toSet
    val batchAll = fixtureDocs.collect().map(_.getString(0)).toSet
    val rules = WarcSource.robotsRules(spark, "ignored")
    val ruleSets = graft.streaming.DocsStream
      .robotsRuleSets(rules, WarcSource.RobotsAgent)
    val input = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.DocsStream.robotsGateStage(
      input.toDF().toDF("doc_id", "url"), ruleSets)
      .writeStream.format("memory").queryName("robotsgate")
      .outputMode("append").start()
    input.addData(batchAll.toSeq.sorted.zipWithIndex
      .map { case (u, i) => (i.toLong, u) }: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("robotsgate").collect()
      .map(_.getAs[String]("url")).toSet
    assert(streamed == batchAllow,
      s"stream keep set $streamed != batch allow set $batchAllow")
  }

  test("robots_gate fixture verdicts: the group-selection trap holds") {
    val got = WarcSource.robotsGate(spark, "ignored").collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    // graftbot's specific group REPLACES '*' on a.example: /private/x is
    // allowed for graftbot even though '*' disallows it
    assert(got("http://a.example/private/x"))
    assert(!got("http://a.example/graft-only/secret"))
    assert(!got("http://a.example/files/x.zip")) // wildcard+anchor rule
    assert(got("http://d.example/page")) // no '*' fallback group
  }

  test("sitemapUrls: root-tag gate, <url\\b boundary, loc requirement and " +
      "whitespace/entity normalization") {
    import spark.implicits._
    val docs = Seq(
      ("http://s.example/m.xml",
        "<urlset><url><loc> http://s.example/a&amp;b </loc></url>" +
          "<url><priority>0.5</priority></url></urlset>"),
      // literal <url> text without a sitemap root: not a sitemap
      ("http://s.example/page", "see the <url><loc>http://x/</loc></url> tag")
    ).toDF("url", "text")
    val got = WarcSource.sitemapUrls(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("http://s.example/m.xml", "url",
      "http://s.example/a&b")))
  }

  test("crawlFrontier precedence: blocked beats disallowed beats fetched") {
    import spark.implicits._
    val seeds = Seq(
      "http://tracker.example/x", // blocklisted AND robots-disallowed
      "http://h.example/x",       // disallowed AND already fetched
      "http://h.example/ok"       // fetched only
    ).toDF("loc")
    val rules = Seq(
      ("tracker.example", "*", "group", ""),
      ("tracker.example", "*", "disallow", "/"),
      ("h.example", "*", "group", ""),
      ("h.example", "*", "disallow", "/x"))
      .toDF("host", "agent", "rule", "prefix")
    val fetched = Seq("http://h.example/x", "http://h.example/ok")
      .toDF("url")
    val got = WarcSource.crawlFrontier(seeds, rules, fetched, "graftbot")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got == Map(
      "http://tracker.example/x" -> "blocked",
      "http://h.example/x" -> "disallowed",
      "http://h.example/ok" -> "fetched"))
  }

  test("WET conformance: documentsFromWet text equals the WARC-derived " +
      "htmlExtract text URL-for-URL; the warcinfo preamble is dropped") {
    val wet = WarcSource.documentsFromWet(spark, WarcSource.FixtureWetDir)
      .select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val fromWarc = WarcSource.htmlExtract(
      WarcSource.documentsFromWarc(spark, WarcSource.FixtureHtmlDir))
      .select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // the two fixtures describe the same five pages: a WET consumer and a
    // WARC consumer running the extraction stage get the same corpus
    assert(wet == fromWarc, s"wet=$wet warc=$fromWarc")
    // no warcinfo row leaked in (5 pages exactly)
    assert(wet.size == 5)
  }

  test("WAT conformance: wat_outlinks equals the html_links rows of the " +
      "same pages; page meta pins status/title/link-count typing") {
    val fromWat = WarcSource.watOutlinks(spark, "ignored").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val fromWarc = WarcSource.htmlLinksQ(spark, "ignored").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(fromWat == fromWarc, s"wat=$fromWat warc=$fromWarc")
    val meta = WarcSource.watPageMeta(spark, "ignored").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4))).toMap
    assert(meta("http://hub.example/start") == ((200L, "text/html", "", 4L)))
    assert(meta("http://squote.example/s") ==
      ((404L, "text/html", "Not Found", 0L)))
    assert(meta("http://upper.example/g") ==
      ((200L, "text/html", "Upper Gamma", 1L)))
  }
}
