package graft

/** End-to-end pipeline: curation gates feed the batch-prep stages through
  * a re-corpused directory, so downstream artifacts cover exactly the
  * survivor set. */
class CurationPipelineSpec extends SparkTestBase {

  test("pipeline artifacts cover exactly the curated survivor set") {
    val sf = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    val manifest = CurationPipeline.run(spark, sf, out)

    val curated = graft.operators.Curation.curatedCorpus(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(manifest("curated_docs") == curated.size)
    assert(manifest("curated_docs") < manifest("raw_docs")) // gates really cut

    // every downstream artifact is over the survivors, nothing else
    val ordered = spark.read.parquet(s"$out/order")
      .collect().map(_.getLong(0)).toSet
    assert(ordered == curated) // the epoch shuffle is a permutation of them
    val packedDocs = spark.read.parquet(s"$out/packed")
      .collect().map(_.getLong(0)).toSet
    assert(packedDocs.subsetOf(curated)) // token-less docs may drop
    val chunkDocs = spark.read.parquet(s"$out/chunks")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(chunkDocs.subsetOf(curated))

    // pack_report totals agree with the packed placements
    val packTotal = spark.read.parquet(s"$out/packed")
      .groupBy().sum("n_tokens").collect().head.getLong(0)
    val reportTotal = spark.read.parquet(s"$out/pack_report")
      .groupBy().sum("total_tokens").collect().head.getLong(0)
    assert(packTotal == reportTotal)

    // manifest.json on disk mirrors the returned counts
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/manifest.json"))
    manifest.foreach { case (k, v) => assert(txt.contains(s""""$k":$v""")) }
  }

  test("c4 stage drops condemned docs and filters lines before the trim") {
    // all three docs clear the quality/lang/dedup gates; only the C4
    // content rules tell them apart — 25+ non-stopword tokens each, no
    // cross-doc duplication, ids above the contamination probe range
    val docA = (1 to 30).map(i =>
      s"alpha beta gamma delta epsilon zeta line$i stands tall.").mkString("\n")
    val docB = (1 to 30).map(i =>
      s"plain word$i list without punctuation").mkString("\n") // 0 kept lines
    val goodC = (1 to 5).map(i => s"solid unique sentence number $i reads fine.")
    val docC = (goodC ++ Seq("please accept cookie banners.", "short.",
      "no punct here")).mkString("\n")
    val dir = writeDocsFixture(Seq(1000L -> docA, 1001L -> docB, 1002L -> docC))

    val out0 = java.nio.file.Files.createTempDirectory("graft-c4-off").toString
    val m0 = CurationPipeline.run(spark, dir, out0, c4Rules = false)
    assert(m0("curated_docs") == 3) // without C4 all three survive

    val out1 = java.nio.file.Files.createTempDirectory("graft-c4-on").toString
    val m1 = CurationPipeline.run(spark, dir, out1, c4Rules = true)
    assert(m1("curated_docs") == 2) // docB: no line survives → few_sentences
    val corpus = spark.read.parquet(s"$out1/corpus/documents.parquet")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    assert(corpus.keySet == Set(1000L, 1002L))
    assert(corpus(1000L) == docA) // every line passes, all distinct
    assert(corpus(1002L) == goodC.mkString("\n")) // junk lines filtered out
  }

  test("warc -> documents -> curate runs the raw-crawl path end-to-end") {
    // a tiny crawl: one long English page that clears the quality/lang
    // gates, one short low-quality page, one header-only empty response
    def record(wtype: String, url: String, block: Array[Byte]): Array[Byte] =
      ((s"WARC/1.0\r\nWARC-Type: $wtype\r\nWARC-Target-URI: $url\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n").getBytes("ISO-8859-1")
        ++ block ++ "\r\n\r\n".getBytes("ISO-8859-1"))
    def http(body: String): Array[Byte] =
      ("HTTP/1.1 200 OK\r\n\r\n" + body).getBytes("UTF-8")
    // newline-separated SENTENCES: the crawl path now runs the C4 content
    // rules by default, so the good page must clear them too (terminal
    // punctuation, >=3 words/line, >=5 sentences) on top of quality/lang
    val good = Iterator.tabulate(60)(i =>
      s"the quick brown fox jumps over word$i dog.").mkString("\n")
    val warcDir = java.nio.file.Files.createTempDirectory("graft-warc-e2e")
    java.nio.file.Files.write(warcDir.resolve("crawl.warc"),
      record("response", "http://good.example/page", http(good)) ++
        record("response", "http://junk.example/x", http("zzz qqq")) ++
        record("response", "http://empty.example/nil",
          "HTTP/1.1 204 No Content\r\n\r\n".getBytes("UTF-8")))

    val out = java.nio.file.Files.createTempDirectory("graft-pipe-warc").toString
    val manifest = CurationPipeline.runFromWarc(spark, warcDir.toString, out)
    assert(manifest("raw_docs") == 3)
    assert(manifest("curated_docs") == 1) // only the long English page survives
    // the artifact tree exists and covers the survivor
    val corpus = spark.read.parquet(s"$out/corpus/documents.parquet").collect()
    assert(corpus.map(_.getAs[String]("source")).toSet == Set("good.example"))
    assert(spark.read.parquet(s"$out/order").count() == 1)
    assert(spark.read.parquet(s"$out/chunks").count() >= 1)
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/manifest.json"))
    manifest.foreach { case (k, v) => assert(txt.contains(s""""$k":$v""")) }
    // archive-out: exactly the survivor set, re-readable through the WARC
    // reader, typed `conversion`, with the original capture url preserved
    assert(manifest("archived_docs") == 1)
    val arch = graft.sources.WarcSource.readWarc(spark, s"$out/archive")
      .collect()
    assert(arch.length == 1)
    assert(arch.head.getAs[String]("warc_type") == "conversion")
    assert(arch.head.getAs[String]("url").contains("good.example"))
    assert(new String(arch.head.getAs[Array[Byte]]("block"), "UTF-8")
      == corpus.head.getAs[String]("text"))
  }

  test("wet -> documents -> curate runs the pre-extracted path end-to-end") {
    // WET twin of the crawl e2e: conversion records whose block IS the
    // text (no HTTP headers), a warcinfo preamble the type filter drops,
    // and a blocklisted host the url gate removes before curation
    def record(wtype: String, url: String, body: String): Array[Byte] = {
      val block = body.getBytes("UTF-8")
      ((s"WARC/1.0\r\nWARC-Type: $wtype\r\n" +
        (if (url == null) "" else s"WARC-Target-URI: $url\r\n") +
        s"Content-Length: ${block.length}\r\n\r\n").getBytes("ISO-8859-1")
        ++ block ++ "\r\n\r\n".getBytes("ISO-8859-1"))
    }
    val good = Iterator.tabulate(60)(i =>
      s"the quick brown fox jumps over word$i dog.").mkString("\n")
    val wetDir = java.nio.file.Files.createTempDirectory("graft-wet-e2e")
    java.nio.file.Files.write(wetDir.resolve("crawl.warc.wet"),
      record("warcinfo", null, "software: spec") ++
        record("conversion", "http://good.example/page", good) ++
        record("conversion", "http://junk.example/x", "zzz qqq") ++
        record("conversion", "http://tracker.example/lp", good))
    val out = java.nio.file.Files.createTempDirectory("graft-pipe-wet").toString
    val manifest = CurationPipeline.runFromWet(spark, wetDir.toString, out)
    // 2 raw docs: warcinfo dropped by the type filter, tracker.example
    // dropped by the blocklist BEFORE the raw corpus is written
    assert(manifest("raw_docs") == 2)
    assert(manifest("curated_docs") == 1)
    val corpus = spark.read.parquet(s"$out/corpus/documents.parquet").collect()
    assert(corpus.map(_.getAs[String]("source")).toSet == Set("good.example"))
    assert(corpus.head.getAs[String]("text") == good)
  }
}
