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
      record("response", "http://a.example/trap", http(trapBody))
    java.nio.file.Files.write(d.resolve("part1.warc"), warc)
    // same records again, gzipped (multi-record single member)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record("response", "http://b.example/y", http("gzipped page")))
    gz.close()
    java.nio.file.Files.write(d.resolve("part2.warc.gz"), bos.toByteArray)
    d.toString
  }

  test("warc records are Content-Length framed, not marker split") {
    val rows = WarcSource.readWarc(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(3), new String(r.getAs[Array[Byte]](4), "UTF-8")))
    assert(rows.length == 4) // 1 request + 3 responses; no phantom "fake" record
    assert(!rows.exists(_._2 == "fake"))
    val trap = rows.find(_._1 == "http://a.example/trap").get
    assert(trap._3.contains("WARC/1.0")) // the marker stayed INSIDE the body
    assert(rows.count(_._2 == "response") == 3)
    assert(rows.exists(_._1 == "http://b.example/y")) // the gzipped file parsed
  }

  test("documentsFromWarc keeps responses, strips HTTP headers, hashes doc ids") {
    val docs = WarcSource.documentsFromWarc(spark, dir).collect()
      .map(r => r.getString(1) -> (r.getLong(0), r.getString(3))).toMap
    assert(docs.size == 3)
    assert(docs("http://a.example/x")._2 == "hello <b>world</b>")
    assert(docs("http://b.example/y")._2 == "gzipped page")
    assert(!docs("http://a.example/trap")._2.contains("HTTP/1.1")) // headers gone
    // doc_id is the shared 60-bit md5 of the url — deterministic and distinct
    assert(docs.values.map(_._1).toSet.size == 3)
  }
}
