package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC ingestion — the container format web-scale training corpora
  * actually arrive in (Common Crawl publishes WARC/1.x; the format is the
  * public ISO 28500 spec). A WARC file is a concatenation of records:
  *
  * {{{
  *   WARC/1.0\r\n
  *   <header lines: Name: value>\r\n
  *   \r\n
  *   <exactly Content-Length bytes of block>\r\n\r\n
  * }}}
  *
  * Records MUST be framed by Content-Length — a payload can legally contain
  * the literal bytes "WARC/1.0", so marker-splitting (a declarative
  * split()) silently corrupts records; this is the genuine per-file
  * imperative-parse case, run as a flatMap over the binaryFile source.
  *
  * Scale: the file index fans out exactly like [[GutenbergSource]]
  * (one task per file group; `.warc.gz` members are read through the
  * multi-member-aware JDK GZIPInputStream, so whole compressed files stay
  * single-task — the same non-splittable-gzip rule every WARC consumer
  * lives with; Common Crawl files are sized ~1 GB for this reason).
  * Everything after the parse is an ordinary DataFrame.
  */
object WarcSource {

  private val Gzip = Array[Byte](0x1f.toByte, 0x8b.toByte)

  private def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  /** Parse one WARC file's bytes into (url, date, warcType, block) records.
    * Content-Length-framed; malformed trailing bytes end the walk rather
    * than throwing (a truncated tail record is dropped, matching how WARC
    * readers treat mid-record EOF). */
  private[sources] def parseWarc(raw: Array[Byte]): Seq[(String, String, String, Array[Byte])] = {
    val bytes =
      if (raw.length >= 2 && raw(0) == Gzip(0) && raw(1) == Gzip(1)) gunzip(raw)
      else raw
    val out = Seq.newBuilder[(String, String, String, Array[Byte])]
    var off = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      i
    }
    while (off < bytes.length) {
      // seek the version line (skips inter-record CRLFs)
      val e0 = lineEnd(off)
      if (e0 + 1 >= bytes.length) { off = bytes.length }
      else {
        val version = new String(bytes, off, e0 - off, java.nio.charset.StandardCharsets.ISO_8859_1)
        if (!version.startsWith("WARC/")) { off = e0 + 2 }
        else {
          // header lines until the empty line
          var p = e0 + 2
          var url = ""; var date = ""; var wtype = ""; var clen = -1L
          var done = false
          while (!done && p < bytes.length) {
            val e = lineEnd(p)
            val line = new String(bytes, p, e - p, java.nio.charset.StandardCharsets.ISO_8859_1)
            p = e + 2
            if (line.isEmpty) done = true
            else {
              val i = line.indexOf(':')
              if (i > 0) {
                val k = line.substring(0, i).trim.toLowerCase
                val v = line.substring(i + 1).trim
                k match {
                  case "warc-target-uri" => url = v
                  case "warc-date" => date = v
                  case "warc-type" => wtype = v
                  case "content-length" =>
                    clen = try v.toLong catch { case _: NumberFormatException => -1L }
                  case _ =>
                }
              }
            }
          }
          if (!done || clen < 0 || p + clen > bytes.length) { off = bytes.length } // truncated tail
          else {
            out += ((url, date, wtype,
              java.util.Arrays.copyOfRange(bytes, p, (p + clen).toInt)))
            off = (p + clen).toInt // the record-separating CRLFs are skipped above
          }
        }
      }
    }
    out.result()
  }

  /** One row per WARC record: (path, url, warc_date, warc_type, block). */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, c) =>
        parseWarc(c).map { case (u, d, t, b) => (p, u, d, t, b) }
      }
      .toDF("path", "url", "warc_date", "warc_type", "block")
  }

  /** Response records → a `documents`-shaped frame: the HTTP header block
    * is dropped (everything through the first CRLFCRLF), the body decoded
    * as UTF-8 with replacement, doc_id = the shared 60-bit md5 of the URL.
    * From here the whole curation/dedup/analysis surface applies. */
  def documentsFromWarc(spark: SparkSession, path: String): DataFrame =
    readWarc(spark, path)
      .where(col("warc_type") === "response")
      .select(
        graft.functions.TextFns.md5Long(col("url")).as("doc_id"),
        col("url"),
        col("warc_date"),
        // body = block after the HTTP headers; decode() with a non-binary
        // charset replaces malformed bytes rather than failing mid-corpus
        regexp_replace(decode(col("block"), "UTF-8"),
          "(?s)^.*?\r\n\r\n", "").as("text"))
}
