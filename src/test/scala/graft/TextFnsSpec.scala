package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns._

/** Ports of the reference unit tests:
  * mapphase/map_test.go:139-181 (preprocess/trim) and
  * mapphase/split_test.go:237-262 (header/footer strip). */
class TextFnsSpec extends SparkTestBase {
  import spark.implicits._

  private def preProcess(word: String): String = {
    val out = Seq(word).toDF("w")
      .select(trimNonAlpha(lower(col("w"))).as("w"))
      .select(when(isCleanWord(col("w")), col("w")).otherwise(lit("")).as("w"))
      .as[String].collect()
    out.head
  }

  // TestProcessText: "teststring." → "teststring"
  test("preprocess strips trailing punctuation") {
    assert(preProcess("teststring.") == "teststring")
  }

  // TestProcessTextNumber: "test1string" → ""
  test("preprocess drops words with interior non-letters") {
    assert(preProcess("test1string") == "")
  }

  // TestProcessTextStopWord: "would've" → ""
  test("preprocess drops stopwords") {
    assert(preProcess("would've") == "")
    assert(preProcess("the") == "")
    assert(preProcess("a") == "")
  }

  // TestTrimNonAlphabetic: keeps unicode letters, strips punct both ends
  test("trim keeps unicode letters") {
    val out = Seq(";'.[]/,'][çteststringç];/];];/'").toDF("w")
      .select(trimNonAlpha(col("w")).as("w")).as[String].collect()
    assert(out.head == "çteststringç")
  }

  test("trim of all-punctuation yields empty (then dropped)") {
    assert(preProcess(";;;") == "")
  }

  // mapphase/map.go:66-71 — sorted-letter signature
  test("anagram signature sorts letters") {
    val out = Seq("quick", "brown", "fox", "care", "race")
      .toDF("w").select(signature(col("w")).as("s")).as[String].collect()
    assert(out.toSeq == Seq("cikqu", "bnorw", "fox", "acer", "acer"))
  }

  // split_test.go:237-248
  test("strip removes Gutenberg header and *** END footer") {
    val in = "#SOME BOOK HEADER# *** START OF THIS PROJECT GUTENBERG EBOOK SOME TITLE *** The quick brown fox jumps over the lazy dog.\n*** END OF THE PROJECT GUTENBERG EBOOK SOME TITLE *** #SOME BOOK FOOTER#"
    val out = Seq(in).toDF("t").select(stripGutenberg(col("t")).as("t")).as[String].collect()
    assert(out.head == "The quick brown fox jumps over the lazy dog.\n")
  }

  // split_test.go:250-262 — "End of Project Gutenberg's" footer wins
  test("strip removes alternative End-of footer") {
    val in = "#SOME BOOK HEADER# *** START OF THIS PROJECT GUTENBERG EBOOK SOME TITLE *** The quick brown fox jumps over the lazy dog.\nEnd of Project Gutenberg's Some Title, by Some Author\n*** END OF THE PROJECT GUTENBERG EBOOK SOME TITLE *** #SOME BOOK FOOTER#"
    val out = Seq(in).toDF("t").select(stripGutenberg(col("t")).as("t")).as[String].collect()
    assert(out.head == "The quick brown fox jumps over the lazy dog.\n")
  }

  test("strip is identity without header/footer") {
    val in = "plain text with no markers at all"
    val out = Seq(in).toDF("t").select(stripGutenberg(col("t")).as("t")).as[String].collect()
    assert(out.head == in)
  }

  test("md5Long matches an independent md5 computation") {
    val out = Seq("abc").toDF("w").select(md5Long(col("w")).as("h")).as[Long].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("abc".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.head == java.lang.Long.parseLong(hex.take(15), 16))
  }
}
