package graft

import org.apache.spark.sql.functions.col
import graft.functions.TextFns

/** Regression fixtures in genuine Project Gutenberg shapes (the formats
  * mapphase/split.go:90-116 targets): the modern `*** START/END OF THE
  * PROJECT GUTENBERG EBOOK … ***` frame, the older `End of the Project
  * Gutenberg EBook` footer (footer pattern 1 wins over pattern 2), and a
  * marker-free text (identity). Pins the regex fidelity against real
  * header/footer layouts rather than synthetic strings. */
class GutenbergFixtureSpec extends SparkTestBase {

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/gutenberg/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def strip(text: String): String = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(TextFns.stripGutenberg(col("text")).as("s"))
      .collect().head.getString(0)
  }

  test("modern *** frame: header gone, footer-2 strips license tail") {
    val out = strip(fixture("modern_ebook.txt"))
    assert(out ==
      "Chapter One.\nIt was a bright morning and the garden gate stood open.\n")
  }

  test("older layout: 'End of the Project Gutenberg EBook' footer wins") {
    val out = strip(fixture("old_ebook.txt"))
    assert(out == "\nOnce upon a time there stood a mill beside the river.\n\n")
  }

  test("text without markers passes through unchanged") {
    val raw = fixture("plain.txt")
    assert(strip(raw) == raw)
  }

  test("no fixture leaks header/footer text into the stripped body") {
    // cross-engine parity for the strip itself is covered corpus-wide by
    // the strip_gutenberg oracle row (md5 comparison); this pins that no
    // marker text survives on real header/footer layouts
    val stripped =
      Seq("modern_ebook.txt", "old_ebook.txt", "plain.txt").map(n => strip(fixture(n)))
    assert(stripped.forall(s => !s.contains("PROJECT GUTENBERG EBOOK")))
    assert(stripped.forall(s => !s.contains("End of the Project Gutenberg")))
  }
}
