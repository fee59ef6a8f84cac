package graft

import graft.operators.Curation

/** fix_mojibake (§2 #25k-d): round-trip property against an independent
  * in-test sloppy-CP1252 corrupter, the pinned abort conditions, and the
  * repair-once fixpoint behavior. */
class MojibakeSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent mojibake generator: UTF-8 bytes read back as CP1252
    * where defined, pass-through C1 controls elsewhere — written from the
    * CP1252 code chart here, not from the operator's table. */
  private val Cp1252: Map[Int, Char] = Map(
    0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„', 0x85 -> '…',
    0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ', 0x89 -> '‰', 0x8a -> 'Š',
    0x8b -> '‹', 0x8c -> 'Œ', 0x8e -> 'Ž', 0x91 -> '‘',
    0x92 -> '’', 0x93 -> '“', 0x94 -> '”', 0x95 -> '•',
    0x96 -> '–', 0x97 -> '—', 0x98 -> '˜', 0x99 -> '™', 0x9a -> 'š',
    0x9b -> '›', 0x9c -> 'œ', 0x9e -> 'ž', 0x9f -> 'Ÿ')
  private def corrupt(clean: String): String =
    clean.getBytes("UTF-8").map { b =>
      val u = b & 0xff
      Cp1252.getOrElse(u, u.toChar)
    }.mkString

  private def repairAll(texts: Seq[String]): Seq[(Long, String)] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (flag, out) = Curation.mojibakeRepairCols(org.apache.spark.sql
      .functions.col("text"))
    df.select($"doc_id", flag.as("f"), out.as("o")).collect()
      .sortBy(_.getLong(0)).map(r => (r.getLong(1), r.getString(2))).toSeq
  }

  test("round-trip: corrupt(clean) repairs back to clean for BMP text") {
    val cleans = Seq(
      "Café résumé déjà vu",
      "“curly quotes” and – dashes — everywhere…",
      "€42 • naïve • Škoda • œuvre",
      "mixed ascii and é at the end é",
      "ü ö ä ß ñ ç ¿ ¡",
      "ελληνικά and русский",  // 2-byte scripts
      "中文 and 한국어",          // 3-byte scripts
    )
    val got = repairAll(cleans.map(corrupt))
    cleans.zip(got).foreach { case (clean, (flag, out)) =>
      assert(flag == 1L && out == clean, s"failed for: $clean")
    }
  }

  test("pinned aborts: bare marker, mixed CJK+mojibake, clean text") {
    val texts = Seq(
      "Ã alone is not mojibake",       // lead byte, no continuation
      corrupt("naïve") + " 中文",       // not byte-representable
      "plain ascii",                   // no trigger
      "中文文档")                       // no trigger, non-Latin
    val got = repairAll(texts)
    texts.zip(got).foreach { case (t, (flag, out)) =>
      assert(flag == 0L && out == t, s"should not repair: $t")
    }
  }

  test("repair runs once: triple-encoded text needs two passes") {
    val clean = "été"
    val twice = corrupt(corrupt(clean))
    val Seq((f1, once)) = repairAll(Seq(twice))
    assert(f1 == 1L && once == corrupt(clean))
    val Seq((f2, fin)) = repairAll(Seq(once))
    assert(f2 == 1L && fin == clean)
  }

  test("idempotence: repaired output no longer triggers") {
    val Seq((_, out)) = repairAll(Seq(corrupt("Café “test” €")))
    val Seq((f2, out2)) = repairAll(Seq(out))
    assert(f2 == 0L && out2 == out)
  }

  test("fixMojibakeStage swaps text in place and flags the row") {
    val d = writeDocsFixture(Seq(1L -> corrupt("déjà"), 2L -> "clean"))
    val got = Curation.fixMojibakeStage(
      spark.read.parquet(s"$d/documents.parquet"))
      .select($"doc_id", $"text", $"mojibake_repaired").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("déjà", 1L)))
    assert(got(2L) == (("clean", 0L)))
  }

  test("overlong and surrogate byte sequences are rejected as invalid") {
    // Each input leads with the valid mojibake pair C2 A0 (also the
    // trigger), then appends bytes a lenient decoder would mangle: the
    // classic overlong '/' (C0 AF) and an encoded surrogate (ED A0 80).
    // RFC 3629 rejects both, so the whole string must survive untouched.
    val lead = "\u00C2\u00A0"
    val overlong = lead + " \u00C0\u00AF"
    val surrogate = lead + " \u00ED\u00A0\u0080"
    val got = repairAll(Seq(overlong, surrogate, lead))
    assert(got(0) == ((0L, overlong)))
    assert(got(1) == ((0L, surrogate)))
    assert(got(2) == ((1L, "\u00A0"))) // same lead bytes, valid alone
  }
}
