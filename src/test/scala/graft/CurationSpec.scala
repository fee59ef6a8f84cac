package graft

import graft.operators.{Curation, TextAnalysis}
import org.apache.spark.sql.graft.{CharEntropy, Simhash60}
import org.apache.spark.unsafe.types.UTF8String

class CurationSpec extends SparkTestBase {

  // 25 tokens → 2 segments of SegLen=20 (one full + one 5-token tail)
  private val para = (1 to 25).map(i => s"w$i").mkString(" ")
  private lazy val dir = writeDocsFixture(Seq(
    1L -> para,
    2L -> para, // both of doc 2's segments duplicate doc 1's
    3L -> ((1 to 20).map(i => s"w$i").mkString(" ") + " unique tail words here now"),
    4L -> "totally different short text",
  ))

  test("segment dedup counts corpus-duplicated segments per doc") {
    val rows = Curation.dedupSegments(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(1L) == ((2L, 2L))) // both segments shared with docs 2/3
    assert(rows(2L) == ((2L, 2L)))
    assert(rows(3L) == ((2L, 1L))) // first 20 tokens shared, tail unique
    assert(rows(4L) == ((1L, 0L))) // nothing duplicated
  }

  test("segment trimming rebuilds docs without corpus-duplicated segments") {
    val rows = Curation.trimSegments(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows(1L) == ((2L, 2L, ""))) // everything boilerplate → empty
    assert(rows(2L) == ((2L, 2L, "")))
    assert(rows(3L) == ((2L, 1L, "unique tail words here now")))
    assert(rows(4L) == ((1L, 0L, "totally different short text")))
  }

  test("trim_repeated_lines keeps exactly each doc's first line occurrences") {
    val sf = "/root/testdata/sf0.001"
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map { r =>
        val lines = r.getString(1).split("\n", -1)
        val seen = scala.collection.mutable.HashSet.empty[String]
        val kept = lines.filter(seen.add)
        Seq[Any](r.getLong(0), lines.length.toLong,
          (lines.length - kept.length).toLong, kept.mkString("\n"))
      }.toSet
    assert(collectSet(Curation.trimRepeatedLines(spark, sf)) == expected)
  }

  test("trim_repeated_lines adversarial docs: all-duplicate, all-blank, interleaved") {
    val d = writeDocsFixture(Seq(
      1L -> "a\na\na\na", // all lines identical: one survives
      2L -> "\n\n\n", // four empty lines: blank separators collapse to one
      3L -> "solo", // nothing to trim
      4L -> "x\ny\nx\ny\nz")) // interleaved repeats: order of firsts kept
    val got = Curation.trimRepeatedLines(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((4L, 3L, "a")))
    assert(got(2L) == ((4L, 3L, "")))
    assert(got(3L) == ((1L, 0L, "solo")))
    assert(got(4L) == ((5L, 2L, "x\ny\nz")))
  }

  test("trim_common_lines drops corpus-common lines exactly at the threshold") {
    val d = writeDocsFixture(Seq(
      1L -> "shared\nunique one\nshared", // 'shared' corpus count = 3
      2L -> "shared\nunique two",
      3L -> "twice\nonly here", // 'twice' corpus count = 2: BELOW the cut
      4L -> "twice\nalso solo"))
    val got = Curation.trimCommonLines(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(Curation.CommonLineMin == 3L)
    assert(got(1L) == ((3L, 2L, "unique one"))) // both 'shared' copies drop
    assert(got(2L) == ((2L, 1L, "unique two")))
    assert(got(3L) == ((2L, 0L, "twice\nonly here"))) // 2 < 3: kept
    assert(got(4L) == ((2L, 0L, "twice\nalso solo")))
  }

  test("c4_line_filters discriminates rule by rule (hand-counted fixture)") {
    val goodFive = Seq(
      "Good sentence number one stands here.",
      "Good sentence number two stands here!",
      "Does sentence number three stand here?",
      "He said the fourth sentence \"now.\"",
      "Good sentence number five stands here.   ") // trailing ws: rtrim keeps it
    val doc1 = goodFive.mkString("\n") // clean: everything kept
    val doc2 = (Seq(
      "No terminal punctuation here", // rule (a)
      "Too short.", // rule (b): 2 words
      "This line mentions javascript heavily today.", // rule (c)
      "Please accept our cookie settings now.", // rule (c)
      "We updated our privacy policy yesterday.", // rule (c)
      "Read the terms of use first.") ++ goodFive).mkString("\n")
    val doc3 = Seq( // doc rule precedence: lorem_ipsum beats brace AND few_sentences
      "Valid sentence here it is.",
      "We love Lorem Ipsum dearly.", // case-insensitive doc gate
      "Brace { also appears here.").mkString("\n")
    val doc4 = ("This config uses { braces } heavily." +: goodFive).mkString("\n")
    val doc5 = goodFive.take(4).mkString("\n") // 4 sentences: one short of the gate
    val doc6 = "One. Two. Three. Four. Five." // 5 sentences on a single line
    val d = writeDocsFixture(Seq(1L -> doc1, 2L -> doc2, 3L -> doc3,
      4L -> doc4, 5L -> doc5, 6L -> doc6))
    val got = Curation.c4LineFilters(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(Curation.C4MinSentences == 5 && Curation.C4MinLineWords == 3)
    assert(got(1L) == ((5L, 5L, 5L, "", doc1)))
    assert(got(2L) == ((11L, 5L, 5L, "", goodFive.mkString("\n"))))
    assert(got(3L) == ((3L, 3L, 3L, "lorem_ipsum", "")))
    assert(got(4L) == ((6L, 6L, 6L, "brace", "")))
    assert(got(5L) == ((4L, 4L, 4L, "few_sentences", "")))
    assert(got(6L) == ((1L, 1L, 5L, "", doc6)))
  }

  test("paragraph_repetition: blank paragraphs skipped, exact bp shares") {
    val d = writeDocsFixture(Seq(
      1L -> "aaa\n\nbbb\n\naaa", // one repeat of a 3-char paragraph
      2L -> "one para only",
      3L -> "x\n\n\n\ny", // empty split piece between the \n\n pair
      4L -> "p q\n\np q\n\np q", // all three the same
      5L -> "a\n\n   \n\nb", // whitespace-only paragraph is not a paragraph
      6L -> "", // no paragraphs at all: no row
      7L -> "dup\n\nlongerpara\n\ndup")) // top mass is the UNIQUE long one
    val got = Curation.paragraphRepetition(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(!got.contains(6L))
    assert(got(1L) == ((3L, 1L, 3333L, 3333L, 6666L)))
    assert(got(2L) == ((1L, 0L, 0L, 0L, 10000L)))
    assert(got(3L) == ((2L, 0L, 0L, 0L, 5000L)))
    assert(got(4L) == ((3L, 2L, 6666L, 6666L, 10000L)))
    assert(got(5L) == ((2L, 0L, 0L, 0L, 5000L)))
    // doc 7: chars = 3+3+10 = 16; dup chars = 3 → 1875; top = 10 → 6250
    assert(got(7L) == ((3L, 1L, 3333L, 1875L, 6250L)))
  }

  test("trim_common_paragraphs keeps exactly the corpus-first occurrence " +
      "of every paragraph, blanks included") {
    val d = writeDocsFixture(Seq(
      1L -> "shared\n\nunique one", // corpus-first 'shared': kept
      2L -> "prefix\n\nshared", // later 'shared': dropped
      3L -> "shared\n\nshared", // both occurrences later than doc 1's
      4L -> "solo only",
      5L -> "a\n\n\n\nb", // first blank paragraph in the corpus: kept
      6L -> "c\n\n\n\nd")) // its blank is a later occurrence: dropped
    val got = Curation.trimCommonParagraphs(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((2L, 0L, "shared\n\nunique one")))
    assert(got(2L) == ((2L, 1L, "prefix")))
    assert(got(3L) == ((2L, 2L, "")))
    assert(got(4L) == ((1L, 0L, "solo only")))
    assert(got(5L) == ((3L, 0L, "a\n\n\n\nb"))) // blank kept: rebuilt intact
    assert(got(6L) == ((3L, 1L, "c\n\nd"))) // blank dropped
  }

  test("gopher_repetition: exact top/dup n-gram char masses per grain") {
    val d = writeDocsFixture(Seq(
      1L -> "spam spam spam eggs", // 4 toks, 16 chars
      2L -> "a a a a")) // overlap-mass > 10000 by design (documented)
    val got = Curation.gopherRepetition(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 1, n=2: grams (spam spam)x2 glen 8, (spam eggs)x1 glen 8
    //   top = 2*8=16 -> 10000; dup = 16 -> 10000
    assert(got((1L, 2L)) == ((3L, 10000L, 10000L)))
    // n=3: two distinct grams of glen 12, each once -> top 12 -> 7500, dup 0
    assert(got((1L, 3L)) == ((2L, 7500L, 0L)))
    // n=4: one gram mass 16 -> 10000, dup 0
    assert(got((1L, 4L)) == ((1L, 10000L, 0L)))
    // n exceeding the doc's token count emits no row
    assert(!got.contains((1L, 5L)))
    // doc 2 (4 chars), n=2: (a a)x3 glen 2 -> mass 6 -> 15000 (overlap > 1)
    assert(got((2L, 2L)) == ((3L, 15000L, 15000L)))
    // doc 2, n=3: (a a a)x2 glen 3 -> mass 6 -> 15000
    assert(got((2L, 3L)) == ((2L, 15000L, 15000L)))
    // doc 2, n=4: single occurrence -> top 4/4 -> 10000, dup 0
    assert(got((2L, 4L)) == ((1L, 10000L, 0L)))
  }

  test("gopher_repetition_gate drops at the exact grain thresholds and " +
      "names the smallest violated grain") {
    assert(Curation.GopherRepMaxBp(2) == 2000L)
    val d = writeDocsFixture(Seq(
      // doc 1: clean long prose — all shares far below every threshold
      1L -> (1 to 40).map(i => s"w$i").mkString(" "),
      // doc 2: "spam spam spam eggs" tops n=2 at 10000 > 2000 AND n=4 at
      // 10000 > 1600 — worst_rule must be the SMALLEST grain (top_2gram)
      2L -> "spam spam spam eggs",
      // doc 3: single token — no n-gram rows at all, trivially kept
      3L -> "solo",
      // doc 4: dup-5-gram violation without a top-2..4 one: a 10-token
      // doc whose 5-gram repeats but whose 2-grams stay under 20%
      4L -> ((1 to 15).map(i => s"u$i") ++ (1 to 15).map(i => s"u$i")
        ++ (1 to 40).map(i => s"v$i")).mkString(" ")))
    val got = Curation.gopherRepetitionGate(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getString(3)))).toMap
    assert(got(1L) == ((0L, true, "")))
    assert(got(2L)._2 == false && got(2L)._3 == "top_2gram")
    assert(got(3L) == ((0L, true, "")))
    assert(got(4L)._2 == false && got(4L)._3.startsWith("dup_"))
    // doc 4 really is clean at the top-2..4 grains (the dup grains alone
    // condemned it)
    val rep4 = Curation.gopherRepetition(spark, d).collect()
      .filter(r => r.getLong(0) == 4L && r.getLong(1) <= 4)
    assert(rep4.forall(r =>
      r.getLong(3) <= Curation.GopherRepMaxBp(r.getLong(1).toInt)))
  }

  test("train_split assigns deterministic md5 splits at the e4 thresholds") {
    val sfDir = "/root/testdata/sf0.001"
    def md5Long(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map { r =>
        val id = r.getLong(0)
        val u = md5Long(s"$id\u0001split") % 10000L
        val split = if (u < Curation.SplitTrainBp) "train"
          else if (u < Curation.SplitValBp) "val" else "test"
        Seq[Any](id, r.getString(1), u, split)
      }.toSet
    val got = collectSet(Curation.trainSplit(spark, sfDir))
    assert(got == expected)
    val byS = got.groupBy(_(3)).map { case (k, v) => k -> v.size }
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS("train") > byS("val") && byS("train") > byS("test"))
  }

  test("split_balance shares reconcile with the oracled split assignment") {
    val sfDir = "/root/testdata/sf0.001"
    val split = Curation.trainSplit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val langs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (split(r.getLong(0)), r.getString(1)))
    val n = langs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val st = n.groupBy(_._1._1).map { case (sp, m) => sp -> m.values.sum }
    val lt = n.groupBy(_._1._2).map { case (l, m) => l -> m.values.sum }
    val tot = langs.length.toLong
    val expected = n.map { case ((sp, l), c) =>
      val ss = c * 10000L / st(sp); val cs = lt(l) * 10000L / tot
      Seq[Any](sp, l, c, ss, cs, ss - cs)
    }.toSet
    val got = collectSet(Curation.splitBalance(spark, sfDir))
    assert(got == expected)
    // the big split tracks the corpus mix tightly; every lang appears in train
    val train = got.filter(_(0) == "train")
    assert(train.size == lt.size)
    assert(train.forall(r => math.abs(r(5).asInstanceOf[Long]) < 500L))
  }

  test("contamination_report grades per-(doc, probe) overlap in exact bp") {
    // probes: docs 1,2 (identical text w1..w25 → the same 23 distinct
    // 3-grams). Doc 3 has 23 distinct grams, 18 of them (w1w2w3..w18w19w20)
    // shared with EACH probe; doc 4 shares none and must be absent.
    val got = collectSet(Curation.contaminationReport(spark, dir))
    val bp = 18L * 10000L / 23L // 7826
    assert(got == Set(
      Seq[Any](3L, 1L, 18L, 23L, bp),
      Seq[Any](3L, 2L, 18L, 23L, bp)))
  }

  test("decontaminate flags docs sharing k-grams with the probe docs") {
    // probe docs are doc_id < 3 → docs 1,2 (and the absent 0); doc 3 shares
    // the w1..w20 3-grams with them, doc 4 shares none
    val rows = Curation.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.contains(3L) && rows(3L) >= 18L)
    assert(!rows.contains(4L))
  }

  test("chunking emits overlapping ChunkLen windows every ChunkStride tokens") {
    // 40 tokens: 40 > 32 → 1 + ceil(8/24) = 2 chunks; second starts at 25
    val forty = (1 to 40).map(i => s"t$i").mkString(" ")
    val short = (1 to 10).map(i => s"s$i").mkString(" ")
    val d = writeDocsFixture(Seq(1L -> forty, 2L -> short))
    val rows = Curation.chunkDocuments(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows((1L, 0L)) == Curation.ChunkLen.toLong) // full first window
    assert(rows((1L, 1L)) == 16L) // tokens 25..40
    assert(rows((2L, 0L)) == 10L) // short doc: one partial chunk
    assert(rows.size == 3)
  }

  test("source report aggregates quality/entropy and dup membership per feed") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-srcq").toString
    val dupText = "the very same long sentence shared across two feeds entirely verbatim"
    Seq((1L, dupText, "srcA"), (2L, dupText, "srcB"),
        (3L, "unique words in this quiet source only here", "srcA"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = Curation.sourceQualityReport(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows("srcA")._1 == 2L && rows("srcB")._1 == 1L)
    assert(rows("srcA")._4 == 1L) // doc 1 is in the near-dup graph
    assert(rows("srcB")._4 == 1L) // doc 2 is its partner
    assert(rows.values.forall { case (_, q, e, _) => q > 0 && e > 0 })
  }

  test("doc_features agrees with the individual signal queries") {
    val d = writeDocsFixture(Seq(
      1L -> ("the and of to a in is it you that " + Seq.fill(45)("word").mkString(" ")),
      2L -> "le la les de et un une que est pour"))
    val feat = Curation.docFeatures(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    // signals match the standalone operators they fuse
    val q = TextAnalysis.qualityScore(spark, d).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("quality_bp")).toMap
    val lid = TextAnalysis.langId(spark, d).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("pred_lang")).toMap
    Seq(1L, 2L).foreach { id =>
      assert(feat(id).getAs[Long]("quality_bp") == q(id))
      assert(feat(id).getAs[String]("pred_lang") == lid(id))
    }
    assert(feat(1L).getAs[String]("pred_lang") == "en")
    assert(feat(2L).getAs[String]("pred_lang") == "fr")
    assert(feat(1L).getAs[Long]("ws_tokens") == 55L)
  }

  test("dup spans find the shared substring and its exact length") {
    val shared = "this exact sentence appears verbatim in two documents"
    val d = writeDocsFixture(Seq(
      1L -> (shared + " plus unique suffix alpha beta gamma delta epsilon"),
      2L -> ("totally different prefix material here and then " + shared),
      3L -> "no duplicated content in this one at all whatsoever truly"))
    val rows = Curation.dupSpanStats(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // the shared span is |shared| chars: runs of dup positions recover it
    // exactly (run = |shared| - SpanK + 1 → span = |shared|)
    assert(rows(1L)._3 == shared.length.toLong)
    assert(rows(2L)._3 == shared.length.toLong)
    assert(rows(3L) == ((rows(3L)._1, 0L, 0L))) // nothing duplicated
    assert(rows(1L)._2 == (shared.length - Curation.SpanK + 1).toLong)
  }

  test("exact dup spans verify candidates by substring, matching the spans") {
    val shared = "this exact sentence appears verbatim in two documents"
    val d = writeDocsFixture(Seq(
      1L -> (shared + " plus unique suffix alpha beta gamma delta epsilon"),
      2L -> ("totally different prefix material here and then " + shared),
      3L -> "no duplicated content in this one at all whatsoever truly"))
    val rows = Curation.dupSpanExact(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // same exact-span recovery as the hash operator on collision-free input
    assert(rows(1L)._3 == shared.length.toLong)
    assert(rows(2L)._3 == shared.length.toLong)
    assert(rows(3L) == ((rows(3L)._1, 0L, 0L)))
    assert(rows(1L)._2 == (shared.length - Curation.SpanK + 1).toLong)
    // and row-for-row agreement with the approximate operator here (the
    // two differ ONLY on a 60-bit hash collision)
    val approx = Curation.dupSpanStats(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows == approx)
  }

  test("char-class profile counts letters/digits/ws/symbols/upper exactly") {
    val d = writeDocsFixture(Seq(
      1L -> "AbC 12!", // 7 chars: 3 letters (1 upper... A,C upper=2), 2 digits, 1 ws, 1 symbol
      2L -> "aaaa"))
    val rows = Curation.charClassStats(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val (n, lb, db, wb, sb, ub) = rows(1L)
    assert(n == 7L)
    assert(lb == 3L * 10000 / 7) // A b C
    assert(db == 2L * 10000 / 7) // 1 2
    assert(wb == 1L * 10000 / 7) // the space
    assert(sb == 1L * 10000 / 7) // !
    assert(ub == 2L * 10000 / 7) // A C
    assert(rows(2L) == ((4L, 10000L, 0L, 0L, 0L, 0L)))
  }

  test("sequence packing tiles each bucket's token stream without gaps") {
    // docs sized to span sequences: 300 tokens crosses the 256 boundary
    val d = writeDocsFixture(Seq(
      1L -> (1 to 300).map(i => s"t$i").mkString(" "),
      2L -> (1 to 100).map(i => s"u$i").mkString(" "),
      3L -> (1 to 10).map(i => s"v$i").mkString(" ")))
    val rows = Curation.packSequences(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    val L = Curation.PackLen
    // per-bucket, docs tile the token stream contiguously in doc_id order
    rows.groupBy(_._2._1).foreach { case (_, docs) =>
      var cum = 0L
      docs.toSeq.sortBy(_._1).foreach { case (_, (_, n, sf, sl, off)) =>
        assert(sf == cum / L && off == cum % L) // starts where the prev ended
        cum += n
        assert(sl == (cum - 1) / L) // last token's sequence
      }
    }
    // the 300-token doc spans ≥ 2 sequences wherever it lands
    val (_, _, sf1, sl1, _) = rows(1L)
    assert(sl1 > sf1)
  }

  test("pack_stats reports exact sequence and padding counts per shard") {
    val d = writeDocsFixture(Seq(
      1L -> (1 to 300).map(i => s"t$i").mkString(" "),
      2L -> (1 to 100).map(i => s"u$i").mkString(" "),
      3L -> (1 to 10).map(i => s"v$i").mkString(" ")))
    val L = Curation.PackLen
    val rows = Curation.packStats(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // shards agree with packSequences' assignment; totals tile exactly
    val packed = Curation.packSequences(spark, d).collect()
      .map(r => (r.getLong(1), r.getLong(2))) // (bucket, n_tokens)
    val byBucket = packed.groupBy(_._1).view.mapValues(_.map(_._2).sum)
    assert(rows.keySet == byBucket.keySet.toSet)
    rows.foreach { case (b, (nDocs, total, nSeq, pad, padBp)) =>
      assert(total == byBucket(b))
      assert(nSeq == (total + L - 1) / L)
      assert(pad == nSeq * L - total)
      assert(padBp == pad * 10000 / (nSeq * L))
      assert(nDocs > 0)
    }
  }

  test("training order is a reproducible permutation with contiguous shard positions") {
    val d = writeDocsFixture((1L to 40L).map(i => i -> s"doc number $i"))
    val run1 = Curation.trainingOrder(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(run1.map(_._1).sorted.toSeq == (1L to 40L)) // every doc exactly once
    assert(run1.forall(t => t._2 >= 0 && t._2 < Curation.ShuffleShards))
    run1.groupBy(_._2).foreach { case (_, rows) =>      // 1..n inside each shard
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length))
    }
    val run2 = Curation.trainingOrder(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(run1.toSet == run2.toSet)                    // no RNG state: re-runs agree
    // salted md5 actually permutes: doc_id order and shard order differ
    val byPos = run1.sortBy(t => (t._2, t._3)).map(_._1).toSeq
    assert(byPos != byPos.sorted)
  }

  test("percentile gate keeps docs at or above the learned threshold") {
    // qualities: long stopword-free docs score 1.0; a tiny doc scores low
    val d = writeDocsFixture(Seq(
      1L -> Seq.fill(60)("alpha").mkString(" "),
      2L -> Seq.fill(55)("beta").mkString(" "),
      3L -> Seq.fill(50)("gamma").mkString(" "),
      4L -> "tiny"))
    val rows = Curation.qualityPercentileGate(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    // p25 of (10000, 10000, 10000, 200) bp = 2650 → doc 4 is cut, 1-3 kept
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows.values.forall { case (q, t) => q >= t })
    assert(rows(1L)._1 == 10000L)
  }

  test("gopher filters: token/length/alpha/stopword gates compose into keep") {
    val good = "the and " + Seq.fill(58)("word").mkString(" ") // 60 toks, 2 stops
    val short = "the and word"                                  // 3 toks
    val numeric = Seq.fill(60)("12345").mkString(" ")           // no letters
    val d = writeDocsFixture(Seq(1L -> good, 2L -> short, 3L -> numeric))
    val rows = Curation.gopherFilters(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val (n1, ml1, af1, sh1, keep1) = rows(1L)
    assert(n1 == 60L && ml1 > 30000L && ml1 < 100000L && af1 == 10000L
      && sh1 == 2L && keep1 == 1L)
    assert(rows(2L)._5 == 0L) // below the token floor
    val (_, _, af3, _, keep3) = rows(3L)
    assert(af3 == 0L && keep3 == 0L) // no alphabetic tokens
  }

  test("dup-ngram fraction counts corpus-duplicated 5-grams per doc") {
    val rows = Curation.dupNgramStats(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // docs 1 and 2 are identical 25-token texts: all 21 of each one's
    // 5-grams occur in the other
    assert(rows(1L) == ((21L, 21L)))
    assert(rows(2L) == ((21L, 21L)))
    // doc 3 shares w1..w20 with them: its grams at positions 1..16 sit
    // fully inside that prefix; the 5 tail grams are unique
    assert(rows(3L) == ((21L, 16L)))
    // doc 4 has 4 tokens — below the gram width, absent from the frame
    assert(!rows.contains(4L))
  }

  test("char entropy: zero for uniform text, 1 bit for 50/50, matches formula") {
    assert(CharEntropy.compute(UTF8String.fromString("aaaa")) == 0.0)
    assert(math.abs(CharEntropy.compute(UTF8String.fromString("abab")) - 1.0) < 1e-12)
    // direct formula check on a known mix: "aab" → H = log2(3) - (2*1)/3
    val h = CharEntropy.compute(UTF8String.fromString("aab"))
    val expected = (3 * (math.log(3) / math.log(2)) - 2 * 1.0) / 3
    assert(math.abs(h - expected) < 1e-12)
  }

  test("char_stats query returns per-doc stats with plausible entropy") {
    val rows = Curation.charStats(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val (n, d, e) = rows(4L) // "totally different short text"
    assert(n == 28L && d > 10L && e > 3.0 && e < 5.0)
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("curated corpus falls back to shuffle anti-joins above the broadcast cap") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val d = writeDocsFixture(Seq(
      1L -> "p1", 2L -> "p2", 3L -> "p3",
      10L -> ((1 to 60).map(i => s"the word$i is here").mkString(" "))))
    val viaBroadcast = Curation.curatedCorpus(spark, d).collect()
      .map(_.getLong(0)).toSet
    // cap -1: even an empty list is "over the cap", forcing both anti-joins
    // onto the shuffle path
    spark.conf.set("spark.graft.broadcastDocCap", "-1")
    try {
      val df = Curation.curatedCorpus(spark, d)
      val leftAntiBroadcasts = df.queryExecution.sparkPlan.collect {
        case j: BroadcastHashJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
      }
      assert(leftAntiBroadcasts.isEmpty, "anti-join must take the shuffle path")
      // same survivors either way
      assert(df.collect().map(_.getLong(0)).toSet == viaBroadcast)
    } finally spark.conf.unset("spark.graft.broadcastDocCap")
  }

  test("curated corpus composes quality, lang, dedup and contamination gates") {
    // fixture docs: 1,2 are probe docs (doc_id < 3) → excluded up front;
    // doc 3 is contaminated (shares grams with probes); doc 4 is clean but
    // only 4 tokens → quality = min(4/50, 1)·(1 − 0/4) = 0.08 < 0.5 → cut.
    val out = Curation.curatedCorpus(spark, dir).collect()
    assert(out.isEmpty)
    // a clean, long, stopword-light doc survives
    val dir2 = writeDocsFixture(Seq(
      1L -> "p1", 2L -> "p2", 3L -> "p3",
      10L -> ((1 to 60).map(i => s"the word$i is here").mkString(" "))))
    val out2 = Curation.curatedCorpus(spark, dir2).collect()
    assert(out2.map(_.getLong(0)).toSet == Set(10L))
  }

  test("decontaminateAgainst flags overlap with an external benchmark file") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // the committed fixture stands in for a real eval benchmark: JSONL,
    // explicit schema (no inference pass — see JsonlSource's scale notes)
    val probePath = getClass.getResource("/benchmarks/probes.jsonl").getPath
    val probes = spark.read.schema(StructType(Seq(
      StructField("qid", LongType), StructField("text", StringType))))
      .json(probePath)
    val corpus = Seq(
      (100L, "the capital of France is Paris obviously"), // shares 3-grams with qid 1
      (101L, "alpha beta gamma words continue here"),     // shares one with qid 2
      (102L, "nothing shared at all in this document"))
      .toDF("doc_id", "text")
    val flagged = Curation.decontaminateAgainst(corpus, probes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged(100L) >= 2L) // "the capital of", "capital of france"
    assert(flagged(101L) == 1L) // "alpha beta gamma"
    assert(!flagged.contains(102L))
  }

  test("stratified sampling equalizes the language mix deterministically") {
    import spark.implicits._
    // 40 en docs vs 5 de docs; expected keep-rate: de 100%, en 1/8
    val fixDir = java.nio.file.Files.createTempDirectory("graft-strat").toString
    val rows = (0 until 40).map(i => (i.toLong, s"english document number $i", "en")) ++
      (100 until 105).map(i => (i.toLong, s"deutsches dokument nummer $i", "de"))
    rows.toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'src0' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    val kept = Curation.sampleStratified(spark, fixDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // the minority stratum's keep-threshold is the full modulus → all kept
    assert(kept.filter(_._2 == "de").map(_._1) == (100L until 105L).toSet)
    // the majority stratum is genuinely subsampled, never emptied or kept whole
    val en = kept.count(_._2 == "en")
    assert(en > 0 && en < 40)
    // deterministic: a second run keeps the identical set (no RNG state)
    val again = Curation.sampleStratified(spark, fixDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == kept)
    // independent recomputation of the rate logic: every kept en doc's hash
    // is below floor(5*M/40), every dropped one's is above
    val m = Curation.StratModulus
    val hashes = spark.sql(
      "SELECT CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT) % " +
        m + " AS h, id FROM range(40)").collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val expectEn = (0L until 40L).filter(i => hashes(i) < (5 * m) / 40).toSet
    assert(kept.filter(_._2 == "en").map(_._1) == expectEn)
  }

  test("source cap keeps at most SourceCapN docs per source, deterministically") {
    import spark.implicits._
    val fixDir = java.nio.file.Files.createTempDirectory("graft-cap").toString
    // one megasource (60 docs) and one small source (3 docs)
    val rows = (0 until 60).map(i => (i.toLong, s"big source doc $i", "farm")) ++
      (200 until 203).map(i => (i.toLong, s"small source doc $i", "niche"))
    rows.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
    val kept = Curation.sourceCap(spark, fixDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // the farm is capped at exactly SourceCapN, the niche keeps everything
    assert(kept.count(_._2 == "farm") == Curation.SourceCapN)
    assert(kept.filter(_._2 == "niche").map(_._1).toSet == (200L until 203L).toSet)
    // ranks are contiguous 1..n per source and the whole result is re-run stable
    kept.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq == (1L to g.length).toSeq)
    }
    val again = Curation.sourceCap(spark, fixDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.toSet == kept.toSet)
    // the kept farm set is the SourceCapN smallest doc-id hashes (uniform
    // sample semantics), recomputed independently
    val m = kept.filter(_._2 == "farm").map(_._1).toSet
    val hashes = spark.sql(
      "SELECT CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT)" +
        " AS h, id FROM range(60)").collect().map(r => r.getLong(1) -> r.getLong(0))
    val expect = hashes.sortBy(p => (p._2, p._1)).take(Curation.SourceCapN.toInt)
      .map(_._1).toSet
    assert(m == expect)
  }

  test("simhash60 expression equals the relational md5 bit-vote") {
    // independent relational recomputation of the same tokens' simhash
    import spark.implicits._
    val toks = Seq("alpha", "beta", "gamma", "delta")
    val viaExpr = Seq(toks).toDF("toks")
      .select(Simhash60(org.apache.spark.sql.functions.col("toks")))
      .head().getLong(0)
    val viaSql = spark.sql(
      toks.map(t => s"SELECT CAST(conv(substring(md5('$t'), 1, 15), 16, 10) AS BIGINT) AS th")
        .mkString(" UNION ALL ")).selectExpr(
        (0 until 60).map(i =>
          s"sum(CASE WHEN (th >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS c$i"): _*)
      .selectExpr((0 until 60).map(i =>
        s"CASE WHEN c$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
        .mkString("(", " + ", ") AS sh")).head().getLong(0)
    assert(viaExpr == viaSql)
  }

  test("bottom_k aggregate equals the rank-window formulation across partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 3 groups × uneven sizes; one group smaller than k; duplicate rows
    // must count once. repartition(7) forces genuine partial-state merges.
    val rows = ((1 to 40).map(i => ("a", i.toLong)) ++
      (1 to 11).map(i => ("b", 1000L + i)) ++
      Seq(("c", 5L), ("c", 5L), ("c", 6L))) // duplicates in group c
    val df = rows.toDF("g", "id").repartition(7)
    val k = 4
    val viaAgg = df.groupBy("g")
      .agg(org.apache.spark.sql.graft.BottomKHashes.column(
        graft.functions.TextFns.md5Long(col("id").cast("string")),
        col("id"), k).as("bk"))
      .select(col("g"), explode(col("bk")).as("p"))
      .select(col("g"), col("p.h"), col("p.id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(graft.functions.TextFns.md5Long(col("id").cast("string")), col("id"))
    val viaWindow = df.distinct()
      .withColumn("h", graft.functions.TextFns.md5Long(col("id").cast("string")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("g"), col("h"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
    // group c has 2 distinct members < k → the whole group survives
    assert(viaAgg.count(_._1 == "c") == 2)
    // SQL registration (the aggregate tier is reachable from plain SQL)
    df.createOrReplaceTempView("bk_input")
    val viaSql = spark.sql(
      s"""SELECT g, size(bottom_k(
         |  CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT),
         |  id, $k)) AS n FROM bk_input GROUP BY g""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(viaSql == Map("a" -> 4, "b" -> 4, "c" -> 2))
  }

  test("mojibake_stats counts each artifact class once per occurrence") {
    val d = writeDocsFixture(Seq(
      1L -> "clean text here.",
      2L -> "badly decoded Ã© and Ã¨ words", // two 0xC3 lead-byte faces
      3L -> "lost �� bytes", // two replacement chars
      4L -> "a â€™quote and â€” dash", // two 0xE2 0x80 prefixes
      5L -> "ctrl\u0001char\u0002here", // two C0 controls (not \t \n \r)
      6L -> "mixed Â nbsp and � char")) // one of each of two families
    val got = Curation.mojibakeStats(spark, d).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getString(0) == "src0")
    assert(r.getLong(1) == 6L) // n_docs
    assert(r.getLong(2) == 5L) // n_affected: every doc but #1
    assert(r.getLong(3) == 8333L) // exact-bp floor of 5/6
    assert(r.getLong(4) == 3L) // fffd: 2 (doc3) + 1 (doc6)
    assert(r.getLong(5) == 5L) // double-enc: 2 + 2 + 1 (docs 2, 4, 6)
    assert(r.getLong(6) == 2L) // ctrl: doc5
  }

  test("mojibake tab/newline/cr are NOT control-char artifacts") {
    val d = writeDocsFixture(Seq(1L -> "a\tb\nc\rd."))
    val r = Curation.mojibakeStats(spark, d).collect()(0)
    assert((r.getLong(2), r.getLong(6)) == ((0L, 0L)))
  }

  test("code_detect flags code by line shape and by keyword+symbol density") {
    val codeDoc = "def add(a, b) {\n    return a + b;\n}"
    val kwDoc = "function return class int x = y"
    val proseDoc = "This is a plain sentence about nothing special."
    val d = writeDocsFixture(Seq(1L -> codeDoc, 2L -> kwDoc, 3L -> proseDoc))
    val got = Curation.codeDetect(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // codeDoc: 3 lines all code-shaped ({, ;, } tails), 1 block-indented,
    // kw tokens 'def' + 'return'; is_code via the line rule
    val codeSyms = codeDoc.count("{};=()<>[]".contains(_)).toLong
    assert(got(1L) == ((3L, 10000L, 3333L,
      codeSyms * 10000L / codeDoc.length, 2L, 1L)))
    // kwDoc: prose-shaped single line, but 4 keywords + '=' density →
    // is_code via the keyword path (needs BOTH kw count and the sym floor)
    val kwSyms = kwDoc.count("{};=()<>[]".contains(_)).toLong
    val kwSymBp = kwSyms * 10000L / kwDoc.length
    assert(kwSymBp >= Curation.CodeSymBpMin)
    assert(got(2L) == ((1L, 0L, 0L, kwSymBp, 4L, 1L)))
    assert(got(3L) == ((1L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("word_blocklist_gate drops on any blocklisted token, names the first") {
    val d = writeDocsFixture(Seq(
      1L -> "clean words only",
      2L -> "a vector of spam and more vector stuff",
      3L -> "Casino night"))
    val got = Curation.wordBlocklistGate(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getLong(3)))).toMap
    assert(got(1L) == ((0L, "", 1L)))
    assert(got(2L) == ((3L, "vector", 0L))) // first in DOCUMENT order
    assert(got(3L) == ((1L, "casino", 0L))) // membership is case-insensitive
  }

  test("stage_diff classifies dropped/changed/unchanged with exact shares") {
    val five = (1 to 5).map(i => s"Solid sentence number $i reads fine.")
    val d = writeDocsFixture(Seq(
      1L -> five.mkString("\n"), // every line survives: unchanged
      2L -> (five :+ "cookie banner line here.").mkString("\n"), // changed
      3L -> (five :+ "curly { brace.").mkString("\n"), // doc gate: dropped
      4L -> five.mkString("\n"))) // unchanged
    val got = Curation.stageDiff(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("src0", "unchanged") -> ((2L, 5000L)),
      ("src0", "changed") -> ((1L, 2500L)),
      ("src0", "dropped") -> ((1L, 2500L))))
    // consistency with the stage itself: stage_diff's dropped count is
    // exactly the docs c4_line_filters condemns
    val dropped = Curation.c4LineFilters(spark, d).collect()
      .count(_.getString(4) != "")
    assert(dropped.toLong == got(("src0", "dropped"))._1)
  }

  test("quality_ensemble: three independent votes + majority, brute-forced") {
    // pass-all candidate: 60 tokens, mean word len in [3,10], alpha-rich,
    // stopwords present, lines end in '.', >=5 sentences, no brace/lorem
    val goodText = (1 to 6).map(i =>
      "the quick brown foxes jumped over with many lazy dogs today.")
      .mkString("\n")
    val fixture = Seq(
      1L -> goodText,
      2L -> "the of and that short.", // gopher fails (too few tokens)
      3L -> (goodText + "\ncurly { brace."), // c4 doc gate fails
      4L -> "") // token-less: every family votes drop
    val d = writeDocsFixture(fixture)

    // independent reference votes
    def md5mod(tok: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(("clf\u0001" + tok).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h.substring(0, 15), 16) % 2001L + 2001L) % 2001L
    }
    val stops = Set("the", "be", "to", "of", "and", "that", "have", "with")
    val expected = fixture.map { case (id, text) =>
      val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val gopher = tk.length >= 50 && tk.length <= 100000 &&
        { val m = tk.map(_.length.toLong).sum.toDouble / tk.length
          m >= 3.0 && m <= 10.0 } &&
        tk.count(_.exists(_.isLetter)).toDouble / tk.length > 0.8 &&
        tk.count(stops) >= 2
      val keptLines = text.split("\n", -1).filter { l =>
        l.replaceAll("\\s+$", "").matches("(?s).*[.!?\"]$") &&
          l.split("\\s+").count(_.nonEmpty) >= 3 &&
          !Seq("javascript", "cookie", "privacy policy", "terms of use")
            .exists(l.toLowerCase.contains)
      }.mkString("\n")
      val sent = keptLines.count(c => c == '.' || c == '!' || c == '?')
      val c4 = !(text.toLowerCase.contains("lorem ipsum") ||
        text.contains("{") || sent < 5)
      val clf = tk.nonEmpty &&
        (tk.map(md5mod).sum / tk.length - 1000L) >= 0
      val votes = Seq(gopher, c4, clf).count(identity).toLong
      (id, if (gopher) 1L else 0L, if (c4) 1L else 0L, if (clf) 1L else 0L,
        votes, if (votes >= 2) 1L else 0L)
    }.toSet
    val got = Curation.qualityEnsemble(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    // the fixture discriminates: doc 1 keeps, docs 2 and 4 drop
    val byId = got.map(t => t._1 -> t._6).toMap
    assert(byId(1L) == 1L && byId(2L) == 0L && byId(4L) == 0L)
  }

  test("corpus_diff: all four statuses, per-source, on hand-built " +
      "snapshots") {
    import spark.implicits._
    // old: docs 1-4 across two sources; new: 1 unchanged, 2 changed text,
    // 3 removed, 5 added (new source) — 4 stays unchanged in source s2
    val oldC = Seq((1L, "s1", "alpha text"), (2L, "s1", "beta text"),
      (3L, "s1", "gamma text"), (4L, "s2", "delta text"))
      .toDF("doc_id", "source", "text")
    val newC = Seq((1L, "s1", "alpha text"), (2L, "s1", "beta REVISED"),
      (4L, "s2", "delta text"), (5L, "s3", "fresh text"))
      .toDF("doc_id", "source", "text")
    val got = collectSet(Curation.corpusDiffOf(oldC, newC))
    val expected = Set(
      Seq[Any]("s1", 0L, 1L, 1L, 1L, 3L, 2L), // removed 3, changed 2, kept 1
      Seq[Any]("s2", 0L, 0L, 0L, 1L, 1L, 1L), // 4 untouched
      Seq[Any]("s3", 1L, 0L, 0L, 0L, 0L, 1L)) // 5 added
    assert(got == expected)
  }

  // ---- compression-ratio quality signal ------------------------------------

  /** Independent deflate (its own java.util.zip loop, matching the
    * CPython-zlib oracle literals — the tripwire for a bundled-zlib
    * divergence). */
  private def zlen(s: String): Long = {
    val d = new java.util.zip.Deflater(Curation.DeflateLevel)
    val in = s.getBytes("UTF-8")
    d.setInput(in); d.finish()
    val buf = new Array[Byte](1 << 16)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end(); n
  }

  test("compression_ratio fixture equals the CPython-zlib-pinned literals " +
      "(the bundled-zlib tripwire)") {
    val got = Curation.compressionRatio(spark, "ignored").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      ("http://plain.example/readme", 36L, 44L, 12222L),
      ("http://site-a.example/index", 96L, 99L, 10312L),
      ("http://site-b.example/empty", 0L, 8L, 80000L),
      ("http://site-b.example/post", 30L, 35L, 11666L),
      ("http://site-c.example/nested", 14L, 22L, 15714L)))
  }

  test("compression_stats rolls up per-source deflate mass and flags " +
      "repetitive docs; compression_agreement matches the hand-derived " +
      "2x2 kappa") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-zstats").toString
    // sA: one long prose doc (quality keep, deflate keep) + one massively
    // repetitive doc (quality keep by tokens, deflate FLAGS it — the case
    // the n-gram gates can miss is exactly what this signal buys);
    // sB: one short doc (quality drop, deflate keep: tiny texts ratio>1)
    // 60 distinct hash-gibberish words: genuinely incompressible "prose"
    // (natural-word filler like "word$i unique" deflates below the gate)
    val prose = (1 to 60).map(i =>
      java.lang.Long.toString(i * 2654435761L % 4586471023L, 36)).mkString(" ")
    val loop = "spam ham " * 400
    val short = "tiny text"
    val rows = Seq((1L, prose, "sA"), (2L, loop, "sA"), (3L, short, "sB"))
    rows.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val raw = rows.map { case (id, t, s) =>
      (id, s, t.getBytes("UTF-8").length.toLong, zlen(t)) }
    // sanity: the loop doc really is below the gate, the others above
    assert(10000L * raw(1)._4 / raw(1)._3 < Curation.CompressionMinBp)
    assert(10000L * raw(0)._4 / raw(0)._3 >= Curation.CompressionMinBp)
    val expected = raw.groupBy(_._2).map { case (s, xs) =>
      val rb = xs.map(_._3).sum; val db = xs.map(_._4).sum
      Seq[Any](s, xs.size.toLong, rb, db, 10000L * db / math.max(rb, 1L),
        xs.count(x => 10000L * x._4 / math.max(x._3, 1L)
          < Curation.CompressionMinBp).toLong)
    }.toSet
    assert(collectSet(Curation.compressionStats(spark, d)) == expected)

    // agreement: doc1 both-keep, doc2 quality-only (deflate flags),
    // doc3 deflate-only (quality drops a 2-token doc) → po=1/3
    val (bk, qo, zo, bd) = (1L, 1L, 1L, 0L)
    val n = 3L
    val po = 10000L * (bk + bd) / n
    val pq = 10000L * (bk + qo) / n
    val pz = 10000L * (bk + zo) / n
    val pe = (pq * pz + (10000L - pq) * (10000L - pz)) / 10000L
    val kappa = BigDecimal((po - pe).toDouble / math.max(10000L - pe, 1L))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Curation.compressionAgreement(spark, d).collect()(0)
    assert(got.toSeq == Seq(n, bk, qo, zo, bd, po, kappa))
  }
}
