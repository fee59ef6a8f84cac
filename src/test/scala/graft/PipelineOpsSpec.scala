package graft

import graft.operators.{Similarity, TextAnalysis, Unigram}

/** Specs for the round-3 pipeline operators: repetition stats, boilerplate
  * n-gram detection, corpus mixing report, cluster purity. */
class PipelineOpsSpec extends SparkTestBase {

  private lazy val dir = writeDocsFixture(Seq(
    1L -> "spam spam spam spam spam spam eggs",         // heavy repetition
    2L -> "one two three four five six seven eight",    // all distinct
    3L -> "please subscribe to our newsletter today and also please subscribe to our newsletter today",
    4L -> "completely unrelated prose about rivers and stones and morning light",
    5L -> "please subscribe to our newsletter today thanks",
  ))

  test("repetition_stats flags the repetitious doc, not the distinct one") {
    val rows = TextAnalysis.repetitionStats(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val (n1, d1, dup1, top1) = rows(1L)
    assert(n1 == 7 && d1 == 2)                 // 7 tokens, {spam, eggs}
    assert(dup1 > 7000L && top1 == 8571L)      // spam = 6/7, exact floor bp
    val (_, _, dup2, top2) = rows(2L)
    assert(dup2 == 0L && top2 == 1250L)        // all distinct, 1/8 each
  }

  test("boilerplate_ngrams flags docs sharing the corpus's top 5-grams") {
    val rows = TextAnalysis.boilerplateNgrams(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "please subscribe to our newsletter (today)" grams repeat across
    // docs 3 and 5 → both flagged; doc 4 shares no top gram with anyone
    assert(rows.contains(3L) && rows.contains(5L))
    assert(rows(3L) >= rows(5L)) // doc 3 contains the repeated grams twice
  }

  test("lm_perplexity scores docs under the corpus's own bigram model") {
    // corpus: "a b a b" + "c d" + "a c" → C(a b)=2, C(b a)=1, C(a c)=1,
    // C(c d)=1; contexts: a·=3, b·=1, c·=1
    val pdir = writeDocsFixture(Seq(
      1L -> "a b a b", 2L -> "c d", 3L -> "a c"))
    val rows = TextAnalysis.lmPerplexity(spark, pdir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2))))
      .toMap
    // doc 2's only bigram has P=1 → sum_lp 0 (maximally "typical")
    assert(rows(2L) == ((1L, 0.0)))
    // doc 1: ln(2/3), ln(1), ln(2/3) with per-bigram 4-decimal rounding
    val lp23 = BigDecimal(math.log(2.0 / 3.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(1L)._1 == 3L && math.abs(rows(1L)._2 - 2 * lp23) < 1e-9)
    // doc 3's single bigram is rarest given its context → lowest mean
    // log-prob (≡ highest ppl = exp(-sum_lp/n), derivable by the consumer)
    def meanLp(id: Long) = rows(id)._2 / rows(id)._1
    assert(meanLp(3L) < meanLp(1L) && meanLp(1L) < meanLp(2L))
  }

  test("length_histogram buckets by binary magnitude with exact integers") {
    // fixture text lengths: known chars → known log2 buckets
    val hdir = writeDocsFixture(Seq(
      1L -> "a" * 7,    // 7 chars  → bin length 3
      2L -> "b" * 8,    // 8 chars  → bin length 4 (boundary: exactly 2^3)
      3L -> "c" * 15,   // 15 chars → bin length 4
      4L -> "d" * 100)) // 100 chars → bin length 7
    val rows = TextAnalysis.lengthHistogram(spark, hdir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.keySet == Set(3L, 4L, 7L))
    assert(rows(3L) == ((1L, 7L, 7L, 7L)))
    assert(rows(4L) == ((2L, 23L, 8L, 15L)))
    assert(rows(7L) == ((1L, 100L, 100L, 100L)))
  }

  test("zipf_stats: exact head-mass integers and the hand-computed slope") {
    val d = writeDocsFixture(Seq(1L -> "a a a a b b c"))
    val r = TextAnalysis.zipfStats(spark, d).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 7L) // vocab, total
    assert(r.getLong(2) == 4L * 10000 / 7) // top1_bp, exact floor
    assert(r.getLong(3) == 10000L) // ≤ ZipfTopN distinct tokens → full mass
    // least squares over (ln rk, ln n) for counts 4, 2, 1 — same rounding
    val x = Seq(1, 2, 3).map(k => math.rint(math.log(k) * 1e6) / 1e6)
    val y = Seq(4, 2, 1).map(n => math.rint(math.log(n) * 1e6) / 1e6)
    val (sx, sy) = (x.sum, y.sum)
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val sxx = x.map(a => a * a).sum
    val slope = (3 * sxy - sx * sy) / (3 * sxx - sx * sx)
    assert(math.abs(r.getDouble(4) - slope) < 1e-3)
  }

  test("bpe_pair_counts weights char pairs by corpus word frequency") {
    val d = writeDocsFixture(Seq(
      1L -> "aaab aaab cd",
      2L -> "x1 !!"))           // non-[a-z]+ tokens are excluded
    val rows = TextAnalysis.bpePairCounts(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "aaab" (freq 2): pairs aa,aa,ab → aa=4, ab=2; "cd" (freq 1): cd=1
    assert(rows == Map("aa" -> 4L, "ab" -> 2L, "cd" -> 1L))
  }

  test("classifier_score: hashed fixed-point gate matches a plain-Scala model") {
    val texts = Seq(
      1L -> "alpha beta gamma delta",
      2L -> "epsilon zeta",
      3L -> "")                         // empty doc: score -1000, keep=false
    val d = writeDocsFixture(texts)
    // independent reference: md5-hex → first 15 digits → long, mod 2001
    def w(tok: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(("clf\u0001" + tok).getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(md5.take(15), 16) % 2001L
    }
    val exp = texts.map { case (id, t) =>
      val tk = t.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase)
      val s = tk.map(w).sum
      val n = tk.length.toLong
      val mean = s / math.max(n, 1L) - 1000L
      (id, n, s - 1000L * n, mean, mean >= 0L)
    }.toSet
    val got = graft.operators.TextAnalysis.classifierScore(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got == exp)
  }

  test("bpe_merges matches an independent plain-Scala BPE, round for round") {
    val words = Seq("banana", "banana", "bandana", "banana", "anna", "nab")
    val d = writeDocsFixture(Seq(
      1L -> words.take(3).mkString(" "),
      2L -> words.drop(3).mkString(" "),
      3L -> "x1 !!")) // non-[a-z]+ tokens are excluded from training
    val got = TextAnalysis.bpeMerges(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // independent reference BPE (no shared code with the operator): count
    // every adjacent symbol position weighted by word frequency, take the
    // (count desc, left, right) argmax, merge greedily left-to-right
    // non-overlapping, repeat
    val wf = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var seqs: Map[Vector[String], Long] =
      wf.map { case (w, f) => w.map(_.toString).toVector -> f }
    val exp = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var round = 1L
    var done = false
    while (round <= TextAnalysis.BpeMergeRounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, f) <- seqs; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        exp += ((round, l, r, l + r, cnt))
        seqs = seqs.groupMapReduce { case (s, _) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += s(i); i += 1 }
          }
          out.result()
        }(_._2)(_ + _)
        round += 1
      }
    }
    assert(got.nonEmpty && got == exp.toSeq)
    // the run exercises BOTH branches: at least one merged symbol longer
    // than 2 chars (a merge consumed a previous merge's output) and — on
    // this tiny corpus — early exhaustion before the round cap
    assert(got.exists(_._4.length > 2))
  }

  test("bpe_encode reproduces an independent BPE encode over the corpus") {
    val docTexts = Seq(
      1L -> "banana banana bandana nab",
      2L -> "anna banana x9 !!") // non-[a-z]+ words are not encodable
    val d = writeDocsFixture(docTexts)
    // train + collect the merge table through the public operator surface
    val merges = TextAnalysis.bpeMerges(spark, d).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    // independent reference encode: fold the merge list with a local
    // greedy left-to-right single-pass merge (no shared operator code)
    def enc(w: String): Vector[String] =
      merges.foldLeft(w.map(_.toString).toVector) { case (s, (l, r)) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += s(i); i += 1 }
        }
        out.result()
      }
    val exp = docTexts.map { case (id, t) =>
      val ws = t.split("\\s+").filter(_.matches("[a-z]+"))
      (id, ws.length.toLong, ws.map(_.length.toLong).sum,
        ws.map(w => enc(w).length.toLong).sum)
    }.toSet
    val got = TextAnalysis.bpeEncode(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == exp)
    // merges actually compress: fewer symbols than characters somewhere
    assert(got.exists(r => r._4 < r._3))
  }

  // ---- byte-level BPE -----------------------------------------------------

  /** Independent byte symbolization: UTF-8 bytes as uppercase hex pairs —
    * no shared code with the operator (String.format, not hex()). */
  private def hexOf(w: String): Vector[String] =
    w.getBytes("UTF-8").toVector.map(b => f"${b & 0xff}%02X")

  /** Unicode + punctuation + case corpus: multibyte UTF-8 ("héllo" has a
    * 2-byte é; "né" twice), symbols, digits — everything the char-level
    * families exclude and byte-level must train on. */
  private val bbpeDocs = Seq(
    1L -> "héllo héllo banana banana Banana",
    2L -> "a+b a+b x9! né né héllo",
    3L -> "né ☃ banana")

  test("bbpe_pair_counts weights byte pairs by raw-word frequency " +
      "(unicode multibyte included)") {
    val d = writeDocsFixture(bbpeDocs)
    val wf = bbpeDocs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- wf; s = hexOf(w); i <- 0 until s.length - 1)
      counts(s(i) + s(i + 1)) = counts.getOrElse(s(i) + s(i + 1), 0L) + f
    val exp = counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(graft.operators.Bbpe.BbpePairTopN)
      .map { case (p, c) => Seq[Any](p, c) }.toSet
    assert(collectSet(graft.operators.Bbpe.bbpePairCounts(spark, d)) == exp)
    // the é pair (C3 A9) must be in the table — multibyte chars ARE pairs
    assert(counts.contains("C3A9"))
  }

  test("bbpe_merges matches an independent byte-level BPE, round for round") {
    val d = writeDocsFixture(bbpeDocs)
    val got = graft.operators.Bbpe.bbpeMerges(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val wf = bbpeDocs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var seqs: Map[Vector[String], Long] = wf.toSeq
      .filter(_._1.getBytes("UTF-8").length >= 2)
      .groupBy(x => hexOf(x._1)).view.mapValues(_.map(_._2).sum).toMap
    val exp = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var round = 1L
    var done = false
    while (round <= graft.operators.Bbpe.BbpeMergeRounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, f) <- seqs; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        exp += ((round, l, r, l + r, cnt))
        seqs = seqs.groupMapReduce { case (s, _) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += s(i); i += 1 }
          }
          out.result()
        }(_._2)(_ + _)
        round += 1
      }
    }
    assert(got.nonEmpty && got == exp.toSeq)
    // at least one merged symbol spans >2 bytes (merge-of-merge exercised)
    assert(got.exists(_._4.length > 4))
  }

  test("bbpe_encode has ZERO OOV: every raw token rolls up, unicode and " +
      "punctuation included, and merges compress") {
    val d = writeDocsFixture(bbpeDocs)
    val merges = graft.operators.Bbpe.bbpeMerges(spark, d).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    def enc(w: String): Vector[String] =
      merges.foldLeft(hexOf(w)) { case (s, (l, r)) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += s(i); i += 1 }
        }
        out.result()
      }
    val exp = bbpeDocs.map { case (id, t) =>
      val ws = t.split("\\s+").filter(_.nonEmpty)
      (id, ws.length.toLong,
        ws.map(_.getBytes("UTF-8").length.toLong).sum,
        ws.map(w => enc(w).length.toLong).sum)
    }.toSet
    val got = graft.operators.Bbpe.bbpeEncode(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == exp)
    // zero OOV: n_words equals the raw whitespace token count everywhere
    // (the char-level bpe_encode drops "a+b", "x9!", "☃" — this must not)
    assert(got.map(_._2).sum == bbpeDocs.map(_._2.split("\\s+")
      .count(_.nonEmpty).toLong).sum)
    assert(got.exists(r => r._4 < r._3)) // compression happened
  }

  test("unigram seed/vocab/encode/fertility match an independent " +
      "from-scratch EM + Viterbi") {
    val docTexts = Seq(
      1L -> "banana banana bandana anna",
      2L -> "nab banana anana x9 !!") // non-[a-z]+ words are not trained on
    val d = writeDocsFixture(docTexts)

    // ---- independent reference (no shared operator code) ----
    val words = docTexts.flatMap(_._2.toLowerCase.split("\\s+"))
      .filter(_.matches("[a-z]+"))
    val wf: Map[String, Long] =
      words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // seed: occurrence-weighted substrings (len 1..4)
    val seedCnt = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- wf; i <- 0 until w.length;
         n <- 1 to math.min(4, w.length - i)) {
      val p = w.substring(i, i + n)
      seedCnt(p) = seedCnt.getOrElse(p, 0L) + f
    }
    val chars = seedCnt.keySet.filter(_.length == 1).toSet
    var usage: Map[String, Long] =
      (seedCnt.filter(_._1.length == 1) ++
        seedCnt.toSeq.filter(_._1.length >= 2)
          .sortBy { case (p, c) => (-c, p) }.take(256)).toMap
    def scores(u: Map[String, Long]): Map[String, Double] = {
      val w = u.map { case (p, c) =>
        p -> (if (p.length == 1) math.max(c, 1L) else c) }
      val t = w.values.sum.toDouble
      w.map { case (p, x) => p -> math.log(x / t) }
    }
    def vit(w: String, sc: Map[String, Double]): Vector[String] = {
      val n = w.length
      val best = Array.fill(n + 1)(Double.NegativeInfinity); best(0) = 0.0
      val back = new Array[Int](n + 1)
      for (i <- 1 to n) {
        for (l <- 1 to math.min(4, i))
          sc.get(w.substring(i - l, i)) match {
            case Some(s) if best(i - l) + s > best(i) =>
              best(i) = best(i - l) + s; back(i) = l
            case _ => ()
          }
        if (back(i) == 0) { best(i) = best(i - 1) - 100.0; back(i) = 1 }
      }
      var j = n
      val out = scala.collection.mutable.ListBuffer.empty[String]
      while (j > 0) { val l = back(j); w.substring(j - l, j) +=: out; j -= l }
      out.toVector
    }
    for (_ <- 1 to Unigram.UnigramEmRounds) {
      val sc = scores(usage)
      val used = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- wf; p <- vit(w, sc))
        used(p) = used.getOrElse(p, 0L) + f
      usage = chars.map(c => c -> used.getOrElse(c, 0L)).toMap ++
        used.toMap.filter { case (p, u) => p.length >= 2 && u > 0 }
    }
    val finalVocab = chars.map(c => c -> usage.getOrElse(c, 0L)).toMap ++
      usage.toSeq.filter(_._1.length >= 2).sortBy { case (p, u) => (-u, p) }
        .take(math.max(Unigram.UnigramVocabK - chars.size, 0))
    val fsc = scores(finalVocab)

    // seed counts (the oracled round-0 row)
    val expSeed = seedCnt.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(Unigram.UnigramSeedTopN)
    val gotSeed = Unigram.unigramSeedCounts(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(gotSeed == expSeed)

    // trained vocabulary, rank for rank
    val expVocab = finalVocab.toSeq.sortBy { case (p, u) => (-u, p) }
      .zipWithIndex.map { case ((p, u), ix) =>
        (ix + 1L, p, p.length.toLong, u, math.round(fsc(p) * 10000.0)) }
    val gotVocab = Unigram.unigramVocab(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(gotVocab == expVocab)
    assert(gotVocab.exists(v => v._3 >= 2 && v._4 > 0)) // multi pieces trained

    // encode∘train parity per document
    val expEnc = docTexts.map { case (id, t) =>
      val ws = t.toLowerCase.split("\\s+").filter(_.matches("[a-z]+"))
      (id, ws.length.toLong, ws.map(_.length.toLong).sum,
        ws.map(w => vit(w, fsc).length.toLong).sum)
    }.toSet
    val gotEnc = Unigram.unigramEncode(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(gotEnc == expEnc)
    assert(gotEnc.exists(r => r._4 < r._3)) // compresses below char count

    // fertility: one src0 row reconciling both encodes' per-doc rollups
    val bpeByDoc = TextAnalysis.bpeEncode(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val uniByDoc = gotEnc.map(r => (r._1, (r._2, r._3, r._4))).toMap
    val w0 = uniByDoc.values.map(_._1).sum
    val exp = (("src0", uniByDoc.size.toLong, w0,
      uniByDoc.values.map(_._2).sum, bpeByDoc.values.sum,
      uniByDoc.values.map(_._3).sum,
      bpeByDoc.values.sum * 100L / w0,
      uniByDoc.values.map(_._3).sum * 100L / w0))
    val fert = Unigram.unigramFertility(spark, d).collect()
    assert(fert.length == 1)
    val r = fert.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) == exp)
  }

  test("oov_stats counts tokens outside the top-k vocabulary") {
    val d = writeDocsFixture(Seq(
      1L -> "x x x y",
      2L -> "x y y"))
    // corpus freq: x=4, y=3 → k=1 vocab = {x}
    val rows = TextAnalysis.oovStatsK(spark, d, 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows(1L) == ((4L, 1L, 2500L)))   // y is OOV: 1/4 = 2500 bp
    assert(rows(2L) == ((3L, 2L, 6666L)))   // 2/3 floors to 6666 bp
  }

  test("vocab_growth covers more token mass at each vocabulary rung") {
    // zipf-ish fixture: "a" dominates, then "b", then a long tail
    val d = writeDocsFixture(Seq(
      1L -> (Seq.fill(50)("a") ++ Seq.fill(20)("b") ++
        (1 to 30).map(i => s"tail$i")).mkString(" ")))
    val r = TextAnalysis.vocabGrowth(spark, d).collect().head
    val (nTerms, total) = (r.getLong(0), r.getLong(1))
    assert(nTerms == 32 && total == 100)
    val Seq(c10, c100, c1000) = (2 to 4).map(r.getLong)
    // top-10 = a(50) + b(20) + 8 tail singletons = 78% of mass
    assert(c10 == 7800L)
    assert(c100 == 10000L && c1000 == 10000L) // 32 types: full coverage
  }

  test("corpus_mix reports per-(lang, source) composition") {
    val rows = TextAnalysis.corpusMix(spark, dir).collect()
    assert(rows.length == 1) // fixture is all (en, src0)
    val r = rows.head
    assert(r.getString(0) == "en" && r.getString(1) == "src0")
    assert(r.getLong(2) == 5)
  }

  test("cluster_purity is 1.0 when cells align with labels") {
    import spark.implicits._
    // two well-separated label groups on distinct axes
    val embDir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    val dim = graft.operators.Dedup.Dim
    def vec(axis: Int, eps: Float): Array[Float] = {
      val a = Array.fill(dim)(0.0f); a(axis) = 1.0f; a(axis + 2) = eps; a
    }
    val rows = (0 until 8).map { i =>
      val label = i % 2
      (i.toLong, vec(label, 0.01f * (i / 2)), label)
    }
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$embDir/embeddings.parquet")
    val purity = Similarity.clusterPurity(spark, embDir).collect()
    assert(purity.nonEmpty)
    // every cell must be label-pure: members of one cell share one label
    assert(purity.forall(r => r.getLong(3) == 10000L))
  }

  test("wordpiece pair scores/merges/encode match an independent " +
      "from-scratch likelihood trainer + greedy encoder") {
    val docTexts = Seq(
      1L -> "banana banana banana queen quick",
      2L -> "ban queue x7 !!") // non-[a-z]+ words are not trained on
    val d = writeDocsFixture(docTexts)

    // ---- independent reference (no shared operator code) ----
    val words = docTexts.flatMap(_._2.toLowerCase.split("\\s+"))
      .filter(_.matches("[a-z]+"))
    val wf: Map[String, Long] =
      words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def symsOf(w: String): Vector[String] =
      w.substring(0, 1) +: (1 until w.length).map(i => "##" + w(i)).toVector
    def applyMerge(s: Vector[String], l: String, r: String): Vector[String] = {
      val fused = l + r.stripPrefix("##")
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
          out += fused; i += 2
        } else { out += s(i); i += 1 }
      }
      out.toVector
    }
    def stats(st: Map[String, (Long, Vector[String])])
        : (Map[(String, String), Long], Map[String, Long]) = {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      val sc = scala.collection.mutable.Map.empty[String, Long]
      for ((_, (f, sy)) <- st) {
        sy.foreach(x => sc(x) = sc.getOrElse(x, 0L) + f)
        sy.sliding(2).filter(_.length == 2).foreach { pr =>
          pc((pr(0), pr(1))) = pc.getOrElse((pr(0), pr(1)), 0L) + f }
      }
      (pc.toMap, sc.toMap)
    }
    var state: Map[String, (Long, Vector[String])] =
      wf.map { case (w, f) => w -> ((f, symsOf(w))) }
    val charInv = state.values.flatMap(_._2).toSet
    val (pc0, sc0) = stats(state)
    val countArgmax = pc0.toSeq
      .sortBy { case ((l, r), c) => (-c, l, r) }.head._1
    val expMerges = scala.collection.mutable
      .ArrayBuffer.empty[(Long, String, String, String, Long, Long)]
    var round = 1
    var done = false
    while (round <= graft.operators.Wordpiece.WpMergeRounds && !done) {
      val (pc, sc) = stats(state)
      if (pc.isEmpty) done = true
      else {
        val best = pc.toSeq.map { case ((l, r), c) =>
          (l, r, c, c * 1000000L / (sc(l) * sc(r))) }
          .sortBy { case (l, r, c, scr) => (-scr, -c, l, r) }.head
        expMerges += ((round.toLong, best._1, best._2,
          best._1 + best._2.stripPrefix("##"), best._3, best._4))
        state = state.map { case (w, (f, sy)) =>
          w -> ((f, applyMerge(sy, best._1, best._2))) }
        round += 1
      }
    }

    // the round-0 oracled row: top pairs by (score, count, l, r)
    val expPairs = pc0.toSeq.map { case ((l, r), c) =>
      (l, r, c, c * 1000000L / (sc0(l) * sc0(r))) }
      .sortBy { case (l, r, c, scr) => (-scr, -c, l, r) }
      .take(graft.operators.Wordpiece.WpPairTopN)
    val gotPairs = graft.operators.Wordpiece.wordpiecePairScores(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(gotPairs == expPairs)

    // full merge table, round for round
    val gotMerges = graft.operators.Wordpiece.wordpieceMerges(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    assert(gotMerges == expMerges.toSeq)
    // the likelihood objective genuinely differs from raw-count BPE:
    // round 1 must NOT pick the highest-count pair here
    assert((expMerges.head._2, expMerges.head._3) != countArgmax)

    // greedy longest-match encode under the trained inventory
    val vocab = charInv ++ expMerges.map(_._4)
    val maxLen = (vocab.map(_.stripPrefix("##").length) + 1).max
    def gEnc(w: String): Option[Long] = {
      var i = 0; var n = 0L
      while (i < w.length) {
        var l = math.min(maxLen, w.length - i); var m = 0
        while (l >= 1 && m == 0) {
          val cand = if (i == 0) w.substring(0, l)
            else "##" + w.substring(i, i + l)
          if (vocab.contains(cand)) m = l else l -= 1
        }
        if (m == 0) return None
        i += m; n += 1
      }
      Some(n)
    }
    val expEnc = docTexts.map { case (id, t) =>
      val ws = t.toLowerCase.split("\\s+").filter(_.matches("[a-z]+"))
      val encs = ws.map(gEnc)
      (id, ws.length.toLong, ws.map(_.length.toLong).sum,
        encs.map(_.getOrElse(1L)).sum, encs.count(_.isEmpty).toLong)
    }.toSet
    val gotEnc = graft.operators.Wordpiece.wordpieceEncode(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(gotEnc == expEnc)
    assert(gotEnc.exists(r => r._4 < r._3)) // compresses below char count
  }

  test("tokenizer_faceoff reconciles column-for-column with " +
      "unigram_fertility and the wordpiece per-doc rollup") {
    val d = writeDocsFixture(Seq(
      1L -> "banana banana bandana anna",
      2L -> "nab banana anana x9 !!"))
    val fert = Unigram.unigramFertility(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val wpByDoc = graft.operators.Wordpiece.wordpieceEncode(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val bbpeByDoc = graft.operators.Bbpe.bbpeEncode(spark, d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    val got = graft.operators.Wordpiece.tokenizerFaceoff(spark, d).collect()
    assert(got.length == 1)
    val r = got.head
    val f = fert("src0")
    // shared columns agree exactly with unigram_fertility
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(9), r.getLong(10)) ==
      (("src0", f._1, f._2, f._3, f._4, f._5, f._6, f._7)))
    // the wordpiece column is the per-doc rollup and its exact fertility
    val wpSum = wpByDoc.values.sum
    assert(r.getLong(6) == wpSum)
    assert(r.getLong(11) == wpSum * 100L / f._2)
    // the byte-level columns are bbpe_encode's rollup on ITS OWN token
    // universe: ALL raw whitespace tokens ("x9", "!!" included), so
    // raw_words strictly exceeds the char-trio's [a-z]+ word count here
    val rawWords = bbpeByDoc.values.map(_._1).sum
    val bbpeSum = bbpeByDoc.values.map(_._2).sum
    assert(r.getLong(7) == rawWords && r.getLong(8) == bbpeSum)
    assert(r.getLong(7) > r.getLong(2))
    assert(r.getLong(12) == bbpeSum * 100L / rawWords)
  }
}
