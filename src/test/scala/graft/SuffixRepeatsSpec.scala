package graft

import graft.operators.SuffixRepeats

class SuffixRepeatsSpec extends SparkTestBase {

  /** Brute-force spectrum row for block length L over (doc_id, text). */
  private def bruteSpectrum(docs: Seq[(Long, String)], L: Int): (Long, Long, Long, Long) = {
    val windows = for {
      (id, t) <- docs
      p <- 0 to t.length - L
    } yield (t.substring(p, p + L), id)
    val fams = windows.groupBy(_._1).filter(_._2.size >= 2)
    val nGroups = fams.size.toLong
    val nPositions = fams.values.map(_.size.toLong).sum
    val maxGroup = if (fams.isEmpty) 0L else fams.values.map(_.size.toLong).max
    val xdoc = fams.values.count(_.map(_._2).distinct.size >= 2).toLong
    (nGroups, nPositions, maxGroup, xdoc)
  }

  private def bruteLongest(docs: Seq[(Long, String)]): Int = {
    val maxLen = docs.map(_._2.length).max
    (1 to maxLen).reverse.find { l =>
      val ws = docs.flatMap { case (_, t) =>
        (0 to t.length - l).map(p => t.substring(p, p + l)) }
      ws.groupBy(identity).exists(_._2.size >= 2)
    }.getOrElse(0)
  }

  test("suffix_repeats spectrum matches the brute force per level") {
    val docs = Seq(
      1L -> "abracadabra zebra stripes and abracadabra again",
      2L -> "the zebra stripes pattern repeats the zebra stripes pattern",
      3L -> "xyzzy unrelated quux content")
    val dir = writeDocsFixture(docs)
    val got = SuffixRepeats.suffixRepeats(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.nonEmpty)
    got.foreach { case (block, row) =>
      val exp = bruteSpectrum(docs, block.toInt)
      assert(row == exp, s"spectrum at block=$block: got $row expected $exp")
    }
    // the spectrum must extend one level past the last level with repeats
    // (or hit a doc-length bound), so no longer repeat goes unreported
    val kmax = got.filter(_._2._1 > 0).keys.max
    val maxDocLen = docs.map(_._2.length).max
    assert(got.keys.max >= math.min(kmax * 2, maxDocLen),
      s"spectrum stops at ${got.keys.max} with repeats at $kmax")
  }

  test("longest_repeat finds the exact maximal repeated substring") {
    val docs = Seq(
      1L -> "prefix THE LONGEST SHARED RUN OF TEXT IN THIS CORPUS suffix one",
      2L -> "other THE LONGEST SHARED RUN OF TEXT IN THIS CORPUS trailer",
      3L -> "no overlap here at all qqq")
    val dir = writeDocsFixture(docs)
    val r = SuffixRepeats.longestRepeat(spark, dir).collect()(0)
    val expLen = bruteLongest(docs)
    assert(r.getLong(0) == expLen.toLong,
      s"max_len ${r.getLong(0)} != brute $expLen")
    assert(r.getLong(1) >= 2L)
    // the witness excerpt is a genuine repeat: occurs in ≥2 window positions
    val sample = r.getString(3)
    assert(sample.length == expLen)
    val occurrences = docs.map(_._2).map { t =>
      Iterator.from(0).map(i => t.indexOf(sample, i)).takeWhile(_ >= 0)
        .map(_ + 1).size
    }.sum
    assert(occurrences >= 2, s"witness '$sample' is not a repeat")
  }

  test("repeat_coverage equals the brute-force window-union per doc") {
    val B = SuffixRepeats.CoverageBlock.toInt
    // every filler below is a strictly-increasing digit stream, so no
    // 64-char window repeats anywhere except inside the SHARED run — a
    // repeated-char filler would itself self-repeat (first fixture bug)
    def stream(from: Int, n: Int) =
      Iterator.from(from).map(i => f"$i%04d").flatten.take(n).mkString
    val shared = stream(0, 150) // 150 chars shared verbatim by docs 1 and 2
    val docs = Seq(
      1L -> (stream(5000, 30) + shared + stream(6000, 40)),
      2L -> (shared + stream(7000, 500)),
      3L -> stream(8000, 30),        // shorter than B → 0
      4L -> stream(9000, 400))       // genuinely novel → 0
    val dir = writeDocsFixture(docs)
    // brute force: positions whose B-window occurs ≥2 times anywhere,
    // covered chars = union of those windows per doc
    val wins = docs.flatMap { case (id, t) =>
      (0 to t.length - B).map(p => (t.substring(p, p + B), id, p)) }
    val famCnt = wins.groupBy(_._1).view.mapValues(_.size).toMap
    val expected = docs.map { case (id, t) =>
      val cov = Array.fill(t.length)(false)
      wins.filter(w => w._2 == id && famCnt(w._1) >= 2)
        .foreach(w => (w._3 until w._3 + B).foreach(cov(_) = true))
      id -> (t.length.toLong, cov.count(identity).toLong)
    }.toMap
    val got = SuffixRepeats.repeatCoverage(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    expected.foreach { case (id, (n, cov)) =>
      assert(got(id)._1 == n && got(id)._2 == cov,
        s"doc $id: got ${got(id)} expected ($n, $cov)")
      assert(got(id)._3 == cov * 10000L / math.max(n, 1L))
    }
    // doc 3 (< B chars) and doc 4 (novel) report zero coverage
    assert(got(3L)._2 == 0L && got(4L)._2 == 0L)
    // the shared run is covered in both carriers
    assert(got(1L)._2 == 150L && got(2L)._2 == 150L)
  }

  test("non-ASCII corpora take the narrower adaptive ladders and stay exact") {
    // the census ladder adapts to the corpus's widest codepoint: Greek
    // (11-bit cps → censuses 1,2,4, rank from 8) and CJK (16-bit cps →
    // censuses 1,2, rank from 4) must produce the same brute-force
    // spectrum and longest repeat as any other width
    val fixtures = Seq(
      Seq( // Greek, bits ≈ 11
        1L -> "αβγδ κοσμος αβγδ κοσμος τελος",
        2L -> "κοσμος αβγδ κατι διαφορετικο"),
      Seq( // CJK, bits ≈ 16
        1L -> "日本語のテキスト日本語のテキスト",
        2L -> "日本語のテキストとそのほかのことば"))
    fixtures.foreach { docs =>
      val dir = writeDocsFixture(docs)
      val got = SuffixRepeats.suffixRepeats(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      assert(got.nonEmpty)
      got.foreach { case (block, row) =>
        val exp = bruteSpectrum(docs, block.toInt)
        assert(row == exp, s"spectrum at block=$block: got $row expected $exp")
      }
      val r = SuffixRepeats.longestRepeat(spark, dir).collect()(0)
      assert(r.getLong(0) == bruteLongest(docs).toLong,
        s"longest ${r.getLong(0)} != brute ${bruteLongest(docs)}")
    }
  }

  /** Independent twin of the operator's checkpoint tag: md5 of the corpus
    * PATH plus a name|size|mtime fingerprint of every file under its
    * documents.parquet (ADVICE r10 — path alone let an in-place rewrite
    * resume stale levels). */
  private def ckptTag(dir: String): String = {
    val root = new java.io.File(s"$dir/documents.parquet")
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq).getOrElse(Nil).flatMap(files)
      // Hadoop's local FS is checksummed: its listing HIDES the .crc
      // sidecar files java.io sees — exclude dot-files to match
      else if (f.getName.startsWith(".")) Nil
      else Seq(f)
    val fp =
      if (!root.exists) "absent"
      else files(root).map(f => s"${f.getName}|${f.length}|${f.lastModified}")
        .sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest((dir + "\n" + fp).getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(16)
  }

  test("checkpoint tag fingerprints corpus content: an in-place rewrite " +
      "never resumes stale levels") {
    val dir = writeDocsFixture(Seq(
      1L -> "abcabcabcabc shared shared shared tail",
      2L -> "abcabcabcabc again here"))
    val s1 = spark.newSession()
    s1.conf.set("graft.suffixCheckpoint", "true")
    val r1 = collectSet(SuffixRepeats.suffixRepeats(s1, dir))
    assert(r1.nonEmpty)
    // rewrite the corpus IN PLACE under the same path
    import spark.implicits._
    Seq(1L -> "zz qq zz", 2L -> "totally different now").toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src0' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // ground truth for the rewritten corpus: a plain uncheckpointed build
    val truth = collectSet(SuffixRepeats.suffixRepeats(spark.newSession(), dir))
    // a fresh checkpointing session must NOT resume the old corpus's
    // levels — the content fingerprint changed, so the tag did too
    val s2 = spark.newSession()
    s2.conf.set("graft.suffixCheckpoint", "true")
    val r2 = collectSet(SuffixRepeats.suffixRepeats(s2, dir))
    assert(r2 == truth, "stale-checkpoint resume: spectrum is not the " +
      "rewritten corpus's")
    assert(r2 != r1) // the corpora genuinely differ, so the spectra must
  }

  test("level checkpointing: a mid-build loss resumes from the last " +
      "completed level with identical spectrum output") {
    val shared = "THE LONGEST SHARED RUN OF TEXT IN THIS CORPUS " +
      "REPEATS FOR QUITE A WHILE INDEED YES IT DOES"
    val docs = Seq(
      1L -> s"prefix one $shared trailer alpha",
      2L -> s"different lead-in $shared and a different tail",
      3L -> "unrelated filler content qqq zzz")
    val dir = writeDocsFixture(docs)
    // baseline: plain build, no checkpointing
    val baseline = collectSet(SuffixRepeats.suffixRepeats(spark, dir))
    assert(baseline.nonEmpty)

    // checkpointed build: every completed level lands on scratch
    val s1 = spark.newSession()
    s1.conf.set("graft.suffixCheckpoint", "true")
    assert(collectSet(SuffixRepeats.suffixRepeats(s1, dir)) == baseline)
    val scratch = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft-scratch-" +
        s"${spark.sparkContext.applicationId}/suffix-${ckptTag(dir)}")
    val levelDirs = scratch.listFiles()
      .filter(_.getName.startsWith("level-"))
      .sortBy(_.getName.stripPrefix("level-").toLong)
    // the long shared run forces several ranked doubling levels
    assert(levelDirs.length >= 3, s"only ${levelDirs.toSeq} on scratch")
    levelDirs.foreach(d =>
      assert(new java.io.File(d, "_graft_level_done").exists()))

    // simulate the mid-build crash: the last TWO levels vanish (one of
    // them a with-duplicates level, so real reconstruction work remains)
    def rmRf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmRf))
      f.delete()
    }
    levelDirs.takeRight(2).foreach(rmRf)
    val killed = levelDirs.takeRight(2)
      .map(_.getName.stripPrefix("level-").toLong)

    // a fresh session (nothing cached) resumes from the surviving levels
    // and completes with the identical spectrum
    val s2 = spark.newSession()
    s2.conf.set("graft.suffixCheckpoint", "true")
    assert(collectSet(SuffixRepeats.suffixRepeats(s2, dir)) == baseline)
    // the killed levels were rebuilt and re-committed to scratch
    killed.foreach(b => assert(
      new java.io.File(scratch, s"level-$b/_graft_level_done").exists(),
      s"level-$b not recommitted"))
    // and longest_repeat over the resumed (file-backed) levels stays exact
    val lr = SuffixRepeats.longestRepeat(s2, dir).collect()(0)
    assert(lr.getLong(0) == bruteLongest(docs).toLong)
  }

  test("substr_dedup keeps exactly the docs under the coverage threshold, " +
      "and the threshold discriminates on the real corpus") {
    val sfd = "/root/testdata/sf0.001"
    val cov = SuffixRepeats.repeatCoverage(spark, sfd).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val got = SuffixRepeats.substrDedup(spark, sfd).collect()
    assert(got.length == cov.size)
    got.foreach(r => assert(r.getBoolean(3) ==
      (cov(r.getLong(0)) < SuffixRepeats.SubstrDropBp)))
    assert(got.exists(_.getBoolean(3)) && got.exists(!_.getBoolean(3)),
      "threshold must keep some docs and drop some at this SF")
  }

  test("longest_repeat degenerates cleanly: no repeated character at all") {
    val dir = writeDocsFixture(Seq(1L -> "abcdefg", 2L -> "hijklmn"))
    val r = SuffixRepeats.longestRepeat(spark, dir).collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getString(3) == "")
  }

  test("within-document repeats are found when nothing crosses documents") {
    val dir = writeDocsFixture(Seq(1L -> "tomtomtomtom distinct tail"))
    val r = SuffixRepeats.longestRepeat(spark, dir).collect()(0)
    // "tomtomtom" (9 chars) occurs at pos 0 and 3
    assert(r.getLong(0) == 9L, s"got ${r.getLong(0)}")
    val spec = SuffixRepeats.suffixRepeats(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spec(8L) >= 1L) // 8-char blocks repeat; xdoc = 0 everywhere
    val xdoc = SuffixRepeats.suffixRepeats(spark, dir).collect()
      .map(_.getLong(4)).sum
    assert(xdoc == 0L)
  }

  test("real-corpus cross-validation: longest_repeat vs brute force and the spectrum") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // exact longest repeat via monotone binary search over window sets
    def dupAt(l: Int): Boolean = {
      val seen = scala.collection.mutable.HashSet.empty[String]
      docs.exists { case (_, t) =>
        (0 to t.length - l).exists(p => !seen.add(t.substring(p, p + l)))
      }
    }
    var lo = 0
    var hi = docs.map(_._2.length).max
    while (lo < hi) {
      val mid = (lo + hi + 1) / 2
      if (dupAt(mid)) lo = mid else hi = mid - 1
    }
    val r = SuffixRepeats.longestRepeat(spark, sfDir).collect()(0)
    assert(r.getLong(0) == lo.toLong, s"max_len ${r.getLong(0)} != brute $lo")
    // family stats at max_len recomputed brute-force over the real corpus
    val fams = docs.flatMap { case (id, t) =>
        (0 to t.length - lo).map(p => (t.substring(p, p + lo), id)) }
      .groupBy(_._1).filter(_._2.size >= 2)
    assert(r.getLong(1) == fams.values.map(_.size.toLong).sum)
    assert(r.getLong(2) == fams.size.toLong)
    assert(r.getString(3).length == lo && fams.contains(r.getString(3)))
    // spectrum ↔ longest consistency (VERDICT r8 cross-validation):
    // families exist at every reported block ≤ max_len, at none above
    val spectrum = SuffixRepeats.suffixRepeats(spark, sfDir).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    spectrum.foreach { case (b, g) =>
      if (b <= lo) assert(g > 0, s"no families at block $b <= max_len $lo")
      else assert(g == 0L, s"families at block $b > max_len $lo")
    }
    val bMax = spectrum.filter(_._2 > 0).keys.max
    assert(lo >= bMax && lo <= 2 * bMax - 1)
  }
}
