package graft

import graft.operators.Classify

/** Brute-force twin of the trained multinomial Naive Bayes classifier:
  * the whole model — priors, smoothed likelihoods, normalizers — and every
  * document's argmax are recomputed here in plain Scala collections from
  * the raw parquet text, sharing no Spark expression with the production
  * path. */
class ClassifySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def r4(d: Double): BigDecimal =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP)

  test("nb_classify matches a from-scratch multinomial NB; " +
      "nb_confusion is its exact census") {
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split("\\s+").filter(_.nonEmpty).map(_.toLowerCase)))
    val nDocs = corpus.length.toLong
    val classes = corpus.map(_._2).distinct.sorted
    val cDocs = corpus.groupBy(_._2).map { case (c, xs) => c -> xs.size.toLong }
    // sparse (class, token) counts + per-class token mass + vocab
    val ct = scala.collection.mutable.HashMap.empty[(String, String), Long]
    corpus.foreach { case (_, c, toks) =>
      toks.foreach(t => ct((c, t)) = ct.getOrElse((c, t), 0L) + 1L) }
    val cToks = ct.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val vocab = corpus.flatMap(_._3).distinct.length.toLong
    val lnPrior = classes.map(c => c -> r4(math.log(cDocs(c).toDouble / nDocs))).toMap
    val lnZ = classes.map(c => c -> r4(math.log((cToks(c) + vocab).toDouble))).toMap
    val lnl = ct.map { case (k, n) => k -> r4(math.log((n + 1L).toDouble)) }

    val expected = corpus.map { case (id, trueLang, toks) =>
      val cnt = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val len = toks.length.toLong
      val scores = classes.map { c =>
        val sObs = cnt.map { case (t, n) =>
          lnl.get((c, t)).map(_ * n).getOrElse(BigDecimal(0)) }.sum
        c -> ((sObs + lnPrior(c) - lnZ(c) * len) * 10000).toLongExact
      }
      // deterministic argmax: max score, then FIRST class name
      val m = scores.map(_._2).max
      val (pred, best) = scores.filter(_._2 == m).minBy(_._1)
      Seq[Any](id, trueLang, pred, best)
    }.toSet
    val got = collectSet(Classify.nbClassify(spark, dir))
    assert(got == expected)
    // NOTE: no accuracy bar here — the driver corpus's lang labels are
    // synthetic and share one vocabulary, so ~44% is the data's ceiling
    // (the heuristic lang_id faces the same corpus). Separability is
    // asserted on the vocabulary-distinct fixture below.

    // confusion census is an exact projection
    val total = expected.size.toLong
    val expConf = expected.toSeq
      .groupBy(r => (r(1), r(2)))
      .map { case ((t, p), xs) =>
        Seq[Any](t, p, xs.size.toLong, xs.size.toLong * 10000 / total) }
      .toSet
    assert(collectSet(Classify.nbConfusion(spark, dir)) == expConf)
  }

  test("nb_classify separates vocabulary-distinct classes perfectly, " +
      "including docs with mixed evidence") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-nb").toString
    Seq(
      (1L, "chien chat maison rue pain", "fr"),
      (2L, "chien maison vin pain rue chat", "fr"),
      (3L, "dog cat house street bread", "en"),
      (4L, "dog house wine bread street cat", "en"),
      (5L, "hund katze haus strasse brot", "de"),
      (6L, "hund haus wein brot strasse katze", "de"),
      // mixed evidence: majority-French tokens with one English loanword
      (7L, "chien chat maison dog", "fr"),
      (8L, "dog cat house chien", "en"))
      .toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Classify.nbClassify(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    got.foreach { case (id, (trueLang, pred)) =>
      assert(pred == trueLang, s"doc $id: predicted $pred, true $trueLang") }
    // and the confusion census is the identity at 10000 bp total
    val conf = Classify.nbConfusion(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(conf.forall(c => c._1 == c._2))
    assert(conf.map(_._3).sum == 8L)
  }
}
