package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.TextFns._

/** Property-style checks over generated inputs (ScalaCheck generators drawn
  * deterministically, evaluated through the real Spark expressions). */
class PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def draw[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val word: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val messy: Gen[String] = for {
    pre <- Gen.listOf(Gen.oneOf('.', ';', '1', '[', '\'')).map(_.mkString)
    w <- word
    post <- Gen.listOf(Gen.oneOf('!', ',', '9', ']')).map(_.mkString)
  } yield pre + w + post

  test("property: signature is permutation-invariant and idempotent") {
    val ws = draw(word, 300)
    val shuffled = ws.map(w => new String(scala.util.Random.shuffle(w.toList).toArray))
    val rows = ws.zip(shuffled).toDF("a", "b")
      .select(signature(col("a")).as("sa"), signature(col("b")).as("sb"),
        signature(signature(col("a"))).as("saa"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"permutation: $r")
      assert(r.getString(0) == r.getString(2), s"idempotence: $r")
    }
  }

  test("property: trim output never starts/ends with a non-letter; idempotent") {
    val rows = draw(messy, 300).toDF("w")
      .select(trimNonAlpha(col("w")).as("t"),
        trimNonAlpha(trimNonAlpha(col("w"))).as("tt"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      assert(t.isEmpty || (t.head.isLetter && t.last.isLetter), s"'$t'")
      assert(t == r.getString(1), "idempotence")
    }
  }

  test("property: preprocessed words are letters-only non-stopwords") {
    val out = draw(messy, 300).toDF("w")
      .select(trimNonAlpha(lower(col("w"))).as("w"))
      .where(isCleanWord(col("w")))
      .as[String].collect()
    out.foreach { w =>
      assert(w.matches("^\\p{L}+$"), s"'$w'")
      assert(!Stopwords.contains(w), s"stopword leaked: '$w'")
    }
  }

  test("property: md5Long is within [0, 2^60) and deterministic") {
    val ws = draw(word, 200)
    val a = ws.toDF("w").select(md5Long(col("w")).as("h")).as[Long].collect()
    val b = ws.toDF("w").select(md5Long(col("w")).as("h")).as[Long].collect()
    assert(a.toSeq == b.toSeq)
    a.foreach(h => assert(h >= 0 && h < (1L << 60)))
  }

  test("property: minhash sim_hat tracks true Jaccard on synthetic overlaps") {
    // doc pairs sharing a controlled fraction of shingles: sim_hat must
    // correlate (loose statistical bound, K=32 → σ≈0.09)
    val base = draw(word, 60).distinct
    val docA = base.mkString(" ")
    val docB = (base.take(base.length / 2) ++ draw(word, 40).map(_.reverse)).distinct.mkString(" ")
    val dir = writeDocsFixture(Seq(1L -> docA, 2L -> docB, 3L -> docA))
    val sigs = graft.operators.Dedup.signatures(spark, dir).collect()
      .map(r => r.getLong(0) -> (1 to graft.operators.Dedup.K).map(r.getLong)).toMap
    val simIdentical = sigs(1L).zip(sigs(3L)).count(p => p._1 == p._2).toDouble / graft.operators.Dedup.K
    val simPartial = sigs(1L).zip(sigs(2L)).count(p => p._1 == p._2).toDouble / graft.operators.Dedup.K
    assert(simIdentical == 1.0)
    assert(simPartial < 1.0 && simPartial > 0.05)
  }
}
