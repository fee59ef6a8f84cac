package graft

import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._

/** The LevenshteinBoundRewrite optimizer rule: bounded edit-distance
  * predicates gain a length-gap prefilter + the banded threshold form,
  * with semantics preserved exactly (nulls included). */
class LevenshteinBoundSpec extends SparkTestBase {
  import spark.implicits._

  // parquet-backed so ConvertToLocalRelation can't constant-fold the
  // filter away before the plan assertions look for it
  private lazy val pairs = {
    val d = java.nio.file.Files.createTempDirectory("graft-lev").toString
    Seq(
      ("care", "core"),          // d=1
      ("care", "race"),          // d=2
      ("care", "careful"),       // length gap 3 -> prefilter rejects
      ("care", "bat"),           // d=4, gap 1 -> threshold form rejects
      (null.asInstanceOf[String], "x"), // null semantics must survive rewrite
      ("y", null.asInstanceOf[String]),
    ).toDF("a", "b").coalesce(1).write.mode("overwrite").parquet(d)
    spark.read.parquet(d)
  }

  test("rule rewrites <= k to a length prefilter + threshold levenshtein") {
    val df = pairs.where(levenshtein(col("a"), col("b")) <= 2)
    val opt = df.queryExecution.optimizedPlan
    val levs = opt.expressions.flatMap(_.collect { case l: Levenshtein => l })
    assert(levs.nonEmpty && levs.forall(_.threshold.isDefined),
      s"expected only threshold-form levenshtein, got $levs")
    // and the predicate result is unchanged vs a non-rewritable baseline
    val baseline = pairs
      .where(levenshtein(col("a"), col("b")) + lit(0) <= 2) // shape the rule skips
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == baseline && got == Set(("care", "core"), ("care", "race")))
  }

  test("rule handles the strict < and literal-first orientations") {
    def kept(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val lt = pairs.where(levenshtein(col("a"), col("b")) < 2)
    assert(kept(lt) == Set(("care", "core")))
    val ltLevs = lt.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case l: Levenshtein => l })
    assert(ltLevs.nonEmpty && ltLevs.forall(_.threshold.isDefined))
    val flipped = pairs.where(lit(2) >= levenshtein(col("a"), col("b")))
    assert(kept(flipped) == Set(("care", "core"), ("care", "race")))
  }

  test("rule is idempotent (fixpoint-safe) and fires inside join conditions") {
    import org.apache.spark.sql.graft.LevenshteinBoundRewrite
    val plan = pairs.where(levenshtein(col("a"), col("b")) <= 2)
      .queryExecution.analyzed
    val once = LevenshteinBoundRewrite(plan)
    val twice = LevenshteinBoundRewrite(once)
    assert(once == twice)
    // join condition context: the rewrite is a pure boolean-expression
    // transform, so a fuzzy equi-less join picks it up too
    val l = Seq(Tuple1("care")).toDF("a")
    val r = Seq(Tuple1("core"), Tuple1("bats")).toDF("b")
    val j = l.join(r, levenshtein(col("a"), col("b")) <= 1)
    val levs = j.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case lv: Levenshtein => lv })
    assert(levs.nonEmpty && levs.forall(_.threshold.isDefined))
    assert(j.collect().map(x => (x.getString(0), x.getString(1))).toSet ==
      Set(("care", "core")))
  }
}
