package graft

import graft.operators.{Dedup, Materialized, Multimodal}

/** Lifecycle of the per-(session, corpus) materialized intermediates
  * (ADVICE r3): session-instance cache scoping, and full storage release —
  * including the per-round localCheckpoint blocks behind dedupComponents —
  * on clearAll(). */
class MaterializedSpec extends SparkTestBase {

  // two identical long docs + one distinct: a non-empty near-dup pair graph
  private lazy val dupDir = writeDocsFixture(Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again " * 5),
    (2L, "the quick brown fox jumps over the lazy dog again and again " * 5),
    (3L, "completely unrelated content about distributed query engines " * 5)))

  test("caches are scoped to the session instance, not the application") {
    val twin = spark.newSession()
    val a = Dedup.sigSets(spark, dupDir)
    val b = Dedup.sigSets(twin, dupDir)
    // newSession() shares the applicationId; a frame resolved under one
    // session must not be served to the other
    assert(a ne b)
    assert(a.sparkSession eq spark)
    assert(b.sparkSession eq twin)
  }

  test("dedupComponents frees per-round checkpoint blocks eagerly and clearAll the rest") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val comps = Dedup.dedupComponents(spark, dupDir)
    assert(comps.count() == 2) // docs 1+2 form one component of 2 members
    // the iteration's localCheckpoint blocks are released as soon as the
    // final labels frame is persisted: the only persistent RDDs added by
    // the chain are the four Materialized frames (sigSets, candidatePairs,
    // minhashPairs, component labels) — a leak would add one per round
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.size <= 4, s"checkpoint blocks leaked: ${added.size} RDDs pinned")
    Materialized.clearAll()
    // every frame materialized by this chain is gone; suites run
    // sequentially in the forked JVM so no concurrent registrations race
    assert(sc.getPersistentRDDs.keySet.subsetOf(before))
    assert(Materialized.size == 0)
  }

  test("multimodal frames fail loudly on non-ASCII text") {
    val dir = writeDocsFixture(Seq(
      (1L, "plain ascii body " * 10), (2L, "héllo wörld " * 10)))
    val err = intercept[Exception] {
      Multimodal.multimodalFrames(spark, dir).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("non-ASCII")), err.toString)
  }
}
