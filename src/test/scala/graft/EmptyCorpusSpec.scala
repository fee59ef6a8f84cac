package graft

/** Degenerate-input gate: every registered query must run (not throw) on a
  * 0-row corpus with the full driver schema. At 100 TB, empty partitions,
  * empty date slices and empty sources are routine; an operator that
  * divides by a zero count, runs `sequence` backwards, or never converges
  * on an empty graph fails here instead of in production. Row counts are
  * not asserted — only that each plan executes. */
class EmptyCorpusSpec extends SparkTestBase {

  private lazy val emptyDir: String = {
    val src = "/root/testdata/sf0.001"
    val d = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }

  test("every query executes on a 0-row corpus without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty,
      s"queries failing on an empty corpus:\n${failures.mkString("\n")}")
  }
}
