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

  /** Degenerate ROWS, not just degenerate tables (ADVICE r5): WARC
    * ingestion emits text="" for header-only responses, and an events
    * slice can contain zero 'view' rows — both make unguarded integral
    * divisions throw DIVIDE_BY_ZERO under Spark 4's default ANSI mode.
    * documents keeps a couple of real rows plus an empty and a
    * whitespace-only text; events keeps only non-view rows (n_viewers=0
    * in funnel_conversion). */
  private lazy val degenerateDir: String = {
    import org.apache.spark.sql.functions._
    val src = "/root/testdata/sf0.001"
    val d = java.nio.file.Files.createTempDirectory("graft-degen").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(2)
        .coalesce(1).write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    spark.read.parquet(s"$src/events.parquet")
      .where(col("event_type") =!= "view").limit(50)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val degen = docs.limit(2)
      .unionByName(docs.limit(1).withColumn("text", lit(""))
        .withColumn("doc_id", lit(900001L)).withColumn("n_chars", lit(0L)))
      .unionByName(docs.limit(1).withColumn("text", lit("   \n\t "))
        .withColumn("doc_id", lit(900002L)).withColumn("n_chars", lit(6L)))
    degen.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("every query executes on empty-text docs and a view-less events slice") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, degenerateDir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty,
      s"queries failing on degenerate rows:\n${failures.mkString("\n")}")
  }

  test("logreg_eval degrades to an all-zero card on an empty corpus, " +
      "never a NULL row (ADVICE r11)") {
    val rows = graft.operators.Classify.logregEval(spark, emptyDir).collect()
    assert(rows.length == 1)
    val r = rows.head
    // getLong on any NULL cell throws — the exact consumer the card must
    // not break; all seven columns must be concrete zeros
    Seq("tp", "fp", "fn", "tn", "precision_bp", "recall_bp", "f1_bp")
      .foreach { c =>
        assert(!r.isNullAt(r.fieldIndex(c)), s"$c is NULL on empty corpus")
        assert(r.getLong(r.fieldIndex(c)) == 0L, s"$c nonzero on empty corpus")
      }
  }
}
