package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** JSONL corpus I/O — the interchange format of LLM training corpora
  * (one JSON document per line, gzip part files).
  *
  * Scale notes: the schema is always EXPLICIT — `inferSchema` would be a
  * full extra pass over 100 TB before the real one; gzip parts are
  * line-splittable only per file, so write-side `parts` controls read
  * parallelism; a corrupt line yields a null row rather than a job abort
  * (PERMISSIVE, surfaced via `_corrupt_record` when kept).
  */
object JsonlSource {

  /** The documents-table schema, fixed (matches TESTDATA.md). */
  val DocumentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Write a documents frame as gzip JSONL part files. `parts > 0`
    * repartitions first — at scale, sized so each gz part is one read
    * task's worth (~128 MB uncompressed). */
  def writeJsonl(df: DataFrame, path: String, parts: Int = 0): Unit = {
    val out = if (parts > 0) df.repartition(parts) else df
    out.write.mode("overwrite").option("compression", "gzip").json(path)
  }

  /** Read a JSONL corpus with the explicit documents schema. */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(DocumentSchema).json(path)

  /** Committed fixture corpus backing the `jsonl_ingest` driver row
    * (generated once by scripts/make_jsonl_fixture.py; one gzip part, one
    * plain part, a corrupt line). Same classpath-materialization pattern
    * as the WARC fixtures. */
  lazy val FixtureDir: String =
    WarcSource.materializeFixture("jsonl",
      Seq("part-000.jsonl.gz", "part-001.jsonl"))

  /** Driver-contract query: [[readJsonl]] over the committed fixture.
    * Ignores `dir` — JSONL is a raw-file source, not an sfDir parquet
    * table (the warc_host_stats pattern). */
  def jsonlIngest(spark: SparkSession, dir: String): DataFrame =
    readJsonl(spark, FixtureDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text"))

  /** Oracle: exact VALUES literal, hand-written in
    * scripts/make_jsonl_fixture.py independently of the reader — checks
    * gzip + plain part mixing, unicode, embedded tab/newline escapes, the
    * empty text, and the PERMISSIVE corrupt line (exactly one all-null
    * row, not a job abort). */
  val jsonlIngestSql: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source,
      |  CAST(n_chars AS BIGINT) AS n_chars, text
      |FROM (VALUES
      |  (NULL, NULL, NULL, NULL, NULL),
      |  (1, 'en', 'web', 11, 'hello world'),
      |  (2, 'fr', 'books', 16, 'bonjour le monde'),
      |  (3, 'en', 'web', 0, ''),
      |  (4, 'de', 'web', 11, 'unicode ü ß'),
      |  (5, 'en', 'cc', 15, E'tab\tand\nnewline'))
      |  AS t(doc_id, lang, source, n_chars, text)""".stripMargin
}
