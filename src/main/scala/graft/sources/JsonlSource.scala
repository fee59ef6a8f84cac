package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
