package graft.sources

import org.apache.spark.sql.SparkSession

/** Registers the corpus parquet tables as temp views so the whole library
  * surface is reachable from `spark.sql` — the registered custom functions
  * (sort_chars, simhash60, char_entropy, shingle_poly_hash, float_dot,
  * nfc_normalize via GraftExtensions) compose with plain SQL over these
  * views exactly as the DataFrame API does. */
object Tables {

  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Create a temp view per table present under `dir`. */
  def register(spark: SparkSession, dir: String): Seq[String] =
    All.filter { name =>
      val path = s"$dir/$name.parquet"
      val exists = new java.io.File(path).exists() ||
        path.startsWith("s3") || path.startsWith("gs") || path.startsWith("hdfs")
      if (exists)
        spark.read.parquet(path).createOrReplaceTempView(name)
      exists
    }
}
