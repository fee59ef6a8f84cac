package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** The composed end product as a runnable job: curate the raw corpus, then
  * run the batch-preparation stages OVER THE SURVIVORS — not the raw
  * table — writing the artifact tree a training run consumes:
  *
  * ```
  * outDir/corpus/documents.parquet   curated survivors (with text)
  * outDir/chunks/                    overlapping training windows
  * outDir/packed/                    sequence-packing placements
  * outDir/pack_report/               per-shard padding efficiency
  * outDir/order/                     reproducible epoch shuffle
  * outDir/manifest.json              row counts per artifact
  * ```
  *
  * The downstream stages are the SAME operators the driver's oracle gate
  * verifies (`chunk_documents`, `pack_sequences`, `pack_stats`,
  * `training_order`) — pointed at the curated corpus directory instead of
  * the raw one. Re-corpusing through a directory keeps every stage's input
  * contract identical (a `documents.parquet` of any provenance), which is
  * also the 100 TB shape: each stage reads/writes columnar tables, so any
  * stage can restart independently.
  *
  * Usage: runMain graft.CurationPipeline <sfDir> <outDir>
  */
object CurationPipeline {

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = run(spark, sfDir, outDir)
    println(counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
    spark.stop()
  }

  /** Runs the pipeline; returns the manifest row counts. */
  def run(spark: SparkSession, sfDir: String, outDir: String): Map[String, Long] = {
    import graft.operators.Curation
    // stage 1: curation (quality + language + dedup + decontamination
    // gates, all oracle-verified individually) — survivors keep their text
    // via a doc_id equi-join back to the raw table (co-hash join at scale)
    val survivors = Curation.curatedCorpus(spark, sfDir).select("doc_id")
    val corpusDir = s"$outDir/corpus"
    spark.read.parquet(s"$sfDir/documents.parquet")
      .join(survivors, "doc_id")
      .write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")

    // stage 2: batch preparation over the curated corpus directory
    val stages: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq(
        "chunks" -> (Curation.chunkDocuments _),
        "packed" -> (Curation.packSequences _),
        "pack_report" -> (Curation.packStats _),
        "order" -> (Curation.trainingOrder _))
    val stageCounts = stages.map { case (name, fn) =>
      val df = fn(spark, corpusDir)
      df.write.mode("overwrite").parquet(s"$outDir/$name")
      name -> spark.read.parquet(s"$outDir/$name").count()
    }

    val manifest = (Map(
      "raw_docs" -> spark.read.parquet(s"$sfDir/documents.parquet").count(),
      "curated_docs" -> spark.read.parquet(s"$corpusDir/documents.parquet").count())
      ++ stageCounts)
    Files.writeString(Paths.get(s"$outDir/manifest.json"),
      manifest.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
    manifest
  }

  /** WARC → documents → curate: ingest a raw crawl directory into the
    * `documents` contract (source = crawl host, lang unknown — language is
    * PREDICTED downstream by the curation gate), write it as a corpus
    * directory, then run the standard pipeline unchanged over it. This is
    * the full 100 TB shape end-to-end: raw WARC files in, packed training
    * artifacts out, every intermediate a restartable columnar table.
    *
    * Note the contamination probe-set convention (doc_id < ContamProbeDocs
    * marks probe docs) cannot trigger on WARC corpora: ids are 60-bit
    * md5 hashes, so the probe set is empty and decontamination is a no-op
    * — a real deployment would pass its benchmark table separately. */
  def runFromWarc(spark: SparkSession, warcDir: String, outDir: String): Map[String, Long] = {
    import org.apache.spark.sql.functions._
    val rawDir = s"$outDir/raw"
    graft.sources.WarcSource.documentsFromWarc(spark, warcDir)
      .select(col("doc_id"),
        lit("und").as("lang"),
        graft.sources.WarcSource.hostCol(col("url")).as("source"),
        length(col("text")).cast("long").as("n_chars"),
        col("text"))
      .write.mode("overwrite").parquet(s"$rawDir/documents.parquet")
    run(spark, rawDir, outDir)
  }
}
