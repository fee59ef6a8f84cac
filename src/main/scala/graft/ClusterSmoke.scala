package graft

import org.apache.spark.sql.SparkSession

/** Multi-executor smoke validation (VERDICT r4 #4): everything else in the
  * build runs `local[n]` — a single JVM where closure serialization,
  * executor-side classloading and partition locality can silently not
  * matter. `local-cluster[2,4,2048]` starts two REAL worker processes with
  * separate executor JVMs, so the flagship anagram pipeline and one
  * LSH-family query (materialized signature frame + band-bucket self-join +
  * shuffle_hash pair verification) exercise serialization and partition
  * discipline off the single-JVM path.
  *
  * Usage: SPARK_HOME=/opt/spark …  runMain graft.ClusterSmoke <appJar> <sfDir>
  * The app jar ships the graft classes to the executor JVMs (spark.jars).
  * Prints one JSON line with the row counts; exits non-zero on failure.
  */
object ClusterSmoke {
  private def warcDocCount(spark: SparkSession): Long =
    graft.sources.WarcSource
      .documentsFromWarc(spark, graft.sources.WarcSource.FixtureDir).count()

  def main(args: Array[String]): Unit = {
    val Array(appJar, sfDir) = args.take(2)
    val spark = SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .appName("graft-cluster-smoke")
      .config("spark.jars", appJar)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // flagship: the full reference pipeline (ingest → normalize → strip →
      // tokenize → preprocess → signature → combine → shuffle → reduce)
      val anagrams = SparkEntry.queries("anagram_groups")(spark, sfDir).count()
      // LSH family: corpus-sized frames, persisted intermediates,
      // shuffle_hash-pinned joins — the serialization-heavy path
      val minhash = SparkEntry.queries("dedup_minhash")(spark, sfDir).count()
      // batch prep: shard-partitioned windows + salted-md5 shard assignment
      // (row_number over a real multi-executor exchange)
      val order = SparkEntry.queries("training_order")(spark, sfDir).count()
      // bloom probe: the BloomFilterAggregate blob is built on executors,
      // merged on the driver via a scalar subquery, and re-shipped to every
      // executor for the might_contain scan — a round trip only a real
      // multi-JVM cluster exercises
      val bloom = SparkEntry.queries("dedup_bloom")(spark, sfDir).count()
      // PQ serving path: two materialized quantizers (MEMORY_AND_DISK
      // persisted frames) consumed across executor JVMs + broadcast ADC
      // distance table
      val ivfpq = SparkEntry.queries("ann_ivfpq")(spark, sfDir).count()
      // recall audit layered on the same quantizers + the brute-force
      // broadcast baseline; and the WARC raw-file path end-to-end (the
      // classpath fixture must resolve inside executor JVMs too)
      val recall = SparkEntry.queries("ivfpq_recall")(spark, sfDir).count()
      val warc = SparkEntry.queries("warc_host_stats")(spark, sfDir).count()
      // domain cap: a source-partitioned rank window across executors
      val cap = SparkEntry.queries("source_cap")(spark, sfDir).count()
      // custom TypedImperativeAggregates: partial states are built on
      // executors and serialize()/deserialize() across JVM boundaries for
      // the merge — the byte codecs only genuinely run on a real cluster
      val hh = SparkEntry.queries("heavy_hitters")(spark, sfDir).count()
      val kmv = SparkEntry.queries("kmv_sample")(spark, sfDir).count()
      // iterative graph loop: per-round localCheckpoint blocks live in
      // executor block managers, not the driver
      val pr = SparkEntry.queries("dup_pagerank")(spark, sfDir).count()
      // WARC sink round-trip: the DSv2 WriteBuilder/WriterFactory must
      // serialize to real executor JVMs, temps must publish via driver-side
      // job commit, and the V2 reader must see exactly the written records
      val sinkDir = java.nio.file.Files
        .createTempDirectory("graft-cluster-warc").toString
      graft.sources.WarcSource.writeWarc(
        graft.sources.WarcSource.documentsFromWarc(
            spark, graft.sources.WarcSource.FixtureDir)
          .selectExpr("url", "warc_date", "'response' AS warc_type",
            "CAST(concat('HTTP/1.1 200 OK\r\n\r\n', text) AS BINARY) AS block"),
        sinkDir)
      val sinkRt = graft.sources.WarcSource
        .documentsFromWarc(spark, sinkDir).count()
      // sanity: the work genuinely ran on >1 executor JVM
      val executors = spark.sparkContext.statusTracker.getExecutorInfos
        .map(_.host()).length
      println(s"""{"smoke":"local-cluster[2,4,2048]","anagram_groups":$anagrams,"dedup_minhash":$minhash,"training_order":$order,"dedup_bloom":$bloom,"ann_ivfpq":$ivfpq,"ivfpq_recall":$recall,"warc_host_stats":$warc,"source_cap":$cap,"heavy_hitters":$hh,"kmv_sample":$kmv,"dup_pagerank":$pr,"warc_sink_roundtrip":$sinkRt,"executors":$executors}""")
      require(anagrams > 0, "anagram_groups returned no rows on local-cluster")
      require(minhash > 0, "dedup_minhash returned no rows on local-cluster")
      require(order > 0, "training_order returned no rows on local-cluster")
      require(bloom > 0, "dedup_bloom returned no rows on local-cluster")
      require(ivfpq > 0, "ann_ivfpq returned no rows on local-cluster")
      require(recall > 0, "ivfpq_recall returned no rows on local-cluster")
      require(warc > 0, "warc_host_stats returned no rows on local-cluster")
      require(cap > 0, "source_cap returned no rows on local-cluster")
      require(hh > 0, "heavy_hitters returned no rows on local-cluster")
      require(kmv > 0, "kmv_sample returned no rows on local-cluster")
      require(pr > 0, "dup_pagerank returned no rows on local-cluster")
      require(sinkRt == warcDocCount(spark),
        "warc sink round-trip lost records on local-cluster")
    } finally spark.stop()
  }
}
