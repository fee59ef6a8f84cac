package graft

/** End-to-end pipeline: curation gates feed the batch-prep stages through
  * a re-corpused directory, so downstream artifacts cover exactly the
  * survivor set. */
class CurationPipelineSpec extends SparkTestBase {

  test("pipeline artifacts cover exactly the curated survivor set") {
    val sf = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    val manifest = CurationPipeline.run(spark, sf, out)

    val curated = graft.operators.Curation.curatedCorpus(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(manifest("curated_docs") == curated.size)
    assert(manifest("curated_docs") < manifest("raw_docs")) // gates really cut

    // every downstream artifact is over the survivors, nothing else
    val ordered = spark.read.parquet(s"$out/order")
      .collect().map(_.getLong(0)).toSet
    assert(ordered == curated) // the epoch shuffle is a permutation of them
    val packedDocs = spark.read.parquet(s"$out/packed")
      .collect().map(_.getLong(0)).toSet
    assert(packedDocs.subsetOf(curated)) // token-less docs may drop
    val chunkDocs = spark.read.parquet(s"$out/chunks")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(chunkDocs.subsetOf(curated))

    // pack_report totals agree with the packed placements
    val packTotal = spark.read.parquet(s"$out/packed")
      .groupBy().sum("n_tokens").collect().head.getLong(0)
    val reportTotal = spark.read.parquet(s"$out/pack_report")
      .groupBy().sum("total_tokens").collect().head.getLong(0)
    assert(packTotal == reportTotal)

    // manifest.json on disk mirrors the returned counts
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/manifest.json"))
    manifest.foreach { case (k, v) => assert(txt.contains(s""""$k":$v""")) }
  }
}
