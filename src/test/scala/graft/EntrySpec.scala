package graft

/** Guards the driver contract: the flagship must return rows and every
  * queries key must have either an oracle or a documented rows-only check. */
class EntrySpec extends SparkTestBase {

  test("entry flagship returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has an oracle except documented rows-only ops") {
    // bpe_merges: iterative data-dependent argmax fixpoint — no single-SQL
    // oracle exists; brute-force-verified in PipelineOpsSpec instead
    // longest_repeat: the exact-max refinement needs the doubling ranks —
    // an iterative fixpoint with driver-side round control (brute-forced
    // in SuffixRepeatsSpec). suffix_repeats' SPECTRUM, by contrast, has a
    // window-explode brute-force oracle and is fully gated.
    // unigram_vocab/encode/fertility: EM fixpoint over collected per-round
    // state — the bpe_merges no-single-SQL argument; brute-forced from
    // scratch in PipelineOpsSpec (unigram_seed_counts, the round-0
    // statistic, IS fully oracled)
    // wordpiece_merges/encode: iterative likelihood-argmax fixpoint + the
    // greedy encode over its result — the bpe_merges argument; brute-forced
    // from scratch in PipelineOpsSpec (wordpiece_pair_scores, the round-0
    // statistic, IS fully oracled)
    // bbpe_merges/encode: byte-level BPE — the same iterative-argmax
    // no-single-SQL argument as bpe_merges; brute-forced from scratch in
    // PipelineOpsSpec (bbpe_pair_counts, the round-0 statistic, IS
    // fully oracled)
    // compression_stats/compression_agreement: DuckDB has no deflate, so
    // no SQL oracle can exist for any deflate-derived number; brute-forced
    // against direct java.util.zip calls in CurationSpec (the per-doc
    // compression_ratio row IS fully oracled via CPython-zlib literals)
    // mmr_select: greedy argmax fixpoint over the bounded relevance pool —
    // the bpe_merges argument; brute-forced from scratch in SimilaritySpec
    // embedding_pca/pca_project: subspace-iteration eigen fixpoint (and
    // its projection) — no single-SQL oracle; eigen-properties verified
    // against an independent covariance in SimilaritySpec
    val rowsOnly = Set("partition_stats", "approx_stats", "bpe_merges",
      "compression_stats", "compression_agreement",
      "bpe_encode", "bbpe_merges", "bbpe_encode",
      "dup_pagerank", "longest_repeat",
      "unigram_vocab", "unigram_encode", "unigram_fertility",
      "wordpiece_merges", "wordpiece_encode", "tokenizer_faceoff",
      // domain_hits: the same iterative-fixpoint argument as
      // domain_pagerank; brute-forced against an independent in-memory
      // HITS in WarcSourceSpec
      "domain_pagerank", "domain_hits",
      "logreg_train", "logreg_score", "logreg_eval",
      "logreg_calibration", "mmr_select", "embedding_pca", "pca_project")
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet == rowsOnly)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("all queries run at the smoke scale factor sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, s"$name failed")
    }
  }
}
