package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * entry maps to. Every `queries` key has a DuckDB oracle in `oracleSql`
  * except ops SQL can't express (rows-only checks, see SURVEY.md §6). */
object SparkEntry {

  /** Flagship: the reference's anagram pipeline (groups per signature) on
    * sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Anagrams.anagramGroups(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // reference pipeline (§2 #1-14)
    "ingest_documents" -> Anagrams.ingestDocuments _,
    "utf8_normalize" -> Anagrams.utf8Normalize _,
    "normalize_unicode" -> Anagrams.normalizeUnicode _,
    "strip_gutenberg" -> Anagrams.stripGutenbergQ _,
    "tokenize" -> Anagrams.tokenize _,
    "doc_unique_words" -> Anagrams.docUniqueWords _,
    "partition_stats" -> Anagrams.partitionStats _,
    "preprocess_words" -> Anagrams.preprocessWords _,
    "anagram_signatures" -> Anagrams.anagramSignatures _,
    "combine_per_doc" -> Anagrams.combinePerDoc _,
    "shuffle_assignment" -> Anagrams.shuffleAssignment _,
    "anagram_groups" -> Anagrams.anagramGroups _,
    "anagrams" -> Anagrams.anagrams _,
    "anagrams_seeded" -> Anagrams.anagramsSeeded _,
    "anagram_output_lines" -> Anagrams.anagramOutputLines _,
    // LLM dedup (§2 #15-19)
    "dedup_exact" -> Dedup.dedupExact _,
    "dedup_canonical" -> Dedup.dedupCanonical _,
    "dedup_minhash" -> Dedup.dedupMinhash _,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccard _,
    "dedup_simhash" -> Dedup.dedupSimhash _,
    "dedup_embedding" -> Dedup.dedupEmbedding _,
    "dedup_components" -> Dedup.dedupComponents _,
    "dedup_survivors" -> Dedup.dedupSurvivors _,
    // similarity search (§2 #20-21)
    "ann_topk" -> Similarity.annTopk _,
    "ann_lsh" -> Similarity.annLsh _,
    "ann_ivf" -> Similarity.annIvf _,
    "ann_join" -> Similarity.annJoin _,
    "ann_range_search" -> Similarity.annRangeSearch _,
    "embedding_clusters" -> Similarity.embeddingClusters _,
    "embedding_quantize" -> Similarity.embeddingQuantize _,
    "cluster_purity" -> Similarity.clusterPurity _,
    // text analysis (§2 #22-25)
    "lang_id" -> TextAnalysis.langId _,
    "quality_score" -> TextAnalysis.qualityScore _,
    "token_count" -> TextAnalysis.tokenCount _,
    "fingerprint" -> TextAnalysis.fingerprint _,
    "tfidf_top_terms" -> TextAnalysis.tfidfTopTerms _,
    "sample_deterministic" -> TextAnalysis.sampleDeterministic _,
    "redact_pii" -> TextAnalysis.redactPii _,
    "word_bigrams" -> TextAnalysis.wordBigrams _,
    "lm_perplexity" -> TextAnalysis.lmPerplexity _,
    "repetition_stats" -> TextAnalysis.repetitionStats _,
    "boilerplate_ngrams" -> TextAnalysis.boilerplateNgrams _,
    "corpus_mix" -> TextAnalysis.corpusMix _,
    "length_histogram" -> TextAnalysis.lengthHistogram _,
    "zipf_stats" -> TextAnalysis.zipfStats _,
    // curation (§2 #25i-25k)
    "dedup_segments" -> Curation.dedupSegments _,
    "gopher_filters" -> Curation.gopherFilters _,
    "dup_ngram_stats" -> Curation.dupNgramStats _,
    "sample_stratified" -> Curation.sampleStratified _,
    "decontaminate" -> Curation.decontaminate _,
    "char_stats" -> Curation.charStats _,
    "curated_corpus" -> Curation.curatedCorpus _,
    // multimodal (§2 #26)
    "multimodal_meta" -> Multimodal.multimodalMeta _,
    "multimodal_frames" -> Multimodal.multimodalFrames _,
    // supplementary OLAP + events (§2 #27-31)
    "q1_agg" -> Relational.q1Agg _,
    "join_enrich" -> Relational.joinEnrich _,
    "top_customers_window" -> Relational.topCustomersWindow _,
    "events_window_agg" -> Relational.eventsWindowAgg _,
    "events_sliding_agg" -> Relational.eventsSlidingAgg _,
    "mix_rollup" -> Relational.mixRollup _,
    "sessionize" -> Relational.sessionize _,
    "asof_join" -> Relational.asofJoin _,
    "asof_join_native" -> Relational.asofJoinNative _,
    "range_join_counts" -> Relational.rangeJoinCounts _,
    "value_quantiles" -> Relational.valueQuantiles _,
    "event_pivot" -> Relational.eventPivot _,
    "salted_event_counts" -> Relational.saltedEventCounts _,
    "salted_join_enrich" -> Relational.saltedJoinEnrich _,
    "brand_revenue" -> Relational.brandRevenue _,
    "approx_stats" -> Relational.approxStats _, // rows-only: sketches are engine-specific
  )

  /** DuckDB-equivalent SQL per query (same math, shared constants).
    * `partition_stats` is rows-only by design (spark_partition_id has no
    * SQL equivalent). */
  def oracleSql: Map[String, String] = Map(
    "ingest_documents" -> Anagrams.ingestDocumentsSql,
    "utf8_normalize" -> Anagrams.utf8NormalizeSql,
    "normalize_unicode" -> Anagrams.normalizeUnicodeSql,
    "strip_gutenberg" -> Anagrams.stripGutenbergSql,
    "tokenize" -> Anagrams.tokenizeSql,
    "doc_unique_words" -> Anagrams.docUniqueWordsSql,
    "preprocess_words" -> Anagrams.preprocessWordsSql,
    "anagram_signatures" -> Anagrams.anagramSignaturesSql,
    "combine_per_doc" -> Anagrams.combinePerDocSql,
    "shuffle_assignment" -> Anagrams.shuffleAssignmentSql,
    "anagram_groups" -> Anagrams.anagramGroupsSql,
    "anagrams" -> Anagrams.anagramsSql,
    "anagrams_seeded" -> Anagrams.anagramsSeededSql,
    "anagram_output_lines" -> Anagrams.anagramOutputLinesSql,
    "dedup_exact" -> Dedup.dedupExactSql,
    "dedup_canonical" -> Dedup.dedupCanonicalSql,
    "dedup_minhash" -> Dedup.dedupMinhashSql,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccardSql,
    "dedup_simhash" -> Dedup.dedupSimhashSql,
    "dedup_embedding" -> Dedup.dedupEmbeddingSql,
    "dedup_components" -> Dedup.dedupComponentsSql,
    "dedup_survivors" -> Dedup.dedupSurvivorsSql,
    "ann_topk" -> Similarity.annTopkSql,
    "ann_lsh" -> Similarity.annLshSql,
    "ann_ivf" -> Similarity.annIvfSql,
    "ann_join" -> Similarity.annJoinSql,
    "ann_range_search" -> Similarity.annRangeSearchSql,
    "embedding_clusters" -> Similarity.embeddingClustersSql,
    "embedding_quantize" -> Similarity.embeddingQuantizeSql,
    "cluster_purity" -> Similarity.clusterPuritySql,
    "lang_id" -> TextAnalysis.langIdSql,
    "quality_score" -> TextAnalysis.qualityScoreSql,
    "token_count" -> TextAnalysis.tokenCountSql,
    "fingerprint" -> TextAnalysis.fingerprintSql,
    "tfidf_top_terms" -> TextAnalysis.tfidfTopTermsSql,
    "sample_deterministic" -> TextAnalysis.sampleDeterministicSql,
    "redact_pii" -> TextAnalysis.redactPiiSql,
    "word_bigrams" -> TextAnalysis.wordBigramsSql,
    "lm_perplexity" -> TextAnalysis.lmPerplexitySql,
    "repetition_stats" -> TextAnalysis.repetitionStatsSql,
    "boilerplate_ngrams" -> TextAnalysis.boilerplateNgramsSql,
    "corpus_mix" -> TextAnalysis.corpusMixSql,
    "length_histogram" -> TextAnalysis.lengthHistogramSql,
    "zipf_stats" -> TextAnalysis.zipfStatsSql,
    "dedup_segments" -> Curation.dedupSegmentsSql,
    "gopher_filters" -> Curation.gopherFiltersSql,
    "dup_ngram_stats" -> Curation.dupNgramStatsSql,
    "sample_stratified" -> Curation.sampleStratifiedSql,
    "decontaminate" -> Curation.decontaminateSql,
    "char_stats" -> Curation.charStatsSql,
    "curated_corpus" -> Curation.curatedCorpusSql,
    "multimodal_meta" -> Multimodal.multimodalMetaSql,
    "multimodal_frames" -> Multimodal.multimodalFramesSql,
    "q1_agg" -> Relational.q1AggSql,
    "join_enrich" -> Relational.joinEnrichSql,
    "top_customers_window" -> Relational.topCustomersWindowSql,
    "events_window_agg" -> Relational.eventsWindowAggSql,
    "events_sliding_agg" -> Relational.eventsSlidingAggSql,
    "mix_rollup" -> Relational.mixRollupSql,
    "sessionize" -> Relational.sessionizeSql,
    "asof_join" -> Relational.asofJoinSql,
    "asof_join_native" -> Relational.asofJoinSql, // same semantic, same oracle
    "range_join_counts" -> Relational.rangeJoinCountsSql,
    "value_quantiles" -> Relational.valueQuantilesSql,
    "event_pivot" -> Relational.eventPivotSql,
    "salted_event_counts" -> Relational.saltedEventCountsSql,
    "salted_join_enrich" -> Relational.saltedJoinEnrichSql,
    "brand_revenue" -> Relational.brandRevenueSql,
  )
}
