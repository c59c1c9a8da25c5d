package graft

import org.apache.spark.sql.DataFrame

import graft.llmdata.{Dedup, TextAnalysis}
import graft.relational.{EventsAnalytics, Relational}

/** Results must not depend on input split boundaries — the single-file
  * fixtures scan as one partition, which can MASK partial-aggregation
  * order dependence that a real cluster would expose. Shrinking
  * maxPartitionBytes forces many input splits; every oracle-checked query
  * family with reduction risk must produce identical rows. */
class PartitionInvarianceSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val risky: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)] =
    Seq(
      "q1_pricing_summary" -> Relational.q1PricingSummary _,
      "tx4_quality_score" -> TextAnalysis.qualityScore _,
      "dd8_kmv_distinct" -> Dedup.kmvDistinctShingles _,
      "ev1_tumbling_window" -> EventsAnalytics.tumblingWindow _,
      "ev2_sessionize" -> EventsAnalytics.sessionize _,
      "dd3_minhash_lsh" -> Dedup.minhashLsh _,
      "ev7_cms_heavy_hitters" -> EventsAnalytics.cmsHeavyHitters _,
      "dd6_ngram_jaccard" -> Dedup.ngramJaccard _,
      "cdc1_decode" -> graft.operators.CdcQueries.decodeHeaders _,
      "cdc2_route_enrich" -> graft.operators.CdcQueries.routeEnrich _,
      "cdc3_materialize" -> graft.operators.CdcQueries.materializeLatest _,
      // tx10's first-occurrence MIN and dd13's shared-gram counts are
      // reductions whose partial-agg order must not leak into results
      "tx10_repeated_chunks" -> TextAnalysis.repeatedChunkRemoval _,
      "dd13_decontaminate" -> Dedup.decontaminate _,
      "dd5_simhash_neardup" -> Dedup.simhashNearDup _,
      // round-5 ops: tx13's two-level counts, tx14's windowed cumsum,
      // cur3's micro-unit normalizer sum, dd15's distinct position set,
      // cdc9's per-key lead — all reductions or ordered windows
      "tx13_repetition_signals" -> TextAnalysis.repetitionSignals _,
      "tx14_sequence_packing" -> TextAnalysis.sequencePacking _,
      "cur3_mixture_weights" -> graft.llmdata.Curation.mixtureWeights _,
      "dd15_bloom_prefilter" -> Dedup.bloomPrefilter _,
      "cdc9_scd2_history" -> graft.operators.CdcQueries.scd2History _,
      "ss6_ann_pq" -> graft.llmdata.Similarity.annPq _,
      // fm1's stop-gram df counts are a reduction the blocking depends on
      "fm1_fuzzy_match" -> graft.operators.FuzzyMatch.fuzzyMatch _,
      // round-7 ops: tx16's corpus-wide window counts + per-doc interval
      // merge, ss7/ss8's trained index + bounded-heap shortlists, dd16's
      // capped band buckets, dd17's component census, ev10's 4-way window
      // expansion — all reductions whose partial order must not leak
      "tx16_dup_spans" -> TextAnalysis.duplicatedSpans _,
      "ss7_ann_ivfpq" -> graft.llmdata.Similarity.annIvfPq _,
      "ss8_ann_sq8" -> graft.llmdata.Similarity.annSq _,
      "dd16_minhash_estimate" -> Dedup.minhashEstimate _,
      "dd17_soft_dedup" -> Dedup.softDedupWeights _,
      "ev10_hopping_window" -> EventsAnalytics.hoppingWindow _,
      // dd18's struct-MAX nearest pick, tx17's df counts, cur5's global
      // ntile, ev11's per-window ranks, cdc10's lag-gap rollup, q33's
      // double-role dim join — all reductions or ordered windows
      "dd18_semantic_admission" -> Dedup.semanticAdmission _,
      "tx17_novelty" -> TextAnalysis.noveltyScore _,
      "cur5_curriculum" -> graft.llmdata.Curation.curriculumSchedule _,
      "ev11_trending" -> EventsAnalytics.trendingWindow _,
      "cdc10_replay_audit" -> graft.operators.CdcQueries.replayAudit _,
      "q33_volume_shipping" -> Relational.q33VolumeShipping _,
      // ev12's running-max lateness replay, tx18's two-level vocabulary
      // counts — partial-agg order must not leak
      "ev12_lateness_audit" -> EventsAnalytics.latenessAudit _,
      "tx18_bpe_pairs" -> TextAnalysis.bpePairCounts _,
      "cur6_dataset_card" -> graft.llmdata.Curation.datasetCard _,
      "ss9_rrf_fusion" -> graft.llmdata.Similarity.annRrfFusion _,
      // cdc11's distinct-set collects, q35's per-order distinct counts,
      // fm3's df counts — reductions all
      "cdc11_txn_assembly" -> graft.operators.CdcQueries.txnAssembly _,
      "q35_sole_late_supplier" -> Relational.q35SoleLateSupplier _,
      "fm3_fuzzy_match_edit" -> graft.operators.FuzzyMatch.fuzzyMatchEdit _,
      "ev13_rate_anomaly" -> EventsAnalytics.rateAnomaly _,
      // ss10's Lloyd-step centroid means — the exact nano-unit sums must
      // hold under any partial-agg schedule
      "ss10_ann_ivf_refined" -> graft.llmdata.Similarity.annIvfRefined _,
      "cur1_corpus_curation" -> graft.llmdata.Curation.corpusCuration _,
      // round-8 additions with order-sensitive inner arithmetic:
      // tx19/cur7 micro-unit sums, ev15 register max + term sum,
      // cdc14's changed-field classification under a full-outer join
      "tx19_bigram_quality" -> graft.llmdata.TextAnalysis.bigramQuality _,
      "cur7_contamination_mixture" -> graft.llmdata.Curation.contaminationAwareMixture _,
      "ev15_hll_distinct" -> EventsAnalytics.hllDistinct _,
      "cdc14_snapshot_diff" -> graft.operators.CdcQueries.snapshotDiffEvents _,
      // iterative integer recurrence — the trajectory must not depend on
      // how the edge joins and contribution sums are scheduled
      "dd21_pagerank" -> graft.llmdata.Dedup.pagerank _,
      // cur5b's quartile cut points come off a collected histogram — the
      // exact bin counts (and so the cuts) must not depend on split size
      "cur5b_curriculum_sketch" -> graft.llmdata.Curation.curriculumScheduleSketch _,
      // round-10 additions: cur9's waterfilling runs off corpus token-mass
      // sums (the level selection must not move with partial-agg order),
      // dd22's per-cluster struct-MAX argmax, tx21's per-band BIGINT
      // rollup, q38's per-group DECIMAL threshold, ss11's filtered
      // assignment + rank
      "cur9_token_budget" -> graft.llmdata.Curation.tokenBudget _,
      "dd22_canonical_rep" -> Dedup.canonicalReps _,
      "tx21_lexical_complexity" -> TextAnalysis.lexicalComplexity _,
      "q38_above_avg_supplier" -> Relational.q38AboveAvgSupplier _,
      "ss11_ann_filtered" -> graft.llmdata.Similarity.annIvfFiltered _,
      // round-11 additions: cur10's vocab surprisal table is a token-keyed
      // count reduction feeding exact BIGINT sums, tx22's type→min(doc_id)
      // first-appearance is the classic partial-agg-order trap, dd23's
      // wedge join reads the order-free edge set, fm4's df-capped blocking
      // + min-struct pick, ev17's day-cell counts feed the merged walk
      "cur10_unigram_lm_filter" -> graft.llmdata.Curation.unigramLmFilter _,
      "tx22_vocab_growth" -> TextAnalysis.vocabGrowth _,
      "dd23_triangle_census" -> Dedup.triangleCensus _,
      "fm4_fuzzy_match_damerau" -> graft.operators.FuzzyMatch.fuzzyMatchDamerau _,
      "ev17_hist_merge" -> EventsAnalytics.histMergeWeekly _,
      // this round's additions: cur11's per-bucket log-ratio table feeds
      // exact BIGINT doc sums, dd24's capped fingerprint postings, ev18's
      // idempotent register-MAX merge, tx23's per-source type counts +
      // head rank, fm5's min-struct pick, q39's scalar-threshold compare
      "cur11_dsir_weights" -> graft.llmdata.Curation.dsirWeights _,
      "dd24_winnowing" -> Dedup.winnowingNearDup _,
      "ev18_hll_merge" -> EventsAnalytics.hllMergeWeekly _,
      "tx23_zipf_profile" -> TextAnalysis.zipfProfile _,
      "fm5_fuzzy_match_token_sort" -> graft.operators.FuzzyMatch.fuzzyMatchTokenSort _,
      "q39_idle_rich_customers" -> Relational.q39IdleRichCustomers _,
      // mm8's per-cell micro-nat quantization must see the SAME exact
      // (c, n) integers under any split; ss12 joins bounded result lists
      "mm8_byte_entropy" -> graft.llmdata.Multimodal.byteEntropy _,
      "ss12_recall_audit" -> graft.llmdata.Similarity.annRecallAudit _,
      // third r11 batch: cur12's three gram-count model tables feed exact
      // BIGINT NLL sums (partial-agg order must not move any count),
      // ev19's bounded-heap k-minima must be the SAME set under any
      // split, ev20's per-step MINs, ev21's dyadic BIGINT weight sums,
      // ss13's two float rankings, q40's per-set aggregate cells
      "cur12_trigram_lm_filter" -> graft.llmdata.Curation.trigramLmFilter _,
      "ev19_theta_set_ops" -> EventsAnalytics.thetaSetOps _,
      "ev20_sequence_match" -> EventsAnalytics.sequenceMatch _,
      "ev21_decayed_counters" -> EventsAnalytics.decayedCounters _,
      "ss13_mips_augmented" -> graft.llmdata.Similarity.mipsAugmented _,
      "q40_grouping_sets" -> Relational.q40GroupingSets _,
      // dd25's per-pair quantized S-curve sums, ss14's per-cell micro sums
      "dd25_lsh_tuning" -> Dedup.lshTuning _,
      "ss14_cluster_quality" -> graft.llmdata.Similarity.clusterQuality _,
      // fm6's max-struct pick over quantized JW scores
      "fm6_fuzzy_match_jaro_winkler" ->
        graft.operators.FuzzyMatch.fuzzyMatchJaroWinkler _,
      // ss15's per-query positive-anchor MAX then margin-filtered rank
      "ss15_hard_negatives" -> graft.llmdata.Similarity.hardNegativeMining _,
      // ss16's sampled 2-hop expansion + bounded-heap keep over the seed
      "ss16_knn_descent" -> graft.llmdata.Similarity.knnGraphDescent _,
      // ss17's hop-unrolled traversal: per-hop checkpoints + bounded-heap
      // frontier/result keeps must not depend on input splits
      "ss17_graph_serve" -> graft.llmdata.Similarity.graphServe _,
      // ss18's occlusion anti-join + windowed survivor/backfill re-rank
      "ss18_graph_diversify" -> graft.llmdata.Similarity.graphDiversify _,
      // ss19's per-prefix hit/visited counts across three traversals
      "ss19_serve_sweep" -> graft.llmdata.Similarity.serveSweep _,
      // ss20's label-filtered result assembly off the shared walk
      "ss20_graph_serve_filtered" -> graft.llmdata.Similarity.graphServeFiltered _,
      // ss21's SQ8-scored walk + exact refine
      "ss21_graph_serve_sq" -> graft.llmdata.Similarity.graphServeSq _,
      // dd26's capped-bucket candidate counts, mm9's chunk-df census
      "dd26_banding_sweep" -> Dedup.bandingSweep _,
      "mm9_content_chunks" -> graft.llmdata.Multimodal.contentChunkCensus _,
      // q41's conditional-share DECIMAL sums
      "q41_market_share" -> Relational.q41MarketShare _,
      // r14 additions: tx24's memoized per-task BPE encode (the shared
      // memo cache must not leak state across split layouts), tx25's
      // per-block synth + signal extraction
      "tx24_bpe_encode" -> TextAnalysis.bpeEncodeTokens _,
      "tx25_html_extract" -> TextAnalysis.htmlExtract _,
      "tx26_bpe_packing" -> TextAnalysis.bpePacking _,
      "tx27_tokenizer_audit" -> TextAnalysis.tokenizerAudit _,
      "tx28_bpe_train" -> TextAnalysis.bpeTrain _,
      // r15: tx29's full-table encode over three domain scans; tx30's
      // byte-level pretokenize + encode with its own memo cache
      "tx29_bpe_domain_audit" -> TextAnalysis.bpeDomainAudit _,
      "tx30_bpe_bytes_encode" -> TextAnalysis.bpeBytesEncodeTokens _,
      "tx31_tokenizer_swap" -> TextAnalysis.tokenizerSwapAudit _,
      // cur15's good-block reassembly collects per-doc lists — the
      // array_sort(struct) must make it split-order-invariant
      "cur15_crawl_curation" -> graft.llmdata.Curation.crawlCuration _,
      "cur13_packed_shards" -> graft.llmdata.Curation.packedShards _,
      "cur14_epoch_shuffle" -> graft.llmdata.Curation.epochShuffleAudit _,
      "mm10_interleaved_packing" -> graft.llmdata.Multimodal.interleavedPacking _,
      // r16: tx32's vocab rank over a distinct-token aggregate, tx33's
      // vocab-mapped encode (the collected vocab must not depend on split
      // layout), cur16's in-group sequence assembly
      "tx32_bpe_vocab" -> TextAnalysis.bpeVocab _,
      "tx33_bpe_ids" -> TextAnalysis.bpeEncodeIds _,
      "tx34_bpe_roundtrip" -> TextAnalysis.bpeRoundtrip _,
      "tx35_bpe_bytes_roundtrip" -> TextAnalysis.bpeBytesRoundtrip _,
      "tx36_frozen_vocab_oov" -> TextAnalysis.frozenVocabOov _,
      "cur16_shard_sequences" -> graft.llmdata.Curation.shardSequences _,
      // mm11's capped posting lists rank by sorted id — split order must
      // not change which candidates survive the cap
      "mm11_ppm_decoded" -> graft.llmdata.Multimodal.ppmDecodedNearDup _,
      // mm12's per-image resize is a pure map — split layout must not
      // change a single output byte
      "mm12_ppm_resize" -> graft.llmdata.Multimodal.ppmResize _,
      "mm13_ppm_frame_sample" -> graft.llmdata.Multimodal.ppmFrameSample _,
      "mm14_wav_features" -> graft.llmdata.Multimodal.wavAudioFeatures _)

  test("oracle-sensitive queries are invariant to input split size") {
    for ((name, fn) <- risky) {
      // drop the session shingle cache so the dedup queries actually
      // re-scan under the shrunken split size instead of reusing storage
      Dedup.uncacheShingles(spark)
      val whole = rows(fn(spark, sf()))
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384") // 16 KB
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      Dedup.uncacheShingles(spark)
      try {
        val split = rows(fn(spark, sf()))
        assert(split == whole, s"$name differs under small input splits")
      } finally {
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
        spark.conf.unset("spark.sql.files.openCostInBytes")
        Dedup.uncacheShingles(spark)
      }
    }
  }
}
