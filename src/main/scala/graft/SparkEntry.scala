package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.{Enrich, Relational, ScaleJoins}
import graft.multimodal.Multimodal
import graft.sources.Catalog
import graft.text.{Curation, Dedup, TextOps}
import graft.vector.Similarity

/** Driver contract — see /root/repo/SURVEY.md §2.9 + §7.
  *
  * `queries` is the full operator inventory as named DataFrame plans;
  * `oracleSql` carries the DuckDB-equivalent ANSI SQL the driver hash-checks
  * against. Column names and value arithmetic are kept engine-portable (see
  * Relational's scaladoc for the exact-fixed-point money rule).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_filter_project"  -> (Relational.q01 _),
    "q02_pricing_summary" -> (Relational.q02 _),
    "q03_revenue_nation"  -> (Relational.q03 _),
    "q04_broadcast_region" -> (Relational.q04 _),
    "q05_semi_join"       -> (Relational.q05 _),
    "q06_anti_join"       -> (Relational.q06 _),
    "q07_topk_per_group"  -> (Relational.q07 _),
    "q08_lag_lead"        -> (Relational.q08 _),
    "q09_sessionize"      -> (Relational.q09 _),
    "q10_distinct_agg"    -> (Relational.q10 _),
    "q11_rollup"          -> (Relational.q11 _),
    "q12_cube"            -> (Relational.q12 _),
    "q13_set_ops"         -> (Relational.q13 _),
    "q14_top10_orders"    -> (Relational.q14 _),
    "q15_string_funcs"    -> (Relational.q15 _),
    "q16_date_agg"        -> (Relational.q16 _),
    "q17_latest_per_key"  -> (Relational.q17 _),
    "q18_quality_suite"   -> (Relational.q18 _),
    "q19_json_extract"    -> (Relational.q19 _),
    "q20_range_join"      -> (Relational.q20 _),
    "q21_exact_dedup"     -> (Dedup.exactDedup _),
    "q22_text_stats"      -> (TextOps.q22 _),
    "q23_cosine_topk"     -> ((s: SparkSession, d: String) => Similarity.cosineTopK(s, d)),
    "q24_order_invariant" -> (Relational.q24 _),
    "q25_token_counts"    -> (TextOps.tokenCounts _),
    "q26_lang_id"         -> (TextOps.langId _),
    "q27_text_quality"    -> (TextOps.qualityScore _),
    "q28_fingerprint"     -> (TextOps.fingerprint _),
    "q29_minhash_sig"     -> (Dedup.minhashSignaturesMaterialized _),
    "q30_minhash_pairs"   -> (Dedup.minhashPairs _),
    "q31_ngram_jaccard"   -> (Dedup.ngramJaccard _),
    "q32_simhash"         -> (Dedup.simhash _),
    "q33_ann_lsh"         -> ((s: SparkSession, d: String) => Similarity.annLsh(s, d)),
    "q34_embed_neardup"   -> ((s: SparkSession, d: String) => Similarity.nearDupPairs(s, d)),
    "q35_multimodal_meta" -> (Multimodal.metadata _),
    "q36_user_segments"   -> (Enrich.userSegments _),
    "q37_gold_daily"      -> (Enrich.goldDaily _),
    "q38_asof_join"       -> (Relational.q38 _),
    "q39_running_total"   -> (Relational.q39 _),
    "q40_hourly_tumbling" -> (Relational.q40 _),
    "q41_ann_ivf"         -> ((s: SparkSession, d: String) => Similarity.annIvf(s, d)),
    "q42_vocabulary"      -> ((s: SparkSession, d: String) => TextOps.vocabulary(s, d)),
    "q43_tfidf"           -> (TextOps.tfidf _),
    "q44_sample"          -> ((s: SparkSession, d: String) => TextOps.stratifiedSample(s, d)),
    "q45_length_stats"    -> (TextOps.lengthStats _),
    "q46_hybrid_search"   -> ((s: SparkSession, d: String) => Similarity.hybridSearch(s, d)),
    "q47_funnel"          -> (Relational.q47 _),
    // HLL values are engine-specific; the oracle hashes the exact counts +
    // a 5%-tolerance audit flag computed in-plan (round-5: was rows-only)
    "q48_approx_distinct" -> (Relational.q48 _),
    "q49_neardup_clusters" -> ((s: SparkSession, d: String) => Dedup.nearDupClusters(s, d)),
    "q50_contamination"   -> ((s: SparkSession, d: String) => Curation.contamination(s, d)),
    "q51_repetition"      -> (Curation.repetition _),
    "q52_chunking"        -> ((s: SparkSession, d: String) => Curation.chunk(s, d)),
    "q53_domain_mix"      -> (Curation.domainMix _),
    "q54_pii_redact"      -> (Curation.piiRedact _),
    "q55_jaccard_prefiltered" -> ((s: SparkSession, d: String) => Dedup.jaccardPrefiltered(s, d)),
    "q56_frame_sample"    -> ((s: SparkSession, d: String) => Multimodal.frameSampleQuery(s, d)),
    "q57_embed_quantize"  -> (Similarity.embedQuantize _),
    "q58_collocations"    -> ((s: SparkSession, d: String) => Curation.collocations(s, d)),
    "q59_doc_packing"     -> ((s: SparkSession, d: String) => Curation.docPacking(s, d)),
    "q60_salted_join"     -> ((s: SparkSession, d: String) => Relational.q03SkewSafe(s, d)),
    "q61_canonical_docs"  -> ((s: SparkSession, d: String) => Dedup.canonicalDocs(s, d)),
    "q62_filter_funnel"   -> (Curation.filterFunnel _),
    "q63_stratified_sample" -> (Curation.stratifiedSample _),
    "q64_incremental_dedup" -> (Dedup.incrementalDedup _),
    "q65_length_buckets"  -> (Curation.lengthBuckets _),
    "q66_semantic_clusters" -> ((s: SparkSession, d: String) => Similarity.semanticClusters(s, d)),
    "q67_ann_recall"      -> ((s: SparkSession, d: String) => Similarity.annRecall(s, d)),
    "q68_quality_calibration" -> (Curation.qualityCalibration _),
    "q69_gram_novelty"    -> (Dedup.gramNovelty _),
    "q70_mix_schedule"    -> (Curation.mixSchedule _),
    "q71_shard_assign"    -> ((s: SparkSession, d: String) => Curation.shardAssign(s, d)),
    "q72_knn_graph"       -> ((s: SparkSession, d: String) => Similarity.knnGraph(s, d)),
    "q73_mmr_select"      -> ((s: SparkSession, d: String) => Similarity.mmrSelect(s, d)),
    "q74_containment"     -> ((s: SparkSession, d: String) => Dedup.containment(s, d)),
    "q75_cluster_balance" -> (Similarity.clusterBalance _),
    "q76_drift_report"    -> (Curation.driftReport _),
    "q77_chunk_dedup"     -> ((s: SparkSession, d: String) => Curation.chunkDedup(s, d)),
    "q78_token_entropy"   -> (TextOps.tokenEntropy _),
    "q79_principal_direction" -> ((s: SparkSession, d: String) => Similarity.principalDirection(s, d)),
    "q80_split_leakage"   -> ((s: SparkSession, d: String) => Dedup.splitLeakage(s, d)),
    "q81_unigram_logprob" -> (TextOps.unigramLogprob _),
    "q82_centroid_drift"  -> (Similarity.centroidDrift _),
    "q83_cluster_split"   -> ((s: SparkSession, d: String) => Dedup.clusterSafeSplit(s, d)),
    "q84_oov_rate"        -> ((s: SparkSession, d: String) => TextOps.oovRate(s, d)),
    "q85_dim_stats"       -> (Similarity.dimStats _),
    "q86_zipf_fit"        -> (TextOps.zipfFit _),
    "q87_vocab_growth"    -> ((s: SparkSession, d: String) => TextOps.vocabGrowth(s, d)),
    "q88_mix_resample"    -> (Curation.mixResample _),
    "q89_norm_dedup"      -> (Dedup.normalizedDedup _),
    "q90_whiten"          -> (Similarity.whiten _),
    "q91_length_trim"     -> (Curation.lengthTrim _),
    "q92_burst_detect"    -> (Enrich.burstDetect _),
    "q93_curation_manifest" -> (Curation.curationManifest _),
    "q94_lang_consistency" -> (TextOps.langConsistency _),
    "q95_event_pivot"     -> (Relational.eventPivot _),
    "q96_frame_dedup"     -> ((s: SparkSession, d: String) => Multimodal.frameDedup(s, d)),
    "q97_event_melt"      -> (Relational.eventMelt _),
    "q98_bloom_join"      -> ((s: SparkSession, d: String) => ScaleJoins.bloomPrefilterJoin(s, d)),
    "q99_quantile_audit"  -> (TextOps.quantileAudit _),
    "q100_epoch_shuffle"  -> ((s: SparkSession, d: String) => Curation.epochShuffle(s, d)),
    "q101_schema_evolution" -> (Catalog.snapshotMerge _),
    "q102_scd2_ranges"    -> (Relational.q102 _),
    "q103_event_bigrams"  -> (Relational.q103 _),
    "q104_heavy_hitters"  -> ((s: SparkSession, d: String) => Relational.q104(s, d)),
    "q105_dedup_summary"  -> (Dedup.dedupSummary _),
    "q106_token_budget"   -> ((s: SparkSession, d: String) => Curation.tokenBudget(s, d)),
    "q107_fertility"      -> (TextOps.fertility _),
    "q108_length_quartiles" -> (TextOps.lengthQuartiles _),
    "q109_moment_corr"    -> (TextOps.momentCorr _),
    "q110_grouping_sets"  -> (Relational.q110 _),
    "q111_merge_upsert"   -> (Catalog.mergeUpsert _),
    "q112_snapshot_diff"  -> (Catalog.snapshotDiff _),
    "q113_merge_evolved"  -> (Catalog.mergeUpsertEvolved _),
    "q114_skipping_stats" -> ((s: SparkSession, d: String) => Catalog.skippingStats(s, d)),
    "q115_zorder_layout"  -> ((s: SparkSession, d: String) => Catalog.zorderLayout(s, d)),
    "q116_purge_audit"    -> ((s: SparkSession, d: String) => Curation.purgeAudit(s, d)),
    "q117_bpe_pairs"      -> ((s: SparkSession, d: String) => TextOps.bpePairs(s, d)),
    "q118_source_overlap" -> ((s: SparkSession, d: String) => Dedup.sourceOverlap(s, d)),
    "q119_embed_outliers" -> (Similarity.embedOutliers _),
    "q120_vocab_coverage" -> ((s: SparkSession, d: String) => TextOps.vocabCoverage(s, d)),
    "q121_cluster_purity" -> ((s: SparkSession, d: String) => Dedup.clusterPurity(s, d)),
    "q122_compaction_plan" -> ((s: SparkSession, d: String) => Catalog.compactionPlan(s, d)),
    "q123_skew_advisor"   -> ((s: SparkSession, d: String) => Relational.q123(s, d)),
    "q124_incremental_agg" -> (Relational.q124 _),
    "q125_vacuum_audit"   -> ((s: SparkSession, d: String) => Catalog.vacuumAudit(s, d)),
    "q126_log_replay"     -> ((s: SparkSession, d: String) => Catalog.logReplay(s, d)),
    "q127_importance_weights" -> ((s: SparkSession, d: String) => TextOps.importanceWeights(s, d)),
    "q128_importance_resample" -> ((s: SparkSession, d: String) => TextOps.importanceResample(s, d)),
    "q129_contamination_spans" -> ((s: SparkSession, d: String) => Curation.contaminationSpans(s, d)),
    "q130_duplicated_spans" -> ((s: SparkSession, d: String) => Dedup.duplicatedSpans(s, d)),
    "q131_bpe_segment"    -> ((s: SparkSession, d: String) => TextOps.bpeSegment(s, d)),
    "q132_bm25"           -> ((s: SparkSession, d: String) => TextOps.bm25(s, d)),
    "q133_bigram_logprob" -> ((s: SparkSession, d: String) => TextOps.bigramLogprob(s, d)),
    "q134_rrf_fusion"     -> ((s: SparkSession, d: String) => Similarity.rrfFusion(s, d)),
    "q135_audio_features" -> ((s: SparkSession, d: String) => Multimodal.audioFeaturesQuery(s, d)),
    // q136 serves q132's exact answer FROM the at-rest posting index (the
    // oracle is q132's verbatim — what changes is where the work happens,
    // which is precisely what this row checks). The index is built once
    // per process per fixture dir and reused — reuse IS the at-rest
    // serving model the row exists to measure (bench passes 2–3 ride the
    // artifact the way production queries ride an index).
    "q136_bm25_indexed"   -> ((s: SparkSession, d: String) =>
      graft.text.TextIndex.bm25Indexed(s, cachedTextIndex(s, d))),
    "q137_nb_quality"     -> ((s: SparkSession, d: String) => TextOps.nbQualityScore(s, d)),
    // q138/q139 (round 9): the two advertised 100 TB retrieval serving
    // paths promoted from differential specs to oracle rows. Both run at
    // FULL probe (nprobe = cell count) — the only setting where the
    // IVF-pruned dense arm is exact — so the answers are verbatim q134/q46
    // and share those oracles; what the rows check is that serving from
    // the at-rest cell + posting layouts computes exactly what the ad-hoc
    // corpus passes compute. Smaller nprobe is the recall/IO trade the
    // SCALING tier measures.
    "q138_rrf_indexed"    -> ((s: SparkSession, d: String) =>
      graft.vector.CellIndex.rrfFusionIndexed(s, d, cachedCellIndex(s, d),
        Similarity.probeVector(s, d), nprobe = IndexCells,
        textIndexPath = Some(cachedTextIndex(s, d)))),
    "q139_hybrid_indexed" -> ((s: SparkSession, d: String) =>
      graft.vector.CellIndex.hybridSearchIndexed(s, d, cachedCellIndex(s, d),
        Similarity.probeVector(s, d), nprobe = IndexCells)),
    // q140: the MMR serving path under the same convention — candidate
    // pool from the full-probe cell scan (exact), shared greedy, so the
    // answer is verbatim q73.
    "q140_mmr_indexed"    -> ((s: SparkSession, d: String) =>
      graft.vector.CellIndex.mmrSelectIndexed(s, cachedCellIndex(s, d),
        Similarity.probeVector(s, d), nprobe = IndexCells)),
    "q141_span_rewrite"   -> ((s: SparkSession, d: String) => Dedup.spanRewrite(s, d)),
    "q142_hll_reach"      -> (Relational.hllReach _),
    "q143_domain_cap"     -> ((s: SparkSession, d: String) => Curation.domainCap(s, d)),
    "q144_theta_overlap"  -> (Relational.thetaOverlap _),
    "q145_dedup_recall"   -> ((s: SparkSession, d: String) => Dedup.dedupPairRecall(s, d)),
    "q146_theta_retention" -> (Relational.thetaRetention _),
    // q147: exact phrase search served FROM the unigram positional index
    // (round 11: position-chain joins — the bigram artifact is retired);
    // the probe phrase is the index's own persisted top trigram, so the
    // whole query path is index-resident (derivation + search). ONE
    // version resolution pins derivation and search to the same corpus
    // state (the bm25Indexed resolve-once rule — under live maintenance a
    // fold could otherwise slide a version between the two calls).
    "q147_phrase_search"  -> ((s: SparkSession, d: String) => {
      val idx = cachedPhraseIndex(s, d)
      val root = Some(graft.text.TextIndex.phraseCurrentRoot(s, idx))
      graft.text.TextIndex.phraseSearch(s, idx,
        graft.text.TextIndex.topPhrase(s, idx, pinnedRoot = root),
        pinnedRoot = root)
    }),
    // q148 (round 10): proximity/slop search from the phrase index's
    // unigram positional postings — q147's documented residual closed.
    // Probe terms derive from the index's own udf table (no corpus pass);
    // ONE version resolution pins derivation and search together.
    "q148_proximity"      -> ((s: SparkSession, d: String) => {
      val idx = cachedPhraseIndex(s, d)
      val root = Some(graft.text.TextIndex.phraseCurrentRoot(s, idx))
      val (ta, tb) = graft.text.TextIndex.deriveProximityTerms(s, idx,
        pinnedRoot = root)
      graft.text.TextIndex.proximitySearch(s, idx, ta, tb, slop = 3,
        pinnedRoot = root)
    }),
    // q149–q151 (round 10): the sketch reports' estimate arms promoted to
    // AT-REST TABLE serving (the q136→q138 pattern applied to sketches) —
    // the estimates read ONLY the persisted day-grain sketch rows
    // (PlanSpec pins no events scan on the serving functions), and since
    // HLL register-merge and theta min-k retention are semilattices the
    // table-served estimates equal the direct ones bit for bit, so each
    // row shares its ad-hoc twin's oracle verbatim. The exact arms stay
    // in-plan as the audit the oracle checks.
    "q149_reach_served"   -> ((s: SparkSession, d: String) =>
      Relational.hllReachServed(s, d, cachedReachTable(s, d))),
    "q150_overlap_served" -> ((s: SparkSession, d: String) =>
      Relational.thetaOverlapServed(s, d, cachedCohortTable(s, d))),
    "q151_retention_served" -> ((s: SparkSession, d: String) =>
      Relational.thetaRetentionServed(s, d, cachedCohortTable(s, d))),
    // q152 (round 10): proximity-boosted retrieval — BOTH text artifacts
    // composed index-resident: BM25 relevance from the posting index fused
    // (q134's RRF conventions) with term-proximity ranking from the
    // positional index. The signal bag-of-words scoring discards —
    // probe terms NEAR each other — reranks the list.
    "q152_prox_ranked"    -> ((s: SparkSession, d: String) =>
      graft.text.TextIndex.proximityRankedSearch(s, cachedTextIndex(s, d),
        cachedPhraseIndex(s, d))),
    // q153 (round 11): m-term proximity — "all of {t₁,t₂,t₃} within a
    // window" via the banded intersection with an anchor term (the q148
    // one-band-match trick composed to m lists). Probe = the THREE
    // highest-df terms (worst case by construction), derived from the
    // index's udf table; hottest term anchors (the one list the ±1 band
    // emission does not triple). ONE version resolution pins derivation
    // and search together.
    "q153_prox_multi"     -> ((s: SparkSession, d: String) => {
      val idx = cachedPhraseIndex(s, d)
      val root = Some(graft.text.TextIndex.phraseCurrentRoot(s, idx))
      val ts = graft.text.TextIndex.deriveProximityTermsN(s, idx, 3,
        pinnedRoot = root)
      graft.text.TextIndex.proximitySearchAll(s, idx, ts.reverse, slop = 3,
        pinnedRoot = root)
    }),
    // q154 (round 11): incremental span rewrite — the q64 snapshot-ledger
    // pattern at gram granularity (mergeable gram ledger: min-struct
    // canonical + summed counts; fold cost tracks batch gram mass). The
    // batch rewrite equals FULL q141 restricted to batch docs
    // byte-for-byte, so the oracle is q141's SQL with the batch filter.
    "q154_incr_rewrite"   -> ((s: SparkSession, d: String) =>
      Dedup.incrementalSpanRewrite(s, d)),
    // q155 (round 11): boolean set retrieval from the posting index —
    // the unranked AND/NOT companion to q136's ranked serving. The
    // m-way intersection is ONE doc-keyed counting aggregation over the
    // pruned must lists (map-side combined), negation one anti join.
    // Probe: must = the two highest-df terms (worst-case intersection
    // mass), mustNot = the rarest term (a real but small exclusion) —
    // derived from the index's df table; ONE version resolution pins
    // derivation and search together.
    "q155_bool_search"    -> ((s: SparkSession, d: String) => {
      val idx = cachedTextIndex(s, d)
      val root = Some(graft.text.TextIndex.currentRoot(s, idx))
      val (must, not) = graft.text.TextIndex.deriveBoolTerms(s, idx,
        pinnedRoot = root)
      graft.text.TextIndex.boolSearch(s, idx, must, not, pinnedRoot = root)
    }),
    // q156 (round 11): the end-to-end serving PAGE — candidates from the
    // positional index (q147's pinned phrase path), content from the
    // at-rest DOC STORE (the forward index: id-hash-bucketed rows, so
    // the fetch reads ≤ page-size buckets instead of re-scanning the
    // corpus the inverted index just saved), snippet = the match window
    // around each hit's first occurrence.
    "q156_snippet"        -> ((s: SparkSession, d: String) =>
      graft.text.DocStore.snippetSearch(s, cachedPhraseIndex(s, d),
        cachedDocStore(s, d))),
    // q157 (round 11): the OR end of q155's minimum-should-match dial —
    // same counting aggregation, nhit ≥ 1 — promoted to its own oracle
    // row so k-of-m semantics are hash-checked, not just spec'd. Same
    // probe derivation as q155.
    "q157_bool_any"       -> ((s: SparkSession, d: String) => {
      val idx = cachedTextIndex(s, d)
      val root = Some(graft.text.TextIndex.currentRoot(s, idx))
      val (must, not) = graft.text.TextIndex.deriveBoolTerms(s, idx,
        pinnedRoot = root)
      graft.text.TextIndex.boolSearch(s, idx, must, not, pinnedRoot = root,
        minShouldMatch = 1)
    }),
    // q158 (round 11): q104's heavy-hitter estimates served from an
    // AT-REST day-grain COUNT-MIN table (the q149–q151 pattern applied
    // to the frequency sketch): CMS is LINEAR — merging per-day sketches
    // sums their count arrays, which is bit-for-bit the one-pass global
    // sketch — so the served row shares q104's oracle verbatim. The
    // exact arm stays in-plan as the audit; the estimate arm reads ONLY
    // the table (grain-bounded driver merge). Unlike the HLL/theta
    // tables, CMS is additive NOT idempotent — the maintenance caveat is
    // documented on the writer.
    "q158_heavy_served"   -> ((s: SparkSession, d: String) =>
      Relational.heavyHittersServed(s, d, cachedFreqTable(s, d))),
    // q159 (round 12): the PRODUCTION form of the incremental span
    // rewrite — q154 rebuilt its snapshot ledger in-query (contract
    // requirement); here the ledger is an AT-REST maintained artifact
    // (base built on the even docs, the odd batch folded add-only under
    // its tag) and the batch rewrite serves against it: one pruned
    // ledger scan + batch-bounded shuffles, byte-identical to full q141
    // restricted to the batch docs — so the oracle is q154's verbatim.
    "q159_ledger_rewrite" -> ((s: SparkSession, d: String) => {
      val root = cachedGramLedger(s, d)
      graft.text.Dedup.rewriteBatchAgainstLedger(s, s"$root/batch_fixture",
        s"$root/ledger")
    }),
    // q160 (round 12): q49's cluster resolution SERVED from the at-rest
    // cluster index (base built on the even docs, the odd batch folded by
    // contracted-graph CC — batch-edge-bounded, exact including
    // old-cluster merges), so the corpus contributes only the doc-id
    // spine. Shares q49's oracle verbatim: the fold equals the full
    // recompute over the union corpus by the contracted-CC argument.
    "q160_cluster_maintained" -> ((s: SparkSession, d: String) => {
      val root = cachedClusterIndex(s, d)
      graft.text.ClusterIndex.nearDupClustersServed(s, d, s"$root/index")
    }),
    // q161 (round 12): DF-GATED proximity — the MaxScore essential-list
    // move for the positional family. Probe = the two hottest terms
    // (q153's worst-case position mass) + the rarest term (the
    // essential filter): every hot list doc-semi-joins the rarest
    // term's doc set before banding, so shuffle mass tracks the RAREST
    // df, not the hottest. Answer ≡ the ungated banded intersection on
    // these terms (the semi-join drops only tuple-free docs — spec'd).
    // maxDfShare = 1.0 here because the fixture's 40-token vocabulary
    // makes EVERY term ubiquitous by construction; the refusal policy
    // is spec'd separately and the row checks the served path's
    // exactness.
    "q161_prox_gated"     -> ((s: SparkSession, d: String) => {
      val idx = cachedPhraseIndex(s, d)
      val root = Some(graft.text.TextIndex.phraseCurrentRoot(s, idx))
      val ts = graft.text.TextIndex.deriveGatedProximityProbe(s, idx,
        pinnedRoot = root)
      graft.text.TextIndex.proximitySearchGated(s, idx, ts, slop = 3,
        maxDfShare = 1.0, pinnedRoot = root)
    }),
    // q162 (round 12): the MEDIA serving page — q156's candidates and
    // snippet, plus the store's BINARY payload column doing the media
    // work (byte length + first-frame md5, the q56 fingerprint served
    // with the page). Payload bytes come from the same ≤-page-buckets
    // point fetch; the corpus is never scanned and the payload column
    // is read only here (PlanSpec pins the projection both ways).
    "q162_media_page"     -> ((s: SparkSession, d: String) =>
      graft.text.DocStore.mediaSearch(s, cachedPhraseIndex(s, d),
        cachedDocStore(s, d))),
    // q163 (round 13): q159 with a FIXED-SIZE batch — the round-12
    // verdict's measurement gap: q159's fixture batch is half the corpus
    // (the q154 parity convention), so its driver-bench row GROWS with SF
    // by construction; the production claim (per-fold cost tracks batch
    // mass, flat in corpus size) lived only in GramLedgerBench. Here the
    // batch is the first 64 doc ids at EVERY scale (constant absolute
    // mass — the maintenance unit) and the ledger is maintained over the
    // rest, so this row's cost tier is ~flat/decade in the driver
    // artifact itself. Exactness is q159's: merged canonicality ≡ global,
    // oracle = q141 restricted to the fixed batch.
    "q163_ledger_rewrite_fixed" -> ((s: SparkSession, d: String) => {
      val root = cachedGramLedgerFixed(s, d)
      graft.text.Dedup.rewriteBatchAgainstLedger(s, s"$root/batch_fixture",
        s"$root/ledger")
    }),
    // q164 (round 13): q162's media page served from a store that was
    // MAINTAINED AND COMPACTED — base (even docs) → tagged append (odd
    // docs) → compact (the delta chain folded into a fresh generation,
    // replay tags carried forward). Sharing q162's oracle verbatim pins
    // the whole at-rest lifecycle — append ≡ rebuild AND compaction
    // changes no served byte — at the oracle level, not just in specs:
    // the round-12 verdict's task #1 anchored the way q160 anchors the
    // cluster fold and q159 the ledger fold.
    "q164_media_compacted" -> ((s: SparkSession, d: String) =>
      graft.text.DocStore.mediaSearch(s, cachedPhraseIndex(s, d),
        s"${cachedDocStoreCompacted(s, d)}/store")),
    // q165 (round 13): q164's move for the POSITIONAL index class —
    // q148's proximity search served from a phrase index whose history is
    // base (even docs) → tagged append (odd docs) → compactPhraseVersion
    // (per-fold position file-sets folded to one per bucket, ledger
    // verbatim). Shares q148's oracle verbatim: probe derivation and
    // answer must not depend on the index's fold/compaction history.
    "q165_prox_compacted" -> ((s: SparkSession, d: String) => {
      val root = cachedPhraseIndexCompacted(s, d)
      val idx = s"$root/index"
      val pin = Some(graft.text.TextIndex.phraseCurrentRoot(s, idx))
      val (ta, tb) = graft.text.TextIndex.deriveProximityTerms(s, idx,
        pinnedRoot = pin)
      graft.text.TextIndex.proximitySearch(s, idx, ta, tb, slop = 3,
        pinnedRoot = pin)
    }),
    // q166 (round 14): q105's dedup-savings histogram SERVED from the
    // maintained cluster index — the q149/q158/q160 served-row pattern
    // applied to the bench's most expensive recompute (q105 pays a cold
    // q49 CC resolution per run; the labels already exist at rest).
    // Shares q105's oracle verbatim by the q160 exactness argument; the
    // serving cost is a label read + spine join + two bounded aggregates.
    "q166_dedup_summary_served" -> ((s: SparkSession, d: String) => {
      val root = cachedClusterIndex(s, d)
      graft.text.ClusterIndex.dedupSummaryServed(s, d, s"$root/index")
    }),
    // q167 (round 15): the pair-mass advisor — one keyed aggregate over
    // the band table prices the near-dup build's candidate mass before
    // the banded self-join is paid (the round-14 lesson made queryable:
    // build cost is pair-mass-bound and fixture-regime-dependent).
    "q167_pair_mass" -> ((s: SparkSession, d: String) =>
      graft.text.Dedup.pairMassAdvisor(s, d)),
    // round 16 — the advisor CLOSES THE LOOP (the r15 verdict's task #3):
    // one signature pass prices the raw one-shot join AND the
    // rep-collapsed sharded join, and the pure routing rule turns the
    // two masses + the max collision bucket into the build decision
    // (one_shot / sharded-with-derived-count / loud refusal). The oracle
    // replays both aggregates and the rule arithmetic verbatim.
    "q168_route_advice" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val r = graft.text.ClusterIndex.adviseRoute(s, d)
      Seq((r.rawPairs, r.repPairs, r.repMaxBucket, r.route, r.shards.toLong))
        .toDF("raw_pairs", "rep_pairs", "rep_max_bucket", "route", "shards")
    }),
  )

  /** AUDIT-tagged queries: deliberately-exact, known-linear auditor forms
    * kept in the correctness contract on purpose, with shipped scale-safe
    * serving twins — q31's all-shared-gram exact Jaccard (scale path:
    * q55's sketch-then-verify) and q66's globally-banded semantic
    * clustering (serving path: CellIndex.semanticClustersIndexed). Bench
    * tiers report them separately from the serving-path total so the
    * sf≥1 suite number reflects what production would run, while the
    * contract rows stay unchanged. */
  val auditQueries: Set[String] =
    Set("q31_ngram_jaccard", "q66_semantic_clusters", "q145_dedup_recall",
      // round 15 (r14 verdict task #4): q105 joined the audit set once
      // q166 became its served twin — the histogram's production path is
      // the maintained cluster labels (0.7 s), while q105 deliberately
      // pays a cold full q49 CC recompute (~4 s) as the exactness audit.
      "q105_dedup_summary")

  /** Cell count for the oracle rows' cached cell index —
    * [[cachedCellIndex]]'s `k` and the full-probe `nprobe` must agree. */
  private val IndexCells = 16

  /** tmp-dir cache for the at-rest index artifacts the indexed oracle rows
    * (q136/q138/q139) serve from: built once per PROCESS per fixture dir,
    * reused across bench passes. The key carries the process id, so a
    * fresh verify/bench run always builds from the fixture as it stands —
    * no mtime/content stamp to go stale (the round-8 stamp folded
    * mtime+length, which 1-second mtime granularity could defeat) — and
    * eviction never races a live concurrent process: caches left by dead
    * processes are swept only once older than an age floor far beyond any
    * run's duration (round-8 review finding on shared-tmpdir races). */
  private def cachedIndex(kind: String, d: String, commitMarker: String)(
      build: String => Unit): String = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val pid = ProcessHandle.current().pid()
    val idx = new java.io.File(tmp,
      s"graft_${kind}_v3_pid${pid}_" + Integer.toHexString(d.hashCode))
    if (!new java.io.File(idx, commitMarker).exists()) {
      // sweep caches of DEAD processes only: the dir name embeds the
      // owning pid, and an actual liveness probe replaces the age
      // heuristic — a >6h run (the ≥100× tiers) must never have its live
      // cache deleted by a newcomer (round-9 review finding). The age
      // floor stays as a second guard against pid reuse.
      val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
      val PidPat = s"graft_${kind}_v\\d+_pid(\\d+)_.*".r
      def ownerAlive(name: String): Boolean = name match {
        case PidPat(p) => scala.util.Try {
          val h = ProcessHandle.of(p.toLong)
          h.isPresent && h.get().isAlive
        }.getOrElse(false)
        case _ => false
      }
      Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.getName.startsWith(s"graft_${kind}_") &&
          f.getPath != idx.getPath && f.lastModified < cutoff &&
          !ownerAlive(f.getName))
        .foreach(old => scala.reflect.io.Directory(old).deleteRecursively())
      build(idx.getPath)
    }
    idx.getPath
  }

  /** Pre-build the per-process index caches the indexed oracle rows serve
    * from — bench warmup hook: the at-rest model's premise is that the
    * index EXISTS before queries arrive, so single-pass tiers
    * (ScaleBench) warm it outside any timed region the way Bench's pass
    * 1 amortizes it out of the medians. Build costs are reported
    * separately (CellIndexBench's index_build/text_index_build rows). */
  def warmIndexes(s: SparkSession, d: String): Unit = {
    cachedTextIndex(s, d); cachedCellIndex(s, d); cachedPhraseIndex(s, d)
    cachedReachTable(s, d); cachedCohortTable(s, d); cachedDocStore(s, d)
    cachedFreqTable(s, d); cachedGramLedger(s, d); cachedClusterIndex(s, d)
    cachedGramLedgerFixed(s, d); cachedDocStoreCompacted(s, d)
    cachedPhraseIndexCompacted(s, d); ()
  }

  /** Selective warm: build ONLY the cached artifacts the named queries
    * serve from (round 12 — at the ≥100× rehearsal tiers, warming all
    * nine artifacts to time two queries is both wasteful and a disk
    * hazard: a 1000× cluster-index build spills tens of GB the probe
    * queries never needed). The mapping mirrors each query's cache
    * calls in [[queries]]. */
  def warmIndexesFor(s: SparkSession, d: String, names: Seq[String]): Unit = {
    def any(prefixes: String*): Boolean =
      names.exists(n => prefixes.exists(n.startsWith))
    // q132_bm25 is deliberately ABSENT: it calls TextOps.bm25 corpus-direct
    // and reads no cached artifact — warming the text index for it would be
    // the exact needless ≥100×-tier disk hazard this selective warm avoids
    // (round-12 ADVICE)
    if (any("q136", "q138", "q139", "q140", "q152", "q155", "q157"))
      cachedTextIndex(s, d)
    if (any("q138", "q139", "q140")) cachedCellIndex(s, d)
    if (any("q147", "q148", "q152", "q153", "q156", "q161", "q162", "q164"))
      cachedPhraseIndex(s, d)
    if (any("q149")) cachedReachTable(s, d)
    if (any("q150", "q151")) cachedCohortTable(s, d)
    if (any("q156", "q162")) cachedDocStore(s, d)
    if (any("q158")) cachedFreqTable(s, d)
    if (any("q159")) cachedGramLedger(s, d)
    if (any("q160", "q166")) cachedClusterIndex(s, d)
    if (any("q163")) cachedGramLedgerFixed(s, d)
    if (any("q164")) cachedDocStoreCompacted(s, d)
    if (any("q165")) cachedPhraseIndexCompacted(s, d)
  }

  private def cachedTextIndex(s: SparkSession, d: String): String =
    cachedIndex("textindex", d, "stats/_SUCCESS")(p =>
      graft.text.TextIndex.write(s, d, p))

  private def cachedCellIndex(s: SparkSession, d: String): String =
    cachedIndex("cellindex", d, "vectors/_SUCCESS")(p =>
      graft.vector.CellIndex.write(s, d, p, k = IndexCells))

  private def cachedPhraseIndex(s: SparkSession, d: String): String =
    cachedIndex("phraseindex", d, "stats/_SUCCESS")(p =>
      graft.text.TextIndex.writePhraseIndex(s, d, p))

  private def cachedDocStore(s: SparkSession, d: String): String =
    cachedIndex("docstore", d, "stats/_SUCCESS")(p =>
      // the SHARDED build (round 13): the payload column ~doubles store
      // bytes, and the one-shot corpus repartition spilled past free disk
      // at the 1000× tier — per-bucket-group passes bound the shuffle to
      // corpus/shards at the cost of `shards` scans (negligible at fixture
      // SFs, the enabling trade at the rehearsal tiers). Layout ≡ write's.
      graft.text.DocStore.writeSharded(s, d, p))

  /** q164's maintained-deployment state: the store's history is the full
    * at-rest lifecycle — base built from the even docs, the odd docs
    * folded as a tag-committed batch, then the chain COMPACTED into a
    * fresh generation (tag carried forward). Serving q162's oracle from
    * it pins that none of that history leaks into a served byte. The
    * cache marker is whole-assembly (_COMPLETE last — the gram-ledger
    * rule): a crash between append and compact must not read as done. */
  private def cachedDocStoreCompacted(s: SparkSession, d: String): String =
    cachedIndex("docstorecomp", d, "_COMPLETE") { p =>
      import org.apache.spark.sql.functions.col
      val docs = graft.sources.Tables.documents(s, d)
      docs.filter(col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$p/base_fixture/documents.parquet")
      docs.filter(col("doc_id") % 2 === 1)
        .write.mode("overwrite").parquet(s"$p/batch_fixture/documents.parquet")
      graft.text.DocStore.write(s, s"$p/base_fixture", s"$p/store")
      graft.text.DocStore.append(s, s"$p/batch_fixture", s"$p/store",
        "fold_odd")
      graft.text.DocStore.compact(s, s"$p/store")
      new java.io.File(p, "_COMPLETE").createNewFile(); ()
    }

  /** q165's maintained-deployment state: the phrase index's history is
    * base (even docs) → tagged append (odd docs) → compactPhraseVersion.
    * Whole-assembly _COMPLETE marker, the [[cachedDocStoreCompacted]]
    * rule. */
  private def cachedPhraseIndexCompacted(s: SparkSession, d: String): String =
    cachedIndex("phraseidxcomp", d, "_COMPLETE") { p =>
      import org.apache.spark.sql.functions.col
      val docs = graft.sources.Tables.documents(s, d)
      docs.filter(col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$p/base_fixture/documents.parquet")
      docs.filter(col("doc_id") % 2 === 1)
        .write.mode("overwrite").parquet(s"$p/batch_fixture/documents.parquet")
      graft.text.TextIndex.writePhraseIndex(s, s"$p/base_fixture",
        s"$p/index")
      graft.text.TextIndex.appendPhraseIndex(s, s"$p/batch_fixture",
        s"$p/index", Some("fold_odd"))
      graft.text.TextIndex.compactPhraseVersion(s, s"$p/index")
      new java.io.File(p, "_COMPLETE").createNewFile(); ()
    }

  /** The at-rest sketch tables q149–q151 serve from — same per-process
    * cache/liveness protocol as the indexes (a parquet table's own
    * _SUCCESS is its commit marker). */
  private def cachedReachTable(s: SparkSession, d: String): String =
    cachedIndex("reachtbl", d, "_SUCCESS")(p =>
      Relational.writeReachSketches(s, d, p))

  private def cachedCohortTable(s: SparkSession, d: String): String =
    cachedIndex("cohorttbl", d, "_SUCCESS")(p =>
      Relational.writeCohortSketches(s, d, p))

  private def cachedFreqTable(s: SparkSession, d: String): String =
    cachedIndex("freqtbl", d, "_SUCCESS")(p =>
      Relational.writeFreqSketches(s, d, p))

  /** q159's maintained-deployment state: even docs = the accepted base
    * corpus, odd docs = today's batch (the q154/q64 snapshot convention,
    * materialized as fixture dirs); the gram ledger is built from the
    * base and the batch folds add-only under its tag. The artifact's own
    * stats markers commit per-stage, so the CACHE gets a whole-assembly
    * marker written last — a crash between base build and fold must not
    * read as a completed cache. */
  private def cachedGramLedger(s: SparkSession, d: String): String =
    cachedIndex("gramledger", d, "_COMPLETE") { p =>
      import org.apache.spark.sql.functions.col
      val docs = graft.sources.Tables.documents(s, d)
      docs.filter(col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$p/base_fixture/documents.parquet")
      docs.filter(col("doc_id") % 2 === 1)
        .write.mode("overwrite").parquet(s"$p/batch_fixture/documents.parquet")
      graft.text.Dedup.writeGramLedger(s, s"$p/base_fixture", s"$p/ledger")
      graft.text.Dedup.appendGramLedger(s, s"$p/batch_fixture",
        s"$p/ledger", "fold_odd")
      new java.io.File(p, "_COMPLETE").createNewFile(); ()
    }

  /** q163's maintained-deployment state: the FIXED batch is the first 64
    * doc ids (constant absolute mass at every SF — the maintenance
    * unit); the ledger is built over everything else and the batch folds
    * under its tag (the q159 convention, fixed-size). */
  private def cachedGramLedgerFixed(s: SparkSession, d: String): String =
    cachedIndex("gramledgerfx", d, "_COMPLETE") { p =>
      import org.apache.spark.sql.functions.col
      val docs = graft.sources.Tables.documents(s, d)
      docs.filter(col("doc_id") >= 64)
        .write.mode("overwrite").parquet(s"$p/base_fixture/documents.parquet")
      docs.filter(col("doc_id") < 64)
        .write.mode("overwrite").parquet(s"$p/batch_fixture/documents.parquet")
      graft.text.Dedup.writeGramLedger(s, s"$p/base_fixture", s"$p/ledger")
      graft.text.Dedup.appendGramLedger(s, s"$p/batch_fixture",
        s"$p/ledger", "fold_fixed")
      new java.io.File(p, "_COMPLETE").createNewFile(); ()
    }

  /** q160's maintained deployment state (the [[cachedGramLedger]]
    * convention): cluster index built on the even docs, odd batch folded
    * by contracted-graph CC. */
  private def cachedClusterIndex(s: SparkSession, d: String): String =
    cachedIndex("clusteridx", d, "_COMPLETE") { p =>
      import org.apache.spark.sql.functions.col
      val docs = graft.sources.Tables.documents(s, d)
      docs.filter(col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$p/base_fixture/documents.parquet")
      docs.filter(col("doc_id") % 2 === 1)
        .write.mode("overwrite").parquet(s"$p/batch_fixture/documents.parquet")
      // the SHARDED base build (round 13; labels ≡ write()'s, spec'd):
      // the one-shot pair join + CC spilled past free disk at the 1000×
      // tier — per-band-bucket shards bound the peak to one bucket
      // group's join
      graft.text.ClusterIndex.writeSharded(s, s"$p/base_fixture", s"$p/index")
      graft.text.ClusterIndex.append(s, s"$p/batch_fixture", s"$p/index",
        Some("fold_odd"))
      new java.io.File(p, "_COMPLETE").createNewFile(); ()
    }

  // ---- DuckDB oracle SQL ---------------------------------------------------
  // Shared SQL fragments (kept as vals so Spark/DuckDB formulations stay in
  // lock-step when edited).
  private val rev = "l_extendedprice*(1-l_discount)"
  private def gramsN(n: Int): String = {
    val cat = (1 to n).map(i => s"toks[i+$i]").mkString(" || ' ' || ")
    s"""CASE WHEN len(toks) >= $n
       | THEN list_transform(range(len(toks)-${n - 1}), i -> $cat)
       | ELSE []::VARCHAR[] END""".stripMargin
  }
  private val grams = gramsN(3)
  private def dotD(a: String, b: String) = s"list_dot_product($a, $b)"
  // shingle→minhash→band→candidate CTE chain, shared by q30 and q49
  private lazy val minhashCtes =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |u AS (SELECT doc_id, $grams AS grams FROM t),
       |sig AS (SELECT doc_id,
       |  [list_min(list_transform(grams, g -> md5('0:' || g))),
       |   list_min(list_transform(grams, g -> md5('1:' || g))),
       |   list_min(list_transform(grams, g -> md5('2:' || g))),
       |   list_min(list_transform(grams, g -> md5('3:' || g))),
       |   list_min(list_transform(grams, g -> md5('4:' || g))),
       |   list_min(list_transform(grams, g -> md5('5:' || g))),
       |   list_min(list_transform(grams, g -> md5('6:' || g))),
       |   list_min(list_transform(grams, g -> md5('7:' || g)))] AS sig
       | FROM u),
       |bands AS (SELECT doc_id, b AS band_id, sig[2*b+1] || '|' || sig[2*b+2] AS band_val
       |          FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) AS t2(b)),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bands x JOIN bands y
       |           ON x.band_id = y.band_id AND x.band_val = y.band_val AND x.doc_id < y.doc_id)""".stripMargin
  private val estJaccard =
    "len(list_filter(list_transform(range(8), i -> a.sig[i+1] = b.sig[i+1]), v -> v)) * 1.0 / 8"
  // est-Jaccard ≥ ½ edges + recursive closure to min-label clusters —
  // shared by q49/q61/q83/q93 (needs WITH RECURSIVE and minhashCtes ahead)
  private lazy val ccClusterCtes =
    s"""edges AS (SELECT doc_a, doc_b
       |          FROM cand JOIN sig a ON doc_a = a.doc_id JOIN sig b ON doc_b = b.doc_id
       |          WHERE $estJaccard >= 0.5),
       |sym AS (SELECT doc_a, doc_b FROM edges
       |        UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM edges),
       |reach(doc_id, label) AS (
       |  SELECT doc_id, doc_id AS label FROM documents
       |  UNION
       |  SELECT s.doc_b AS doc_id, r.label FROM reach r JOIN sym s ON s.doc_a = r.doc_id),
       |lab AS (SELECT doc_id, MIN(label) AS cluster_rep FROM reach GROUP BY doc_id)""".stripMargin
  // q95's wide conditional-aggregate body (no ORDER BY), shared with the
  // q97 melt
  private lazy val pivotSelect =
    s"""SELECT user_id,
       |${Relational.EventTypes.map(t =>
         s" CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t,")
         .mkString("\n")}
       | CAST(SUM(CASE WHEN event_type IN (${Relational.EventTypes
         .map(t => s"'$t'").mkString(", ")}) THEN 1 ELSE 0 END) AS BIGINT) AS n_total
       |FROM events GROUP BY user_id""".stripMargin
  // q56's declarative frame sampler down to per-frame frh rows, shared
  // with the q96 frame-dedup
  private lazy val frameCtes =
    """fr AS (SELECT doc_id AS asset_id, text,
      |         unnest(range((length(text) - 1) // 32 + 1)) AS frame_id
      |       FROM documents),
      |frh AS (SELECT asset_id, CAST(frame_id AS BIGINT) AS frame_id,
      |         CAST(length(substring(text, frame_id * 32 + 1, 16)) AS BIGINT) AS frame_len,
      |         md5(substring(text, frame_id * 32 + 1, 16)) AS frame_md5
      |       FROM fr)""".stripMargin
  // q26's marker-profile language-ID down to per-doc lr(doc_id, lang,
  // pred_lang), shared with the q94 consistency audit (l-prefixed names)
  private lazy val langIdCtes =
    """lt AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
      |ls AS (SELECT doc_id, lang,
      |  CAST(len(list_filter(toks, x -> x IN ('table','row'))) AS BIGINT) AS s_de,
      |  CAST(len(list_filter(toks, x -> x IN ('key','value'))) AS BIGINT) AS s_en,
      |  CAST(len(list_filter(toks, x -> x IN ('scan','merge'))) AS BIGINT) AS s_es,
      |  CAST(len(list_filter(toks, x -> x IN ('join','query'))) AS BIGINT) AS s_fr,
      |  CAST(len(list_filter(toks, x -> x IN ('spark','batch'))) AS BIGINT) AS s_zh
      | FROM lt),
      |lm AS (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS best FROM ls),
      |lr AS (SELECT doc_id, lang,
      |  CASE WHEN s_de = best AND best > 0 THEN 'de'
      |       WHEN s_en = best AND best > 0 THEN 'en'
      |       WHEN s_es = best AND best > 0 THEN 'es'
      |       WHEN s_fr = best AND best > 0 THEN 'fr'
      |       WHEN s_zh = best AND best > 0 THEN 'zh'
      |       ELSE 'und' END AS pred_lang
      | FROM lm)""".stripMargin
  // q62's per-doc rule predicates, shared with the q93 manifest
  // (f-prefixed names so they compose beside minhashCtes' t/u/sig)
  private lazy val funnelFlagCtes =
    """ft AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
      |fm AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS nt,
      |        CAST(length(replace(text, ' ', '')) AS BIGINT) AS nl,
      |        CAST(len(list_distinct(toks)) AS BIGINT) AS nd,
      |        (list_contains(toks, 'the') OR list_contains(toks, 'a')) AS has_stop
      |      FROM ft),
      |ff AS (SELECT doc_id, (nt >= 20) AS p1, (nt <= 80) AS p2,
      |        (nl >= nt*4 AND nl <= nt*6) AS p3, has_stop AS p4,
      |        (nd*10 >= nt*4) AS p5 FROM fm)""".stripMargin
  // q50's contamination screen down to the per-doc overlap row `crep`
  // (non-bench docs only), shared with the q93 manifest
  private lazy val contaminationCtes =
    s"""ct AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |cg0 AS (SELECT doc_id, $grams AS grams FROM ct),
       |cg AS (SELECT doc_id, unnest(list_distinct(grams)) AS gram FROM cg0),
       |cbench AS (SELECT DISTINCT gram FROM cg WHERE doc_id % 20 = 0),
       |ccand AS (SELECT doc_id, gram FROM cg WHERE doc_id % 20 <> 0),
       |cshared AS (SELECT doc_id, COUNT(*) AS n_shared FROM ccand JOIN cbench USING (gram) GROUP BY doc_id),
       |csizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM ccand GROUP BY doc_id),
       |cre AS (SELECT d.doc_id,
       |        COALESCE(s.n_grams, 0) AS n_grams, COALESCE(sh.n_shared, 0) AS n_shared,
       |        CASE WHEN COALESCE(s.n_grams, 0) > 0
       |          THEN COALESCE(sh.n_shared, 0) * 1.0 / s.n_grams ELSE 0.0 END AS overlap
       |      FROM documents d
       |      LEFT JOIN csizes s ON d.doc_id = s.doc_id
       |      LEFT JOIN cshared sh ON d.doc_id = sh.doc_id
       |      WHERE d.doc_id % 20 <> 0),
       |crep AS (SELECT *, CAST(overlap >= 0.5 AS BIGINT) AS contaminated FROM cre)""".stripMargin
  private def cosD(a: String, b: String) =
    s"${dotD(a, b)} / (sqrt(${dotD(a, a)}) * sqrt(${dotD(b, b)}))"
  // portable round (see graft.functions.Portable): floor(x*10^n + 0.5)/10^n
  private def pr4(x: String) = s"floor(($x) * 10000 + 0.5) / 10000.0"
  private def pr6(x: String) = s"floor(($x) * 1000000 + 0.5) / 1000000.0"
  // q127/q128 shared: DSIR importance weights down to per-doc
  // dw(doc_id, n_tokens, importance) — target = src0 slice, proposal =
  // corpus, add-1 smoothing, fixed-point 1e-6 sums (q81 discipline)
  private lazy val dsirWeightCtes: String =
    s"""tok AS (SELECT doc_id, source,
       |        unnest(string_split(text, ' ')) AS tok FROM documents),
       |dt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
       |       FROM tok GROUP BY doc_id, tok),
       |cf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS np FROM tok GROUP BY tok),
       |tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS nt
       |       FROM tok WHERE source = 'src0' GROUP BY tok),
       |tot AS (SELECT CAST(SUM(np) AS BIGINT) AS np_tot,
       |          CAST(COUNT(*) AS BIGINT) AS v FROM cf),
       |ttot AS (SELECT CAST(COALESCE(SUM(nt), 0) AS BIGINT) AS nt_tot FROM tf),
       |j AS (SELECT doc_id,
       |    CAST(SUM(CAST(floor(c *
       |        (ln((COALESCE(nt, 0) + 1) / (nt_tot + v))
       |       - ln((np + 1) / (np_tot + v))) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s6,
       |    CAST(SUM(c) AS BIGINT) AS n_tokens
       |  FROM dt JOIN cf USING (tok) LEFT JOIN tf USING (tok), tot, ttot
       |  GROUP BY doc_id),
       |dw AS (SELECT doc_id, n_tokens, ${pr6("s6 / 1000000.0")} AS importance
       |       FROM j)""".stripMargin
  // the md5 split coin + 80/10/10 bucketing (q80/q83 convention)
  private def coinSql(x: String) =
    s"CAST(CAST('0x' || substr(md5('split:' || $x::VARCHAR), 1, 6) AS INTEGER) AS BIGINT) % 10"
  private def splitSql(x: String) =
    s"CASE WHEN ${coinSql(x)} < 8 THEN 'train' WHEN ${coinSql(x)} = 8 THEN 'val' ELSE 'test' END"

  /** ±1 sign array as a DuckDB DOUBLE[] literal (same constants the Spark
    * plan embeds via lit(...) — see Similarity.signHyperplanes). */
  private def sqlSigns(a: Array[Double]): String =
    a.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]::DOUBLE[]")

  /** Oracle for q34: replicates the banded sign-LSH candidate generation
    * (Similarity.bandedCandidates) exactly — candidates from a (band_id,
    * band_val) equi-join, then exact cosine top-20 — so the hash check
    * verifies the BLOCKED pipeline, the same way q33's oracle replicates
    * its bucket pruning. */
  /** q23's oracle (k=10) — also a component of q67's recall evaluation and,
    * at k=50, the dense arm of q134's RRF fusion. */
  private def cosineTopNOracle(k: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT v AS pv FROM e WHERE vec_id = 0),
       |s AS (SELECT vec_id, ${pr4(cosD("v", "pv"))} AS cos_sim FROM e, p),
       |r AS (SELECT CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rnk,
       |        vec_id, cos_sim FROM s)
       |SELECT rnk, vec_id, cos_sim FROM r WHERE rnk <= $k ORDER BY rnk""".stripMargin
  private lazy val cosineTopKOracle: String = cosineTopNOracle(10)

  /** q33's oracle — also a component of q67's recall evaluation. */
  private lazy val annLshOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |bkt AS (SELECT vec_id, v,
       |  (CASE WHEN v[1]  > v[2]  THEN 1   ELSE 0 END +
       |   CASE WHEN v[5]  > v[6]  THEN 2   ELSE 0 END +
       |   CASE WHEN v[9]  > v[10] THEN 4   ELSE 0 END +
       |   CASE WHEN v[13] > v[14] THEN 8   ELSE 0 END +
       |   CASE WHEN v[17] > v[18] THEN 16  ELSE 0 END +
       |   CASE WHEN v[21] > v[22] THEN 32  ELSE 0 END +
       |   CASE WHEN v[25] > v[26] THEN 64  ELSE 0 END +
       |   CASE WHEN v[29] > v[30] THEN 128 ELSE 0 END)::BIGINT AS bucket
       | FROM e),
       |p AS (SELECT v AS pv, bucket AS pbucket FROM bkt WHERE vec_id = 0),
       |s AS (SELECT vec_id, bucket, ${pr4(cosD("v", "pv"))} AS cos_sim
       |      FROM bkt, p WHERE bucket = pbucket),
       |r AS (SELECT CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rnk,
       |        vec_id, bucket, cos_sim FROM s)
       |SELECT rnk, vec_id, bucket, cos_sim FROM r WHERE rnk <= 10 ORDER BY rnk""".stripMargin

  /** Shared by q03 (plain join) and q60 (salted join): both must stay
    * row-identical by design, so they verify against the SAME oracle. */
  private lazy val revenueByNationOracle: String =
    s"""SELECT n_name,
       | CAST(SUM(CAST(ROUND($rev*10000, 0) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** The banded sign-LSH candidate CTE chain (e, n, bands, cand) — shared
    * by q34's pair oracle and q66's cluster oracle. */
  private lazy val nearDupCandCtes: String = {
    val nb = Similarity.NearDupBits
    val bs = Similarity.NearDupBandSize
    val signs = Similarity.signHyperplanes(nb, Similarity.EmbeddingDim)
    val bitExprs = (0 until nb).map(j =>
      s"CASE WHEN ${dotD("v", sqlSigns(signs(j)))} > 0 THEN 1 ELSE 0 END")
    val bandExprs = (0 until nb / bs).map { b =>
      (0 until bs).map(k => s"(${bitExprs(b * bs + k)}) * ${1L << k}").mkString(" + ")
    }
    val bandList = bandExprs.map(e => s"CAST($e AS BIGINT)").mkString("[", ",\n   ", "]")
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(${dotD("v", "v")}) AS norm FROM e),
       |bands AS (SELECT vec_id, t.b AS band_id,
       |  list_extract($bandList, t.b + 1) AS band_val
       | FROM e, range(${nb / bs}) t(b)),
       |cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |         FROM bands x JOIN bands y
       |           ON x.band_id = y.band_id AND x.band_val = y.band_val
       |          AND x.vec_id < y.vec_id)""".stripMargin
  }

  private lazy val nearDupOracle: String =
    s"""WITH $nearDupCandCtes
       |SELECT vec_a, vec_b, ${pr4(s"${dotD("a.v", "b.v")} / (a.norm * b.norm)")} AS cos_sim
       |FROM cand JOIN n a ON vec_a = a.vec_id JOIN n b ON vec_b = b.vec_id
       |ORDER BY cos_sim DESC, vec_a, vec_b LIMIT 20""".stripMargin

  /** Shared q41/q75 CTE chain: deterministic k-means training
    * (Similarity.trainIvfCodebook — init = vec_ids 1..4, 3 Lloyd rounds,
    * fixed-point 10⁻⁶ centroid means) unrolled per iteration, ending at
    * `cellf` = every vector with its final cell (codebook = `cb3`). */
  private lazy val ivfCellCtes: String = {
    val dim = Similarity.EmbeddingDim
    val k = 4
    val iters = 3
    val sb = new StringBuilder
    sb.append(
      s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(${dotD("v", "v")}) AS norm FROM e),
         |cb0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id BETWEEN 1 AND $k),
         |""".stripMargin)
    for (it <- 1 to iters) {
      val prev = s"cb${it - 1}"
      sb.append(
        s"""a$it AS (SELECT n.vec_id, n.v, c_id,
           |  ${dotD("n.v", "cv")} / (n.norm * sqrt(${dotD("cv", "cv")})) AS c_cos
           | FROM n, $prev),
           |r$it AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id) AS rn FROM a$it),
           |s$it AS (SELECT vec_id, v, c_id AS cell FROM r$it WHERE rn = 1),
           |u$it AS (SELECT cell, t.i AS i,
           |   SUM(CAST(floor(v[t.i + 1] * 1000000.0 + 0.5) AS BIGINT)) AS s, COUNT(*) AS cnt
           | FROM s$it, range($dim) t(i) GROUP BY cell, t.i),
           |cb$it AS (SELECT $prev.c_id, COALESCE(nu.cv, $prev.cv) AS cv
           | FROM $prev LEFT JOIN (SELECT cell AS c_id,
           |     list(CAST(s AS DOUBLE) / (CAST(cnt AS DOUBLE) * 1000000.0) ORDER BY i) AS cv
           |   FROM u$it GROUP BY cell) nu ON $prev.c_id = nu.c_id),
           |""".stripMargin)
    }
    sb.append(
      s"""af AS (SELECT n.vec_id, n.v, n.norm, c_id,
         |  ${dotD("n.v", "cv")} / (n.norm * sqrt(${dotD("cv", "cv")})) AS c_cos
         | FROM n, cb$iters),
         |rf AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id) AS rn FROM af),
         |cellf AS (SELECT vec_id, v, norm, CAST(c_id AS BIGINT) AS cell FROM rf WHERE rn = 1)""".stripMargin)
    sb.toString
  }

  /** Oracle for q41: the shared cell CTEs + the multi-probe (nprobe=2)
    * cell-pruned cosine top-10. */
  private lazy val ivfOracle: String = {
    val nprobe = 2
    s"""WITH $ivfCellCtes,
       |p AS (SELECT v AS pv, norm AS pnorm FROM n WHERE vec_id = 0),
       |pc AS (SELECT c_id, row_number() OVER (ORDER BY
       |         ${dotD("pv", "cv")} / (pnorm * sqrt(${dotD("cv", "cv")})) DESC, c_id) AS prn
       |       FROM cb3, p),
       |probe_cells AS (SELECT CAST(c_id AS BIGINT) AS pcell FROM pc WHERE prn <= $nprobe),
       |sc AS (SELECT vec_id, cell, ${pr4(s"${dotD("v", "pv")} / (norm * pnorm)")} AS cos_sim
       |       FROM cellf, p WHERE cell IN (SELECT pcell FROM probe_cells)),
       |rk AS (SELECT CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rnk,
       |         vec_id, cell, cos_sim FROM sc)
       |SELECT rnk, vec_id, cell, cos_sim FROM rk WHERE rnk <= 10 ORDER BY rnk""".stripMargin
  }

  /** Oracle for q79: replicates the distributed power iteration
    * (Similarity.principalDirection — init [0.125]⁶⁴, 3 rounds, fixed-point
    * 10⁻⁶ accumulations, centering by linearity) with unrolled round CTEs,
    * then the same projection + Rayleigh-λ outlier cut. */
  private lazy val principalOracle: String = {
    val dim = Similarity.EmbeddingDim
    val iters = 3
    val w0Lit = Array.fill(dim)("0.125").mkString("[", ", ", "]")
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |m0 AS (SELECT t.i AS i, SUM(CAST(floor(v[t.i + 1] * 1000000.0 + 0.5) AS BIGINT)) AS s, COUNT(*) AS cnt
         | FROM e, range($dim) t(i) GROUP BY t.i),
         |mean AS (SELECT list(CAST(s AS DOUBLE) / (CAST(cnt AS DOUBLE) * 1000000.0) ORDER BY i) AS mv FROM m0),
         |w0 AS (SELECT $w0Lit::DOUBLE[] AS wv),
         |""".stripMargin)
    for (it <- 1 to iters) {
      val prev = s"w${it - 1}"
      sb.append(
        s"""d$it AS (SELECT vec_id, v, ${dotD("v", "wv")} - ${dotD("mv", "wv")} AS d FROM e, $prev, mean),
           |s$it AS (SELECT t.i AS i, SUM(CAST(floor(d * v[t.i + 1] * 1000000.0 + 0.5) AS BIGINT)) AS s
           | FROM d$it, range($dim) t(i) GROUP BY t.i),
           |t$it AS (SELECT SUM(CAST(floor(d * 1000000.0 + 0.5) AS BIGINT)) AS t FROM d$it),
           |u$it AS (SELECT list(CAST(s AS DOUBLE) / 1000000.0 - mv[i + 1] * (CAST(t AS DOUBLE) / 1000000.0) ORDER BY i) AS uv
           | FROM s$it, t$it, mean),
           |w$it AS (SELECT list_transform(uv, x -> x / sqrt(${dotD("uv", "uv")})) AS wv FROM u$it),
           |""".stripMargin)
    }
    sb.append(
      s"""df AS (SELECT vec_id, ${dotD("v", "wv")} - ${dotD("mv", "wv")} AS d FROM e, w$iters, mean),
         |lam AS (SELECT SUM(CAST(floor(d * d * 1000000.0 + 0.5) AS BIGINT)) AS l2, COUNT(*) AS cnt FROM df)
         |SELECT vec_id, ${pr6("d")} AS proj,
         | CAST(CASE WHEN abs(d) > 2.0 * sqrt(CAST(l2 AS DOUBLE) / (CAST(cnt AS DOUBLE) * 1000000.0)) THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
         |FROM df, lam ORDER BY vec_id""".stripMargin)
    sb.toString
  }

  /** Oracle for q73: replicates the greedy MMR selection with one unrolled
    * CTE pair per step (the q41-style unrolling of an iterative algorithm):
    * candidate pool + pairwise sim table once, then step i picks the
    * argmax of `0.7·rel − (1−0.7)·max-sim-to-selected` among the not-yet-
    * selected. `1 − λ` is spelled as a DOUBLE-cast subtraction: the engine
    * computes it in IEEE doubles (1.0−0.7 = 0.30000000000000004), while a
    * bare DuckDB `(1.0 - 0.7)` folds in DECIMAL to exactly 0.3. */
  private lazy val mmrOracle: String = {
    val k = 5
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(${dotD("v", "v")}) AS norm FROM e),
         |p AS (SELECT v AS pv, norm AS pnorm FROM n WHERE vec_id = 0),
         |cand AS (SELECT vec_id, v, norm,
         |           ${pr4(s"${dotD("v", "pv")} / (norm * pnorm)")} AS rel
         |         FROM n, p WHERE vec_id <> 0 ORDER BY rel DESC, vec_id LIMIT 20),
         |sims AS (SELECT a.vec_id AS va, b.vec_id AS vb,
         |           ${pr4(s"${dotD("a.v", "b.v")} / (a.norm * b.norm)")} AS sim
         |         FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         |sel1 AS (SELECT vec_id, rel, 0.0 AS max_sim,
         |           0.7 * rel - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * 0.0 AS score
         |         FROM cand ORDER BY score DESC, vec_id LIMIT 1),
         |""".stripMargin)
    for (i <- 2 to k) {
      val selUnion = (1 until i).map(j => s"SELECT vec_id FROM sel$j")
        .mkString(" UNION ALL ")
      sb.append(
        s"""m$i AS (SELECT c.vec_id, c.rel, MAX(s.sim) AS max_sim
           |      FROM cand c JOIN sims s ON s.va = c.vec_id
           |      WHERE s.vb IN ($selUnion) AND c.vec_id NOT IN ($selUnion)
           |      GROUP BY c.vec_id, c.rel),
           |sel$i AS (SELECT vec_id, rel, max_sim,
           |           0.7 * rel - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * max_sim AS score
           |         FROM m$i ORDER BY score DESC, vec_id LIMIT 1),
           |""".stripMargin)
    }
    val unionAll = (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS sel_rank, vec_id, rel AS relevance, " +
        s"max_sim, score AS mmr_score FROM sel$i")
      .mkString("\n UNION ALL ")
    sb.append(
      s"""f AS ($unionAll)
         |SELECT sel_rank, vec_id, relevance, max_sim, mmr_score FROM f
         |ORDER BY sel_rank""".stripMargin)
    sb.toString
  }

  def oracleSql: Map[String, String] = Map(
    "q73_mmr_select" -> mmrOracle,
    "q01_filter_project" ->
      s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         | floor(($rev) * 100 + 0.5) / 100.0 AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | SUM(l_quantity) AS sum_qty,
         | CAST(SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
         | CAST(SUM(CAST(ROUND($rev*10000, 0) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_disc_price,
         | CAST(SUM(CAST(ROUND($rev*(1+l_tax)*1000000, 0) AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_charge,
         | AVG(l_quantity) AS avg_qty,
         | COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q03_revenue_nation" -> revenueByNationOracle,

    // q60 is q03 through the salted-join path: the salt only changes the
    // shuffle key, not the result, so the oracle is the SAME string — the
    // two can never diverge.
    "q60_salted_join" -> revenueByNationOracle,

    "q04_broadcast_region" ->
      """SELECT r_name, COUNT(*) AS n_suppliers
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q05_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q06_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q07_topk_per_group" ->
      """SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q08_lag_lead" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events)
        |SELECT user_id, event_id, event_type, ts_us,
        | lag(event_type) OVER w AS prev_type,
        | (ts_us - lag(ts_us) OVER w) / 1000000.0 AS secs_since_prev
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q09_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |f AS (SELECT user_id, event_id, ts_us,
        |        CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > 600000000 THEN 1 ELSE 0 END AS new_session
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |g AS (SELECT user_id, ts_us,
        |        CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |      FROM f)
        |SELECT user_id, session_seq, COUNT(*) AS event_count,
        | (MAX(ts_us) - MIN(ts_us)) / 1000000.0 AS span_secs
        |FROM g GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,

    "q10_distinct_agg" ->
      """SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
        | COUNT(DISTINCT user_id) * 1.0 / COUNT(*) AS user_ratio
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q11_rollup" ->
      """SELECT CAST(GROUPING(p_brand) AS BIGINT) AS g_brand,
        | CAST(GROUPING(p_type) AS BIGINT) AS g_type, p_brand, p_type,
        | CAST(SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY ROLLUP(p_brand, p_type)
        |ORDER BY g_brand, g_type, p_brand, p_type""".stripMargin,

    "q12_cube" ->
      """SELECT CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        | CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        | l_returnflag, l_linestatus, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin,

    "q13_set_ops" ->
      """SELECT custkey FROM (
        |  (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |   INTERSECT
        |   SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 0)
        |  EXCEPT
        |  SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |) t ORDER BY custkey""".stripMargin,

    "q14_top10_orders" ->
      """SELECT o_orderkey, o_totalprice AS price FROM orders
        |ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin,

    "q15_string_funcs" ->
      """SELECT p_partkey, UPPER(SUBSTRING(p_name, 1, 8)) AS name8,
        | p_brand || '#' || p_type AS brand_type
        |FROM part WHERE p_name LIKE '%red%' ORDER BY p_partkey""".stripMargin,

    "q16_date_agg" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | CAST(month(o_orderdate) AS BIGINT) AS o_month,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(ROUND(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS total_revenue
        |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""".stripMargin,

    "q17_latest_per_key" ->
      """SELECT user_id, event_id, event_type
        |FROM (SELECT user_id, event_id, event_type,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q18_quality_suite" ->
      """WITH e AS (SELECT *, CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ts_s FROM events)
        |SELECT COUNT(*) AS total_rows,
        | COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS null_user_id,
        | CAST(COUNT(DISTINCT event_id) = COUNT(*) AS BIGINT) AS event_id_unique,
        | COUNT(CASE WHEN event_type NOT IN ('click','error','purchase','signup','view') THEN 1 END) AS domain_violations,
        | COUNT(CASE WHEN value < 0 OR value > 1000 THEN 1 END) AS value_range_violations,
        | MIN(ts_s) AS min_ts_s, MAX(ts_s) AS max_ts_s
        |FROM e""".stripMargin,

    "q19_json_extract" ->
      """SELECT event_type,
        | CAST(SUM(TRY_CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        | COUNT(CASE WHEN TRY_CAST(props->>'$.k' AS BIGINT) IS NULL THEN 1 END) AS null_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q20_range_join" ->
      """SELECT o_orderkey, COUNT(l_orderkey) AS n_shipped_30d
        |FROM orders LEFT JOIN lineitem
        |  ON o_orderkey = l_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate < o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q21_exact_dedup" ->
      """SELECT doc_id, md5(text) AS fp,
        | CAST(row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1 AS BIGINT) AS is_dup
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q22_text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        | CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        | AVG(n_chars) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q23_cosine_topk" -> cosineTopKOracle,

    "q24_order_invariant" ->
      s"""SELECT l_orderkey, COUNT(*) AS n_lines,
         | CAST(SUM(CAST(ROUND($rev*100, 0) AS BIGINT)) AS BIGINT) AS total_cents,
         | CAST(MAX(CAST(ROUND($rev*100, 0) AS BIGINT)) AS BIGINT) AS max_line_cents,
         | CAST(SUM(CAST(ROUND($rev*100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS order_total
         |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q25_token_counts" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS word_tokens,
        | CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS subword_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q26_lang_id" ->
      s"""WITH $langIdCtes
        |SELECT doc_id, lang, pred_lang, CAST(pred_lang = lang AS BIGINT) AS correct
        |FROM lr ORDER BY doc_id""".stripMargin,

    "q27_text_quality" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, CAST(length(text) AS BIGINT) AS n_chars_m FROM documents),
        |u AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |        CAST(len(list_filter(toks, x -> x = 'a')) AS BIGINT) AS stop_hits, n_chars_m FROM t),
        |v AS (SELECT doc_id, n_tokens, n_chars_m, stop_hits * 1.0 / n_tokens AS stop_ratio FROM u)
        |SELECT doc_id, n_tokens, n_chars_m, stop_ratio,
        | floor(LEAST(1.0, GREATEST(0.0, 0.25 * log10(n_tokens + 1) + 0.5 - 0.8 * stop_ratio)) * 10000 + 0.5) / 10000.0 AS quality_score
        |FROM v ORDER BY doc_id""".stripMargin,

    "q28_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
         |u AS (SELECT doc_id, text, toks, $grams AS grams FROM t)
         |SELECT doc_id, md5(text) AS fp_exact,
         | md5(array_to_string(list_sort(toks), ' ')) AS fp_sorted,
         | list_min(list_transform(grams, g -> md5(g))) AS fp_min_shingle
         |FROM u ORDER BY doc_id""".stripMargin,

    "q29_minhash_sig" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |u AS (SELECT doc_id, $grams AS grams FROM t)
         |SELECT doc_id,
         | list_min(list_transform(grams, g -> md5('0:' || g))) AS mh0,
         | list_min(list_transform(grams, g -> md5('1:' || g))) AS mh1,
         | list_min(list_transform(grams, g -> md5('2:' || g))) AS mh2,
         | list_min(list_transform(grams, g -> md5('3:' || g))) AS mh3,
         | list_min(list_transform(grams, g -> md5('4:' || g))) AS mh4,
         | list_min(list_transform(grams, g -> md5('5:' || g))) AS mh5,
         | list_min(list_transform(grams, g -> md5('6:' || g))) AS mh6,
         | list_min(list_transform(grams, g -> md5('7:' || g))) AS mh7
         |FROM u ORDER BY doc_id""".stripMargin,

    "q30_minhash_pairs" ->
      s"""WITH $minhashCtes
        |SELECT doc_a, doc_b, $estJaccard AS est_jaccard
        |FROM cand JOIN sig a ON doc_a = a.doc_id JOIN sig b ON doc_b = b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q31_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, lang, source, string_split(text, ' ') AS toks FROM documents),
         |g AS (SELECT doc_id, lang, source, list_distinct($grams) AS grams FROM t)
         |SELECT a.lang AS lang, a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
         | CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0
         |   THEN len(list_intersect(a.grams, b.grams)) * 1.0 / len(list_distinct(list_concat(a.grams, b.grams)))
         |   ELSE 0.0 END AS jaccard
         |FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         |ORDER BY lang, source, doc_a, doc_b""".stripMargin,

    "q32_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |h AS (SELECT doc_id, CAST(CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER) AS BIGINT) AS h FROM tok),
        |bits AS (SELECT doc_id, h, unnest(range(16)) AS bit FROM h),
        |s AS (SELECT doc_id, bit, SUM(CASE WHEN (h // CAST(pow(2, bit) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS s
        |      FROM bits GROUP BY doc_id, bit)
        |SELECT doc_id,
        | CAST(SUM(CASE WHEN s > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash16
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q33_ann_lsh" -> annLshOracle,

    "q34_embed_neardup" -> nearDupOracle,

    "q35_multimodal_meta" ->
      """SELECT doc_id AS asset_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | md5(text) AS content_md5,
        | hex(encode(substr(text, 1, 8))) AS head_hex
        |FROM documents ORDER BY asset_id""".stripMargin,

    "q36_user_segments" ->
      """SELECT user_id, COUNT(*) AS n_events,
        | CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS total_value,
        | COUNT(DISTINCT event_type) AS n_types,
        | CAST(COUNT(*) > 200 AS BIGINT) AS is_bot,
        | CASE WHEN CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) / 100.0 > 10000 THEN 'high_value'
        |      WHEN COUNT(*) < 20 THEN 'at_risk'
        |      ELSE 'regular' END AS user_segment
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q37_gold_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS total_value,
        | CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) / 100.0 / COUNT(*) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY event_date, event_type""".stripMargin,

    "q38_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |w AS (
        |  SELECT *,
        |    max(CASE WHEN event_type = 'click'
        |        THEN lpad(ts_us::VARCHAR, 16, '0') || ':' || lpad(event_id::VARCHAR, 10, '0') END)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, is_p, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
        |  FROM u)
        |SELECT event_id, user_id, ts_us,
        | CAST(substr(last_click, 18, 10) AS BIGINT) AS last_click_event_id,
        | (ts_us - CAST(substr(last_click, 1, 16) AS BIGINT)) / 1000000.0 AS gap_secs
        |FROM w WHERE is_p = 1 ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q39_running_total" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |             CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events)
        |SELECT user_id, event_id, ts_us,
        | CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0 AS running_value
        |FROM e ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q40_hourly_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_start,
        | event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,

    "q41_ann_ivf" -> ivfOracle,

    "q42_vocabulary" ->
      """SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS doc_freq
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY n_occurrences DESC, token LIMIT 100""".stripMargin,

    "q43_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
        |dfx AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token),
        |nn AS (SELECT COUNT(*) * 1.0 AS n FROM documents),
        |j AS (SELECT tf.doc_id, tf.token, tf.tf, dfx.df,
        |        floor((tf.tf * ln(nn.n / dfx.df)) * 10000 + 0.5) / 10000.0 AS tfidf
        |      FROM tf, dfx, nn WHERE tf.token = dfx.token),
        |r AS (SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS BIGINT) AS rn,
        |        token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf FROM j)
        |SELECT doc_id, rn, token, tf, df, tfidf FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,

    "q44_sample" ->
      """SELECT lang, COUNT(*) AS n_docs,
        | COUNT(CASE WHEN bucket = 0 THEN 1 END) AS n_sampled,
        | COUNT(CASE WHEN bucket = 0 THEN 1 END) * 1.0 / COUNT(*) AS sample_rate
        |FROM (SELECT lang,
        |        CAST(CAST('0x' || substr(md5(text), 1, 4) AS INTEGER) AS BIGINT) % 10 AS bucket
        |      FROM documents) t
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q45_length_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        | CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        | floor(quantile_cont(n_chars, 0.5) * 10000 + 0.5) / 10000.0 AS median_chars,
        | floor(quantile_cont(n_chars, 0.9) * 10000 + 0.5) / 10000.0 AS p90_chars,
        | CAST(MAX(n_chars) AS BIGINT) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q46_hybrid_search" -> hybridSearchOracle,

    "q49_neardup_clusters" ->
      s"""WITH RECURSIVE $minhashCtes,
        |$ccClusterCtes
        |SELECT doc_id, cluster_rep,
        | CAST(doc_id = cluster_rep AS BIGINT) AS keep
        |FROM lab ORDER BY doc_id""".stripMargin,

    "q50_contamination" ->
      s"""WITH $contaminationCtes
         |SELECT doc_id, n_grams, n_shared, overlap, contaminated
         |FROM crep ORDER BY doc_id""".stripMargin,

    "q51_repetition" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
         |td AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |         COUNT(*) AS n_distinct, MAX(c) AS top_tok FROM tc GROUP BY doc_id),
         |t2 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g0 AS (SELECT doc_id, unnest($grams) AS gram FROM t2),
         |gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g0 GROUP BY doc_id, gram),
         |gd AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams, MAX(c) AS top_gram
         |       FROM gc GROUP BY doc_id)
         |SELECT td.doc_id, td.n_tokens,
         | 1.0 - td.n_distinct * 1.0 / td.n_tokens AS dup_tok_frac,
         | td.top_tok * 1.0 / td.n_tokens AS top_tok_frac,
         | CASE WHEN gd.n_grams IS NOT NULL THEN gd.top_gram * 1.0 / gd.n_grams
         |      ELSE 0.0 END AS top_gram_frac
         |FROM td LEFT JOIN gd ON td.doc_id = gd.doc_id
         |ORDER BY td.doc_id""".stripMargin,

    "q52_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, toks,
        |        unnest(range((len(toks) - 1) // 24 + 1)) AS chunk_id FROM t)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        | CAST(len(list_slice(toks, chunk_id*24 + 1, chunk_id*24 + 32)) AS BIGINT) AS chunk_len,
        | md5(array_to_string(list_slice(toks, chunk_id*24 + 1, chunk_id*24 + 32), ' ')) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q53_domain_mix" ->
      """WITH ps AS (SELECT source, COUNT(*) AS n_docs,
        |              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |            FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS tot_docs,
        |          CAST(SUM(n_tokens) AS DOUBLE) AS tot_tokens,
        |          CAST(COUNT(*) AS DOUBLE) AS n_sources FROM ps)
        |SELECT source, n_docs, n_tokens,
        | n_docs / tot_docs AS doc_share,
        | n_tokens / tot_tokens AS token_share,
        | (1.0 / n_sources) / (n_docs / tot_docs) AS uniform_weight
        |FROM ps, tot ORDER BY source""".stripMargin,

    "q54_pii_redact" ->
      """WITH s1 AS (SELECT doc_id, text,
        |    regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g') AS after_email
        |  FROM documents),
        |s2 AS (SELECT *, regexp_replace(after_email, '\+?[0-9][0-9() -]{7,}[0-9]', '[PHONE]', 'g') AS after_phone FROM s1)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_email,
        | CAST(len(regexp_extract_all(after_email, '\+?[0-9][0-9() -]{7,}[0-9]')) AS BIGINT) AS n_phone,
        | CAST(len(regexp_extract_all(after_phone, '\b(customer|user)\b')) AS BIGINT) AS n_lexicon,
        | md5(regexp_replace(after_phone, '\b(customer|user)\b', '[REDACTED]', 'g')) AS redacted_fp
        |FROM s2 ORDER BY doc_id""".stripMargin,

    "q55_jaccard_prefiltered" ->
      s"""WITH $minhashCtes,
        |est AS (SELECT doc_a, doc_b, $estJaccard AS est_jaccard
        |        FROM cand JOIN sig a ON doc_a = a.doc_id JOIN sig b ON doc_b = b.doc_id),
        |pre AS (SELECT * FROM est WHERE est_jaccard >= 0.5),
        |gd AS (SELECT doc_id, list_distinct(grams) AS grams FROM u)
        |SELECT p.doc_a, p.doc_b, p.est_jaccard,
        | len(list_intersect(ga.grams, gb.grams)) * 1.0 /
        |   len(list_distinct(list_concat(ga.grams, gb.grams))) AS jaccard
        |FROM pre p JOIN gd ga ON p.doc_a = ga.doc_id JOIN gd gb ON p.doc_b = gb.doc_id
        |ORDER BY p.doc_a, p.doc_b""".stripMargin,

    "q56_frame_sample" ->
      s"""WITH $frameCtes
        |SELECT asset_id, frame_id, frame_len, frame_md5
        |FROM frh ORDER BY asset_id, frame_id""".stripMargin,

    "q57_embed_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |r AS (SELECT vec_id, v, list_min(v) AS vmin, list_max(v) AS vmax,
        |        (list_max(v) - list_min(v)) / 255.0 AS scale FROM e),
        |q AS (SELECT vec_id, vmin, vmax, scale,
        |        list_transform(v, x -> CASE WHEN scale = 0.0 THEN 0
        |          ELSE CAST(floor((x - vmin) / scale + 0.5) AS BIGINT) END) AS qv
        |      FROM r)
        |SELECT vec_id, vmin, vmax, scale,
        | CAST(COALESCE(list_sum(qv), 0) AS BIGINT) AS q_checksum,
        | md5(COALESCE(array_to_string(qv, ','), '')) AS q_fp
        |FROM q ORDER BY vec_id""".stripMargin,

    "q58_collocations" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |flat AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
        |bip AS (SELECT doc_id, unnest(list_transform(range(len(toks) - 1),
        |          i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS p FROM tok),
        |bi AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bip),
        |uni AS (SELECT tok, COUNT(*) AS c FROM flat GROUP BY tok),
        |bic AS (SELECT w1, w2, COUNT(*) AS c_ab FROM bi GROUP BY w1, w2 HAVING COUNT(*) >= 5),
        |tot AS (SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS n_uni,
        |               (SELECT COUNT(*) FROM bi) AS n_bi),
        |j AS (SELECT w1, w2, c_ab, ua.c AS c_a, ub.c AS c_b,
        |        floor(ln(CAST(c_ab AS DOUBLE) * CAST(n_uni AS DOUBLE) * CAST(n_uni AS DOUBLE)
        |          / (CAST(n_bi AS DOUBLE) * CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)))
        |          * 10000 + 0.5) / 10000.0 AS pmi
        |      FROM bic JOIN uni ua ON w1 = ua.tok JOIN uni ub ON w2 = ub.tok, tot)
        |SELECT w1, w2, c_ab, c_a, c_b, pmi FROM j
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,

    "q59_doc_packing" ->
      """WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT)
        |          AS global_offset
        |      FROM t)
        |SELECT doc_id, n_tokens, global_offset,
        | global_offset // 256 AS pack_id,
        | global_offset % 256 AS pack_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    "q47_funnel" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |w AS (SELECT user_id, event_type,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
        |      FROM e)
        |SELECT prev_type, event_type, COUNT(*) AS n_transitions,
        | COUNT(DISTINCT user_id) AS n_users
        |FROM w WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type ORDER BY prev_type, event_type""".stripMargin,

    // q48: the HLL sketch values can't be hash-matched across engines, but
    // the TOLERANCE AUDIT can — the Spark side emits 1 iff
    // 20·|approx − exact| ≤ exact (|Δ|/exact ≤ 5%, exact integer compare;
    // measured max deviation 2.53% at sf0.1 with rsd=0.02), and the oracle
    // asserts the flag. A sketch drifting past tolerance now FAILS the row
    // instead of hiding behind a rows-only check.
    "q48_approx_distinct" ->
      """SELECT event_type,
        | CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        | CAST(1 AS BIGINT) AS users_within_tol,
        | CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_events,
        | CAST(1 AS BIGINT) AS events_within_tol
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // q61 extends q49's recursive-CTE cluster resolution with the keep
    // decision: canonical member = max n_chars, ties to smallest doc_id.
    "q61_canonical_docs" ->
      s"""WITH RECURSIVE $minhashCtes,
        |$ccClusterCtes,
        |c AS (SELECT d.doc_id, d.n_chars, l.cluster_rep
        |      FROM documents d JOIN lab l ON d.doc_id = l.doc_id)
        |SELECT doc_id, cluster_rep,
        | CAST(COUNT(*) OVER (PARTITION BY cluster_rep) AS BIGINT) AS cluster_size,
        | FIRST_VALUE(doc_id) OVER (PARTITION BY cluster_rep ORDER BY n_chars DESC, doc_id) AS canonical_id,
        | CAST(doc_id = FIRST_VALUE(doc_id) OVER (PARTITION BY cluster_rep ORDER BY n_chars DESC, doc_id) AS BIGINT) AS keep
        |FROM c ORDER BY doc_id""".stripMargin,

    "q62_filter_funnel" ->
      s"""WITH $funnelFlagCtes,
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |  CAST(SUM(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS o1,
        |  CAST(SUM(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT) AS o2,
        |  CAST(SUM(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS BIGINT) AS o3,
        |  CAST(SUM(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END) AS BIGINT) AS o4,
        |  CAST(SUM(CASE WHEN p1 AND p2 AND p3 AND p4 AND p5 THEN 1 ELSE 0 END) AS BIGINT) AS o5
        | FROM ff)
        |SELECT * FROM (
        | SELECT CAST(1 AS BIGINT) AS rule_idx, 'min_tokens' AS rule,
        |        total AS n_in, total - o1 AS n_dropped, o1 AS n_out FROM a
        | UNION ALL SELECT CAST(2 AS BIGINT), 'max_tokens', o1, o1 - o2, o2 FROM a
        | UNION ALL SELECT CAST(3 AS BIGINT), 'word_len', o2, o2 - o3, o3 FROM a
        | UNION ALL SELECT CAST(4 AS BIGINT), 'stopword', o3, o3 - o4, o4 FROM a
        | UNION ALL SELECT CAST(5 AS BIGINT), 'dup_frac', o4, o4 - o5, o5 FROM a
        |) ORDER BY rule_idx""".stripMargin,

    "q63_stratified_sample" ->
      """WITH ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |            FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs,
        |               CAST(COUNT(*) AS BIGINT) AS n_sources FROM ps),
        |d AS (SELECT doc_id, source,
        |        CAST(CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 6) AS INTEGER) AS BIGINT) AS h
        |      FROM documents)
        |SELECT doc_id, d.source, h,
        | floor(LEAST(1.0, CAST(tot_docs AS DOUBLE) / CAST(n_sources * n_docs AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS rate,
        | CAST(CAST(h AS HUGEINT) * n_sources * n_docs
        |   < CAST(tot_docs AS HUGEINT) * 16777216 AS BIGINT) AS keep
        |FROM d JOIN ps ON d.source = ps.source, tot
        |ORDER BY doc_id""".stripMargin,

    "q64_incremental_dedup" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |u AS (SELECT doc_id, text, $grams AS grams FROM t),
        |sk AS (SELECT doc_id,
        |  CASE WHEN len(grams) > 0
        |   THEN list_aggregate(list_transform(range(8),
        |          s -> list_min(list_transform(grams, g -> md5(s::VARCHAR || ':' || g)))),
        |        'string_agg', '|')
        |   ELSE md5(text) END AS sketch
        | FROM u),
        |led AS (SELECT DISTINCT sketch FROM sk WHERE doc_id % 2 = 0),
        |b AS (SELECT doc_id, sketch FROM sk WHERE doc_id % 2 = 1),
        |fc AS (SELECT sketch, MIN(doc_id) AS first_claim FROM b GROUP BY sketch)
        |SELECT doc_id, b.sketch,
        | CASE WHEN b.sketch IS NULL THEN 'no_sketch'
        |      WHEN b.sketch IN (SELECT sketch FROM led) THEN 'dup_ledger'
        |      WHEN doc_id <> first_claim THEN 'dup_batch'
        |      ELSE 'new' END AS status
        |FROM b LEFT JOIN fc ON b.sketch = fc.sketch
        |ORDER BY doc_id""".stripMargin,

    "q65_length_buckets" ->
      """WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nt FROM documents),
        |f AS (SELECT nt, CAST(length(bin(nt)) - 1 AS BIGINT) AS bucket,
        |        (1::BIGINT << length(bin(nt))) - nt AS pad
        |      FROM t WHERE nt > 0)
        |SELECT bucket,
        | CAST(1::BIGINT << bucket AS BIGINT) AS lo,
        | CAST((1::BIGINT << (bucket + 1)) - 1 AS BIGINT) AS hi,
        | CAST(COUNT(*) AS BIGINT) AS n_docs,
        | CAST(SUM(nt) AS BIGINT) AS total_tokens,
        | MIN(nt) AS min_tokens, MAX(nt) AS max_tokens,
        | CAST(SUM(pad) AS BIGINT) AS pad_waste
        |FROM f GROUP BY bucket ORDER BY bucket""".stripMargin,

    // q66 reuses q34's banded-candidate CTEs, then resolves clusters the
    // same way q49's oracle does (recursive transitive closure).
    "q66_semantic_clusters" ->
      s"""WITH RECURSIVE $nearDupCandCtes,
        |edges AS (SELECT vec_a, vec_b
        |          FROM cand JOIN n a ON vec_a = a.vec_id JOIN n b ON vec_b = b.vec_id
        |          WHERE ${dotD("a.v", "b.v")} / (a.norm * b.norm) >= 0.4),
        |sym AS (SELECT vec_a, vec_b FROM edges
        |        UNION ALL SELECT vec_b AS vec_a, vec_a AS vec_b FROM edges),
        |reach(vec_id, label) AS (
        |  SELECT vec_id, vec_id AS label FROM e
        |  UNION
        |  SELECT s.vec_b AS vec_id, r.label FROM reach r JOIN sym s ON s.vec_a = r.vec_id),
        |lab AS (SELECT vec_id, MIN(label) AS cluster_rep FROM reach GROUP BY vec_id)
        |SELECT vec_id, cluster_rep,
        | CAST(COUNT(*) OVER (PARTITION BY cluster_rep) AS BIGINT) AS cluster_size,
        | CAST(vec_id = cluster_rep AS BIGINT) AS keep
        |FROM lab ORDER BY vec_id""".stripMargin,

    // q67 composes the q23/q33/q41 oracles verbatim as subqueries (DuckDB
    // allows WITH inside a derived table), so the evaluation verifies
    // against exactly the result sets those queries hash-check.
    "q67_ann_recall" ->
      s"""WITH bf AS (SELECT vec_id FROM ($cosineTopKOracle) t),
        |lsh AS (SELECT vec_id FROM ($annLshOracle) t),
        |ivf AS (SELECT vec_id FROM ($ivfOracle) t),
        |s AS (
        | SELECT 'ivf' AS method, CAST(10 AS BIGINT) AS k,
        |        CAST(COUNT(*) AS BIGINT) AS n_hits
        | FROM ivf WHERE vec_id IN (SELECT vec_id FROM bf)
        | UNION ALL
        | SELECT 'lsh', CAST(10 AS BIGINT), CAST(COUNT(*) AS BIGINT)
        | FROM lsh WHERE vec_id IN (SELECT vec_id FROM bf))
        |SELECT method, k, n_hits, CAST(n_hits AS DOUBLE) / 10 AS recall
        |FROM s ORDER BY method""".stripMargin,

    // q68's thresholds interpolate over the FIXED-POINT score·10⁴ integers
    // at quarter fractions — (1-f)·a + f·b is exact in IEEE for integer
    // a, b and f ∈ {0.25, 0.5, 0.75}, so quantile_cont and Spark's
    // percentile agree bit-for-bit regardless of association order.
    "q68_quality_calibration" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
        |u AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS nt,
        |        CAST(len(list_filter(toks, x -> x = 'a')) AS BIGINT) AS sh FROM t),
        |s AS (SELECT doc_id, source,
        |        CAST(floor(LEAST(1.0, GREATEST(0.0,
        |          0.25 * log10(nt + 1) + 0.5 - 0.8 * (sh * 1.0 / nt))) * 10000.0 + 0.5)
        |          AS BIGINT) AS score_i
        |      FROM u),
        |thr AS (SELECT source,
        |          quantile_cont(score_i, 0.25) AS p25_i,
        |          quantile_cont(score_i, 0.5) AS p50_i,
        |          quantile_cont(score_i, 0.75) AS p75_i
        |        FROM s GROUP BY source)
        |SELECT doc_id, s.source AS source, score_i / 10000.0 AS quality_score,
        | p25_i / 10000.0 AS p25, p50_i / 10000.0 AS p50, p75_i / 10000.0 AS p75,
        | CASE WHEN score_i >= p75_i THEN 'top'
        |      WHEN score_i >= p50_i THEN 'high'
        |      WHEN score_i >= p25_i THEN 'mid'
        |      ELSE 'low' END AS tier
        |FROM s JOIN thr ON s.source = thr.source
        |ORDER BY doc_id""".stripMargin,

    "q69_gram_novelty" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g0 AS (SELECT doc_id, list_distinct($grams) AS grams FROM t),
         |g AS (SELECT doc_id, unnest(grams) AS gram FROM g0),
         |dfq AS (SELECT gram, COUNT(*) AS df FROM g GROUP BY gram),
         |pd AS (SELECT doc_id, COUNT(*) AS n_grams,
         |         CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
         |       FROM g JOIN dfq USING (gram) GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(n_grams, 0) AS n_grams,
         | COALESCE(n_unique, 0) AS n_unique,
         | CASE WHEN COALESCE(n_grams, 0) > 0 THEN n_unique * 1.0 / n_grams
         |      ELSE 0.0 END AS novelty
         |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // The normalizing denominator sums FIXED-POINT √share·10⁹ BIGINTs, so
    // it is order-independent; every other op is a single IEEE division or
    // multiplication of identical inputs (sqrt is correctly rounded in both
    // engines; pow is not guaranteed to be, hence τ fixed at 0.5).
    "q70_mix_schedule" ->
      """WITH ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |            FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tot_tokens FROM ps),
        |w AS (SELECT source, n_docs, n_tokens, tot_tokens,
        |        n_tokens / tot_tokens AS token_share,
        |        CAST(floor(sqrt(n_tokens / tot_tokens) * 1000000000.0 + 0.5) AS BIGINT) AS w_fix
        |      FROM ps, tot),
        |d AS (SELECT CAST(SUM(w_fix) AS DOUBLE) AS denom FROM w),
        |f AS (SELECT source, n_docs, n_tokens, token_share,
        |        w_fix / denom AS mix_weight,
        |        CAST(floor(w_fix / denom * tot_tokens) AS BIGINT) AS target_tokens
        |      FROM w, d)
        |SELECT source, n_docs, n_tokens, token_share, mix_weight, target_tokens,
        | target_tokens * 1.0 / n_tokens AS epochs
        |FROM f ORDER BY source""".stripMargin,

    "q71_shard_assign" ->
      """WITH a AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 6) AS INTEGER) AS BIGINT) % 16 AS shard
        |  FROM documents),
        |per AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |          CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |        FROM a GROUP BY shard),
        |tot AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS tot_docs,
        |          CAST(SUM(n_tokens) AS DOUBLE) AS tot_tokens FROM per)
        |SELECT shard, n_docs, n_tokens,
        | n_docs * 16.0 / tot_docs AS doc_balance,
        | n_tokens * 16.0 / tot_tokens AS token_balance
        |FROM per, tot ORDER BY shard""".stripMargin,

    // q72 reuses q34's banded-candidate CTEs; the per-vector rank mirrors
    // the engine's WindowGroupLimit-planned keyed window.
    "q72_knn_graph" ->
      s"""WITH $nearDupCandCtes,
        |sym AS (SELECT vec_a AS src, vec_b AS dst FROM cand
        |        UNION ALL SELECT vec_b AS src, vec_a AS dst FROM cand),
        |s AS (SELECT src, dst,
        |        ${pr4(s"${dotD("a.v", "b.v")} / (a.norm * b.norm)")} AS cos_sim
        |      FROM sym JOIN n a ON src = a.vec_id JOIN n b ON dst = b.vec_id),
        |r AS (SELECT src, CAST(row_number() OVER
        |        (PARTITION BY src ORDER BY cos_sim DESC, dst) AS BIGINT) AS rnk,
        |        dst, cos_sim FROM s)
        |SELECT src, rnk, dst, cos_sim FROM r WHERE rnk <= 3
        |ORDER BY src, rnk""".stripMargin,

    // q74: rare-5-gram blocked containment with a bottom-32 est-containment
    // prefilter between blocking and verify (Dedup.containment's round-7
    // shape); both threshold cuts are exact integer cross-multiplies in
    // both engines (no float boundary). 'g' > every lowercase-hex digest.
    "q74_containment" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g AS (SELECT doc_id, list_distinct(${gramsN(5)}) AS grams FROM t),
         |f AS (SELECT doc_id, unnest(grams) AS gram FROM g),
         |dfq AS (SELECT gram, COUNT(*) AS df FROM f GROUP BY gram),
         |rare AS (SELECT f.doc_id, f.gram FROM f JOIN dfq USING (gram)
         |         WHERE df BETWEEN 2 AND 10),
         |cand AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM rare x JOIN rare y ON x.gram = y.gram AND x.doc_id <> y.doc_id
         |         GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz_a FROM f GROUP BY doc_id),
         |sk AS (SELECT doc_id, list_slice(list_sort(list(md5(gram))), 1, 32) AS sk
         |       FROM f GROUP BY doc_id),
         |skj AS (SELECT c.doc_a, c.doc_b, a.sk AS sk_a, b.sk AS sk_b,
         |          CASE WHEN len(b.sk) < 32 THEN 'g' ELSE b.sk[32] END AS tb
         |        FROM cand c JOIN sk a ON a.doc_id = c.doc_a
         |                    JOIN sk b ON b.doc_id = c.doc_b),
         |el AS (SELECT doc_a, doc_b, sk_b,
         |         list_filter(sk_a, h -> h <= tb) AS elig FROM skj),
         |pre AS (SELECT doc_a, doc_b FROM el
         |        WHERE len(elig) > 0
         |          AND len(list_intersect(elig, sk_b)) * 100 >= len(elig) * 20),
         |inter AS (SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
         |          FROM pre c
         |          JOIN f a ON a.doc_id = c.doc_a
         |          JOIN f b ON b.doc_id = c.doc_b AND b.gram = a.gram
         |          GROUP BY c.doc_a, c.doc_b)
         |SELECT i.doc_a, i.doc_b, i.n_shared, s.sz_a,
         | i.n_shared * 1.0 / s.sz_a AS containment
         |FROM inter i JOIN sz s ON s.doc_id = i.doc_a
         |WHERE i.n_shared * 2 >= s.sz_a
         |ORDER BY doc_a, doc_b""".stripMargin,

    // q75 reuses q41's unrolled k-means cell CTEs; epochs is an exact
    // integer ceiling (// in DuckDB == div in Spark).
    "q75_cluster_balance" ->
      s"""WITH $ivfCellCtes,
         |g AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM cellf GROUP BY cell),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM cellf)
         |SELECT g.cell, g.n_vecs, tot.n_total,
         | n_vecs * 1.0 / n_total AS share,
         | n_total * 1.0 / (4 * n_vecs) AS weight,
         | CAST((n_total + 4 * n_vecs - 1) // (4 * n_vecs) AS BIGINT) AS epochs
         |FROM g, tot ORDER BY cell""".stripMargin,

    "q76_drift_report" ->
      s"""WITH d AS (SELECT doc_id, lang,
         |    CAST(length(bin(n_chars)) - 1 AS BIGINT) AS bucket FROM documents),
         |cells AS (SELECT lang, bucket,
         |    CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
         |  FROM d GROUP BY lang, bucket),
         |tot AS (SELECT
         |    CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tot_a,
         |    CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tot_b
         |  FROM d)
         |SELECT lang, bucket, n_a, n_b,
         | ${pr6("n_a * 1.0 / tot_a")} AS share_a,
         | ${pr6("n_b * 1.0 / tot_b")} AS share_b,
         | ${pr6("(n_b * 1.0 / tot_b) - (n_a * 1.0 / tot_a)")} AS share_delta,
         | CASE WHEN n_a > 0 THEN ${pr6(
           "(n_b - n_a * tot_b / tot_a) * (n_b - n_a * tot_b / tot_a) / (n_a * tot_b / tot_a)")}
         |   END AS chi2_term
         |FROM cells, tot ORDER BY lang, bucket""".stripMargin,

    "q77_chunk_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |ix AS (SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM t),
        |tok AS (SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos, toks[i + 1] AS tok FROM ix),
        |b AS (SELECT doc_id, pos, tok,
        |    CASE WHEN CAST(CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER) AS BIGINT) % 16 = 0
        |      THEN 1 ELSE 0 END AS boundary FROM tok),
        |c AS (SELECT doc_id, pos, tok, COALESCE(SUM(boundary) OVER
        |    (PARTITION BY doc_id ORDER BY pos
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id FROM b),
        |ch AS (SELECT doc_id, chunk_id,
        |    md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
        |  FROM c GROUP BY doc_id, chunk_id),
        |hdf AS (SELECT chunk_hash, COUNT(*) AS cdf FROM ch GROUP BY chunk_hash)
        |SELECT ch.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        | CAST(SUM(CASE WHEN cdf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        | SUM(CASE WHEN cdf >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS dup_ratio
        |FROM ch JOIN hdf USING (chunk_hash)
        |GROUP BY ch.doc_id ORDER BY doc_id""".stripMargin,

    // q78: the order-sensitive float sum Σ c·ln(c) goes through fixed-point
    // BIGINTs (the money-sum rule); ln over identical integer-valued doubles
    // is bit-identical across engines (q43 precedent).
    "q78_token_entropy" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |c AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
         |      FROM tok GROUP BY doc_id, tok),
         |a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |    CAST(SUM(CAST(floor(c * ln(c) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS e6
         |  FROM c GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_distinct,
         | ${pr6("ln(n_tokens) - e6 / (n_tokens * 1000000.0)")} AS entropy
         |FROM a ORDER BY doc_id""".stripMargin,

    "q79_principal_direction" -> principalOracle,

    // q80: q30's banded candidates + the md5 split coin; est_jaccard is an
    // exact multiple of 1/8, so the ≥0.5 cut has no float boundary.
    "q80_split_leakage" ->
      s"""WITH $minhashCtes,
         |pairs AS (SELECT doc_a, doc_b
         |          FROM cand JOIN sig a ON doc_a = a.doc_id JOIN sig b ON doc_b = b.doc_id
         |          WHERE $estJaccard >= 0.5),
         |sp AS (SELECT doc_id,
         |    CASE WHEN coin < 8 THEN 'train' WHEN coin = 8 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |      CAST(CAST('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 6) AS INTEGER) AS BIGINT) % 10 AS coin
         |    FROM documents)),
         |g AS (SELECT LEAST(sa.split, sb.split) AS split_lo,
         |        GREATEST(sa.split, sb.split) AS split_hi
         |      FROM pairs JOIN sp sa ON doc_a = sa.doc_id JOIN sp sb ON doc_b = sb.doc_id)
         |SELECT split_lo, split_hi, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         | CAST(CASE WHEN split_lo <> split_hi THEN 1 ELSE 0 END AS BIGINT) AS is_leak
         |FROM g GROUP BY split_lo, split_hi
         |ORDER BY split_lo, split_hi""".stripMargin,

    // q81: each summand is one ln over a long/long→double division; the
    // signed sum goes through fixed-point BIGINTs.
    "q81_unigram_logprob" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |cf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf FROM tok GROUP BY tok),
         |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM tok),
         |dt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
         |       FROM tok GROUP BY doc_id, tok),
         |j AS (SELECT doc_id,
         |    CAST(SUM(CAST(floor(c * ln(cf / n_corpus) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s6,
         |    CAST(SUM(c) AS BIGINT) AS n_tokens
         |  FROM dt JOIN cf USING (tok), nt GROUP BY doc_id)
         |SELECT doc_id, n_tokens,
         | ${pr6("s6 / (n_tokens * 1000000.0)")} AS avg_logprob
         |FROM j ORDER BY doc_id""".stripMargin,

    // q82: centroids via fixed-point component sums (order-free integer
    // adds); the cross-snapshot delta is the exact integer sa·n_cur −
    // sb·n_base, and every Σ-of-products is list_dot_product over an
    // i-ordered list — the same sequential fold as the DotProduct
    // expression (q79 precedent).
    "q82_centroid_drift" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |comp AS (SELECT label, t.i AS i,
         |    SUM(CASE WHEN vec_id % 2 = 0
         |      THEN CAST(floor(v[t.i + 1] * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END) AS sa,
         |    SUM(CASE WHEN vec_id % 2 = 1
         |      THEN CAST(floor(v[t.i + 1] * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END) AS sb,
         |    SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
         |    SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS nb
         |  FROM e, range(${Similarity.EmbeddingDim}) t(i) GROUP BY label, t.i),
         |nlab AS (SELECT label, CAST(MAX(na) AS BIGINT) AS n_base,
         |    CAST(MAX(nb) AS BIGINT) AS n_cur FROM comp GROUP BY label),
         |per AS (SELECT c.label, n_base, n_cur,
         |    list(CAST(sa AS DOUBLE) ORDER BY i) AS la,
         |    list(CAST(sb AS DOUBLE) ORDER BY i) AS lb,
         |    list(CAST(sa * n_cur - sb * n_base AS DOUBLE) ORDER BY i) AS lnum
         |  FROM comp c JOIN nlab USING (label) GROUP BY c.label, n_base, n_cur)
         |SELECT label, n_base, n_cur,
         | CASE WHEN n_base > 0 AND n_cur > 0 THEN ${pr6(
           "sqrt(list_dot_product(lnum, lnum)) / (n_base * n_cur * 1000000.0)")}
         |   END AS l2_drift,
         | CASE WHEN n_base > 0 AND n_cur > 0
         |       AND list_dot_product(la, la) > 0 AND list_dot_product(lb, lb) > 0
         |   THEN ${pr6(
           "list_dot_product(la, lb) / (sqrt(list_dot_product(la, la)) * sqrt(list_dot_product(lb, lb)))")}
         |   END AS cos_centroid
         |FROM per ORDER BY label""".stripMargin,

    // q83: q49's recursive cluster closure + the split coin thrown on the
    // cluster representative instead of the doc itself.
    "q83_cluster_split" ->
      s"""WITH RECURSIVE $minhashCtes,
         |$ccClusterCtes
         |SELECT doc_id, cluster_rep,
         | ${splitSql("cluster_rep")} AS split,
         | ${splitSql("doc_id")} AS solo_split,
         | CAST((${splitSql("cluster_rep")}) <> (${splitSql("doc_id")}) AS BIGINT) AS moved
         |FROM lab ORDER BY doc_id""".stripMargin,

    // q84: vocab truncation boundary is (cf DESC, tok) — deterministic
    // tie-break, so the top-K set is engine-exact; OOV occurrences counted
    // from the shared (doc, token) count table.
    "q84_oov_rate" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |dt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
         |       FROM tok GROUP BY doc_id, tok),
         |voc AS (SELECT tok FROM (SELECT tok, CAST(SUM(c) AS BIGINT) AS cf
         |                         FROM dt GROUP BY tok) t
         |        ORDER BY cf DESC, tok LIMIT 500),
         |j AS (SELECT doc_id, c, CASE WHEN v.tok IS NULL THEN c ELSE 0 END AS oovc
         |      FROM dt LEFT JOIN voc v ON dt.tok = v.tok)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         | CAST(SUM(oovc) AS BIGINT) AS n_oov,
         | ${pr6("SUM(oovc) * 1.0 / SUM(c)")} AS oov_rate
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q85: fixed-point first/second moments per dimension; the variance is
    // assembled from the two integer sums with the same expression shape on
    // both engines, so the derived doubles match bit-for-bit.
    "q85_dim_stats" ->
      s"""WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
         |x AS (SELECT t.i AS i, v[t.i + 1] AS x
         |      FROM e, range(${Similarity.EmbeddingDim}) t(i)),
         |a AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s1,
         |    CAST(SUM(CAST(floor(x * x * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s2,
         |    MIN(x) AS mn, MAX(x) AS mx
         |  FROM x GROUP BY i)
         |SELECT CAST(i AS BIGINT) AS dim, n,
         | ${pr6("s1 / (n * 1000000.0)")} AS mean,
         | ${pr6("sqrt(GREATEST(s2 / (n * 1000000.0) - (s1 / (n * 1000000.0)) * (s1 / (n * 1000000.0)), 0.0))")} AS std,
         | ${pr6("mn")} AS dim_min,
         | ${pr6("mx")} AS dim_max
         |FROM a ORDER BY dim""".stripMargin,

    // q86: every ln is over an exact BIGINT; per-bin products through
    // fixed-point BIGINTs; the least-squares slope assembled from integer
    // sums in double arithmetic with the same expression shape as Spark.
    "q86_zipf_fit" ->
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |cf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf FROM tok GROUP BY tok),
         |spec AS (SELECT cf, CAST(COUNT(*) AS BIGINT) AS n_types FROM cf GROUP BY cf),
         |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
         |    CAST(SUM(cf * n_types) AS BIGINT) AS n_tokens,
         |    CAST(SUM(n_types) AS BIGINT) AS n_types_total,
         |    CAST(SUM(CAST(floor(ln(cf) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
         |    CAST(SUM(CAST(floor(ln(n_types) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
         |    CAST(SUM(CAST(floor(ln(cf) * ln(n_types) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
         |    CAST(SUM(CAST(floor(ln(cf) * ln(cf) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sxx
         |  FROM spec),
         |d AS (SELECT *, sx / 1000000.0 AS dx, sy / 1000000.0 AS dy,
         |    n_bins * (sxx / 1000000.0) - (sx / 1000000.0) * (sx / 1000000.0) AS den
         |  FROM s),
         |r AS (SELECT *,
         |    (n_bins * (sxy / 1000000.0) - dx * dy) / den AS slope_raw FROM d)
         |SELECT n_tokens, n_types_total, n_bins,
         | CASE WHEN den <> 0.0 THEN ${pr6("slope_raw")} END AS zipf_slope,
         | CASE WHEN den <> 0.0 THEN ${pr6("(dy - slope_raw * dx) / n_bins")} END AS zipf_intercept
         |FROM r""".stripMargin,

    // q87: first-occurrence via MIN(doc_id) per token; decile banding is
    // exact integer division against the max id (// == Spark div, q52
    // convention); cumulative sum over the ≤10-row band frame.
    "q87_vocab_growth" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |f AS (SELECT tok, MIN(doc_id) AS first_doc FROM tok GROUP BY tok),
        |m AS (SELECT MAX(doc_id) AS mx FROM documents),
        |b AS (SELECT CAST((first_doc * 10) // (mx + 1) AS BIGINT) AS decile,
        |        CAST(COUNT(*) AS BIGINT) AS n_new_types
        |      FROM f, m GROUP BY 1)
        |SELECT decile, n_new_types,
        | CAST(SUM(n_new_types) OVER (ORDER BY decile) AS BIGINT) AS cum_types
        |FROM b ORDER BY decile""".stripMargin,

    // q88: the q63 coin/cross-multiply conventions, with the repeat count
    // split into an exact integer floor (tot // den) + a coin-decided
    // fractional extra — HUGEINT vs decimal(38,0) on the cross-multiply.
    "q88_mix_resample" ->
      """WITH ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |            FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs,
        |               CAST(COUNT(*) AS BIGINT) AS n_sources FROM ps),
        |d AS (SELECT doc_id, d.source, n_sources * n_docs AS den, tot_docs,
        |        CAST(CAST('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 6) AS INTEGER) AS BIGINT) AS h
        |      FROM documents d JOIN ps ON d.source = ps.source, tot)
        |SELECT doc_id, source,
        | floor((CAST(tot_docs AS DOUBLE) / CAST(den AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS weight,
        | CAST(tot_docs // den AS BIGINT) +
        |   CAST(CAST(h AS HUGEINT) * den < CAST(tot_docs % den AS HUGEINT) * 16777216 AS BIGINT) AS n_repeats
        |FROM d ORDER BY doc_id""".stripMargin,

    // q89: ASCII-explicit char classes so Java regex (Spark) and RE2
    // (DuckDB) agree; DuckDB needs the 'g' flag for replace-all.
    "q89_norm_dedup" ->
      """WITH h AS (SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |      ' +', ' ', 'g'))) AS norm_hash,
        |    md5(text) AS raw_hash
        |  FROM documents),
        |n AS (SELECT doc_id,
        |    MIN(doc_id) OVER (PARTITION BY norm_hash) AS canon_id,
        |    MIN(doc_id) OVER (PARTITION BY raw_hash) AS raw_canon
        |  FROM h)
        |SELECT doc_id, canon_id,
        | CAST(doc_id <> canon_id AS BIGINT) AS is_dup_norm,
        | CAST(doc_id <> raw_canon AS BIGINT) AS is_dup_raw
        |FROM n ORDER BY doc_id""".stripMargin,

    // q90: q85's fixed-point moments feed the z-transform; z-codes are
    // fixed-point BIGINTs behind an order-free SUM checksum and an
    // i-ordered md5 fingerprint (integer-to-string only — no float
    // formatting crosses engines).
    "q90_whiten" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |x AS (SELECT vec_id, t.i AS i, v[t.i + 1] AS x
         |      FROM e, range(${Similarity.EmbeddingDim}) t(i)),
         |st AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s1,
         |    CAST(SUM(CAST(floor(x * x * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s2
         |  FROM x GROUP BY i),
         |sd AS (SELECT i, s1 / (n * 1000000.0) AS mean_raw,
         |    sqrt(GREATEST(s2 / (n * 1000000.0) - (s1 / (n * 1000000.0)) * (s1 / (n * 1000000.0)), 0.0)) AS std_raw
         |  FROM st),
         |c AS (SELECT vec_id, x.i,
         |    CASE WHEN std_raw = 0 THEN 0
         |         ELSE CAST(floor((x - mean_raw) / std_raw * 1000000.0 + 0.5) AS BIGINT) END AS code
         |  FROM x JOIN sd ON x.i = sd.i)
         |SELECT vec_id, CAST(SUM(code) AS BIGINT) AS z_checksum,
         | md5(string_agg(code::VARCHAR, ',' ORDER BY i)) AS z_fp
         |FROM c GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // q91: exact interpolated percentiles (quantile_cont == Spark
    // percentile, q45 parity); flags compare integer n_chars to the RAW
    // shared double — no rounding at the boundary.
    "q91_length_trim" ->
      s"""WITH p AS (SELECT lang, quantile_cont(n_chars, 0.99) AS p99_raw,
        |             quantile_cont(n_chars, 0.01) AS p01_raw
        |           FROM documents GROUP BY lang)
        |SELECT doc_id, d.lang, n_chars,
        | ${pr4("p99_raw")} AS p99_chars,
        | CAST(n_chars > p99_raw AS BIGINT) AS trim_high,
        | CAST(n_chars < p01_raw AS BIGINT) AS trim_low
        |FROM documents d JOIN p ON d.lang = p.lang ORDER BY doc_id""".stripMargin,

    // q92: gaps are exact micros BIGINTs off the normalized event clock
    // (epoch_us == Tables.events' ns div 1000); the median is the q45
    // percentile parity; ties broken by event_id in the lag window.
    // q93: the capstone manifest — every CTE block is the SAME shared
    // fragment its standalone query uses (minhash+CC clusters, funnel
    // flags, contamination screen, split coin), composed by doc_id joins.
    "q93_curation_manifest" ->
      s"""WITH RECURSIVE $minhashCtes,
         |$ccClusterCtes,
         |$funnelFlagCtes,
         |$contaminationCtes,
         |mf AS (SELECT d.doc_id, l.cluster_rep,
         |    (ff.p1 AND ff.p2 AND ff.p3 AND ff.p4 AND ff.p5) AS passed,
         |    CAST(d.doc_id = l.cluster_rep AS BIGINT) AS keep_cluster,
         |    COALESCE(cr.contaminated, 0) AS contaminated,
         |    (d.doc_id % 20 = 0) AS is_bench
         |  FROM documents d
         |  JOIN lab l ON d.doc_id = l.doc_id
         |  JOIN ff ON d.doc_id = ff.doc_id
         |  LEFT JOIN crep cr ON d.doc_id = cr.doc_id)
         |SELECT doc_id, cluster_rep, ${splitSql("cluster_rep")} AS split,
         | CAST(passed AS BIGINT) AS passed_filters, keep_cluster, contaminated,
         | CASE WHEN is_bench THEN 'benchmark'
         |      WHEN NOT passed THEN 'filtered'
         |      WHEN keep_cluster = 0 THEN 'near_dup'
         |      WHEN contaminated = 1 THEN 'contaminated'
         |      ELSE 'kept' END AS reason,
         | CAST(NOT is_bench AND passed AND keep_cluster = 1 AND contaminated = 0 AS BIGINT) AS in_corpus
         |FROM mf ORDER BY doc_id""".stripMargin,

    "q92_burst_detect" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |g AS (SELECT user_id, ts_us - lag(ts_us) OVER
        |        (PARTITION BY user_id ORDER BY ts_us, event_id) AS gap FROM e)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        | CAST(MIN(gap) AS BIGINT) AS min_gap_us,
        | ${pr4("quantile_cont(gap, 0.5)")} AS median_gap_us,
        | CAST(SUM(CASE WHEN gap < 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sub_second,
        | CAST(SUM(CASE WHEN gap < 1000000 THEN 1 ELSE 0 END) >= 3 AS BIGINT) AS burst_flag
        |FROM g WHERE gap IS NOT NULL GROUP BY user_id ORDER BY user_id""".stripMargin,

    // q94: q26's shared language-ID CTEs + one (source, lang) aggregate.
    "q94_lang_consistency" ->
      s"""WITH $langIdCtes,
         |lj AS (SELECT lr.doc_id, lr.lang, lr.pred_lang, d.source
         |       FROM lr JOIN documents d ON lr.doc_id = d.doc_id)
         |SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(CASE WHEN pred_lang <> lang THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
         | ${pr6("SUM(CASE WHEN pred_lang <> lang THEN 1 ELSE 0 END) * 1.0 / COUNT(*)")} AS mismatch_rate
         |FROM lj GROUP BY source, lang ORDER BY source, lang""".stripMargin,

    // q95: explicit-value pivot == one conditional aggregate per type.
    "q95_event_pivot" ->
      s"$pivotSelect ORDER BY user_id",

    // q97: the melt back to tidy triples — one UNION ALL arm per metric
    // over the shared pivot body.
    "q97_event_melt" ->
      s"""WITH p AS ($pivotSelect)
         |SELECT user_id, metric, n FROM (
         |${Relational.EventTypes.map(t =>
           s" SELECT user_id, 'n_$t' AS metric, n_$t AS n FROM p")
           .mkString(" UNION ALL\n")}
         |) ORDER BY user_id, metric""".stripMargin,

    // q96: q56's shared frame CTEs + a hash-keyed spread aggregate.
    "q96_frame_dedup" ->
      s"""WITH $frameCtes,
         |sp AS (SELECT frame_md5, COUNT(DISTINCT asset_id) AS n_assets
         |       FROM frh GROUP BY frame_md5)
         |SELECT asset_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
         | CAST(SUM(CASE WHEN n_assets >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         | ${pr6("SUM(CASE WHEN n_assets >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)")} AS shared_ratio
         |FROM frh JOIN sp USING (frame_md5)
         |GROUP BY asset_id ORDER BY asset_id""".stripMargin,

    // q98: the bloom sketch only PREFILTERS the scan; false positives die in
    // the verify join, so the oracle is the plain sketch-free join.
    "q98_bloom_join" ->
      """SELECT l_returnflag, COUNT(*) AS n_items, SUM(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 450000.0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // q99: exact quantiles hash-check against quantile_cont (q45 parity);
    // the approx_percentile sketch is engine-specific, so the oracle
    // asserts its tolerance FLAGS — a drifting sketch fails the row (q48
    // convention).
    "q99_quantile_audit" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         | ${pr4("quantile_cont(n_chars, 0.5)")} AS exact_p50,
         | CAST(1 AS BIGINT) AS p50_within_tol,
         | ${pr4("quantile_cont(n_chars, 0.95)")} AS exact_p95,
         | CAST(1 AS BIGINT) AS p95_within_tol
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // q100: the q63/q44 md5-prefix integer convention keys both the batch
    // assignment and the intra-batch order.
    "q100_epoch_shuffle" ->
      """WITH h AS (SELECT doc_id,
        |  CAST(CAST('0x' || substr(md5('epoch1:' || doc_id::VARCHAR), 1, 6) AS INTEGER) AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, h % 16 AS batch,
        | CAST(row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) AS BIGINT) AS pos_in_batch
        |FROM h ORDER BY batch, pos_in_batch""".stripMargin,

    // q101: union BY NAME with per-side null fill — the v1 arm predates
    // source/n_chars, the v2 arm dropped lang.
    "q101_schema_evolution" ->
      """SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source,
        | CAST(NULL AS BIGINT) AS n_chars, 'v1' AS snapshot
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, CAST(NULL AS VARCHAR), source, n_chars, 'v2'
        |FROM documents WHERE doc_id % 2 = 1
        |ORDER BY doc_id""".stripMargin,

    // q102: gaps-and-islands to SCD2 ranges; run_id = running count of
    // type-change flags, valid_to = next run's valid_from (NULL while open).
    "q102_scd2_ranges" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |r AS (SELECT user_id, event_id, event_type, ts_us,
        |        CASE WHEN lag(event_type) OVER w IS NULL
        |               OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS changed
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |ri AS (SELECT user_id, event_type, ts_us,
        |         CAST(SUM(changed) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
        |       FROM r),
        |runs AS (SELECT user_id, run_id, MIN(event_type) AS event_type,
        |           MIN(ts_us) AS valid_from_us, COUNT(*) AS n_events
        |         FROM ri GROUP BY user_id, run_id)
        |SELECT user_id, run_id, event_type, valid_from_us,
        | lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to_us,
        | n_events
        |FROM runs ORDER BY user_id, run_id""".stripMargin,

    // q103: first-order Markov transition counts; p is the same
    // double-over-double division both engines evaluate identically.
    "q103_event_bigrams" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |p AS (SELECT user_id, event_type,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
        |      FROM e),
        |c AS (SELECT prev_type, event_type, COUNT(*) AS n,
        |        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |      FROM p WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type)
        |SELECT prev_type, event_type, n, n_users,
        | CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS prev_total,
        | CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
        |FROM c ORDER BY prev_type, event_type""".stripMargin,

    // q104: exact top-k hash-checks; the CMS estimate is engine-specific, so
    // the oracle asserts its guarantees as flags (q48/q99 convention):
    // never-underestimate, and ≤ 1% of total mass over.
    "q104_heavy_hitters" -> heavyHittersOracle,

    // q158: the estimate arm served from the at-rest day-grain CMS table —
    // CMS is linear (merge sums count arrays), so merged day sketches ARE
    // the one-pass global sketch bit for bit and the row shares q104's
    // oracle verbatim (the q149 convention for an additive sketch).
    "q158_heavy_served" -> heavyHittersOracle,

    // q105: the q49 cluster fragment grouped twice — sizes, then the
    // histogram; n_dropped is the keep-one-representative saving.
    "q105_dedup_summary" -> dedupSummaryOracle,

    // q106: largest-remainder apportionment in exact integers — base floor
    // shares plus one for the top `leftover` remainders (ties to source).
    "q106_token_budget" ->
      """WITH tok AS (SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        |             FROM documents GROUP BY source),
        |t AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS tot FROM tok),
        |b AS (SELECT source, n_tok, (1000000 * n_tok) // tot AS base,
        |        (1000000 * n_tok) % tot AS rem FROM tok, t),
        |r AS (SELECT b.*, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b),
        |l AS (SELECT 1000000 - SUM(base) AS leftover FROM b)
        |SELECT source, n_tok,
        | CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens
        |FROM r, l ORDER BY source""".stripMargin,

    // q107: two exact long sums per lang; the ratio is one double division
    // at the end, and the median token count keeps q45's integer parity.
    "q107_fertility" ->
      s"""WITH d AS (SELECT lang, n_chars, len(string_split(text, ' ')) AS n_tok FROM documents)
         |SELECT lang, COUNT(*) AS n_docs,
         | CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         | CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         | CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE) AS chars_per_token,
         | ${pr4("quantile_cont(n_tok, 0.5)")} AS median_tokens
         |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    // q108: rank arithmetic is integral; the two ratios are single double
    // divisions of those integers — bit-identical across engines.
    "q108_length_quartiles" ->
      """SELECT doc_id, lang, n_chars,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume
        |FROM documents
        |WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
        |ORDER BY doc_id""".stripMargin,

    // q109: Pearson r from five exact integer moments with ONE shared final
    // double expression — engine corr() aggregates accumulate
    // partitioning-dependent FP error and can never hash-match.
    "q109_moment_corr" ->
      """WITH d AS (SELECT source, n_chars AS x,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS y FROM documents),
        |m AS (SELECT source, COUNT(*) AS n,
        |        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |        CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
        |        CAST(SUM(x*y) AS BIGINT) AS sxy
        |      FROM d GROUP BY source)
        |SELECT source, n AS n_docs,
        | CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
        |      THEN CAST(n*sxy - sx*sy AS DOUBLE) /
        |           sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
        |      ELSE NULL END AS corr_len_tok
        |FROM m ORDER BY source""".stripMargin,

    // q110: GROUPING() flags lead the sort (q11 convention) to separate the
    // sets; NULLS FIRST pins the within-set order to Spark's default for
    // any data-NULL grouped values (DuckDB defaults to NULLS LAST).
    "q110_grouping_sets" ->
      """SELECT CAST(GROUPING(lang) AS BIGINT) AS g_lang,
        | CAST(GROUPING(source) AS BIGINT) AS g_source,
        | lang, source, COUNT(*) AS n_docs,
        | CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY g_lang, g_source, lang NULLS FIRST, source NULLS FIRST""".stripMargin,

    // q111: MERGE INTO semantics — matched upserts update, unmatched
    // insert, deletes drop (absent-key delete is a no-op).
    "q111_merge_upsert" ->
      """WITH base AS (SELECT doc_id, n_chars AS v FROM documents WHERE doc_id % 3 <> 2),
        |u AS (SELECT doc_id, n_chars + 1000 AS u_v,
        |        CASE WHEN doc_id % 10 = 0 THEN 'delete' ELSE 'upsert' END AS op
        |      FROM documents WHERE doc_id % 2 = 0)
        |SELECT COALESCE(u.doc_id, base.doc_id) AS doc_id,
        | CASE WHEN u.op = 'upsert' THEN u.u_v ELSE base.v END AS v,
        | CASE WHEN u.doc_id IS NULL THEN 'kept'
        |      WHEN base.doc_id IS NULL THEN 'inserted'
        |      ELSE 'updated' END AS action
        |FROM base FULL OUTER JOIN u ON base.doc_id = u.doc_id
        |WHERE COALESCE(u.op, '') <> 'delete'
        |ORDER BY doc_id""".stripMargin,

    // q112: change-data-feed diff — added/removed/changed only, the
    // delta-sized output incrementals consume.
    "q112_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, n_chars AS old_v FROM documents WHERE doc_id % 5 <> 0),
        |c AS (SELECT doc_id, n_chars + doc_id % 3 AS new_v FROM documents WHERE doc_id % 7 <> 0),
        |d AS (SELECT COALESCE(o.doc_id, c.doc_id) AS doc_id, old_v, new_v,
        |        CASE WHEN o.doc_id IS NULL THEN 'added'
        |             WHEN c.doc_id IS NULL THEN 'removed'
        |             WHEN old_v <> new_v THEN 'changed'
        |             ELSE 'unchanged' END AS status
        |      FROM o FULL OUTER JOIN c ON o.doc_id = c.doc_id)
        |SELECT doc_id, old_v, new_v, status FROM d
        |WHERE status <> 'unchanged' ORDER BY doc_id""".stripMargin,

    // q113: schema-evolved MERGE — base-only column `src` survives updates
    // and NULLs on insert; change-only column `lang` arrives on upserts and
    // NULL-backfills kept rows. Same single full-outer join as q111.
    "q113_merge_evolved" ->
      """WITH base AS (SELECT doc_id, n_chars AS v, source AS src
        |              FROM documents WHERE doc_id % 3 <> 2),
        |u AS (SELECT doc_id, n_chars + 1000 AS v, lang,
        |        CASE WHEN doc_id % 10 = 0 THEN 'delete' ELSE 'upsert' END AS op
        |      FROM documents WHERE doc_id % 2 = 0)
        |SELECT COALESCE(u.doc_id, base.doc_id) AS doc_id,
        | CASE WHEN u.op = 'upsert' THEN u.v ELSE base.v END AS v,
        | base.src AS src,
        | CASE WHEN u.op = 'upsert' THEN u.lang ELSE NULL END AS lang,
        | CASE WHEN u.doc_id IS NULL THEN 'kept'
        |      WHEN base.doc_id IS NULL THEN 'inserted'
        |      ELSE 'updated' END AS action
        |FROM base FULL OUTER JOIN u ON base.doc_id = u.doc_id
        |WHERE COALESCE(u.op, '') <> 'delete'
        |ORDER BY doc_id""".stripMargin,

    // q114: per-file min/max/null manifest + the skip verdict for
    // "n_chars >= 900" (skip iff max < 900) — files = 250-doc_id ranges.
    "q114_skipping_stats" ->
      """SELECT doc_id // 250 AS file_id,
        | COUNT(*) AS n_rows,
        | MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars,
        | MIN(lang) AS min_lang, MAX(lang) AS max_lang,
        | CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_source,
        | CAST(MAX(n_chars) < 900 AS BIGINT) AS skip_long_docs
        |FROM documents GROUP BY 1 ORDER BY file_id""".stripMargin,

    // q115: bit-interleaved z-value of min-max-normalized (capped n_chars
    // bucket, md5 coin of lang:source) — exact integer arithmetic both
    // sides; z_file boxes 4096 consecutive z-values.
    "q115_zorder_layout" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    LEAST(255, n_chars // 16) AS zx,
        |    CAST(CAST('0x' || substr(md5(lang || ':' || source), 1, 2) AS INTEGER) AS BIGINT) AS zy
        |  FROM documents),
        |b AS (SELECT MIN(zx) minx, MAX(zx) maxx, MIN(zy) miny, MAX(zy) maxy FROM d),
        |nd AS (
        |  SELECT doc_id, zx, zy,
        |    CASE WHEN maxx = minx THEN 0 ELSE ((zx - minx) * 255) // (maxx - minx) END AS nx,
        |    CASE WHEN maxy = miny THEN 0 ELSE ((zy - miny) * 255) // (maxy - miny) END AS ny
        |  FROM d CROSS JOIN b),
        |z AS (
        |  SELECT doc_id, zx, zy,
        |    CAST(list_sum([((nx >> i) & 1) * (1 << (2*i))
        |                 + ((ny >> i) & 1) * (1 << (2*i + 1)) FOR i IN range(8)]) AS BIGINT) AS zval
        |  FROM nd)
        |SELECT doc_id, zx, zy, zval, zval // 4096 AS z_file
        |FROM z ORDER BY zval, doc_id""".stripMargin,

    // q116: purge cascade audit — the engine counts over the REAL derived
    // artifacts (q52 chunks / q56 frames / q29 signatures); the oracle
    // recomputes each artifact's cardinality in closed form from the
    // corpus (chunks: (len-1)//24+1 per doc; frames: (chars-1)//32+1 for
    // non-empty; signatures: one per doc), so the row also cross-checks
    // the artifact generators' declared per-doc cardinality rules.
    "q116_purge_audit" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents)
        |SELECT * FROM (
        |  SELECT 'chunks' AS artifact,
        |    CAST(SUM((len(toks) - 1) // 24 + 1) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN doc_id % 17 = 0 THEN (len(toks) - 1) // 24 + 1 ELSE 0 END) AS BIGINT) AS n_purged
        |  FROM t
        |  UNION ALL
        |  SELECT 'documents', COUNT(*),
        |    CAST(SUM(CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM t
        |  UNION ALL
        |  SELECT 'frames',
        |    CAST(SUM(CASE WHEN len(text) > 0 THEN (len(text) - 1) // 32 + 1 ELSE 0 END) AS BIGINT),
        |    CAST(SUM(CASE WHEN doc_id % 17 = 0 AND len(text) > 0 THEN (len(text) - 1) // 32 + 1 ELSE 0 END) AS BIGINT)
        |  FROM t
        |  UNION ALL
        |  SELECT 'signatures', COUNT(*),
        |    CAST(SUM(CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM t
        |) ORDER BY artifact""".stripMargin,

    // q117: one BPE-trainer iteration — adjacent char-pair counts weighted
    // by word frequency, extracted over the DISTINCT-WORD table (the
    // vocabulary-≪-corpus trick). range(1, len) is empty for 1-char words,
    // matching the Spark side's explicit length guard.
    "q117_bpe_pairs" ->
      """WITH w AS (SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS word FROM documents),
        |wc AS (SELECT word, COUNT(*) AS wcnt FROM w GROUP BY word),
        |p0 AS (SELECT word, wcnt, unnest(range(1, length(word))) AS i FROM wc),
        |p AS (SELECT substring(word, CAST(i AS INTEGER), 2) AS pair, wcnt FROM p0)
        |SELECT pair, CAST(SUM(wcnt) AS BIGINT) AS pair_count
        |FROM p GROUP BY pair
        |ORDER BY pair_count DESC, pair LIMIT 20""".stripMargin,

    // q118: cross-source near-dup overlap matrix over the same
    // est-Jaccard ≥ 0.5 edges as the q49 clusters; n_pairs = exploded
    // rows / 2 exactly (each edge contributes both endpoints).
    "q118_source_overlap" ->
      s"""WITH $minhashCtes,
        |edges AS (SELECT doc_a, doc_b
        |          FROM cand JOIN sig a ON doc_a = a.doc_id JOIN sig b ON doc_b = b.doc_id
        |          WHERE $estJaccard >= 0.5),
        |e2 AS (SELECT least(da.source, db.source) AS source_a,
        |              greatest(da.source, db.source) AS source_b,
        |              unnest([doc_a, doc_b]) AS d
        |       FROM edges
        |       JOIN documents da ON doc_a = da.doc_id
        |       JOIN documents db ON doc_b = db.doc_id)
        |SELECT source_a, source_b,
        |  CAST(COUNT(*) // 2 AS BIGINT) AS n_pairs,
        |  CAST(COUNT(DISTINCT d) AS BIGINT) AS n_docs
        |FROM e2 GROUP BY source_a, source_b
        |ORDER BY source_a, source_b""".stripMargin,

    // q119: exact-integer centroid distances — q_j = 10⁻⁶ fixed-point
    // coordinate, d2 = Σ(n·q_j − s_j)² (distance² scaled by n²·10¹²,
    // HUGEINT); outlier bit compares n_vec·d2 > 4·Σd2 exactly. The one
    // float is the presentation divide, mirrored as pround(…, 6).
    "q119_embed_outliers" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x ->
        |    CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS q
        |  FROM embeddings),
        |x AS (SELECT vec_id, unnest(q) AS qi, generate_subscripts(q, 1) AS i FROM e),
        |s AS (SELECT i, CAST(SUM(qi) AS HUGEINT) AS s1, COUNT(*) AS n FROM x GROUP BY i),
        |d AS (SELECT vec_id,
        |        SUM(CAST(n * qi - s1 AS HUGEINT) * CAST(n * qi - s1 AS HUGEINT)) AS d2,
        |        MAX(n) AS n
        |      FROM x JOIN s USING (i) GROUP BY vec_id),
        |t AS (SELECT SUM(d2) AS sum_d2, COUNT(*) AS n_vec FROM d)
        |SELECT vec_id,
        |  floor(CAST(d2 AS DOUBLE) / (CAST(n AS DOUBLE) * n * 1e12) * 1000000 + 0.5) / 1000000.0 AS dist2,
        |  CAST(n_vec * d2 > 4 * sum_d2 AS BIGINT) AS is_outlier
        |FROM d, t ORDER BY vec_id""".stripMargin,

    // q120: coverage@k per lang — all-integer threshold compares
    // (cum·100 ≥ p·tot), ranking deterministic on (cnt desc, token).
    "q120_vocab_coverage" ->
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT lang, token, COUNT(*) AS cnt FROM t GROUP BY lang, token),
        |r AS (SELECT lang, cnt,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS BIGINT) AS rk,
        |        SUM(cnt) OVER (PARTITION BY lang ORDER BY cnt DESC, token
        |                       ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM c),
        |g AS (SELECT lang, SUM(cnt) AS tot FROM c GROUP BY lang)
        |SELECT r.lang,
        |  MIN(CASE WHEN cum * 100 >= tot * 90 THEN rk END) AS k90,
        |  MIN(CASE WHEN cum * 100 >= tot * 95 THEN rk END) AS k95,
        |  MIN(CASE WHEN cum * 100 >= tot * 99 THEN rk END) AS k99,
        |  MAX(rk) AS vocab_size
        |FROM r JOIN g USING (lang) GROUP BY r.lang ORDER BY lang""".stripMargin,

    // q121: multi-doc cluster (size, langs, sources) histogram over the
    // same recursive closure as q49.
    "q121_cluster_purity" ->
      s"""WITH RECURSIVE $minhashCtes,
        |$ccClusterCtes,
        |cl AS (SELECT l.cluster_rep,
        |         CAST(COUNT(*) AS BIGINT) AS cluster_size,
        |         CAST(COUNT(DISTINCT d.lang) AS BIGINT) AS n_langs,
        |         CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources
        |       FROM lab l JOIN documents d USING (doc_id)
        |       GROUP BY l.cluster_rep)
        |SELECT cluster_size, n_langs, n_sources,
        |  CAST(COUNT(*) AS BIGINT) AS n_clusters
        |FROM cl WHERE cluster_size >= 2
        |GROUP BY cluster_size, n_langs, n_sources
        |ORDER BY cluster_size, n_langs, n_sources""".stripMargin,

    // q122: small-file bin packing per (lang) partition — offset-
    // quantized by layout order, bin = (inclusive cumsum - 1) // target
    // (boundaries at fixed multiples of target, not greedy reset); files
    // already >= target are excluded from the plan. cum is cast back to
    // BIGINT: DuckDB types a windowed SUM as HUGEINT, and bin_id must
    // come out BIGINT like every other oracle output column.
    "q122_compaction_plan" ->
      """WITH f AS (
        |  SELECT lang, doc_id // 50 AS file_id,
        |    CAST(SUM(n_chars) AS BIGINT) AS bytes
        |  FROM documents GROUP BY 1, 2
        |  HAVING CAST(SUM(n_chars) AS BIGINT) < 10000),
        |c AS (
        |  SELECT lang, file_id, bytes,
        |    SUM(bytes) OVER (PARTITION BY lang ORDER BY file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM f)
        |SELECT lang, (CAST(cum AS BIGINT) - 1) // 10000 AS bin_id,
        |  COUNT(*) AS n_files,
        |  CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
        |  MIN(file_id) AS first_file,
        |  MAX(file_id) AS last_file
        |FROM c GROUP BY 1, 2 ORDER BY lang, bin_id""".stripMargin,

    // q123: key histogram + integer-ppm share + recommended salt factor
    // ((cnt*parts + total - 1) // total), top-15 by count.
    "q123_skew_advisor" ->
      """WITH kc AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM kc)
        |SELECT user_id, cnt,
        |  cnt * 1000000 // total AS share_ppm,
        |  (cnt * 32 + total - 1) // total AS salt,
        |  CAST((cnt * 32 + total - 1) // total > 1 AS BIGINT) AS hot
        |FROM kc CROSS JOIN t
        |ORDER BY cnt DESC, user_id LIMIT 15""".stripMargin,

    // q124: the oracle does the FULL recompute the incremental merge must
    // equal — merge(partial(base), partial(delta)) == aggregate(all).
    // Money in exact integer cents (the ROUND(value*100) rule).
    "q124_incremental_agg" ->
      """SELECT event_type,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
        | MIN(CAST(ROUND(value*100, 0) AS BIGINT)) AS min_cents,
        | MAX(CAST(ROUND(value*100, 0) AS BIGINT)) AS max_cents,
        | CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
        |   / COUNT(*) / 100.0 AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // q125: copy-on-write vacuum audit — a touched file (sparse change
    // feed doc_id % 97 == 0; alternate touches % 194 are deletes) is
    // rewritten wholesale, so its FULL byte size is reclaimable.
    "q125_vacuum_audit" ->
      """SELECT doc_id // 25 AS file_id,
        | COUNT(*) AS n_rows,
        | CAST(SUM(CASE WHEN doc_id % 97 = 0 AND doc_id % 194 <> 0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_updates,
        | CAST(SUM(CASE WHEN doc_id % 194 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_deletes,
        | COUNT(*) - CAST(SUM(CASE WHEN doc_id % 194 = 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_carried,
        | CASE WHEN SUM(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) > 0
        |   THEN 'reclaim' ELSE 'keep' END AS status,
        | CASE WHEN SUM(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) > 0
        |   THEN CAST(SUM(n_chars) AS BIGINT) ELSE 0 END AS reclaim_bytes
        |FROM documents GROUP BY 1 ORDER BY file_id""".stripMargin,

    // q126: merge-on-read log replay — latest op per key among versions
    // <= 2 wins, surviving deletes erase the key. The log mirrors the
    // engine's deterministic stand-in version by version.
    "q126_log_replay" ->
      """WITH log AS (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS version,
        |    CAST(n_chars AS BIGINT) AS value,
        |    CASE WHEN doc_id % 7 = 0 THEN 'delete' ELSE 'upsert' END AS op
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, CAST(1 AS BIGINT),
        |    CAST(n_chars + 100 AS BIGINT),
        |    CASE WHEN (doc_id + 1) % 7 = 0 THEN 'delete' ELSE 'upsert' END
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id, CAST(2 AS BIGINT),
        |    CAST(n_chars + 200 AS BIGINT),
        |    CASE WHEN (doc_id + 2) % 7 = 0 THEN 'delete' ELSE 'upsert' END
        |  FROM documents WHERE doc_id % 4 = 0),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY version DESC) AS rn
        |  FROM log WHERE version <= 2)
        |SELECT doc_id, version, value FROM r
        |WHERE rn = 1 AND op = 'upsert' ORDER BY doc_id""".stripMargin,

    // q127: DSIR importance = sum of c*(ln p_target - ln p_proposal)
    // under add-1 unigram LMs (target = src0 slice, proposal = corpus),
    // q81's fixed-point 1e-6 discipline on the order-sensitive sum.
    "q127_importance_weights" ->
      s"""WITH $dsirWeightCtes
         |SELECT doc_id, n_tokens, importance
         |FROM dw ORDER BY doc_id""".stripMargin,

    // q128: Gumbel-top-k resample over the SAME weights — u from a 48-bit
    // md5 coin mapped into (0,1) exclusive, g = -ln(-ln u), top-k by
    // (importance + g). The two oracles share dsirWeightCtes verbatim.
    "q128_importance_resample" ->
      s"""WITH $dsirWeightCtes,
         |g AS (SELECT doc_id, importance,
         |    importance - ln(-ln(
         |      (CAST('0x' || substr(md5('gumbel:' || doc_id::VARCHAR), 1, 12) AS BIGINT) + 1)
         |        / 281474976710657.0)) AS score
         |  FROM dw)
         |SELECT doc_id, importance, ${pr6("score")} AS score FROM g
         |ORDER BY g.score DESC, doc_id LIMIT 100""".stripMargin,

    // q129: span-level decontamination — positional trigrams, hits where
    // the gram occurs in the benchmark slice, covered positions i..i+2
    // de-duplicated per doc. Same bench stand-in (doc_id % 20) as q50.
    "q129_contamination_spans" ->
      """WITH ct AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |pos AS (SELECT doc_id, CAST(unnest(range(len(toks) - 2)) AS BIGINT) AS i, toks
        |        FROM ct WHERE len(toks) >= 3),
        |pg AS (SELECT doc_id, i,
        |         toks[CAST(i AS INTEGER) + 1] || ' ' ||
        |         toks[CAST(i AS INTEGER) + 2] || ' ' ||
        |         toks[CAST(i AS INTEGER) + 3] AS gram
        |       FROM pos),
        |bench AS (SELECT DISTINCT gram FROM pg WHERE doc_id % 20 = 0),
        |hits AS (SELECT doc_id, i FROM pg
        |         WHERE doc_id % 20 <> 0 AND gram IN (SELECT gram FROM bench)),
        |cov0 AS (SELECT doc_id, unnest(range(i, i + 3)) AS p FROM hits),
        |cov AS (SELECT doc_id, CAST(COUNT(DISTINCT p) AS BIGINT) AS n_flagged
        |        FROM cov0 GROUP BY doc_id)
        |SELECT ct.doc_id, CAST(len(ct.toks) AS BIGINT) AS n_tokens,
        |  COALESCE(cov.n_flagged, 0) AS n_flagged,
        |  COALESCE(cov.n_flagged, 0) * 1.0 / len(ct.toks) AS flagged_ratio
        |FROM ct LEFT JOIN cov ON ct.doc_id = cov.doc_id
        |WHERE ct.doc_id % 20 <> 0 ORDER BY ct.doc_id""".stripMargin,

    // q130: exact-substring dedup audit at 5-gram resolution — a position
    // is duplicated iff its 5-gram occurs >1 time in the corpus
    // (occurrences, not docs: within-doc repeats count); spans are
    // islands of consecutive duplicated positions (i - ROW_NUMBER), and
    // coverage is the q129 distinct-window union rule.
    "q130_duplicated_spans" ->
      s"""WITH ct AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |pos AS (SELECT doc_id, CAST(unnest(range(len(toks) - 4)) AS BIGINT) AS i, toks
         |        FROM ct WHERE len(toks) >= 5),
         |pg AS (SELECT doc_id, i,
         |         toks[CAST(i AS INTEGER) + 1] || ' ' ||
         |         toks[CAST(i AS INTEGER) + 2] || ' ' ||
         |         toks[CAST(i AS INTEGER) + 3] || ' ' ||
         |         toks[CAST(i AS INTEGER) + 4] || ' ' ||
         |         toks[CAST(i AS INTEGER) + 5] AS gram
         |       FROM pos),
         |dfq AS (SELECT gram, COUNT(*) AS df FROM pg GROUP BY gram),
         |dup AS (SELECT doc_id, i FROM pg JOIN dfq USING (gram) WHERE df > 1),
         |rn_ AS (SELECT doc_id, i,
         |          i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS run
         |        FROM dup),
         |rl AS (SELECT doc_id, run, CAST(COUNT(*) AS BIGINT) AS run_len
         |       FROM rn_ GROUP BY 1, 2),
         |sp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         |         CAST(MAX(run_len) + 4 AS BIGINT) AS max_span_tokens
         |       FROM rl GROUP BY doc_id),
         |cov0 AS (SELECT doc_id, unnest(range(i, i + 5)) AS p FROM dup),
         |cov AS (SELECT doc_id, CAST(COUNT(DISTINCT p) AS BIGINT) AS covered_tokens
         |        FROM cov0 GROUP BY doc_id),
         |nd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_pos
         |       FROM dup GROUP BY doc_id)
         |SELECT ct.doc_id, CAST(len(ct.toks) AS BIGINT) AS n_tokens,
         |  COALESCE(nd.n_dup_pos, 0) AS n_dup_pos,
         |  COALESCE(sp.n_spans, 0) AS n_spans,
         |  COALESCE(sp.max_span_tokens, 0) AS max_span_tokens,
         |  COALESCE(cov.covered_tokens, 0) AS covered_tokens,
         |  COALESCE(cov.covered_tokens, 0) * 1.0 / len(ct.toks) AS dup_fraction
         |FROM ct LEFT JOIN nd USING (doc_id) LEFT JOIN sp USING (doc_id)
         |        LEFT JOIN cov USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // q131: the trained tokenizer APPLIED — TextOps.bpeSegment. The trainer
    // is unrolled as 10 literal (pair-count → argmax → greedy-merge) rounds
    // (the q41/q73 unrolling pattern): w{k} re-segments the vocabulary table
    // by round k's argmax pair, so w10 IS the segmentation the merge-list
    // fold produces — per-(source, word) stats just join against it. Greedy
    // left-to-right non-overlap is islands-and-parity: among consecutive
    // matching positions, the 1st/3rd/5th… merge (identical to the Spark
    // fold — a merged symbol can't re-match its own left side). CTEs are
    // MATERIALIZED: each round reads the previous 3×, and DuckDB's default
    // inlining would expand the corpus scan 3^10 times. Argmax ties break on
    // (count desc, l, r) in both engines; symbols are [a-z]+ so binary
    // string order agrees. Assumes ≥10 nonempty rounds (holds at every SF;
    // the Spark trainer stops early only on degenerate corpora).
    "q131_bpe_segment" -> bpeSegmentOracle,

    // q132: BM25 (Lucene-form idf) against the deterministic query term
    // set (nq highest-df non-ubiquitous tokens). Expression structure
    // mirrors the Spark side token for token; the per-doc sum runs in
    // fixed-point 1e-6 BIGINTs and ranks sort on the INTEGER s6.
    "q132_bm25" -> bm25Oracle(nq = 5, topN = 20),

    // q136: the SAME oracle as q132 — the Spark side answers from the
    // at-rest TextIndex posting layout instead of a corpus tokenize, and
    // this row hash-checks that the indexed path changes where the work
    // happens, not what is computed.
    "q136_bm25_indexed" -> bm25Oracle(nq = 5, topN = 20),

    // q137: add-1 multinomial Naive Bayes quality classifier — label =
    // source id < 5 (deterministic split both engines derive identically);
    // per-token llr over exact long counts, per-doc sums in fixed-point
    // 1e-6 BIGINTs, pred thresholds on the INTEGER s6. Expression
    // structure mirrors the Spark side token for token (q81 ln/division
    // convention).
    "q137_nb_quality" ->
      s"""WITH d AS (SELECT doc_id, CAST(substr(source, 4) AS BIGINT) < 5 AS pos, text
         |      FROM documents),
         |tok AS (SELECT doc_id, pos, unnest(string_split(text, ' ')) AS tok FROM d),
         |dt AS (SELECT doc_id, pos, tok, CAST(COUNT(*) AS BIGINT) AS c
         |       FROM tok GROUP BY 1, 2, 3),
         |cls AS (SELECT tok,
         |    CAST(SUM(CASE WHEN pos THEN c ELSE 0 END) AS BIGINT) AS c1,
         |    CAST(SUM(CASE WHEN NOT pos THEN c ELSE 0 END) AS BIGINT) AS c0
         |  FROM dt GROUP BY tok),
         |scal AS (SELECT CAST(COUNT(*) AS BIGINT) AS v,
         |    CAST(SUM(c1) AS BIGINT) AS t1, CAST(SUM(c0) AS BIGINT) AS t0 FROM cls),
         |nd AS (SELECT CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS n0 FROM d),
         |j AS (SELECT doc_id, pos,
         |    CAST(SUM(CAST(floor(c * (ln((c1 + 1) / (t1 + v)) - ln((c0 + 1) / (t0 + v)))
         |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS w6,
         |    CAST(SUM(c) AS BIGINT) AS n_tokens
         |  FROM dt JOIN cls USING (tok), scal GROUP BY doc_id, pos),
         |p AS (SELECT CAST(floor(ln(n1 / n0) * 1000000.0 + 0.5) AS BIGINT) AS prior6 FROM nd)
         |SELECT j.doc_id, CAST(j.pos AS BIGINT) AS is_curated_source, j.n_tokens,
         | w6 + prior6 AS s6,
         | (w6 + prior6) * 1.0 / 1000000.0 AS nb_score,
         | CAST(w6 + prior6 > 0 AS BIGINT) AS pred_curated
         |FROM j, p ORDER BY doc_id""".stripMargin,

    // q134: reciprocal rank fusion (Cormack et al. 2009) of the dense
    // cosine top-50 (q23's oracle at k=50) with the BM25 top-50 (q132's
    // oracle at topN=50): score = Σ 1/(60+rank), docs absent from a list
    // contribute 0 (rank 0 in the output). The per-list contribution is
    // fixed-pointed to 1e-6 BIGINTs (one IEEE double division of exact
    // longs — the q43 convention), so the fused sort key is integer.
    "q134_rrf_fusion" -> rrfFusionOracle,

    // q138/q139 (round 9): the indexed serving paths share q134's/q46's
    // oracles VERBATIM — at full probe the cell + posting layouts must
    // compute exactly what the ad-hoc corpus passes compute; the rows
    // hash-check that where the work happens never changes what is
    // computed (the q136 convention, extended to the fused paths).
    "q138_rrf_indexed" -> rrfFusionOracle,
    "q139_hybrid_indexed" -> hybridSearchOracle,
    "q140_mmr_indexed" -> mmrOracle,

    // q135: the audio arm end-to-end (wavWrap ∘ WavCodec.parse on %5 docs,
    // deterministic fallback on the rest, both over the first 128 text
    // bytes). DuckDB rebuilds every field from the hex of the same clipped
    // bytes: WAV rows reconstruct signed little-endian PCM16 samples
    // (lo + hi·256, minus 65536 when hi ≥ 128) and average |s|; fallback
    // rows average unsigned bytes. All integer sums exact; the single
    // mean division and the floor(·100+0.5)/100 rounding are the same IEEE
    // op sequence in both engines (the money rule).
    "q135_audio_features" ->
      s"""WITH d AS (SELECT doc_id, substr(hex(encode(text)), 1, 256) AS hx,
         |        least(CAST(octet_length(encode(text)) AS BIGINT), 128) AS len
         |      FROM documents),
         |wv AS (SELECT doc_id, hx, len // 2 * 2 AS dlen FROM d WHERE doc_id % 5 = 0),
         |wp AS (SELECT doc_id, hx, unnest(range(dlen // 2)) AS i FROM wv),
         |ws AS (SELECT doc_id,
         |        CAST(SUM(ABS(CAST('0x' || substr(hx, 4*i+1, 2) AS INT)
         |          + (CAST('0x' || substr(hx, 4*i+3, 2) AS INT)
         |             - CASE WHEN CAST('0x' || substr(hx, 4*i+3, 2) AS INT) >= 128
         |               THEN 256 ELSE 0 END) * 256)) AS BIGINT) AS sabs,
         |        CAST(COUNT(*) AS BIGINT) AS n
         |      FROM wp GROUP BY doc_id),
         |wavrows AS (SELECT wv.doc_id AS asset_id, 44 + dlen AS byte_len,
         |        CAST(1 AS BIGINT) AS is_wav, CAST(1 AS BIGINT) AS channels,
         |        CAST(16000 AS BIGINT) AS sample_rate_hz,
         |        CAST(16 AS BIGINT) AS bits_per_sample,
         |        dlen // 2 AS n_samples,
         |        floor((dlen // 2) * 100000.0 / 16000 + 0.5) / 100 AS duration_ms,
         |        CASE WHEN COALESCE(ws.n, 0) > 0
         |          THEN floor((ws.sabs * 1.0 / ws.n) * 100 + 0.5) / 100
         |          ELSE 0.0 END AS mean_abs_amplitude
         |      FROM wv LEFT JOIN ws ON wv.doc_id = ws.doc_id),
         |fb AS (SELECT doc_id, hx, len FROM d WHERE doc_id % 5 <> 0),
         |fp AS (SELECT doc_id, unnest(range(len)) AS i, hx FROM fb),
         |fs AS (SELECT doc_id,
         |        CAST(SUM(CAST('0x' || substr(hx, 2*i+1, 2) AS INT)) AS BIGINT) AS s,
         |        CAST(COUNT(*) AS BIGINT) AS n
         |      FROM fp GROUP BY doc_id),
         |fbrows AS (SELECT fb.doc_id AS asset_id, len AS byte_len,
         |        CAST(0 AS BIGINT) AS is_wav, CAST(1 AS BIGINT) AS channels,
         |        CAST(8000 AS BIGINT) AS sample_rate_hz,
         |        CAST(8 AS BIGINT) AS bits_per_sample,
         |        len AS n_samples,
         |        floor(len * 100000.0 / 8000 + 0.5) / 100 AS duration_ms,
         |        CASE WHEN COALESCE(fs.n, 0) > 0
         |          THEN floor((fs.s * 1.0 / fs.n) * 100 + 0.5) / 100
         |          ELSE 0.0 END AS mean_abs_amplitude
         |      FROM fb LEFT JOIN fs ON fb.doc_id = fs.doc_id)
         |SELECT * FROM wavrows UNION ALL SELECT * FROM fbrows
         |ORDER BY asset_id""".stripMargin,

    // q133: interpolated add-1 bigram LM scoring (λ=0.75 bigram +
    // 0.25 unigram floor); every ratio long-derived, per-doc sum in
    // fixed-point 1e-6 BIGINTs, expression structure mirrors Spark.
    "q133_bigram_logprob" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |u AS (SELECT doc_id, unnest(toks) AS w FROM t),
         |cu AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cu FROM u GROUP BY w),
         |sca AS (SELECT CAST(SUM(cu) AS BIGINT) AS n_corpus,
         |          CAST(COUNT(*) AS BIGINT) AS v_sz FROM cu),
         |bg AS (SELECT doc_id, unnest(${gramsN(2)}) AS gram FROM t),
         |cbg AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS cbg FROM bg GROUP BY gram),
         |sc AS (SELECT bg.doc_id,
         |         CAST(floor(ln(
         |           0.75 * ((cbg.cbg + 1) * 1.0 / (c1.cu + sca.v_sz)) +
         |           0.25 * ((c2.cu + 1) * 1.0 / (sca.n_corpus + sca.v_sz))
         |         ) * 1000000.0 + 0.5) AS BIGINT) AS s6
         |       FROM bg
         |       JOIN cbg USING (gram)
         |       JOIN cu c1 ON c1.w = string_split(gram, ' ')[1]
         |       JOIN cu c2 ON c2.w = string_split(gram, ' ')[2], sca),
         |pd AS (SELECT doc_id, CAST(SUM(s6) AS BIGINT) AS s6,
         |         CAST(COUNT(*) AS BIGINT) AS n_bigrams FROM sc GROUP BY doc_id)
         |SELECT t.doc_id, COALESCE(pd.n_bigrams, 0) AS n_bigrams,
         |  CASE WHEN pd.n_bigrams IS NOT NULL
         |       THEN ${pr6("pd.s6 / (pd.n_bigrams * 1000000.0)")}
         |       ELSE 0.0 END AS avg_logprob
         |FROM t LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin,

    // q141: ExactSubstr-style span rewrite — q130's positional-gram CTEs,
    // then: canonical = globally-first (doc_id, i) occurrence per gram
    // (row_number in SQL; min-struct aggregate in Spark — same total
    // order), a position is cut iff covered and never by a canonical
    // occurrence, and the kept tokens re-join into the rewritten text
    // whose md5 is the contract (byte-identical rebuild in both engines).
    "q141_span_rewrite" -> spanRewriteOracle(""),
    // q154: the incremental form is EXACT — merged ledger canonicality
    // equals global canonicality — so the oracle is q141's chain with the
    // output restricted to the batch (odd doc_id) docs.
    "q154_incr_rewrite" -> spanRewriteOracle("WHERE ct.doc_id % 2 = 1"),
    // q159: the maintained-artifact form serves the SAME answer as q154
    // (merged at-rest canonicality ≡ global canonicality — the append ≡
    // rebuild spec), so it shares q154's oracle verbatim.
    "q159_ledger_rewrite" -> spanRewriteOracle("WHERE ct.doc_id % 2 = 1"),
    // q163: the fixed-batch serving form — same exactness argument as
    // q159, oracle = q141 restricted to the constant-size batch.
    "q163_ledger_rewrite_fixed" -> spanRewriteOracle("WHERE ct.doc_id < 64"),
    // q160: the maintained cluster labels equal the full q49 recompute
    // over the union corpus (contracted-graph CC is exact — band
    // matching is pairwise-static, old labels are their clusters' min
    // ids), so the row shares q49's oracle verbatim.
    "q160_cluster_maintained" ->
      s"""WITH RECURSIVE $minhashCtes,
        |$ccClusterCtes
        |SELECT doc_id, cluster_rep,
        | CAST(doc_id = cluster_rep AS BIGINT) AS keep
        |FROM lab ORDER BY doc_id""".stripMargin,
    // q161: the gated probe — terms are the 2 hottest (rk 1–2 by df
    // desc, tok) + the RAREST (df asc, tok); the essential semi-join
    // changes nothing the oracle can see (a tuple needs every term in
    // the doc), so the SQL is q153's intersection over this term set.
    "q161_prox_gated" ->
      """WITH ct AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok AS (SELECT doc_id, CAST(unnest(range(len(toks))) AS BIGINT) AS i,
        |          unnest(toks) AS tok FROM ct),
        |df AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |       FROM tok GROUP BY tok),
        |top2 AS (SELECT tok, ROW_NUMBER() OVER (ORDER BY df DESC, tok) AS rk
        |         FROM df QUALIFY rk <= 2),
        |bot1 AS (SELECT tok, ROW_NUMBER() OVER (ORDER BY df ASC, tok) AS rk
        |         FROM df QUALIFY rk <= 1),
        |pa AS (SELECT t.doc_id, t.i FROM tok t
        |       JOIN top2 ON t.tok = top2.tok AND top2.rk = 1),
        |pb AS (SELECT t.doc_id, t.i FROM tok t
        |       JOIN top2 ON t.tok = top2.tok AND top2.rk = 2),
        |pc AS (SELECT t.doc_id, t.i FROM tok t
        |       JOIN bot1 ON t.tok = bot1.tok AND bot1.rk = 1)
        |SELECT pa.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tuples,
        |  CAST(MIN(GREATEST(pa.i, pb.i, pc.i) - LEAST(pa.i, pb.i, pc.i))
        |    AS BIGINT) AS min_span
        |FROM pa
        |JOIN pb ON pa.doc_id = pb.doc_id
        |JOIN pc ON pa.doc_id = pc.doc_id
        |WHERE GREATEST(pa.i, pb.i, pc.i) - LEAST(pa.i, pb.i, pc.i) <= 3
        |GROUP BY pa.doc_id
        |ORDER BY pa.doc_id""".stripMargin,
  ) ++ oracleSqlTail

  /** q141/q154's shared oracle chain — q130's positional-gram CTEs, then:
    * canonical = globally-first (doc_id, i) occurrence per gram, a
    * position is cut iff covered and never by a canonical occurrence, and
    * the kept tokens re-join into the rewritten text whose md5 is the
    * contract (byte-identical rebuild in both engines). `finalWhere`
    * restricts the OUTPUT docs only — canonicality stays global, which is
    * exactly the incremental ledger's semantics. */
  private def spanRewriteOracle(finalWhere: String): String =
      s"""WITH ct AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |pos AS (SELECT doc_id, CAST(unnest(range(len(toks) - 4)) AS BIGINT) AS i, toks
         |        FROM ct WHERE len(toks) >= 5),
         |pg AS (SELECT doc_id, i,
         |         toks[CAST(i AS INTEGER) + 1] || ' ' ||
         |         toks[CAST(i AS INTEGER) + 2] || ' ' ||
         |         toks[CAST(i AS INTEGER) + 3] || ' ' ||
         |         toks[CAST(i AS INTEGER) + 4] || ' ' ||
         |         toks[CAST(i AS INTEGER) + 5] AS gram
         |       FROM pos),
         |occ AS (SELECT doc_id, i,
         |          ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, i) = 1
         |            AS canonical
         |        FROM pg),
         |cov AS (SELECT doc_id, CAST(unnest(range(i, i + 5)) AS BIGINT) AS p,
         |          canonical
         |        FROM occ),
         |rem AS (SELECT doc_id, p FROM cov GROUP BY doc_id, p
         |        HAVING NOT bool_or(canonical)),
         |tp AS (SELECT doc_id, CAST(unnest(range(len(toks))) AS BIGINT) AS p, toks
         |       FROM ct),
         |tk AS (SELECT doc_id, p, toks[CAST(p AS INTEGER) + 1] AS tok FROM tp),
         |kept AS (SELECT tk.doc_id, tk.p, tk.tok
         |         FROM tk LEFT JOIN rem ON tk.doc_id = rem.doc_id AND tk.p = rem.p
         |         WHERE rem.p IS NULL),
         |rb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |         string_agg(tok, ' ' ORDER BY p) AS new_text
         |       FROM kept GROUP BY doc_id)
         |SELECT ct.doc_id, CAST(len(ct.toks) AS BIGINT) AS n_tokens,
         |  CAST(len(ct.toks) - COALESCE(rb.n_kept, 0) AS BIGINT) AS n_removed,
         |  md5(COALESCE(rb.new_text, '')) AS rewritten_fp
         |FROM ct LEFT JOIN rb USING (doc_id)
         |$finalWhere
         |ORDER BY ct.doc_id""".stripMargin

  private lazy val oracleSqlTail: Map[String, String] = Map(
    // q142: the exact arm is the oracle; est_ok is the sketch-vs-truth
    // audit the Spark side must pass (literal 1 here — the row fails if
    // Spark's HLL estimate ever drifts past the 5% bound).
    "q142_hll_reach" -> hllReachOracle,
    // q149/q150/q151: table-served estimate arms share the ad-hoc twins'
    // oracles verbatim — day-grain sketch union is a semilattice, so
    // serving from parquet changes where the work happens, not what is
    // computed (the q136/q138 convention, applied to sketches).
    "q149_reach_served" -> hllReachOracle,
    "q150_overlap_served" -> thetaOverlapOracle,
    "q151_retention_served" -> thetaRetentionOracle,

    // q148: proximity pairs of the two highest-df terms ((df desc, tok) —
    // the same derivation the index's udf table serves); the Spark side
    // answers from banded position-list joins, which must enumerate
    // exactly these within-slop pairs.
    "q148_proximity" -> proximityOracle,

    // q153: m-term proximity — every (one-occurrence-per-term) triple of
    // the three highest-df terms with span ≤ 3; the Spark side's
    // anchor-banded intersection must enumerate exactly these triples.
    "q153_prox_multi" ->
      """WITH ct AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok AS (SELECT doc_id, CAST(unnest(range(len(toks))) AS BIGINT) AS i,
        |          unnest(toks) AS tok FROM ct),
        |df AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |       FROM tok GROUP BY tok),
        |top3 AS (SELECT tok, ROW_NUMBER() OVER (ORDER BY df DESC, tok) AS rk
        |         FROM df QUALIFY rk <= 3),
        |pa AS (SELECT t.doc_id, t.i FROM tok t
        |       JOIN top3 ON t.tok = top3.tok AND top3.rk = 1),
        |pb AS (SELECT t.doc_id, t.i FROM tok t
        |       JOIN top3 ON t.tok = top3.tok AND top3.rk = 2),
        |pc AS (SELECT t.doc_id, t.i FROM tok t
        |       JOIN top3 ON t.tok = top3.tok AND top3.rk = 3)
        |SELECT pa.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tuples,
        |  CAST(MIN(GREATEST(pa.i, pb.i, pc.i) - LEAST(pa.i, pb.i, pc.i))
        |    AS BIGINT) AS min_span
        |FROM pa
        |JOIN pb ON pa.doc_id = pb.doc_id
        |JOIN pc ON pa.doc_id = pc.doc_id
        |WHERE GREATEST(pa.i, pb.i, pc.i) - LEAST(pa.i, pb.i, pc.i) <= 3
        |GROUP BY pa.doc_id
        |ORDER BY pa.doc_id""".stripMargin,

    // q152: proximity-boosted retrieval — RRF fusion (q134's fixed-point
    // conventions) of the BM25 top-50 with the proximity top-50 ranked
    // (min_dist asc, n_pairs desc, doc_id). Both arms reuse their own
    // oracles as subqueries.
    "q152_prox_ranked" ->
      s"""WITH px AS (SELECT doc_id,
         |        CAST(ROW_NUMBER() OVER (ORDER BY min_dist ASC, n_pairs DESC,
         |               doc_id) AS BIGINT) AS prox_rnk
         |      FROM ($proximityOracle) p QUALIFY prox_rnk <= 50),
         |lx AS (SELECT doc_id, rnk AS lex_rnk FROM (${bm25Oracle(5, 50)}) t),
         |f AS (SELECT COALESCE(px.doc_id, lx.doc_id) AS doc_id,
         |        CAST(COALESCE(px.prox_rnk, 0) AS BIGINT) AS prox_rnk,
         |        CAST(COALESCE(lx.lex_rnk, 0) AS BIGINT) AS lex_rnk
         |      FROM px FULL OUTER JOIN lx ON px.doc_id = lx.doc_id),
         |s AS (SELECT doc_id, prox_rnk, lex_rnk,
         |        (CASE WHEN prox_rnk > 0
         |              THEN CAST(floor(1000000.0 / (60 + prox_rnk) + 0.5) AS BIGINT)
         |              ELSE 0 END +
         |         CASE WHEN lex_rnk > 0
         |              THEN CAST(floor(1000000.0 / (60 + lex_rnk) + 0.5) AS BIGINT)
         |              ELSE 0 END) AS s6
         |      FROM f),
         |top AS (SELECT * FROM s ORDER BY s6 DESC, doc_id LIMIT 20)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY s6 DESC, doc_id) AS BIGINT) AS rnk,
         |  doc_id, prox_rnk, lex_rnk, s6 * 1.0 / 1000000.0 AS rrf_score
         |FROM top ORDER BY rnk""".stripMargin,

    // q143: per-source quality cap — q68's fixed-point score CTEs, then
    // row_number over (score desc, doc_id) capped at 20.
    "q143_domain_cap" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
        |u AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS nt,
        |        CAST(len(list_filter(toks, x -> x = 'a')) AS BIGINT) AS sh FROM t),
        |s AS (SELECT doc_id, source,
        |        CAST(floor(LEAST(1.0, GREATEST(0.0,
        |          0.25 * log10(nt + 1) + 0.5 - 0.8 * (sh * 1.0 / nt))) * 10000.0 + 0.5)
        |          AS BIGINT) AS score_i
        |      FROM u),
        |r AS (SELECT source, doc_id, score_i,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY source
        |               ORDER BY score_i DESC, doc_id) AS BIGINT) AS rk
        |      FROM s)
        |SELECT source, rk, doc_id, score_i FROM r WHERE rk <= 20
        |ORDER BY source, rk""".stripMargin,

    // q144: pairwise audience overlap — the exact arm is the oracle
    // (distinct (user,type) self-join on ordered type pairs); est_ok is
    // the theta-intersection-vs-truth audit (literal 1 — the row fails if
    // the sketch estimate drifts past 5%·min+1).
    "q144_theta_overlap" -> thetaOverlapOracle,

    // q145: banding recall vs exact-Jaccard truth — q30's banded-candidate
    // CTE chain beside q31's exact pairwise form (list_distinct over the
    // same trigram grams), hits = truth ∩ candidates.
    "q145_dedup_recall" ->
      s"""WITH $minhashCtes,
         |gb AS (SELECT u.doc_id, d.lang, d.source, list_distinct(u.grams) AS dgrams
         |       FROM u JOIN documents d USING (doc_id)),
         |truth AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |          FROM gb a JOIN gb b
         |            ON a.lang = b.lang AND a.source = b.source
         |            AND a.doc_id < b.doc_id
         |          WHERE len(list_distinct(list_concat(a.dgrams, b.dgrams))) > 0
         |            AND len(list_intersect(a.dgrams, b.dgrams)) * 1.0 /
         |                len(list_distinct(list_concat(a.dgrams, b.dgrams))) >= 0.5),
         |hit AS (SELECT t0.doc_a FROM truth t0
         |        JOIN cand c ON t0.doc_a = c.doc_a AND t0.doc_b = c.doc_b)
         |SELECT 0.5 AS tau,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_hit,
         |  CASE WHEN (SELECT COUNT(*) FROM truth) > 0
         |       THEN (SELECT COUNT(*) FROM hit) * 1.0 /
         |            (SELECT COUNT(*) FROM truth)
         |       ELSE 1.0 END AS recall""".stripMargin,

    // q146: retention/churn/new from exact cohort set arithmetic; the _ok
    // flags audit the theta intersection and A\B estimates in-plan.
    "q146_theta_retention" -> thetaRetentionOracle,

    // q147: positional trigram occurrences of the corpus's rank-1 trigram
    // ((count desc, gram) — the same derivation the index persists); the
    // Spark side answers from the unigram positional index's m-way
    // position-chain join (round 11 — the bigram artifact is retired),
    // which must enumerate exactly these occurrences.
    "q147_phrase_search" ->
      s"""WITH ct AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |pos3 AS (SELECT doc_id, CAST(unnest(range(len(toks) - 2)) AS BIGINT) AS i, toks
         |         FROM ct WHERE len(toks) >= 3),
         |pg AS (SELECT doc_id, i,
         |         toks[CAST(i AS INTEGER) + 1] || ' ' ||
         |         toks[CAST(i AS INTEGER) + 2] || ' ' ||
         |         toks[CAST(i AS INTEGER) + 3] AS gram
         |       FROM pos3),
         |top AS (SELECT gram FROM (SELECT gram, COUNT(*) AS n FROM pg GROUP BY gram)
         |        ORDER BY n DESC, gram LIMIT 1)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ,
         |  CAST(MIN(i) AS BIGINT) AS first_pos
         |FROM pg JOIN top USING (gram)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    // q155: boolean AND/NOT retrieval — docs containing BOTH of the two
    // highest-df terms and NOT the rarest term ((df desc, tok) /
    // (df asc, tok) — the same derivations the index's df table serves),
    // with doc length and the must-terms' (min, max) tf. The Spark side
    // answers from one counting aggregation over pruned posting lists,
    // which must qualify exactly these docs.
    "q155_bool_search" ->
      """WITH ct AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM ct),
        |dt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |dls AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM dt GROUP BY 1),
        |df AS (SELECT tok, COUNT(*) AS df FROM dt GROUP BY 1),
        |must AS (SELECT tok, ROW_NUMBER() OVER (ORDER BY df DESC, tok) AS rk
        |         FROM df QUALIFY rk <= 2),
        |mnot AS (SELECT tok, ROW_NUMBER() OVER (ORDER BY df ASC, tok) AS rk
        |         FROM df QUALIFY rk <= 1),
        |m AS (SELECT dt.doc_id, COUNT(*) AS nhit,
        |        CAST(MIN(dt.tf) AS BIGINT) AS min_tf,
        |        CAST(MAX(dt.tf) AS BIGINT) AS max_tf
        |      FROM dt JOIN must ON dt.tok = must.tok GROUP BY 1),
        |x AS (SELECT DISTINCT dt.doc_id FROM dt JOIN mnot ON dt.tok = mnot.tok)
        |SELECT m.doc_id, dls.dl, m.min_tf, m.max_tf
        |FROM m JOIN dls USING (doc_id)
        |WHERE m.nhit = 2 AND m.doc_id NOT IN (SELECT doc_id FROM x)
        |ORDER BY m.doc_id""".stripMargin,

    // q157: the OR end of the minimum-should-match dial — q155's CTEs
    // with nhit >= 1 (any of the two highest-df terms) minus the rarest
    // term; min/max tf cover the terms PRESENT in each doc.
    "q157_bool_any" ->
      """WITH ct AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM ct),
        |dt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |dls AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM dt GROUP BY 1),
        |df AS (SELECT tok, COUNT(*) AS df FROM dt GROUP BY 1),
        |must AS (SELECT tok, ROW_NUMBER() OVER (ORDER BY df DESC, tok) AS rk
        |         FROM df QUALIFY rk <= 2),
        |mnot AS (SELECT tok, ROW_NUMBER() OVER (ORDER BY df ASC, tok) AS rk
        |         FROM df QUALIFY rk <= 1),
        |m AS (SELECT dt.doc_id, COUNT(*) AS nhit,
        |        CAST(MIN(dt.tf) AS BIGINT) AS min_tf,
        |        CAST(MAX(dt.tf) AS BIGINT) AS max_tf
        |      FROM dt JOIN must ON dt.tok = must.tok GROUP BY 1),
        |x AS (SELECT DISTINCT dt.doc_id FROM dt JOIN mnot ON dt.tok = mnot.tok)
        |SELECT m.doc_id, dls.dl, m.min_tf, m.max_tf
        |FROM m JOIN dls USING (doc_id)
        |WHERE m.nhit >= 1 AND m.doc_id NOT IN (SELECT doc_id FROM x)
        |ORDER BY m.doc_id""".stripMargin,

    // q156: the serving page end-to-end — q147's phrase occurrences,
    // paged to the top 20 by (n_occ desc, doc_id), each hit's snippet =
    // the ±2-token window around its first occurrence (clamped at doc
    // edges). The Spark side pages from the positional index and fetches
    // content from the bucketed doc store, which must reproduce exactly
    // these snippets.
    "q156_snippet" ->
      s"""WITH ct AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |pos3 AS (SELECT doc_id, CAST(unnest(range(len(toks) - 2)) AS BIGINT) AS i, toks
         |         FROM ct WHERE len(toks) >= 3),
         |pg AS (SELECT doc_id, i,
         |         toks[CAST(i AS INTEGER) + 1] || ' ' ||
         |         toks[CAST(i AS INTEGER) + 2] || ' ' ||
         |         toks[CAST(i AS INTEGER) + 3] AS gram
         |       FROM pos3),
         |top AS (SELECT gram FROM (SELECT gram, COUNT(*) AS n FROM pg GROUP BY gram)
         |        ORDER BY n DESC, gram LIMIT 1),
         |occ AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ,
         |          CAST(MIN(i) AS BIGINT) AS first_pos
         |        FROM pg JOIN top USING (gram) GROUP BY doc_id),
         |page AS (SELECT doc_id, n_occ, first_pos,
         |           CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, doc_id)
         |             AS BIGINT) AS rnk
         |         FROM occ QUALIFY rnk <= 20)
         |SELECT p.rnk, p.doc_id, p.n_occ, p.first_pos,
         |  array_to_string(ct.toks[GREATEST(CAST(p.first_pos AS INTEGER) - 1, 1) :
         |                          CAST(p.first_pos AS INTEGER) + 5], ' ') AS snippet
         |FROM page p JOIN ct ON p.doc_id = ct.doc_id
         |ORDER BY p.rnk""".stripMargin,

    // q162: q156's page chain with the media arm — the store's payload
    // is the text's UTF-8 bytes (the multimodal stand-in convention), so
    // byte_len is octet_length(text) and the first-frame fingerprint is
    // md5 of the first 16 bytes (the fixture is ASCII-safe, the q56
    // convention).
    "q162_media_page" -> mediaPageOracle,
    // q164 shares q162's oracle VERBATIM (the q159/q154, q160/q49
    // convention): what changes is the store's history — built by
    // base → tagged append → compact instead of one shot — and the
    // contract is that no served byte may depend on that history.
    "q164_media_compacted" -> mediaPageOracle,
    // q165 shares q148's oracle verbatim — same convention for the
    // positional index class (history: append then compactPhraseVersion).
    "q165_prox_compacted" -> proximityOracle,
    // q166 shares q105's oracle verbatim (the q160/q49 convention): the
    // served histogram comes from the maintained cluster index's labels,
    // which equal the full recompute by the contracted-CC argument.
    "q166_dedup_summary_served" -> dedupSummaryOracle,

    // q167 (round 15): the pair-mass advisor — per band, Σ C(n,2) over
    // the (band_id, band_val) buckets predicts the banded self-join's
    // comparison mass BEFORE it is paid (the build-cost advisor; exact
    // combinatorics over the q29/q30 deterministic banding, so the
    // oracle replays it verbatim). `//` keeps the sum integer-exact.
    "q167_pair_mass" ->
      s"""WITH $minhashCtes,
        |bsz AS (SELECT band_id, band_val, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM bands WHERE band_val IS NOT NULL GROUP BY 1, 2)
        |SELECT CAST(band_id AS BIGINT) AS band_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |  CAST(SUM(n) AS BIGINT) AS n_banded_docs,
        |  CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS predicted_pairs,
        |  CAST(MAX(n) AS BIGINT) AS max_bucket
        |FROM bsz GROUP BY band_id ORDER BY band_id""".stripMargin,

    // q168 — the routed-build decision: raw (one-shot) pair mass, the
    // exact-class rep-collapsed (sharded) pair mass + max bucket, and
    // the pure routing rule's arithmetic replayed in SQL (thresholds are
    // ClusterIndex.OneShotMaxPairs/PerShardTargetPairs/MaxRouteShards —
    // 32M / 32M / 64, the SCALING-measured operating points)
    "q168_route_advice" ->
      s"""WITH $minhashCtes,
        |bsz AS (SELECT band_id, band_val, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM bands WHERE band_val IS NOT NULL GROUP BY 1, 2),
        |rawm AS (SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT)
        |           AS raw_pairs FROM bsz),
        |rep AS (SELECT MIN(doc_id) AS doc_id, sig FROM sig
        |        WHERE sig[1] IS NOT NULL GROUP BY sig),
        |rbands AS (SELECT doc_id, b AS band_id,
        |             sig[2*b+1] || '|' || sig[2*b+2] AS band_val
        |           FROM rep CROSS JOIN (VALUES (0), (1), (2), (3)) AS t2(b)),
        |rbsz AS (SELECT band_id, band_val, CAST(COUNT(*) AS BIGINT) AS n
        |         FROM rbands GROUP BY 1, 2),
        |repm AS (SELECT
        |  CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT) AS rep_pairs,
        |  CAST(COALESCE(MAX(n), 0) AS BIGINT) AS rep_max_bucket FROM rbsz)
        |SELECT raw_pairs, rep_pairs, rep_max_bucket,
        |  CASE WHEN raw_pairs <= 32000000 THEN 'one_shot'
        |       WHEN rep_max_bucket * (rep_max_bucket - 1) // 2 > 32000000
        |         THEN 'refuse'
        |       WHEN (rep_pairs + 31999999) // 32000000 > 64 THEN 'refuse'
        |       ELSE 'sharded' END AS route,
        |  CASE WHEN raw_pairs <= 32000000 THEN CAST(1 AS BIGINT)
        |       WHEN rep_max_bucket * (rep_max_bucket - 1) // 2 > 32000000
        |         THEN CAST(0 AS BIGINT)
        |       WHEN (rep_pairs + 31999999) // 32000000 > 64
        |         THEN CAST(0 AS BIGINT)
        |       ELSE GREATEST(CAST(2 AS BIGINT),
        |         (rep_pairs + 31999999) // 32000000) END AS shards
        |FROM rawm, repm""".stripMargin,
  )

  /** q105's oracle — cluster-size histogram over the q49 CC labels.
    * Shared verbatim by q166, whose labels are served from the
    * maintained cluster index (base + contracted-graph fold). */
  private lazy val dedupSummaryOracle: String =
      s"""WITH RECURSIVE $minhashCtes,
        |$ccClusterCtes,
        |sz AS (SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS cluster_size
        |       FROM lab GROUP BY cluster_rep)
        |SELECT cluster_size, COUNT(*) AS n_clusters,
        | CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
        | CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS n_dropped
        |FROM sz GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  /** q162's oracle — the media page (top-phrase candidates, snippet,
    * payload byte length + first-frame md5). Shared verbatim by q164,
    * whose store was maintained (append) and compacted before serving. */
  private lazy val mediaPageOracle: String =
      s"""WITH ct AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |pos3 AS (SELECT doc_id, CAST(unnest(range(len(toks) - 2)) AS BIGINT) AS i, toks
         |         FROM ct WHERE len(toks) >= 3),
         |pg AS (SELECT doc_id, i,
         |         toks[CAST(i AS INTEGER) + 1] || ' ' ||
         |         toks[CAST(i AS INTEGER) + 2] || ' ' ||
         |         toks[CAST(i AS INTEGER) + 3] AS gram
         |       FROM pos3),
         |top AS (SELECT gram FROM (SELECT gram, COUNT(*) AS n FROM pg GROUP BY gram)
         |        ORDER BY n DESC, gram LIMIT 1),
         |occ AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ,
         |          CAST(MIN(i) AS BIGINT) AS first_pos
         |        FROM pg JOIN top USING (gram) GROUP BY doc_id),
         |page AS (SELECT doc_id, n_occ, first_pos,
         |           CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, doc_id)
         |             AS BIGINT) AS rnk
         |         FROM occ QUALIFY rnk <= 20)
         |SELECT p.rnk, p.doc_id, p.n_occ,
         |  array_to_string(ct.toks[GREATEST(CAST(p.first_pos AS INTEGER) - 1, 1) :
         |                          CAST(p.first_pos AS INTEGER) + 5], ' ') AS snippet,
         |  CAST(octet_length(CAST(d.text AS BLOB)) AS BIGINT) AS byte_len,
         |  md5(substring(d.text, 1, 16)) AS frame0_md5
         |FROM page p JOIN ct ON p.doc_id = ct.doc_id
         |             JOIN documents d ON p.doc_id = d.doc_id
         |ORDER BY p.rnk""".stripMargin

  /** q104's oracle — exact top-k with the CMS guarantees as flags.
    * Shared verbatim by q158 (estimates served from the at-rest CMS
    * table; CMS linearity makes the merged-table estimate bit-identical
    * to the one-pass sketch, so the same flags must hold). */
  private lazy val heavyHittersOracle: String =
    """WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
      |r AS (SELECT user_id, n, row_number() OVER (ORDER BY n DESC, user_id) AS rk FROM c)
      |SELECT user_id, n, CAST(1 AS BIGINT) AS cms_ge_exact,
      | CAST(1 AS BIGINT) AS cms_within_tol
      |FROM r WHERE rk <= 20 ORDER BY n DESC, user_id""".stripMargin

  /** q148's oracle — per-doc within-slop (slop 3) position pairs of the
    * two highest-df terms, (df desc, tok)-derived exactly as the index's
    * udf table derives them. Embedded as a subquery by q152's fusion. */
  private lazy val proximityOracle: String =
    """WITH ct AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |tok AS (SELECT doc_id, CAST(unnest(range(len(toks))) AS BIGINT) AS i,
      |          unnest(toks) AS tok FROM ct),
      |df AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      |       FROM tok GROUP BY tok),
      |top2 AS (SELECT tok, ROW_NUMBER() OVER (ORDER BY df DESC, tok) AS rk
      |         FROM df QUALIFY rk <= 2),
      |pa AS (SELECT t.doc_id, t.i FROM tok t
      |       JOIN top2 ON t.tok = top2.tok AND top2.rk = 1),
      |pb AS (SELECT t.doc_id, t.i FROM tok t
      |       JOIN top2 ON t.tok = top2.tok AND top2.rk = 2)
      |SELECT pa.doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(MIN(ABS(pa.i - pb.i)) AS BIGINT) AS min_dist
      |FROM pa JOIN pb ON pa.doc_id = pb.doc_id AND ABS(pa.i - pb.i) <= 3
      |GROUP BY pa.doc_id
      |ORDER BY pa.doc_id""".stripMargin

  /** q142's oracle — the exact reach arms; est_ok is the in-plan
    * sketch-vs-truth audit (literal 1). Shared verbatim by q149, whose
    * estimate arm serves from the at-rest sketch table: day-grain HLL
    * union is a semilattice, so the served estimates equal the direct
    * ones and the same audit bound must hold. */
  private lazy val hllReachOracle: String =
    """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_exact,
      |  CAST(1 AS BIGINT) AS est_ok
      |FROM events GROUP BY event_type
      |UNION ALL
      |SELECT '_all' AS event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT),
      |  CAST(1 AS BIGINT)
      |FROM events
      |ORDER BY event_type""".stripMargin

  /** q144's oracle — exact pairwise overlap arms + the theta audit flag.
    * Shared verbatim by q150 (estimates served from the cohort sketch
    * table; min-k retention is a semilattice, same audit bound). */
  private lazy val thetaOverlapOracle: String =
    """WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
      |cnt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS users
      |        FROM ut GROUP BY event_type),
      |ov AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
      |         CAST(COUNT(*) AS BIGINT) AS overlap_exact
      |       FROM ut x JOIN ut y
      |         ON x.user_id = y.user_id AND x.event_type < y.event_type
      |       GROUP BY 1, 2)
      |SELECT ca.event_type AS type_a, cb.event_type AS type_b,
      |  ca.users AS users_a, cb.users AS users_b,
      |  COALESCE(ov.overlap_exact, 0) AS overlap_exact,
      |  CAST(1 AS BIGINT) AS est_ok
      |FROM cnt ca JOIN cnt cb ON ca.event_type < cb.event_type
      |LEFT JOIN ov ON ov.type_a = ca.event_type AND ov.type_b = cb.event_type
      |ORDER BY type_a, type_b""".stripMargin

  /** q146's oracle — exact cohort set arithmetic + the three theta audit
    * flags. Shared verbatim by q151 (estimates served from the cohort
    * sketch table's period rows). */
  private lazy val thetaRetentionOracle: String =
    """WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_id % 2 = 0),
      |b AS (SELECT DISTINCT user_id FROM events WHERE event_id % 2 <> 0),
      |r AS (SELECT CAST(COUNT(*) AS BIGINT) AS retained_exact
      |      FROM a JOIN b USING (user_id))
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS users_base,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS users_cur,
      |  r.retained_exact,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM a) - r.retained_exact AS churned_exact,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM b) - r.retained_exact AS new_exact,
      |  CAST(1 AS BIGINT) AS retained_ok,
      |  CAST(1 AS BIGINT) AS churned_ok,
      |  CAST(1 AS BIGINT) AS new_ok
      |FROM r""".stripMargin

  /** q46's oracle: metadata-filter (lang='en') then exact-cosine top-10.
    * Shared verbatim by q139 — the indexed filter-then-ANN at full probe
    * must return exactly this. */
  private lazy val hybridSearchOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(${dotD("v", "v")}) AS norm FROM e),
       |d AS (SELECT doc_id, lang FROM documents WHERE lang = 'en'),
       |p AS (SELECT v AS pv, norm AS pnorm FROM n WHERE vec_id = 0),
       |s AS (SELECT n.vec_id, d.lang, ${pr4(s"${dotD("v", "pv")} / (norm * pnorm)")} AS cos_sim
       |      FROM n JOIN d ON n.vec_id = d.doc_id, p),
       |r AS (SELECT CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rnk,
       |        vec_id, lang, cos_sim FROM s)
       |SELECT rnk, vec_id, lang, cos_sim FROM r WHERE rnk <= 10 ORDER BY rnk""".stripMargin

  /** q134's oracle: reciprocal rank fusion (Cormack et al. 2009) of the
    * dense cosine top-50 (q23's oracle at k=50) with the BM25 top-50
    * (q132's oracle at topN=50): score = Σ 1/(60+rank), docs absent from a
    * list contribute 0 (rank 0 in the output). The per-list contribution
    * is fixed-pointed to 1e-6 BIGINTs (one IEEE double division of exact
    * longs — the q43 convention), so the fused sort key is integer.
    * Shared verbatim by q138 — the fully-indexed RRF at full probe must
    * return exactly this. */
  private lazy val rrfFusionOracle: String =
    s"""WITH dn AS (SELECT vec_id AS doc_id, rnk AS dense_rnk
       |        FROM (${cosineTopNOracle(50)}) t),
       |lx AS (SELECT doc_id, rnk AS lex_rnk FROM (${bm25Oracle(5, 50)}) t),
       |f AS (SELECT COALESCE(dn.doc_id, lx.doc_id) AS doc_id,
       |        CAST(COALESCE(dn.dense_rnk, 0) AS BIGINT) AS dense_rnk,
       |        CAST(COALESCE(lx.lex_rnk, 0) AS BIGINT) AS lex_rnk
       |      FROM dn FULL OUTER JOIN lx ON dn.doc_id = lx.doc_id),
       |s AS (SELECT doc_id, dense_rnk, lex_rnk,
       |        (CASE WHEN dense_rnk > 0
       |              THEN CAST(floor(1000000.0 / (60 + dense_rnk) + 0.5) AS BIGINT)
       |              ELSE 0 END +
       |         CASE WHEN lex_rnk > 0
       |              THEN CAST(floor(1000000.0 / (60 + lex_rnk) + 0.5) AS BIGINT)
       |              ELSE 0 END) AS s6
       |      FROM f),
       |top AS (SELECT * FROM s ORDER BY s6 DESC, doc_id LIMIT 20)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY s6 DESC, doc_id) AS BIGINT) AS rnk,
       |  doc_id, dense_rnk, lex_rnk, s6 * 1.0 / 1000000.0 AS rrf_score
       |FROM top ORDER BY rnk""".stripMargin

  /** q132's oracle, parameterized: the BM25 (Lucene-form idf) scorer against
    * the deterministic query term set (nq highest-df non-ubiquitous tokens).
    * Expression structure mirrors the Spark side token for token; per-doc
    * sums run in fixed-point 1e-6 BIGINTs and ranks sort on the INTEGER s6.
    * Reused at topN=50 as the lexical arm of q134's RRF fusion. */
  private def bm25Oracle(nq: Int, topN: Int): String =
    s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |dt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM dt GROUP BY doc_id),
       |dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY tok),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(dl) AS BIGINT) AS n_toks FROM dl),
       |qt AS (SELECT tok, df FROM dfq, st WHERE df * 2 < n_docs
       |       ORDER BY df DESC, tok LIMIT $nq),
       |sc AS (SELECT dt.doc_id,
       |         CAST(floor(
       |           ln((st.n_docs - qt.df + 0.5) / (qt.df + 0.5) + 1.0)
       |           * (dt.tf * (1.2 + 1) / (dt.tf + 1.2 *
       |               (1.0 - 0.75 + 0.75 * dl.dl / (st.n_toks / st.n_docs))))
       |           * 1000000.0 + 0.5) AS BIGINT) AS s6
       |       FROM dt JOIN qt USING (tok) JOIN dl USING (doc_id), st),
       |ag AS (SELECT doc_id, CAST(SUM(s6) AS BIGINT) AS s6,
       |         CAST(COUNT(*) AS BIGINT) AS n_hit FROM sc GROUP BY doc_id),
       |top AS (SELECT doc_id, s6, n_hit FROM ag ORDER BY s6 DESC, doc_id LIMIT $topN)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY s6 DESC, doc_id) AS BIGINT) AS rnk,
       |  doc_id, n_hit, s6 * 1.0 / 1000000.0 AS score
       |FROM top ORDER BY rnk""".stripMargin

  private lazy val bpeSegmentOracle: String = {
    val rounds = (1 to 10).map { k =>
      val p = k - 1
      s"""m$k AS MATERIALIZED (SELECT word, wcnt, syms, unnest(range(1, len(syms)+1)) AS i FROM w$p),
         |pc$k AS MATERIALIZED (SELECT m.syms[m.i] AS l, m.syms[m.i+1] AS r, SUM(m.wcnt) AS pair_count
         |         FROM m$k m WHERE m.i < len(m.syms) GROUP BY 1, 2),
         |am$k AS MATERIALIZED (SELECT l, r FROM pc$k ORDER BY pair_count DESC, l, r LIMIT 1),
         |mm$k AS MATERIALIZED (SELECT word, i,
         |           (ROW_NUMBER() OVER (PARTITION BY word, i - rn ORDER BY i) % 2) = 1 AS merged
         |          FROM (SELECT m.word, m.i, ROW_NUMBER() OVER (PARTITION BY m.word ORDER BY m.i) AS rn
         |                FROM m$k m, am$k am
         |                WHERE m.i < len(m.syms) AND m.syms[m.i] = am.l AND m.syms[m.i+1] = am.r)),
         |w$k AS MATERIALIZED (SELECT m.word, MIN(m.wcnt) AS wcnt,
         |           list(CASE WHEN COALESCE(a.merged, FALSE) THEN m.syms[m.i] || m.syms[m.i+1]
         |                     ELSE m.syms[m.i] END ORDER BY m.i) AS syms
         |         FROM m$k m
         |         LEFT JOIN mm$k a ON a.word = m.word AND a.i = m.i
         |         LEFT JOIN mm$k p ON p.word = m.word AND p.i = m.i - 1 AND p.merged
         |         WHERE p.word IS NULL
         |         GROUP BY m.word)""".stripMargin
    }.mkString(",\n")
    s"""WITH wx AS (SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS word FROM documents),
       |w0 AS MATERIALIZED (SELECT word, COUNT(*) AS wcnt,
       |         list_transform(range(length(word)), i -> word[i+1]) AS syms
       |       FROM wx GROUP BY word),
       |$rounds,
       |sg AS (SELECT source, unnest(regexp_extract_all(text, '[a-z]+')) AS word FROM documents),
       |sc_ AS (SELECT source, word, COUNT(*) AS wc FROM sg GROUP BY 1, 2),
       |j AS (SELECT s.source, s.wc, CAST(length(s.word) AS BIGINT) AS n_chars,
       |        CAST(len(w.syms) AS BIGINT) AS n_subwords
       |      FROM sc_ s JOIN w10 w ON w.word = s.word),
       |ag AS (SELECT source, CAST(SUM(wc) AS BIGINT) AS n_words,
       |         CAST(SUM(wc * n_subwords) AS BIGINT) AS n_subwords,
       |         CAST(SUM(wc * n_chars) AS BIGINT) AS n_chars FROM j GROUP BY source)
       |SELECT source, n_words, n_subwords,
       |  ${pr4("n_subwords * 1.0 / n_words")} AS subw_per_word,
       |  ${pr4("n_chars * 1.0 / n_subwords")} AS chars_per_subw
       |FROM ag ORDER BY source""".stripMargin
  }
}
