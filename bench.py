"""Benchmark harness (TimingUtils analog — /root/reference runner
TimingUtils.scala:15-21: wall-clock wrapper per pass).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) and
prints TWO JSON lines on stdout (per-query timings on stderr):
  1. the FULL detail payload — every timed query — also persisted to
     BENCH_DETAIL.json next to this script (SF-suffixed filename when
     run at a non-canonical SF, so ad-hoc runs never clobber the
     canonical sf0.1 artifact);
  2. a SHORT contract line (headline13 queries + n_queries + totals),
     last so a log-tail capture always keeps it intact:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
Consumers wanting the complete per-query map should read
BENCH_DETAIL.json (or the first line), never the final line alone.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# Timed passes per query; the reported number is the MEDIAN (round-3
# verdict, next-round #3: single-shot timings made a +23% bm25 blip
# indistinguishable from plan regression).
N_RUNS = 3

# The round-1 headline set, reported as a stable `headline13` subtotal
# so round-over-round totals stay comparable as the set grows.
HEADLINE13_N = 13

# Known design-trade regressions, annotated so they don't read as
# silent slowdowns (round-3 verdict, next-round #3).
NOTES = {
    "ext_sql_scripting": (
        "inherently iterative: a BEGIN..END WHILE loop issuing ~20 "
        "SEQUENTIAL tiny counts — per-job scheduling latency, not plan "
        "cost; each iteration is one pushed-down scan-stage count"
    ),
    "ext_zorder_manifest": (
        "+78% vs r02 by design: banded rank + prefix sum replaced a "
        "single-partition global ntile window — slower at local sf0.1, "
        "removes a one-task global sort that kills the plan at scale"
    ),
    "ext_cc_starcontraction": (
        "r05 fixed this family's own loop-cache leaks; r06's "
        "cold-per-query medians (see _R6_COLD_NOTE) additionally stop "
        "sibling entries' cached co-purchase edge builds from warming "
        "this entry's first pass — the full per-pass edge build is now "
        "always in the number"
    ),
    "ext_label_propagation": (
        "same history as ext_cc_starcontraction: r05 closed the loop "
        "leaks, r06's cold-per-query policy charges every pass its own "
        "co-purchase edge build"
    ),
    "ext_pareto_frontier": (
        "+~80% vs r04 by design: banded prefix-max replaced the global "
        "running-max window (the ext_zorder_manifest trade) — slightly "
        "slower at local sf0.1, removes the one-task sort at scale"
    ),
    "ext_bpe_train": (
        "inherently iterative: k=8 SEQUENTIAL merge-rule rounds, each a "
        "pair-count aggregate + top-1 + broadcast build over the cached "
        "word-frequency relation — per-round scheduling latency, not "
        "data cost (the corpus is read once; iterations are vocab-sized)"
    ),
    "ext_dedup_embed": (
        "by design the exact O(n^2) cosine baseline (exact=True is "
        "documented oracle-scale-only in simsearch.embedding_near_dup_"
        "pairs); ext_dedup_embed_lsh is the bucketed scale path and "
        "runs ~40x faster on the same data — first benched in r10 via "
        "the tail-coverage sweep"
    ),
    "udf_cogrouped_pandas": (
        "the documented Python-rate cogroup escape hatch: one Python "
        "invocation per distinct key by API contract — demonstrates "
        "the applyInPandas cogroup surface, not a data-path plan"
    ),
    "ext_bpe_encode": (
        "runs the full ext_bpe_train k-round trainer first (same "
        "sequential scheduling cost), then k map-side broadcast "
        "replaces over the per-(lang, word) relation"
    ),
    "ext_rfm": (
        "r05 rewrite: three banded ranks replaced three global NTILE "
        "sorts — same local cost, no single-partition window at scale"
    ),
}

# Round-6 honest-median annotation (r5 verdict #1): bench now runs
# spark.catalog.clearCache() before EVERY timed pass, so entries whose
# r5 medians were warm — via their own never-unpersisted intra-query
# cache (passes 2-3 read pass 1's) and/or a sibling entry's cached
# shared subtree (CacheManager plan matching, e.g. the co-purchase
# edge build shared across the whole graph family) — moved >30% when
# first measured cold. The delta is the honest per-pass cost of the
# entry's own cache build, not a plan regression; the cache itself
# remains the right plan (audited in tools/audit_caches.py).
_R6_COLD_NOTE = (
    "r06: +>30% vs r05 by measurement policy, not plan change — the "
    "r5 median was warm via leaked intra-query caches / a sibling's "
    "shared subtree; r06 clears the cache before every timed pass, so "
    "the median now includes this entry's own cache build each pass "
    "(see tools/audit_caches.py)"
)
for _q in [
    "ext_assortativity", "ext_bm25_search", "ext_clustering_coeff",
    "ext_cluster_quality", "ext_coec_bias", "ext_dedup_cluster",
    "ext_dedup_containment",
    "ext_dedup_minhash", "ext_feature_hash", "ext_fleiss_kappa",
    "ext_freq_triples", "ext_gdpr_cascade", "ext_graph_jaccard",
    "ext_hits", "ext_hybrid_search", "ext_kcore", "ext_kendall_tau",
    "ext_mann_whitney", "ext_markov_absorption", "ext_modularity",
    "ext_ndcg", "ext_negative_sampling", "ext_novelty_curve",
    "ext_pagerank", "ext_pca_power", "ext_price_index",
    "ext_shortest_path", "ext_spearman", "ext_tree_depth2",
    "ext_triangle_count",
]:
    NOTES.setdefault(_q, _R6_COLD_NOTE)

HEADLINE = [
    "flagship_report",
    "proj_paths",
    "agg_groupby_multi",
    "join_equi_inner",
    "ext_dedup_exact",
    "ext_dedup_minhash",
    "ext_sim_search",
    "ext_text_stats",
    "ext_window_agg",
    "ext_window_rank",
    "ext_asof_join",
    "ext_sessionize",
    "ext_corpus_pipeline",
    # round 2: new/rewritten operators, reported so regressions stay visible
    "ext_bm25_search",   # two-pass rewrite (6 -> 4 exchanges)
    "src_proto_decode",  # binary proto wire-format round trip (Python path)
    "ext_multi_join_report",  # 3-hop star join, fact-scale sides unhinted
    # round 2, session 2: new operators claimed done this round
    "ext_doc_chunk",      # narrow chunking, zero exchanges
    "ext_segment_dedup",  # segment dedup, md5+ids shuffle only
    "ext_tfidf",          # per-doc top terms, term-keyed joins
    "ext_bigram_lm",      # order-sensitive LM score
    # round 2, session 4: scale-pattern operators claimed done
    "ext_bloom_prune",           # Bloom semi-join pruning (dynamic filter)
    "ext_zorder_layout",         # Morton clustering key + range layout
    "ext_temperature_mix",       # temperature-scaled language mix
    "ext_dedup_lsh_incremental", # batch-vs-corpus LSH admission
    "ext_zorder_manifest",       # rank-normalized skipping manifest
    "ext_domain_cap",            # per-domain quota cap
    # round 3: new operators claimed done this round
    "ext_pivot",        # declared-values wide pivot, single hash agg
    "ext_unpivot",      # melt to long format, zero exchanges
    "ext_percentiles",  # exact grouped quantiles (sort aggregate)
    # round 3, session 2: Spark-4-native surfaces + entropy signal
    "ext_variant_json", # VariantType schema-on-read, zero exchanges
    "ext_entropy",      # token-entropy quality signal, 2 exchanges
    "ext_udtf_tokens",  # Python UDTF surface (documented slow path)
    "ext_pmi_bigrams",  # PMI collocations, windows over bigram vocab
    "ext_embed_quantize",  # unit-norm + int8 quantize, zero exchanges
    "ext_semdedup",     # SemDeDup cell-scoped semantic dedup
    "ext_multimodal_resize",  # vectorized NN resize via mapInPandas
    "ext_hybrid_search",  # BM25 + ANN reciprocal-rank fusion
    "src_replay_connector",  # Python DataSource connector (encode+stage+read)
    "src_stream_connector",  # streaming DataSource twin (driver prefetch path)
    "sink_replay_connector", # connector write side (two-phase commit) + read-back
    "ext_recursive_cte",     # native WITH RECURSIVE fixpoint (Spark 4.1)
    "ext_collation",         # UTF8_LCASE grouping
    "ext_try_arith",         # ANSI try_* error-safe arithmetic
    # round 3, session 3: arbitrary-logic family + iteration + robust stats
    "ext_pagerank",          # 3-iteration damped PageRank (repeated joins)
    "ext_ewma",              # 10-lag decay smoother, one window node
    "ext_map_in_arrow",      # Arrow-native Python hop (pyarrow.compute)
    "udf_grouped_agg_pandas",  # user Python aggregate in groupBy().agg()
    "ext_lateral_topk",      # correlated LATERAL, decorrelated plan
    "ext_winsorize",         # p05/p95 clip, percentile broadcast
    "ext_dedup_containment", # overlap-coefficient near-dup pairs
    "ext_auc",               # exact tie-aware AUC, banded prefix
    "ext_ndcg",              # NDCG@10, decimal-literal gains
    "ext_feature_hash",      # hashing-trick vectorizer, one exchange
    "ext_scd2_join",         # SCD2 validity-interval dimension lookup
    "ext_overlap_join",      # interval-overlap join on the user key
    "ext_embed_drift",       # per-dimension cohort means, scalar shuffle
    # round 3, session 4: graph/statistics breadth + crawl dedup
    "ext_triangle_count",    # degree-oriented wedge join (cached edges)
    "ext_survivorship",      # golden record, single max_by aggregation
    "ext_dedup_url",         # canonical-URL crawl dedup, keys-only shuffle
    "ext_ks_test",           # exact two-sample KS via banded prefix sums
    "ext_js_divergence",     # token-distribution JSD (en vs fr)
    "ext_graph_jaccard",     # link scoring via adjacency intersection
    "ext_spatial_join",      # grid-blocked radius join (exact int predicate)
    "ext_bootstrap_ci",      # Poisson bootstrap, 100 replicates one pass
    "ext_attribution",       # integer-ledger multi-touch attribution
    "ext_gopher_rules",      # rule-based quality gate, scan-stage only
    "ext_label_propagation", # 3-round LPA over cached adjacency
    "ext_cc_starcontraction", # log-round star-contraction CC
    "ext_mann_whitney",      # banded-rank U test, integer kernel
    "ext_freq_triples",      # apriori triples over cached pairs
    # round 4: corpus-maintenance operators claimed done this round
    "ext_dedup_span",        # repeated-passage top-k, hash-only count shuffle
    "ext_reservoir_sample",  # deterministic k-sample via TakeOrdered
    "ext_minhash_merge",     # mergeable per-source MinHash signatures
    "src_state_reader",      # statestore read of completed stream vs batch
    # round 4, session 2: inference stats, segmentation, join taxonomy,
    # BFS distances, and two new source formats
    "ext_prop_ztest",        # two-proportion z, one conditional agg pass
    "ext_cohens_kappa",      # 2x2 agreement kernel, decimal marginal products
    "ext_rfm",               # RFM quintile grid (banded ranks, r5 rewrite)
    "ext_group_split",       # leakage-safe source-hash split report
    "join_theta",            # pure inequality join, BroadcastNestedLoopJoin
    "ext_shortest_path",     # 3-round multi-source BFS over shared edges
    "src_binary_files",      # binaryFile whole-object ingest + md5 verify
    "src_text_scan",         # line-text round trip (write.text/read.text)
    "ext_qte",               # per-decile quantile treatment effects, one agg
    "ext_pit_features",      # point-in-time features + label, one pass
    "ext_modularity",        # Newman Q of the LPA partition, integer kernel
    "ext_hits",              # bipartite hub/authority path counting
    "ext_negative_sampling", # hash-deterministic negatives, anti-join
    "ext_gdpr_cascade",      # erasure-impact audit, broadcast semi probes
    "ext_runs_test",         # Wald-Wolfowitz randomness screen
    "ext_fk_audit",          # referential-integrity orphan probes
    "ext_partition_gaps",    # calendar-vs-observed ingest completeness
    "ext_scd2_build",        # SCD2 interval build, one lead window
    "ext_stratified_ate",    # post-stratified A/B estimate, ordered combine
    "udf_grouped_arrow",     # grouped-map applyInArrow (Arrow-native hop)
    "ext_sql_scripting",     # BEGIN..END WHILE loop, per-iter pushed count
    "sink_stream_foreachbatch",  # foreachBatch idempotent-overwrite sink
    "ext_backtest_naive",    # seasonal-naive forecast MAE/bias baseline
    "ext_assortativity",     # degree-mixing Pearson r, integer moments
    "ext_clustering_coeff",  # transitivity via oriented triangle reuse
    "ext_theilsen",          # robust median-of-slopes trend
    "ext_rate_test",         # two-count Poisson rate z, one pass
    "ext_hash_uniformity",   # chi-square canary on the md5 bucketing
    "ext_wilson_interval",   # Wilson score CI, closed form over (n, x)
    "ext_mde_sizing",        # samples-per-arm from observed moments
    "ext_srm_check",         # sample-ratio-mismatch guardrail
    "ext_contribution_analysis",  # period-over-period delta decomposition
    "ext_pareto_frontier",   # 2-D skyline, banded prefix-max (r5 rewrite)
    # round 4, session 3: rank statistics, causal matching, density
    # clustering, projections, time-series decomposition
    "ext_spearman",          # rank rho on contingency cells, marginal windows
    "ext_kendall_tau",       # tau-b via 2-D prefix sums on the dense grid
    "ext_assoc_rules",       # basket rules, in-task pairs + TakeOrdered
    "ext_psm_match",         # caliper 1-NN matching via edge windows
    "ext_ohlc",              # positional open/close bars, one window node
    "ext_holt",              # level+trend recurrence, series-sized Python
    "ext_dbscan_grid",       # grid-density clustering, cell-graph CC
    "ext_jl_projection",     # signed projection, array exprs in codegen
    "ext_isotonic",          # PAV calibration via bucket minimax
    "ext_shapley_attribution",  # game-theoretic channel credit
    "ext_pca_power",         # exact covariance + power iteration
    "ext_best_split",        # Gini threshold search on prefix sums
    "ext_permutation_test",  # randomization inference, one pass
    "ext_raking",            # IPF post-stratification weights
    "ext_knn_classify",      # kNN vote eval on brute-force top-k
    "ext_cluster_quality",   # exact-integer cluster scatter metrics
    "ext_coec_bias",         # position-debiased engagement
    "ext_anova",             # k-group F statistic, one scalar agg
    "ext_mrr_map",           # retrieval MRR/MAP@10 eval
    "ext_holt_winters",      # level+trend+weekly seasonal online fit
    "ext_effect_size",       # standardized effect magnitude report
    "ext_markov_absorption", # expected steps-to-conversion chain solve
    "ext_dtw",               # alignment-tolerant series distance
    "ext_lorenz_deciles",    # revenue-concentration curve
    "ext_tree_depth2",       # per-level histogram tree search
    "ext_sequence_match",    # behavioral regex over event trails
    "ext_price_index",       # matched-basket price indices
    "ext_growth_accounting", # new/retained/resurrected/churned flows
    "ext_rdd",               # regression-discontinuity local fit
    "ext_capture_recapture", # population coverage estimation
    "ext_cohort_ltv",        # cohort lifetime-value curves
    "ext_scenario_grid",     # one-scan sensitivity grid
    "ext_audience_overlap",  # behavior-pair audience Jaccard
    "ext_abc_analysis",      # revenue ABC classification
    "ext_peak_detection",    # series local-maxima report
    "ext_elasticity",        # cross-sectional price elasticity
    "ext_factorial_effects", # 2x2 experiment interaction analysis
    "ext_novelty_curve",     # batch-over-batch shingle novelty
    "ext_fleiss_kappa",      # multi-rater chance-corrected agreement
    "ext_seasonal_mk",       # seasonality-robust trend test
    "ext_streaks",           # gaps-and-islands engagement streaks
    "ext_stickiness",        # exact trailing DAU/WAU/MAU panel
    "ext_xyz_analysis",      # demand-variability classification
    "ext_burn_rate",         # SRE multi-window budget burn
    "ext_bitmap_index",      # block-bitmap conjunctive counting
    "ext_paired_ttest",      # within-subject pre/post inference
    "ext_eb_shrinkage",      # empirical-Bayes rate smoothing
    "ext_cross_correlation", # lead-lag CCF panel
    "ext_hurst",             # rescaled-range long-memory diagnostic
    "ext_match_pattern",     # MATCH_RECOGNIZE-style V episodes
    "ext_feature_importance", # one-pass Gini feature screen
    # round 5: scale-hygiene rewrites re-timed this round
    "ext_kcore",             # distributed peel + bounded local tail
    "ext_dedup_cluster",     # near-dup pairs -> CC clusters (local tail)
    "ext_entity_resolution", # vocab fuzzy match + string-keyed CC
    # round 8: portable-kernel rewrites (rows-only -> oracled) get
    # bench visibility so future moves in the NEW plans are tracked
    "ext_approx_distinct",      # integer HLL, 256 max-rho registers
    "ext_approx_freq",          # integer count-min, 4x256 counters
    "ext_approx_quantile",      # fixed-width histogram quantile
    "ext_incremental_distinct", # daily HLL registers merged
    "ext_kmeans",               # integer-grid Lloyd's iterations
    "ext_sim_search_ivf",       # integer-grid IVF probe
    "ext_pq_search",            # integer ADC product-quantization scan
    "ext_multimodal_features",  # raw byte-histogram via mapInPandas
    "ext_stream_append_sink",   # watermark-finalized append sink
    # round 9: new operators claimed done this round
    "ext_dsir_weights",         # DSIR hashed likelihood-ratio selection
    "ext_tokenizer_fertility",  # per-lang tokens/word + bytes/token QA
    # round 10 (r9 verdict #6): the registry tail's heaviest entries by
    # gate wall-clock (single-pass sf0.01 sweep, this round) — whole
    # families (streaming joins, pandas-UDF surfaces, sinks, remaining
    # dedup variants) were bench-invisible, so a scale regression there
    # could not show up in BENCH_DETAIL. Plus the two round-10 DSIR
    # entries and ext_dedup_embed_lsh (r11 rotation target).
    "ext_stream_join",           # stream-stream interval join, micro-batch
    "proj_subtree",              # nested-struct subtree projection
    "ext_dsir_resample",         # DSIR systematic resample (banded cumsum)
    "ext_dedup_ngram_jaccard",   # n-gram Jaccard near-dup (banded)
    "ext_dedup_simhash",         # SimHash banded near-dup
    "udf_cogrouped_pandas",      # applyInPandas cogrouped surface
    "ext_dedup_embed",           # exact embedding-cosine dedup
    "ext_stream_window",         # windowed streaming agg vs batch
    "ext_dsir_bigram",           # DSIR hashed-bigram features
    "ext_near_dedup_pipeline",   # normalize→minhash→verify chain
    "ext_stream_dedup",          # dropDuplicates-within-watermark
    "src_proto_repeated",        # repeated-field proto wire decode
    "val_unknown_field",         # unknown-field validation walk
    "ext_dedup_near",            # normalize-hash near-dup
    "ext_udtf_polymorphic",      # arrow-batched polymorphic UDTF
    "sink_partitioned",          # partitioned parquet sink layout
    "ext_compaction",            # small-file compaction planner
    "ext_expectations",          # data-quality expectation suite
    "sink_backfill",             # idempotent partition backfill
    "ext_sim_search_lsh",        # hyperplane-LSH ANN buckets
    "ext_dedup_embed_lsh",       # embedding-LSH near-dup (r11 target)
    "ext_ann_recall",            # LSH-vs-brute recall measurement
    "ext_bpe_train",             # BPE merge-rule training (8 iterations)
    "ext_bpe_encode",            # apply learned merges, per-lang stats
    "ext_kneser_ney",            # interpolated KN bigram LM per lang
    "ext_kneser_ney_holdout",    # held-out KN scoring (OOV floor)
    "ext_nb_langid",             # learned NB lang-id, held-out confusion
    # round 11 (r10 verdict #4): the next-heaviest unbenched tail by a
    # single-pass sf0.01 sweep (172 entries probed; everything below
    # ~1 s is fixed-overhead-dominated). Mix of curation / privacy /
    # SQL-surface / §2-contract entries that had no bench visibility.
    "ext_dsir_pipeline",         # composed select-sample-cut DSIR chain (NEW r11)
    "proj_flatten_scalar",       # nested-path scalar flattening (§2)
    "udf_grouped_pandas",        # applyInPandas grouped surface
    "val_empty_struct",          # empty-struct validation walk (§2)
    "ext_stream_static_join",    # stream-static enrichment join
    "ext_contamination",         # benchmark-contamination scan
    "ext_trimmed_mean",          # banded-rank trimmed mean
    "ext_corpus_stats",          # cleaned-corpus token accounting
    "ext_vocab",                 # corpus vocabulary build
    "ext_token_overlap_matrix",  # pairwise source token overlap
    "sink_cache_write",          # query-text result cache write (§2)
    "setop_union_except",        # UNION/EXCEPT set-operator surface
    "ext_chi_square",            # independence test panel
    "ext_copurchase",            # apriori-pruned basket pairs
    "ext_feature_pipeline",      # composed train-features chain
    "ext_file_metadata",         # manifest/footer metadata scan
    "ext_mutual_information",    # MI feature screen
    "ext_incremental_agg",       # merge-on-read incremental agg
    "ext_survival_km",           # Kaplan-Meier retention curve
    "ext_cuped",                 # CUPED variance reduction
    "proj_struct_synth",         # struct synthesis projection (§2)
    "ext_lift_table",            # decile lift/gain table
    # round 11: new operators claimed done this round
    "ext_good_turing",           # bigram count-of-counts GT table
    "ext_bpe_vocab",             # BPE vocab + decode round-trip QA
    "ext_lm_ppl_filter",         # CCNet-style KN perplexity filter
    "ext_semdedup_kmeans",       # k-means-bucketed semantic dedup (learned cells)
    "ext_audio_energy",          # audio windowed-energy / silence VAD kernel
    "ext_katz_backoff",          # held-out Katz GT-discount backoff LM
    "ext_ccnet_pipeline",        # composed CCNet clean->LM->ppl-cut chain
    # round 12 (r11 verdict #4): the next-heaviest unbenched tail by a
    # single-pass sf0.01 sweep (151 entries probed; all remaining
    # unbenched entries are < ~0.7 s, fixed-overhead-dominated).
    "proj_const",                # constant-column projection (§2)
    "compile_schema_infer",      # schema inference compile path (§2)
    "ext_vocab_coverage",        # vocab coverage vs reference list
    "src_cache_replay",          # result-cache replay source (§2)
    "ext_gini",                  # Gini coefficient (banded rank)
    "filter_range",              # date-range filter pushdown (§2)
    "filter_conj",               # conjunctive filter pushdown (§2)
    "sink_orc",                  # ORC sink round-trip
    "ext_t_closeness",           # t-closeness privacy audit
    "ext_uplift_deciles",        # uplift-by-decile table
    "ext_mann_kendall",          # Mann-Kendall trend test
    "proj_reorder",              # column-reorder projection (§2)
    "agg_derived_ratio",         # derived-ratio aggregate (§2)
    "sink_avro",                 # Avro sink (py4j DataFileWriter)
    "ext_cusum",                 # CUSUM changepoint statistic
    "ext_cramers_v",             # Cramér's V association matrix
    "ext_degree_dist",           # graph degree distribution
    "gaql_implicit_agg",         # GAQL implicit-aggregation surface
    "join_semi_anti",            # semi/anti join surface
    "ext_zipf_fit",              # Zipf rank-frequency fit
    "ext_skew_join_salted",      # salt-replicated skew join
    "sink_variant_parquet",      # VARIANT-column parquet sink
    "compile_field_bind",        # field-binding compile path (§2)
    "ext_chi_residuals",         # chi-square standardized residuals
    "ext_observe_metrics",       # observe()/metrics surface
    # round 12: new operators claimed done this round
    "ext_katz_vs_kn",            # Katz-vs-KN held-out comparison (one plan)
    "ext_trigram_kn",            # held-out interpolated trigram KN
    "ext_span_scrub",            # Lee et al. repeated-span removal
    "ext_selfbleu",              # Self-BLEU-2 corpus diversity (top-2 clip)
    "ext_winnowing",             # MOSS winnowing fingerprint selection
    "ext_mmr_select",            # MMR diverse top-k re-ranking (greedy k=8)
    "ext_audio_zcr",             # audio zero-crossing rate + silence trim
    "ext_soft_dedup",            # SoftDeDup span-commonness reweighting
    "ext_nb_quality",            # seed-trained NB quality filter
    "ext_heaps_law",             # Heaps'-law vocab growth + OLS fit
    "ext_rake_keywords",         # RAKE keyword extraction per language
    "ext_curriculum_order",      # easy->hard curriculum global ordering
    "ext_vad_segments",          # VAD gaps-and-islands segmentation
    "ext_distinct_n",            # distinct-1/2 corpus diversity
    "ext_dataset_card",          # per-language datasheet summary
    "ext_blockhash",             # perceptual aHash banded image dedup
    "ext_minhash_est_error",     # MinHash estimator calibration table
    "ext_entropy_rate",          # conditional bigram entropy + MI
]


def sink_comparison(spark, sf_dir: str) -> None:
    """Reference-runner parity (Main.scala:200-246): time the same
    report through three encoders — columnar (parquet), json-lines,
    and in-plan to_json — printed per pass like TimingUtils."""
    import tempfile

    from proto_to_avro_ql_spark.entry_queries import QUERIES
    from proto_to_avro_ql_spark.sources.io import sink_json_direct

    df = QUERIES["flagship_report"](spark, sf_dir)
    df.count()  # warm
    passes = {
        "sink_parquet": lambda: df.write.mode("overwrite").parquet(
            tempfile.mkdtemp(prefix="bench_pq_")
        ),
        "sink_json": lambda: df.write.mode("overwrite").json(
            tempfile.mkdtemp(prefix="bench_js_")
        ),
        "sink_to_json": lambda: sink_json_direct(df).count(),
    }
    for name, fn in passes.items():
        t0 = time.perf_counter()
        fn()
        print(f"# {name}: {round(time.perf_counter() - t0, 3)}s", file=sys.stderr)


def rel_spread(passes: list[float]) -> float:
    """(max - min) / median of one query's timed passes — the per-query
    same-HEAD noise measurement the r8 verdict asked bench to stamp
    (pure; pinned in tests/test_bench_noise.py)."""
    if not passes:
        return 0.0
    med = statistics.median(passes)
    if med <= 0:
        return 0.0
    return (max(passes) - min(passes)) / med


def noise_envelope(
    passes_map: dict[str, list[float]],
    control_query: str,
    control_main: float,
    control_end: float,
) -> dict:
    """Summarize the run's own measured noise so bench_compare can
    adjudicate round-over-round movers mechanically instead of via
    ROADMAP prose (r8 verdict, What's-wrong #1: 8 movers >=30% carried
    no NOTE, all host noise, adjudicated only in prose).

    - median/p90_rel_spread: distribution of per-query pass spreads
      within THIS run (r8 measured 14% median / >100% tail same-HEAD).
    - control_drift_rel: the control query re-timed at the END of the
      run vs its own main-slot median — within-session drift over the
      run's wall-clock (the +18% unchanged-code control, measured
      per-run instead of assumed)."""
    spreads = sorted(rel_spread(p) for p in passes_map.values() if p)
    if spreads:
        med = statistics.median(spreads)
        p90 = spreads[max(0, -(-9 * len(spreads) // 10) - 1)]  # nearest-rank p90
    else:
        med = p90 = 0.0
    drift = (
        abs(control_end - control_main) / control_main if control_main > 0 else 0.0
    )
    return {
        "median_rel_spread": round(med, 4),
        "p90_rel_spread": round(p90, 4),
        "control_query": control_query,
        "control_main_s": round(control_main, 3),
        "control_end_s": round(control_end, 3),
        "control_drift_rel": round(drift, 4),
        "n_queries": len(spreads),
    }


def round_stamp_path(here: str, sf: str, rnd: str | None) -> str | None:
    """Round-7 verdict #4 — the write-once round-stamp decision.

    Returns the BENCH_DETAIL_r{N}.json path to write, None when no
    stamp applies (no SPARK_GRAFT_BENCH_ROUND set, or a non-canonical
    SF — only sf0.1 numbers are certified), or the sentinel "EXISTS"
    when the stamp is already on disk: an existing round stamp is
    NEVER overwritten, so a later driver or ad-hoc canonical-SF re-run
    cannot clobber the numbers a round's records cite."""
    if not rnd or sf != "0.1":
        return None
    if not rnd.isdigit():
        # r7 ADVICE: int(rnd) on a malformed SPARK_GRAFT_BENCH_ROUND
        # raised ValueError inside a try that only caught OSError,
        # crashing bench after the live detail write but before the
        # headline line. A bad round number only costs the stamp.
        print(
            f"# warning: SPARK_GRAFT_BENCH_ROUND={rnd!r} is not a round "
            "number; skipping the round stamp",
            file=sys.stderr,
        )
        return None
    stamp = os.path.join(here, f"BENCH_DETAIL_r{int(rnd):02d}.json")
    return "EXISTS" if os.path.exists(stamp) else stamp


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from proto_to_avro_ql_spark.entry_queries import QUERIES
    from proto_to_avro_ql_spark.session import get_spark

    spark = get_spark("bench")
    # Keep the stderr tail signal-dense: Spark WARNs (e.g. the bounded
    # band-count window's "No Partition Defined", which is deliberate
    # and #bands-sized — see operators/layout.py) drown the per-query
    # timing lines the driver records.
    spark.sparkContext.setLogLevel("ERROR")
    # Warm-up pass (untimed): JVM JIT, codegen compilation, parquet
    # footer caches. The reference's numbers are steady-state translate
    # throughput on a warm JVM (README.md:214: timings measured around
    # each pass after the stream was already cached locally), so the
    # measured pass below is the comparable one.
    spark.range(1).count()
    for i, name in enumerate(HEADLINE):
        fn = QUERIES.get(name)
        if fn is not None:
            fn(spark, sf_dir).count()
        if i % 20 == 19:
            # the warm-up sweep would otherwise accumulate all ~64
            # shared-subtree caches at once (timed passes each start
            # from clearCache anyway — warm-up is for JIT/codegen)
            spark.catalog.clearCache()
    # the first timed slot otherwise pays the tail of JVM JIT warm-up
    # accumulated across the whole warm-up pass (~0.5s on flagship)
    QUERIES[HEADLINE[0]](spark, sf_dir).count()

    timings: dict[str, float] = {}
    passes_map: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        passes = []
        for _ in range(N_RUNS):
            # Round-5 verdict #1: 56 intra-query cache()/persist() sites
            # in single-shot entries are never unpersisted, so without
            # this, passes 2-3 (and first passes of entries sharing a
            # cached subtree, via CacheManager plan matching) read warm
            # caches and the medians lie. Clearing BEFORE each timed
            # pass makes every pass cold-per-query: each median now
            # includes the entry's own cache build, honestly.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()  # materialize the full pipeline
            passes.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(passes), 3)
        passes_map[name] = [round(p, 4) for p in passes]
        print(
            f"# {name}: {timings[name]}s median of "
            f"{[round(p, 3) for p in passes]} ({n} rows)",
            file=sys.stderr,
        )

    # End-of-run control: re-time the first headline query so the stamp
    # carries the run's own within-session drift (see noise_envelope).
    control_q = HEADLINE[0]
    control_passes = []
    if control_q in timings:
        fn = QUERIES[control_q]
        for _ in range(N_RUNS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            control_passes.append(time.perf_counter() - t0)
    envelope = noise_envelope(
        passes_map,
        control_q,
        timings.get(control_q, 0.0),
        statistics.median(control_passes) if control_passes else 0.0,
    )
    print(f"# noise_envelope: {json.dumps(envelope)}", file=sys.stderr)

    if os.environ.get("SPARK_GRAFT_BENCH_SINKS"):
        sink_comparison(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    headline13 = round(
        sum(timings.get(q, 0.0) for q in HEADLINE[:HEADLINE13_N]), 3
    )
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Round-4 verdict #4: the single ~5 KB JSON line (158 queries) got
    # truncated by the driver's tail capture, losing the parsed
    # payload. Emit the FULL per-query map first (and persist it to
    # BENCH_DETAIL.json next to this script), then a SHORT final
    # contract line — headline13 queries only — that survives any
    # tail-window capture intact.
    detail = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "runs_per_query": N_RUNS,
        "stat": "median",
        "headline13": headline13,
        "notes": {k: v for k, v in NOTES.items() if k in timings},
        # Per-query pass times + the run's measured noise envelope:
        # tools/bench_compare.py classifies round-over-round movers
        # inside this envelope as "within measured noise" mechanically
        # (r8 verdict, What's-wrong #1).
        "passes": passes_map,
        "noise_envelope": envelope,
    }
    print(json.dumps(detail))
    try:
        # Round-5 ADVICE: an ad-hoc run at a non-canonical SF must not
        # clobber the committed sf0.1 artifact that bench_compare and
        # the round records consume — non-canonical SFs get an
        # SF-suffixed filename instead. Round-7 verdict #4: the
        # canonical-SF file is now a LIVE artifact (gitignored — any
        # run may overwrite it); the numbers a round's records cite
        # are round-stamped WRITE-ONCE copies (BENCH_DETAIL_r{N}.json,
        # committed): set SPARK_GRAFT_BENCH_ROUND=N on the round-close
        # run and a later re-run — driver or ad-hoc — cannot clobber
        # the certified artifact (existing stamps are never
        # overwritten).
        detail_name = (
            "BENCH_DETAIL.json" if sf == "0.1" else f"BENCH_DETAIL_sf{sf}.json"
        )
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, detail_name), "w") as fh:
            json.dump(detail, fh, indent=1)
        stamp = round_stamp_path(here, sf, os.environ.get("SPARK_GRAFT_BENCH_ROUND"))
        if stamp == "EXISTS":
            print(
                "# round stamp already exists — round-stamped artifacts "
                "are write-once; not overwritten",
                file=sys.stderr,
            )
        elif stamp:
            with open(stamp, "w") as fh:
                json.dump(detail, fh, indent=1)
    except OSError as exc:  # read-only checkout: the stdout line stands
        print(f"# BENCH_DETAIL.json not written: {exc}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": {
                    q: timings[q] for q in HEADLINE[:HEADLINE13_N] if q in timings
                },
                "sf": sf_val,
                "runs_per_query": N_RUNS,
                "stat": "median",
                "headline13": headline13,
                "n_queries": len(timings),
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
