"""Scale sweep: warm wall-clock of representative queries across the
100× span sf0.001 → sf0.01 → sf0.1 — the empirical backing for the
linearity claims in SCALE.md (a plan whose cost curve bends quadratic
would show it across two decades).

Run:  python tools/scale_sweep.py
One JSON line per (sf, query) on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from proto_to_avro_ql_spark.entry_queries import QUERIES  # noqa: E402
from proto_to_avro_ql_spark.session import get_spark  # noqa: E402

SWEEP = [
    "flagship_report",
    "ext_dedup_minhash",
    "ext_corpus_pipeline",
    "ext_sim_search",
    "ext_window_agg",
    "ext_asof_join",
    # round 2
    "ext_dedup_ngram_jaccard",
    "ext_lm_score",
    "ext_upsert_merge",
    "src_proto_decode",
    # round 2, session 3
    "ext_segment_dedup",
    "ext_tfidf",
    "ext_bigram_lm",
    "ext_funnel",
    # round 3
    "ext_pivot",
    "ext_percentiles",
    "ext_range_frame",
    "ext_zorder_manifest",
    "ext_embed_centroids",
    # round 3, session 2
    "ext_entropy",
    "ext_variant_json",
    "ext_pmi_bigrams",
    "ext_embed_quantize",
    "ext_semdedup_kmeans",
    "ext_hybrid_search",
    "src_replay_connector",
    # round 3, session 3
    "ext_pagerank",
    "ext_ewma",
    "ext_dedup_containment",
    "ext_markov_transitions",
    "ext_winsorize",
    "ext_lateral_topk",
    "ext_url_normalize",
    "ext_token_bpe",
    "ext_auc",
    "ext_ndcg",
    "ext_feature_hash",
    "ext_copurchase",
    "ext_scd2_join",
    "ext_overlap_join",
    # round 3, session 4
    "ext_triangle_count",
    "ext_graph_jaccard",
    "ext_spatial_join",
    "ext_ks_test",
    "ext_gini",
    "ext_bootstrap_ci",
    "ext_survivorship",
    "ext_dedup_url",
    "ext_js_divergence",
    "ext_class_balance",
    # round 3, session 5
    "ext_cc_starcontraction",
    "ext_kcore",
    "ext_freq_triples",
    "ext_mann_whitney",
    "ext_event_paths",
    "ext_time_weighted_avg",
    "ext_entity_resolution",
    "ext_window_count_distinct",
    # round 4
    "ext_dedup_span",
    "ext_reservoir_sample",
    "ext_minhash_merge",
    # round 4, session 2
    "ext_shortest_path",
    "ext_modularity",
    "ext_hits",
    "ext_negative_sampling",
    "ext_qte",
    "ext_pit_features",
    "join_theta",
    "ext_scd2_build",
    "src_binary_files",
    # round 4, session 3
    "ext_spearman",
    "ext_kendall_tau",
    "ext_assoc_rules",
    "ext_psm_match",
    "ext_holt",
    "ext_dbscan_grid",
    "ext_jl_projection",
    "ext_isotonic",
    "ext_pca_power",
    "ext_permutation_test",
    "ext_coec_bias",
    "ext_cluster_quality",
    "ext_anova",
    "ext_holt_winters",
    # round 5: scale-hygiene rewrites
    "ext_rfm",
    "ext_pareto_frontier",
    "ext_match_pattern",
    # round 7: the remaining window-rotation entries not yet swept +
    # the r08-staged grouping/stats aggregates
    "ext_sessionize",
    "agg_cube",
    "agg_grouping_sets",
    "agg_percentile",
    "agg_rollup",
    "agg_stats",
    # round 8: the portable-kernel rewrites (integer HLL/CMS/histogram
    # sketches, integer-grid kmeans/IVF/PQ, raw byte-histogram
    # features, sentinel-finalized append sink) — new plans, so their
    # cost curves need fresh empirical backing
    "ext_approx_distinct",
    "ext_approx_freq",
    "ext_approx_quantile",
    "ext_incremental_distinct",
    "ext_kmeans",
    "ext_sim_search_ivf",
    "ext_pq_search",
    "ext_multimodal_features",
    "ext_stream_append_sink",
    # round 8: staged rotation candidates (r9-r11) not already swept
    "ext_ab_test",
    "ext_abc_analysis",
    "ext_ann_recall",
    "ext_anomaly_band",
    "ext_array_ops",
    "ext_assortativity",
    "ext_audience_overlap",
    "ext_autocorr",
    "ext_backtest_naive",
    # round 9: new entries + staged rotation candidates (r12-r14) not
    # already swept
    "ext_dsir_weights",
    "ext_tokenizer_fertility",
    "ext_benford",
    "ext_best_split",
    "ext_bitmap_index",
    "ext_bloom_prune",
    "ext_dedup_embed_lsh",
    "ext_burn_rate",
    "ext_burstiness",
    "ext_calibration",
    "ext_capture_recapture",
    "ext_chi_residuals",
    "ext_chi_square",
    "ext_class_metrics",
    # round 10: new DSIR entries + staged r15 rotation candidates
    "ext_dsir_bigram",
    "ext_dsir_resample",
    "ext_cluster_quality",
    "ext_clustering_coeff",
    "ext_coec_bias",
    "ext_cohens_kappa",
    "ext_cohort_ltv",
    "ext_bpe_train",
    "ext_bpe_encode",
    "ext_kneser_ney",
    "ext_kneser_ney_holdout",
    "ext_nb_langid",
    # round 10: staged r16 rotation candidates
    "ext_collation",
    "ext_compaction",
    "ext_contamination",
    "ext_contribution_analysis",
    "ext_conversion_lag",
    # round 10: staged r17 rotation candidates (not already swept)
    "ext_corpus_stats",
    "ext_corr_matrix",
    "ext_cramers_v",
    "ext_cross_correlation",
    # round 11
    "ext_dsir_pipeline",
    "ext_good_turing",
    "ext_bpe_vocab",
    "ext_lm_ppl_filter",
    "ext_semdedup_kmeans",
    "ext_audio_energy",
    "ext_katz_backoff",
    "ext_ccnet_pipeline",
    # round 12
    "ext_katz_vs_kn",
    "ext_trigram_kn",
    "ext_span_scrub",
    "ext_selfbleu",
    "ext_winnowing",
    "ext_mmr_select",
    # round 12, session 2
    "ext_audio_zcr",
    "ext_soft_dedup",
    "ext_nb_quality",
    "ext_heaps_law",
    "ext_rake_keywords",
    "ext_curriculum_order",
    # round 12, session 3
    "ext_vad_segments",
    "ext_distinct_n",
    "ext_dataset_card",
    "ext_blockhash",
    "ext_minhash_est_error",
    "ext_entropy_rate",
]
SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    # Optional args: query names — sweep only that subset (new-entry
    # certification runs); no args = the full list.
    subset = [a for a in sys.argv[1:] if not a.startswith("-")]
    sweep = subset or SWEEP
    unknown = [n for n in sweep if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark("scale_sweep")
    spark.range(1).count()
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        for name in sweep:
            fn = QUERIES[name]
            fn(spark, sf_dir).count()  # warm (JIT + codegen)
            # r6 honest-median policy (same as bench.py): the warm
            # pass populated the entry's intra-query caches; clear so
            # the timed run pays its own cache build, cold-per-query.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            print(
                json.dumps(
                    {
                        "sf": float(sf),
                        "query": name,
                        "wall_s": round(time.perf_counter() - t0, 3),
                        "rows": n,
                    }
                )
            )
        # persisted intermediates (minhash signature tables etc.) are
        # keyed on the sf path; clear between scales so each scale pays
        # its own compute.
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
