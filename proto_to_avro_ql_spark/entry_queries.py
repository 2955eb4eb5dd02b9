"""The operator-ID → query registry backing ``__spark_entry__.py``.

Every SURVEY.md §2 operator ID registered here has (a) a Spark callable
``(spark, sf_dir) → DataFrame`` and (b), where SQL-expressible, a DuckDB
oracle in ``ORACLES`` producing identical column names and values.

Conventions for oracle stability:
- computed/aggregate columns aliased identically on both sides;
- double aggregates wrapped in round(…, n) on BOTH sides (sum order
  differs between engines; rounding removes last-ulp noise);
- dates rendered as ISO strings (reference semantics, SURVEY §1.2);
- arrays/structs are projected to scalars (length, joined string,
  element fields) for hashing; the nested forms are asserted in tests/.
- oracles must be PURE SELECT/WITH queries: the verification gate
  shares one DuckDB connection per sf_dir, so SET/CREATE/INSTALL/
  INSERT would leak state into later entries (enforced at run time in
  tests/oracle_check.duckdb_run and statically by tools/lint_oracles
  rule R5).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from proto_to_avro_ql_spark.fixtures import ADS_FLAT_SQL
from proto_to_avro_ql_spark.operators.reports import FLAGSHIP_SQL_TEMPLATE, flagship_report

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(
    name: str, oracle: str | None = None
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship (slice 0): proj_paths + filter_range + filter_cmp + filter_conj
# + agg_groupby_sum + agg_derived_ratio in one pipeline.
# ---------------------------------------------------------------------------

@register(
    "flagship_report",
    FLAGSHIP_SQL_TEMPLATE.format(
        ads_flat=ADS_FLAT_SQL, date_from="1994-01-01", date_to="1996-12-31"
    ),
)
def q_flagship_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slice-0 flagship: dot-path projection + range/cmp filters + grouped sums + derived ratios."""
    return flagship_report(spark, sf_dir)

# Widened per-operator registrations live in entry_registry.py (imported
# for side effects).
import proto_to_avro_ql_spark.entry_registry  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-window ordering (round 2, VERDICT item 2). The driver verifies
# the FIRST 50 entries of queries() in iteration order, so the dict is
# emitted in priority tiers: flagship + every SURVEY.md §2 contract ID
# first, then the highest-value oracled extension entries, then all
# remaining oracled entries (registration order), and rows-only /
# no-oracle entries last so they never burn a verification slot.
# ---------------------------------------------------------------------------

SURVEY2_CONTRACT_IDS: list[str] = [
    "src_parquet_scan", "src_stream_source", "src_cache_replay",
    "sink_cache_write", "sink_avro", "sink_json", "sink_json_direct",
    "proj_paths", "proj_subtree", "proj_flatten_scalar", "proj_const",
    "proj_struct_synth", "proj_reorder", "type_norm", "null_default",
    "null_empty_string", "enum_symbol", "arr_scalar", "arr_struct_prune",
    "rec_recursive", "val_unknown_field", "val_empty_struct",
    "filter_range", "filter_cmp", "filter_conj", "filter_cache_hit",
    "agg_groupby_sum", "agg_groupby_multi", "agg_derived_ratio",
    "agg_distinct", "fn_date_str", "fn_base64", "fn_concat_query",
    "join_equi_inner", "compile_schema_infer", "compile_field_bind",
    "udf_pandas_scalar", "ext_dedup_exact", "ext_dedup_near",
    "ext_sim_search", "ext_text_stats", "ext_window_agg",
    "ext_window_rank", "ext_multimodal",
]

# Oracled extension entries that fill the remaining driver-window
# slots. ROTATION POLICY (round-3 verdict, next-round #1): flagship +
# the 44 SURVEY §2 contract IDs stay pinned every round; these 5 slots
# rotate each round to entries the driver has NEVER verified (212 of
# 262 can't fit the 50-entry window otherwise), highest-value first.
# Rotation log: see ROADMAP.md "Driver-window rotation".
PRIORITY_EXT_IDS: list[str] = [
    # round 13 (out: ext_benford, ext_best_split, ext_bigram_lm,
    # ext_bitmap_index, ext_bloom_prune — all driver-green in
    # CORRECTNESS_r12; they remain locally gated by oracle_check).
    # In: the staged r13 candidates from ROADMAP.md "Driver-window
    # rotation", with ONE substitution ordered by the r12 VERDICT
    # (#3): ext_dsir_pipeline takes a REPAIR slot — its code changed
    # in r12 (§B persists) without a driver re-verification — and
    # displaces ext_calibration to the front of the r14 staging.
    # ext_dedup_embed_lsh was already the staged repair/veteran entry
    # (its code also changed in r12 — the salted bucket join — in the
    # same round the window rotated it out; the VERDICT's gap #2).
    "ext_assoc_rules",            # association rules (displaced r10)
    "ext_dedup_embed_lsh",        # REPAIR: r12 salted bucket join
    "ext_dsir_pipeline",          # REPAIR: r12 §B persists
    "ext_burn_rate",              # burn-rate / runway report
    "ext_burstiness",             # token burstiness (Fano factor)
]

# VETERAN RE-VERIFICATION POLICY (round-8 verdict #7): once per ~5
# rounds, one of the five rotation slots is spent on the OLDEST
# previously-driver-verified rotated-out entry instead of a first-time
# entry — a spot re-check that the rotation mechanism itself (and the
# local gate that guards rotated-out entries) still holds. Schedule:
# r10 uses src_proto_decode (driver-green r03, oldest veteran) in the
# fifth slot; next veteran slot ~r15. Displaced first-time candidates
# shift down one staging round (see ROADMAP.md rotation log).


def ordered_query_names() -> list[str]:
    """All registered names in driver-priority order (see above)."""
    names = list(QUERIES)
    pos = {n: i for i, n in enumerate(names)}
    contract = {n: i for i, n in enumerate(SURVEY2_CONTRACT_IDS)}
    priority = {n: i for i, n in enumerate(PRIORITY_EXT_IDS)}

    def key(n: str) -> tuple[int, int]:
        if n == "flagship_report":
            return (0, 0)
        if n in contract:
            return (1, contract[n])
        if n in priority:
            return (2, priority[n])
        if n in ORACLES:
            return (3, pos[n])
        return (4, pos[n])

    missing = [n for n in SURVEY2_CONTRACT_IDS if n not in QUERIES]
    assert not missing, f"SURVEY §2 contract IDs unregistered: {missing}"
    return sorted(names, key=key)
