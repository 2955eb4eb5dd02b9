"""Repo-wide window-hygiene audit: find every UNPARTITIONED window in
every registered entry's physical plan.

A `Window` with an empty partition spec moves its whole input to ONE
task — the canonical scale-killer (reference runner executes
single-threaded so it never faces this; our plans must). The audit
classifies each unpartitioned window by the aggregate expression it
computes; tests/test_window_hygiene.py pins the allowlist of entries
whose unpartitioned windows are over provably BOUNDED relations
(band/decile/bucket rollups, per-group series, top-k'd slices), so a
new global sort over a data-scale relation cannot land silently.

Usage: python tools/audit_windows.py [sf_dir]   (prints one line per
entry that has >=1 unpartitioned window, with the aggregate heads).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WSD = re.compile(r"windowspecdefinition\((.*?)specifiedwindowframe", re.DOTALL)
_HEAD = re.compile(r"Window \[(\w+)\(([^#)]*)")


def unpartitioned_windows(plan: str) -> list[str]:
    """Signatures ('fn(firstarg' heads) of windows with no partition
    columns in a physical/executedPlan string.

    In plan text a window spec is ``windowspecdefinition(part1, part2,
    ord1 ASC ..., specifiedwindowframe(...)``; partition columns carry
    no ASC/DESC marker, ordering columns always do. No argument
    without ASC/DESC before the frame == no partitioning.
    """
    out = []
    for line in plan.splitlines():
        if "Window [" not in line or "windowspecdefinition(" not in line:
            continue
        m = _WSD.search(line)
        if not m:
            continue
        args = m.group(1)
        # strip nested parens so commas inside casts don't split args
        depth, flat = 0, []
        for ch in args:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0:
                flat.append(ch)
        parts = [a.strip() for a in "".join(flat).split(",") if a.strip()]
        has_partition = any(
            a and " ASC" not in a and " DESC" not in a for a in parts
        )
        if not has_partition:
            h = _HEAD.search(line)
            out.append(h.group(1) + "(" + h.group(2).strip() if h else "?")
    return out


# Entries whose unpartitioned windows are over provably BOUNDED
# relations, audited 2026-08-15 (round 5) over all 361 entries at
# sf0.001. Five bounded shapes cover all of them:
#   band relation    — banded_global_rank / prefix-sum-max band rollups
#                      (sum(_bn/_bsum/ba/bt/n0_band), max(_bmax))
#   bucket relation  — value-bucket prefix sums, B ≪ rows
#                      (best_split/tree_depth2/isotonic/burn_rate)
#   series relation  — per-day/period panels bounded by the calendar
#                      (sprt_monitor/contribution/stratified_ate/
#                       survival_km)
#   top-k slice      — TakeOrdered/limit before the window
#                      (zipf_fit top-1000, hybrid_search top-20,
#                       reservoir_sample k=100, bitmap_index top-dims)
#   group relation   — low-cardinality dimension rollups
#                      (temperature_mix langs, pmi_bigrams vocab pairs,
#                       gini/lorenz/lift/uplift decile rows)
# A NEW entry (or new signature on an old entry) flips the exit code:
# classify it here only with a boundedness argument in its docstring.
ALLOWED: dict[str, set[str]] = {
    "ext_abc_analysis": {"sum(_bsum"},
    "ext_auc": {"sum(n0_band"},
    "ext_best_split": {"row_number(", "sum(n"},
    "ext_bitmap_index": {"row_number("},
    "ext_burn_rate": {"sum(n"},
    "ext_contribution_analysis": {"sum(_w0"},
    # banded_global_cumsum offsets: #bands-row relation (docs/4096)
    "ext_dsir_resample": {"sum(_bs"},
    # round 12: the same banded-helper offset windows — #bands rows
    # (heaps: doc_id div 1024 bands via banded_global_cumsum;
    # curriculum: ~20 one-nat difficulty bands via banded_global_rank).
    "ext_heaps_law": {"sum(_bs"},
    "ext_curriculum_order": {"sum(_bn"},
    # the composed pipeline's two banded cumsums: doc-id bands
    # (docs/4096) + weight bands (≤ ~977 rows, weight div 1024)
    "ext_dsir_pipeline": {"sum(_bs"},
    "ext_gini": {"sum(_bn"},
    "ext_hybrid_search": {"row_number("},
    "ext_isotonic": {"sum(n"},
    "ext_ks_test": {"sum(ba"},
    "ext_lift_table": {"sum(_bn", "sum(n", "sum(n_pos"},
    "ext_lorenz_deciles": {"sum(_bn", "sum(revenue_cents"},
    "ext_mann_whitney": {"sum(bt"},
    "ext_pareto_frontier": {"max(_bmax"},
    "ext_pmi_bigrams": {"sum(c12"},
    "ext_reservoir_sample": {"row_number("},
    "ext_rfm": {"sum(_bn"},
    "ext_sprt_monitor": {"sum(n"},
    "ext_stratified_ate": {"sum(_w0"},
    "ext_survival_km": {"sum(_w0", "sum(n_total"},
    "ext_temperature_mix": {"sum(wt"},
    "ext_tree_depth2": {"row_number(", "sum(n"},
    "ext_uplift_deciles": {"sum(_bn"},
    "ext_zipf_fit": {"row_number("},
    "ext_zorder_manifest": {"sum(_bn"},
}


def audit(sf_dir: str) -> dict[str, list[str]]:
    from proto_to_avro_ql_spark.entry_queries import QUERIES
    from proto_to_avro_ql_spark.session import get_spark

    spark = get_spark("audit_windows")
    found: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - audit must not abort
            found[name] = [f"PLAN_ERROR: {type(exc).__name__}"]
            continue
        sigs = unpartitioned_windows(plan)
        if sigs:
            found[name] = sorted(set(sigs))
    return found


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    hits = audit(sf)
    new = {
        name: sigs
        for name, sigs in hits.items()
        if set(sigs) - ALLOWED.get(name, set())
    }
    for name in sorted(hits):
        flag = "NEW " if name in new else ""
        print(f"{flag}{name}: {hits[name]}")
    print(f"# {len(hits)} entries with unpartitioned windows, {len(new)} new")
    sys.exit(1 if new else 0)
