"""Unchanged-tree host-drift control — the definitive attribution for
a uniform bench shift (see tools/bench_compare.py layer 3).

Round 9 established the protocol by hand: when a round-over-round
bench compare shows a fleet-wide uniform shift, the question "host or
code?" is answered by running the PRIOR round's unchanged tree on the
CURRENT host back-to-back with the current tree. r9's numbers: the
unchanged r8 tree reproduced +37% per-query median vs its own r8-close
stamp, while the r9 tree measured -7.7% vs the r8 tree like-for-like —
host drift, zero plan regressions. This tool automates that protocol:

    python tools/host_control.py REF [sf_dir]

- checks REF out into a temporary git worktree;
- times the 13 stable headline queries (bench.HEADLINE[:13] — pinned
  since round 1, present in every tree) on BOTH trees, each in its own
  subprocess (cold-per-query medians of 3, same methodology as
  bench.py), ref first then HEAD;
- prints one JSON line per tree plus the per-query median shift
  between them: |shift| near 0 => the trees perform alike on today's
  host, and any round-over-round uniform move is the host.

Keep it SHORT (13 queries, ~2-3 min total) so it can run at every
round close; the full-suite comparison stays bench_compare's job.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Executed inside each tree's own interpreter: the tree's sys.path,
# the tree's entry_queries. The query list is passed in (taken from
# the CURRENT tree's bench.HEADLINE[:13]) so both trees time the same
# set even if an old tree's bench.py predates a headline addition.
_RUNNER = r"""
import json, statistics, sys, time
tree, sf_dir, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
sys.path.insert(0, tree)
from proto_to_avro_ql_spark.entry_queries import QUERIES
from proto_to_avro_ql_spark.session import get_spark
spark = get_spark("host_control")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).count()
timings = {}
for name in names:
    fn = QUERIES.get(name)
    if fn is None:
        continue
    fn(spark, sf_dir).count()  # warm (JIT + codegen)
    passes = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        passes.append(time.perf_counter() - t0)
    timings[name] = round(statistics.median(passes), 3)
print(json.dumps(timings))
"""


def measure_tree(tree: str, sf_dir: str, names: list[str]) -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, tree, sf_dir, ",".join(names)],
        capture_output=True,
        text=True,
        cwd=tempfile.gettempdir(),  # foreign CWD, like driver_sim
    )
    if out.returncode != 0:
        # Old ref trees can fail to import or crash under today's env;
        # surface the captured stderr (check=True would swallow it)
        # before the finally-block worktree cleanup hides the tree.
        raise SystemExit(
            f"host_control: measuring tree {tree} failed "
            f"(exit {out.returncode}).\n--- runner stderr (tail) ---\n"
            + "\n".join(out.stderr.strip().splitlines()[-30:])
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    ref = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import HEADLINE, HEADLINE13_N
    from bench_compare import median_shift  # the tested shared definition

    names = HEADLINE[:HEADLINE13_N]
    wt = os.path.join(REPO, f".tmp_hostctrl_{os.getpid()}")
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--force", wt, ref],
        check=True,
        capture_output=True,
    )
    try:
        ref_t = measure_tree(wt, sf_dir, names)
        head_t = measure_tree(REPO, sf_dir, names)
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", wt],
            check=False,
            capture_output=True,
        )
        subprocess.run(
            ["git", "-C", REPO, "worktree", "prune"],
            check=False,
            capture_output=True,
        )
    shift = median_shift(ref_t, head_t)
    print(json.dumps({"tree": ref, "queries": ref_t,
                      "headline13": round(sum(ref_t.values()), 3)}))
    print(json.dumps({"tree": "HEAD", "queries": head_t,
                      "headline13": round(sum(head_t.values()), 3)}))
    print(json.dumps({
        "metric": "head_vs_ref_median_shift",
        "value": round(shift, 4),
        "read_as": (
            "near 0 => trees perform alike on today's host; any uniform "
            "round-over-round bench move is host drift, not plans"
        ),
    }))


if __name__ == "__main__":
    main()
