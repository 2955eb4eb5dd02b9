"""Interleaved ABAB headline13 control at two core counts (r12 VERDICT
next-round #1): the round-12 driver bench read 12/13 headline queries
+21..+39% with ZERO code change on 11 of them; the judge adjudicated
host/JIT noise but ordered a driver-grade control before round 13
optimizes anything.

    python tools/headline_ab.py REF [sf_dir]

- checks REF (the r11 close, ca73a8f) out into a temporary worktree;
- for each core count (32 then 8) runs N_PASSES interleaved pairs:
  ref-tree subprocess, HEAD subprocess, ref, HEAD, ... Each subprocess
  is a COLD JVM (fresh session) that times bench.HEADLINE[:13] exactly
  like bench.py's timed loop (one warm pass per query, then 3
  clearCache'd passes, median) — the host_control runner;
- records /proc/loadavg before every subprocess so the artifact shows
  whether the host was idle;
- prints a JSON document with every pass, per-(tree,cpus) per-query
  medians-of-medians, and the head/ref per-query ratio per core count.

Interpretation contract (from the verdict): if HEAD@32c reproduces
>= +15% vs ref@32c while 8c is flat, the r12 regression is real on the
32-core path — bisect 1c2909c..HEAD. If both core counts are flat, the
r12 driver numbers were host noise and the question is closed.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PASSES = 5

_RUNNER = r"""
import json, statistics, sys, time
tree, sf_dir, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
sys.path.insert(0, tree)
from proto_to_avro_ql_spark.entry_queries import QUERIES
from proto_to_avro_ql_spark.session import get_spark
spark = get_spark("headline_ab")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).count()
timings = {}
for name in names:
    fn = QUERIES.get(name)
    if fn is None:
        continue
    fn(spark, sf_dir).count()  # warm (JIT + codegen), like bench.py
    passes = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        passes.append(time.perf_counter() - t0)
    timings[name] = round(statistics.median(passes), 3)
print(json.dumps(timings))
"""


def loadavg() -> list[float]:
    with open("/proc/loadavg") as fh:
        return [float(x) for x in fh.read().split()[:3]]


def run_tree(tree: str, sf_dir: str, names: list[str], cpus: int) -> dict[str, float]:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, tree, sf_dir, ",".join(names)],
        capture_output=True,
        text=True,
        cwd=tempfile.gettempdir(),
        env=env,
    )
    if out.returncode != 0:
        raise SystemExit(
            f"headline_ab: tree {tree} cpus {cpus} failed "
            f"(exit {out.returncode}).\n"
            + "\n".join(out.stderr.strip().splitlines()[-30:])
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    ref = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    sys.path.insert(0, REPO)
    from bench import HEADLINE, HEADLINE13_N

    names = HEADLINE[:HEADLINE13_N]
    # Pin BOTH trees as worktrees (HEAD too): the live checkout may be
    # edited while this control runs, and the control must measure the
    # round-open commit, not a moving tree.
    head_sha = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "HEAD"],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    wt = os.path.join(REPO, f".tmp_hlab_ref_{os.getpid()}")
    wt_head = os.path.join(REPO, f".tmp_hlab_head_{os.getpid()}")
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--force", wt, ref],
        check=True,
        capture_output=True,
    )
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--force", "--detach", wt_head, head_sha],
        check=True,
        capture_output=True,
    )
    result: dict = {"ref": ref, "head": head_sha, "sf_dir": sf_dir,
                    "n_passes": N_PASSES,
                    "passes": [], "medians": {}, "ratio_head_over_ref": {}}
    try:
        for cpus in (32, 8):
            for i in range(N_PASSES):
                for label, tree in (("ref", wt), ("head", wt_head)):
                    la = loadavg()
                    t = run_tree(tree, sf_dir, names, cpus)
                    rec = {"cpus": cpus, "pass": i, "tree": label,
                           "loadavg": la, "queries": t,
                           "headline13": round(sum(t.values()), 3)}
                    result["passes"].append(rec)
                    print(f"# cpus={cpus} pass={i} {label}: "
                          f"headline13={rec['headline13']} load={la}",
                          file=sys.stderr, flush=True)
    finally:
        for w in (wt, wt_head):
            subprocess.run(["git", "-C", REPO, "worktree", "remove", "--force", w],
                           check=False, capture_output=True)
        subprocess.run(["git", "-C", REPO, "worktree", "prune"],
                       check=False, capture_output=True)

    for cpus in (32, 8):
        for label in ("ref", "head"):
            sel = [p for p in result["passes"]
                   if p["cpus"] == cpus and p["tree"] == label]
            med = {q: round(statistics.median([p["queries"][q] for p in sel]), 3)
                   for q in names if all(q in p["queries"] for p in sel)}
            result["medians"][f"{label}@{cpus}c"] = {
                "queries": med, "headline13": round(sum(med.values()), 3),
            }
        r = result["medians"][f"ref@{cpus}c"]["queries"]
        h = result["medians"][f"head@{cpus}c"]["queries"]
        result["ratio_head_over_ref"][f"{cpus}c"] = {
            "per_query": {q: round(h[q] / r[q], 3) for q in r if r[q] > 0},
            "headline13": round(
                result["medians"][f"head@{cpus}c"]["headline13"]
                / result["medians"][f"ref@{cpus}c"]["headline13"], 4),
            "median_per_query": round(statistics.median(
                [h[q] / r[q] for q in r if r[q] > 0]), 4),
        }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
