"""Clean-session driver-parity simulation (the MANDATORY pre-round-close
check — see .claude/skills/verify/SKILL.md and ROADMAP round 2).

Reproduces the real driver's environment as closely as local mode can:

- runs from a FOREIGN working directory (/tmp), so nothing resolves via
  CWD-relative paths;
- builds a VANILLA SparkSession — ``local[8]``, default 200 shuffle
  partitions, none of session.get_spark's tuned confs — so any result
  that depends on our session tuning (partition counts, AQE settings)
  fails here first;
- sys.path-patches the repo exactly like ``__spark_entry__.py`` expects,
  then drives ``entry()`` plus the FIRST 50 ``queries()`` entries in
  driver-priority order against their DuckDB oracles at sf0.01.

This is the scenario that catches worker-shipped closures pickled BY
REFERENCE (executor workers do not inherit the driver's sys.path —
ModuleNotFoundError only here, never in in-repo runs; bit round 2 on
src_proto_decode/ext_multimodal) and partition-count-dependent results
(bit round 1 on the float-sum aggregates).

Usage: ``python tools/driver_sim.py [sf_dir] [n_window]``
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_window = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    os.chdir("/tmp")  # foreign CWD — like the real driver
    if REPO not in sys.path:
        sys.path.insert(0, REPO)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from proto_to_avro_ql_spark.entry_queries import ordered_query_names
    from tests.oracle_check import compare

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .getOrCreate()
    )  # deliberately NO tuned confs: vanilla 200 shuffle partitions
    spark.sparkContext.setLogLevel("ERROR")

    edf = entrymod.entry(spark)
    n = edf.count()
    assert n >= 0 and edf.columns, "entry() smoke failed"
    print(f"entry(): {n} rows, schema {edf.columns}")

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = ordered_query_names()[:n_window]
    failed, no_oracle = [], []
    for name in names:
        try:
            res = compare(spark, sf_dir, name, queries[name], oracles.get(name))
        except Exception as e:  # noqa: BLE001
            res = {"name": name, "ok": False, "err": f"{type(e).__name__}: {e}"}
        if res.get("mode") == "rows-only":
            no_oracle.append(name)
        status = "OK " if res["ok"] else "FAIL"
        print(f"[{status}] {name}" + ("" if res["ok"] else f": {res}"))
        if not res["ok"]:
            failed.append(name)
    print(
        f"\nwindow {len(names)}: {len(names) - len(failed)} passed; "
        f"failed: {failed}; no_oracle in window: {no_oracle}"
    )
    # no_oracle is only a FAILURE inside the driver's real 50-entry
    # window (a rows-only entry there wastes a verification slot —
    # ordering regression in entry_queries.ordered_query_names). On
    # full-registry runs (n_window > 50) the designed rows-only
    # entries are expected and flagged informationally above; r5/r6
    # close notes previously had to interpret around the exit code.
    no_oracle_in_driver_window = [n for n in no_oracle if names.index(n) < 50]
    sys.exit(1 if failed or no_oracle_in_driver_window else 0)


if __name__ == "__main__":
    main()
