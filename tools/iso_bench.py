"""Isolate individual queries: noop-sink timing + explain('formatted').

Round-12 optimization harness (guide §1.4/§1.5): for each named query,
run N cold passes (clearCache before each) timed against the built-in
noop sink — which materializes EVERY column of every row, so the
number is the computation, not the sink or count()'s column pruning —
and optionally dump the formatted physical plan to a file.

Usage:
    python tools/iso_bench.py q1 q2 ...            # time with noop sink
    python tools/iso_bench.py --plans DIR SUFFIX q1 q2 ...   # also dump
        DIR/<q>_<SUFFIX>.txt explain("formatted")
    env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
         SPARK_GRAFT_CPUS, ISO_RUNS (default 3)

Prints one line per query: name, median, passes. Purely a diagnostic
tool — bench.py remains the driver-contract artifact.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    plans_dir = suffix = None
    if args and args[0] == "--plans":
        plans_dir, suffix = args[1], args[2]
        args = args[3:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("ISO_RUNS", "3"))

    from proto_to_avro_ql_spark.entry_queries import QUERIES
    from proto_to_avro_ql_spark.session import get_spark

    spark = get_spark("iso_bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"{name}: NOT REGISTERED")
            continue
        if plans_dir and suffix:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
            spark.catalog.clearCache()
        passes = []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"iso:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            passes.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: {round(statistics.median(passes), 3)}s median of "
            f"{[round(p, 3) for p in passes]}"
        )


if __name__ == "__main__":
    main()
