"""Local driver-simulation: run each queries() entry on Spark and its
oracle on DuckDB, compare row count, column names, and an
order-insensitive value hash. Used by tests and by `python -m
tests.oracle_check [sf_dir] [names...]` during development.
"""

from __future__ import annotations

import hashlib
import math
import sys
from typing import Iterable

import duckdb

from proto_to_avro_ql_spark.sources.io import TABLES


def _canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and integral floats
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def value_hash(cols: list[str], rows: Iterable[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    row_hashes = sorted(
        hashlib.sha256("|".join(_canon(r[i]) for i in order).encode()).hexdigest()
        for r in rows
    )
    return hashlib.sha256("\n".join(row_hashes).encode()).hexdigest()


def duckdb_run(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def compare(spark, sf_dir: str, name: str, query_fn, oracle: str | None):
    df = query_fn(spark, sf_dir)
    srows = [tuple(r) for r in df.collect()]
    scols = df.columns
    if oracle is None:
        return {"name": name, "mode": "rows-only", "rows": len(srows), "ok": True}
    dcols, drows = duckdb_run(sf_dir, oracle)
    ok_count = len(srows) == len(drows)
    ok_cols = sorted(scols) == sorted(dcols)
    sh = value_hash(scols, srows)
    dh = value_hash(dcols, drows)
    return {
        "name": name,
        "mode": "oracle",
        "rows": len(srows),
        "oracle_rows": len(drows),
        "count_match": ok_count,
        "cols_match": ok_cols,
        "spark_cols": scols,
        "duck_cols": dcols,
        "hash_match": sh == dh,
        "ok": ok_count and ok_cols and sh == dh,
    }


def main() -> None:
    from proto_to_avro_ql_spark.entry_queries import ORACLES, QUERIES
    from proto_to_avro_ql_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("oracle-check")
    failed = []
    for name in names:
        res = compare(spark, sf_dir, name, QUERIES[name], ORACLES.get(name))
        status = "OK " if res["ok"] else "FAIL"
        print(f"[{status}] {name}: {res}")
        if not res["ok"]:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed; failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
