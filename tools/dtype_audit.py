"""Strict Spark-vs-DuckDB result audit: compares pandas dtypes and
full-precision value reprs for every oracled ``queries()`` entry.

The driver's correctness gate materializes both sides through
pandas/arrow before hashing, so a DuckDB HUGEINT (``SUM(BIGINT)``)
that lands as float64 will hash-mismatch a Spark int64 column even
though the numeric values are equal.  ``tests/oracle_check.py``'s
canonicalizer used to normalize integral floats and hide that class
of bug; this tool is deliberately stricter than the driver:

- column-by-column pandas dtype comparison (int64 vs float64 flagged)
- full-precision ``repr`` value comparison after sorting columns by
  name and rows by canonical string (no rounding, no int-float
  coercion)

Usage: python -m tools.dtype_audit [sf_dir] [names...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from proto_to_avro_ql_spark.sources.io import TABLES


def strict_canon(v) -> str:
    """Full-precision canonical string: int 5 and float 5.0 DIFFER."""
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision; -0.0 stays distinct
    if isinstance(v, bytes):
        return "b:" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(strict_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{strict_canon(v[k])}" for k in sorted(v)) + "}"
    return f"{type(v).__name__}:{v}"


def to_canon_rows(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append("|".join(strict_canon(_unbox(v)) for v in row))
    return sorted(out)


def _unbox(v):
    """numpy scalar -> python scalar so int64 prints as int, etc."""
    if hasattr(v, "item") and not isinstance(v, (bytes, str)):
        try:
            return v.item()
        except (ValueError, AttributeError):
            return v
    return v


def audit_one(spark, con, sf_dir: str, name: str, fn, sql: str) -> dict:
    sdf = fn(spark, sf_dir).toPandas()
    odf = con.execute(sql).fetchdf()
    res = {"name": name, "ok": True, "problems": []}
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        res["ok"] = False
        res["problems"].append(f"cols: spark={scols} oracle={ocols}")
        return res
    for c in scols:
        st, ot = str(sdf[c].dtype), str(odf[c].dtype)
        if st != ot:
            res["ok"] = False
            res["problems"].append(f"dtype[{c}]: spark={st} oracle={ot}")
    if len(sdf) != len(odf):
        res["ok"] = False
        res["problems"].append(f"rows: spark={len(sdf)} oracle={len(odf)}")
        return res
    srows, orows = to_canon_rows(sdf), to_canon_rows(odf)
    ndiff = sum(1 for a, b in zip(srows, orows) if a != b)
    if ndiff:
        res["ok"] = False
        first = next((a, b) for a, b in zip(srows, orows) if a != b)
        res["problems"].append(f"values: {ndiff} differing rows; first: spark={first[0][:200]!r} oracle={first[1][:200]!r}")
    return res


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import importlib

    mod = importlib.import_module("__spark_entry__")
    qs, oracles = mod.queries(), mod.oracle_sql()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            res = audit_one(spark, con, sf_dir, name, fn, oracles[name])
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        if res["ok"]:
            print(f"ok   {name}")
        else:
            bad += 1
            print(f"FAIL {name}")
            for p in res["problems"]:
                print(f"     {p}")
    spark.stop()
    print(f"\n{bad} failing")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
