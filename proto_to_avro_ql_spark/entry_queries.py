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
