"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented SURVEY.md §2 operator ID to a (spark, sf_dir) →
DataFrame callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL.
Columns are aliased identically on both sides; float aggregates are
rounded on both sides so the driver's value hash is bit-stable.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this file by path from any CWD; make the
# package resolvable regardless.
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from proto_to_avro_ql_spark.entry_queries import (  # noqa: E402
    ORACLES,
    QUERIES,
    ordered_query_names,
)
from proto_to_avro_ql_spark.operators.reports import flagship_report  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Priority order: flagship + SURVEY §2 contract IDs first, oracled
    # extensions next, rows-only last (the driver verifies a prefix).
    return {n: QUERIES[n] for n in ordered_query_names()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
