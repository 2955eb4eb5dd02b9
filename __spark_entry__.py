"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented SURVEY.md §2 operator ID to a (spark, sf_dir) →
DataFrame callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL.
Columns are aliased identically on both sides; float aggregates are
rounded on both sides so the driver's value hash is bit-stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from proto_to_avro_ql_spark.entry_queries import ORACLES, QUERIES
from proto_to_avro_ql_spark.operators.reports import flagship_report


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
