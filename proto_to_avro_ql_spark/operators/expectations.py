"""Data-quality expectation checks (validation-report operator).

The reference validates at compile time (unknown fields, empty
structs — ProtoToAvroMappingCompiler semantics, see
plans/compile.py); this operator is the RUNTIME counterpart a lake
pipeline needs: declarative row-level constraints evaluated in bulk,
reported as one row per rule with violation counts.

Scale design: every column rule over a table is folded into ONE
conditional aggregation pass (map-side partial sums over the scan —
adding a rule adds a codegen'd sum, not a pass), then unpivoted to
rule rows. Referential rules are LEFT ANTI joins that carry only the
key column through the shuffle; with a broadcastable parent they
never shuffle the child at all.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColumnRule:
    """A named violation predicate over a single table's rows."""

    name: str
    violation: Column  # boolean: True == row violates the rule


def check_column_rules(df: DataFrame, rules: list[ColumnRule]) -> DataFrame:
    """Evaluate all rules in one aggregation pass; returns one row per
    rule: (rule, n_rows, n_violations, violation_ratio)."""
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(r.violation.cast("long")).alias(f"_v{i}") for i, r in enumerate(rules)
    ]
    one = df.agg(*aggs)
    stack = ", ".join(f"'{r.name}', _v{i}" for i, r in enumerate(rules))
    return one.select(
        F.expr(f"stack({len(rules)}, {stack}) as (rule, n_violations)"),
        F.col("_n").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        F.coalesce(F.col("n_violations"), F.lit(0)).alias("n_violations"),
        F.when(F.col("n_rows") == 0, F.lit(0.0))
        .otherwise(
            F.round(F.coalesce(F.col("n_violations"), F.lit(0)) / F.col("n_rows"), 6)
        )
        .alias("violation_ratio"),
    )


def check_fk_rule(
    spark: SparkSession,
    name: str,
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """Referential check: child keys with no parent. Only the key
    columns participate; the anti join is broadcast when the parent
    key set fits (Catalyst decides — no hint, so fact-scale parents
    degrade to shuffle, never to driver OOM)."""
    n_rows = child.count()
    orphans = (
        child.select(F.col(child_key).alias("_k"))
        .join(parent.select(F.col(parent_key).alias("_k")), "_k", "left_anti")
        .count()
    )
    return spark.createDataFrame(
        [(name, n_rows, orphans, round(orphans / n_rows, 6) if n_rows else 0.0)],
        "rule string, n_rows long, n_violations long, violation_ratio double",
    )


def expectation_report(
    spark: SparkSession,
    column_checks: list[tuple[DataFrame, list[ColumnRule]]],
    fk_checks: list[tuple[str, DataFrame, str, DataFrame, str]] = (),
) -> DataFrame:
    """Union of all rule results (column rules batched per table)."""
    parts = [check_column_rules(df, rules) for df, rules in column_checks]
    parts += [
        check_fk_rule(spark, name, c, ck, p, pk) for name, c, ck, p, pk in fk_checks
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
