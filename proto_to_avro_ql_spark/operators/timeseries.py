"""Time-series repair operators: forward-fill imputation and
fixed-grid resampling (feature-pipeline staples the reference's
row-at-a-time translator cannot express — they need ordered,
cross-row context).

Scale design:
- Forward-fill is ONE window shuffle keyed by the entity
  (``last(..., ignorenulls=True)`` over an unbounded-preceding row
  frame — Spark evaluates it incrementally, O(1) memory per row, no
  per-row lookback scan).
- Resampling builds each entity's dense grid with ``sequence`` +
  ``explode`` off a per-entity min/max aggregate — grid size is
  (span / step) per entity, generated distributed, never on the
  driver — then left-joins the sparse aggregates back on
  (entity, bucket). Both sides of that join are already bucketed by
  the same key, and AQE coalesces the tiny post-join partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from proto_to_avro_ql_spark.functions.stable import dec_sum


def forward_fill(
    df: DataFrame,
    value: Column,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> Column:
    """Last non-null ``value`` per ``key_col`` up to the current row
    (deterministic total order via ``order_cols``). Returns the filled
    column; rows before the first non-null stay null (the caller
    chooses a default)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.last(value, ignorenulls=True).over(w)


def resample_daily(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-entity dense daily grid from the entity's first to last
    observed day; days with no events report n_events=0 and a null sum
    (COUNT/SUM outer-join semantics — the classic gap-filling shape).

    Output: key, day (ISO string), n_events, sum_value.
    """
    day = F.date_trunc("day", F.col(ts_col))
    sparse = (
        events.groupBy(F.col(key_col), day.alias("_day"))
        .agg(
            F.count("*").alias("n_events"),
            dec_sum(value_col, 4).alias("sum_value"),
        )
    )
    spans = events.groupBy(key_col).agg(
        F.date_trunc("day", F.min(ts_col)).alias("_d0"),
        F.date_trunc("day", F.max(ts_col)).alias("_d1"),
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence("_d0", "_d1", F.expr("interval 1 day"))
        ).alias("_day"),
    )
    return (
        grid.join(sparse, [key_col, "_day"], "left")
        .select(
            key_col,
            F.date_format("_day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.col("sum_value"),
        )
    )
