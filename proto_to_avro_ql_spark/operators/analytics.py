"""Behavioral-analytics operators: ordered conversion funnel, cohort
retention, and robust (MAD) outlier detection.

These are the report shapes an events warehouse serves daily; the
reference's row-at-a-time translator cannot express them (they need
cross-row, ordered context). All plans shuffle on the entity or the
group key only and reuse the same partitioning across stages where
possible (user-keyed agg → user-keyed join lets Catalyst/AQE reuse
the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def conversion_funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches stage k iff an event of
    type stages[k] occurs AT OR AFTER the time they reached stage k-1
    (min-time semantics — the canonical product-analytics funnel).
    Returns ONE row: n_users plus one reached-count per stage.

    Plan: one user-keyed aggregation per stage; each later stage joins
    the previous stage's reach time back on the user key (same
    partitioning — the exchange is reused, not re-shuffled).
    """
    reach = None  # DataFrame[user, _t]: time the user reached the previous stage
    counts = []
    for i, stage in enumerate(stages):
        ev_s = events.where(F.col(type_col) == stage)
        if reach is None:
            cur = ev_s.groupBy(user_col).agg(F.min(ts_col).alias("_t"))
        else:
            cur = (
                ev_s.join(reach.withColumnRenamed("_t", "_prev"), user_col)
                .where(F.col(ts_col) >= F.col("_prev"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("_t"))
            )
        counts.append(cur.agg(F.count(F.lit(1)).alias(f"n_{stage}")))
        reach = cur
    out = events.agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    for c in counts:
        out = out.crossJoin(F.broadcast(c))  # each side is a single row
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen ISO week;
    for each (cohort_week, week_offset) the count of cohort users
    active that week. date_trunc('week') is ISO-Monday in both Spark
    and DuckDB, so offsets are exact multiples of 7 days.

    Plan: user-keyed first-seen aggregation, re-joined to the event
    stream on the user key, then one (cohort, offset) count-distinct.
    """
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("_cohort")
    )
    return (
        events.join(first, user_col)
        .select(
            F.col(user_col),
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(F.date_trunc("week", F.col(ts_col)), F.col("_cohort")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def mad_outliers(
    events: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    id_col: str = "event_id",
    k: float = 1.5,
) -> DataFrame:
    """Robust per-group outliers: |x - median| > k * MAD (median
    absolute deviation) — unlike z-scores, immune to the outliers
    themselves inflating the threshold.

    EXACT medians for oracle parity (Spark `median` == DuckDB
    `median`, both interpolated — parity pinned by agg_percentile).
    Exact grouped medians concentrate each group on one reducer; at
    lake scale swap in approx_percentile(0.5) (same plan, bounded
    memory) — the k·MAD contract is unchanged.
    """
    med = events.groupBy(group_col).agg(F.median(value_col).alias("_med"))
    with_med = events.join(F.broadcast(med), group_col)
    mad = with_med.groupBy(group_col).agg(
        F.median(F.abs(F.col(value_col) - F.col("_med"))).alias("_mad")
    )
    return (
        with_med.join(F.broadcast(mad), group_col)
        .where(F.abs(F.col(value_col) - F.col("_med")) > k * F.col("_mad"))
        .select(
            id_col,
            group_col,
            value_col,
            F.round(F.abs(F.col(value_col) - F.col("_med")), 6).alias("deviation"),
        )
    )
