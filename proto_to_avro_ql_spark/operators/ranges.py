"""Interval (range) join without the nested-loop trap.

A pure interval-containment join (no equi key) is planned by Spark as a
BroadcastNestedLoopJoin — O(events × intervals) comparisons, fine for a
handful of intervals, catastrophic when both sides are large. The
binned formulation turns it into an equi join: truncate event times to
fixed-width bins, explode each interval to the bins it covers, join on
the bin, then apply the exact containment predicate. Each (event,
interval) match is produced exactly once — an event lives in exactly
one bin — so no dedup pass is needed.

Scale: one shuffle on the bin key for each side; interval explosion
factor = interval_width / bin_width (pick bin ≈ median interval width).
Hot bins (many events in the same hour) are ordinary groupBy skew —
AQE skew handling / salting applies as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner-join rows of ``events`` to every interval containing their
    timestamp: start <= ts <= end (inclusive both ends)."""
    ev = events.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(ts_col)) / bin_seconds)
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds),
                F.floor(F.unix_timestamp(F.col(end_col)) / bin_seconds),
            )
        ),
    )
    return (
        ev.join(iv, "_bin")
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("_bin")
    )
