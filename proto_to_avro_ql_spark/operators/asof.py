"""As-of (time-travel) join — an operator Spark's DataFrame API lacks
natively, expressed as the scalable union + window composition rather
than a range cross-join.

Semantics: for each left row, attach the most recent right row with the
same key and right.ts <= left.ts.

Naive implementations range-join (left ⋈ right on key AND right.ts <=
left.ts, then max) — quadratic per key. The union trick is linear: tag
both streams, union, sort per key by (ts, side-priority), and carry the
last-seen right payload forward with ``last(..., ignorenulls=True)``.
ONE shuffle on the key, O(1) state per row — this survives 100 TB where
the range join dies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_payload: tuple[str, ...] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + most-recent-at-or-before right payload per key.

    ``right`` rows sort before ``left`` rows at equal timestamps, so a
    right row with ts == left.ts is visible to it (ASOF >= semantics).
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in right_payload],
    )
    r = right.select(
        *[
            F.col(c) if c in (key, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_payload],
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "_side",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_payload
        ],
    )
    return filled.where(F.col("_side") == 1).drop("_side")
