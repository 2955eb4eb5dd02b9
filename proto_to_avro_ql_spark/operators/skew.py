"""Skewed-join mitigation: salt-replicate join (SURVEY.md §2.9 scale
strategy; companion to the salted aggregation in entry_registry).

A shuffle join on a skewed key sends every row of the hot key to ONE
reducer. The classic fix when the build side is small-but-not-tiny (too
big to broadcast outright, small enough to replicate N×): append a
random-ish salt in [0, N) to the fact side's key, replicate the dim
side N times (one copy per salt), and join on (key, salt) — the hot
key's rows now spread over N reducers. The result is EXACTLY the plain
join's result, which is what the oracle verifies.

AQE's skew-join handling does this adaptively for sort-merge joins;
the explicit form matters when you need it deterministic (stable task
sizes for SLAs) or on engines/paths AQE doesn't cover. Salt here is
derived from a row hash, not rand(): reproducible across retries —
a rand() salt breaks task retry determinism and the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    fact_salt_col: str | None = None,
) -> DataFrame:
    """Inner join ``fact ⋈ dim`` on ``key``, salted ``salt_buckets``
    ways. Output columns = fact columns + dim columns (minus the
    duplicate key). ``fact_salt_col`` defaults to a deterministic hash
    of the fact row's key + a tiebreaker column list if provided."""
    salt = (
        F.pmod(F.xxhash64(*fact.columns), F.lit(salt_buckets))
        if fact_salt_col is None
        else F.pmod(F.col(fact_salt_col), F.lit(salt_buckets))
    )
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return f.join(d, [key, "_salt"]).drop("_salt")
