"""Deterministic stratified sampling (training-data pipeline op).

``df.sampleBy`` is seeded RNG: the sample changes with partitioning and
engine version, which is unacceptable for reproducible training sets.
Here membership is a pure function of the row key — a content hash
bucketed 0..99 compared against the stratum's rate — so the sample is
stable across runs, engines (the DuckDB oracle computes the identical
bucket), partitionings, and cluster sizes. No RNG, no shuffle: the
filter is a narrow expression the scan can absorb.

Related: ``ext_data_split`` (entry_registry.py) does the same trick for
train/val/test assignment with global rates; this operator varies the
rate per stratum (e.g. downsample dominant event types, keep all rare
ones — the class-rebalancing primitive).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Deterministic bucket 0..buckets-1 from the md5 of the value's
    string form. md5 (not xxhash64) so the oracle is portable: DuckDB
    computes the same bucket via ('0x' || substr(md5(x),1,8))::BIGINT."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % buckets
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff hash_bucket(key) < rate[stratum] * 100.

    Rows whose stratum is not in ``rates`` are kept at ``default_rate``.
    Rates are interpreted at percent granularity (0.10 → buckets 0-9).
    """
    bucket = hash_bucket(F.col(key_col))
    keep = reduce(
        lambda acc, kv: acc.when(F.col(strata_col) == kv[0], bucket < int(kv[1] * 100)),
        rates.items(),
        F.when(F.lit(False), F.lit(False)),
    ).otherwise(bucket < int(default_rate * 100))
    return df.where(keep)


def temperature_sample(
    df: DataFrame,
    group_col: str = "lang",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    scale: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled group rebalancing — the data-mixing primitive
    of multilingual / multi-domain LLM corpora: resample so group g's
    share moves from p_g toward p_g^alpha (alpha = 1/T < 1 upweights
    rare groups relative to dominant ones).

    Sampling without replacement can only downsample, so
    ``P(keep | g) = min(1, q_g * N / n_g)`` where
    ``q_g = n_g^alpha / Σ_m n_m^alpha`` — the dominant groups shrink
    toward the target mix and groups at/below target keep everything.
    Membership is the portable md5 bucket of the row key vs a per-group
    integer threshold — no RNG (see module docstring).

    Cross-engine numeric hygiene (the round-1 float-sum lesson): the
    only multi-row reduction in the formula, Σ n_m^alpha, is summed as
    DECIMAL(38,6) of ``round(pow(n, alpha), 6)`` — associative, so the
    thresholds are partition-order independent; everything downstream
    is scalar IEEE arithmetic on identical operands in both engines.

    Scale shape: one groupBy producing |groups| rows, threshold algebra
    on that tiny relation, then a broadcast join back onto the fact —
    the filter itself is a narrow per-row expression. At 100 TB the
    group stats are a few hundred rows regardless of corpus size.
    """
    from pyspark.sql.functions import broadcast

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    weights = counts.select(
        group_col,
        "n",
        # alpha=0.5 → sqrt, which is IEEE-correctly-rounded in BOTH
        # engines (java.lang.Math.sqrt / C sqrt); generic pow() is only
        # ~1-ulp accurate and could differ cross-engine at a rounding
        # boundary.
        F.round(
            F.sqrt(F.col("n").cast("double"))
            if alpha == 0.5
            else F.pow(F.col("n").cast("double"), F.lit(float(alpha))),
            6,
        )
        .cast("decimal(38,6)")
        .alias("wt"),
    )
    # Totals as a window over the stats relation (|groups| rows), NOT
    # an agg + re-join: an agg branch would re-derive `weights` and
    # re-scan the corpus a second time. The unpartitioned window is a
    # single-partition exchange of |groups| rows — trivial at any
    # corpus size.
    w_all = Window.partitionBy()
    thresholds = weights.select(
        group_col,
        F.round(
            F.least(
                F.lit(1.0),
                (
                    F.col("wt").cast("double")
                    / F.sum("wt").over(w_all).cast("double")
                )
                * F.sum("n").over(w_all)
                / F.col("n"),
            )
            * scale
        )
        .cast("bigint")
        .alias("keep_thresh"),
    )
    return (
        df.join(broadcast(thresholds), group_col)
        .where(hash_bucket(F.col(key_col), scale) < F.col("keep_thresh"))
        .drop("keep_thresh")
    )
