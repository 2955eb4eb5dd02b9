"""Blocked fuzzy matching (entity resolution over string keys).

Approximate string joins are quadratic if done naively; the standard
scale recipe is block → cheap prefilter → exact distance:

1. Collapse to the DISTINCT value vocabulary first (with occurrence
   counts) — the distance computation then runs at vocabulary scale,
   not row scale (at 100 TB the vocab of a name-like column is orders
   of magnitude smaller than the table).
2. Equi-join on a blocking key (first token here) so only
   within-block pairs are generated.
3. Prune with the length-difference lower bound
   (levenshtein(a,b) >= |len(a)-len(b)|) BEFORE computing the real
   distance — a codegen'd comparison versus an O(n*m) DP.
4. Exact Levenshtein on the survivors.

Hot blocks are data-dependent: for heavy-tailed vocabularies add a
second blocking signal (length band, second token) the same way —
the join stays an equi-join on the composite key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_name_matches(
    df: DataFrame,
    name_col: str,
    min_dist: int = 1,
    max_dist: int = 3,
) -> DataFrame:
    """All distinct-value pairs (name_a < name_b) sharing a first-token
    block with ``min_dist <= levenshtein <= max_dist``. ``n_pairs`` is
    the number of underlying row pairs the match represents
    (cnt_a * cnt_b), so downstream resolution can weigh matches without
    ever materializing row-level pairs."""
    vocab = (
        df.groupBy(F.col(name_col).alias("name"))
        .agg(F.count("*").alias("cnt"))
        .withColumn("block", F.split("name", " ")[0])
        .withColumn("ln", F.length("name"))
    )
    a = vocab.select(
        F.col("name").alias("name_a"), F.col("cnt").alias("cnt_a"), "block",
        F.col("ln").alias("ln_a"),
    )
    b = vocab.select(
        F.col("name").alias("name_b"), F.col("cnt").alias("cnt_b"), "block",
        F.col("ln").alias("ln_b"),
    )
    return (
        a.join(b, "block")
        .where(F.col("name_a") < F.col("name_b"))
        .where(F.abs(F.col("ln_a") - F.col("ln_b")) <= max_dist)
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist").between(min_dist, max_dist))
        .select(
            "name_a",
            "name_b",
            "dist",
            (F.col("cnt_a") * F.col("cnt_b")).cast("long").alias("n_pairs"),
        )
    )
