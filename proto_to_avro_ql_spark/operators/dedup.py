"""Deduplication operators for training-data pipelines (SURVEY.md §2.9).

Five tiers, all DataFrame-native (no Python in the hot path):

- exact            — hash-groupBy on raw text
- near (normalize) — sha2 over canonicalized text
- n-gram Jaccard   — exact pairwise similarity with inverted-index
                     blocking + hot-shingle suppression
- MinHash LSH      — signature + banding for sub-quadratic candidate
                     generation, exact Jaccard verification
- SimHash          — 32-bit sign-aggregate fingerprint, pure expressions

Scale design (the point of this module):
- Nothing here is O(n²) on the full corpus. Pairwise work only happens
  inside blocking buckets (shared shingle / LSH band / simhash band).
- Hot buckets are the classic skew killer: ``max_df`` drops shingles
  occurring in more than N docs (a shingle shared by 1M docs generates
  5·10¹¹ pairs and zero information). Same idea as stop-word removal.
- groupBy aggregations all benefit from map-side partial aggregation;
  the shuffle key is the blocking key, never the document.
- MinHash signatures are computed in one narrow projection per doc
  (array expressions over the shingle array) — no explode, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from proto_to_avro_ql_spark.functions.text import normalize_text

# --- shingling -------------------------------------------------------------


def tokens(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text."""
    toks = tokens(col)
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


# --- exact & normalized ----------------------------------------------------


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One representative (min id) per exact text; keeps cluster size.
    Plan: single hash-aggregate shuffled on text hash."""
    return docs.groupBy(text_col).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups")
    )


def dedup_near_hash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-after-normalize: sha2(normalized text). The shuffle key is
    the 256-bit hash, so the wide text column never crosses the wire —
    at 100 TB that's the difference between shuffling 100 TB and ~3 TB."""
    h = F.sha2(normalize_text(F.col(text_col)), 256).alias("text_hash")
    return (
        docs.select(F.col(id_col), h)
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


# --- exact n-gram Jaccard with blocking ------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = 100,
) -> DataFrame:
    """Exact pairwise Jaccard over n-gram shingle sets, inverted-index
    blocked: a pair is only compared if it shares ≥1 (non-hot) shingle.

    Hot shingles (doc frequency > max_df) are suppressed before the
    self-join — the skew/quadratic-blowup control.
    """
    sh = docs.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh")
    ).select("id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))

    hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") > max_df)
    cold = sh.join(hot, "shingle", "left_anti")

    a = cold.select(F.col("shingle"), F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    b = cold.select(F.col("shingle"), F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    pairs = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        pairs.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# --- MinHash LSH -----------------------------------------------------------


def minhash_signature(sh: Column, num_hashes: int = 32) -> Column:
    """MinHash signature as an array<long>: for seed k, min over shingles
    of xxhash64(k, shingle). One narrow projection, no shuffle."""
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s, k=k: F.xxhash64(F.lit(k), s)))
            for k in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact Jaccard verify.

    rows-per-band r = num_hashes/bands; candidate pairs collide on the
    hash of at least one band. Exact verification joins shingle sets
    back in, so false positives cost time, never correctness.
    """
    r = num_hashes // bands
    base = docs.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), n).alias("sh"),
    ).select("id", "sh", minhash_signature(F.col("sh"), num_hashes).alias("sig"))

    banded = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.col("sig")[b * r + i] for i in range(r)]).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")

    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bh"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )

    sa = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified


# --- SimHash ---------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(col: Column, bits: int = SIMHASH_BITS) -> Column:
    """Sign-aggregated token-hash fingerprint as a long, computed with a
    single F.aggregate over the token array (per-row, no shuffle)."""
    toks = tokens(col)
    zero = F.array_repeat(F.lit(0), bits)
    counts = F.aggregate(
        toks,
        zero,
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) == 1,
                        F.lit(1),
                    ).otherwise(F.lit(-1))
                    for i in range(bits)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.when(F.get(counts, i) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.
    Blocking: split the fingerprint into ``bands`` bit-bands — any pair
    within hamming k < bands must collide on ≥1 band (pigeonhole)."""
    width = SIMHASH_BITS // bands
    sh = docs.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sh"))
    banded = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sh"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh", "bb.band", "bb.key")
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.bit_count(F.col("x.sh").bitwiseXOR(F.col("y.sh"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs
