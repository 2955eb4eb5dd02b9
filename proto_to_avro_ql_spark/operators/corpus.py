"""The composed training-corpus cleaning pipeline (SURVEY.md §2.9
capstone): normalize-dedup → quality filter → language filter → token
accounting, in one declarative plan.

This is the "what the engine is for" query: at 100 TB every stage is a
narrow projection or a hash-aggregate on a hash key — document text is
scanned once and never shuffled (the dedup shuffle key is sha2(text)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from proto_to_avro_ql_spark.functions import text as TX


def clean_corpus(
    docs: DataFrame,
    min_quality: float = 0.7,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """One representative per normalized-text hash (min doc_id), quality
    ≥ threshold, predicted language in ``langs``; returns doc ids with
    audit columns + token counts for downstream budgeting.

    Shuffle design: hash AND scores are computed in one narrow
    projection BEFORE the dedup aggregate, so the only bytes that ever
    cross the wire are (hash, doc_id, 3 score columns) — the text
    itself never shuffles. The earlier formulation deduped first (a
    sort-window partitioned on text_hash carrying the full text) and
    scored after; at 100 TB that shuffles the corpus. Scoring the
    duplicates too costs a little extra CPU in the scan stage and saves
    the shuffle — the right trade at any scale. ``min_by`` makes the
    representative pick a hash aggregate with map-side partials (no
    sort, hot hashes benign)."""
    from proto_to_avro_ql_spark.sources.io import ensure_min_parallelism

    scored = ensure_min_parallelism(docs).select(
        "doc_id",
        F.sha2(TX.normalize_text(F.col("text")), 256).alias("text_hash"),
        TX.quality_score(F.col("text")).alias("quality"),
        TX.lang_id(F.col("text")).alias("lang_pred"),
        TX.token_count_ws(F.col("text")).alias("n_tokens"),
    )
    # min_by carries a string in its aggregation buffer, so Spark plans
    # a SortAggregate (hash aggregation needs all-primitive mutable
    # buffers). That sort is per-partition over the narrow scored rows
    # — the claim that matters at 100 TB is the shuffle PAYLOAD (hash +
    # scores, never text) and partial aggregation (duplicates collapse
    # map-side), both of which hold; asserted in tests/test_plans.py.
    rep = (
        scored.groupBy("text_hash")
        .agg(
            F.min_by(
                F.struct("doc_id", "quality", "lang_pred", "n_tokens"), F.col("doc_id")
            ).alias("r")
        )
        .select("r.doc_id", "r.quality", "r.lang_pred", "r.n_tokens")
    )
    return rep.where(
        (F.col("quality") >= min_quality) & F.col("lang_pred").isin(*langs)
    )


def corpus_stats(clean: DataFrame) -> DataFrame:
    """Budget summary over the cleaned corpus."""
    return clean.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
    )
