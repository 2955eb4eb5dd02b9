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
    audit columns + token counts for downstream budgeting."""
    h = F.sha2(TX.normalize_text(F.col("text")), 256)
    w = Window.partitionBy("text_hash").orderBy(F.asc("doc_id"))
    deduped = (
        docs.select("doc_id", "text", h.alias("text_hash"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    scored = deduped.select(
        "doc_id",
        TX.quality_score(F.col("text")).alias("quality"),
        TX.lang_id(F.col("text")).alias("lang_pred"),
        TX.token_count_ws(F.col("text")).alias("n_tokens"),
    )
    return scored.where(
        (F.col("quality") >= min_quality) & F.col("lang_pred").isin(*langs)
    )


def corpus_stats(clean: DataFrame) -> DataFrame:
    """Budget summary over the cleaned corpus."""
    return clean.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
    )
