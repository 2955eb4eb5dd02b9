"""BM25 lexical search — the term-based complement to the embedding
similarity search (operators/simsearch.py) in a training-data pipeline
(corpus querying, contamination checks, targeted filtering).

Plan shape (all built-in expressions, no Python):
  tokenize/explode → doc lengths (hash agg) + term frequencies for the
  query terms only (hash agg after a pushed-down isin filter) →
  document frequencies (tiny: one row per query term, broadcast) →
  corpus stats (single row, broadcast) → per-(doc, term) score summed
  per doc → TakeOrderedAndProject top-k.

At 100 TB: the only large shuffles are the two hash aggregations keyed
on doc_id; the isin filter prunes the exploded stream to query terms
before the tf shuffle, so shuffle volume is O(matching tokens), not
O(corpus tokens). idf and corpus stats are broadcast single-digit-row
tables. For a standing search service you would stage `toks`/`dl` as a
bucketed table once and reuse across queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proto_to_avro_ql_spark.functions.text import normalize_text
from proto_to_avro_ql_spark.sources.io import ensure_min_parallelism


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """Top-k documents by BM25 score for ``query_terms``.

    Deterministic: output ordered by (rounded score desc, id asc);
    scores rounded to 6 decimals so the DuckDB oracle hash-matches.
    """
    toks = (
        ensure_min_parallelism(docs)
        .select(
            F.col(id_col),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("t"),
        )
        .where(F.col("t") != "")
        .persist()
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n"))
    tf = (
        toks.where(F.col("t").isin(*query_terms))
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("t").agg(F.count_distinct(F.col(id_col)).alias("dft"))

    idf = F.log((F.col("n") - F.col("dft") + 0.5) / (F.col("dft") + 0.5) + 1)
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dft), "t")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(top_k)
