"""Duplicate-cluster resolution: near-dup PAIRS → CLUSTERS (connected
components), and the composed corpus-cleaning pipeline.

The pair-producing operators (operators/dedup.py) emit edges; choosing
one representative per duplicate *cluster* requires the transitive
closure. ``connected_components`` is label propagation expressed as
iterative DataFrame joins (small-step Pregel): each node adopts the
min label among itself and its neighbors until fixpoint.

Scale notes: each iteration is one shuffle on the node id; iterations
needed = graph diameter (near-dup clusters are tiny and dense, so 3-5
rounds in practice; ``max_iter`` caps pathological chains). Labels are
longs, edges live in the shuffle — never the document text. For
planet-scale graphs you'd switch to the alternating large/small-star
algorithm; the API is the seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    max_iter: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """pairs(id_a, id_b) → (id, cluster_id) where cluster_id is the min
    node id reachable through the pair graph. Nodes present in pairs
    only; singletons are their own cluster by construction elsewhere."""
    edges = pairs.select(
        F.col("id_a").cast("long").alias("src"), F.col("id_b").cast("long").alias("dst")
    )
    # undirected: both directions
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = (
        sym.select("src").union(sym.select(F.col("dst").alias("src")))
        .distinct()
        .select(F.col("src").alias("id"), F.col("src").alias("label"))
    )
    sym = sym.persist()
    labels = labels.persist()
    for it in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
            .persist()
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            # truncate lineage: each round stacks joins on the previous
            # labels; past a few rounds the growing plan costs more to
            # analyze/schedule than the data costs to copy.
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("cluster_id"))


def dedup_keep_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every document that belongs to a near-dup cluster and is not
    the cluster's min-id representative."""
    clusters = connected_components(pairs)
    drop = clusters.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")
