from __future__ import annotations

from proto_to_avro_ql_spark.operators.clustering import (
    connected_components,
    dedup_keep_representatives,
)


class TestConnectedComponents:
    def test_chain_collapses_to_one_cluster(self, spark):
        # 1-2, 2-3, 3-4 chain plus isolated pair 10-11
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
        )
        out = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
        assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_keep_representatives(self, spark):
        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(1, 6)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
        kept = sorted(
            r.doc_id for r in dedup_keep_representatives(docs, pairs).collect()
        )
        assert kept == [1, 4, 5]  # 2,3 dropped; 1 is the representative
