"""Semantics of the CDC upsert merge (operators/merge.py)."""

from __future__ import annotations

import pytest

from proto_to_avro_ql_spark.operators.merge import upsert


@pytest.mark.usefixtures("spark")
def test_upsert_update_insert_delete(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, "B", False),   # update
            (4, "d", False),   # insert
            (3, "c", True),    # delete (tombstone)
        ],
        "k long, v string, _tomb boolean",
    )
    out = {r.k: r.v for r in upsert(base, changes, ["k"], tombstone_col="_tomb").collect()}
    assert out == {1: "a", 2: "B", 4: "d"}


@pytest.mark.usefixtures("spark")
def test_upsert_without_tombstones_is_latest_wins(spark):
    base = spark.createDataFrame([(1, "old")], "k long, v string")
    changes = spark.createDataFrame([(1, "new")], "k long, v string")
    out = upsert(base, changes, ["k"]).collect()
    assert len(out) == 1 and out[0].v == "new"


@pytest.mark.usefixtures("spark")
def test_upsert_is_one_shuffle_no_join(spark):
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame([(2, "b")], "k long, v string")
    plan = upsert(base, changes, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


class TestCompaction:
    def test_file_count_drops_and_content_preserved(self, spark, sf_dir, tmp_path):
        from proto_to_avro_ql_spark.operators.merge import compact_small_files
        from proto_to_avro_ql_spark.sources.io import read_table

        ev = read_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        compacted, before, after = compact_small_files(
            spark, ev, str(tmp_path / "frag"), partition_col="event_type"
        )
        n_types = ev.select("event_type").distinct().count()
        assert before > n_types * 4  # fragmented: many shards per partition
        assert after <= n_types      # compacted: ~one file per partition
        # content byte-preserved (partition column moves to the end on
        # read-back — realign before the positional exceptAll compare)
        cols = ["event_id", "user_id", "event_type", "value"]
        c, e = compacted.select(*cols), ev.select(*cols)
        assert c.count() == e.count()
        assert c.exceptAll(e).count() == 0 and e.exceptAll(c).count() == 0
