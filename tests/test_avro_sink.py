"""True Avro container-file sink (sources/avro_sink.py).

Reference parity: DataFileWriter terminal sink (Main.scala:205-215).
These tests pin the container format itself (magic bytes, embedded
writer schema), the nullable-union mapping, and a typed round trip —
independent of the DuckDB oracle on sink_avro.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from proto_to_avro_ql_spark.sources.avro_sink import (
    avro_schema_json,
    read_avro_file,
    write_avro_file,
)
from proto_to_avro_ql_spark.sources.io import read_table


class TestAvroSink:
    def test_container_magic_and_schema(self, spark, sf_dir):
        n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        path = os.path.join(tempfile.mkdtemp(), "n.avro")
        count = write_avro_file(n, path, name="Nation")
        assert count == n.count()
        with open(path, "rb") as f:
            head = f.read(512)
        assert head[:4] == b"Obj\x01"  # Avro OCF magic
        assert b"avro.schema" in head
        assert b"Nation" in head

    def test_round_trip_types_and_nulls(self, spark, sf_dir):
        schema = T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("name", T.StringType(), True),
                T.StructField("score", T.DoubleType(), True),
                T.StructField("flag", T.BooleanType(), True),
                T.StructField("day", T.DateType(), True),
            ]
        )
        rows = [
            Row(id=1, name="a", score=1.5, flag=True, day=dt.date(2024, 1, 15)),
            Row(id=2, name=None, score=None, flag=None, day=None),
        ]
        df = spark.createDataFrame(rows, schema)
        path = os.path.join(tempfile.mkdtemp(), "t.avro")
        write_avro_file(df, path)
        back = read_avro_file(spark, path, schema)
        got = {r["id"]: r for r in back.collect()}
        assert got[1]["name"] == "a" and got[1]["score"] == 1.5
        assert got[1]["day"] == dt.date(2024, 1, 15)
        assert got[2]["name"] is None and got[2]["flag"] is None

    def test_nullable_fields_become_unions(self, spark):
        schema = T.StructType(
            [
                T.StructField("a", T.LongType(), False),
                T.StructField("b", T.StringType(), True),
            ]
        )
        avro = json.loads(avro_schema_json(schema))
        by_name = {f["name"]: f for f in avro["fields"]}
        assert by_name["a"]["type"] == "long"
        assert by_name["b"]["type"] == ["null", "string"]
        assert by_name["b"]["default"] is None

    def test_max_rows_guard(self, spark, sf_dir):
        lineitem = read_table(spark, sf_dir, "lineitem").select("l_orderkey")
        path = os.path.join(tempfile.mkdtemp(), "big.avro")
        with pytest.raises(ValueError, match="report sink"):
            write_avro_file(lineitem, path, max_rows=10)

    def test_flagship_report_to_avro(self, spark, sf_dir):
        """The reference's actual flow: translated report -> Avro file."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        rep = QUERIES["flagship_report"](spark, sf_dir)
        path = os.path.join(tempfile.mkdtemp(), "report.avro")
        count = write_avro_file(rep, path, name="CampaignReport")
        back = read_avro_file(spark, path, rep.schema)
        assert back.count() == count == rep.count()
        a = rep.orderBy("segments_date", "campaign_status").collect()
        b = back.orderBy("segments_date", "campaign_status").collect()
        assert a == b

    def test_two_nullable_struct_columns_round_trip(self, spark):
        """Record names derive from field paths, so sibling nested
        structs don't collide ('Can't redefine: Nested'), and union
        branch names match the path-derived record names."""
        schema = T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField(
                    "a",
                    T.StructType([T.StructField("x", T.LongType(), True)]),
                    True,
                ),
                T.StructField(
                    "b",
                    T.StructType([T.StructField("y", T.StringType(), True)]),
                    True,
                ),
            ]
        )
        df = spark.createDataFrame(
            [Row(id=1, a=Row(x=7), b=Row(y="hi")), Row(id=2, a=None, b=None)],
            schema,
        )
        path = os.path.join(tempfile.mkdtemp(), "nested.avro")
        assert write_avro_file(df, path) == 2
        with open(path, "rb") as f:
            assert f.read(4) == b"Obj\x01"
