"""Custom Python DataSource connector (Spark 4 DataSource API).

The reference's defining input is a CUSTOM SOURCE — a gRPC row stream
consumed lazily (Main.scala:60-66, 90-95) with a line-file replay
format beside it (Main.scala:106-120: one base64-encoded proto row per
line, decoded on read). Spark's idiomatic answer to "my input is a
protocol, not a file format" is the DataSource API; this module
implements the replay format as a REAL partitioned connector:

- ``partitions()`` returns one ``InputPartition`` per staged line
  file — the planner schedules them as independent tasks, so the read
  scales with file count exactly like any file-based source;
- ``read(partition)`` streams its file line by line, base64-decodes,
  and wire-decodes each proto row via the in-repo decoder
  (sources/protodec.py — the env has no protobuf jar/module, see
  src_proto_decode), yielding flat tuples lazily (an iterator, not a
  materialized list — the reference's lazy ``Iterator[GoogleAdsRow]``
  shape).

Worker-shipping (driver-parity-sim finding): the DataSource API runs
schema()/reader()/read() in PYTHON WORKERS that do not inherit the
driver's sys.path, so NOTHING here may import the package at call
time. All package references (the wire decoder, the event spec) are
resolved at module load on the driver and travel inside the by-value
pickle (this module and protodec are both registered self-contained —
see pickling.py).
"""

from __future__ import annotations

import base64
import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from proto_to_avro_ql_spark.sources.protodec import EVENT_SPEC, decode_message


class ProtoReplayDataSource(DataSource):
    """``spark.read.format("proto_replay").option("path", dir)`` over a
    directory of base64-proto line files."""

    @classmethod
    def name(cls) -> str:
        return "proto_replay"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> "ProtoReplayReader":
        return ProtoReplayReader(self.options["path"])


class ProtoReplayReader(DataSourceReader):
    def __init__(self, path: str) -> None:
        self._path = path

    def partitions(self):  # one task per staged line file
        files = sorted(glob.glob(os.path.join(self._path, "part-*")))
        if not files:
            raise FileNotFoundError(f"no replay part files under {self._path}")
        return [InputPartition(f) for f in files]

    def read(self, partition):
        for line in open(partition.value, "rb"):
            line = line.strip()
            if not line:
                continue
            msg = decode_message(EVENT_SPEC, base64.b64decode(line))
            meta = msg.get("meta") or {}
            yield (
                msg.get("event_id"),
                msg.get("user_id"),
                meta.get("event_type"),
                meta.get("value"),
            )


from proto_to_avro_ql_spark.pickling import register_self_contained  # noqa: E402

register_self_contained(__name__)
