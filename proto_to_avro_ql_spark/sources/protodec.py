"""Protobuf binary ingestion — the reference's defining input.

The reference consumes a compiled proto ``Descriptor`` plus binary
``GeneratedMessageV3`` messages and translates them field-by-field
(reference: ProtoToAvroTranslator.scala:26-33 ``translate(proto)``;
Main.scala:195-198 consumes a gRPC row stream). Spark's first-class
answer is ``pyspark.sql.protobuf.functions.from_protobuf``, but in this
environment it is unusable: the spark-protobuf jar is not shipped
(probed 2026-08-13 — calling it raises
``[PROTOBUF_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE]``) and no python
``google.protobuf`` module exists to compile descriptors.

So this module implements the protobuf WIRE FORMAT directly — it is a
small, stable, public spec (varint / zigzag / fixed64 / fixed32 /
length-delimited): https://protobuf.dev/programming-guides/encoding/.

- :class:`MessageSpec` / :class:`FieldSpec` — the ``Descriptor`` analog
  (field number → name/type/label), declared in code the way the
  reference receives a compiled descriptor.
- :func:`encode_message` — dict → canonical proto bytes (fixtures and
  round-trip tests; conformance pinned against the spec's published
  examples in pytest, e.g. ``{1: 150} == 08 96 01``).
- :func:`decode_message` — proto bytes → dict with proto3 semantics:
  missing scalars take their type default, missing sub-messages are
  null, repeated fields accept both packed and unpacked encodings,
  later occurrences of a scalar field win.
- :func:`decode_proto` — the Spark operator: ``mapInPandas`` over the
  binary column, one Arrow batch at a time, emitting a typed nested
  struct per row. Python-side decode is the sanctioned slow path for a
  genuinely opaque codec (same stance as operators/multimodal.py); on a
  cluster with the spark-protobuf jar, swap this call for
  ``from_protobuf(col, msg, binaryDescriptorSet=...)`` — the schema
  contract (spec ↔ StructType) is identical by construction.

Scale notes: decode is embarrassingly parallel (per-row, no shuffle);
the binary column never shuffles — decode immediately after the scan,
then project/prune. Arrow moves bytes JVM→Python in batches.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# --- descriptor analog -----------------------------------------------------

_SCALAR_SPARK_TYPES = {
    "int64": T.LongType(),
    "int32": T.IntegerType(),
    "sint64": T.LongType(),
    "bool": T.BooleanType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}

_SCALAR_DEFAULTS = {
    "int64": 0,
    "int32": 0,
    "sint64": 0,
    "bool": False,
    "double": 0.0,
    "float": 0.0,
    "string": "",
    "bytes": b"",
}

# wire types per kind
_WIRE_VARINT, _WIRE_FIXED64, _WIRE_LEN, _WIRE_FIXED32 = 0, 1, 2, 5
_KIND_WIRE = {
    "int64": _WIRE_VARINT,
    "int32": _WIRE_VARINT,
    "sint64": _WIRE_VARINT,
    "bool": _WIRE_VARINT,
    "double": _WIRE_FIXED64,
    "float": _WIRE_FIXED32,
    "string": _WIRE_LEN,
    "bytes": _WIRE_LEN,
    "message": _WIRE_LEN,
}


@dataclass(frozen=True)
class FieldSpec:
    number: int
    name: str
    kind: str  # one of _SCALAR_SPARK_TYPES keys, or "message"
    repeated: bool = False
    message: "MessageSpec | None" = None

    def __post_init__(self) -> None:
        if self.kind == "message":
            assert self.message is not None, f"{self.name}: message spec required"
        else:
            assert self.kind in _SCALAR_SPARK_TYPES, f"unknown kind {self.kind}"


@dataclass(frozen=True)
class MessageSpec:
    name: str
    fields: tuple[FieldSpec, ...] = field(default_factory=tuple)

    def spark_schema(self) -> T.StructType:
        out = []
        for f in self.fields:
            if f.kind == "message":
                dt: T.DataType = f.message.spark_schema()
            else:
                dt = _SCALAR_SPARK_TYPES[f.kind]
            if f.repeated:
                dt = T.ArrayType(dt, containsNull=False)
            out.append(T.StructField(f.name, dt, nullable=True))
        return T.StructType(out)

    def by_number(self) -> dict[int, FieldSpec]:
        return {f.number: f for f in self.fields}

    def project(self, names: "tuple[str, ...] | list[str]") -> "MessageSpec":
        """Column pruning for the opaque path: a spec restricted to
        ``names`` decodes ONLY those fields — everything else is
        skipped at the wire level (cheap varint hops, no value
        materialization), the per-row analog of parquet ReadSchema
        pruning. Order follows the original declaration."""
        keep = set(names)
        unknown = keep - {f.name for f in self.fields}
        assert not unknown, f"unknown fields {sorted(unknown)} on {self.name}"
        return MessageSpec(
            self.name, tuple(f for f in self.fields if f.name in keep)
        )


# --- wire primitives -------------------------------------------------------


def _write_varint(buf: bytearray, v: int) -> None:
    v &= (1 << 64) - 1  # two's-complement for negative int64 (10-byte form)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")
    return result, pos


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _to_i64(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def _to_i32(v: int) -> int:
    v &= (1 << 32) - 1
    return v - (1 << 32) if v >= (1 << 31) else v


# --- encode (fixtures / tests) --------------------------------------------


def _encode_scalar(buf: bytearray, f: FieldSpec, v: Any) -> None:
    _write_varint(buf, (f.number << 3) | _KIND_WIRE[f.kind])
    if f.kind in ("int64", "int32"):
        _write_varint(buf, int(v))
    elif f.kind == "sint64":
        _write_varint(buf, _zigzag(int(v)))
    elif f.kind == "bool":
        _write_varint(buf, 1 if v else 0)
    elif f.kind == "double":
        buf.extend(struct.pack("<d", float(v)))
    elif f.kind == "float":
        buf.extend(struct.pack("<f", float(v)))
    elif f.kind == "string":
        enc = str(v).encode("utf-8")
        _write_varint(buf, len(enc))
        buf.extend(enc)
    elif f.kind == "bytes":
        _write_varint(buf, len(v))
        buf.extend(v)
    elif f.kind == "message":
        sub = encode_message(f.message, v)
        _write_varint(buf, len(sub))
        buf.extend(sub)


def encode_message(spec: MessageSpec, values: dict[str, Any]) -> bytes:
    """Canonical encoding: fields in declaration order; proto3 scalar
    defaults are skipped (the decoder restores them); None skipped."""
    buf = bytearray()
    for f in spec.fields:
        v = values.get(f.name)
        if v is None:
            continue
        if f.repeated:
            for item in v:
                _encode_scalar(buf, f, item)
        else:
            if f.kind != "message" and v == _SCALAR_DEFAULTS[f.kind]:
                continue
            _encode_scalar(buf, f, v)
    return bytes(buf)


# --- decode ----------------------------------------------------------------


def _skip(data: bytes, pos: int, wire: int) -> int:
    if wire == _WIRE_VARINT:
        _, pos = _read_varint(data, pos)
    elif wire == _WIRE_FIXED64:
        pos += 8
    elif wire == _WIRE_FIXED32:
        pos += 4
    elif wire == _WIRE_LEN:
        n, pos = _read_varint(data, pos)
        pos += n
    else:
        raise ValueError(f"unsupported wire type {wire}")
    if pos > len(data):
        raise ValueError("truncated field")
    return pos


def _decode_value(f: FieldSpec, data: bytes, pos: int, wire: int) -> tuple[Any, int]:
    if wire != _KIND_WIRE[f.kind]:
        raise ValueError(f"wire type {wire} does not match {f.kind} field {f.name}")
    if f.kind == "message":
        n, pos = _read_varint(data, pos)
        if pos + n > len(data):
            raise ValueError(f"length-delimited field {f.name} past end of buffer")
        return decode_message(f.message, data[pos : pos + n]), pos + n
    if wire == _WIRE_VARINT:
        raw, pos = _read_varint(data, pos)
        if f.kind == "sint64":
            return _unzigzag(raw), pos
        if f.kind == "bool":
            return bool(raw), pos
        if f.kind == "int32":
            return _to_i32(raw), pos
        return _to_i64(raw), pos
    if wire == _WIRE_FIXED64:
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if wire == _WIRE_FIXED32:
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if wire == _WIRE_LEN:
        n, pos = _read_varint(data, pos)
        if pos + n > len(data):
            raise ValueError(f"length-delimited field {f.name} past end of buffer")
        raw_b = data[pos : pos + n]
        if f.kind == "string":
            return raw_b.decode("utf-8"), pos + n
        return bytes(raw_b), pos + n
    raise ValueError(f"wire type {wire} for {f.name}")


def decode_message(spec: MessageSpec, data: bytes) -> dict[str, Any]:
    """proto3 semantics: unknown fields skipped, missing scalars get
    type defaults, missing sub-messages are None, last scalar wins,
    repeated scalars accept packed (length-delimited) encoding."""
    nums = spec.by_number()
    out: dict[str, Any] = {}
    for f in spec.fields:
        if f.repeated:
            out[f.name] = []
        elif f.kind == "message":
            out[f.name] = None
        else:
            out[f.name] = _SCALAR_DEFAULTS[f.kind]
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        number, wire = key >> 3, key & 7
        f = nums.get(number)
        if f is None:
            pos = _skip(data, pos, wire)  # unknown field: skip, don't fail
            continue
        if f.repeated and wire == _WIRE_LEN and _KIND_WIRE[f.kind] != _WIRE_LEN:
            n, pos = _read_varint(data, pos)  # packed repeated scalars
            end = pos + n
            while pos < end:
                v, pos = _decode_value(f, data, pos, _KIND_WIRE[f.kind])
                out[f.name].append(v)
            continue
        v, pos = _decode_value(f, data, pos, wire)
        if f.repeated:
            out[f.name].append(v)
        else:
            out[f.name] = v
    return out


# --- Spark operator --------------------------------------------------------


def decode_proto(
    df: DataFrame,
    binary_col: str,
    spec: MessageSpec,
    out_col: str = "msg",
    keep_cols: tuple[str, ...] = (),
    on_error: str = "fail",
) -> DataFrame:
    """Decode a binary proto column into a typed nested struct.

    One ``mapInPandas`` pass: Arrow batches of bytes in, struct rows
    out — per-row work, no shuffle, binary payload pruned immediately
    after decode. Swap for ``from_protobuf`` where the jar exists.

    ``on_error``: ``"fail"`` (default) raises on a malformed payload —
    the strict mode you want while developing a schema; ``"null"``
    yields a null struct instead (the PERMISSIVE-mode analog of Spark's
    JSON/CSV readers) so one corrupt record in 100 TB doesn't kill the
    job — filter ``{out_col} IS NULL`` into a quarantine sink.
    """
    assert on_error in ("fail", "null"), on_error
    out_schema = T.StructType(
        [df.schema[c] for c in keep_cols]
        + [T.StructField(out_col, spec.spark_schema(), nullable=True)]
    )

    def decode_one(b):
        if b is None:
            return None
        if on_error == "fail":
            return decode_message(spec, bytes(b))
        try:
            return decode_message(spec, bytes(b))
        except (ValueError, UnicodeDecodeError, struct.error):
            return None

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            data = {c: pdf[c] for c in keep_cols}
            data[out_col] = pd.Series(
                [decode_one(b) for b in pdf[binary_col]], dtype="object"
            )
            yield pd.DataFrame(data)

    return df.mapInPandas(batches, schema=out_schema)


# Descriptor analog for an event message with a nested sub-message —
# the shape the reference receives as a compiled proto Descriptor
# (canonical home: this module ships by value to workers, so anything
# that executes in a Python worker — decode paths, the DataSource
# connector — can reference these without a worker-side package import).
EVENT_META_SPEC = MessageSpec(
    "EventMeta",
    (FieldSpec(1, "event_type", "string"), FieldSpec(2, "value", "double")),
)
EVENT_SPEC = MessageSpec(
    "Event",
    (
        FieldSpec(1, "event_id", "int64"),
        FieldSpec(2, "user_id", "int64"),
        FieldSpec(3, "meta", "message", message=EVENT_META_SPEC),
    ),
)


# Executor workers don't share the driver's sys.path patch — ship this
# module's worker-executed functions by value (see pickling.py).
from proto_to_avro_ql_spark.pickling import register_self_contained  # noqa: E402

register_self_contained(__name__)
