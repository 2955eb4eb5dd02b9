"""Wire-format conformance + Spark round-trip for sources/protodec.

The encoder and decoder are both in-repo, so the oracle's
decode(encode(x)) == x identity alone can't rule out a shared
misreading of the spec. These tests pin the BYTES against the worked
examples in the public protobuf encoding guide
(https://protobuf.dev/programming-guides/encoding/), then exercise
proto3 semantics (defaults, unknown fields, packed repeated, last-wins)
and the Spark mapInPandas round trip.
"""

from __future__ import annotations

import pytest

from proto_to_avro_ql_spark.sources.protodec import (
    FieldSpec,
    MessageSpec,
    decode_message,
    decode_proto,
    encode_message,
)

INT_MSG = MessageSpec("Test1", (FieldSpec(1, "a", "int64"),))
STR_MSG = MessageSpec("Test2", (FieldSpec(2, "b", "string"),))
PACKED_MSG = MessageSpec("Test4", (FieldSpec(4, "d", "int32", repeated=True),))
SINT_MSG = MessageSpec("TestS", (FieldSpec(1, "s", "sint64"),))


def test_golden_varint_from_spec():
    # protobuf encoding guide: Test1{a: 150} == `08 96 01`
    assert encode_message(INT_MSG, {"a": 150}) == bytes.fromhex("089601")
    assert decode_message(INT_MSG, bytes.fromhex("089601")) == {"a": 150}


def test_golden_string_from_spec():
    # guide: Test2{b: "testing"} == `12 07` + "testing"
    wire = bytes.fromhex("1207") + b"testing"
    assert encode_message(STR_MSG, {"b": "testing"}) == wire
    assert decode_message(STR_MSG, wire) == {"b": "testing"}


def test_golden_packed_repeated_from_spec():
    # guide: Test4{d: [3, 270, 86942]} packed == `22 06 03 8E 02 9E A7 05`
    wire = bytes.fromhex("2206038e029ea705")
    assert decode_message(PACKED_MSG, wire) == {"d": [3, 270, 86942]}
    # unpacked encoding of the same values must decode identically
    unpacked = bytes.fromhex("2003") + bytes.fromhex("208e02") + bytes.fromhex("209ea705")
    assert decode_message(PACKED_MSG, unpacked) == {"d": [3, 270, 86942]}


def test_negative_int64_ten_byte_varint():
    wire = encode_message(INT_MSG, {"a": -2})
    # two's complement: -2 encodes as 10 varint bytes, FE FF ... 01
    assert wire == bytes.fromhex("08feffffffffffffffff01")
    assert decode_message(INT_MSG, wire) == {"a": -2}


def test_sint64_zigzag():
    # guide: zigzag(-1) == 1, zigzag(-2) == 3
    assert encode_message(SINT_MSG, {"s": -1}) == bytes.fromhex("0801")
    assert decode_message(SINT_MSG, bytes.fromhex("0801")) == {"s": -1}
    assert decode_message(SINT_MSG, bytes.fromhex("0803")) == {"s": -2}


def test_proto3_defaults_and_missing_message():
    spec = MessageSpec(
        "M",
        (
            FieldSpec(1, "i", "int64"),
            FieldSpec(2, "s", "string"),
            FieldSpec(3, "f", "double"),
            FieldSpec(4, "sub", "message", message=INT_MSG),
        ),
    )
    # default-valued scalars are skipped on encode and restored on decode
    assert encode_message(spec, {"i": 0, "s": "", "f": 0.0}) == b""
    assert decode_message(spec, b"") == {"i": 0, "s": "", "f": 0.0, "sub": None}


def test_unknown_fields_skipped():
    # encode with a wider spec, decode with a narrower one
    wide = MessageSpec(
        "W",
        (
            FieldSpec(1, "a", "int64"),
            FieldSpec(2, "b", "string"),
            FieldSpec(3, "c", "double"),
        ),
    )
    wire = encode_message(wide, {"a": 7, "b": "x", "c": 2.5})
    assert decode_message(INT_MSG, wire) == {"a": 7}


def test_last_scalar_wins():
    wire = bytes.fromhex("0801") + bytes.fromhex("0802")
    assert decode_message(INT_MSG, wire) == {"a": 2}


def test_nested_round_trip_all_kinds():
    sub = MessageSpec(
        "Sub", (FieldSpec(1, "name", "string"), FieldSpec(2, "score", "double"))
    )
    spec = MessageSpec(
        "All",
        (
            FieldSpec(1, "i64", "int64"),
            FieldSpec(2, "i32", "int32"),
            FieldSpec(3, "s64", "sint64"),
            FieldSpec(4, "flag", "bool"),
            FieldSpec(5, "d", "double"),
            FieldSpec(6, "fl", "float"),
            FieldSpec(7, "txt", "string"),
            FieldSpec(8, "raw", "bytes"),
            FieldSpec(9, "tags", "int64", repeated=True),
            FieldSpec(10, "subs", "message", repeated=True, message=sub),
        ),
    )
    msg = {
        "i64": -(1 << 62),
        "i32": -123,
        "s64": -456,
        "flag": True,
        "d": 3.141592653589793,
        "fl": 0.5,
        "txt": "héllo wörld",
        "raw": b"\x00\x01\xff",
        "tags": [1, 0, -1],
        "subs": [{"name": "a", "score": 1.5}, {"name": "", "score": 0.0}],
    }
    assert decode_message(spec, encode_message(spec, msg)) == msg


@pytest.mark.usefixtures("spark")
def test_spark_round_trip_events(spark):
    from proto_to_avro_ql_spark.entry_queries import QUERIES
    from proto_to_avro_ql_spark.sources.io import read_table

    sf = "/root/testdata/sf0.001"
    got = {
        r.event_id: (r.user_id, r.event_type, r.value)
        for r in QUERIES["src_proto_decode"](spark, sf).collect()
    }
    want = {
        r.event_id: (r.user_id, r.event_type, r.value)
        for r in read_table(spark, sf, "events")
        .select("event_id", "user_id", "event_type", "value")
        .collect()
    }
    assert got == want  # exact, including float bits (fixed64 round trip)


@pytest.mark.usefixtures("spark")
def test_spark_decode_null_payload_and_unknown_fields(spark):
    import pandas as pd

    from proto_to_avro_ql_spark.entry_registry import EVENT_SPEC

    wide = MessageSpec(
        "EventWide",
        EVENT_SPEC.fields + (FieldSpec(15, "extra", "string"),),
    )
    rows = [
        (1, encode_message(wide, {"event_id": 1, "user_id": 2, "extra": "ignored"})),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "row_id long, pb binary")
    out = {
        r.row_id: r.msg
        for r in decode_proto(df, "pb", EVENT_SPEC, keep_cols=("row_id",)).collect()
    }
    assert out[1].event_id == 1 and out[1].user_id == 2
    assert out[1].meta is None  # missing sub-message → null
    assert out[2] is None  # null payload → null struct


def test_spec_projection_prunes_decode():
    spec = MessageSpec(
        "M",
        (
            FieldSpec(1, "a", "int64"),
            FieldSpec(2, "b", "string"),
            FieldSpec(3, "c", "double"),
        ),
    )
    wire = encode_message(spec, {"a": 7, "b": "wide text payload", "c": 2.5})
    pruned = spec.project(["a", "c"])
    assert decode_message(pruned, wire) == {"a": 7, "c": 2.5}  # b skipped
    assert [f.name for f in pruned.spark_schema().fields] == ["a", "c"]
    with pytest.raises(AssertionError):
        spec.project(["nope"])


@pytest.mark.usefixtures("spark")
def test_spark_decode_corrupt_payload_permissive(spark):
    from proto_to_avro_ql_spark.entry_registry import EVENT_SPEC

    good = encode_message(EVENT_SPEC, {"event_id": 7, "user_id": 8})
    rows = [
        (1, good),
        (2, b"\xff\xff\xff"),  # truncated varint key
        (3, bytes.fromhex("0a03") + b"x"),  # length past end of buffer
    ]
    df = spark.createDataFrame(rows, "row_id long, pb binary")
    out = {
        r.row_id: r.msg
        for r in decode_proto(
            df, "pb", EVENT_SPEC, keep_cols=("row_id",), on_error="null"
        ).collect()
    }
    assert out[1].event_id == 7
    assert out[2] is None and out[3] is None  # quarantined, job survives
    # strict mode must raise on the same input
    with pytest.raises(Exception):
        decode_proto(df, "pb", EVENT_SPEC, on_error="fail").collect()


# --- property-based round trip (hypothesis) --------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    FULL_SPEC = MessageSpec(
        "P",
        (
            FieldSpec(1, "i", "int64"),
            FieldSpec(2, "s64", "sint64"),
            FieldSpec(3, "flag", "bool"),
            FieldSpec(4, "d", "double"),
            FieldSpec(5, "txt", "string"),
            FieldSpec(6, "raw", "bytes"),
            FieldSpec(7, "tags", "int64", repeated=True),
            FieldSpec(8, "sub", "message", message=INT_MSG),
        ),
    )

    i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)

    @settings(max_examples=200, deadline=None)
    @given(
        i=i64,
        s64=i64,
        flag=st.booleans(),
        d=st.floats(allow_nan=False),  # NaN != NaN breaks dict equality, not the codec
        txt=st.text(max_size=50),
        raw=st.binary(max_size=50),
        tags=st.lists(i64, max_size=8),
        sub_a=i64,
    )
    def test_property_round_trip(i, s64, flag, d, txt, raw, tags, sub_a):
        msg = {
            "i": i,
            "s64": s64,
            "flag": flag,
            "d": d,
            "txt": txt,
            "raw": raw,
            "tags": tags,
            "sub": {"a": sub_a},
        }
        assert decode_message(FULL_SPEC, encode_message(FULL_SPEC, msg)) == msg


def test_fuzz_decode_never_hangs_or_crashes_unexpectedly():
    """hypothesis: decode_message on ARBITRARY bytes either returns a
    dict or raises ValueError/IndexError (the quarantine-able error
    classes decode_proto's PERMISSIVE path catches) — never loops
    forever, never dies on an unexpected exception type. This is the
    guarantee the 100 TB ingest path leans on: one corrupt payload
    must cost one null row, not an executor."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from proto_to_avro_ql_spark.entry_registry import EVENT_SPEC
    from proto_to_avro_ql_spark.sources.protodec import decode_message

    @settings(max_examples=500, deadline=None)
    @given(st.binary(max_size=64))
    def check(data):
        try:
            out = decode_message(EVENT_SPEC, data)
        except (ValueError, IndexError):
            return  # quarantined by decode_proto's PERMISSIVE path
        assert isinstance(out, dict)

    check()


def test_fuzz_mutated_valid_payloads():
    """Flip/truncate bytes of a VALID encoded message: decode must
    still terminate with a dict or a quarantine-able error."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from proto_to_avro_ql_spark.entry_registry import EVENT_SPEC
    from proto_to_avro_ql_spark.sources.protodec import (
        decode_message,
        encode_message,
    )

    base = encode_message(
        EVENT_SPEC, {"event_id": 71, "user_id": 8, "event_type": "view"}
    )

    @settings(max_examples=500, deadline=None)
    @given(
        st.integers(0, max(len(base) - 1, 0)),
        st.integers(0, 255),
        st.integers(0, len(base)),
    )
    def check(flip_at, flip_to, cut_at):
        mutated = bytearray(base)
        mutated[flip_at] = flip_to
        data = bytes(mutated[:cut_at])
        try:
            out = decode_message(EVENT_SPEC, data)
        except (ValueError, IndexError):
            return
        assert isinstance(out, dict)

    check()
