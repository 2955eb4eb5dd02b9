"""Default-value / normalization semantics (SURVEY.md §1.3).

Reference behavior being reproduced (semantics only):

- getDefault keyed on the value type (ProtoMessageToAvroMappings.scala:70-83):
  record/null → null; array → []; int/long/float/double → 0;
  enum → default symbol; string/bytes → null; boolean → false.
- runtime normalizations (ProtoMessageToAvroMappings.scala:199-200, :210):
  unset value → default; **empty string → null**.
- unset optional message → null record (:314-319) — handled structurally
  in plans/compile.py, NOT here (a null parent must stay null, not become
  a record of defaults).

Everything is a native Column expression (coalesce / nullif / when) —
zero UDFs, fully codegen-able, constant-folded by Catalyst where
possible.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def default_for(dtype: T.DataType) -> Any:
    """The unset-field default for a type (getDefault analog). ``None``
    means the field legitimately defaults to SQL NULL."""
    if isinstance(dtype, _NUMERIC):
        return 0
    if isinstance(dtype, T.BooleanType):
        return False
    if isinstance(dtype, T.ArrayType):
        return []
    # string, bytes, struct, map → null
    return None


def apply_leaf_defaults(col: Column, dtype: T.DataType) -> Column:
    """Normalize one leaf: unset → default, empty string → null."""
    if isinstance(dtype, _NUMERIC):
        return F.coalesce(col, F.lit(0).cast(dtype))
    if isinstance(dtype, T.BooleanType):
        return F.coalesce(col, F.lit(False))
    if isinstance(dtype, T.StringType):
        return empty_string_to_null(col)
    if isinstance(dtype, T.ArrayType):
        return F.coalesce(col, F.array().cast(dtype))
    # bytes / struct / map: null stays null
    return col


def empty_string_to_null(col: Column) -> Column:
    """'' → NULL (ProtoMessageToAvroMappings.scala:210)."""
    return F.nullif(col, F.lit(""))


def enum_symbol(col: Column, symbols: Sequence[str]) -> Column:
    """Enum code → symbol name (ProtoMessageToAvroMappings.scala:203-209,
    :230-233). Unset/NULL code maps to the enum's default symbol
    (symbols[0], the proto convention); out-of-range codes map to NULL.

    Implemented as a constant-folded CASE chain — at 100 TB this is a
    codegen'd table switch, never a join against a tiny dimension.
    """
    if not symbols:
        raise ValueError("enum requires at least one symbol")
    expr = F.lit(None).cast("string")
    for code, name in reversed(list(enumerate(symbols))):
        expr = F.when(col == code, F.lit(name)).otherwise(expr)
    return F.when(col.isNull(), F.lit(symbols[0])).otherwise(expr)


def enum_symbol_array(col: Column, symbols: Sequence[str]) -> Column:
    """Repeated enum → array of symbol names (ProtoMessageToAvroMappings
    .scala:203-209 repeated branch)."""
    return F.transform(col, lambda c: enum_symbol(c, symbols))


# Proto→Spark type normalization (SURVEY.md §1.2 table;
# ProtoMessageToAvroMappings.scala:221-243).
PROTO_TO_SPARK: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "int32": T.IntegerType(),
    "uint32": T.IntegerType(),
    "sint32": T.IntegerType(),
    "fixed32": T.IntegerType(),
    "sfixed32": T.IntegerType(),
    "int64": T.LongType(),
    "uint64": T.LongType(),
    "sint64": T.LongType(),
    "fixed64": T.LongType(),
    "sfixed64": T.LongType(),
}


def normalize_type(col: Column, proto_type: str) -> Column:
    """type_norm: cast a column per the proto→engine type table. Unknown
    proto types (group, map in the reference) raise, mirroring the
    reference's IllegalStateException (:234-237)."""
    try:
        target = PROTO_TO_SPARK[proto_type]
    except KeyError:
        raise ValueError(f"Unsupported proto type for normalization: {proto_type}") from None
    return col.cast(target)
