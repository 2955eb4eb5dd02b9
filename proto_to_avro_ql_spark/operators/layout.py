"""Z-order (Morton) clustering keys — multi-dimensional data layout
for file-level min/max skipping.

At lake scale, parquet readers skip row groups whose column min/max
statistics exclude the predicate. A table sorted on ONE key skips well
on that key and not at all on others; interleaving the bits of two
keys (the Morton / Z-order curve) gives locality on BOTH, so range
predicates on either dimension prune files (the technique behind Delta
Lake's OPTIMIZE ZORDER BY, Databricks blog, and classic Morton 1966).

The engine's job is the clustering KEY and the range layout; both are
pure narrow expressions plus one ``repartitionByRange`` — the only
exchange is the write-side range shuffle you would pay for any sorted
layout.

Nothing here is reference-derived (the reference has no storage
layout); the operator exists for the 100 TB table-maintenance story
alongside ``ext_compaction`` and the partitioned sinks.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    bit i of x lands at position 2i, bit i of y at 2i+1. Constant
    shift amounts, so the whole code is one codegen'd expression —
    no UDF, no shuffle."""
    xl, yl = x.cast("bigint"), y.cast("bigint")  # avoid 32-bit shift wrap
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def morton_code_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`morton_code` (multiply instead of shift)."""
    terms = [f"(({x} >> {i}) & 1) * {1 << (2 * i)}" for i in range(bits)]
    terms += [f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}" for i in range(bits)]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_layout(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 16,
    num_ranges: int = 16,
) -> DataFrame:
    """Stamp each row with its Morton code and lay the relation out as
    ``num_ranges`` contiguous z-ranges (``repartitionByRange`` samples
    split points, so files hold compact z-intervals → compact x/y
    bounding boxes → min/max skipping works on both dimensions)."""
    coded = df.withColumn("zcode", morton_code(x, y, bits))
    return coded.repartitionByRange(num_ranges, F.col("zcode")).sortWithinPartitions(
        "zcode"
    )
