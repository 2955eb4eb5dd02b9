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


def _assert_no_reserved(df: DataFrame, reserved: tuple[str, ...], fn: str) -> None:
    """Guard the banded helpers' scratch columns: ``withColumn``
    silently REPLACES an existing column of the same name, so a caller
    column colliding with a temp name would corrupt results with no
    error (round-10 advice). Fail loudly instead."""
    clash = [c for c in df.columns if c in reserved]
    if clash:
        raise ValueError(
            f"{fn}: input columns {clash} collide with reserved temp "
            f"names {list(reserved)}; rename them before calling"
        )


def banded_global_rank(
    df: DataFrame,
    band: Column,
    order_cols: list[Column],
    rank_name: str = "_grank",
    counts_from: DataFrame | None = None,
) -> DataFrame:
    """Exact 0-indexed GLOBAL rank over ``order_cols`` without a
    single-partition window.

    RESERVED temp columns: ``_band``, ``_lrank``, ``_bn``, ``_boff``
    are stamped internally and must be absent from ``df`` (and from
    ``counts_from``) — asserted, because ``withColumn`` would silently
    replace a caller column of the same name.

    Requires ``band`` to be a coarse prefix of the total order: rows
    sort by (band, *order_cols) exactly as by ``order_cols`` alone
    (e.g. band = the leading key itself, or day(ts) when ts leads).
    Skew: a hot band serializes its own window — refine the band with
    any further prefix of the order to split it (e.g. ``(k, id div B)``
    when the order is (k, id)); correctness only needs the prefix
    property, so band granularity is a pure parallelism knob.

    Plan shape at any scale:
      1. per-band row_number — a PARTITIONED window (one shuffle on
         band, parallel across bands);
      2. per-band counts → prefix sum over the small band relation
         (#bands rows — the only unpartitioned window; choose a band
         expression that BOUNDS band count, e.g. ``key div B`` or
         ``day(ts)``, so this relation never tracks table size);
      3. join the offsets back — unhinted, so AQE broadcasts while the
         band relation is small and falls back to a shuffle join if a
         caller picks an unbounded band (a forced broadcast here would
         be the driver-OOM pattern at high band cardinality).

    ``counts_from``: optional relation to compute the per-band counts
    against instead of ``df`` — it must contain the band's input
    columns and the SAME row multiset (e.g. the pre-window base table
    when ``df`` is a row-preserving enrichment of it). The counts
    branch is a second evaluation of ``df``'s whole subtree (Spark
    shares no work across plan branches without caching); pointing it
    at the cheap base avoids recomputing upstream windows/joins.

    This is the distributed zipWithIndex recipe expressed in pure
    DataFrame ops — the scale-safe replacement for
    ``Window.orderBy(...)`` global ranking.
    """
    from pyspark.sql import Window

    _assert_no_reserved(df, ("_band", "_lrank", "_bn", "_boff"), "banded_global_rank")
    if counts_from is not None:
        _assert_no_reserved(
            counts_from, ("_band", "_bn"), "banded_global_rank(counts_from)"
        )
    stamped = df.withColumn("_band", band)
    w_in = Window.partitionBy("_band").orderBy(*order_cols)
    local = stamped.withColumn("_lrank", F.row_number().over(w_in) - 1)
    counts = (
        (df if counts_from is None else counts_from)
        .select(band.alias("_band"))
        .groupBy("_band")
        .agg(F.count(F.lit(1)).alias("_bn"))
    )
    # #bands rows only: the global window here is bounded and cheap.
    w_pre = (
        Window.orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        "_band", (F.sum("_bn").over(w_pre) - F.col("_bn")).alias("_boff")
    )
    return (
        local.join(offsets, "_band")
        .withColumn(rank_name, (F.col("_boff") + F.col("_lrank")).cast("bigint"))
        .drop("_band", "_lrank", "_boff")
    )


def banded_global_cumsum(
    df: DataFrame,
    band: Column,
    order_cols: list[Column],
    value: Column,
    name: str = "_gcum",
) -> DataFrame:
    """Exact INCLUSIVE global running sum of ``value`` over
    ``order_cols`` without a single-partition window — the weighted
    prefix-sum sibling of :func:`banded_global_rank`.

    Same contract: ``band`` must be a coarse prefix of the total order
    (rows sort by (band, *order_cols) exactly as by ``order_cols``
    alone), and band granularity is a pure parallelism knob. Same plan
    shape at any scale: (1) per-band running sum — a PARTITIONED
    window, one shuffle on band; (2) per-band totals → prefix sum over
    the #bands-row relation (the only unpartitioned window — pick a
    band expression that keeps #bands ≪ #rows); (3) unhinted join of
    the offsets back (AQE broadcasts while the band relation is
    small). This is how a 100 TB table gets a cumulative weight
    column for quota/resampling cuts without funneling through one
    partition.

    RESERVED temp columns: ``_band``, ``_v``, ``_lsum``, ``_bs``,
    ``_boff`` are stamped internally and must be absent from ``df`` —
    asserted, because ``withColumn`` would silently replace a caller
    column of the same name."""
    from pyspark.sql import Window

    _assert_no_reserved(
        df, ("_band", "_v", "_lsum", "_bs", "_boff"), "banded_global_cumsum"
    )
    stamped = df.withColumn("_band", band).withColumn("_v", value)
    w_in = (
        Window.partitionBy("_band")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = stamped.withColumn("_lsum", F.sum("_v").over(w_in))
    totals = stamped.groupBy("_band").agg(F.sum("_v").alias("_bs"))
    # #bands rows only: the global window here is bounded and cheap.
    w_pre = (
        Window.orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "_band", (F.sum("_bs").over(w_pre) - F.col("_bs")).alias("_boff")
    )
    return (
        local.join(offsets, "_band")
        .withColumn(name, (F.col("_boff") + F.col("_lsum")).cast("bigint"))
        .drop("_band", "_v", "_lsum", "_boff")
    )


def ntile_from_rank(rank: Column, total: Column, n_tiles: int) -> Column:
    """SQL ``ntile(n)`` bucket (0-indexed) computed from a 0-indexed
    global rank and the total row count: the first ``total % n`` tiles
    take ``ceil(total/n)`` rows, the rest ``floor(total/n)`` — the
    exact semantics Spark and DuckDB share, so a banded-rank plan can
    reproduce a global-ntile oracle bit-for-bit."""
    small = (total / n_tiles).cast("bigint")  # floor(n/k)
    big_cnt = total % n_tiles
    big_span = big_cnt * (small + 1)
    return F.when(rank < big_span, (rank / (small + 1)).cast("bigint")).otherwise(
        big_cnt + ((rank - big_span) / small).cast("bigint")
    )
