"""Deterministic fixture views over the driver's synthetic tables.

- ``ads_row``: the nested report-row analog of the reference's test
  fixture (ProtoToAvroMappingTest.scala:12-41; recipe in FIXTURES.md §2)
  built from lineitem ⋈ orders ⋈ customer.
- ``proto_defaults``: exercises every getDefault branch
  (ProtoMessageToAvroMappings.scala:70-83) with NULL/empty cases derived
  deterministically from lineitem — the same rows are reproducible in
  DuckDB for the oracle.

Scale notes: lineitem⋈orders is the big join — it shuffles on the order
key (co-partitioned both sides; at warehouse scale you'd bucket both
tables on orderkey to make it shuffle-free). customer is dimension-like
and explicitly broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proto_to_avro_ql_spark.sources.io import read_table


def ads_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    joined = l.join(o, l.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    return joined.select(
        F.struct(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("descriptive_name"),
        ).alias("customer"),
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.col("o_orderpriority").alias("name"),
            F.col("o_orderstatus").alias("status"),
        ).alias("campaign"),
        F.struct(
            F.col("o_orderkey").alias("campaign_id"),
            F.col("l_linenumber").cast("bigint").alias("id"),
            F.col("l_returnflag").alias("name"),
            F.col("l_linestatus").alias("status"),
        ).alias("ad_group"),
        F.struct(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("date"),
        ).alias("segments"),
        F.struct(
            F.col("l_quantity").cast("bigint").alias("impressions"),
            F.col("l_linenumber").cast("bigint").alias("clicks"),
            # round-then-cast: Spark's double→bigint cast truncates while
            # DuckDB's rounds; make the semantics explicit on both sides.
            F.round(F.col("l_extendedprice") * 1e4, 0).cast("bigint").alias("cost_micros"),
            F.col("l_discount").alias("conversions"),
            F.col("l_tax").alias("ctr"),
        ).alias("metrics"),
    )


# DuckDB-side equivalent of ads_row (oracle building block). Kept here so
# Spark recipe and oracle recipe evolve together.
ADS_ROW_SQL = """
SELECT
  struct_pack(id := c.c_custkey, descriptive_name := c.c_name) AS customer,
  struct_pack(id := o.o_orderkey, name := o.o_orderpriority,
              status := o.o_orderstatus) AS campaign,
  struct_pack(campaign_id := o.o_orderkey, id := CAST(l.l_linenumber AS BIGINT),
              name := l.l_returnflag, status := l.l_linestatus) AS ad_group,
  struct_pack(date := strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d')) AS segments,
  struct_pack(impressions := CAST(l.l_quantity AS BIGINT),
              clicks := CAST(l.l_linenumber AS BIGINT),
              cost_micros := CAST(ROUND(l.l_extendedprice * 1e4, 0) AS BIGINT),
              conversions := l.l_discount,
              ctr := l.l_tax) AS metrics
FROM lineitem l
JOIN orders   o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey  = c.c_custkey
"""

# Flat oracle building block (struct-free): same leaves as ads_row but as
# plain columns, for oracles whose Spark side flattens before returning.
ADS_FLAT_SQL = """
SELECT
  c.c_custkey AS customer_id,
  c.c_name AS customer_descriptive_name,
  o.o_orderkey AS campaign_id,
  o.o_orderpriority AS campaign_name,
  o.o_orderstatus AS campaign_status,
  o.o_orderkey AS ad_group_campaign_id,
  CAST(l.l_linenumber AS BIGINT) AS ad_group_id,
  l.l_returnflag AS ad_group_name,
  l.l_linestatus AS ad_group_status,
  strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS segments_date,
  CAST(l.l_quantity AS BIGINT) AS metrics_impressions,
  CAST(l.l_linenumber AS BIGINT) AS metrics_clicks,
  CAST(ROUND(l.l_extendedprice * 1e4, 0) AS BIGINT) AS metrics_cost_micros,
  l.l_discount AS metrics_conversions,
  l.l_tax AS metrics_ctr
FROM lineitem l
JOIN orders   o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey  = c.c_custkey
"""


ENUM_SYMBOLS = ["UNSPECIFIED", "UNKNOWN", "ENABLED", "PAUSED", "REMOVED"]


def proto_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw defaults fixture (FIXTURES.md §3): NULLs and empty strings
    injected deterministically, *before* normalization."""
    l = read_table(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber")
    return l.select(
        (F.col("l_orderkey") * 10 + ln).alias("id"),
        F.col("l_returnflag").alias("s_set"),
        F.when(ln % 3 == 0, F.lit("")).otherwise(F.col("l_linestatus")).alias("s_empty"),
        F.when(ln % 2 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("l_returnflag"))
        .alias("s_null"),
        F.when(ln % 2 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("l_partkey"))
        .alias("i_unset"),
        F.when(ln % 4 == 0, F.lit(None).cast("boolean"))
        .otherwise(F.col("l_quantity") > 25)
        .alias("b_unset"),
        F.when(ln % 2 == 0, F.lit(None).cast("struct<a:bigint>"))
        .otherwise(F.struct(F.col("l_suppkey").alias("a")))
        .alias("msg_unset"),
        F.when(ln % 3 == 0, F.lit(None).cast("array<bigint>"))
        .otherwise(F.array(F.col("l_partkey"), F.col("l_suppkey")))
        .alias("arr_ints"),
        F.array(
            F.struct(F.col("l_partkey").alias("id"), F.col("l_returnflag").alias("junk"))
        ).alias("arr_structs"),
        F.when(F.col("l_orderkey") % 7 == 0, F.lit(None).cast("int"))
        .otherwise((ln % 5).cast("int"))
        .alias("enum_code"),
    )


# DuckDB equivalent of proto_defaults (pre-normalization).
PROTO_DEFAULTS_SQL = """
SELECT
  l_orderkey * 10 + l_linenumber AS id,
  l_returnflag AS s_set,
  CASE WHEN l_linenumber % 3 = 0 THEN '' ELSE l_linestatus END AS s_empty,
  CASE WHEN l_linenumber % 2 = 0 THEN NULL ELSE l_returnflag END AS s_null,
  CASE WHEN l_linenumber % 2 = 0 THEN NULL ELSE l_partkey END AS i_unset,
  CASE WHEN l_linenumber % 4 = 0 THEN NULL ELSE l_quantity > 25 END AS b_unset,
  CASE WHEN l_linenumber % 2 = 0 THEN NULL
       ELSE struct_pack(a := l_suppkey) END AS msg_unset,
  CASE WHEN l_linenumber % 3 = 0 THEN NULL
       ELSE [l_partkey, l_suppkey] END AS arr_ints,
  [struct_pack(id := l_partkey, junk := l_returnflag)] AS arr_structs,
  CASE WHEN l_orderkey % 7 = 0 THEN NULL
       ELSE CAST(l_linenumber % 5 AS INTEGER) END AS enum_code
FROM lineitem
"""
