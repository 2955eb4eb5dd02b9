"""Per-operator query registrations for SURVEY.md §2.

Each `register("<operator_id>", ORACLE_SQL)(query_fn)` pairs the Spark
implementation with a DuckDB oracle over the same parquet views.
Output conventions (hash stability): scalar columns only, identical
aliases both sides, doubles rounded on both sides, dates as ISO
strings. Nested/array behavior is asserted structurally in tests/.

Operators whose essence is non-SQL-expressible (LSH internals,
mapInPandas plumbing, streaming) register without an oracle → the
driver records rows-only; their correctness is pinned by pytest
self-checks instead.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from proto_to_avro_ql_spark.entry_queries import register
from proto_to_avro_ql_spark.fixtures import (
    ADS_FLAT_SQL,
    ENUM_SYMBOLS,
    PROTO_DEFAULTS_SQL,
    ads_row,
    proto_defaults,
)
from proto_to_avro_ql_spark.functions import text as TX
from proto_to_avro_ql_spark.functions.defaults import (
    apply_leaf_defaults,
    empty_string_to_null,
    enum_symbol,
)
from proto_to_avro_ql_spark.operators import dedup as DD
from proto_to_avro_ql_spark.operators import multimodal as MM
from proto_to_avro_ql_spark.operators import simsearch as SS
from proto_to_avro_ql_spark.operators import windows as W
from proto_to_avro_ql_spark.plans.compile import (
    Constant,
    Scalar,
    SynthStruct,
    compile_projection,
    projected_schema,
)
from proto_to_avro_ql_spark.plans.recursion import make_chain_json, parse_recursive_json
from proto_to_avro_ql_spark.sources.io import (
    QueryCache,
    read_table,
    sink_json_direct,
    write_avro_or_parquet,
)

# ===========================================================================
# §2.2 — projection / schema transformation
# ===========================================================================


@register(
    "proj_paths",
    f"""WITH f AS ({ADS_FLAT_SQL})
    SELECT customer_id, campaign_id, campaign_name, ad_group_id,
           segments_date, metrics_impressions, metrics_clicks
    FROM f""",
)
def q_proj_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dot-path nested projection with pruning; leaves flattened for the
    oracle hash (nested-schema pruning asserted in tests)."""
    out = compile_projection(
        ads_row(spark, sf_dir),
        [
            "customer.id",
            "campaign.id",
            "campaign.name",
            "ad_group.id",
            "segments.date",
            "metrics.impressions",
            "metrics.clicks",
        ],
    )
    return out.select(
        F.col("customer.id").alias("customer_id"),
        F.col("campaign.id").alias("campaign_id"),
        F.col("campaign.name").alias("campaign_name"),
        F.col("ad_group.id").alias("ad_group_id"),
        F.col("segments.date").alias("segments_date"),
        F.col("metrics.impressions").alias("metrics_impressions"),
        F.col("metrics.clicks").alias("metrics_clicks"),
    )


@register(
    "proj_subtree",
    f"""WITH f AS ({ADS_FLAT_SQL})
    SELECT campaign_id, campaign_name, campaign_status FROM f""",
)
def q_proj_subtree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path ending at a message includes ALL its fields."""
    out = compile_projection(ads_row(spark, sf_dir), ["campaign"])
    return out.select(
        F.col("campaign.id").alias("campaign_id"),
        F.col("campaign.name").alias("campaign_name"),
        F.col("campaign.status").alias("campaign_status"),
    )


@register(
    "proj_flatten_scalar",
    f"""WITH f AS ({ADS_FLAT_SQL})
    SELECT customer_id, segments_date FROM f""",
)
def q_proj_flatten_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar lift: nested path → top-level column via Scalar mapping."""
    out = compile_projection(
        ads_row(spark, sf_dir),
        ["segments.date"],
        mappings={"customer_id": Scalar("customer.id")},
    )
    return out.select("customer_id", F.col("segments.date").alias("segments_date"))


@register(
    "proj_const",
    f"""WITH f AS ({ADS_FLAT_SQL})
    SELECT ad_group_id, CAST(3 AS INTEGER) AS version,
           CAST(NULL AS VARCHAR) AS note, 'Ben' AS author
    FROM f""",
)
def q_proj_const(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = compile_projection(
        ads_row(spark, sf_dir),
        ["ad_group.id"],
        mappings={
            "version": Constant(3, "int"),
            "note": Constant(None, "string"),
            "author": Constant("Ben", "string"),
        },
    )
    return out.select(
        F.col("ad_group.id").alias("ad_group_id"), "version", "note", "author"
    )


@register(
    "proj_struct_synth",
    f"""WITH f AS ({ADS_FLAT_SQL})
    SELECT campaign_id, 'Ben' AS metadata_author,
           segments_date AS metadata_report_date
    FROM f""",
)
def q_proj_struct_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized struct (constants + extracted scalars), flattened for
    hashing; struct shape asserted in tests."""
    out = compile_projection(
        ads_row(spark, sf_dir),
        [],
        mappings={
            "campaign_id": Scalar("campaign.id"),
            "metadata": SynthStruct(
                {"author": Constant("Ben"), "report_date": Scalar("segments.date")}
            ),
        },
    )
    return out.select(
        "campaign_id",
        F.col("metadata.author").alias("metadata_author"),
        F.col("metadata.report_date").alias("metadata_report_date"),
    )


@register(
    "proj_reorder",
    f"""WITH f AS ({ADS_FLAT_SQL})
    SELECT campaign_id, customer_id, segments_date, 'r1' AS metadata_tag
    FROM f""",
)
def q_proj_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-level ordering: ids first, metadata last.
    The driver's hash is column-order-insensitive, so the ordering
    contract itself is asserted in tests; values here."""
    out = compile_projection(
        ads_row(spark, sf_dir),
        ["segments.date"],
        mappings={
            "campaign_id": Scalar("campaign.id"),
            "customer_id": Scalar("customer.id"),
            "metadata": SynthStruct({"tag": Constant("r1")}),
        },
    )
    assert out.columns[0] in ("campaign_id", "customer_id") and out.columns[-1] == "metadata"
    return out.select(
        "campaign_id",
        "customer_id",
        F.col("segments.date").alias("segments_date"),
        F.col("metadata.tag").alias("metadata_tag"),
    )


@register(
    "type_norm",
    """SELECT
         CAST(l_linenumber AS BIGINT) AS ln_as_long,
         CAST(l_linenumber AS INTEGER) AS ln_as_int,
         CAST(l_linenumber AS DOUBLE) AS ln_as_double,
         CAST(l_partkey AS INTEGER) AS pk_as_int,
         CAST(l_quantity AS REAL) AS qty_as_float,
         l_returnflag AS flag_str
       FROM lineitem""",
)
def q_type_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proto→engine type normalization (int32/64 families, float/double)."""
    from proto_to_avro_ql_spark.functions.defaults import normalize_type

    l = read_table(spark, sf_dir, "lineitem")
    return l.select(
        normalize_type(F.col("l_linenumber"), "int64").alias("ln_as_long"),
        normalize_type(F.col("l_linenumber"), "sint32").alias("ln_as_int"),
        normalize_type(F.col("l_linenumber"), "double").alias("ln_as_double"),
        normalize_type(F.col("l_partkey"), "fixed32").alias("pk_as_int"),
        normalize_type(F.col("l_quantity"), "float").alias("qty_as_float"),
        normalize_type(F.col("l_returnflag"), "string").alias("flag_str"),
    )


@register(
    "null_default",
    f"""WITH pd AS ({PROTO_DEFAULTS_SQL})
    SELECT id,
      COALESCE(i_unset, 0) AS i_def,
      COALESCE(b_unset, FALSE) AS b_def,
      msg_unset.a AS msg_a,
      len(COALESCE(arr_ints, CAST([] AS BIGINT[]))) AS arr_len
    FROM pd""",
)
def q_null_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """getDefault semantics: numeric→0, bool→false, message→null, array→[]."""
    pd = proto_defaults(spark, sf_dir)
    return pd.select(
        "id",
        apply_leaf_defaults(F.col("i_unset"), T.LongType()).alias("i_def"),
        apply_leaf_defaults(F.col("b_unset"), T.BooleanType()).alias("b_def"),
        F.col("msg_unset.a").alias("msg_a"),
        F.size(
            apply_leaf_defaults(F.col("arr_ints"), T.ArrayType(T.LongType()))
        ).alias("arr_len"),
    )


@register(
    "null_empty_string",
    f"""WITH pd AS ({PROTO_DEFAULTS_SQL})
    SELECT id, NULLIF(s_empty, '') AS s_empty_norm,
           NULLIF(s_set, '') AS s_set_norm, s_null
    FROM pd""",
)
def q_null_empty_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    pd = proto_defaults(spark, sf_dir)
    return pd.select(
        "id",
        empty_string_to_null(F.col("s_empty")).alias("s_empty_norm"),
        empty_string_to_null(F.col("s_set")).alias("s_set_norm"),
        "s_null",
    )


_ENUM_CASE = (
    "CASE WHEN enum_code IS NULL THEN 'UNSPECIFIED' "
    + " ".join(f"WHEN enum_code = {i} THEN '{s}'" for i, s in enumerate(ENUM_SYMBOLS))
    + " ELSE NULL END"
)


@register(
    "enum_symbol",
    f"""WITH pd AS ({PROTO_DEFAULTS_SQL})
    SELECT id, {_ENUM_CASE} AS status_symbol FROM pd""",
)
def q_enum_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enum code → symbol name; unset code → default (first) symbol."""
    pd = proto_defaults(spark, sf_dir)
    return pd.select(
        "id", enum_symbol(F.col("enum_code"), ENUM_SYMBOLS).alias("status_symbol")
    )


@register(
    "arr_scalar",
    f"""WITH pd AS ({PROTO_DEFAULTS_SQL})
    SELECT id,
      len(COALESCE(arr_ints, CAST([] AS BIGINT[]))) AS n,
      COALESCE(array_to_string(arr_ints, ','), '') AS joined
    FROM pd""",
)
def q_arr_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated scalar → array (unset → []); projected to scalars."""
    pd = proto_defaults(spark, sf_dir)
    arr = apply_leaf_defaults(F.col("arr_ints"), T.ArrayType(T.LongType()))
    return pd.select(
        "id",
        F.size(arr).alias("n"),
        F.array_join(F.transform(arr, lambda x: x.cast("string")), ",").alias("joined"),
    )


@register(
    "arr_struct_prune",
    f"""WITH pd AS ({PROTO_DEFAULTS_SQL})
    SELECT id, arr_structs[1].id AS elem0_id, len(arr_structs) AS n
    FROM pd""",
)
def q_arr_struct_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated message → array of pruned records: keep only `id` per
    element (junk dropped), then project element 0 for hashing."""
    pd = proto_defaults(spark, sf_dir)
    pruned = F.transform("arr_structs", lambda x: F.struct(x["id"].alias("id")))
    return pd.select(
        "id",
        F.element_at(pruned, 1)["id"].alias("elem0_id"),
        F.size(pruned).alias("n"),
    )


@register(
    "rec_recursive",
    """SELECT event_id,
         CAST(json_extract_string(j, '$.v') AS BIGINT) AS v0,
         CAST(json_extract_string(j, '$.child.v') AS BIGINT) AS v1,
         CAST(json_extract_string(j, '$.child.child.v') AS BIGINT) AS v2,
         TRUE AS capped  -- engine contract: depth-3 schema cannot hold level 3
       FROM (
         SELECT event_id,
           '{"v":' || event_id || ',"child":{"v":' || (event_id + 1)
             || ',"child":{"v":' || (event_id + 2)
             || ',"child":{"v":' || (event_id + 3) || ',"child":null}}}}' AS j
         FROM events
       )""",
)
def q_rec_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-capped unrolling of a recursive message: a 4-deep chain
    parsed with max_depth=3 — levels 0-2 extracted, level 3 dropped."""
    ev = read_table(spark, sf_dir, "events")
    chain = ev.select(
        "event_id",
        make_chain_json(
            [
                F.col("event_id"),
                F.col("event_id") + 1,
                F.col("event_id") + 2,
                F.col("event_id") + 3,
            ]
        ).alias("j"),
    )
    parsed = chain.select(
        "event_id",
        parse_recursive_json(
            F.col("j"), [T.StructField("v", T.LongType())], max_depth=3
        ).alias("r"),
    )
    return parsed.select(
        "event_id",
        F.col("r.v").alias("v0"),
        F.col("r.child.v").alias("v1"),
        F.col("r.child.child.v").alias("v2"),
        F.lit(True).alias("capped"),  # schema physically cannot hold level 3
    )


@register(
    "val_unknown_field",
    """SELECT 'Message has no field ''nonexistent'' (while resolving path ''campaign.nonexistent'')' AS error_message""",
)
def q_val_unknown_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unknown field → deterministic compile-time error, surfaced as data."""
    try:
        compile_projection(ads_row(spark, sf_dir), ["campaign.nonexistent"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        return spark.createDataFrame([(str(e),)], "error_message string")


@register(
    "val_empty_struct",
    """SELECT 'Explicitly queried message at ''empty_msg'' has no fields' AS error_message""",
)
def q_val_empty_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = ads_row(spark, sf_dir).withColumn(
        "empty_msg", F.lit(None).cast(T.StructType([]))
    )
    try:
        compile_projection(df, ["empty_msg"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        return spark.createDataFrame([(str(e),)], "error_message string")


@register(
    "compile_schema_infer",
    """SELECT * FROM (VALUES
         ('campaign', 'struct<id:bigint,name:string>'),
         ('customer', 'struct<id:bigint>'),
         ('metrics', 'struct<clicks:bigint,impressions:bigint>')
       ) t(field_name, field_type)""",
)
def q_compile_schema_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema derived at compile time, before any data is read."""
    schema = projected_schema(
        ads_row(spark, sf_dir),
        ["customer.id", "campaign.id", "campaign.name", "metrics.impressions", "metrics.clicks"],
    )
    rows = [(f.name, f.dataType.simpleString()) for f in schema.fields]
    return spark.createDataFrame(rows, "field_name string, field_type string")


# ===========================================================================
# §2.1 — scans / sources / sinks
# ===========================================================================


@register(
    "src_parquet_scan",
    "SELECT p_partkey, p_name, p_size FROM part WHERE p_size > 25",
)
def q_src_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with predicate + column pushdown (PushedFilters in
    the physical plan; ReadSchema contains only 3 columns)."""
    p = read_table(spark, sf_dir, "part")
    return p.where(F.col("p_size") > 25).select("p_partkey", "p_name", "p_size")


@register(
    "src_stream_source",
    """SELECT event_id, user_id, event_type, value
       FROM events WHERE event_type = 'click'""",
)
def q_src_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of the streaming source (lazy row-stream consumption,
    Main.scala:60-66); the true readStream variant lives in
    proto_to_avro_ql_spark.streaming and is exercised by tests."""
    ev = read_table(spark, sf_dir, "events")
    return ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "event_type", "value"
    )


_CACHE_AGG_SQL = """SELECT o_orderstatus,
         count(*) AS n_orders,
         ROUND(SUM(o_totalprice), 2) AS sum_totalprice
       FROM orders GROUP BY o_orderstatus"""


def _cache_producer(spark: SparkSession, sf_dir: str):
    def produce() -> DataFrame:
        o = read_table(spark, sf_dir, "orders")
        return o.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_totalprice"),
        )

    return produce


@register("sink_cache_write", _CACHE_AGG_SQL)
def q_sink_cache_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-through result cache: miss → execute + stage as parquet."""
    cache = QueryCache(spark, tempfile.mkdtemp(prefix="qcache_w_"))
    query_text = f"SELECT status agg FROM orders @ {sf_dir}"
    assert not cache.hit(query_text)
    return cache.run(query_text, _cache_producer(spark, sf_dir))


@register("src_cache_replay", _CACHE_AGG_SQL)
def q_src_cache_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cache hit path: second run with identical query text replays the
    staged parquet without re-executing the producer."""
    cache = QueryCache(spark, tempfile.mkdtemp(prefix="qcache_r_"))
    query_text = f"SELECT status agg FROM orders @ {sf_dir}"
    cache.run(query_text, _cache_producer(spark, sf_dir))
    assert cache.hit(query_text)
    calls = {"n": 0}

    def must_not_run() -> DataFrame:
        calls["n"] += 1
        raise AssertionError("cache hit must not re-run the producer")

    replayed = cache.run(query_text, must_not_run)
    assert calls["n"] == 0
    return replayed


@register(
    "sink_avro",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation""",
)
def q_sink_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro container-file sink (spark-avro if available, else the
    documented parquet fallback), verified by read-back."""
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    path = tempfile.mkdtemp(prefix="sink_avro_")
    fmt = write_avro_or_parquet(n, path)
    return spark.read.format(fmt).load(path)


@register(
    "sink_json",
    """SELECT r_regionkey, r_name FROM region""",
)
def q_sink_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink verified by schema-stable read-back."""
    r = read_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    path = tempfile.mkdtemp(prefix="sink_json_")
    r.write.mode("overwrite").json(path)
    return spark.read.schema("r_regionkey int, r_name string").json(path)


@register(
    "sink_json_direct",
    """SELECT to_json(struct_pack(n_nationkey := n_nationkey,
                                  n_name := n_name))::VARCHAR AS json
       FROM nation""",
)
def q_sink_json_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct per-row JSON serialization (to_json(struct(*)))."""
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return sink_json_direct(n)


# ===========================================================================
# §2.3 — filters (standalone registrations; also composed in flagship)
# ===========================================================================


@register(
    "filter_range",
    f"""WITH f AS ({ADS_FLAT_SQL})
    SELECT campaign_id, ad_group_id, segments_date FROM f
    WHERE segments_date BETWEEN '1995-02-01' AND '1995-03-01'""",
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = compile_projection(
        ads_row(spark, sf_dir), ["campaign.id", "ad_group.id", "segments.date"]
    ).where(F.col("segments.date").between("1995-02-01", "1995-03-01"))
    return out.select(
        F.col("campaign.id").alias("campaign_id"),
        F.col("ad_group.id").alias("ad_group_id"),
        F.col("segments.date").alias("segments_date"),
    )


@register(
    "filter_cmp",
    f"""WITH f AS ({ADS_FLAT_SQL})
    SELECT campaign_id, metrics_impressions FROM f
    WHERE metrics_impressions > 30""",
)
def q_filter_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = compile_projection(
        ads_row(spark, sf_dir), ["campaign.id", "metrics.impressions"]
    ).where(F.col("metrics.impressions") > 30)
    return out.select(
        F.col("campaign.id").alias("campaign_id"),
        F.col("metrics.impressions").alias("metrics_impressions"),
    )


@register(
    "filter_conj",
    f"""WITH f AS ({ADS_FLAT_SQL})
    SELECT campaign_id, segments_date, metrics_impressions, campaign_status
    FROM f
    WHERE segments_date BETWEEN '1995-01-01' AND '1995-12-31'
      AND metrics_impressions > 10 AND campaign_status = 'F'""",
)
def q_filter_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = compile_projection(
        ads_row(spark, sf_dir),
        ["campaign.id", "campaign.status", "segments.date", "metrics.impressions"],
    ).where(
        F.col("segments.date").between("1995-01-01", "1995-12-31")
        & (F.col("metrics.impressions") > 10)
        & (F.col("campaign.status") == "F")
    )
    return out.select(
        F.col("campaign.id").alias("campaign_id"),
        F.col("segments.date").alias("segments_date"),
        F.col("metrics.impressions").alias("metrics_impressions"),
        F.col("campaign.status").alias("campaign_status"),
    )


# ===========================================================================
# §2.4 — aggregations
# ===========================================================================


@register(
    "agg_groupby_sum",
    """SELECT l_returnflag,
         SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
         ROUND(SUM(l_extendedprice), 2) AS sum_price
       FROM lineitem GROUP BY l_returnflag""",
)
def q_agg_groupby_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@register(
    "agg_groupby_multi",
    """SELECT l_returnflag, l_linestatus,
         SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
         COUNT(*) AS n_rows,
         MIN(l_extendedprice) AS min_price,
         MAX(l_extendedprice) AS max_price,
         ROUND(AVG(l_discount), 6) AS avg_disc
       FROM lineitem GROUP BY l_returnflag, l_linestatus""",
)
def q_agg_groupby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


@register(
    "agg_derived_ratio",
    f"""WITH f AS ({ADS_FLAT_SQL}),
    agg AS (
      SELECT campaign_status,
        SUM(metrics_clicks) AS sum_clicks,
        SUM(metrics_impressions) AS sum_impressions,
        SUM(metrics_cost_micros) AS sum_cost
      FROM f GROUP BY campaign_status
    )
    SELECT campaign_status,
      ROUND(CAST(sum_clicks AS DOUBLE) / sum_impressions, 6) AS ctr,
      ROUND(CAST(sum_cost AS DOUBLE) / sum_clicks, 2) AS average_cpc
    FROM agg""",
)
def q_agg_derived_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio metrics computed post-aggregation (sum(a)/sum(b))."""
    rows = ads_row(spark, sf_dir)
    agg = rows.groupBy(F.col("campaign.status").alias("campaign_status")).agg(
        F.sum("metrics.clicks").alias("sum_clicks"),
        F.sum("metrics.impressions").alias("sum_impressions"),
        F.sum("metrics.cost_micros").alias("sum_cost"),
    )
    return agg.select(
        "campaign_status",
        F.round(F.col("sum_clicks") / F.col("sum_impressions"), 6).alias("ctr"),
        F.round(F.col("sum_cost") / F.col("sum_clicks"), 2).alias("average_cpc"),
    )


@register(
    "agg_distinct",
    """SELECT COUNT(DISTINCT o_custkey) AS n_customers,
              COUNT(DISTINCT o_orderpriority) AS n_priorities
       FROM orders""",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count_distinct("o_orderpriority").alias("n_priorities"),
    )


# ===========================================================================
# §2.5 — scalar functions
# ===========================================================================


@register(
    "fn_date_str",
    """SELECT o_orderkey,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
         CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
         strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
       FROM orders""",
)
def q_fn_date_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dates as ISO strings (reference carries dates as strings)."""
    o = read_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("order_date"),
        F.year(d).alias("order_year"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
    )


@register(
    "fn_base64",
    """SELECT event_id,
         base64(encode(props)) AS props_b64,
         decode(from_base64(base64(encode(props)))) AS roundtrip
       FROM events""",
)
def q_fn_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base64 encode/decode round trip (the reference's cache encoding)."""
    ev = read_table(spark, sf_dir, "events")
    b64 = F.base64(F.col("props").cast("binary"))
    return ev.select(
        "event_id",
        b64.alias("props_b64"),
        F.unbase64(b64).cast("string").alias("roundtrip"),
    )


@register(
    "fn_concat_query",
    """SELECT o_orderkey,
         concat_ws(',', CAST(o_orderkey AS VARCHAR), o_orderstatus,
                   o_orderpriority) AS field_csv
       FROM orders""",
)
def q_fn_concat_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-string assembly (fields.mkString(','))."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.concat_ws(
            ",", F.col("o_orderkey").cast("string"), "o_orderstatus", "o_orderpriority"
        ).alias("field_csv"),
    )


# ===========================================================================
# §2.6 — join (the downstream use case proj_flatten_scalar exists for)
# ===========================================================================


@register(
    "join_equi_inner",
    """SELECT c.c_mktsegment,
         COUNT(*) AS n_orders,
         ROUND(SUM(o.o_totalprice), 2) AS sum_totalprice
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY c.c_mktsegment""",
)
def q_join_equi_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-inner join, dimension side broadcast (no shuffle of the
    fact side for the join; one shuffle for the aggregation)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_totalprice"),
        )
    )
