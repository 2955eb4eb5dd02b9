"""Projection-compiler tests mirroring the reference's test ideas
(SURVEY.md §5): schema pruning, extracted values, user mappings,
defaults/normalization (§1.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from proto_to_avro_ql_spark.plans.compile import (
    Constant,
    Scalar,
    SynthStruct,
    compile_projection,
    projected_schema,
    reference_ordering,
)


@pytest.fixture(scope="module")
def fixture_df(spark):
    """Analog of the reference's synthetic GoogleAdsRow
    (ProtoToAvroMappingTest.scala:12-41): descriptive_name is junk that
    pruning must drop."""
    schema = T.StructType(
        [
            T.StructField(
                "customer",
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField("descriptive_name", T.StringType()),
                    ]
                ),
            ),
            T.StructField(
                "campaign",
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("status", T.StringType()),
                    ]
                ),
            ),
            T.StructField(
                "segments",
                T.StructType([T.StructField("date", T.StringType())]),
            ),
            T.StructField(
                "metrics",
                T.StructType(
                    [
                        T.StructField("impressions", T.LongType()),
                        T.StructField("clicks", T.LongType()),
                    ]
                ),
            ),
        ]
    )
    rows = [
        Row(
            customer=Row(id=123, descriptive_name="ignored_junk"),
            campaign=Row(id=456, name="camp", status="ENABLED"),
            segments=Row(date="2021-01-01"),
            metrics=Row(impressions=10, clicks=None),
        ),
        Row(customer=Row(id=7, descriptive_name=""), campaign=None,
            segments=Row(date=""), metrics=Row(impressions=None, clicks=3)),
    ]
    return spark.createDataFrame(rows, schema)


def field_names(schema: T.StructType, path: str) -> list[str]:
    dt = schema
    for part in path.split("."):
        dt = dt[part].dataType
    return [f.name for f in dt.fields]


class TestPruning:
    def test_exact_field_lists(self, fixture_df):
        out = compile_projection(
            fixture_df,
            ["customer.id", "campaign.id", "campaign.name", "segments.date"],
        )
        # pruning assertion analog (ProtoToAvroMappingTest.scala:96-100)
        assert field_names(out.schema, "customer") == ["id"]
        assert field_names(out.schema, "campaign") == ["id", "name"]
        assert "descriptive_name" not in str(out.schema)

    def test_subtree_includes_all_fields(self, fixture_df):
        out = compile_projection(fixture_df, ["campaign"])
        assert field_names(out.schema, "campaign") == ["id", "name", "status"]

    def test_values(self, fixture_df):
        out = compile_projection(fixture_df, ["customer.id", "campaign.id"]).collect()
        r = next(x for x in out if x.customer.id == 123)
        assert r.campaign.id == 456

    def test_nested_fields_name_sorted(self, fixture_df):
        out = compile_projection(fixture_df, ["campaign.status", "campaign.id"])
        assert field_names(out.schema, "campaign") == ["id", "status"]


class TestDefaults:
    def test_numeric_null_to_zero(self, fixture_df):
        out = compile_projection(fixture_df, ["metrics.impressions", "metrics.clicks"]).collect()
        r = next(x for x in out if x.metrics.clicks == 3)
        assert r.metrics.impressions == 0  # unset int → 0

    def test_empty_string_to_null(self, fixture_df):
        out = compile_projection(fixture_df, ["customer.descriptive_name", "segments.date"]).collect()
        r = next(x for x in out if x.customer.descriptive_name is None)
        assert r.segments.date is None  # '' → null

    def test_unset_message_stays_null(self, fixture_df):
        out = compile_projection(fixture_df, ["campaign.id", "customer.id"]).collect()
        r = next(x for x in out if x.customer.id == 7)
        assert r.campaign is None  # null parent stays null, not defaults


class TestValidation:
    def test_unknown_field(self, fixture_df):
        with pytest.raises(ValueError, match="has no field"):
            compile_projection(fixture_df, ["campaign.nonexistent"])

    def test_unknown_top_level(self, fixture_df):
        with pytest.raises(ValueError, match="has no field"):
            compile_projection(fixture_df, ["nope.id"])

    def test_descend_into_scalar(self, fixture_df):
        with pytest.raises(ValueError, match="not a message"):
            compile_projection(fixture_df, ["customer.id.deeper"])

    def test_empty_query(self, fixture_df):
        with pytest.raises(ValueError, match="at least one"):
            compile_projection(fixture_df, [])


class TestMappings:
    def test_constant_scalar_synth(self, fixture_df):
        out = compile_projection(
            fixture_df,
            ["segments.date"],
            mappings={
                "version": Constant(3, "int"),
                "nullable_const": Constant(None, "string"),
                "campaign_id": Scalar("campaign.id"),
                "metadata": SynthStruct(
                    {"author": Constant("Ben"), "report_date": Scalar("segments.date")}
                ),
            },
        )
        r = next(x for x in out.collect() if x.campaign_id == 456)
        assert r.version == 3
        assert r.nullable_const is None
        assert r.metadata.author == "Ben"
        assert r.metadata.report_date == "2021-01-01"

    def test_ordering_ids_first_metadata_last(self, fixture_df):
        out = compile_projection(
            fixture_df,
            ["segments.date"],
            mappings={
                "campaign_id": Scalar("campaign.id"),
                "metadata": SynthStruct({"author": Constant("Ben")}),
            },
            ordering=reference_ordering,
        )
        assert out.columns[0] == "campaign_id"
        assert out.columns[-1] == "metadata"

    def test_schema_infer_no_action(self, fixture_df):
        schema = projected_schema(fixture_df, ["customer.id"])
        assert [f.name for f in schema["customer"].dataType.fields] == ["id"]


class TestGaql:
    def test_parse_roundtrip_text(self):
        from proto_to_avro_ql_spark.plans.gaql import parse_gaql

        q = parse_gaql(
            "SELECT campaign.id, metrics.clicks FROM ads_row WHERE metrics.clicks > 0"
        )
        assert q.fields == ("campaign.id", "metrics.clicks")
        assert q.resource == "ads_row"
        assert q.text == (
            "SELECT campaign.id, metrics.clicks FROM ads_row WHERE metrics.clicks > 0"
        )

    def test_parse_errors(self):
        import pytest as _pytest

        from proto_to_avro_ql_spark.plans.gaql import parse_gaql

        with _pytest.raises(ValueError, match="Cannot parse"):
            parse_gaql("DELETE FROM x")

    def test_run_gaql_binds_and_filters(self, fixture_df):
        from proto_to_avro_ql_spark.plans.gaql import run_gaql

        out = run_gaql(
            fixture_df.sparkSession,
            "SELECT campaign.id, customer.id FROM t WHERE customer.id = 123",
            resolve_table=lambda n: fixture_df,
        )
        rows = out.collect()
        assert len(rows) == 1 and rows[0].campaign.id == 456


class TestArraysAndEnums:
    def test_array_of_struct_pruning_through_path(self, spark):
        """Querying through an array of messages prunes each element
        (README.md:209-211 analog: can't index into arrays; elements
        pruned below the array)."""
        df = spark.createDataFrame(
            [
                (1, [Row(id=10, junk="x"), Row(id=11, junk="y")]),
                (2, None),
            ],
            T.StructType(
                [
                    T.StructField("k", T.LongType()),
                    T.StructField(
                        "items",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("id", T.LongType()),
                                    T.StructField("junk", T.StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
        out = compile_projection(df, ["k", "items.id"])
        elem = out.schema["items"].dataType.elementType
        assert [f.name for f in elem.fields] == ["id"]  # junk pruned
        rows = {r.k: r.items for r in out.collect()}
        assert [e.id for e in rows[1]] == [10, 11]
        assert rows[2] == []  # null array → [] (proto default)

    def test_repeated_enum_symbols(self, spark):
        from proto_to_avro_ql_spark.functions.defaults import enum_symbol_array

        df = spark.createDataFrame([([0, 2, 4, None],)], "codes array<int>")
        out = df.select(
            enum_symbol_array(
                F.col("codes"), ["UNSPECIFIED", "UNKNOWN", "ENABLED", "PAUSED", "REMOVED"]
            ).alias("syms")
        ).first()
        assert out.syms == ["UNSPECIFIED", "ENABLED", "REMOVED", "UNSPECIFIED"]

    def test_parse_order_limit(self):
        from proto_to_avro_ql_spark.plans.gaql import parse_gaql

        q = parse_gaql(
            "SELECT a.b FROM t WHERE a.b > 1 ORDER BY a.b DESC, a.c LIMIT 7"
        )
        assert q.order_by == (("a.b", "DESC"), ("a.c", "ASC"))
        assert q.limit == 7
        assert q.text.endswith("ORDER BY a.b DESC, a.c ASC LIMIT 7")


class TestMappingCollision:
    def test_mapping_name_collision_raises(self, fixture_df):
        with pytest.raises(ValueError, match="collides"):
            compile_projection(
                fixture_df, ["campaign.id"], mappings={"campaign": Constant(1, "int")}
            )


class TestGaqlCatalog:
    def test_unknown_resource_raises(self, spark, sf_dir):
        import pytest as _pytest

        from proto_to_avro_ql_spark.plans.gaql import default_catalog, run_gaql

        with _pytest.raises(ValueError, match="Unknown resource"):
            run_gaql(
                spark,
                "SELECT x FROM no_such_table",
                resolve_table=default_catalog(spark, sf_dir),
            )


class TestGaqlDuring:
    def test_last_30_days_excludes_anchor(self):
        from proto_to_avro_ql_spark.plans.gaql import expand_during

        out = expand_during("segments.date DURING LAST_30_DAYS", "1995-06-17")
        assert out == "segments.date BETWEEN '1995-05-18' AND '1995-06-16'"

    def test_month_macros(self):
        from proto_to_avro_ql_spark.plans.gaql import expand_during

        assert (
            expand_during("d DURING THIS_MONTH", "2024-03-15")
            == "d BETWEEN '2024-03-01' AND '2024-03-15'"
        )
        # LAST_MONTH across a year boundary
        assert (
            expand_during("d DURING LAST_MONTH", "2024-01-10")
            == "d BETWEEN '2023-12-01' AND '2023-12-31'"
        )

    def test_today_yesterday_and_composition(self):
        from proto_to_avro_ql_spark.plans.gaql import expand_during

        out = expand_during(
            "a DURING YESTERDAY AND b DURING TODAY AND x > 3", "2024-03-01"
        )
        assert "a BETWEEN '2024-02-29' AND '2024-02-29'" in out  # leap year
        assert "b BETWEEN '2024-03-01' AND '2024-03-01'" in out
        assert out.endswith("x > 3")

    def test_during_without_anchor_raises(self):
        import pytest as _pytest

        from proto_to_avro_ql_spark.plans.gaql import expand_during

        with _pytest.raises(ValueError, match="anchor_date"):
            expand_during("d DURING LAST_7_DAYS", None)

    def test_unknown_range_raises(self):
        import pytest as _pytest

        from proto_to_avro_ql_spark.plans.gaql import expand_during

        with _pytest.raises(ValueError, match="Unknown DURING"):
            expand_during("d DURING NEXT_WEEK", "2024-01-01")

    def test_non_during_where_untouched(self):
        from proto_to_avro_ql_spark.plans.gaql import expand_during

        w = "segments.date BETWEEN '1995-01-01' AND '1995-06-30'"
        assert expand_during(w, None) == w


class TestGaqlParameters:
    """PARAMETERS clause grammar (round-4 session-3 addition)."""

    def test_parse_and_roundtrip(self):
        from proto_to_avro_ql_spark.plans.gaql import parse_gaql

        q = parse_gaql(
            "SELECT a.b FROM r WHERE a.b > 1 LIMIT 3"
            " PARAMETERS include_drafts = TRUE"
        )
        assert q.parameters == (("include_drafts", "true"),)
        assert q.limit == 3
        # canonical text reproduces the clause, and reparses to itself
        q2 = parse_gaql(q.text)
        assert q2 == q

    def test_no_parameters_is_empty(self):
        from proto_to_avro_ql_spark.plans.gaql import parse_gaql

        assert parse_gaql("SELECT a.b FROM r").parameters == ()

    def test_bad_parameters_rejected(self):
        import pytest as _pytest
        from proto_to_avro_ql_spark.plans.gaql import parse_gaql

        with _pytest.raises(ValueError):
            parse_gaql("SELECT a.b FROM r PARAMETERS nonsense without equals")


class TestGaqlLiteralMasking:
    """Round-5 parser hardening: clause splitting must never see the
    inside of a quoted string (keywords, commas, DURING macros in
    literals used to shear the WHERE clause apart)."""

    def test_keyword_inside_literal_stays_in_where(self):
        from proto_to_avro_ql_spark.plans.gaql import parse_gaql

        q = parse_gaql(
            "SELECT campaign.name FROM ads_row "
            "WHERE campaign.name = 'x ORDER BY y'"
        )
        assert q.where == "campaign.name = 'x ORDER BY y'"
        assert q.order_by == () and q.limit is None

    def test_comma_inside_literal_does_not_split_lists(self):
        from proto_to_avro_ql_spark.plans.gaql import parse_gaql

        q = parse_gaql(
            "SELECT a.b FROM t WHERE a.c IN ('x,y', 'FROM z') "
            "ORDER BY a.b DESC LIMIT 3"
        )
        assert q.where == "a.c IN ('x,y', 'FROM z')"
        assert q.order_by == (("a.b", "DESC"),) and q.limit == 3

    def test_keyword_inside_double_quoted_literal_stays_in_where(self):
        """Round-5 ADVICE: F.expr (Spark SQL) also accepts double-quoted
        string literals, so masking must cover both quote styles."""
        from proto_to_avro_ql_spark.plans.gaql import parse_gaql

        q = parse_gaql(
            "SELECT campaign.name FROM ads_row "
            'WHERE campaign.name = "x ORDER BY y"'
        )
        assert q.where == 'campaign.name = "x ORDER BY y"'
        assert q.order_by == () and q.limit is None

    def test_comma_inside_double_quoted_literal_does_not_split(self):
        from proto_to_avro_ql_spark.plans.gaql import parse_gaql

        q = parse_gaql(
            'SELECT a.b FROM t WHERE a.c IN ("x,y", \'FROM z\') LIMIT 2'
        )
        assert q.where == 'a.c IN ("x,y", \'FROM z\')'
        assert q.limit == 2

    def test_unterminated_double_quoted_literal_raises(self):
        import pytest as _pytest

        from proto_to_avro_ql_spark.plans.gaql import parse_gaql

        with _pytest.raises(ValueError, match="Unterminated"):
            parse_gaql('SELECT a FROM t WHERE b = "oops')

    def test_during_inside_literal_not_rewritten(self):
        from proto_to_avro_ql_spark.plans.gaql import expand_during

        # no anchor needed: the only DURING is quoted text
        assert (
            expand_during("note = 'x DURING TODAY'", None)
            == "note = 'x DURING TODAY'"
        )

    def test_unterminated_literal_raises(self):
        import pytest as _pytest

        from proto_to_avro_ql_spark.plans.gaql import parse_gaql

        with _pytest.raises(ValueError, match="Unterminated"):
            parse_gaql("SELECT a FROM t WHERE b = 'oops")

    def test_parameters_survive_where_rebuild(self, fixture_df):
        """run_gaql's DURING rebuild used to drop the PARAMETERS clause
        from the query object (harmless at runtime, but the canonical
        cache-key text lost the clause)."""
        from proto_to_avro_ql_spark.plans.gaql import GaqlQuery, expand_during

        q = GaqlQuery(
            ("campaign.id",),
            "t",
            "segments.date DURING YESTERDAY",
            (),
            None,
            (("include_drafts", "true"),),
        )
        rebuilt = GaqlQuery(
            q.fields,
            q.resource,
            expand_during(q.where, "2024-05-02"),
            q.order_by,
            q.limit,
            q.parameters,
        )
        assert rebuilt.parameters == q.parameters
        assert "BETWEEN '2024-05-01' AND '2024-05-01'" in rebuilt.text
        assert "PARAMETERS include_drafts = true" in rebuilt.text


class TestGaqlRoundTripFuzz:
    """hypothesis: structured queries render (GaqlQuery.text) and parse
    back to the same structure — fields, resource, where, order, limit,
    parameters — including literals stuffed with clause keywords."""

    def test_round_trip(self):
        from hypothesis import given, settings, strategies as st

        from proto_to_avro_ql_spark.plans.gaql import GaqlQuery, parse_gaql

        path = st.from_regex(r"[a-z][a-z_]{0,8}(\.[a-z][a-z_]{0,8}){0,2}", fullmatch=True)
        nasty = st.sampled_from(
            ["x", "a,b", "FROM t", "ORDER BY y", "LIMIT 9", "x DURING TODAY", "WHERE 1"]
        )
        where = st.one_of(
            st.none(),
            st.builds(lambda p, lit: f"{p} = '{lit}'", path, nasty),
            st.builds(lambda p, n: f"{p} > {n}", path, st.integers(0, 99)),
            st.builds(
                lambda p, a, b: f"{p} IN ('{a}', '{b}')", path, nasty, nasty
            ),
        )
        orders = st.lists(
            st.tuples(path, st.sampled_from(["ASC", "DESC"])), max_size=2
        ).map(tuple)
        params = st.lists(
            st.tuples(
                st.sampled_from(["include_drafts", "omit_unselected_resource_names"]),
                st.sampled_from(["true", "false"]),
            ),
            max_size=2,
            unique_by=lambda kv: kv[0],
        ).map(tuple)
        queries = st.builds(
            GaqlQuery,
            st.lists(path, min_size=1, max_size=4, unique=True).map(tuple),
            st.from_regex(r"[a-z][a-z_]{0,10}", fullmatch=True),
            where,
            orders,
            st.one_of(st.none(), st.integers(0, 10_000)),
            params,
        )

        @settings(max_examples=300, deadline=None)
        @given(queries)
        def check(q):
            back = parse_gaql(q.text)
            assert back == q, (q.text, back)

        check()
