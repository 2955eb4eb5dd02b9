"""Spark-4-native surfaces added round 3: VariantType schema-on-read
and Python UDTF table functions (semantic checks on constructed
inputs; the DuckDB oracles cover the real tables)."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestVariant:
    def test_typed_extraction_and_missing_path(self, spark):
        df = spark.createDataFrame(
            [(1, '{"k": 87, "tag": "x"}'), (2, '{"k": 0}')],
            "event_id long, props string",
        )
        v = F.parse_json("props")
        out = df.select(
            "event_id",
            F.variant_get(v, "$.k", "bigint").alias("k"),
            F.try_variant_get(v, "$.nope", "bigint").alias("missing"),
            F.schema_of_variant(v).alias("vtype"),
        ).collect()
        by_id = {r.event_id: r for r in out}
        assert by_id[1].k == 87 and by_id[2].k == 0
        assert by_id[1].missing is None and by_id[2].missing is None
        # per-row shape introspection: open content means rows may differ
        assert by_id[1].vtype == "OBJECT<k: BIGINT, tag: STRING>"
        assert by_id[2].vtype == "OBJECT<k: BIGINT>"

    def test_variant_keeps_fields_a_declared_schema_would_drop(self, spark):
        """The unknown-field-tolerance story: from_json with a declared
        schema silently drops extra fields; variant keeps them."""
        df = spark.createDataFrame(
            [(1, '{"k": 1, "extra": {"deep": [1, 2, 3]}}')],
            "event_id long, props string",
        )
        v = F.parse_json("props")
        row = df.select(
            F.from_json("props", "k bigint")["k"].alias("declared_k"),
            F.variant_get(v, "$.extra.deep[2]", "bigint").alias("kept"),
        ).collect()[0]
        assert row.declared_k == 1
        assert row.kept == 3  # the path a declared schema never knew about

    def test_variant_expressions_stay_jvm_side(self, spark):
        df = spark.createDataFrame([(1, '{"k": 5}')], "event_id long, props string")
        out = df.select(F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestUdtf:
    def test_udtf_matches_native_posexplode(self, spark, sf_dir):
        """The UDTF path must agree exactly with the native
        split+posexplode plan it mirrors — independent verification of
        the table-function surface."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES
        from proto_to_avro_ql_spark.functions.text import normalize_text
        from proto_to_avro_ql_spark.sources.io import read_table

        got = QUERIES["ext_udtf_tokens"](spark, sf_dir)
        docs = read_table(spark, sf_dir, "documents")
        want = docs.select(
            "doc_id",
            F.posexplode(F.split(normalize_text(F.col("text")), " ")).alias(
                "pos", "token"
            ),
        ).select("doc_id", F.col("pos").cast("int").alias("pos"), "token")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_udtf_null_input_yields_no_rows(self, spark):
        from pyspark.sql.functions import udtf

        @udtf(returnType="pos int, token string")
        class Tok:
            def eval(self, text):
                if text is None:
                    return
                yield 0, text

        spark.udtf.register("tok_null_probe", Tok)
        df = spark.createDataFrame([(1, None), (2, "x")], "doc_id long, text string")
        df.createOrReplaceTempView("tok_null_src")
        out = spark.sql(
            "SELECT d.doc_id, t.token FROM tok_null_src d, "
            "LATERAL tok_null_probe(d.text) t"
        ).collect()
        assert [(r.doc_id, r.token) for r in out] == [(2, "x")]


class TestPmiAndQuantize:
    def test_pmi_ranks_fixed_collocation_first(self, spark):
        """A pair that ALWAYS co-occurs ('new york') must out-rank pairs
        of independently common tokens."""
        from proto_to_avro_ql_spark.functions.text import normalize_text
        from pyspark.sql.window import Window

        rows = [(i, "new york " + ("the cat " * 5).strip()) for i in range(10)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        toks = F.split(normalize_text(F.col("text")), " ")
        n_t = F.size(toks)
        pairs = F.arrays_zip(
            F.slice(toks, 1, n_t - 1).alias("w1"),
            F.slice(toks, 2, n_t - 1).alias("w2"),
        )
        big = docs.select(F.explode(pairs).alias("p")).select(
            F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
        )
        bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
        c1 = F.sum("c12").over(Window.partitionBy("w1"))
        c2 = F.sum("c12").over(Window.partitionBy("w2"))
        n = F.sum("c12").over(Window.partitionBy())
        scored = bc.select(
            "w1", "w2",
            F.round(F.log((F.col("c12").cast("double") * n)
                          / (c1.cast("double") * c2.cast("double"))), 6).alias("pmi"),
        ).where(F.col("c12") >= 5)
        ranked = [
            (r.w1, r.w2) for r in scored.orderBy(F.desc("pmi"), "w1", "w2").collect()
        ]
        assert ranked[0] == ("new", "york")

    def test_quantize_unit_vector_roundtrip(self, spark):
        """A 3-4-0 vector normalizes to (0.6, 0.8, 0.0) -> int8 (76, 102, 0);
        zero vectors are dropped (no division by zero)."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES
        import os, tempfile

        d = tempfile.mkdtemp(prefix="quant_")
        spark.createDataFrame(
            [(1, [3.0, 4.0, 0.0], 0), (2, [0.0, 0.0, 0.0], 1)],
            "vec_id long, embedding array<float>, label int",
        ).write.parquet(os.path.join(d, "embeddings.parquet"))
        out = QUERIES["ext_embed_quantize"](spark, d).collect()
        got = {(r.vec_id, r.pos): r.q for r in out}
        assert got == {(1, 0): 76, (1, 1): 102, (1, 2): 0}  # vec 2 dropped


class TestVariantStorage:
    def test_unknown_fields_survive_the_parquet_round_trip(self, spark, tmp_path):
        """Fields no reader declared still come back from storage —
        the at-rest unknown-field tolerance the reference's translate
        step drops (ProtoToAvroTranslator.scala:26-33)."""
        d = str(tmp_path / "v")
        df = spark.createDataFrame(
            [(1, '{"k": 1, "future_field": {"nested": [7, 8]}}')],
            "event_id long, props string",
        )
        df.select("event_id", F.parse_json("props").alias("v")).write.parquet(d)
        back = spark.read.parquet(d)
        assert back.schema["v"].dataType.typeName() == "variant"
        row = back.select(
            F.variant_get("v", "$.future_field.nested[1]", "bigint").alias("x")
        ).collect()[0]
        assert row.x == 8


class TestPolymorphicUdtf:
    def test_schema_follows_literal_width(self, spark, sf_dir):
        """The same UDTF yields different column sets for different
        literal widths — schema is an analyze-time function of args."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        out3 = QUERIES["ext_udtf_polymorphic"](spark, sf_dir)
        assert out3.columns == ["doc_id", "tok_0", "tok_1", "tok_2"]
        out5 = spark.sql(
            "SELECT t.* FROM udtf_poly_src d, LATERAL first_n_tokens(d.text, 5) t"
        )
        assert out5.columns == [f"tok_{i}" for i in range(5)]

    def test_non_literal_width_is_rejected(self, spark, sf_dir):
        import pytest as _pytest

        from proto_to_avro_ql_spark.entry_queries import QUERIES

        QUERIES["ext_udtf_polymorphic"](spark, sf_dir)  # registers the UDTF
        with _pytest.raises(Exception, match="literal|constant"):
            spark.sql(
                "SELECT t.* FROM udtf_poly_src d, "
                "LATERAL first_n_tokens(d.text, CAST(d.doc_id AS INT)) t"
            ).collect()


class TestRecursiveCteAndCollation:
    def test_recursive_depth_is_logarithmic(self, spark, sf_dir):
        """Depth must equal the number of div-10 steps to reach a
        root — the recursion iterates per LEVEL, not per row."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        rows = {r.custkey: r for r in QUERIES["ext_recursive_cte"](spark, sf_dir).collect()}
        import math

        for ck, r in list(rows.items())[:50]:
            steps = 0
            k = ck
            while k > 9:
                k //= 10
                steps += 1
            assert r.depth == steps and r.root == k, (ck, r)

    def test_collated_group_merges_case_variants(self, spark):
        df = spark.createDataFrame(
            [("View",), ("VIEW",), ("view",), ("click",)], "et string"
        )
        out = (
            df.select(F.expr("et COLLATE UTF8_LCASE").alias("et"))
            .groupBy("et")
            .count()
            .collect()
        )
        got = {r["count"] for r in out}
        assert len(out) == 2 and got == {3, 1}

    def test_try_arith_null_never_error(self, spark):
        row = spark.sql(
            "SELECT try_divide(1, 0) AS a, try_add(9223372036854775807, 1) AS b, "
            "try_multiply(9223372036854775807, 2) AS c"
        ).collect()[0]
        assert row.a is None and row.b is None and row.c is None
