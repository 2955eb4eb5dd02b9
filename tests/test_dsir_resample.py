"""Property tests for ext_dsir_resample's deterministic systematic
sampler and the banded_global_cumsum primitive it rides on.

The DuckDB oracle already pins Spark↔DuckDB equality; these tests pin
the MATH — a pure-Python exact-integer reference of systematic
resampling (positions as rationals, compared by cross-multiplication,
no floats anywhere) — and the sampler's defining invariant Σcopies = n.
"""

from __future__ import annotations

from fractions import Fraction

import pytest

from pyspark.sql import functions as F

from proto_to_avro_ql_spark.entry_queries import QUERIES
from proto_to_avro_ql_spark.entry_registry import (
    _DSIR_N_SAMPLES,
    _DSIR_W_CAP,
    _dsir_scored,
    read_table,
)
from proto_to_avro_ql_spark.functions import portable as PK
from proto_to_avro_ql_spark.functions import text as TX
from proto_to_avro_ql_spark.operators.layout import banded_global_cumsum

SF = "/root/testdata/sf0.001"


def ref_systematic(weights: list[tuple[int, int]], n: int) -> dict[int, int]:
    """Exact-rational systematic resampling: doc i (in doc_id order)
    is drawn once per position p_j = (2j+1)·tw/2n, j∈[0,n), falling in
    [cum_{i-1}, cum_i). Written from the algorithm, not the SQL."""
    tw = sum(w for _, w in weights)
    positions = [Fraction((2 * j + 1) * tw, 2 * n) for j in range(n)]
    out: dict[int, int] = {}
    cum = 0
    it = iter(sorted(weights))
    doc, w = next(it)
    hi = cum + w
    for p in positions:
        while p >= hi:
            doc, w = next(it)
            hi += w
        out[doc] = out.get(doc, 0) + 1
    return out


def _weights(spark) -> list[tuple[int, int]]:
    docs = read_table(spark, SF, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(TX.normalize_text(F.col("text")), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    coded = toks.select(
        "doc_id", "lang", F.expr(PK.str_code_spark_sql("tok")).alias("code")
    )
    bkt = coded.select(
        "doc_id",
        "lang",
        (F.expr(PK.mix31_spark_sql("code")) % 64).alias("b"),
    )
    scored = _dsir_scored(bkt).collect()
    return [
        (r["doc_id"], 1 + min(max(r["dsir_micro"], 0), _DSIR_W_CAP))
        for r in scored
    ]


class TestSystematicResample:
    def test_copies_sum_to_n_and_match_exact_reference(self, spark):
        got = {
            r["doc_id"]: r["copies"]
            for r in QUERIES["ext_dsir_resample"](spark, SF).collect()
        }
        assert sum(got.values()) == _DSIR_N_SAMPLES
        ref = ref_systematic(_weights(spark), _DSIR_N_SAMPLES)
        assert got == ref

    def test_reference_sampler_axioms(self):
        # A doc with >= tw/n weight share is guaranteed floor(n·w/tw)
        # draws; total always n; zero-ish weights can still be drawn at
        # most once per interval crossing.
        weights = [(1, 5), (2, 1), (3, 994)]
        out = ref_systematic(weights, 100)
        assert sum(out.values()) == 100
        assert out[3] >= 99  # 99.4% of the mass
        assert out.get(2, 0) <= 1


class TestComposedPipeline:
    def test_budget_cut_matches_exact_reference(self, spark):
        """End-to-end pin of ext_dsir_pipeline: recompute the resample
        + greedy token-budget cut in plain Python from the bigram
        scored relation and compare every output row."""
        from proto_to_avro_ql_spark.entry_registry import _dsir_bigram_bkt

        scored = _dsir_scored(_dsir_bigram_bkt(spark, SF)).collect()
        meta = {
            r["doc_id"]: (
                r["lang"],
                r["n_toks"],
                1 + min(max(r["dsir_micro"], 0), _DSIR_W_CAP),
            )
            for r in scored
        }
        weights = [(d, w) for d, (_, _, w) in meta.items()]
        copies = ref_systematic(weights, _DSIR_N_SAMPLES)
        sel = [
            (d, meta[d][0], meta[d][1], meta[d][2], c, meta[d][1] * c)
            for d, c in sorted(copies.items())
            if c > 0
        ]
        total = sum(contrib for *_, contrib in sel)
        budget = (total + 1) // 2
        ref = {}
        cum = 0
        for d, lang, n_toks, w, c, contrib in sorted(
            sel, key=lambda r: (-r[3], r[0])
        ):
            if cum >= budget:
                break
            cum += contrib
            ref[d] = (lang, n_toks, w, c, cum)
        got = {
            r["doc_id"]: (
                r["lang"],
                r["n_toks"],
                r["weight"],
                r["copies"],
                r["cum_tokens"],
            )
            for r in QUERIES["ext_dsir_pipeline"](spark, SF).collect()
        }
        assert got == ref
        # The greedy prefix invariant: kept mass reaches the budget,
        # and dropping the boundary doc would fall under it.
        kept = sum(n * c for (_, n, _, c, _) in ref.values())
        assert kept >= budget


class TestReservedColumnGuards:
    def test_cumsum_rejects_colliding_input(self, spark):
        """withColumn silently replaces same-named caller columns, so
        the banded helpers must refuse reserved temp names loudly
        (round-10 advice)."""
        df = spark.createDataFrame([(1, 2, 3)], "k long, v long, _band long")
        with pytest.raises(ValueError, match="_band"):
            banded_global_cumsum(
                df, (F.col("k") / 8).cast("bigint"), [F.col("k")], F.col("v")
            )

    def test_rank_rejects_colliding_input(self, spark):
        from proto_to_avro_ql_spark.operators.layout import banded_global_rank

        df = spark.createDataFrame([(1, 7)], "k long, _lrank long")
        with pytest.raises(ValueError, match="_lrank"):
            banded_global_rank(
                df, (F.col("k") / 8).cast("bigint"), [F.col("k")]
            )


class TestBandedGlobalCumsum:
    def test_matches_naive_global_window(self, spark):
        # k = a permutation of 0..199 (gcd(53, 200) = 1 → unique keys)
        rows = [(i * 53 % 200, (i * 13) % 5 + 1) for i in range(200)]
        df = spark.createDataFrame(rows, "k long, v long")
        got = {
            r["k"]: r["cum"]
            for r in banded_global_cumsum(
                df,
                band=(F.col("k") / 10).cast("bigint"),
                order_cols=[F.col("k")],
                value=F.col("v"),
                name="cum",
            ).collect()
        }
        acc, ref = 0, {}
        for k, v in sorted(rows):
            acc += v
            ref[k] = acc
        assert got == ref

    def test_total_equals_sum(self, spark):
        df = spark.createDataFrame([(i, 2) for i in range(50)], "k long, v long")
        out = banded_global_cumsum(
            df, (F.col("k") / 8).cast("bigint"), [F.col("k")], F.col("v")
        )
        assert out.agg(F.max("_gcum")).collect()[0][0] == 100
