"""Cross-engine parity for the portable sketch kernels (round 8).

The rows-only → oracled upgrades of the sketch entries rest on ONE
claim: the Spark and DuckDB spellings of each kernel fragment compute
bit-identical integers. These tests pin that claim directly — a dense
integer grid plus adversarial string inputs through every fragment
pair, compared value-for-value across engines. If an engine changes
its ``%``/``FLOOR``/``bin``/fold semantics, this fails before any
oracle does (and diagnoses WHICH fragment drifted, which a whole-entry
hash mismatch cannot).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from proto_to_avro_ql_spark.functions import portable as P


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


GRID = 50_000


class TestMixerParity:
    def test_mix31_bit_identical_on_grid(self, spark, con):
        """0..49999 plus values near the 31-bit ring edge, both raw
        mixes compared element-wise via an order-insensitive checksum
        AND min/max (a permutation cannot sneak past both)."""
        md = P.mix31_duckdb_sql("v")
        ms = P.mix31_spark_sql("v")
        d = con.execute(
            f"SELECT SUM({md}), MIN({md}), MAX({md}), "
            f"SUM({md} * (v % 97)) "
            f"FROM (SELECT unnest(range(0, {GRID})) AS v)"
        ).fetchone()
        sdf = spark.range(0, GRID).select(F.col("id").alias("v"))
        s = tuple(
            sdf.select(
                F.expr(f"SUM({ms})"),
                F.expr(f"MIN({ms})"),
                F.expr(f"MAX({ms})"),
                F.expr(f"SUM(({ms}) * (v % 97))"),
            ).collect()[0]
        )
        assert tuple(d) == s

    def test_mix31_handles_negative_and_large_keys(self, spark, con):
        vals = [-1, -123456789, 0, 1, M := P.M31 - 1, P.M31, P.M31 + 7, 2**52]
        md = P.mix31_duckdb_sql("v")
        ms = P.mix31_spark_sql("v")
        d = [
            con.execute(f"SELECT {md} FROM (SELECT CAST(? AS BIGINT) AS v)", [x])
            .fetchone()[0]
            for x in vals
        ]
        sdf = spark.createDataFrame([(x,) for x in vals], "v long")
        s = [r[0] for r in sdf.select(F.expr(ms)).collect()]
        assert d == s
        # and the mix stays on the 31-bit ring
        assert all(0 <= x < P.M31 for x in d)

    def test_string_fold_parity_including_unicode(self, spark, con):
        strs = [
            "click", "error", "purchase", "signup", "view", "",
            "日本語 テスト", "héllo wörld", "emoji 🚀", "a" * 500,
        ]
        fd = P.str_code_duckdb_sql("s")
        fs = P.str_code_spark_sql("s")
        d = [
            con.execute(f"SELECT {fd} FROM (SELECT CAST(? AS VARCHAR) AS s)", [x])
            .fetchone()[0]
            for x in strs
        ]
        sdf = spark.createDataFrame(pd.DataFrame({"s": strs}))
        s = [r[0] for r in sdf.select(F.expr(fs)).collect()]
        assert d == s
        assert len(set(d)) == len(strs)  # no accidental collisions here


class TestHllFragmentParity:
    def test_bucket_and_rho_grid(self, spark, con):
        md = P.mix31_duckdb_sql("v")
        ms = P.mix31_spark_sql("v")
        b, r = P.hll_bucket_sql("h31"), P.hll_rho_sql("h31")
        d = con.execute(
            f"WITH h AS (SELECT {md} AS h31 FROM "
            f"(SELECT unnest(range(0, {GRID})) AS v)) "
            f"SELECT SUM({b}), SUM({r}), MIN({b}), MAX({b}), MAX({r}) FROM h"
        ).fetchone()
        s = tuple(
            spark.range(0, GRID)
            .select(F.expr(ms.replace("v", "id")).alias("h31"))
            .select(
                F.expr(f"SUM({b})"),
                F.expr(f"SUM({r})"),
                F.expr(f"MIN({b})"),
                F.expr(f"MAX({b})"),
                F.expr(f"MAX({r})"),
            )
            .collect()[0]
        )
        assert tuple(d) == s
        assert 0 <= d[2] and d[3] < P.HLL_M and d[4] <= 24

    def test_estimate_formula_parity_on_synthetic_registers(self, spark, con):
        """Drive S/V/estimate over synthetic register relations covering
        the linear-counting arm, the threshold edge, and the raw arm."""
        for n_regs, rho in [(3, 2), (100, 1), (256, 7), (256, 1), (40, 24)]:
            rows = [(i, rho) for i in range(n_regs)]
            s_sql, v_sql = P.hll_s_v_sql("rho", "COUNT(*)")
            est = P.hll_estimate_sql("S", "V")
            d = con.execute(
                "WITH regs AS (SELECT * FROM (VALUES "
                + ", ".join(f"({b}, {r})" for b, r in rows)
                + ") t(bucket, rho)), sv AS "
                f"(SELECT {s_sql} AS S, {v_sql} AS V FROM regs) "
                f"SELECT CAST({est} AS BIGINT) FROM sv"
            ).fetchone()[0]
            sdf = spark.createDataFrame(rows, "bucket long, rho int")
            s = (
                sdf.agg(
                    F.expr(s_sql).alias("S"), F.expr(v_sql).alias("V")
                )
                .select(F.expr(f"CAST({est} AS BIGINT)"))
                .collect()[0][0]
            )
            assert d == s, (n_regs, rho, d, s)


class TestCmsFragmentParity:
    def test_cms_bucket_parity_over_rows_and_codes(self, spark, con):
        bd = P.cms_bucket_duckdb_sql("c", "r")
        bs = P.cms_bucket_spark_sql("c", "r")
        d = con.execute(
            f"SELECT SUM({bd} * (1 + r)), MIN({bd}), MAX({bd}) FROM "
            f"(SELECT unnest(range(0, 2000)) AS c), "
            f"(SELECT unnest(range(0, {P.CMS_D})) AS r)"
        ).fetchone()
        sdf = (
            spark.range(0, 2000)
            .select(F.col("id").alias("c"))
            .crossJoin(spark.range(0, P.CMS_D).select(F.col("id").alias("r")))
        )
        s = tuple(
            sdf.select(
                F.expr(f"SUM(({bs}) * (1 + r))"),
                F.expr(f"MIN({bs})"),
                F.expr(f"MAX({bs})"),
            ).collect()[0]
        )
        assert tuple(d) == s
        assert 0 <= d[1] and d[2] < P.CMS_W
