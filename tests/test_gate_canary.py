"""Canary for the oracle gate itself: every claim of '361/361 green'
rests on tests/oracle_check.compare actually DETECTING divergence. If
a refactor ever made the comparison vacuous (hash of nothing, columns
dropped before hashing, dtype check skipped), the whole verification
story would go green while checking nothing. These tests feed compare
deliberately-broken oracles and assert each failure mode trips the
exact flag it should — and that the strictness contract documented in
oracle_check's module docstring (full-precision floats, type-tagged
values, per-column dtypes) really is enforced."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle_check import compare

SF = "/root/testdata/sf0.001"


def GOOD_SPARK(spark, sf_dir):
    """A tiny deterministic Spark query over the region table."""
    from proto_to_avro_ql_spark.sources.io import read_table

    return read_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k"), F.col("r_name").alias("name")
    )


GOOD_SQL = "SELECT r_regionkey AS k, r_name AS name FROM region"


class TestGateDetectsDivergence:
    def test_matching_query_passes(self, spark):
        res = compare(spark, SF, "canary_ok", GOOD_SPARK, GOOD_SQL)
        assert res["ok"] and res["hash_match"]

    def test_value_mismatch_detected(self, spark):
        res = compare(
            spark, SF, "canary_val", GOOD_SPARK,
            "SELECT CASE WHEN r_regionkey = 2 THEN 99 ELSE r_regionkey END"
            " AS k, r_name AS name FROM region",
        )
        assert res["count_match"] and res["cols_match"]
        assert not res["hash_match"] and not res["ok"]

    def test_row_count_mismatch_detected(self, spark):
        res = compare(
            spark, SF, "canary_rows", GOOD_SPARK,
            GOOD_SQL + " WHERE r_regionkey <> 0",
        )
        assert not res["count_match"] and not res["ok"]

    def test_column_name_mismatch_detected(self, spark):
        res = compare(
            spark, SF, "canary_cols", GOOD_SPARK,
            "SELECT r_regionkey AS key, r_name AS name FROM region",
        )
        assert not res["cols_match"] and not res["ok"]

    def test_dtype_mismatch_detected(self, spark):
        # int64 vs float64 on the same values — the r01/r02 failure class
        res = compare(
            spark, SF, "canary_dtype", GOOD_SPARK,
            "SELECT CAST(r_regionkey AS DOUBLE) AS k, r_name AS name"
            " FROM region",
        )
        assert res["dtype_mismatch"] and not res["ok"]

    def test_last_ulp_float_difference_detected(self, spark):
        """Full-precision repr hashing: a 1-ulp float drift must NOT
        hash equal (the strictness that forces decimal-stable sums)."""
        def sp(spark_, sf_dir):
            return spark_.range(1).select(F.lit(0.1 + 0.2).alias("x"))

        res = compare(spark, SF, "canary_ulp", sp, "SELECT 0.3 AS x")
        # 0.1+0.2 != 0.3 in doubles; both are float64 columns
        assert res["count_match"] and res["cols_match"]
        assert not res["hash_match"] and not res["ok"]

    def test_int_vs_float_same_value_detected(self, spark):
        """Type-tagged canon: int 5 and float 5.0 differ (HUGEINT →
        float64 vs bigint → int64 — the round-2 lesson)."""
        def sp(spark_, sf_dir):
            return spark_.range(1).select(F.lit(5).cast("long").alias("x"))

        res = compare(spark, SF, "canary_intfloat", sp,
                      "SELECT CAST(5.0 AS DOUBLE) AS x")
        assert not res["ok"]

    def test_rows_only_mode_reports_itself(self, spark):
        res = compare(spark, SF, "canary_rowsonly", GOOD_SPARK, None)
        assert res["mode"] == "rows-only" and res["ok"]
