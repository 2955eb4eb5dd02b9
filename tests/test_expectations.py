from __future__ import annotations

from pyspark.sql import functions as F

from proto_to_avro_ql_spark.operators.expectations import (
    ColumnRule,
    check_fk_rule,
    expectation_report,
)


class TestExpectations:
    def test_column_rules_one_pass_counts(self, spark):
        df = spark.createDataFrame(
            [(1, 10.0), (2, -5.0), (3, 200.0), (4, None)], "id long, v double"
        )
        rules = [
            ColumnRule("v_positive", F.col("v") <= 0),
            ColumnRule("v_below_100", F.col("v") > 100),
            ColumnRule("v_not_null", F.col("v").isNull()),
        ]
        out = {r.rule: r for r in expectation_report(spark, [(df, rules)]).collect()}
        assert out["v_positive"].n_violations == 1
        assert out["v_below_100"].n_violations == 1
        assert out["v_not_null"].n_violations == 1
        assert all(r.n_rows == 4 for r in out.values())
        assert out["v_positive"].violation_ratio == 0.25

    def test_fk_rule_counts_orphans(self, spark):
        child = spark.createDataFrame([(1,), (2,), (9,)], "k long")
        parent = spark.createDataFrame([(1,), (2,)], "p long")
        row = check_fk_rule(spark, "fk", child, "k", parent, "p").first()
        assert (row.n_rows, row.n_violations) == (3, 1)

    def test_null_violations_on_empty_table(self, spark):
        df = spark.createDataFrame([], "id long, v double")
        rules = [ColumnRule("v_positive", F.col("v") <= 0)]
        row = expectation_report(spark, [(df, rules)]).first()
        assert row.n_violations == 0 and row.n_rows == 0
