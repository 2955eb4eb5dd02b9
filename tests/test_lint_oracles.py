"""The oracle-exactness invariants as an executable gate.

The rules that fixed the r01/r02 driver failures lived only in prose
(ROADMAP.md "Standing invariants"); tools/lint_oracles.py automates the
regex-able subset. This test (a) keeps the whole corpus clean — all 254
oracles plus the package source — and (b) proves the lint actually
fires by planting one violation per rule.
"""

from __future__ import annotations

from tools.lint_oracles import find_violations, lint_all


class TestCorpusClean:
    def test_every_oracle_and_source_file_clean(self):
        bad = lint_all()
        assert bad == {}, bad


class TestPlantedViolationsFire:
    def test_r1_round_of_float_sum(self):
        # the literal r01 failure shape: float-accumulated sum, rounded
        hits = find_violations(
            "SELECT event_type, ROUND(SUM(value), 4) AS s"
            " FROM events GROUP BY 1"
        )
        assert any(h.startswith("R1") for h in hits), hits

    def test_r1_bare_float_sum(self):
        hits = find_violations("SELECT SUM(l_extendedprice) FROM lineitem")
        assert any(h.startswith("R1") for h in hits), hits

    def test_r1_explicit_double_cast(self):
        hits = find_violations("SELECT AVG(CAST(n_chars AS DOUBLE)) FROM d")
        assert any(h.startswith("R1") for h in hits), hits

    def test_r2_scaled_decimal_product(self):
        hits = find_violations(
            "SELECT CAST(a AS DECIMAL(38,6)) * CAST(b AS DECIMAL(38,6)) FROM t"
        )
        assert any(h.startswith("R2") for h in hits), hits

    def test_r4_computed_to_scaled_decimal(self):
        hits = find_violations(
            "SELECT CAST(x / y AS DECIMAL(38,6)) FROM t"
        )
        assert any(h.startswith("R4") for h in hits), hits


class TestSanctionedPatternsPass:
    def test_decimal_accumulation_clean(self):
        assert not find_violations(
            "SELECT SUM(CAST(value AS DECIMAL(38,6))) FROM events"
        )

    def test_windowed_float_sum_clean(self):
        # frame-ordered accumulation is deterministic on both engines
        assert not find_violations(
            "SELECT SUM(value) OVER (PARTITION BY k ORDER BY ts) FROM events"
        )

    def test_case_predicate_on_float_clean(self):
        # float column only guards an integer summand
        assert not find_violations(
            "SELECT SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) FROM l"
        )

    def test_unscaled_decimal_product_clean(self):
        # DECIMAL(38,0) products are the sanctioned integer-micros route
        assert not find_violations(
            "SELECT CAST(obs * 1000000 AS DECIMAL(38,0))"
            " * CAST(rn AS DECIMAL(38,0)) FROM t"
        )

    def test_unbalanced_guard_terminates(self):
        """An unbalanced LN( (e.g. inside a quoted fragment) must not
        hang the guard-stripping loop — it used to spin forever when
        the reconstructed 'LN(inner)' never matched for str.replace."""
        from tools.lint_oracles import _outside_guards

        assert _outside_guards("A / LN(B + (C") == "A / LN⟨⟩"
        assert (
            _outside_guards("LN(X) + SQRT(Y) / LN(unclosed")
            == "LN⟨⟩ + SQRT⟨⟩ / LN⟨⟩"
        )

    def test_rounded_ln_into_decimal_clean(self):
        # the sanctioned transcendental kernel: round first, then cast
        assert not find_violations(
            "SELECT CAST(ROUND(ln(CAST(a AS DOUBLE) / CAST(b AS DOUBLE)), 6)"
            " AS DECIMAL(38,6)) FROM t"
        )


class TestPureSelectOracles:
    """r6 ADVICE #3: the shared per-sf_dir DuckDB connection is
    stateless only while every oracle is a pure read. Both enforcement
    layers are pinned: the run-time rejection in duckdb_run and the
    registry-wide invariant the static R5 lint rides on."""

    def test_runtime_rejects_non_select(self):
        import pytest as _pytest

        from tests.oracle_check import duckdb_run

        for sql in ("SET threads=1", "CREATE TABLE x(a INT)",
                    "INSTALL httpfs", "INSERT INTO t VALUES (1)", "  "):
            with _pytest.raises(ValueError, match="one pure SELECT"):
                duckdb_run("/root/testdata/sf0.001", sql)

    def test_runtime_rejects_cte_prefixed_dml(self):
        """r7 ADVICE: DuckDB accepts CTE-prefixed DML, so the old
        first-token guard let 'WITH ... INSERT INTO ...' through and
        it MUTATED the shared connection. The parser-based guard must
        classify it as INSERT and reject."""
        import pytest as _pytest

        from tests.oracle_check import duckdb_run

        for sql in (
            "WITH c AS (SELECT 1 AS x) INSERT INTO t SELECT * FROM c",
            "SELECT 1; SELECT 2",  # multi-statement: second could be DML
        ):
            with _pytest.raises(ValueError, match="one pure SELECT"):
                duckdb_run("/root/testdata/sf0.001", sql)

    def test_runtime_accepts_select_with_and_comments(self):
        from tests.oracle_check import duckdb_run

        assert len(duckdb_run("/root/testdata/sf0.001", "SELECT 1 AS a")) == 1
        assert (
            len(
                duckdb_run(
                    "/root/testdata/sf0.001",
                    "  WITH t AS (SELECT 1 AS a) SELECT * FROM t",
                )
            )
            == 1
        )
        # r7 ADVICE: the first-token guard false-rejected oracles that
        # start with a SQL comment; the parser-based guard must not.
        assert (
            len(
                duckdb_run(
                    "/root/testdata/sf0.001",
                    "-- leading comment\nSELECT 1 AS a",
                )
            )
            == 1
        )

    def test_every_registered_oracle_is_pure(self):
        import duckdb

        from proto_to_avro_ql_spark.entry_queries import ORACLES

        for name, sql in ORACLES.items():
            stmts = duckdb.extract_statements(sql)
            assert len(stmts) == 1, (name, [str(s.type) for s in stmts])
            assert stmts[0].type == duckdb.StatementType.SELECT, (
                name,
                str(stmts[0].type),
            )
