"""Semantic checks for operators/governance.py on constructed inputs
(the DuckDB oracles cover the real tables; these pin the arithmetic)."""

from __future__ import annotations

import pytest

from proto_to_avro_ql_spark.operators.governance import (
    domain_mix_weights,
    quality_funnel,
    repetition_signals,
    unigram_lm_score,
)


@pytest.mark.usefixtures("spark")
def test_repetition_signals_known_values(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a b"), (2, "one two three four five")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_signals(docs).collect()}
    r1 = rows[1]
    assert r1.n_tokens == 5
    assert r1.dup_token_ratio == pytest.approx(0.6)  # 1 - 2/5
    assert r1.top_token_share == pytest.approx(0.8)  # 4/5
    assert r1.keep is False
    r2 = rows[2]
    assert r2.dup_token_ratio == 0.0 and r2.top_token_share == pytest.approx(0.2)
    assert r2.keep is True


@pytest.mark.usefixtures("spark")
def test_domain_mix_budget_binds_on_scarcest_source(spark):
    # src_a: 4 tokens, src_b: 12 tokens; equal target shares.
    docs = spark.createDataFrame(
        [
            ("src_a", "t1 t2 t3 t4"),
            ("src_b", "u1 u2 u3 u4 u5 u6"),
            ("src_b", "v1 v2 v3 v4 v5 v6"),
            ("src_c", "ignored entirely"),
        ],
        "source string, text string",
    )
    out = {
        r.source: r
        for r in domain_mix_weights(docs, {"src_a": 0.5, "src_b": 0.5}).collect()
    }
    assert set(out) == {"src_a", "src_b"}  # unlisted sources excluded
    # budget = min(4/0.5, 12/0.5) = 8 → src_a fully used, src_b at 1/3
    assert out["src_a"].sample_tokens == pytest.approx(4.0)
    assert out["src_a"].sample_fraction == pytest.approx(1.0)
    assert out["src_b"].sample_tokens == pytest.approx(4.0)
    assert out["src_b"].sample_fraction == pytest.approx(0.333333, abs=1e-6)


@pytest.mark.usefixtures("spark")
def test_unigram_lm_score_ranks_common_above_rare(spark):
    import math

    # corpus: "common" appears 8x, rare tokens once each
    docs = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common common common common"),
            (3, "rare1 rare2 rare3 rare4"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_lm_score(docs).collect()}
    # total 12 tokens: p(common)=8/12, p(rare_i)=1/12
    assert out[1].avg_logprob == pytest.approx(math.log(8 / 12), abs=1e-5)
    assert out[3].avg_logprob == pytest.approx(math.log(1 / 12), abs=1e-5)
    assert out[1].avg_logprob > out[3].avg_logprob
    assert out[1].n_tokens == 4


@pytest.mark.usefixtures("spark")
def test_quality_funnel_cumulative_and_monotone(spark):
    long_en = "the cat and the dog sat with the happy children near the garden gate"
    docs = spark.createDataFrame(
        [
            (1, long_en),                      # passes all three rules
            (2, "short text"),                 # fails min_tokens
            (3, long_en + " " + "!?#$%" * 40), # fails punct
            (4, "der Hund und die Katze ist nicht hier aber der Mann und die Frau"),  # fails lang
        ],
        "doc_id long, text string",
    )
    stages = {r.stage: r for r in quality_funnel(docs).collect()}
    assert stages["min_tokens"].docs_in == 4
    assert stages["min_tokens"].dropped == 1
    assert stages["max_punct_ratio"].docs_in == stages["min_tokens"].docs_out
    assert stages["max_punct_ratio"].dropped == 1
    assert stages["lang"].docs_in == stages["max_punct_ratio"].docs_out
    assert stages["lang"].dropped == 1 and stages["lang"].docs_out == 1
    for r in stages.values():
        assert r.docs_in - r.docs_out == r.dropped >= 0


class TestBigramLm:
    def test_repeated_order_scores_higher_than_shuffled(self, spark):
        """The order-sensitive property unigram stats cannot see: a doc
        whose bigrams all repeat corpus patterns scores higher than one
        with the same tokens in a never-seen order."""
        from proto_to_avro_ql_spark.operators.governance import bigram_lm_score

        docs = spark.createDataFrame(
            [
                (1, "a b a b a b a b"),
                (2, "a b a b a b a b"),
                (3, "b b a a b a b a"),  # same unigram counts, odd order
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.avg_logprob for r in bigram_lm_score(docs).collect()}
        assert out[1] == out[2]
        assert out[1] > out[3]

    def test_single_token_doc_drops_out(self, spark):
        from proto_to_avro_ql_spark.operators.governance import bigram_lm_score

        docs = spark.createDataFrame(
            [(1, "only"), (2, "two words")], "doc_id long, text string"
        )
        out = bigram_lm_score(docs).collect()
        assert [r.doc_id for r in out] == [2]
        assert out[0].n_bigrams == 1 and out[0].avg_logprob == 0.0  # ln(1)


class TestTokenEntropy:
    def test_known_values(self, spark):
        from math import log

        from proto_to_avro_ql_spark.operators.governance import token_entropy

        docs = spark.createDataFrame(
            [(1, "a a b b"), (2, "a a a a"), (3, "a b c d")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in token_entropy(docs).collect()}
        assert rows[1].n_tokens == 4 and rows[1].n_distinct == 2
        # terms are rounded to DECIMAL(38,6) pre-sum (cross-engine
        # stability), so the absolute error is bounded by n_distinct*5e-7
        assert rows[1].token_entropy == pytest.approx(log(2), abs=1e-5)
        # zero-entropy doc must come out +0.0 (not -0.0: the engines'
        # canonical reprs differ and the driver hashes reprs)
        assert rows[2].token_entropy == 0.0
        assert str(rows[2].token_entropy) == "0.0"
        assert rows[3].token_entropy == pytest.approx(log(4), abs=1e-5)

    def test_repetitive_below_diverse(self, spark):
        from proto_to_avro_ql_spark.operators.governance import token_entropy

        docs = spark.createDataFrame(
            [(1, "spam spam spam spam ham"), (2, "the quick brown fox jumps")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in token_entropy(docs).collect()}
        assert rows[1].token_entropy < rows[2].token_entropy
