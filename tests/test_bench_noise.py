"""Pin the bench noise-envelope math and the bench_compare mover
classifier (r8 verdict, What's-wrong #1: 8 host-noise movers >=30%
read as "regressions without a NOTE" and were adjudicated only in
ROADMAP prose; the envelope makes that adjudication mechanical).

Pure functions only — no Spark session needed.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tools"))

from bench import noise_envelope, rel_spread  # noqa: E402
from bench_compare import (  # noqa: E402
    classify,
    median_shift,
    mover_gate,
    noise_bound,
    shift_adjust,
)


class TestRelSpread:
    def test_basic(self):
        import pytest

        # median 1.0, max-min = 0.4 -> 40%
        assert rel_spread([0.8, 1.0, 1.2]) == pytest.approx(0.4)

    def test_identical_passes(self):
        assert rel_spread([2.0, 2.0, 2.0]) == 0.0

    def test_empty_and_zero_guard(self):
        assert rel_spread([]) == 0.0
        assert rel_spread([0.0, 0.0]) == 0.0


class TestNoiseEnvelope:
    def test_stats_and_drift(self):
        pm = {
            "q1": [1.0, 1.0, 1.0],      # spread 0.0
            "q2": [1.0, 1.1, 1.2],      # spread ~0.1818
            "q3": [2.0, 2.0, 3.0],      # spread 0.5
        }
        env = noise_envelope(pm, "q1", control_main=1.0, control_end=1.18)
        assert env["median_rel_spread"] == round(0.2 / 1.1, 4)
        # nearest-rank p90 of 3 points = the max
        assert env["p90_rel_spread"] == 0.5
        assert env["control_drift_rel"] == round(0.18, 4)
        assert env["n_queries"] == 3
        assert env["control_query"] == "q1"

    def test_empty_run(self):
        env = noise_envelope({}, "q", 0.0, 0.0)
        assert env["median_rel_spread"] == 0.0
        assert env["p90_rel_spread"] == 0.0
        assert env["control_drift_rel"] == 0.0

    def test_p90_nearest_rank_is_not_max_on_larger_runs(self):
        # 20 queries: one extreme tail value must NOT set p90
        pm = {f"q{i}": [1.0, 1.0, 1.0 + 0.01 * i] for i in range(19)}
        pm["tail"] = [1.0, 1.0, 9.0]  # 800% spread outlier
        env = noise_envelope(pm, "q0", 1.0, 1.0)
        assert env["p90_rel_spread"] < 1.0  # the 800% tail excluded


def _blob(env=None, passes=None):
    b = {}
    if env is not None:
        b["noise_envelope"] = env
    if passes is not None:
        b["passes"] = passes
    return b


ENV = {"p90_rel_spread": 0.25, "control_drift_rel": 0.10}


class TestNoiseBound:
    def test_both_sides_measured(self):
        old = _blob(ENV, {"q": [1.0, 1.0, 1.1]})   # spread 0.1
        new = _blob(ENV, {"q": [1.0, 1.1, 1.15]})  # spread ~0.136
        b = noise_bound("q", old, new)
        # per-query spreads sum to ~0.236 < p90 base 0.25 -> base wins
        assert b == 0.25 + 0.10

    def test_per_query_spread_can_exceed_base(self):
        old = _blob(ENV, {"q": [1.0, 1.0, 1.3]})  # 0.3
        new = _blob(ENV, {"q": [1.0, 1.0, 1.2]})  # 0.2
        assert noise_bound("q", old, new) == 0.5 + 0.10

    def test_one_sided_envelope_borrows(self):
        # r08 stamps predate the envelope: the r09 side's envelope must
        # still yield a mechanical bound (symmetric-noise assumption).
        old = _blob(None)
        new = _blob(ENV, {"q": [1.0, 1.0, 1.0]})
        assert noise_bound("q", old, new) == 0.25 + 0.10

    def test_no_envelope_anywhere(self):
        assert noise_bound("q", _blob(None), _blob(None)) is None


class TestClassify:
    def test_within_noise_beats_note(self):
        assert classify(+0.30, noted=True, bound=0.35) == "within-noise"

    def test_noted_regression_beyond_noise(self):
        assert classify(+0.50, noted=True, bound=0.35) == "noted"

    def test_unnoted_regression_beyond_noise(self):
        assert classify(+0.50, noted=False, bound=0.35) == "regression"

    def test_improvement_beyond_noise(self):
        assert classify(-0.50, noted=False, bound=0.35) == "improvement"
        # a NOTE never excuses/absorbs an improvement label
        assert classify(-0.50, noted=True, bound=0.35) == "improvement"

    def test_no_bound_falls_back_to_note_only(self):
        assert classify(+0.31, noted=False, bound=None) == "regression"
        assert classify(+0.31, noted=True, bound=None) == "noted"

    def test_uniform_host_shift_scenario(self):
        """The r9 close scenario: the whole fleet moved ~+40% (host
        drift, reproduced on the unchanged r8 tree), so a +50% raw
        mover is only ~+7% after re-centering and must classify as
        within-noise — while a genuine 3x outlier stays flagged."""
        old = {f"q{i}": 1.0 for i in range(20)}
        new = {f"q{i}": 1.4 for i in range(20)}
        new["q7"] = 1.5   # +50% raw
        new["q9"] = 3.0   # 3x raw — real even after re-centering
        shift = median_shift(old, new)
        assert abs(shift - 0.4) < 1e-9
        assert classify(shift_adjust(0.5, shift), False, 0.25) == "within-noise"
        assert classify(shift_adjust(2.0, shift), False, 0.25) == "regression"

    def test_median_shift_same_tree_same_host_is_zero(self):
        q = {"a": 1.0, "b": 2.0, "c": 0.5}
        assert median_shift(q, dict(q)) == 0.0
        assert median_shift({}, {}) == 0.0

    def test_shift_adjust_identity_at_zero_shift(self):
        import pytest

        assert shift_adjust(0.3, 0.0) == pytest.approx(0.3)

    def test_r08_scenario_mechanically_within_noise(self):
        """The exact r8 failure mode: an unchanged-code +18-30% mover
        with a measured 25% p90 spread + 10% drift must classify as
        within-noise, not as a regression without a NOTE."""
        old = _blob(None)  # r08 stamp: no envelope
        new = _blob(ENV, {"ext_tfidf": [1.0, 1.05, 1.1]})
        bound = noise_bound("ext_tfidf", old, new)
        assert classify(+0.30, noted=False, bound=bound) == "within-noise"


class TestNoiseBoundOneSidedPasses:
    def test_one_sided_pass_record_still_contributes(self):
        # r08-style stamp (no per-pass capture) vs r09 detail blob: the
        # side that DID measure a spread larger than the p90 base must
        # raise the bound — previously it was discarded entirely.
        old = _blob(ENV)                            # no passes at all
        new = _blob(ENV, {"q": [1.0, 1.0, 1.4]})    # spread 0.4 > 0.25
        assert noise_bound("q", old, new) == pytest.approx(0.4 + 0.10)

    def test_missing_side_adds_zero_not_discard(self):
        old = _blob(ENV, {"q": [1.0, 1.0, 1.3]})    # spread 0.3
        new = _blob(ENV)                            # no passes
        assert noise_bound("q", old, new) == pytest.approx(0.3 + 0.10)


class TestMoverGate:
    def test_raw_delta_gates_as_before(self):
        assert mover_gate(0.5, 0.5, 1.0, 1.5, 0.30)

    def test_small_moves_stay_hidden(self):
        assert not mover_gate(0.05, 0.05, 1.0, 1.05, 0.30)

    def test_negative_shift_cannot_mask_a_regression(self):
        # Host got 30% faster fleet-wide (shift -0.30); a query that
        # regressed ~43% like-for-like lands at raw delta 0.0 — the
        # adjusted delta must still surface it.
        shift = -0.30
        a, b = 1.0, 1.0
        delta = (b - a) / a                  # 0.0 raw
        adj = shift_adjust(delta, shift)     # ~ +0.43
        assert adj > 0.40
        assert mover_gate(delta, adj, a, b, 0.30)

    def test_absolute_jitter_guard_uses_adjusted_seconds(self):
        # Tiny query (0.1 s): even a large adjusted delta is 0.04 s of
        # movement — still below the 0.2 s scheduling-jitter floor.
        shift = -0.30
        a, b = 0.1, 0.1
        adj = shift_adjust(0.0, shift)
        assert not mover_gate(0.0, adj, a, b, 0.30)
