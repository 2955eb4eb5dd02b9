"""Third-implementation test for ext_kneser_ney: interpolated KN
re-derived sequentially in plain Python (dict counts, math.log) from
the formula — no SQL, no Spark — and compared to the entry's output.
A mirrored spec mistake (wrong discount placement, continuation counts
over tokens instead of types, denominator slips) would survive the
Spark↔DuckDB hash gate; it cannot survive a third independent
derivation."""

from __future__ import annotations

import math
import re

import duckdb

from proto_to_avro_ql_spark.entry_queries import QUERIES

SF = "/root/testdata/sf0.001"


def _round_half_away(y: float) -> int:
    return math.floor(y + 0.5) if y >= 0 else math.ceil(y - 0.5)


def test_kn_matches_python_reference(spark):
    rows = (
        duckdb.connect()
        .execute(f"SELECT lang, text FROM '{SF}/documents.parquet'")
        .fetchall()
    )
    occ: dict[tuple[str, str, str], int] = {}
    for lang, t in rows:
        toks = [
            x
            for x in re.sub(r"\s+", " ", t.lower()).strip().split(" ")
            if x
        ]
        for v, w in zip(toks, toks[1:]):
            occ[(lang, v, w)] = occ.get((lang, v, w), 0) + 1

    bc: dict[tuple[str, str], int] = {}
    for (lang, v, w), c in occ.items():
        bc[(v, w)] = bc.get((v, w), 0) + c
    c_v: dict[str, int] = {}
    n1v: dict[str, int] = {}
    n1w: dict[str, int] = {}
    for (v, w), c in bc.items():
        c_v[v] = c_v.get(v, 0) + c
        n1v[v] = n1v.get(v, 0) + 1
        n1w[w] = n1w.get(w, 0) + 1
    t_types = len(bc)

    lpm: dict[tuple[str, str], int] = {}
    for (v, w), c in bc.items():
        p = (float(c) - 0.75) / float(c_v[v]) + 0.75 * float(
            n1v[v]
        ) / float(c_v[v]) * float(n1w[w]) / float(t_types)
        lpm[(v, w)] = _round_half_away(math.log(p) * 1e6)

    ref: dict[str, tuple[int, int]] = {}
    for (lang, v, w), c in occ.items():
        n, s = ref.get(lang, (0, 0))
        ref[lang] = (n + c, s + c * lpm[(v, w)])
    expect = {
        lang: (n, s, (-s) // n) for lang, (n, s) in ref.items()
    }

    got = {
        r["lang"]: (
            r["n_bigrams"],
            r["sum_lp_micro"],
            r["avg_neg_lp_micro"],
        )
        for r in QUERIES["ext_kneser_ney"](spark, SF).collect()
    }
    assert got == expect


def test_kn_probabilities_normalize():
    # On a tiny hand corpus, Σ_w P(w|v) over OBSERVED successors plus
    # the continuation mass of unseen ones must be exactly 1 per the
    # interpolated-KN identity — pin the formula's internal
    # consistency, not just engine agreement.
    toks = "the cat sat on the mat the cat ran".split()
    bc: dict[tuple[str, str], int] = {}
    for v, w in zip(toks, toks[1:]):
        bc[(v, w)] = bc.get((v, w), 0) + 1
    c_v: dict[str, int] = {}
    n1v: dict[str, int] = {}
    n1w: dict[str, int] = {}
    for (v, w), c in bc.items():
        c_v[v] = c_v.get(v, 0) + c
        n1v[v] = n1v.get(v, 0) + 1
        n1w[w] = n1w.get(w, 0) + 1
    t = len(bc)
    vocab = set(n1w) | set(c_v)
    for v in c_v:
        total = 0.0
        for w in vocab:
            c = bc.get((v, w), 0)
            total += max(c - 0.75, 0.0) / c_v[v] + 0.75 * n1v[v] / c_v[
                v
            ] * n1w.get(w, 0) / t
        # Σ_w n1w over the FULL vocab is t by construction, so the sum
        # telescopes to 1 exactly (up to float error).
        assert abs(total - 1.0) < 1e-9, (v, total)


def _ref_mix31(v: int) -> int:
    m31 = 2_147_483_648
    h = (v % m31 + m31) % m31
    h ^= h >> 15
    h = (h * 0x27D4EB2F) % m31
    h ^= h >> 13
    h = (h * 0x165667B1) % m31
    h ^= h >> 16
    return h


def test_kn_holdout_matches_python_reference(spark):
    rows = (
        duckdb.connect()
        .execute(f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'")
        .fetchall()
    )
    bc: dict[tuple[str, str], int] = {}
    ev: dict[tuple[str, str, str], int] = {}
    for doc_id, lang, t in rows:
        is_eval = _ref_mix31(doc_id) % 5 == 0
        toks = [
            x for x in re.sub(r"\s+", " ", t.lower()).strip().split(" ") if x
        ]
        for v, w in zip(toks, toks[1:]):
            if is_eval:
                ev[(lang, v, w)] = ev.get((lang, v, w), 0) + 1
            else:
                bc[(v, w)] = bc.get((v, w), 0) + 1
    c_v: dict[str, int] = {}
    n1v: dict[str, int] = {}
    n1w: dict[str, int] = {}
    for (v, w), c in bc.items():
        c_v[v] = c_v.get(v, 0) + c
        n1v[v] = n1v.get(v, 0) + 1
        n1w[w] = n1w.get(w, 0) + 1
    t_types = len(bc)

    ref: dict[str, tuple[int, int, int]] = {}
    for (lang, v, w), cnt in ev.items():
        if v in c_v:
            p = max(float(bc.get((v, w), 0)) - 0.75, 0.0) / float(
                c_v[v]
            ) + 0.75 * float(n1v[v]) / float(c_v[v]) * float(
                n1w.get(w, 0)
            ) / float(t_types)
        else:
            p = float(n1w.get(w, 0)) / float(t_types)
        p = max(p, 1.0e-9)
        lpm = _round_half_away(math.log(p) * 1e6)
        n, u, s = ref.get(lang, (0, 0, 0))
        ref[lang] = (
            n + cnt,
            u + (cnt if (v, w) not in bc else 0),
            s + cnt * lpm,
        )
    expect = {
        lang: (n, u, s, (-s) // n) for lang, (n, u, s) in ref.items()
    }
    got = {
        r["lang"]: (
            r["n_bigrams"],
            r["n_unseen_bigrams"],
            r["sum_lp_micro"],
            r["avg_neg_lp_micro"],
        )
        for r in QUERIES["ext_kneser_ney_holdout"](spark, SF).collect()
    }
    assert got == expect
    # generalization gap is real on this corpus: some eval bigrams are
    # train-unseen, and none scored at -inf
    assert any(u > 0 for (_, u, _, _) in got.values())
