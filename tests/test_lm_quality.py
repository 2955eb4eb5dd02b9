"""Third-implementation tests for the round-11 LM-quality entries:
ext_good_turing, ext_lm_ppl_filter, ext_bpe_vocab.

The DuckDB oracles pin Spark↔DuckDB equality; these re-derive each
result sequentially in plain Python from the published formulas (dict
counts, math.log, integer floor division — no SQL, no Spark), so a
spec-level mistake mirrored into both engines cannot survive."""

from __future__ import annotations

import math
import re

import duckdb

from proto_to_avro_ql_spark.entry_queries import QUERIES
from tests.test_bpe_train import ref_bpe, ref_merge, symbolize

SF = "/root/testdata/sf0.001"


def _round_half_away(y: float) -> int:
    return math.floor(y + 0.5) if y >= 0 else math.ceil(y - 0.5)


def _norm_tokens(t: str) -> list[str]:
    return [x for x in re.sub(r"\s+", " ", t.lower()).strip().split(" ") if x]


def test_good_turing_matches_python_reference(spark):
    texts = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT text FROM '{SF}/documents.parquet'")
        .fetchall()
    ]
    bg: dict[tuple[str, str], int] = {}
    for t in texts:
        toks = _norm_tokens(t)
        for v, w in zip(toks, toks[1:]):
            bg[(v, w)] = bg.get((v, w), 0) + 1
    ff: dict[int, int] = {}
    for r in bg.values():
        ff[r] = ff.get(r, 0) + 1
    n_tokens = sum(r * n for r, n in ff.items())
    n1 = ff.get(1, 0)
    p0 = n1 * 1_000_000 // n_tokens
    expect = {
        r: (
            ff[r],
            ff.get(r + 1, 0),
            (r + 1) * ff.get(r + 1, 0) * 1_000_000 // ff[r],
            p0,
        )
        for r in sorted(ff)[:10]
    }
    got = {
        row["r"]: (
            row["n_types"],
            row["n_types_next"],
            row["r_star_micro"],
            row["p0_micro"],
        )
        for row in QUERIES["ext_good_turing"](spark, SF).collect()
    }
    assert got == expect
    # Sanity: the corpus has singletons, so the unseen-mass estimate
    # is strictly positive.
    assert 1 in got and got[1][0] > 0 and got[1][3] > 0


def test_lm_ppl_filter_matches_python_reference(spark):
    rows = (
        duckdb.connect()
        .execute(f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'")
        .fetchall()
    )
    # One pass: per-doc bigram counts; the en slice feeds the model.
    occ: dict[tuple[int, str, str], int] = {}
    doc_lang: dict[int, str] = {}
    bc: dict[tuple[str, str], int] = {}
    for doc_id, lang, t in rows:
        doc_lang[doc_id] = lang
        toks = _norm_tokens(t)
        for v, w in zip(toks, toks[1:]):
            occ[(doc_id, v, w)] = occ.get((doc_id, v, w), 0) + 1
            if lang == "en":
                bc[(v, w)] = bc.get((v, w), 0) + 1
    c_v: dict[str, int] = {}
    n1v: dict[str, int] = {}
    n1w: dict[str, int] = {}
    for (v, w), c in bc.items():
        c_v[v] = c_v.get(v, 0) + c
        n1v[v] = n1v.get(v, 0) + 1
        n1w[w] = n1w.get(w, 0) + 1
    t_types = len(bc)

    per: dict[int, tuple[int, int]] = {}  # doc -> (n_bigrams, sum_lp)
    for (doc_id, v, w), cnt in occ.items():
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
        n, s = per.get(doc_id, (0, 0))
        per[doc_id] = (n + cnt, s + cnt * lpm)
    avgs = {d: (-s) // n for d, (n, s) in per.items()}
    nd, tot = len(avgs), sum(avgs.values())
    expect = {
        d: (doc_lang[d], per[d][0], avgs[d])
        for d in avgs
        if avgs[d] * nd < tot
    }
    got = {
        r["doc_id"]: (r["lang"], r["n_bigrams"], r["avg_neg_lp_micro"])
        for r in QUERIES["ext_lm_ppl_filter"](spark, SF).collect()
    }
    assert got == expect
    # The cut keeps a strict subset, and at least one doc each side.
    assert 0 < len(got) < len(avgs)


def test_bpe_vocab_matches_python_reference(spark):
    rows = (
        duckdb.connect()
        .execute(f"SELECT lang, text FROM '{SF}/documents.parquet'")
        .fetchall()
    )
    wc: dict[str, int] = {}
    wl: dict[tuple[str, str], int] = {}
    for lang, t in rows:
        for tok in _norm_tokens(t):
            if re.fullmatch(r"[a-z0-9]+", tok):
                wc[tok] = wc.get(tok, 0) + 1
                wl[(lang, tok)] = wl.get((lang, tok), 0) + 1
    rules = [(x, y) for _, x, y, _ in ref_bpe(wc, 8)]
    seg: dict[str, list[str]] = {}
    for w in wc:
        syms = symbolize(w)
        for x, y in rules:
            syms = ref_merge(syms, x, y)
        seg[w] = syms
    ref: dict[str, tuple[set, int, int]] = {}
    for (lang, w), c in wl.items():
        vocab, toks, bad = ref.get(lang, (set(), 0, 0))
        vocab |= set(seg[w])
        toks += len(seg[w]) * c
        decoded = "".join(seg[w]).replace("</w>", "")
        bad += c if decoded != w else 0
        ref[lang] = (vocab, toks, bad)
    expect = {
        lang: (len(v), t, b) for lang, (v, t, b) in ref.items()
    }
    got = {
        r["lang"]: (r["n_vocab"], r["n_piece_tokens"], r["n_decode_mismatch"])
        for r in QUERIES["ext_bpe_vocab"](spark, SF).collect()
    }
    assert got == expect
    # Invertibility certificate: decode(encode(w)) == w everywhere.
    assert all(b == 0 for (_, _, b) in got.values())
