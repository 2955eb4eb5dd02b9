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


def test_katz_backoff_matches_python_reference(spark):
    """Third implementation of the held-out Katz model: dict counts,
    float GT discounts with the SRILM validity clamp, integer-pico
    freezing, and the per-context leftover-mass alpha — all re-derived
    from the published formulas, no SQL."""
    from tests.test_kneser_ney import _ref_mix31

    rows = (
        duckdb.connect()
        .execute(f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'")
        .fetchall()
    )
    bc: dict[tuple[str, str], int] = {}
    ev: dict[tuple[str, str, str], int] = {}
    for doc_id, lang, t in rows:
        is_eval = _ref_mix31(doc_id) % 5 == 0
        toks = _norm_tokens(t)
        for v, w in zip(toks, toks[1:]):
            if is_eval:
                ev[(lang, v, w)] = ev.get((lang, v, w), 0) + 1
            else:
                bc[(v, w)] = bc.get((v, w), 0) + 1
    c_v: dict[str, int] = {}
    c_w: dict[str, int] = {}
    for (v, w), c in bc.items():
        c_v[v] = c_v.get(v, 0) + c
        c_w[w] = c_w.get(w, 0) + c
    nn = sum(c_w.values())
    ff: dict[int, int] = {}
    for c in bc.values():
        ff[c] = ff.get(c, 0) + 1
    n1, n6 = ff.get(1, 0), ff.get(6, 0)

    def discount(r: int) -> float:
        if r > 5 or n1 == 0:
            return 1.0
        a = 6.0 * n6 / n1
        if a >= 1.0:
            return 1.0
        rstar_over_r = (r + 1) * ff.get(r + 1, 0) / ff[r] / r
        d = (rstar_over_r - a) / (1.0 - a)
        return 1.0 if (d <= 0.0 or d > 1.0) else d

    pd = {
        (v, w): _round_half_away(discount(c) * c / c_v[v] * 1e12)
        for (v, w), c in bc.items()
    }
    pm = {w: _round_half_away(cw / nn * 1e12) for w, cw in c_w.items()}
    av_num: dict[str, int] = {}
    av_den: dict[str, int] = {}
    for (v, w), p in pd.items():
        av_num[v] = av_num.get(v, 10**12) - p
        av_den[v] = av_den.get(v, 10**12) - pm[w]

    ref: dict[str, tuple[int, int, int]] = {}
    for (lang, v, w), cnt in ev.items():
        if (v, w) in pd:
            p = pd[(v, w)] / 1e12
        elif v in av_den and av_den[v] > 0 and av_num[v] > 0 and w in pm:
            p = (av_num[v] / av_den[v]) * (pm[w] / 1e12)
        elif v not in av_den and w in pm:
            p = pm[w] / 1e12
        else:
            p = 0.0
        lpm = _round_half_away(math.log(max(p, 1.0e-9)) * 1e6)
        n, u, s = ref.get(lang, (0, 0, 0))
        ref[lang] = (
            n + cnt,
            u + (cnt if (v, w) not in pd else 0),
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
        for r in QUERIES["ext_katz_backoff"](spark, SF).collect()
    }
    assert got == expect
    # The held-out split must actually exercise the back-off: some
    # evaluated bigrams are train-unseen in every language row.
    assert any(u > 0 for (_, u, _, _) in got.values())


def test_ccnet_pipeline_matches_python_reference(spark):
    """Third implementation of the NEW composition logic: take the
    cleaned doc set from the (independently oracled) ext_corpus_
    pipeline entry, re-derive the train-on-cleaned KN scoring and the
    below-mean cut in plain Python, and compare every surviving row.
    The cleaner itself is pinned by its own oracle + the text-function
    unit tests; this pins the STACKING (model trained on the cleaned
    corpus, cut over the cleaned corpus)."""
    clean = {
        r["doc_id"]: (r["quality"], r["n_tokens"])
        for r in QUERIES["ext_corpus_pipeline"](spark, SF).collect()
    }
    texts = dict(
        duckdb.connect()
        .execute(f"SELECT doc_id, text FROM '{SF}/documents.parquet'")
        .fetchall()
    )
    occ: dict[tuple[int, str, str], int] = {}
    bc: dict[tuple[str, str], int] = {}
    for doc_id in clean:
        toks = _norm_tokens(texts[doc_id])
        for v, w in zip(toks, toks[1:]):
            occ[(doc_id, v, w)] = occ.get((doc_id, v, w), 0) + 1
            bc[(v, w)] = bc.get((v, w), 0) + 1
    c_v: dict[str, int] = {}
    n1v: dict[str, int] = {}
    n1w: dict[str, int] = {}
    for (v, w), c in bc.items():
        c_v[v] = c_v.get(v, 0) + c
        n1v[v] = n1v.get(v, 0) + 1
        n1w[w] = n1w.get(w, 0) + 1
    t_types = len(bc)
    per: dict[int, tuple[int, int]] = {}
    for (doc_id, v, w), cnt in occ.items():
        p = max(float(bc[(v, w)]) - 0.75, 0.0) / float(c_v[v]) + 0.75 * float(
            n1v[v]
        ) / float(c_v[v]) * float(n1w[w]) / float(t_types)
        p = max(p, 1.0e-9)
        lpm = _round_half_away(math.log(p) * 1e6)
        n, s = per.get(doc_id, (0, 0))
        per[doc_id] = (n + cnt, s + cnt * lpm)
    avgs = {d: (-s) // n for d, (n, s) in per.items()}
    nd, tot = len(avgs), sum(avgs.values())
    expect = {
        d: (clean[d][0], clean[d][1], per[d][0], avgs[d])
        for d in avgs
        if avgs[d] * nd < tot
    }
    got = {
        r["doc_id"]: (
            r["quality"],
            r["n_tokens"],
            r["n_bigrams"],
            r["avg_neg_lp_micro"],
        )
        for r in QUERIES["ext_ccnet_pipeline"](spark, SF).collect()
    }
    assert got == expect
    # The composed chain actually narrows at both stages.
    assert 0 < len(got) < len(avgs) <= len(clean)


def test_lm_ppl_filter_short_doc_policy(spark, tmp_path):
    """Round-12 short-doc policy, cross-engine on a fixture that
    actually exercises it (the stock testdata has no <2-token docs):
    documents with 0 or 1 tokens cannot be perplexity-scored — both
    engines must KEEP them with n_bigrams = 0 and NULL
    avg_neg_lp_micro, and exclude them from the corpus-mean cut."""
    import glob
    import os
    import shutil

    from proto_to_avro_ql_spark.entry_queries import ORACLES
    from tests.oracle_check import compare

    fx = tmp_path / "sf_short"
    fx.mkdir()
    for p in glob.glob(f"{SF}/*.parquet"):
        shutil.copy(p, fx / os.path.basename(p))
    duckdb.connect().execute(
        f"""COPY (
          SELECT * FROM '{SF}/documents.parquet'
          UNION ALL
          SELECT * FROM (VALUES
            (900001, 'hello', 'en', 'synthetic', 5),
            (900002, '', 'en', 'synthetic', 0),
            (900003, 'bonjour', 'fr', 'synthetic', 7)
          ) AS t(doc_id, text, lang, source, n_chars)
        ) TO '{fx}/documents.parquet' (FORMAT PARQUET)"""
    )
    res = compare(
        spark,
        str(fx),
        "ext_lm_ppl_filter",
        QUERIES["ext_lm_ppl_filter"],
        ORACLES["ext_lm_ppl_filter"],
    )
    assert res["ok"], res
    out = {
        r["doc_id"]: r
        for r in QUERIES["ext_lm_ppl_filter"](spark, str(fx)).collect()
    }
    for d in (900001, 900002, 900003):
        assert out[d]["n_bigrams"] == 0, d
        assert out[d]["avg_neg_lp_micro"] is None, d


def test_katz_vs_kn_matches_parent_entries(spark):
    """The comparison entry must be bit-equal to its parents: per
    language, kn_avg == ext_kneser_ney_holdout's avg, katz_avg ==
    ext_katz_backoff's avg, delta is their integer difference, and
    the verdict follows the sign."""
    kn = {
        r["lang"]: r["avg_neg_lp_micro"]
        for r in QUERIES["ext_kneser_ney_holdout"](spark, SF).collect()
    }
    kz = {
        r["lang"]: r["avg_neg_lp_micro"]
        for r in QUERIES["ext_katz_backoff"](spark, SF).collect()
    }
    cmp_rows = QUERIES["ext_katz_vs_kn"](spark, SF).collect()
    assert {r["lang"] for r in cmp_rows} == set(kn) == set(kz)
    for r in cmp_rows:
        assert r["kn_avg_neg_lp_micro"] == kn[r["lang"]], r
        assert r["katz_avg_neg_lp_micro"] == kz[r["lang"]], r
        assert r["delta_micro"] == kz[r["lang"]] - kn[r["lang"]], r
        want = (
            "katz"
            if r["delta_micro"] < 0
            else ("kn" if r["delta_micro"] > 0 else "tie")
        )
        assert r["better"] == want, r
    # The comparison is contentful: the two smoothers actually differ
    # on this corpus (a zero-delta everywhere would mean the Katz
    # branch degenerated into KN or vice versa).
    assert any(r["delta_micro"] != 0 for r in cmp_rows)


def test_trigram_kn_matches_python_reference(spark):
    """Third implementation of the held-out interpolated trigram KN:
    dict counts for every rung of the recursion (raw trigram top
    level, continuation-bigram middle, continuation-unigram base),
    float interpolation in the published fixed order, no SQL."""
    from tests.test_kneser_ney import _ref_mix31

    rows = (
        duckdb.connect()
        .execute(f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'")
        .fetchall()
    )
    tc: dict[tuple[str, str, str], int] = {}
    ev: dict[tuple[str, str, str, str], int] = {}
    for doc_id, lang, t in rows:
        is_eval = _ref_mix31(doc_id) % 5 == 0
        toks = _norm_tokens(t)
        for u, v, w in zip(toks, toks[1:], toks[2:]):
            if is_eval:
                ev[(lang, u, v, w)] = ev.get((lang, u, v, w), 0) + 1
            else:
                tc[(u, v, w)] = tc.get((u, v, w), 0) + 1
    c_uv: dict[tuple[str, str], int] = {}
    n1_uv: dict[tuple[str, str], int] = {}
    mid: dict[tuple[str, str], int] = {}  # (v, w) -> N1+(.vw)
    for (u, v, w), c in tc.items():
        c_uv[(u, v)] = c_uv.get((u, v), 0) + c
        n1_uv[(u, v)] = n1_uv.get((u, v), 0) + 1
        mid[(v, w)] = mid.get((v, w), 0) + 1
    n_ctx_v: dict[str, int] = {}
    n1_v: dict[str, int] = {}
    n_prec_w: dict[str, int] = {}
    for (v, w), n in mid.items():
        n_ctx_v[v] = n_ctx_v.get(v, 0) + n
        n1_v[v] = n1_v.get(v, 0) + 1
        n_prec_w[w] = n_prec_w.get(w, 0) + 1
    t2 = len(mid)
    D = 0.75

    def p_cont(v: str, w: str) -> float:
        if v not in n_ctx_v:
            return n_prec_w.get(w, 0) / t2
        return max(mid.get((v, w), 0) - D, 0.0) / n_ctx_v[v] + D * n1_v[
            v
        ] / n_ctx_v[v] * n_prec_w.get(w, 0) / t2

    ref: dict[str, tuple[int, int, int]] = {}
    for (lang, u, v, w), cnt in ev.items():
        if (u, v) in c_uv:
            p = max(tc.get((u, v, w), 0) - D, 0.0) / c_uv[(u, v)] + D * n1_uv[
                (u, v)
            ] / c_uv[(u, v)] * p_cont(v, w)
        else:
            p = p_cont(v, w)
        lpm = _round_half_away(math.log(max(p, 1.0e-9)) * 1e6)
        n, uu, s = ref.get(lang, (0, 0, 0))
        ref[lang] = (
            n + cnt,
            uu + (cnt if (u, v, w) not in tc else 0),
            s + cnt * lpm,
        )
    expect = {
        lang: (n, u, s, (-s) // n) for lang, (n, u, s) in ref.items()
    }
    got = {
        r["lang"]: (
            r["n_trigrams"],
            r["n_unseen_trigrams"],
            r["sum_lp_micro"],
            r["avg_neg_lp_micro"],
        )
        for r in QUERIES["ext_trigram_kn"](spark, SF).collect()
    }
    assert got == expect
    # The recursion's back-off rungs actually engage: some evaluated
    # trigrams are train-unseen in every language, and the trigram
    # unseen RATE exceeds the bigram model's (data sparsity one order
    # up — the readout the order-selection trade is about).
    assert all(u > 0 for (_, u, _, _) in got.values())
    kn2 = {
        r["lang"]: (r["n_bigrams"], r["n_unseen_bigrams"])
        for r in QUERIES["ext_kneser_ney_holdout"](spark, SF).collect()
    }
    for lang, (n3, u3, _, _) in got.items():
        n2, u2 = kn2[lang]
        assert u3 * n2 > u2 * n3, (lang, u3, n3, u2, n2)


def test_selfbleu_matches_naive_python(spark):
    """Third implementation of Self-BLEU-2: the NAIVE O(n²) multi-
    reference formulation (per doc, clip each gram count against the
    explicit max over every other same-lang doc; closest-length BP) —
    validating the top-2 decomposition the Spark/DuckDB plans use."""
    rows = (
        duckdb.connect()
        .execute(f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'")
        .fetchall()
    )
    from collections import Counter, defaultdict

    toks = {d: _norm_tokens(t) for d, _, t in rows}
    lang_of = {d: lg for d, lg, _ in rows}
    by_lang = defaultdict(list)
    for d, lg, _ in rows:
        by_lang[lg].append(d)
    g1 = {d: Counter(a) for d, a in toks.items()}
    g2 = {
        d: Counter(" ".join(p) for p in zip(a, a[1:]))
        for d, a in toks.items()
    }
    expect = {}
    for d, a in toks.items():
        pool = [o for o in by_lang[lang_of[d]] if o != d]
        clip1 = sum(
            min(c, max((g1[o].get(g, 0) for o in pool), default=0))
            for g, c in g1[d].items()
        )
        clip2 = sum(
            min(c, max((g2[o].get(g, 0) for o in pool), default=0))
            for g, c in g2[d].items()
        )
        tot1, tot2 = len(a), max(len(a) - 1, 0)
        n = len(a)
        r = min(
            (len(toks[o]) for o in pool),
            key=lambda L: (abs(L - n), L),
            default=None,
        )
        if r is None or tot2 == 0 or clip1 == 0 or clip2 == 0:
            b = 0
        else:
            bp = 1.0 if n > r else math.exp(1.0 - r / n)
            b = _round_half_away(
                bp
                * math.exp(
                    0.5
                    * (math.log(clip1 / tot1) + math.log(clip2 / tot2))
                )
                * 1e6
            )
        expect[d] = (n, clip1, tot1, clip2, tot2, r or 0, b)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["clip1"],
            r["tot1"],
            r["clip2"],
            r["tot2"],
            r["r_len"],
            r["bleu2_micro"],
        )
        for r in QUERIES["ext_selfbleu"](spark, SF).collect()
    }
    assert got == expect
    # Contentful: nonzero scores exist, values spread (the corpus's
    # planted near-dups legitimately reach bleu = 1.0 exactly).
    vals = [v[6] for v in got.values()]
    assert any(v > 0 for v in vals) and len(set(vals)) > 10
    assert all(0 <= v <= 1_000_000 for v in vals)
