"""Third-implementation test for ext_nb_langid: the full NB pipeline
(split, hashed features, add-one smoothing, prior, argmax with the
lang-ASC tie-break) re-derived sequentially in plain Python from the
documented algorithm and compared to the entry's confusion matrix."""

from __future__ import annotations

import math
import re

import duckdb

from proto_to_avro_ql_spark.entry_queries import QUERIES

SF = "/root/testdata/sf0.001"
M31 = 2_147_483_648
B = 64


def mix31(v: int) -> int:
    h = (v % M31 + M31) % M31
    h ^= h >> 15
    h = (h * 0x27D4EB2F) % M31
    h ^= h >> 13
    h = (h * 0x165667B1) % M31
    h ^= h >> 16
    return h


def str_code(s: str) -> int:
    if not s:
        return 7
    h = 7
    for ch in s:
        h = (h * 31 + ord(ch)) % M31
    return h


def _round_half_away(y: float) -> int:
    return math.floor(y + 0.5) if y >= 0 else math.ceil(y - 0.5)


def test_confusion_matrix_matches_python_reference(spark):
    rows = (
        duckdb.connect()
        .execute(f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'")
        .fetchall()
    )
    train_lb: dict[tuple[str, int], int] = {}
    train_docs: dict[str, int] = {}
    eval_docs: list[tuple[int, str, dict[int, int]]] = []
    for doc_id, lang, t in rows:
        toks = [
            x for x in re.sub(r"\s+", " ", t.lower()).strip().split(" ") if x
        ]
        buckets: dict[int, int] = {}
        for tok in toks:
            bb = mix31(str_code(tok)) % B
            buckets[bb] = buckets.get(bb, 0) + 1
        if mix31(doc_id) % 5 == 0:
            eval_docs.append((doc_id, lang, buckets))
        else:
            # a train doc with zero tokens still counts toward the
            # prior ONLY if it contributes a (doc, bucket) row — the
            # entry derives docs_l from the bucket relation
            if buckets:
                train_docs[lang] = train_docs.get(lang, 0) + 1
            for bb, c in buckets.items():
                train_lb[(lang, bb)] = train_lb.get((lang, bb), 0) + c

    tot = {
        lang: sum(c for (l2, _), c in train_lb.items() if l2 == lang)
        for lang in train_docs
    }
    n_all = sum(train_docs.values())
    llm = {
        (lang, bb): _round_half_away(
            math.log(
                float(train_lb.get((lang, bb), 0) + 1)
                / float(tot[lang] + B)
            )
            * 1e6
        )
        for lang in train_docs
        for bb in range(B)
    }
    prm = {
        lang: _round_half_away(
            math.log(float(n) / float(n_all)) * 1e6
        )
        for lang, n in train_docs.items()
    }

    conf: dict[tuple[str, str], int] = {}
    for _doc_id, lang_true, buckets in eval_docs:
        if not buckets:
            continue  # no (doc, bucket) rows -> absent from the entry too
        best = min(
            (
                (-(prm[lc] + sum(c * llm[(lc, bb)] for bb, c in buckets.items())), lc)
                for lc in sorted(train_docs)
            )
        )[1]
        conf[(lang_true, best)] = conf.get((lang_true, best), 0) + 1

    got = {
        (r["lang_true"], r["lang_pred"]): r["n_docs"]
        for r in QUERIES["ext_nb_langid"](spark, SF).collect()
    }
    assert got == conf
