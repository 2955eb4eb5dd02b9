"""Driver-window ordering guards (round 5).

The driver verifies the FIRST 50 entries of queries() in iteration
order; the ordering logic (entry_queries.ordered_query_names) and the
rotating PRIORITY_EXT_IDS slots decide which entries get driver
verification each round. A silent mistake here — a rotated-in name
that is rows-only, unregistered, or already a pinned contract ID —
wastes a verification slot without failing anything. These tests make
that loud. Pure imports, no Spark session.
"""

from __future__ import annotations

from proto_to_avro_ql_spark.entry_queries import (
    ORACLES,
    PRIORITY_EXT_IDS,
    QUERIES,
    SURVEY2_CONTRACT_IDS,
    ordered_query_names,
)

WINDOW = 50


def test_rotation_slots_are_registered_and_oracled():
    for name in PRIORITY_EXT_IDS:
        assert name in QUERIES, f"rotated-in slot {name!r} is unregistered"
        assert name in ORACLES, (
            f"rotated-in slot {name!r} has no oracle — it would burn a "
            "driver slot on a weaker rows-only check"
        )


def test_rotation_slots_do_not_duplicate_pinned_ids():
    dup = set(PRIORITY_EXT_IDS) & set(SURVEY2_CONTRACT_IDS)
    assert not dup, f"rotation duplicates pinned contract IDs: {dup}"
    assert "flagship_report" not in PRIORITY_EXT_IDS


def test_window_is_exactly_flagship_contract_and_rotation():
    names = ordered_query_names()
    window = names[:WINDOW]
    expected = ["flagship_report"] + SURVEY2_CONTRACT_IDS + PRIORITY_EXT_IDS
    assert window == expected, (
        "driver window drifted — the first 50 must be flagship + the 44 "
        "pinned SURVEY §2 IDs + the 5 rotating slots, in that order"
    )


def test_every_window_entry_is_oracled():
    for name in ordered_query_names()[:WINDOW]:
        assert name in ORACLES, f"window entry {name!r} lacks an oracle"


def test_rows_only_entries_sort_last():
    names = ordered_query_names()
    first_rows_only = next(
        (i for i, n in enumerate(names) if n not in ORACLES), len(names)
    )
    # every entry after the first rows-only one must also be rows-only
    tail = names[first_rows_only:]
    assert all(n not in ORACLES for n in tail), (
        "oracled entries sorted after rows-only ones — they'd lose "
        "driver-window priority"
    )


def test_ordering_is_total_and_complete():
    names = ordered_query_names()
    assert len(names) == len(set(names)) == len(QUERIES)
    assert set(names) == set(QUERIES)


def test_bench_headline_names_all_registered():
    """bench.py skips unknown names silently (QUERIES.get), so a typo
    would drop a query from timing without failing anything."""
    import bench

    unknown = [n for n in bench.HEADLINE if n not in QUERIES]
    assert unknown == [], f"bench.HEADLINE names not registered: {unknown}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE)), "duplicate bench names"
    bad_notes = [n for n in bench.NOTES if n not in QUERIES]
    assert bad_notes == [], f"bench.NOTES keys not registered: {bad_notes}"


def test_bench_headline13_prefix_is_stable():
    """The headline13 subtotal only stays comparable across rounds if
    the first 13 HEADLINE names never change."""
    import bench

    assert bench.HEADLINE[: bench.HEADLINE13_N] == [
        "flagship_report",
        "proj_paths",
        "agg_groupby_multi",
        "join_equi_inner",
        "ext_dedup_exact",
        "ext_dedup_minhash",
        "ext_sim_search",
        "ext_text_stats",
        "ext_window_agg",
        "ext_window_rank",
        "ext_asof_join",
        "ext_sessionize",
        "ext_corpus_pipeline",
    ]
