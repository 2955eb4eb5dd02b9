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


class TestBenchRoundStamp:
    """Round-7 verdict #4: certified bench artifacts are write-once
    round stamps; the live BENCH_DETAIL.json is gitignored. The stamp
    decision is pure (bench.round_stamp_path) so immutability is
    pinned here without running the bench."""

    def test_no_round_env_means_no_stamp(self, tmp_path):
        import bench

        assert bench.round_stamp_path(str(tmp_path), "0.1", None) is None
        assert bench.round_stamp_path(str(tmp_path), "0.1", "") is None

    def test_non_canonical_sf_never_stamps(self, tmp_path):
        import bench

        assert bench.round_stamp_path(str(tmp_path), "0.01", "7") is None

    def test_fresh_stamp_path_and_write_once(self, tmp_path):
        import os

        import bench

        p = bench.round_stamp_path(str(tmp_path), "0.1", "7")
        assert p is not None and p.endswith("BENCH_DETAIL_r07.json")
        open(p, "w").write("{}")
        # a second canonical-SF run the same round must refuse
        assert bench.round_stamp_path(str(tmp_path), "0.1", "7") == "EXISTS"
        # the next round stamps its own file
        p8 = bench.round_stamp_path(str(tmp_path), "0.1", "8")
        assert p8 is not None and p8.endswith("BENCH_DETAIL_r08.json")
        assert not os.path.exists(p8)

    def test_live_detail_is_gitignored(self):
        import os

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        gi = open(os.path.join(root, ".gitignore")).read().splitlines()
        assert "BENCH_DETAIL.json" in gi
        assert "BENCH_DETAIL_sf*.json" in gi
