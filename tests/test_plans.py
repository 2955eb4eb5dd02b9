"""Physical-plan assertions — the scale-survival contract.

These tests pin the plan properties that matter at 100 TB: predicate
pushdown and column pruning reach the parquet scan, nested-schema
pruning keeps un-queried proto subtrees out of IO, dimension joins
broadcast, and aggregations are map-side partial.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from proto_to_avro_ql_spark.fixtures import ads_row
from proto_to_avro_ql_spark.plans.compile import compile_projection
from proto_to_avro_ql_spark.sources.io import read_table


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df) -> str:
    return df._jdf.queryExecution().toString()


class TestScanPushdown:
    def test_filter_and_columns_pushed(self, spark, sf_dir):
        p = read_table(spark, sf_dir, "part")
        df = p.where(F.col("p_size") > 25).select("p_partkey", "p_name", "p_size")
        plan = physical_plan(df)
        assert "p_size" in plan and "> 25" in plan  # DataFilters carry the predicate
        scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "p_retailprice" not in scan_line  # un-queried column pruned
        assert "Batched: true" in scan_line  # vectorized columnar read

    def test_whole_stage_codegen(self, spark, sf_dir):
        df = read_table(spark, sf_dir, "lineitem").groupBy("l_returnflag").count()
        df.collect()  # finalize the adaptive plan
        plan = physical_plan(df)
        # '*(n)' prefixes mark whole-stage-codegen spans in the plan string
        assert "*(1)" in plan and "isFinalPlan=true" in plan


class TestNestedPruning:
    def test_nested_parquet_reads_exactly_queried_leaves(self, spark, sf_dir):
        """The engine's core promise (reference: translation tree touches
        only queried proto subtrees): on physically nested parquet the
        scan's ReadSchema is exactly the queried leaves."""
        path = tempfile.mkdtemp(prefix="nested_ads_")
        ads_row(spark, sf_dir).write.mode("overwrite").parquet(path)
        nested = spark.read.parquet(path)
        c = compile_projection(
            nested, ["metrics.impressions", "metrics.clicks", "campaign.name"]
        )
        flat = c.select(
            F.col("metrics.impressions").alias("i"),
            F.col("metrics.clicks").alias("k"),
            F.col("campaign.name").alias("n"),
        )
        plan = optimized_plan(flat)
        read_schema = next(
            l for l in plan.splitlines() if "ReadSchema" in l
        ).split("ReadSchema:")[1]
        assert "impressions" in read_schema and "clicks" in read_schema
        assert "name" in read_schema
        # the junk fields never reach IO
        assert "cost_micros" not in read_schema
        assert "descriptive_name" not in read_schema
        assert "ad_group" not in read_schema


class TestJoinStrategy:
    def test_dimension_join_broadcasts(self, spark, sf_dir):
        o = read_table(spark, sf_dir, "orders")
        c = read_table(spark, sf_dir, "customer")
        df = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).groupBy(
            "c_mktsegment"
        ).count()
        assert "BroadcastHashJoin" in physical_plan(df)
        assert "SortMergeJoin" not in physical_plan(df)


class TestAggregation:
    def test_partial_aggregation(self, spark, sf_dir):
        """Map-side combine: two HashAggregate nodes around the shuffle."""
        l = read_table(spark, sf_dir, "lineitem")
        df = l.groupBy("l_returnflag").agg(F.sum("l_quantity"))
        plan = physical_plan(df)
        assert plan.count("HashAggregate") >= 2
        assert "Exchange hashpartitioning(l_returnflag" in plan


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, sf_dir):
        """Both sides staged bucketed on the join key → zero-shuffle
        sort-merge join (the 100 TB join strategy)."""
        from proto_to_avro_ql_spark.operators.bucketing import bucketed_equi_join

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        try:
            l = read_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_quantity"
            )
            o = read_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderstatus"
            )
            joined = bucketed_equi_join(
                spark, l, o, "l_orderkey", "o_orderkey",
                names=("t_bkt_l", "t_bkt_o"),
            )
            joined.collect()
            plan = physical_plan(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan
            # row parity with the plain join
            plain = l.join(o, l.l_orderkey == o.o_orderkey).count()
            assert joined.count() == plain
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
            spark.sql("DROP TABLE IF EXISTS t_bkt_l")
            spark.sql("DROP TABLE IF EXISTS t_bkt_o")


class TestPartitionPruning:
    def test_partition_filter_reaches_scan(self, spark, sf_dir):
        import tempfile

        from proto_to_avro_ql_spark.operators.reports import flagship_report

        path = tempfile.mkdtemp(prefix="part_prune_")
        flagship_report(spark, sf_dir).write.mode("overwrite").partitionBy(
            "campaign_status"
        ).parquet(path)
        back = spark.read.parquet(path).where(F.col("campaign_status") == "F")
        plan = optimized_plan(back)
        scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "PartitionFilters" in scan_line
        assert "campaign_status" in scan_line.split("PartitionFilters")[1][:120]


class TestSession2OperatorPlans:
    def test_range_join_avoids_nested_loop(self, spark, sf_dir):
        """The binned formulation must plan as a hash/SMJ equi join on
        the bin key — never BroadcastNestedLoopJoin."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        df = QUERIES["ext_range_join"](spark, sf_dir)
        df.count()
        plan = physical_plan(df)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_bm25_small_sides_broadcast(self, spark, sf_dir):
        """idf and corpus-stats joins broadcast; no SMJ of the token
        stream against single-digit-row tables."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        df = QUERIES["ext_bm25_search"](spark, sf_dir)
        df.count()
        plan = physical_plan(df)
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

    def test_contamination_eval_side_broadcasts(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        df = QUERIES["ext_contamination"](spark, sf_dir)
        df.count()
        assert "BroadcastHashJoin" in physical_plan(df)

    def test_corpus_pipeline_shuffles_scores_not_text(self, spark, sf_dir):
        """The dedup is a partial-aggregated min_by keyed on text_hash:
        no Window node, exactly one hash-partitioning exchange, and the
        exchange's schema carries hash+scores — never the text column."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        df = QUERIES["ext_corpus_pipeline"](spark, sf_dir)
        df.count()
        plan = physical_plan(df)
        assert "Window" not in plan
        assert plan.count("Exchange hashpartitioning") == 1
        assert "partial_min_by" in plan  # map-side combine before the shuffle
        exchange_line = next(
            l for l in plan.splitlines() if "Exchange hashpartitioning" in l
        )
        assert "text#" not in exchange_line

    def test_minhash_signatures_have_no_hash_shuffle(self, spark, sf_dir):
        """The signature table is a narrow per-row projection: zero
        hash-partitioning exchanges (only the local-mode round-robin
        from ensure_min_parallelism may appear)."""
        from proto_to_avro_ql_spark.operators.dedup import minhash_signature_table

        docs = read_table(spark, sf_dir, "documents")
        sig = minhash_signature_table(docs, "text", "doc_id", 3, 32)
        plan = physical_plan(sig)
        assert "Exchange hashpartitioning" not in plan

    def test_stratified_sample_is_scan_absorbed(self, spark, sf_dir):
        """Membership filter is a narrow expression — no exchange at all."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        df = QUERIES["ext_stratified_sample"](spark, sf_dir)
        assert "Exchange" not in physical_plan(df)

    def test_ngram_jaccard_broadcasts_no_per_document_relation(self, spark, sf_dir):
        """Round-2 fix (VERDICT item 3): n_sh travels inline on the
        exploded rows; with size-based auto-broadcast disabled, the plan
        must contain NO broadcast at all — the code never hints one, so
        any broadcast that appears at scale is a size-based runtime
        choice, not a baked-in driver-OOM."""
        from proto_to_avro_ql_spark.operators.dedup import ngram_jaccard_pairs

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            docs = read_table(spark, sf_dir, "documents")
            plan = physical_plan(ngram_jaccard_pairs(docs))
            assert "BroadcastExchange" not in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_proto_decode_has_no_shuffle(self, spark, sf_dir):
        """Encode → decode is per-row work: no hash-partitioning
        exchange anywhere (only the local-mode round-robin from
        ensure_min_parallelism may appear — it detaches the Python
        encode from the unsplittable single-row-group test scan and is
        a no-op on a real lake)."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        df = QUERIES["src_proto_decode"](spark, sf_dir)
        assert "Exchange hashpartitioning" not in physical_plan(df)

    def test_repetition_score_shuffles_counts_not_text(self, spark, sf_dir):
        """Two keyed aggregations, both with map-side partials; no joins;
        no raw text column in any exchange."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_repetition_score"](spark, sf_dir))
        assert plan.count("Exchange hashpartitioning") <= 2
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "text#" not in line

    def test_multi_join_broadcasts_only_bounded_dim(self, spark, sf_dir):
        """With size-based auto-broadcast off, the ONLY broadcast left
        is the explicitly-hinted 25-row nation — orders/customer are
        fact-scale and must not be hint-broadcast (100 TB driver-OOM)."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            plan = physical_plan(QUERIES["ext_multi_join_report"](spark, sf_dir))
            assert plan.count("BroadcastExchange") == 1
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_lm_score_no_cartesian_of_large_relations(self, spark, sf_dir):
        """The 1-row totals join is broadcast-nested-loop by construction;
        a CartesianProduct would mean the big sides cross-joined."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_lm_score"](spark, sf_dir))
        assert "CartesianProduct" not in plan


class TestSegmentOperatorPlans:
    def test_doc_chunk_zero_exchanges(self, spark, sf_dir):
        """Chunking is a narrow per-row transform: split → explode →
        slice must compile to a single stage with no shuffle at all."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_doc_chunk"](spark, sf_dir))
        assert "Exchange" not in plan
        assert "Join" not in plan

    def test_segment_dedup_shuffles_hashes_not_text(self, spark, sf_dir):
        """The dedup decision shuffles (seg_hash, doc_id, chunk_idx)
        only: two exchanges total (hash window + per-doc agg), no joins,
        and no raw text/chunk column in any exchange partitioning."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_segment_dedup"](spark, sf_dir))
        assert plan.count("Exchange hashpartitioning") == 2
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "chunk_text#" not in line and "text#" not in line


class TestSession3OperatorPlans:
    def test_forward_fill_single_exchange(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_forward_fill"](spark, sf_dir))
        assert plan.count("Exchange hashpartitioning") == 1

    def test_quantile_norm_single_exchange(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_quantile_norm"](spark, sf_dir))
        assert plan.count("Exchange hashpartitioning") == 1

    def test_tfidf_text_never_shuffles(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_tfidf"](spark, sf_dir))
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "text#" not in line

    def test_full_outer_is_merge_join_not_broadcast(self, spark, sf_dir):
        """Full outer joins cannot stream one side: the plan must be a
        shuffle-merge, never a broadcast (which would drop unmatched
        build-side rows)."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        df = QUERIES["join_full_outer"](spark, sf_dir)
        df.count()  # finalize the adaptive plan
        plan = physical_plan(df)
        assert "FullOuter" in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
        assert "BroadcastHashJoin" not in plan

    def test_funnel_no_cartesian_of_fact_relations(self, spark, sf_dir):
        """The only cross joins are the broadcast single-row stage
        counts; the event stream itself must never cross-join."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_funnel"](spark, sf_dir))
        assert "CartesianProduct" not in plan


class TestSession4OperatorPlans:
    def test_bloom_probe_is_scan_absorbed(self, spark, sf_dir):
        """The Bloom membership test is a narrow filter — zero
        exchanges until the exact semi-join; pruned-away fact rows
        never shuffle."""
        from proto_to_avro_ql_spark.operators.bloom import (
            bloom_filter_condition,
            build_bloom_words,
        )

        lineitem = read_table(spark, sf_dir, "lineitem")
        orders = read_table(spark, sf_dir, "orders")
        urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
        words = build_bloom_words(urgent, F.col("o_orderkey"))
        pruned = lineitem.where(
            bloom_filter_condition(F.col("l_orderkey"), words, 1 << 16, 3)
        )
        plan = physical_plan(pruned)
        assert "Exchange" not in plan
        assert "shiftleft" in plan  # the bit tests are plain expressions

    def test_zorder_single_range_exchange(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        df = QUERIES["ext_zorder_layout"](spark, sf_dir)
        plan = physical_plan(df)
        assert plan.count("Exchange") == 1
        assert "rangepartitioning(zcode" in plan
        assert "CartesianProduct" not in plan

    def test_temperature_mix_broadcasts_group_stats(self, spark, sf_dir):
        """The corpus never shuffles: the only hash exchanges are on the
        |groups|-row stats relation; thresholds come back via broadcast."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        df = QUERIES["ext_temperature_mix"](spark, sf_dir)
        plan = physical_plan(df)
        assert "BroadcastHashJoin" in plan
        # the docs relation itself is never hash-partitioned on lang
        assert "Exchange hashpartitioning(lang" in plan or plan.count("Exchange hashpartitioning") <= 2
        assert "SortMergeJoin" not in plan

    def test_incremental_lsh_no_cartesian(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        df = QUERIES["ext_dedup_lsh_incremental"](spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestNoGlobalWindows:
    """A Window with an empty partition spec moves the WHOLE relation
    to one task — the canonical scale-killer. The only permissible
    unpartitioned window is over a band-count-bounded relation
    (banded_global_rank's prefix sum)."""

    def test_vocab_top_k_is_take_ordered(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_vocab"](spark, sf_dir))
        assert "TakeOrderedAndProject" in plan
        assert "Window" not in plan

    def test_zorder_manifest_windows_are_banded(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_zorder_manifest"](spark, sf_dir))
        for line in plan.splitlines():
            if "Window [row_number()" in line:
                # every per-row ranking window is partitioned by _band
                assert "_band" in line.split("windowspecdefinition")[1][:80]

    def test_rfm_ntile_windows_are_banded(self, spark, sf_dir):
        """Round-5 fix (r04 verdict #2): the three RFM quintile ranks
        must be per-band partitioned row_numbers, never a global
        NTILE sort over the user relation. The only unpartitioned
        windows left are the band-relation prefix sums (sum(_bn))."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_rfm"](spark, sf_dir))
        saw_rank = 0
        for line in plan.splitlines():
            if "Window [row_number()" in line:
                saw_rank += 1
                assert "_band" in line.split("windowspecdefinition")[1][:80]
            elif "Window [" in line:
                # any other window must be the bounded prefix sum
                assert "sum(_bn" in line
            assert "ntile" not in line
        assert saw_rank == 3

    def test_pareto_running_max_is_banded(self, spark, sf_dir):
        """Round-5 fix (r04 verdict #3): the skyline running max over
        the part relation is per-band partitioned; the only
        unpartitioned window is the prefix max over the band
        relation (max(_bmax))."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_pareto_frontier"](spark, sf_dir))
        saw_local = 0
        for line in plan.splitlines():
            if "Window [max(p_size" in line:
                saw_local += 1
                assert "_band" in line.split("windowspecdefinition")[1][:80]
            elif "Window [" in line:
                assert "max(_bmax" in line
        assert saw_local == 1

    def test_banded_rank_matches_global_window(self, spark, sf_dir):
        """banded_global_rank == Window.orderBy row_number on a real table."""
        from pyspark.sql import Window

        from proto_to_avro_ql_spark.operators.layout import banded_global_rank

        ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
        banded = banded_global_rank(
            ev, F.col("user_id"), [F.col("user_id"), F.col("event_id")], "r"
        )
        naive = ev.withColumn(
            "r_ref",
            F.row_number().over(Window.orderBy("user_id", "event_id")) - 1,
        )
        joined = banded.join(naive, ["user_id", "ts", "event_id"])
        assert joined.where(F.col("r") != F.col("r_ref")).count() == 0


class TestSession5OperatorPlans:
    def test_pivot_declared_values_single_aggregation(self, spark, sf_dir):
        """Declared pivot values: no distinct-discovery scan — exactly
        one exchange (the groupBy) in the plan."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_pivot"](spark, sf_dir))
        assert plan.count("Exchange hashpartitioning") == 1

    def test_unpivot_zero_exchanges(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_unpivot"](spark, sf_dir))
        assert "Exchange" not in plan

    def test_gaql_predicates_push_to_scan(self, spark, sf_dir):
        """IN / LIKE-prefix / IS NOT NULL written as GAQL text reach
        the parquet scan as data filters."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["gaql_predicates"](spark, sf_dir))
        scan = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "StartsWith" in plan or "1995-03" in plan
        assert "PushedFilters" not in scan or "[]" not in scan.split("PushedFilters")[1][:4]

    def test_embed_centroids_shuffles_scalars_not_vectors(self, spark, sf_dir):
        """The (label, pos) aggregation must shuffle partial sums, not
        embedding arrays."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_embed_centroids"](spark, sf_dir))
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "embedding#" not in line


class TestGroupingSetsAndRangeFrame:
    def test_grouping_sets_single_pass(self, spark, sf_dir):
        """GROUPING SETS expands to one Expand + one aggregation chain
        — one shuffle, not one scan per set."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["agg_grouping_sets"](spark, sf_dir))
        assert plan.count("FileScan") == 1
        assert "Expand" in plan
        assert plan.count("Exchange hashpartitioning") == 1

    def test_range_frame_single_shuffle(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_range_frame"](spark, sf_dir))
        assert plan.count("Exchange hashpartitioning") == 1
        assert "RANGE BETWEEN" in plan.upper() or "specifiedwindowframe(RangeFrame" in plan


class TestRound3SurfacePlans:
    def test_entropy_two_count_scale_exchanges(self, spark, sf_dir):
        """token_entropy: (doc,token) hash agg + doc window; the final
        per-doc agg reuses the window's partitioning — exactly two
        exchanges, and the raw text column never crosses either."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_entropy"](spark, sf_dir))
        exchanges = [l for l in plan.splitlines() if "Exchange" in l]
        assert len(exchanges) == 2, plan
        assert all("text#" not in l for l in exchanges), plan

    def test_variant_whole_stage_native(self, spark, sf_dir):
        """Variant parse/extract is JVM expression work: no Python eval
        node, no exchange (narrow projection over the scan)."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_variant_json"](spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan, plan

    def test_pmi_topk_is_take_ordered_no_global_sort(self, spark, sf_dir):
        """PMI top-50: TakeOrderedAndProject (per-partition heads), and
        the marginals are windows over the bigram-vocabulary relation —
        no join back to the corpus-scale pair stream."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_pmi_bigrams"](spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, plan
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, plan

    def test_embed_quantize_zero_exchanges(self, spark, sf_dir):
        """Norm + quantize are narrow array expressions over the scan."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        plan = physical_plan(QUERIES["ext_embed_quantize"](spark, sf_dir))
        assert "Exchange" not in plan, plan


class TestSession4Plans:
    """Round-3 session-3 surfaces: the plan shapes measured at review
    time, pinned so regressions surface as test failures."""

    def _plan(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return physical_plan(QUERIES[name](spark, sf_dir))

    def test_ewma_one_window_one_exchange(self, spark, sf_dir):
        """All 10 lag terms come out of ONE window node on one
        user-keyed shuffle — adding lags must not add exchanges."""
        plan = self._plan(spark, sf_dir, "ext_ewma")
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert plan.count("Window ") == 1, plan

    def test_winsorize_percentiles_broadcast_back(self, spark, sf_dir):
        """One exchange for the percentile agg; the tiny bounds relation
        broadcasts back — the raw relation never shuffles twice."""
        plan = self._plan(spark, sf_dir, "ext_winsorize")
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "BroadcastHashJoin" in plan, plan

    def test_lateral_topk_is_decorrelated(self, spark, sf_dir):
        """The correlated LATERAL subquery must decorrelate into a
        window/join plan — never a per-outer-row nested loop."""
        plan = self._plan(spark, sf_dir, "ext_lateral_topk")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert plan.count("Window ") == 1, plan
        assert plan.count("Exchange hashpartitioning") <= 2, plan

    def test_markov_three_exchanges(self, spark, sf_dir):
        """lead() window on user, (cur,nxt) agg, row-normalize window
        on cur — three keyed exchanges, no joins."""
        plan = self._plan(spark, sf_dir, "ext_markov_transitions")
        assert plan.count("Exchange hashpartitioning") == 3, plan
        assert "Join" not in plan, plan

    def test_url_and_bpe_zero_exchanges(self, spark, sf_dir):
        """Canonicalization and BPE counting are narrow expressions
        that run inside the scan stage — zero exchanges, no Python."""
        for name in ("ext_url_normalize", "ext_token_bpe"):
            plan = self._plan(spark, sf_dir, name)
            assert "Exchange" not in plan, (name, plan)
            assert "EvalPython" not in plan, (name, plan)

    def test_map_in_arrow_no_shuffle(self, spark, sf_dir):
        """The Arrow hop is a map: one Python node, no exchange."""
        plan = self._plan(spark, sf_dir, "ext_map_in_arrow")
        assert "MapInArrow" in plan, plan
        assert "Exchange" not in plan, plan

    def test_pagerank_no_cartesian(self, spark, sf_dir):
        """Three unrolled iterations of keyed joins — never a nested
        loop; the cached edge relation is reused across steps."""
        plan = self._plan(spark, sf_dir, "ext_pagerank")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "InMemoryTableScan" in plan, plan  # edges cached


class TestSession6Plans:
    """Round-3 session-4 surfaces: SQL-definition surfaces, graph and
    statistics operators, crawl/feature-prep additions."""

    def _plan(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return physical_plan(QUERIES[name](spark, sf_dir))

    def test_sql_udf_inlines_into_codegen(self, spark, sf_dir):
        """The SQL-defined function body must inline at analysis time —
        no Python evaluation node, filter/agg fully native."""
        plan = self._plan(spark, sf_dir, "ext_sql_udf")
        assert "EvalPython" not in plan, plan
        assert "Exchange hashpartitioning" in plan, plan

    def test_sql_pipe_parses_to_pushed_down_plan(self, spark, sf_dir):
        """Pipe syntax is surface sugar: the WHERE must still reach the
        scan as a data filter, aggregation still partial."""
        plan = self._plan(spark, sf_dir, "ext_sql_pipe")
        scan = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "partial" in plan.lower() or "HashAggregate" in plan, plan
        assert "EvalPython" not in plan, plan

    def test_sql_params_bind_as_pushable_literals(self, spark, sf_dir):
        """Named parameters bind post-parse as literals, so the range
        predicate must appear in the scan's pushed filters."""
        plan = self._plan(spark, sf_dir, "ext_sql_params")
        assert "PushedFilters: [" in plan, plan
        assert "100.0" in plan, plan  # :lo bound constant-folded to the scan

    def test_skew_profile_topk_no_global_sort(self, spark, sf_dir):
        """Top-10 heavy hitters via TakeOrderedAndProject over the
        aggregated counts; the single-row total broadcasts."""
        plan = self._plan(spark, sf_dir, "ext_key_skew_profile")
        assert "TakeOrderedAndProject" in plan, plan
        assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row total cross join
        assert plan.count("Exchange hashpartitioning") <= 2, plan

    def test_class_balance_single_window_pass(self, spark, sf_dir):
        """One ranking window on the class-keyed shuffle; the min-count
        relation broadcasts — the raw scan shuffles once."""
        plan = self._plan(spark, sf_dir, "ext_class_balance")
        assert plan.count("Window ") == 1, plan
        assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row min cross join

    def test_survivorship_single_aggregation_no_window(self, spark, sf_dir):
        """Golden record is ONE grouped aggregation (max_by), not a
        rank-window + self-join: exactly one keyed exchange, no Window."""
        plan = self._plan(spark, sf_dir, "ext_survivorship")
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Window" not in plan, plan
        assert "Join" not in plan, plan

    def test_triangle_edges_cached_no_cartesian(self, spark, sf_dir):
        """The oriented edge relation is computed once and reused via
        cache across wedge+closure joins; all joins are keyed."""
        plan = self._plan(spark, sf_dir, "ext_triangle_count")
        assert "InMemoryTableScan" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_cusum_windows_partitioned_by_type(self, spark, sf_dir):
        """Both windows run on the tiny aggregated relation and are
        keyed by event_type — never a single-partition global window."""
        plan = self._plan(spark, sf_dir, "ext_cusum")
        assert "Exchange SinglePartition" not in plan, plan
        assert plan.count("Window ") == 2, plan  # running-sum + argmax rank

    def test_autocorr_one_window_one_agg(self, spark, sf_dir):
        """lead() window + moment aggregation both key on event_type
        over the (type, day) relation; no single-partition stage."""
        plan = self._plan(spark, sf_dir, "ext_autocorr")
        assert "Exchange SinglePartition" not in plan, plan
        assert plan.count("Window ") == 1, plan

    def test_chi_square_marginals_broadcast(self, spark, sf_dir):
        """Marginal relations are bounded by category cardinality and
        broadcast; the raw scan feeds exactly one hash aggregate."""
        plan = self._plan(spark, sf_dir, "ext_chi_square")
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_url_dedup_shuffles_keys_not_text(self, spark, sf_dir):
        """Only (canonical_url, id, n_chars, url) reach the exchange —
        document text must not cross the wire."""
        plan = self._plan(spark, sf_dir, "ext_dedup_url")
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "text" not in line, line

    def test_ks_running_sums_partitioned_by_band(self, spark, sf_dir):
        """The per-value cumulative sums must run inside band-keyed
        windows; only the ~50-row band-offset prefix may be global."""
        plan = self._plan(spark, sf_dir, "ext_ks_test")
        for line in plan.splitlines():
            if "Window [sum(ca" in line or "Window [sum(cb" in line:
                assert "_band" in line.split("windowspecdefinition")[1][:80], line
        assert "TakeOrderedAndProject" in plan, plan

    def test_gini_rank_is_banded_not_global(self, spark, sf_dir):
        """The ascending-revenue rank comes from banded_global_rank —
        per-row row_number windows are band-partitioned."""
        plan = self._plan(spark, sf_dir, "ext_gini")
        for line in plan.splitlines():
            if "Window [row_number()" in line:
                assert "_band" in line.split("windowspecdefinition")[1][:80], line

    def test_graph_jaccard_no_full_neighborhood_arrays(self, spark, sf_dir):
        """Common neighbors come from oriented triangle enumeration
        (per-edge triangle support) — keyed joins only, no cartesian,
        edges cached, and NO full-neighborhood adjacency array ever
        materializes (a hub's raw-degree collect_list row was the
        round-3 verdict's one flagged scale-killer): every
        collect_list in the plan must aggregate the ORIENTED target
        column t — out-lists bounded O(sqrt m) by construction —
        never a raw neighbor column."""
        import re

        plan = self._plan(spark, sf_dir, "ext_graph_jaccard")
        assert "CartesianProduct" not in plan, plan
        assert "InMemoryTableScan" in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
        # t: oriented out-lists, bounded O(sqrt m) by construction;
        # pk: per-order basket arrays in the edge build, bounded by
        # basket size (max_basket-cappable). Never a raw neighbor list.
        aggregated = re.findall(r"collect_list\((\w+)#", plan)
        assert aggregated and set(aggregated) <= {"t", "pk"}, plan

    def test_spatial_join_is_cell_equi_join(self, spark, sf_dir):
        """The radius join must plan as an equi join on the grid cell
        (plus the bounded 3x3 broadcast) — never a nested loop over
        point pairs."""
        plan = self._plan(spark, sf_dir, "ext_spatial_join")
        assert "CartesianProduct" not in plan, plan
        joins = [l for l in plan.splitlines() if "HashJoin" in l]
        assert any("cx" in l and "cy" in l for l in joins), plan

    def test_calibration_single_pass_to_bins(self, spark, sf_dir):
        """One hash aggregate to the 10-bin relation; totals broadcast
        back — the scan is read once per branch, never windowed."""
        plan = self._plan(spark, sf_dir, "ext_calibration")
        assert "Window" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row totals cross join

    def test_bootstrap_replicates_are_broadcast_explode(self, spark, sf_dir):
        """100 replicates come from a broadcast range cross join (narrow
        multiply), one hash aggregate to (type, rep); windows partition
        by event_type over the tiny means relation."""
        plan = self._plan(spark, sf_dir, "ext_bootstrap_ci")
        assert "BroadcastNestedLoopJoin" in plan, plan
        assert "Exchange SinglePartition" not in plan, plan

    def test_attribution_joins_are_keyed(self, spark, sf_dir):
        """Touch matching joins on user, windows key on purchase id —
        no cartesian, no single-partition stage."""
        plan = self._plan(spark, sf_dir, "ext_attribution")
        assert "CartesianProduct" not in plan, plan
        assert "Exchange SinglePartition" not in plan, plan

    def test_snapshot_diff_shuffles_hashes_not_text(self, spark, sf_dir):
        """The full-outer merge carries (doc_id, md5) only — document
        text must never reach an exchange."""
        plan = self._plan(spark, sf_dir, "ext_snapshot_diff")
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "text" not in line, line

    def test_benford_and_jsd_single_aggregation_chain(self, spark, sf_dir):
        """Both statistics reduce through hash aggregates with broadcast
        totals — no windows, no nested loops over data-scale relations."""
        for name in ("ext_benford", "ext_js_divergence"):
            plan = self._plan(spark, sf_dir, name)
            assert "Window" not in plan, (name, plan)
            assert "CartesianProduct" not in plan, (name, plan)

    def test_gopher_rules_zero_exchanges_no_python(self, spark, sf_dir):
        """The rule vector is narrow string arithmetic inside the scan
        stage — no exchange, no Python node."""
        plan = self._plan(spark, sf_dir, "ext_gopher_rules")
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan, plan

    def test_label_propagation_reuses_cached_adjacency(self, spark, sf_dir):
        """Three rounds iterate over the CACHED adjacency relation with
        keyed joins — no cartesian, no single-partition stage."""
        plan = self._plan(spark, sf_dir, "ext_label_propagation")
        assert "InMemoryTableScan" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "Exchange SinglePartition" not in plan, plan


class TestSession7Plans:
    """Round-3 session-5 operators: star-contraction CC, journey paths,
    robust/seasonal time series, DP response, correlation matrix,
    distinct-count windows."""

    def _plan(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return physical_plan(QUERIES[name](spark, sf_dir))

    def test_event_paths_topk_no_global_sort(self, spark, sf_dir):
        """Per-user ordering happens INSIDE the aggregate (array_sort of
        the collected struct), the final top-20 is TakeOrdered — no
        row_number window, no single-partition stage."""
        plan = self._plan(spark, sf_dir, "ext_event_paths")
        assert "TakeOrderedAndProject" in plan, plan
        assert "Window" not in plan, plan
        assert "Exchange SinglePartition" not in plan, plan

    def test_rolling_median_one_keyed_window(self, spark, sf_dir):
        """One window node on the event_type-keyed exchange over the
        aggregated (type, day) relation."""
        plan = self._plan(spark, sf_dir, "ext_rolling_median")
        assert plan.count("Window ") == 1, plan
        assert "Exchange SinglePartition" not in plan, plan

    def test_seasonal_index_keyed_window_over_aggregate(self, spark, sf_dir):
        """Totals come from a type-keyed window over the 35-row (type,
        dow) aggregate — no join back, no global window."""
        plan = self._plan(spark, sf_dir, "ext_seasonal_index")
        assert "Exchange SinglePartition" not in plan, plan
        assert "Join" not in plan, plan

    def test_dp_response_single_aggregation_no_python(self, spark, sf_dir):
        """The randomized-response coin is md5 column arithmetic: one
        hash aggregate over the day key, no Python node anywhere."""
        plan = self._plan(spark, sf_dir, "ext_dp_response")
        assert "EvalPython" not in plan, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Window" not in plan, plan

    def test_corr_matrix_joins_aggregated_days_only(self, spark, sf_dir):
        """The day-keyed self-join runs on the aggregated (type, day)
        relation — raw events aggregate once; no cartesian."""
        plan = self._plan(spark, sf_dir, "ext_corr_matrix")
        assert "CartesianProduct" not in plan, plan
        assert "Exchange SinglePartition" not in plan, plan

    def test_window_count_distinct_one_user_exchange(self, spark, sf_dir):
        """The running-set rewrite needs exactly one user-keyed exchange
        feeding one window node."""
        plan = self._plan(spark, sf_dir, "ext_window_count_distinct")
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert plan.count("Window ") == 1, plan

    def test_star_contraction_components_keyed_only(self, spark, sf_dir):
        """Every star round is edge-keyed groupBy + join: no cartesian,
        no single-partition exchange. At test SF the default cutoff
        routes the whole graph through the bounded local union-find
        (r05), so the distributed shape is asserted with cutoff=0 and
        the two paths must agree row-for-row."""
        from proto_to_avro_ql_spark.operators.clustering import (
            star_contraction_components,
        )
        from proto_to_avro_ql_spark.operators.graphs import copurchase_edges

        e0 = copurchase_edges(spark, sf_dir, min_support=2).select(
            F.col("u").alias("id_a"), F.col("v").alias("id_b")
        )
        dist = star_contraction_components(e0, local_cutoff=0)
        plan = physical_plan(dist)
        assert "CartesianProduct" not in plan, plan
        assert "Exchange SinglePartition" not in plan, plan
        local = star_contraction_components(e0)
        assert sorted(map(tuple, dist.collect())) == sorted(
            map(tuple, local.collect())
        )

    def test_mann_whitney_running_sum_banded(self, spark, sf_dir):
        """The midrank cumulative counts run inside band-keyed windows
        over the cached distinct-cents relation; only the small band
        offset prefix may be unpartitioned."""
        plan = self._plan(spark, sf_dir, "ext_mann_whitney")
        assert "InMemoryTableScan" in plan, plan
        for line in plan.splitlines():
            if "Window [sum((ca" in line:
                assert "_band" in line.split("windowspecdefinition")[1][:80], line
        assert "CartesianProduct" not in plan, plan

    def test_mutual_information_marginals_broadcast(self, spark, sf_dir):
        """The contingency relation aggregates once (cached); marginal
        joins broadcast — no data-scale shuffle after the first agg."""
        plan = self._plan(spark, sf_dir, "ext_mutual_information")
        assert "InMemoryTableScan" in plan, plan
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_kcore_semi_joins_keyed(self, spark, sf_dir):
        """Distributed peeling rounds are degree aggregates + LeftSemi
        equi joins — never cartesian, never single-partition. At test
        SF the default local_cutoff routes the whole graph through the
        bounded numpy tail (the r05 fix for scheduling-bound late
        rounds), so the distributed shape is asserted by forcing
        cutoff=0, and the two paths must agree row-for-row."""
        from proto_to_avro_ql_spark.operators.clustering import kcore_nodes
        from proto_to_avro_ql_spark.operators.graphs import copurchase_edges

        e0 = copurchase_edges(spark, sf_dir, min_support=2).select(
            F.col("u").alias("id_a"), F.col("v").alias("id_b")
        )
        dist = kcore_nodes(e0, k=3, local_cutoff=0)
        plan = physical_plan(dist)
        assert "LeftSemi" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "Exchange SinglePartition" not in plan, plan
        local = kcore_nodes(e0, k=3)  # default cutoff: numpy tail
        assert sorted(map(tuple, dist.collect())) == sorted(
            map(tuple, local.collect())
        )

    def test_freq_triples_candidates_from_pairs(self, spark, sf_dir):
        """Candidate triples come from the CACHED frequent-pair
        relation's self-joins (Apriori), support from keyed joins on
        the cached basket relation — all equi joins."""
        plan = self._plan(spark, sf_dir, "ext_freq_triples")
        assert "InMemoryTableScan" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_jsonl_scan_projects_declared_schema(self, spark, sf_dir):
        """The JSONL read uses the declared schema (no inference scan)
        and projects only requested columns."""
        plan = self._plan(spark, sf_dir, "src_jsonl_scan")
        assert "FileScan json" in plan, plan
        assert "EvalPython" not in plan, plan

    def test_trend_ols_single_moment_aggregate(self, spark, sf_dir):
        """All five moments accumulate in one grouped aggregate over the
        (type, day) relation — no window, no join."""
        plan = self._plan(spark, sf_dir, "ext_trend_ols")
        assert "Window" not in plan, plan
        assert "Join" not in plan, plan

    def test_time_weighted_avg_one_window_one_agg(self, spark, sf_dir):
        """Interval assignment is one type-keyed window; the 128-bit
        weighted sums reduce in one aggregate."""
        plan = self._plan(spark, sf_dir, "ext_time_weighted_avg")
        assert plan.count("Window ") == 1, plan
        assert "Exchange SinglePartition" not in plan, plan

    def test_impute_median_broadcasts_medians(self, spark, sf_dir):
        """The per-group medians broadcast back onto the full stream —
        the event-scale relation never shuffles."""
        plan = self._plan(spark, sf_dir, "ext_impute_median")
        assert "BroadcastHashJoin" in plan, plan
        assert "Exchange hashpartitioning" in plan, plan  # only the median agg

    def test_weighted_median_windows_keyed_by_lang(self, spark, sf_dir):
        """Running weight sums are partitioned by lang over the tiny
        (lang, length) relation — never a global window."""
        plan = self._plan(spark, sf_dir, "ext_weighted_median")
        assert "Exchange SinglePartition" not in plan, plan
        for line in plan.splitlines():
            if "Window [sum(w" in line:
                assert "lang" in line.split("windowspecdefinition")[1][:60], line

    def test_entity_resolution_vocab_scale_only(self, spark, sf_dir):
        """Pair generation and clustering run at vocabulary scale with
        keyed joins; no cartesian anywhere in the composition."""
        plan = self._plan(spark, sf_dir, "ext_entity_resolution")
        assert "CartesianProduct" not in plan, plan
        assert "Exchange SinglePartition" not in plan, plan

    def test_lift_table_rank_is_banded(self, spark, sf_dir):
        """The decile cut comes from banded_global_rank — per-row
        row_number windows are band-partitioned; only the 10-row decile
        relation may use unpartitioned windows."""
        plan = self._plan(spark, sf_dir, "ext_lift_table")
        for line in plan.splitlines():
            if "Window [row_number()" in line:
                assert "_band" in line.split("windowspecdefinition")[1][:80], line
        assert "CartesianProduct" not in plan, plan

    def test_survival_km_prefix_over_duration_relation(self, spark, sf_dir):
        """At-risk counts and the KM product run over the tiny duration
        relation (cached) — the event table aggregates exactly once."""
        plan = self._plan(spark, sf_dir, "ext_survival_km")
        assert "InMemoryTableScan" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_cramers_v_reuses_chi_square_kernel_shape(self, spark, sf_dir):
        """Contingency cached, marginals broadcast, no data-scale
        shuffle after the first aggregate."""
        plan = self._plan(spark, sf_dir, "ext_cramers_v")
        assert "InMemoryTableScan" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_cuped_single_user_aggregate(self, spark, sf_dir):
        """One user-keyed aggregate feeds both the pooled moments and
        the per-variant sums (cached); the final math is single-row."""
        plan = self._plan(spark, sf_dir, "ext_cuped")
        assert "InMemoryTableScan" in plan, plan
        assert plan.count("Exchange hashpartitioning") <= 3, plan

    def test_sprt_single_daily_aggregate(self, spark, sf_dir):
        """One day-keyed aggregate + the 30-row prefix window; the LLR
        factors are constant-folded, no Python anywhere."""
        plan = self._plan(spark, sf_dir, "ext_sprt_monitor")
        assert "EvalPython" not in plan, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan

    def test_trimmed_mean_banded_per_type(self, spark, sf_dir):
        """Running counts are (type, band)-keyed windows over the
        cached distinct-cents relation; totals broadcast back."""
        plan = self._plan(spark, sf_dir, "ext_trimmed_mean")
        assert "InMemoryTableScan" in plan, plan
        for line in plan.splitlines():
            if "Window [sum(cnt" in line:
                spec = line.split("windowspecdefinition")[1][:90]
                assert "event_type" in spec, line
        assert "CartesianProduct" not in plan, plan

    def test_diff_in_diff_one_conditional_aggregate(self, spark, sf_dir):
        """The 2x2 cells come from one grouped aggregate; the estimate
        is single-row math — two exchanges end to end, no Python."""
        plan = self._plan(spark, sf_dir, "ext_diff_in_diff")
        assert "EvalPython" not in plan, plan
        assert plan.count("Exchange hashpartitioning") <= 1, plan

    def test_psi_terms_over_ten_bin_relation(self, spark, sf_dir):
        """Counts aggregate once into the 10-bin relation; totals
        broadcast back; no window, no cartesian beyond the 1-row total."""
        plan = self._plan(spark, sf_dir, "ext_psi")
        assert "Window" not in plan, plan
        assert plan.count("Exchange hashpartitioning") <= 2, plan

    def test_token_overlap_joins_type_relation(self, spark, sf_dir):
        """The (lang, token) type relation is cached and self-joined on
        the token key; sizes broadcast back — tokens, never documents,
        carry the join."""
        plan = self._plan(spark, sf_dir, "ext_token_overlap_matrix")
        assert "InMemoryTableScan" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_burstiness_single_moment_aggregate(self, spark, sf_dir):
        """Counts aggregate to (type, day), moments reduce per type —
        no window, no join."""
        plan = self._plan(spark, sf_dir, "ext_burstiness")
        assert "Window" not in plan, plan
        assert "Join" not in plan, plan

    def test_zipf_candidates_via_take_ordered(self, spark, sf_dir):
        """Top-1000 tokens come from TakeOrderedAndProject over the
        vocabulary aggregate; ranking happens on the bounded relation."""
        plan = self._plan(spark, sf_dir, "ext_zipf_fit")
        assert "TakeOrderedAndProject" in plan, plan


class TestRound4Plans:
    """Round-4 corpus-maintenance operators: shuffle payloads and
    physical strategies that make them 100 TB-shaped."""

    def _plan(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return physical_plan(QUERIES[name](spark, sf_dir))

    def test_dedup_span_counting_shuffle_carries_no_text(self, spark, sf_dir):
        """The span-counting aggregation must shuffle (span_hash,
        doc_id) only; span TEXT is resolved after top-k through a
        broadcast probe of the 20-hash set."""
        plan = self._plan(spark, sf_dir, "ext_dedup_span")
        assert "BroadcastHashJoin" in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line and "span_hash" in line:
                assert "span#" not in line.split("hashpartitioning")[1], line

    def test_reservoir_sample_is_take_ordered_not_global_sort(
        self, spark, sf_dir
    ):
        """The k-sample must plan as per-partition top-k + one k-row
        reduce (TakeOrderedAndProject) — never a full Sort/rangepartitioning
        of the corpus; the only window runs over the bounded 100-row
        relation."""
        plan = self._plan(spark, sf_dir, "ext_reservoir_sample")
        assert "TakeOrderedAndProject" in plan, plan
        assert "Exchange rangepartitioning" not in plan, plan

    def test_minhash_merge_signature_is_one_aggregation(self, spark, sf_dir):
        """All 16 signature minima compute inside ONE source-keyed
        hash aggregate with map-side partial combine (the sketch-merge
        algebra) — never a 16x row explode before the shuffle."""
        plan = self._plan(spark, sf_dir, "ext_minhash_merge")
        assert "partial_min" in plan, plan  # map-side combine of the minima
        # stack() melts AFTER the aggregate; the generator must not
        # appear upstream of the signature aggregation
        agg_lines = [
            l for l in plan.splitlines() if "HashAggregate" in l and "min(" in l
        ]
        assert agg_lines, plan


class TestGlobalPlanHygiene:
    def test_no_entry_plans_a_cartesian_product(self, spark, sf_dir):
        """Global guard over EVERY queries() entry (~90 s): a
        CartesianProduct in any plan means an equi join lost its keys
        (1-row statistics crossJoins legitimately plan as the bounded
        BroadcastNestedLoopJoin, which stays allowed). Sweeping all
        265 entries catches the class of regression where a refactor
        renames a join column and Catalyst silently degrades the join
        to a cross product."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        bad = []
        for name, fn in QUERIES.items():
            plan = physical_plan(fn(spark, sf_dir))
            if "CartesianProduct" in plan:
                bad.append(name)
        assert not bad, bad


class TestRound4Session2Plans:
    """Round-4 session-2 operators: the physical strategies that keep
    the new entries 100 TB-shaped."""

    def _plan(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return physical_plan(QUERIES[name](spark, sf_dir))

    def test_join_theta_broadcasts_the_small_side(self, spark, sf_dir):
        """A pure inequality join has no equi key, so the ONLY scalable
        physical strategy is nested-loop with the 4-row side broadcast:
        the fact streams through unshuffled. A CartesianProduct or a
        shuffle of orders before the join would mean the hint was
        lost."""
        plan = self._plan(spark, sf_dir, "join_theta")
        assert "BroadcastNestedLoopJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "SortMergeJoin" not in plan, plan

    def test_shortest_path_reuses_cached_edges(self, spark, sf_dir):
        """All three BFS rounds must join against the SAME cached edge
        relation (InMemoryTableScan), not rebuild the lineitem
        self-join per round; shuffles carry only (id, dist) longs."""
        plan = self._plan(spark, sf_dir, "ext_shortest_path")
        assert "InMemoryTableScan" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_prop_ztest_is_one_partial_aggregate_pass(self, spark, sf_dir):
        """All four cell counts of the z-test come from ONE
        map-side-combinable aggregation over the fact — no window, no
        self-join, no second scan."""
        plan = self._plan(spark, sf_dir, "ext_prop_ztest")
        assert "partial_sum" in plan, plan
        assert "Window" not in plan, plan
        assert plan.count("FileScan") == 1, plan

    def test_pit_features_single_scan_builds_both_sides_of_the_wall(
        self, spark, sf_dir
    ):
        """Features (before cutoff) and label (after) must come from
        one conditional-aggregation pass — a self-join of the fact
        against itself across the time wall is the anti-pattern."""
        plan = self._plan(spark, sf_dir, "ext_pit_features")
        assert plan.count("FileScan") == 1, plan
        assert "Join" not in plan, plan

    def test_qte_reads_events_once_for_all_deciles(self, spark, sf_dir):
        """All 18 per-arm quantiles compute in ONE aggregation over one
        scan (conditional inputs); the 9-row melt happens after. The
        oracle's per-decile UNION ALL is oracle-side only."""
        plan = self._plan(spark, sf_dir, "ext_qte")
        assert plan.count("FileScan") == 1, plan

    def test_hits_topk_is_take_ordered_not_global_sort(self, spark, sf_dir):
        """Top-20 authorities must plan as per-partition heaps + one
        20-row reduce, never a rangepartitioning sort of the part
        relation."""
        plan = self._plan(spark, sf_dir, "ext_hits")
        assert "TakeOrderedAndProject" in plan, plan
        assert "Exchange rangepartitioning" not in plan, plan

    def test_negative_sampling_anti_join_is_keyed(self, spark, sf_dir):
        """Candidate filtering must be a keyed LeftAnti join against
        the positives — not a nested-loop containment check — and the
        1-row part-domain max broadcasts."""
        plan = self._plan(spark, sf_dir, "ext_negative_sampling")
        assert "LeftAnti" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_binary_files_scan_projects_metadata_lazily(self, spark, sf_dir):
        """The binaryFile source must appear as its own scan relation;
        the md5/length projection happens in-plan (no Python hop)."""
        plan = self._plan(spark, sf_dir, "src_binary_files")
        assert "binaryFile" in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_modularity_reuses_cached_labels_and_edges(self, spark, sf_dir):
        """The intra-edge join probes the cached label relation on BOTH
        endpoints and the Q kernel is integer until the final division:
        cached relations must appear, and no per-community double sum
        may feed a partial_sum of doubles."""
        plan = self._plan(spark, sf_dir, "ext_modularity")
        assert "InMemoryTableScan" in plan, plan
        assert "CartesianProduct" not in plan, plan


class TestRound4Session2LateBatchPlans:
    """Plan contracts for the post-close session-2 batches (data ops,
    surfaces, robust stats)."""

    def _plan(self, spark, sf_dir, name):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        return physical_plan(QUERIES[name](spark, sf_dir))

    def test_fk_audit_anti_joins_broadcast_the_parent_keys(self, spark, sf_dir):
        """Every orphan probe must be a BroadcastHashJoin LeftAnti on
        the parent-key relation — a shuffled anti join would move the
        fact for a key-only containment check."""
        plan = self._plan(spark, sf_dir, "ext_fk_audit")
        assert "LeftAnti, BuildRight" in plan, plan
        assert "SortMergeJoin" not in plan, plan

    def test_gdpr_cascade_facts_never_join_facts(self, spark, sf_dir):
        """Cascade counts are semi probes against broadcast key sets;
        lineitem and orders must not shuffle against each other."""
        plan = self._plan(spark, sf_dir, "ext_gdpr_cascade")
        assert "LeftSemi" in plan, plan
        assert "SortMergeJoin" not in plan, plan

    def test_stratified_ate_is_one_pass_plus_bounded_window(self, spark, sf_dir):
        """All per-stratum cells from ONE conditional aggregate over
        one scan; the only windows run over the 5-row stratum
        relation."""
        plan = self._plan(spark, sf_dir, "ext_stratified_ate")
        assert plan.count("FileScan") == 1, plan
        assert "partial_sum" in plan, plan

    def test_theilsen_pair_join_is_keyed_on_type(self, spark, sf_dir):
        """The slope pair join must be an equi join on event_type with
        the inequality as a post-condition — a cartesian of the daily
        relations would lose the per-type bound."""
        plan = self._plan(spark, sf_dir, "ext_theilsen")
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan

    def test_clustering_coeff_reuses_cached_oriented_lists(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "ext_clustering_coeff")
        assert "InMemoryTableScan" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_backtest_naive_single_scan_single_window(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "ext_backtest_naive")
        assert plan.count("FileScan") == 1, plan
        assert plan.count("Window") == 1, plan


class TestRound6Plans:
    """Round-6 plan pins."""

    def test_copurchase_edge_build_two_exchanges_no_distinct(self, spark, sf_dir):
        """The raw-table edge build dedups in-aggregate (collect_set
        with map-side partials on the order key): exactly TWO
        hash-partitioning exchanges — the ok-keyed basket agg and the
        (u,v)-keyed support agg — with no separate distinct() exchange
        over the full (ok, pk) relation (r6: one fewer fact-scale
        shuffle for the whole graph family)."""
        from proto_to_avro_ql_spark.operators.graphs import copurchase_edges

        df = copurchase_edges(spark, sf_dir, min_support=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 2, plan
        assert "collect_set" in plan, plan

    def test_copurchase_edges_match_baskets_path(self, spark, sf_dir):
        """collect_set-on-raw and collect_list-on-distinct-baskets are
        the same edge set."""
        from proto_to_avro_ql_spark.operators.graphs import (
            copurchase_baskets,
            copurchase_edges,
        )

        raw = copurchase_edges(spark, sf_dir, min_support=2)
        via_baskets = copurchase_edges(
            spark, sf_dir, min_support=2, baskets=copurchase_baskets(spark, sf_dir)
        )
        assert sorted(map(tuple, raw.collect())) == sorted(
            map(tuple, via_baskets.collect())
        )
