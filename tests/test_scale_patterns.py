"""Session-4 scale-pattern operators: Bloom semi-join pruning, Z-order
layout, temperature mixing, incremental LSH dedup.

The DuckDB oracles pin output values; these tests pin the properties
the oracle cannot see — that the Bloom filter actually prunes, that
the z-layout actually clusters, that the mix actually rebalances, and
that incremental admission agrees with brute force.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from proto_to_avro_ql_spark.operators.bloom import (
    bloom_filter_condition,
    bloom_semi_join,
    build_bloom_words,
)
from proto_to_avro_ql_spark.operators.dedup import incremental_lsh_admit, ngram_jaccard_pairs
from proto_to_avro_ql_spark.operators.layout import morton_code, morton_code_sql, zorder_layout
from proto_to_avro_ql_spark.operators.sampling import temperature_sample
from proto_to_avro_ql_spark.sources.io import read_table


def _morton_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


class TestBloomPrune:
    M = 1 << 16
    K = 3

    def test_result_equals_plain_semi_join(self, spark, sf_dir):
        lineitem = read_table(spark, sf_dir, "lineitem")
        orders = read_table(spark, sf_dir, "orders")
        urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
        got = (
            bloom_semi_join(
                lineitem, F.col("l_orderkey"), urgent, F.col("o_orderkey"), self.M, self.K
            )
            .select("l_orderkey", "l_linenumber")
            .collect()
        )
        want = (
            lineitem.join(
                urgent.select("o_orderkey").distinct(),
                F.col("l_orderkey") == F.col("o_orderkey"),
                "left_semi",
            )
            .select("l_orderkey", "l_linenumber")
            .collect()
        )
        assert sorted(got) == sorted(want)

    def test_no_false_negatives_and_real_pruning(self, spark, sf_dir):
        lineitem = read_table(spark, sf_dir, "lineitem")
        orders = read_table(spark, sf_dir, "orders")
        urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
        words = build_bloom_words(urgent, F.col("o_orderkey"), self.M, self.K)
        assert len(words) == self.M // 64

        n_total = lineitem.count()
        n_bloom = lineitem.where(
            bloom_filter_condition(F.col("l_orderkey"), words, self.M, self.K)
        ).count()
        n_exact = lineitem.join(
            urgent.select("o_orderkey").distinct(),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        ).count()
        # No false negatives: every true match passes the filter.
        assert n_bloom >= n_exact
        # The filter genuinely prunes: strictly fewer rows than the scan,
        # and the false-positive overhead is bounded (generous 2x the
        # theoretical fpp given ~1.2k keys in 64 Ki bits).
        assert n_bloom < n_total
        assert (n_bloom - n_exact) <= max(50, int(0.02 * n_total))


class TestZorder:
    def test_morton_code_matches_python(self, spark):
        pts = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 1), (65535, 65535), (1234, 4321)]
        df = spark.createDataFrame(pts, "x INT, y INT")
        rows = df.select(
            "x", "y", morton_code(F.col("x"), F.col("y")).alias("z")
        ).collect()
        for r in rows:
            assert r["z"] == _morton_py(r["x"], r["y"]), (r["x"], r["y"])

    def test_morton_sql_twin(self):
        import duckdb

        got = duckdb.sql(
            f"SELECT {morton_code_sql('x', 'y')} AS z FROM (VALUES (3, 5), (255, 1), (65535, 65535)) t(x, y)"
        ).fetchall()
        assert [g[0] for g in got] == [
            _morton_py(3, 5),
            _morton_py(255, 1),
            _morton_py(65535, 65535),
        ]

    def test_layout_clusters_both_dimensions(self, spark):
        """After z-range layout, per-partition bounding boxes are tight
        on BOTH keys; a single-key sort leaves the other key's span at
        full width in every partition. A uniform 64x64 grid makes the
        geometry exact: 16 z-ranges of 256 cells are ~16x16 blocks
        (x-span ~15), while 16 y-ranges are 4 full rows (x-span 63)."""
        grid = spark.range(64 * 64).select(
            (F.col("id") % 64).alias("xk"), (F.col("id") / 64).cast("int").alias("tk")
        )
        n_ranges = 16

        def mean_span(df, order_col):
            parts = (
                df.repartitionByRange(n_ranges, F.col(order_col))
                .withColumn("pid", F.spark_partition_id())
                .groupBy("pid")
                .agg((F.max("xk") - F.min("xk")).alias("span"))
            )
            rows = parts.collect()
            return sum(r["span"] for r in rows) / len(rows)

        z = grid.withColumn("zc", morton_code(F.col("xk"), F.col("tk")))
        z_span = mean_span(z, "zc")
        y_span = mean_span(grid.withColumn("zc", F.col("tk")), "zc")
        # Z-order partitions must bound xk dramatically tighter than a
        # single-key layout (which leaves xk unclustered at full width).
        assert z_span < 0.5 * y_span, (z_span, y_span)


class TestTemperatureMix:
    def test_rebalances_toward_uniform(self, spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        before = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
        kept = temperature_sample(docs, "lang", "doc_id", alpha=0.5)
        after = {r["lang"]: r["count"] for r in kept.groupBy("lang").count().collect()}

        # Every language survives; nothing is upsampled.
        assert set(after) == set(before)
        for lang in before:
            assert 0 < after[lang] <= before[lang]

        def spread(d):
            shares = [v / sum(d.values()) for v in d.values()]
            return max(shares) / min(shares)

        # The mix is strictly flatter than the input.
        assert spread(after) < spread(before)
        # The dominant group is downsampled hardest (relative keep rate).
        keep_rate = {k: after[k] / before[k] for k in before}
        dominant = max(before, key=before.get)
        assert keep_rate[dominant] == min(keep_rate.values())

    def test_partition_invariant(self, spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        a = sorted(
            (r["doc_id"])
            for r in temperature_sample(docs, "lang", "doc_id").select("doc_id").collect()
        )
        b = sorted(
            (r["doc_id"])
            for r in temperature_sample(docs.repartition(7), "lang", "doc_id")
            .select("doc_id")
            .collect()
        )
        assert a == b


class TestIncrementalLsh:
    def test_admission_matches_brute_force(self, spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        batch_pred = F.col("doc_id") % 10 == 7
        admitted = {
            r["doc_id"]
            for r in incremental_lsh_admit(docs, batch_pred, threshold=0.2)
            .select("doc_id")
            .collect()
        }
        # Brute force: all cross pairs >= 0.2 via exact n-gram Jaccard
        # (no max_df suppression: small corpus).
        pairs = ngram_jaccard_pairs(docs, threshold=0.2, max_df=10**9)
        batch_ids = {
            r["doc_id"] for r in docs.where(batch_pred).select("doc_id").collect()
        }
        dup = set()
        for r in pairs.collect():
            a, b = r["id_a"], r["id_b"]
            if (a in batch_ids) != (b in batch_ids):
                dup.add(a if a in batch_ids else b)
        assert admitted == batch_ids - dup


class TestZorderManifest:
    def test_manifest_skips_on_non_leading_dim(self, spark, sf_dir):
        """The point of z-order: a probe on xk (the dimension a time
        sort would NOT cluster) prunes a meaningful fraction of
        z-buckets via their min/max stats."""
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        man = QUERIES["ext_zorder_manifest"](spark, sf_dir).collect()
        assert len(man) > 4
        skipped = sum(1 for r in man if r["skip_u_4_8"])
        # Meaningful pruning on user_id — and not everything skips.
        assert 0 < skipped < len(man), (skipped, len(man))
        # Bounding boxes are consistent.
        for r in man:
            assert r["min_u"] <= r["max_u"] and r["min_ts"] <= r["max_ts"]


class TestDomainCap:
    def test_cap_and_determinism(self, spark, sf_dir):
        from proto_to_avro_ql_spark.entry_queries import QUERIES

        out = QUERIES["ext_domain_cap"](spark, sf_dir)
        per_src = out.groupBy("source").count().collect()
        assert all(r["count"] <= 20 for r in per_src)
        a = sorted(r["doc_id"] for r in out.collect())
        b = sorted(r["doc_id"] for r in QUERIES["ext_domain_cap"](spark, sf_dir).collect())
        assert a == b


class TestIncrementalMaintenance:
    def test_incremental_agg_equals_full_recompute(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from proto_to_avro_ql_spark.entry_queries import QUERIES
        from proto_to_avro_ql_spark.functions.stable import dec_sum
        from proto_to_avro_ql_spark.sources.io import read_table

        inc = QUERIES["ext_incremental_agg"](spark, sf_dir)
        ev = read_table(spark, sf_dir, "events")
        full = ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", 4).alias("sum_value"),
        )
        a = sorted(map(tuple, inc.collect()))
        b = sorted(map(tuple, full.collect()))
        assert a == b

    def test_hll_union_of_dailies_equals_direct_sketch(self, spark, sf_dir):
        """Register-max associativity: merged daily sketches must give
        the EXACT same estimate as sketching the whole set. Round 8:
        both sides now use the portable integer kernel — the entry
        stages per-day registers, the direct side sketches in one pass
        (which is also what its DuckDB oracle does, so the driver gate
        re-proves this on every run); and the estimate must actually be
        CLOSE to the exact distinct count, which associativity alone
        can't promise."""
        from pyspark.sql import functions as F

        from proto_to_avro_ql_spark.entry_queries import QUERIES
        from proto_to_avro_ql_spark.entry_registry import (
            _hll_spark_estimate,
            _hll_spark_regs,
        )
        from proto_to_avro_ql_spark.sources.io import read_table

        merged = {
            r["event_type"]: r["n_users_est"]
            for r in QUERIES["ext_incremental_distinct"](spark, sf_dir).collect()
        }
        ev = read_table(spark, sf_dir, "events")
        regs = _hll_spark_regs(ev, "user_id", ["event_type"])
        direct = {
            r["event_type"]: r["est"]
            for r in _hll_spark_estimate(regs, ["event_type"]).collect()
        }
        assert merged == direct
        exact = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("n"))
            .collect()
        }
        for t, est in merged.items():
            assert abs(est - exact[t]) / exact[t] < 0.12, (t, est, exact[t])
