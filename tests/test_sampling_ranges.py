"""Correctness pins for deterministic sampling and the binned range join."""

from __future__ import annotations

from pyspark.sql import functions as F

from proto_to_avro_ql_spark.operators.ranges import range_join_binned
from proto_to_avro_ql_spark.operators.sampling import stratified_sample
from proto_to_avro_ql_spark.sources.io import read_table


class TestStratifiedSample:
    def test_deterministic_and_rate_bounded(self, spark, sf_dir):
        ev = read_table(spark, sf_dir, "events").select("event_id", "event_type")
        rates = {"click": 0.10, "error": 1.0, "view": 0.05}
        s1 = {r.event_id for r in stratified_sample(ev, "event_type", "event_id", rates).collect()}
        # repartitioning must not change membership (no RNG anywhere)
        s2 = {
            r.event_id
            for r in stratified_sample(
                ev.repartition(7), "event_type", "event_id", rates
            ).collect()
        }
        assert s1 == s2 and len(s1) > 0

        by_type = dict(
            stratified_sample(ev, "event_type", "event_id", rates)
            .groupBy("event_type")
            .count()
            .collect()
        )
        totals = dict(ev.groupBy("event_type").count().collect())
        assert by_type["error"] == totals["error"]  # rate 1.0 keeps all
        assert "purchase" not in by_type  # default rate 0 drops stratum
        # 10% nominal rate lands in a loose band (hash variance at sf0.001)
        assert 0.02 < by_type["click"] / totals["click"] < 0.25

    def test_matches_oracle_bucket(self, spark):
        """Spark's conv(md5) bucket must equal DuckDB's hex-cast bucket."""
        import duckdb

        df = spark.range(1000).select(F.col("id").cast("string").alias("k"))
        from proto_to_avro_ql_spark.operators.sampling import hash_bucket

        got = {r.k: r.b for r in df.select("k", hash_bucket(F.col("k")).alias("b")).collect()}
        want = {
            str(i): b
            for i, b in duckdb.sql(
                "SELECT i, ('0x'||substr(md5(CAST(i AS VARCHAR)),1,8))::BIGINT % 100 "
                "FROM range(1000) t(i)"
            ).fetchall()
        }
        assert got == want


class TestRangeJoinBinned:
    def test_equals_naive_nested_loop(self, spark, sf_dir):
        ev = read_table(spark, sf_dir, "events").select("event_id", "ts")
        inc = (
            ev.orderBy(F.asc("event_id"))
            .limit(15)
            .select(
                F.col("event_id").alias("iid"),
                F.col("ts").alias("start"),
                (F.col("ts") + F.expr("INTERVAL 3 HOURS")).alias("end"),
            )
        )
        binned = {
            (r.iid, r.event_id)
            for r in range_join_binned(ev, inc, bin_seconds=3600).collect()
        }
        naive = {
            (r.iid, r.event_id)
            for r in ev.join(
                inc,
                (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")),
            ).collect()
        }
        assert binned == naive and len(naive) > 0

    def test_no_duplicate_matches_with_small_bins(self, spark, sf_dir):
        """An interval spanning many bins must still yield each match once."""
        ev = read_table(spark, sf_dir, "events").select("event_id", "ts")
        inc = (
            ev.orderBy(F.asc("event_id"))
            .limit(5)
            .select(
                F.col("event_id").alias("iid"),
                F.col("ts").alias("start"),
                (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end"),
            )
        )
        out = range_join_binned(ev, inc, bin_seconds=60)  # 120+ bins/interval
        assert out.count() == out.select("iid", "event_id").distinct().count()


class TestSamplingProperties:
    def test_rates_partition_the_keyspace(self, spark):
        """For any rate r, the kept set at rate r is a subset of the
        kept set at any higher rate (buckets are nested prefixes)."""
        from pyspark.sql import functions as F

        df = spark.range(2000).select(
            F.col("id").alias("k"), F.lit("s").alias("g")
        )
        kept = {}
        for r in (0.05, 0.25, 0.60, 1.0):
            kept[r] = {
                row.k
                for row in stratified_sample(df, "g", "k", {"s": r}).collect()
            }
        assert kept[0.05] <= kept[0.25] <= kept[0.60] <= kept[1.0]
        assert len(kept[1.0]) == 2000


class TestRangeJoinProperty:
    def test_random_intervals_equal_naive(self, spark):
        """Hypothesis-style sweep: for several seeded random interval
        sets (varying widths incl. zero-length and bin-straddling), the
        binned join equals the naive inequality join."""
        import random

        from pyspark.sql import functions as F

        rng = random.Random(1234)
        base = [(i, 1_700_000_000 + rng.randint(0, 400_000)) for i in range(300)]
        ev = spark.createDataFrame(base, "event_id long, epoch long").select(
            "event_id", F.timestamp_seconds("epoch").alias("ts")
        )
        for trial in range(3):
            ivs = []
            for j in range(12):
                s = 1_700_000_000 + rng.randint(0, 400_000)
                width = rng.choice([0, 59, 3600, 7200, 13_000])
                ivs.append((j, s, s + width))
            inc = spark.createDataFrame(
                ivs, "iid long, s long, e long"
            ).select(
                "iid",
                F.timestamp_seconds("s").alias("start"),
                F.timestamp_seconds("e").alias("end"),
            )
            binned = {
                (r.iid, r.event_id)
                for r in range_join_binned(ev, inc, bin_seconds=3600).collect()
            }
            naive = {
                (r.iid, r.event_id)
                for r in ev.join(
                    inc,
                    (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")),
                ).collect()
            }
            assert binned == naive, f"trial {trial} mismatch"
