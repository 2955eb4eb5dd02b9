"""End-to-end user story: the full workflow a reference user would run,
re-expressed on this engine — text query → cached execution → sinks →
incremental re-run. One narrative test over the real surfaces.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from proto_to_avro_ql_spark import QueryCache, run_gaql
from proto_to_avro_ql_spark.fixtures import ads_row
from proto_to_avro_ql_spark.plans.gaql import parse_gaql
from proto_to_avro_ql_spark.sources.incremental import IncrementalRunner, WatermarkStore
from proto_to_avro_ql_spark.sources.io import sink_json_direct, write_avro_or_parquet


class TestUserStory:
    def test_report_workflow(self, spark, sf_dir):
        query_text = (
            "SELECT customer.id, campaign.id, segments.date, metrics.cost_micros "
            "FROM ads_row WHERE metrics.impressions > 0"
        )

        # 1. compile + execute the text query, through the result cache
        cache = QueryCache(spark, tempfile.mkdtemp(prefix="story_cache_"))
        runs = []

        def produce():
            runs.append(1)
            return run_gaql(
                spark, query_text, resolve_table=lambda n: ads_row(spark, sf_dir)
            ).select(
                F.col("customer.id").alias("customer_id"),
                F.col("campaign.id").alias("campaign_id"),
                F.col("segments.date").alias("segments_date"),
                F.col("metrics.cost_micros").alias("cost_micros"),
            )

        report = cache.run(parse_gaql(query_text).text, produce)
        n_rows = report.count()
        assert n_rows > 0 and len(runs) == 1

        # 2. re-running the same query text replays the cache
        report2 = cache.run(parse_gaql(query_text).text, produce)
        assert report2.count() == n_rows and len(runs) == 1

        # 3. write avro-or-parquet + json sinks from the cached result
        sink_dir = tempfile.mkdtemp(prefix="story_sink_")
        fmt = write_avro_or_parquet(report, sink_dir)
        back = spark.read.format(fmt).load(sink_dir)
        assert back.count() == n_rows
        assert sink_json_direct(report.limit(1)).first().json.startswith("{")

        # 4. incremental re-processing over the cached result: first run
        # covers everything, a repeat run is a no-op
        runner = IncrementalRunner(WatermarkStore(tempfile.mkdtemp(prefix="story_wm_")))
        seen = []
        n1 = runner.run(
            report, "story", "campaign_id", lambda d: d, lambda df: seen.append(df.count())
        )
        assert n1 == n_rows and seen == [n_rows]
        n2 = runner.run(
            report, "story", "campaign_id", lambda d: d, lambda df: seen.append(df.count())
        )
        assert n2 == 0 and seen == [n_rows]


class TestGaqlTextRoundtrip:
    def test_parse_text_fixpoint(self):
        cases = [
            "SELECT a.b FROM t",
            "SELECT a.b, c FROM t WHERE a.b > 1",
            "SELECT a.b FROM t WHERE x = 'y' AND z BETWEEN 1 AND 2 ORDER BY a.b DESC LIMIT 5",
        ]
        for q in cases:
            once = parse_gaql(q)
            twice = parse_gaql(once.text)
            assert once == twice  # canonical text is a parse fixpoint
