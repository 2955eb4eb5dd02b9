"""Report-layer operators: the GAQL-analog pipeline (SURVEY.md §2.3-2.4).

The reference delegates WHERE + implicit segment aggregation to the
Google Ads server (CampaignCriterionStructureReport.scala:48-51); here
the engine performs them natively:

- filter_range / filter_cmp / filter_conj → Column predicates pushed to
  the scan by Catalyst;
- agg_groupby_sum / agg_groupby_multi → hash aggregate with map-side
  partial aggregation (one shuffle on the dims);
- agg_derived_ratio → post-agg expressions (ctr = clicks/impressions,
  average_cpc = cost/clicks; CampaignCriterionStructureReport.scala:19,30);
- agg_distinct → report identity: one row per segment combination.

Scale notes: partial (map-side) aggregation means the shuffle carries
one row per (task, dims) — for low-cardinality dims like
(date, status), that's thousands of rows regardless of input size, so
this plan survives a 100× scale-up untouched. Ratios are computed AFTER
the aggregate (sum(a)/sum(b)), never averaged per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proto_to_avro_ql_spark.fixtures import ads_row
from proto_to_avro_ql_spark.functions.stable import dec_sum
from proto_to_avro_ql_spark.plans.compile import compile_projection


def flagship_report(
    spark: SparkSession,
    sf_dir: str,
    date_from: str = "1994-01-01",
    date_to: str = "1996-12-31",
) -> DataFrame:
    """Flagship query (SURVEY.md §7 slice 0): dot-path projection +
    range/comparison filters + grouped additive metrics + derived
    ratios, over the ads_row view.

    GAQL analog:
      SELECT segments.date, campaign.status, metrics...
      FROM ads_row
      WHERE segments.date BETWEEN x AND y AND metrics.impressions > 0
      GROUP BY segments.date, campaign.status
    """
    rows = ads_row(spark, sf_dir)
    projected = compile_projection(
        rows,
        [
            "customer.id",
            "campaign.id",
            "campaign.status",
            "ad_group.id",
            "segments.date",
            "metrics.impressions",
            "metrics.clicks",
            "metrics.cost_micros",
            "metrics.conversions",
        ],
    )
    filtered = projected.where(
        F.col("segments.date").between(date_from, date_to)  # filter_range
        & (F.col("metrics.impressions") > 0)  # filter_cmp; & = filter_conj
    )
    agg = filtered.groupBy(
        F.col("segments.date").alias("segments_date"),
        F.col("campaign.status").alias("campaign_status"),
    ).agg(
        F.sum("metrics.impressions").alias("sum_impressions"),
        F.sum("metrics.clicks").alias("sum_clicks"),
        F.sum("metrics.cost_micros").alias("sum_cost_micros"),
        dec_sum("metrics.conversions", 4).alias("sum_conversions"),
        F.count_distinct(F.col("campaign.id")).alias("n_campaigns"),
    )
    return agg.select(
        "*",
        F.round(F.col("sum_clicks") / F.col("sum_impressions"), 6).alias("ctr"),
        F.round(F.col("sum_cost_micros") / F.col("sum_clicks"), 2).alias("average_cpc"),
    )


FLAGSHIP_SQL_TEMPLATE = """
WITH ads_row_flat AS ({ads_flat}),
agg AS (
  SELECT
    segments_date,
    campaign_status,
    CAST(SUM(metrics_impressions) AS BIGINT) AS sum_impressions,
    CAST(SUM(metrics_clicks) AS BIGINT) AS sum_clicks,
    CAST(SUM(metrics_cost_micros) AS BIGINT) AS sum_cost_micros,
    CAST(ROUND(SUM(CAST(metrics_conversions AS DECIMAL(38,6))), 4) AS DOUBLE) AS sum_conversions,
    COUNT(DISTINCT campaign_id) AS n_campaigns
  FROM ads_row_flat
  WHERE segments_date BETWEEN '{date_from}' AND '{date_to}'
    AND metrics_impressions > 0
  GROUP BY segments_date, campaign_status
)
SELECT *,
  ROUND(CAST(sum_clicks AS DOUBLE) / sum_impressions, 6) AS ctr,
  ROUND(CAST(sum_cost_micros AS DOUBLE) / sum_clicks, 2) AS average_cpc
FROM agg
"""
