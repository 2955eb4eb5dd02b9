"""Planted hot-key skew benchmark — the measured evidence behind the
skew rows in SCALE.md.

Builds a skewed fact table from lineitem (95% of rows share key 0, the
rest spread over 10k keys), replicated to ~6M rows, then times:

1. ``window_total`` — per-key total attached to every row via
   ``Window.partitionBy(key)``: the hot key's entire partition lands in
   ONE task's sort. vs ``agg_join`` — the same result as a groupBy
   (map-side partials, fully parallel) broadcast-joined back. Identical
   output, structurally different worst task.
2. ``smj_skew_aqe`` — the skewed fact joined to a 10k-row dim with
   broadcast disabled (forcing a shuffle join, the 100 TB fact-fact
   shape) with AQE skew-join splitting ON vs OFF.

Run:  python tools/skew_bench.py            # sf0.1 fact base
Emits one JSON line per experiment on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from proto_to_avro_ql_spark.session import get_spark  # noqa: E402
from proto_to_avro_ql_spark.sources.io import read_table  # noqa: E402

REPLICATE = 10
HOT_FRACTION = 0.95
N_KEYS = 10_000


def skewed_fact(spark, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    rep = li.withColumn("_r", F.explode(F.sequence(F.lit(1), F.lit(REPLICATE))))
    return rep.select(
        F.when(F.rand(7) < HOT_FRACTION, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("l_orderkey", "_r"), F.lit(N_KEYS)))
        .alias("key"),
        F.col("l_extendedprice").alias("v"),
    )


def timed(label: str, fn) -> dict:
    t0 = time.perf_counter()
    out = fn()
    wall = round(time.perf_counter() - t0, 3)
    return {"experiment": label, "wall_s": wall, "result": out}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("skew_bench")
    fact = skewed_fact(spark, sf_dir).persist()
    n = fact.count()
    print(f"# fact rows: {n}", file=sys.stderr)

    # -- experiment 1: per-key total on every row -------------------------
    def window_total():
        w = Window.partitionBy("key")
        df = fact.select("key", "v", F.sum("v").over(w).alias("key_total"))
        return df.agg(F.round(F.sum("key_total") / 1e12, 3)).first()[0]

    def agg_join():
        totals = fact.groupBy("key").agg(F.sum("v").alias("key_total"))
        df = fact.join(F.broadcast(totals), "key").select("key", "v", "key_total")
        return df.agg(F.round(F.sum("key_total") / 1e12, 3)).first()[0]

    for label, fn in [("window_total", window_total), ("agg_join", agg_join)]:
        fn()  # warm
        print(json.dumps(timed(label, fn)))

    # -- experiment 2: forced-SMJ skewed join, AQE skew split on/off ------
    dim = (
        spark.range(N_KEYS)
        .select(F.col("id").alias("key"), (F.col("id") * 2).alias("weight"))
        .persist()
    )
    dim.count()

    # Force a genuine shuffle join: without this AQE runtime-converts
    # the hinted SMJ to broadcast (10k-row dim) and there is no skewed
    # reduce side to split at all.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def smj_join():
        joined = fact.join(dim.hint("shuffle_merge"), "key")
        return joined.agg(F.count(F.lit(1))).first()[0]

    for skew_on in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_on)
        # make the planted skew visible to AQE's thresholds at local scale
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        smj_join()  # warm
        print(json.dumps(timed(f"smj_skew_aqe_{skew_on}", smj_join)))
    # -- experiment 3: explicit salt-replicate join (operators/skew.py) --
    # vs the plain forced-SMJ join above, AQE skew split OFF — the
    # deterministic mitigation you reach for when you can't rely on AQE
    # (or need stable task sizes). Result must equal the plain join.
    from proto_to_avro_ql_spark.operators.skew import salted_join

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")

    def salted():
        joined = salted_join(fact, dim, "key", salt_buckets=16)
        return joined.agg(F.count(F.lit(1))).first()[0]

    salted()  # warm
    r_salted = timed("salted_join_16", salted)
    print(json.dumps(r_salted))
    assert r_salted["result"] == smj_join(), "salted join result mismatch"

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


if __name__ == "__main__":
    main()
