"""Skew-join A/B: AQE skew handling vs explicit salting (VERDICT r4 item 8).

Fixture: the sf1 self-generated lineitem (6M rows) with a synthetic hot
key — ~60% of all rows collapse onto key 0, the rest spread over ~200k
keys — joined to a 200k-row derived dim.  Broadcast is disabled
(`autoBroadcastJoinThreshold=-1`) because the scenario being modeled is
a dim too big to broadcast at 100 TB; the join MUST shuffle, and the hot
key lands one giant partition.

Three strategies, warm best-of-2 each:
  plain_no_aqe_skew — shuffle join, AQE skew split OFF: the unmitigated
                      cost (one straggler task processes 60% of the data).
  plain_aqe_skew    — AQE skew split ON, thresholds scaled to this data
                      size (prod defaults are 256 MB / 5x-median; the
                      local stand-in keeps the same proportions).
  salted            — operators.joins.salted_join(n_salts=32): the hot
                      key is pre-spread over 32 shuffle keys; right side
                      replicated 32x.

Result lands in _scale/skew_results.json and SCALE.md §Joins.

Usage: python tools/skew_bench.py [lineitem_dir]   # default _scale/sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_frames(spark, sf_dir: str):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    left = li.select(
        F.when(F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(100)) < 60, 0)
        .otherwise(F.pmod(F.col("l_orderkey"), F.lit(200_000)))
        .alias("key"),
        "l_quantity",
    )
    right = (
        spark.range(200_000)
        .select(F.col("id").alias("key"))
        .withColumn("payload", F.pmod(F.col("key") * 2654435761, F.lit(1 << 20)))
    )
    return left, right


def agg(joined):
    return joined.groupBy(F.pmod(F.col("key"), F.lit(16)).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("payload").alias("sum_payload"),
    )


def run(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main(sf_dir: str) -> None:
    from jurimetria_etl_spark.operators.joins import salted_join
    from jurimetria_etl_spark.session import get_spark

    spark = get_spark("skew-bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE skew thresholds, scaled: prod default 256MB/5x-median assumes
    # multi-GB partitions; this fixture's hot partition is ~50MB, so the
    # proportional local stand-in is 8MB/2x.
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")

    left, right = build_frames(spark, sf_dir)
    strategies = {}

    def plain():
        return agg(left.join(right, "key"))

    def salted():
        return agg(salted_join(left, right, "key", n_salts=32))

    # correctness cross-check before timing: identical aggregates
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    a = {tuple(r) for r in plain().collect()}
    b = {tuple(r) for r in salted().collect()}
    assert a == b, "salted_join diverged from plain join"

    for name, fn, skew_on in (
        ("plain_no_aqe_skew", plain, False),
        ("plain_aqe_skew", plain, True),
        ("salted", salted, True),
    ):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        run(fn())  # cold
        strategies[name] = round(min(run(fn()), run(fn())), 3)
        print(f"{name}: {strategies[name]}s", flush=True)

    out = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "skew_results.json")
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "timings_sec": strategies}, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/_scale/sf1")
