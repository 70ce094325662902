"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() of the result — forces the
full plan without driver-side row materialization cost dominating).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_scan_project",
    "q05_join_inner",
    "q06_join_star",
    "q08_agg_hour",
    "q10_agg_conditional",
    "q12_rollup",
    "q13_window_rank",
    "q14_window_running",
    "q15_topk",
    "q20_array_agg",
    "q22_dedup_exact",
    "q23_similarity_topk",
    "q24_top_terms",
    "q27_asof_join",
    "q28_range_join",
    "q30_cube",
    "q32_percentile",
    "t01_pricing_summary",
    "t02_shipping_priority",
    "t03_local_supplier_volume",
    "t04_returned_items",
    "x05_minhash_near_dups",
    "x15_media_metadata",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from jurimetria_etl_spark.plans.corpus import full_registry
    from jurimetria_etl_spark.session import get_spark

    registry = full_registry()

    spark = get_spark("bench")
    # Warm the JVM + parquet footers so the first timed query isn't charged
    # session startup.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = registry[name].spark
        t0 = time.time()
        df = fn(spark, sf_dir)
        # noop sink: computes every output column/row, writes nothing —
        # count() would let Catalyst prune the projection work away.
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
