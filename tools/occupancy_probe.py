"""Why is the auto-scaled LSH join's exponent ~0.78, not ~0.5?  This
probe measures the thing the wall-clock cannot separate: CANDIDATE
VOLUME vs fixed floor.

``suggest_lsh_planes`` picks p = ceil(log2(N / target)), so expected
bucket occupancy oscillates in (target/2, target] as N grows — a
SAWTOOTH, not a constant.  Candidate pairs per row therefore stay within
a bounded band (linear total volume), but a 10× N step can land on a
different point of the sawtooth and legitimately grow pairs/row by up to
2× — which shows up as a wall-clock exponent between ~0.7 and ~1.0 while
still being linear-with-bounded-constant asymptotics.  This probe prints
the actual numbers (occupancy percentiles, total candidate pairs,
pairs/row) at both scale dirs so SCALE.md can state which part of the
measured exponent is volume and which is floor.

Usage: python tools/occupancy_probe.py  (needs _scale/sf0.1 and _scale/sf1)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from jurimetria_etl_spark.operators import similarity as S
    from jurimetria_etl_spark.sources.fixtures import load_fixture

    emb = load_fixture(spark, sf_dir, "embeddings")
    n = emb.count()
    planes = S.suggest_lsh_planes(n)
    banded = S.lsh_banded_signatures(emb, dim=64, n_planes=planes, n_tables=8)
    occ = banded.groupBy("t", "bk").agg(F.count("*").alias("c"))
    stats = occ.agg(
        F.count("*").alias("n_buckets"),
        F.expr("percentile(c, 0.5)").alias("p50"),
        F.expr("percentile(c, 0.95)").alias("p95"),
        F.max("c").alias("max"),
        F.sum(F.expr("c * (c - 1) / 2")).alias("cand_pairs"),
    ).first()
    return {
        "n_rows": n,
        "n_planes": planes,
        "buckets_per_table": 2**planes,
        "expected_uniform_occ": round(n / 2**planes, 1),
        "occ_p50": float(stats["p50"]),
        "occ_p95": float(stats["p95"]),
        "occ_max": int(stats["max"]),
        "cand_pairs_all_tables": int(stats["cand_pairs"]),
        "cand_pairs_per_row": round(stats["cand_pairs"] / n, 1),
    }


def main() -> None:
    from jurimetria_etl_spark.session import get_spark

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark("occupancy-probe")
    out = {}
    for label in ("sf0.1", "sf1"):
        d = os.path.join(root, "_scale", label)
        if not os.path.isdir(d):
            raise SystemExit(f"missing {d}")
        out[label] = probe(spark, d)
        print(label, json.dumps(out[label]), flush=True)
    a, b = out["sf0.1"], out["sf1"]
    out["pairs_growth_for_10x_rows"] = round(
        b["cand_pairs_all_tables"] / a["cand_pairs_all_tables"], 2
    )
    out["pairs_per_row_growth"] = round(
        b["cand_pairs_per_row"] / a["cand_pairs_per_row"], 2
    )
    path = os.path.join(root, "_scale", "occupancy.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
