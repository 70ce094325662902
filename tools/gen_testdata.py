"""Seed-deterministic synthetic table generator, schema-compatible with
/root/testdata (TPC-H-ish star + events/documents/embeddings).

Purpose: produce self-generated sf0.1 and sf1 datasets from the SAME
generator so the scale-bench (tools/scale_bench.py) can measure how each
heavy query's wall-clock grows with a 10x data increase — an
apples-to-apples scaling exponent, independent of whether our value
distributions exactly match the driver's.

Row counts scale linearly with sf (lineitem = 6M * sf, mirroring the
driver's sf0.1 = 600k).  Distributions mirror what matters to the heavy
queries:
  - documents: bag-of-words over a small vocab (so MinHash/SimHash/LSH
    have realistic shingle overlap) + a seeded fraction of exact and
    near-duplicate pairs (so dedup queries have positives to find);
  - embeddings: 64-dim float32 drawn around 10 cluster centroids with
    integer labels (so IVF/LSH bucketing has structure);
  - orders/lineitem: keys uniform over their parents, dates uniform over
    1995-2001, so join fan-out and agg cardinalities scale linearly.

Never writes outside the target directory; /root/testdata stays untouched.

Usage: python tools/gen_testdata.py --sf 1 --out /root/repo/_scale/sf1
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch part spark line column order small sort fast value scan hash slow "
    "group agg filter query big key window row table stream merge data vector "
    "join shuffle stage task page block cache disk memory net code plan cost"
).split()

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
# part column value shapes mirror the driver fixture (single-word types,
# Brand#1..25, "adjective noun" names) so the t-series part filters
# (p_type='PROMO', p_brand='Brand#4', p_name LIKE 'blue%') select
# comparable slices on generated data
BRANDS = [f"Brand#{i}" for i in range(1, 26)]
TYPES = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
ADJS = ["small", "red", "blue", "green", "large", "shiny", "dark", "light"]
NOUNS = ["ring", "widget", "bolt", "gear", "plate", "cap", "rod", "pin"]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
LANGS = ["en", "pt", "es", "zh", "de"]


def _write(out: str, name: str, table: pa.Table, chunk_rows: int = 1_000_000) -> None:
    path = os.path.join(out, f"{name}.parquet")
    with pq.ParquetWriter(path, table.schema, compression="zstd") as w:
        for off in range(0, table.num_rows, chunk_rows):
            w.write_table(table.slice(off, chunk_rows))


def _ts(days: np.ndarray, base: str = "1995-01-01") -> pa.Array:
    b = np.datetime64(base, "us")
    return pa.array(b + days.astype("timedelta64[D]").astype("timedelta64[us]"))


def generate(sf: float, out: str, seed: int = 42) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)

    n_cust = max(int(150_000 * sf), 100)
    n_supp = max(int(10_000 * sf), 20)
    n_part = max(int(200_000 * sf), 100)
    n_ord = max(int(1_500_000 * sf), 500)
    n_li = max(int(6_000_000 * sf), 2_000)
    n_ev = max(int(1_000_000 * sf), 500)
    n_doc = max(int(50_000 * sf), 200)
    n_emb = max(int(20_000 * sf), 100)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        # unpadded, matching the driver fixture's names (t09 filters on
        # 'NATION_3'; a zero-padded 'NATION_03' would select nothing)
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-999.99, 9999.99, n_cust), 2)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-999.99, 9999.99, n_supp), 2)),
    }))
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": [
            f"{ADJS[i % len(ADJS)]} {NOUNS[(i // len(ADJS)) % len(NOUNS)]}"
            for i in range(n_part)
        ],
        "p_brand": pa.array(np.array(BRANDS)[rng.integers(0, len(BRANDS), n_part)]),
        "p_type": pa.array(np.array(TYPES)[rng.integers(0, len(TYPES), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(rng.uniform(900.0, 2100.0, n_part), 2)),
    }))
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(np.round(rng.uniform(850.0, 560000.0, n_ord), 2)),
        "o_orderdate": _ts(rng.integers(0, 2405, n_ord)),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    price = np.round(rng.uniform(900.0, 104000.0, n_li), 2)
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li)),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
        "l_linenumber": pa.array((rng.integers(1, 8, n_li)).astype(np.int32)),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts(rng.integers(0, 2526, n_li)),
    }))
    base_ev = np.datetime64("2024-01-01T00:00:00", "us")
    ev_off = np.sort(rng.integers(0, 30 * 86_400_000_000, n_ev))
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": pa.array(base_ev + ev_off.astype("timedelta64[us]")),
        "user_id": pa.array(rng.integers(0, max(n_ev // 10, 10), n_ev)),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(rng.uniform(0, 100, n_ev), 4)),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: bag-of-words; last ~0.4% rows are dup/near-dup of earlier rows
    vocab = np.array(VOCAB)
    lengths = rng.integers(12, 80, n_doc)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lengths]
    n_pairs = max(n_doc // 500, 4)
    for j in range(n_pairs):
        src = int(rng.integers(0, n_doc - n_pairs * 2))
        texts[n_doc - 1 - j] = texts[src]  # exact dup
        words = texts[src].split()
        words[int(rng.integers(0, len(words)))] = str(vocab[int(rng.integers(0, len(vocab)))])
        texts[n_doc - 1 - n_pairs - j] = " ".join(words)  # near dup
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.integers(0, 5, n_doc)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    # embeddings: 10 MODERATELY-overlapping gaussian clusters in 64-d
    # (sigma=2.0 -> same-cluster cosine ~0.2, far below the 0.45 join
    # threshold, so cluster co-membership alone produces no pairs), plus
    # ~1% planted near-dup twins (cos ~0.99).  This mirrors real corpora:
    # each vector has O(1) true near-dups, so a threshold similarity
    # join's OUTPUT scales linearly with N — a tight-cluster fixture
    # would make the output itself quadratic and no engine could scale it.
    centroids = rng.normal(0, 1.0, (10, 64))
    labels = rng.integers(0, 10, n_emb)
    vecs = (centroids[labels] + rng.normal(0, 2.0, (n_emb, 64))).astype(np.float32)
    n_twins = max(n_emb // 100, 4)
    twin_src = rng.choice(n_emb - n_twins, n_twins, replace=False)
    vecs[n_emb - n_twins :] = vecs[twin_src] + rng.normal(
        0, 0.05, (n_twins, 64)
    ).astype(np.float32)
    labels[n_emb - n_twins :] = labels[twin_src]
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32)),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    generate(a.sf, a.out, a.seed)
    print(f"generated sf={a.sf} at {a.out}")
