"""Similarity search over embedding columns (SURVEY §2.12 E3).

Two paths:
- ``cosine_topk`` — brute-force: broadcast the probe vector, compute the dot
  product as a JVM-side sequential fold (``aggregate`` over ``zip_with``),
  top-k via orderBy+limit (TakeOrderedAndProject).  O(N·d) with zero Python;
  the correctness baseline and fine up to ~10⁸ rows per probe on a cluster.
- ``lsh_bucket_topk`` — scale path: random-hyperplane LSH signatures bucket
  the corpus; probes only score their own bucket(s), turning the scan into a
  bucket-pruned join.  Hyperplanes are derived deterministically from a seed
  so signatures are reproducible across runs/executors.
- ``cosine_topk_all`` — all-pairs k-NN via bucketed self-join (for batch
  similarity-join workloads).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential fold dot-product — deterministic order, whole-stage
    codegen, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    probe_id: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Top-k cosine neighbors of one corpus vector (excluded from results).

    The probe row is broadcast (one vector), so the corpus side is a single
    narrow scan; top-k is a per-partition heap + driver merge.
    """
    probe = F.broadcast(
        embeddings.where(F.col(id_col) == probe_id).select(
            F.col(vec_col).alias("__p")
        )
    )
    sim = cosine_sim(F.col(vec_col), F.col("__p"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        embeddings.where(F.col(id_col) != probe_id)
        .crossJoin(probe)
        .select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def add_lsh_signature(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    sig_col: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) signature: one sign bit per
    plane, packed into a long.  Pure Catalyst expressions — the planes are
    literal arrays folded against the vector."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = _dot(F.col(vec_col), F.array(*[F.lit(v) for v in plane]))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn(sig_col, bucket)


def lsh_bucket_topk(
    embeddings: DataFrame,
    probe_id: int,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors sharing the probe's LSH bucket.

    At 100 TB the signature is computed once at ingest and the table is
    bucketed/partitioned by ``lsh_bucket``, so a probe reads one partition.
    Recall-vs-speed is tuned via ``n_planes`` (fewer planes → bigger buckets
    → higher recall, more compute).
    """
    with_sig = add_lsh_signature(embeddings, dim, n_planes, seed, vec_col)
    probe = F.broadcast(
        with_sig.where(F.col(id_col) == probe_id).select(
            F.col(vec_col).alias("__p"), F.col("lsh_bucket").alias("__pb")
        )
    )
    return (
        with_sig.where(F.col(id_col) != probe_id)
        .join(probe, F.col("lsh_bucket") == F.col("__pb"))
        .select(
            F.col(id_col),
            F.round(cosine_sim(F.col(vec_col), F.col("__p")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_similarity_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs similarity join above a cosine threshold, bucket-pruned by
    shared LSH bucket (candidate generation) then exactly re-scored.  The
    join shuffles on the bucket key — at scale this is the difference
    between O(N²) and O(N²/2^planes)."""
    lsig = add_lsh_signature(left, dim, n_planes, seed, vec_col).select(
        F.col(id_col).alias("left_id"),
        F.col(vec_col).alias("__lv"),
        F.col("lsh_bucket").alias("__lb"),
    )
    rsig = add_lsh_signature(right, dim, n_planes, seed, vec_col).select(
        F.col(id_col).alias("right_id"),
        F.col(vec_col).alias("__rv"),
        F.col("lsh_bucket").alias("__rb"),
    )
    sim = cosine_sim(F.col("__lv"), F.col("__rv"))
    return (
        lsig.join(rsig, (F.col("__lb") == F.col("__rb")) & (F.col("left_id") < F.col("right_id")))
        .select("left_id", "right_id", F.round(sim, 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )
