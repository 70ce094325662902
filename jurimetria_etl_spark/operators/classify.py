"""Classifier-based quality filtering — a linear model over hashed
bag-of-words features, the fastText-style quality classifier modern
curation pipelines apply corpus-wide (FineWeb-Edu's educational scorer,
DCLM's fastText filter): train a tiny model offline on labeled samples,
then score every document at full scale.

Scale design (100 TB corpus, ~1e5-row labeled sample):

- APPLY is the corpus-sized path and is a single narrow expression:
  ``score = sigmoid(bias + mean_t weights[hash(token) mod D])`` — one
  ``transform``/``aggregate`` fold over the token array with
  ``element_at`` into a D-length literal weight array.  No shuffle, no
  join, no python; it fuses into the parquet scan like the quality-rule
  columns (operators/quality.py) and filters push down.
- TRAIN is the bounded path: feature extraction (hash-bucket mean
  one-hot) runs IN SPARK; only the (n_rows × D) dense matrix reaches
  the driver for a deterministic full-batch logistic regression.
  ``max_rows`` raises rather than silently sampling — pick the sample
  explicitly (``sampling.deterministic_sample`` / ``split_corpus``),
  the same contract as semdedup's ``max_cluster_rows``.
- The hashing trick (Weinberger et al. 2009, feature hashing):
  collisions are part of the model, ``n_features`` trades collision
  noise for weight-array size.  Buckets key off ``hash60`` (md5) so
  any engine — including the DuckDB oracles — recomputes identical
  features; tokenization matches the BM25 index (search.py:_tokens).

Reference scope: the reference repo (willianbox3/jurimetria-etl) has no
classifier stage; this extends the curation stack the same way
dedup/quality/decontaminate do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jurimetria_etl_spark.operators.dedup import hash60


def _tokens(col: Column) -> Column:
    """Lowercased Unicode-word tokens (identical to search.py:_tokens —
    the classifier must see the same features online and offline).
    \\p{L}/\\p{N}, not [^a-z0-9]: the domain corpus is accented
    Portuguese and ASCII classes shred it into fragment features."""
    return F.filter(
        F.split(F.lower(col), r"[^\p{L}\p{N}]+"), lambda t: F.length(t) > 0
    )


def token_bucket(tok: Column, n_features: int, salt: str = "clf") -> Column:
    """Hash-trick feature bucket in [0, n_features) for one token."""
    return F.pmod(hash60(tok, salt), F.lit(n_features)).cast("int")


def linear_quality_score(
    text_col: str | Column,
    weights: list[float],
    bias: float,
    salt: str = "clf",
    round_to: int | None = 6,
) -> Column:
    """Probability column: ``sigmoid(bias + mean_t w[bucket(t)])``.

    Mean (not sum) aggregation keeps the raw score length-invariant —
    fastText's averaged bag-of-features.  A document with no tokens
    scores ``sigmoid(bias)`` (the prior).  Pure Catalyst fold: the
    weight array is ONE literal, shared across every row.
    """
    d = len(weights)
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = _tokens(c)
    wlit = F.lit([float(w) for w in weights])
    total = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + F.element_at(wlit, token_bucket(t, d, salt) + 1),
    )
    raw = F.lit(float(bias)) + total / F.greatest(F.size(toks), F.lit(1))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-raw))
    return F.round(prob, round_to) if round_to is not None else prob


def classify_documents(
    docs: DataFrame,
    weights: list[float],
    bias: float,
    text_col: str = "text",
    out_col: str = "quality_prob",
    salt: str = "clf",
    round_to: int | None = 6,
) -> DataFrame:
    """All ``docs`` columns + ``out_col`` — the corpus-sized apply."""
    return docs.withColumn(
        out_col, linear_quality_score(text_col, weights, bias, salt, round_to)
    )


def filter_by_classifier(
    docs: DataFrame,
    weights: list[float],
    bias: float,
    threshold: float = 0.5,
    text_col: str = "text",
    salt: str = "clf",
) -> DataFrame:
    """Keep documents scoring ≥ ``threshold`` — a narrow pushdown-
    friendly predicate (the unrounded score; thresholding is not an
    output contract, so rounding would only add a boundary case)."""
    return docs.where(
        linear_quality_score(text_col, weights, bias, salt, round_to=None)
        >= F.lit(threshold)
    )


def train_hashed_linear(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_features: int = 256,
    iters: int = 300,
    lr: float = 1.0,
    l2: float = 1e-4,
    max_rows: int = 200_000,
    salt: str = "clf",
) -> tuple[list[float], float]:
    """Deterministic full-batch logistic regression on hashed features.

    Returns ``(weights, bias)`` for ``linear_quality_score``.  Labels
    are 0/1 in ``label_col``.  Feature rows are the SAME mean-one-hot
    encoding the apply path folds ([count_b / n_tokens]_b), built with
    one explode + one (id, bucket) count aggregate in Spark; the dense
    (n × D) float64 matrix is collected and fitted with fixed-iteration
    gradient descent (zero init, no shuffling, no randomness — re-runs
    reproduce bit-identical weights).

    ``max_rows`` guards the driver collect: more labeled rows than that
    raises — sample explicitly upstream rather than letting a 100-TB
    frame flow into ``collect()``.
    """
    import numpy as np

    n = docs.count()
    if n == 0:
        raise ValueError("train_hashed_linear: empty training frame")
    if n > max_rows:
        raise ValueError(
            f"train_hashed_linear: {n} rows > max_rows={max_rows} — the "
            "labeled sample is collected to the driver; reduce it "
            "explicitly (operators/sampling.py) or raise max_rows"
        )
    base = docs.select(
        F.monotonically_increasing_id().alias("__row"),
        F.col(label_col).cast("double").alias("__y"),
        _tokens(F.col(text_col)).alias("__toks"),
    ).localCheckpoint()  # pin row ids: monotonically_increasing_id is
    # plan-dependent and the id must be identical across the two scans
    labels = base.select("__row", "__y")
    feats = (
        base.select(
            "__row",
            F.size("__toks").alias("__nt"),
            F.explode("__toks").alias("__t"),
        )
        .groupBy("__row", token_bucket(F.col("__t"), n_features, salt).alias("__b"))
        .agg((F.count(F.lit(1)) / F.first("__nt")).alias("__v"))
    )
    X = np.zeros((n, n_features))
    y = np.zeros(n)
    label_rows = labels.collect()  # one job; reused for both index and y
    row_ix = {r["__row"]: i for i, r in enumerate(label_rows)}
    for r in label_rows:
        y[row_ix[r["__row"]]] = r["__y"]
    for r in feats.collect():
        X[row_ix[r["__row"]], r["__b"]] = r["__v"]
    w = np.zeros(n_features)
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        err = p - y
        w -= lr * (X.T @ err / n + l2 * w)
        b -= lr * float(err.mean())
    return [float(v) for v in w], float(b)
