"""Join operators (SURVEY §2.6).

J1 is the reference's only join: a dict-lookup enrichment
(``/root/reference/src/jurimetria_pipeline.py:201-206,236-237``) whose
distributed form is a broadcast hash join — the 5 570-row dimension ships to
every executor once, the 100 TB fact side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def enrich_municipio(
    processos: DataFrame,
    municipios: DataFrame,
    code_col: str = "municipio",
) -> DataFrame:
    """J1 — replace the IBGE municipality code with its name; unmatched or
    NULL codes keep the original value (the reference's
    ``municipios_map.get(int(x), x)`` fallback at ``:237``).

    Plan shape: BroadcastHashJoin (LeftOuter) + coalesce projection — no
    shuffle of the fact side; asserted in tests per SURVEY §4.
    """
    dim = F.broadcast(
        municipios.select(
            F.col("CD_MUN").cast("int").alias("__cd_mun"),
            F.col("NM_MUN").alias("__nm_mun"),
        )
        .na.drop(subset=["__cd_mun"])  # W4: drop NULL-key dim rows
        # one row per code, like the reference's dict lookup — a
        # duplicated key in the dim would FAN OUT fact rows through the
        # left join.  load_municipios dedups LAST-wins (file order, the
        # reference's dict-build rule) on every adapter path, so this
        # max-name pick only fires for dims handed in directly; for
        # those it is a documented deterministic divergence (no file
        # order exists on an arbitrary DataFrame to replay)
        .groupBy("__cd_mun")
        .agg(F.max("__nm_mun").alias("__nm_mun"))
    )
    joined = processos.join(
        dim,
        processos[code_col].cast("int") == dim["__cd_mun"],
        "left",
    )
    return joined.withColumn(
        code_col, F.coalesce(F.col("__nm_mun"), F.col(code_col))
    ).drop("__cd_mun", "__nm_mun")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """As-of (point-in-time) join: for each left row, attach the latest right
    row with the same key whose ``right_ts`` ≤ ``left_ts``.

    The reference has no such operator; this is the generalized-library
    member that Spark itself lacks as a built-in.  Implemented as the
    single-shuffle union+window pattern rather than an inequality join:

      1. tag both sides and union them (right rows carry their payload as a
         struct, left rows carry NULL),
      2. one shuffle: window partitioned by the key, ordered by
         (ts, side, payload) — right rows sort *before* left rows at equal
         timestamps so ties match inclusively,
      3. forward-fill the payload with ``last(ignorenulls)`` over an
         unbounded-preceding row frame (runs inside the sorted window — no
         second shuffle),
      4. keep left rows; explode the struct back into columns.

    Scale: exactly ONE Exchange (hashpartitioning on the key); a naive
    ``l.ts >= r.ts`` theta-join would plan as a BroadcastNestedLoop /
    cartesian O(N·M).  Skewed keys can be pre-salted upstream.

    If several right rows share (key, ts), the one with the greatest payload
    struct (field order = right_ts, *right_cols) wins — deterministically.
    ``tolerance`` (an SQL interval string, e.g. ``'10 minutes'``) drops
    matches older than ``left_ts - tolerance``, leaving NULLs (left-outer
    semantics either way).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]

    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    # A NULL right_ts has no position on the time axis and must never
    # match: NULLs sort FIRST in the window order, so an unfiltered
    # NULL-ts row would forward-fill as the "latest" match for left rows
    # with no real predecessor (pandas merge_asof rejects NaT keys for
    # the same reason).
    r2 = right.where(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__asof_side"),
        payload.alias("__asof_rv"),
    )
    rv_type = r2.schema["__asof_rv"].dataType
    l2 = left.select(
        "*",
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias("__asof_side"),
        F.lit(None).cast(rv_type).alias("__asof_rv"),
    )
    unioned = l2.unionByName(r2, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy("__asof_ts", "__asof_side", "__asof_rv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__asof_match", F.last("__asof_rv", ignorenulls=True).over(w)
    ).where(F.col("__asof_side") == 1)

    if tolerance is not None:
        in_range = F.col("__asof_match.__rts") >= (
            F.col("__asof_ts") - F.expr(f"INTERVAL {tolerance}")
        )
        filled = filled.withColumn(
            "__asof_match", F.when(in_range, F.col("__asof_match"))
        )

    taken = set(left.columns)
    out_ts = right_ts + suffix if right_ts in taken else right_ts
    proj = [F.col(c) for c in left.columns]
    proj.append(F.col("__asof_match.__rts").alias(out_ts))
    for c in right_cols:
        proj.append(
            F.col(f"__asof_match.{c}").alias(c + suffix if c in taken else c)
        )
    return filled.select(*proj)


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: Column,
    lo: Column,
    hi: Column,
    extra_cond: Column | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval range join via coarse time-bucket blocking.

    A raw ``p.ts >= i.lo AND p.ts < i.hi`` join has no equi-key, so Spark
    plans BroadcastNestedLoopJoin — O(N·M), dead at scale.  Blocking
    restores an equi-key: each interval is exploded to every
    ``bucket_seconds``-wide epoch bucket it overlaps, each point hashes to
    exactly one bucket, the join runs as a shuffle/broadcast HASH join on
    the bucket id (plus any caller-supplied equi-conditions in
    ``extra_cond``), and the exact half-open predicate filters survivors.
    No dedup needed: an interval appears once per bucket and a point
    belongs to one bucket, so each qualifying pair meets exactly once.

    Cost: |intervals| × ceil(span/bucket) exploded rows.  Pick
    ``bucket_seconds`` ≈ the typical interval span — at 100 TB this is the
    difference between a hash join and a cartesian product.

    ``point_ts``/``lo``/``hi`` are Column refs built from the two frames
    (e.g. ``points["ts"]``), so self-joins stay unambiguous.

    ``how`` is restricted to point-side-outer variants (inner / left /
    left_semi / left_anti): intervals are exploded once per overlapped
    bucket, so an interval-side outer join (right/full) would emit each
    unmatched interval row once per bucket — silently wrong.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "semi",
               "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"range_join_bucketed: how={how!r} unsupported — interval rows "
            "are exploded per bucket, so interval-side outer joins "
            "(right/full) duplicate unmatched intervals; use inner/left/"
            "semi/anti, or swap the sides."
        )
    us = bucket_seconds * 1_000_000

    def _is_ntz(frame: DataFrame, c: Column) -> bool:
        from pyspark.sql.types import TimestampNTZType

        try:
            return isinstance(
                frame.select(c).schema[0].dataType, TimestampNTZType
            )
        except Exception:
            return False

    # All three timestamp columns must share ONE semantics: a mixed
    # NTZ/TIMESTAMP join would need a session-tz conversion on one side,
    # which is not monotonic across DST transitions — per-side mappings
    # would silently block valid pairs at the bucket equi-join.  Refuse
    # and let the caller cast explicitly (the exact predicate's implicit
    # mixed-type cast is equally tz-fragile, so this surfaces a real
    # modeling problem, not a library limitation).
    ntz_flags = {
        _is_ntz(points, point_ts),
        _is_ntz(intervals, lo),
        _is_ntz(intervals, hi),
    }
    if len(ntz_flags) > 1:
        raise ValueError(
            "range_join_bucketed: point_ts/lo/hi mix TIMESTAMP and "
            "TIMESTAMP_NTZ — cast all three to one type first (a "
            "session-tz conversion is not monotonic across DST, so no "
            "consistent bucket mapping exists for mixed inputs)."
        )
    is_ntz = ntz_flags.pop()

    def _bucket(c: Column):
        # TIMESTAMP: epoch micros directly.  TIMESTAMP_NTZ (driver parquet
        # stores timestamp[us] without tz metadata): unix_micros rejects
        # it, and casting to TIMESTAMP would interpret the wall time in
        # the session zone — NOT monotonic across a DST spring-forward
        # gap, where a dropped wall hour can bucket a point outside its
        # interval's exploded range.  Instead derive a pure WALL-CLOCK
        # epoch (days × 86 400 + intraday seconds, plus sub-second) —
        # monotonic in the NTZ value by construction, session-tz-free.
        if not is_ntz:
            return F.floor(F.unix_micros(c) / us)
        days = F.datediff(F.to_date(c), F.lit("1970-01-01").cast("date"))
        secs = (
            F.hour(c) * 3600 + F.minute(c) * 60 + F.second(c)
        ).cast("long")
        sub_us = F.date_format(c, "SSSSSS").cast("long")
        wall_us = (days.cast("long") * 86_400 + secs) * 1_000_000 + sub_us
        return F.floor(wall_us / us)

    pts = points.withColumn("__rjb_p", _bucket(point_ts))
    ivs = intervals.withColumn(
        "__rjb_i", F.explode(F.sequence(_bucket(lo), _bucket(hi)))
    )
    cond = (
        (pts["__rjb_p"] == ivs["__rjb_i"])
        & (point_ts >= lo)
        & (point_ts < hi)
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return pts.join(ivs, cond, how).drop("__rjb_p", "__rjb_i")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-busting equi-join: hot keys on the (large, skewed) left side are
    spread over ``n_salts`` shuffle partitions; the right side is replicated
    ``n_salts``× so every (key, salt) pair still meets.

    The left salt is derived from a hash of the whole row, so one hot key
    fans out evenly and deterministically; the right explode is a narrow op
    before the shuffle.  For the supported ``how`` values the result is
    row-for-row identical to the plain join (oracle-checked) — only the
    physical partitioning changes.  AQE's skew handling
    (``spark.sql.adaptive.skewJoin``) covers moderate skew at runtime;
    explicit salting is for the pathological key that exceeds a single
    executor's memory even after AQE splits.

    ``how`` is restricted to left-side-outer variants (inner / left /
    left_semi / left_anti): the right side is replicated ``n_salts``×, so a
    right/full outer join would emit each unmatched right row ``n_salts``
    times and a right semi/anti would multi-count matched right rows.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "semi",
               "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the right side is "
            "replicated n_salts times, so right/full outer variants "
            "duplicate unmatched right rows; use inner/left/semi/anti, or "
            "swap the sides."
        )
    keys = [on] if isinstance(on, str) else list(on)
    l2 = left.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts)),
    )
    r2 = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l2.join(r2, keys + ["__salt"], how).drop("__salt")
