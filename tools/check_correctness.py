"""Local replica of the driver's t2 correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count, column names, and an order-insensitive value hash (doubles
rounded 1e-9, timestamps as UTC epoch micros).

Usage: python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return str(int(v.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000))
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, dt.timedelta):
        return f"td:{v.total_seconds()}"
    if isinstance(v, bytes):
        return v.hex()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(round(float(v), 9))
    except ImportError:
        pass
    return str(v)


def hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "|".join(canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import __spark_entry__ as entrymod
    from jurimetria_etl_spark.session import get_spark

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    if only:
        queries = {k: v for k, v in queries.items() if k in only}
    oracles = entrymod.oracle_sql()
    # The registered x13b oracle embeds hyperplane literals derived for
    # the 500-row GATE fixtures (driver sf0.01 / pytest sf0.001 — both
    # 500 embeddings, so one static SQL covers the driver run).  At any
    # OTHER corpus size the Spark side auto-derives a different plane
    # count; re-derive the oracle literals from this corpus's count so
    # the gate compares the same banding (same policy as bench.py).
    if "x13b_cosine_join_scaled" in queries:
        from jurimetria_etl_spark.operators.similarity import (
            suggest_lsh_planes,
        )
        from jurimetria_etl_spark.plans.extensions import _x13_join_sql

        n = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
        if suggest_lsh_planes(n) != suggest_lsh_planes(500):
            oracles["x13b_cosine_join_scaled"] = _x13_join_sql(
                n_planes=suggest_lsh_planes(n)
            )
    failures = []
    for name, fn in queries.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok~  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            sh, dh = hash_rows(scols, srows), hash_rows(dcols, drows)
            if sh != dh:
                problems.append(f"hash {sh} vs {dh}")
                # print first differing canonical rows for debugging
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                do = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = sorted("|".join(canon_value(r[i]) for i in so) for r in srows)
                dset = sorted("|".join(canon_value(r[i]) for i in do) for r in drows)
                for a, b in zip(sset, dset):
                    if a != b:
                        print(f"  spark: {a}\n  duck : {b}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(queries) - len(failures)}/{len(queries)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            sys.argv[2:] or None,
        )
    )
