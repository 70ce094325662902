"""Raw-JSON landing ingest (sources/landing.py): reading a landed
JSON-lines tree must produce the SAME flattened frame as the live
adapter path, tribunal resolved from the hive partition dirs, malformed
lines tolerated."""

from __future__ import annotations

import json
from pathlib import Path

from jurimetria_etl_spark.sources.landing import (
    read_hits_jsonl,
    read_processos_landing,
)
from tests.test_reference_parity import SAMPLE_HIT, _hits_df


def _land(dir_path: Path, hits):
    dir_path.mkdir(parents=True, exist_ok=True)
    (dir_path / "page-000.json").write_text(
        "\n".join(json.dumps(h) for h in hits) + "\n"
    )


def _hit(numero):
    h = json.loads(json.dumps(SAMPLE_HIT))
    h["_source"]["numeroProcesso"] = numero
    return h


def test_landing_equals_adapter_flatten(spark, tmp_path):
    from jurimetria_etl_spark.operators.flatten import flatten_hits

    hits = [_hit("0000001-00.2023.8.26.0000"), _hit("0000002-00.2023.8.26.0000")]
    _land(tmp_path / "land", hits)
    got = read_processos_landing(
        spark, str(tmp_path / "land"), tribunal="TJCE"
    ).collect()
    want = flatten_hits(_hits_df(spark, hits), "TJCE").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_landing_tribunal_from_partition_dirs(spark, tmp_path):
    land = tmp_path / "land"
    _land(land / "tribunal=TJCE", [_hit("0000001-00.2023.8.26.0000")])
    _land(land / "tribunal=TJSP", [_hit("0000009-00.2023.8.26.0000")])
    df = read_processos_landing(spark, str(land))
    rows = {(r.tribunal, r.numero_processo) for r in df.collect()}
    assert rows == {
        ("TJCE", "0000001-00.2023.8.26.0000"),
        ("TJSP", "0000009-00.2023.8.26.0000"),
    }
    # per-tribunal query prunes at the file listing (PartitionFilters)
    plan = (
        df.where(df.tribunal == "TJCE")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(tribunal" in plan


def test_landing_tolerates_malformed_lines(spark, tmp_path):
    land = tmp_path / "land"
    land.mkdir()
    (land / "page-000.json").write_text(
        json.dumps(_hit("0000001-00.2023.8.26.0000"))
        + "\n{not json at all\n"
    )
    hits = read_hits_jsonl(spark, str(land))
    # PERMISSIVE mode: the bad line is an all-NULL row, the good one parses
    ok = hits.where(hits["_source"].isNotNull())
    assert ok.count() == 1


def test_full_landing_loop_adapter_to_engine(spark, tmp_path):
    """adapter (injected transport) → land_hits → read back: the engine
    sees exactly the rows the live scan produced, partitioned by
    tribunal."""
    from jurimetria_etl_spark.sources.datajud import DataJudSource
    from jurimetria_etl_spark.sources.landing import land_hits
    from tests.test_sources import _paged_transport

    pages = {
        (): [dict(_hit("0000001-00.2023.8.26.0000"), sort=[1])],
        (1,): [],
    }
    src = DataJudSource(spark, transport=_paged_transport(pages))
    scanned = src.parallel_scan(["TJCE", "TJSP"])
    land = str(tmp_path / "land")
    land_hits(scanned, land)

    back = read_processos_landing(spark, land)
    rows = {(r.tribunal, r.numero_processo) for r in back.collect()}
    assert rows == {
        ("TJCE", "0000001-00.2023.8.26.0000"),
        ("TJSP", "0000001-00.2023.8.26.0000"),
    }


def test_landing_pull_id_rerun_is_idempotent(spark, tmp_path):
    """A retried scheduler pull (same pull_id) must land exactly-once:
    running land_hits twice yields the identical analytic frame, not
    doubled rows — and a second DISTINCT pull appends next to the first.
    Mixed zones (legacy flat appends + pull dirs) read as the union."""
    from jurimetria_etl_spark.sources.datajud import DataJudSource
    from jurimetria_etl_spark.sources.landing import land_hits
    from tests.test_sources import _paged_transport

    pages = {
        (): [dict(_hit("0000001-00.2023.8.26.0000"), sort=[1])],
        (1,): [],
    }
    land = str(tmp_path / "land")

    def scan():
        return DataJudSource(
            spark, transport=_paged_transport(pages)
        ).parallel_scan(["TJCE"])

    land_hits(scan(), land, pull_id="2026-08-14T00")
    once = sorted(map(tuple, read_processos_landing(spark, land).collect()))
    land_hits(scan(), land, pull_id="2026-08-14T00")  # the retry
    twice = sorted(map(tuple, read_processos_landing(spark, land).collect()))
    assert twice == once and len(once) == 1  # byte-identical, not doubled

    # a different pull lands NEXT TO the first
    pages2 = {
        (): [dict(_hit("0000002-00.2023.8.26.0000"), sort=[1])],
        (1,): [],
    }
    src2 = DataJudSource(spark, transport=_paged_transport(pages2))
    land_hits(src2.parallel_scan(["TJCE"]), land, pull_id="2026-08-14T01")
    both = read_processos_landing(spark, land)
    assert {r.numero_processo for r in both.collect()} == {
        "0000001-00.2023.8.26.0000",
        "0000002-00.2023.8.26.0000",
    }

    # mixed zone: a legacy blind append unions in
    src3 = DataJudSource(spark, transport=_paged_transport(pages))
    land_hits(src3.parallel_scan(["TJSP"]), land)  # no pull_id
    mixed = read_processos_landing(spark, land)
    assert mixed.count() == 3
    assert {r.tribunal for r in mixed.collect()} == {"TJCE", "TJSP"}


def test_landing_pull_id_must_be_fs_safe(spark):
    import pytest

    from jurimetria_etl_spark.sources.landing import land_hits

    df = spark.range(1)
    with pytest.raises(ValueError, match="pull_id"):
        land_hits(df, "/tmp/x", pull_id="a/../b")


def test_landing_pull_retry_replaces_wholly_under_dynamic_mode(spark, tmp_path):
    """Exactly-once must hold even when the SESSION default is dynamic
    partition overwrite: a retry that lands fewer tribunals than the
    partial first attempt must not leave the stale tribunal dirs."""
    from jurimetria_etl_spark.sources.datajud import DataJudSource
    from jurimetria_etl_spark.sources.landing import land_hits
    from tests.test_sources import _paged_transport

    land = str(tmp_path / "land")
    pages = {
        (): [dict(_hit("0000001-00.2023.8.26.0000"), sort=[1])],
        (1,): [],
    }

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # "partial first attempt": two tribunals landed
        src = DataJudSource(spark, transport=_paged_transport(pages))
        land_hits(src.parallel_scan(["TJCE", "TJSP"]), land, pull_id="p1")
        # the retry lands only ONE tribunal — must replace the pull wholly
        src2 = DataJudSource(spark, transport=_paged_transport(pages))
        land_hits(src2.parallel_scan(["TJCE"]), land, pull_id="p1")
        back = read_processos_landing(spark, land)
        assert {r.tribunal for r in back.collect()} == {"TJCE"}
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
