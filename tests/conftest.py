from __future__ import annotations

import os
import shutil
from pathlib import Path

import pytest


@pytest.fixture(scope="session")
def spark():
    from jurimetria_etl_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s


def stage_drop(df, dir_path: str, name: str, mtime: float) -> None:
    """Stage one single-file parquet 'drop' into a streaming source dir
    with a pinned mtime — the file source orders micro-batches by
    modification time, so pinned, increasing mtimes make batch order
    deterministic.  Shared by every streaming test that simulates
    chronological file arrival."""
    staging = f"{dir_path}__stage_{name}"
    df.coalesce(1).write.parquet(staging)
    Path(dir_path).mkdir(parents=True, exist_ok=True)
    dst = f"{dir_path}/{name}.parquet"
    shutil.move(str(next(Path(staging).glob("part-*.parquet"))), dst)
    os.utime(dst, (mtime, mtime))
    shutil.rmtree(staging, ignore_errors=True)
