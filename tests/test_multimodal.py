"""Multimodal plumbing tests (E5): binary columns + mapInPandas decode /
frame-sample with the deterministic fake decoder (real media libs are not
in this container — the STUB is explicit in operators/multimodal.py)."""

from __future__ import annotations

import pytest

from jurimetria_etl_spark.operators.multimodal import (
    attach_text_as_binary,
    extract_media_metadata,
    fake_image_decoder,
    read_binary_files,
    sample_frames,
    unavailable_decoder,
)
from jurimetria_etl_spark.sources.fixtures import load_fixture

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media_df(spark):
    docs = load_fixture(spark, SF, "documents").limit(20)
    return attach_text_as_binary(docs)


def test_binary_column_roundtrip(spark, media_df):
    r = media_df.select("path", "length", "content").first()
    assert r["path"].startswith("mem://doc/")
    assert r["length"] == len(bytes(r["content"]))


def test_extract_media_metadata_fake_decoder(spark, media_df):
    out = extract_media_metadata(media_df, decode_fn=fake_image_decoder)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        meta = r["meta"]
        assert meta["media_type"] == "image"
        assert 1 <= meta["width"] <= 640
        assert meta["duration_ms"] is None
    # deterministic: same input → same metadata
    again = extract_media_metadata(media_df, decode_fn=fake_image_decoder).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_unavailable_decoder_raises(spark, media_df):
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        extract_media_metadata(media_df, decode_fn=unavailable_decoder).collect()


def test_sample_frames_shape(spark, media_df):
    frames = sample_frames(media_df, every_n_bytes=64, max_frames=4)
    rows = frames.collect()
    assert {r["src"] for r in rows} <= {r["path"] for r in media_df.collect()}
    per_src: dict[str, list[int]] = {}
    for r in rows:
        per_src.setdefault(r["src"], []).append(r["frame_idx"])
        assert len(bytes(r["frame"])) <= 64
    for idxs in per_src.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense 0..n-1
        assert len(idxs) <= 4


def test_read_binary_files(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"hello world")
    (tmp_path / "b.bin").write_bytes(b"spark")
    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    got = {r["path"].split("/")[-1]: bytes(r["content"]) for r in df.collect()}
    assert got == {"a.bin": b"hello world", "b.bin": b"spark"}
